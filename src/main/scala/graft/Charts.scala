package graft

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage

/** Minimal chart renderer for [[Report]]'s three plot cells
  * (eda.ipynb cells 10-12 → img/gamecount_plot.png,
  * highcount_plot.png, opening_plot.png). The reference renders with
  * plotnine at 10×6 in / 100 dpi; these are JDK-Graphics2D
  * equivalents at the same 1000×600 pixel geometry — line charts for
  * the two daily-count series, a flipped (horizontal) bar chart for
  * the top-20 openings. Chart INPUT parity is what the oracles pin
  * (`chess_daily_counts`, `chess_daily_high_elo`,
  * `chess_top_openings`); this layer only has to draw those
  * chart-sized aggregates, so it stays dependency-free (ImageIO is
  * already load-bearing in the multimodal family).
  */
object Charts {

  val Width = 1000
  val Height = 600

  private val TitleFont = new Font(Font.SANS_SERIF, Font.BOLD, 18)
  private val LabelFont = new Font(Font.SANS_SERIF, Font.PLAIN, 12)
  private val Bg = Color.WHITE
  private val Fg = new Color(0x30, 0x30, 0x30)
  private val Grid = new Color(0xd8, 0xd8, 0xd8)
  private val Series = new Color(0x30, 0x66, 0xbe)

  private def canvas(): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(Width, Height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
      RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
    g.setColor(Bg); g.fillRect(0, 0, Width, Height)
    (img, g)
  }

  /** ~5 round-number y ticks covering [0, max]. */
  private def ticks(max: Long): Seq[Long] = {
    val m = math.max(max, 1L)
    val raw = m / 4.0
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = (Seq(1.0, 2.0, 5.0, 10.0).map(_ * mag).find(_ >= raw)
      .getOrElse(mag * 10)).toLong.max(1L)
    0L.to(((m + step - 1) / step) * step, step)
  }

  private def write(img: BufferedImage, out: java.io.File): Unit = {
    Option(out.getParentFile).foreach(_.mkdirs())
    javax.imageio.ImageIO.write(img, "png", out)
  }

  /** Line chart over ordered (label, value) points — the daily-count
    * shape. X labels are drawn for ~8 evenly spaced points, rotated
    * 45° like the reference's axis_text_x.
    */
  def linePng(points: Seq[(String, Long)], yLabel: String, title: String,
      out: java.io.File): Unit = {
    val (img, g) = canvas()
    val (l, r, t, b) = (90, 30, 60, 90)
    val (pw, ph) = (Width - l - r, Height - t - b)
    val maxY = ticks(points.map(_._2).foldLeft(0L)(math.max)).last
    // frame + grid + y ticks
    g.setFont(LabelFont)
    for (ty <- ticks(maxY)) {
      val y = t + ph - (ty.toDouble / maxY * ph).toInt
      g.setColor(Grid); g.drawLine(l, y, l + pw, y)
      g.setColor(Fg)
      val s = ty.toString
      g.drawString(s, l - 8 - g.getFontMetrics.stringWidth(s), y + 5)
    }
    g.setColor(Fg)
    g.drawLine(l, t, l, t + ph); g.drawLine(l, t + ph, l + pw, t + ph)
    // polyline
    val n = points.size
    if (n > 0) {
      val xs = points.indices.map(i =>
        l + (if (n == 1) pw / 2 else (i.toDouble / (n - 1) * pw).toInt))
      val ys = points.map(p => t + ph - (p._2.toDouble / maxY * ph).toInt)
      g.setColor(Series); g.setStroke(new BasicStroke(2f))
      for (i <- 1 until n) g.drawLine(xs(i - 1), ys(i - 1), xs(i), ys(i))
      // rotated x labels on ~8 evenly spaced points
      g.setColor(Fg)
      val every = math.max(1, n / 8)
      for (i <- points.indices by every) {
        val g2 = g.create().asInstanceOf[Graphics2D]
        g2.translate(xs(i), t + ph + 12)
        g2.rotate(-math.Pi / 4)
        g2.drawString(points(i)._1,
          -g.getFontMetrics.stringWidth(points(i)._1), 0)
        g2.dispose()
      }
    }
    // titles
    g.setFont(TitleFont); g.setColor(Fg)
    g.drawString(title, l, 32)
    val g2 = g.create().asInstanceOf[Graphics2D]
    g2.setFont(LabelFont)
    g2.rotate(-math.Pi / 2)
    g2.drawString(yLabel, -(t + ph / 2 +
      g.getFontMetrics(LabelFont).stringWidth(yLabel) / 2), 22)
    g2.dispose()
    g.dispose()
    write(img, out)
  }

  /** Horizontal bar chart (the reference's geom_col + coord_flip) —
    * first category at the TOP, like plotnine's flipped categorical
    * axis with the most-common opening first.
    */
  def barhPng(cats: Seq[(String, Long)], xLabel: String, title: String,
      out: java.io.File): Unit = {
    val (img, g) = canvas()
    val (l, r, t, b) = (280, 40, 60, 60)
    val (pw, ph) = (Width - l - r, Height - t - b)
    val maxX = ticks(cats.map(_._2).foldLeft(0L)(math.max)).last
    g.setFont(LabelFont)
    for (tx <- ticks(maxX)) {
      val x = l + (tx.toDouble / maxX * pw).toInt
      g.setColor(Grid); g.drawLine(x, t, x, t + ph)
      g.setColor(Fg)
      val s = tx.toString
      g.drawString(s, x - g.getFontMetrics.stringWidth(s) / 2, t + ph + 18)
    }
    g.setColor(Fg)
    g.drawLine(l, t, l, t + ph); g.drawLine(l, t + ph, l + pw, t + ph)
    val n = cats.size
    if (n > 0) {
      val slot = ph.toDouble / n
      val bh = math.max(1, (slot * 0.7).toInt)
      for ((c, i) <- cats.zipWithIndex) {
        val y = t + (i * slot).toInt + ((slot - bh) / 2).toInt
        g.setColor(Series)
        g.fillRect(l, y, (c._2.toDouble / maxX * pw).toInt, bh)
        g.setColor(Fg)
        val label = if (c._1.length > 38) c._1.take(37) + "…" else c._1
        g.drawString(label, l - 8 - g.getFontMetrics.stringWidth(label),
          y + bh / 2 + 5)
      }
    }
    g.setFont(TitleFont); g.setColor(Fg)
    g.drawString(title, l, 32)
    g.setFont(LabelFont)
    g.drawString(xLabel, l + pw / 2 -
      g.getFontMetrics.stringWidth(xLabel) / 2, t + ph + 40)
    g.dispose()
    write(img, out)
  }
}
