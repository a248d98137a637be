package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY §2.D12): image/audio as opaque
  * `binary` columns + typed metadata, with REAL decode / resize /
  * frame-sampling as batched per-partition transforms.
  *
  * Decode is real JDK work, no stubs: PNG/JPEG through
  * `javax.imageio` (actual pixel decode → width/height), WAV through
  * a RIFF fmt/data chunk parse (actual PCM frame reads) — both ship
  * with the JDK, so the operators work offline with zero added
  * dependencies. The Spark-side shape:
  *  - schema: (media_id, media BINARY) — payloads stay opaque bytes
  *    end-to-end, no base64 round-trips, no driver collection;
  *  - format sniffing on magic bytes is a plain Catalyst expression
  *    (narrow, codegen) — the "query metadata without decoding" path;
  *  - decode runs via `mapPartitions` over a typed Dataset in fixed
  *    batches of 64 records — the same batch shape `mapInPandas`/
  *    Arrow would use — so an Arrow-vectorized codec drops in by
  *    replacing [[JdkCodec]] only;
  *  - partitioning: decode is narrow (no shuffle); at 100 TB you size
  *    `spark.sql.files.maxPartitionBytes` so one partition's payloads
  *    fit in executor memory, which this plumbing respects by never
  *    materializing more than one batch per task at a time.
  *
  * The corpus is a PLANTED FIXTURE of real media ([[MediaGen]]):
  * each document row becomes a real PNG, JPEG or WAV whose
  * dimensions / sample count are pure functions of `doc_id` — so the
  * driver's DuckDB oracle can recompute what a correct decoder MUST
  * report (width, height, frame counts, even per-frame sample peaks)
  * from arithmetic alone, without itself decoding anything. A broken
  * encoder or decoder shows up as an oracle mismatch, not a silently
  * self-consistent stub.
  */
object Multimodal {

  val PngMagic: Array[Byte] = Array(0x89.toByte, 'P', 'N', 'G')
  // JPEG = SOI + marker prefix (FF D8 FF); the next byte varies by
  // flavor (E0 JFIF, E1 Exif, DB bare), so sniff only the invariant 3
  val JpegMagic: Array[Byte] = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
  val WavMagic: Array[Byte] = Array('R', 'I', 'F', 'F')

  /** Samples per audio "frame" (the unit the frame sampler plans
    * over) and the sampling stride: every [[FrameStep]]-th frame.
    */
  val FrameSamples = 256
  val FrameStep = 4
  val ResizeBox = 256
  val BatchSize = 64

  /** Deterministic REAL-media fixture generator: doc_id % 3 selects
    * png / jpeg / wav; dimensions and PCM content are pure functions
    * of doc_id (the contract the oracles recompute in SQL). Encoding
    * is real (`ImageIO.write`, RIFF/PCM bytes), executor-side and
    * narrow — at 100 TB this generator is replaced by a parquet/Lance
    * scan of a binary column, which is exactly what [[mediaTable]]'s
    * output schema models.
    */
  object MediaGen {
    val SampleRate = 8000

    def format(id: Long): String = (id % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "wav"
    }

    // image dims: 8..307 x 8..207 — straddles ResizeBox so the
    // box-fit path exercises both the shrink and the no-upscale arms
    def imageWidth(id: Long): Int = (8 + (id * 7) % 300).toInt
    def imageHeight(id: Long): Int = (8 + (id * 13) % 200).toInt

    // wav: 256..12255 mono 16-bit samples => 1..48 frames of 256
    def wavSampleCount(id: Long): Int = (256 + (id * 37) % 12000).toInt

    /** PCM sample k of doc id, in [-10000, 10000] (fits int16). */
    def sampleAt(id: Long, k: Int): Int =
      ((id * 31 + k.toLong * 7) % 20001 - 10000).toInt

    def pixelAt(id: Long, x: Int, y: Int): Int =
      (((id * 2654435761L + x * 31L + y * 17L) >>> 8) & 0xFFFFFF).toInt

    def payload(id: Long): Array[Byte] = format(id) match {
      case "wav" => wavBytes(id)
      case f => imageBytes(id, f)
    }

    private def imageBytes(id: Long, fmt: String): Array[Byte] = {
      val (w, h) = (imageWidth(id), imageHeight(id))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, pixelAt(id, x, y)); x += 1 }
        y += 1
      }
      val baos = new ByteArrayOutputStream()
      // ImageIO.write returns FALSE (no exception) when no writer
      // handles the format — that would silently yield empty payloads
      require(ImageIO.write(img, if (fmt == "jpeg") "jpg" else "png", baos),
        s"no ImageIO writer for $fmt")
      baos.toByteArray
    }

    def wavBytes(id: Long): Array[Byte] = {
      val n = wavSampleCount(id)
      val dataLen = n * 2 // mono, 16-bit
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
        .put("WAVE".getBytes(US_ASCII))
      buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // channels
        .putInt(SampleRate)
        .putInt(SampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
      buf.put("data".getBytes(US_ASCII)).putInt(dataLen)
      var k = 0
      while (k < n) { buf.putShort(sampleAt(id, k).toShort); k += 1 }
      buf.array()
    }
  }

  /** The media scan: one real payload per document row. Generation is
    * executor-side `mapPartitions` (narrow, deterministic, no driver
    * work) — the stand-in for reading a binary column off parquet.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread: decode cost is per-row CPU, and the documents file is
    // single-row-group small (one scan task would serialize the whole
    // decode — 85s → ~4s at sf1/local[32]); no-op at cluster scale
    Tables.spread(Tables.load(s, dir, "documents").select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map(id => (id, MediaGen.payload(id))))
      .toDF("media_id", "media")
  }

  /** Magic-byte format sniff — pure expression, no decode. */
  def sniffFormat(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(startswith(media, lit(PngMagic)), "png")
      .when(startswith(media, lit(JpegMagic)), "jpeg")
      .when(startswith(media, lit(WavMagic)), "wav")
      .otherwise("unknown")

  final case class MediaIn(media_id: Long, media: Array[Byte], format: String)
  final case class Decoded(media_id: Long, format: String,
      width: Int, height: Int, n_frames: Int)
  final case class Resized(media_id: Long, format: String,
      src_w: Int, src_h: Int, dst_w: Int, dst_h: Int, thumb: Array[Byte])
  final case class Frame(media_id: Long, frame_idx: Int, n_frames: Int,
      frame_peak: Int)

  /** Parsed WAV container header (RIFF fmt + data chunks). Header
    * parse reads ~44 bytes — no sample decode — which is what makes
    * header-planned frame sampling cheaper than decode-then-sample.
    */
  final case class WavHeader(channels: Int, sampleRate: Int,
      bitsPerSample: Int, blockAlign: Int, dataOffset: Int, dataLen: Int) {
    def nSamples: Int = dataLen / blockAlign
    def frameCount(frameSamples: Int): Int =
      (nSamples + frameSamples - 1) / frameSamples
  }

  /** Real JDK codec behind the batch seam: `javax.imageio` for
    * PNG/JPEG, RIFF chunk-walk + PCM reads for WAV. Signature (batch
    * in, batch out) matches an Arrow-batched decoder, so a vectorized
    * native codec replaces this object without touching the plan.
    */
  object JdkCodec {
    // no disk scratch files from executors (ImageIO's default cache
    // writes temp files per decode)
    ImageIO.setUseCache(false)

    private def readImage(m: MediaIn): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(m.media))
      if (img == null)
        throw new IllegalArgumentException(
          s"media ${m.media_id}: undecodable ${m.format} payload")
      img
    }

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, US_ASCII)

    /** RIFF chunk walk: find `fmt ` and `data`, nothing else decoded. */
    def parseWav(b: Array[Byte]): WavHeader = {
      require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        s"not a RIFF/WAVE payload (${b.length} bytes)")
      var p = 12
      var channels, sampleRate, bits, blockAlign = 0
      var dataOffset, dataLen = -1
      while (p + 8 <= b.length && (blockAlign == 0 || dataOffset < 0)) {
        val id = tag(b, p)
        val size = le32(b, p + 4)
        // bound computed in Long: a corrupt size near 2^31 would wrap
        // `p + 8 + size` negative and sail past the Int check, turning
        // the loud-failure contract into silent garbage metadata
        require(size >= 0 && p.toLong + 8 + size <= b.length,
          s"corrupt $id chunk: size $size at offset $p of ${b.length}")
        if (id == "fmt ") {
          require(size >= 16, s"fmt chunk too small: $size")
          require(le16(b, p + 8) == 1, "only PCM (format tag 1) supported")
          channels = le16(b, p + 10)
          sampleRate = le32(b, p + 12)
          blockAlign = le16(b, p + 20)
          bits = le16(b, p + 22)
        } else if (id == "data") {
          dataOffset = p + 8
          dataLen = size
        }
        p += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(blockAlign > 0 && dataOffset >= 0,
        "missing fmt or data chunk")
      WavHeader(channels, sampleRate, bits, blockAlign, dataOffset, dataLen)
    }

    /** Decode one batch to typed metadata: images pay a real pixel
      * decode (ImageIO), audio a header parse. Images are one frame;
      * audio frames follow the [[FrameSamples]] model.
      */
    def decode(batch: Seq[MediaIn]): Seq[Decoded] = batch.map { m =>
      m.format match {
        case "png" | "jpeg" =>
          val img = readImage(m)
          Decoded(m.media_id, m.format, img.getWidth, img.getHeight, 1)
        case "wav" =>
          val h = parseWav(m.media)
          Decoded(m.media_id, m.format, 0, 0, h.frameCount(FrameSamples))
        case f =>
          throw new IllegalArgumentException(
            s"media ${m.media_id}: unsupported format '$f'")
      }
    }

    /** Decode + scale into a bounding box (aspect preserved, never
      * upscaled) + re-encode PNG. Real pixel work via Graphics2D
      * bilinear scaling.
      */
    /** Box-fit bilinear scale (aspect preserved, never upscaled) —
      * the one scaling kernel shared by the thumbnail sink ([[resize]])
      * and the normalized perceptual-hash path ([[dhashNormalized]]):
      * both MUST produce identical pixels or a thumbnail and its
      * source would hash apart.
      */
    def scaleToBox(img: BufferedImage, box: Int): BufferedImage = {
      val (sw, sh) = (img.getWidth, img.getHeight)
      val scale = math.min(1.0, box.toDouble / math.max(sw, sh))
      val dw = math.max(1, math.round(sw * scale).toInt)
      val dh = math.max(1, math.round(sh * scale).toInt)
      val out = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, dw, dh, null)
      } finally g.dispose()
      out
    }

    def resize(batch: Seq[MediaIn], box: Int): Seq[Resized] = batch.map { m =>
      val img = readImage(m)
      val out = scaleToBox(img, box)
      val baos = new ByteArrayOutputStream()
      require(ImageIO.write(out, "png", baos), "no ImageIO png writer")
      Resized(m.media_id, m.format, img.getWidth, img.getHeight,
        out.getWidth, out.getHeight, baos.toByteArray)
    }

    /** dHash as (hi32, lo32) — see [[Multimodal.dedupImage]] for the
      * exact cell/compare definition this must mirror (the DuckDB
      * oracle recomputes it from the generator arithmetic, so any
      * drift here is a hash mismatch, not a silent approximation).
      */
    def dhash(m: MediaIn): (Long, Long) = dhashImage(readImage(m))

    /** dHash normalized through the [[scaleToBox]] thumbnail kernel —
      * the cross-format path: a lossy (jpeg) source and its lossless
      * twin decode to near-identical pixels, and hashing both at
      * thumbnail scale keeps their cell sums comparable regardless of
      * stored resolution.
      */
    def dhashNormalized(m: MediaIn, box: Int): (Long, Long) =
      dhashImage(scaleToBox(readImage(m), box))

    /** Envelope dHash for 16-bit mono PCM — the audio member of the
      * perceptual-hash family: 65 sample windows with the
      * integer-floor boundaries of [[dhashImage]]'s cell rule in one
      * dimension (window w covers [⌊w·n/65⌋, ⌊(w+1)·n/65⌋), min-1
      * guard for degenerate n), bit i = mean |amplitude| of window
      * i+1 > window i, cross-multiplied so no division ever happens —
      * and compared in FULL 128-bit precision ([[productGt]],
      * Math.multiplyHigh): sum·count reaches 32767·(n/65)² and would
      * silently wrap a Long past n ≈ 1.1e9 samples (~7 h at
      * 44.1 kHz), flipping hash bits on exactly the long-form audio
      * a real corpus contains. Packed 32/32 into (hi, lo) exactly like the
      * image hash, so the band/probe/verify machinery is shared
      * unchanged. Duration-invariant-ish by construction (windows
      * scale with n), amplitude-scale-sensitive by design (gain is a
      * real difference for training audio).
      */
    def envHash(m: MediaIn): (Long, Long) = {
      val h = parseWav(m.media)
      require(h.channels == 1 && h.bitsPerSample == 16,
        s"envelope hash expects 16-bit mono PCM, got ${h.bitsPerSample}-bit x${h.channels}")
      val n = h.nSamples
      val sums = new Array[Long](65)
      val cnts = new Array[Long](65)
      var w = 0
      while (w < 65) {
        val lo = (w.toLong * n / 65).toInt
        val hi0 = math.min(n, math.max(lo + 1, ((w + 1).toLong * n / 65).toInt))
        var s = 0L
        var k = lo
        while (k < hi0) {
          s += math.abs(le16(m.media, h.dataOffset + k * 2).toShort.toInt)
          k += 1
        }
        sums(w) = s
        cnts(w) = (hi0 - lo).toLong
        w += 1
      }
      var hiBits = 0L
      var loBits = 0L
      var i = 0
      while (i < 64) {
        val bit =
          if (productGt(sums(i + 1), cnts(i), sums(i), cnts(i + 1))) 1L
          else 0L
        if (i >= 32) hiBits |= bit << (i - 32) else loBits |= bit << i
        i += 1
      }
      (hiBits, loBits)
    }

    /** a·b > c·d for NON-NEGATIVE operands in full 128-bit precision
      * (high word via Math.multiplyHigh, low word unsigned): the
      * envelope comparison must not change answer when the raw Long
      * product overflows on hours-long clips.
      */
    private[ops] def productGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
      val h1 = Math.multiplyHigh(a, b); val l1 = a * b
      val h2 = Math.multiplyHigh(c, d); val l2 = c * d
      if (h1 != h2) h1 > h2 else java.lang.Long.compareUnsigned(l1, l2) > 0
    }

    /** True iff the payload parses as RIFF/WAVE PCM with the 16-bit
      * mono shape [[envHash]] hashes — the non-throwing admission
      * check: one stereo/8-bit/corrupt clip in a real corpus must be
      * SKIPPED by the dedup front-end, not abort the whole job
      * (envHash's own require stays as an internal invariant).
      */
    private[ops] def conformingWav(b: Array[Byte]): Boolean =
      try {
        val h = parseWav(b)
        h.channels == 1 && h.bitsPerSample == 16
      } catch { case _: IllegalArgumentException => false }

    def dhashImage(img: BufferedImage): (Long, Long) = {
      val w = img.getWidth
      val h = img.getHeight
      // ONE bulk ARGB grab: per-pixel getRGB(x, y) pays a color-model
      // conversion call per pixel (measured dominant in the 166k-image
      // sf10 hash pass); the bulk form returns the identical sRGB ints
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val s = Array.ofDim[Long](8, 9)
      val n = Array.ofDim[Long](8, 9)
      var cy = 0
      while (cy < 8) {
        val ylo = cy * h / 8
        val yhi = math.min(h, math.max(ylo + 1, (cy + 1) * h / 8))
        var cx = 0
        while (cx < 9) {
          val xlo = cx * w / 9
          val xhi = math.min(w, math.max(xlo + 1, (cx + 1) * w / 9))
          var ss = 0L
          var y = ylo
          while (y < yhi) {
            val row = y * w
            var x = xlo
            while (x < xhi) {
              val p = px(row + x)
              ss += ((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)
              x += 1
            }
            y += 1
          }
          s(cy)(cx) = ss
          n(cy)(cx) = (xhi - xlo).toLong * (yhi - ylo)
          cx += 1
        }
        cy += 1
      }
      var hi = 0L
      var lo = 0L
      cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          // right mean > left mean, by exact cross-multiplication
          if (s(cy)(cx + 1) * n(cy)(cx) > s(cy)(cx) * n(cy)(cx + 1)) {
            val i = cy * 8 + cx
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          cx += 1
        }
        cy += 1
      }
      (hi, lo)
    }

    /** Container-header frame count — no sample decode. */
    def frameCount(m: MediaIn): Int = parseWav(m.media).frameCount(FrameSamples)

    /** Decode ONLY the requested frames: each frame reads its own
      * PCM byte range out of the data chunk — decode cost scales with
      * frames KEPT, not frames stored (the entire point of
      * header-planned sampling at 100 TB). frame_peak = max |sample|
      * over the frame, the real decoded value the oracle recomputes.
      * Takes the already-parsed header so the planner and the decoder
      * share ONE chunk walk per payload (and can never disagree).
      */
    def decodeFrames(m: MediaIn, h: WavHeader, idxs: Seq[Int],
        total: Int): Seq[Frame] = {
      require(h.channels == 1 && h.bitsPerSample == 16,
        s"frame sampler expects 16-bit mono PCM, got ${h.bitsPerSample}-bit x${h.channels}")
      idxs.map { i =>
        val lo = i * FrameSamples
        val hi = math.min((i + 1) * FrameSamples, h.nSamples)
        var peak = 0
        var k = lo
        while (k < hi) {
          val s = le16(m.media, h.dataOffset + k * 2).toShort.toInt
          val a = math.abs(s)
          if (a > peak) peak = a
          k += 1
        }
        Frame(m.media_id, i, total, peak)
      }
    }
  }

  /** D12: sniff → batched real decode → typed metadata rows. */
  def mmMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = mediaTable(s, dir)
      .withColumn("format", sniffFormat(col("media")))
      .as[MediaIn]
    in.mapPartitions(rows =>
        rows.grouped(BatchSize).flatMap(b => JdkCodec.decode(b.toSeq)))
      .toDF()
      .orderBy("media_id")
  }

  /** D12b: batched resize-to-thumbnail over the IMAGE media — decode,
    * fit into a [[ResizeBox]]² box (aspect preserved, never
    * upscaled), re-encode PNG. Narrow `mapPartitions` in
    * [[BatchSize]] batches, same seam as [[mmMeta]]. The registered
    * query projects the dimension columns (oracle-checkable
    * arithmetic); the thumb payload itself is spec-checked by
    * decoding it back.
    */
  def mmResize(s: SparkSession, dir: String): DataFrame =
    resizeOf(mediaTable(s, dir))
      .select("media_id", "format", "src_w", "src_h", "dst_w", "dst_h")
      .orderBy("media_id")

  /** The resize pipeline on a prepared media table (thumb bytes
    * included) — split out so specs can vary the INPUT partitioning
    * (batch boundaries form inside `mapPartitions`, so only input
    * partitioning exercises them) and decode the thumbs back.
    */
  private[ops] def resizeOf(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media
      .withColumn("format", sniffFormat(col("media")))
      // resize is an image op: filter BEFORE decode, on the sniffed
      // (never decoded) column
      .filter(col("format").isin("png", "jpeg"))
      .as[MediaIn]
      .mapPartitions(rows =>
        rows.grouped(BatchSize).flatMap(b => JdkCodec.resize(b.toSeq, ResizeBox)))
      .toDF()
  }

  /** D12c: frame sampling over the AUDIO media — every [[FrameStep]]-th
    * frame (always including frame 0). The sample plan comes from the
    * container HEADER ([[JdkCodec.frameCount]], ~44 bytes read, no
    * sample decode); only sampled frames' PCM ranges are then decoded
    * — decode cost scales with frames KEPT, not frames stored. One
    * narrow pass; output is one row per sampled frame with the
    * frame's real decoded peak amplitude.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .withColumn("format", sniffFormat(col("media")))
      .filter(col("format") === "wav")
      .as[MediaIn]
      .mapPartitions(_.flatMap { m =>
        val h = JdkCodec.parseWav(m.media) // one chunk walk: plan + decode
        val total = h.frameCount(FrameSamples)
        JdkCodec.decodeFrames(m, h, 0 until total by FrameStep, total)
      })
      .toDF()
      .orderBy("media_id", "frame_idx")
  }

  /** D12d: perceptual-hash IMAGE near-dup (round 9) — the multimodal
    * member of the dedup family: dHash (difference hash — the
    * DCT-free perceptual hash, deterministic and therefore
    * oracle-able) computed in the existing decode `mapPartitions`,
    * then the D3 SimHash banding machinery over the 64-bit hash.
    *
    * dHash definition (exact-integer, both engines): the decoded
    * image reduces to a 9×8 grid of AREA-SUM cells — cell (cx, cy)
    * covers x ∈ [⌊cx·w/9⌋, max(⌊cx·w/9⌋+1, ⌊(cx+1)·w/9⌋)) ∩ [0, w)
    * (the max-clamp keeps cells of sub-grid images non-empty;
    * likewise y over h/8) — and bit cy·8+cx is set iff the RIGHT
    * cell's channel-sum mean exceeds the LEFT's, compared by exact
    * cross-multiplication (S_r·N_l > S_l·N_r — no float division
    * anywhere). The hash travels as two 32-bit halves
    * (dhash_hi, dhash_lo), which sidesteps 64-bit sign-construction
    * differences between engines.
    *
    * Near-dup candidates (round 10 — the scale-safe shape; round 9's
    * 16 bands × 4 bits had only 16 bucket values per band, a ~n²/32
    * quadratic self-join that [[Dedup.capBuckets]] could only degrade
    * to zero recall):
    *
    * 1. **Exact-collapse first** (the dedup-family invariant): images
    *    group by their full 64-bit hash and the pair scan runs on
    *    UNIQUE hashes only, keep labels mapping back through the
    *    16-byte hash-group join — candidate volume is bounded by
    *    distinct-hash volume, not corpus volume (at sf0.01 the 167
    *    images hold 24 distinct hashes; exact copies and re-encodes
    *    of one master are the overwhelming near-dup mass of a real
    *    crawl).
    * 2. **8 bands × 8 bits + Hamming-1 flip-mask probes** (the D5c
    *    multi-probe pattern): a pair within Hamming 15 has ≥ one band
    *    with ≤ 1 differing bit (2·8 > 15 pigeonhole), so probing each
    *    band's exact bucket plus its 8 single-bit flips loses NOTHING
    *    at the default `maxHamming` = 10 — with 256-value buckets
    *    instead of 16. [[Dedup.capBuckets]] still bounds degenerate
    *    buckets, but now a full bucket means a genuinely dense
    *    Hamming ball, not n/16 of the corpus.
    *
    * The banded+verified answer EQUALS the all-pairs scan the DuckDB
    * oracle runs: for every member i of hash-group g,
    * min(i, neighbors(i)) = least(gmin(g), min adjacent-group gmin) —
    * identical-hash members are Hamming-0 neighbors of each other, so
    * the per-group label IS the per-image label.
    *
    * Lossless (PNG) sources only in THIS registered form: lossless
    * decode reproduces the generator arithmetic the oracle recomputes.
    * [[dedupImageAll]] is the full-corpus form — every image format
    * routed through the D12b thumbnail normalize ([[JdkCodec.scaleToBox]])
    * before hashing, so lossy (jpeg) media participate; spec-pinned
    * (cross-format planted pair; no SQL oracle by nature — jpeg
    * decode is not SQL-expressible).
    *
    * Scale shape: decode+hash is the narrow batched `mapPartitions`
    * every D12 operator shares (pixels never leave their task; 16
    * bytes of hash per image move); the collapse is one 16-byte-key
    * exchange; banding explodes ×8 exact + ×72 probe rows per UNIQUE
    * hash; verify is two xors on join rows.
    */
  def dedupImage(s: SparkSession, dir: String, maxHamming: Int = 10): DataFrame =
    dedupImageOn(
      mediaTable(s, dir).withColumn("format", sniffFormat(col("media"))),
      maxHamming)

  /** The full-corpus (lossy-inclusive) form: png AND jpeg, every
    * image thumbnail-normalized before hashing — see [[dedupImage]].
    */
  def dedupImageAll(s: SparkSession, dir: String, maxHamming: Int = 10): DataFrame =
    dedupImageOn(
      mediaTable(s, dir).withColumn("format", sniffFormat(col("media"))),
      maxHamming, includeLossy = true)

  /** D12f: AUDIO near-dup — the third modality of the perceptual-hash
    * dedup family (D1 text digests, D12d image dHash): every WAV's
    * PCM is decoded in the shared batched `mapPartitions` seam and
    * reduced to a 64-bit envelope dHash ([[JdkCodec.envHash]] — mean
    * |amplitude| trend across 65 duration-proportional windows, the
    * audio-fingerprint shape of Chromaprint/Shazam-class systems
    * boiled down to its deterministic core), then the IDENTICAL
    * collapse + 8-band + Hamming-1 multi-probe + exact-verify pairing
    * as the image family ([[pairHashFrame]] — one pairing
    * implementation, two hash front-ends). keep_id = smallest
    * media_id among envelope-neighbors, the family keep rule.
    *
    * Scale shape: PCM never leaves its decode task (16 bytes of hash
    * per clip move); candidates bounded by distinct-hash volume via
    * the exact collapse; decode cost one |x| add per sample — linear
    * in audio bytes, the floor for any fingerprint.
    */
  def dedupAudio(s: SparkSession, dir: String, maxHamming: Int = 10): DataFrame =
    dedupAudioOn(
      mediaTable(s, dir).withColumn("format", sniffFormat(col("media"))),
      maxHamming)

  /** The audio hash front-end: RIFF decode + envelope dHash per WAV
    * as a narrow batched `mapPartitions` → (media_id, dhash_hi,
    * dhash_lo) — the audio twin of [[hashFrameOf]]. Clips the sniffer
    * calls "wav" but that are not 16-bit mono PCM (stereo, 8/24-bit,
    * truncated RIFF) are row-locally SKIPPED ([[JdkCodec.conformingWav]]):
    * a dedup pass over a real corpus must not abort on one
    * non-conforming file, and an unhashable clip simply cannot be a
    * near-dup under this fingerprint (it stays in the corpus,
    * ungrouped — the same posture as a non-image byte blob in the
    * image family's format filter).
    */
  private[graft] def audioHashFrameOf(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(col("format") === "wav")
      .select(col("media_id"), col("media"), col("format")).as[MediaIn]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.collect {
        case m if JdkCodec.conformingWav(m.media) =>
          val (hi, lo) = JdkCodec.envHash(m)
          (m.media_id, hi, lo)
      }))
      .toDF("media_id", "dhash_hi", "dhash_lo")
  }

  /** [[dedupAudio]] on an arbitrary (media_id, media, format) frame —
    * the seam the planted perturbed-copy spec drives.
    */
  private[ops] def dedupAudioOn(media: DataFrame,
      maxHamming: Int = 10): DataFrame = {
    require(maxHamming <= 15,
      s"maxHamming=$maxHamming exceeds the banding's recall guarantee (<= 15)")
    // cut: feeds the collapse AND the final map-back join
    val hashed = audioHashFrameOf(media).transform(graft.Lineage.cut)
    pairHashFrame(hashed, maxHamming)
  }

  /** D12f-incremental: admit a new batch of audio clips against the
    * already-admitted corpus — the audio member of the
    * incremental-admission family (D1b digests, D5c embeddings, D12e
    * images), running the SAME [[newImagesAgainstHistory]] survivor
    * rule (it is hash-representation-generic: batch reps probe the
    * history's persistent 8-(band, bhash) index, hits drop, the clean
    * remainder collapses within-batch by the min-id rule). History
    * PCM is never re-decoded in a deployment — the index stores band
    * rows per admitted envelope hash.
    */
  def dedupAudioIncremental(s: SparkSession, dir: String,
      splitId: Long = 250L, maxHamming: Int = 10): DataFrame = {
    val hashed = audioHashFrameOf(
        mediaTable(s, dir).withColumn("format", sniffFormat(col("media"))))
      .transform(graft.Lineage.cut)
    dedupAudioIncrementalOn(hashed, splitId, maxHamming)
  }

  /** [[dedupAudioIncremental]] on a pre-hashed frame — the spec seam. */
  private[ops] def dedupAudioIncrementalOn(hashed: DataFrame,
      splitId: Long, maxHamming: Int = 10): DataFrame = {
    val hist = hashed.filter(col("media_id") < splitId)
    val batch = hashed.filter(col("media_id") >= splitId)
    newImagesAgainstHistory(batch, bandRowsOf(hist), maxHamming)
      .orderBy("media_id")
  }

  /** The shared hashing front-end: decode + dHash per image as a
    * narrow batched `mapPartitions` → (media_id, dhash_hi, dhash_lo).
    * `includeLossy` switches between the direct-hash lossless form
    * (png only — the oracle-able arithmetic) and the full-corpus form
    * (png + jpeg, every image thumbnail-normalized through
    * [[JdkCodec.scaleToBox]] first).
    */
  private[graft] def hashFrameOf(media: DataFrame,
      includeLossy: Boolean): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    val formats = if (includeLossy) Seq("png", "jpeg") else Seq("png")
    media.filter(col("format").isin(formats: _*))
      .select(col("media_id"), col("media"), col("format")).as[MediaIn]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { m =>
        val (hi, lo) =
          if (includeLossy) JdkCodec.dhashNormalized(m, ResizeBox)
          else JdkCodec.dhash(m)
        (m.media_id, hi, lo)
      }))
      .toDF("media_id", "dhash_hi", "dhash_lo")
  }

  private def bandVal = "if(b < 4, shiftright(dhash_lo, b * 8) & 255, " +
    "shiftright(dhash_hi, (b - 4) * 8) & 255)"

  /** The exact band table: 8 rows per input row, (band, bhash) of the
    * 8-bit band value appended to the carried columns. This is what a
    * persistent image-hash index stores ([[graft.streaming.ImageStreams]]).
    */
  private[graft] def bandRowsOf(hashes: DataFrame): DataFrame =
    hashes.withColumn("b",
        explode(expr(s"transform(sequence(0, 7), b -> " +
          s"struct(b as band, $bandVal as bhash))")))
      .withColumn("band", col("b.band")).withColumn("bhash", col("b.bhash"))
      .drop("b")

  /** The Hamming-1 multi-probe table: 72 rows per input row — each
    * band's exact value plus its 8 single-bit flips (mask 0 finds
    * band-equal pairs). Probing these against [[bandRowsOf]] buckets
    * finds every pair with ≤ 1 differing bit in SOME band, which by
    * pigeonhole (2·8 > 15) is every pair within Hamming 15.
    */
  private[graft] def probeRowsOf(hashes: DataFrame): DataFrame =
    hashes.withColumn("b",
        explode(expr(s"flatten(transform(sequence(0, 7), b -> " +
          s"transform(array(0, 1, 2, 4, 8, 16, 32, 64, 128), " +
          s"m -> struct(b as band, ($bandVal ^ m) as bhash))))")))
      .withColumn("band", col("b.band")).withColumn("bhash", col("b.bhash"))
      .drop("b")

  /** [[dedupImage]] on an arbitrary (media_id, media, format) frame —
    * the seam the planted resized-copy and cross-format specs drive.
    */
  private[ops] def dedupImageOn(media: DataFrame,
      maxHamming: Int = 10, includeLossy: Boolean = false): DataFrame = {
    // the 8-band × 8-bit + Hamming-1 multi-probe scheme guarantees
    // full candidate recall only for maxHamming <= 15 (pigeonhole:
    // 16 differing bits can dirty all 8 bands beyond probe reach) —
    // past that the banding silently loses pairs while the all-pairs
    // equality claim still reads as exact. Recall is also modulo
    // capBuckets on degenerate hash distributions (same caveat as
    // every banded family member).
    require(maxHamming <= 15,
      s"maxHamming=$maxHamming exceeds the banding's recall guarantee (<= 15)")
    // cut: feeds the hash-group collapse AND the final map-back join
    val hashed = hashFrameOf(media, includeLossy).transform(graft.Lineage.cut)
    pairHashFrame(hashed, maxHamming)
  }

  /** The shared collapse + band + Hamming-1-probe + verify pairing on
    * an arbitrary (media_id, dhash_hi, dhash_lo) frame — the engine
    * core [[dedupImageOn]] and [[dedupAudioOn]] both run (one pairing
    * implementation, two perceptual hash front-ends). Caller has
    * already checked the maxHamming <= 15 pigeonhole bound and cut
    * the hash frame's lineage.
    */
  private[ops] def pairHashFrame(hashed: DataFrame,
      maxHamming: Int): DataFrame = {
    // exact-collapse: the pair scan below runs on UNIQUE hashes only
    val groups = hashed.groupBy("dhash_hi", "dhash_lo")
      .agg(min(col("media_id")).as("gmin"))
      .transform(graft.Lineage.cut)
    val banded = Dedup.capBuckets(bandRowsOf(groups), Seq("band", "bhash"))
    val cand = probeRowsOf(groups).as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.gmin") < col("y.gmin"))
      .select(col("x.gmin").as("a"), col("x.dhash_hi").as("ha"),
        col("x.dhash_lo").as("la"),
        col("y.gmin").as("b"), col("y.dhash_hi").as("hb"),
        col("y.dhash_lo").as("lb"))
      .distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) +
        bit_count(col("la").bitwiseXOR(col("lb"))) <= maxHamming)
      // cut: BOTH direction projections of the union below read this
      // frame — without materialization the probe join runs twice
      .transform(graft.Lineage.cut)
    val neighborMin = cand.select(col("a").as("gmin"), col("b").as("nbr"))
      .unionByName(cand.select(col("b").as("gmin"), col("a").as("nbr")))
      .groupBy("gmin").agg(min(col("nbr")).as("mn"))
    val groupKeep = groups.join(neighborMin, Seq("gmin"), "left")
      .select(col("dhash_hi"), col("dhash_lo"),
        least(coalesce(col("mn"), col("gmin")), col("gmin")).as("keep_id"))
    hashed.join(groupKeep, Seq("dhash_hi", "dhash_lo"))
      .select(col("media_id"), col("dhash_hi"), col("dhash_lo"), col("keep_id"))
      .orderBy("media_id")
  }

  /** D12e: INCREMENTAL image near-dup — dedup a new batch of images
    * against the already-admitted corpus: the multimodal member of the
    * incremental-admission family (D1b exact digests, D5c embedding
    * cosine). A batch image with a history hash within `maxHamming` is
    * dropped (its near-dup is already admitted); the history-clean
    * remainder collapses within-batch by the min-id rule — only group
    * reps survive, exactly [[graft.ops.Dedup.newVectorsAgainstHistory]]'s
    * shape over dHash space. Returns the admitted
    * (media_id, dhash_hi, dhash_lo) rows.
    *
    * `splitId` models the history/batch boundary on the test corpus; a
    * deployment passes its persistent band index
    * ([[newImagesAgainstHistory]] — the seam the streaming twin
    * [[graft.streaming.ImageStreams.dedupStream]] shares, so batch and
    * stream cannot drift). History pixels are never re-decoded in a
    * deployment: the index stores 8 (band, bhash) rows per admitted
    * hash and only candidate hash pairs are verified.
    */
  def dedupImageIncremental(s: SparkSession, dir: String,
      splitId: Long = 250L, maxHamming: Int = 10): DataFrame = {
    val hashed = hashFrameOf(
        mediaTable(s, dir).withColumn("format", sniffFormat(col("media"))),
        includeLossy = false)
      .transform(graft.Lineage.cut)
    val hist = hashed.filter(col("media_id") < splitId)
    val batch = hashed.filter(col("media_id") >= splitId)
    newImagesAgainstHistory(batch, bandRowsOf(hist), maxHamming)
      .orderBy("media_id")
  }

  /** The batch-vs-history survivor rule for IMAGES, shared by
    * [[dedupImageIncremental]] and the streaming twin: batch hashes
    * collapse to unique reps, flip-mask-probe the history BAND index
    * (the history is banded once, at admission — never re-decoded,
    * never rescanned), candidates are exact-Hamming verified, hits
    * drop their whole hash group, and the clean remainder runs the
    * within-batch banded collapse (a rep survives iff no SMALLER clean
    * rep is within `maxHamming`). `histBands` carries
    * (dhash_hi, dhash_lo, band, bhash) — the persistent index rows.
    */
  private[graft] def newImagesAgainstHistory(batch: DataFrame,
      histBands: DataFrame, maxHamming: Int = 10): DataFrame = {
    // same banding recall bound as dedupImageOn: > 15 differing bits
    // can escape all 8 Hamming-1 probe bands
    require(maxHamming <= 15,
      s"maxHamming=$maxHamming exceeds the banding's recall guarantee (<= 15)")
    // exact-collapse front-end: only reps can survive (identical
    // copies of a history-hit hash are all history-dups through the
    // rep; non-minimal copies of a clean hash are dominated by their
    // group min)
    val reps = batch.groupBy("dhash_hi", "dhash_lo")
      .agg(min(col("media_id")).as("media_id"))
      .select(col("media_id"), col("dhash_hi"), col("dhash_lo"))
      .transform(graft.Lineage.cut)
    val histHit = probeRowsOf(reps).as("x")
      .join(Dedup.capBuckets(histBands, Seq("band", "bhash")).as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash"))
      .select(col("x.dhash_hi"), col("x.dhash_lo"),
        col("y.dhash_hi").as("hh"), col("y.dhash_lo").as("hl"))
      .distinct()
      .filter(bit_count(col("dhash_hi").bitwiseXOR(col("hh"))) +
        bit_count(col("dhash_lo").bitwiseXOR(col("hl"))) <= maxHamming)
      .select(col("dhash_hi"), col("dhash_lo")).distinct()
    val clean = reps.join(histHit, Seq("dhash_hi", "dhash_lo"), "left_anti")
      .transform(graft.Lineage.cut) // feeds both within-batch sides + output
    val banded = Dedup.capBuckets(bandRowsOf(clean), Seq("band", "bhash"))
    val dominated = probeRowsOf(clean).as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.dhash_hi").as("ha"), col("x.dhash_lo").as("la"),
        col("y.media_id").as("media_id"),
        col("y.dhash_hi").as("hb"), col("y.dhash_lo").as("lb"))
      .distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) +
        bit_count(col("la").bitwiseXOR(col("lb"))) <= maxHamming)
      .select(col("media_id")).distinct()
    clean.join(dominated, Seq("media_id"), "left_anti")
      .select(col("media_id"), col("dhash_hi"), col("dhash_lo"))
  }

  /** Format distribution over the sniffed (never decoded) column —
    * the "query metadata without touching pixels" path.
    */
  def mmFormatDist(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(sniffFormat(col("media")).as("format"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"))
      .orderBy("format")

  /** The fixture contract, restated for the oracles: every dimension
    * below is the SQL twin of a [[MediaGen]] pure function, so DuckDB
    * recomputes what a correct decode must report without decoding.
    */
  /** Shared dHash re-derivation CTEs (imgs → … → hash): DuckDB
    * recomputes EVERY hash bit of every png fixture from the
    * generator's pixel arithmetic — the mm_meta trick. Reused by the
    * `dedup_image` and `dedup_image_incremental` oracles (one
    * definition, so the two can never drift).
    */
  private val DhashCtes: String =
    """imgs AS (
      |  SELECT doc_id AS media_id,
      |         8 + (doc_id * 7) % 300 AS w,
      |         8 + (doc_id * 13) % 200 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |xs AS (SELECT media_id, w, h, unnest(range(0, w)) AS x FROM imgs),
      |px AS (SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |gr AS (
      |  SELECT media_id, x, y,
      |         ((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255) AS g
      |  FROM (SELECT media_id, x, y,
      |          ((media_id * 2654435761 + x * 31 + y * 17) >> 8) & 16777215 AS p
      |        FROM px)),
      |cxb AS (
      |  SELECT media_id, cx, (cx * w) // 9 AS xlo,
      |         least(w, greatest((cx * w) // 9 + 1, ((cx + 1) * w) // 9)) AS xhi
      |  FROM (SELECT media_id, w, unnest(range(0, 9)) AS cx FROM imgs)),
      |cyb AS (
      |  SELECT media_id, cy, (cy * h) // 8 AS ylo,
      |         least(h, greatest((cy * h) // 8 + 1, ((cy + 1) * h) // 8)) AS yhi
      |  FROM (SELECT media_id, h, unnest(range(0, 8)) AS cy FROM imgs)),
      |colsum AS (
      |  SELECT g.media_id, c.cx, g.y, sum(g.g) AS s, count(*) AS n
      |  FROM gr g JOIN cxb c
      |    ON g.media_id = c.media_id AND g.x >= c.xlo AND g.x < c.xhi
      |  GROUP BY 1, 2, 3),
      |cell AS (
      |  SELECT cs.media_id, cs.cx, c.cy, sum(cs.s) AS s, sum(cs.n) AS n
      |  FROM colsum cs JOIN cyb c
      |    ON cs.media_id = c.media_id AND cs.y >= c.ylo AND cs.y < c.yhi
      |  GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT l.media_id, l.cy * 8 + l.cx AS i,
      |         CASE WHEN r.s * l.n > l.s * r.n THEN 1 ELSE 0 END AS bit
      |  FROM cell l JOIN cell r
      |    ON l.media_id = r.media_id AND l.cy = r.cy AND r.cx = l.cx + 1),
      |hash AS MATERIALIZED (
      |  SELECT media_id,
      |    CAST(sum(CASE WHEN i >= 32 THEN bit::BIGINT << (i - 32) ELSE 0 END) AS BIGINT) AS dhash_hi,
      |    CAST(sum(CASE WHEN i < 32 THEN bit::BIGINT << i ELSE 0 END) AS BIGINT) AS dhash_lo
      |  FROM bits GROUP BY 1)""".stripMargin

  /** Envelope-hash re-derivation CTEs (wavs → windows → sums → bits →
    * ahash): DuckDB recomputes EVERY envelope bit of every WAV from
    * the generator's sample arithmetic — the DhashCtes trick in one
    * dimension. The engine decodes real RIFF bytes; the oracle
    * recomputes what a correct decode must sum, so a stub cannot fake
    * it.
    */
  private val AudioEnvCtes: String =
    """wavs AS (
      |  SELECT doc_id AS media_id, 256 + (doc_id * 37) % 12000 AS n
      |  FROM documents WHERE doc_id % 3 = 2),
      |wb AS (
      |  SELECT media_id, w, (w * n) // 65 AS klo,
      |         least(n, greatest((w * n) // 65 + 1, ((w + 1) * n) // 65)) AS khi
      |  FROM (SELECT media_id, n, unnest(range(0, 65)) AS w FROM wavs)),
      |ws AS (
      |  SELECT media_id, w,
      |         sum(abs(((media_id * 31 + k * 7) % 20001) - 10000)) AS s,
      |         count(*) AS c
      |  FROM (SELECT media_id, w, unnest(range(klo, khi)) AS k FROM wb)
      |  GROUP BY 1, 2),
      |abits AS (
      |  SELECT l.media_id, l.w AS i,
      |         CASE WHEN r.s * l.c > l.s * r.c THEN 1 ELSE 0 END AS bit
      |  FROM ws l JOIN ws r ON l.media_id = r.media_id AND r.w = l.w + 1),
      |ahash AS MATERIALIZED (
      |  SELECT media_id,
      |    CAST(sum(CASE WHEN i >= 32 THEN bit::BIGINT << (i - 32) ELSE 0 END) AS BIGINT) AS dhash_hi,
      |    CAST(sum(CASE WHEN i < 32 THEN bit::BIGINT << i ELSE 0 END) AS BIGINT) AS dhash_lo
      |  FROM abits GROUP BY 1)""".stripMargin

  /** The fixture contract, restated for the oracles: every dimension
    * below is the SQL twin of a [[MediaGen]] pure function, so DuckDB
    * recomputes what a correct decode must report without decoding.
    */
  val queries: Seq[Q] = Seq(
    // envelope-hash near-dup: every hash bit re-derived from the
    // generator's sample arithmetic, then the exact all-pairs Hamming
    // scan — equal to the collapsed+banded engine answer by the same
    // pigeonhole argument as dedup_image
    Q("dedup_audio", (s, d) => dedupAudio(s, d), Some(
      s"""WITH $AudioEnvCtes,
        |pairs AS (
        |  SELECT a.media_id AS a, b.media_id AS b
        |  FROM ahash a JOIN ahash b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.dhash_hi, b.dhash_hi)) +
        |        bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 10),
        |nbr AS (
        |  SELECT media_id, min(nb) AS mn
        |  FROM (SELECT a AS media_id, b AS nb FROM pairs
        |        UNION ALL SELECT b, a FROM pairs)
        |  GROUP BY 1)
        |SELECT h.media_id, h.dhash_hi, h.dhash_lo,
        |       least(coalesce(n.mn, h.media_id), h.media_id) AS keep_id
        |FROM ahash h LEFT JOIN nbr n USING (media_id)
        |ORDER BY media_id""".stripMargin)),
    // incremental audio admission: the dedup_image_incremental rule
    // over the shared AudioEnvCtes hash re-derivation
    Q("dedup_audio_incremental", (s, d) => dedupAudioIncremental(s, d), Some(
      s"""WITH $AudioEnvCtes,
        |hist AS (SELECT * FROM ahash WHERE media_id < 250),
        |bat AS (SELECT * FROM ahash WHERE media_id >= 250),
        |histhit AS (
        |  SELECT DISTINCT b.media_id FROM bat b JOIN hist h
        |    ON bit_count(xor(b.dhash_hi, h.dhash_hi)) +
        |       bit_count(xor(b.dhash_lo, h.dhash_lo)) <= 10),
        |clean AS (
        |  SELECT * FROM bat
        |  WHERE media_id NOT IN (SELECT media_id FROM histhit)),
        |dominated AS (
        |  SELECT DISTINCT b.media_id FROM clean b JOIN clean a
        |    ON a.media_id < b.media_id
        |   AND bit_count(xor(a.dhash_hi, b.dhash_hi)) +
        |       bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 10)
        |SELECT media_id, dhash_hi, dhash_lo FROM clean
        |WHERE media_id NOT IN (SELECT media_id FROM dominated)
        |ORDER BY media_id""".stripMargin)),
    // dHash near-dup: the oracle re-derives every hash bit from the
    // generator's pixel arithmetic (lossless decode reproduces it
    // exactly), then runs the EXACT all-pairs Hamming scan — equal to
    // the collapsed+banded engine answer by the pigeonhole argument.
    // The lossy-inclusive twin has no oracle by nature (jpeg decode is
    // not SQL-expressible) — pinned by the cross-format planted spec
    // and the shared hash/keep machinery the dedup_image oracle proves
    Q("dedup_image_all", (s, d) => dedupImageAll(s, d), None),
    Q("dedup_image", (s, d) => dedupImage(s, d), Some(
      s"""WITH $DhashCtes,
        |pairs AS (
        |  SELECT a.media_id AS a, b.media_id AS b
        |  FROM hash a JOIN hash b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.dhash_hi, b.dhash_hi)) +
        |        bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 10),
        |nbr AS (
        |  SELECT media_id, min(nb) AS mn
        |  FROM (SELECT a AS media_id, b AS nb FROM pairs
        |        UNION ALL SELECT b, a FROM pairs)
        |  GROUP BY 1)
        |SELECT h.media_id, h.dhash_hi, h.dhash_lo,
        |       least(coalesce(n.mn, h.media_id), h.media_id) AS keep_id
        |FROM hash h LEFT JOIN nbr n USING (media_id)
        |ORDER BY media_id""".stripMargin)),
    // incremental admission: history-hit batch images drop (any hist
    // hash within Hamming 10), clean survivors collapse by the min-id
    // rule — the per-image all-pairs form of the rep-collapsed engine
    // rule (equivalence argued at newImagesAgainstHistory: dominance
    // transfers through hash-group reps)
    Q("dedup_image_incremental", (s, d) => dedupImageIncremental(s, d), Some(
      s"""WITH $DhashCtes,
        |hist AS (SELECT * FROM hash WHERE media_id < 250),
        |bat AS (SELECT * FROM hash WHERE media_id >= 250),
        |histhit AS (
        |  SELECT DISTINCT b.media_id FROM bat b JOIN hist h
        |    ON bit_count(xor(b.dhash_hi, h.dhash_hi)) +
        |       bit_count(xor(b.dhash_lo, h.dhash_lo)) <= 10),
        |clean AS (
        |  SELECT * FROM bat
        |  WHERE media_id NOT IN (SELECT media_id FROM histhit)),
        |dominated AS (
        |  SELECT DISTINCT b.media_id FROM clean b JOIN clean a
        |    ON a.media_id < b.media_id
        |   AND bit_count(xor(a.dhash_hi, b.dhash_hi)) +
        |       bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 10)
        |SELECT media_id, dhash_hi, dhash_lo FROM clean
        |WHERE media_id NOT IN (SELECT media_id FROM dominated)
        |ORDER BY media_id""".stripMargin)),
    Q("mm_meta", mmMeta, Some(
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |            ELSE 'wav' END AS format,
        |       CAST(CASE WHEN doc_id % 3 = 2 THEN 0
        |                 ELSE 8 + (doc_id * 7) % 300 END AS INT) AS width,
        |       CAST(CASE WHEN doc_id % 3 = 2 THEN 0
        |                 ELSE 8 + (doc_id * 13) % 200 END AS INT) AS height,
        |       CAST(CASE WHEN doc_id % 3 = 2
        |                 THEN ceil((256 + (doc_id * 37) % 12000) / 256.0)
        |                 ELSE 1 END AS INT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin)),
    Q("mm_resize", mmResize, Some(
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |         CASE doc_id % 3 WHEN 0 THEN 'png' ELSE 'jpeg' END AS format,
        |         8 + (doc_id * 7) % 300 AS w,
        |         8 + (doc_id * 13) % 200 AS h
        |  FROM documents WHERE doc_id % 3 < 2),
        |s AS (SELECT *, least(1.0, 256.0 / greatest(w, h)) AS sc FROM d)
        |SELECT media_id, format,
        |       CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
        |       CAST(greatest(1, floor(w * sc + 0.5)) AS INT) AS dst_w,
        |       CAST(greatest(1, floor(h * sc + 0.5)) AS INT) AS dst_h
        |FROM s ORDER BY media_id""".stripMargin)),
    Q("mm_frames", mmFrameSample, Some(
      """WITH w AS (
        |  SELECT doc_id AS media_id,
        |         256 + (doc_id * 37) % 12000 AS n_samples
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT media_id, n_samples,
        |         CAST(ceil(n_samples / 256.0) AS INT) AS n_frames
        |  FROM w),
        |idx AS (
        |  SELECT media_id, n_samples, n_frames,
        |         CAST(unnest(range(0, n_frames, 4)) AS INT) AS frame_idx
        |  FROM f)
        |SELECT media_id, frame_idx, n_frames,
        |       CAST(list_max(list_transform(
        |              range(frame_idx * 256,
        |                    least((frame_idx + 1) * 256, n_samples)),
        |              k -> abs((media_id * 31 + k * 7) % 20001 - 10000)))
        |            AS INT) AS frame_peak
        |FROM idx ORDER BY media_id, frame_idx""".stripMargin)),
    Q("mm_format_dist", mmFormatDist, Some(
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |            ELSE 'wav' END AS format,
        |       count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin))
  )
}
