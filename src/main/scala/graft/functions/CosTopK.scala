package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Native cosine top-k over a fixed center set: the best `k`
  * `struct(cos, pid)` of a float-array embedding against `centers`,
  * ordered (cos desc, pid desc) — the IVF pivot-ranking kernel
  * ([[graft.ops.Similarity]]: list assignment is prefix 1, probe
  * lists are prefix nProbe).
  *
  * Why native (the D13 escape hatch, k-generalizing [[CosBest]]): the
  * composed formulation — `reverse(array_sort(array(struct(cosine(x,
  * c₁), pid₁), …)))` then `slice` — materializes AND comparison-sorts
  * an nLists-struct array per row with interpreted struct comparators.
  * At the √n list counts a billion-vector corpus needs (nLists ≈
  * 3·10⁴), the sort is ~n·log n interpreted comparisons per ROW and
  * measured ~3.9 ms/row at nLists = 1000 (the r13 knnskew probe —
  * 120 s of the probe's wall was this projection); this kernel is one
  * fused primitive pass with an O(k) insertion buffer, ~30× less work
  * and allocation-free per center.
  *
  * Bit-parity with the composed form (spec-pinned, CosTopKSpec):
  * cosines are [[CosineSim]]'s exact arithmetic (ascending-dimension
  * IEEE folds over min-length, ‖x‖² hoisted — identical value since
  * every center has the same dimension; `sqrt(na)·sqrt(nb)` denom,
  * 0 at zero denom), and the order is the struct sort's descending
  * (cos, pid) with `Double.compare` total order (NaN greatest,
  * -0.0 < 0.0), ties to the LARGER pid. Null embedding → null result
  * (the composed form yields all-null cos structs that no consumer
  * observes — corpus embeddings are non-null; parity documented
  * rather than replicated).
  */
case class CosTopK(child: Expression, centers: Array[Array[Float]],
    pids: Array[Long], k: Int) extends UnaryExpression {

  require(centers.nonEmpty && centers.length == pids.length,
    s"cos_top_k: ${centers.length} centers vs ${pids.length} pids")
  require(centers.forall(_.length == centers.head.length),
    "cos_top_k: ragged centers")
  require(k >= 1, s"cos_top_k: k=$k")

  @transient private lazy val normsSqrt: Array[Double] =
    centers.map(c => math.sqrt(c.foldLeft(0.0)((a, v) =>
      a + v.toDouble * v.toDouble)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cos_top_k expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("pid", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cos_top_k"

  override def nullSafeEval(input: Any): Any =
    CosTopK.compute(input.asInstanceOf[ArrayData], centers, normsSqrt, pids, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("ctkCenters", centers, "float[][]")
    val normsRef = ctx.addReferenceObj("ctkNorms", normsSqrt, "double[]")
    val pidsRef = ctx.addReferenceObj("ctkPids", pids, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.CosTopK.compute($x, $centersRef, " +
        s"$normsRef, $pidsRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): CosTopK =
    copy(child = newChild)
}

object CosTopK {

  /** (cand > slot) under descending (cos, pid): Double.compare total
    * order on cos, larger pid wins ties.
    */
  private def beats(c: Double, p: Long, c2: Double, p2: Long): Boolean = {
    val cmp = java.lang.Double.compare(c, c2)
    cmp > 0 || (cmp == 0 && p > p2)
  }

  def compute(x: ArrayData, centers: Array[Array[Float]],
      normsSqrt: Array[Double], pids: Array[Long], k: Int): GenericArrayData = {
    val ds = centers(0).length
    val xn = x.numElements()
    val n = math.min(xn, ds) // CosineSim's min-length fold
    // ‖x‖² over the SAME n for every center (all centers share ds)
    var na = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      na += xi * xi
      i += 1
    }
    val sqrtNa = math.sqrt(na)
    val m = math.min(k, centers.length)
    val topC = new Array[Double](m)
    val topP = new Array[Long](m)
    var filled = 0
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += x.getFloat(j).toDouble * ctr(j).toDouble; j += 1 }
      val denom = sqrtNa * normsSqrt(c)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      val p = pids(c)
      if (filled < m || beats(cos, p, topC(filled - 1), topP(filled - 1))) {
        // insertion from the tail of the kept prefix
        var pos = math.min(filled, m - 1)
        while (pos > 0 && beats(cos, p, topC(pos - 1), topP(pos - 1))) {
          topC(pos) = topC(pos - 1); topP(pos) = topP(pos - 1)
          pos -= 1
        }
        topC(pos) = cos; topP(pos) = p
        if (filled < m) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      out(r) = new GenericInternalRow(Array[Any](topC(r), topP(r)))
      r += 1
    }
    new GenericArrayData(out)
  }
}
