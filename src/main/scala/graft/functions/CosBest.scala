package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Native cosine-argmax: `struct(cos, pid)` of the best of a fixed
  * center set for a float-array embedding — the k-means / SemDeDup /
  * k-means|| assignment kernel (`Similarity.bestOf`).
  *
  * Why native (the D13 escape hatch): the HOF formulation evaluates
  * k `aggregate(zip_with(…))` dot folds + one norm fold + an
  * `array_sort` of k structs per row — interpreter lambdas that
  * dominate embed_kmeans/dedup_semantic CPU. This is one fused
  * primitive loop, bit-identical by construction and fuzz-pinned
  * (CosBestSpec): same ascending-dimension IEEE fold order for dot
  * and ‖x‖², the same driver-precomputed `sqrt(Σc²)`, cos = 0 at zero
  * denom, and the same struct-max tie-break (max cos then max pid,
  * NaN greatest — `Double.compare` semantics) the
  * `reverse(array_sort(…))` performs.
  *
  * Null semantics replicate the HOF exactly: a null embedding, any
  * null element, or a length ≠ ds all null every cell's cos (a null
  * product nulls the whole fold), and an all-null-cos struct array
  * sorts to (null, max pid) — so the result struct itself is NEVER
  * null, only its cos field can be.
  */
// The Array constructor params make case-class equality REFERENCE
// equality (arrays don't define structural ==): two semantically
// identical CosBest instances never compare equal, so Catalyst's
// canonicalization / common-subexpression elimination never dedups
// them. Intentional: each plan builds its CosBest once (centers come
// from one driver-side training pass), so nothing is lost, and the
// primitive arrays keep the hot loop allocation-free — a Seq[Seq[_]]
// would box every element per row.
case class CosBest(child: Expression, centers: Array[Array[Double]],
    pids: Array[Int]) extends UnaryExpression {

  require(centers.nonEmpty && centers.length == pids.length,
    s"cos_best: ${centers.length} centers vs ${pids.length} pids")
  require(centers.forall(_.length == centers.head.length),
    "cos_best: ragged centers")

  @transient private lazy val normsSqrt: Array[Double] =
    centers.map(c => math.sqrt(c.foldLeft(0.0)((a, v) => a + v * v)))
  @transient private lazy val maxPid: Int = pids.max

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cos_best expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = true),
    StructField("pid", IntegerType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "cos_best"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CosBest.compute(v.asInstanceOf[ArrayData], centers, normsSqrt, pids, maxPid)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val centersRef = ctx.addReferenceObj("cbCenters", centers, "double[][]")
    val normsRef = ctx.addReferenceObj("cbNorms", normsSqrt, "double[]")
    val pidsRef = ctx.addReferenceObj("cbPids", pids, "int[]")
    val code = code"""
      ${childGen.code}
      InternalRow ${ev.value} = graft.functions.CosBest.compute(
        ${childGen.isNull} ? null : ${childGen.value},
        $centersRef, $normsRef, $pidsRef, $maxPid);
    """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CosBest =
    copy(child = newChild)
}

object CosBest {

  def compute(x: ArrayData, centers: Array[Array[Double]],
      normsSqrt: Array[Double], pids: Array[Int], maxPid: Int): InternalRow = {
    val ds = centers(0).length
    if (x == null || x.numElements() != ds)
      return new GenericInternalRow(Array[Any](null, maxPid))
    // one pass: detect null elements and accumulate ‖x‖² dim-order
    var na = 0.0
    var i = 0
    while (i < ds) {
      if (x.isNullAt(i))
        return new GenericInternalRow(Array[Any](null, maxPid))
      val xi = x.getFloat(i).toDouble
      na += xi * xi
      i += 1
    }
    val sqrtNa = math.sqrt(na)
    var best = 0.0
    var bestPid = 0
    var have = false
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var dot = 0.0
      var j = 0
      while (j < ds) { dot += x.getFloat(j).toDouble * ctr(j); j += 1 }
      val denom = sqrtNa * normsSqrt(c)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      // max (cos, pid) with NaN greatest — Double.compare is exactly
      // the total order Spark's struct sort uses on doubles
      val cmp = java.lang.Double.compare(cos, best)
      if (!have || cmp > 0 || (cmp == 0 && pids(c) > bestPid)) {
        best = cos; bestPid = pids(c); have = true
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestPid))
  }
}
