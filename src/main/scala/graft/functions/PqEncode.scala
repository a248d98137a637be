package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native product-quantization encoder: for each of `m` contiguous
  * `ds`-dim subspaces of a float-array embedding, the id of the
  * L2-nearest of `k` centers — argmin ‖x−c‖² = argmax (dot(x,c) −
  * ‖c‖²/2), ties to the LARGER code (the `bestOf` struct-max
  * convention of the HOF formulation it replaces, which this is
  * fuzz-pinned bit-identical to: same dimension-order dot fold, same
  * precomputed scala-sum half-norms).
  *
  * Why native (the D13 escape hatch, the round-8 rule): the HOF form
  * is m·k `aggregate(zip_with(…))` folds per row — 256 interpreter
  * lambdas with boxed accumulators at the default (m=16, k=16) — plus
  * an `array_sort` of k structs per subspace. This is ONE primitive
  * triple loop (m·k·ds fused multiply-adds) that stays inside
  * WholeStageCodegen; the encode runs over the whole corpus once per
  * codebook-training iteration and once at index build, so it is the
  * IVF-PQ family's dominant CPU.
  *
  * `centers(mi*k + code)` is that slot's center (ds doubles);
  * `halfNorms(mi*k + code)` its precomputed ‖c‖²/2. Fixed-constructor
  * expression (the TermTfs/WordSetHits convention) — not
  * SQL-registered.
  */
// Array params ⇒ reference (not structural) case-class equality: plan
// canonicalization never dedups two identical PqEncode instances.
// Intentional — one instance per plan, primitive arrays keep the
// per-row loop allocation-free (see the same note on CosBest).
case class PqEncode(child: Expression, centers: Array[Array[Double]],
    m: Int, k: Int, ds: Int) extends UnaryExpression {

  require(centers.length == m * k,
    s"pq_encode: ${centers.length} centers for m=$m k=$k")
  require(centers.forall(_.length == ds),
    s"pq_encode: center dim != $ds")

  @transient private lazy val halfNorms: Array[Double] =
    centers.map(c => c.map(x => x * x).sum / 2.0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], centers, halfNorms, m, k, ds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // erased Java types: double[][] / double[] (the TermTfs lesson —
    // a wrong class name fails Janino silently under the default
    // fallback; the strict-codegen spec pins compilation)
    val centersRef = ctx.addReferenceObj("pqCenters", centers, "double[][]")
    val halfRef = ctx.addReferenceObj("pqHalfNorms", halfNorms, "double[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PqEncode.compute($s, $centersRef, " +
        s"$halfRef, $m, $k, $ds);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {

  def compute(x: ArrayData, centers: Array[Array[Double]],
      halfNorms: Array[Double], m: Int, k: Int, ds: Int): GenericArrayData = {
    if (x.numElements() < m * ds)
      throw new IllegalArgumentException(
        s"pq_encode: embedding dim ${x.numElements()} < ${m * ds}")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      // a null element nulls every cell's dot fold in the HOF form,
      // and an all-null-score struct array sorts to the LARGEST code
      // (review finding: the silent getFloat read diverged)
      var hasNull = false
      var j0 = 0
      while (j0 < ds && !hasNull) {
        if (x.isNullAt(mi * ds + j0)) hasNull = true
        j0 += 1
      }
      if (hasNull) codes(mi) = k - 1
      else {
        var best = Double.NegativeInfinity
        var bestCode = 0
        var have = false
        var c = 0
        while (c < k) {
          val ctr = centers(mi * k + c)
          var dot = 0.0
          var j = 0
          while (j < ds) {
            dot += x.getFloat(mi * ds + j).toDouble * ctr(j)
            j += 1
          }
          val s = dot - halfNorms(mi * k + c)
          // Double.compare is the total order Spark's struct sort uses
          // (NaN greatest — review finding: a plain >= never lets a
          // NaN score win, diverging from the HOF's array_sort);
          // ascending code with >=-update keeps ties on the larger code
          val cmp = java.lang.Double.compare(s, best)
          if (!have || cmp >= 0) { best = s; bestCode = c; have = true }
          c += 1
        }
        codes(mi) = bestCode
      }
      mi += 1
    }
    new GenericArrayData(codes)
  }
}
