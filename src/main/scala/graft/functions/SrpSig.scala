package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expression: ALL sign-random-projection (SRP) LSH
  * bucket signatures of a float-vector column in one row-local pass —
  * element t of the result is table t's `planes`-bit bucket.
  *
  * Bit p of table t is the sign of `Σ_i vec[i] * r(g, i)` with the
  * global plane index `g = t * planes + p` and the deterministic
  * hyperplane family `r(g, i) = ±1` by the parity of Spark's
  * `hash(g, i)` (murmur3: `hashInt(i, hashInt(g, 42))`) — bit-for-bit
  * the buckets the posexplode + partial-aggregated groupBy formulation
  * produces ([[graft.ops.Similarity]]; the projection sum accumulates
  * float components widened to double in index order there too, so
  * even sign-boundary sums agree exactly; spec-pinned in
  * NativeExprFuzzSpec). What changes is the plan: the explode turned
  * |corpus| rows into |corpus| × dim rows flowing into a
  * (tables × planes)-column hash aggregate — a full shuffle of the
  * exploded corpus — while this expression computes every projection
  * in a primitive double[] inside the projection that already reads
  * the vector. The signature stage costs zero data movement at any
  * scale. (The CollapseProject recompute blowup that forced the
  * aggregate barrier on the HOF formulation does not apply: a native
  * expression is one opaque node, never re-inlined per consumer.)
  *
  * Null array → null out. A null ELEMENT contributes nothing to any
  * projection (the SQL `sum` skips the null `when` branch the same
  * way). An EMPTY array yields bucket 0 in every table — the one
  * divergence from the explode formulation, where a doc with no
  * components vanishes from the aggregate's output entirely (graft's
  * operators never feed empty embeddings; callers that might should
  * filter `size(vec) > 0` first, as the dedup corpus builders do for
  * shingles).
  */
case class SrpSig(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes >= 1 && planes < 63 && tables >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"srp_sig expects (array<float>, 1 <= planes < 63, tables >= 1), got " +
        s"(${child.dataType.simpleString}, $planes, $tables)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_sig"

  override def nullSafeEval(input: Any): Any =
    SrpSig.compute(input.asInstanceOf[ArrayData], planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SrpSig.compute($a, $planes, $tables);")

  override protected def withNewChildInternal(newChild: Expression): SrpSig =
    copy(child = newChild)
}

object SrpSig {
  def compute(arr: ArrayData, planes: Int, tables: Int): ArrayData = {
    val g = planes * tables
    // per-plane seed hashInt(g, 42) — the `hash(lit(g), col("i"))`
    // fold order of the SQL formulation
    val seeds = new Array[Int](g)
    var k = 0
    while (k < g) { seeds(k) = Murmur3_x86_32.hashInt(k, 42); k += 1 }
    val proj = new Array[Double](g)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getFloat(i).toDouble
        k = 0
        while (k < g) {
          if ((Murmur3_x86_32.hashInt(i, seeds(k)) & 1) == 1) proj(k) += x
          else proj(k) -= x
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        // Double.compare, not `>`: Spark's GreaterThan orders NaN
        // above every numeric, so a NaN projection (a NaN/Inf vector
        // component) must set the bit exactly like the SQL
        // formulation's `col > 0` does — plain Java `>` is false for
        // NaN and would silently break the bit-equality pin
        if (java.lang.Double.compare(proj(t * planes + p), 0d) > 0)
          bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
