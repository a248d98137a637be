package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expression: the k-slot MinHash signature of a
  * shingle-id array in ONE pass over the row — no explode, no shuffle,
  * no aggregation.
  *
  * Slot j is `min over shingles h of murmur3(j, murmur3(h, 42))`,
  * bit-for-bit the value the SQL formulation
  * `groupBy(doc_id).agg(min(hash(shingle, lit(j))))` produces (Spark's
  * `hash()` folds each child into the running Murmur3 state starting
  * from seed 42: first the long shingle, then the int slot index), so
  * signatures — and therefore LSH bands, candidate pairs and final
  * answers — are identical. What changes is the plan: the explode
  * turns |sets| rows into |sets| x |shingles| rows that all flow into
  * a 64-column hash aggregate (a full shuffle of the exploded corpus,
  * plus partial-agg state per doc); this expression computes the same
  * 64 mins in a primitive int[64] inside the projection that already
  * reads the set — the signature stage costs zero data movement at
  * any scale.
  *
  * Empty arrays yield a signature of Int.MaxValue slots (callers
  * filter empty shingle sets out before signing); null in, null out.
  * A null ELEMENT contributes hashInt(j, 42) to every slot — exactly
  * what `hash(h, lit(j))` returns for h = null (a null child leaves
  * the running Murmur3 state at the seed), so bit-identity with the
  * SQL formulation holds even on arrays with containsNull.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (array<bigint>, k > 0), got " +
        s"(${child.dataType.simpleString}, $k)")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Int.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base =
        if (arr.isNullAt(i)) 42
        else Murmur3_x86_32.hashLong(arr.getLong(i), 42)
      var j = 0
      while (j < k) {
        val v = Murmur3_x86_32.hashInt(j, base)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val m3 = classOf[Murmur3_x86_32].getName
      s"""
         |int[] $mins = new int[$k];
         |java.util.Arrays.fill($mins, Integer.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  int $base = $a.isNullAt($i) ? 42 : $m3.hashLong($a.getLong($i), 42);
         |  for (int $j = 0; $j < $k; $j++) {
         |    int $v = $m3.hashInt($j, $base);
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
