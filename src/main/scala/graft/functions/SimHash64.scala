package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 64-bit SimHash of a text column in
  * ONE pass — no token explode, no 64-column vote aggregate, no
  * shuffle stage.
  *
  * Bit-identical (spec-pinned) to the aggregate formulation it
  * replaces: tokens are the Java `split("\\s+", -1)` segments
  * (including empty leading/trailing tokens — every OCCURRENCE votes,
  * duplicates included), each token's xxhash64 (seed 42, straight off
  * the UTF-8 bytes) casts a ±1 vote per bit, and bit b of the result
  * is set iff its vote total is positive. The aggregate version
  * exploded the token stream into (doc_id, token) rows and ran a
  * 64-column partial-aggregated groupBy — correct, map-side-combined,
  * but it materialized every token string and paid an aggregation
  * stage for what is a row-local fold.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SimHash64.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val Seed = 42L

  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)

    def vote(start: Int, end: Int): Unit = {
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }

    var i = 0
    var start = 0
    while (i < n) {
      if (isSep(Platform.getByte(base, off + i))) {
        vote(start, i)
        i += 1
        while (i < n && isSep(Platform.getByte(base, off + i))) i += 1
        start = i
      } else i += 1
    }
    vote(start, n)

    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
