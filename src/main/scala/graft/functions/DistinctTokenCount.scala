package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT whitespace-token count —
  * `size(array_distinct(split(text, "\\s+")))` — without materializing
  * token strings or arrays (the token-diversity signal of the
  * C4/Gopher-style repetition filters; see
  * [[graft.ops.TextOps.textQuality]]).
  *
  * Segmentation is [[WsTokenCount]]'s exactly (Java `split(_, -1)`
  * semantics: segments = `\s+` runs + 1, leading/trailing empties
  * included, `""` → one empty segment). Distinctness is EXACT string
  * equality: segments are keyed by a hash of their bytes in an
  * open-addressed table, and a hash hit falls back to a byte compare —
  * so unlike a count-by-hash shortcut there is no collision
  * undercount, and the result is bit-identical to the built-in
  * formulation (spec-pinned, fuzzed) for documents up to 2^29 tokens
  * (~1 GB of single-char tokens); beyond that this throws loudly
  * where the builtin would still answer — an int-indexed probe table
  * cannot hold more, and the pre-guard capacity loop spun forever.
  * Null in → null out.
  */
case class DistinctTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"distinct_token_count expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "distinct_token_count"

  override def nullSafeEval(input: Any): Any =
    DistinctTokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DistinctTokenCount.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): DistinctTokenCount =
    copy(child = newChild)
}

object DistinctTokenCount {

  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()

    // collect segment bounds (Java split(_, -1): runs + 1 segments)
    var segCount = 1
    var i = 0
    while (i < n) {
      if (isSep(Platform.getByte(base, off + i))) {
        segCount += 1
        i += 1
        while (i < n && isSep(Platform.getByte(base, off + i))) i += 1
      } else i += 1
    }
    val starts = new Array[Int](segCount)
    val ends = new Array[Int](segCount)
    var si = 0
    var start = 0
    i = 0
    while (i < n) {
      if (isSep(Platform.getByte(base, off + i))) {
        starts(si) = start; ends(si) = i; si += 1
        i += 1
        while (i < n && isSep(Platform.getByte(base, off + i))) i += 1
        start = i
      } else i += 1
    }
    starts(si) = start; ends(si) = n

    // open-addressed probe table on segment-byte hashes; a hash hit
    // byte-compares against the stored segment, so distinctness is
    // exact string equality (no collision undercount). Capacity math
    // in Long with the same loud guard as ShingleIds, bounded at 2^26
    // tokens — a MEMORY-realistic ceiling (cap 2^27 ints = 512 MiB of
    // probe table for a >=128 MiB single doc), so the guard fires
    // before the executor OOMs rather than only at the theoretical
    // int-overflow bound.
    val need = segCount.toLong * 2
    if (need > (1L << 27))
      throw new IllegalArgumentException(
        s"distinct_token_count: document has $segCount tokens; max supported is ${1 << 26}")
    var cap = 8
    while (cap < need) cap <<= 1
    val mask = cap - 1
    val slotSeg = new Array[Int](cap) // index into starts/ends, -1 = empty
    java.util.Arrays.fill(slotSeg, -1)

    def segHash(a: Int, b: Int): Long =
      org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(base, off + a, b - a, 42).toLong

    def segEq(x: Int, y: Int): Boolean = {
      val lx = ends(x) - starts(x)
      if (lx != ends(y) - starts(y)) return false
      var j = 0
      while (j < lx) {
        if (Platform.getByte(base, off + starts(x) + j) !=
            Platform.getByte(base, off + starts(y) + j)) return false
        j += 1
      }
      true
    }

    var distinct = 0L
    var k = 0
    while (k < segCount) {
      val h = segHash(starts(k), ends(k))
      var p = java.lang.Long.hashCode(h * -7046029254386353131L) & mask
      var state = 0
      while (state == 0) {
        val slot = slotSeg(p)
        if (slot < 0) state = 1
        else if (segEq(slot, k)) state = 2
        else p = (p + 1) & mask
      }
      if (state == 1) { slotSeg(p) = k; distinct += 1 }
      k += 1
    }
    distinct
  }
}
