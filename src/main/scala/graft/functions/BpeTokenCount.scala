package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the BPE-ish pre-tokenization count —
  * `regexp_count(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")` — as one
  * DFA pass over the UTF-8 bytes, no regex engine.
  *
  * Bit-identical to the regex by construction (spec-pinned, fuzzed):
  * a maximal ASCII letter run is one match ([A-Za-z]+ is greedy and
  * first in the alternation), each ASCII digit is one match, each
  * remaining code point is one match unless it is ASCII whitespace
  * (Java `\s` is ASCII-only, so a non-breaking space or any non-ASCII
  * code point counts — one match per CODE POINT, which byte-wise means
  * one per non-continuation byte). The regex engine re-examines every
  * position against three alternatives and allocates match objects;
  * this is a branch per byte. Token counting sits in the text-quality
  * and context-packing hot paths, over the FULL text of every
  * document — at 100 TB the regex engine is the projection's cost.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeTokenCount.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var count = 0L
    var i = 0
    while (i < n) {
      val b = Platform.getByte(base, off + i)
      if (isLetter(b)) {
        count += 1
        i += 1
        while (i < n && isLetter(Platform.getByte(base, off + i))) i += 1
      } else if ((b & 0x80) == 0) {
        // ASCII non-letter: digit or punctuation count, whitespace skips
        if (!isSep(b)) count += 1
        i += 1
      } else {
        // non-ASCII code point: always one match; skip its
        // continuation bytes (0b10xxxxxx)
        count += 1
        i += 1
        while (i < n && (Platform.getByte(base, off + i) & 0xC0) == 0x80) i += 1
      }
    }
    count
  }
}
