package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: does the text contain a CJK Unified
  * Ideograph (U+4E00–U+9FFF)? Replaces
  * `regexp_count(text, "[\x{4e00}-\x{9fff}]") > 0` — the language-ID
  * operator's last remaining regex — with a byte scan.
  *
  * The range's UTF-8 encodings are exactly the 3-byte sequences
  * E4 B8 80 … E9 BF BF, so on lead bytes: E5–E8 are always in range,
  * E4 needs a second byte ≥ B8, and every E9-led sequence tops out at
  * U+9FFF. No decode, no regex engine; short-circuits on the first
  * hit (the regex engine scans on even when only existence matters).
  */
case class ContainsCjk(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"contains_cjk expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_cjk"

  override def nullSafeEval(input: Any): Any =
    ContainsCjk.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ContainsCjk.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): ContainsCjk =
    copy(child = newChild)
}

object ContainsCjk {
  def compute(s: UTF8String): Boolean = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var i = 0
    while (i < n - 2) {
      val b = Platform.getByte(base, off + i) & 0xFF
      if (b >= 0xE5 && b <= 0xE9) return true
      if (b == 0xE4 && (Platform.getByte(base, off + i + 1) & 0xFF) >= 0xB8)
        return true
      i += 1
    }
    false
  }
}
