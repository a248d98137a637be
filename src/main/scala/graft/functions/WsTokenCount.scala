package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the whitespace-token count —
  * `size(split(text, "\\s+"))` — without materializing the token
  * array.
  *
  * Java `split("\\s+", -1)` segments = separator runs + 1 (a leading
  * separator contributes an empty first segment, a trailing one an
  * empty last segment, and the empty string splits to [""]), so the
  * count is a single byte scan counting `\s+` runs — no token strings,
  * no array, no regex engine. Bit-identical to the `size(split(...))`
  * formulation (spec-pinned, fuzzed) on non-null input.
  *
  * Null semantics: null in → null out. This matches `size(split(...))`
  * under ANSI mode, but DIVERGES from Spark's default (non-ANSI,
  * `spark.sql.legacy.sizeOfNull`) config, where `size(null)` is -1 —
  * a pipeline that fed null texts through the old formulation saw -1
  * where this expression yields null. Call sites that must preserve
  * the -1 convention should `coalesce(ws_token_count(t), lit(-1L))`;
  * graft's own text operators treat null-text rows as null-count rows
  * (documented at [[graft.ops.TextOps]]).
  */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_token_count expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "ws_token_count"

  override def nullSafeEval(input: Any): Any =
    WsTokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WsTokenCount.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

object WsTokenCount {

  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var count = 1L
    var i = 0
    while (i < n) {
      if (isSep(Platform.getByte(base, off + i))) {
        count += 1
        i += 1
        while (i < n && isSep(Platform.getByte(base, off + i))) i += 1
      } else i += 1
    }
    count
  }
}
