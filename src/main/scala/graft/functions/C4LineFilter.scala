package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native C4 line rule (Raffel et al. 2020 §2.2): split a page on
  * '\n' and keep each line iff it ends in terminal punctuation
  * (./!/?) and holds ≥ `minWords` whitespace-delimited tokens.
  * Returns `struct(n_lines, kept)` — the line count of the page and
  * the surviving lines in order.
  *
  * Why native (the D13 escape hatch): the HOF formulation evaluates,
  * PER LINE, a regex `split("\\s+")` + a lambda `filter` + `size`
  * inside an outer `filter(lines, …)` lambda — nested interpreted
  * HOFs that dominate the text_c4_clean/text_line_filter scan
  * (measured ~10× the page-build cost at sf1). This is one byte pass:
  * '\n' split by byte (0x0A never occurs inside a UTF-8 multi-byte
  * sequence), token count = maximal runs of non-whitespace where
  * whitespace is Java regex `\s` = {space, \t, \n, \x0B, \f, \r}
  * (ASCII-only — exactly `split(l, "\\s+")`'s separator class), and
  * kept lines are zero-copy byte slices. Bit-identical to the HOF
  * form by the fuzz spec, and:
  *  - `split(text, "\n")` keeps trailing empty strings (Spark passes
  *    limit -1), so n_lines = (#'\n') + 1 — including for "" (one
  *    empty line);
  *  - an empty line has no terminal punct and is dropped;
  *  - a leading-whitespace line's empty first split token is not
  *    counted (the HOF filters `t =!= ""`), which run-counting
  *    reproduces for free.
  */
case class C4LineFilter(child: Expression, minWords: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"c4_line_filter expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("kept", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "c4_line_filter"

  override def nullSafeEval(input: Any): Any =
    C4LineFilter.compute(input.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.C4LineFilter.compute($s, $minWords);")

  override protected def withNewChildInternal(newChild: Expression): C4LineFilter =
    copy(child = newChild)
}

object C4LineFilter {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(text: UTF8String, minWords: Int): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val kept = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var nLines = 0L
    var s = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        nLines += 1
        if (i > s) {
          val last = bytes(i - 1)
          if (last == '.' || last == '!' || last == '?') {
            var runs = 0
            var j = s
            var inRun = false
            while (j < i && runs < minWords) {
              val ws = isWs(bytes(j))
              if (!ws && !inRun) { runs += 1; inRun = true }
              else if (ws) inRun = false
              j += 1
            }
            if (runs >= minWords)
              kept += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, s, i))
          }
        }
        s = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nLines,
      new GenericArrayData(kept.toArray[Any])))
  }
}
