package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document length and term
  * frequencies against a FIXED term set, in one pass over the UTF-8
  * bytes. Element 0 of the result is the whitespace-token count dl
  * (`size(filter(split(text, "\\s+"), t -> t <> ''))` — the count of
  * maximal non-`\s` runs; Java `\s` is the six ASCII separators), and
  * element 1+i is the number of tokens byte-equal to `terms(i)`.
  *
  * This is the BM25 scan fused (D27's hot path): the HOF formulation
  * tokenizes the corpus up to three times (the stats branch and the
  * tf branch each rebuild the token array from the scan, and
  * CollapseProject inlines it into both `size()` and `explode()`
  * within the tf branch) and materializes every token string; an
  * attempted `aggregate`-fold rewrite measured 2× SLOWER than the
  * explodes (per-token lambda + struct allocation — SURVEY §8
  * round-8 negative result). This scan allocates nothing per token
  * and only the (terms+1)-long result per row — the document text
  * never becomes token objects at all.
  *
  * Terms must be non-empty, whitespace-free and distinct (checked at
  * construction): each is then exactly one token, so byte equality
  * against a maximal run is the whole match test.
  */
case class TermTfs(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty && terms.distinct == terms &&
      terms.forall(t => t.nonEmpty &&
        !t.exists(c => c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
          c == '\f' || c == '\r')),
    s"term_tfs needs distinct non-empty whitespace-free terms, got $terms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"term_tfs expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_tfs"

  // terms bucketed by byte length; each entry carries its result slot
  @transient private lazy val table: Array[Array[(Array[Byte], Int)]] =
    TermTfs.buildTable(terms)

  @transient private lazy val nTerms: Int = terms.size

  override def nullSafeEval(input: Any): Any =
    TermTfs.compute(input.asInstanceOf[UTF8String], table, nTerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Erased Java type of Array[Array[(Array[Byte], Int)]] — two array
    // dims over Tuple2; a wrong class name here makes every codegen
    // attempt fail Janino compilation and silently fall back to
    // interpreted eval (TermTfsSpec pins this with fallback disabled).
    val tableRef = ctx.addReferenceObj("termTable", table,
      "scala.Tuple2[][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TermTfs.compute($s, $tableRef, $nTerms);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermTfs =
    copy(child = newChild)
}

object TermTfs {

  /** terms bucketed by UTF-8 byte length, tagged with result slots. */
  def buildTable(terms: Seq[String]): Array[Array[(Array[Byte], Int)]] = {
    val tagged = terms.zipWithIndex.map { case (t, i) => t.getBytes("UTF-8") -> i }
    val maxLen = tagged.map(_._1.length).max
    (0 to maxLen).map(l => tagged.filter(_._1.length == l).toArray).toArray
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String, table: Array[Array[(Array[Byte], Int)]],
      nTerms: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val counts = new Array[Long](nTerms + 1)
    var i = 0
    while (i < n) {
      if (!isWs(Platform.getByte(base, off + i))) {
        val start = i
        i += 1
        while (i < n && !isWs(Platform.getByte(base, off + i))) i += 1
        val len = i - start
        counts(0) += 1
        if (len < table.length) {
          val cands = table(len)
          var c = 0
          var done = false
          while (!done && c < cands.length) {
            val w = cands(c)._1
            var j = 0
            while (j < len && w(j) == Platform.getByte(base, off + start + j)) j += 1
            if (j == len) { counts(cands(c)._2 + 1) += 1; done = true }
            c += 1
          }
        }
      } else i += 1
    }
    new GenericArrayData(counts)
  }
}
