package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Viterbi segmentation of a word under a
  * unigram piece model (Kudo 2018, "Subword Regularization" §3 — the
  * SentencePiece unigram decoder). Given the model as parallel
  * (piece, integer cost) arrays — cost = round((ln T − ln(cnt+1))·1e6),
  * the quantized negative log-probability — returns the minimum-cost
  * segmentation of the word into vocabulary pieces, or null if the
  * word cannot be covered (never happens when every single character
  * is in the vocabulary, the coverage guarantee unigram training
  * maintains).
  *
  * Dynamic programming over code-point positions: dp(i) = min over
  * j ∈ [max(0, i−maxLen), i) with word[j..i) ∈ vocab of
  * dp(j) + cost(word[j..i)). Ties break toward the SMALLEST j (the
  * longest final piece): the scan goes j ascending with a strict `<`,
  * which is exactly the (cost, j)-lexicographic minimum the DuckDB
  * oracle's `list_sort(...)[1]` takes — segmentation is engine-exact,
  * not merely cost-equal.
  *
  * Costs are pre-quantized BIGINTs so the dp compares exact integers:
  * no float summation order can flip a comparison between engines.
  * The model rides the expression as a reference object (a hash map —
  * O(1) probes; `element_at` on a literal map would linear-scan the
  * vocabulary for each of the O(len·maxLen) lookups per word). Why a
  * native expression at all: segmentation runs over the corpus
  * VOCABULARY each EM round and over every token join at encode time —
  * the tokenizer-training hot path at 100 TB.
  */
case class UnigramViterbi(child: Expression, pieces: Array[String],
    costs: Array[Long], maxLen: Int) extends UnaryExpression {

  require(pieces.length == costs.length,
    s"unigram_viterbi: ${pieces.length} pieces vs ${costs.length} costs")
  require(maxLen >= 1, s"unigram_viterbi: maxLen $maxLen < 1")

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costs(i)); i += 1 }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_viterbi"

  override def nullSafeEval(input: Any): Any =
    UnigramViterbi.compute(input.asInstanceOf[UTF8String], table, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s => s"""
      |${ev.value} = graft.functions.UnigramViterbi.compute($s, $tableRef, $maxLen);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {

  private val Unreachable = Long.MaxValue

  /** Viterbi over code points (both engines' `substring`/`substr`
    * index by code point, so piece boundaries must too). Returns null
    * when position n is unreachable.
    */
  def compute(word: UTF8String, table: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): GenericArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val cost = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Unreachable
      var bj = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (cost(j) != Unreachable) {
          val c = table.get(new String(cps, j, i - j))
          if (c != null) {
            val cand = cost(j) + c.longValue()
            if (cand < best) { best = cand; bj = j }
          }
        }
        j += 1
      }
      cost(i) = best
      back(i) = bj
      i += 1
    }
    if (cost(n) == Unreachable) return null
    var k = n
    var m = 0
    while (k > 0) { m += 1; k = back(k) }
    val out = new Array[Any](m)
    k = n
    var p = m - 1
    while (k > 0) {
      val j = back(k)
      out(p) = UTF8String.fromString(new String(cps, j, k - j))
      p -= 1
      k = j
    }
    new GenericArrayData(out)
  }
}
