package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the number of word-boundary-delimited
  * occurrences of any word from a fixed set —
  * `regexp_count(text, "\\b(w1|w2|...)\\b")` — as one pass over the
  * UTF-8 bytes, no regex engine.
  *
  * Equivalence (spec-pinned, fuzzed): a `\b...\b`-delimited
  * alternation of plain words matches exactly the maximal `\w`-runs
  * that EQUAL one of the words (Java `\w` = ASCII `[A-Za-z0-9_]`; a
  * run cannot extend past either boundary, and a shorter-than-run
  * match would lack the trailing `\b`) AND whose neighboring code
  * points pass Java's `\b` test. The catch — found by the fuzz spec,
  * not by reasoning — is that `\b` is Unicode-aware even though `\w`
  * is ASCII: JDK `Pattern.Bound` checks `codePointBefore`/`At` with
  * `isLetterOrDigit || '_'`, plus a non-spacing-mark clause (a mark
  * "continues" a word when a letter/digit base precedes it). So
  * `\bis\b` does NOT match inside "漢is" (漢 is a letter), while the
  * run segmentation alone says it would. The scan replicates Bound
  * exactly: ASCII neighbors need no decode (all ASCII word chars are
  * also `\w`, so a run's ASCII neighbor is never word-like); non-ASCII
  * neighbors are decoded and put through the same
  * letterOrDigit/underscore/mark logic. Stopword ratios and
  * language-ID profiles run this over the FULL text of every document
  * — with the regex engine that is an alternation automaton plus
  * match-object allocation per hit, per pattern.
  *
  * Words must be non-empty and consist of word chars only (checked at
  * construction) — that is the only shape the equivalence holds for,
  * and the only shape the operators use.
  */
case class WordSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty && words.forall(w =>
      w.nonEmpty && w.forall(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '_')),
    s"word_set_hits needs non-empty ASCII \\w words, got $words")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_set_hits expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "word_set_hits"

  // the set, as UTF-8 byte arrays grouped by length for O(1) skip
  @transient private lazy val table: Array[Array[Array[Byte]]] =
    WordSetHits.buildTable(words)

  override def nullSafeEval(input: Any): Any =
    WordSetHits.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the word table through a codegen object reference — the
    // generated loop calls the same static compute as eval
    val tableRef = ctx.addReferenceObj("wordTable", table,
      "byte[][][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WordSetHits.compute($s, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetHits =
    copy(child = newChild)
}

object WordSetHits {

  /** words bucketed by byte length: table(len) = matching words. */
  def buildTable(words: Seq[String]): Array[Array[Array[Byte]]] = {
    val bytes = words.distinct.map(_.getBytes("UTF-8"))
    val maxLen = bytes.map(_.length).max
    (0 to maxLen).map(l => bytes.filter(_.length == l).toArray).toArray
  }

  private def isWordChar(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Decode the code point whose FIRST byte sits at `i` (valid UTF-8
    * assumed, as UTF8String guarantees).
    */
  private def cpAt(base: AnyRef, off: Long, i: Int): Int = {
    def b(j: Int): Int = Platform.getByte(base, off + j) & 0xFF
    val b0 = b(i)
    if (b0 < 0x80) b0
    else if (b0 < 0xE0) ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F)
    else if (b0 < 0xF0)
      ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
    else
      ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
        ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
  }

  /** First byte of the code point that ends just before `i`. */
  private def cpStartBefore(base: AnyRef, off: Long, i: Int): Int = {
    var j = i - 1
    while (j > 0 && (Platform.getByte(base, off + j) & 0xC0) == 0x80) j -= 1
    j
  }

  private def isNsm(cp: Int): Boolean =
    Character.getType(cp) == Character.NON_SPACING_MARK

  /** Java Bound's left test for a match starting at `start`: the
    * preceding code point is word-like if it is '_' or letterOrDigit,
    * or a non-spacing-mark chain whose base is letterOrDigit
    * (Pattern.hasBaseCharacter — the base must be letterOrDigit, NOT
    * underscore, faithfully to the JDK).
    *
    * TOOLCHAIN PIN: this replicates Pattern.Bound's hasBaseCharacter —
    * an UNDOCUMENTED JDK-internal detail, verified against JDK 17 (the
    * build/deploy JDK). A future JDK could change the surrogate/mark
    * walk and silently diverge from regexp_count; the guard is
    * NativeExprFuzzSpec, which asserts these exact quirk cases (and
    * 10k fuzzed strings) against java.util.regex ON THE RUNNING JDK —
    * keep it in CI on the production JDK when upgrading.
    *
    * The JDK quirk (caught by review, verified against JDK 17):
    * hasBaseCharacter walks UTF-16 CHARS, not code points. Walking
    * leftward it reaches an astral code point at its LOW surrogate
    * first — a lone surrogate is neither letterOrDigit nor a mark, so
    * the walk stops with "no base" and the boundary HOLDS. An astral
    * mark is even stranger: the walk starts at `i - 2`, which is the
    * mark's own low surrogate — immediate "no base". So in the walk:
    * any supplementary code point (mark, letter, anything) → false.
    * Only the direct Bound check (codePointBefore, which does pair up
    * surrogates) sees astral letters as word-like.
    */
  private def wordLikeBefore(base: AnyRef, off: Long, start: Int): Boolean = {
    if (start == 0) return false
    var j = cpStartBefore(base, off, start)
    var cp = cpAt(base, off, j)
    if (cp == '_' || Character.isLetterOrDigit(cp)) return true
    if (!isNsm(cp)) return false
    // hasBaseCharacter on an astral mark starts at its own low
    // surrogate: immediate "no base"
    if (cp > 0xFFFF) return false
    while (j > 0) {
      j = cpStartBefore(base, off, j)
      cp = cpAt(base, off, j)
      if (cp > 0xFFFF) return false // reached at its low surrogate
      if (Character.isLetterOrDigit(cp)) return true
      if (!isNsm(cp)) return false
    }
    false
  }

  /** Java Bound's right test for a match ending at `end` (exclusive):
    * the following code point is word-like if '_'/letterOrDigit, or a
    * non-spacing mark WITH a base — the JDK's base-character walk here
    * starts at `i - 1`, the match's own final char. A final letter or
    * digit is a base; a final UNDERSCORE is not (hasBaseCharacter
    * returns false on anything that is neither letterOrDigit nor a
    * mark), so for a word ending in '_' a following mark does NOT
    * continue the word and the boundary holds (review-caught,
    * JDK-17-verified: count 1 in "a_" + U+0301 but 0 in "ab" +
    * U+0301).
    */
  private def wordLikeAfter(base: AnyRef, off: Long, n: Int, end: Int): Boolean = {
    if (end >= n) return false
    val cp = cpAt(base, off, end)
    if (cp == '_' || Character.isLetterOrDigit(cp)) return true
    if (!isNsm(cp)) return false
    val last = Platform.getByte(base, off + end - 1)
    (last >= 'A' && last <= 'Z') || (last >= 'a' && last <= 'z') ||
      (last >= '0' && last <= '9')
  }

  def compute(s: UTF8String, table: Array[Array[Array[Byte]]]): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var count = 0L
    var i = 0
    while (i < n) {
      if (isWordChar(Platform.getByte(base, off + i))) {
        val start = i
        i += 1
        while (i < n && isWordChar(Platform.getByte(base, off + i))) i += 1
        val len = i - start
        if (len < table.length) {
          val cands = table(len)
          var c = 0
          var hit = false
          while (!hit && c < cands.length) {
            val w = cands(c)
            var j = 0
            while (j < len && w(j) == Platform.getByte(base, off + start + j)) j += 1
            hit = j == len
            c += 1
          }
          // ASCII neighbors can never be word-like (a run is maximal),
          // so the decode only runs beside non-ASCII — rare
          if (hit &&
              !((start > 0 &&
                  (Platform.getByte(base, off + start - 1) & 0x80) != 0 &&
                  wordLikeBefore(base, off, start)) ||
                (i < n && (Platform.getByte(base, off + i) & 0x80) != 0 &&
                  wordLikeAfter(base, off, n, i)))) count += 1
        }
      } else i += 1
    }
    count
  }
}
