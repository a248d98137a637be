package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct word-3-gram shingle ids of a
  * text column in ONE pass over the UTF-8 bytes.
  *
  * Bit-identical to the SQL formulation it replaces
  * (`array_distinct` over `xxhash64(t_i, t_i+1, t_i+2)` of
  * `transform(split(text, "\\s+"), t => xxhash64(t))`), pinned by
  * spec, including the split quirks: a leading separator yields an
  * empty first token, a trailing separator an empty last token, and
  * `\s` is ASCII-only (a non-breaking space is token content). Token
  * hashes are Spark's `xxhash64` (XXH64 over the token's UTF-8 bytes,
  * seed 42) computed straight off the original string buffer — no
  * token substrings, no token array, no zipped slice structs are ever
  * allocated; distinct keeps first-occurrence order via open
  * addressing. The separator scan is byte-wise: all `\s` separators
  * are single-byte ASCII and UTF-8 continuation bytes are >= 0x80, so
  * multi-byte code points can never be split.
  *
  * The SQL chain allocated ~5 arrays per row (token strings, token
  * hashes, three slices, zip structs, shingle array) before
  * `array_distinct`; this is the dedup corpus build's hot projection
  * at any scale. One divergence: null text returns null here, where
  * the `when(size >= 3, ...)` SQL shape returned an empty array — both
  * are dropped by the corpus's `size(sh) > 0` filter, so no operator
  * observes the difference.
  */
case class ShingleIds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_ids expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_ids"

  override def nullSafeEval(input: Any): Any =
    ShingleIds.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleIds.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): ShingleIds =
    copy(child = newChild)
}

object ShingleIds {

  private val Seed = 42L // Spark's xxhash64 seed

  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** One pass: tokenize (Java `split("\\s+", -1)` semantics), hash
    * each token's bytes, roll 3-gram hashes, dedup preserving first
    * occurrence. Called from both interpreted eval and generated code.
    */
  def compute(s: UTF8String): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()

    var tokHashes = new Array[Long](math.min(64, n / 2 + 2))
    var tokCount = 0
    def addTok(start: Int, end: Int): Unit = {
      if (tokCount == tokHashes.length)
        tokHashes = java.util.Arrays.copyOf(tokHashes, tokCount * 2)
      tokHashes(tokCount) =
        XXH64.hashUnsafeBytes(base, off + start, end - start, Seed)
      tokCount += 1
    }

    var i = 0
    var start = 0
    while (i < n) {
      if (isSep(Platform.getByte(base, off + i))) {
        addTok(start, i)
        i += 1
        while (i < n && isSep(Platform.getByte(base, off + i))) i += 1
        start = i
      } else i += 1
    }
    addTok(start, n) // also the trailing empty token after a final sep

    if (tokCount < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

    val m = tokCount - 2
    val out = new Array[Long](m)
    var outN = 0
    // capacity math in Long (`m * 2` overflows Int for m >= 2^30,
    // leaving cap at 8 and turning the full-table linear probe below
    // into an infinite loop), with the ceiling at 2^26 shingles: a
    // MEMORY-realistic bound (cap 2^27 longs = 1 GiB probe table for
    // a >=128 MiB single doc), so the guard fires before the executor
    // OOMs rather than only at the theoretical int-overflow bound.
    val need = m.toLong * 2
    if (need > (1L << 27))
      throw new IllegalArgumentException(
        s"shingle_ids: document has $m shingles; max supported is ${1 << 26}")
    var cap = 8
    while (cap < need) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var j = 0
    while (j < m) {
      // xxhash64(a, b, c) folds children into the running hash
      val id = XXH64.hashLong(tokHashes(j + 2),
        XXH64.hashLong(tokHashes(j + 1), XXH64.hashLong(tokHashes(j), Seed)))
      // finalizer-mixed ids probe well enough with a multiplicative
      // scramble + linear probing
      var p = (java.lang.Long.hashCode(id * -7046029254386353131L)) & mask
      var state = 0 // 0 = probing, 1 = fresh, 2 = seen before
      while (state == 0) {
        if (!used(p)) state = 1
        else if (table(p) == id) state = 2
        else p = (p + 1) & mask
      }
      if (state == 1) {
        table(p) = id; used(p) = true
        out(outN) = id; outN += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (outN == m) out else java.util.Arrays.copyOf(out, outN))
  }
}
