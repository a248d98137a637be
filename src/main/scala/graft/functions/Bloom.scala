package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter primitives shared by the build aggregator and the
  * probe expression — one definition of the probe sequence, so the
  * builder and the prober can never disagree on which bits a key
  * owns.
  *
  * Probes use Kirsch–Mitzenmacher double hashing (2006): bit_i =
  * (h1 + i·h2) mod m with h1 = the 64-bit key itself (callers feed an
  * `xxhash64` of the content digest) and h2 = the splitmix64
  * finalizer of the key, forced odd so the probe sequence never
  * degenerates to a single bit. k probes into an m-bit array give the
  * standard (1 − e^(−kn/m))^k false-positive rate and — the property
  * dedup correctness rests on — ZERO false negatives.
  */
object Bloom {

  /** splitmix64 finalizer (Steele et al. 2014) — the second hash of
    * the double-hashing scheme, forced odd.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) | 1L
  }

  /** Bit index of probe `i` for `key` in an m-bit filter (floor-mod
    * into [0, m)).
    */
  def bitIndex(key: Long, i: Int, numBits: Int): Int = {
    val h = key + i.toLong * mix64(key)
    (((h % numBits) + numBits) % numBits).toInt
  }

  /** Set `key`'s k bits in a mutable word array (builder side). */
  def set(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val m = words.length * 64
    var i = 0
    while (i < numHashes) {
      val idx = bitIndex(key, i, m)
      words(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Probe `key`'s k bits in a column-borne word array (prober side;
    * O(1) `getLong` access, no array copy per row). Called from
    * generated code — keep the signature Java-friendly.
    */
  def mightContain(words: ArrayData, key: Long, numHashes: Int): Boolean = {
    val m = words.numElements() * 64
    var i = 0
    while (i < numHashes) {
      val idx = bitIndex(key, i, m)
      if ((words.getLong(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter build as a typed Aggregator over 64-bit keys: the
  * buffer is the filter's word array, `reduce` sets k bits, `merge`
  * ORs word arrays — associative and commutative, so the build is
  * map-side partial-aggregated and the shuffle carries one
  * numBits/8-byte buffer per partition regardless of input size
  * (the mergeable-summaries shape, like [[MisraGriesAgg]]).
  *
  * Sizing is the caller's contract: m ≈ −n·ln(p)/(ln 2)² bits for n
  * expected keys at false-positive rate p (≈ 1.2 GB for 10⁹ keys at
  * 1% — broadcastable where the exact key set is not).
  */
class BloomBuildAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numBits <= (1 << 30),
    s"numBits capped at 2^30 (128 MiB buffer) in this build, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    Bloom.set(buf, key, numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Native membership probe: `bloom_might_contain(bits, key)` over an
  * array<bigint> filter column (typically one broadcast row
  * cross-joined against the probe side) and a bigint key. Codegen'd;
  * the per-row cost is k word reads off the unsafe array — no
  * deserialization of the filter per row.
  */
case class BloomMightContain(left: Expression, right: Expression,
    numHashes: Int) extends BinaryExpression {
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (array<bigint>, bigint), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bits: Any, key: Any): Any =
    Bloom.mightContain(bits.asInstanceOf[ArrayData],
      key.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"${ev.value} = graft.functions.Bloom.mightContain($b, $k, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
