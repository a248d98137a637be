package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contract pins for D12f (`dedup_audio`, envelope-dHash audio
  * near-dup): a planted quartet — base clip, tiny-perturbation copy,
  * byte-exact copy, envelope-reversed distinct clip — groups exactly
  * as the keep rule demands; hash determinism; and the pigeonhole
  * guard rejects maxHamming > 15.
  */
class DedupAudioSpec extends SparkSpec {

  import spark.implicits._

  /** Minimal RIFF/WAVE writer: 16-bit mono PCM, the shape
    * [[Multimodal.JdkCodec.parseWav]] decodes.
    */
  private def wav(samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000)
      .putShort(2).putShort(16)
    buf.put("data".getBytes(US_ASCII)).putInt(dataLen)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  private val n = 1300
  private val rising = Array.tabulate(n)(k => (k * 6) % 8000 + k * 2)
  private val perturbed = { val a = rising.clone(); a(7) += 3; a(900) -= 2; a }
  private val falling = rising.reverse

  private def mediaDf = Seq(
    (100L, wav(rising), "wav"),
    (101L, wav(perturbed), "wav"),
    (102L, wav(falling), "wav"),
    (103L, wav(rising), "wav"))
    .toDF("media_id", "media", "format")

  test("planted quartet groups by envelope similarity, keep = min id") {
    val out = Multimodal.dedupAudioOn(mediaDf).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("dhash_hi"), r.getAs[Long]("dhash_lo"),
          r.getAs[Long]("keep_id")))).toMap
    assert(out.keySet === Set(100L, 101L, 102L, 103L))
    // exact copy: identical hash, collapses to the base
    assert(out(103L)._1 === out(100L)._1 && out(103L)._2 === out(100L)._2)
    assert(out(103L)._3 === 100L)
    // tiny perturbation: envelope margins dwarf a ±3-sample nudge
    assert(out(101L)._3 === 100L)
    // the reversed-envelope clip is its own group (Hamming ~64)
    assert(out(102L)._3 === 102L)
    val hamming = java.lang.Long.bitCount(out(100L)._1 ^ out(102L)._1) +
      java.lang.Long.bitCount(out(100L)._2 ^ out(102L)._2)
    assert(hamming > 10)
    assert(out(100L)._3 === 100L)
  }

  test("hash is deterministic and duration-proportional windows differ") {
    val twice = Multimodal.dedupAudioOn(mediaDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val again = Multimodal.dedupAudioOn(mediaDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(twice.toSeq === again.toSeq)
  }

  test("incremental admission: history hit drops, clean batch collapses") {
    import org.apache.spark.sql.functions.col
    // history: the rising clip (id 100). batch: its perturbation (300,
    // history-hit -> dropped), the falling clip (301, clean rep), a
    // falling perturbation (302, dominated by 301), an exact copy of
    // falling (303, dominated).
    val media = Seq(
      (100L, wav(rising), "wav"),
      (300L, wav(perturbed), "wav"),
      (301L, wav(falling), "wav"),
      (302L, { val a = falling.clone(); a(11) += 2; wav(a) }, "wav"),
      (303L, wav(falling), "wav"))
      .toDF("media_id", "media", "format")
    val hashed = Multimodal.audioHashFrameOf(media)
    val admitted = Multimodal.dedupAudioIncrementalOn(hashed, splitId = 200L)
      .select(col("media_id")).collect().map(_.getLong(0)).toSet
    assert(admitted === Set(301L))
  }

  test("pigeonhole guard: maxHamming > 15 is refused") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.dedupAudioOn(mediaDf, maxHamming = 16)
    }
    assert(e.getMessage.contains("recall guarantee"))
  }

  test("non-conforming WAVs are skipped, not fatal") {
    // a stereo clip, an 8-bit clip and a truncated RIFF ride along
    // with the quartet: the dedup pass must hash the conforming four
    // and silently pass over the rest (a corpus-wide job cannot
    // abort on one odd file)
    val stereo = {
      val b = wav(rising); b(22) = 2; b // channels := 2
    }
    val eightBit = {
      val b = wav(rising); b(34) = 8; b // bitsPerSample := 8
    }
    val truncated = wav(rising).take(30)
    val mixed = Seq(
      (100L, wav(rising), "wav"),
      (101L, wav(perturbed), "wav"),
      (102L, wav(falling), "wav"),
      (103L, wav(rising), "wav"),
      (200L, stereo, "wav"),
      (201L, eightBit, "wav"),
      (202L, truncated, "wav"))
      .toDF("media_id", "media", "format")
    val out = Multimodal.dedupAudioOn(mixed).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("keep_id")).toMap
    assert(out.keySet === Set(100L, 101L, 102L, 103L)) // skipped, absent
    assert(out(103L) === 100L && out(101L) === 100L && out(102L) === 102L)
  }

  test("envelope comparison is 128-bit exact where the raw product overflows") {
    // sums ~ 32767 * 3e7-sample windows: a*b wraps Long; the unsigned
    // 128-bit compare must still order the true products
    val big = 32767L * 30000000L     // ~9.8e11 (a window's |amp| sum)
    val cnt = 30000000L              // window sample count
    // true products ~2.95e19 > Long.MaxValue: raw a*b has wrapped
    assert(Math.multiplyHigh(big + 1, cnt) > 0)
    assert(Multimodal.JdkCodec.productGt(big + 1, cnt, big, cnt))
    assert(!Multimodal.JdkCodec.productGt(big, cnt, big + 1, cnt))
    assert(!Multimodal.JdkCodec.productGt(big, cnt, big, cnt)) // strict
    // and agrees with plain Long arithmetic in the non-overflow range
    assert(Multimodal.JdkCodec.productGt(7, 5, 6, 5) === (7L * 5 > 6L * 5))
    assert(Multimodal.JdkCodec.productGt(0, 5, 0, 9) === false)
  }
}
