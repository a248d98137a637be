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
}
