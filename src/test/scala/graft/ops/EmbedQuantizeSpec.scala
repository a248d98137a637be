package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbedQuantizeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("embed_quantize: int8 range, max|code| hits 127, bounded round-trip error") {
    val rows = Similarity.embedQuantize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      // codes ship comma-serialized (scalar-only output contract)
      val codes = r.getString(2).split(",").filter(_.nonEmpty).map(_.toInt).toSeq
      val mse = r.getDouble(3)
      assert(codes.forall(c => c >= -127 && c <= 127), "code outside int8 range")
      // symmetric quantization is tight: the max-|x| dimension maps to
      // exactly ±127 (that is what defines the scale)
      if (scale > 0) assert(codes.exists(c => math.abs(c) == 127))
      // per-dim reconstruction error is at most scale/2 (+ float eps),
      // so mse is bounded by (scale/2)^2
      assert(mse <= scale * scale / 4 * (1 + 1e-9),
        s"vec ${r.getLong(0)}: mse $mse exceeds (scale/2)^2")
    }
  }

  test("embed_quantize: hand-computed fixture incl. the zero vector") {
    import spark.implicits._
    val fixture = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(127.0f, -127.0f, 63.5f))
    ).toDF("vec_id", "embedding")
    fixture.createOrReplaceTempView("fixture_emb")
    // mirror the operator's arithmetic on the fixture via the same
    // code path (corpus loading swapped for the fixture)
    val q = Similarity.embedQuantizeOn(fixture).orderBy("vec_id").collect()
    // vec 1: scale = 2/127; codes = round(x * 127 / 2) = [64, -127, 32]
    assert(q(0).getString(2) === "64,-127,32")
    assert(math.abs(q(0).getDouble(1) - 2.0 / 127) < 1e-12)
    // zero vector: scale 0, all-zero codes, zero error
    assert(q(1).getDouble(1) === 0.0)
    assert(q(1).getString(2) === "0,0,0")
    assert(q(1).getDouble(3) === 0.0)
    // vec 3: scale = 1; codes are the rounded values themselves
    assert(q(2).getString(2) === "127,-127,64")
  }
}
