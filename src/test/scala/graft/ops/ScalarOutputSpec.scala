package graft.ops

import org.apache.spark.sql.types.{ArrayType, MapType, StructType, StructField}
import graft.SparkSpec

/** Harness-compat guard with teeth (round 10; the round-9 lesson):
  * the driver's oracle gate hash-compares query output through a
  * pandas `sort_values` → `factorize` pass, which CRASHES on
  * array/map/struct cells (`unhashable type: numpy.ndarray`) — two
  * round-9 operators (`bpe_encode`, `embed_quantize`) shipped list
  * columns and their oracles were never actually compared. This spec
  * makes that class of red row structurally impossible: every
  * registered query's ANALYZED schema must be scalar-only. Schema
  * derivation is lazy (no job runs for most queries), so the guard is
  * cheap; operators that want arrays serialize them in the final
  * projection (`array_join`) exactly like their oracles do.
  */
class ScalarOutputSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def nested(f: StructField): Boolean = f.dataType match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("every registered query ships scalar columns only — the driver compare is the contract") {
    val offenders = Registry.all.flatMap { q =>
      val schema = q.fn(spark, dir).schema
      val bad = schema.fields.filter(nested)
      if (bad.isEmpty) None
      else Some(s"${q.name}: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"non-scalar output columns (driver's pandas hash cannot compare them):\n  ${offenders.mkString("\n  ")}")
  }

  test("the guard itself has teeth: a list-typed column is flagged") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "syms")
    assert(df.schema.fields.exists(nested))
  }
}
