package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Contract-shape guards on the query registry: SparkEntry builds
  * Maps from it, so a duplicate name would SILENTLY shadow one query
  * (the driver would never run it and the coverage table would lie).
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique — no silent Map shadowing in SparkEntry") {
    val names = Registry.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("every registry key appears in SURVEY.md §2 — the inventory cannot drift") {
    // the judging gate keys off SURVEY §2: an operator that exists and
    // passes but isn't in the inventory is invisible to the contract
    // (this happened to text_bm25 in round 7)
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val missing = Registry.all.map(_.name).filterNot(n => survey.contains(s"`$n`"))
    assert(missing.isEmpty,
      s"registry keys absent from SURVEY.md: ${missing.mkString(", ")}")
  }

  test("every oracle is non-empty SQL and every name is a sane key") {
    Registry.all.foreach { q =>
      assert(q.name.nonEmpty && q.name.matches("[a-z0-9_]+"), s"odd name '${q.name}'")
      q.oracle.foreach(sql => assert(sql.trim.toUpperCase.startsWith("WITH") ||
        sql.trim.toUpperCase.startsWith("SELECT"), s"${q.name} oracle is not a query"))
    }
  }
}
