package graft.chess

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Crash-point matrix for the resumable-state commit protocol: after
  * a crash at ANY step of a previous commit, resolve() must find the
  * last committed state and a re-run commit() must converge to a
  * clean layout. No Spark needed — plain local-FS directories stand
  * in for the parquet state tables.
  */
class StateSwapSpec extends AnyFunSuite {

  private def fixture(): (FileSystem, String) = {
    val dir = Files.createTempDirectory("state_swap").toString
    val fs = new Path(dir).getFileSystem(new Configuration())
    (fs, dir)
  }

  /** Creates a fake state "table" (a dir with one file marking its
    * generation, plus Spark's _SUCCESS marker unless partial).
    */
  private def write(fs: FileSystem, dir: String, name: String, gen: String,
      partial: Boolean = false): Unit = {
    val p = new Path(dir, name)
    fs.mkdirs(p)
    fs.create(new Path(p, s"gen_$gen")).close()
    if (!partial) fs.create(new Path(p, "_SUCCESS")).close()
  }

  private def genOf(fs: FileSystem, p: Path): String =
    fs.listStatus(p).map(_.getPath.getName).filter(_.startsWith("gen_"))
      .head.stripPrefix("gen_")

  test("fresh dir: no state to resolve; commit promotes the staged state") {
    val (fs, dir) = fixture()
    assert(StateSwap.resolve(fs, dir).isEmpty)
    write(fs, dir, StateSwap.Next, "1")
    StateSwap.commit(fs, dir)
    val cur = StateSwap.resolve(fs, dir).get
    assert(cur.getName === StateSwap.Cur)
    assert(genOf(fs, cur) === "1")
    assert(!fs.exists(new Path(dir, StateSwap.Old)))
    assert(!fs.exists(new Path(dir, StateSwap.Next)))
  }

  test("normal re-commit: cur is retired, next promoted, old dropped") {
    val (fs, dir) = fixture()
    write(fs, dir, StateSwap.Cur, "1")
    write(fs, dir, StateSwap.Next, "2")
    StateSwap.commit(fs, dir)
    assert(genOf(fs, StateSwap.resolve(fs, dir).get) === "2")
    assert(!fs.exists(new Path(dir, StateSwap.Old)))
  }

  test("crash after retire (only old + next on disk): old is resolved, commit converges") {
    val (fs, dir) = fixture()
    write(fs, dir, StateSwap.Old, "1")
    write(fs, dir, StateSwap.Next, "2")
    // the last committed state must still be readable
    assert(genOf(fs, StateSwap.resolve(fs, dir).get) === "1")
    // a re-run (which staged its own next from gen 1) commits cleanly
    // WITHOUT ever deleting old before the new cur exists
    StateSwap.commit(fs, dir)
    assert(genOf(fs, StateSwap.resolve(fs, dir).get) === "2")
    assert(!fs.exists(new Path(dir, StateSwap.Old)))
  }

  test("crash after promote but before cleanup (cur + old): cur wins, next commit drops old") {
    val (fs, dir) = fixture()
    write(fs, dir, StateSwap.Old, "1")
    write(fs, dir, StateSwap.Cur, "2")
    assert(genOf(fs, StateSwap.resolve(fs, dir).get) === "2")
    write(fs, dir, StateSwap.Next, "3")
    StateSwap.commit(fs, dir)
    assert(genOf(fs, StateSwap.resolve(fs, dir).get) === "3")
    assert(!fs.exists(new Path(dir, StateSwap.Old)))
  }

  test("partial cur (no _SUCCESS) with old present: old wins — non-atomic rename guard") {
    val (fs, dir) = fixture()
    write(fs, dir, StateSwap.Old, "1")
    write(fs, dir, StateSwap.Cur, "2", partial = true)
    assert(genOf(fs, StateSwap.resolve(fs, dir).get) === "1")
    // without old, a marker-less cur is still better than nothing
    val (fs2, dir2) = fixture()
    write(fs2, dir2, StateSwap.Cur, "2", partial = true)
    assert(genOf(fs2, StateSwap.resolve(fs2, dir2).get) === "2")
  }

  test("commit without staged state fails loudly") {
    val (fs, dir) = fixture()
    write(fs, dir, StateSwap.Cur, "1")
    val e = intercept[IllegalArgumentException] { StateSwap.commit(fs, dir) }
    assert(e.getMessage.contains("nothing staged"))
    // and the committed state is untouched
    assert(genOf(fs, StateSwap.resolve(fs, dir).get) === "1")
  }
}
