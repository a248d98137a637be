package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so pure-SQL users get them too:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT cosine_sim(embedding, query_vec) FROM corpus")
  * }}}
  *
  * (DataFrame users can call `graft.functions.cosine` directly without
  * configuring extensions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[functions.CosineSim].getName, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_sim expects 2 arguments")
        functions.CosineSim(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(
        classOf[functions.MinHashSig].getName, "minhash_sig",
        "minhash_sig(shingle_ids, k) - k-slot MinHash signature of a bigint array"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "minhash_sig expects 2 arguments")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case e => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer literal, got $e")
        }
        functions.MinHashSig(children.head, k)
      }))
  }
}
