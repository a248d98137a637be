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
        // any foldable int expression works (CAST(64 AS INT), 8*8, …):
        // the builder runs before constant folding, so eval() here
        val k = children(1) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval() match {
              case i: java.lang.Integer => i.intValue()
              case other => throw new IllegalArgumentException(
                s"minhash_sig k must be a non-null integer constant, got $other")
            }
          case e => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer constant, got $e")
        }
        functions.MinHashSig(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("srp_sig"),
      new ExpressionInfo(
        classOf[functions.SrpSig].getName, "srp_sig",
        "srp_sig(vec, planes, tables) - all SRP-LSH bucket signatures of a float array"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "srp_sig expects 3 arguments")
        def intConst(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case c if c.foldable &&
              c.dataType == org.apache.spark.sql.types.IntegerType =>
            c.eval() match {
              case i: java.lang.Integer => i.intValue()
              case other => throw new IllegalArgumentException(
                s"srp_sig $what must be a non-null integer constant, got $other")
            }
          case c => throw new IllegalArgumentException(
            s"srp_sig $what must be an integer constant, got $c")
        }
        functions.SrpSig(children.head,
          intConst(children(1), "planes"), intConst(children(2), "tables"))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[functions.BloomMightContain].getName, "bloom_might_contain",
        "bloom_might_contain(bits, key, k) - probe a bigint-array Bloom filter; " +
          "false means definitely absent"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "bloom_might_contain expects 3 arguments")
        val k = children(2) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval() match {
              case i: java.lang.Integer => i.intValue()
              case other => throw new IllegalArgumentException(
                s"bloom_might_contain k must be a non-null integer constant, got $other")
            }
          case e => throw new IllegalArgumentException(
            s"bloom_might_contain k must be an integer constant, got $e")
        }
        functions.BloomMightContain(children.head, children(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("c4_line_filter"),
      new ExpressionInfo(
        classOf[functions.C4LineFilter].getName, "c4_line_filter",
        "c4_line_filter(text, min_words) - struct(n_lines, kept) of the C4 " +
          "line rule: lines ending in ./!/? with >= min_words tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "c4_line_filter expects 2 arguments")
        val mw = children(1) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval() match {
              case i: java.lang.Integer => i.intValue()
              case other => throw new IllegalArgumentException(
                s"c4_line_filter min_words must be a non-null integer constant, got $other")
            }
          case e => throw new IllegalArgumentException(
            s"c4_line_filter min_words must be an integer constant, got $e")
        }
        functions.C4LineFilter(children.head, mw)
      }))
    // the remaining unary text/dedup scans: same one-arg shape. Each
    // tuple carries its implementing class so DESCRIBE FUNCTION
    // reports the right one (not ShingleIds for all five).
    val unary: Seq[(String, String, Class[_],
        org.apache.spark.sql.catalyst.expressions.Expression =>
          org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
      ("shingle_ids", "distinct word-3-gram shingle ids of a text",
        classOf[functions.ShingleIds], functions.ShingleIds(_)),
      ("simhash64", "64-bit SimHash of a text",
        classOf[functions.SimHash64], functions.SimHash64(_)),
      ("bpe_token_count", "BPE-ish pre-tokenization count",
        classOf[functions.BpeTokenCount], functions.BpeTokenCount(_)),
      ("ws_token_count", "whitespace-token count",
        classOf[functions.WsTokenCount], functions.WsTokenCount(_)),
      ("distinct_token_count", "distinct whitespace-token count",
        classOf[functions.DistinctTokenCount], functions.DistinctTokenCount(_)),
      ("contains_cjk", "true iff the text contains a CJK ideograph",
        classOf[functions.ContainsCjk], functions.ContainsCjk(_)))
    unary.foreach { case (name, desc, cls, build) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name, s"$name(text) - $desc"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(children.length == 1, s"$name expects 1 argument")
          build(children.head)
        }))
    }
  }
}
