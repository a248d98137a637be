package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   key in `SparkEntry.queries`
  * @param fn     (session, sfDir) => result
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None => driver records a rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    Relational.queries ++ Eda.queries ++ Dedup.queries ++
      Similarity.queries ++ Pca.queries ++ TextOps.queries ++
      Bpe.queries ++ Unigram.queries ++ Multimodal.queries ++ Video.queries ++
      Sampling.queries ++
      ChessQueries.queries
}
