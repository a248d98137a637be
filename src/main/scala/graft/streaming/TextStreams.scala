package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming text-analytics operators (SURVEY §2.E) over a document
  * stream with a `text` column.
  */
object TextStreams {

  /** E8: streaming heavy hitters — the running top tokens of a
    * document stream via the Misra–Gries Aggregator
    * ([[graft.functions.MisraGriesAgg]]). The sketch buffer IS the
    * streaming state: tracking a web-scale vocabulary needs exactly
    * `budget` counters in the state store, not one row per distinct
    * token ever seen (what an exact streaming `groupBy(token).count`
    * accumulates — unbounded, watermark-less state). Each micro-batch
    * reduces into the buffer; guarantees are the batch sketch's, over
    * everything streamed so far: counts are lower bounds within
    * N/(budget+1), and every token with true frequency above that
    * threshold is present.
    *
    * Complete output mode (the result is one small top-k table, the
    * dashboard/monitoring shape this operator serves).
    */
  def topTokens(docs: DataFrame, budget: Int = 256): DataFrame =
    // tokenization and sketch chain shared with the batch twin
    // (text_topk_sketch) — the batch oracle pins THIS code path
    graft.ops.TextOps.sketchOf(graft.ops.TextOps.tokenRows(docs), budget)
}
