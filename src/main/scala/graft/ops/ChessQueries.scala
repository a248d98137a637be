package graft.ops

/** Chess-pipeline query surface (SURVEY §2.A) — filled in by
  * graft.chess + graft.sources.pgn. Placeholder until the DSv2 PGN
  * source lands.
  */
object ChessQueries {
  val queries: Seq[Q] = Seq.empty
}
