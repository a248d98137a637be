package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators (SURVEY §2.E) over the `events` schema
  * (event_id, ts, user_id, event_type, value). Each has a batch twin
  * in [[graft.ops.Relational]] (`q_tumbling_window`, `q_sessionize`)
  * oracled by the driver; the streaming semantics are spec-tested with
  * MemoryStream feeds.
  *
  * Scale notes: all three shapes keep state partitioned by key
  * (window start / user_id / dedup key) — one shuffle into the
  * stateful operator, state store size bounded by the watermark
  * horizon. That is the standard Structured Streaming recipe that
  * scales to 1000 executors (state is per-partition RocksDB/HDFS-
  * backed at scale; nothing here assumes local mode).
  */
object EventStreams {

  /** E1: event-time tumbling-window aggregation with a watermark.
    * Late rows beyond `watermark` are dropped; closed windows become
    * immutable (Append-mode compatible). Tumbling is the slide ==
    * windowLen special case of [[slidingCounts]] — `window()` with an
    * equal slide plans identically — so the aggregate shape lives
    * once.
    */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    slidingCounts(events, windowLen, windowLen, watermark)

  /** E5: sliding event-time window aggregation — the same watermark
    * machinery as E1, but each event lands in size/slide overlapping
    * windows (`window()` emits one row per covered window before the
    * aggregate, and the state store keys on window start exactly as
    * the tumbling case). Batch twin `q_sliding_window` is
    * DuckDB-oracled.
    */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"), col("sum_value"))

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionAcc(start: Long, last: Long, n: Long, seq: Long)
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
      session_start: Timestamp, closed: Boolean)

  val GapMs: Long = 30 * 60 * 1000

  /** E2: stateful gap-based sessionization via
    * `flatMapGroupsWithState` with event-time timeout — same 30-min
    * gap semantics as the batch `q_sessionize`. Emits a session row
    * whenever a new event closes the previous session, and on
    * watermark timeout for idle users.
    *
    * Session numbering: after a timeout the state is NOT removed — a
    * tombstone (n = 0) keeps the per-user seq counter so a later
    * session never reuses an emitted (user_id, session_seq) key. By
    * default tombstones live forever: state is one small record per
    * user ever seen (the same per-user footprint the batch twin
    * scans), not watermark-bounded — the price of globally unique,
    * monotone seqs. For long-running deployments with high-cardinality
    * user ids, pass `tombstoneTtlMs`: a tombstone re-arms its timeout
    * and is REMOVED once the user has been quiet for gap + TTL —
    * bounded state, with seq uniqueness now guaranteed only for users
    * whose quiet periods stay under the TTL (a user returning later
    * restarts at seq 1).
    *
    * Late stragglers (events more than a gap BEFORE the open
    * session's start) can never join it: consecutive in-batch
    * stragglers within a gap of each other merge into one emitted
    * session, and an in-batch event that BRIDGES the straggler and the
    * open session (lands within a gap of both) merges all three into
    * the open session, matching the batch twin; stragglers split
    * across microbatches each close separately (single-accumulator
    * state — the exact repair of arbitrarily late data is the batch
    * twin's job).
    */
  def sessionize(events: Dataset[Ev], watermark: String = "1 hour",
      tombstoneTtlMs: Option[Long] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n == 0) {
              // a tombstone's TTL expired: reclaim the state record
              state.remove()
              Iterator.empty
            } else {
              // tombstone: keep seq, mark no open session; with a TTL
              // configured, arm a GC timeout, else keep state forever
              state.update(s.copy(n = 0))
              // clamp: Spark rejects a timeout at/below the current
              // watermark, and a very late timeout firing means the
              // TTL may already be in the past when the close fires
              tombstoneTtlMs.foreach(ttl => state.setTimeoutTimestamp(
                math.max(s.last + GapMs + ttl, state.getCurrentWatermarkMs() + 1)))
              Iterator(SessionOut(user, s.seq, s.n, new Timestamp(s.start), closed = true))
            }
          } else {
            // Memory bound: this buffers ONE user's events from ONE
            // microbatch (not the whole stream) — the state store holds
            // only the O(1) SessionAcc between batches. The bound is
            // max(events per user per microbatch); a hot key in a huge
            // microbatch is the failure mode, and the remedy is
            // shrinking the trigger interval (or a merge-sort over
            // pre-sorted shards). Fine at the rates sessionization
            // targets; revisit if a single user can emit millions of
            // events per trigger.
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var acc = state.getOption.orNull
            // open straggler session (sorted => stragglers precede the
            // events that extend the live session)
            var stray: SessionAcc = null
            val out = Seq.newBuilder[SessionOut]
            def closeStray(): Unit = if (stray != null) {
              out += SessionOut(user, stray.seq, stray.n, new Timestamp(stray.start), closed = true)
              stray = null
            }
            for (e <- sorted) {
              val t = e.ts.getTime
              if (acc == null) acc = SessionAcc(t, t, 1, 1)
              else if (acc.n == 0) {
                // tombstone from a timed-out session: continue numbering
                acc = SessionAcc(t, t, 1, acc.seq + 1)
              } else if (t - acc.last > GapMs) {
                closeStray()
                out += SessionOut(user, acc.seq, acc.n, new Timestamp(acc.start), closed = true)
                acc = SessionAcc(t, t, 1, acc.seq + 1)
              } else if (t < acc.start - GapMs) {
                // straggler: more than a gap BEFORE the open session —
                // merge into the open straggler session if within its
                // gap, else start a new one (numbered before the open
                // session, whose seq shifts up)
                if (stray != null && t - stray.last <= GapMs) {
                  stray = stray.copy(last = math.max(stray.last, t), n = stray.n + 1)
                } else {
                  closeStray()
                  stray = SessionAcc(t, t, 1, acc.seq)
                  acc = acc.copy(seq = acc.seq + 1)
                }
              } else {
                // a late-but-within-gap event may arrive with
                // t < acc.last (or slightly before acc.start): never
                // move the session window backwards, or the event-time
                // timeout would shrink and close the session too early
                acc = acc.copy(start = math.min(acc.start, t),
                  last = math.max(acc.last, t), n = acc.n + 1)
                // the event may BRIDGE the open straggler session and
                // the open session (within a gap of both): merge them
                // into one, as the batch twin would. The straggler's
                // seq (the smaller) survives; nothing was emitted with
                // the larger seq, so numbering stays unique.
                if (stray != null && acc.start - stray.last <= GapMs) {
                  acc = SessionAcc(stray.start, acc.last, acc.n + stray.n, stray.seq)
                  stray = null
                }
              }
            }
            closeStray()
            state.update(acc)
            // close the open session once the watermark passes last+gap
            if (acc.n > 0) state.setTimeoutTimestamp(acc.last + GapMs)
            out.result().iterator
          }
      }
  }

  /** E4: stream-stream interval join — clicks joined to the same
    * user's purchases landing within [click, click + 1h]. Both sides
    * carry watermarks and the join condition is time-bounded, so the
    * join state is evicted as the watermarks advance (the unbounded-
    * state trap of an unconstrained stream-stream join is precisely
    * what the interval bound removes): a buffered click can be dropped
    * once the purchase watermark passes click_ts + 1h, a buffered
    * purchase once the click watermark passes purchase_ts. Batch twin
    * (oracled): `q_interval_join`.
    */
  def clickPurchaseJoin(events: DataFrame,
      clickWatermark: String = "1 hour",
      purchaseWatermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", clickWatermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", purchaseWatermark)
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"), col("purchase_id"))
  }

  /** E7: stream-static enrichment join — the standard streaming
    * dimension lookup: every micro-batch broadcast-joins the (small)
    * static side. STATELESS by construction — the static side is
    * complete at every trigger, so no watermark and no state store
    * are involved (unlike the stream-stream join above); left join
    * keeps unmatched stream rows with null dimension columns rather
    * than silently dropping events whose key is missing from the dim.
    *
    * Scale shape: identical to the batch broadcast-dim join
    * (`q3_shipping`) — the dim ships to every executor once per
    * micro-batch plan; for dims too big to broadcast, drop the hint
    * and the same plan becomes a per-batch shuffle join.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** E3: streaming dedup on event_id bounded by the watermark —
    * duplicates arriving within the horizon are dropped, state is
    * evicted beyond it (unbounded-state-free, unlike plain
    * dropDuplicates).
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
