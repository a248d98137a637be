package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.EventStreams.Ev

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long = 1L, v: Double = 1.0) =
    Ev(id, ts(minute), user, "click", v)

  test("tumbling window aggregates by event time and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(input.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode("append").start()
    // window [10:00,10:10): 2 events; [10:10,10:20): 1 event
    input.addData(ev(1, 1), ev(2, 5), ev(3, 12))
    q.processAllAvailable()
    // advance watermark far past 10:20 -> both windows close
    input.addData(ev(4, 60))
    q.processAllAvailable()
    // a very late row for the closed first window must be dropped
    input.addData(ev(5, 2))
    q.processAllAvailable()
    val rows = spark.table("tumbling")
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(rows("10:00") === 2)
    assert(rows("10:10") === 1)
  }

  test("sliding windows: every event lands in size/slide overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.slidingCounts(input.toDF(), "10 minutes", "5 minutes",
        "10 minutes")
      .writeStream.format("memory").queryName("sliding").outputMode("append").start()
    // 10:07 → windows [10:00,10:10) and [10:05,10:15); 10:08 the same;
    // 10:12 → [10:05,10:15) and [10:10,10:20)
    input.addData(ev(1, 7), ev(2, 8), ev(3, 12))
    q.processAllAvailable()
    input.addData(ev(4, 60)) // close everything via the watermark
    q.processAllAvailable()
    val rows = spark.table("sliding")
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(rows("10:00") === 2)
    assert(rows("10:05") === 3)
    assert(rows("10:10") === 1)
  }

  test("stateful sessionization closes sessions on gap and on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    // user 1: events at 10:00, 10:10 (one session), then 11:00 (> 30min
    // gap -> closes session 1, opens session 2)
    input.addData(ev(1, 0), ev(2, 10))
    q.processAllAvailable()
    input.addData(ev(3, 60))
    q.processAllAvailable()
    // push the watermark far ahead so session 2 times out
    input.addData(ev(9, 300, user = 2L))
    q.processAllAvailable()
    input.addData(ev(10, 600, user = 2L))
    q.processAllAvailable()
    val rows = spark.table("sessions")
      .filter(col("user_id") === 1L)
      .select("session_seq", "n_events").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    assert(rows(1L) === 2) // first session: 2 events
    assert(rows(2L) === 1) // second session closed by timeout
  }

  test("sessionize never moves session state backwards on late events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS(), "2 hours")
      .writeStream.format("memory").queryName("late_sessions").outputMode("append").start()
    // events at 10:20 then a LATE event at 10:05 (within watermark and
    // within the 30-min gap): last must stay 10:20, start must move
    // back to 10:05 — then 10:55 is still within gap of 10:20 (35 min
    // after 10:20 would NOT be; 10:55 is exactly 35 min after 10:20,
    // so use 10:45 to stay inside)
    input.addData(ev(1, 20))
    q.processAllAvailable()
    input.addData(ev(2, 5)) // late, within gap
    q.processAllAvailable()
    input.addData(ev(3, 45)) // 25 min after the true last (10:20)
    q.processAllAvailable()
    // close by gap: next event far ahead
    input.addData(ev(4, 300))
    q.processAllAvailable()
    val rows = spark.table("late_sessions")
      .filter(col("user_id") === 1L)
      .select("session_seq", "n_events", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Timestamp]("session_start"))).sortBy(_._1)
    q.stop()
    // if the late event had shrunk `last` to 10:05, the 10:45 event
    // (40 min later) would have split the session into two
    assert(rows.head._1 === 1L)
    assert(rows.head._2 === 3L, s"session split by late event: ${rows.toSeq}")
    assert(rows.head._3 === ts(5)) // start corrected to the earliest
  }

  test("a straggler more than a gap before the open session becomes its own session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS(), "3 hours")
      .writeStream.format("memory").queryName("stray_sessions").outputMode("append").start()
    input.addData(ev(1, 120)) // open session at 12:00
    q.processAllAvailable()
    // late event at 10:00 — 2h before the open session's start, far
    // outside the 30-min gap: must NOT stretch the session backwards
    input.addData(ev(2, 0))
    q.processAllAvailable()
    input.addData(ev(3, 130)) // still merges into the open session
    q.processAllAvailable()
    input.addData(ev(4, 600)) // closes the open session by gap
    q.processAllAvailable()
    val rows = spark.table("stray_sessions")
      .filter(col("user_id") === 1L)
      .select("session_seq", "n_events", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Timestamp]("session_start"))).sortBy(_._1)
    q.stop()
    // seq 1: the singleton straggler (earlier in event time);
    // seq 2: the 12:00-12:10 session with 2 events
    assert(rows.length >= 2, s"got ${rows.toSeq}")
    assert(rows(0) === ((1L, 1L, ts(0))))
    assert(rows(1)._1 === 2L && rows(1)._2 === 2L && rows(1)._3 === ts(120))
  }

  test("session_seq continues after a timeout (no duplicate keys)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("seq_sessions").outputMode("append").start()
    input.addData(ev(1, 0))
    q.processAllAvailable()
    // advance the watermark well past 0:00 + gap via another user ->
    // user 1's open session times out and closes as seq 1
    input.addData(ev(2, 300, user = 9L))
    q.processAllAvailable()
    // a NEW user-1 session after the timeout must be seq 2, not seq 1
    input.addData(ev(3, 330))
    q.processAllAvailable()
    input.addData(ev(4, 700, user = 9L)) // time out user 1's 2nd session
    q.processAllAvailable()
    val seqs = spark.table("seq_sessions")
      .filter(col("user_id") === 1L)
      .select("session_seq").collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    assert(seqs === Seq(1L, 2L), s"duplicate/missing session_seq: $seqs")
  }

  test("same-batch stragglers within a gap merge into one session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS(), "6 hours")
      .writeStream.format("memory").queryName("stray2_sessions").outputMode("append").start()
    input.addData(ev(1, 240)) // open session at 14:00
    q.processAllAvailable()
    // two late events at 10:00 and 10:10 in ONE batch: both are more
    // than a gap before 14:00, and within a gap of each other — the
    // batch twin would put them in one session, so must we
    input.addData(ev(2, 0), ev(3, 10))
    q.processAllAvailable()
    input.addData(ev(4, 900)) // close the open session by gap
    q.processAllAvailable()
    val rows = spark.table("stray2_sessions")
      .filter(col("user_id") === 1L)
      .select("session_seq", "n_events", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Timestamp]("session_start"))).sortBy(_._1)
    q.stop()
    assert(rows.length >= 2, s"got ${rows.toSeq}")
    assert(rows(0) === ((1L, 2L, ts(0))), s"stragglers not merged: ${rows.toSeq}")
    assert(rows(1)._1 === 2L && rows(1)._2 === 1L && rows(1)._3 === ts(240))
  }

  test("an event bridging a straggler and the open session merges all three") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS(), "3 hours")
      .writeStream.format("memory").queryName("bridge_sessions").outputMode("append").start()
    input.addData(ev(1, 120)) // open session at 12:00
    q.processAllAvailable()
    // one late batch: 11:20 (a straggler, > gap before 12:00) and
    // 11:35 (within a gap of BOTH 11:20 and 12:00). The batch twin
    // sees one 11:20-12:00 session — the bridge event must pull the
    // straggler into the open session, not close it separately
    input.addData(ev(2, 80), ev(3, 95))
    q.processAllAvailable()
    input.addData(ev(4, 600)) // close the merged session by gap
    q.processAllAvailable()
    input.addData(ev(5, 900)) // close the 600 session
    q.processAllAvailable()
    val rows = spark.table("bridge_sessions")
      .filter(col("user_id") === 1L)
      .select("session_seq", "n_events", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Timestamp]("session_start"))).sortBy(_._1)
    q.stop()
    assert(rows.nonEmpty, "no sessions emitted")
    assert(rows(0) === ((1L, 3L, ts(80))), s"straggler not bridged: ${rows.toSeq}")
  }

  test("tombstone TTL reclaims state; seq continuity holds within the TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val ttl = Some(30L * 60 * 1000) // 30 min past gap-close
    val q = EventStreams.sessionize(input.toDS(), "1 minute", tombstoneTtlMs = ttl)
      .writeStream.format("memory").queryName("ttl_sessions").outputMode("append").start()
    input.addData(ev(1, 0)) // user 1 session A
    q.processAllAvailable()
    input.addData(ev(2, 60, user = 9L)) // watermark 0:59 -> A times out (0:30); tombstone GC armed for 1:00
    q.processAllAvailable()
    input.addData(ev(3, 70)) // user 1 returns WITHIN the TTL -> must continue as seq 2
    q.processAllAvailable()
    input.addData(ev(4, 200, user = 9L)) // times out session B (1:40); re-arms tombstone GC for 2:10
    q.processAllAvailable()
    input.addData(ev(5, 210, user = 9L)) // watermark 3:29 -> tombstone GC fires, state removed
    q.processAllAvailable()
    input.addData(ev(6, 220)) // user 1 returns AFTER the TTL -> fresh state, seq restarts at 1
    q.processAllAvailable()
    input.addData(ev(7, 400, user = 9L)) // times out session C
    q.processAllAvailable()
    val rows = spark.table("ttl_sessions")
      .filter(col("user_id") === 1L)
      .select("session_seq", "session_start").collect()
      .map(r => (r.getLong(0), r.getAs[Timestamp]("session_start")))
      .sortBy(_._2.getTime)
    q.stop()
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 1L),
      s"expected seq continuity inside TTL and a restart after it: ${rows.toSeq}")
  }

  test("stream-stream interval join pairs clicks with in-window purchases only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    def typed(id: Long, minute: Int, tpe: String, user: Long = 1L) =
      Ev(id, ts(minute), user, tpe, 1.0)
    val q = EventStreams.clickPurchaseJoin(input.toDF())
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    input.addData(
      typed(1, 0, "click"),          // joined by purchase at 10:30
      typed(2, 30, "purchase"),
      typed(3, 90, "purchase"),      // 90 min after click 1: outside window
      typed(4, 30, "purchase", user = 2L), // other user: no match
      typed(5, 80, "click"))         // joined by purchase at 10:90
    q.processAllAvailable()
    // advance both watermarks so all inner-join results are emitted
    input.addData(typed(9, 600, "view"))
    q.processAllAvailable()
    val rows = spark.table("ssjoin")
      .select("click_id", "purchase_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    q.stop()
    assert(rows === Seq(1L -> 2L, 5L -> 3L), s"wrong join pairs: $rows")
  }

  test("stream-static enrichment joins the broadcast dim, keeps unmatched rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    val q = EventStreams.enrichWithDim(input.toDF(), dim)
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    input.addData(ev(1, 0, user = 1), ev(2, 1, user = 2), ev(3, 2, user = 9))
    q.processAllAvailable()
    // stateless: a SECOND batch joins the same dim with no watermark
    // interplay — user 9 stays unmatched (null tier), matched users
    // re-enrich identically
    input.addData(ev(4, 3, user = 1), ev(5, 4, user = 9))
    q.processAllAvailable()
    val rows = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2)).getOrElse("-")).toMap
    q.stop()
    assert(rows === Map(1L -> "gold", 2L -> "silver", 3L -> "-",
      4L -> "gold", 5L -> "-"))
  }

  test("streaming heavy hitters accumulate across micro-batches with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = TextStreams.topTokens(input.toDF().toDF("text"), budget = 256)
      .writeStream.format("memory").queryName("hh").outputMode("complete").start()
    input.addData("spark spark spark flink", "spark beam")
    q.processAllAvailable()
    val first = spark.table("hh").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first === Map("spark" -> 4L, "flink" -> 1L, "beam" -> 1L))
    // a later batch REDUCES INTO the sketch state (no recount of the
    // first batch): counts are cumulative over the whole stream
    input.addData("flink flink flink flink")
    q.processAllAvailable()
    val second = spark.table("hh").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(second === Map("spark" -> 4L, "flink" -> 5L, "beam" -> 1L))
  }

  test("dropDuplicatesWithinWatermark removes dups inside horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupStream(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    input.addData(ev(1, 0), ev(1, 1), ev(2, 2)) // id 1 duplicated
    q.processAllAvailable()
    input.addData(ev(1, 3), ev(3, 4)) // another dup of id 1
    q.processAllAvailable()
    val n = spark.table("dedup").select("event_id").distinct().count()
    val total = spark.table("dedup").count()
    q.stop()
    assert(n === 3)
    assert(total === 3)
  }
}
