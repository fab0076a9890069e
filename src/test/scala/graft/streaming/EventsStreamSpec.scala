package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("streaming tumbling window with watermark drops late data") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.tumblingCounts(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()

    mem.addData(Ev(1, t("10:05"), 1, "click", 1.0), Ev(2, t("10:45"), 1, "click", 1.0))
    q.processAllAvailable()
    // advance watermark far past the 10:00 window
    mem.addData(Ev(3, t("12:30"), 1, "click", 1.0))
    q.processAllAvailable()
    // this event is older than the watermark → must be dropped
    mem.addData(Ev(4, t("10:07"), 1, "click", 1.0))
    q.processAllAvailable()
    // close the 12:00 window too
    mem.addData(Ev(5, t("14:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("tumbling_out").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    assert(out("2024-01-01 10:00:00.0") == 2L) // late event 4 NOT counted
    assert(out("2024-01-01 12:00:00.0") == 1L)
  }

  test("topPaths: session split, prefix cap, deterministic path counts") {
    val df = Seq(
      // user 1, one session: view>click>purchase
      Ev(1, t("10:00"), 1, "view", 0), Ev(2, t("10:05"), 1, "click", 0),
      Ev(3, t("10:10"), 1, "purchase", 0),
      // user 1, second session after the 30-min gap: view>click>purchase again
      Ev(4, t("12:00"), 1, "view", 0), Ev(5, t("12:05"), 1, "click", 0),
      Ev(6, t("12:10"), 1, "purchase", 0),
      // user 2: 7 views in one session → prefix caps at 5
      Ev(7, t("10:00"), 2, "view", 0), Ev(8, t("10:01"), 2, "view", 0),
      Ev(9, t("10:02"), 2, "view", 0), Ev(10, t("10:03"), 2, "view", 0),
      Ev(11, t("10:04"), 2, "view", 0), Ev(12, t("10:05"), 2, "view", 0),
      Ev(13, t("10:06"), 2, "view", 0)
    ).toDF()
    val out = Events.topPaths(df, gapMinutes = 30, maxLen = 5, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("view>click>purchase") == 2L)
    assert(out("view>view>view>view>view") == 1L)
    assert(out.size == 2)
  }

  test("stream-static enrichment matches the batch broadcast join per window") {
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[Ev]
    val q = EventsStream.enrichStream(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()

    mem.addData(
      Ev(1, t("10:05"), 1, "click", 1.25),
      Ev(2, t("10:10"), 1, "click", 2.50),
      Ev(3, t("10:20"), 2, "view", 0.75),
      Ev(4, t("10:25"), 9, "click", 9.99)) // user 9 not in dim → dropped
    // advance the watermark past the 10:00 window so it finalizes
    mem.addData(Ev(5, t("12:30"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("enrich_out")
      .filter(col("window_start") === t("10:00"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out(("BUILDING", "click")) == ((2L, 375.0))) // 125 + 250 cents
    assert(out(("MACHINERY", "view")) == ((1L, 75.0)))
    assert(!out.keySet.exists(_._2 == "unmatched") && out.size == 2)
  }

  test("streaming dropDuplicatesWithinWatermark dedups by event_id") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.dedupWithinWatermark(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    mem.addData(
      Ev(1, t("10:00"), 1, "click", 1.0),
      Ev(1, t("10:01"), 1, "click", 1.0),  // duplicate id within watermark
      Ev(2, t("10:02"), 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0))
    assert(ids.sorted.sameElements(Array(1L, 2L)))
  }

  test("file-source stream over the real events parquet matches the batch aggregate") {
    // copy the events file into a streaming source dir
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val q = EventsStream.tumblingCounts(EventsStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("file_stream_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("file_stream_out")
      .groupBy().sum("n").collect()(0).getLong(0)
    val batch = graft.Tables.events(spark, Sf).count()
    assert(streamed == batch) // every event landed in exactly one window
  }

  test("flatMapGroupsWithState sessionization: gap-close and timeout-close") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.sessionizeStream(mem.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()

    // user 1: two events 10 min apart, then one 50 min later (gap-closes
    // session 1 in-stream)
    mem.addData(Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:10"), 1, "a", 0))
    q.processAllAvailable()
    mem.addData(Ev(3, t("11:00"), 1, "a", 0))
    q.processAllAvailable()
    // user 2 far in the future → watermark passes 11:30 → session 2 of
    // user 1 times out and emits
    mem.addData(Ev(4, t("14:00"), 2, "a", 0))
    q.processAllAvailable()
    mem.addData(Ev(5, t("18:00"), 2, "a", 0)) // advance watermark again
    q.processAllAvailable()
    q.stop()

    val out = spark.table("session_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))
      .toMap
    assert(out((1L, 1L))._1 == 2L) // first session: 2 events
    assert(out((1L, 1L))._2 == t("10:00") && out((1L, 1L))._3 == t("10:10"))
    assert(out((1L, 2L))._1 == 1L) // second session closed by timeout
    // matches the batch window form on the same events
    val batch = Events.sessionize(
      Seq(Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:10"), 1, "a", 0),
        Ev(3, t("11:00"), 1, "a", 0)).toDF())
      .filter(col("user_id") === 1).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(batch(1L) == out((1L, 1L))._1)
    assert(batch(2L) == out((1L, 2L))._1)
  }

  test("sessionizeStream: ids stay unique across timeout-closed sessions") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.sessionizeStream(mem.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("session_ids_out")
      .outputMode("append").start()

    mem.addData(Ev(1, t("10:00"), 1, "a", 0))
    q.processAllAvailable()
    mem.addData(Ev(2, t("12:00"), 2, "a", 0)) // watermark → closes user-1 session 1
    q.processAllAvailable()
    mem.addData(Ev(3, t("13:00"), 1, "a", 0)) // user 1 returns after the timeout
    q.processAllAvailable()
    mem.addData(Ev(4, t("18:00"), 2, "a", 0)) // watermark → closes user-1 session 2
    q.processAllAvailable()
    q.stop()

    val u1 = spark.table("session_ids_out").filter(col("user_id") === 1)
      .collect().map(r => r.getLong(1)).sorted
    // numbering continues (1, 2) — a restart at 1 would emit duplicate keys
    assert(u1.sameElements(Array(1L, 2L)), u1.mkString(","))
  }

  test("sessionizeStream: pre-session straggler becomes its own earlier session (wm > gap)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.sessionizeStream(mem.toDF(), gapMinutes = 30,
        watermarkDelayMinutes = Some(240))
      .writeStream.format("memory").queryName("straggler_out")
      .outputMode("append").start()

    mem.addData(Ev(1, t("12:00"), 1, "a", 0)) // open session at 12:00
    q.processAllAvailable()
    // straggler at 10:00: above the 4h watermark, but > gap before the
    // open session's start → own earlier singleton session
    mem.addData(Ev(2, t("10:00"), 1, "a", 0))
    q.processAllAvailable()
    mem.addData(Ev(3, t("23:00"), 2, "a", 0)) // watermark → close user 1
    q.processAllAvailable()
    mem.addData(Ev(4, t("23:50"), 2, "a", 0))
    q.processAllAvailable()
    q.stop()

    val u1 = spark.table("straggler_out").filter(col("user_id") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getTimestamp(3))).sortBy(_._1)
    assert(u1.length == 2, u1.mkString(","))
    assert(u1(0) == ((1L, 1L, t("10:00"))), u1(0).toString) // straggler singleton
    assert(u1(1)._1 == 2L && u1(1)._2 == 1L && u1(1)._3 == t("12:00"))
  }

  test("sessionizeStream: adjacent stragglers in one batch merge into ONE session (batch parity)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.sessionizeStream(mem.toDF(), gapMinutes = 30,
        watermarkDelayMinutes = Some(240))
      .writeStream.format("memory").queryName("straggler2_out")
      .outputMode("append").start()

    mem.addData(Ev(1, t("12:00"), 1, "a", 0)) // open session at 12:00
    q.processAllAvailable()
    // two stragglers 20m apart — within gap of EACH OTHER, both > gap
    // before the open session: the batch twin merges them into one
    // session; per-event singleton emission would produce two
    mem.addData(Ev(2, t("10:00"), 1, "a", 0), Ev(3, t("10:20"), 1, "a", 0))
    q.processAllAvailable()
    mem.addData(Ev(4, t("23:00"), 2, "a", 0)) // watermark → close user 1
    q.processAllAvailable()
    mem.addData(Ev(5, t("23:50"), 2, "a", 0))
    q.processAllAvailable()
    q.stop()

    val u1 = spark.table("straggler2_out").filter(col("user_id") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))
      .sortBy(_._1)
    assert(u1.length == 2, u1.mkString(","))
    assert(u1(0) == ((1L, 2L, t("10:00"), t("10:20"))), u1(0).toString)
    assert(u1(1)._1 == 2L && u1(1)._2 == 1L && u1(1)._3 == t("12:00"))
  }

  test("e2e: readStream.parquet → sessionizeStream → checkpointed parquet sink, with restart recovery") {
    val base = java.nio.file.Files.createTempDirectory("graft_sess_e2e").toString
    val srcDir = s"$base/src"; val sinkDir = s"$base/sink"; val ckpt = s"$base/ckpt"
    def ns(m: String): Long = Timestamp.valueOf(s"2024-01-01 $m:00").getTime * 1000000L
    def writeBatch(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(srcDir)

    // micro-batch 1: two users, one open session each
    writeBatch(Seq(
      (1L, ns("10:00"), 1L, "click", 1.0, null),
      (2L, ns("10:10"), 1L, "click", 1.0, null),
      (3L, ns("10:05"), 2L, "view", 1.0, null)))
    def startQuery() =
      EventsStream.sessionizeStream(EventsStream.readEvents(spark, srcDir), gapMinutes = 30)
        .writeStream.format("parquet").option("path", sinkDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = startQuery()
    q1.processAllAvailable()
    // micro-batch 2: u1 jumps the gap (gap-close), watermark 11:40−30m=11:10
    // passes u2's 10:05+30m → timeout-close
    writeBatch(Seq(
      (4L, ns("11:30"), 1L, "click", 1.0, null),
      (5L, ns("11:40"), 2L, "view", 1.0, null)))
    q1.processAllAvailable()
    assert(q1.recentProgress.length >= 2, "expected at least two micro-batches")
    q1.stop()

    // restart from the checkpoint: only the NEW file may be processed, and
    // state (open sessions at 11:30/11:40, next ids) must be recovered
    writeBatch(Seq(
      (6L, ns("13:00"), 1L, "click", 1.0, null),
      (7L, ns("13:00"), 2L, "view", 1.0, null)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val sink = spark.read.parquet(sinkDir)
      .select("user_id", "session_id", "n_events", "t_start", "t_end")
    // batch certification: same sessions as the oracle-gated batch form,
    // restricted to sessions the stream has already closed (the 13:00
    // singletons are still open state)
    val batchDf = spark.read.parquet(srcDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val expected = Events.sessionize(batchDf).filter(col("t_start") < lit(Timestamp.valueOf("2024-01-01 12:00:00")))
    val got = sink.orderBy("user_id", "session_id").collect().map(_.toSeq)
    val want = expected.orderBy("user_id", "session_id").collect().map(_.toSeq)
    assert(got.length == 4, s"got ${got.mkString("; ")}")
    assert(got.sameElements(want), s"\ngot:  ${got.mkString("; ")}\nwant: ${want.mkString("; ")}")
  }

  test("stream-stream interval join matches the batch attribution") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.attributionStream(mem.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    val evs = Seq(
      Ev(1, t("10:00"), 1, "click", 1.0),
      Ev(2, t("10:20"), 1, "purchase", 5.0),  // within 30m of click 1 → match
      Ev(3, t("11:30"), 1, "purchase", 5.0),  // too late for click 1
      Ev(4, t("10:05"), 2, "click", 1.0),
      Ev(5, t("10:10"), 3, "purchase", 2.0))  // different user → no match
    mem.addData(evs.take(2): _*)
    q.processAllAvailable()
    mem.addData(evs.drop(2): _*)
    q.processAllAvailable()
    // advance watermark so state is evictable (behavioral no-op for inner join output)
    mem.addData(Ev(9, t("14:00"), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_out")
      .select("user_id", "click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Events.attribution(
      (evs :+ Ev(9, t("14:00"), 9, "view", 0.0)).toDF())
      .select("user_id", "click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed == Set((1L, 1L, 2L)),
      s"streamed=$streamed batch=$batch")
  }

  test("batch sessionize splits on gaps > 30 minutes") {
    val events = Seq(
      Ev(1, t("10:00"), 1, "a", 0), Ev(2, t("10:10"), 1, "a", 0),
      Ev(3, t("11:00"), 1, "a", 0), // 50-min gap → new session
      Ev(4, t("10:00"), 2, "a", 0)
    ).toDF()
    val out = Events.sessionize(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 1L)) == 2L)
    assert(out((1L, 2L)) == 1L)
    assert(out((2L, 1L)) == 1L)
  }

  test("gap fill densifies every hour × type cell, zero-filling the holes") {
    val events = Seq(
      Ev(1, t("10:05"), 1, "click", 0), Ev(2, t("10:15"), 1, "view", 0),
      Ev(3, t("13:05"), 1, "click", 0)  // hours 11 and 12 have no events
    ).toDF()
    val out = Events.gapFill(events).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    // spine: 4 hours × 2 types = 8 cells, all present
    assert(out.size == 8)
    assert(out(("2024-01-01 10:00:00.0", "click")) == 1L)
    assert(out(("2024-01-01 11:00:00.0", "click")) == 0L)
    assert(out(("2024-01-01 12:00:00.0", "view")) == 0L)
    assert(out(("2024-01-01 13:00:00.0", "click")) == 1L)
    assert(out(("2024-01-01 13:00:00.0", "view")) == 0L)
  }

  test("trending ranks hour-over-hour movers by add-one lift on the dense spine") {
    // hour 10: 1 click, 1 view; hour 11: 4 clicks, 0 views, 1 signup.
    // Lifts at hour 11: click (4+1)/(1+1)=2.5, signup (1+1)/(0+1)=2.0
    // (spine zero-fill makes silent-hour types real baselines),
    // view (0+1)/(1+1)=0.5 — order: click, signup, view.
    val events = (
      Seq(Ev(1, t("10:05"), 1, "click", 0), Ev(2, t("10:15"), 1, "view", 0)) ++
      (0 until 4).map(i => Ev(10 + i, t(s"11:0$i"), 1, "click", 0)) ++
      Seq(Ev(20, t("11:30"), 1, "signup", 0))
    ).toDF()
    val out = Events.trending(events, 3).collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // only hour 11 has a baseline (hour 10 is the spine start)
    assert(out.keySet.forall(_._1 == "2024-01-01 11:00:00.0"))
    assert(out(("2024-01-01 11:00:00.0", 1)) == (("click", 4L, 1L, 2.5)))
    assert(out(("2024-01-01 11:00:00.0", 2)) == (("signup", 1L, 0L, 2.0)))
    assert(out(("2024-01-01 11:00:00.0", 3)) == (("view", 0L, 1L, 0.5)))
  }

  test("anomaly flags exactly the hours beyond 2σ of the dense spine") {
    // clicks: 10 quiet hours of 1 event + one 12-event burst hour.
    // H=11, S=22, Q=154: burst (11·12−22)²=12100 > 4(11·154−22²)=4840 ✓;
    // quiet hours (11·1−22)²=121 ≤ 4840 — only the burst flags.
    val quiet = (0 until 10).map(i =>
      Ev(100 + i, t(f"$i%02d:30"), 1, "click", 0))
    val burst = (0 until 12).map(i =>
      Ev(200 + i, t(s"10:${10 + i}"), 1, "click", 0))
    val out = Events.anomaly((quiet ++ burst).toDF()).collect()
      .map(r => r.getTimestamp(0).toString -> r.getBoolean(3)).toMap
    assert(out.size == 11)
    assert(out("2024-01-01 10:00:00.0"))
    assert(out.count(_._2) == 1, s"only the burst hour flags: $out")
    // constant series: σ = 0 and no hour deviates — nothing flags
    // (strict > keeps the all-equal case unflagged instead of NaN-ish)
    val flat = (0 until 5).map(i => Ev(i.toLong, t(f"$i%02d:00"), 1, "view", 0))
    assert(Events.anomaly(flat.toDF()).collect().forall(!_.getBoolean(3)))
  }

  test("funnelStream: watermark buffering makes late qualifying steps exact") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.funnelStream(mem.toDF(), watermarkDelayMinutes = 30)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()

    // the click ARRIVES before its qualifying view — a naive incremental
    // funnel would reject it forever; the buffer replays in event order
    mem.addData(Ev(1, t("10:05"), 1, "click", 0), Ev(2, t("10:10"), 1, "purchase", 0))
    q.processAllAvailable()
    mem.addData(Ev(3, t("10:00"), 1, "view", 0)) // late but inside the watermark
    q.processAllAvailable()
    mem.addData(Ev(4, t("12:00"), 2, "view", 0)) // advance watermark past 10:10
    q.processAllAvailable()
    mem.addData(Ev(5, t("14:00"), 2, "view", 0)) // and once more to finalize
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_out").filter(col("user_id") === 1).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getTimestamp(3))).sortBy(_._1).toSeq
    assert(rows == Seq((1, "view", t("10:00")), (2, "click", t("10:05")),
      (3, "purchase", t("10:10"))))
    // one emission per (user, step): the full-funnel user emitted exactly 3
    assert(spark.table("funnel_out").filter(col("user_id") === 1).count() == 3)
  }

  test("funnelStream: idle state is removed after the TTL, kept before it") {
    implicit val sc = spark.sqlContext
    // observable proxy for state size: a removed user re-emits step 1 on
    // re-appearance (first-reach memory gone); a retained user does not
    def emissions(ttlMinutes: Long): Seq[(Int, String)] = {
      val mem = MemoryStream[Ev]
      val name = s"funnel_ttl_$ttlMinutes"
      val q = EventsStream.funnelStream(mem.toDF(), watermarkDelayMinutes = 30,
          idleStateTTLMinutes = ttlMinutes)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      mem.addData(Ev(1, t("10:00"), 1, "view", 0))
      q.processAllAvailable()
      // each batch advances the watermark (wm = max ts − 30 min at batch
      // end, visible to timeouts the NEXT batch): 13:00 lifts wm past the
      // 10:00 view; 16:00's batch ripens it and schedules the tombstone;
      // 16:30's batch fires the tombstone expiry (wm 15:30 > ripen-time
      // +1 min TTL) with no user-1 data → removal
      Seq("13:00", "16:00", "16:30").zipWithIndex.foreach { case (ts, i) =>
        mem.addData(Ev(10 + i, t(ts), 99, "view", 0))
        q.processAllAvailable()
      }
      // user 1 re-appears; two more watermark pushes ripen the new view
      mem.addData(Ev(4, t("17:00"), 1, "view", 0))
      q.processAllAvailable()
      Seq("20:00", "21:00").zipWithIndex.foreach { case (ts, i) =>
        mem.addData(Ev(20 + i, t(ts), 99, "view", 0))
        q.processAllAvailable()
      }
      q.stop()
      spark.table(name).filter(col("user_id") === 1).collect()
        .map(r => (r.getInt(1), r.getString(2))).toSeq
    }
    // 1-minute TTL: tombstone expired before the 17:00 view → step 1 twice
    assert(emissions(1L) == Seq((1, "view"), (1, "view")))
    // default-scale TTL: memory retained → exactly one step-1 emission
    assert(emissions(100000L) == Seq((1, "view")))
  }

  test("retention: cohort day-0 counts every user once, offsets need later days") {
    def d(day: Int, m: String) = Timestamp.valueOf(f"2024-01-$day%02d $m:00")
    val evs = Seq(
      // user 1: active day 1 and day 3 → offsets 0 and 2
      Ev(1, d(1, "10:00"), 1, "view", 0), Ev(2, d(1, "11:00"), 1, "click", 0),
      Ev(3, d(3, "09:00"), 1, "view", 0),
      // user 2: day 1 only → offset 0
      Ev(4, d(1, "12:00"), 2, "view", 0),
      // user 3: cohorts on day 2, returns day 3 → (day2, 0) and (day2, 1)
      Ev(5, d(2, "08:00"), 3, "view", 0), Ev(6, d(3, "08:00"), 3, "view", 0))
    val rows = Events.retention(evs.toDF()).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 1) -> 1L))
  }

  test("funnel: strict ordering per user, same-timestamp steps don't qualify") {
    val evs = Seq(
      // user 1: full ordered funnel
      Ev(1, t("10:00"), 1, "view", 0), Ev(2, t("10:05"), 1, "click", 0),
      Ev(3, t("10:10"), 1, "purchase", 0),
      // user 2: click BEFORE the view — never reaches step 2
      Ev(4, t("09:00"), 2, "click", 0), Ev(5, t("09:30"), 2, "view", 0),
      Ev(6, t("09:45"), 2, "purchase", 0),
      // user 3: view only
      Ev(7, t("08:00"), 3, "view", 0),
      // user 4: view and click in the SAME microsecond — strict < fails
      Ev(8, t("07:00"), 4, "view", 0), Ev(9, t("07:00"), 4, "click", 0))
    val rows = Events.funnel(evs.toDF()).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1, "view", 4L), (2, "click", 1L), (3, "purchase", 1L)))
    // funnel counts are monotone non-increasing by construction
    assert(rows.map(_._3).sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    // partitioning invariance
    val again = Events.funnel(evs.toDF().repartition(7)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(again == rows)
  }
}
