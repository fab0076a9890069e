package graft.streaming

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Exact

/** Event-stream operators (SURVEY.md §2.7 extension scope). Each has a
  * BATCH form (oracle-checkable against DuckDB) and, where stateful, a
  * Structured Streaming form in [[EventsStream]] sharing the same
  * transformation so batch results certify the streaming logic.
  */
object Events {

  /** Tumbling-window aggregate: per (1h window, event_type) count + exact
    * cents sum of value. One partial+final hash aggregate. */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(Exact.cents(col("value"))).cast("double").as("total_cents"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding-window aggregate (1h window, 30m slide → each event lands in
    * exactly 2 windows). */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour", "30 minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("window_start"), col("event_type"))

  /** Gap-filled hourly series: every (hour, event_type) cell between the
    * stream's first and last hour, zero-filled where no events landed —
    * the resample-and-fill step every time-series consumer needs before
    * charting or modeling. Shape: ONE data shuffle (the count
    * aggregate); the hour spine is generated from a 1-row bounds
    * aggregate (`sequence` + explode) and cross-joined with the tiny
    * distinct-type list — spine size is hours × types regardless of
    * event volume, so the dense frame never scales with the data. */
  def gapFill(events: DataFrame): DataFrame = {
    val hours = events.select(
      date_trunc("hour", col("ts")).as("h"), col("event_type"))
    val counts = hours.groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val spine = hours.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("h"))
    val types = hours.select(col("event_type")).distinct()
    spine.crossJoin(broadcast(types))
      .join(counts, Seq("h", "event_type"), "left")
      .select(col("h").as("hour_start"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** Hour-over-hour trending movers — the "what just took off" monitor:
    * per hour, the top `k` event types by count lift vs their OWN
    * previous hour. Built over the DENSE [[gapFill]] spine so a type
    * silent last hour (prev = 0) registers as a real spike, not a
    * missing row; the lift is the add-one rational (n+1)/(prev+1) —
    * exact in doubles (two small ints), defined at zero, and
    * cross-engine deterministic where a log-ratio would not be.
    *
    * Scale shape: events reduce to the hours×types count frame in ONE
    * map-side-combined aggregate; every window after that (per-type lag,
    * per-hour top-k) runs on the dense spine — bounded by hours×types
    * regardless of event volume. Nothing event-sized ever sorts. */
  def trending(events: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val dense = gapFill(events)
    val lagW = Window.partitionBy("event_type").orderBy("hour_start")
    val withPrev = dense
      .withColumn("prev_n", lag(col("n"), 1).over(lagW))
      .filter(col("prev_n").isNotNull) // first hour has no baseline
      .withColumn("lift",
        (col("n") + lit(1)).cast("double") / (col("prev_n") + lit(1)).cast("double"))
    val rankW = Window.partitionBy("hour_start")
      .orderBy(col("lift").desc, col("event_type"))
    withPrev.withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= k)
      .select(col("hour_start"), col("rk"), col("event_type"),
        col("n"), col("prev_n"), col("lift"))
      .orderBy(col("hour_start"), col("rk"))
  }

  /** Hourly volume anomaly flags per event type — the monitoring twin of
    * [[gapFill]]: over the DENSE hour spine (missing hours are real
    * zero-count observations, not absent rows), an hour is anomalous when
    * its count deviates from the type's mean by more than 2σ (population
    * σ over the spine).
    *
    * The 2σ test is evaluated in INTEGERS, not floats: with H hours,
    * S = Σx and Q = Σx², the test (x−μ)² > 4σ² multiplies through by H²
    * to (H·x − S)² > 4(H·Q − S²) — every term a sum/product of counts, so
    * the flag is bit-identical across engines (a float μ/σ would flip
    * boundary hours per libm). Products ride DECIMAL(38,0) so the squares
    * are overflow-safe far past any realistic hourly volume.
    *
    * Scale shape: the spine join is [[gapFill]]'s (ONE count shuffle —
    * the dense frame scales with hours×types, not events); per-type
    * moments are a broadcast back onto it. */
  def anomaly(events: DataFrame): DataFrame = {
    val dense = gapFill(events)
    val stats = dense.groupBy(col("event_type")).agg(
      count(lit(1)).as("h"),
      sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("q"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val lhs = dec(col("h") * col("n") - col("s"))
    val rhs = lit(4).cast("decimal(38,0)") *
      (dec(col("h")) * dec(col("q")) - dec(col("s")) * dec(col("s")))
    dense.join(broadcast(stats), Seq("event_type"))
      .select(col("hour_start"), col("event_type"), col("n"),
        (lhs * lhs > rhs).as("is_anomaly"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** Sessionization: per user, a new session starts after a gap >
    * `gapMinutes`. Batch form of what `flatMapGroupsWithState` does in the
    * stream: one shuffle on user_id, one ordered pass per user.
    *
    * Contract: event-TIME ordering is undefined for an unstamped event,
    * so null-`ts` rows are excluded up front (the session family ALL
    * shares this rule — see [[timestamped]]). Leaving them in would make
    * the result depend on engine null-ordering (Spark sorts nulls first,
    * DuckDB/ANSI last) and silently fold phantom rows into real sessions. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val wUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val flagged = timestamped(events)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Session-length distribution: how many sessions contain exactly k
    * events — the engagement histogram beside [[sessionize]]'s per-
    * session rows and [[topPaths]]'s sequences. Shares the sessionizer's
    * single user-partitioned sort; the distribution is one further
    * hash aggregate over the (already session-sized) frame, output
    * bounded by the longest session. */
  def sessionLengthDist(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_events"))

  /** Top session paths — path analysis over the sessionized stream:
    * the `maxLen`-prefix of each session's ordered event-type sequence,
    * counted across all sessions, top `k`. "What do users actually DO in
    * a session" — the product-analytics staple next to funnel (which
    * tests ONE hypothesized sequence; this surfaces the real ones).
    *
    * Scale shape: session assignment shares [[sessionize]]'s single
    * (user)-partitioned sort; the prefix gate (row_number ≤ maxLen)
    * bounds every collected list BEFORE aggregation so no session —
    * however long — contributes more than `maxLen` elements; path
    * counting is a hash aggregate on the path string and the top-k is a
    * TakeOrderedAndProject partial. Total order (ts, event_id) makes the
    * path a pure function of the data. */
  def topPaths(events: DataFrame, gapMinutes: Int = 30,
               maxLen: Int = 5, k: Int = 20): DataFrame = {
    val wUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val sess = timestamped(events)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "session_id")
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= maxLen)
    // a null event_type is a real step whose label is unknown — the 'NA'
    // sentinel keeps it in the sequence (concat_ws would silently SKIP
    // nulls, shortening the path, and an all-null session would yield ''
    // where SQL string_agg yields NULL — engine-dependent path identities)
    sess.groupBy(col("user_id"), col("session_id"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("rn"),
          coalesce(col("event_type"), lit("NA")).as("event_type")))),
        s => s.getField("event_type"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Click→purchase attribution: every (click, purchase) pair of the same
    * user with the purchase inside (click_ts, click_ts + window]. Batch
    * twin of [[EventsStream.attributionStream]]'s stream-stream interval
    * join — an equi-join on user plus a band predicate, so Catalyst plans
    * one hash join on user_id with the band as residual; never a cross
    * product. */
  def attribution(events: DataFrame, withinMinutes: Int = 30): DataFrame = {
    val us = withinMinutes.toLong * 60L * 1000000L
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    clicks.join(purchases, Seq("user_id"))
      .filter(unix_micros(col("purchase_ts")) > unix_micros(col("click_ts")) &&
        unix_micros(col("purchase_ts")) <= unix_micros(col("click_ts")) + us)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Ordered k-step funnel (view → click → purchase by default): how many
    * users reach each step, where step i+1 only counts when it happens
    * STRICTLY after a qualifying step-i event of the same user (the
    * classic product-analytics funnel, absent from the reference).
    *
    * Mechanics: one user-partitioned ordered pass; q₀ = running min
    * timestamp of step-0 events, qᵢ = running min timestamp of step-i
    * events whose row already sees qᵢ₋₁ < ts. Chained window columns
    * share ONE (user_id, ts, event_id) sort — Catalyst plans a single
    * shuffle+sort for the whole chain (the q_window_suite property) —
    * then one per-user aggregate and a 3-row reshape. Never a
    * self-join, never k scans. */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val wRun = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
    steps.zipWithIndex.foreach { case (s, i) =>
      val qual =
        if (i == 0) col("event_type") === s
        else col("event_type") === s && col(s"q${i - 1}") < col("us")
      df = df.withColumn(s"q$i", min(when(qual, col("us"))).over(wRun))
    }
    val perUserAggs = steps.indices.map(i => max(col(s"q$i")).as(s"q$i"))
    val perUser = df.groupBy("user_id").agg(perUserAggs.head, perUserAggs.tail: _*)
    val countAggs = steps.indices.map(i => count(col(s"q$i")).as(s"n$i"))
    val tot = perUser.agg(countAggs.head, countAggs.tail: _*)
    tot.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("step"), lit(s).as("event_type"),
          col(s"n$i").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.*"))
      .orderBy("step")
  }

  /** Day-N cohort retention: users cohort by their FIRST active day;
    * each (cohort_day, offset) cell counts users active `offset` days
    * later — the classic retention triangle. Plan: the (user, day)
    * activity grid reduces first (map-side-combined — shuffle carries
    * distinct user-days, not events), the cohort day rides a user
    * window over that reduced frame, and the final cell count is a
    * grid-domain aggregate. */
  def retention(events: DataFrame, maxOffsetDays: Int = 7): DataFrame = {
    // identified users only: a null user_id is not ONE anonymous user but
    // many unattributable ones — folding them into a single cohort member
    // (what a null-keyed window partition silently does) overstates
    // day-0 cohorts and invents retention where none is measurable
    val activity = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id", "d").agg(count(lit(1)).as("__n")).drop("__n")
    val wUser = Window.partitionBy("user_id")
    activity
      .withColumn("cohort_day", min("d").over(wUser))
      .withColumn("offset", datediff(col("d"), col("cohort_day")))
      .filter(col("offset") <= maxOffsetDays)
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_users")) // rows are distinct (user, day)
      .orderBy("cohort_day", "offset")
  }

  /** First-occurrence dedup per (user_id, event_type): the batch analogue
    * of `dropDuplicatesWithinWatermark` with an unbounded watermark —
    * deterministic first = smallest (ts, event_id) among TIMESTAMPED
    * events ([[timestamped]] contract: "earliest" is undefined for a
    * null-`ts` row, and engine null-ordering would otherwise pick the
    * winner). */
  def dedupFirst(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    timestamped(events).withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** The event-time contract shared by the ORDER-sensitive family
    * ([[sessionize]], [[sessionLengthDist]], [[topPaths]],
    * [[dedupFirst]]): only timestamped events participate — a null `ts`
    * has no position on the time axis, and its placement would otherwise
    * follow engine-specific null-ordering (Spark first, ANSI/DuckDB
    * last), i.e. be nondeterministic across engines. Bucketing ops
    * (tumbling/gapFill/…) need no filter: a null bucket key drops out of
    * the spine join identically in every engine. */
  private def timestamped(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull)
}

/** Structured Streaming forms — the same logical transforms declared over
  * an unbounded source with watermarks. Exercised in
  * `EventsStreamSpec` with a MemoryStream; production wiring is
  * `spark.readStream.schema(...).parquet(dir)` → transform →
  * `writeStream` with checkpointing.
  */
object EventsStream extends Serializable {

  /** Streaming source over an events parquet directory. The harness
    * events table stores TIMESTAMP(NANOS), which Spark's reader rejects
    * unless `spark.sql.legacy.parquet.nanosAsLong` is set (once, at
    * session construction — `graft.Sessions.local` does); the stream
    * declares ts as long and floor-divides to micros — the same coercion
    * the batch reader and DuckDB apply. */
  def readEvents(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events parquet is TIMESTAMP(NANOS): build the session via graft.Sessions.local " +
        "or set spark.sql.legacy.parquet.nanosAsLong=true before reading")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling windowed count with a watermark: late events beyond
    * `watermark` are dropped; windows finalize in append mode. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Stream-stream interval self-join (click→purchase attribution), the
    * streaming twin of [[Events.attribution]]: BOTH sides carry
    * watermarks and the join condition bounds purchase_ts inside
    * (click_ts, click_ts + window], so Spark evicts each side's state as
    * the watermark passes the band — bounded state at any runtime. Inner
    * join → append mode, exactly one row per matched pair. */
  def attributionStream(events: DataFrame, withinMinutes: Int = 30,
                        watermark: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"interval $withinMinutes minutes"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Stream-static enrichment — the streaming form of
    * [[graft.ops.Relational.qEnrichEvents]]: every micro-batch joins the
    * unbounded event stream against a STATIC dimension (re-resolved per
    * batch, so a dimension refresh is picked up without restart), then
    * aggregates per (1h window, segment, event_type) under a watermark.
    * The join itself is stateless (static side ⇒ no join state store);
    * the broadcast keeps the fact side shuffle-free exactly as in the
    * batch twin. Append mode — windows emit once finalized. */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Exact.cents(col("value"))).cast("double").as("total_cents"))
      .select(col("window.start").as("window_start"), col("c_mktsegment"),
        col("event_type"), col("n"), col("total_cents"))

  /** Stateful dedup keyed on event_id within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessionIn(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class SessionState(sessionId: Long, startUs: Long, lastUs: Long, n: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                              t_start: java.sql.Timestamp, t_end: java.sql.Timestamp)

  private def usOf(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
  private def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming sessionization with CUSTOM STATE — the
    * `flatMapGroupsWithState` form of [[Events.sessionize]]: per-user
    * session state (id, bounds, count) lives in the state store; a
    * session CLOSES and emits either when a later event arrives beyond
    * the gap, or when the event-time watermark passes lastTs+gap
    * (EventTimeTimeout). Append-mode output, exactly one row per
    * completed session; (user_id, session_id) keys stay UNIQUE across
    * timeouts (a closed session leaves an n=0 tombstone carrying the next
    * id, so numbering continues like the batch cumulative count).
    *
    * Cross-batch disorder (bounded by the watermark delay, default = gap)
    * follows session-window merge semantics: an out-of-order event within
    * `gap` of the open session's bounds extends them (t_start can move
    * earlier); events more than `gap` OLDER than the session start form
    * their own earlier session(s) — stragglers within `gap` of each
    * other in one micro-batch MERGE, exactly like the batch twin
    * (reachable only when the watermark delay exceeds the gap). The one
    * residual deviation from batch parity: straggler sessions close at
    * their micro-batch boundary (append mode cannot retract), so two
    * mutually-adjacent stragglers split across DIFFERENT micro-batches
    * emit as two sessions where batch merges them. Batch certification:
    * the batch window form is oracle-gated; `EventsStreamSpec` asserts
    * this form emits the same sessions through a MemoryStream. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       watermarkDelayMinutes: Option[Int] = None)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val gapMs = gapMinutes.toLong * 60L * 1000L
    val wmMinutes = watermarkDelayMinutes.getOrElse(gapMinutes)
    // tombstones (id-continuity markers) are reclaimed after this many
    // multiples of the gap with no new events — bounding state-store size
    // per EVER-SEEN user to a retention window, not forever
    val TombstoneRetention = 10L

    def onUser(user: Long, rows: Iterator[SessionIn],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (!rows.hasNext && state.hasTimedOut) {
        val s = state.get
        if (s.n == 0L) { // expired tombstone → reclaim
          state.remove()
          Iterator.empty
        } else {
          // close + tombstone (n=0): numbering continues at the next event;
          // the tombstone itself expires after the retention window
          state.update(SessionState(s.sessionId + 1L, 0L, 0L, 0L))
          state.setTimeoutTimestamp(
            math.max(s.lastUs / 1000L + TombstoneRetention * gapMs,
              state.getCurrentWatermarkMs() + 1L))
          Iterator.single(SessionOut(user, s.sessionId, s.n, tsOf(s.startUs), tsOf(s.lastUs)))
        }
      } else {
        // micro-batch rows arrive unordered — order within the batch; the
        // watermark bounds how far across batches disorder can reach.
        // The OPEN session rides the sorted timeline as an INTERVAL item
        // (startUs, lastUs, n) among the batch's events, and one
        // ascending gap-fold closes/merges over the union. The earlier
        // per-event straggler branch emitted each out-of-order event as
        // its own singleton session; two stragglers within `gap` of EACH
        // OTHER must merge into one session, as the batch twin does.
        val sorted = rows.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
        val closed = Seq.newBuilder[SessionOut]
        var id = state.getOption.map(_.sessionId).getOrElse(1L)
        val open = state.getOption.filter(_.n > 0L)
        val evItems = sorted.map { e => val u = usOf(e.ts); (u, u, 1L) }
        val items = open match {
          case Some(s) =>
            val (before, after) = evItems.span(_._1 < s.startUs)
            (before :+ ((s.startUs, s.lastUs, s.n))) ++ after
          case None => evItems
        }
        var cur: Option[(Long, Long, Long)] = None
        items.foreach { case (a, b, n) =>
          cur = cur match {
            case None => Some((a, b, n))
            case Some((ca, cb, cn)) if a - cb > gapUs => // gap → close, advance id
              closed += SessionOut(user, id, cn, tsOf(ca), tsOf(cb))
              id += 1L
              Some((a, b, n))
            case Some((ca, cb, cn)) => // inside/adjacent: extend, pool counts
              Some((ca, math.max(cb, b), cn + n))
          }
        }
        cur.foreach { case (a, b, n) =>
          state.update(SessionState(id, a, b, n))
          // timeout must sit above the current watermark
          state.setTimeoutTimestamp(
            math.max(b / 1000L + gapMs, state.getCurrentWatermarkMs() + 1L))
        }
        closed.result().iterator
      }
    }

    events.selectExpr("event_id", "ts", "user_id")
      .withWatermark("ts", s"$wmMinutes minutes")
      .as[SessionIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onUser)
  }

  final case class FunnelIn(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, step: Int)
  /** Per-user funnel state: the not-yet-finalized event buffer (parallel
    * arrays) + the earliest qualified timestamp per step
    * (Long.MaxValue = not reached). */
  final case class FunnelState(bufUs: Seq[Long], bufIds: Seq[Long],
                               bufSteps: Seq[Int], q: Seq[Long])
  final case class StepReached(user_id: Long, step: Int, event_type: String,
                               ts: java.sql.Timestamp)

  /** Streaming twin of [[funnel]]: emits one `StepReached` row the first
    * time a user reaches each funnel step, with EXACTLY the batch form's
    * strict-ordering semantics under bounded disorder.
    *
    * The naive incremental update is wrong under reordering — a step-2
    * event processed before its qualifying step-1 event arrives would be
    * rejected forever. So events BUFFER in state until the event-time
    * watermark passes them; only then do they replay, in (ts, event_id)
    * order, through the same chained-q rule as the batch window pass.
    * The watermark guarantees nothing older can still arrive, so the
    * finalized prefix — and every emission — is identical to the batch
    * result on the same data. State is bounded two ways: the buffer holds
    * at most one watermark-delay's worth of a user's step events, and a
    * user idle (event-time) longer than `idleStateTTLMinutes` has their
    * whole state REMOVED — without that, the per-user q tombstones grow
    * monotonically with total user cardinality over the stream's
    * lifetime. The TTL is the one deliberate deviation from exact batch
    * parity: a user who re-appears after it re-qualifies steps from
    * scratch (their first-reach memory is gone), so size the TTL to the
    * domain's plausible return horizon. */
  def funnelStream(events: DataFrame,
                   steps: Seq[String] = Seq("view", "click", "purchase"),
                   watermarkDelayMinutes: Int = 30,
                   idleStateTTLMinutes: Long = 30L * 24 * 60)
      : org.apache.spark.sql.Dataset[StepReached] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.length
    val NotReached = Long.MaxValue

    def onUser(user: Long, rows: Iterator[FunnelIn],
               state: GroupState[FunnelState]): Iterator[StepReached] = {
      val prev = state.getOption.getOrElse(
        FunnelState(Nil, Nil, Nil, Seq.fill(k)(NotReached)))
      val incoming = rows.map(e => (usOf(e.ts), e.event_id, e.step)).toSeq
      val buffered = prev.bufUs.lazyZip(prev.bufIds).lazyZip(prev.bufSteps).toSeq
      val all = (buffered ++ incoming).sortBy { case (us, id, _) => (us, id) }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (ripe, keep) = all.partition(_._1 <= wmUs)
      val q = prev.q.toArray
      val out = Seq.newBuilder[StepReached]
      ripe.foreach { case (us, _, s) =>
        val qualifies = s == 0 || q(s - 1) < us
        if (qualifies && us < q(s)) {
          q(s) = us
          out += StepReached(user, s + 1, steps(s), tsOf(us))
        }
      }
      if (buffered.isEmpty && incoming.isEmpty && state.hasTimedOut) {
        // the idle-TTL timeout fired with nothing pending or processed
        // this call (a RIPENING timeout always has buffered events, so
        // it falls through and re-schedules): emissions are final — no
        // event older than the watermark can arrive — drop the tombstone
        state.remove()
      } else {
        state.update(FunnelState(keep.map(_._1), keep.map(_._2), keep.map(_._3), q.toSeq))
        if (keep.nonEmpty)
          // re-enter as soon as the watermark can ripen the OLDEST
          // buffered event (max would withhold already-ripe events until
          // the watermark cleared the entire buffer — on a quiet stream,
          // indefinitely)
          state.setTimeoutTimestamp(
            math.max(keep.map(_._1).min / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
        else
          // buffer drained: schedule the tombstone's expiry
          state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + idleStateTTLMinutes * 60000L)
      }
      out.result().iterator
    }

    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (e, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(e)
      }
    events.select(col("event_id"), col("ts"), col("user_id"), stepIdx.as("step"))
      .filter(col("step").isNotNull)
      .withWatermark("ts", s"$watermarkDelayMinutes minutes")
      .as[FunnelIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepReached](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onUser)
  }
}
