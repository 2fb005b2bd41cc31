package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY §2.11) — this surface is green-field,
  * designed Spark-idiomatically: event-time watermarks bound all state, so
  * every operator here runs unbounded on a real stream and scales by key
  * partitioning alone. Transform functions take any streaming DataFrame
  * with the events schema (file source in tests; Kafka in production).
  */
object EventStreams {

  /** Read the driver's events parquet as a bounded stream (test/dev source).
    * The streaming file source needs an explicit schema, so infer it with a
    * footer-only batch read — that also resolves which `ts` encoding this
    * file carries (native TIMESTAMP vs the legacy nanos-as-long read), and
    * `Tables.normalizeTs` then applies the SAME rule as the batch loader,
    * keeping stream and batch results comparable. */
  def fileSource(spark: SparkSession, dir: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case scala.util.control.NonFatal(_) => }
    // the streaming file source requires a directory; accept a direct
    // file path by reading its parent with a glob filter
    val p = new java.io.File(dir)
    val (base, glob) =
      if (p.isFile) (p.getParent, p.getName) else (dir, "*.parquet")
    // an initially-EMPTY source directory has no footers to infer from —
    // fall back to the known events schema (ts encoded as a native
    // timestamp) so a stream can start before its first file lands
    val schema =
      try spark.read.option("pathGlobFilter", glob).parquet(base).schema
      catch {
        case scala.util.control.NonFatal(_) =>
          org.apache.spark.sql.types.StructType.fromDDL(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
              "event_type STRING, value DOUBLE, props STRING")
      }
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", glob).parquet(base))
  }

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * state (late rows beyond 10 minutes are dropped). */
  def tumblingCounts(events: DataFrame, window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))

  /** Sliding-window per-type rates. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "2 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session windows per user (gap-based), watermark-bounded state. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_v"))

  /** Stateful exact dedup by event_id, state expired by watermark. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(nEvents: Long, sumValue: Double, lastTs: Long)
  case class UserSession(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization with flatMapGroupsWithState: emits a
    * session row when a user is idle past the processing-time timeout.
    * (The mapGroupsWithState/flatMapGroupsWithState surface — SURVEY §2.11.) */
  def customSessions(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, s.nEvents, s.sumValue))
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var n = prev.nEvents
            var sum = prev.sumValue
            var last = prev.lastTs
            rows.foreach { e =>
              n += 1; sum += e.value; last = math.max(last, e.ts.getTime)
            }
            state.update(SessionState(n, sum, last))
            state.setTimeoutDuration("2 seconds")
            Iterator.empty
          }
      }
  }

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (re-read per batch; broadcast by Catalyst when small). */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Stream-stream interval join with watermarks on both sides: purchases
    * within 30 minutes after a click by the same user. State on both
    * sides is bounded by the watermark + interval condition. */
  def clickToPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    clicks.join(purchases, expr(
      """user_id = p_user_id AND
        |purchase_ts >= click_ts AND
        |purchase_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  case class UserTotal(user_id: Long, n_events: Long, sum_value: Double)

  /** Running per-user totals via mapGroupsWithState (NoTimeout, Update
    * mode) — the deterministic stateful-op surface. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserTotal](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          var n = prev.nEvents
          var sum = prev.sumValue
          rows.foreach { e => n += 1; sum += e.value }
          state.update(SessionState(n, sum, prev.lastTs))
          UserTotal(userId, n, sum)
      }
  }

  /** [[runningUserTotals]] on the Spark 4 arbitrary-state v2 API
    * (`transformWithState`): per-variable typed state
    * (`ValueState`/`ListState`/`MapState`), native TTL and timers, and a
    * state layout the RocksDB provider stores per variable instead of as
    * one opaque blob — at scale that means point updates instead of
    * whole-struct rewrites and state that survives processor evolution.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`); semantics are
    * identical to the v1 twin and the spec asserts the two agree. */
  class RunningTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserTotal] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[SessionState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("totals",
        org.apache.spark.sql.Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotal] = {
      val prev = if (state.exists()) state.get() else SessionState(0L, 0.0, 0L)
      var n = prev.nEvents
      var sum = prev.sumValue
      rows.foreach { e => n += 1; sum += e.value }
      state.update(SessionState(n, sum, prev.lastTs))
      Iterator.single(UserTotal(key, n, sum))
    }
  }

  def runningUserTotalsV2(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  case class SessionStart(start: Long, nEvents: Long, sumValue: Double,
      lastTs: Long)

  /** Event-time sessionization on the v2 API — the construction the API's
    * typed state was designed for, and the semantics of the built-in
    * `session_window` aggregate reproduced with explicit state:
    *
    *  - `handleInputRows` sorts the batch's events by EVENT time and
    *    splits on data-observed gaps: sessions that end inside the batch
    *    move to a `ListState` of pending sessions (NOT emitted yet — a
    *    late event inside the watermark could still extend them); the
    *    trailing open session stays in a `ValueState`.
    *  - every session arms an EVENT-TIME timer at lastTs + gap; timers
    *    fire when the WATERMARK passes them, and only then are sessions
    *    emitted (and their state dropped) — exactly-once session rows,
    *    deterministic on replay, robust to out-of-order input within the
    *    watermark delay. Stale timers (re-armed sessions) fire and no-op.
    *
    * Contrast [[customSessions]] (v1): processing-time timeouts tie
    * session closure to wall-clock batch scheduling; this one closes
    * sessions on the data's own clock. */
  class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserSession] {
    @transient private var open:
        org.apache.spark.sql.streaming.ValueState[SessionStart] = _
    @transient private var pending:
        org.apache.spark.sql.streaming.ListState[SessionStart] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      open = getHandle.getValueState[SessionStart]("open",
        org.apache.spark.sql.Encoders.product[SessionStart],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      pending = getHandle.getListState[SessionStart]("pending",
        org.apache.spark.sql.Encoders.product[SessionStart],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserSession] = {
      val evs = rows.toArray.sortBy(_.ts.getTime)
      var cur = if (open.exists()) open.get() else null
      evs.foreach { e =>
        val t = e.ts.getTime
        if (cur == null) cur = SessionStart(t, 1L, e.value, t)
        else if (t > cur.lastTs + gapMs) {
          // gap observed in the data: session closed, park it until the
          // watermark confirms (timer below)
          pending.appendValue(cur)
          getHandle.registerTimer(cur.lastTs + gapMs)
          cur = SessionStart(t, 1L, e.value, t)
        } else cur = SessionStart(cur.start, cur.nEvents + 1,
          cur.sumValue + e.value, math.max(cur.lastTs, t))
      }
      if (cur != null) {
        open.update(cur)
        getHandle.registerTimer(cur.lastTs + gapMs)
      }
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[UserSession] = {
      val wm = timers.getCurrentWatermarkInMs()
      val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
      if (pending.exists()) {
        val keep = pending.get().toArray.filter { s =>
          val due = s.lastTs + gapMs <= wm
          if (due) out += UserSession(key, s.nEvents, s.sumValue)
          !due
        }
        pending.clear()
        keep.foreach(pending.appendValue)
      }
      if (open.exists()) {
        val s = open.get()
        if (s.lastTs + gapMs <= wm) {
          out += UserSession(key, s.nEvents, s.sumValue)
          open.clear()
        }
      }
      out.iterator
    }
  }

  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user per-event-type running counts on `MapState` — the third v2
    * state shape (Value/List/Map). The map key is the event type, so one
    * user's counters update POINT-WISE: the RocksDB layout stores each
    * (user, type) entry as its own key, and a batch touching one type
    * reads/writes only that entry — with a ValueState holding a whole
    * Map[String, Long] every update would rewrite the full struct (the
    * exact pattern MapState exists to avoid). Emits the updated counters
    * for the types seen in each batch. */
  class TypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, TypeCount] {
    @transient private var counts:
        org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val prev =
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else 0L
        counts.updateValue(e.event_type, prev + 1L)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCount(key, t, counts.getValue(t)))
    }
  }

  def typeCountsV2(events: Dataset[Event]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Input must carry `withWatermark("ts", ...)` — event-time timers fire
    * off the watermark. */
  def timerSessionsV2(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Incremental exactly-once ingestion: drain whatever is currently
    * available from a file source into a partitioned parquet sink and
    * stop (Trigger.AvailableNow). Re-running after new input files arrive
    * processes ONLY the new files — the checkpoint tracks consumed
    * sources, the parquet file-sink commit log makes output exactly-once
    * (readers ignore orphan files from killed runs). This is the Spark
    * analog of the reference's re-runnable conversion with `ignore_cache`
    * semantics: the 100 TB pattern for continuously-arriving extracts.
    * Blocks until the drain completes; returns rows written this run. */
  def incrementalParquetSink(source: DataFrame, outPath: String,
      checkpoint: String, partitionCol: String): Long = {
    val spark = source.sparkSession
    val counted = source.observe("ingest", count(lit(1)).as("n"))
    // row accounting via a listener (recentProgress is a ring buffer capped
    // at ~100 entries — a large backlog of micro-batches would under-count)
    // accumulate per query id (events may arrive before start() returns)
    val totals = new java.util.concurrent.ConcurrentHashMap[java.util.UUID,
      java.util.concurrent.atomic.AtomicLong]()
    val terminated = java.util.concurrent.ConcurrentHashMap
      .newKeySet[java.util.UUID]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get("ingest")
        if (m != null) totals.computeIfAbsent(e.progress.id,
          _ => new java.util.concurrent.atomic.AtomicLong(0L)).addAndGet(m.getLong(0))
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        terminated.add(e.id)
    }
    spark.streams.addListener(listener)
    try {
      val q = counted.writeStream
        .format("parquet")
        .option("path", outPath)
        .option("checkpointLocation", checkpoint)
        .partitionBy(partitionCol)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // listener events are async but ordered; the terminated event
      // flushes all progress for this query — wait for it (bounded)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!terminated.contains(q.id) && System.nanoTime() < deadline)
        Thread.sleep(50)
      Option(totals.get(q.id)).map(_.get()).getOrElse(0L)
    } finally spark.streams.removeListener(listener)
  }

  /** Run a streaming transform to completion against a bounded source and
    * return the materialized result (test harness; memory sink). */
  def runToCompletion(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
