package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ops validated against their batch equivalents on the same
  * data — the only oracle that exists for the green-field streaming
  * surface (SURVEY §7.4 risk 7). */
class EventStreamsSpec extends AnyFunSuite {
  private val Dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def batchEvents = graft.Tables.events(spark, Dir)

  test("tumbling window counts equal batch groupBy on bounded input") {
    val stream = EventStreams.fileSource(spark, s"$Dir/events.parquet")
    val got = EventStreams.runToCompletion(
      EventStreams.tumblingCounts(stream), "tumbling", OutputMode.Append)
    val expected = batchEvents
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))
    // append-mode emits only watermark-closed windows; every emitted row
    // must match the batch result, and most windows must be closed
    val gotC = got.count()
    val joined = got.join(expected,
      Seq("window", "event_type", "n", "sum_v"), "inner").count()
    assert(gotC > 0)
    assert(joined == gotC, s"all $gotC emitted rows must match batch")
  }

  test("session windows produce positive gap-bounded sessions") {
    val stream = EventStreams.fileSource(spark, s"$Dir/events.parquet")
    val got = EventStreams.runToCompletion(
      EventStreams.sessionCounts(stream), "sessions", OutputMode.Append)
    assert(got.count() > 0)
    assert(got.filter(col("n_events") <= 0).count() == 0)
  }

  test("stateful dedup keeps one row per event_id") {
    val stream = EventStreams.fileSource(spark, s"$Dir/events.parquet")
    // duplicate the stream by unioning it with itself
    val got = EventStreams.runToCompletion(
      EventStreams.dedupedEvents(stream.union(stream)), "dedup",
      OutputMode.Append)
    val total = batchEvents.count()
    assert(got.count() == total)
    assert(got.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("mapGroupsWithState running totals match batch aggregation") {
    import spark.implicits._
    val stream = EventStreams.fileSource(spark, s"$Dir/events.parquet")
      .filter(col("user_id") < 20)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).as[EventStreams.Event]
    val totals = EventStreams.runningUserTotals(stream)
    val q = totals.writeStream.outputMode("update")
      .format("memory").queryName("user_totals").start()
    q.processAllAvailable()
    q.stop()
    // last update per user must equal the batch aggregate
    val got = spark.table("user_totals")
      .groupBy("user_id").agg(max(col("n_events")).as("n_events"))
    val expected = batchEvents.filter(col("user_id") < 20)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(got.count() == expected.count())
    val mismatched = got.join(expected, Seq("user_id"))
      .filter(col("n_events") =!= col("n")).count()
    assert(mismatched == 0)
  }

  test("transformWithState (v2 API) totals match batch and the v1 twin") {
    import spark.implicits._
    // the arbitrary-state v2 API requires the RocksDB state store; scope
    // the setting to this query's session clone via a fresh session
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = EventStreams.fileSource(s2, s"$Dir/events.parquet")
      .filter(col("user_id") < 20)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).as[EventStreams.Event]
    val totals = EventStreams.runningUserTotalsV2(stream)
    val q = totals.writeStream.outputMode("update")
      .format("memory").queryName("user_totals_v2").start()
    q.processAllAvailable()
    q.stop()
    val got = s2.table("user_totals_v2")
      .groupBy("user_id").agg(max(col("n_events")).as("n_events"),
        max(col("sum_value")).as("sum_value"))
    val expected = graft.Tables.events(s2, Dir).filter(col("user_id") < 20)
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        sum(col("value")).as("s"))
    assert(got.count() == expected.count() && got.count() > 0)
    val mismatched = got.join(expected, Seq("user_id"))
      .filter(col("n_events") =!= col("n") ||
        abs(col("sum_value") - col("s")) > 1e-9).count()
    assert(mismatched == 0)
  }

  test("MapState per-type counters match the batch group-by") {
    import spark.implicits._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = EventStreams.fileSource(s2, s"$Dir/events.parquet")
      .filter(col("user_id") < 20)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).as[EventStreams.Event]
    val q = EventStreams.typeCountsV2(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("type_counts").start()
    q.processAllAvailable()
    q.stop()
    val got = s2.table("type_counts")
      .groupBy("user_id", "event_type").agg(max(col("n")).as("n"))
    val expected = graft.Tables.events(s2, Dir).filter(col("user_id") < 20)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    assert(got.count() == expected.count() && got.count() > 0)
    assert(got.join(expected, Seq("user_id", "event_type", "n")).count()
      == got.count())
  }

  test("v2 event-time timer sessions match batch session windows") {
    import spark.implicits._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // slice the (time-sorted) input into 8 files with increasing mtimes:
    // the file source + maxFilesPerTrigger=1 then replays it as 8
    // micro-batches whose watermark advances through event time, so
    // sessions form incrementally and close via event-time timers
    val srcDir = java.nio.file.Files.createTempDirectory("tws_src").toString
    val raw = s2.read.parquet(s"$Dir/events.parquet")
      .filter(col("user_id") < 10).sort("ts")
    val rows = raw.collect().toSeq
    val slice = math.max(1, math.ceil(rows.size / 8.0).toInt)
    rows.grouped(slice).zipWithIndex.foreach { case (chunk, i) =>
      s2.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(chunk).asJava),
        raw.schema)
        .coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1100) // distinct mtimes pin the replay order
    }
    val gapMs = 6L * 3600 * 1000
    val stream = graft.Tables.normalizeTs(
      s2.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir))
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).as[EventStreams.Event]
    val q = EventStreams.timerSessionsV2(stream, gapMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("timer_sessions").start()
    q.processAllAvailable()
    q.stop()
    val got = s2.table("timer_sessions")
      .select(col("user_id"), col("n_events"),
        round(col("sum_value"), 4).as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // ground truth: the built-in session_window aggregate, same gap
    val expected = graft.Tables.events(s2, Dir).filter(col("user_id") < 10)
      .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("s")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expectedSet = expected.groupBy(identity).view.mapValues(_.size)
    val gotSet = got.groupBy(identity).view.mapValues(_.size)
    // every emitted session is a true batch session (with multiplicity);
    // only tail sessions the final watermark never passed may be missing
    gotSet.foreach { case (k, n) =>
      assert(expectedSet.getOrElse(k, 0) >= n, s"session $k not in batch")
    }
    assert(got.length > expected.length / 2,
      s"most sessions must close: ${got.length} of ${expected.length}")
  }

  test("stream-static enrichment joins dimension values onto each batch") {
    val stream = EventStreams.fileSource(spark, s"$Dir/events.parquet")
    val dim = spark.range(1000).select(col("id").as("user_id"),
      concat(lit("tier_"), pmod(col("id"), lit(3))).as("tier"))
    val got = EventStreams.runToCompletion(
      EventStreams.enrich(stream, dim, "user_id"), "enriched")
    assert(got.count() == batchEvents.count())
    assert(got.filter(col("tier").isNull && col("user_id") < 1000).count() == 0)
  }

  test("stream-stream interval join matches the batch interval join") {
    val stream = EventStreams.fileSource(spark, s"$Dir/events.parquet")
    val got = EventStreams.runToCompletion(
      EventStreams.clickToPurchase(stream), "click_purchase")
    val e = batchEvents
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val expected = clicks.join(purchases, expr(
      """user_id = p_user_id AND purchase_ts >= click_ts AND
        |purchase_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin)).count()
    // append mode emits watermark-closed matches; every emitted row must be
    // a true batch match and most of the bounded input closes
    assert(got.count() > 0)
    assert(got.count() <= expected)
    val joinedBack = got.join(
      clicks.join(purchases, expr(
        """user_id = p_user_id AND purchase_ts >= click_ts AND
          |purchase_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin))
        .select(col("click_id"), col("purchase_id")),
      Seq("click_id", "purchase_id"), "left_anti").count()
    assert(joinedBack == 0, "every streamed match must exist in batch result")
  }

  test("flatMapGroupsWithState sessionization emits sessions on processing-time timeout") {
    import spark.implicits._
    // stage the source in a temp dir so a later append can trigger the
    // micro-batch that fires due state timeouts
    val srcDir = java.nio.file.Files.createTempDirectory("events_src").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$Dir/events.parquet").write
      .mode("append").parquet(srcDir)
    val stream = EventStreams.fileSource(spark, srcDir)
      .filter(col("user_id") < 5)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).as[EventStreams.Event]
    val sessions = EventStreams.customSessions(stream)
    // NOTE: while processing-time timeouts are registered the micro-batch
    // engine keeps scheduling batches, so processAllAvailable() never
    // settles — poll the sink with a deadline instead.
    val q = sessions.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
      .format("memory").queryName("custom_sessions").start()
    val expected = batchEvents.filter(col("user_id") < 5)
      .select("user_id").distinct().count()
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("custom_sessions").count() < expected &&
      System.currentTimeMillis() < deadline) Thread.sleep(500)
    q.stop()
    assert(spark.table("custom_sessions").count() == expected)
  }

  test("incremental AvailableNow sink processes only new files across runs") {
    val tmp = java.nio.file.Files.createTempDirectory("inc").toString
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    new java.io.File(srcDir).mkdirs()
    val all = batchEvents.withColumn("ts",
      col("ts").cast("string")) // plain schema for the file round-trip
    val half1 = all.filter(col("event_id") % 2 === 0)
    val half2 = all.filter(col("event_id") % 2 === 1)
    half1.coalesce(1).write.mode("append").parquet(srcDir)

    val schema = all.schema
    def src = spark.readStream.schema(schema).parquet(srcDir)
    EventStreams.incrementalParquetSink(src, outDir, ckpt, "event_type")
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst == half1.count())

    // second batch of files arrives; re-run drains ONLY the delta
    half2.coalesce(1).write.mode("append").parquet(srcDir)
    EventStreams.incrementalParquetSink(src, outDir, ckpt, "event_type")
    val out = spark.read.parquet(outDir)
    assert(out.count() == all.count())
    // exactly-once: no duplicated event_ids after the re-run
    assert(out.groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)
  }
}
