package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables
import graft.streaming.Streaming

/** Batch/stream equivalence: the same aggregation function applied to
  * the events table as a batch DataFrame and as a file-source stream
  * must agree (SURVEY.md §2.8 stretch — test-only, not oracle-checked).
  */
case class BinnedEvent(ts: java.sql.Timestamp, bin: Int)

class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark

  lazy val stagedDir: String = {
    val dir = Files.createTempDirectory("graft-events").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("tumbling window: stream result equals batch result") {
    val batch = Streaming.tumblingCounts(
      spark.read.schema(Streaming.eventSchema).parquet(stagedDir))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("ws", "event_type").collect().toSeq
    val q = Streaming.runToMemory(
      Streaming.tumblingCounts(Streaming.eventStream(spark, stagedDir)),
      "tumbling_out")
    try {
      val streamed = spark.table("tumbling_out")
        .select(col("window.start").as("ws"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("ws", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionize on a stream matches the batch session count") {
    import TestSpark.spark.implicits._
    val stream = Streaming.eventStream(spark, stagedDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streaming.Event]
    val q = Streaming.statefulSessionize(stream).writeStream
      .outputMode("append").format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
      assert(streamed.count() == 1000L) // every event sessionized once
      val nSessions = streamed
        .select("user_id", "session_id").distinct().count()
      // batch reference: the relational sessionize query at sf0.001
      val batchSessions = SparkEntry.queries("sessionize")(spark,
        "/root/testdata/sf0.001").count()
      assert(nSessions == batchSessions)
    } finally q.stop()
  }

  test("streaming parquet sink with checkpoint lands every row") {
    val outDir = Files.createTempDirectory("graft-ssink").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = Streaming.eventStream(spark, stagedDir)
      .select("event_id", "user_id", "value")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).count() == 1000L)
    } finally q.stop()
  }

  test("watermark drops late data in append mode") {
    import TestSpark.spark.implicits._
    val dir = Files.createTempDirectory("graft-late").toString
    def write(rows: Seq[(Long, String, Long, String, Double)]): Unit =
      rows.toDF("event_id", "tss", "user_id", "event_type", "value")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .coalesce(1).write.mode("append").parquet(dir)

    // batch 1: events across 00:00-03:00 → watermark advances to 02:50
    write(Seq(
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:40:00", 1L, "click", 1.0),
      (3L, "2024-01-01 03:00:00", 1L, "click", 1.0)))
    val agg = Streaming.tumblingCounts(Streaming.eventStream(spark, dir))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: one event far behind the watermark (00:30) + one fresh
      write(Seq(
        (4L, "2024-01-01 00:30:00", 1L, "click", 1.0), // LATE → dropped
        (5L, "2024-01-01 03:30:00", 1L, "click", 1.0)))
      q.processAllAvailable()
      val counts = spark.table("late_out")
        .select(col("window.start").cast("string").as("ws"), col("n_events"))
        .as[(String, Long)].collect().toMap
      // the 00:00 window was finalized with 2 events; the late event 4
      // must not re-open or re-emit it
      assert(counts("2024-01-01 00:00:00") == 2L,
        s"late event leaked into finalized window: $counts")
    } finally q.stop()
  }

  test("tokenBudgetAdmit spends per-source budgets across micro-batches") {
    import spark.implicits._
    import graft.streaming.Streaming.{AdmittedDoc, Doc}
    // transformWithState runs only on the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Doc](spark)
      val q = graft.streaming.Streaming
        .tokenBudgetAdmit(in.toDS(), budgetPerSource = 100L)
        .writeStream.outputMode("append").format("memory")
        .queryName("budget_out").start()
      try {
        // batch 1: web spends 90 of its 100-token budget; books spends 60
        in.addData(Doc(1L, "web", 50L), Doc(2L, "web", 40L),
          Doc(3L, "books", 60L))
        q.processAllAvailable()
        // batch 2: web has 10 left -> doc 4 admitted (overshoot rule:
        // counter 90 < 100), doc 5 rejected; books admits doc 6
        in.addData(Doc(4L, "web", 30L), Doc(5L, "web", 10L),
          Doc(6L, "books", 30L))
        q.processAllAvailable()
        val out = spark.table("budget_out").as[AdmittedDoc]
          .collect().map(a => a.doc_id -> a.running_tokens).toMap
        assert(out == Map(1L -> 50L, 2L -> 90L, 3L -> 60L,
          4L -> 120L, 6L -> 90L))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("tokenBudgetAdmit matches the batch twin tokenBudgetBatch on an " +
      "id-ordered replay over any micro-batch split") {
    import spark.implicits._
    import graft.streaming.Streaming.{AdmittedDoc, Doc}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(7)
      val docs = (0L until 60L).map(i =>
        Doc(i, s"src${i % 3}", 10L + rnd.nextInt(40)))
      val expected = graft.engine.Extensions.tokenBudgetBatch(
          docs.toDF(), "source", "doc_id", col("n_tokens"),
          budgetPerSource = 300L)
        .as[AdmittedDoc].collect()
        .map(a => (a.doc_id, a.source, a.n_tokens, a.running_tokens))
        .toSet
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Doc](spark)
      val q = graft.streaming.Streaming
        .tokenBudgetAdmit(in.toDS(), budgetPerSource = 300L)
        .writeStream.outputMode("append").format("memory")
        .queryName("budget_twin_out").start()
      try {
        // id-ordered replay, uneven micro-batch splits
        for (chunk <- docs.grouped(17)) {
          in.addData(chunk: _*)
          q.processAllAvailable()
        }
        val got = spark.table("budget_twin_out").as[AdmittedDoc]
          .collect()
          .map(a => (a.doc_id, a.source, a.n_tokens, a.running_tokens))
          .toSet
        assert(got == expected,
          s"stream ${got.size} rows differ from batch ${expected.size}")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("ewmaStream reproduces batch ewmaSmooth bit-for-bit across " +
      "micro-batch splits; late or duplicate days are dropped") {
    import spark.implicits._
    import graft.streaming.Streaming.{DailyValue, EwmaPoint}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // values exactly representable (×100 is an exact integer), so the
      // batch round(v*100) and the stream's integer cents agree
      val series = Seq(
        ("g1", 0L, 1.25), ("g1", 1L, 2.5), ("g1", 2L, 0.75),
        ("g1", 3L, 4.0), ("g1", 4L, 3.25),
        ("g2", 2L, 7.5), ("g2", 5L, 1.0))
      val batchDf = series.map { case (g, day, v) =>
        (g, java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(day)), v)
      }.toDF("g", "d", "v")
      val expected = graft.engine.Analytics
        .ewmaSmooth(batchDf, "g", "d", "v", alpha = 0.3)
        .as[(String, Long, Double)].collect().toSet
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[DailyValue](spark)
      val droppedAcc = spark.sparkContext.longAccumulator("ewma_dropped")
      val q = graft.streaming.Streaming
        .ewmaStream(in.toDS(), alpha = 0.3, dropped = Some(droppedAcc))
        .writeStream.outputMode("append").format("memory")
        .queryName("ewma_out").start()
      try {
        def cents(v: Double) = math.round(v * 100)
        // split mid-series per group, out of order WITHIN the batch
        in.addData(series.take(3).reverse.map { case (g, d, v) =>
          DailyValue(g, d, cents(v)) }: _*)
        q.processAllAvailable()
        in.addData(series.drop(3).map { case (g, d, v) =>
          DailyValue(g, d, cents(v)) }: _*)
        q.processAllAvailable()
        val got = spark.table("ewma_out").as[EwmaPoint]
          .collect().map(p => (p.g, p.day, p.ewma)).toSet
        assert(got == expected,
          s"stream $got differs from batch $expected")
        // a late daily total at an already-emitted day is dropped —
        // and the drop is OBSERVABLE via the accumulator (ADVICE r9:
        // input-contract violations must not be silent)
        assert(droppedAcc.value == 0L)
        in.addData(DailyValue("g1", 2L, 99900L))
        q.processAllAvailable()
        assert(spark.table("ewma_out").count() == series.size.toLong)
        assert(droppedAcc.value == 1L,
          s"dropped-row accumulator saw ${droppedAcc.value}")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("driftSeriesWindowed: append-mode stream under a watermark and " +
      "uneven micro-batches emits the same per-window PSI series as " +
      "the batch run (VERDICT r12 #3)") {
    import spark.implicits._
    val binned = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), least(greatest(
          (round(col("value") * 100).cast("long") / lit(2000L)).cast("int"),
          lit(0)), lit(7)).as("bin"))
    // frozen reference histogram: the purchase-event value mix
    // (bounded collect: 8 bins)
    val refMap = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase")
      .select(least(greatest(
          (round(col("value") * 100).cast("long") / lit(2000L)).cast("int"),
          lit(0)), lit(7)).as("bin"))
      .groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ref = (0 until 8).map(b => refMap.getOrElse(b, 0L))
    val expected = Streaming
      .driftSeriesWindowed(binned, "ts", "bin", ref, "6 hours")
      .select(col("window.start").as("ws"), col("n_cur"), col("psi"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1),
        r.getDouble(2))).toSet
    val rows = binned.as[BinnedEvent].collect().sortBy(_.ts.getTime)
    assert(rows.length > 100)
    val sentinel = BinnedEvent(
      new java.sql.Timestamp(rows.last.ts.getTime + 10L * 86400000L), 0)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[BinnedEvent](spark)
    val q = Streaming.driftSeriesWindowed(
        in.toDS().toDF().withWatermark("ts", "1 minute"),
        "ts", "bin", ref, "6 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("drift_series_out").start()
    try {
      // three deliberately uneven waves, time-ordered so the watermark
      // only advances; the sentinel closes every real window
      val (w1, rest) = rows.splitAt(rows.length / 10)
      val (w2, w3) = rest.splitAt(rest.length / 2)
      Seq(w1, w2, w3, Array(sentinel)).foreach { wave =>
        in.addData(wave.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("drift_series_out")
        .select(col("window.start").as("ws"), col("n_cur"), col("psi"))
        .filter(col("ws") <= rows.last.ts) // the sentinel window stays open
        .collect().map(r => (r.getTimestamp(0), r.getLong(1),
          r.getDouble(2))).toSet
      assert(streamed == expected,
        s"stream emitted ${streamed.size} windows, batch ${expected.size}")
      assert(expected.size > 3)
    } finally q.stop()
  }

  test("streaming dedup: dropDuplicatesWithinWatermark on event_id") {
    import TestSpark.spark.implicits._
    val dir = Files.createTempDirectory("graft-sdedup").toString
    // duplicate event_ids within the watermark horizon
    Seq((1L, "2024-01-01 00:10:00", 1L, "click", 1.0),
        (1L, "2024-01-01 00:10:30", 1L, "click", 1.0),
        (2L, "2024-01-01 00:20:00", 1L, "view", 2.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(dir)
    val q = Streaming.eventStream(spark, dir)
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sdedup_out").count() == 2L) // dup id 1 collapsed
    } finally q.stop()
  }

  test("stream-static enrichment join") {
    import TestSpark.spark.implicits._
    val userDim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val enriched = Streaming.eventStream(spark, stagedDir)
      .join(userDim, Seq("user_id"), "left")
    val q = enriched.writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("enrich_out")
      assert(out.count() == 1000L)
      assert(out.filter(col("user_id") === 1L && col("tier") =!= "gold")
        .count() == 0)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    import TestSpark.spark.implicits._
    def stage(rows: Seq[(Long, String, Long)], dir: String): String = {
      rows.toDF("event_id", "tss", "user_id")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
          col("user_id"), lit("click").as("event_type"), lit(1.0).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }
    val clicksDir = stage(Seq(
      (1L, "2024-01-01 00:10:00", 1L),
      (2L, "2024-01-01 01:00:00", 1L),
      (3L, "2024-01-01 00:20:00", 2L)),
      Files.createTempDirectory("graft-ssj-c").toString)
    val viewsDir = stage(Seq(
      (10L, "2024-01-01 00:15:00", 1L), // within 30min of click 1
      (11L, "2024-01-01 02:00:00", 1L), // within 30min of nothing... (60min from click 2)
      (12L, "2024-01-01 00:25:00", 2L)),
      Files.createTempDirectory("graft-ssj-v").toString)
    def shape(dir: String, side: String) =
      Streaming.eventStream(spark, dir).select(
        col("event_id").as(s"${side}_id"), col("ts").as(s"${side}_ts"),
        col("user_id").as(s"${side}_user"))
    val joined = Streaming.intervalJoin(
      shape(clicksDir, "c"), shape(viewsDir, "v"),
      "c_user", "v_user", "c_ts", "v_ts", withinSeconds = 1800L)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_out").select("c_id", "v_id")
        .as[(Long, Long)].collect().toSet
      // batch twin of the same join
      def batchShape(dir: String, side: String) =
        spark.read.schema(Streaming.eventSchema).parquet(dir).select(
          col("event_id").as(s"${side}_id"), col("ts").as(s"${side}_ts"),
          col("user_id").as(s"${side}_user"))
      val batch = Streaming.intervalJoin(
        batchShape(clicksDir, "c"), batchShape(viewsDir, "v"),
        "c_user", "v_user", "c_ts", "v_ts", withinSeconds = 1800L)
        .select("c_id", "v_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set((1L, 10L), (3L, 12L))) // the ±30min matches
    } finally q.stop()
  }

  test("session windows count every event exactly once") {
    val batch = Streaming.sessionCounts(
      spark.read.schema(Streaming.eventSchema).parquet(stagedDir))
    val total = batch.agg(sum("n_events")).head().getLong(0)
    assert(total == 1000L) // sf0.001 events row count
  }

  // ── batch/stream equivalence under UNEVEN micro-batch splits
  // (VERDICT r10 #5: stream_admission set the pattern — each stateful
  // streaming path must provably BE the batch semantics, with state
  // carried across arbitrary batch boundaries, not just one batch) ──

  test("statefulSessionize reproduces the batch lag+cumsum session " +
      "assignment per event, across uneven micro-batch splits") {
    import TestSpark.spark.implicits._
    import graft.streaming.Streaming.{Event, SessionizedEvent}
    val rnd = new scala.util.Random(13)
    // 3 interleaved users; global steps of 2..42 min, so per-user gaps
    // straddle the 30-min session boundary in both directions
    var clock = 1700000000L
    val events = (0 until 120).map { i =>
      clock += 120 + rnd.nextInt(2400)
      Event(i.toLong, new java.sql.Timestamp(clock * 1000L),
        (i % 3).toLong, "click", 1.0)
    }
    // batch twin: the relational sessionize query's per-event
    // assignment (lag + running sum) on the same rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("epoch_s", "event_id")
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val expected = events.toDF()
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("epoch_s"))
      .withColumn("new_s",
        when(col("epoch_s") - lag("epoch_s", 1).over(w) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_s").over(cum))
      .select("event_id", "user_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event](spark)
    val q = Streaming.statefulSessionize(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_twin_out").start()
    try {
      // ts-ordered replay (the operator's documented contract), chunks
      // of 17 over 120 rows — boundaries never align with users or
      // sessions, and the last chunk carries a single event
      for (chunk <- events.grouped(17)) {
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("sess_twin_out").as[SessionizedEvent]
        .collect().map(e => (e.event_id, e.user_id, e.session_id)).toSet
      assert(got == expected,
        s"stream ${got.size} assignments differ from batch ${expected.size}")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join on " +
      "a seeded workload fed in uneven, unaligned splits on both sides") {
    import TestSpark.spark.implicits._
    import graft.streaming.Streaming.Event
    val rnd = new scala.util.Random(29)
    def series(idBase: Long, tag: String, seedStep: Int): Seq[Event] = {
      var t = 1700000000L
      (0 until 40).map { i =>
        t += 30 + rnd.nextInt(seedStep)
        Event(idBase + i, new java.sql.Timestamp(t * 1000L),
          (i % 5).toLong, tag, 1.0)
      }
    }
    val clicks = series(0L, "click", 300)
    val views = series(1000L, "view", 300)
    def shape(df: org.apache.spark.sql.DataFrame, side: String) =
      df.select(col("event_id").as(s"${side}_id"),
        col("ts").as(s"${side}_ts"), col("user_id").as(s"${side}_user"))
    val batch = Streaming.intervalJoin(
        shape(clicks.toDF(), "c"), shape(views.toDF(), "v"),
        "c_user", "v_user", "c_ts", "v_ts", withinSeconds = 600L)
      .select("c_id", "v_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty) // the fixture must actually exercise matches
    val inC = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event](spark)
    val inV = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event](spark)
    // watermarks present (they are what bounds join state), but wider
    // than the whole fixture span so bounding can never drop a legal
    // match — the equivalence must be exact
    val joined = Streaming.intervalJoin(
      shape(inC.toDS().toDF().withWatermark("ts", "3 hours"), "c"),
      shape(inV.toDS().toDF().withWatermark("ts", "3 hours"), "v"),
      "c_user", "v_user", "c_ts", "v_ts", withinSeconds = 600L)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_twin_out").start()
    try {
      // unaligned chunking: 11-row click batches vs 7-row view batches,
      // so every micro-batch joins against partly-buffered other-side
      // state rather than a mirror-image batch
      val cs = clicks.grouped(11).toSeq
      val vs = views.grouped(7).toSeq
      for (i <- 0 until math.max(cs.size, vs.size)) {
        if (i < cs.size) inC.addData(cs(i): _*)
        if (i < vs.size) inV.addData(vs(i): _*)
        q.processAllAvailable()
      }
      val got = spark.table("ssj_twin_out").select("c_id", "v_id")
        .as[(Long, Long)].collect().toSet
      assert(got == batch,
        s"stream ${got.size} pairs differ from batch ${batch.size}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark equals batch distinct-by-id when " +
      "every duplicate lands inside the horizon, across uneven splits") {
    import TestSpark.spark.implicits._
    import graft.streaming.Streaming.Event
    val rnd = new scala.util.Random(31)
    // 60 rows over 20 ids — each id recurs ~3 times, spread over ~75
    // min, all inside the 2-hour dedup horizon
    var t = 1700000000L
    val events = (0 until 60).map { i =>
      t += 30 + rnd.nextInt(120)
      Event((i % 20).toLong, new java.sql.Timestamp(t * 1000L),
        1L, "click", i.toDouble)
    }
    val expectedIds = events.map(_.event_id).distinct.sorted
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event](spark)
    val q = in.toDS().toDF().withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_twin_out").start()
    try {
      // ts-ordered uneven chunks (13) — duplicates of one id straddle
      // chunk boundaries, so the dedup state must carry across batches
      for (chunk <- events.grouped(13)) {
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("sdedup_twin_out").select("event_id")
        .as[Long].collect().toSeq
      // exactly once per id: the id SET matches batch
      // dropDuplicates("event_id") and no id is emitted twice
      assert(got.sorted == expectedIds,
        s"streamed ids ${got.size} differ from batch distinct " +
          s"${expectedIds.size}")
    } finally q.stop()
  }


  test("mergeSink applies CDC micro-batches: last-write-wins per key, " +
      "delete removes, state survives across batches, replay-safe layout") {
    import TestSpark.spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long, Boolean)](spark)
    val target = Files.createTempDirectory("graft-merge-target").toString
    val ckpt = Files.createTempDirectory("graft-merge-ckpt").toString
    val q = Streaming.mergeSink(
      input.toDF().toDF("k", "v", "seq", "del"),
      Seq("k"), "seq", Some("del"), target, ckpt)
    try {
      // batch 1: two inserts + an in-batch overwrite of key 1
      input.addData((1L, "a", 1L, false), (2L, "b", 1L, false),
        (1L, "a2", 2L, false))
      q.processAllAvailable()
      val s1 = Streaming.readMergeTarget(spark, target)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(s1 == Map(1L -> "a2", 2L -> "b"))
      // batch 2: update key 2, delete key 1, insert key 3
      input.addData((2L, "b2", 3L, false), (1L, "gone", 4L, true),
        (3L, "c", 5L, false))
      q.processAllAvailable()
      val s2 = Streaming.readMergeTarget(spark, target)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(s2 == Map(2L -> "b2", 3L -> "c"))
      // the previous generation is still on disk (crash safety: the
      // _CURRENT pointer is the commit point, not the directory write)
      val gens = new java.io.File(target).listFiles()
        .filter(_.getName.startsWith("gen-")).map(_.getName).sorted
      assert(gens.length >= 2, s"expected ≥2 generations, got: ${gens.toSeq}")
    } finally q.stop()
  }

  test("indexIngestSink keeps ingesting across a segment compaction: " +
      "appends follow the flipped root, queries see every batch") {
    import TestSpark.spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val idx = Files.createTempDirectory("graft-sidx-compact").toString
    val ckpt = Files.createTempDirectory("graft-sidx-compact-ck").toString
    val q = Streaming.indexIngestSink(
      input.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, ckpt,
      nBuckets = 8)
    try {
      input.addData((1L, "spark window join"), (2L, "merge sort run"))
      q.processAllAvailable()
      input.addData((3L, "spark merge stream"))
      q.processAllAvailable()
      assert(graft.engine.TextIndex.compactSegments(spark, idx))
      // ingestion continues into the compacted root
      input.addData((4L, "spark rides on"))
      q.processAllAvailable()
      val loaded = graft.engine.TextIndex.loadSegments(spark, idx)
      assert(loaded.nDocs == 4)
      val hits = loaded.query(
          Seq((1L, "spark")).toDF("query_id", "qtext"),
          "qtext", "query_id", k = 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(hits == Set(1L, 3L, 4L)) // pre- and post-compaction docs
      // live root has the compacted segment + the post-compaction epoch
      val root = graft.engine.Generations.currentName(idx).get
      assert(new java.io.File(s"$idx/$root").listFiles()
        .count(_.isDirectory) == 2)
    } finally q.stop()
  }

  test("mergeBatch is partition-scoped: untouched buckets carry forward " +
      "by hard link (same inode, not rewritten); touched bucket is new") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val target = Files.createTempDirectory("graft-mb").toString
    val b1 = (1L to 64L).map(k => (k, s"v$k", 1L, false))
      .toDF("k", "v", "seq", "del")
    Streaming.mergeBatch(b1, 0L, Seq("k"), "seq", Some("del"), target,
      nBuckets = 8, retainGenerations = 10)
    // batch 2 touches ONLY key 1 → exactly one bucket rewritten
    val b2 = Seq((1L, "v1b", 2L, false)).toDF("k", "v", "seq", "del")
    Streaming.mergeBatch(b2, 1L, Seq("k"), "seq", Some("del"), target,
      nBuckets = 8, retainGenerations = 10)
    val touched = Seq(1L).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(8)).cast("int"))
      .head().getInt(0)
    val oldGen = new java.io.File(target, "gen-0")
    val newGen = new java.io.File(target, "gen-1")
    val bucketDirs = newGen.listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("__bucket="))
    assert(bucketDirs.length == 8, "64 keys over 8 buckets fill all 8")
    bucketDirs.foreach { d =>
      val b = d.getName.stripPrefix("__bucket=").toInt
      val olds = new java.io.File(oldGen, d.getName).listFiles()
        .filter(_.isFile).map(f => f.getName -> f).toMap
      val news = d.listFiles().filter(_.isFile)
      if (b == touched) {
        // rewritten: no file of the new bucket dir is the old inode
        assert(news.forall(f => !olds.get(f.getName).exists(o =>
          java.nio.file.Files.isSameFile(o.toPath, f.toPath))),
          s"touched bucket $b carried an old file")
      } else {
        // carried: every file IS the old file (hard link, same inode)
        assert(news.nonEmpty && news.forall(f =>
          olds.get(f.getName).exists(o =>
            java.nio.file.Files.isSameFile(o.toPath, f.toPath))),
          s"untouched bucket $b was rewritten instead of linked")
      }
    }
    val state = Streaming.readMergeTarget(spark, target)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state.size == 64 && state(1L) == "v1b" && state(2L) == "v2")
  }

  test("mergeBatch refuses a pre-stamp target: generations without an " +
      "_NBUCKETS file require explicit migration, never a trusted guess") {
    import TestSpark.spark.implicits._
    val target = Files.createTempDirectory("graft-mb-migrate").toString
    val b1 = Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
      .toDF("k", "v", "seq", "del")
    Streaming.mergeBatch(b1, 0L, Seq("k"), "seq", Some("del"), target,
      nBuckets = 8)
    // simulate a target written by the pre-stamp code
    val meta = new java.io.File(target, "_NBUCKETS")
    assert(meta.delete(), "stamp should exist after the first batch")
    val b2 = Seq((2L, "b2", 2L, false)).toDF("k", "v", "seq", "del")
    val ex = intercept[IllegalStateException] {
      // even the HISTORICALLY CORRECT count is refused — the layout
      // cannot prove it, and a wrong guess resurrects overwritten keys
      Streaming.mergeBatch(b2, 1L, Seq("k"), "seq", Some("del"), target,
        nBuckets = 8)
    }
    assert(ex.getMessage.contains("_NBUCKETS"))
    // the documented migration: restore the stamp → appends proceed
    java.nio.file.Files.write(meta.toPath, "8".getBytes("UTF-8"))
    Streaming.mergeBatch(b2, 1L, Seq("k"), "seq", Some("del"), target,
      nBuckets = 8)
    val state = Streaming.readMergeTarget(spark, target)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "a", 2L -> "b2"))
  }

  test("mergeBatch replay of a committed epoch is a no-op (crash between " +
      "pointer flip and checkpoint commit recovers)") {
    import TestSpark.spark.implicits._
    val target = Files.createTempDirectory("graft-mb-replay").toString
    val b1 = Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
      .toDF("k", "v", "seq", "del")
    Streaming.mergeBatch(b1, 0L, Seq("k"), "seq", Some("del"), target)
    val b2 = Seq((2L, "b2", 2L, false)).toDF("k", "v", "seq", "del")
    Streaming.mergeBatch(b2, 1L, Seq("k"), "seq", Some("del"), target)
    val before = Streaming.readMergeTarget(spark, target)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val files = new java.io.File(target, "gen-1").listFiles().map(_.getName)
    // the replay: same epoch again — previously this threw
    // "Cannot overwrite a path that is also being read from"
    Streaming.mergeBatch(b2, 1L, Seq("k"), "seq", Some("del"), target)
    assert(graft.engine.Generations.currentName(target) == Some("gen-1"))
    assert(new java.io.File(target, "gen-1").listFiles().map(_.getName)
      .toSet == files.toSet)
    assert(Streaming.readMergeTarget(spark, target)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap == before)
  }

  test("mergeBatch retention sweeps superseded generations; the current " +
      "target stays fully readable because carried files are hard links; " +
      "an all-delete batch leaves a readable empty target") {
    import TestSpark.spark.implicits._
    val target = Files.createTempDirectory("graft-mb-gc").toString
    def batch(rows: Seq[(Long, String, Long, Boolean)], epoch: Long): Unit =
      Streaming.mergeBatch(rows.toDF("k", "v", "seq", "del"), epoch,
        Seq("k"), "seq", Some("del"), target, nBuckets = 8,
        retainGenerations = 2)
    batch((1L to 64L).map(k => (k, s"v$k", 1L, false)), 0L)
    batch(Seq((1L, "v1b", 2L, false)), 1L)
    batch(Seq((2L, "v2b", 3L, false)), 2L)
    batch(Seq((3L, "v3b", 4L, false)), 3L)
    val gens = new java.io.File(target).listFiles()
      .filter(_.getName.startsWith("gen-")).map(_.getName).sorted
    assert(gens.toSeq == Seq("gen-2", "gen-3"),
      s"retention 2 should keep the newest two, got: ${gens.toSeq}")
    // gen-0 (the origin of most hard-linked bucket files) is GONE, yet
    // every key must still read — links keep the data alive
    val state = Streaming.readMergeTarget(spark, target)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state.size == 64 && state(1L) == "v1b" && state(2L) == "v2b" &&
      state(3L) == "v3b" && state(64L) == "v64")
    // crash-mid-gc analogue: a superseded dir half-deleted by hand, the
    // next sweep finishes it and _CURRENT never flinches
    val doomed = new java.io.File(target, "gen-2")
    doomed.listFiles().filter(_.isFile).foreach(_.delete())
    batch(Seq((4L, "v4b", 5L, false)), 4L)
    assert(graft.engine.Generations.currentName(target) == Some("gen-4"))
    assert(Streaming.readMergeTarget(spark, target)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      .apply(4L) == "v4b")
    // delete every key: the target must stay readable (and empty)
    batch((1L to 64L).map(k => (k, "x", 6L, true)), 5L)
    assert(Streaming.readMergeTarget(spark, target).count() == 0L)
  }

  test("mergeBatch composite keys: bucket hash spans all key columns; " +
      "a 25-epoch trickle stream stays at the retention bound with " +
      "correct final state") {
    import TestSpark.spark.implicits._
    val target = Files.createTempDirectory("graft-mb-long").toString
    // seed: 40 (region, id) composite keys
    val seed = (for (r <- 0L until 4L; i <- 0L until 10L)
      yield (r, i, s"v$r-$i", 0L, false)).toSeq
    Streaming.mergeBatch(seed.toDF("r", "i", "v", "seq", "del"), 0L,
      Seq("r", "i"), "seq", Some("del"), target, nBuckets = 8,
      retainGenerations = 2)
    // 25 single-key trickle updates — the long-running CDC shape
    (1L to 25L).foreach { e =>
      Streaming.mergeBatch(
        Seq((e % 4, e % 10, s"u$e", e, false)).toDF("r", "i", "v", "seq",
          "del"), e, Seq("r", "i"), "seq", Some("del"), target,
        nBuckets = 8, retainGenerations = 2)
    }
    // storage stays bounded: exactly the retention window survives
    val gens = new java.io.File(target).listFiles()
      .filter(_.getName.startsWith("gen-")).map(_.getName).sorted
    assert(gens.toSeq == Seq("gen-24", "gen-25"), s"gens: ${gens.toSeq}")
    // final state: every key present, last writer won per composite key
    val state = Streaming.readMergeTarget(spark, target)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert(state.size == 40)
    assert(state((25L % 4, 25L % 10)) == "u25")
    assert(state((0L, 0L)) == "u20") // epoch 20 hit (0,0); nothing later
    // (2,1) is unreachable by e%4/e%10 for e ≤ 25: seed value intact
    assert(state((2L, 1L)) == "v2-1")
  }

  test("driftMonitorSink: an in-distribution batch logs near-zero PSI, " +
      "a shifted batch logs high PSI, per epoch") {
    import TestSpark.spark.implicits._
    val baseline = (1 to 200).map(i => (i % 100).toDouble).toDF("v")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Double](spark)
    val report = Files.createTempDirectory("graft-drift").toString
    val ckpt = Files.createTempDirectory("graft-drift-ckpt").toString
    val q = Streaming.driftMonitorSink(input.toDF().toDF("v"), baseline,
      "v", bins = 5, lo = 0.0, hi = 100.0, report, ckpt)
    try {
      input.addData((1 to 100).map(i => (i % 100).toDouble): _*) // same dist
      q.processAllAvailable()
      input.addData((1 to 100).map(_ => 99.0): _*) // collapsed to top bin
      q.processAllAvailable()
      val totals = spark.read.parquet(report)
        .select("batch_id", "psi_total").distinct()
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(totals.size == 2)
      assert(totals(0L) < 0.1, s"in-dist batch drifted: ${totals(0L)}")
      assert(totals(1L) > 0.25, s"shifted batch not flagged: ${totals(1L)}")
      // per-bin rows: 5 bins per epoch
      assert(spark.read.parquet(report).count() == 10)
    } finally q.stop()
  }

  test("distinctCountSink: sketches fold across batches — repeated " +
      "values never double-count, new values register") {
    import TestSpark.spark.implicits._
    import graft.engine.DistinctStore
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)](spark)
    val store = Files.createTempDirectory("graft-dcs").toString
    val ckpt = Files.createTempDirectory("graft-dcs-ckpt").toString
    val q = Streaming.distinctCountSink(
      input.toDF().toDF("seg", "uid"), "seg", "uid", store, ckpt)
    try {
      input.addData(("a", 1L), ("a", 2L), ("b", 1L))
      q.processAllAvailable()
      input.addData(("a", 2L), ("a", 3L), ("b", 1L)) // 2 and b/1 repeat
      q.processAllAvailable()
      val est = DistinctStore.estimates(
          Streaming.readMergeTarget(spark, store))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est == Map("a" -> 3L, "b" -> 1L))
    } finally q.stop()
  }

  test("indexIngestSink: each micro-batch becomes a segment; the " +
      "segmented index answers over all batches seen so far") {
    import TestSpark.spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val idx = Files.createTempDirectory("graft-sidx").toString
    val ckpt = Files.createTempDirectory("graft-sidx-ckpt").toString
    val q = Streaming.indexIngestSink(
      input.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, ckpt,
      nBuckets = 8)
    try {
      input.addData((1L, "spark window join"), (2L, "merge sort run"))
      q.processAllAvailable()
      input.addData((3L, "spark merge stream"))
      q.processAllAvailable()
      val segs = new java.io.File(s"$idx/segments").listFiles().map(_.getName)
      assert(segs.length == 2, s"expected 2 segments, got ${segs.toSeq}")
      val loaded = graft.engine.TextIndex.loadSegments(spark, idx)
      assert(loaded.nDocs == 3)
      val hits = loaded.query(
          Seq((1L, "spark")).toDF("query_id", "qtext"),
          "qtext", "query_id", k = 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(hits == Set(1L, 3L)) // both spark docs, across batches
    } finally q.stop()
  }

  test("qualityMonitorSink appends a per-rule report per micro-batch; " +
      "a failing batch shows up as passed=false for its epoch") {
    import TestSpark.spark.implicits._
    import graft.engine.Quality
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](spark)
    val report = Files.createTempDirectory("graft-qmon-report").toString
    val ckpt = Files.createTempDirectory("graft-qmon-ckpt").toString
    val q = Streaming.qualityMonitorSink(
      input.toDF().toDF("id", "v"),
      Seq(Quality.InRange("v", 0.0, 100.0, minRatio = 1.0)),
      report, ckpt)
    try {
      input.addData((1L, 5.0), (2L, 50.0))     // batch 0: all in range
      q.processAllAvailable()
      input.addData((3L, 500.0), (4L, 10.0))   // batch 1: violation
      q.processAllAvailable()
      val rows = spark.read.parquet(report)
        .select("batch_id", "rule", "passed")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
        .toSet
      assert(rows == Set(
        (0L, "in_range(v)", true),
        (1L, "in_range(v)", false)))
    } finally q.stop()
  }

  test("vectorIngestSink: micro-batches land as claimed epochs in a " +
      "saved IVF index, replay from the checkpoint adds nothing, and " +
      "the grown index serves the ingested vectors") {
    import TestSpark.spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.filter(col("vec_id") < 50)
    val idxDir = Files.createTempDirectory("graft-vingest-idx").toString
    val ckpt = Files.createTempDirectory("graft-vingest-ckpt").toString
    graft.engine.IvfIndex.build(base, "embedding", "vec_id", nCells = 4)
      .save(idxDir)
    val wave1 = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .as[(Long, Array[Float], Int)].collect()
      .map(r => (r._1, r._2.toSeq)).toSeq
    val wave2 = emb.filter(col("vec_id") >= 60 && col("vec_id") < 70)
      .as[(Long, Array[Float], Int)].collect()
      .map(r => (r._1, r._2.toSeq)).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark)
    val q = Streaming.vectorIngestSink(
      input.toDF().select(col("_1").as("vec_id"),
        col("_2").cast("array<float>").as("embedding")),
      idxDir, "embedding", "vec_id", ckpt)
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
      val grown = graft.engine.IvfIndex.cellsWithEpochs(spark, idxDir)
      assert(grown.count() == 70L)
      // two claimed epoch segments, named by batch id
      val epochs = new java.io.File(s"$idxDir/epochs").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(epochs.toSeq == Seq("batch-000000000", "batch-000000001"))
      assert(epochs.forall(e =>
        new java.io.File(s"$idxDir/epochs/$e/_claim").exists()))
    } finally q.stop()
    // restart from the same checkpoint: a replayed epoch is already
    // claimed, so appendEpoch refuses it and counts stay exact (the
    // direct claim-replay law is in IvfIndexSpec; this drives it
    // through the restarted streaming query)
    val q2 = Streaming.vectorIngestSink(
      input.toDF().select(col("_1").as("vec_id"),
        col("_2").cast("array<float>").as("embedding")),
      idxDir, "embedding", "vec_id", ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.engine.IvfIndex.cellsWithEpochs(spark, idxDir)
      .count() == 70L)
    // the ingested vectors are now first-class: an epoch id queries and
    // surfaces as neighbors through the loaded index
    val loaded = graft.engine.IvfIndex.load(spark, idxDir, "vec_id",
      "embedding")
    val res = loaded.queryByIds(Seq(65L), k = 10, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0))
    assert(res.nonEmpty)
  }

  test("semanticDedupIngestSink: micro-batches land as committed store " +
      "epochs, the accumulated state equals the BATCH semanticDedup on " +
      "the union after every prefix, and a checkpoint restart replays " +
      "as a no-op") {
    import TestSpark.spark.implicits._
    // the SemanticStoreSpec geometry: a—b—c is a transitive chain that
    // CROSSES the micro-batch boundary, d—e a cross-batch pair, f a
    // singleton (cos(f,b)=0.436, cos(f,c)=0.785 < 0.8)
    val s = math.sqrt(1 - 0.81).toFloat
    val c2 = (2 * 0.9 * 0.9 - 1).toFloat
    val s2v = (2 * 0.9 * s).toFloat
    val emb = Map(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0.9f, s, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f), 4L -> Seq(0f, 0f, 0f, 0f),
      5L -> Seq(c2, s2v, 0f, 0f),
      6L -> Seq(0f, 0f, 0.95f, 0.312f), 7L -> Seq(0f, 1f, 0f, 0f))
    val quality = Map(1L -> 10L, 2L -> 20L, 3L -> 5L, 4L -> 1L,
      5L -> 30L, 6L -> 50L, 7L -> 2L)
    val rows = emb.keys.toSeq.sorted
      .map(id => (id, quality(id), emb(id)))
    val wave1 = rows.filter(_._1 <= 4) // incl. the zero-norm row
    val wave2 = rows.filter(_._1 > 4)
    val store = Files.createTempDirectory("graft-semsink").toString
    val ckpt = Files.createTempDirectory("graft-semsink-ckpt").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Seq[Float])](spark)
    def sink() = Streaming.semanticDedupIngestSink(
      input.toDF().select(col("_1").as("doc_id"), col("_2").as("q"),
        col("_3").cast("array<float>").as("embedding")),
      s"$store/s", "doc_id", "q", "embedding", minCosine = 0.8,
      nCells = 4, checkpointDir = ckpt)
    def docsOf(w: Seq[(Long, Long, Seq[Float])]) =
      w.map(r => (r._1, r._2)).toDF("doc_id", "q")
    def embOf(w: Seq[(Long, Long, Seq[Float])]) =
      w.map(r => (r._1, r._3)).toDF("doc_id", "embedding")
    def state() = graft.engine.SemanticStore
      .snapshot(spark, s"$store/s", "doc_id", "q")
      .select("doc_id", "component", "q", "keep")
      .as[(Long, Long, Long, Int)].collect().toSet
    def batchOn(ws: Seq[(Long, Long, Seq[Float])]*) =
      graft.engine.Extensions.semanticDedup(
          docsOf(ws.flatten), embOf(ws.flatten), "doc_id", "q",
          "embedding", minCosine = 0.8, nCells = 4)
        .select("doc_id", "component", "q", "keep")
        .as[(Long, Long, Long, Int)].collect().toSet
    val q = sink()
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      assert(state() == batchOn(wave1))
      input.addData(wave2: _*); q.processAllAvailable()
      assert(state() == batchOn(wave1, wave2))
      // the boundary-crossing chain merged and the best-quality member
      // of {1, 2, 5} is the keeper
      val st = state()
      val comp1 = st.find(_._1 == 1L).get._2
      assert(st.find(_._1 == 5L).get._2 == comp1)
      assert(st.filter(_._2 == comp1).filter(_._4 == 1).map(_._1) ==
        Set(5L))
      assert(graft.engine.SemanticStore
        .committedEpochs(spark, s"$store/s") ==
        Seq("batch-000000000", "batch-000000001"))
    } finally q.stop()
    // restart from the same checkpoint: a redelivered batch's epoch
    // name is already committed, so ingest replays as a no-op and the
    // state is byte-identical
    val before = state()
    val q2 = sink()
    try q2.processAllAvailable() finally q2.stop()
    assert(state() == before)
    assert(graft.engine.SemanticStore
      .committedEpochs(spark, s"$store/s") ==
      Seq("batch-000000000", "batch-000000001"))
    // TAKE-DOWN between micro-batches (r16): delete the bridge doc 2
    // while the stream is down — the running store must honor it from
    // the next batch on, and a checkpoint restart must stay a no-op
    graft.engine.SemanticStore.delete(s"$store/s",
      Seq(2L).toDF("doc_id"), "doc_id", "takedown-1")
    val afterDel = state()
    assert(!afterDel.exists(_._1 == 2L))
    assert(afterDel.find(_._1 == 1L).get._2 !=
      afterDel.find(_._1 == 5L).get._2,
      "deleting the bridge doc must split its component mid-stream")
    val q3 = sink()
    try {
      // a new wave pairs only against the SURVIVING corpus: id 9
      // would have paired with the deleted id 2 (cos 0.953) and still
      // pairs with 1 (cos 0.99) but NOT 5 (cos 0.725) — so it joins
      // 1's component without re-bridging the split
      input.addData((9L, 1L, Seq(0.99f, 0.141f, 0f, 0f)))
      q3.processAllAvailable()
    } finally q3.stop()
    val st3 = state()
    assert(!st3.exists(_._1 == 2L))
    assert(st3.find(_._1 == 9L).get._2 == st3.find(_._1 == 1L).get._2)
    assert(st3.find(_._1 == 5L).get._2 != st3.find(_._1 == 1L).get._2)
    // equals the batch run on (union minus the deleted id) plus wave 3
    val survivors = (wave1 ++ wave2).filter(_._1 != 2L) :+
      ((9L, 1L, Seq(0.99f, 0.141f, 0f, 0f)))
    assert(st3 == batchOn(survivors))
  }

  test("semanticDedupIngestSink(compactEvery): the stream polices its " +
      "own epoch growth — the fold fires inside the sink, state stays " +
      "equal to the batch twin, and a checkpoint restart across the " +
      "auto-compact boundary replays as a folded-name no-op " +
      "(VERDICT r17 #2a)") {
    import TestSpark.spark.implicits._
    val s = math.sqrt(1 - 0.81).toFloat
    val c2 = (2 * 0.9 * 0.9 - 1).toFloat
    val s2v = (2 * 0.9 * s).toFloat
    val emb = Map(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0.9f, s, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f),
      5L -> Seq(c2, s2v, 0f, 0f),
      6L -> Seq(0f, 0f, 0.95f, 0.312f), 7L -> Seq(0f, 1f, 0f, 0f))
    val quality = Map(1L -> 10L, 2L -> 20L, 3L -> 5L,
      5L -> 30L, 6L -> 50L, 7L -> 2L)
    val rows = emb.keys.toSeq.sorted
      .map(id => (id, quality(id), emb(id)))
    val wave1 = rows.filter(_._1 <= 3)
    val wave2 = rows.filter(r => r._1 > 3 && r._1 <= 6)
    val wave3 = rows.filter(_._1 > 6)
    val store = Files.createTempDirectory("graft-semsink-ac").toString
    val ckpt = Files.createTempDirectory("graft-semsink-ac-ck").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Seq[Float])](spark)
    def sink() = Streaming.semanticDedupIngestSink(
      input.toDF().select(col("_1").as("doc_id"), col("_2").as("q"),
        col("_3").cast("array<float>").as("embedding")),
      s"$store/s", "doc_id", "q", "embedding", minCosine = 0.8,
      nCells = 4, checkpointDir = ckpt, compactEvery = 2)
    def state() = graft.engine.SemanticStore
      .snapshot(spark, s"$store/s", "doc_id", "q")
      .select("doc_id", "component", "q", "keep")
      .as[(Long, Long, Long, Int)].collect().toSet
    def batchOn(ws: Seq[(Long, Long, Seq[Float])]*) =
      graft.engine.Extensions.semanticDedup(
          ws.flatten.map(r => (r._1, r._2)).toDF("doc_id", "q"),
          ws.flatten.map(r => (r._1, r._3)).toDF("doc_id", "embedding"),
          "doc_id", "q", "embedding", minCosine = 0.8, nCells = 4)
        .select("doc_id", "component", "q", "keep")
        .as[(Long, Long, Long, Int)].collect().toSet
    def epochs() = graft.engine.SemanticStore
      .committedEpochs(spark, s"$store/s")
    val q = sink()
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      assert(state() == batchOn(wave1))
      assert(epochs() == Seq("batch-000000000"))
      // batch 1 brings the committed count to the threshold: the fold
      // fires INSIDE the sink, no operator involved
      input.addData(wave2: _*); q.processAllAvailable()
      assert(state() == batchOn(wave1, wave2))
      assert(epochs() == Seq("compact-1"),
        "auto-compaction must fold both epochs at the threshold")
    } finally q.stop()
    // restart across the auto-compact boundary: a redelivered batch's
    // epoch name is FOLDED now, not committed — the folded-name
    // refusal must keep the replay a no-op (double-ingesting it would
    // double every pair and meta row)
    val before = state()
    val q2 = sink()
    try {
      q2.processAllAvailable()
      assert(state() == before)
      assert(epochs() == Seq("compact-1"))
      // and the stream keeps ingesting onto the folded store
      input.addData(wave3: _*); q2.processAllAvailable()
      assert(state() == batchOn(wave1, wave2, wave3))
      assert(epochs().length <= 2)
    } finally q2.stop()
  }

  test("hybridIngestSink: one stream grows BOTH persisted branches in " +
      "id lockstep; the streamed layout serves through the same fused " +
      "path as batch builds (segmented text via Bm25Queryable); " +
      "restart replays nothing across the auto-compact boundary; " +
      "delete + compact complete the lifecycle on the streamed store") {
    import TestSpark.spark.implicits._
    val docsAll = graft.engine.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val embAll = graft.engine.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    val joined = docsAll.select("doc_id", "text")
      .join(embAll.select(col("vec_id").as("doc_id"), col("embedding")),
        "doc_id")
      .filter(col("doc_id") < 80)
    val base = joined.filter(col("doc_id") < 50)
    val tDir = Files.createTempDirectory("graft-hybsink-t").toString
    val vDir = Files.createTempDirectory("graft-hybsink-v").toString
    val ckpt = Files.createTempDirectory("graft-hybsink-ck").toString
    // bootstrap: vector side needs a quantizer (frozen-growth
    // contract); text side takes the same base as segment zero
    graft.engine.TextIndex.appendSegment(base, "text", "doc_id", tDir,
      "base", nBuckets = 8)
    graft.engine.IvfIndex.build(
        base.select(col("doc_id"), col("embedding")),
        "embedding", "doc_id", nCells = 4)
      .save(vDir)
    val waves = Seq((50L, 60L), (60L, 70L), (70L, 80L)).map {
      case (lo, hi) =>
        joined.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .select(col("doc_id"), col("text"),
            col("embedding").cast("array<float>"))
          .as[(Long, String, Seq[Float])].collect().toSeq
    }
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Seq[Float])](spark)
    def sink() = Streaming.hybridIngestSink(
      input.toDF().select(col("_1").as("doc_id"), col("_2").as("text"),
        col("_3").cast("array<float>").as("embedding")),
      "text", "embedding", "doc_id", tDir, vDir, ckpt,
      nBuckets = 8, compactEvery = 2)
    val ids = Seq(0L, 1L, 2L)
    def streamedQuery() = graft.engine.HybridIndex.queryByIds(
      graft.engine.TextIndex.loadSegments(spark, tDir),
      graft.engine.IvfIndex.load(spark, vDir, "doc_id", "embedding"),
      docsAll, "text", ids, kBranch = 10, k = 10, nprobe = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val q = sink()
    try {
      waves.foreach { w => input.addData(w: _*); q.processAllAvailable() }
    } finally q.stop()
    // both branches carry all 80 ids, counts bounded by the knob
    assert(graft.engine.TextIndex.loadSegments(spark, tDir).nDocs == 80)
    assert(graft.engine.IvfIndex
      .cellsWithEpochs(spark, vDir).count() == 80L)
    val segRoot = graft.engine.Generations.currentName(tDir)
      .getOrElse("segments")
    assert(new java.io.File(s"$tDir/$segRoot").listFiles()
      .count(_.isDirectory) <= 2)
    // the streamed layout answers exactly like fresh batch builds over
    // the same corpus, through the SAME fused serving path
    val corpus = docsAll.filter(col("doc_id") < 80)
    val embC = embAll.filter(col("vec_id") < 80)
    val tTwin = Files.createTempDirectory("graft-hybsink-tt").toString
    val vTwin = Files.createTempDirectory("graft-hybsink-vt").toString
    graft.engine.TextIndex.build(corpus, "text", "doc_id",
      nBuckets = 8).save(tTwin)
    graft.engine.IvfIndex.build(embC, "embedding", "vec_id",
      nCells = 4).save(vTwin)
    def twinQuery() = graft.engine.HybridIndex.queryByIds(
      graft.engine.TextIndex.load(spark, tTwin),
      graft.engine.IvfIndex.load(spark, vTwin, "vec_id", "embedding"),
      docsAll, "text", ids, kBranch = 10, k = 10, nprobe = 4)
    assert(rows(streamedQuery()) == rows(twinQuery()),
      "streamed hybrid layout must serve exactly like batch builds")
    // restart across the auto-compact boundary: replays nothing
    val q2 = sink()
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.engine.TextIndex.loadSegments(spark, tDir).nDocs == 80)
    assert(graft.engine.IvfIndex
      .cellsWithEpochs(spark, vDir).count() == 80L)
    // lifecycle close: take-down + unified compact on the STREAMED
    // store — the delete leaves both branches, compaction realizes it
    // physically, answers keep matching the never-ingested twin
    val delId = streamedQuery().orderBy("query_id", "rank")
      .select("doc_id").head().getLong(0)
    graft.engine.HybridIndex.delete(spark, tDir, vDir,
      Seq(delId).toDF("doc_id"), "doc_id", "stream-takedown")
    val (textDid, ivfDid) =
      graft.engine.HybridIndex.compact(spark, tDir, vDir)
    assert(textDid && ivfDid)
    val tTwin2 = Files.createTempDirectory("graft-hybsink-tt2").toString
    val vTwin2 = Files.createTempDirectory("graft-hybsink-vt2").toString
    graft.engine.TextIndex.build(corpus.filter(col("doc_id") =!= delId),
      "text", "doc_id", nBuckets = 8).save(tTwin2)
    graft.engine.IvfIndex.build(embC.filter(col("vec_id") =!= delId),
      "embedding", "vec_id", nCells = 4).save(vTwin2)
    val twin2 = graft.engine.HybridIndex.queryByIds(
      graft.engine.TextIndex.load(spark, tTwin2),
      graft.engine.IvfIndex.load(spark, vTwin2, "vec_id", "embedding"),
      docsAll, "text", ids, kBranch = 10, k = 10, nprobe = 4)
    assert(rows(streamedQuery()) == rows(twin2),
      "post-delete streamed store must equal the never-ingested twin")
  }

  test("indexIngestSink(compactEvery): segment count stays bounded by " +
      "the knob alone, answers keep equaling a fresh full build, and a " +
      "replay of a FOLDED segment name refuses instead of re-indexing " +
      "(VERDICT r17 #2b)") {
    import TestSpark.spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val idx = Files.createTempDirectory("graft-sidx-ac").toString
    val ckpt = Files.createTempDirectory("graft-sidx-ac-ck").toString
    val q = Streaming.indexIngestSink(
      input.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, ckpt,
      nBuckets = 8, compactEvery = 2)
    val batches = Seq(
      Seq((1L, "spark window join"), (2L, "merge sort run")),
      Seq((3L, "spark merge stream")),
      Seq((4L, "spark rides on")),
      Seq((5L, "window of sparks")))
    def liveSegCount() = {
      val root = graft.engine.Generations.currentName(idx)
        .getOrElse("segments")
      new java.io.File(s"$idx/$root").listFiles().count(_.isDirectory)
    }
    try {
      batches.foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
        assert(liveSegCount() <= 2,
          s"segment count must stay bounded by the knob, got " +
            s"${liveSegCount()}")
      }
      val loaded = graft.engine.TextIndex.loadSegments(spark, idx)
      assert(loaded.nDocs == 5)
      val hits = loaded.query(
          Seq((1L, "spark")).toDF("query_id", "qtext"),
          "qtext", "query_id", k = 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(hits == Set(1L, 3L, 4L))
    } finally q.stop()
    // a replay straddling the compaction: the segment's name is in the
    // folded manifest, so appendSegment refuses (returning false)
    // rather than re-indexing the batch as a fresh segment — the
    // double-count hazard the r18 review found in the old sink-side
    // errorifexists check
    assert(!graft.engine.TextIndex.appendSegment(
      batches.head.toDF("doc_id", "text"), "text", "doc_id", idx,
      "epoch-000000000", nBuckets = 8))
    assert(graft.engine.TextIndex.loadSegments(spark, idx).nDocs == 5,
      "a folded-name replay must not re-index")
    // checkpoint restart replays nothing and ingestion continues
    val q2 = Streaming.indexIngestSink(
      input.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, ckpt,
      nBuckets = 8, compactEvery = 2)
    try {
      q2.processAllAvailable()
      assert(graft.engine.TextIndex.loadSegments(spark, idx).nDocs == 5)
      input.addData((6L, "one more spark")); q2.processAllAvailable()
      val after = graft.engine.TextIndex.loadSegments(spark, idx)
      assert(after.nDocs == 6)
      assert(liveSegCount() <= 2)
    } finally q2.stop()
  }
}

