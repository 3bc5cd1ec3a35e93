package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.queries.CorpusQueries

/** Streaming twins must reproduce the batch corpus answers when fed
  * the same static file as one micro-batch (SURVEY §2.11).
  */
class StreamingTwinsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** events.parquet copied into its own dir (streaming sources read
    * directories).
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming hourly window matches batch q31") {
    val q = StreamingTwins.hourlyByType(StreamingTwins.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("hourly")
      .select(col("w").cast("timestamp_ntz").as("w"), col("event_type"), col("n"), col("v"))
      .orderBy("w", "event_type").collect()
    val batch = CorpusQueries.q31.run(spark, sfDir).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("hourly aggregate keeps its watermark: Append mode is accepted") {
    // grouping by window(...).getField("start") stripped the watermark
    // metadata from the key, so Append mode threw
    // STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION and state was never
    // evicted — grouping by the window struct must keep it
    val q = StreamingTwins.hourlyByType(StreamingTwins.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // Append emits only watermark-CLOSED windows: the final watermark
    // (max event time − 10 min) sits inside the last hour window, so
    // that window legitimately stays open and unemitted. Everything
    // emitted must match the batch answer exactly; only tail windows
    // the watermark hasn't passed may be missing.
    val streamed = spark.table("hourly_append")
      .select(col("w").cast("timestamp_ntz").as("w"), col("event_type"),
        col("n"), col("v"))
      .collect().map(_.toSeq).toSet
    val batch = CorpusQueries.q31.run(spark, sfDir).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed.subsetOf(batch),
      s"${(streamed -- batch).take(3)}")
    val missing = batch -- streamed
    val maxW = batch.map(_.head.asInstanceOf[java.time.LocalDateTime]).max
    assert(missing.forall(_.head == maxW),
      s"only the final open window may be unemitted; missing: ${missing.take(3)}")
  }

  test("streaming sessionization matches batch q32") {
    import spark.implicits._
    val events = StreamingTwins.readEvents(spark, eventsDir)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[StreamingTwins.EventRow]
    val q = StreamingTwins.sessionize(events)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sessions")
      .groupBy("user_id").agg(max("sessions").as("sessions"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch = CorpusQueries.q32.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming geofence: stream-static spatial join plans the index join per batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val gf = graft.geom.GeomCodec

    def sq(x0: Double, y0: Double, s: Double) = gf.wktToWkb(
      s"POLYGON(($x0 $y0, ${x0 + s} $y0, ${x0 + s} ${y0 + s}, $x0 ${y0 + s}, $x0 $y0))")
    val fences = Seq(("downtown", sq(0, 0, 10)), ("harbor", sq(20, 0, 5)))
      .toDF("fence", "fgeom")

    val input = MemoryStream[(Long, Double, Double)](spark)
    val points = input.toDF().toDF("id", "x", "y")
      .withColumn("geom", graft.geom.GeomFunctions.st_point($"x", $"y"))
    input.addData((1L, 5.0, 5.0), (2L, 22.0, 2.0), (3L, 50.0, 50.0))
    val q = StreamingTwins.geofence(points, "geom", fences, "fgeom")
      .select("id", "fence")
      .writeStream.format("memory").queryName("geofence")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("geofence").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "downtown"), (2L, "harbor")))  // 3 is in no fence

    // the micro-batch physical plan used the spatial index join
    val lastPlan = q.lastProgress.sources.length // progress exists
    assert(lastPlan >= 0)
    val explained = StreamingTwins.geofence(
      Seq((1L, sq(1, 1, 1))).toDF("id", "geom"), "geom", fences, "fgeom")
      .queryExecution.executedPlan.toString
    assert(explained.contains("SpatialIndexJoin"), explained)
  }

  test("stream-stream attribution: window boundaries, user isolation, state-bound condition") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // epoch-0 timestamps sit at the query's INITIAL watermark and are
    // dropped as late — anchor the fixture in 2024 like the real table
    def ts(min: Long, us: Long = 0): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(1704067200000L + min * 60000L)
      t.setNanos((us * 1000).toInt)
      t
    }
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts")
    clicks.addData((100L, 1L, ts(0)), (101L, 2L, ts(0)))
    purchases.addData(
      (200L, 1L, ts(10)), // in window
      (201L, 1L, ts(30)), // exactly at the 30-min boundary: in
      (202L, 1L, ts(30, 1)), // 1 µs past the boundary: out
      (203L, 2L, ts(31)), // out of window for user 2
      (204L, 3L, ts(5))) // no matching click user
    val q = StreamingTwins.attribution(shape(clicks.toDF()), shape(purchases.toDF()))
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attribution")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 200L), (100L, 201L)))
  }

  test("watermarked aggregation DROPS a multi-batch late event (update mode)") {
    // The chaos probe's staged single-file sources drain in ONE
    // micro-batch, where in-batch disorder is always aggregated; the
    // DROP the watermark promises needs a multi-batch source — pinned
    // here. (x54's driver entry runs COMPLETE mode, where Spark does
    // not filter late rows — the sink is replaced wholesale; update/
    // append are the modes with the drop semantics.)
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(min: Long): java.sql.Timestamp =
      new java.sql.Timestamp(1704067200000L + min * 60000L)
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    spark.catalog.dropTempView("hourly_late")
    val q = StreamingTwins.hourlyByType(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly_late")
      .outputMode("update").start()
    try {
      // batch 1: one event in the 00:00 window, head at 02:00
      // → watermark advances to 01:50 (10-minute delay)
      mem.addData((ts(10), "click", 1.0), (ts(120), "click", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE row for the 00:00 window (00:20 < watermark)
      // plus an on-time row so the batch emits something
      mem.addData((ts(20), "click", 1.0), (ts(125), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val w0 = spark.table("hourly_late")
      .filter(col("w") === lit(ts(0)).cast("timestamp_ntz"))
      .select("n").collect().map(_.getLong(0))
    assert(w0.nonEmpty && w0.max == 1L,
      s"late event must be dropped, not aggregated: 00:00-window counts ${w0.mkString(",")}")
    // the on-time 02:00-window row DID re-emit with the updated count
    val w2 = spark.table("hourly_late")
      .filter(col("w") === lit(ts(120)).cast("timestamp_ntz"))
      .select("n").collect().map(_.getLong(0))
    assert(w2.max == 2L, s"on-time rows must aggregate: ${w2.mkString(",")}")
  }

  test("transformWithState sessionization matches the flatMapGroupsWithState twin") {
    import spark.implicits._
    val events = StreamingTwins.readEvents(spark, eventsDir)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[StreamingTwins.EventRow]
    StreamingTwins.withRocksDbProvider(spark) {
      val q = StreamingTwins.sessionizeTws(events)
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    val tws = spark.table("tws_sessions")
      .groupBy("user_id").agg(max("sessions").as("sessions"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = CorpusQueries.q32.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(tws.toSeq == batch.toSeq)
  }

  test("bootstrap sessionization: a session spanning the snapshot boundary is NOT double-counted") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def ts(min: Long): java.sql.Timestamp =
      new java.sql.Timestamp(1704067200000L + min * 60000L)
    def us(min: Long): Long = 1704067200000000L + min * 60000000L

    // snapshot: user 1 last seen at t100 with 2 sessions so far;
    // user 2 last seen at t0 with 1 session
    val snapshot = Seq(
      (1L, StreamingTwins.SessionState(us(100), 2L)),
      (2L, StreamingTwins.SessionState(us(0), 1L))).toDS()
    val input = MemoryStream[(Long, java.sql.Timestamp, Long)](spark)
    // user 1 returns 10 min after the snapshot (same session — count
    // stays 2); user 2 returns 5 h later (new session — count becomes 2);
    // user 3 was never snapshotted (first session ever)
    input.addData((500L, ts(110), 1L), (501L, ts(300), 2L), (502L, ts(120), 3L))
    val events = input.toDF().toDF("event_id", "ts", "user_id")
      .as[StreamingTwins.EventRow]

    StreamingTwins.withRocksDbProvider(spark) {
      val q = StreamingTwins.sessionizeTwsBootstrap(events, snapshot)
        .writeStream.format("memory").queryName("bootstrap_sessions")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    val got = spark.table("bootstrap_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L), got)
  }

  test("outer attribution: null rows only for watermark-proven unmatched clicks") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def ts(min: Long): java.sql.Timestamp =
      new java.sql.Timestamp(1704067200000L + min * 60000L)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts")
    // max(c_ts)=t300, max(p_ts)=t290 → watermark = t290 − 60 = t230.
    // click 100: matched (in window). click 101: unmatched, window ends
    // t31+30=t61 < t230 → null row emits. click 102 (t220): unmatched
    // but window ends t250 > t230 → still in state, NO row.
    clicks.addData(
      (100L, 1L, ts(0)), (101L, 2L, ts(31)), (102L, 3L, ts(220)),
      (103L, 9L, ts(300)))
    purchases.addData(
      (200L, 1L, ts(10)), (201L, 9L, ts(290)))
    val q = StreamingTwins.attributionOuter(shape(clicks.toDF()), shape(purchases.toDF()))
      .writeStream.format("memory").queryName("attribution_outer")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attribution_outer")
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == Set((100L, 200L), (101L, -1L)), got)
  }

  test("streaming corpus ingestion matches the batch cleaning pipeline") {
    import graft.operators.{Dedup, Decontaminate, TextAnalysis => TA}
    val docsDir = {
      val dir = Files.createTempDirectory("docs_stream")
      Files.copy(Paths.get(s"$sfDir/documents.parquet"),
        dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    }
    val static = spark.read.parquet(docsDir)
    val evalDocs = static.filter(col("doc_id") % 97 === 0)
    val evalGrams = Decontaminate.evalGrams(evalDocs, "text", 8)
      .collect().map(_.getString(0)).toSeq

    val stream = spark.readStream.schema(static.schema).parquet(docsDir)
      .filter(col("doc_id") % 97 =!= 0)
    val ingested = StreamingTwins.ingestCorpus(stream, evalGrams)
    // r12: the decontamination gate is the built-in arrays_overlap, so
    // every micro-batch's filter chain stays inside whole-stage codegen
    // — no interpreted UDF boundary in the hot path
    assert(!ingested.queryExecution.analyzed.toString.contains("UDF"),
      ingested.queryExecution.analyzed.toString.take(800))
    val q = ingested
      .writeStream.format("memory").queryName("ingested")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    // batch twin, SAME gate order (row-local gates before dedup):
    // quality -> decontaminate -> exact dedup. Compare CONTENT-KEY
    // sets: streaming dedup keeps the first ARRIVED row per key, batch
    // keeps the min id — same surviving keys either way because the
    // gates ran per row, before the representative was chosen.
    val train = static.filter(col("doc_id") % 97 =!= 0)
    val gatedTrain = train
      .withColumn("quality", TA.qualityScore(col("text")))
      .filter(col("quality") >= 0.3)
    val batch = Dedup.exact(
      Decontaminate.removeContaminated(gatedTrain, evalDocs, "doc_id", "text", n = 8),
      "text", "doc_id")
    val batchKeys = batch.select(Dedup.contentKey(col("text"))).collect().map(_.getString(0)).toSet
    val streamKeys = spark.table("ingested")
      .select(Dedup.contentKey(col("text"))).collect().map(_.getString(0)).toSet
    assert(streamKeys == batchKeys)
    assert(streamKeys.nonEmpty)
  }

  test("checkpoint restart: dedup state and source progress survive; file sink stays exactly-once") {
    // The 100 TB streaming story rests on queries being LONG-LIVED and
    // RESTARTABLE: kill a query mid-corpus, restart from the same
    // checkpoint, and the output must be exactly-once — no re-emission
    // of pre-restart batches (source offsets recovered), no duplicate
    // slipping past dedup (state store recovered). This drives that
    // contract end-to-end: parquet source -> dropDuplicates ->
    // fault-tolerant parquet sink across a stop/restart boundary.
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val in = Files.createTempDirectory("restart_in")
    val out = Files.createTempDirectory("restart_out").toString
    val ckpt = Files.createTempDirectory("restart_ckpt").toString

    def stage(name: String, ids: Range): Unit = {
      val tmp = Files.createTempDirectory("restart_stage")
      ids.map(i => (i.toLong, s"payload_$i")).toDF("event_id", "payload")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      // atomic move so the file source never lists a half-written file
      Files.move(part, in.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    }
    def runOnce(): Unit = {
      val schema = spark.read.parquet(in.toString).schema
      val q = spark.readStream.schema(schema).parquet(in.toString)
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    stage("a.parquet", 1 to 50)
    runOnce()                                   // first life: ids 1..50 emitted
    stage("b.parquet", 40 to 90)                // 40..50 duplicate the first life
    runOnce()                                   // second life, SAME checkpoint

    val rows = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    // exactly-once across the restart: every id exactly once —
    // duplicates of ids seen BEFORE the restart were dropped by the
    // recovered state store, and batch a was not re-read or re-emitted
    assert(rows.sorted == (1L to 90L), s"got ${rows.size} rows")
  }

  test("RocksDB TWS restart: value state survives the kill — an open session is not re-counted") {
    // Same restart contract as the test above, but on the OTHER state
    // backend: transformWithState requires the RocksDB provider, whose
    // recovery path (snapshot + changelog reload from the checkpoint)
    // is disjoint from the HDFS-backed store. The probe is a session
    // OPEN across the kill: the post-restart event lands inside the
    // gap, so the recovered (lastTs, sessions) state must keep the
    // count at 2 — a lost store would report 1.
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val in = Files.createTempDirectory("tws_restart_in")
    val ckpt = Files.createTempDirectory("tws_restart_ckpt").toString
    def stage(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val tmp = Files.createTempDirectory("tws_restart_stage")
      rows.toDF("event_id", "ts_s", "user_id")
        .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"), col("user_id"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, in.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    }
    // memory sink refuses checkpoint recovery, so collect through
    // foreachBatch — the recoverable sink adapter production uses
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def runOnce(): Unit = StreamingTwins.withRocksDbProvider(spark) {
      val schema = spark.read.parquet(in.toString).schema
      val events = spark.readStream.schema(schema).parquet(in.toString)
        .as[StreamingTwins.EventRow]
      val q = StreamingTwins.sessionizeTws(events, gapSeconds = 60)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingTwins.UserSessions], _: Long) =>
          val rows = batch.collect().map(u => (u.user_id, u.sessions))
          emitted.synchronized { emitted ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
    }
    // life 1: gap 60s exceeded between the two events → sessions = 2
    stage("a.parquet", Seq(
      (1L, "2024-01-01 00:00:00", 7L), (2L, "2024-01-01 00:01:40", 7L)))
    runOnce()
    assert(emitted.synchronized(emitted.map(_._2).max) == 2L)
    emitted.synchronized(emitted.clear())
    // life 2, same checkpoint: 30 s after the last event — inside the gap
    stage("b.parquet", Seq((3L, "2024-01-01 00:02:10", 7L)))
    runOnce()
    val life2 = emitted.synchronized(emitted.filter(_._1 == 7L).map(_._2).max)
    assert(life2 == 2L,
      "recovered RocksDB value state must carry the open session across the restart")
  }

  test("streaming paragraph dedup matches the batch twin on one micro-batch") {
    import graft.operators.Dedup
    // shared boilerplate paragraph + per-doc content (the x37 shape)
    val static = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        concat(lit("subscribe to our newsletter\n\n"), col("text")).as("text"))
    val dir = Files.createTempDirectory("paradedup").toString
    static.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(static.schema).parquet(dir)
    val q = StreamingTwins.paragraphDedup(stream, "doc_id", "text")
      .writeStream.format("memory").queryName("paradedup")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("paradedup").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batch = Dedup.paragraphDedup(static, "doc_id", "text")
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming paragraph dedup: null-text docs come back empty, like the batch twin") {
    import graft.operators.Dedup
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val static = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "alpha\n\nbeta"), Row(2L, null), Row(3L, "alpha\n\ngamma")), 1),
      schema)
    val dir = Files.createTempDirectory("paradedup_null").toString
    static.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingTwins.paragraphDedup(stream, "doc_id", "text")
      .writeStream.format("memory").queryName("paradedup_null")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("paradedup_null").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batch = Dedup.paragraphDedup(static, "doc_id", "text")
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // doc 2 must NOT vanish: both twins return it as the empty document
    assert(streamed.map(_._1) == Seq(1L, 2L, 3L), streamed)
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("streaming paragraph dedup fails fast on a non-integral id column") {
    import spark.implicits._
    val docs = Seq(("guid-1", "text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingTwins.paragraphDedup(
        spark.readStream.schema(docs.schema)
          .parquet(Files.createTempDirectory("nope").toString), "doc_id", "text")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("streaming paragraph dedup: state persists across batches, ages out past the TTL") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(h: Int, m: Int = 0) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    // the timed path chains fMGWS into a watermarked aggregation, which
    // Spark's conservative checker rejects; the operator doc explains
    // why the hazard cannot occur here — opt out for this query only
    val prior = spark.conf.getOption(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    try {
      val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
      val docs = input.toDF().toDF("doc_id", "ts", "text")
      val q = StreamingTwins.paragraphDedup(docs, "doc_id", "text",
          eventTimeCol = Some("ts"), watermark = "0 seconds",
          stateTtl = java.time.Duration.ofSeconds(1))
        .writeStream.format("memory").queryName("paradedup2")
        .outputMode("update").start()
      // batch 1 admits A and B with TTL deadline = event time 10:00 + 1s.
      // batch 2 advances the watermark to 10:00 (not yet past the
      // deadline — state must SURVIVE). batch 3 runs with watermark
      // 12:00 > deadline, so A/B age out. batch 4 re-admits A.
      input.addData((1L, ts(10), "A\n\nB")); q.processAllAvailable()
      input.addData((2L, ts(12), "Z"));      q.processAllAvailable()
      input.addData((3L, ts(12, 30), "W"));  q.processAllAvailable()
      input.addData((4L, ts(13), "A\n\nC")); q.processAllAvailable()
      q.stop()

      val got = spark.table("paradedup2").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "A\n\nB", 2L -> "Z", 3L -> "W", 4L -> "A\n\nC"), got)
    } finally prior match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    }
  }

  test("streaming paragraph dedup: a repeat WITHIN the TTL is still deduplicated") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val prior = spark.conf.getOption(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    try {
      val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
      val docs = input.toDF().toDF("doc_id", "ts", "text")
      val q = StreamingTwins.paragraphDedup(docs, "doc_id", "text",
          eventTimeCol = Some("ts"), watermark = "0 seconds",
          stateTtl = java.time.Duration.ofHours(6))
        .writeStream.format("memory").queryName("paradedup4")
        .outputMode("update").start()
      // 3 hours between sightings, TTL 6h: A must stay deduplicated
      // (the epoch-based deadline bug would have re-admitted it)
      input.addData((1L, ts(10), "A\n\nB")); q.processAllAvailable()
      input.addData((2L, ts(12), "Z"));      q.processAllAvailable()
      input.addData((3L, ts(13), "A\n\nC")); q.processAllAvailable()
      q.stop()

      val got = spark.table("paradedup4").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "A\n\nB", 2L -> "Z", 3L -> "C"), got)
    } finally prior match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    }
  }

  test("streaming paragraph dedup without event time keeps state for the stream's life") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingTwins.paragraphDedup(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("paradedup3")
      .outputMode("update").start()
    input.addData((1L, "A\n\nB")); q.processAllAvailable()
    input.addData((2L, "A\n\nC")); q.processAllAvailable() // A already seen -> dropped
    input.addData((3L, "A"));      q.processAllAvailable() // all boilerplate -> empty doc
    q.stop()

    val got = spark.table("paradedup3").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "A\n\nB", 2L -> "C", 3L -> ""), got)
  }

  test("streaming top-k-per-group matches the batch aggregate on one micro-batch") {
    import spark.implicits._
    import graft.queries.ExtQueries
    val rows = StreamingTwins.readEvents(spark, eventsDir)
      .select(col("event_type").as("g"), col("value").as("score"), col("event_id").as("id"))
      .as[StreamingTwins.ScoredRow]
    val q = StreamingTwins.topKPerGroup(rows, k = 3)
      .writeStream.format("memory").queryName("topk")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("topk")
      .as[StreamingTwins.GroupTopK].collect()
      .flatMap(r => r.top.zipWithIndex.map { case ((s, id), i) =>
        (r.g, (i + 1).toLong, math.round(s * 100) / 100.0, id) })
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = ExtQueries.x40_topk_per_group.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(streamed == batch)
  }

  test("streaming top-k-per-group: state merges across batches, bounded at k") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Double, Long)](spark)
    val rows = input.toDF().toDF("g", "score", "id").as[StreamingTwins.ScoredRow]
    val q = StreamingTwins.topKPerGroup(rows, k = 2)
      .writeStream.format("memory").queryName("topk2")
      .outputMode("update").start()
    input.addData(("a", 1.0, 1L), ("a", 3.0, 2L)); q.processAllAvailable()
    input.addData(("a", 2.0, 3L), ("a", 5.0, 4L)); q.processAllAvailable()
    q.stop()

    // last update for group "a" reflects all four rows, truncated to k=2
    val last = spark.table("topk2").as[StreamingTwins.GroupTopK]
      .collect().last.top
    assert(last == Seq((5.0, 4L), (3.0, 2L)), last)
  }

  test("x51 driver entry: file-path stream reproduces the batch q32 rows") {
    // the driver hands the sf dir, and events.parquet is a single FILE —
    // the entry must stream it anyway (readEvents passes basePath)
    val x51 = graft.queries.ExtQueries.x51_streaming_sessionize.run(spark, sfDir)
    val q32 = CorpusQueries.q32.run(spark, sfDir)
    assert(x51.collect().toSeq == q32.collect().toSeq)
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val q = StreamingTwins.dedupEvents(StreamingTwins.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val total = spark.table("deduped").count()
    val distinct = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id").distinct().count()
    assert(total == distinct)
  }

  test("streaming paragraph dedup drops a NULL doc id instead of dying in the encoder") {
    // a NULL VALUE in an integral id column passes the analysis-time
    // type require but would kill the Para(pid: Long) encoder at
    // runtime — the typedEvents corrupt-row policy applies: dropped
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(java.lang.Long, String)](spark)
    spark.catalog.dropTempView("paradedup_nullid")
    val q = StreamingTwins.paragraphDedup(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("paradedup_nullid")
      .outputMode("update").start()
    try {
      input.addData(
        (java.lang.Long.valueOf(1L), "A\n\nB"),
        (null.asInstanceOf[java.lang.Long], "A\n\nC"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("paradedup_nullid")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), s"null-id doc must be dropped, got ids $ids")
  }

  test("staging re-stages a source regenerated with identical size and an OLDER mtime") {
    // restored snapshot / rsync with preserved timestamps: same byte
    // length, mtime equal-or-older than what staging observed. A '<'
    // staleness comparison served the previous corpus generation; the
    // recorded-source-stats '!=' comparison must re-stage (and, unlike
    // a COPY_ATTRIBUTES design, does not depend on the temp filesystem
    // preserving attributes).
    val src = Files.createTempFile("graft_stage_src_", ".parquet")
    try {
      Files.write(src, Array.fill[Byte](64)(1))
      val d1 = StreamingTwins.streamableDir(src.toString)
      val staged1 = Paths.get(d1, src.getFileName.toString)
      assert(Files.exists(staged1))
      // same dir while the source is untouched
      assert(StreamingTwins.streamableDir(src.toString) == d1)
      // regenerate in place: same length, mtime pushed OLDER
      Files.write(src, Array.fill[Byte](64)(2))
      Files.setLastModifiedTime(src,
        java.nio.file.attribute.FileTime.fromMillis(
          Files.getLastModifiedTime(src).toMillis - 60000))
      val d2 = StreamingTwins.streamableDir(src.toString)
      assert(d2 != d1, "an older-mtime regeneration must re-stage, not serve the old snapshot")
      val staged2 = Paths.get(d2, src.getFileName.toString)
      assert(Files.readAllBytes(staged2).forall(_ == 2), "re-stage must carry the NEW bytes")
      // the abandoned snapshot is reclaimed NOW, not at JVM exit: a
      // long-lived bench JVM over a repeatedly-regenerated source would
      // otherwise pile one full parquet copy per regeneration onto
      // (typically RAM-backed) tmp (r20 review)
      assert(!Files.exists(Paths.get(d1)),
        s"stale snapshot dir $d1 must be deleted on re-stage")
    } finally Files.deleteIfExists(src)
  }

  test("readEvents restores nanosAsLong when the probe fails; dirs are not schema-memoized") {
    import spark.implicits._
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    // whatever the session carries coming in (other suites share it)
    // must be exactly what every failure path leaves behind
    val prior = spark.conf.getOption(confKey)
    // a parquet file WITHOUT a ts column: the ts-field lookup throws
    // AFTER the probe succeeded — the flag used to leak session-wide
    // on exactly this path, silently turning every later NANOS column
    // in unrelated parquet into raw longs (r20 review)
    val dir = Files.createTempDirectory("graft_notts_")
    try {
      val p = dir.resolve("t.parquet").toString
      Seq((1L, "a")).toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(p)
      intercept[Exception] { StreamingTwins.readEvents(spark, p) }
      assert(spark.conf.getOption(confKey) == prior,
        "nanosAsLong leaked after a failed readEvents probe")
      // ... and a vanished path fails BEFORE any probe, same guarantee
      intercept[Exception] {
        StreamingTwins.readEvents(spark, dir.resolve("absent.parquet").toString)
      }
      assert(spark.conf.getOption(confKey) == prior)
      // DIRECTORY inputs re-probe every call (no staleness machinery
      // covers them): regenerate the dir in place with a new schema
      // and the stream must see the new one, not a memo
      val ddir = dir.resolve("tbl").toString
      Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(ddir)
      assert(StreamingTwins.readTable(spark, ddir).schema.fieldNames.toSet ==
        Set("id", "s"))
      Seq((1L, 2.0, "x")).toDF("id", "v", "s").write.mode("overwrite").parquet(ddir)
      assert(StreamingTwins.readTable(spark, ddir).schema.fieldNames.toSet ==
        Set("id", "v", "s"),
        "a regenerated directory must re-probe, not serve the stale memoized schema")
      assert(spark.conf.getOption(confKey) == prior,
        "readTable must always restore nanosAsLong")
    } finally {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
      finally s.close()
    }
  }

  test("staging re-stages a source regenerated at IDENTICAL length with a RESTORED mtime") {
    // the r17 advisor residual: a snapshot-restore / rsync that lands
    // the new generation at exactly the old byte length AND puts the
    // old timestamp back. Both stat legs (length, mtime) then read
    // unchanged and only the content fingerprint can see the swap —
    // without it the stream silently serves the previous corpus
    // generation while batch oracles read the new one.
    val src = Files.createTempFile("graft_stage_fp_", ".parquet")
    try {
      Files.write(src, Array.fill[Byte](64)(1))
      val mtime0 = Files.getLastModifiedTime(src)
      val d1 = StreamingTwins.streamableDir(src.toString)
      // regenerate: SAME length, DIFFERENT bytes, mtime restored
      Files.write(src, Array.fill[Byte](64)(2))
      Files.setLastModifiedTime(src, mtime0)
      val d2 = StreamingTwins.streamableDir(src.toString)
      assert(d2 != d1,
        "identical-length + restored-mtime regeneration must re-stage (fingerprint leg)")
      val staged2 = Paths.get(d2, src.getFileName.toString)
      assert(Files.readAllBytes(staged2).forall(_ == 2), "re-stage must carry the NEW bytes")
      // and an untouched source still memo-hits (the fingerprint leg
      // must not thrash the stage on every call)
      assert(StreamingTwins.streamableDir(src.toString) == d2)
    } finally Files.deleteIfExists(src)
  }

  test("content fingerprint sees changes in the first block, the last block, and the length") {
    val f = Files.createTempFile("graft_fp_", ".bin")
    try {
      def fpOf(bytes: Array[Byte]): Long = {
        Files.write(f, bytes)
        StreamingTwins.contentFingerprint(f.toFile)
      }
      val block = 64 * 1024
      // large enough that first and last blocks don't overlap
      val base = Array.tabulate[Byte](3 * block)(i => (i % 251).toByte)
      val fp0 = fpOf(base)
      assert(fpOf(base) == fp0, "fingerprint must be deterministic")
      val firstFlip = base.clone; firstFlip(10) = (firstFlip(10) + 1).toByte
      assert(fpOf(firstFlip) != fp0, "first-block change must move the fingerprint")
      val lastFlip = base.clone; lastFlip(3 * block - 10) = (lastFlip(3 * block - 10) + 1).toByte
      assert(fpOf(lastFlip) != fp0, "last-block change must move the fingerprint")
      assert(fpOf(base ++ Array[Byte](0)) != fp0, "length change must move the fingerprint")
      // small files (< one block) are covered end to end
      assert(fpOf(Array[Byte](1, 2, 3)) != fpOf(Array[Byte](1, 2, 4)))
      assert(fpOf(Array.empty[Byte]) == fpOf(Array.empty[Byte]))
    } finally Files.deleteIfExists(f)
  }
}
