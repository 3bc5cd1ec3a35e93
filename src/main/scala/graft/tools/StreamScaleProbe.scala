package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Streaming state-size probe (dev tool, the streaming face of
  * [[ScaleProbe]]): MEASURES the two state claims the streaming twins'
  * 100 TB story rests on, instead of arguing them from the watermark
  * semantics alone.
  *
  * 1. `keys`: state grows ∝ DISTINCT KEY CARDINALITY. The events
  *    fixture is scaled to k× distinct event ids (same timestamps, so
  *    the watermark horizon holds everything) and the stateful dedup's
  *    state-store rows must grow ≈ k — that is the linear-in-keys cost
  *    model a capacity plan multiplies out.
  *
  * 2. `horizon`: state is BOUNDED BY THE WATERMARK HORIZON, not stream
  *    length. The stream is lengthened k× by replaying the fixture in
  *    k successive time EPOCHS (ids recycled per epoch, timestamps
  *    shifted far past the watermark delay), delivered as one
  *    micro-batch per epoch (`maxFilesPerTrigger=1`, one staged file
  *    per epoch). `dropDuplicatesWithinWatermark` must evict each
  *    epoch's keys once the next epoch's watermark passes them: PEAK
  *    state stays ~flat at one-epoch cardinality while input grows k×.
  *    Without eviction (the `dropDuplicates`-on-bare-keys shape this
  *    API replaced), peak state would grow k× and a 100 TB/day stream
  *    would OOM on schedule.
  *
  * Metrics come from the engine's own instrumentation
  * (`StreamingQueryProgress.stateOperators`: `numRowsTotal`,
  * `memoryUsedBytes`), the same numbers a production monitor alarms
  * on.
  */
object StreamScaleProbe {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
    val scales = if (args.isEmpty) Seq(1, 4, 16) else args.toSeq.map(_.toInt)
    val spark = graft.GraftSession.builder("stream-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev0 = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"))
    val nEv = ev0.count()
    // epoch shift: far past any event-time span + watermark delay, so
    // epoch i's watermark proves every epoch < i evictable
    val shiftDays = 400L

    val scratch = java.nio.file.Files.createTempDirectory("stream_probe_")

    def runDedup(dir: String, watermark: String): Seq[(Long, Long, Long)] = {
      val sink = s"probe_sink_${System.nanoTime()}"
      val stream = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(Seq("event_id"))
      val q = stream.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.catalog.dropTempView(sink)
      // one (rowsTotal, memBytes, inputRows) triple per micro-batch
      q.recentProgress.toSeq.flatMap { p =>
        p.stateOperators.headOption.map(so =>
          (so.numRowsTotal, so.memoryUsedBytes, p.numInputRows))
      }
    }

    println("== keys: state rows vs distinct-key cardinality (expect ~k) ==")
    val keyState = scales.map { k =>
      val dir = scratch.resolve(s"keys_$k").toString
      (0 until k).map(i => ev0.select(
          (col("event_id") + lit(i.toLong * nEv)).as("event_id"),
          col("ts"), col("user_id")))
        .reduce(_ unionByName _)
        .coalesce(1).write.mode("overwrite").parquet(dir)
      // wide watermark: nothing evicts, so final state == total keys
      val prog = runDedup(dir, "3650 days")
      val rows = prog.map(_._1).max
      val mem = prog.map(_._2).max
      println(f"PROBE stream_keys    k=$k%2d in=${k * nEv}%8d " +
        f"state_rows=$rows%8d state_mb=${mem >> 20}%5d")
      (k, rows)
    }

    println("\n== horizon: peak state vs stream length, keys recycled per epoch (expect ~flat) ==")
    val horizonState = scales.map { k =>
      val dir = java.nio.file.Paths.get(scratch.toString, s"epochs_$k")
      java.nio.file.Files.createDirectories(dir)
      // one FLAT FILE per epoch → one micro-batch per epoch → the
      // watermark advances between epochs and eviction actually runs
      // mid-stream (files are moved in sequentially, so modification
      // order == epoch order)
      (0 until k).foreach { i =>
        val tmp = scratch.resolve(s"epoch_build_$k" + s"_$i")
        ev0.select(col("event_id"), // ids recycled: same keys each epoch
            (col("ts") + expr(s"INTERVAL ${i * shiftDays} DAYS")).as("ts"),
            col("user_id"))
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = scala.util.Using.resource(java.nio.file.Files.list(tmp)) { s =>
          s.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet"))
            .getOrElse(sys.error(s"no parquet part under $tmp"))
        }
        java.nio.file.Files.move(part, dir.resolve(f"epoch_$i%03d.parquet"))
      }
      val prog = runDedup(dir.toString, "10 minutes")
      val peak = prog.map(_._1).max
      val fin = prog.map(_._1).last
      val mem = prog.map(_._2).max
      println(f"PROBE stream_horizon k=$k%2d in=${k * nEv}%8d " +
        f"peak_state=$peak%8d final_state=$fin%8d state_mb=${mem >> 20}%5d " +
        f"batches=${prog.size}%3d")
      (k, peak)
    }

    println("\n== tws: RocksDB transformWithState sessionizer state vs key cardinality (expect ~k) ==")
    val twsState = scales.map { k =>
      import org.apache.spark.sql.SparkSession
      import graft.streaming.StreamingTwins
      val dir = scratch.resolve(s"tws_$k").toString
      val nUsers = ev0.select("user_id").distinct().count()
      (0 until k).map(i => ev0.select(
          (col("event_id") + lit(i.toLong * nEv)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(i.toLong * nUsers)).as("user_id")))
        .reduce(_ unionByName _)
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val sink = s"tws_sink_$k"
      implicit val sq: SparkSession = spark
      import sq.implicits._
      // typedEvents, not a raw .as[EventRow]: the probe's fixture is
      // clean, but the helper keeps this the same corrupt-row-safe
      // path the driver entries use (StreamChaosSpec policy)
      val events = StreamingTwins.typedEvents(spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir))
      val q = StreamingTwins.withRocksDbProvider(spark) {
        val query = StreamingTwins.sessionizeTws(events).toDF()
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try query.processAllAvailable() finally query.stop()
        query
      }
      spark.catalog.dropTempView(sink)
      val so = q.recentProgress.toSeq.flatMap(_.stateOperators.headOption)
      val rows = so.map(_.numRowsTotal).max
      val mem = so.map(_.memoryUsedBytes).max
      println(f"PROBE tws_keys       k=$k%2d in=${k * nEv}%8d " +
        f"state_rows=$rows%8d state_mb=${mem >> 20}%5d")
      (k, rows)
    }

    val kb = keyState.head._2.toDouble
    val hb = horizonState.head._2.toDouble
    val tb = twsState.head._2.toDouble
    println("\nGROWTH (vs k=1; keys/tws expect ≈k, horizon expect ≈1)")
    println("GROWTH stream_keys    " + keyState.map { case (k, r) =>
      f"k=$k%2d:${r / kb}%6.2f" }.mkString("  "))
    println("GROWTH stream_horizon " + horizonState.map { case (k, r) =>
      f"k=$k%2d:${r / hb}%6.2f" }.mkString("  "))
    println("GROWTH tws_keys       " + twsState.map { case (k, r) =>
      f"k=$k%2d:${r / tb}%6.2f" }.mkString("  "))
    spark.stop()
  }
}
