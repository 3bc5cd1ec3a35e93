package graft.tools

import scala.collection.mutable

/** Streaming lifecycle-floor probe (dev tool, companion to
  * [[StreamScaleProbe]]): attributes each streaming bench entry's wall
  * time into MICRO-BATCH EXECUTION (the part that scales with data and
  * persists per batch on a long-lived stream) versus QUERY-LIFECYCLE
  * OVERHEAD (start/stop, stream planning, state-store open/commit,
  * memory-sink bookkeeping — a per-query CONSTANT that amortizes to
  * zero in production).
  *
  * Purpose: BASELINE.md carries the resulting floor table so a future
  * driver-sweep flag on a streaming entry can be adjudicated by lookup
  * — "wall ≈ floor + batch work, floor is lifecycle" — instead of
  * costing a round of re-measurement (r14 verdict task 5).
  *
  * Measurement comes from the engine's own instrumentation:
  * `StreamingQueryListener` progress events carry per-batch
  * `durationMs("triggerExecution")`; everything the wall clock saw
  * beyond Σ batch execution is lifecycle. Batch work is summed over
  * ALL batches (several entries run multi-batch by design — staged
  * files, unioned replays), so the split is exact, not sampled.
  *
  * Usage: `sbt "runMain graft.tools.StreamFloorProbe [sfDir]"`.
  */
object StreamFloorProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .getOrElse(sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1"))
    val spark = graft.GraftSession.builder("stream-floor-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (batchId, triggerExecution ms, inputRows) per progress event, plus
    // a started-query counter; the listener is async — drained below
    val batches = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        started.incrementAndGet()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          val p = e.progress
          batches += ((p.batchId,
            Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L),
            p.numInputRows))
        }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val entries = graft.SparkEntry.queries
      .filter { case (n, _) => graft.Bench.isStreaming(n) }
      .toSeq.sortBy(_._1)

    // one untimed priming pass (plan compile + JIT, like Bench's) so the
    // floor table reflects warmed steady state
    entries.foreach { case (_, fn) => fn(spark, sfDir).collect() }

    println("| entry | wall_s | queries | batches | batch_exec_s | lifecycle_s |")
    println("|---|---|---|---|---|---|")
    val rows = entries.map { case (name, fn) =>
      batches.synchronized(batches.clear())
      started.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are delivered on a separate bus thread; give the
      // final progress a moment to land
      Thread.sleep(300)
      val bs = batches.synchronized(batches.toVector)
      val execS = bs.map(_._2).filter(_ >= 0).sum / 1000.0
      val lifecycle = math.max(0.0, wall - execS)
      println(f"| $name | $wall%.2f | ${started.get} | ${bs.size} | $execS%.2f | $lifecycle%.2f |")
      (name, wall, execS, lifecycle)
    }
    val wallSum = rows.map(_._2).sum
    val execSum = rows.map(_._3).sum
    println(f"| TOTAL | $wallSum%.2f | | | $execSum%.2f | ${wallSum - execSum}%.2f |")
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
