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

    // Progress/termination events arrive on an async bus thread, so a
    // previous entry's (or the priming pass's) late event could land
    // after a naive clear() and pollute the next entry's batch_exec_s.
    // Attribution is therefore BY RUN ID: onQueryStarted is delivered
    // SYNCHRONOUSLY (before start() returns), so after an entry's fn
    // returns, `startedIds` holds exactly its queries' runIds; progress
    // rows are tagged with their runId and filtered against that set.
    // The drain below then waits for the bus (FIFO per listener) to
    // deliver the TERMINATION event of every started run — at which
    // point every earlier progress event of those runs has been
    // delivered too — replacing the old fixed 300 ms sleep, which both
    // raced stale events in and could miss the final event.
    val batches = mutable.ArrayBuffer.empty[(java.util.UUID, Long, Long, Long)]
    val startedIds = mutable.Set.empty[java.util.UUID]
    val terminatedIds = mutable.Set.empty[java.util.UUID]
    val lock = new Object
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        lock.synchronized { startedIds += e.runId }
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        lock.synchronized {
          val p = e.progress
          batches += ((p.runId, p.batchId,
            Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L),
            p.numInputRows))
        }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        lock.synchronized { terminatedIds += e.runId; lock.notifyAll() }
    }
    spark.streams.addListener(listener)

    // wait until every run started during this entry has its termination
    // event delivered (bounded — a stuck bus reports rather than hangs)
    def drain(ids: Set[java.util.UUID], capMs: Long = 10000): Unit = {
      val deadline = System.nanoTime() + capMs * 1000000L
      lock.synchronized {
        while (!ids.subsetOf(terminatedIds) && System.nanoTime() < deadline)
          lock.wait(50)
        require(ids.subsetOf(terminatedIds),
          s"listener bus did not deliver termination for ${ids -- terminatedIds}")
      }
    }

    val entries = graft.SparkEntry.queries
      .filter { case (n, _) => graft.Bench.isStreaming(n) }
      .toSeq.sortBy(_._1)

    // one untimed priming pass (plan compile + JIT, like Bench's) so the
    // floor table reflects warmed steady state
    entries.foreach { case (_, fn) => fn(spark, sfDir).collect() }

    println("| entry | wall_s | queries | batches | batch_exec_s | lifecycle_s |")
    println("|---|---|---|---|---|---|")
    val rows = entries.map { case (name, fn) =>
      val before = lock.synchronized { startedIds.toSet }
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val mine = lock.synchronized { startedIds.toSet } -- before
      drain(mine)
      val bs = lock.synchronized {
        val rows = batches.filter(b => mine.contains(b._1)).toVector
        // prune consumed history (incl. the priming pass's rows on the
        // first entry) so a many-entry sweep doesn't scan O(total
        // events) per entry; runIds stay — `before` needs them
        batches.filterInPlace(b => !mine.contains(b._1) &&
          !before.contains(b._1))
        rows
      }
      val execS = bs.map(_._3).filter(_ >= 0).sum / 1000.0
      val lifecycle = math.max(0.0, wall - execS)
      println(f"| $name | $wall%.2f | ${mine.size} | ${bs.size} | $execS%.2f | $lifecycle%.2f |")
      (name, wall, execS, lifecycle)
    }
    val wallSum = rows.map(_._2).sum
    val execSum = rows.map(_._3).sum
    println(f"| TOTAL | $wallSum%.2f | | | $execSum%.2f | ${wallSum - execSum}%.2f |")
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
