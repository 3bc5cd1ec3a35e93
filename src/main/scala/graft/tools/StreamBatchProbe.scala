package graft.tools

import scala.collection.mutable

/** Per-micro-batch duration breakdown for the streaming bench entries
  * (dev tool, the drill-down companion of [[StreamFloorProbe]]):
  * where StreamFloorProbe splits an entry's wall into lifecycle vs
  * Σ triggerExecution, this probe splits EACH batch's triggerExecution
  * into the engine's own phases (`durationMs`: latestOffset /
  * getBatch / queryPlanning / addBatch / walCommit / commitOffsets)
  * and prints the per-operator state metrics (rows, update/removal/
  * commit times, state memory) so a slow streaming entry can be
  * attributed to scan, plan, exec, or state-store commit from the
  * engine's instrumentation instead of guessed.
  *
  * Usage: `sbt "runMain graft.tools.StreamBatchProbe [names...]"`
  * (defaults to the two attribution entries; `PROBE_SF` selects the
  * data dir, `PROBE_REPS` the measured reps after the warm pass).
  */
object StreamBatchProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("stream-batch-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // same run-id attribution discipline as StreamFloorProbe: progress
    // events arrive async, onQueryStarted is synchronous, so filter by
    // the runIds started during the measured fn
    val progress = mutable.ArrayBuffer
      .empty[(java.util.UUID, org.apache.spark.sql.streaming.StreamingQueryProgress)]
    val startedIds = mutable.Set.empty[java.util.UUID]
    val terminatedIds = mutable.Set.empty[java.util.UUID]
    val lock = new Object
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        lock.synchronized { startedIds += e.runId }
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        lock.synchronized { progress += ((e.progress.runId, e.progress)) }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        lock.synchronized { terminatedIds += e.runId; lock.notifyAll() }
    }
    spark.streams.addListener(listener)

    def drain(ids: Set[java.util.UUID], capMs: Long = 10000): Unit = {
      val deadline = System.nanoTime() + capMs * 1000000L
      lock.synchronized {
        while (!ids.subsetOf(terminatedIds) && System.nanoTime() < deadline)
          lock.wait(50)
        require(ids.subsetOf(terminatedIds),
          s"listener bus did not deliver termination for ${ids -- terminatedIds}")
      }
    }

    val names = args.toSeq match {
      case Nil => Seq("x61_streaming_attribution", "x90_streaming_attribution_outer")
      case xs  => xs
    }
    val reps = sys.env.getOrElse("PROBE_REPS", "2").toInt

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm (plan compile + JIT + staging)
      (1 to reps).foreach { rep =>
        val before = lock.synchronized { startedIds.toSet }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val mine = lock.synchronized { startedIds.toSet } -- before
        drain(mine)
        val ps = lock.synchronized {
          val rows = progress.filter(p => mine.contains(p._1)).toVector
          progress.filterInPlace(p => !mine.contains(p._1) && !before.contains(p._1))
          rows
        }
        println(f"== $name rep=$rep wall=$wall%.2f s, ${ps.size} batches ==")
        ps.foreach { case (_, p) =>
          def d(k: String): Long =
            Option(p.durationMs.get(k)).map(_.toLong).getOrElse(-1L)
          println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
            s"trigger=${d("triggerExecution")} latestOffset=${d("latestOffset")} " +
            s"getBatch=${d("getBatch")} planning=${d("queryPlanning")} " +
            s"addBatch=${d("addBatch")} walCommit=${d("walCommit")} " +
            s"commitOffsets=${d("commitOffsets")}")
          p.stateOperators.foreach { so =>
            println(s"    state[${so.operatorName}] rowsTotal=${so.numRowsTotal} " +
              s"updated=${so.numRowsUpdated} (${so.allUpdatesTimeMs} ms) " +
              s"removed=${so.numRowsRemoved} (${so.allRemovalsTimeMs} ms) " +
              s"commit=${so.commitTimeMs} ms memKB=${so.memoryUsedBytes >> 10} " +
              s"shufflePartitions=${so.numShufflePartitions} " +
              s"storeInstances=${so.numStateStoreInstances}")
            val cm = so.customMetrics
            if (cm != null && !cm.isEmpty) {
              val interesting = cm.entrySet().toArray
                .map(_.asInstanceOf[java.util.Map.Entry[String, java.lang.Long]])
                .filter(_.getValue != 0L)
                .map(e => s"${e.getKey}=${e.getValue}").sorted
              if (interesting.nonEmpty)
                println(s"      custom: ${interesting.mkString(" ")}")
            }
          }
        }
      }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
