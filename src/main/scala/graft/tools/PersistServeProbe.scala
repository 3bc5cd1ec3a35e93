package graft.tools

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

/** Per-invocation persist-serving adjudicator (r19, the x68/q15
  * driver-sweep watch items from the r18 verdict): builds a contract
  * entry N times back-to-back — exactly the bench's rep shape — and
  * prints EACH invocation's wall / task-CPU / cached-read evidence,
  * where Bench only reports the median. Separates the three ghost
  * mechanisms at a glance:
  *
  *  - persist serves:       rep 1 task-CPU >> reps 2+ (build vs read)
  *  - persist NOT serving:  flat high task-CPU across all reps
  *  - environment:          flat low task-CPU, wall/process-CPU noisy
  *
  * Also prints whether the entry's executed plan reads an
  * InMemoryRelation (TableCacheQueryStage / InMemoryTableScan) and the
  * storage footprint after the first materialization.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain
  * graft.tools.PersistServeProbe x68_dup_spans q15"`.
  */
object PersistServeProbe {

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("x68_dup_spans", "q15")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-persistprobe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val meter = new TaskCpuMeter(spark.sparkContext)
    val osBean = ManagementFactory.getOperatingSystemMXBean
    def procCpuNs: Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
    def storageMb: Long =
      spark.sparkContext.statusTracker.getExecutorInfos
        .map(e => e.usedOnHeapStorageMemory + e.usedOffHeapStorageMemory)
        .sum >> 20

    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown entry $name"))
      graft.CacheLifecycle.release(spark)
      spark.catalog.clearCache()
      println(s"== $name (fresh cache) ==")
      val nReps = sys.env.getOrElse("PROBE_REPS", "4").toInt
      (1 to nReps).foreach { rep =>
        meter.settle()
        val w0 = System.nanoTime(); val t0 = meter.now; val c0 = procCpuNs
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - w0) / 1e9
        meter.settle()
        val task = (meter.now - t0) / 1e9
        val proc = (procCpuNs - c0) / 1e9
        val rdds = spark.sparkContext.getPersistentRDDs
        // per-RDD cached-partition/byte detail separates LATE CACHE
        // MATERIALIZATION (cachedParts/memSize of the persisted ids
        // still growing reps later = blocks not cached by the build
        // action) from per-execution broadcast accumulation (RDD info
        // flat while executor storage grows)
        val info = spark.sparkContext.getRDDStorageInfo.map(i =>
          s"rdd${i.id}:${i.numCachedPartitions}/${i.numPartitions}p " +
            s"${i.memSize >> 20}+${i.diskSize >> 20}MB").mkString(" ")
        println(f"$name rep $rep: wall=$wall%.3f s  task_cpu=$task%.3f s  " +
          f"proc_cpu=$proc%.3f s  stor=${storageMb} MB  " +
          f"persistentRdds=${rdds.size}  [$info]")
      }
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val cachedReads = plan.linesIterator
        .filter(l => l.contains("InMemory") || l.contains("TableCacheQueryStage"))
        .take(4).map(_.trim).toSeq
      println(s"$name plan cached-read lines: " +
        (if (cachedReads.isEmpty) "NONE (no InMemoryRelation in plan!)"
         else cachedReads.mkString(" | ")))
    }
    spark.stop()
  }
}
