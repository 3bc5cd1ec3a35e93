package graft.tools

/** Throwaway dev probe — not part of the library surface. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // task executor-CPU telemetry, same source as Bench.Sample.taskCpu
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          taskCpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })
    def settled(): Long = {
      var last = taskCpuNs.get(); var i = 0
      while (i < 20) {
        Thread.sleep(20)
        val cur = taskCpuNs.get()
        if (cur == last) i = 20 else { last = cur; i += 1 }
      }
      last
    }
    val names = args.toSeq match {
      case Nil => Seq("x68_dup_spans", "x88_dup_coverage", "x97_dup_span_removal")
      case xs  => xs
    }
    val reps = sys.env.getOrElse("PROBE_REPS", "1").toInt
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (reps > 1) {
        (1 to reps).foreach { i =>
          val tc0 = settled(); val t0 = System.nanoTime()
          fn(spark, sf).count()
          val w = (System.nanoTime() - t0) / 1e9
          val tc = (settled() - tc0) / 1e9
          println(f"PROBEREP $n%-24s rep=$i wall=$w%6.2f taskcpu=$tc%7.2f")
        }
      }
      // warm
      fn(spark, sf).count()
      val tc0 = settled()
      val t0 = System.nanoTime()
      val b = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      val c0 = b.getProcessCpuTime
      // count(), same as Bench.measure — collect() defeats column
      // pruning and times work the bench doesn't time
      fn(spark, sf).count()
      val w = (System.nanoTime() - t0) / 1e9
      val c = (b.getProcessCpuTime - c0) / 1e9
      val tc = (settled() - tc0) / 1e9
      println(f"PROBE $n%-24s wall=$w%6.2f cpu=$c%7.2f taskcpu=$tc%7.2f")
      if (sys.env.contains("PROBE_PLAN")) {
        val df = fn(spark, sf)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        val gens = "Generate".r.findAllIn(plan).size
        val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(plan).size
        println(s"PLAN $n generates=$gens reused=$reused")
        println(plan.take(12000))
      }
    }
    spark.stop()
  }
}
