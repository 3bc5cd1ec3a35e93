package graft.tools

/** Optimization-round instrument (r21): split a declared entry's
  * per-rep wall into plan-construction, analysis, cache-substitution,
  * optimization, physical planning, and execution — the guide §1
  * "where is the time actually going" question for entries whose wall
  * vastly exceeds their task CPU (driver-side cost, invisible to task
  * metrics). Runs the entry's `run` fresh per rep exactly like a bench
  * rep, but walks the lazy QueryExecution phases with a timer between
  * each.
  *
  *   sbt "runMain graft.tools.PhaseProbe p03_quality_gate 3"
  *
  * The first argument takes a comma-separated list (or a name PREFIX —
  * same matching as SPARK_GRAFT_BENCH_ONLY) so one JVM can sweep a
  * family; between entries the operator persists are released like a
  * bench group boundary, so each entry's telemetry starts cold-cache.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p03_quality_gate")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
    val b = graft.GraftSession.builder("phase-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
    // PROBE_NO_BROADCAST=1: disable auto-broadcast so fixture-scale
    // dimension/rank/message frames take the SHUFFLE join path they
    // would take at 100 TB (where they exceed any broadcast threshold)
    // — the stages/shuffle_kb telemetry then measures the scale plan's
    // exchange structure instead of the broadcast-everything local one.
    val spark = (if (sys.env.get("PROBE_NO_BROADCAST").contains("1"))
      b.config("spark.sql.autoBroadcastJoinThreshold", "-1") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Shuffle telemetry (guide §2.3: "shuffle fewer bytes" needs the
    // bytes measured, not inferred from plan text): stages run and
    // shuffle bytes written during each rep, from the engine's own
    // task metrics. Executed-stage count is the live shuffle-boundary
    // count — plan-string Exchange greps overcount because cached
    // frames print their build plan inside InMemoryRelation.
    val stages = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufWrite.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    def settle(): Unit = { Thread.sleep(150) }
    // PROBE_NOOP=1: time the noop sink instead of count() (guide §1.4
    // — count() lets the optimizer prune columns and even whole join
    // subtrees: x63's 3-iteration rank chain collapses to |verts| under
    // count() because a left join on a unique key with no referenced
    // right columns is eliminable). The bench keeps count() by driver
    // contract; this knob exists so optimization evidence can measure
    // the full computation.
    val noop = sys.env.get("PROBE_NOOP").contains("1")
    def act(df: org.apache.spark.sql.DataFrame): Unit =
      if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
    val wanted = name.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.startsWith) }
    require(selected.nonEmpty, s"no declared entry matches '$name'")
    selected.foreach { case (entry, fn) =>
      // priming execution, like Bench.measure
      act(fn(spark, sf))
      (1 to reps).foreach { i =>
        def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
        var t = System.nanoTime()
        val df = fn(spark, sf)
        val tBuild = ms(t)
        val qe = df.queryExecution
        t = System.nanoTime(); qe.analyzed; val tAnalyze = ms(t)
        t = System.nanoTime(); qe.withCachedData; val tCache = ms(t)
        t = System.nanoTime(); qe.optimizedPlan; val tOpt = ms(t)
        t = System.nanoTime(); qe.executedPlan; val tPhys = ms(t)
        settle(); val s0 = stages.get(); val b0 = shufWrite.get()
        t = System.nanoTime(); act(df); val tExec = ms(t)
        settle()
        println(f"PHASE $entry%-24s rep=$i build=$tBuild%7.1f analyze=$tAnalyze%7.1f " +
          f"cache=$tCache%7.1f optimize=$tOpt%7.1f physical=$tPhys%7.1f exec=$tExec%7.1f ms " +
          f"stages=${stages.get() - s0}%3d shuffle_kb=${(shufWrite.get() - b0) >> 10}%d")
        // PROBE_SHOW_JOINS=1: execute THIS QueryExecution (RDD count) so
        // AQE finalizes, then print the join strategies it actually ran —
        // explain() before execution only shows the initial plan, which
        // is exactly the wrong evidence for runtime join-strategy checks
        if (i == reps && sys.env.get("PROBE_SHOW_JOINS").contains("1")) {
          qe.executedPlan.execute().count()
          val joins = qe.executedPlan.toString.linesIterator
            .map(_.trim.dropWhile(c => c == '+' || c == '-' || c == ':' || c == ' ' || c == '*' || c == '('))
            .filter(l => l.contains("Join") || l.contains("CartesianProduct"))
            .map(_.takeWhile(_ != '[')).toSeq
          println(s"JOINS $entry executed: " +
            joins.groupBy(identity).map { case (k, v) => s"${v.size}x $k" }.mkString("; "))
        }
      }
      // bench group boundary semantics between entries
      graft.CacheLifecycle.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
