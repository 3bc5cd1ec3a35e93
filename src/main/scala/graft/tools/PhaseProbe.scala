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
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p03_quality_gate")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("phase-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // priming execution, like Bench.measure
    fn(spark, sf).count()
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
      t = System.nanoTime(); df.count(); val tExec = ms(t)
      println(f"PHASE $name%-24s rep=$i build=$tBuild%7.1f analyze=$tAnalyze%7.1f " +
        f"cache=$tCache%7.1f optimize=$tOpt%7.1f physical=$tPhys%7.1f exec=$tExec%7.1f ms")
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
        println(s"JOINS $name executed: " +
          joins.groupBy(identity).map { case (k, v) => s"${v.size}x $k" }.mkString("; "))
      }
    }
    spark.stop()
  }
}
