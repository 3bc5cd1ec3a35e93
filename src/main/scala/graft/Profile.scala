package graft

/** Per-query profiler: time a named subset of `SparkEntry.queries`
  * (warm, median-of-N like Bench) without paying for the whole sweep.
  *
  *   sbt "runMain graft.Profile /root/testdata/sf0.1 x05_simhash x09_langid"
  *
  * `SPARK_GRAFT_EXPLAIN=1` additionally prints each query's formatted
  * physical plan — the `.explain("formatted")` iteration loop the
  * optimizer work is driven by.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Profile <sfDir> <queryName>...")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-profile")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS=$reps must be >= 1")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      // plan/codegen warmup at the smallest SF (same guard as Bench:
      // a missing warmup dir or a warmup-only failure must not kill
      // the measurement)
      val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
      try fn(spark, warmDir).count() catch { case _: Throwable => }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // reps/2 is Bench's median convention — keep the two comparable
      println(f"[profile] $name median=${times.sorted.apply(reps / 2)}%.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      // release between queries, like Bench between groups: one query's
      // persisted intermediates (a gram-instance-sized span index)
      // otherwise squat on storage memory and skew the NEXT query's
      // timed reps — Profile's numbers must stay comparable to Bench's
      graft.CacheLifecycle.release(spark)
    }
    spark.stop()
  }
}
