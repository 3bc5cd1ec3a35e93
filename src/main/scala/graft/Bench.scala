package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver runs per-round → BENCH_r{N}.json).
  *
  * The headline `value` is the BASELINE.md-defined workload — the full
  * Q01–Q34 declared-corpus sweep (budget < 60 s at sf0.1 post-warmup).
  * Per-query timings for EVERY query group (corpus, geometry,
  * extension, pipeline) are reported alongside, with per-group
  * subtotals under `groups`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GraftSession.builder wires the extensions (native ST functions +
    // spatial join strategy) so benchmarks measure the planned engine,
    // not a fallback path
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup at the smallest scale factor so measured
    // numbers reflect steady-state execution (BASELINE.md's
    // "post-warmup" budgets): run every DATA-SCALED query once at
    // sf0.001 — same plans, so codegen caches and JIT warm, while the
    // sf0.1 measurement still does all the data-proportional work.
    // Fixture-fixed groups (g*, p*) are NOT warmed: they ignore the
    // scale dir, so a warm run would only measure their caches.
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => n.startsWith("q") || n.startsWith("x") }
      .foreach { case (_, fn) =>
        try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
      }

    // a failed query reports -1 (never a plausible-looking elapsed time)
    // and lands in `failed` so breakage is visible in the JSON itself.
    // Each query runs `reps` times and reports the MEDIAN — a single
    // run can't distinguish a real regression from GC/section-ordering
    // noise (r2's p02 "regression" was exactly that ambiguity).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      name -> (if (times.size == reps) times.sorted.apply(reps / 2) else -1.0)
    }
    val failed = results.collect { case (k, v) if v < 0 => s""""$k"""" }.mkString("[", ",", "]")

    def group(prefix: String): Double =
      results.filter(_._1.startsWith(prefix)).map(_._2).filter(_ >= 0).sum

    val corpus = group("q")
    // 4-decimal (0.1 ms) formatting: full double precision pushed the
    // JSON line past the driver's 2 KB stdout-tail window, so its parse
    // of the line always failed; 0.1 ms resolution is far below
    // run-to-run noise and keeps the whole line inside the window
    def f4(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s""""$k":${f4(v)}""" }.mkString("{", ",", "}")
    val groups =
      s"""{"corpus_q01_q34":${f4(corpus)},"geometry":${f4(group("g"))},"extension":${f4(group("x"))},"pipeline":${f4(group("p"))}}"""
    println(
      s"""{"metric":"corpus_sweep","value":${f4(corpus)},"unit":"sec","queries":$qs,"failed":$failed,"groups":$groups,"sf":"$sfDir"}""")
    spark.stop()
  }
}
