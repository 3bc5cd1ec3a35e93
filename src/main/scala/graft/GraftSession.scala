package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Local-mode defaults mirror what a cluster deployment would set per
  * executor: shuffle parallelism sized to cores (not the 200 default),
  * AQE on so skewed joins / small partitions re-plan at runtime, UTC so
  * timestamp semantics match the DuckDB oracle.
  */
object GraftSession {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .withExtensions(new graft.geom.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // STATIC conf, must be set before the first session. The default
      // 100-entry codegen class cache thrashes on a 130+-entry sweep
      // (each query compiles several whole-stage units): every rep
      // regenerates + re-JITs fresh classes, so "steady state" never
      // arrives — x68 measured 98 cpu-s in a full sweep vs 14 cpu-s in
      // a short one with identical code. Sized to hold every plan of
      // the sweep simultaneously; pairs with the 1g reserved code
      // cache in build.sbt.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** Local session used by tests. Verify/Bench build their own session
    * through [[builder]] with an explicitly hardcoded `local[$cpus]`
    * master (SPARK_GRAFT_CPUS) — they are local-mode mains by contract,
    * not spark-submit apps, and a submit-supplied master would be
    * overridden there (r20 review: this doc used to claim the driver
    * supplies the master, which contradicted both mains).
    */
  def local(appName: String = "graft", threads: Int = cpus): SparkSession = {
    val s = builder(appName)
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
