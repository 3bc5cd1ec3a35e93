package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — no schema pinning needed (parquet is
  * self-describing) and no eager caching: each declared query reads only
  * the tables it uses, so Catalyst can push filters and prune columns
  * all the way into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): the DataFrame is a lazy plan
  // (NOT cached data — scans still push filters and prune columns), but
  // re-resolving it costs a parquet footer read + schema inference per
  // query, which adds up over a 60-query sweep.
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  /** Serializes EVERY session-global `nanosAsLong` set/restore in the
    * JVM: `eventsImpl` here and `StreamingTwins.readEvents` both probe
    * parquet footers under the flag and restore it — two racing
    * threads (from either component) could interleave set/restore so
    * the conf stays permanently flipped for a micros-generation file.
    * One shared lock closes the cross-component pair the per-object
    * locks missed (r17 review finding).
    */
  private[graft] val nanosConfLock = new Object

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // bounded: clear on overflow so stopped sessions / regenerated
    // files don't stay pinned through a long-lived JVM
    if (memo.size > 64) memo.clear()
    if (table == "events")
      // the only builder with a session-global side effect — lock it;
      // TrieMap may double-evaluate a contended rawLoad builder, but a
      // duplicate LAZY plan is harmless and unrelated first-time table
      // loads should not queue behind one another's footer reads
      nanosConfLock.synchronized {
        memo.getOrElseUpdate((spark, sfDir, table), eventsImpl(spark, sfDir))
      }
    else memo.getOrElseUpdate((spark, sfDir, table), rawLoad(spark, sfDir, table))
  }

  private def rawLoad(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` normalization to microsecond TIMESTAMP_NTZ — naive
    * timestamp semantics aligned with the DuckDB oracle. Routed through
    * the memo like every other table (the footer read + schema
    * inference this file exists to avoid repeating was re-paid on every
    * direct call to the old public impl).
    */
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  /** The physical parquet type has varied across driver testdata
    * generations: TIMESTAMP(NANOS) (unreadable natively; surfaces as a
    * nanosecond long under `nanosAsLong`) and plain TIMESTAMP(MICROS)
    * (reads as timestamp_ntz directly). Dispatch on the inferred type
    * so either generation loads. The nanosAsLong conf must be on for
    * the footer probe; it is RESTORED when the file turns out not to
    * need it (the flip is session-global and changes how unrelated
    * parquet reads see NANOS columns) and stays set only for the
    * nanos generation, whose lazy plan re-reads the conf at every
    * action.
    */
  private def eventsImpl(s: SparkSession, d: String): DataFrame = {
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = s.conf.getOption(confKey)
    s.conf.set(confKey, "true")
    def restore(): Unit = prior match {
      case Some(v) => s.conf.set(confKey, v)
      case None => s.conf.unset(confKey)
    }
    // the ts-field lookup is INSIDE the guard: on a ts-less/renamed
    // generation `schema("ts")` throws AFTER the probe succeeded, and
    // an escape there used to leak the flag session-wide (the same
    // r20 hole fixed in StreamingTwins.readEvents)
    val raw =
      try {
        val r = rawLoad(s, d, "events")
        if (r.schema("ts").dataType !=
            org.apache.spark.sql.types.LongType) restore()
        r
      } catch { case e: Throwable => restore(); throw e }
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>          // TIMESTAMP(NANOS) surfaced as ns-long
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case TimestampNTZType =>  // TIMESTAMP(MICROS, isAdjustedToUTC=false)
        raw
      case TimestampType =>     // TIMESTAMP(MICROS, UTC-adjusted instants):
        // wall values in UTC == the naive values the oracle reads; the
        // ntz cast goes through the session tz, so require UTC rather
        // than silently shifting every timestamp.
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events: TIMESTAMP (LTZ) column requires spark.sql.session.timeZone=UTC " +
            "for a lossless cast to timestamp_ntz")
        raw.withColumn("ts", expr("ts").cast("timestamp_ntz"))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unexpected parquet-inferred type $other — refusing to " +
            "cast blindly; extend Tables.events for this testdata generation")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
