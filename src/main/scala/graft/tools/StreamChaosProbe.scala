package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chaos-style robustness probe for the live streaming entries (r16
  * verdict task 3): feeds each `$d`-reading streaming entry a
  * deliberately HOSTILE staged source and reports whether it upholds
  * its documented drop/dedup semantics, fails loudly, or dies with an
  * opaque task error / silently corrupts.
  *
  * Hostile ingredients (see [[hostileDir]]):
  *  - NULL in every column that can carry one: event time, user id,
  *    event id, event type, value; null and empty document text;
  *  - duplicate event_ids — both byte-identical and CONFLICTING
  *    (same id, different ts/value);
  *  - out-of-order rows hours older than the stream's head (beyond
  *    every entry's watermark delay — though the staged single-file
  *    source drains in ONE micro-batch, so in-batch disorder is what
  *    is actually exercised; the multi-batch watermark-late DROP is
  *    pinned in StreamingTwinsSpec "multi-batch late event", which
  *    also documents that COMPLETE-mode entries like x54 aggregate
  *    late rows rather than drop them);
  *  - a ZERO-ROW parquet part file alongside the data part (an empty
  *    landing-dir file every production tailer eventually meets).
  *
  * The adjudicated per-entry expectations live in `StreamChaosSpec`,
  * which runs this same fixture in-suite; this main is the standalone
  * investigative form (`sbt "runMain graft.tools.StreamChaosProbe"`).
  */
object StreamChaosProbe {

  /** The streaming entries that read `$d/events.parquet` or
    * `$d/documents.parquet` — x58 is excluded (it streams its own
    * staged fixture and ignores `d`).
    */
  val entries: Seq[String] = Seq(
    "x51_streaming_sessionize", "x52_streaming_paragraph_dedup",
    "x53_streaming_topk", "x54_streaming_hourly",
    "x61_streaming_attribution", "x71_streaming_dedup",
    "x83_streaming_kmv", "x90_streaming_attribution_outer",
    "x93_session_window", "x95_tws_sessionize",
    "x96_streaming_sliding", "x98_streaming_dedup_within_wm",
    "x99_tws_bootstrap")

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType, nullable = true),
    StructField("ts_s", StringType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  // shared with BatchChaosProbe (it rebuilds documents over this dir)
  private[tools] val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  private[tools] def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
  private def D(v: Double): java.lang.Double = java.lang.Double.valueOf(v)

  /** Hostile event rows. Timeline base 2024-01-01T06:00 ("head"); the
    * out-of-order block sits 3 h earlier. click→purchase pairs exist so
    * the attribution joins have matches to corrupt.
    */
  private def hostileEvents: Seq[Row] = {
    def t(min: Int): String = {
      val total = 6 * 60 + min
      f"2024-01-01 ${total / 60}%02d:${total % 60}%02d:00"
    }
    val normal = (0 until 24).map { i =>
      val et = Seq("click", "purchase", "view")(i % 3)
      Row(L(100 + i), t(i * 5), L(1 + i % 4), et, D(1.0 + i), "{}")
    }
    val dupsIdentical = Seq.fill(3)(Row(L(1), t(10), L(1), "click", D(5.0), "{}"))
    val dupsConflicting = Seq(
      Row(L(2), t(12), L(2), "click", D(7.0), "{}"),
      Row(L(2), t(40), L(2), "purchase", D(9.0), "{}"))
    val nulls = Seq(
      Row(L(90), null, L(1), "click", D(1.0), "{}"),       // null event time
      Row(L(91), null, null, null, null, null),             // null everything else
      Row(L(92), t(20), null, "view", D(2.0), "{}"),        // null user
      Row(L(93), t(25), L(3), null, D(3.0), "{}"),          // null type
      Row(L(94), t(30), L(4), "view", null, "{}"),          // null value
      Row(null, t(35), L(1), "click", D(4.0), "{}"))        // null event id
    val outOfOrder = (0 until 4).map { i =>
      Row(L(200 + i), f"2024-01-01 03:${i * 7}%02d:00", L(1 + i % 2),
        if (i % 2 == 0) "click" else "purchase", D(10.0 + i), "{}")
    }
    normal ++ dupsIdentical ++ dupsConflicting ++ nulls ++ outOfOrder
  }

  private def hostileDocuments: Seq[Row] = Seq(
    Row(L(1), "alpha beta gamma delta " * 20, "en", "web", L(400)),
    Row(L(2), "alpha beta gamma delta " * 20, "en", "web", L(400)), // exact dup of 1
    Row(L(3), null, "en", "web", null),                             // null text
    Row(L(4), "", "en", "web", L(0)),                               // empty text
    Row(L(5), "epsilon zeta eta theta " * 10, null, null, L(200)),
    Row(null, "orphan paragraph with no id " * 8, "en", "web", L(160))) // null id

  /** Build the hostile source dir: `events.parquet` is a DIRECTORY
    * holding one data part plus one ZERO-ROW part; `documents.parquet`
    * a single hostile file. Returns the dir usable as a `d` argument.
    */
  def hostileDir(spark: SparkSession): String = {
    val root = graft.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_chaos_"))
    val evDir = root.resolve("events.parquet")
    val events = spark.createDataFrame(
        spark.sparkContext.parallelize(hostileEvents, 1), eventsSchema)
      .withColumn("ts", to_timestamp_ntz(col("ts_s")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    events.coalesce(1).write.mode("overwrite").parquet(evDir.toString)
    // a zero-row part beside the data part: written to a side dir with
    // the SAME schema, its part file moved in (Spark won't write an
    // empty part into an existing dir directly)
    val side = root.resolve("__empty_side")
    events.limit(0).coalesce(1).write.mode("overwrite").parquet(side.toString)
    val listing = java.nio.file.Files.list(side)
    val part =
      try listing.filter(p => p.getFileName.toString.startsWith("part-")).findFirst.get
      finally listing.close()
    java.nio.file.Files.move(part, evDir.resolve("part-empty.parquet"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(hostileDocuments, 1), documentsSchema)
    docs.coalesce(1).write.mode("overwrite")
      .parquet(root.resolve("documents.parquet").toString)
    root.toString
  }

  final case class Outcome(name: String, rows: Option[Long], error: Option[String])

  /** Run one entry against the hostile dir; never throws. */
  def run(spark: SparkSession, dir: String, name: String): Outcome =
    try {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      Outcome(name, Some(df.count()), None)
    } catch {
      case e: Throwable =>
        // bounded walk: a cyclic cause chain must not hang the probe
        val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .take(20).foldLeft(e)((_, c) => c)
        Outcome(name, None, Some(
          s"${root.getClass.getSimpleName}: ${Option(root.getMessage).getOrElse("").linesIterator.take(2).mkString(" / ")}"))
    }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("stream-chaos-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = hostileDir(spark)
    println(s"[chaos] hostile source at $dir")
    entries.foreach { n =>
      val o = run(spark, dir, n)
      println(o match {
        case Outcome(name, Some(r), None) => f"[chaos] $name%-34s rows=$r"
        case Outcome(name, _, Some(e)) => f"[chaos] $name%-34s ERROR $e"
        case _ => s"[chaos] $n ???"
      })
    }
    spark.stop()
  }
}
