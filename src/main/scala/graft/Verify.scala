package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional trailing args: run only these query names (local dev
    // iteration on one entry; the driver always passes exactly two).
    // Unknown names fail LOUDLY: a typo'd filter used to select
    // nothing, write an empty oracle_sql.json and an empty failure
    // manifest, and exit 0 — a green-looking run in which the query
    // never executed (r20 review; Profile errors the same way)
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"Verify: unknown query name(s) ${unknown.mkString(", ")} — " +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.take(8).mkString(", ")}…")
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession.builder: UTC, TIMESTAMP_MICROS parquet output (the
    // driver's DuckDB schema compare needs µs, not INT96), AQE, and the
    // Graft extensions (native ST functions + spatial join strategy)
    val spark = GraftSession.builder("graft-verify")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failures = Seq.newBuilder[String]
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name
        // delete any PREVIOUS run's output for this query: a reused
        // outDir would otherwise hand the DuckDB compare stale-but-
        // matching parquet and report a green round on broken code
        // (TempDirs' recursive delete — one implementation, r20 review)
        TempDirs.deleteRecursively(Paths.get(s"$outDir/$name"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // machine-readable failure manifest next to the outputs (stderr
    // alone can scroll away; exit stays 0 so the driver's compare still
    // runs and reports the missing outputs per query)
    val failed = failures.result()
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"),
      failed.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
