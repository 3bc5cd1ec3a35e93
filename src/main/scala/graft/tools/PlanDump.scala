package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.{GraftSession, SparkEntry}

/** Optimization-round instrument: dump `explain("formatted")` for
  * declared queries to `plans/<tag>/<name>_<suffix>.txt` — the judge
  * checks plan claims (Exchange counts, join strategy, PushedFilters)
  * against these committed files, since it cannot run Spark itself.
  *
  *   sbt "runMain graft.tools.PlanDump r21 before [prefix,prefix,...]"
  *
  * Streaming entries are SKIPPED by default: their `run` executes a
  * live StreamingQuery and returns the memory-sink result table, whose
  * batch plan (a LocalTableScan) says nothing about the streaming
  * plan. Pass an explicit prefix filter naming one to force it.
  *
  * Plans are captured at the BENCH's own scale/parallelism
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS defaults, sf0.1 / 32) so
  * size-estimate-driven choices (broadcast thresholds) match what the
  * bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("r21")
    val suffix = if (args.length > 1) args(1) else "before"
    val only = if (args.length > 2)
      Some(args(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-plan-dump")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only match {
        case Some(ps) => ps.exists(n.startsWith)
        case None => !graft.Bench.isStreaming(n)
      }
    }
    var ok = 0
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.write(outDir.resolve(s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
        ok += 1
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"[plandump] wrote $ok/${selected.size} plans to $outDir (suffix=$suffix, sf=$sfDir)")
    spark.stop()
  }
}
