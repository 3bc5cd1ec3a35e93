package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** A shared engine serves CONCURRENT queries on a real cluster —
  * multiple analysts, a BI layer, a scheduler. This pins that the
  * session wiring (GraftExtensions function registry, the spatial
  * strategy, CacheLifecycle's concurrent registry) is safe under
  * parallel plan+execute on one SparkSession: eight corpus entries
  * planned and executed from eight threads must return exactly the
  * serial answers. Entries chosen are pure batch reads — no session
  * conf mutation, no named temp views (the streaming entries' fixed
  * sink names are serial-harness-only by contract).
  */
class ConcurrencySpec extends SparkTestBase {

  private val names = Seq("q01", "q02", "q03", "q05", "q07", "q13", "q14", "q30")
  private val dir = "/root/testdata/sf0.001"

  private def run(n: String): Seq[String] =
    SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted.toSeq

  test("eight concurrent corpus queries on one session equal their serial answers") {
    val serial = names.map(n => n -> run(n)).toMap
    val pool = Executors.newFixedThreadPool(names.size)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // two rounds so each plan is exercised both cold and warm
      (1 to 2).foreach { round =>
        val conc = Await.result(
          Future.sequence(names.map(n => Future(n -> run(n)))), 5.minutes).toMap
        names.foreach { n =>
          assert(conc(n) == serial(n), s"round $round: $n diverged under concurrency")
        }
      }
    } finally pool.shutdown()
  }

  test("concurrent events loads leave the nanosAsLong conf exactly where a serial load does") {
    // eventsImpl sets and restores the session-global nanosAsLong conf;
    // Tables.nanosConfLock serializes builders so two racing loads cannot
    // interleave set/restore and leave the conf permanently flipped for
    // a micros-generation file. Distinct trailing-slash spellings defeat
    // the memo so each thread really runs the builder.
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val serialFrame = Tables.events(spark, dir)
    val expectedConf = spark.conf.getOption(confKey)
    val expectedType = serialFrame.schema("ts").dataType
    val pool = Executors.newFixedThreadPool(8)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val dirs = (1 to 8).map(i => dir + "/" * i)
      val frames = Await.result(
        Future.sequence(dirs.map(d => Future(Tables.events(spark, d)))), 5.minutes)
      frames.foreach(f => assert(f.schema("ts").dataType == expectedType))
      assert(spark.conf.getOption(confKey) == expectedConf,
        "a racing events build left the session conf in a different state than a serial build")
    } finally pool.shutdown()
  }
}
