package graft
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.queries.{CorpusQueries, ExtQueries}

/** Diagnostic main: formatted physical plans for the load-bearing plan
  * shapes (pushdown/pruning, broadcast lookup, partial agg, top-k,
  * spatial index join, as-of window sweep). `PlanQualitySpec` asserts
  * on these; this prints them for eyeballing.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("plan-check", 8)
    val d = "/root/testdata/sf0.01"
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    for (q <- Seq("q01", "q14", "q15", "q30"))
      show(q, CorpusQueries.all.find(_.name == q).getOrElse(
        sys.error(s"unknown query $q; known: " +
          CorpusQueries.all.map(_.name).sorted.mkString(", "))).run(spark, d))
    show("x22_asof", ExtQueries.x22_asof.run(spark, d))
    show("x23_rangejoin", ExtQueries.x23_rangejoin.run(spark, d))

    // spatial predicate join → SpatialIndexJoin via the planner strategy
    import spark.implicits._
    import graft.geom.{GeomFunctions => G}
    def sq(x: Double, y: Double, s: Double) = graft.geom.GeomCodec.wktToWkb(
      f"POLYGON(($x $y, ${x + s} $y, ${x + s} ${y + s}, $x ${y + s}, $x $y))")
    val a = (0 until 100).map(i => (s"a$i", sq(i, 0, 2))).toDF("aid", "geom")
    val b = (0 until 10).map(i => (s"b$i", sq(i * 10, 0, 5))).toDF("bid", "bgeom")
    show("spatial_index_join", a.join(b, G.st_intersects($"geom", $"bgeom")))

    spark.stop()
  }
}
