package graft
import graft.queries.CorpusQueries
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("plan-check", 8)
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q01", "q14", "q15", "q30")) {
      println(s"===== $q =====")
      println(CorpusQueries.all.find(_.name == q).get.run(spark, d)
        .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
