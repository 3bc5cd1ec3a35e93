package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.{TextAnalysis => TA}

/** gopherFlags: each rule fires independently on a targeted fixture. */
class GopherRulesSpec extends SparkTestBase {

  private def flagsFor(text: String,
      minWords: Int = 3, maxWords: Int = 100, minStop: Int = 1) = {
    import spark.implicits._
    val row = Seq(text).toDF("text")
      .select(TA.gopherFlags(col("text"), minWords, maxWords, minStop).as("f"))
      .select("f.*").collect().head
    (row.getAs[Boolean]("wc_ok"), row.getAs[Boolean]("mwl_ok"),
      row.getAs[Boolean]("alpha_ok"), row.getAs[Boolean]("stop_ok"),
      row.getAs[Boolean]("sym_ok"))
  }

  test("clean prose passes every rule") {
    val (wc, mwl, alpha, stop, sym) =
      flagsFor("the quick brown fox jumps over the lazy dog")
    assert(wc && mwl && alpha && stop && sym)
  }

  test("word-count bounds fire") {
    assert(!flagsFor("too few")._1)                         // below min
    assert(!flagsFor(Seq.fill(200)("word").mkString(" "))._1) // above max
  }

  test("mean word length bounds fire") {
    assert(!flagsFor("a a a a a")._2)                      // mwl 1 < 3
    assert(!flagsFor("extraordinarily incomprehensible " * 3)._2) // > 10
  }

  test("alpha-word ratio fires on numeric noise") {
    assert(!flagsFor("123 456 789 000 111 the dog runs")._3) // 3/8 alpha
  }

  test("stop-word rule fires when no stop word present") {
    assert(!flagsFor("quick brown fox jumps high")._4)
  }

  test("symbol ratio fires on hash/ellipsis spam") {
    assert(!flagsFor("buy now ### click here ... ... more #")._5)
  }

  test("keep is the conjunction") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps", "x 1 2 3 4").toDF("text")
      .withColumn("f", TA.gopherFlags(col("text"), 3, 100, 1))
      .select(TA.gopherKeep(col("f")).as("keep"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(df == Seq(true, false))
  }
}
