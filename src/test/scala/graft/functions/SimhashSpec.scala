package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The fused [[SimhashExpr]] must reproduce the composed chain it
  * replaced bit-for-bit:
  * `foldUdf(transform(split(lower(trim(text)), "\s+"), t => xxhash64(t)))`
  * — rebuilt here verbatim as the independent reference. The x05
  * VALUES golden pins the same bits end-to-end through the Hamming
  * block trick.
  */
class SimhashSpec extends SparkTestBase {

  // the pre-r11 composed form, verbatim
  private def composed(text: org.apache.spark.sql.Column) = {
    val fold = udf((hs: Seq[Long]) => {
      val acc = new Array[Int](64)
      if (hs != null) hs.foreach { h =>
        var j = 0
        while (j < 64) { acc(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      }
      var sig = 0L
      var j = 0
      while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
      sig
    })
    fold(transform(split(lower(trim(text)), "\\s+"), t => xxhash64(t)))
  }

  test("fused kernel equals the composed chain on edge cases and the corpus") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox", "one", "", "  padded  ", "MIXED Case",
      "tabs\tnewlines\nhere", "Ωμέγα unicode 文", "a").toDF("text")
      .unionByName(graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select("text").limit(40))
    val diff = texts.select(
        TextFunctions.simhash64(col("text")).as("fast"),
        composed(col("text")).as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(diff.isEmpty, diff.collect().take(3).mkString("; "))
  }

  test("null text folds to signature 0, not NULL; plan stays codegen'd") {
    import spark.implicits._
    val rows = Seq[Option[String]](None, Some("a b c")).toDF("text")
      .select(TextFunctions.simhash64(col("text")).as("sig")).collect()
    assert(!rows(0).isNullAt(0) && rows(0).getLong(0) == 0L)
    assert(rows(1).getLong(0) != 0L)
    val plan = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextFunctions.simhash64(col("text")).as("sig"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [simhash64("), plan.take(600))
  }
}
