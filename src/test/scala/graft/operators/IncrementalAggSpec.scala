package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1.25), ("a", 2.50), ("b", 10.00), ("b", -3.75), ("c", 0.01),
    ("a", 99.99), ("c", 7.77))
    .toDF("k", "v")

  private def canon(df: DataFrame): Set[(String, Long, java.math.BigDecimal, Double, Double)] =
    df.select(col("k"), col("cnt").cast("long"),
        col("total").cast("decimal(18,2)"), col("lo"), col("hi"))
      .as[(String, Long, java.math.BigDecimal, Double, Double)]
      .collect().toSet

  test("merge law: merge(toState(A), toState(B)) == toState(A union B), exactly") {
    val (a, b) = (rows.where(col("v") < 5.0), rows.where(col("v") >= 5.0))
    val merged = IncrementalAgg.merge(
      IncrementalAgg.toState(a, Seq("k"), "v"),
      IncrementalAgg.toState(b, Seq("k"), "v"), Seq("k"))
    val full = IncrementalAgg.toState(rows, Seq("k"), "v")
    assert(canon(merged) == canon(full))
  }

  test("keys present in only one side survive the merge") {
    val a = rows.where(col("k") =!= "c") // c only in b
    val b = rows.where(col("k") === "c")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.toState(a, Seq("k"), "v"),
      IncrementalAgg.toState(b, Seq("k"), "v"), Seq("k"))
    assert(canon(merged) == canon(IncrementalAgg.toState(rows, Seq("k"), "v")))
  }
}
