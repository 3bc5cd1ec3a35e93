package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class HashSplitSpec extends SparkTestBase {

  import spark.implicits._

  test("hexThreshold: exact binary fractions map to exact hex strings") {
    assert(HashSplit.hexThreshold(0.5) == "80000000000000000000000000000000")
    assert(HashSplit.hexThreshold(0.25) == "40000000000000000000000000000000")
    assert(HashSplit.hexThreshold(0.0) == "00000000000000000000000000000000")
    assert(HashSplit.hexThreshold(1.0) == "ffffffffffffffffffffffffffffffff")
    intercept[IllegalArgumentException](HashSplit.hexThreshold(1.5))
  }

  test("assignment is stable: independent of the other rows present") {
    val big = (0L until 1000L).toDF("id")
    val small = big.filter(col("id") % 7 === 0)
    def splits(df: org.apache.spark.sql.DataFrame) =
      HashSplit.assign(df, "id").select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fromBig = splits(big)
    val fromSmall = splits(small)
    fromSmall.foreach { case (id, s) => assert(fromBig(id) == s, s"id $id moved") }
  }

  test("fractions land near the requested weights and weights normalize") {
    val df = (0L until 2000L).toDF("id")
    val counts = HashSplit.assign(df, "id", Seq("a" -> 3.0, "b" -> 1.0))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") + counts("b") == 2000)
    // binomial(2000, 0.75): sd ~ 19; allow 5 sd
    assert(math.abs(counts("a") - 1500) < 100, counts)
  }

  test("every row gets exactly one split and names are honored") {
    val df = (0L until 100L).toDF("id")
    val got = HashSplit.assign(df, "id").select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(got.subsetOf(Set("train", "val", "test")), got)
    assert(HashSplit.assign(df, "id").count() == 100)
  }

  test("single split assigns everything to it") {
    val df = (0L until 10L).toDF("id")
    val got = HashSplit.assign(df, "id", Seq("all" -> 1.0))
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(got == Seq("all"))
  }
}
