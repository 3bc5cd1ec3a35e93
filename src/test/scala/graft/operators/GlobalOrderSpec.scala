package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** GlobalOrder: distributed total order equals the single-task window
  * answer, at range-exchange parallelism.
  */
class GlobalOrderSpec extends SparkTestBase {

  test("globalRank equals the naive window rank") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .withColumn("k", md5(col("id").cast("string")))
    val got = GlobalOrder.globalRank(df, Seq(col("k"), col("id")), parts = 7)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df
      .withColumn("pos",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id"))) - 1)
      .select("id", "pos").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong)).toMap
    assert(got == want)
  }

  test("ranks are dense and unique across partitions") {
    import spark.implicits._
    val df = (1 to 500).map(_.toLong).toDF("id")
    val ranks = GlobalOrder.globalRank(df, Seq(col("id")), parts = 5)
      .select("pos").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (0L until 500L))
  }

  test("work is spread over multiple range partitions, not one task") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toLong).toDF("id")
      .withColumn("k", md5(col("id").cast("string")))
    val ranged = df.repartitionByRange(7, col("k"))
    val perPart = ranged
      .groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(perPart.length > 1, "range exchange collapsed to one partition")
    assert(perPart.max < 1000, "one partition holds everything")
  }

  test("shuffleShards stripes the key space round-robin") {
    import spark.implicits._
    val df = (1 to 512).map(_.toLong).toDF("doc_id")
    val shards = GlobalOrder.shuffleShards(df, "doc_id", "s", nShards = 8, parts = 4)
      .groupBy("shard").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shards.keySet == (0L to 7L).toSet)
    assert(shards.values.forall(_ == 64L), shards) // 512/8 exactly
  }
}
