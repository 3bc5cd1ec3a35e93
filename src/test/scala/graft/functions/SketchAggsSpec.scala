package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchAggsSpec extends SparkTestBase {
  import spark.implicits._

  test("kmv: under-full sketch is the exact distinct set") {
    val df = Seq("a", "b", "c", "a", "b").toDF("v")
      .select(md5(col("v")).as("h"))
    val sketch = df.agg(SketchAggs.kmv_min_k(64)(col("h")).as("s"))
    val row = sketch.select(
      size(col("s")).as("n"),
      SketchAggs.kmvEstimate(col("s"), 64).as("est")).collect()(0)
    assert(row.getInt(0) == 3)
    assert(row.getDouble(1) == 3.0)
  }

  test("kmv: estimate within ~3/sqrt(k) of a 10k-distinct truth") {
    val k = 256
    val df = spark.range(10000).select(md5(col("id").cast("string")).as("h"))
    val est = df.agg(SketchAggs.kmvEstimate(
      SketchAggs.kmv_min_k(k)(col("h")), k).as("est"))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 3.0 / math.sqrt(k),
      s"estimate $est too far from 10000")
  }

  test("kmv: sketch independent of partitioning (merge determinism)") {
    def run(parts: Int): Seq[String] = {
      val df = spark.range(5000).repartition(parts)
        .select(md5(col("id").cast("string")).as("h"))
      df.agg(SketchAggs.kmv_min_k(32)(col("h")).as("s"))
        .collect()(0).getSeq[String](0)
    }
    assert(run(1) == run(13))
  }

  test("kmv: trim keeps the k smallest distinct under duplicates") {
    // each value appears 50x; k=8 must still hold the 8 smallest hashes
    val df = spark.range(1000).select((col("id") % 20).cast("string").as("v"))
      .select(md5(col("v")).as("h"))
    val sketch = df.agg(SketchAggs.kmv_min_k(8)(col("h")).as("s"))
      .collect()(0).getSeq[String](0)
    val expected = (0 until 20)
      .map(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .sorted.take(8)
    assert(sketch == expected)
  }

  test("cms: estimate >= exact count, equal when no bucket collisions") {
    val depth = 4; val width = 512
    val items = (1 to 10).flatMap(i => Seq.fill(i * 3)(s"key$i"))
    val df = items.toDF("item")
    val sk = df.agg(SketchAggs.cms_sketch(depth, width)(col("item")).as("s"))
    val probes = (1 to 10).map { i =>
      sk.select(SketchAggs.cmsEstimate(col("s"), lit(s"key$i"), depth, width))
        .collect()(0).getLong(0)
    }
    probes.zipWithIndex.foreach { case (est, idx) =>
      val exact = (idx + 1) * 3L
      assert(est >= exact, s"CMS undercounted key${idx + 1}: $est < $exact")
      // 10 keys in 4x512 buckets: collisions essentially impossible
      assert(est == exact, s"unexpected collision for key${idx + 1}")
    }
  }

  test("cms: merge across partitions equals single-partition sketch") {
    val items = (1 to 500).map(i => s"k${i % 37}")
    def sketch(parts: Int): Seq[Long] =
      items.toDF("item").repartition(parts)
        .agg(SketchAggs.cms_sketch(2, 64)(col("item")).as("s"))
        .collect()(0).getSeq[Long](0)
    assert(sketch(1) == sketch(11))
  }

  test("cms: scala bucket matches the SQL probe arithmetic") {
    // the oracle recomputes buckets as conv(substr(md5('j:item'),1,8),16,10) % width
    val df = Seq("Brand#12").toDF("item")
    for (j <- 0 until 4) {
      val sqlBucket = df.select(
        (conv(substring(md5(concat(lit(s"$j:"), col("item"))), 1, 8), 16, 10)
          .cast("bigint") % 256).cast("int")).collect()(0).getInt(0)
      assert(sqlBucket == SketchAggs.CmsAgg.bucket(j, "Brand#12", 256))
    }
  }
}
