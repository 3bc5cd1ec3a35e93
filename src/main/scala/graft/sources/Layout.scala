package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for the 100 TB path (SURVEY §4): how data
  * should be WRITTEN so downstream plans avoid shuffles and scans
  * prune.
  *
  *  - `writePartitioned`: hive-style directory partitioning — partition
  *    pruning turns full scans into a few directory reads (date- or
  *    cell-partitioned facts, IVF cells, LSH buckets).
  *  - `writeBucketed`: pre-shuffled bucket layout registered in the
  *    catalog — equi-joins and aggregations on the bucket keys plan
  *    with NO Exchange on either side (verified by `PlanQualitySpec`).
  */
object Layout {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
