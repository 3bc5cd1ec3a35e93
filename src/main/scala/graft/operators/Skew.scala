package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (SURVEY §4 / the 100 TB
  * checklist). A `groupBy(key)` with a dominant key puts that key's
  * entire volume through one reducer; salting splits each key into
  * `buckets` sub-keys for the partial phase and re-aggregates partials
  * in a second, tiny phase. AQE's skew handling covers joins; this
  * covers aggregations with algebraic (re-aggregatable) functions.
  */
object Skew {

  /** Two-phase salted aggregation: `partials` computes per
    * (key, salt) — e.g. count/sum/min/max — and `finals` merges the
    * partials per key (e.g. sum of counts). Column names in `partials`
    * output feed `finals` input.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    // the salt MUST be deterministic per row: it feeds a shuffle's
    // grouping key, and a nondeterministic value (the first cut used
    // spark_partition_id + monotonically_increasing_id) re-salts rows
    // differently when a lost map task recomputes — completed reducers
    // keep partials built from the OLD salting while re-run reducers
    // read the NEW one, silently double- or zero-counting rows (the
    // SpatialOps.withRowKey scaladoc documents the same hazard class).
    // A content hash over every column is retry-stable; its one trade
    // is that byte-identical duplicate rows share a bucket, so a hot
    // key composed of EXACT duplicates does not split — acceptable for
    // a skew-mitigation helper (distinct fact rows are the norm; mass
    // identical rows are the exact-dedup path's job).
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted count — the common case. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame =
    saltedAggregate(df, keys, buckets,
      partials = Seq(count(lit(1)).as("__pc")),
      finals = Seq(sum(col("__pc")).as("n")))

  /** Salted sum of a numeric column. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int = 16): DataFrame =
    saltedAggregate(df, keys, buckets,
      partials = Seq(sum(col(valueCol)).as("__ps")),
      finals = Seq(sum(col("__ps")).as(s"sum_$valueCol")))
}
