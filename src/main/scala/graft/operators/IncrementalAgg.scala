package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view upkeep, the
  * lambda/kappa "merge" half): keep per-key MERGEABLE state
  * (count / decimal sum / min / max) as a table; fold each new batch
  * in by aggregating the batch to the same state shape and merging —
  * never re-scan the historical corpus.
  *
  * The algebra: count and sum merge by +, min/max by min/max — all
  * commutative monoids, so `merge(toState(A), toState(B)) ==
  * toState(A ∪ B)` EXACTLY when sums are decimal (double partial sums
  * would drift by association). The x65 oracle asserts precisely this
  * law: merged nightly state vs one full re-aggregation.
  *
  * Scale shape: the batch aggregates map-side to ≤ |keys| rows, the
  * merge is a union + groupBy over two state tables — cost bounded by
  * key cardinality, independent of corpus size. avg/stddev extend the
  * same way ((sum, count) / (n, Σx, Σx²)); sketches (HLL, KLL) are the
  * same pattern with mergeable binary state.
  */
object IncrementalAgg {

  /** Aggregate raw rows to mergeable state: `keys..., cnt, total
    * (decimal(18,2)), lo, hi`.
    */
  def toState(raw: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    raw.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).as("total"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))

  /** Merge two state tables (full outer on keys, monoid combine). */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).as("total"),
        min(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
}
