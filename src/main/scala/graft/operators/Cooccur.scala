package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: frequent item pairs with
  * support and lift (the association-rule seed step of Agrawal &
  * Srikant's Apriori, VLDB 1994 — one level, which is what corpus
  * curation actually uses: "which sources / tags / shards co-occur").
  *
  * Scale shape: the basket self-join is the dangerous part — a basket
  * of k items emits k² candidate pairs, and item frequency is Zipfian.
  * Two guards keep it bounded at 100 TB:
  *   1. Apriori pruning BEFORE the self-join: a pair can only reach
  *      `minSupport` if BOTH items individually do, so baskets are
  *      first semi-joined against the frequent-item set — on real
  *      corpora this drops the long tail (most items) before any
  *      pair is materialized.
  *   2. The self-join key is the basket id, so fanout is bounded by
  *      (frequent items per basket)², not by item popularity; hub
  *      ITEMS never meet each other outside a shared basket.
  * The pair count itself is a map-side partial aggregate.
  */
object Cooccur {

  /** Frequent item pairs. `df` is exploded basket-item rows; output
    * `pa < pb`, `support` (co-occurrence count), and `lift` rounded to
    * `digits` (lift = support · N / (n_a · n_b), N = basket count).
    */
  def frequentPairs(
      df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, digits: Int = 6): DataFrame = {
    val items = graft.CacheLifecycle.persist(
      df.select(col(basketCol).as("ok"), col(itemCol).as("item")).distinct())
    val freq = items.groupBy("item")
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minSupport)
    val nBaskets = items.agg(countDistinct(col("ok")).cast("double").as("nb"))

    val pruned = items.join(freq, Seq("item"), "left_semi")
    val a = pruned.select(col("ok"), col("item").as("pa"))
    val b = pruned.select(col("ok"), col("item").as("pb"))
    val pairs = a.join(b, "ok").where(col("pa") < col("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)

    pairs
      .join(freq.select(col("item").as("pa"), col("n").as("na")), "pa")
      .join(freq.select(col("item").as("pb"), col("n").as("nb2")), "pb")
      .crossJoin(broadcast(nBaskets))
      .select(col("pa"), col("pb"),
        col("support").cast("bigint").as("support"),
        round(col("support").cast("double") * col("nb") /
          (col("na").cast("double") * col("nb2").cast("double")), digits).as("lift"))
  }
}
