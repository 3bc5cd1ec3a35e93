package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k-per-group aggregate: the k largest (score, id) pairs,
  * score descending with id ascending as the deterministic tiebreak.
  *
  * This is the skew-safe replacement for the `row_number() OVER
  * (PARTITION BY g ORDER BY s DESC) <= k` idiom: a window shuffles
  * EVERY row of a group to one task before ranking (no partial
  * aggregation, no AQE skew split — the same funnel `Dedup.exact`
  * eliminated), whereas a typed aggregate plans as two-phase
  * `ObjectHashAggregate`, so each map task pre-truncates every group
  * to k rows and the exchange carries at most k·tasks rows per group
  * no matter how hot the group key is. At 100 TB "top products per
  * category" shapes, that is the difference between a bounded shuffle
  * and a stalled task.
  *
  * The buffer appends and defers sorting until it reaches `trimAt`·k,
  * then sort-truncates to k — amortized O(n log k)-ish without a heap
  * allocation per row. A partial buffer serialized to the shuffle can
  * therefore hold up to `trimAt`·k − 1 pairs (the trim fires on the
  * reduce path, not at serialization time); lower `trimAt` to tighten
  * the shuffle-size bound at the cost of more frequent sorts.
  */
final case class TopKAgg(k: Int, trimAt: Int = 8)
    extends Aggregator[(java.lang.Double, java.lang.Long),
      ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // best-first: highest score, then smallest id
  private def ord: Ordering[(Double, Long)] =
    Ordering.by((p: (Double, Long)) => (-p._1, p._2))

  private def trim(b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (b.length > k) { b.sortInPlace()(ord); b.takeInPlace(k) }
    b
  }

  override def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  // boxed input so a NULL score or id skips the row (the SQL-aggregate
  // convention KmvAgg/CmsAgg already follow) instead of killing the
  // task with the primitive encoder's "Null value appeared in
  // non-nullable field" — at 100 TB one corrupt row must not fail the
  // pass
  override def reduce(
      b: ArrayBuffer[(Double, Long)],
      a: (java.lang.Double, java.lang.Long)): ArrayBuffer[(Double, Long)] = {
    if (a._1 == null || a._2 == null) return b
    b += ((a._1.doubleValue, a._2.longValue))
    if (b.length >= trimAt * k) trim(b) else b
  }

  override def merge(
      a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    trim(a ++= b)

  override def finish(b: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    trim(b).toSeq.sorted(ord)

  override def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  // one UDAF instance per k: repeated top_k(3) calls must hand Catalyst
  // the SAME function object, or two builds of "the same" plan are
  // never sameResult and a persisted frame containing the aggregate
  // can't serve later invocations (the r11/r12 canonicalization trap,
  // see the stable-kernel rule in StableKernelsSpec)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int,
      org.apache.spark.sql.expressions.UserDefinedFunction]()

  /** Column form: `df.groupBy(g).agg(top_k(3)($"score", $"id"))` →
    * `array<struct<_1: double, _2: bigint>>`, best-first. Explode with
    * `posexplode` for (rank, score, id) rows. Rows with a NULL score or
    * id are ignored (they never rank).
    */
  def top_k(k: Int): (Column, Column) => Column = {
    val f = cache.computeIfAbsent(k, kk =>
      udaf(TopKAgg(kk), ExpressionEncoder[(java.lang.Double, java.lang.Long)]()))
    (score, id) => f(score, id)
  }
}
