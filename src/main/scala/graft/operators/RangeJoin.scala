package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join: pair each right row with every left row whose
  * `[lo, hi]` interval contains the right row's value. Spark plans the
  * raw inequality join as a BroadcastNestedLoopJoin — O(n·m); here the
  * interval side explodes into fixed-width buckets and the value side
  * hashes into exactly one, so the pairing becomes an equi shuffle
  * join on the bucket id plus the exact BETWEEN as residual — the same
  * decomposition as the spatial grid join, in one dimension. Each
  * right row lives in exactly one bucket, so pairs are exactly-once
  * with no distinct.
  *
  * Bucket width tunes replication: intervals spanning k buckets
  * replicate k times. Pick width ≈ the typical interval length.
  */
object RangeJoin {

  /** Derived-width memo (r21). [[autoBucketWidth]] is a driver-side
    * ACTION (an aggregation job over both inputs) that runs at
    * plan-construction time — before the memo, EVERY invocation of the
    * width-less overload re-paid that job for a value that is
    * deterministic per input (x27 measured ~0.2–0.3 s of its per-rep
    * wall in exactly this derivation). An in-plan variant (one-row
    * width aggregate broadcast into both sides) was MEASURED AND
    * REJECTED: the two crossJoin(broadcast(width)) subtrees did not
    * reuse one exchange, so the lens aggregation ran twice per action
    * (x27: 5 → 8 stages, 46 → 101 shuffle-KB, exec 0.36 → 0.72 s).
    * Keyed by the CANONICALIZED analyzed lens plan, so two builds of
    * the same derivation hit one entry (the r12 canonicalization-
    * stability rule is what makes this sound); evicted on
    * CacheLifecycle.release like every plan-handing memo.
    */
  private val widthMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), Double]

  graft.CacheLifecycle.onRelease { s =>
    // also reap entries owned by sessions stopped WITHOUT their own
    // release(): owner-eq eviction alone can never remove them, so they
    // strongly retain the dead SparkSession and its analyzed plans for
    // the JVM lifetime — the same hazard the lshLayout/semDedup caches
    // fixed with an isStopped sweep (r21 advisor)
    def dead(k: (org.apache.spark.sql.SparkSession, _)): Boolean =
      try k._1.sparkContext.isStopped catch { case _: Throwable => true }
    widthMemo.keys.filter(k => (k._1 eq s) || dead(k)).foreach(widthMemo.remove)
  }

  def bandJoin(
      intervals: DataFrame, loCol: String, hiCol: String,
      values: DataFrame, vCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lSel = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val rSel = values.withColumn("__bucket",
      floor(col(vCol) / bucketWidth).cast("long"))
    lSel.join(rSel, Seq("__bucket"))
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Median interval length across both inputs — the bucket width that
    * keeps per-interval replication ≈ 2 for the typical row. A width
    * chosen blind degenerates two ways: too narrow and every interval
    * explodes into span/width buckets (replication blow-up — the r2
    * x27 failure mode, where day-wide buckets under corpus-spanning
    * windows collapsed the decomposition toward all-pairs × #buckets);
    * too wide and all rows land in one bucket (no parallelism). The
    * data's own median is the right scale by construction. One cheap
    * aggregation pass; deterministic for a given input.
    */
  def autoBucketWidth(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String): Double = {
    val lens = a.select((col(aHi) - col(aLo)).cast("double").as("len"))
      .unionAll(b.select((col(bHi) - col(bLo)).cast("double").as("len")))
    widthMemo.getOrElseUpdate(
      (a.sparkSession, lens.queryExecution.analyzed.canonicalized), {
        val row = lens.agg(
          percentile_approx(col("len"), lit(0.5), lit(10000)).as("med"),
          max(col("len")).as("mx")).head()
        val med = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
        val mx = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
        // degenerate inputs: all point intervals (med = 0) still need a
        // positive width; any value gives replication 1 per row
        if (med > 0) med else if (mx > 0) mx else 1.0
      })
  }

  /** Interval-overlap join: pair every `[aLo, aHi]` with every
    * `[bLo, bHi]` that overlaps it — the 1-D analog of the spatial
    * grid join. BOTH sides explode into the buckets their interval
    * spans; a pair spanning k shared buckets surfaces k times, so only
    * the bucket containing `max(aLo, bLo)` (the overlap's left edge —
    * the 1-D reference point) emits it: exactly-once with no distinct.
    * Column names of the two inputs must be disjoint.
    *
    * Prefer the width-less overload unless profiling says otherwise:
    * it derives the width from the data ([[autoBucketWidth]]).
    */
  def intervalOverlapJoin(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String): DataFrame =
    intervalOverlapJoin(a, aLo, aHi, b, bLo, bHi,
      autoBucketWidth(a, aLo, aHi, b, bLo, bHi))

  def intervalOverlapJoin(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def tagged(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket",
        explode(sequence(
          floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    tagged(a, aLo, aHi).join(tagged(b, bLo, bHi), Seq("__bucket"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long") === col("__bucket"))
      .drop("__bucket")
  }
}
