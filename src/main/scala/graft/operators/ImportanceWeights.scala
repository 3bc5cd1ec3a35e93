package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weights for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" —
  * extension surface; the reference pipeline has no such operator).
  *
  * Feature space: a hashed bag of word uni+bigrams in B buckets. The
  * target distribution (a small high-quality corpus slice — "make the
  * web look like Wikipedia") and the raw distribution (the full
  * corpus) are each a B-bucket count vector with add-one smoothing;
  * a document's importance weight is the log-likelihood ratio of its
  * gram stream under the two:
  *
  *   w(doc) = Σ_gram [ ln p_target(bucket(gram)) − ln p_raw(bucket(gram)) ]
  *
  * High w = the doc's n-gram profile looks like the target. The
  * selection step ranks by w (the paper adds Gumbel noise for sampled
  * resampling; the deterministic rank is what a reproducible pipeline
  * gates on — noise is the caller's one extra column).
  *
  * Bucketing is `substr(md5(gram), 1, hexChars)` — bit-identical in
  * every engine (the same portability contract as [[HashSplit]]'s
  * md5-order sampling), string-keyed so no hex→int conversion is
  * needed, B = 16^hexChars.
  *
  * Scale shape: the two fits are two-phase `groupBy(bucket).count()`
  * over codegen'd gram streams — duplicate mass collapses map-side and
  * the exchange carries at most B rows per partition. The resulting
  * B-row log-likelihood-ratio table BROADCASTS into the scoring scan,
  * whose only wide exchange is the per-doc rollup on the unique doc id
  * (cannot skew). The raw corpus streams twice (fit + score), the
  * target once; nothing corpus-sized is shuffled or persisted. At
  * 100 TB the raw fit can run on a hash sample of the corpus (bucket
  * frequencies saturate long before full coverage) without changing
  * the scoring contract — the LUT is the only coupling.
  */
object ImportanceWeights {

  /** One uni/bigram instance per element (bag semantics — NOT
    * distinct; frequency is the signal here, unlike the dedup grams).
    * Bucketing happens AFTER the explode ([[bucketOf]]): an earlier
    * shape computed `substring(md5(g), 1, hexChars)` inside a
    * `transform` lambda, and higher-order-function lambdas run on the
    * interpreted eval path — md5 per gram instance outside whole-stage
    * codegen was the hottest interpreted loop in the engine (x69's
    * 20+ CPU-s, with JIT-state-dependent 2–3× sweep-to-sweep swings).
    * Exploding the raw grams first keeps the per-gram md5 in a
    * codegen'd projection.
    */
  def gramInstances(text: Column): Column =
    concat(TextAnalysis.tokens(text), TextAnalysis.rawTokenNgrams(text, 2))

  /** `substr(md5(gram), 1, hexChars)` as a plain (codegen'd) column
    * over an exploded gram — bit-identical buckets to the old
    * in-lambda form.
    */
  def bucketOf(gram: Column, hexChars: Int): Column =
    substring(md5(gram), 1, hexChars)

  /** Hashed-n-gram bucket census of a corpus: (bucket, c) with c the
    * number of gram INSTANCES hashing there. ≤ 16^hexChars rows.
    */
  def fit(df: DataFrame, textCol: String, hexChars: Int = 3): DataFrame =
    graft.Spread.ensure(df.select(col(textCol)))
      .select(explode(gramInstances(col(textCol))).as("__gram"))
      .select(bucketOf(col("__gram"), hexChars).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).cast("double").as("c"))

  /** Per-document importance weight of every `corpus` doc against the
    * `target` slice: (idCol, weight). Smoothing-constant arithmetic is
    * kept in the exact literal shape `(c+1)/(tot+B)` so an independent
    * reimplementation (the DuckDB oracle) folds the same doubles.
    */
  def weights(
      corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, hexChars: Int = 3): DataFrame = {
    val b = math.pow(16.0, hexChars)
    val raw = fit(corpus, textCol, hexChars)
      .withColumnRenamed("c", "cr")
    val tgt = fit(target, textCol, hexChars)
      .withColumnRenamed("c", "ct")
    // one-row totals, broadcast like Bm25's corpus stats — the cross
    // joins below are 4096×1, not corpus-sized (both 1×1 totals joins
    // carry the hint; AQE would save an unhinted one, but the hint
    // removes the dependence on stats being available at plan time)
    val tots = raw.agg(sum(col("cr")).as("rt"))
      .crossJoin(broadcast(tgt.agg(sum(col("ct")).as("tt"))))
    // target ⊆ corpus vocabulary need not hold (disjoint target
    // corpora are legal), so the LUT is a full outer over buckets
    val lut = raw.join(tgt, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(tots))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0.0)) + lit(1.0)) / (col("tt") + lit(b))) -
         log((coalesce(col("cr"), lit(0.0)) + lit(1.0)) / (col("rt") + lit(b))))
          .as("llr"))
    // keyed spread: the explode and broadcast join are row-local, so
    // the id clustering survives to the rollup — when the guard fires,
    // its exchange REPLACES the rollup's rather than adding one
    graft.Spread.ensure(corpus.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(gramInstances(col(textCol))).as("__gram"))
      .select(col(idCol), bucketOf(col("__gram"), hexChars).as("bucket"))
      .join(broadcast(lut), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("llr")).as("weight"))
  }

  /** [[weights]] specialized for the common deployment where the
    * target is a SLICE of the corpus (`targetCond`, e.g.
    * `lang = 'en'`): both bucket censuses come out of ONE gram
    * explosion — each census row carries a conditional count — instead
    * of two separate fit passes over overlapping data. Same counts,
    * same smoothing-literal arithmetic, bit-identical weights (x69
    * pins it against the two-pass oracle); one third of the explode
    * work at any scale. A bucket with no target grams counts ct = 0
    * directly, which equals the general path's
    * `coalesce(null, 0)` for a bucket absent from the target fit.
    */
  def weightsWithin(
      corpus: DataFrame, targetCond: Column,
      idCol: String, textCol: String, hexChars: Int = 3): DataFrame = {
    val b = math.pow(16.0, hexChars)
    val census = graft.Spread.ensure(
        corpus.select(col(textCol), targetCond.as("__t")))
      .select(col("__t"), explode(gramInstances(col(textCol))).as("__gram"))
      .select(col("__t"), bucketOf(col("__gram"), hexChars).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).cast("double").as("cr"),
        sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).cast("double").as("ct"))
    val tots = census.agg(sum(col("cr")).as("rt"), sum(col("ct")).as("tt"))
    val lut = census.crossJoin(broadcast(tots))
      .select(col("bucket"),
        (log((col("ct") + lit(1.0)) / (col("tt") + lit(b))) -
         log((col("cr") + lit(1.0)) / (col("rt") + lit(b))))
          .as("llr"))
    graft.Spread.ensure(corpus.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(gramInstances(col(textCol))).as("__gram"))
      .select(col(idCol), bucketOf(col("__gram"), hexChars).as("bucket"))
      .join(broadcast(lut), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("llr")).as("weight"))
  }
}
