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
  * Scale shape (r14): the corpus explodes ONCE into a per-document
  * bucket census `(doc, bucket, n)` — duplicate grams within a doc
  * collapse map-side, so the one wide exchange carries at most
  * docs × min(grams/doc, B) rows, a fraction of the gram stream — and
  * that frame is `CacheLifecycle.persist`ed because BOTH downstream
  * consumers read it: the corpus-wide bucket fit (a second, tiny
  * `groupBy(bucket)` whose exchange carries ≤ B rows per partition)
  * and the scoring rollup. Without the materialization Spark computes
  * the explode subtree once per consumer — the pre-r14 shape paid the
  * tokenize + md5 stream twice per execution, and it was the engine's
  * hottest per-rep recompute (x69's r13 driver flag). The B-row
  * log-likelihood-ratio table BROADCASTS into the scoring pass, whose
  * per-doc weight is now `Σ_bucket llr(bucket) · n` over the census —
  * same algebra, gram-instance loop replaced by a bucket loop. The
  * target fit streams the target corpus once; nothing gram-instance-
  * sized is shuffled or persisted. At 100 TB the per-doc census is the
  * natural materialization unit (it is what a curation run stores
  * anyway); MEMORY_AND_DISK spills it rather than recomputing, and the
  * raw fit can run on a hash sample of the corpus (bucket frequencies
  * saturate long before full coverage) without changing the scoring
  * contract — the LUT is the only coupling.
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

  /** Per-document bucket census `(idCol, [extra cols], bucket, __n)` —
    * the materialized middle of [[weights]]/[[weightsWithin]]: one
    * gram explosion, duplicate grams per doc collapsed into exact
    * integer counts (doubles for downstream float algebra; integers
    * are exact in IEEE double far past any real gram count, so the
    * bucket fit summing `__n` is bit-identical to counting instances).
    * Persisted via [[graft.CacheLifecycle]] — two consumers (fit +
    * scoring) read it, and the plan is canonicalization-stable (pure
    * built-in expressions), so a rebuilt invocation serves from the
    * same cache entry (PersistStabilitySpec's invariant).
    */
  private def docBucketCounts(
      src: DataFrame, idCol: String, textCol: String, hexChars: Int,
      extra: Seq[String]): DataFrame = {
    val keys = (idCol +: extra).map(col)
    graft.CacheLifecycle.persist(
      graft.Spread.ensure(src, col(idCol))
        .select(keys :+ explode(gramInstances(col(textCol))).as("__gram"): _*)
        .select(keys :+ bucketOf(col("__gram"), hexChars).as("bucket"): _*)
        .groupBy(keys :+ col("bucket"): _*)
        .agg(count(lit(1)).cast("double").as("__n")))
  }

  /** Shared scoring pass: broadcast the B-row LUT into the census and
    * roll up `Σ llr · n` per doc. Both public paths score through this
    * one shape, so their weights stay arithmetically identical on the
    * slice-of-corpus case (ExtOpsSpec pins it).
    */
  private def score(percell: DataFrame, lut: DataFrame, idCol: String): DataFrame =
    percell.join(broadcast(lut), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("llr") * col("__n")).as("weight"))

  /** Per-document importance weight of every `corpus` doc against the
    * `target` slice: (idCol, weight). Smoothing-constant arithmetic is
    * kept in the exact literal shape `(c+1)/(tot+B)` so an independent
    * reimplementation (the DuckDB oracle) folds the same doubles.
    */
  def weights(
      corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, hexChars: Int = 3): DataFrame = {
    val b = math.pow(16.0, hexChars)
    val percell = docBucketCounts(
      corpus.select(col(idCol), col(textCol)), idCol, textCol, hexChars, Nil)
    val raw = percell.groupBy("bucket").agg(sum(col("__n")).as("cr"))
    val tgt = fit(target, textCol, hexChars)
      .withColumnRenamed("c", "ct")
    // one-row totals, broadcast like Bm25's corpus stats — the cross
    // joins below are 4096×1, not corpus-sized (both 1×1 totals joins
    // carry the hint; AQE would save an unhinted one, but the hint
    // removes the dependence on stats being available at plan time)
    val tots = raw.agg(sum(col("cr")).as("rt"))
      .crossJoin(broadcast(tgt.agg(sum(col("ct")).as("tt"))))
    // target ⊆ corpus vocabulary need not hold (disjoint target
    // corpora are legal), so the LUT is a full outer over buckets;
    // persisted — it is the fitted model (see weightsWithin)
    val lut = graft.CacheLifecycle.persist(
      raw.join(tgt, Seq("bucket"), "full_outer")
        .crossJoin(broadcast(tots))
        .select(col("bucket"),
          (log((coalesce(col("ct"), lit(0.0)) + lit(1.0)) / (col("tt") + lit(b))) -
           log((coalesce(col("cr"), lit(0.0)) + lit(1.0)) / (col("rt") + lit(b))))
            .as("llr")))
    score(percell, lut, idCol)
  }

  /** [[weights]] specialized for the common deployment where the
    * target is a SLICE of the corpus (`targetCond`, e.g.
    * `lang = 'en'`): both bucket censuses come out of the ONE
    * persisted per-doc census — each bucket row carries a conditional
    * count — instead of a separate target fit pass over overlapping
    * data. Same counts, same smoothing-literal arithmetic, same
    * `Σ llr · n` scoring as the general path (ExtOpsSpec pins
    * equality to libm-ulp tolerance; the exact-bit guarantee of the
    * pre-r14 twin-explode shape died with the per-instance sum, whose
    * float addition order the grouped census does not reproduce). A
    * bucket with no target grams counts ct = 0 directly, which equals
    * the general path's `coalesce(null, 0)` for a bucket absent from
    * the target fit.
    */
  def weightsWithin(
      corpus: DataFrame, targetCond: Column,
      idCol: String, textCol: String, hexChars: Int = 3): DataFrame = {
    val b = math.pow(16.0, hexChars)
    // the target flag rides the census as a grouping key (constant per
    // doc, so the (id, bucket) cells and their counts are unchanged)
    val percell = docBucketCounts(
      corpus.select(col(idCol), col(textCol), targetCond.as("__t")),
      idCol, textCol, hexChars, Seq("__t"))
    val census = percell.groupBy("bucket")
      .agg(sum(col("__n")).as("cr"),
        sum(when(col("__t"), col("__n")).otherwise(lit(0.0))).as("ct"))
    val tots = census.agg(sum(col("cr")).as("rt"), sum(col("ct")).as("tt"))
    // the B-row LUT is the fitted model — persist it like the census
    // it derives from, so a re-execution pays only the scoring join,
    // not a fresh fit aggregation over the census
    val lut = graft.CacheLifecycle.persist(census.crossJoin(broadcast(tots))
      .select(col("bucket"),
        (log((col("ct") + lit(1.0)) / (col("tt") + lit(b))) -
         log((col("cr") + lit(1.0)) / (col("rt") + lit(b))))
          .as("llr")))
    score(percell.select(col(idCol), col("bucket"), col("__n")), lut, idCol)
  }
}
