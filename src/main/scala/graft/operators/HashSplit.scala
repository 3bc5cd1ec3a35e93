package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based dataset splitting (train/val/test) — the
  * standard stable-split of training pipelines: each row's split is a
  * pure function of its id, so growing the corpus never reshuffles
  * existing assignments (the property random `sample()` lacks), and
  * re-runs are reproducible with no seed plumbing.
  *
  * Mechanism: compare `md5(id)` against fixed 32-hex-digit threshold
  * strings — md5 is uniform over the 128-bit space, so the hex-string
  * order statistics give each split its fraction to within 2⁻¹²⁸.
  * String comparison (not hex-parse-then-mod) keeps the predicate in
  * the portable Spark∩DuckDB SQL intersection AND in whole-stage
  * codegen: the whole assignment is one codegen'd CASE over a scan,
  * row-local, shuffle-free at any corpus size.
  */
object HashSplit {

  /** 32-hex-digit lower-bound string for cumulative fraction `f`:
    * `floor(f · 16³²)` zero-padded — `md5(id) < hexThreshold(f)`
    * selects the first `f` of the id space.
    */
  def hexThreshold(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1], got $f")
    val scale = BigInt(1) << 128
    // java.math.BigDecimal: unlimited precision (scala.math.BigDecimal
    // defaults to DECIMAL128 and silently rounds the 39-digit product)
    val t = BigInt(new java.math.BigDecimal(f)
      .multiply(new java.math.BigDecimal(scale.bigInteger)).toBigInteger)
    val clamped = if (t >= scale) scale - 1 else t
    val h = clamped.toString(16)
    ("0" * (32 - h.length)) + h
  }

  val defaultSplits: Seq[(String, Double)] =
    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  /** The exact upper-bound hex strings `assign` compares against, one
    * per split except the last (which takes the remainder). Exposed so
    * an external twin (the DuckDB oracle) can embed the IDENTICAL
    * constants — cumulative weights are summed in floating point, so
    * recomputing "the same" boundary from a literal (0.9 + 0.05 vs
    * 0.95) can differ in the last hex digits.
    */
  def armThresholds(splits: Seq[(String, Double)] = defaultSplits): Seq[String] = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    val total = splits.map(_._2).sum
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(c => hexThreshold(c / total))
  }

  /** Append `splitCol` assigning each row to a named split with the
    * given weights (normalized; e.g. train 0.9 / val 0.05 / test 0.05).
    * Assignment is a pure function of `idCol` — stable under corpus
    * growth, identical across runs and engines.
    */
  def assign(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)] = defaultSplits,
      splitCol: String = "split"): DataFrame = {
    val key = md5(col(idCol).cast("string"))
    // chained when: thresholds ascend, so first match wins
    val arms = splits.init.map(_._1).zip(armThresholds(splits))
    val chain = arms.foldLeft(Option.empty[Column]) {
      case (acc, (name, thresh)) =>
        val cond = key < lit(thresh)
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }
    df.withColumn(splitCol,
      chain.fold(lit(splits.last._1))(_.otherwise(splits.last._1)))
  }

  /** Leakage-safe split: assign by the row's near-dup CLUSTER, not the
    * row — if two near-duplicate documents land in train and test, the
    * eval split is contaminated by construction (the held-out document
    * was effectively trained on). `components` is an (id, component)
    * map, e.g. from [[Dedup.connectedComponents]] over verified
    * near-dup edges; rows absent from it are singletons and split by
    * their own id. The assignment stays a pure row-local function of
    * the cluster representative (same md5-threshold CASE as [[assign]],
    * no window, no global sort).
    *
    * The components join carries NO broadcast hint: `components` has
    * one row per document that appears in ANY near-dup cluster, and on
    * a boilerplate-heavy corpus that is a double-digit fraction of all
    * documents — corpus-proportional, past any broadcast budget at
    * 100 TB. A hard-coded hint forces a driver collect regardless (AQE
    * cannot demote a hint). Left size-adaptive, the static estimator /
    * AQE broadcast the typical small-cluster-map case and fall back to
    * a shuffle join on `idCol` when the map is corpus-sized
    * (PlanQualitySpec pins the small-side broadcast).
    */
  def leakageSafeAssign(
      df: DataFrame, idCol: String, components: DataFrame,
      splits: Seq[(String, Double)] = defaultSplits,
      splitCol: String = "split"): DataFrame = {
    val comp = components
      .select(col("id").as(idCol), col("component").as("__comp"))
    val keyed = df.join(comp, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("__comp"), col(idCol)))
    assign(keyed, "__rep", splits, splitCol).drop("__comp", "__rep")
  }

  /** Efraimidis–Spirakis (2006) weighted-sampling key: the k rows with
    * the SMALLEST `-ln(u)/w` are a weighted sample without replacement
    * with inclusion probability proportional to weight. `u ∈ (0,1]` is
    * a deterministic uniform from the id's md5 (first 8 hex digits →
    * integer, +1 so u is never 0), so the sample is reproducible
    * across runs AND engines — the same derandomization contract as
    * [[assign]]/[[hexThreshold]], extended from uniform to
    * probability-proportional-to-size sampling (the curriculum-mix
    * primitive: sample documents ∝ token count).
    */
  def esKey(idCol: Column, weightCol: Column): Column = {
    val h = conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("double")
    -log((h + lit(1.0)) / lit(4294967297.0)) / weightCol.cast("double")
  }

  /** Top-`k` weighted sample per stratum (smallest ES key, id
    * tie-break), with the sample rank as `rn`. Per-stratum window sort
    * — strata are few and bounded (the x24/x30 volume contract);
    * the bounded-state alternative for huge strata is
    * [[graft.functions.TopKAgg]] over (esKey, id) pairs.
    */
  def weightedSample(
      df: DataFrame, stratumCol: String, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(esKey(col(idCol), col(weightCol)), col(idCol))
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }
}
