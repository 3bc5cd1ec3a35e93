package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column row/null/distinct counts
  * and min/max — the stats pass every lake ingest runs before anything
  * else (partition sizing, skew detection, dictionary decisions).
  *
  * Shape: ONE distributed aggregation computes every metric for every
  * requested column in a single scan (the multi-distinct rewrite
  * EXPANDS rows, it never rescans the source; partial aggregation
  * still collapses map-side), then the single result row is unpivoted
  * with `stack` — no per-column jobs, no second scan. min/max surface
  * as strings so one schema covers heterogeneous column types.
  *
  * `n_distinct` is EXACT `count(distinct)` — chosen so the DuckDB
  * oracle can verify it bit-for-bit. At 100 TB swap in
  * `approx_count_distinct` (HLL, no extra exchange) via
  * `exact = false`; the rest of the plan is unchanged.
  */
object TableStats {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val nd =
        if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__nn"),
        nd.as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // quoted literal + backticked identifiers: ingested column names
    // routinely carry spaces/dots/quotes, and bare splicing into
    // selectExpr is a ParseException (or worse) on the first such name
    import graft.functions.SqlBuilders.{quoteId, sqlLit}
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"${sqlLit(c)}, ${quoteId(c + "__nn")}, ${quoteId(c + "__nd")}, " +
        s"${quoteId(c + "__min")}, ${quoteId(c + "__max")}").mkString(", ") +
      ") AS (column, non_null, n_distinct, min_v, max_v)"
    one.selectExpr("__n AS n_rows", stackExpr)
      .select(col("column"), col("n_rows"), col("non_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
  }

  /** Per-group z-score standardization of a metric column (feature
    * normalization before mixing heterogeneous sources). Deliberately
    * a two-phase aggregate + equi-join back, NOT a window function: an
    * `avg/stddev OVER (PARTITION BY key)` forces a full sort of every
    * partition, while the agg+join shape is two hash exchanges with
    * map-side partials and — because the group-stats side is tiny
    * (one row per group) — the join back broadcasts. Population
    * stddev (σₙ, not the n−1 sample variant) so singleton groups get
    * σ=0 → NULL z rather than a division blow-up.
    * Output: input columns + `z` rounded to `digits`.
    */
  def zscore(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      digits: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "zscore needs at least one key column")
    // no broadcast() hint: the stats frame is one row PER GROUP, so a
    // high-cardinality key makes it corpus-proportional — a forced
    // broadcast would override AQE and OOM the driver (the
    // leakageSafeAssign rule). AQE still broadcasts the tiny-group case
    // from runtime sizes.
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(avg(col(valueCol)).as("__mu"), stddev_pop(col(valueCol)).as("__sd"))
    df.join(stats, keyCols)
      .withColumn("z",
        round((col(valueCol) - col("__mu")) /
          when(col("__sd") === 0.0, lit(null)).otherwise(col("__sd")), digits))
      .drop("__mu", "__sd")
  }

  /** Per-group robust outlier census via the modified z-score
    * (Iglewicz & Hoaglin 1993): flag rows with
    * `0.6745·|x − median| / MAD > cut`. Median/MAD instead of mean/σ
    * because outliers poison the very statistics [[zscore]] would
    * flag them with — on heavy-tailed metric columns (bytes fetched,
    * latency, spend) the mean chases the tail and hides it.
    *
    * Scale shape: two group aggregates (median, then MAD of the
    * deviations) each collapse to one row per group and join back —
    * two scans of the source, zero windows; AQE broadcasts the
    * group-stats side when it is actually small.
    * Exact `percentile` keeps the oracle bit-checkable; at 100 TB swap
    * `percentile_approx` into the same plan. The score is rounded to
    * 6dp before the cut comparison so the last double ulp of the two
    * engines' interpolation arithmetic cannot flip a boundary row.
    * Output: one row per group — `n_outliers`, `n`.
    */
  def madOutliers(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      cut: Double = 3.5): DataFrame = {
    require(keyCols.nonEmpty, "madOutliers needs at least one key column")
    val ks = keyCols.map(col)
    // backticked identifier (names with spaces/quotes) and no forced
    // broadcast (one row PER GROUP is corpus-proportional under a
    // high-cardinality key — let AQE size the join; see zscore)
    val med = df.groupBy(ks: _*)
      .agg(expr(s"percentile(${graft.functions.SqlBuilders.quoteId(valueCol)}, 0.5)")
        .as("__med"))
    // persisted: dev feeds BOTH the MAD aggregate and the final join,
    // and Catalyst does not dedupe self-referenced subtrees (the
    // minhashCandidates rule) — unpersisted, the source scan and the
    // median join execute twice, breaking the documented two-scan
    // shape. Released by the standard CacheLifecycle sweep.
    val dev = graft.CacheLifecycle.persist(df.join(med, keyCols)
      .withColumn("__ad", abs(col(valueCol) - col("__med"))))
    val mad = dev.groupBy(ks: _*)
      .agg(expr("percentile(__ad, 0.5)").as("__mad"))
    dev.join(mad, keyCols)
      .withColumn("__score",
        round(lit(0.6745) * col("__ad") /
          when(col("__mad") === 0.0, lit(null)).otherwise(col("__mad")), 6))
      .groupBy(ks: _*)
      .agg(
        count(when(col("__score") > cut, 1)).cast("bigint").as("n_outliers"),
        count(lit(1)).cast("bigint").as("n"))
  }

  /** Equi-width histogram of a numeric column: `bins` buckets spanning
    * [min, max], the max value folded into the last bucket. Two
    * passes: a one-row min/max aggregate broadcast to every task, then
    * one binning scan with map-side partial counts — the distribution
    * profile an ANALYZE pass adds next to [[profile]]'s scalar stats.
    * Bin arithmetic is the same double expression on both engines
    * ((v-lo)/((hi-lo)/bins), floored to integer), so bucket edges
    * agree bit-for-bit.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val stats = df.agg(
      min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"))
    df.crossJoin(broadcast(stats))
      .select(least(
          floor((col(valueCol).cast("double") - col("lo")) /
            ((col("hi") - col("lo")) / lit(bins.toDouble))),
          lit((bins - 1).toLong)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }
}
