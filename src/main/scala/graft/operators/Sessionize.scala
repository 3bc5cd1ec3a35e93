package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream table — the batch
  * face of the streaming `StreamingTwins.sessionize` (SURVEY §2.11):
  * a session breaks when the gap to the user's previous event exceeds
  * `gapSeconds`.
  *
  * Scale shape: sessionization is inherently order-dependent per user
  * (a prefix scan over each user's timeline), so the minimum possible
  * plan is ONE shuffle on the user key plus a per-partition sort —
  * which is what the window specs below plan to: Spark extracts the
  * nested `lag` into its own Window node, so the plan has TWO
  * `WindowExec` operators, but they share the single exchange and
  * sort (pinned by `PlanQualitySpec`). No partial aggregation exists
  * for prefix scans, and windows get no AQE skew split, so a
  * pathological single user with billions of events funnels to one
  * task — per-user volume is the operator's documented scale bound
  * (Spark's external sort spills, so the task completes; it is late,
  * not dead). The unbounded-user path is the streaming twin, whose
  * per-user state is O(1) and watermark-aged.
  *
  * Downstream rollups by (user, session) reuse the window's hash(user)
  * partitioning — `hash(user)` clusters every (user, session) pair, so
  * `EnsureRequirements` inserts no second exchange.
  */
object Sessionize {

  /** Add a per-user session ordinal (1-based) in event-time order.
    * `tieBreakCols` make the order total when timestamps collide
    * (without a total order, "previous event" — and therefore the
    * session split — would be nondeterministic under shuffle).
    */
  def assign(
      df: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long,
      tieBreakCols: Seq[String] = Nil,
      sessionCol: String = "session_seq"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val order = (col(tsCol) +: tieBreakCols.map(col)).toIndexedSeq
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || us(col(tsCol)) - us(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: session bounds (epoch µs), event count, and
    * any caller aggregates. One job: assign + rollup share the single
    * user-key exchange (see object doc).
    */
  def sessions(
      df: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long,
      tieBreakCols: Seq[String] = Nil,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val aggs = Seq(
      us(min(col(tsCol))).as("start_us"),
      us(max(col(tsCol))).as("end_us"),
      count(lit(1)).as("n_events")) ++ extraAggs
    assign(df, userCol, tsCol, gapSeconds, tieBreakCols)
      .groupBy(col(userCol), col("session_seq"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
