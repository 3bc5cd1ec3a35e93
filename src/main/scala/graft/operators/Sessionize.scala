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

  /** Ordered-funnel analysis: how many users reached stage i of a
    * named event sequence, where stage i counts only if it happens at
    * or after the user's qualifying stage i−1 time (the classic
    * view → click → purchase conversion funnel; an early purchase
    * before any view does NOT count).
    *
    * Per user the qualifying times are the greedy prefix minima:
    * t₀ = min ts of stage 0, tᵢ = min ts of stage i with ts ≥ tᵢ₋₁ —
    * greedy is optimal here (taking the earliest feasible time for a
    * stage can only enlarge the feasible set of every later stage), so
    * the per-user depth is well-defined.
    *
    * Scale shape: a typed aggregate, NOT an n-way self-join (n joins
    * re-shuffle the events table per stage) and NOT a window sort
    * (no partial aggregation). [[FunnelAgg]] buffers each user's
    * per-stage timestamps and resolves the greedy scan at finish —
    * two-phase `ObjectHashAggregate`, one shuffle of stage-relevant
    * events pre-reduced per map task; partial-buffer size is bounded
    * by the per-user activity volume, the same documented contract as
    * sessionization's window (object doc above).
    *
    * Output: `stage` (0-based), `stage_name`, `users` — users whose
    * funnel depth reaches that stage, so counts are non-increasing.
    */
  def funnel(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stage in $stages")
    val idx = stages.zipWithIndex.foldLeft(lit(-1)) { case (acc, (name, i)) =>
      when(col(typeCol) === name, lit(i)).otherwise(acc)
    }
    val agg = udaf(new FunnelAgg(stages.size),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Long)]())
    val depth = df
      // null-time rows must be DROPPED, not aggregated: the (Int, Long)
      // input encoder silently folds a NULL unix_micros to 0, placing
      // the event at epoch 0 — which COUNTS as (and can fabricate)
      // funnel progression (measured r17: a null-ts stage-0 row
      // advanced a user's depth). An event with no time cannot order
      // in a funnel — the typedEvents corrupt-row policy.
      .where(idx >= 0 && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(agg(idx, unix_micros(col(tsCol).cast("timestamp"))).as("depth"))
    // one-row conditional aggregate + stack, not a join against a stage
    // table: every stage row is always present (users = 0 when nobody
    // reaches it), and the per-user depths never leave the aggregate
    val aggs = stages.indices.map(i =>
      count(when(col("depth") > i, 1)).cast("bigint").as(s"__s$i"))
    val one = depth.agg(aggs.head, aggs.tail: _*)
    // sqlLit: a stage name containing a quote ("add'l view") must not
    // break — or inject into — the spliced selectExpr
    val stackExpr = s"stack(${stages.size}, " + stages.zipWithIndex
      .map { case (n, i) =>
        s"$i, ${graft.functions.SqlBuilders.sqlLit(n)}, __s$i" }.mkString(", ") +
      ") AS (stage, stage_name, users)"
    one.selectExpr(stackExpr)
  }
}

/** Per-user funnel state: timestamps seen per stage, sorted lazily at
  * [[finish]], where the greedy prefix-minima scan computes the depth
  * (number of stages reached, 0..nStages). See [[Sessionize.funnel]].
  */
final class FunnelAgg(nStages: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      (Int, Long),
      Array[scala.collection.mutable.ArrayBuffer[Long]],
      Int] {
  import scala.collection.mutable.ArrayBuffer

  override def zero: Array[ArrayBuffer[Long]] =
    Array.fill(nStages)(ArrayBuffer.empty[Long])

  override def reduce(
      b: Array[ArrayBuffer[Long]], a: (Int, Long)): Array[ArrayBuffer[Long]] = {
    b(a._1) += a._2
    b
  }

  override def merge(
      a: Array[ArrayBuffer[Long]], b: Array[ArrayBuffer[Long]]): Array[ArrayBuffer[Long]] = {
    var i = 0
    while (i < nStages) { a(i) ++= b(i); i += 1 }
    a
  }

  override def finish(b: Array[ArrayBuffer[Long]]): Int = {
    var bound = Long.MinValue
    var stage = 0
    while (stage < nStages) {
      // earliest event of this stage at/after the previous stage's time
      var best = Long.MaxValue
      for (t <- b(stage)) if (t >= bound && t < best) best = t
      if (best == Long.MaxValue) return stage
      bound = best
      stage += 1
    }
    nStages
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[ArrayBuffer[Long]]] =
    org.apache.spark.sql.Encoders.kryo[Array[ArrayBuffer[Long]]]
  override def outputEncoder: org.apache.spark.sql.Encoder[Int] =
    org.apache.spark.sql.Encoders.scalaInt
}
