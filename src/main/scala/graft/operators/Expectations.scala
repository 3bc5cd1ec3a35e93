package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite (the Deequ/dbt-test
  * shape): each expectation names a scalar metric over the table and
  * the closed interval it must land in; the run reports one row per
  * expectation with the observed value and a pass flag.
  *
  * Scale contract: ALL metrics evaluate in a SINGLE aggregate pass —
  * one scan, one partial-agg/final-agg exchange — regardless of how
  * many expectations the suite declares. A naive per-check loop scans
  * the 100 TB table once per expectation; this compiles the suite into
  * one `agg(...)` so adding the 40th check is free. Distinct-count
  * metrics use Spark's expand-based distinct aggregate and share the
  * same pass. The one-row metric vector then unpivots driver-free via
  * `stack`.
  */
object Expectations {

  /** `metric` must be an aggregate Column producing a numeric scalar;
    * the expectation passes iff `lo <= metric <= hi`.
    */
  final case class Expectation(name: String, metric: Column, lo: Double, hi: Double)

  def completeness(c: String): Column =
    count(col(c)).cast("double") / count(lit(1)).cast("double")

  def uniqueness(c: String): Column =
    countDistinct(col(c)).cast("double") / count(col(c)).cast("double")

  /** Fraction of non-null values matching an anchored regex. */
  def patternRatio(c: String, regex: String): Column =
    sum(when(regexp_like(col(c), lit(regex)), 1L).otherwise(0L)).cast("double") /
      count(col(c)).cast("double")

  /** One row per expectation: `check_name`, `metric` (observed value),
    * `passed`. Row order follows the suite declaration; callers
    * wanting a total order sort by `check_name` (the column is not
    * named `check` — reserved in ANSI/DuckDB).
    */
  def run(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    require(suite.nonEmpty, "empty expectation suite")
    val agged = df.agg(
      suite.head.metric.cast("double").as("m0"),
      suite.tail.zipWithIndex.map { case (e, i) =>
        e.metric.cast("double").as(s"m${i + 1}")
      }: _*)
    val rows = suite.zipWithIndex.map { case (e, i) =>
      // NULL metric (empty table, all-null column) must FAIL the check,
      // not propagate NULL — a gate filtering on !passed would
      // otherwise sail past an unevaluable expectation
      struct(lit(e.name).as("check_name"), col(s"m$i").as("metric"),
        coalesce(col(s"m$i") >= e.lo && col(s"m$i") <= e.hi, lit(false))
          .as("passed"))
    }
    agged.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name").as("check_name"), col("r.metric").as("metric"),
        col("r.passed").as("passed"))
  }
}
