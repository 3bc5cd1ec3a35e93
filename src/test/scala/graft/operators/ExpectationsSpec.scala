package graft.operators

import graft.SparkTestBase
import graft.operators.Expectations.Expectation
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, None, -5.0), (3L, Some("a"), 0.0))
    .toDF("id", "tag", "v")

  test("metrics and pass flags over a fixture with nulls, dupes, and a bound violation") {
    val out = Expectations.run(df, Seq(
        Expectation("complete_tag", Expectations.completeness("tag"), 1.0, 1.0),
        Expectation("min_v", min(col("v")), 0.0, 1e9),
        Expectation("rows", count(lit(1)), 1.0, 1e12),
        Expectation("unique_id", Expectations.uniqueness("id"), 1.0, 1.0)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out("complete_tag") == (0.75, false))
    assert(out("min_v") == (-5.0, false))
    assert(out("rows") == (4.0, true))
    assert(out("unique_id") == (0.75, false))
  }

  test("patternRatio counts only anchored regex matches among non-nulls") {
    val out = Expectations.run(df, Seq(
        Expectation("tag_pat", Expectations.patternRatio("tag", "^a$"), 1.0, 1.0)))
      .collect()(0)
    // 3 non-null tags, 2 of them 'a'
    assert(out.getDouble(1) == 2.0 / 3.0)
    assert(!out.getBoolean(2))
  }

  test("a NULL metric fails the check instead of passing as NULL") {
    val out = Expectations.run(df.where(col("v") > 1e9), Seq(
        Expectation("min_v", min(col("v")), 0.0, 1e9)))
      .collect()(0)
    assert(out.isNullAt(1)) // metric itself is null (no rows)
    assert(!out.getBoolean(2)) // but passed is FALSE, not null
  }

  test("the whole suite evaluates in a single pass over the source") {
    val plan = Expectations.run(df, Seq(
        Expectation("complete_tag", Expectations.completeness("tag"), 1.0, 1.0),
        Expectation("min_v", min(col("v")), 0.0, 1e9),
        Expectation("rows", count(lit(1)), 1.0, 1e12)))
      .queryExecution.optimizedPlan
    val scans = plan.collectLeaves()
    assert(scans.size == 1, s"expected one source scan, got ${scans.size}:\n$plan")
  }
}
