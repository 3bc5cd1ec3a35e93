package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** TopKAgg: the bounded top-k-per-group aggregate — totality on nulls,
  * ranking semantics, and the canonicalization-stability contract every
  * parameterized function in this package must honor.
  */
class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("null score or id rows are ignored, not fatal") {
    // the primitive (Double, Long) encoder this aggregate once used
    // killed the whole task on a NULL — the window idiom it replaces
    // survives the same data, so at 100 TB one corrupt row must not
    // fail the pass
    val rows: Seq[(String, java.lang.Double, java.lang.Long)] = Seq(
      ("g1", 5.0, 10L), ("g1", null, 11L), ("g1", 3.0, null),
      ("g1", 7.0, 12L), ("g1", 1.0, 13L),
      ("g2", null, 20L), ("g2", 2.0, 21L))
    val df = rows.toDF("g", "score", "id").repartition(3)
    val got = df.groupBy($"g")
      .agg(TopKAgg.top_k(2)($"score", $"id").as("top"))
      .select($"g", $"top")
      .as[(String, Seq[(Double, Long)])]
      .collect().toMap
    assert(got("g1") == Seq((7.0, 12L), (5.0, 10L)))
    assert(got("g2") == Seq((2.0, 21L)))
  }

  test("ties break by smallest id; k truncates best-first") {
    val df = Seq(("g", 1.0, 5L), ("g", 1.0, 2L), ("g", 2.0, 9L), ("g", 1.0, 7L))
      .toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(TopKAgg.top_k(3)($"score", $"id").as("top"))
      .select($"top").as[Seq[(Double, Long)]].collect()(0)
    assert(got == Seq((2.0, 9L), (1.0, 2L), (1.0, 5L)))
  }

  test("repeated top_k invocations canonicalize equal (persisted frames can serve)") {
    val df = Seq(("g", 1.0, 1L)).toDF("g", "score", "id")
    val p1 = df.groupBy($"g").agg(TopKAgg.top_k(3)($"score", $"id"))
      .queryExecution.optimizedPlan
    val p2 = df.groupBy($"g").agg(TopKAgg.top_k(3)($"score", $"id"))
      .queryExecution.optimizedPlan
    assert(p1.sameResult(p2),
      "two builds of the same top_k plan are not sameResult — " +
        "the r11/r12 canonicalization trap is back")
  }

  test("sketch aggregates canonicalize equal across invocations too") {
    val df = Seq("a", "b").toDF("v")
    val k1 = df.agg(SketchAggs.kmv_min_k(16)(md5($"v"))).queryExecution.optimizedPlan
    val k2 = df.agg(SketchAggs.kmv_min_k(16)(md5($"v"))).queryExecution.optimizedPlan
    assert(k1.sameResult(k2), "kmv_min_k not canonicalization-stable")
    val c1 = df.agg(SketchAggs.cms_sketch(3, 64)($"v")).queryExecution.optimizedPlan
    val c2 = df.agg(SketchAggs.cms_sketch(3, 64)($"v")).queryExecution.optimizedPlan
    assert(c1.sameResult(c2), "cms_sketch not canonicalization-stable")
  }
}
