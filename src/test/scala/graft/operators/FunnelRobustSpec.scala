package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Funnel ordering semantics + MAD outliers + leakage-safe split. */
class FunnelRobustSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("funnel: stage counts respect event order, not mere presence") {
    // u1: view(1) click(2) purchase(3)  -> depth 3
    // u2: click(1) view(2)              -> depth 1 (click BEFORE view doesn't count)
    // u3: purchase(1) view(2) click(3)  -> depth 2 (early purchase doesn't count)
    // u4: error(1)                      -> depth 0 (no funnel stage at all)
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(1), "purchase"), (3L, ts(2), "view"), (3L, ts(3), "click"),
      (4L, ts(1), "error")
    ).toDF("user_id", "ts", "event_type")
    val out = Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
    assert(out.map(r => (r.getAs[String]("stage_name"), r.getAs[Long]("users"))).toSeq ==
      Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
  }

  test("funnel: a NULL-time event is dropped, never epoch-0 progression") {
    // the (Int, Long) udaf input encoder silently folds a NULL
    // unix_micros to 0 — pre-r17, a null-ts stage-0 row placed the
    // event at epoch 0 and FABRICATED funnel progression for the user
    val ev = Seq(
      (1L, None: Option[Timestamp], "view"),  // corrupt: no event time
      (1L, Some(ts(2)), "click"),
      (2L, Some(ts(1)), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .orderBy("stage").collect()
      .map(r => (r.getAs[String]("stage_name"), r.getAs[Long]("users"))).toSeq
    // user 1's view vanished with its null time: no progression to click
    assert(out == Seq(("view", 1L), ("click", 0L)), out.toString)
  }

  test("funnel: same-timestamp stage transition counts (ts >= bound)") {
    val ev = Seq((1L, ts(5), "view"), (1L, ts(5), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click")).orderBy("stage").collect()
    assert(out.map(_.getAs[Long]("users")).toSeq == Seq(1L, 1L))
  }

  test("funnel: greedy takes the earliest qualifying stage time") {
    // view(10); clicks at 5 (too early) and 20; purchase at 15 — the
    // qualifying click is 20, so purchase(15) must NOT count.
    val ev = Seq(
      (1L, ts(10), "view"), (1L, ts(5), "click"), (1L, ts(20), "click"),
      (1L, ts(15), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")).orderBy("stage").collect()
    // unreached stages still get a row (users = 0), so the oracle's
    // explicit zero counts can't mismatch
    assert(out.map(_.getAs[Long]("users")).toSeq == Seq(1L, 1L, 0L))
  }

  test("funnel: depth independent of partitioning") {
    val ev = (1 to 200).map { i =>
      (i.toLong % 7, ts(i), if (i % 3 == 0) "view" else if (i % 3 == 1) "click" else "purchase")
    }.toDF("user_id", "ts", "event_type")
    def counts(parts: Int) =
      Sessionize.funnel(ev.repartition(parts), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("stage").collect().map(_.getAs[Long]("users")).toSeq
    assert(counts(1) == counts(16))
  }

  test("madOutliers: plants and finds the planted outlier only") {
    val base = (1 to 99).map(i => ("g", 100.0 + (i % 5)))
    val df = (base :+ (("g", 10000.0))).toDF("g", "v")
    val r = TableStats.madOutliers(df, Seq("g"), "v").collect()(0)
    assert(r.getAs[Long]("n_outliers") == 1L && r.getAs[Long]("n") == 100L)
  }

  test("madOutliers: zero-MAD group yields null scores, zero outliers") {
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 99.0)).toDF("g", "v")
    // median 5, deviations (0,0,0,94), MAD 0 -> all scores null
    val r = TableStats.madOutliers(df, Seq("g"), "v").collect()(0)
    assert(r.getAs[Long]("n_outliers") == 0L && r.getAs[Long]("n") == 4L)
  }

  test("leakageSafeAssign: every cluster lands in exactly one split") {
    val docs = spark.range(500).select(col("id").as("doc_id"))
    // clusters: {0..9} -> comp 0, {100..104} -> comp 100
    val comps = ((0L to 9L).map(i => (i, 0L)) ++ (100L to 104L).map(i => (i, 100L)))
      .toDF("id", "component")
    val out = HashSplit.leakageSafeAssign(docs, "doc_id", comps)
    val bySplit = out.join(comps.withColumnRenamed("id", "doc_id"), "doc_id")
      .groupBy("component").agg(countDistinct("split").as("nsplits"))
      .collect()
    assert(bySplit.forall(_.getAs[Long]("nsplits") == 1L))
    // singletons still split by own id: all three splits non-empty at n=500
    val splits = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > 400L)
  }

  test("leakageSafeAssign: cluster members get the representative's split") {
    val docs = spark.range(200).select(col("id").as("doc_id"))
    val comps = (10L to 60L).map(i => (i, 10L)).toDF("id", "component")
    val out = HashSplit.leakageSafeAssign(docs, "doc_id", comps)
    val repSplit = HashSplit.assign(
      spark.range(200).select(col("id").as("doc_id")).where(col("doc_id") === 10L),
      "doc_id").collect()(0).getAs[String]("split")
    val memberSplits = out.where(col("doc_id").between(10, 60))
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(memberSplits == Seq(repSplit))
  }
}
