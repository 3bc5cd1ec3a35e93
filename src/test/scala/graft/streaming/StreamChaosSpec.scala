package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tools.StreamChaosProbe

/** Chaos-style robustness pins for the live streaming entries (r16
  * verdict task 3): every `$d`-reading streaming entry must survive a
  * deliberately hostile staged source — nulls in every column,
  * byte-identical AND conflicting duplicate event_ids, rows hours out
  * of order, a zero-row parquet part in the landing dir — with its
  * DOCUMENTED drop/dedup semantics, never an opaque encoder task death
  * (the pre-r17 state: x51/x53/x95/x99 died with
  * NOT_NULL_ASSERT_VIOLATION on the first null key field).
  *
  * Adjudicated semantics pinned here:
  *  - sessionize family (x51/x95/x99) + topk (x53): rows missing a
  *    required primitive key are DROPPED via
  *    [[StreamingTwins.typedEvents]]/[[StreamingTwins.typedScored]];
  *    a null GROUP (event_type) is a valid group and is KEPT;
  *  - windowed aggregates (x54/x93/x96): null event-time rows are
  *    dropped by Spark's window generator (batch keeps a NULL group —
  *    an inherent, documented batch/stream divergence on corrupt rows
  *    only); null grouping columns survive as NULL groups;
  *  - dedup (x71/x98): null event_ids collapse to ONE survivor
  *    (dropDuplicates null equality) — pre-filter null ids upstream if
  *    that loss matters;
  *  - attribution (x61/x90): null user/ts rows never match (SQL join
  *    null semantics); the outer variant's extra rows are exactly the
  *    null-purchase emissions.
  */
class StreamChaosSpec extends SparkTestBase {

  private lazy val dir = StreamChaosProbe.hostileDir(spark)
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("the probe's entry list tracks the real streaming surface (no drift)") {
    // StreamChaosProbe.entries is static; a future streaming entry
    // must join the chaos program or be explicitly excluded here
    val streaming = graft.SparkEntry.queries.keys
      .filter(graft.Bench.isStreaming).toSet - "x58_streaming_geofence" // own fixture, ignores $d
    assert(StreamChaosProbe.entries.toSet == streaming,
      s"probe-only: ${StreamChaosProbe.entries.toSet.diff(streaming)}; " +
        s"unprobed: ${streaming.diff(StreamChaosProbe.entries.toSet)}")
  }

  test("every $d-reading streaming entry survives the hostile source") {
    val outcomes = StreamChaosProbe.entries.map(n => StreamChaosProbe.run(spark, dir, n))
    val failed = outcomes.filter(_.error.isDefined)
    assert(failed.isEmpty, failed.map(o => s"${o.name}: ${o.error.get}").mkString("; "))
  }

  test("typed projections drop NOTHING on clean data (oracle identity)") {
    val clean = "/root/testdata/sf0.001"
    val raw = StreamingTwins.readEvents(spark, s"$clean/events.parquet")
    val sink = "chaos_clean_sink"
    spark.catalog.dropTempView(sink)
    val q = StreamingTwins.typedEvents(raw).toDF()
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table(sink).count() ==
      spark.read.parquet(s"$clean/events.parquet").count(),
      "na.drop in typedEvents must be a no-op on the clean corpus")
  }

  test("sessionize family drops null-key rows; sessions cover exactly the non-null users") {
    val users = run("x51_streaming_sessionize")
      .select("user_id").collect().map(_.getLong(0)).sorted
    assert(users.sameElements(Array(1L, 2L, 3L, 4L)),
      s"expected users 1..4 (null user/ts rows dropped), got ${users.mkString(",")}")
    // the TWS twin agrees row-for-row (same oracle, same drop policy)
    val a = run("x51_streaming_sessionize").collect().map(_.toString).sorted
    val b = run("x95_tws_sessionize").collect().map(_.toString).sorted
    assert(a.sameElements(b), "x51 and x95 must agree on hostile input")
  }

  test("streaming topk keeps the NULL group but never a null score or id") {
    val out = run("x53_streaming_topk").collect()
    assert(out.exists(_.isNullAt(0)), "null event_type is a valid group and must rank")
    assert(out.forall(r => !r.isNullAt(2) && !r.isNullAt(3)),
      "null score/id rows must be dropped, not ranked")
  }

  test("windowed aggregates drop null event-time rows, keep NULL grouping columns") {
    val hourly = run("x54_streaming_hourly").collect()
    assert(hourly.forall(!_.isNullAt(0)), "no NULL window may reach the sink")
    assert(hourly.exists(_.isNullAt(1)), "null event_type must survive as a group")
    // counts equal the batch aggregate restricted to non-null ts
    // (window start cast to string IN SPARK on both sides — the JVM
    // toString of LocalDateTime vs java.sql.Timestamp differ)
    val batch = graft.Tables.events(spark, dir).filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).cast("string").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), Option(r.get(1)).orNull, r.getLong(2))).toSet
    val stream = run("x54_streaming_hourly")
      .select(col("w").cast("string"), col("event_type"), col("n")).collect()
      .map(r => (r.getString(0), Option(r.get(1)).orNull, r.getLong(2))).toSet
    assert(stream == batch, s"stream/batch divergence beyond the null-ts drop: " +
      s"stream-only=${stream.diff(batch)}, batch-only=${batch.diff(stream)}")
  }

  test("streaming dedup collapses duplicate AND null event_ids to single survivors") {
    Seq("x71_streaming_dedup", "x98_streaming_dedup_within_wm").foreach { n =>
      val total = run(n).agg(sum(col("n"))).collect()(0).getLong(0)
      // distinct counts every null id as one key — dropDuplicates' null
      // equality collapses them the same way
      val distinctIds = graft.Tables.events(spark, dir)
        .select("event_id").distinct().count()
      assert(total == distinctIds,
        s"$n: expected $distinctIds surviving events, got $total")
    }
  }

  test("outer attribution's extra rows are exactly the null-purchase emissions") {
    val inner = run("x61_streaming_attribution").collect().map(_.toString).toSet
    val outer = run("x90_streaming_attribution_outer").collect()
    val matched = outer.filter(!_.isNullAt(1)).map(_.toString).toSet
    assert(matched == inner, "outer's matched rows must equal the inner join")
    assert(outer.exists(_.isNullAt(1)), "unmatched clicks must emit null-purchase rows")
    // no match may involve a null user (SQL join null semantics)
    assert(outer.forall(r => !r.isNullAt(2) || r.isNullAt(1)),
      "a null-user row must never appear as a MATCH")
  }
}
