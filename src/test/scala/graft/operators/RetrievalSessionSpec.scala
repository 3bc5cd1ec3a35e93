package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TopKAgg

/** Known-answer correctness for the three operators wired in round 7:
  * BM25 scoring, the bounded top-k-per-group aggregate, and batch
  * sessionization. (Their plan shapes are pinned in PlanQualitySpec;
  * their sf-scale correctness rides the driver entries x39–x41.)
  */
class RetrievalSessionSpec extends SparkTestBase {

  import spark.implicits._

  // ---- BM25 -------------------------------------------------------------

  test("bm25 scores match a scalar reimplementation of the Okapi formula") {
    val docs = Seq(
      (1L, "a b a"),
      (2L, "a c"),
      (3L, "c c c d")).toDF("doc_id", "text")
    val got = Bm25.score(docs, "text", Seq("a", "d"))
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent scalar computation
    val n = 3.0; val avgdl = 3.0; val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def contrib(df: Double, tf: Double, dl: Double) =
      idf(df) * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def score(dl: Double, tfA: Double, tfD: Double) =
      contrib(2.0, tfA, dl) + contrib(1.0, tfD, dl)

    assert(math.abs(got(1L) - score(3, 2, 0)) < 1e-12, got)
    assert(math.abs(got(2L) - score(2, 1, 0)) < 1e-12, got)
    assert(math.abs(got(3L) - score(4, 0, 1)) < 1e-12, got)
    // doc with no query terms scores exactly 0, not null
    assert(got(2L) > 0 && score(4, 0, 0) == 0.0)
  }

  test("bm25 topK orders by rounded score desc with id tiebreak and keeps k rows") {
    // two identical docs force a rounded-score tie -> id ascending
    val docs = Seq(
      (10L, "x x y"), (7L, "x x y"), (3L, "y z"), (5L, "z z")).toDF("doc_id", "text")
    val rows = Bm25.topK(docs, "doc_id", "text", Seq("x"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 3)
    assert(rows(0)._1 == 7L && rows(1)._1 == 10L, rows.toSeq) // tie -> smaller id first
    assert(rows(0)._2 == rows(1)._2 && rows(2)._2 == 0.0, rows.toSeq)
  }

  test("bm25 rejects empty and non-lowercase query terms") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Bm25.score(docs, "text", Nil))
    intercept[IllegalArgumentException](Bm25.score(docs, "text", Seq("Spark")))
  }

  // ---- TopKAgg ----------------------------------------------------------

  test("top_k keeps the k best pairs, score desc with id asc tiebreak") {
    val df = Seq(
      ("A", 5.0, 10L), ("A", 5.0, 3L), ("A", 4.0, 1L), ("A", 6.0, 7L),
      ("B", 1.0, 2L)).toDF("g", "score", "id")
    val topk = TopKAgg.top_k(2)
    val got = df.groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(got("A") == Seq((6.0, 7L), (5.0, 3L)), got) // tie at 5.0 -> id 3 beats 10
    assert(got("B") == Seq((1.0, 2L)), got)
  }

  test("top_k trims correctly when the buffer cycles many trim rounds") {
    // k=1, trimAt=2 -> trim fires every other row; 1000 rows, best is id 999
    val df = (0L until 1000L).map(i => ("g", i.toDouble, i)).toDF("g", "score", "id")
    val topk = TopKAgg(k = 1, trimAt = 2)
    val got = df.groupBy("g")
      .agg(udaf(topk, org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(java.lang.Double, java.lang.Long)]())(
        col("score"), col("id")).as("top"))
      .as[(String, Seq[(Double, Long)])].collect().head._2
    assert(got == Seq((999.0, 999L)), got)
  }

  // ---- Sessionize -------------------------------------------------------

  private def eventsDf = Seq(
    // user 1: ties at t=0 (split decided by event_id tiebreak), then a
    // 1000s gap > 900 starts session 2
    (1L, "2024-01-01 00:00:00", 1L),
    (1L, "2024-01-01 00:00:00", 2L),
    (1L, "2024-01-01 00:01:40", 3L), // +100s, same session
    (1L, "2024-01-01 00:18:20", 4L), // +1000s -> new session
    (1L, "2024-01-01 00:19:10", 5L), // +50s, same session
    // user 2: single event
    (2L, "2024-01-01 09:00:00", 6L)
  ).toDF("user_id", "ts", "event_id")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("sessionize assigns session ordinals across gaps with deterministic ties") {
    val got = Sessionize.assign(eventsDf, "user_id", "ts", gapSeconds = 900,
        tieBreakCols = Seq("event_id"))
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 1L), got)
  }

  test("sessionize boundary: a gap of exactly gapSeconds does NOT split") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L),
      (1L, "2024-01-01 00:15:00", 2L), // exactly 900s -> same session
      (1L, "2024-01-01 00:30:01", 3L)  // 901s -> new session
    ).toDF("user_id", "ts", "event_id").withColumn("ts", col("ts").cast("timestamp"))
    val got = Sessionize.assign(df, "user_id", "ts", gapSeconds = 900)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L), got)
  }

  test("sessions rollup: bounds, counts, and extra aggregates per session") {
    val got = Sessionize.sessions(eventsDf, "user_id", "ts", gapSeconds = 900,
        tieBreakCols = Seq("event_id"),
        extraAggs = Seq(min(col("event_id")).as("first_event")))
      .orderBy("user_id", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val base = 1704067200000000L // 2024-01-01T00:00:00Z in epoch micros (UTC session)
    assert(got.toSeq == Seq(
      (1L, 1L, base, base + 100000000L, 3L, 1L),
      (1L, 2L, base + 1100000000L, base + 1150000000L, 2L, 4L),
      (2L, 1L, base + 32400000000L, base + 32400000000L, 1L, 6L)), got.toSeq)
  }
}
