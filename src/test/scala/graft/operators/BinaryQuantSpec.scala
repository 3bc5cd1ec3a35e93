package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.VectorFunctions.{sign_pack, vec_cosine}

/** Binary (1-bit/dim) quantization invariants: exact bit semantics of
  * the native `sign_pack` kernel, shortlist+rerank recall on separable
  * data, and the hard-negative miner's exclusion contract. The
  * cross-engine check is the driver's x86/x87 DuckDB compare.
  */
class BinaryQuantSpec extends SparkTestBase {

  import spark.implicits._

  test("sign_pack sets exactly the positive-component bits") {
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val expected = (0 until 64).foldLeft(0L) {
      case (b, i) => if (i % 3 == 0) b | (1L << i) else b
    }
    val got = Seq(Tuple1(v)).toDF("v")
      .select(sign_pack(col("v"))).head().getLong(0)
    assert(got == expected)
    // zero is NOT positive: a zero vector packs to 0L
    val z = Seq(Tuple1(Array.fill(64)(0.0f))).toDF("v")
      .select(sign_pack(col("v"))).head().getLong(0)
    assert(z == 0L)
  }

  test("sign_pack ignores dimensions past 64 and handles short vectors") {
    val long = Array.fill(80)(1.0f)
    val short = Array.fill(3)(1.0f)
    val df = Seq(Tuple1(long), Tuple1(short)).toDF("v")
      .select(sign_pack(col("v")).as("b"))
    val Array(a, b) = df.collect().map(_.getLong(0))
    assert(a == -1L)                  // all 64 bits set
    assert(b == 7L)                   // only the 3 present dims
  }

  // two well-separated clusters around +5 and -5 with small per-dim jitter
  private def clustered = (0L until 64L).map { i =>
    val base = if (i % 2 == 0) 5.0f else -5.0f
    (i, Array.tabulate(64)(d => base + 0.01f * ((i + d) % 7)))
  }.toDF("vec_id", "embedding")

  test("binaryTopK finds the query's cluster and reranks by float cosine") {
    val query = Array.fill(64)(5.0f)
    val top = Similarity.binaryTopK(clustered, "vec_id", "embedding", query, k = 10)
      .collect()
    assert(top.length == 10)
    // all shortlist survivors are from the + cluster (even ids)
    assert(top.forall(_.getLong(0) % 2 == 0), top.map(_.getLong(0)).toSeq)
    // rerank column is the true float cosine, descending
    val cos = top.map(_.getDouble(2))
    assert(cos.sameElements(cos.sortBy(-(_: Double))))
  }

  test("binaryTopK: null-vector rows never displace real candidates (NULLS LAST)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 60 null-embedding rows > k*shortlist = 40: under plain asc
    // (NULLS FIRST) the entire shortlist would be nulls and the top-k
    // would return no real neighbors
    val nullSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    val nulls = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1000L until 1060L).map(i => Row(i, null)), 2), nullSchema)
    val dirty = clustered.unionByName(nulls)
    val query = Array.fill(64)(5.0f)
    val top = Similarity.binaryTopK(dirty, "vec_id", "embedding", query, k = 10)
      .collect()
    assert(top.length == 10)
    assert(top.forall(_.getLong(0) < 1000L), top.map(_.getLong(0)).toSeq)
    assert(top.forall(!_.isNullAt(2)))
    // k exceeding the admissible-row count (r19, the pqTopK advisor
    // class): null rows must be FILTERED, not padded in from the
    // nulls-last tail — exactly the 64 clean rows come back
    val all = Similarity.binaryTopK(dirty, "vec_id", "embedding", query, k = 200)
      .collect()
    assert(all.length == 64, s"expected only clean rows, got ${all.length}")
    assert(all.forall(_.getLong(0) < 1000L))
  }

  test("hardNegatives excludes self and near-duplicates, ranks by cosine desc") {
    val anchors = clustered.filter(col("vec_id") < 2)
    val out = Similarity.hardNegatives(clustered, anchors,
      "vec_id", "embedding", k = 5, dupCutoff = 0.95).collect()
    assert(out.length == 10) // 2 anchors x 5
    assert(out.forall(r => r.getLong(2) != r.getLong(0)), "self in negatives")
    // every reported cosine is below the dup cutoff
    assert(out.forall(_.getDouble(3) < 0.95))
    // per-anchor ranks are 1..5 with non-increasing cosine
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 5L))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // the + cluster anchor's negatives all come from the - cluster:
    // same-cluster vectors sit above the 0.95 near-dup cutoff
    val posAnchor = out.filter(_.getLong(0) == 0L)
    assert(posAnchor.forall(_.getLong(2) % 2 == 1), posAnchor.map(_.getLong(2)).toSeq)
  }

  test("hardNegatives plans as broadcast join + two-phase ObjectHashAggregate") {
    val anchors = clustered.filter(col("vec_id") < 2)
    val plan = Similarity.hardNegatives(clustered, anchors,
      "vec_id", "embedding", k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    val first = plan.indexOf("ObjectHashAggregate")
    assert(first >= 0, plan)
    assert(plan.indexOf("ObjectHashAggregate", first + 1) >= 0,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
  }

  test("binaryTopK stage-1 plans as TakeOrderedAndProject (bounded shortlist)") {
    val plan = Similarity.binaryTopK(clustered, "vec_id", "embedding",
      Array.fill(64)(1.0f), k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("packed Hamming equals unpacked disagreement count") {
    val rows = clustered.select(col("vec_id"), col("embedding"),
        sign_pack(col("embedding")).as("packed"))
      .collect()
    val q = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val qbits = {
      var b = 0L
      q.zipWithIndex.foreach { case (x, i) => if (x > 0f) b |= (1L << i) }
      b
    }
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val naive = (0 until 64).count(i => (v(i) > 0f) != (q(i) > 0f))
      assert(java.lang.Long.bitCount(r.getLong(2) ^ qbits) == naive)
    }
  }
}
