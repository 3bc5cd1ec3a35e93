package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** GramAgg: one-pass covariance vs a naively computed reference, with
  * multi-partition partials forcing real merges.
  */
class GramAggSpec extends SparkTestBase {

  private val vecs: Seq[Seq[Float]] = Seq(
    Seq(1f, 2f, 3f),
    Seq(2f, 4f, 1f),
    Seq(0f, 1f, 5f),
    Seq(3f, 3f, 3f),
    Seq(-1f, 0f, 2f))

  /** Population covariance computed the obvious O(n·d²) way. */
  private def naive(i: Int, j: Int): Double = {
    val n = vecs.length.toDouble
    val mi = vecs.map(_(i)).sum / n
    val mj = vecs.map(_(j)).sum / n
    vecs.map(v => (v(i) - mi) * (v(j) - mj)).sum / n
  }

  test("covariance matches the naive computation across partitions") {
    import spark.implicits._
    val df = vecs.toDF("v").repartition(3) // force >1 map-side partial
    val cov = GramAgg.covariance(3, roundTo = 9)
    val got = df.agg(cov(col("v")).as("e"))
      .select(explode(col("e")).as("e"))
      .select(col("e._1").as("i"), col("e._2").as("j"), col("e._3").as("c"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    assert(got.size == 6) // upper triangle of 3x3
    for (i <- 0 until 3; j <- i until 3)
      assert(math.abs(got((i + 1, j + 1)) - naive(i, j)) < 1e-6,
        s"cov($i,$j): ${got((i + 1, j + 1))} vs ${naive(i, j)}")
  }

  test("dimension mismatch fails loudly") {
    import spark.implicits._
    val df = Seq(Seq(1f, 2f)).toDF("v")
    val cov = GramAgg.covariance(3)
    val e = intercept[Exception] {
      df.agg(cov(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("null vectors and null-ELEMENT vectors are excluded, not folded or fatal") {
    import spark.implicits._
    // Seq[Seq[java.lang.Float]] so the array can carry a null element
    val dirty: Seq[Seq[java.lang.Float]] = Seq(
      Seq[java.lang.Float](1f, 2f, 3f),
      Seq[java.lang.Float](2f, 4f, 1f),
      Seq[java.lang.Float](0f, 1f, 5f),
      Seq[java.lang.Float](0f, null, 5f),    // corrupt: null element, right length
      Seq[java.lang.Float](1f, null),        // corrupt: null element AND ragged —
                                             // must be excluded, not die in the
                                             // Array[Float] deserializer
      null,                                  // null vector
      Seq[java.lang.Float](3f, 3f, 3f),
      Seq[java.lang.Float](-1f, 0f, 2f))
    val df = dirty.toDF("v").repartition(2)
    val cov = GramAgg.covariance(3, roundTo = 9)
    val got = df.agg(cov(col("v")).as("e"))
      .select(explode(col("e")).as("e"))
      .select(col("e._1").as("i"), col("e._2").as("j"), col("e._3").as("c"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    // result must equal the clean-subset covariance (the class fixture)
    for (i <- 0 until 3; j <- i until 3)
      assert(math.abs(got((i + 1, j + 1)) - naive(i, j)) < 1e-6,
        s"cov($i,$j): ${got((i + 1, j + 1))} vs ${naive(i, j)}")
  }

  test("canary: covariance plans do NOT canonicalize equal (Spark MapObjects wart)") {
    // Known limitation, deliberately pinned: the array<float> INPUT
    // encoder deserializes through MapObjects, whose LambdaVariable ids
    // are freshly minted per query, so two builds of the same
    // covariance plan are never sameResult — unlike top_k/kmv/cms,
    // whose input encoders resolve lambda-free. Consequence (documented
    // on GramAgg.covariance): persist the one-row OUTPUT, never a frame
    // containing the raw aggregate. If a Spark upgrade makes this test
    // fail (plans start matching), delete it and add covariance to the
    // stable-kernel list alongside the TopKAggSpec assertions.
    import spark.implicits._
    val df = vecs.toDF("v")
    val p1 = df.agg(GramAgg.covariance(3)(col("v"))).queryExecution.optimizedPlan
    val p2 = df.agg(GramAgg.covariance(3)(col("v"))).queryExecution.optimizedPlan
    assert(!p1.sameResult(p2),
      "covariance plans now canonicalize equal — Spark fixed the " +
        "MapObjects lambda-id wart; promote covariance to the " +
        "stable-kernel guarantees")
  }

  test("plans as two-phase ObjectHashAggregate (map-side partials)") {
    import spark.implicits._
    val df = vecs.toDF("v").repartition(2)
    val cov = GramAgg.covariance(3)
    val plan = df.agg(cov(col("v"))).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
