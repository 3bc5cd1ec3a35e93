package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Product-quantization invariants: determinism (the exactness the x47
  * golden relies on), code-range validity, and ranking sanity on
  * separable data. The cross-implementation check is the driver's x47
  * golden compare against tools/golden_ext.py.
  */
class SimilarityPqSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 16
  // two well-separated clusters around +5 and -5
  private def clustered = (0L until 64L).map { i =>
    val base = if (i % 2 == 0) 5.0f else -5.0f
    (i, Array.tabulate(dim)(d => base + 0.01f * ((i + d) % 7)))
  }.toDF("vec_id", "embedding")

  test("pq codes are within [0, k) and code length is m") {
    val model = Similarity.pqTrain(clustered, "vec_id", "embedding", dim,
      m = 4, k = 8, trainN = 64)
    val codes = Similarity.pqEncode(clustered, "vec_id", "embedding", model)
      .select("code").collect().map(_.getSeq[Int](0))
    assert(codes.forall(_.length == 4))
    assert(codes.forall(_.forall(c => c >= 0 && c < 8)))
  }

  test("pq training and encoding are deterministic across runs") {
    def run() = {
      val m = Similarity.pqTrain(clustered, "vec_id", "embedding", dim,
        m = 4, k = 8, trainN = 64)
      (m.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
        Similarity.pqEncode(clustered, "vec_id", "embedding", m)
          .orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq)
    }
    assert(run() == run())
  }

  test("adc ranks same-cluster vectors above the other cluster") {
    val model = Similarity.pqTrain(clustered, "vec_id", "embedding", dim,
      m = 4, k = 8, trainN = 64)
    val codes = Similarity.pqEncode(clustered, "vec_id", "embedding", model)
    val query = Array.fill(dim)(5.0f) // the + cluster
    val top = Similarity.pqTopK(codes, "vec_id", model, query, k = 10)
      .collect().map(_.getLong(0))
    assert(top.length == 10)
    assert(top.forall(_ % 2 == 0), s"odd (far-cluster) id in top-10: ${top.toSeq}")
  }

  test("pqTrain validates dimensions and sample size") {
    intercept[IllegalArgumentException](
      Similarity.pqTrain(clustered, "vec_id", "embedding", dim, m = 5))
    intercept[IllegalArgumentException](
      Similarity.pqTrain(clustered.limit(3), "vec_id", "embedding", dim, m = 4, k = 8))
  }
}
