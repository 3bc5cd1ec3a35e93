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

  test("ivfpq: cells partition the data, probe filters rows, ranking respects clusters") {
    val model = Similarity.ivfPqTrain(clustered, "vec_id", "embedding", dim,
      nCells = 4, m = 4, k = 8, trainN = 64)
    val codes = Similarity.ivfPqEncode(clustered, "vec_id", "embedding", model)
    val cells = codes.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.forall(c => c >= 0 && c < 4), cells)
    assert(codes.count() == 64)

    val query = Array.fill(dim)(5.0f)
    val probed = Similarity.ivfPqProbeCells(model, query, nprobe = 1)
    assert(probed.length == 1)
    // probing 1 cell scans strictly fewer rows than the table
    val scanned = codes.filter(col("cell").isin(probed: _*)).count()
    assert(scanned < 64 && scanned > 0, scanned)

    val top = Similarity.ivfPqTopK(codes, "vec_id", model, query, k = 5, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(top.length == 5)
    assert(top.forall(_ % 2 == 0), s"far-cluster id in top-5: ${top.toSeq}")
  }

  test("ivfpq training and encoding are deterministic across runs") {
    def run() = {
      val m = Similarity.ivfPqTrain(clustered, "vec_id", "embedding", dim,
        nCells = 4, m = 4, k = 8, trainN = 64)
      Similarity.ivfPqEncode(clustered, "vec_id", "embedding", m)
        .orderBy("vec_id").collect()
        .map(r => (r.getInt(1), r.getSeq[Int](2))).toSeq
    }
    assert(run() == run())
  }

  test("adc_score functions are registered on the SQL surface") {
    val r = spark.sql(
      "SELECT adc_score(array(1, 0), array(array(9.0D, 2.0D), array(3.0D, 7.0D)))")
      .collect()(0).getDouble(0)
    assert(r == 2.0 + 3.0, r) // code(0)=1 -> 2.0 from row 0; code(1)=0 -> 3.0 from row 1
    val rc = spark.sql(
      "SELECT adc_score_cells(1, array(0), array(array(), array(array(5.0D))))")
      .collect()(0).getDouble(0)
    assert(rc == 5.0, rc)
  }

  test("adc_score / adc_score_cells reject out-of-range SQL inputs with clear errors") {
    def messageOf(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql).collect())
      Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).mkString(" | ")
    }
    // code value beyond the codeword table
    assert(messageOf(
      "SELECT adc_score(array(7), array(array(1.0D, 2.0D)))")
      .contains("outside [0, 2)"))
    // more subspaces than tables
    assert(messageOf(
      "SELECT adc_score(array(0, 0), array(array(1.0D)))")
      .contains("same PqModel"))
    // cell id beyond the table list
    assert(messageOf(
      "SELECT adc_score_cells(9, array(0), array(array(array(1.0D))))")
      .contains("outside [0, 1)"))
    // unprobed (empty) cell
    assert(messageOf(
      "SELECT adc_score_cells(0, array(0), array(array()))")
      .contains("not probed"))
  }

  test("pqTrain validates dimensions and sample size") {
    intercept[IllegalArgumentException](
      Similarity.pqTrain(clustered, "vec_id", "embedding", dim, m = 5))
    intercept[IllegalArgumentException](
      Similarity.pqTrain(clustered.limit(3), "vec_id", "embedding", dim, m = 4, k = 8))
  }

  test("training admits only FINITE vectors - a NaN embedding cannot poison the codebook") {
    // a NaN coordinate entering Lloyd accumulation turns centroid 0
    // all-NaN and the next iteration collapses EVERY point into it
    // (NaN distance comparisons are all false) - the codebook silently
    // degenerates. vec_is_finite admission must exclude the row.
    import spark.implicits._
    val clean = (1 to 20).map(i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)))
    val poisoned = clean ++ Seq(
      (0L, Seq(Float.NaN) ++ Seq.fill(7)(1f)),               // id 0: FIRST in id order
      (21L, Seq(Float.PositiveInfinity) ++ Seq.fill(7)(2f))) // Infinity variant
    val a = Similarity.trainSample(clean.toDF("id", "v"), "id", "v", 64)
    val b = Similarity.trainSample(poisoned.toDF("id", "v"), "id", "v", 64)
    assert(b.length == a.length &&
      b.zip(a).forall { case (x, y) => x.sameElements(y) },
      "corrupt vectors must not enter (or displace) the training sample")
    assert(b.forall(_.forall(d => !d.isNaN && !d.isInfinite)))
  }

  test("non-finite vectors get NULL codes and never surface in PQ / IVF-PQ top-k") {
    // the r17 advisor scenario: a corpus whose ONLY corruption is a
    // NaN/Inf coordinate. NaN distances compare false in the encode
    // argmin, so an unguarded encode hands the row an arbitrary VALID
    // codeword and a finite ADC score - it surfaces in top-k with no
    // error. The finiteOrNull admission guard must null the code (and
    // the IVF cell) instead; asc_nulls_last / the cell IN probe filter
    // then keep it out of every result.
    import spark.implicits._
    val corrupt = Seq(
      (100L, Array(Float.NaN) ++ Array.fill(dim - 1)(5.0f)),
      (101L, Array(Float.PositiveInfinity) ++ Array.fill(dim - 1)(5.0f)),
      // RAGGED finite vector (r18 review): length-agnostic vec_is_finite
      // admits it and the kernel would zero-pad it into a REAL codeword
      // near the +cluster — the admission guard must also check length
      (102L, Array.fill(dim - 1)(5.0f)))
    val corpus = clustered.union(corrupt.toDF("vec_id", "embedding"))

    val model = Similarity.pqTrain(clustered, "vec_id", "embedding", dim,
      m = 4, k = 8, trainN = 64)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", model)
    assert(codes.filter(col("vec_id") >= 100L && col("code").isNull).count() == 3,
      "corrupt rows must encode to NULL codes")
    assert(codes.filter(col("vec_id") < 100L && col("code").isNull).count() == 0)
    // k larger than the clean +cluster: nulls must still sink, not rank
    val top = Similarity.pqTopK(codes, "vec_id", model,
      Array.fill(dim)(5.0f), k = 33).collect().map(_.getLong(0))
    assert(!top.exists(_ >= 100L), s"corrupt id surfaced in top-k: ${top.toSeq}")
    // k larger than the WHOLE admissible corpus (r19 advisor finding):
    // null-code rows must be filtered out, never padded in from the
    // nulls-last tail — the result is exactly the clean corpus
    val padded = Similarity.pqTopK(codes, "vec_id", model,
      Array.fill(dim)(5.0f), k = 500).collect().map(_.getLong(0))
    assert(!padded.exists(_ >= 100L),
      s"corrupt id padded into over-k top-k: ${padded.toSeq}")
    assert(padded.length == corpus.count() - 3)

    val ivf = Similarity.ivfPqTrain(clustered, "vec_id", "embedding", dim,
      nCells = 4, m = 4, k = 8, trainN = 64)
    val enc = Similarity.ivfPqEncode(corpus, "vec_id", "embedding", ivf)
    assert(enc.filter(col("vec_id") >= 100L)
      .filter(col("cell").isNull && col("code").isNull).count() == 3,
      "corrupt rows must get NULL cell and NULL code")
    val ivfTop = Similarity.ivfPqTopK(enc, "vec_id", ivf,
      Array.fill(dim)(5.0f), k = 33, nprobe = 4).collect().map(_.getLong(0))
    assert(!ivfTop.exists(_ >= 100L),
      s"corrupt id surfaced in ivfpq top-k: ${ivfTop.toSeq}")
  }
}
