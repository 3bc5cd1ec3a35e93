package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The r12 canonicalization-stability kernels: [[ShingleHashesExpr]]
  * and [[SignLshExpr]] must (1) be bit-identical to the
  * closure-capturing UDFs they replaced, and (2) canonicalize equal
  * across SEPARATE operator invocations — the property the UDFs
  * lacked, which made every invocation's persisted gram/signature
  * frame unmatchable by the next one (each bench rep silently
  * recomputed; the bench gate caught it as cpu×6 with evict=0).
  */
class StableKernelsSpec extends SparkTestBase {
  import spark.implicits._

  // independent reference: the UDF bodies they replaced, verbatim
  private def refShingles(raw: String, k: Int): Array[Long] =
    if (raw == null) Array.empty[Long]
    else {
      val s = raw.trim.toLowerCase
      val n = math.max(1, s.length - k + 1)
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        var h = 0xcbf29ce484222325L
        var j = i
        val end = math.min(s.length, i + k)
        while (j < end) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
        h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
        out(i) = h
        i += 1
      }
      out
    }

  private def refSignLsh(
      v: Seq[Float], numTables: Int, signBits: Int, dim: Int): Array[Long] = {
    val rnd = new scala.util.Random(42)
    val planes = Array.fill(numTables * signBits, dim)(
      if (rnd.nextBoolean()) 1.0 else -1.0)
    val out = new Array[Long](numTables)
    if (v != null) {
      var t = 0
      while (t < numTables) {
        var sig = 0L; var b = 0
        while (b < signBits) {
          val p = planes(t * signBits + b)
          var s = 0.0; var i = 0
          while (i < math.min(dim, v.length)) { s += p(i) * v(i); i += 1 }
          if (s > 0) sig |= (1L << b)
          b += 1
        }
        out(t) = sig; t += 1
      }
    }
    out
  }

  // independent reference: the r12 winnowing UDF body, verbatim
  private def refWinnowing(raw: String, k: Int, w: Int): Array[Long] =
    if (raw == null) Array.empty[Long]
    else {
      val s = raw.trim.toLowerCase
      val n = math.max(1, s.length - k + 1)
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        var h = 0xcbf29ce484222325L
        var j = i
        val end = math.min(s.length, i + k)
        while (j < end) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
        h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
        hs(i) = h
        i += 1
      }
      val out = scala.collection.mutable.LinkedHashSet[Long]()
      var start = 0
      while (start <= n - math.min(w, n)) {
        var m = Long.MaxValue
        var j = start
        val end = math.min(n, start + w)
        while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
        out += m
        start += 1
      }
      out.toArray
    }

  test("shingle_hashes is bit-identical to the UDF it replaced") {
    val texts = Seq("the quick brown fox", "abc", "ab", "", "   padded   ",
      "\tabc\n", "a", "xy" * 40, null)
    val got = texts.toDF("t")
      .select(TextFunctions.shingle_hashes(col("t"), 5).as("h"))
      .collect().map(r => r.getSeq[Long](0).toArray)
    texts.zip(got).foreach { case (t, h) =>
      assert(h.sameElements(refShingles(t, 5)), s"mismatch on '$t'")
    }
  }

  test("winnowing_fingerprints is bit-identical to the UDF it replaced") {
    val texts = Seq("the quick brown fox jumps over the lazy dog", "abc",
      "ab", "", "   padded   ", "\tabc\ndef\r", "a", "xy" * 60,
      "repeat repeat repeat repeat repeat", null)
    for ((k, w) <- Seq((8, 4), (5, 3), (4, 8), (1, 1))) {
      val got = texts.toDF("t")
        .select(TextFunctions.winnowing_fingerprints(col("t"), k, w).as("f"))
        .collect().map(r => r.getSeq[Long](0).toArray)
      texts.zip(got).foreach { case (t, f) =>
        assert(f.sameElements(refWinnowing(t, k, w)),
          s"mismatch on '$t' (k=$k, w=$w)")
      }
    }
  }

  test("winnowing invocations canonicalize equal and serve from cache") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def fpPlan() = docs.select(col("doc_id"),
      explode(graft.operators.TextAnalysis
        .winnowingFingerprints(col("text"))).as("fp"))
    assert(fpPlan().queryExecution.analyzed
      .sameResult(fpPlan().queryExecution.analyzed),
      "two winnowing builds must be sameResult, or x17's persisted " +
        "fingerprint frame can never serve a rebuilt bench rep")

    spark.catalog.clearCache()
    val first = fpPlan().persist()
    first.count()
    val reused = fpPlan().queryExecution.withCachedData.toString
    assert(reused.contains("InMemoryRelation"),
      s"second build must read the first build's cache:\n$reused")
    first.unpersist()
  }

  test("sign_lsh is bit-identical to the planes-capturing UDF it replaced") {
    val rnd = new scala.util.Random(3)
    val vecs: Seq[Seq[Float]] =
      Seq.fill(20)(Seq.fill(64)(rnd.nextGaussian().toFloat)) ++
        Seq(Seq.fill(10)(1.0f), Seq.empty[Float], null)
    val got = vecs.toDF("v")
      .select(VectorFunctions.sign_lsh(col("v"), 4, 6, 64).as("s"))
      .collect().map(_.getSeq[Long](0).toArray)
    vecs.zip(got).foreach { case (v, s) =>
      assert(s.sameElements(refSignLsh(v, 4, 6, 64)), s"mismatch on $v")
    }
    // the single-signature shape = table 0 of the kernel
    val single = vecs.toDF("v")
      .select(element_at(VectorFunctions.sign_lsh(col("v"), 1, 16, 64), 1).as("s"))
      .collect().map(_.getLong(0))
    vecs.zip(single).foreach { case (v, s) =>
      assert(s == refSignLsh(v, 1, 16, 64)(0))
    }
  }

  test("separate invocations canonicalize equal (cache frames can serve)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def gramPlan() = docs.select(col("doc_id"),
      array_distinct(graft.operators.Dedup.shingleHashes(col("text"), 5)).as("g"))
    assert(gramPlan().queryExecution.analyzed
      .sameResult(gramPlan().queryExecution.analyzed),
      "two shingle-gram builds must be sameResult, or persisted gram " +
        "frames can never serve a later invocation")

    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def sigPlan() = embs.select(col("vec_id"),
      VectorFunctions.sign_lsh(col("embedding"), 4, 6, 64).as("s"))
    assert(sigPlan().queryExecution.analyzed
      .sameResult(sigPlan().queryExecution.analyzed))

    // end-to-end: a persisted frame from one build serves the next
    spark.catalog.clearCache()
    val first = gramPlan().persist()
    first.count()
    val reused = gramPlan().queryExecution.withCachedData.toString
    assert(reused.contains("InMemoryRelation"),
      s"second build must read the first build's cache:\n$reused")
    first.unpersist()
  }

  // ---- r14: the PQ encoders (the last corpus-streaming closure UDFs) ----

  // independent reference: Similarity.nearest/dist2, verbatim
  private def refNearest(x: Array[Double], cands: Array[Array[Double]]): Int = {
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var best = 0; var bestD = dist2(x, cands(0)); var c = 1
    while (c < cands.length) {
      val dd = dist2(x, cands(c))
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    best
  }

  // the replaced pqEncode UDF body, verbatim
  private def refPqEncode(
      v: Seq[Float], cbs: Array[Array[Array[Double]]],
      dim: Int, m: Int, dsub: Int): Array[Int] =
    if (v == null) null
    else {
      val x = Array.tabulate(dim)(d => if (d < v.length) v(d).toDouble else 0.0)
      Array.tabulate(m)(j => refNearest(x.slice(j * dsub, (j + 1) * dsub), cbs(j)))
    }

  // the replaced ivfPqEncode UDF body, verbatim
  private def refIvfPqEncode(
      v: Seq[Float], coarse: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]],
      dim: Int, m: Int, dsub: Int): (Integer, Array[Int]) =
    if (v == null) (null, null)
    else {
      val x = Array.tabulate(dim)(d => if (d < v.length) v(d).toDouble else 0.0)
      val cell = refNearest(x, coarse)
      val code = Array.tabulate(m) { j =>
        val r = Array.tabulate(dsub)(d => x(j * dsub + d) - coarse(cell)(j * dsub + d))
        refNearest(r, cbs(j))
      }
      (cell, code)
    }

  test("pq_encode / ivf_cell / ivfpq_code are bit-identical to the UDFs they replaced") {
    import graft.operators.Similarity
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = Similarity.pqTrain(embs, "vec_id", "embedding", dim = 64, trainN = 64)
    val ivfModel = Similarity.ivfPqTrain(embs, "vec_id", "embedding", dim = 64,
      nCells = 4, trainN = 64)

    // the real corpus, including its null embeddings, plus ragged and
    // empty vectors (the zero-pad edge the UDFs were total over).
    // Bit-equality is pinned at the raw KERNEL level: since r18 the
    // Similarity operators sit an admission guard ABOVE the kernels
    // (inadmissible vectors -> NULL code, see the operator assertions
    // below), but the kernels themselves stay total/zero-pad — that
    // totality is what guarantees no mid-job task death at 100 TB.
    val odd = Seq(
      (9001L, Array(0.5f, -2f, 3f)), (9002L, Array.empty[Float]),
      (9003L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val input = embs.select("vec_id", "embedding").unionByName(odd)
    val raw = input.collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](1)).orNull).toMap

    val cbsSeq = model.codebooks.map(_.map(_.toSeq).toSeq).toSeq
    val gotPq = input.select(col("vec_id"),
        VectorFunctions.pq_encode(col("embedding"), cbsSeq, model.dim).as("code"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Int](1)).map(_.toArray).orNull)
    gotPq.foreach { case (id, code) =>
      val ref = refPqEncode(raw(id), model.codebooks, model.dim, model.m, model.dsub)
      assert((code == null && ref == null) || code.sameElements(ref),
        s"pq_encode mismatch on vec $id")
    }

    val coarseSeq = ivfModel.coarse.map(_.toSeq).toSeq
    val ivfCbsSeq = ivfModel.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq
    val gotIvf = input.select(col("vec_id"),
        VectorFunctions.ivf_cell(col("embedding"), coarseSeq, ivfModel.dim).as("cell"),
        col("embedding"))
      .select(col("vec_id"), col("cell"),
        VectorFunctions.ivfpq_code_at(col("embedding"), col("cell"),
          coarseSeq, ivfCbsSeq, ivfModel.dim).as("code"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else Integer.valueOf(r.getInt(1)),
        if (r.isNullAt(2)) null else r.getSeq[Int](2).toArray))
    gotIvf.foreach { case (id, cell, code) =>
      val (refCell, refCode) = refIvfPqEncode(raw(id), ivfModel.coarse,
        ivfModel.pq.codebooks, ivfModel.dim, ivfModel.pq.m, ivfModel.pq.dsub)
      assert(cell == refCell, s"ivf_cell mismatch on vec $id: $cell vs $refCell")
      assert((code == null && refCode == null) || code.sameElements(refCode),
        s"ivfpq_code mismatch on vec $id")
    }

    // operator level: the SAME odd rows (ragged, empty, null) are
    // inadmissible and must come back NULL from the guarded operators
    // (full policy matrix incl. NaN/Inf in SimilarityPqSpec)
    val oddIds = Set(9001L, 9002L, 9003L)
    val opPq = Similarity.pqEncode(input, "vec_id", "embedding", model).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(oddIds.forall(opPq(_)), "operator must NULL inadmissible codes")
    val opIvf = Similarity.ivfPqEncode(input, "vec_id", "embedding", ivfModel)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1) && r.isNullAt(2))).toMap
    assert(oddIds.forall(opIvf(_)), "operator must NULL inadmissible cell+code")
  }

  test("PQ kernels read null array ELEMENTS as 0.0 on both ArrayData paths") {
    import graft.operators.Similarity
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = Similarity.pqTrain(embs, "vec_id", "embedding", dim = 64, trainN = 64)
    val cbs = model.codebooks.map(_.map(_.toSeq).toSeq).toSeq
    // a null element must encode exactly like a literal 0.0f in that
    // position (the documented total convention; the replaced UDFs
    // NPEd). Built via SQL array() literals — this exercises the
    // non-Unsafe GenericArrayData path, where an unguarded getFloat
    // would throw instead of reading zeroed bits.
    val out = spark.sql(
      """SELECT array(CAST(0.5 AS FLOAT), CAST(NULL AS FLOAT), CAST(-1.5 AS FLOAT)) AS withNull,
        |       array(CAST(0.5 AS FLOAT), CAST(0.0 AS FLOAT), CAST(-1.5 AS FLOAT)) AS withZero""".stripMargin)
      .select(
        VectorFunctions.pq_encode(col("withNull"), cbs, model.dim).as("cn"),
        VectorFunctions.pq_encode(col("withZero"), cbs, model.dim).as("cz"))
      .head()
    assert(out.getSeq[Int](0) == out.getSeq[Int](1),
      "null element must encode as 0.0")
  }

  test("encode plans from independently re-trained models canonicalize equal") {
    import graft.operators.Similarity
    // the bench-rep reality: each invocation re-trains its model, so
    // cache serving needs VALUE equality of the codebook parameters
    // across training runs (deterministic k-means guarantees equal
    // values; the expressions carry them as nested Seqs so equal
    // values compare equal — an Array param would compare by
    // reference and silently break this)
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def encPlan() = {
      val m = Similarity.pqTrain(embs, "vec_id", "embedding", dim = 64, trainN = 64)
      Similarity.pqEncode(embs, "vec_id", "embedding", m)
    }
    assert(encPlan().queryExecution.analyzed
      .sameResult(encPlan().queryExecution.analyzed),
      "two pq-encode builds must be sameResult, or a persisted code " +
        "frame can never serve a rebuilt plan")
    def ivfPlan() = {
      val m = Similarity.ivfPqTrain(embs, "vec_id", "embedding", dim = 64,
        nCells = 4, trainN = 64)
      Similarity.ivfPqEncode(embs, "vec_id", "embedding", m)
    }
    assert(ivfPlan().queryExecution.analyzed
      .sameResult(ivfPlan().queryExecution.analyzed))

    spark.catalog.clearCache()
    val first = encPlan().persist()
    first.count()
    val reused = encPlan().queryExecution.withCachedData.toString
    assert(reused.contains("InMemoryRelation"),
      s"second build must read the first build's cache:\n$reused")
    first.unpersist()
  }

  // ---- r15: vec_normalize (the last boxed corpus-scan kernel) ----

  // the replaced Dedup.normalizeUdf body, verbatim
  private def refNormalize(v: Seq[Float]): Array[Float] =
    if (v == null) null
    else {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      val norm = math.sqrt(s)
      if (norm == 0.0) v.toArray
      else {
        val out = new Array[Float](v.length)
        i = 0
        while (i < v.length) { out(i) = (v(i) / norm).toFloat; i += 1 }
        out
      }
    }

  test("vec_normalize is bit-identical to the UDF it replaced") {
    val rnd = new scala.util.Random(7)
    val vecs: Seq[Seq[Float]] =
      Seq.fill(20)(Seq.fill(64)(rnd.nextGaussian().toFloat)) ++
        Seq(Seq.fill(8)(0.0f),          // zero norm → pass-through
          Seq(3.0f, -4.0f),             // exact 3-4-5 norm
          Seq(Float.MinPositiveValue),  // denormal survives the double trip
          Seq.empty[Float], null)
    val got = vecs.toDF("v")
      .select(VectorFunctions.vec_normalize(col("v")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Float](0).toArray)
    vecs.zip(got).foreach { case (v, n) =>
      val ref = refNormalize(v)
      if (ref == null) assert(n == null, s"null input must stay null")
      else assert(n.length == ref.length &&
        n.indices.forall(i =>
          java.lang.Float.floatToRawIntBits(n(i)) ==
            java.lang.Float.floatToRawIntBits(ref(i))),
        s"mismatch on $v: got ${n.toSeq}, ref ${ref.toSeq}")
    }
    // real embeddings end-to-end, same bit-equality
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val rows = embs.select(col("embedding"),
      VectorFunctions.vec_normalize(col("embedding")).as("n")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0); val n = r.getSeq[Float](1)
      val ref = refNormalize(v)
      assert(n.indices.forall(i =>
        java.lang.Float.floatToRawIntBits(n(i)) ==
          java.lang.Float.floatToRawIntBits(ref(i))))
    }
  }

  test("vec_is_clean censuses the corrupt rows the total kernels absorb") {
    val vecs: Seq[Seq[Float]] = Seq(
      Seq.fill(4)(1.0f),                      // clean
      Seq(1.0f, 2.0f, 3.0f),                  // ragged (short)
      Seq.fill(5)(1.0f),                      // ragged (long)
      Seq.empty[Float],                       // empty
      null)                                   // null vector
    val withNullElem = {
      // a null ELEMENT — built via SQL so the Seq encoder can't reject it
      val df = vecs.toDF("v")
      df.selectExpr(
        "CASE WHEN size(v) = 4 THEN array(v[0], CAST(NULL AS FLOAT), v[2], v[3]) ELSE v END AS v")
    }
    val flags = vecs.toDF("v")
      .select(VectorFunctions.vec_is_clean(col("v"), 4).as("c"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(flags == Seq(true, false, false, false, false), flags)
    val nullElemFlags = withNullElem
      .select(VectorFunctions.vec_is_clean(col("v"), 4).as("c"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(nullElemFlags == Seq(false, false, false, false, false), nullElemFlags)
    // the census composition the scaladoc recommends
    val corrupt = withNullElem
      .filter(!VectorFunctions.vec_is_clean(col("v"), 4)).count()
    assert(corrupt == 5)
  }

  test("vec_normalize plans canonicalize equal and serve from cache") {
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def normPlan() = embs.select(col("vec_id"),
      VectorFunctions.vec_normalize(col("embedding")).as("vec"))
    assert(normPlan().queryExecution.analyzed
      .sameResult(normPlan().queryExecution.analyzed),
      "two normalize builds must be sameResult, or the embeddingNearDup " +
        "signature persist can never serve a later invocation")
    spark.catalog.clearCache()
    val first = normPlan().persist()
    first.count()
    val reused = normPlan().queryExecution.withCachedData.toString
    assert(reused.contains("InMemoryRelation"),
      s"second build must read the first build's cache:\n$reused")
    first.unpersist()
  }
}
