package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.12). Two paths:
  *
  *  - brute force: cosine against the query via codegen'd higher-order
  *    functions, then `orderBy.limit(k)` which Spark plans as
  *    TakeOrderedAndProject — per-partition top-k heaps, only k rows
  *    per partition reach the driver. Correct baseline at any scale;
  *    cost is one full scan.
  *  - sign-LSH bucketed: deterministic random-hyperplane signature
  *    restricts the scan to buckets within `probeHamming` of the query
  *    signature. [[lshTopK]] computes buckets on the fly (one full
  *    scan, pruned compare); the 100 TB path is [[lshWrite]] +
  *    [[lshProbe]], where the Hamming-ball bucket IN-list becomes a
  *    partition filter and the scan reads only the matching
  *    directories (pinned by `PlanQualitySpec`'s numPartitions
  *    metric, exactly like IVF's).
  */
object Similarity {

  import Dedup.cosine

  /** Exact top-k by cosine against a literal query vector. */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      // vec_cosine nulls out non-finite scores so corrupt rows sink
      // below every real hit — but when k exceeds the admissible row
      // count the NULL tail would pad the result (the r18/r19 class
      // pqTopK/binaryTopK already filter; this path must too)
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Binary-quantized retrieval: 1-bit/dim sign quantization packed
    * into ONE 64-bit word per vector (`sign_pack`, native codegen),
    * Hamming shortlist, float rerank.
    *
    * Stage 1 scans every row but computes only XOR + POPCNT against
    * the query's packed word — the planned shape is
    * TakeOrderedAndProject on (hamming, id), so each partition keeps a
    * `shortlist·k` heap and only that many rows ever leave a task.
    * Stage 2 re-scores the ≤ `shortlist·k` survivors with full float
    * cosine (the asymmetric rerank — quantized on the database side,
    * exact on the query side). At 100 TB the packed word is
    * precomputed in the layout (like [[lshWrite]]) and the scan reads
    * 8 bytes/row instead of 256: binary quantization is the 64×
    * scan-footprint version of [[bruteForceTopK]], with recall
    * recovered by the rerank.
    *
    * Both stages order on rounded/integer scores with id tiebreaks, so
    * an independent engine reproduces the exact rows.
    */
  def binaryTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, shortlist: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.sign_pack
    val qbits = {
      var b = 0L
      query.take(64).zipWithIndex.foreach { case (x, i) => if (x > 0f) b |= (1L << i) }
      b
    }
    // null-hamming rows (sign_pack is null-intolerant, so null-vector
    // rows carry null hamming) are FILTERED like pqTopK's null adc:
    // nulls-last ordering alone still admits them to the shortlist
    // when k*shortlist exceeds the admissible-row count (r18 advisor
    // finding on pqTopK, same class here)
    val short = df
      .select(col(idCol), col(vecCol),
        bit_count(sign_pack(col(vecCol)).bitwiseXOR(lit(qbits)))
          .cast("long").as("hamming"))
      .filter(col("hamming").isNotNull)
      .orderBy(col("hamming").asc, col(idCol))
      .limit(k * shortlist)
    short
      .select(col(idCol), col("hamming"),
        round(cosine(col(vecCol), typedLit(query)), 4).as("cos_rerank"))
      .orderBy(col("cos_rerank").desc, col(idCol))
      .limit(k)
  }

  /** Hard-negative mining for embedding-model training: for every
    * anchor vector, the k most-similar corpus vectors that are NOT
    * near-duplicates (cosine < `dupCutoff`) — the negatives that sit
    * closest to the decision boundary and carry the most gradient
    * signal (Xiong et al. 2021, ANCE).
    *
    * The anchor set is small by nature (a training batch), so it
    * broadcasts and the corpus streams once through a broadcast
    * nested-loop join; per-anchor top-k goes through the bounded
    * [[graft.functions.TopKAgg]] two-phase aggregate, not a window —
    * at 100 TB the exchange carries k·tasks rows per anchor, not the
    * whole corpus. Scores are rounded BEFORE ranking so the (score
    * desc, id asc) order is reproducible across engines.
    */
  def hardNegatives(
      corpus: DataFrame, anchors: DataFrame, idCol: String, vecCol: String,
      k: Int, dupCutoff: Double = 0.95): DataFrame = {
    val topk = graft.functions.TopKAgg.top_k(k)
    val a = anchors.select(col(idCol).as("anchor_id"), col(vecCol).as("__avec"))
    corpus
      .join(broadcast(a), col("anchor_id") =!= col(idCol))
      .select(col("anchor_id"), col(idCol),
        round(cosine(col("__avec"), col(vecCol)), 6).as("cos"))
      .filter(col("cos") < dupCutoff)
      .groupBy(col("anchor_id"))
      .agg(topk(col("cos"), col(idCol)).as("top"))
      .select(col("anchor_id"), posexplode(col("top")))
      .select(col("anchor_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col._2").as("negative_id"), col("col._1").as("cos"))
  }

  /** Single sign-LSH signature = table 0 of the native kernel
    * (`rademacherPlanes(1·signBits, dim)` IS `rademacherPlanes(
    * signBits, dim)`, so the bits match the previous planes-capturing
    * UDF exactly, and the plan is canonicalization-stable — see
    * [[graft.functions.SignLshOps]] for why that matters).
    */
  private[operators] def signSignature(vecCol: Column, dim: Int, signBits: Int): Column =
    element_at(
      graft.functions.VectorFunctions.sign_lsh(vecCol, 1, signBits, dim), 1)

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to a centroid cell; a query scans only the `nprobe` cells
    * whose centroids are nearest. At 100 TB the table is written
    * partitioned by `cell` so the probe prunes to a few partition
    * reads; training samples a fraction of the data.
    */
  final case class IvfIndex(
      assigned: org.apache.spark.sql.DataFrame,   // idCol, vecCol, cell
      centroids: Array[Array[Double]])

  /** The bounded deterministic KMeans training input: the first
    * `trainN` non-null vectors in `idCol` order. Factored out so the
    * spec can count the rows that actually reach the fit — the 100 TB
    * guarantee is that this count is ≤ trainN regardless of table size.
    * Same corrupt-row policy as [[trainSample]]: only finite vectors
    * train (null elements die in array_to_vector; NaN/Infinity poison
    * MLlib's centroid means the same way they poison the local Lloyd);
    * ragged null-free vectors reach MLlib's own loud dimension require.
    */
  private[operators] def ivfTrainInput(
      df: DataFrame, idCol: String, vecCol: String, trainN: Int): DataFrame =
    df.filter(graft.functions.VectorFunctions.vec_is_finite(col(vecCol)))
      .orderBy(col(idCol)).limit(trainN)

  def ivfBuild(
      df: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, trainN: Int = 4096): IvfIndex = {
    // Train on a bounded sample (same contract as pqTrain's
    // trainSample): coarse-quantizer quality saturates on a few
    // thousand vectors, and Lloyd iterations over the full corpus are
    // a scale-killer — 8 iterations × 100 TB passes before a single
    // vector is indexed. With the cap, only the single assign pass
    // below ever streams the whole table.
    //
    // r21 optimization (guide §1.2 "per-task work" + §4 "prefer
    // codegen-friendly expressions"): the coarse quantizer now trains
    // with the SAME deterministic driver-local Lloyd the PQ family
    // uses ([[kmeansCodebook]]; init = first nCells samples, strict-<
    // argmin, 8 iterations — the standard IVF budget, recall is
    // governed by nprobe, not centroid polish) instead of MLlib's
    // distributed KMeans. MLlib's fit launched a k-means|| init
    // cascade plus one Spark job per Lloyd iteration over a
    // 512-row sample — measured ~0.9 s wall at 0.16 task-CPU-s per
    // x15 bench rep, pure driver/job-scheduling latency — and its
    // predict UDF ran the assign pass outside whole-stage codegen
    // with an array→ml.Vector conversion per row. Now training is
    // one bounded collect + microseconds of driver Lloyd, and the
    // assign pass (the ONLY full-table pass) is the codegen'd
    // [[graft.functions.VectorExpressions.IvfCellExpr]] argmin the
    // IVF-PQ encode path already uses. Results are invariant: a cell
    // id is an internal routing label, every finite vector gets
    // exactly one, and probes either scan all cells (exact) or
    // nprobe-of-centroid cells (approximate by contract).
    //
    // The assign pass admits exactly what training admits
    // (vec_is_finite: non-null, no null elements, no NaN/Infinity) — a
    // NaN/Inf vector would argmin into an arbitrary cell and be
    // permanently indexed into the layout (r20 review). Ragged
    // null-free vectors stay a LOUD error (previously MLlib's
    // dimension require; now an explicit raise_error — PqOps.ivfCell
    // would silently truncate the distance loop instead).
    val sample = trainSample(df, idCol, vecCol, trainN)
    require(sample.length >= nCells,
      s"need at least nCells=$nCells finite training vectors, got ${sample.length}")
    val centroids = kmeansCodebook(sample, nCells, iters = 8)
    val dim = sample(0).length
    val coarseSeq: Seq[Seq[Double]] = centroids.map(_.toSeq).toSeq
    val cell = when(size(col(vecCol)) === dim,
        graft.functions.VectorFunctions.ivf_cell(col(vecCol), coarseSeq, dim))
      .otherwise(raise_error(concat(
        lit("ivf assign: vector of "), size(col(vecCol)).cast("string"),
        lit(s" dims cannot assign into a dim=$dim coarse quantizer - " +
          "repair or filter the column first"))))
    val assigned = df
      .filter(graft.functions.VectorFunctions.vec_is_finite(col(vecCol)))
      .withColumn("cell", cell)
    IvfIndex(assigned, centroids)
  }

  /** The `nprobe` cell ids whose centroids are nearest to the query —
    * the only piece of driver-side work in an IVF probe.
    */
  def ivfProbeCells(
      centroids: Array[Array[Double]], query: Array[Float], nprobe: Int): Seq[Int] = {
    def dist2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(c.length, query.length)) {
        val d = c(i) - query(i); s += d * d; i += 1
      }
      s
    }
    centroids.zipWithIndex
      .sortBy { case (c, _) => dist2(c) }
      .take(nprobe).map(_._2).toSeq
  }

  /** Persist the assigned table hive-partitioned by `cell`: the 100 TB
    * layout. A probe's `cell IN (...)` filter then becomes a partition
    * filter — the scan lists and reads only the `nprobe` matching
    * directories instead of the whole table (pinned by
    * `PlanQualitySpec`'s numPartitions metric check).
    */
  def ivfWrite(index: IvfIndex, path: String): Unit =
    graft.sources.Layout.writePartitioned(index.assigned, path, Seq("cell"))

  /** Probe any assigned table (in-memory or read back from the
    * cell-partitioned layout) for the exact top-k within the probed
    * cells. `scoreRound`: report (and select by) the cosine rounded to
    * that many decimals — keeps a top-k comparison stable against
    * last-ulp ordering noise between independent implementations.
    */
  def ivfProbe(
      assigned: DataFrame, centroids: Array[Array[Double]],
      idCol: String, vecCol: String,
      query: Array[Float], k: Int, nprobe: Int = 4,
      scoreRound: Option[Int] = None): DataFrame = {
    val probeCells = ivfProbeCells(centroids, query, nprobe)
    val raw = cosine(col(vecCol), typedLit(query))
    val score = scoreRound.fold(raw)(n => round(raw, n))
    assigned
      .filter(col("cell").isin(probeCells: _*))   // partition filter on the ivfWrite layout
      .select(col(idCol), score.as("cosine"))
      // NULL scores (non-finite vectors that slipped into the layout)
      // must not pad the tail when k exceeds the probed cells'
      // admissible rows — same policy as pqTopK/binaryTopK
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  def ivfTopK(
      index: IvfIndex, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nprobe: Int = 4,
      scoreRound: Option[Int] = None): DataFrame =
    ivfProbe(index.assigned, index.centroids, idCol, vecCol, query, k, nprobe, scoreRound)

  /** Per-vector int8 scalar quantization (the FAISS SQ8 recipe): scale
    * by 127/max|v| and round — 4× smaller at rest than float32, which
    * at 100 TB of embeddings is the difference between a table that
    * fits the page cache and one that doesn't. Returns
    * struct(scale double, q array<int>); dequantize with q[i]/scale.
    * All built-ins, so the quantization pass stays in whole-stage
    * codegen over the scan.
    */
  def scalarQuantize(vecCol: Column): Column = {
    val vd = transform(vecCol, v => v.cast("double"))
    val m = array_max(transform(vd, v => abs(v)))
    val scale = when(m === 0.0, 0.0).otherwise(lit(127.0) / m)
    struct(scale.as("scale"),
      transform(vd, v => round(v * scale).cast("int")).as("q"))
  }

  /** Per-group centroid of an embedding column (the mean vector a
    * SemDeDup / IVF-refresh / cluster-summary pass reads). One
    * posexplode + a (group, dim) partial-aggregated average, then the
    * vector is reassembled in dimension order — `array_sort` on
    * (pos, value) structs, NOT whatever order `collect_list` delivered
    * partitions in. Shuffle volume is rows × dim scalar cells, the
    * unavoidable minimum for an exact mean; the final per-group
    * collect is bounded by dim. Means are rounded to `digits` so an
    * independent engine (different summation order) reproduces them.
    * Output: group column, `n` members, `centroid` array<double>.
    */
  def centroids(
      df: DataFrame, groupCol: String, vecCol: String,
      digits: Int = 8): DataFrame =
    df.where(col(vecCol).isNotNull)
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "e")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("e").cast("double")).as("c"), count(lit(1)).as("cnt"))
      .groupBy(col(groupCol))
      .agg(max(col("cnt")).cast("bigint").as("n"),
        transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => round(x.getField("c"), digits)).as("centroid"))

  /** Max absolute reconstruction error of a quantized vector — the
    * quality gate a pipeline thresholds before swapping the float
    * column for the int8 one.
    */
  def dequantError(vecCol: Column, quantCol: Column): Column = {
    val scale = quantCol.getField("scale")
    // scale == 0 means the all-zero vector: q is all zeros and the
    // reconstruction is exact — without the guard, q/scale is 0/0 →
    // NULL, and a `dequantError <= t` quality gate would silently DROP
    // the row instead of keeping a perfect reconstruction
    when(scale === 0.0, lit(0.0)).otherwise(
      array_max(zip_with(quantCol.getField("q"), transform(vecCol, v => v.cast("double")),
        (q, v) => abs(q.cast("double") / scale - v))))
  }

  /** Sign-LSH signature of a driver-side query vector — the same
    * deterministic Rademacher planes the column-side
    * [[signSignature]] uses.
    */
  def signatureOf(query: Array[Float], dim: Int, signBits: Int): Long = {
    val planes = Dedup.rademacherPlanes(signBits, dim)
    var sig = 0L; var b = 0
    while (b < signBits) {
      var s = 0.0; var i = 0
      while (i < math.min(dim, query.length)) { s += planes(b)(i) * query(i); i += 1 }
      if (s > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** All signatures within Hamming distance `radius` of `sig` over the
    * low `signBits` bits — the explicit bucket IN-list an LSH probe
    * pushes down as a partition filter. Size is Σ C(signBits, r),
    * driver-side only; the radius guard keeps it enumerable.
    */
  def hammingBall(sig: Long, signBits: Int, radius: Int): Seq[Long] = {
    require(radius >= 0 && radius <= 4,
      s"probe radius $radius too large to enumerate as a partition " +
        "IN-list; raise signBits instead of the radius, or fall back to " +
        "lshTopK's scan-side Hamming compare")
    (0 to radius).flatMap(r => (0 until signBits).combinations(r)
      .map(_.foldLeft(sig)((s, b) => s ^ (1L << b))))
  }

  /** ANN top-k: scan only rows whose LSH bucket is within
    * `probeHamming` bits of the query's bucket, then exact cosine.
    * Computes buckets on the fly — one full scan with a cheap pruned
    * compare. For the 100 TB repeated-probe path, write the layout
    * once with [[lshWrite]] and probe with [[lshProbe]] instead.
    */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, dim: Int,
      signBits: Int = 8, probeHamming: Int = 1): DataFrame = {
    val qSig = signatureOf(query, dim, signBits)
    df.withColumn("__bucket", signSignature(col(vecCol), dim, signBits))
      .filter(bit_count(col("__bucket").bitwiseXOR(lit(qSig))) <= probeHamming)
      .select(col(idCol), cosine(col(vecCol), typedLit(query)).as("cosine"))
      .filter(col("cosine").isNotNull) // no NULL-score tail padding (pqTopK policy)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Persist the table hive-partitioned by the sign-LSH bucket: the
    * 100 TB layout for repeated ANN probes. A probe's Hamming-ball
    * `bucket IN (...)` filter then becomes a partition filter — the
    * scan lists and reads only the matching directories instead of the
    * whole table (pinned by `PlanQualitySpec`'s numPartitions metric,
    * the same proof IVF's cell layout has).
    */
  def lshWrite(
      df: DataFrame, vecCol: String, path: String,
      dim: Int, signBits: Int = 8): Unit =
    graft.sources.Layout.writePartitioned(
      df.withColumn("bucket", signSignature(col(vecCol), dim, signBits)),
      path, Seq("bucket"))

  /** Probe an [[lshWrite]] layout (read back, or any table with a
    * `bucket` column) for the top-k by exact cosine within the
    * Hamming-`probeHamming` ball of the query's signature. Identical
    * result to [[lshTopK]] at the same parameters — `bucket ∈ ball(h)`
    * ≡ `hamming(bucket, qSig) ≤ h` — but the IN-list prunes
    * partitions instead of scanning every row.
    */
  def lshProbe(
      bucketed: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, dim: Int,
      signBits: Int = 8, probeHamming: Int = 1,
      scoreRound: Option[Int] = None): DataFrame = {
    val ball = hammingBall(signatureOf(query, dim, signBits), signBits, probeHamming)
    val raw = cosine(col(vecCol), typedLit(query))
    val score = scoreRound.fold(raw)(n => round(raw, n))
    bucketed
      .filter(col("bucket").isin(ball: _*))   // partition filter on the lshWrite layout
      .select(col(idCol), score.as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  // --- product quantization (Jégou et al., "Product Quantization for
  // Nearest Neighbor Search", TPAMI 2011) -------------------------------

  /** PQ codebooks: `codebooks(j)(c)` is codeword c of subspace j
    * (dsub = dim/m doubles). m·k·dsub doubles total — kilobytes, ships
    * in the task closure.
    */
  final case class PqModel(dim: Int, m: Int, k: Int,
      codebooks: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
  }

  private[operators] def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Strict-< argmin of squared L2 over `cands` — lowest index wins
    * ties, the pinned tie-break every PQ/IVF-PQ stage uses.
    */
  private[operators] def nearest(x: Array[Double], cands: Array[Array[Double]]): Int = {
    var best = 0; var bestD = dist2(x, cands(0)); var c = 1
    while (c < cands.length) {
      val dd = dist2(x, cands(c))
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    best
  }

  /** Deterministic Lloyd k-means over `subs` — every choice pinned so
    * an independent reimplementation (`tools/golden_ext.py`)
    * reproduces it bit-for-bit: init = first k samples; assignment by
    * strict-< argmin (lowest index wins ties); centroid = mean
    * accumulated in sample order; an empty cluster keeps its centroid.
    */
  private[operators] def kmeansCodebook(
      subs: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val dsub = subs(0).length
    var cb = Array.tabulate(k)(c => subs(c).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k, dsub)(0.0)
      val counts = Array.fill(k)(0)
      subs.foreach { x =>
        val best = nearest(x, cb)
        counts(best) += 1
        var d = 0; while (d < dsub) { sums(best)(d) += x(d); d += 1 }
      }
      cb = Array.tabulate(k) { c =>
        if (counts(c) > 0) Array.tabulate(dsub)(d => sums(c)(d) / counts(c))
        else cb(c)
      }
      it += 1
    }
    cb
  }

  /** The first `trainN` vectors in `idCol` order, upcast to doubles —
    * the bounded deterministic training sample every quantizer trains
    * on (same contract as IVF's sampled coarse quantizer): codebook
    * quality saturates on a tiny sample, the 100 TB corpus only ever
    * streams through the encode pass.
    */
  private[operators] def trainSample(
      df: DataFrame, idCol: String, vecCol: String, trainN: Int): Array[Array[Double]] = {
    // Training admits only FINITE vectors (vec_is_finite: non-null, no
    // null element, no NaN/Infinity). Null vectors are skipped (not
    // encoded to a codeword) by pqEncode/ivfPqEncode, so they must not
    // reach training either — without the filter, getSeq returns null
    // and .toArray throws; a null ELEMENT would NPE unboxing. A
    // NaN/Infinity element is worse: its distances compare false, so
    // the vector joins cluster 0, its coords poison the centroid mean,
    // and the next Lloyd iteration collapses EVERY point into the
    // NaN cluster — the whole codebook silently degenerates.
    // tools/golden_ext.py mirrors the null filter in its corpus query;
    // clean corpora carry none of these, so goldens are unaffected.
    val rows = ivfTrainInput(df, idCol, vecCol, trainN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    // RAGGED (null-free, mixed-length) vectors are a CALLER error —
    // a quantizer trained on mixed dims is meaningless, and letting
    // them through used to die deep in k-means accumulation with an
    // opaque ArrayIndexOutOfBounds (BatchChaosProbe finding, r17).
    // Same loud-require policy as GramAgg's dim mismatch.
    val dims = rows.iterator.map(_.length).toSet
    require(dims.size <= 1,
      s"training sample mixes vector dimensions ${dims.toSeq.sorted.mkString("/")} - " +
        "a mixed-dimension embedding column cannot train one quantizer; " +
        "repair or filter the column first")
    rows
  }

  /** Train PQ codebooks: split each vector into `m` subvectors of
    * dim/m dims; per subspace, deterministic k-means (see
    * [[kmeansCodebook]] for the pinned choices the x47 golden relies
    * on) over the subvectors of the first `trainN` vectors.
    */
  def pqTrain(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, k: Int = 16, iters: Int = 3, trainN: Int = 256): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m subspaces")
    val sample = trainSample(df, idCol, vecCol, trainN)
    require(sample.length >= k,
      s"need at least k=$k training vectors, got ${sample.length}")
    PqModel(dim, m, k, subspaceCodebooks(sample, dim, m, k, iters))
  }

  private def subspaceCodebooks(
      sample: Array[Array[Double]], dim: Int, m: Int, k: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val dsub = dim / m
    Array.tabulate(m) { j =>
      kmeansCodebook(sample.map(_.slice(j * dsub, (j + 1) * dsub)), k, iters)
    }
  }

  /** Encode vectors to m-byte PQ codes (stored as array<int>): per
    * subspace, the index of the nearest codeword. One distributed scan;
    * the code column is m ints per row instead of dim floats — at 100 TB
    * of float32x64 embeddings, a 32× storage cut that turns repeated
    * ANN scoring into a page-cache-resident scan. Native codegen
    * kernel ([[graft.functions.PqEncodeExpr]], r14): the corpus-
    * streaming pass reads floats as Tungsten primitives instead of
    * boxing a Seq[Float] per row, and the codebook rides as a
    * structurally-comparable case-class parameter, so encode plans
    * from the same model canonicalize equal (the closure-capturing
    * UDF this replaced was the same trap class as r12's signature
    * builders). StableKernelsSpec pins bit-equality with the old UDF
    * body and the sameResult property.
    *
    * INADMISSIBLE vectors (null, null element, NaN/Inf coordinate, or
    * a length other than `model.dim`) get a NULL code: NaN distances
    * compare false in the argmin and RAGGED vectors zero-pad, so an
    * unguarded encode would hand a corrupt row an arbitrary valid
    * codeword and a FINITE ADC score — the one corruption class that
    * surfaces in top-k with no error (r17 advisor + r18 review
    * findings). A null code yields a null ADC score that [[pqTopK]]
    * filters out entirely (r19 — nulls-last alone still surfaced
    * corrupt rows when k exceeded the admissible count), same
    * null-out policy as `vec_cosine`; NOTE it is
    * stricter than quantizer-training admission (`vec_is_finite`),
    * where a ragged sample instead hits the loud mixed-dimensions
    * require — at encode time the scan is distributed and one corrupt
    * row must not kill the pass.
    */
  def pqEncode(
      df: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame = {
    val vec = finiteOrNull(col(vecCol), model.dim)
    df.select(col(idCol),
      graft.functions.VectorFunctions.pq_encode(vec,
        model.codebooks.map(_.map(_.toSeq).toSeq).toSeq, model.dim).as("code"))
  }

  /** The corrupt-vector admission guard shared by the encode passes:
    * the vector itself when it is exactly `dim` FINITE floats, NULL
    * otherwise — null-intolerant downstream kernels then yield null
    * codes/cells that every top-k in the family already sinks
    * (`asc_nulls_last`) or prunes (`cell IN (...)`). The length leg
    * matters as much as finiteness: `vec_is_finite` is length-agnostic
    * and the kernels zero-pad, so a RAGGED finite vector would encode
    * to a real codeword with a finite ADC score — the same
    * silent-surface class as NaN (r18 review finding). `size(null)`
    * is null under the non-legacy conf, so null vectors fall through
    * to NULL either way.
    */
  private def finiteOrNull(vec: Column, dim: Int): Column =
    when(graft.functions.VectorFunctions.vec_is_finite(vec) &&
      size(vec) === lit(dim), vec)

  /** ADC (asymmetric distance) top-k over PQ codes: precompute the
    * m×k table of squared L2 distances from the query's subvectors to
    * every codeword (driver-side, microseconds), then score each code
    * with m table lookups — the scan never touches the float vectors.
    * Scoring is the native codegen'd `adc_score` expression (table as
    * an array literal) — no per-row boxing, same double-addition order
    * as the scalar spec so the x47 golden stays bit-exact. Ascending
    * ADC ≈ ascending true L2²; ties break on id. Plans to
    * TakeOrderedAndProject like every other top-k in the engine.
    */
  def pqTopK(
      encoded: DataFrame, idCol: String, model: PqModel,
      query: Array[Float], k: Int): DataFrame = {
    require(query.length == model.dim,
      s"query has ${query.length} dims, model expects ${model.dim}")
    val m = model.m; val dsub = model.dsub; val kk = model.k
    val tab: Seq[Seq[Double]] = Seq.tabulate(m) { j =>
      val q = Array.tabulate(dsub)(d => query(j * dsub + d).toDouble)
      Seq.tabulate(kk)(c => dist2(q, model.codebooks(j)(c)))
    }
    // Inadmissible rows (null code from the encode guard → null adc)
    // are FILTERED, not just sunk: asc_nulls_last alone still surfaces
    // them when k exceeds the admissible-row count, unlike ivfPqTopK
    // where the `cell IN (...)` probe truly prunes them (r18 advisor).
    // The filter keeps the TakeOrderedAndProject plan — it folds into
    // the scan's predicate, not a separate stage.
    encoded.select(col(idCol),
        graft.functions.VectorFunctions.adc_score(col("code"), typedLit(tab)).as("adc"))
      .filter(col("adc").isNotNull)
      .orderBy(col("adc").asc, col(idCol))
      .limit(k)
  }

  // --- IVF-PQ: coarse quantizer + residual PQ (the billion-vector
  // recipe: Jégou et al. 2011 §V) ----------------------------------------

  /** Coarse centroids (the inverted-file cells) + PQ codebooks trained
    * on RESIDUALS (vector − its cell centroid) — residual energy is an
    * order of magnitude smaller than vector energy, so the same k
    * codewords quantize far more precisely than plain PQ.
    */
  final case class IvfPqModel(dim: Int, nCells: Int,
      coarse: Array[Array[Double]], pq: PqModel)

  /** Train IVF-PQ: deterministic k-means for the coarse cells over the
    * bounded sample, then per-subspace deterministic k-means over the
    * sample's residuals. Same pinned tie-breaks as [[pqTrain]] so the
    * x48 golden reproduces it bit-for-bit.
    */
  def ivfPqTrain(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nCells: Int = 8, m: Int = 8, k: Int = 16,
      iters: Int = 3, trainN: Int = 256): IvfPqModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m subspaces")
    val sample = trainSample(df, idCol, vecCol, trainN)
    require(sample.length >= math.max(nCells, k),
      s"need at least max(nCells=$nCells, k=$k) training vectors, got ${sample.length}")
    val coarse = kmeansCodebook(sample, nCells, iters)
    val residuals = sample.map { x =>
      val cell = nearest(x, coarse)
      Array.tabulate(dim)(d => x(d) - coarse(cell)(d))
    }
    IvfPqModel(dim, nCells, coarse,
      PqModel(dim, m, k, subspaceCodebooks(residuals, dim, m, k, iters)))
  }

  /** Encode to (cell, residual code): one distributed scan. Write the
    * result partitioned by `cell` (`Layout.writePartitioned`) for the
    * 100 TB layout — a probe then reads only nprobe directories of
    * m-byte codes, the double pruning (cells × code size) that makes
    * billion-vector ANN page-cache-resident.
    *
    * Corrupt rows get a NULL cell and NULL code (the [[finiteOrNull]]
    * admission guard, same policy as [[pqEncode]]): a NaN coordinate
    * would otherwise argmin into an arbitrary cell with a finite ADC
    * score and surface in top-k with no error, and null-element /
    * ragged rows previously zero-padded into real codes — silently
    * wrong under the r17 corruption policy (corrupt row ≠ fabricated
    * data). Null cells are pruned by the `cell IN (...)` probe filter,
    * never scored; a pipeline that must OBSERVE corruption censuses
    * with `VectorFunctions.vec_is_clean(col, dim)` before (or
    * alongside) the encode.
    */
  def ivfPqEncode(
      df: DataFrame, idCol: String, vecCol: String, model: IvfPqModel): DataFrame = {
    // Two deterministic native kernels (r14), replacing one
    // asNondeterministic struct UDF — the UDF needed its white lie
    // because a pushed-down cell predicate would have replayed the
    // WHOLE encode per row. Since r15 the residual-code kernel takes
    // the cell as a COLUMN (ivfpq_code_at) instead of recomputing the
    // coarse argmin in-kernel: the argmin runs exactly once per row on
    // the bulk encode pass (CollapseProject never inlines a non-cheap
    // projection referenced twice — PlanQualitySpec pins one
    // ivf_cell in the optimized plan), and a `cell IN (...)` predicate
    // still pushes between the two projections, so the expensive code
    // kernel runs on PRUNED rows only. Same math, same bits
    // (StableKernelsSpec pins against the UDF body; x48 unchanged).
    val coarse = model.coarse.map(_.toSeq).toSeq
    val cbs = model.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq
    df.select(col(idCol), finiteOrNull(col(vecCol), model.dim).as(vecCol))
      .select(col(idCol), col(vecCol),
        graft.functions.VectorFunctions
          .ivf_cell(col(vecCol), coarse, model.dim).as("cell"))
      .select(col(idCol), col("cell"),
        graft.functions.VectorFunctions
          .ivfpq_code_at(col(vecCol), col("cell"), coarse, cbs, model.dim).as("code"))
  }

  /** The `nprobe` cells nearest the query, deterministically ordered
    * by (distance, cell index) — delegates to [[ivfProbeCells]], whose
    * stable sortBy yields exactly that ordering (the tie-break the x48
    * golden pins).
    */
  def ivfPqProbeCells(
      model: IvfPqModel, query: Array[Float], nprobe: Int): Seq[Int] =
    ivfProbeCells(model.coarse, query, nprobe)

  /** ADC top-k over an IVF-PQ encoded table: per probed cell, the ADC
    * table is built against the query's RESIDUAL for that cell
    * (q − centroid), then rows of the probed cells are scored with m
    * lookups each. `cell IN (...)` prunes partitions on the
    * cell-partitioned layout, exactly like [[ivfProbe]].
    */
  def ivfPqTopK(
      encoded: DataFrame, idCol: String, model: IvfPqModel,
      query: Array[Float], k: Int, nprobe: Int = 2): DataFrame = {
    require(query.length == model.dim,
      s"query has ${query.length} dims, model expects ${model.dim}")
    val m = model.pq.m; val dsub = model.pq.dsub; val kk = model.pq.k
    val q = Array.tabulate(model.dim)(d => query(d).toDouble)
    val probed = ivfPqProbeCells(model, query, nprobe)
    val probedSet = probed.toSet
    // dense over cell ids so the native adc_score_cells expression can
    // index directly; unprobed cells hold empty tables (the cell
    // IN-list filter guarantees they are never evaluated)
    val tables: Seq[Seq[Seq[Double]]] = Seq.tabulate(model.nCells) { cell =>
      if (!probedSet(cell)) Seq.empty
      else {
        val qr = Array.tabulate(model.dim)(d => q(d) - model.coarse(cell)(d))
        Seq.tabulate(m) { j =>
          val qsub = qr.slice(j * dsub, (j + 1) * dsub)
          Seq.tabulate(kk)(c => dist2(qsub, model.pq.codebooks(j)(c)))
        }
      }
    }
    encoded
      .filter(col("cell").isin(probed: _*))  // partition filter on the cell layout
      .select(col(idCol), graft.functions.VectorFunctions
        .adc_score_cells(col("cell"), col("code"), typedLit(tables)).as("adc"))
      .orderBy(col("adc").asc_nulls_last, col(idCol))
      .limit(k)
  }
}
