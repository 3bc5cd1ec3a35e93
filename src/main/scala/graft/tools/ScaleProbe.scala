package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling-curve probe (dev tool, like [[DevProbe]] — not library
  * surface): measures the scale-SENSITIVE operator families at 1×, 4×,
  * 16× the sf0.1 corpus and prints CPU growth factors, so the "would
  * this hold at 1000× the data" question is answered by measurement
  * instead of plan inspection alone.
  *
  * Scaled inputs are built to preserve the original's duplicate
  * density rather than collapse onto it: copy `i` of a document is the
  * original under a per-copy alphabet permutation (`translate`, an affine
  * BIJECTION on letters+digits — every within-copy equality and
  * difference is preserved exactly, while cross-copy sharing of char
  * shingles AND token n-grams drops to ~zero, so k× the data means k×
  * the real work). A token-SUFFIX perturbation is not enough: minhash
  * shingles are 5-CHAR windows, so suffixed copies remain true
  * near-dups of each other and the candidate set grows k² — the first
  * probe run measured exactly that (85M pairs at 16×, 471 CPU-s),
  * which is the operator giving the output-proportional correct
  * answer to the wrong fixture. Copy `i` of an embedding is offset by
  * `i/1000` per dimension (distinct vectors, same geometry). Inputs
  * are STAGED to scratch parquet before timing so each op is measured
  * over a real scan, not the generator pipeline.
  *
  * Knobs that must scale WITH the corpus do so explicitly, because
  * that is the 100 TB contract being demonstrated: `semDedup` cells
  * grow ∝ k (fixed cells would make within-cell pairs grow k² — the
  * documented scaling knob, Abbas 2023 §3 uses √N-ish cell counts),
  * and `globalRank` range partitions grow ∝ k (bounded rows per
  * partition). Everything else runs at its defaults.
  */
object ScaleProbe {

  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
    val scales = if (args.isEmpty) Seq(1, 4, 16) else args.toSeq.map(_.toInt)
    val spark = graft.GraftSession.builder("scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val embs0 = graft.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val nDocs = docs0.count()
    val nEmb = embs0.count()

    val scratch = java.nio.file.Files.createTempDirectory("scale_probe_")
    def stage(df: DataFrame, name: String): DataFrame = {
      val p = scratch.resolve(name).toString
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    // Affine permutation x → a·x+b (mod n), a coprime to n — NOT a bare
    // rotation: rotations repeat with period 26, so at k > 26 copies
    // i and i+26 became bit-identical again and the k=64 probe measured
    // a fixture artifact (exact dedup collapsing 320k→130k rows, 2.5×
    // super-linear "pair growth"). The affine family gives 12·26 = 312
    // distinct letter bijections — enough period for any practical k.
    val coprimes26 = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val coprimes10 = Seq(1, 3, 7, 9)
    def affine(s: String, i: Int): String = {
      val n = s.length
      val as = if (n == 26) coprimes26 else coprimes10
      val a = as((i / n) % as.size)
      val b = i % n
      (0 until n).map(x => s((a * x + b) % n)).mkString
    }
    def scaledDocs(k: Int): DataFrame =
      (0 until k).map { i =>
        docs0.select(
          (col("doc_id") + lit(i.toLong * nDocs)).as("doc_id"),
          (if (i == 0) col("text")
           else translate(translate(translate(col("text"),
             lower, affine(lower, i)), upper, affine(upper, i)),
             digits, affine(digits, i))).as("text"))
      }.reduce(_ unionByName _)

    def scaledEmbs(k: Int): DataFrame =
      (0 until k).map { i =>
        embs0.select(
          (col("vec_id") + lit(i.toLong * nEmb)).as("vec_id"),
          (if (i == 0) col("embedding")
           else transform(col("embedding"), x => x + lit(i / 1000.0f))).as("embedding"))
      }.reduce(_ unionByName _)

    // (op, k) -> cpu_s, for the growth-factor summary
    val cpuBy = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]

    def time(op: String, k: Int, rows: Long)(body: => Long): Unit = {
      body // one warm pass (JIT + codegen), same protocol as Bench
      graft.CacheLifecycle.release(spark)
      spark.catalog.clearCache()
      val w0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val out = body
      val wall = (System.nanoTime() - w0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      graft.CacheLifecycle.release(spark)
      spark.catalog.clearCache()
      cpuBy((op, k)) = cpu
      println(f"PROBE $op%-16s k=$k%2d rows=$rows%7d out=$out%8d " +
        f"wall=$wall%7.2f cpu=$cpu%8.2f")
    }

    scales.foreach { k =>
      val docs = stage(scaledDocs(k), s"docs_$k")
      val embs = stage(scaledEmbs(k), s"embs_$k")
      val dRows = k * nDocs
      val eRows = k * nEmb

      time("exact_dedup", k, dRows) {
        graft.operators.Dedup.exact(docs, "text", "doc_id").count()
      }
      time("minhash_lsh", k, dRows) {
        graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text").count()
      }
      time("dup_spans", k, dRows) {
        graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text").count()
      }
      // the r15 lake-scale routing knob, exercised: the gram-instance-
      // sized span index goes to DISK_ONLY (the small census persist
      // stays unconditional inside the operator). The delta vs
      // dup_spans at the same k IS the documented spill trade —
      // re-read IO for the spans in exchange for leaving executor
      // storage memory to the frames that fit.
      time("dup_spans_disk", k, dRows) {
        graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text",
          spanIndexLevel = org.apache.spark.storage.StorageLevel.DISK_ONLY).count()
      }
      time("dsir_weights", k, dRows) {
        // r14 single-explode shape: per-doc bucket census persisted,
        // bucket fit + Σ llr·n scoring both read it. Deterministic
        // id-hash target slice (~25% of docs at any k).
        graft.operators.ImportanceWeights.weightsWithin(
          docs, col("doc_id") % 4 === 0, "doc_id", "text").count()
      }
      time("semdedup", k, eRows) {
        // cells ∝ corpus: the knob that keeps within-cell pairs bounded
        graft.operators.Dedup.semDedup(embs, "vec_id", "embedding",
          tau = 0.97, nCells = 16 * k, trainN = math.max(256, 32 * k)).count()
      }
      // vec_is_clean composed with an encode pass — the observability
      // pattern the ivfPqEncode scaladoc prescribes: the encode kernels
      // deliberately absorb corrupt rows (zero-pad, total function), so
      // a pipeline that must OBSERVE corruption censuses first and
      // encodes only the clean rows. ~2% of rows are deterministically
      // corrupted in the two absorbed ways (ragged slice, null
      // element); out = encoded clean rows, so the census is doing real
      // row-exclusion work, not just counting.
      time("vec_clean_encode", k, eRows) {
        val corrupted = embs.select(col("vec_id"),
          when(col("vec_id") % 97 === 0, slice(col("embedding"), 1, 32))
            .when(col("vec_id") % 101 === 0,
              transform(col("embedding"), (x, i) =>
                when(i === 0, lit(null).cast("float")).otherwise(x)))
            .otherwise(col("embedding")).as("embedding"))
        val clean = corrupted.filter(
          graft.functions.VectorFunctions.vec_is_clean(col("embedding"), 64))
        val model = graft.operators.Similarity.ivfPqTrain(
          clean, "vec_id", "embedding", dim = 64)
        graft.operators.Similarity.ivfPqEncode(
          clean, "vec_id", "embedding", model).count()
      }
      time("ivf_build_probe", k, eRows) {
        val idx = graft.operators.Similarity.ivfBuild(embs, "vec_id", "embedding")
        graft.operators.Similarity.ivfTopK(
          idx, "vec_id", "embedding", Array.fill(64)(0.1f), k = 10).count()
      }
      time("global_rank", k, dRows) {
        graft.operators.GlobalOrder.globalRank(
          docs, Seq(col("doc_id")), parts = 8 * k).count()
      }
      // expansion join: output Σ|block|² pairs dwarfs input; the x59
      // lesson (parallelism from an explicit block-keyed exchange, not
      // file layout) is exactly what must keep this linear-in-k — the
      // alphabet rotation maps each copy to its own block values, so
      // block SIZES stay constant and block COUNT grows with k
      time("fuzzy_match", k, dRows) {
        graft.operators.FuzzyMatch.blockedSelfMatch(
          docs.select(col("doc_id"), substring(col("text"), 1, 12).as("name")),
          "doc_id", "name", substring(col("name"), 1, 2), 0.85).count()
      }
      // one-pass corpus stats broadcast + scoring scan — cost is the
      // token scan, match-count-independent (rotated copies simply
      // score 0 for the fixed query terms)
      time("bm25_score", k, dRows) {
        graft.operators.Bm25.score(docs, "text", Seq("the", "and", "of")).count()
      }
      time("winnowing", k, dRows) {
        docs.select(col("doc_id"),
            explode(graft.operators.TextAnalysis.winnowingFingerprints(col("text"))).as("fp"))
          .groupBy("fp").agg(count(lit(1)).as("docs")).count()
      }
      // r12 in-row pair expansion. Density-preserving fixture (same
      // principle as the affine-permutation text copies): baskets are
      // 4 consecutive SAME-COPY docs and items carry a per-copy
      // namespace prefix, so every copy's basket structure is
      // isomorphic to copy 0 — per-pair supports are k-invariant,
      // the mined pair set grows exactly ∝ k, and the
      // distinct/collect/expand work is linear in baskets. (A naive
      // `doc_id % B` basketing mixed copies and COLLAPSED supports:
      // CPU shrank ×0.6 at 16× because pruning strengthened — the
      // fixture measuring the wrong thing, caught by its own output
      // column.)
      time("frequent_pairs", k, dRows) {
        // copy-scoped basket id: (copy index, within-copy doc group) —
        // a bare doc_id/4 only keeps copies apart when nDocs % 4 == 0;
        // for any other corpus the basket at a copy boundary mixes
        // namespaces and supports stop being k-invariant (the fixture
        // failure mode documented above, guarded by construction here)
        val copyBaskets = lit((nDocs + 3) / 4)
        val baskets = docs.select(
          ((col("doc_id") / lit(nDocs)).cast("long") * copyBaskets +
            ((col("doc_id") % lit(nDocs)) / 4).cast("long")).as("bk"),
          concat((col("doc_id") / lit(nDocs)).cast("long").cast("string"),
            lit(":"), substring(col("text"), 1, 1)).as("item"))
        graft.operators.Cooccur.frequentPairs(
          baskets, "bk", "item", minSupport = 2).count()
      }
    }

    // growth factors vs the k=1 run — linear work shows ~k
    val base = scales.head
    println(f"\nGROWTH (cpu_k / cpu_${base}%d; linear ⇒ ≈k/${base}%d)")
    cpuBy.keys.map(_._1).toSeq.distinct.foreach { op =>
      val line = scales.map { k =>
        val r = cpuBy((op, k)) / cpuBy((op, base))
        f"k=$k%2d:${r}%6.2f"
      }.mkString("  ")
      println(f"GROWTH $op%-16s $line")
    }
    spark.stop()
  }
}
