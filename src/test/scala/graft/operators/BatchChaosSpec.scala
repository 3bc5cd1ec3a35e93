package graft.operators

import graft.SparkTestBase
import graft.tools.{BatchChaosProbe, StreamChaosProbe}

/** Batch-surface chaos pins (companion to `StreamChaosSpec`): the
  * LLM-pipeline operators against [[BatchChaosProbe.hostileDir]]'s
  * hostile documents / embeddings / events. Full-surface sweeps run
  * via `sbt "runMain graft.tools.BatchChaosProbe"` (151 entries,
  * ~3 min); this spec pins the ADJUDICATED contract on a curated
  * subset so the suite stays fast:
  *
  *  - the vector-quantizer family fails LOUDLY on a ragged training
  *    vector with a message that names the mixed dimensions (the
  *    pre-r17 state was an opaque ArrayIndexOutOfBounds deep in
  *    k-means accumulation) — ragged null-free vectors are a CALLER
  *    error, same policy as GramAgg's dim require;
  *  - null vectors and vectors carrying a null ELEMENT are excluded
  *    from training (row corruption, not caller error);
  *  - the dedup / text-analysis / sketch / multimodal families uphold
  *    their documented corrupt-row policies end-to-end (no opaque
  *    task deaths on null text, null ids, conflicting duplicates,
  *    zero vectors, NaN/Infinity elements);
  *  - x33 excludes a digitless source label (NULLIF-guarded cast,
  *    oracle mirrored) instead of dying in the ANSI cast.
  */
class BatchChaosSpec extends SparkTestBase {

  private lazy val dir = BatchChaosProbe.hostileDir(spark)

  private val loudRagged = Seq(
    "x47_ann_pq", "x48_ann_ivfpq", "x70_semdedup", "x101_semdedup_layout")

  // representative survivors across the operator families that read
  // the hostile three tables (dedup, minhash/jaccard, simhash,
  // embedding near-dup, text analysis, sketches, spans, sessions,
  // multimodal, retrieval, mix weights, curation capstone)
  // x91 intentionally absent: it fails loudly on the ragged row by
  // policy, pinned in the loud-ragged test above
  private val mustSurvive = Seq(
    "x01_dedup_exact", "x03_minhash_neardup", "x04_ngram_jaccard",
    "x05_simhash", "x06_embedding_neardup", "x07_ann_bruteforce",
    "x09_langid", "x10_quality", "x13_multimodal", "x17_winnowing",
    "x28_decontaminate", "x30_token_budget", "x33_mix_weights",
    "x37_paragraph_dedup", "x41_sessions", "x68_dup_spans",
    "x69_dsir_weights", "x74_kmv_distinct", "x84_matryoshka",
    "x86_binary_quantize", "x94_rrf_fusion", "x100_curation_pipeline")

  test("quantizer training fails LOUDLY (named dimensions) on a ragged vector") {
    loudRagged.foreach { n =>
      val o = StreamChaosProbe.run(spark, dir, n)
      assert(o.error.isDefined, s"$n must fail on a ragged training vector")
      assert(o.error.get.contains("mixes vector dimensions 16/64"),
        s"$n must die with the clear mixed-dimension require, got: ${o.error.get}")
    }
    // the IVF trainer shares trainSample since r21 (local Lloyd), so it
    // dies with the SAME clear mixed-dimension require as the PQ family
    val ivf = StreamChaosProbe.run(spark, dir, "x15_ann_ivf")
    assert(ivf.error.exists(_.contains("mixes vector dimensions 16/64")),
      s"x15 must fail with the clear mixed-dimension require, got: ${ivf.error}")
    // covariance: the documented GramAgg dim require
    val cov = StreamChaosProbe.run(spark, dir, "x91_embedding_covariance")
    assert(cov.error.exists(e => e.contains("expected dim-") && e.contains("64")),
      s"x91 must fail with the GramAgg dim require, got: ${cov.error}")
  }

  test("dedup/text/sketch/multimodal families survive the hostile tables") {
    val outcomes = mustSurvive.map(n => StreamChaosProbe.run(spark, dir, n))
    val failed = outcomes.filter(_.error.isDefined)
    assert(failed.isEmpty,
      failed.map(o => s"${o.name}: ${o.error.get}").mkString("; "))
    // and they produce SOMETHING — a hostile corpus must not silently
    // empty an operator whose clean twin returns rows
    val empty = outcomes.filter(_.rows.contains(0L))
      // legitimately 0 on THIS corpus: x28's eval set shares no grams
      // with it; x33 excludes every digitless source (the documented
      // NULLIF policy — all hostile sources are digitless); x100's
      // Gopher gate rejects the repetitive synthetic vocabulary
      .filterNot(o => Set("x28_decontaminate", "x33_mix_weights",
        "x100_curation_pipeline")(o.name))
    assert(empty.isEmpty,
      s"unexpectedly empty on hostile input: ${empty.map(_.name).mkString(",")}")
  }

  test("a NaN/Infinity embedding can never hijack a cosine top-k") {
    // Spark orders NaN ABOVE every real double, so a corrupt vector's
    // NaN cosine used to TOP x07/x84/x86 (measured pre-fix: hostile
    // ids 204/205 at ranks 1-2). vec_cosine now returns NULL for
    // non-finite results; desc ordering sinks them below every match.
    Seq("x07_ann_bruteforce", "x84_matryoshka", "x86_binary_quantize").foreach { n =>
      val rows = graft.SparkEntry.queries(n)(spark, dir).collect()
      assert(rows.nonEmpty, s"$n returned nothing")
      val ids = rows.map(_.getLong(0)).toSeq
      assert(!ids.take(3).exists(Set(204L, 205L, 206L)),
        s"$n: corrupt vectors rank in the top 3: $ids")
      rows.foreach { r =>
        (1 until r.length).foreach { i =>
          assert(r.isNullAt(i) || !r.get(i).isInstanceOf[Double] ||
            !r.getDouble(i).isNaN, s"$n emitted NaN: $r")
        }
      }
    }
  }

  test("x33 excludes digitless source labels instead of dying in the ANSI cast") {
    val out = graft.SparkEntry.queries("x33_mix_weights")(spark, dir).collect()
    // hostile sources are 'web'/'crawl'/null - no digits anywhere, so
    // every weight is NULL and the sampler keeps nothing; the point is
    // it RUNS (the pre-r17 state was CAST_INVALID_INPUT on '')
    assert(out.forall(r => r.getLong(1) >= 0))
  }
}
