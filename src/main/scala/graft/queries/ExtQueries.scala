package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, Dedup, Multimodal, RangeJoin, Similarity, TextAnalysis => TA}

/** Extension-operator queries (SURVEY §2.12) over the `documents` and
  * `embeddings` tables: dedup family, similarity search, text analysis,
  * multimodal plumbing. Oracle SQL is declared wherever the operator is
  * portably SQL-expressible; signature/LSH operators get the rows-only
  * check (their semantics are pinned by `ExtOpsSpec` unit tests).
  */
object ExtQueries {

  private def q(name: String, oracle: String)(
      body: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, body, Some(oracle))

  private def noOracle(name: String)(body: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, body, None)

  /** Exact dedup: keep-first-per-content-key, oracle-checked. */
  val x01_dedup_exact: QuerySpec = q("x01_dedup_exact",
    """SELECT doc_id, lang FROM
      |  (SELECT doc_id, lang,
      |     row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
      |   FROM documents) t
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.exact(Tables.documents(s, d), "text", "doc_id")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Dup-group inventory (how much would exact dedup remove). */
  val x02_dedup_groups: QuerySpec = q("x02_dedup_groups",
    """SELECT cast(count(*) AS BIGINT) AS dup_groups,
      |  cast(coalesce(sum(n - 1), 0) AS BIGINT) AS removable
      |FROM (SELECT md5(lower(trim(text))) AS k, count(*) AS n
      |      FROM documents GROUP BY 1 HAVING count(*) > 1) t""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(Dedup.contentKey(col("text")).as("k"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("dup_groups"),
        coalesce(sum(col("n") - 1), lit(0L)).as("removable"))
  }

  // MinHash candidates are expensive and shared by x03/x04: memoize the
  // persisted candidate DataFrame per (session, dir).
  private val candCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def minhashCands(s: SparkSession, d: String): DataFrame =
    candCache.getOrElseUpdate((s, d),
      Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** MinHash+LSH near-dup candidate pairs (rows-only: LSH not
    * SQL-expressible; semantics unit-tested).
    */
  val x03_minhash_neardup: QuerySpec = noOracle("x03_minhash_neardup") { (s, d) =>
    minhashCands(s, d)
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("a", "b")
  }

  /** Exact n-gram Jaccard verification of the MinHash candidates. */
  val x04_ngram_jaccard: QuerySpec = noOracle("x04_ngram_jaccard") { (s, d) =>
    val docs = Tables.documents(s, d)
    val cands = minhashCands(s, d).filter(col("est_jaccard") >= 0.5)
    Dedup.ngramJaccard(docs, "doc_id", "text", cands)
      .select("a", "b", "est_jaccard", "jaccard")
      .orderBy("a", "b")
  }

  /** SimHash near-dup pairs within Hamming distance 3. */
  val x05_simhash: QuerySpec = noOracle("x05_simhash") { (s, d) =>
    Dedup.simhashCandidates(Tables.documents(s, d), "doc_id", "text")
      .orderBy("a", "b")
  }

  /** Embedding cosine near-dup pairs via sign-LSH buckets. The
    * synthetic embeddings are random (max pairwise cosine ≈ 0.51), so
    * the threshold is set data-relative to exercise the operator; a
    * production near-dup filter would use ≥0.95 on real embeddings.
    */
  val x06_embedding_neardup: QuerySpec = noOracle("x06_embedding_neardup") { (s, d) =>
    Dedup.embeddingNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
      threshold = 0.3, dim = 64, signBits = 2)
      .orderBy("a", "b")
  }

  /** Brute-force cosine top-k against a fixed deterministic query,
    * oracle-checked: DuckDB recomputes the cosine in double arithmetic
    * (embedding cast DOUBLE[], query = float-rounded sin values cast
    * back to double — exactly the numbers the engine's float arrays
    * hold). Both sides select by the ROUNDED score + vec_id so the
    * top-10 set is stable against last-ulp ordering noise.
    */
  val x07_ann_bruteforce: QuerySpec = q("x07_ann_bruteforce", {
    val qv = (1 to 64).map(i => s"CAST(CAST(sin($i) AS REAL) AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"""SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), $qv), 4) AS cosine
       |FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
  }) { (s, d) =>
    val query = typedLit(Array.tabulate(64)(i => math.sin(i + 1).toFloat))
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.vec_cosine(col("embedding"), query), 4)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** LSH-bucketed ANN top-k (scale path of x07). */
  val x08_ann_lsh: QuerySpec = noOracle("x08_ann_lsh") { (s, d) =>
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding", query,
      k = 10, dim = 64)
  }

  /** Language-ID heuristic vs the labeled lang column (confusion
    * counts). Oracle re-implements the marker argmax in DuckDB list
    * SQL: same tokenization (`\s+` on lower∘trim), same distinct-marker
    * hit counts (`list_intersect` dedupes exactly like Spark's
    * `array_intersect`), same tie-break (Spark's array_max over
    * (hits, lang) structs picks the alphabetically-LAST language on
    * equal hits — hence the reverse-alphabetical CASE).
    */
  val x09_langid: QuerySpec = q("x09_langid", {
    val langs = TA.markers.keys.toSeq.sorted
    val hitExprs = langs.map { l =>
      val lst = TA.markers(l).map(m => s"'${m}'").mkString("[", ", ", "]")
      s"len(list_intersect(regexp_split_to_array(lower(trim(text)), '\\s+'), $lst)) AS h_$l"
    }.mkString(",\n      ")
    val bestExpr = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val caseArms = langs.reverse.map(l => s"WHEN h_$l = best THEN '$l'").mkString("\n        ")
    s"""WITH hits AS (SELECT lang,
      $hitExprs
      FROM documents),
    best AS (SELECT *, $bestExpr AS best FROM hits)
    SELECT lang,
      CASE WHEN best = 0 THEN 'und'
        $caseArms
      END AS pred,
      count(*) AS n
    FROM best GROUP BY lang, pred ORDER BY lang, pred"""
  }) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), TA.languageId(col("text")).as("pred"))
      .groupBy("lang", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred")
  }

  /** Quality metrics per language — oracle-checked (portable math). */
  val x10_quality: QuerySpec = q("x10_quality",
    """SELECT lang,
      |  round(avg(length(text)), 4) AS avg_chars,
      |  round(avg(length(text) - length(replace(text, ' ', '')) + 1), 4) AS avg_words,
      |  round(avg(cast(length(replace(text, ' ', '')) AS DOUBLE)
      |        / (length(text) - length(replace(text, ' ', '')) + 1)), 4) AS avg_word_len
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val text = col("text")
    val words = length(text) - length(regexp_replace(text, lit(" "), lit(""))) + 1
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        round(avg(length(text)), 4).as("avg_chars"),
        round(avg(words), 4).as("avg_words"),
        round(avg(length(regexp_replace(text, lit(" "), lit(""))).cast("double") / words), 4)
          .as("avg_word_len"))
      .orderBy("lang")
  }

  /** Token counting: whitespace + BPE-ish regex, both portable. */
  val x11_tokens: QuerySpec = q("x11_tokens",
    """SELECT lang,
      |  cast(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS ws_tokens,
      |  cast(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS bpeish_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        sum(TA.wsTokenCount(col("text"))).cast("bigint").as("ws_tokens"),
        sum(regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]")))
          .cast("bigint").as("bpeish_tokens"))
      .orderBy("lang")
  }

  /** Order-insensitive fingerprint dedup — oracle-checked. */
  val x12_fingerprint: QuerySpec = q("x12_fingerprint",
    """SELECT lang, count(DISTINCT md5(array_to_string(list_sort(string_split(lower(trim(text)), ' ')), ' '))) AS distinct_fp,
      |  count(*) AS docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(countDistinct(TA.fingerprint(col("text"))).as("distinct_fp"),
        count(lit(1)).as("docs"))
      .orderBy("lang")
  }

  /** Multimodal plumbing: blob struct + batched (stubbed) feature
    * extraction + frame sampling over binary payloads synthesized from
    * document text.
    */
  val x13_multimodal: QuerySpec = noOracle("x13_multimodal") { (s, d) =>
    val withBlob = Multimodal.attachBlob(
      Tables.documents(s, d).withColumn("payload", encode(col("text"), "UTF-8")),
      "payload", "application/octet-stream")
    Multimodal.extractFeatures(withBlob)
      .select(col("doc_id"), col("blob.meta.size_bytes").as("size_bytes"),
        element_at(col("features"), 1).as("f_len"),
        round(element_at(col("features"), 2), 4).as("f_mean"))
      .orderBy("doc_id")
  }

  /** End-to-end near-dup removal: LSH candidates → Jaccard verify →
    * keep-first drop.
    */
  val x14_neardup_remove: QuerySpec = noOracle("x14_neardup_remove") { (s, d) =>
    Dedup.nearDupRemove(Tables.documents(s, d), "doc_id", "text",
        precomputedCandidates = Some(minhashCands(s, d)))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** IVF ANN top-k (KMeans coarse quantizer, nprobe cell scan). */
  val x15_ann_ivf: QuerySpec = noOracle("x15_ann_ivf") { (s, d) =>
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val index = Similarity.ivfBuild(Tables.embeddings(s, d), "vec_id", "embedding")
    Similarity.ivfTopK(index, "vec_id", "embedding", query, k = 10)
  }

  /** The composite training-data pipeline: exact dedup → near-dup
    * removal → quality filter → per-language token budget. The shape a
    * 100 TB corpus-cleaning job takes end-to-end; every stage is one of
    * the operators above.
    */
  val x16_clean_corpus: QuerySpec = noOracle("x16_clean_corpus") { (s, d) =>
    val docs = Tables.documents(s, d)
    val exact = Dedup.exact(docs, "text", "doc_id")
    val nearDeduped = Dedup.nearDupRemove(exact, "doc_id", "text",
      precomputedCandidates = Some(minhashCands(s, d)))
    nearDeduped
      .withColumn("quality", TA.qualityScore(col("text")))
      .filter(col("quality") >= 0.3)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs_kept"),
        sum(TA.bpeishTokenCount(col("text"))).cast("bigint").as("tokens"),
        round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy("lang")
  }

  /** Winnowing (rolling-hash) fingerprint overlap: documents sharing
    * ≥ minShared selected fingerprints — local-similarity detection
    * that survives insertions/deletions the way whole-doc hashing
    * cannot.
    */
  val x17_winnowing: QuerySpec = noOracle("x17_winnowing") { (s, d) =>
    val fps = Tables.documents(s, d)
      .select(col("doc_id"), explode(TA.winnowingFingerprints(col("text"))).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stop-fingerprint removal: a fingerprint present in many documents
    // is a common phrase, not a similarity signal, and it is also the
    // hot key that makes the inverted self-join quadratic. Standard
    // winnowing practice and the scale guard at 100 TB.
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df")).filter(col("df") <= 20)
    val kept = fps.join(broadcast(rare.select("fp")), Seq("fp"), "left_semi")
    val l = kept.select(col("fp"), col("doc_id").as("a"))
    val r = kept.select(col("fp"), col("doc_id").as("b"))
    l.join(r, Seq("fp")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 25)
      .orderBy("a", "b")
  }

  /** Region rollup — exercises the one table no other query scans, so
    * every synthetic table has oracle-verified coverage.
    */
  /** Multimodal blob metadata + frame sampling, oracle-checked: the
    * blob struct's byte size and the demux frame count are plain
    * integer math DuckDB reproduces (`octet_length(encode(text))` =
    * Spark's `length(encode(text,'UTF-8'))`; frames = one per 256-byte
    * stride). Complements x13, whose stubbed feature floats stay
    * rows-only.
    */
  val x19_multimodal_frames: QuerySpec = q("x19_multimodal_frames",
    """SELECT doc_id,
      |  cast(octet_length(encode(text)) AS BIGINT) AS size_bytes,
      |  cast(floor(greatest(octet_length(encode(text)) - 1, 0) / 256) + 1 AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withBlob = Multimodal.attachBlob(
      Tables.documents(s, d).withColumn("payload", encode(col("text"), "UTF-8")),
      "payload", "application/octet-stream")
    Multimodal.sampleFrames(withBlob, "blob", 256)
      .groupBy(col("doc_id"), col("blob.meta.size_bytes").as("size_bytes"))
      .agg(count(lit(1)).as("n_frames"))
      .orderBy("doc_id")
  }

  val x18_region_rollup: QuerySpec = q("x18_region_rollup",
    """SELECT r.r_name, count(*) AS nations,
      |  cast(sum(CASE WHEN n.n_name LIKE 'A%' THEN 1 ELSE 0 END) AS BIGINT) AS a_nations
      |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin) { (s, d) =>
    Tables.region(s, d)
      .join(broadcast(Tables.nation(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("nations"),
        sum(when(col("n_name").startsWith("A"), 1L).otherwise(0L)).as("a_nations"))
      .orderBy("r_name")
  }

  /** CUBE aggregation (all grouping-set combinations) — the reporting
    * shape over a cleaned corpus; oracle-checked in both engines.
    */
  val x20_cube: QuerySpec = q("x20_cube",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  cast(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        round(sum(col("l_quantity")), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"), col("qty"))
      .orderBy("rf", "ls")
  }

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`) — the distribution-profiling shape for corpus
    * quality cutoffs.
    */
  val x21_percentile: QuerySpec = q("x21_percentile",
    """SELECT lang,
      |  round(quantile_cont(n_chars, 0.5), 2) AS p50,
      |  round(quantile_cont(n_chars, 0.9), 2) AS p90
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 2).as("p90"))
      .orderBy("lang")
  }

  /** As-of join: each click enriched with the latest preceding view's
    * value per user. The engine composes it from a union + one window
    * sweep (operators/AsOfJoin); the oracle is DuckDB's NATIVE
    * `ASOF LEFT JOIN` — a genuinely independent implementation of the
    * same semantics (excluded from the spark.sql parity run for that
    * reason).
    */
  val x22_asof: QuerySpec = q("x22_asof",
    """SELECT c.event_id, c.user_id, round(v.value, 2) AS asof_value
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "value")
    AsOfJoin.asOfJoin(clicks, views, Seq("user_id"), "ts", Seq("value"))
      .select(col("event_id"), col("user_id"),
        round(col("asof_value"), 2).as("asof_value"))
      .orderBy("event_id")
  }

  /** Range join: documents matched into every language's typical-length
    * band (avg ± stddev). The engine buckets the inequality into an
    * equi shuffle join (operators/RangeJoin); the oracle is DuckDB's
    * plain BETWEEN join (its IEJoin) — an independent implementation.
    * Band edges round to 4dp on both sides so FP differences in the
    * two engines' stddev accumulation can't flip a boundary.
    */
  val x23_rangejoin: QuerySpec = q("x23_rangejoin",
    """WITH bands AS (SELECT lang AS band_lang,
      |    round(avg(n_chars) - stddev(n_chars), 4) AS lo,
      |    round(avg(n_chars) + stddev(n_chars), 4) AS hi
      |  FROM documents GROUP BY lang)
      |SELECT band_lang, cast(count(*) AS BIGINT) AS docs_in_band
      |FROM bands JOIN documents d ON d.n_chars BETWEEN bands.lo AND bands.hi
      |GROUP BY band_lang ORDER BY band_lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val bands = docs.groupBy(col("lang").as("band_lang"))
      .agg(round(avg(col("n_chars")) - stddev(col("n_chars")), 4).as("lo"),
        round(avg(col("n_chars")) + stddev(col("n_chars")), 4).as("hi"))
    RangeJoin.bandJoin(bands, "lo", "hi",
        docs.select(col("doc_id"), col("n_chars")), "n_chars", bucketWidth = 64.0)
      .groupBy("band_lang")
      .agg(count(lit(1)).cast("bigint").as("docs_in_band"))
      .orderBy("band_lang")
  }

  /** Deterministic stratified sampling: top-N per language by a
    * content-independent hash of the id — the reproducible-subset
    * primitive every training-data pipeline needs (rand()-based
    * sampling can't be re-derived or oracle-checked; md5-ordering is
    * identical in any engine, so the exact sample is portable).
    */
  val x24_sample: QuerySpec = q("x24_sample",
    """SELECT lang, doc_id FROM
      |  (SELECT lang, doc_id,
      |     row_number() OVER (PARTITION BY lang ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rn
      |   FROM documents) t
      |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")
  }

  /** Near-dup CLUSTER dedup: candidates → exact verification →
    * connected components → keep min-id per cluster (the production
    * LSH-dedup semantics; strictly stronger than pairwise keep-first).
    * Rows-only (minhash-derived); component logic unit-proven.
    */
  val x25_neardup_clusters: QuerySpec = noOracle("x25_neardup_clusters") { (s, d) =>
    Dedup.nearDupRemoveCC(Tables.documents(s, d), "doc_id", "text",
        precomputedCandidates = Some(minhashCands(s, d)))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Semi-structured extraction: JSON property pulled out of the
    * events `props` column and aggregated — the schema-on-read shape
    * for event payloads (Spark `get_json_object` ≡ DuckDB
    * `json_extract_string`, shimmed).
    */
  val x26_json: QuerySpec = q("x26_json",
    """SELECT event_type,
      |  cast(sum(cast(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |  round(avg(cast(json_extract_string(props, '$.k') AS BIGINT)), 2) AS k_avg
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("bigint")
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(sum(k).cast("bigint").as("k_sum"), round(avg(k), 2).as("k_avg"))
      .orderBy("event_type")
  }

  /** Interval-overlap join: users whose activity windows overlap — the
    * 1-D grid decomposition (both sides bucketed, reference-point
    * exactly-once) vs DuckDB's plain inequality join as oracle.
    */
  val x27_interval_overlap: QuerySpec = q("x27_interval_overlap",
    """WITH w AS (SELECT user_id, epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
      |  FROM events GROUP BY user_id)
      |SELECT a.user_id, cast(count(*) AS BIGINT) AS n_overlapping
      |FROM w a JOIN w b
      |  ON a.lo <= b.hi AND b.lo <= a.hi AND a.user_id < b.user_id
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin) { (s, d) =>
    // µs integers on both sides (timestamps carry sub-second parts;
    // epoch_us ≡ unix_micros is the proven parity pair from Q32)
    val w = Tables.events(s, d)
      .groupBy("user_id")
      .agg(unix_micros(min(col("ts")).cast("timestamp")).as("lo"),
        unix_micros(max(col("ts")).cast("timestamp")).as("hi"))
    val a = w.select(col("user_id").as("a_user"), col("lo").as("a_lo"), col("hi").as("a_hi"))
    val b = w.select(col("user_id").as("b_user"), col("lo").as("b_lo"), col("hi").as("b_hi"))
    // width auto-derived (median window length): these windows span
    // nearly the whole corpus timeline, so a fixed day-wide width
    // replicated every interval into every bucket (r2's slowest query)
    RangeJoin.intervalOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi")
      .filter(col("a_user") < col("b_user"))
      .groupBy(col("a_user").as("user_id"))
      .agg(count(lit(1)).cast("bigint").as("n_overlapping"))
      .orderBy("user_id")
  }

  val all: Seq[QuerySpec] = Seq(
    x01_dedup_exact, x02_dedup_groups, x03_minhash_neardup, x04_ngram_jaccard,
    x05_simhash, x06_embedding_neardup, x07_ann_bruteforce, x08_ann_lsh,
    x09_langid, x10_quality, x11_tokens, x12_fingerprint, x13_multimodal,
    x14_neardup_remove, x15_ann_ivf, x16_clean_corpus, x17_winnowing,
    x18_region_rollup, x19_multimodal_frames, x20_cube, x21_percentile,
    x22_asof, x23_rangejoin, x24_sample, x25_neardup_clusters, x26_json,
    x27_interval_overlap)
}
