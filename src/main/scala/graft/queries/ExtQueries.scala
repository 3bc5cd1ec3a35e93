package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, Bm25, Dedup, FuzzyMatch, HashSplit, Multimodal, RangeJoin, Sessionize, Similarity, TextAnalysis => TA}
import graft.functions.TopKAgg

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

  /** DuckDB-dialect-only oracle (VALUES golden or list/recursive SQL
    * that has no Spark twin) — checked by the driver's DuckDB compare,
    * excluded from the spark.sql parity run.
    */
  private def duck(name: String, oracle: String)(
      body: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, body, Some(oracle), sparkParity = false)

  /** Checkpoint-file checksums (Spark 4.1 ships them ON) generate a
    * sidecar checksum file — and, measured on this build, one
    * short-lived thread per file close (`ChecksumCancellableFSDataOutputStream.close`
    * fires a Future on a fresh-thread pool) — for EVERY checkpoint
    * file: offsets, commits, and each state store instance's delta
    * per batch. That protection is for DURABLE checkpoints recovered
    * across process lifetimes; every streaming entry here runs a
    * memory-sink query against a throwaway temp-dir checkpoint that
    * is written and discarded inside one process, where a verify-on-
    * reread of a file this same JVM just wrote buys nothing. Measured
    * (r22, StreamBatchProbe): the attribution join's 32 store
    * instances paid 6.9–12.6 summed commit-seconds per batch with
    * checksums vs 1.4–1.7 without (x90 wall 6.4 → 2.6 s). Scoped to
    * these ephemeral-checkpoint queries, NOT a session default — a
    * production stream with a durable checkpoint should keep it on.
    */
  /** Second leg, same rationale: the default FileContext-based
    * checkpoint manager's `renameTempFile` runs Hadoop's
    * `FileSystem.rename(src, dst, OVERWRITE)`, whose symlink probe
    * (`getFileLinkStatus` → `FileUtil.readLink`) FORKS a `readlink`
    * process per rename when the native Hadoop library is absent —
    * thread dumps showed 40% of streaming task samples inside
    * `ProcessImpl.forkAndExec` under that rename, ~10–40 ms per
    * checkpoint file (every state-store delta + offsets + commits,
    * per batch). Spark's own FileSystem-based manager renames via
    * `fs.rename(src, dst)` (plain `File.renameTo`, no probe):
    * measured, store commit 1.39 → 0.06–0.12 summed seconds on the
    * attribution join, walCommit/commitOffsets 40 → ~10 ms. Its
    * rename is check-then-rename rather than atomic-overwrite, which
    * is irrelevant for a single-process throwaway checkpoint (one
    * writer per file, directory deleted at stop); durable multi-writer
    * checkpoints should keep the FileContext default.
    */
  private def withEphemeralCheckpoint[T](s: SparkSession)(body: => T): T = {
    val ckKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val fmKey = "spark.sql.streaming.checkpointFileManagerClass"
    val prevCk = s.conf.get(ckKey)
    val prevFm = s.conf.getOption(fmKey)
    s.conf.set(ckKey, "false")
    s.conf.set(fmKey,
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    try body finally {
      s.conf.set(ckKey, prevCk)
      prevFm match {
        case Some(v) => s.conf.set(fmKey, v)
        case None => s.conf.unset(fmKey)
      }
    }
  }

  /** Stateful streaming entries: state partitioning is fixed at QUERY
    * START and every partition carries its own state stores with a
    * per-batch commit cost, so size it to the fixture key cardinality
    * (150 users / 5 event types here; a cluster sizes it to cores × a
    * small factor), not the 32-partition batch default — measured on
    * x61, 32 partitions tripled the sweep cost in pure state-store
    * overhead (11.4 s → 2.9 s at sf0.1). The conf is restored only
    * AFTER processAllAvailable: the stream thread reads it
    * asynchronously after start(), so an eager restore races.
    */
  private def withStateParts[T](s: SparkSession, n: Int,
      noDataBatches: Boolean = true)(body: => T): T = {
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val prevNd = s.conf.get(ndKey)
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    // noDataBatches = false skips the trailing EMPTY micro-batch Spark
    // schedules after the watermark advances. Legal only for entries
    // whose ANSWER is fully emitted by the data batches — complete-mode
    // sinks (replaced wholesale every batch: x54/x93/x96), immediate
    // append emitters (dropDuplicates[WithinWatermark]: x71/x98), and
    // the INNER stream-stream join (x61) — where the extra batch only
    // performs state cleanup the bench rep then throws away with the
    // query. It is WRONG wherever emission itself waits on the
    // watermark: outer joins (x90's null rows) and append-mode
    // windowed aggregations. Saves one full cycle of per-partition
    // state-store load/commit + planning per run — a pure lifecycle
    // constant at any corpus size.
    s.conf.set(ndKey, noDataBatches.toString)
    try withEphemeralCheckpoint(s)(body) finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.conf.set(ndKey, prevNd)
    }
  }

  /** Distinct raw 5-gram sets per document in DuckDB list SQL — the
    * independent twin of `Dedup.shingleHashes` (hash-free: Jaccard over
    * raw n-grams equals Jaccard over 64-bit-hashed n-grams unless FNV
    * collides, ~2⁻⁶⁴). `n >= 0.8*m` length pruning is SOUND for
    * j >= 0.8: |A∩B| <= min ∧ |A∪B| >= max ⇒ j <= min/max.
    */
  private val gramsCte =
    """grams AS (
      |  SELECT doc_id, g, len(g) AS n FROM (
      |    SELECT doc_id,
      |      list_distinct([substr(s, i, 5) FOR i IN range(1, greatest(len(s)-3, 2))]) AS g
      |    FROM (SELECT doc_id, lower(trim(text)) AS s FROM documents)))""".stripMargin

  /** All-pairs verified near-dup edges (exact Jaccard >= 0.8) — no LSH
    * anywhere: if the engine's MinHash banding ever dropped a true
    * pair, the driver compare would surface the recall loss.
    */
  /** Verified near-dup edges, oracle side. Candidate-restricted (r15):
    * the pair list comes from the INDEPENDENT Python-mirror golden
    * (tools/golden_ext.py's banded MinHash — not the engine) at the
    * family's est ≥ 0.65 threshold, and DuckDB recomputes the exact
    * Jaccard from raw 5-grams on those pairs only. The previous
    * all-pairs self-join was quadratic in the corpus and had to be
    * skipped at the sf0.1 re-verification (r14 verdict task 3); this
    * form is the x04 pattern — output-proportional, comparable at any
    * scale — and the recall guarantee the all-pairs form carried is
    * preserved by golden_ext.py's generation-time audit (every true
    * all-pairs Jaccard ≥ 0.8 pair must be a banded candidate at
    * est ≥ 0.65, asserted while the goldens are derived).
    */
  private val verifiedCte =
    s"""$gramsCte,
       |cand AS (
       |  SELECT a, b FROM ${Goldens.valuesTable("x03_minhash_neardup.tsv",
           Seq("a" -> "BIGINT", "b" -> "BIGINT", "est_jaccard" -> "DOUBLE"))}
       |  WHERE est_jaccard >= 0.65),
       |verified AS (
       |  SELECT c.a, c.b
       |  FROM cand c
       |  JOIN grams ga ON ga.doc_id = c.a
       |  JOIN grams gb ON gb.doc_id = c.b
       |  WHERE CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
       |        / len(list_distinct(ga.g || gb.g)) >= 0.8)""".stripMargin

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
  // persisted candidate DataFrame per (session, dir). Evicted by
  // CacheLifecycle.release (hook below) together with the persists it
  // hands out — a memo surviving its persist would silently recompute
  // the candidate pipeline on every later use. The layout memo is NOT
  // evicted: it caches an on-disk path, not executor storage.
  private val candCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  // The verified near-dup EDGE set (exact 5-gram Jaccard >= 0.8 over
  // the est>=0.65-prefiltered LSH candidates) and its connected
  // components, shared by the whole near-dup family (x14 pair-drop,
  // x25 cluster dedup, x77 leakage-safe split). Before r12, x77 rebuilt
  // the verify+CC chain per execution while x14/x25 shared only the
  // CANDIDATES — the r11 driver sweep measured that recompute exposure
  // at x29 CPU (60.7 CPU-s) when the operator-internal persists
  // stopped serving across reps in the driver environment. The comps
  // memo is immune by construction: components materialize ONCE per
  // (session, dir) into a driver-local frame (the pair list is far
  // below the union-find threshold at any test sf), so later
  // executions never touch the minhash chain at all.
  private val verifiedCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val compsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  // the winnowing fingerprint frame (x17): explode over the whole
  // corpus, persisted — without a memo every execution between
  // releases re-exploded AND stacked a fresh tracked cache entry
  private val winnowFpCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  graft.CacheLifecycle.onRelease { s =>
    candCache.filterInPlace { case ((sess, _), _) => sess ne s }
    verifiedCache.filterInPlace { case ((sess, _), _) => sess ne s }
    compsCache.filterInPlace { case ((sess, _), _) => sess ne s }
    winnowFpCache.filterInPlace { case ((sess, _), _) => sess ne s }
    // the LAYOUT memos survive release by design (the layout is on
    // disk; forgetting the path would re-run a full distributed write
    // per release) — but entries for STOPPED sessions are dead weight
    // that strongly retains the whole SparkSession forever (r20
    // review): evict those here, the one periodic hook this file has
    lshLayoutCache.filterInPlace { case ((sess, _), _) =>
      !sess.sparkContext.isStopped }
    semDedupLayoutCache.filterInPlace { case ((sess, _), _) =>
      !sess.sparkContext.isStopped }
  }

  // guards every memo builder below: TrieMap.getOrElseUpdate may
  // evaluate a contended builder twice, and these builders persist (or
  // write a layout) as a side effect — the losing duplicate would stay
  // tracked-but-unreachable until release (ConcurrencySpec drives one
  // session from eight threads)
  private val cacheLock = new Object

  // value = the LOADED DataFrame, not just the path (r21 optimization):
  // `s.read.parquet(dir)` re-lists the layout's 256 bucket partition
  // directories and re-discovers the partition schema on EVERY call —
  // measured ~1.0 s of x36's per-rep wall at 0.15 task-CPU-s
  // (PhaseProbe: build 1000 ms / exec 260 ms), pure driver-side file
  // listing (§6 "small files hurt twice … listing/planning time on the
  // driver"). The memoized frame pins the resolved FileIndex, so
  // repeated probes pay only the partition-pruned read — the
  // write-once-probe-many contract the layout exists for.
  private val lshLayoutCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private val semDedupLayoutCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  // the layout builders run FULL distributed writes — multi-second
  // jobs that must not hold the global cacheLock (every unrelated memo
  // access across every session would block behind them, r20 review).
  // Each gets its own lock: double-evaluation protection is per cache,
  // and the builders touch no other memo (no ordering hazard).
  private val lshLayoutLock = new Object
  private val semDedupLayoutLock = new Object

  private def minhashCands(s: SparkSession, d: String): DataFrame =
    cacheLock.synchronized { candCache.getOrElseUpdate((s, d),
      Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text")
        .transform(graft.CacheLifecycle.persist(_))) }

  /** Verified edges at the family's shared thresholds (est 0.65 /
    * jaccard 0.8 / 5-grams — `0.8 - 0.15 == 0.65` exactly in IEEE
    * doubles, so this is plan-identical to what `nearDupRemove`'s
    * internal chain built for x14/x25 before the sharing).
    */
  private def verifiedPairs(s: SparkSession, d: String): DataFrame =
    cacheLock.synchronized { verifiedCache.getOrElseUpdate((s, d),
      Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text",
          minhashCands(s, d).filter(col("est_jaccard") >= 0.65), 5)
        .filter(col("jaccard") >= 0.8)
        // compact before persist: verified edges are a tiny fraction
        // of the corpus but the verify join runs at full shuffle
        // parallelism — uncompacted, every consumer's warm read pays
        // ~32 near-empty task setups (the BunnyHopFlow cached-layer
        // lesson)
        .repartition(4)
        .transform(graft.CacheLifecycle.persist(_))) }

  private def neardupComponents(s: SparkSession, d: String): DataFrame =
    cacheLock.synchronized { compsCache.getOrElseUpdate((s, d),
      Dedup.connectedComponents(verifiedPairs(s, d), "a", "b")) }

  // x16's edge set is NOT the shared one by design: its verification
  // runs over the EXACT-DEDUPED corpus (the oracle recomputes grams
  // over `exact`), and a pair whose lower-id member was exact-dropped
  // must not drop the survivor. Same memo/compaction pattern, its own
  // cache key.
  private val verified16Cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  graft.CacheLifecycle.onRelease { s =>
    verified16Cache.filterInPlace { case ((sess, _), _) => sess ne s }
  }

  private def verifiedPairsOverExact(s: SparkSession, d: String): DataFrame =
    cacheLock.synchronized { verified16Cache.getOrElseUpdate((s, d),
      Dedup.ngramJaccard(
          Dedup.exact(Tables.documents(s, d), "text", "doc_id"),
          "doc_id", "text",
          minhashCands(s, d).filter(col("est_jaccard") >= 0.65), 5)
        .filter(col("jaccard") >= 0.8)
        .repartition(4)
        .transform(graft.CacheLifecycle.persist(_))) }

  /** MinHash+LSH near-dup candidate pairs. Oracle: VALUES golden from
    * the from-spec Python reimplementation (tools/golden_ext.py —
    * java.util.Random LCG seeds, FNV-1a+fmix64 shingles, splitmix64
    * hash family, band-slice bucketing, signed-long mins), pinned at
    * sf0.01 (the driver's verify scale).
    */
  val x03_minhash_neardup: QuerySpec = duck("x03_minhash_neardup",
    s"""SELECT a, b, est_jaccard FROM ${Goldens.valuesTable("x03_minhash_neardup.tsv",
         Seq("a" -> "BIGINT", "b" -> "BIGINT", "est_jaccard" -> "DOUBLE"))}
       |ORDER BY a, b""".stripMargin) { (s, d) =>
    minhashCands(s, d)
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("a", "b")
  }

  /** Exact n-gram Jaccard verification of the MinHash candidates.
    * Oracle: the candidate pair list is the x03 golden, but the
    * Jaccard itself is RECOMPUTED by DuckDB from raw character
    * 5-grams — an independent check of the engine's hashed-shingle
    * Jaccard kernel.
    */
  val x04_ngram_jaccard: QuerySpec = duck("x04_ngram_jaccard",
    s"""WITH $gramsCte,
       |cand AS (SELECT * FROM ${Goldens.valuesTable("x03_minhash_neardup.tsv",
         Seq("a" -> "BIGINT", "b" -> "BIGINT", "est_jaccard" -> "DOUBLE"))})
       |SELECT c.a, c.b, c.est_jaccard,
       |  CASE WHEN len(list_distinct(ga.g || gb.g)) = 0 THEN CAST(0 AS DOUBLE)
       |       ELSE CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
       |            / len(list_distinct(ga.g || gb.g)) END AS jaccard
       |FROM cand c
       |JOIN grams ga ON ga.doc_id = c.a
       |JOIN grams gb ON gb.doc_id = c.b
       |ORDER BY c.a, c.b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val cands = minhashCands(s, d).filter(col("est_jaccard") >= 0.5)
    Dedup.ngramJaccard(docs, "doc_id", "text", cands)
      .select("a", "b", "est_jaccard", "jaccard")
      .orderBy("a", "b")
  }

  /** SimHash near-dup pairs within Hamming distance 3. Oracle: VALUES
    * golden from the Python xxHash64/SimHash reimplementation (the
    * block trick is exact for hamming <= 3, asserted in the generator).
    */
  val x05_simhash: QuerySpec = duck("x05_simhash",
    s"""SELECT a, b, hamming FROM ${Goldens.valuesTable("x05_simhash.tsv",
         Seq("a" -> "BIGINT", "b" -> "BIGINT", "hamming" -> "INTEGER"))}
       |ORDER BY a, b""".stripMargin) { (s, d) =>
    Dedup.simhashCandidates(Tables.documents(s, d), "doc_id", "text")
      .orderBy("a", "b")
  }

  /** Embedding cosine near-dup pairs via sign-LSH buckets. The
    * synthetic embeddings are random (max pairwise cosine ≈ 0.51), so
    * the threshold is set data-relative to exercise the operator; a
    * production near-dup filter would use ≥0.95 on real embeddings.
    * Single-table, short-signature parameters — high recall at test
    * scale; x35 exercises the banded corpus-scale configuration.
    */
  val x06_embedding_neardup: QuerySpec = duck("x06_embedding_neardup",
    s"""SELECT a, b, cosine FROM ${Goldens.valuesTable("x06_embedding_neardup.tsv",
         Seq("a" -> "BIGINT", "b" -> "BIGINT", "cosine" -> "DOUBLE"))}
       |ORDER BY a, b""".stripMargin) { (s, d) =>
    Dedup.embeddingNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
      threshold = 0.3, dim = 64, signBits = 2, numTables = 1)
      .orderBy("a", "b")
  }

  /** Banded multi-table sign-LSH embedding near-dup — the corpus-scale
    * configuration of x06: longer signatures keep Σ bucket² near-linear
    * (signBits ≈ log₂(n/B) for target bucket B), multiple tables buy
    * the recall back. Oracle: VALUES golden from the from-spec Python
    * reimplementation of the banded plane layout + exact normalized
    * cosine (tools/golden_ext.py).
    */
  val x35_embedding_neardup_banded: QuerySpec = duck("x35_embedding_neardup_banded",
    s"""SELECT a, b, cosine FROM ${Goldens.valuesTable("x35_embedding_neardup_banded.tsv",
         Seq("a" -> "BIGINT", "b" -> "BIGINT", "cosine" -> "DOUBLE"))}
       |ORDER BY a, b""".stripMargin) { (s, d) =>
    Dedup.embeddingNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
      threshold = 0.3, dim = 64, signBits = 6, numTables = 4)
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

  /** LSH-bucketed ANN top-k (scale path of x07). Oracle: VALUES golden
    * from the Python reimplementation of the whole probe (Rademacher
    * signatures, Hamming-1 bucket filter, float-exact cosine, (score
    * desc, id) top-10) — value-level verification of the ACTUAL
    * approximate result, not just its row count.
    */
  val x08_ann_lsh: QuerySpec = duck("x08_ann_lsh",
    s"""SELECT vec_id, cosine FROM ${Goldens.valuesTable("x08_ann_lsh.tsv",
         Seq("vec_id" -> "BIGINT", "cosine" -> "DOUBLE"))}
       |ORDER BY cosine DESC, vec_id""".stripMargin) { (s, d) =>
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding", query,
      k = 10, dim = 64)
  }

  /** ANN top-k via the lshWrite bucket-partitioned LAYOUT (the 100 TB
    * repeated-probe path of x08): signatures are materialized once as
    * hive partitions, and the probe's Hamming-ball IN-list prunes to a
    * few directory reads (partition-count proof in PlanQualitySpec).
    * Same parameters as x08 ⇒ identical result ⇒ same golden: bucket ∈
    * ball(h) on the layout ≡ hamming(bucket, qSig) ≤ h on the fly.
    */
  val x36_ann_lsh_layout: QuerySpec = duck("x36_ann_lsh_layout",
    s"""SELECT vec_id, cosine FROM ${Goldens.valuesTable("x08_ann_lsh.tsv",
         Seq("vec_id" -> "BIGINT", "cosine" -> "DOUBLE"))}
       |ORDER BY cosine DESC, vec_id""".stripMargin) { (s, d) =>
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    // write-once, probe-many is the layout's contract: memoize the
    // written-and-LOADED layout per (session, sfDir) so repeated runs
    // (bench iterations, verify) time the PROBE — not a fresh full
    // write, and (r21) not a fresh 256-directory listing either (see
    // the lshLayoutCache scaladoc)
    val layout = lshLayoutLock.synchronized { lshLayoutCache.getOrElseUpdate((s, d), {
      val p = graft.TempDirs.register(
        java.nio.file.Files.createTempDirectory("lsh")).toString + "/emb_by_bucket"
      Similarity.lshWrite(Tables.embeddings(s, d), "embedding", p, dim = 64)
      s.read.parquet(p)
    }) }
    Similarity.lshProbe(layout, "vec_id", "embedding", query,
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
  // TOKEN-CLASS NOTE (deliberate, do not "unify"): x11/x30/x33/x46 use
  // the backslash-free class [^A-Za-z0-9 ] because their oracles run
  // through BOTH DuckDB and the spark.sql parity gate, and a '\s' in a
  // SQL string literal parses differently per dialect (Spark's parser
  // eats the backslash). TA.bpeishTokenCount (the \s variant) serves
  // the DuckDB-only entries (x16), whose oracle is escape-processed
  // Scala. The two counts differ only on tab/newline-adjacent
  // punctuation; each query's oracle mirrors its own variant exactly.
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
    * extraction over binary payloads synthesized from document text.
    * Output columns are integer-exact projections of the stub features
    * (length, mean byte value ×10⁴ through the stub's float32, first/
    * last byte) so DuckDB can recompute them from the UTF-8 bytes —
    * the documents are ASCII, so byte values are the character codes.
    */
  val x13_multimodal: QuerySpec = duck("x13_multimodal",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS f_len_i,
      |  CAST(round(CAST(CAST(
      |      CAST(list_sum(list_transform(range(1, length(text)+1), i -> unicode(text[i]))) AS DOUBLE)
      |      / greatest(length(text), 1) AS REAL) AS DOUBLE) * 10000) AS BIGINT) AS f_mean_e4,
      |  CAST(unicode(text[1]) AS BIGINT) AS f_first,
      |  CAST(unicode(text[-1]) AS BIGINT) AS f_last
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withBlob = Multimodal.attachBlob(
      Tables.documents(s, d).withColumn("payload", encode(col("text"), "UTF-8")),
      "payload", "application/octet-stream")
    Multimodal.extractFeatures(withBlob)
      .select(col("doc_id"), col("blob.meta.size_bytes").as("size_bytes"),
        element_at(col("features"), 1).cast("long").as("f_len_i"),
        round(element_at(col("features"), 2).cast("double") * 10000)
          .cast("long").as("f_mean_e4"),
        element_at(col("features"), 7).cast("long").as("f_first"),
        element_at(col("features"), 8).cast("long").as("f_last"))
      .orderBy("doc_id")
  }

  /** End-to-end near-dup removal: LSH candidates → Jaccard verify →
    * keep-first drop. Oracle: DuckDB recomputes the verified pair set
    * from ALL pairs (raw 5-gram Jaccard ≥ 0.8, sound length pruning) —
    * no LSH, so an engine-side recall loss would fail the compare.
    */
  val x14_neardup_remove: QuerySpec = duck("x14_neardup_remove",
    s"""WITH $verifiedCte
       |SELECT d.doc_id, d.lang FROM documents d
       |WHERE d.doc_id NOT IN (SELECT b FROM verified)
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    Dedup.nearDupRemove(Tables.documents(s, d), "doc_id", "text",
        precomputedVerified = Some(verifiedPairs(s, d)))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** IVF ANN top-k (KMeans coarse quantizer, nprobe cell scan). The
    * driver query probes ALL cells (nprobe = nCells) so the result is
    * exactly the brute-force top-10 and the oracle stays independent
    * of KMeans centroid drift across partition layouts; the nprobe<k
    * pruning path is pinned by `PlanQualitySpec` (partition-pruned
    * scan) and `ExtOpsSpec`. Scores select by the rounded value on
    * both sides, like x07.
    */
  val x15_ann_ivf: QuerySpec = duck("x15_ann_ivf", {
    val qv = (1 to 64).map(i => s"CAST(CAST(sin($i) AS REAL) AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"""SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), $qv), 4) AS cosine
       |FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
  }) { (s, d) =>
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    // trainN=512: a REAL subsample at every test scale (sf0.1 has 2000
    // vectors; the 4096 default would train on the whole table). The
    // oracle probes all cells, so it is independent of centroid drift.
    val index = Similarity.ivfBuild(Tables.embeddings(s, d), "vec_id", "embedding",
      trainN = 512)
    Similarity.ivfTopK(index, "vec_id", "embedding", query, k = 10,
      nprobe = 16, scoreRound = Some(4))
  }

  /** The composite training-data pipeline: exact dedup → near-dup
    * removal → quality filter → per-language token budget. The shape a
    * 100 TB corpus-cleaning job takes end-to-end; every stage is one of
    * the operators above.
    */
  val x16_clean_corpus: QuerySpec = duck("x16_clean_corpus",
    s"""WITH exact AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
       |    FROM documents) WHERE rn = 1),
       |gramsx AS (
       |  SELECT doc_id, g, len(g) AS n FROM (
       |    SELECT doc_id,
       |      list_distinct([substr(s, i, 5) FOR i IN range(1, greatest(len(s)-3, 2))]) AS g
       |    FROM (SELECT doc_id, lower(trim(text)) AS s FROM exact))),
       |cand AS (
       |  SELECT a, b FROM ${Goldens.valuesTable("x03_minhash_neardup.tsv",
           Seq("a" -> "BIGINT", "b" -> "BIGINT", "est_jaccard" -> "DOUBLE"))}
       |  WHERE est_jaccard >= 0.65),
       |verified AS (
       |  SELECT c.a, c.b
       |  FROM cand c
       |  JOIN gramsx ga ON ga.doc_id = c.a
       |  JOIN gramsx gb ON gb.doc_id = c.b
       |  WHERE CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
       |        / len(list_distinct(ga.g || gb.g)) >= 0.8),
       |kept AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT b FROM verified)),
       |scored AS (
       |  SELECT *,
       |    round((CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.3 END) *
       |          (CASE WHEN (CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\\s+')) = 0 THEN 0.0
       |                 ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
       |                      / len(regexp_split_to_array(lower(trim(text)), '\\s+')) END)
       |                BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) *
       |          greatest(CASE WHEN length(text) = 0 THEN 0.0
       |                 ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |                      / length(text) END, 0.1), 4) AS quality
       |  FROM kept)
       |SELECT lang, count(*) AS docs_kept,
       |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS tokens,
       |  round(avg(quality), 4) AS avg_quality
       |FROM scored WHERE quality >= 0.3
       |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val exact = Dedup.exact(docs, "text", "doc_id")
    val nearDeduped = Dedup.nearDupRemove(exact, "doc_id", "text",
      precomputedVerified = Some(verifiedPairsOverExact(s, d)))
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

  /** Two deterministic fixture documents sharing one long
    * NON-REPETITIVE window (a quadratic-residue character stream — a
    * repeated phrase would winnow to a handful of distinct
    * fingerprints and miss the ≥25 bar). Negative doc_ids cannot
    * collide with corpus ids. Mirrored CHARACTER-FOR-CHARACTER in
    * tools/golden_ext.py (`winnow_fixtures`), so the
    * two-independent-implementations check stays non-vacuous at every
    * scale: at sf0.1 the synthetic corpus has zero natural collision
    * pairs, and before r15 the x17 golden there compared empty-vs-empty
    * (r14 verdict task 2).
    */
  private[queries] def winnowFixtures: Seq[(Long, String)] = {
    val core = new StringBuilder
    var i = 0
    while (i < 3000) {
      core.append(
        if (i % 7 == 6) ' ' else ('a' + ((i * i * 31 + i * 7) % 26)).toChar)
      i += 1
    }
    Seq((-2L, "alpha fixture prologue " + core),
      (-1L, "omega fixture prologue " + core + " epilogue"))
  }

  /** Winnowing (rolling-hash) fingerprint overlap: documents sharing
    * ≥ minShared selected fingerprints — local-similarity detection
    * that survives insertions/deletions the way whole-doc hashing
    * cannot.
    */
  private def winnowFps(s: SparkSession, d: String): DataFrame =
    cacheLock.synchronized { winnowFpCache.getOrElseUpdate((s, d), {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(winnowFixtures.toDF("doc_id", "text"))
        .select(col("doc_id"), explode(TA.winnowingFingerprints(col("text"))).as("fp"))
        .transform(graft.CacheLifecycle.persist(_))
    }) }

  val x17_winnowing: QuerySpec = duck("x17_winnowing",
    s"""SELECT a, b, shared_fps FROM ${Goldens.valuesTable("x17_winnowing.tsv",
         Seq("a" -> "BIGINT", "b" -> "BIGINT", "shared_fps" -> "BIGINT"))}
       |ORDER BY a, b""".stripMargin) { (s, d) =>
    val fps = winnowFps(s, d)
    // stop-fingerprint removal: a fingerprint present in many documents
    // is a common phrase, not a similarity signal, and it is also the
    // hot key that makes the inverted self-join quadratic. Standard
    // winnowing practice and the scale guard at 100 TB. Broadcast the
    // FREQUENT set (df > 20): it is bounded by corpus_fps/20 regardless
    // of corpus size, whereas the rare complement is nearly ALL distinct
    // fingerprints — O(corpus) rows that must never reach a driver
    // collect. left_anti(frequent) ≡ left_semi(rare), bounded broadcast.
    val frequent = fps.groupBy("fp").agg(count(lit(1)).as("df")).filter(col("df") > 20)
    val kept = fps.join(broadcast(frequent.select("fp")), Seq("fp"), "left_anti")
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
  val x22_asof: QuerySpec = duck("x22_asof",
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
    * Oracle: all-pairs verified edges (no LSH) + transitive closure by
    * recursive CTE + min-label per node — an independent
    * connected-components implementation.
    */
  val x25_neardup_clusters: QuerySpec = duck("x25_neardup_clusters",
    s"""WITH RECURSIVE $verifiedCte,
       |edges AS (SELECT a AS src, b AS dst FROM verified
       |          UNION SELECT b, a FROM verified),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, t.r FROM edges e JOIN reach t ON t.id = e.dst),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
       |SELECT d.doc_id, d.lang FROM documents d
       |WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    Dedup.nearDupRemoveCC(Tables.documents(s, d), "doc_id", "text",
        precomputedComponents = Some(neardupComponents(s, d)))
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

  /** Eval-set decontamination: training docs sharing any token 8-gram
    * with the held-out eval slice (doc_id ≡ 0 mod 97) are flagged; the
    * per-language contamination census is the deliverable. Oracle
    * recomputes the whole overlap from raw grams in DuckDB list SQL —
    * no hash parity needed because grams are raw strings.
    */
  val x28_decontaminate: QuerySpec = duck("x28_decontaminate",
    """WITH tok AS (SELECT doc_id, lang,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
      |g AS (SELECT doc_id, lang,
      |    list_distinct([array_to_string(t[i:i+7], ' ')
      |                   FOR i IN range(1, greatest(len(t)-6, 2))]) AS grams
      |  FROM tok),
      |ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
      |train AS (SELECT * FROM g WHERE doc_id % 97 <> 0),
      |cont AS (SELECT DISTINCT tg.doc_id
      |  FROM (SELECT doc_id, unnest(grams) AS gram FROM train) tg
      |  JOIN ev USING (gram))
      |SELECT lang,
      |  CAST(count(*) AS BIGINT) AS docs_total,
      |  CAST(count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM cont)) AS BIGINT)
      |    AS docs_contaminated,
      |  CAST(count(*) FILTER (WHERE doc_id NOT IN (SELECT doc_id FROM cont)) AS BIGINT)
      |    AS docs_kept
      |FROM train GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    import graft.operators.Decontaminate
    val docs = Tables.documents(s, d)
    val eval = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val cont = Decontaminate.contaminatedIds(train, eval, "doc_id", "text", n = 8)
    train.join(cont.withColumn("__c", lit(1)), Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("docs_total"),
        sum(when(col("__c").isNotNull, 1L).otherwise(0L)).cast("bigint")
          .as("docs_contaminated"),
        sum(when(col("__c").isNull, 1L).otherwise(0L)).cast("bigint").as("docs_kept"))
      .orderBy("lang")
  }

  /** Gopher-style repetition signal: per-language average / max of the
    * within-doc duplicate-trigram fraction, plus the count above the
    * removal threshold.
    */
  val x29_repetition: QuerySpec = duck("x29_repetition",
    """WITH tok AS (SELECT lang,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
      |r AS (SELECT lang,
      |    1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g) AS rep
      |  FROM (SELECT lang, [array_to_string(t[i:i+2], ' ')
      |                      FOR i IN range(1, greatest(len(t)-1, 2))] AS g FROM tok))
      |SELECT lang, round(avg(rep), 4) AS avg_rep, round(max(rep), 4) AS max_rep,
      |  CAST(count(*) FILTER (WHERE rep > 0.5) AS BIGINT) AS repetitive_docs
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), TA.repetitionRatio(col("text"), 3).as("rep"))
      .groupBy("lang")
      .agg(round(avg("rep"), 4).as("avg_rep"),
        round(max("rep"), 4).as("max_rep"),
        sum(when(col("rep") > 0.5, 1L).otherwise(0L)).cast("bigint")
          .as("repetitive_docs"))
      .orderBy("lang")
  }

  /** Per-language token-budget sampling: walk each language's docs in
    * deterministic (md5, id) order, keep docs while the budget has
    * room — the "N tokens per language" mix-construction step of a
    * pretraining pipeline. Reuses x24's proven md5-order parity and
    * x11's token-count parity. The window cumsum shuffles once per
    * stratum; strata are independent, so at 100 TB each language
    * sorts/scans in parallel.
    */
  val x30_token_budget: QuerySpec = q("x30_token_budget",
    """SELECT lang, doc_id, toks FROM (
      |  SELECT lang, doc_id, toks,
      |    coalesce(sum(toks) OVER (PARTITION BY lang
      |      ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM (SELECT lang, doc_id,
      |          cast(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS toks
      |        FROM documents) t) s
      |WHERE cum_before < 1500 ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .withColumn("toks",
        regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]")).cast("bigint"))
      .withColumn("cum_before", coalesce(sum(col("toks")).over(w), lit(0L)))
      .filter(col("cum_before") < 1500)
      .select("lang", "doc_id", "toks")
      .orderBy("lang", "doc_id")
  }

  /** Int8 scalar quantization census over the embedding table: scale,
    * quantized checksum, and max reconstruction error per vector.
    * Oracle recomputes the whole quantization in DuckDB double list
    * SQL — both engines derive identical doubles from the same float
    * column, and round() is half-away-from-zero in both.
    */
  val x31_quantize: QuerySpec = duck("x31_quantize",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |s AS (SELECT vec_id, e,
      |    CASE WHEN list_max(list_transform(e, x -> abs(x))) = 0 THEN 0.0
      |         ELSE 127.0 / list_max(list_transform(e, x -> abs(x))) END AS scale FROM v),
      |q AS (SELECT vec_id, e, scale,
      |    list_transform(e, x -> CAST(round(x * scale) AS INTEGER)) AS qv FROM s)
      |SELECT vec_id, round(scale, 6) AS scale,
      |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
      |  round(CASE WHEN scale = 0 THEN 0.0
      |             ELSE list_max([abs(qv[i] / scale - e[i])
      |                            FOR i IN range(1, len(e) + 1)]) END, 6) AS max_err
      |FROM q ORDER BY vec_id LIMIT 10""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .withColumn("__quant", Similarity.scalarQuantize(col("embedding")))
    emb.select(col("vec_id"),
        round(col("__quant.scale"), 6).as("scale"),
        aggregate(col("__quant.q"), lit(0L), (acc, x) => acc + x.cast("long"))
          .as("q_sum"),
        round(Similarity.dequantError(col("embedding"), col("__quant")), 6)
          .as("max_err"))
      .orderBy("vec_id")
      .limit(10)
  }

  /** Training-sequence chunking: every document split into 64-token
    * windows; per-chunk rows (index, token count, content hash) for
    * the first docs. Oracle rebuilds the chunks in DuckDB list SQL
    * with a lateral range — content-level verification of the packing,
    * not just the counts.
    */
  val x32_chunking: QuerySpec = duck("x32_chunking",
    """WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents WHERE doc_id < 20),
      |c AS (SELECT doc_id,
      |    [array_to_string(t[(i-1)*64+1 : i*64], ' ')
      |     FOR i IN range(1, greatest(CAST(ceil(len(t)/64.0) AS INT), 1) + 1)] AS chunks
      |  FROM tok)
      |SELECT doc_id,
      |  CAST(u['chunk_idx'] AS BIGINT) AS chunk_idx,
      |  CAST(len(regexp_split_to_array(u['chunk'], ' ')) AS BIGINT) AS chunk_tokens,
      |  md5(u['chunk']) AS chunk_md5
      |FROM (SELECT doc_id,
      |        unnest([{'chunk_idx': i, 'chunk': chunks[i]}
      |                FOR i IN range(1, len(chunks) + 1)]) AS u
      |      FROM c)
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(TA.chunkTokens(col("text"), 64)).as(Seq("pos", "chunk")))
      .select(col("doc_id"),
        (col("pos") + 1).cast("bigint").as("chunk_idx"),
        size(split(col("chunk"), " ")).cast("bigint").as("chunk_tokens"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Paragraph-level exact dedup (the boilerplate-removal pass of
    * web-corpus pipelines): documents are given paragraph structure
    * (32-token chunks — split parity proven by x32 — prefixed with one
    * shared boilerplate paragraph, the repeated-banner scenario), then
    * every distinct paragraph survives only at its globally first
    * (id, position) occurrence and documents are reassembled. The
    * boilerplate stays in exactly one document; the oracle rebuilds the
    * whole pipeline in DuckDB list SQL and compares reassembled-text
    * hashes, not just counts.
    */
  /** Shared by x37 (batch) and x52 (streaming twin): both must hash
    * to this one answer.
    */
  private val paragraphDedupOracle =
    """WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents WHERE doc_id < 300),
      |par AS (SELECT doc_id,
      |    ['subscribe to our newsletter today'] ||
      |    [array_to_string(t[(i-1)*32+1 : i*32], ' ')
      |     FOR i IN range(1, greatest(CAST(ceil(len(t)/32.0) AS INT), 1) + 1)] AS paras
      |  FROM tok),
      |ex AS (SELECT doc_id, u['i'] - 1 AS pos, u['p'] AS para
      |  FROM (SELECT doc_id,
      |          unnest([{'i': i, 'p': paras[i]} FOR i IN range(1, len(paras) + 1)]) AS u
      |        FROM par)),
      |keep AS (SELECT md5(para) AS h, min(doc_id * 1000000 + pos) AS rank
      |  FROM ex GROUP BY 1),
      |built AS (SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY pos) AS txt
      |  FROM ex JOIN keep
      |    ON md5(ex.para) = keep.h AND ex.doc_id * 1000000 + ex.pos = keep.rank
      |  GROUP BY doc_id)
      |SELECT doc_id,
      |  CAST(CASE WHEN length(x) = 0 THEN 0
      |       ELSE len(string_split(x, chr(10)||chr(10))) END AS BIGINT) AS kept_paras,
      |  md5(x) AS text_md5
      |FROM (SELECT t.doc_id, coalesce(b.txt, '') AS x
      |      FROM tok t LEFT JOIN built b USING (doc_id))
      |ORDER BY doc_id""".stripMargin

  val x37_paragraph_dedup: QuerySpec = duck("x37_paragraph_dedup",
    paragraphDedupOracle) { (s, d) =>
    val sep = "\n\n"
    val docs = Tables.documents(s, d)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"),
        concat(lit("subscribe to our newsletter today" + sep),
          array_join(TA.chunkTokens(col("text"), 32), sep)).as("text"))
    Dedup.paragraphDedup(docs, "doc_id", "text")
      .select(col("doc_id"),
        when(length(col("text")) === 0, lit(0L))
          .otherwise(size(split(col("text"), java.util.regex.Pattern.quote(sep)))
            .cast("bigint")).as("kept_paras"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** PII scrubbing: email/phone redaction plus audit counts, all
    * codegen'd regex built-ins. Contact strings are derived
    * deterministically from doc_id (the raw corpus is letters-only) so
    * the replacement path is actually exercised; patterns are confined
    * to the Java∩RE2 regex subset so Spark and the DuckDB oracle agree
    * byte-for-byte.
    */
  val x38_pii_scrub: QuerySpec = duck("x38_pii_scrub",
    """SELECT doc_id,
      |  md5(regexp_replace(regexp_replace(x,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\d{3}-\d{4}-\d{4}', '<PHONE>', 'g')) AS scrubbed_md5,
      |  CAST(len(regexp_extract_all(x,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS emails,
      |  CAST(len(regexp_extract_all(x, '\d{3}-\d{4}-\d{4}')) AS BIGINT) AS phones
      |FROM (SELECT doc_id,
      |        text || ' contact user' || doc_id || '@example.com or 555-' ||
      |        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-9876 now' AS x
      |      FROM documents WHERE doc_id < 500)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit("-9876 now")).as("text"))
    docs.select(col("doc_id"),
        md5(TA.scrubPii(col("text"))).as("scrubbed_md5"),
        TA.emailCount(col("text")).cast("bigint").as("emails"),
        TA.phoneCount(col("text")).cast("bigint").as("phones"))
      .orderBy("doc_id")
  }

  /** Data-mixture construction: per-SOURCE token budgets scaled by a
    * domain weight (the "2x books, 0.5x web" reweighting every
    * pretraining mix does), filled deterministically in (md5, id)
    * order. The weights ride a broadcast dim join; budgets are
    * per-stratum, so the 100 TB corpus fills all domains in parallel.
    */
  val x33_mix_weights: QuerySpec = duck("x33_mix_weights",
    """WITH d AS (SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS toks,
      |    (CAST(NULLIF(regexp_extract(source, '(\d+)', 1), '') AS INT) % 4) + 1 AS w
      |  FROM documents),
      |c AS (SELECT *, coalesce(sum(toks) OVER (PARTITION BY source
      |    ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM d)
      |SELECT source, CAST(count(*) AS BIGINT) AS docs_sampled,
      |  CAST(sum(toks) AS BIGINT) AS tokens_sampled
      |FROM c WHERE cum_before < w * 400
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the weight is a pure function of the source, so it computes
    // row-local in the same scan — a config-table variant would
    // broadcast-join a literal dim, never re-scan the corpus for it
    docs
      // nullif: a source label with NO digit extracts '' — the ANSI
      // cast would kill the whole pass on one junk label; NULL weight
      // excludes the source's rows instead (cum_before < NULL is never
      // true). Oracle mirrors the NULLIF.
      .withColumn("w",
        (nullif(regexp_extract(col("source"), "(\\d+)", 1), lit("")).cast("int")
          % 4 + 1).cast("long"))
      .withColumn("toks",
        regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]")).cast("bigint"))
      .withColumn("cum_before", coalesce(sum(col("toks")).over(w), lit(0L)))
      .filter(col("cum_before") < col("w") * 400)
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("docs_sampled"),
        sum(col("toks")).cast("bigint").as("tokens_sampled"))
      .orderBy("source")
  }

  /** FORWARD as-of: each click enriched with the EARLIEST following
    * view (`v.ts >= c.ts`) — the other direction of x22, against
    * DuckDB's native forward ASOF JOIN as an independent oracle.
    */
  val x34_asof_forward: QuerySpec = duck("x34_asof_forward",
    """SELECT c.event_id, c.user_id, round(v.value, 2) AS asof_value
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts <= v.ts
      |ORDER BY c.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "value")
    AsOfJoin.asOfJoin(clicks, views, Seq("user_id"), "ts", Seq("value"),
        direction = "forward")
      .select(col("event_id"), col("user_id"),
        round(col("asof_value"), 2).as("asof_value"))
      .orderBy("event_id")
  }

  /** BM25 lexical retrieval top-20 — the keyword side of the retrieval
    * stack (x07/x15/x36 are the dense side). The oracle recomputes the
    * full Okapi formula in SQL (same literal forms so constant folding
    * yields bit-identical doubles); both sides round the sort key to 4
    * decimals so independent implementations agree at ties.
    */
  /** The BM25 toks/stats/scored CTE block (k1=1.2, b=0.75, the three
    * fixed query terms, the 4dp rounding convention) — shared by x39
    * (scores directly) and x94 (fuses with dense ranks) so the two
    * oracles can never silently disagree about the same kernel (r20
    * review; the hourlyOracle/topKOracle sharing pattern).
    */
  private val bm25ScoredCte =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
      |stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(t)) AS avgdl,
      |    CAST(count(*) FILTER (WHERE list_contains(t, 'spark')) AS DOUBLE) AS df0,
      |    CAST(count(*) FILTER (WHERE list_contains(t, 'join')) AS DOUBLE) AS df1,
      |    CAST(count(*) FILTER (WHERE list_contains(t, 'vector')) AS DOUBLE) AS df2
      |  FROM toks),
      |scored AS (
      |  SELECT doc_id,
      |    ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
      |      * tf0 * (1.2 + 1.0) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
      |      * tf1 * (1.2 + 1.0) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
      |      * tf2 * (1.2 + 1.0) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS score
      |  FROM (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
      |          CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE) AS tf0,
      |          CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE) AS tf1,
      |          CAST(len(list_filter(t, x -> x = 'vector')) AS DOUBLE) AS tf2
      |        FROM toks), stats)""".stripMargin

  val x39_bm25_topk: QuerySpec = q("x39_bm25_topk",
    bm25ScoredCte +
      """
      |SELECT doc_id, round(score, 4) AS score
      |FROM scored ORDER BY round(score, 4) DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
    Bm25.topK(Tables.documents(s, d), "doc_id", "text",
      Seq("spark", "join", "vector"), k = 20)
  }

  /** Bounded top-k-per-group via the typed `TopKAgg` aggregate — the
    * skew-safe replacement for the row_number window idiom (the oracle
    * IS that idiom, in DuckDB, proving the two agree; at scale only the
    * aggregate form bounds the shuffle).
    */
  /** Shared by x40 (batch) and x53 (streaming twin). */
  private val topKOracle =
    """SELECT event_type, CAST(rn AS BIGINT) AS rank, round(value, 2) AS value, event_id
      |FROM (SELECT event_type, event_id, value,
      |        row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      |      FROM events) t
      |WHERE rn <= 3
      |ORDER BY event_type, rank""".stripMargin

  val x40_topk_per_group: QuerySpec = q("x40_topk_per_group", topKOracle) { (s, d) =>
    val topk = TopKAgg.top_k(3)
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(topk(col("value"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("bigint").as("rank"),
        round(col("col._1"), 2).as("value"), col("col._2").as("event_id"))
      .orderBy("event_type", "rank")
  }

  /** Gap-based sessionization (15-min gap) + per-session rollup — the
    * batch face of StreamingTwins.sessionize, one user-key exchange for
    * both the window and the rollup. Tie-broken on event_id so the
    * session split is deterministic under shuffle.
    */
  val x41_sessions: QuerySpec = q("x41_sessions",
    """SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |            OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 900000000
      |        THEN 1 ELSE 0 END AS new_s
      |    FROM events) a) b
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin) { (s, d) =>
    Sessionize.sessions(Tables.events(s, d), "user_id", "ts",
        gapSeconds = 900, tieBreakCols = Seq("event_id"))
      .orderBy("user_id", "session_seq")
  }

  /** Deterministic hash-split (train/val/test) — assignment is a pure
    * function of doc_id via md5-threshold string comparison, so the
    * same literal thresholds evaluate identically in Spark and DuckDB
    * (no dialect shim, no hex parsing) and the split is stable as the
    * corpus grows. Row-local: one codegen'd CASE over the scan.
    */
  val x42_hash_split: QuerySpec = {
    // the EXACT strings assign() compares against — recomputing from
    // literals (0.95 vs 0.9+0.05) would differ in the low hex digits
    val Seq(t1, t2) = HashSplit.armThresholds()
    q("x42_hash_split",
      s"""SELECT split, lang, CAST(count(*) AS BIGINT) AS docs FROM
         |  (SELECT lang,
         |     CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '$t1' THEN 'train'
         |          WHEN md5(CAST(doc_id AS VARCHAR)) < '$t2' THEN 'val'
         |          ELSE 'test' END AS split
         |   FROM documents) t
         |GROUP BY split, lang ORDER BY split, lang""".stripMargin) { (s, d) =>
      HashSplit.assign(Tables.documents(s, d), "doc_id")
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("docs"))
        .orderBy("split", "lang")
    }
  }

  /** Corpus vocabulary by document frequency — the canonical wordcount
    * at 100 TB: explode → two-phase hash aggregate (map-side partials
    * bound the shuffle by distinct-terms-per-task, not token count) →
    * TakeOrderedAndProject top-30.
    */
  val x43_vocab_topdf: QuerySpec = q("x43_vocab_topdf",
    """SELECT token, CAST(count(*) AS BIGINT) AS df
      |FROM (SELECT doc_id,
      |        unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS token
      |      FROM documents) t
      |GROUP BY token ORDER BY df DESC, token LIMIT 30""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(array_distinct(TA.tokens(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit(30)
  }

  /** Per-document TF-IDF keyword extraction (top-2 terms) — the
    * classic corpus-statistics join. Scale shape: tf aggregates on
    * (doc, token) WITH map-side partials (a hot token like "the" is
    * spread across docs, so the exchange never funnels it — the reason
    * NOT to pre-partition by token alone), df partial-aggregates on
    * token (count-only, tiny), their join rides SMJ + AQE skew split,
    * and N broadcasts as one row. Ranking windows per doc: groups are
    * document-sized, no skew.
    */
  val x44_tfidf_keywords: QuerySpec = q("x44_tfidf_keywords",
    """WITH tok AS (SELECT doc_id,
      |        unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
      |      FROM documents WHERE doc_id < 200),
      |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |       FROM tok GROUP BY doc_id, token),
      |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents WHERE doc_id < 200),
      |scored AS (SELECT tf.doc_id, tf.token, round(tf.tf * ln(n.n / df.df), 4) AS tfidf
      |           FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
      |SELECT doc_id, token, tfidf FROM (
      |  SELECT doc_id, token, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
      |  FROM scored) t
      |WHERE rn <= 2 ORDER BY doc_id, token""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
    val toks = docs.select(col("doc_id"),
      explode(TA.tokens(col("text"))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n") / col("df")), 4))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("doc_id", "token", "tfidf").orderBy("doc_id", "token")
  }

  /** Unigram log-probability document scoring — the statistical
    * quality filter (CCNet-style): score each document by the mean log
    * corpus frequency of its tokens; gibberish and boilerplate-free
    * junk sit far below natural text. Complements the rule-based
    * `TextAnalysis.qualityScore`. Scale shape: one corpus stats pass
    * (token frequency table, partial-aggregated), one-row total
    * broadcast, score join rides SMJ + AQE skew split on the token
    * key, per-doc avg partial-aggregates on doc_id.
    */
  val x45_unigram_logprob: QuerySpec = q("x45_unigram_logprob",
    """WITH tok AS (SELECT doc_id,
      |        unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
      |      FROM documents),
      |freq AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq)
      |SELECT doc_id, round(avg(ln(freq.c / tot.t)), 4) AS logprob
      |FROM tok JOIN freq USING (token) CROSS JOIN tot
      |WHERE doc_id < 300
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    // delegates to the x62 operator (one implementation backs both);
    // the doc_id filter is on the grouping key, so Catalyst pushes it
    // through the aggregate and the join down to the scored-side scan —
    // the frequency table still trains on the WHOLE corpus
    TA.unigramLogProb(Tables.documents(s, d), "doc_id", "text")
      .where(col("doc_id") < 300)
      .orderBy("doc_id")
  }

  /** Deterministic sequence packing: documents fill fixed 512-token
    * training sequences greedily in (md5, id) order per source stratum
    * (same deterministic order as x24/x30/x33); a document is never
    * split, so a sequence may overflow by its tail document —
    * truncation is downstream's concern. seq_id = floor(cumulative
    * tokens before / budget) is a pure window function, so packing is
    * reproducible under any parallelism; per-stratum prefix scans
    * carry the same per-source volume bound as x30 (documented there).
    */
  val x46_seq_packing: QuerySpec = q("x46_seq_packing",
    """WITH d AS (SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS toks
      |  FROM documents),
      |c AS (SELECT *, coalesce(sum(toks) OVER (PARTITION BY source
      |    ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM d),
      |b AS (SELECT source, CAST(floor(cum_before / 512.0) AS BIGINT) AS seq_id, toks FROM c)
      |SELECT source, seq_id, CAST(count(*) AS BIGINT) AS docs, CAST(sum(toks) AS BIGINT) AS fill
      |FROM b WHERE seq_id < 3
      |GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .withColumn("toks",
        regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]")).cast("bigint"))
      .withColumn("cum_before", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("cum_before") / 512.0).cast("bigint"))
      .filter(col("seq_id") < 3)
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).cast("bigint").as("docs"),
        sum(col("toks")).cast("bigint").as("fill"))
      .orderBy("source", "seq_id")
  }

  /** ANN via product quantization (Jégou et al. 2011): codebooks from
    * a bounded deterministic training sample, m-byte codes from one
    * distributed encode scan (32× smaller than the float vectors), ADC
    * top-k from table lookups over the codes — the float column is
    * never touched at query time. Golden from the independent Python
    * reimplementation (`tools/golden_ext.py:pq_topk`), exact doubles.
    */
  val x47_ann_pq: QuerySpec = duck("x47_ann_pq",
    s"""SELECT vec_id, adc FROM ${Goldens.valuesTable("x47_ann_pq.tsv",
         Seq("vec_id" -> "BIGINT", "adc" -> "DOUBLE"))}
       |ORDER BY adc, vec_id""".stripMargin) { (s, d) =>
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val emb = Tables.embeddings(s, d)
    val model = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    Similarity.pqTopK(codes, "vec_id", model, query, k = 10)
  }

  /** IVF-PQ (Jégou et al. 2011 §V): coarse cells + residual PQ codes —
    * the billion-vector recipe. The probe prunes to nprobe cells AND
    * scores m-byte codes, the double pruning that keeps 100 TB of
    * vectors page-cache-resident; with the encoded table written
    * cell-partitioned, the cell filter is a partition filter exactly
    * like x15/x36. Golden from the independent Python reimplementation
    * (`tools/golden_ext.py:ivfpq_topk`), exact doubles.
    */
  val x48_ann_ivfpq: QuerySpec = duck("x48_ann_ivfpq",
    s"""SELECT vec_id, adc FROM ${Goldens.valuesTable("x48_ann_ivfpq.tsv",
         Seq("vec_id" -> "BIGINT", "adc" -> "DOUBLE"))}
       |ORDER BY adc, vec_id""".stripMargin) { (s, d) =>
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val emb = Tables.embeddings(s, d)
    val model = Similarity.ivfPqTrain(emb, "vec_id", "embedding", dim = 64)
    val codes = Similarity.ivfPqEncode(emb, "vec_id", "embedding", model)
    Similarity.ivfPqTopK(codes, "vec_id", model, query, k = 10)
  }

  /** Incremental exact dedup — the nightly-ingest shape: the odd-id
    * half of the corpus arrives as a new batch and dedups against
    * itself plus the even-id half already ingested. NOT EXISTS (not
    * NOT IN) in the oracle so null-key semantics match Spark's
    * anti-join.
    */
  val x49_dedup_incremental: QuerySpec = q("x49_dedup_incremental",
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang, md5(lower(trim(text))) AS k,
      |    row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
      |  FROM documents WHERE doc_id % 2 = 1) t
      |WHERE rn = 1 AND NOT EXISTS (
      |  SELECT 1 FROM documents b
      |  WHERE b.doc_id % 2 = 0 AND md5(lower(trim(b.text))) = t.k)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.exactIncremental(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** CDC keep-latest compaction: newest event per user (ties on the
    * timestamp broken by smallest event_id) — the upsert/recrawl
    * compaction every log-structured ingest runs. The oracle is the
    * row_number idiom; at scale only the two-phase aggregate form
    * bounds the shuffle (see Dedup.keepLatest).
    */
  val x50_keep_latest: QuerySpec = q("x50_keep_latest",
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    Dedup.keepLatest(Tables.events(s, d), "user_id", "ts", "event_id")
      .select("user_id", "event_id", "event_type")
      .orderBy("user_id")
  }

  /** The stateful streaming twin as a driver-visible row: sessionize
    * (§2.11) runs as a REAL StreamQuery — file-source stream over the
    * events directory, `flatMapGroupsWithState` state per user, memory
    * sink — and must reproduce the batch q32 answer bit-for-bit (the
    * same oracle SQL). Update-mode sinks append a row per (batch,
    * user), so the final count per user is max(sessions) — sessions is
    * monotone — which also keeps the entry correct if the file source
    * ever splits the input into multiple micro-batches.
    */
  val x51_streaming_sessionize: QuerySpec = q("x51_streaming_sessionize",
    """SELECT user_id, count(*) AS sessions FROM
      |  (SELECT user_id,
      |     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |            OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |          THEN 1 ELSE 0 END AS new_s
      |   FROM events) t
      |WHERE new_s = 1 GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.streaming.StreamingTwins
    val sink = "x51_sessions_sink"
    s.catalog.dropTempView(sink)   // reps re-run the stream; stale sink view must go
    val events = StreamingTwins.typedEvents(
      StreamingTwins.readEvents(s, s"$d/events.parquet"))
    withStateParts(s, 8) {
      val query = StreamingTwins.sessionize(events).toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .groupBy("user_id").agg(max(col("sessions")).as("sessions"))
      .orderBy("user_id")
  }

  /** Streaming paragraph dedup as a driver row: the x37 preparation
    * (banner + 32-token chunks) applied to a documents STREAM, deduped
    * by the stateful `flatMapGroupsWithState` twin, reassembled by the
    * streaming aggregation, and hashed against the SAME oracle as the
    * batch x37. Update-mode sink with the whole corpus in one
    * micro-batch (single staged file, no maxFilesPerTrigger) — one
    * final row per document, exactly the batch answer.
    */
  val x52_streaming_paragraph_dedup: QuerySpec = duck(
    "x52_streaming_paragraph_dedup", paragraphDedupOracle) { (s, d) =>
    import graft.streaming.StreamingTwins
    val sep = "\n\n"
    val sink = "x52_paradedup_sink"
    s.catalog.dropTempView(sink)
    val prepared = StreamingTwins.readTable(s, s"$d/documents.parquet")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"),
        concat(lit("subscribe to our newsletter today" + sep),
          array_join(TA.chunkTokens(col("text"), 32), sep)).as("text"))
    withStateParts(s, 8) {
      val query = StreamingTwins.paragraphDedup(prepared, "doc_id", "text")
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .select(col("doc_id"),
        when(length(col("text")) === 0, lit(0L))
          .otherwise(size(split(col("text"), java.util.regex.Pattern.quote(sep)))
            .cast("bigint")).as("kept_paras"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Streaming bounded top-k-per-group as a driver row — the third
    * stateful twin made driver-visible (after x51/x52): O(k) state per
    * group, Update-mode memory sink, whole corpus in one micro-batch
    * (single staged file), hashed against the SAME oracle as batch x40.
    */
  val x53_streaming_topk: QuerySpec = q("x53_streaming_topk", topKOracle) { (s, d) =>
    import s.implicits._
    import graft.streaming.StreamingTwins
    val sink = "x53_topk_sink"
    s.catalog.dropTempView(sink)
    val rows = StreamingTwins.typedScored(
      StreamingTwins.readEvents(s, s"$d/events.parquet")
        .select(col("event_type").as("g"), col("value").as("score"),
          col("event_id").as("id")))
    withStateParts(s, 8) {
      val query = StreamingTwins.topKPerGroup(rows, 3).toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .select(col("g").as("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("bigint").as("rank"),
        round(col("col._1"), 2).as("value"), col("col._2").as("event_id"))
      .orderBy("event_type", "rank")
  }

  /** Streaming watermarked tumbling-window aggregate as a driver row —
    * the windowed face of §2.11 hashed against the batch q31 oracle.
    * Complete output mode: the memory sink is REPLACED with the full
    * window table every micro-batch, so this entry is multi-batch-safe
    * (unlike the update-mode twins, which rely on the one-batch staged
    * file); the watermark still bounds state on an unbounded stream.
    */
  val x54_streaming_hourly: QuerySpec = q("x54_streaming_hourly",
    CorpusQueries.hourlyOracle) { (s, d) =>
    import graft.streaming.StreamingTwins
    val sink = "x54_hourly_sink"
    s.catalog.dropTempView(sink)
    withStateParts(s, 8, noDataBatches = false) {
      val query = StreamingTwins.hourlyByType(
          StreamingTwins.readEvents(s, s"$d/events.parquet"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .select(col("w").cast("timestamp_ntz").as("w"), col("event_type"),
        col("n"), col("v"))
      .orderBy("w", "event_type")
  }

  /** ANALYZE-style profiling: one scan, every per-column stat — the
    * stats pass a lake ingest runs first. Exact distinct so DuckDB can
    * verify bit-for-bit (the 100 TB variant swaps in HLL, same plan).
    */
  val x55_profile: QuerySpec = q("x55_profile",
    """SELECT * FROM (
      |  SELECT 'doc_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(count(doc_id) AS BIGINT) AS non_null,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
      |    CAST(min(doc_id) AS VARCHAR) AS min_v, CAST(max(doc_id) AS VARCHAR) AS max_v
      |  FROM documents
      |  UNION ALL
      |  SELECT 'lang', CAST(count(*) AS BIGINT), CAST(count(lang) AS BIGINT),
      |    CAST(count(DISTINCT lang) AS BIGINT),
      |    CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(n_chars) AS BIGINT),
      |    CAST(count(DISTINCT n_chars) AS BIGINT),
      |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
      |  FROM documents) t
      |ORDER BY col_name""".stripMargin) { (s, d) =>
    graft.operators.TableStats.profile(
        Tables.documents(s, d), Seq("doc_id", "lang", "n_chars"))
      .withColumnRenamed("column", "col_name")
      .orderBy("col_name")
  }

  /** Small-file compaction: 64 micro-batch-debris files rewritten to
    * target-sized files by `Layout.compact`; the oracle pins that
    * compaction is content-preserving (the file-count contract is
    * spec'd in WritersSpec).
    */
  val x56_compaction: QuerySpec = q("x56_compaction",
    """SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val base = graft.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_compact_")).toString
    val small = s"$base/small"
    val out = s"$base/compacted"
    Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      .repartition(64).write.mode("overwrite").parquet(small)
    graft.sources.Layout.compact(s, small, out, targetBytes = 4L << 20)
    s.read.parquet(out).orderBy("doc_id")
  }

  /** Z-order (Morton) clustering key — the kernel behind
    * `Layout.writeZOrdered`'s multi-dimensional data skipping
    * (`ZOrderSpec` pins the row-group-pruning win; here the interleave
    * itself is verified bit-for-bit against DuckDB's bit arithmetic).
    */
  val x57_zorder_key: QuerySpec = q("x57_zorder_key",
    """SELECT doc_id, CAST((((a >> 0) & 1) << 0) | (((b >> 0) & 1) << 1) | (((a >> 1) & 1) << 2) | (((b >> 1) & 1) << 3) | (((a >> 2) & 1) << 4) | (((b >> 2) & 1) << 5) | (((a >> 3) & 1) << 6) | (((b >> 3) & 1) << 7) | (((a >> 4) & 1) << 8) | (((b >> 4) & 1) << 9) | (((a >> 5) & 1) << 10) | (((b >> 5) & 1) << 11) | (((a >> 6) & 1) << 12) | (((b >> 6) & 1) << 13) | (((a >> 7) & 1) << 14) | (((b >> 7) & 1) << 15) AS BIGINT) AS zval
      |FROM (SELECT doc_id, doc_id % 256 AS a, n_chars % 256 AS b FROM documents) t
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val z = graft.sources.Layout.zValue(
      col("doc_id") % 256, col("n_chars") % 256, bits = 8)
    Tables.documents(s, d)
      .select(col("doc_id"), z.cast("bigint").as("zval"))
      .orderBy("doc_id")
  }

  // fixture point stream for x58, staged once per JVM (values are
  // constants; the file stream source reads directories)
  private lazy val geofencePointsDir: String = {
    // deleteOnExit is a no-op on non-empty dirs — TempDirs does the
    // recursive cleanup
    graft.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_geofence_")).toString
  }
  @volatile private var geofenceStaged = false

  /** Streaming geofence as a driver row: a point stream joined
    * stream-static against a polygon layer on `st_intersects` — the
    * spatial planner strategy applies INSIDE each micro-batch (the
    * static side replans per batch). Stateless join in Append mode, so
    * the entry is multi-batch-safe without any one-batch assumption.
    * Points are strictly interior to their fences (no boundary-touch
    * ambiguity); the oracle recomputes containment with coordinate
    * arithmetic.
    */
  val x58_streaming_geofence: QuerySpec = q("x58_streaming_geofence",
    """WITH pts(id, x, y) AS (VALUES (1, 0.5, 0.5), (2, 2.5, 0.5),
      |                             (3, 1.5, 1.5), (4, 9.0, 9.0), (5, 0.1, 1.9)),
      |fences(fid, x0, y0, x1, y1) AS (VALUES (10, 0.0, 0.0, 1.0, 1.0),
      |                                       (20, 2.0, 0.0, 3.0, 1.0),
      |                                       (30, 0.0, 0.0, 2.0, 2.0))
      |SELECT id, fid FROM pts p JOIN fences f
      |  ON p.x >= f.x0 AND p.x <= f.x1 AND p.y >= f.y0 AND p.y <= f.y1
      |ORDER BY id, fid""".stripMargin) { (s, _) =>
    import s.implicits._
    import graft.geom.{GeomFunctions => G}
    val sink = "x58_geofence_sink"
    s.catalog.dropTempView(sink)
    synchronized {
      if (!geofenceStaged) {
        Seq((1, 0.5, 0.5), (2, 2.5, 0.5), (3, 1.5, 1.5), (4, 9.0, 9.0), (5, 0.1, 1.9))
          .toDF("id", "x", "y").coalesce(1)
          .write.mode("overwrite").parquet(geofencePointsDir)
        geofenceStaged = true
      }
    }
    val points = s.readStream
      .schema("id INT, x DOUBLE, y DOUBLE")
      .parquet(geofencePointsDir)
      .select(col("id"), G.st_point(col("x"), col("y")).as("geom"))
    val fences = Seq(
        (10, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"),
        (20, "POLYGON((2 0, 3 0, 3 1, 2 1, 2 0))"),
        (30, "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"))
      .toDF("fid", "wkt")
      .select(col("fid"), G.st_geomfromwkt(col("wkt")).as("fgeom"))
    withEphemeralCheckpoint(s) {
      val query = graft.streaming.StreamingTwins.geofence(points, "geom", fences, "fgeom")
        .select("id", "fid")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink).orderBy("id", "fid")
  }

  /** Fuzzy entity matching (record linkage): candidates blocked on
    * (brand, first name token) — Σ|block|² cost, not n² — then each
    * pair verified by the native codegen'd Jaro-Winkler kernel.
    * [[graft.functions.StrOps.jaroWinkler]] is calibrated bit-identical
    * to DuckDB's `jaro_winkler_similarity`, so the oracle reruns the
    * SAME similarity over the SAME candidate set and the >= 0.88
    * threshold cut agrees bit-for-bit (no rounding needed before the
    * filter; round(4) on output is display hygiene only).
    */
  val x59_fuzzy_match: QuerySpec = q("x59_fuzzy_match",
    """WITH p AS (SELECT p_partkey, p_name,
      |    p_brand || '|' || split_part(p_name, ' ', 1) AS blk
      |  FROM part)
      |SELECT a.p_partkey AS a, b.p_partkey AS b,
      |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS score
      |FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
      |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.88
      |  AND a.p_name <> b.p_name
      |ORDER BY a, b""".stripMargin) { (s, d) =>
    FuzzyMatch.blockedSelfMatch(
        Tables.part(s, d), "p_partkey", "p_name",
        concat_ws("|", col("p_brand"), split_part(col("p_name"), lit(" "), lit(1))),
        minScore = 0.88)
      .where(col("a_name") =!= col("b_name"))
      .select(col("a"), col("b"), round(col("score"), 4).as("score"))
      .orderBy("a", "b")
  }

  /** Data-quality expectation suite (the Deequ/dbt-test shape): five
    * declared constraints over `orders` — completeness, key
    * uniqueness, a value bound, a regex-pattern ratio, non-emptiness —
    * ALL computed in one aggregate pass (one scan + one exchange, not
    * one job per check; see [[graft.operators.Expectations]]). Every
    * metric is a single division / min / count, so doubles agree
    * bit-for-bit across engines without rounding.
    */
  val x60_expectations: QuerySpec = q("x60_expectations",
    """WITH m AS (SELECT
      |    CAST(count(o_custkey) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS completeness_custkey,
      |    CAST(min(o_totalprice) AS DOUBLE) AS min_totalprice,
      |    CAST(count(*) AS DOUBLE) AS row_count,
      |    CAST(sum(CASE WHEN regexp_matches(o_orderstatus, '^[OFP]$') THEN 1 ELSE 0 END) AS DOUBLE)
      |      / CAST(count(o_orderstatus) AS DOUBLE) AS status_pattern,
      |    CAST(count(DISTINCT o_orderkey) AS DOUBLE) / CAST(count(o_orderkey) AS DOUBLE) AS uniqueness_orderkey
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT 'completeness_custkey' AS check_name, completeness_custkey AS metric,
      |    completeness_custkey >= 1.0 AND completeness_custkey <= 1.0 AS passed FROM m
      |  UNION ALL SELECT 'min_totalprice', min_totalprice,
      |    min_totalprice >= 0.0 AND min_totalprice <= 1000000000.0 FROM m
      |  UNION ALL SELECT 'row_count', row_count,
      |    row_count >= 1.0 AND row_count <= 1000000000000.0 FROM m
      |  UNION ALL SELECT 'status_pattern', status_pattern,
      |    status_pattern >= 1.0 AND status_pattern <= 1.0 FROM m
      |  UNION ALL SELECT 'uniqueness_orderkey', uniqueness_orderkey,
      |    uniqueness_orderkey >= 1.0 AND uniqueness_orderkey <= 1.0 FROM m) t
      |ORDER BY check_name""".stripMargin) { (s, d) =>
    import graft.operators.Expectations
    import graft.operators.Expectations.Expectation
    Expectations.run(Tables.orders(s, d), Seq(
        Expectation("completeness_custkey", Expectations.completeness("o_custkey"), 1.0, 1.0),
        Expectation("min_totalprice", min(col("o_totalprice")), 0.0, 1000000000.0),
        Expectation("row_count", count(lit(1)), 1.0, 1000000000000.0),
        Expectation("status_pattern",
          Expectations.patternRatio("o_orderstatus", "^[OFP]$"), 1.0, 1.0),
        Expectation("uniqueness_orderkey", Expectations.uniqueness("o_orderkey"), 1.0, 1.0)))
      .orderBy("check_name")
  }

  /** Stream-STREAM attribution join as a driver row: clicks matched to
    * same-user purchases within 30 minutes, both sides watermarked so
    * join state is evicted (see
    * [[graft.streaming.StreamingTwins.attribution]]). Append mode,
    * stateless emission per match — multi-batch-safe. The oracle is
    * the batch self-join in integer µs.
    */
  val x61_streaming_attribution: QuerySpec = q("x61_streaming_attribution",
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
      |FROM events c JOIN events p ON p.user_id = c.user_id
      |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      |  AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 1800000000
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
    import graft.streaming.StreamingTwins
    val sink = "x61_attribution_sink"
    s.catalog.dropTempView(sink)
    val events1 = StreamingTwins.readEvents(s, s"$d/events.parquet")
    val events2 = StreamingTwins.readEvents(s, s"$d/events.parquet")
    withStateParts(s, 8, noDataBatches = false) {
      val query = StreamingTwins.attribution(
          events1.where(col("event_type") === "click"),
          events2.where(col("event_type") === "purchase"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .select(col("click_id"), col("purchase_id"), col("user_id"))
      .orderBy("click_id", "purchase_id")
  }

  /** Perplexity-bucket quality filtering (the CCNet head/middle/tail
    * split): x45 scores a sample; this scores EVERY document with
    * [[TA.unigramLogProb]] and cuts the corpus into training bands at
    * fixed score floors. Threshold cuts compare the ROUNDED score, so
    * cross-engine summation-order drift in the per-doc avg cannot flip
    * a band. Output is the per-band inventory a curriculum mix would
    * consume.
    */
  val x62_perplexity_bands: QuerySpec = q("x62_perplexity_bands",
    """WITH tok AS (SELECT doc_id,
      |        unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
      |      FROM documents),
      |freq AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq),
      |score AS (SELECT doc_id, round(avg(ln(freq.c / tot.t)), 4) AS lp
      |  FROM tok JOIN freq USING (token) CROSS JOIN tot GROUP BY doc_id),
      |banded AS (SELECT CASE WHEN lp >= -3.4 THEN 'head'
      |                       WHEN lp >= -3.45 THEN 'middle'
      |                       ELSE 'tail' END AS band, lp FROM score)
      |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
      |  min(lp) AS lo, max(lp) AS hi
      |FROM banded GROUP BY band ORDER BY band""".stripMargin) { (s, d) =>
    val scored = TA.unigramLogProb(Tables.documents(s, d), "doc_id", "text")
    scored
      .groupBy(TA.perplexityBand(col("logprob"),
        Seq("head" -> -3.4, "middle" -> -3.45)).as("band"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("logprob")).as("lo"), max(col("logprob")).as("hi"))
      .orderBy("band")
  }

  /** PageRank (3 iterations, d=0.85) over the part co-purchase graph —
    * parts sharing an order are linked both ways, so every vertex has
    * outdegree ≥ 1 (no dangling mass). The oracle unrolls the three
    * Pregel cycles as CTEs; per-iteration round(·,10) makes the
    * iterate bit-reproducible across engines (see
    * [[graft.operators.PageRank]]). The teleport constant is written
    * as a DOUBLE subtraction in the oracle — `CAST(1.0 AS DOUBLE) -
    * CAST(0.85 AS DOUBLE)` = 0.1500000000000000222 matching Scala's
    * folded `1.0 - damping`; a bare `(1.0 - 0.85)` folds in DECIMAL
    * on DuckDB to 0.1499999999999999944, one ulp off.
    */
  val x63_pagerank: QuerySpec = q("x63_pagerank",
    """WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      |deg AS (SELECT s, CAST(count(*) AS DOUBLE) AS deg FROM pairs GROUP BY s),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
      |r0 AS (SELECT s AS v, round(1.0 / (SELECT n FROM n), 10) AS r FROM deg),
      |r1 AS (SELECT p.t AS v,
      |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM n) + 0.85 * sum(r.r / deg.deg), 10) AS r
      |  FROM pairs p JOIN r0 r ON r.v = p.s JOIN deg ON deg.s = p.s GROUP BY p.t),
      |r2 AS (SELECT p.t AS v,
      |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM n) + 0.85 * sum(r.r / deg.deg), 10) AS r
      |  FROM pairs p JOIN r1 r ON r.v = p.s JOIN deg ON deg.s = p.s GROUP BY p.t),
      |r3 AS (SELECT p.t AS v,
      |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM n) + 0.85 * sum(r.r / deg.deg), 10) AS r
      |  FROM pairs p JOIN r2 r ON r.v = p.s JOIN deg ON deg.s = p.s GROUP BY p.t)
      |SELECT v AS part, r AS rank FROM r3 ORDER BY part""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
    val pairs = a.join(b, "ok")
      .where(col("pa") =!= col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
      .distinct()
    graft.operators.PageRank.run(pairs, "src", "dst", iters = 3)
      .select(col("v").as("part"), col("rank"))
      .orderBy("part")
  }

  /** Tokenizer induction: one BPE merge-selection step — adjacent
    * character-pair frequencies over the word-frequency table (pair
    * scan costs |vocab|, not |corpus|; see [[TA.bpePairStep]]). Top-50
    * pairs with a total tie-break order. DuckDB-dialect oracle (list
    * comprehension), driver-hash-checked like every duck() entry.
    */
  val x64_bpe_pairs: QuerySpec = duck("x64_bpe_pairs",
    """WITH words AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      |  FROM documents),
      |wf AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w),
      |pairs AS (SELECT unnest([substr(w, i, 2) FOR i IN range(1, length(w))]) AS pair, c
      |  FROM wf WHERE length(w) >= 2)
      |SELECT pair, CAST(sum(c) AS BIGINT) AS freq
      |FROM pairs GROUP BY pair
      |ORDER BY freq DESC, pair LIMIT 50""".stripMargin) { (s, d) =>
    TA.bpePairStep(Tables.documents(s, d), "text")
      .orderBy(col("freq").desc, col("pair"))
      .limit(50)
  }

  /** Incremental aggregate maintenance: the corpus is split into a
    * "historical" half and a "tonight's batch" half; each aggregates
    * to mergeable state independently and the states MERGE
    * ([[graft.operators.IncrementalAgg]]). The oracle is one full
    * re-aggregation of everything — the entry passes iff
    * merge(partial, partial) == total exactly (decimal sums make the
    * law exact; double partials would drift).
    */
  val x65_agg_merge: QuerySpec = q("x65_agg_merge",
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
      |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |FROM orders GROUP BY o_orderpriority, o_orderstatus
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin) { (s, d) =>
    import graft.operators.IncrementalAgg
    val orders = Tables.orders(s, d)
    val keys = Seq("o_orderpriority", "o_orderstatus")
    val hist = IncrementalAgg.toState(
      orders.where(col("o_orderkey") % 2 === 0), keys, "o_totalprice")
    val batch = IncrementalAgg.toState(
      orders.where(col("o_orderkey") % 2 =!= 0), keys, "o_totalprice")
    IncrementalAgg.merge(hist, batch, keys)
      .select(col("o_orderpriority"), col("o_orderstatus"),
        col("cnt").cast("bigint").as("cnt"),
        round(col("total"), 2).cast("double").as("total"),
        col("lo"), col("hi"))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  /** Equi-width histogram profiling (the distribution half of the x55
    * ANALYZE pass): 10 buckets over o_totalprice, bucket edges
    * computed with identical double arithmetic on both engines.
    */
  val x66_histogram: QuerySpec = q("x66_histogram",
    """WITH s AS (SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo,
      |                  CAST(max(o_totalprice) AS DOUBLE) AS hi FROM orders)
      |SELECT least(CAST(floor((CAST(o_totalprice AS DOUBLE) - s.lo)
      |    / ((s.hi - s.lo) / 10.0)) AS BIGINT), 9) AS bin,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders CROSS JOIN s
      |GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
    graft.operators.TableStats.histogram(Tables.orders(s, d), "o_totalprice", bins = 10)
      .orderBy("bin")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis):
    * 20 documents per source with inclusion probability ∝ n_chars —
    * the probability-proportional-to-size pick a curriculum mix uses
    * to favor long documents. Deterministic md5 uniform, so both
    * engines draw the SAME sample (see [[HashSplit.esKey]]); the rank
    * key stays internal — only ids and ranks are compared.
    */
  val x67_weighted_sample: QuerySpec = duck("x67_weighted_sample",
    """SELECT source, doc_id, n_chars, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY
      |      -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) + 1.0)
      |          / 4294967297.0) / CAST(n_chars AS DOUBLE),
      |      doc_id) AS rn
      |  FROM documents WHERE n_chars > 0) t
      |WHERE rn <= 20 ORDER BY source, rn""".stripMargin) { (s, d) =>
    HashSplit.weightedSample(
        Tables.documents(s, d).where(col("n_chars") > 0),
        "source", "doc_id", "n_chars", k = 20)
      .select(col("source"), col("doc_id"), col("n_chars"),
        col("rn").cast("bigint").as("rn"))
      .orderBy("source", "rn")
  }

  /** Cross-document duplicated-span census (word-granularity
    * suffix-array dedup, Lee et al. 2021): every 8-token span shared by
    * ≥2 documents, rolled up per doc as (n_spans, dup_spans, dup_frac)
    * — the boilerplate-removal signal whole-doc near-dup can't see.
    * The oracle recomputes the census from raw spans in DuckDB list
    * SQL (no hash parity needed: the engine's xxhash64 span keys
    * collide with probability ~2⁻⁶⁴, same argument as [[gramsCte]]).
    */
  val x68_dup_spans: QuerySpec = duck("x68_dup_spans",
    """WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |g AS (SELECT doc_id,
      |    list_distinct([array_to_string(t[i:i+7], ' ')
      |                   FOR i IN range(1, greatest(len(t)-6, 2))]) AS grams
      |  FROM tok),
      |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
      |shared AS (SELECT gram FROM e GROUP BY gram HAVING count(*) > 1),
      |dup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_spans
      |  FROM e JOIN shared USING (gram) GROUP BY doc_id)
      |SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_spans, dup.dup_spans,
      |  round(CAST(dup.dup_spans AS DOUBLE) / len(g.grams), 4) AS dup_frac
      |FROM g JOIN dup ON g.doc_id = dup.doc_id
      |ORDER BY g.doc_id""".stripMargin) { (s, d) =>
    Dedup.duplicatedSpans(Tables.documents(s, d), "doc_id", "text", k = 8)
      .orderBy("doc_id")
  }

  /** DSIR importance weights (Xie et al. 2023): every doc scored by the
    * hashed-uni+bigram log-likelihood ratio against the English slice
    * as the target distribution — the "make the web look like the
    * target" data-selection signal. The oracle recomputes the whole
    * fit+score from raw grams in DuckDB with the identical md5 bucket
    * keys and identical `(c+1)/(tot+4096)` smoothing shape; both sides
    * round the summed weight to 4 decimals (libm-ulp tolerance, the
    * x39/x45 precedent).
    */
  val x69_dsir_weights: QuerySpec = duck("x69_dsir_weights",
    """WITH tok AS (SELECT doc_id, lang,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
      |g AS (SELECT doc_id, lang,
      |    unnest(t || [array_to_string(t[i:i+1], ' ')
      |                 FOR i IN range(1, greatest(len(t), 2))]) AS gram
      |  FROM tok),
      |b AS (SELECT doc_id, lang, substr(md5(gram), 1, 3) AS bucket FROM g),
      |pc AS (SELECT doc_id, lang, bucket, CAST(count(*) AS DOUBLE) AS n
      |  FROM b GROUP BY doc_id, lang, bucket),
      |rawc AS (SELECT bucket, sum(n) AS cr FROM pc GROUP BY bucket),
      |tgtc AS (SELECT bucket, sum(n) AS ct
      |  FROM pc WHERE lang = 'en' GROUP BY bucket),
      |tots AS (SELECT (SELECT sum(cr) FROM rawc) AS rt, (SELECT sum(ct) FROM tgtc) AS tt),
      |lut AS (SELECT r.bucket,
      |    ln((coalesce(t.ct, 0.0) + 1.0) / (tots.tt + 4096.0))
      |      - ln((r.cr + 1.0) / (tots.rt + 4096.0)) AS llr
      |  FROM rawc r LEFT JOIN tgtc t USING (bucket) CROSS JOIN tots)
      |SELECT pc.doc_id, round(sum(lut.llr * pc.n), 4) AS weight
      |FROM pc JOIN lut USING (bucket)
      |GROUP BY pc.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.operators.ImportanceWeights
    val docs = Tables.documents(s, d)
    // target = a slice of the corpus → single-census specialization
    // (the ONE persisted per-doc bucket census serves both bucket
    // fits AND the Σ llr·n scoring rollup — the oracle mirrors the
    // same grouped algebra; the general two-corpus `weights` stays
    // for disjoint target corpora)
    ImportanceWeights.weightsWithin(docs, col("lang") === "en",
        "doc_id", "text", hexChars = 3)
      .select(col("doc_id"), round(col("weight"), 4).as("weight"))
      .orderBy("doc_id")
  }

  /** SemDeDup (Abbas et al. 2023): deterministic k-means cells over the
    * embedding space, then within-cell cosine dedup — every vector
    * labeled (cell, kept). Oracle: VALUES golden from the from-spec
    * Python mirror of the pinned k-means + cosine kernels
    * (tools/golden_ext.py `semdedup`, the x47/x48 parity lineage).
    * tau = 0.3 on the synthetic corpus (x06's threshold choice —
    * the generator plants no >0.5-cosine pairs).
    */
  val x70_semdedup: QuerySpec = duck("x70_semdedup",
    s"""SELECT vec_id, cell, kept FROM ${Goldens.valuesTable("x70_semdedup.tsv",
         Seq("vec_id" -> "BIGINT", "cell" -> "INTEGER", "kept" -> "BOOLEAN"))}
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    Dedup.semDedup(
        Tables.embeddings(s, d).filter(col("embedding").isNotNull),
        "vec_id", "embedding", tau = 0.3)
      .orderBy("vec_id")
  }

  /** SemDeDup over the cell-partitioned LAYOUT — the 100 TB production
    * path of x70 (the lshWrite/x36 pattern applied to semantic dedup):
    * `semDedupWrite` scores the coarse quantizer over the corpus
    * exactly once and hive-partitions the vectors by cell; the
    * pairwise keep rule then self-joins the READ-BACK layout, so both
    * join sides scan the same cell-clustered files, re-deduping at a
    * different tau re-reads the layout instead of re-scoring, and the
    * nondeterministic assign UDF can never double-evaluate (it ran at
    * write time). Write-once probe-many: the dir memo mirrors
    * x36's. Identical parameters to x70 ⇒ identical cells and drops ⇒
    * same golden; PlanQualitySpec pins the single-cell
    * partition-pruned read the layout exists for.
    */
  val x101_semdedup_layout: QuerySpec = duck("x101_semdedup_layout",
    s"""SELECT vec_id, cell, kept FROM ${Goldens.valuesTable("x70_semdedup.tsv",
         Seq("vec_id" -> "BIGINT", "cell" -> "INTEGER", "kept" -> "BOOLEAN"))}
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val dir = semDedupLayoutLock.synchronized { semDedupLayoutCache.getOrElseUpdate((s, d), {
      val p = graft.TempDirs.register(
        java.nio.file.Files.createTempDirectory("semdedup")).toString + "/emb_by_cell"
      Dedup.semDedupWrite(
        Tables.embeddings(s, d).filter(col("embedding").isNotNull),
        "vec_id", "embedding", p)
      p
    }) }
    Dedup.semDedupAssigned(
        s.read.parquet(dir).select("vec_id", "embedding", "cell"),
        "vec_id", "embedding", tau = 0.3)
      .orderBy("vec_id")
  }

  /** Streaming exact dedup as a driver row: the events stream UNIONED
    * WITH ITSELF (every event twice) flows through the watermarked
    * `dropDuplicates` twin; the deduped sink must reproduce the plain
    * batch census of the single table — the duplicate half vanishes in
    * stream state, proving the dedup rather than assuming unique input.
    * Append-mode sink: dropDuplicates emits first occurrences
    * immediately (the watermark only bounds state, it never holds
    * emission), and both copies land in micro-batch 1, so nothing is
    * late-dropped.
    */
  val x71_streaming_dedup: QuerySpec = q("x71_streaming_dedup",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    import graft.streaming.StreamingTwins
    val sink = "x71_dedup_sink"
    s.catalog.dropTempView(sink)
    val ev = StreamingTwins.readEvents(s, s"$d/events.parquet")
    withStateParts(s, 8, noDataBatches = false) {
      val query = StreamingTwins.dedupEvents(ev.unionAll(ev))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** Market-basket co-occurrence: frequent brand pairs across orders
    * with support and lift ([[graft.operators.Cooccur.frequentPairs]]).
    * The oracle recomputes the Apriori-pruned pair mining in plain SQL;
    * support >= 200 at sf0.01 keeps all 25 brands frequent, so the
    * pruning step is exercised without becoming vacuous (the HAVING on
    * pairs still cuts).
    */
  val x72_frequent_pairs: QuerySpec = q("x72_frequent_pairs",
    """WITH items AS (
      |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |freq AS (SELECT item, CAST(count(*) AS BIGINT) AS n
      |  FROM items GROUP BY item HAVING count(*) >= 200),
      |nb AS (SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS nb FROM items),
      |pruned AS (SELECT * FROM items WHERE item IN (SELECT item FROM freq)),
      |pairs AS (
      |  SELECT a.item AS pa, b.item AS pb, CAST(count(*) AS BIGINT) AS support
      |  FROM pruned a JOIN pruned b ON a.ok = b.ok AND a.item < b.item
      |  GROUP BY 1, 2 HAVING count(*) >= 200)
      |SELECT p.pa, p.pb, p.support,
      |  round(CAST(p.support AS DOUBLE) * (SELECT nb FROM nb)
      |    / (CAST(fa.n AS DOUBLE) * CAST(fb.n AS DOUBLE)), 6) AS lift
      |FROM pairs p JOIN freq fa ON fa.item = p.pa JOIN freq fb ON fb.item = p.pb
      |ORDER BY pa, pb""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    val part = Tables.part(s, d).select("p_partkey", "p_brand")
    val baskets = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
    graft.operators.Cooccur.frequentPairs(baskets, "l_orderkey", "p_brand",
      minSupport = 200L)
      .orderBy("pa", "pb")
  }

  /** Triangle count over the part co-purchase graph via degree
    * orientation ([[graft.operators.GraphOps.triangleCount]]). Edges
    * are support-pruned — co-purchased in >= 2 DISTINCT orders — the
    * standard noise cut for co-occurrence graphs, and the scale
    * governor: single-order pairings grow ~linearly with the fact
    * table (1.2M edges at sf0.1) while >= 2-support edges track the
    * real signal (3.6k), so the wedge join's Σd² cost stays bounded
    * as the corpus grows. The oracle counts each triangle once
    * through the canonical u<v<w 3-way edge join — an independent
    * formulation with no orientation step, so an orientation bug
    * (double counting, dropped wedges) cannot cancel out.
    */
  val x73_triangles: QuerySpec = q("x73_triangles",
    """WITH pairs AS (
      |  SELECT least(a.l_partkey, b.l_partkey) AS u,
      |    greatest(a.l_partkey, b.l_partkey) AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2)
      |SELECT CAST(count(*) AS BIGINT) AS triangles
      |FROM pairs e1 JOIN pairs e2 ON e2.u = e1.v
      |  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
    val edges = a.join(b, "ok").where(col("pa") =!= col("pb"))
      .groupBy(least(col("pa"), col("pb")).as("src"),
        greatest(col("pa"), col("pb")).as("dst"))
      .agg(countDistinct(col("ok")).as("sup"))
      .where(col("sup") >= 2)
      .select("src", "dst")
    graft.operators.GraphOps.triangleCount(edges, "src", "dst")
  }

  /** KMV distinct-count sketch ([[graft.functions.SketchAggs.KmvAgg]]):
    * single-pass mergeable cardinality estimation, both estimator
    * branches exercised — event_id (10k distinct ≫ k=256, the KMV
    * formula) and user_id (150 < k, the exact under-full path). The
    * oracle recomputes the estimate from the k-th smallest md5 in SQL:
    * md5-hash determinism is what makes a SKETCH hash-checkable at all.
    */
  val x74_kmv_distinct: QuerySpec = duck("x74_kmv_distinct",
    """WITH eh AS (SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) AS h FROM events),
      |uh AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events),
      |ek AS (SELECT h FROM eh ORDER BY h LIMIT 1 OFFSET 255),
      |uk AS (SELECT h FROM uh ORDER BY h LIMIT 1 OFFSET 255)
      |SELECT 'event_id' AS metric,
      |  round(CASE WHEN (SELECT count(*) FROM eh) < 256
      |    THEN CAST((SELECT count(*) FROM eh) AS DOUBLE)
      |    ELSE 255.0 / (CAST(concat('0x', substr((SELECT h FROM ek), 1, 12)) AS BIGINT)
      |                  / power(16, 12)) END, 4) AS est,
      |  CAST((SELECT count(DISTINCT event_id) FROM events) AS BIGINT) AS exact_n
      |UNION ALL
      |SELECT 'user_id',
      |  round(CASE WHEN (SELECT count(*) FROM uh) < 256
      |    THEN CAST((SELECT count(*) FROM uh) AS DOUBLE)
      |    ELSE 255.0 / (CAST(concat('0x', substr((SELECT h FROM uk), 1, 12)) AS BIGINT)
      |                  / power(16, 12)) END, 4),
      |  CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
      |ORDER BY metric""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggs
    val k = 256
    val ev = Tables.events(s, d)
    def one(c: String): DataFrame =
      ev.select(col(c), md5(col(c).cast("string")).as("h"))
        .agg(SketchAggs.kmv_min_k(k)(col("h")).as("sk"),
          countDistinct(col(c)).cast("bigint").as("exact_n"))
        .select(lit(c).as("metric"),
          SketchAggs.kmvEstimate(col("sk"), k).as("est"), col("exact_n"))
    one("event_id").unionAll(one("user_id")).orderBy("metric")
  }

  /** Robust outlier census: modified z-score (median/MAD) per event
    * type over the heavy-tailed `value` column
    * ([[graft.operators.TableStats.madOutliers]]).
    */
  val x75_mad_outliers: QuerySpec = q("x75_mad_outliers",
    """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
      |  FROM events GROUP BY 1),
      |d AS (SELECT e.event_type, abs(e.value - med.m) AS ad
      |  FROM events e JOIN med USING (event_type)),
      |mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS md FROM d GROUP BY 1)
      |SELECT d.event_type,
      |  CAST(count(*) FILTER (WHERE round(0.6745 * d.ad /
      |    (CASE WHEN mad.md = 0 THEN NULL ELSE mad.md END), 6) > 3.5) AS BIGINT)
      |    AS n_outliers,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM d JOIN mad USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    graft.operators.TableStats.madOutliers(
        Tables.events(s, d), Seq("event_type"), "value")
      .orderBy("event_type")
  }

  /** Count-min-sketch frequency estimation over the order-line brand
    * stream ([[graft.functions.SketchAggs.CmsAgg]]): bounded-state
    * mergeable per-key counting; the probe is a broadcast one-row
    * sketch + codegen md5 arithmetic, and the oracle rebuilds every
    * counter cell in SQL. `est >= exact_n` always (CMS never
    * undercounts); equality wherever no bucket collides.
    */
  val x76_cms_heavy: QuerySpec = duck("x76_cms_heavy",
    """WITH items AS (
      |  SELECT p.p_brand AS item FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey),
      |js AS (SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
      |counters AS (
      |  SELECT j, CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', item)), 1, 8))
      |      AS BIGINT) % 256 AS b,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM items CROSS JOIN js GROUP BY 1, 2),
      |brands AS (SELECT DISTINCT p_brand AS item FROM part),
      |probe AS (
      |  SELECT br.item, js.j,
      |    CAST(concat('0x', substr(md5(concat(CAST(js.j AS VARCHAR), ':', br.item)), 1, 8))
      |      AS BIGINT) % 256 AS b
      |  FROM brands br CROSS JOIN js),
      |est AS (
      |  SELECT p.item, min(coalesce(c.c, CAST(0 AS BIGINT))) AS est
      |  FROM probe p LEFT JOIN counters c ON c.j = p.j AND c.b = p.b
      |  GROUP BY 1),
      |ex AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1)
      |SELECT e.item AS brand, e.est, ex.n AS exact_n
      |FROM est e JOIN ex USING (item) ORDER BY brand""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggs
    val (depth, width) = (4, 256)
    val items = Tables.lineitem(s, d).select("l_partkey")
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("item"))
    val sketch = items.agg(SketchAggs.cms_sketch(depth, width)(col("item")).as("sk"))
    val exact = items.groupBy(col("item"))
      .agg(count(lit(1)).cast("bigint").as("exact_n"))
    exact.crossJoin(broadcast(sketch))
      .select(col("item").as("brand"),
        SketchAggs.cmsEstimate(col("sk"), col("item"), depth, width).as("est"),
        col("exact_n"))
      .orderBy("brand")
  }

  /** Leakage-safe train/val/test split: near-dup CLUSTERS are the
    * split unit ([[graft.operators.HashSplit.leakageSafeAssign]]), so
    * a test document can never have a near-duplicate in train. Oracle:
    * recursive-CTE connected components over all-pairs verified edges
    * + the IDENTICAL md5-threshold constants
    * ([[graft.operators.HashSplit.armThresholds]]) on the cluster
    * representative.
    */
  val x77_cluster_split: QuerySpec = {
    val Seq(t1, t2) = graft.operators.HashSplit.armThresholds(
      graft.operators.HashSplit.defaultSplits).toList
    duck("x77_cluster_split",
      s"""WITH RECURSIVE $verifiedCte,
         |edges AS (SELECT a AS src, b AS dst FROM verified
         |          UNION SELECT b, a FROM verified),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, t.r FROM edges e JOIN reach t ON t.id = e.dst),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |rep AS (SELECT d.doc_id, d.lang,
         |    CAST(coalesce(c.component, d.doc_id) AS VARCHAR) AS rep
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT CASE WHEN md5(rep) < '$t1' THEN 'train'
         |            WHEN md5(rep) < '$t2' THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, CAST(count(*) AS BIGINT) AS docs
         |FROM rep GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      // shared chain: minhash candidates → verified edges → components
      // all come from the family memos (one materialization per
      // (session, dir)), so this entry's own cost is one broadcast
      // join + groupBy over documents — the r11 driver sweep's per-rep
      // recompute of the whole verify+CC chain (x29 CPU) cannot recur
      val docs = Tables.documents(s, d)
      val comps = neardupComponents(s, d)
      graft.operators.HashSplit.leakageSafeAssign(docs, "doc_id", comps)
        .groupBy("split", "lang")
        .agg(count(lit(1)).cast("bigint").as("docs"))
        .orderBy("split", "lang")
    }
  }

  /** Ordered conversion funnel view → click → purchase
    * ([[graft.operators.Sessionize.funnel]]): stage i counts only at
    * or after the user's qualifying stage i−1 time. The oracle chains
    * min-after-previous CTEs — the same greedy prefix-minima the typed
    * aggregate computes in one pass.
    */
  val x78_funnel: QuerySpec = q("x78_funnel",
    """WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN s0 ON s0.user_id = e.user_id AND e.ts >= s0.t
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN s1 ON s1.user_id = e.user_id AND e.ts >= s1.t
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT 0 AS stage, 'view' AS stage_name,
      |  CAST((SELECT count(*) FROM s0) AS BIGINT) AS users
      |UNION ALL SELECT 1, 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
      |UNION ALL SELECT 2, 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)
      |ORDER BY stage""".stripMargin) { (s, d) =>
    Sessionize.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select(col("stage"), col("stage_name"), col("users"))
      .orderBy("stage")
  }

  /** Time-range moving average: 7-day trailing mean of daily order
    * revenue via a RANGE window frame over an integer day key — the
    * only window-frame kind the corpus didn't yet pin (q29 covers
    * ROWS). Day numbers are epoch-days integers so the frame
    * arithmetic is identical in both engines.
    */
  val x79_moving_avg: QuerySpec = q("x79_moving_avg",
    """WITH daily AS (
      |  SELECT CAST(floor(epoch_us(CAST(o_orderdate AS TIMESTAMP)) / 86400000000.0) AS BIGINT) AS d,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT d, CAST(round(CAST(avg(rev) OVER (ORDER BY d
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DECIMAL(18,6)), 2) AS DOUBLE)
      |  AS ma7
      |FROM daily ORDER BY d""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // floor, not cast: DuckDB's double→int cast ROUNDS while Spark's
    // truncates — floor is the one day-key both engines agree on
    val daily = Tables.orders(s, d)
      .groupBy(floor(unix_micros(col("o_orderdate").cast("timestamp")) /
          lit(86400000000.0)).cast("bigint").as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    // single global RANGE frame: daily rollup first (≤ one row per
    // day), so the unpartitioned window sorts days, not orders
    val w = Window.orderBy(col("d")).rangeBetween(-6, Window.currentRow)
    daily.select(col("d"),
        round(avg(col("rev")).over(w).cast("decimal(18,6)"), 2)
          .cast("double").as("ma7"))
      .orderBy("d")
  }

  /** First-order Markov transition matrix over each user's event-type
    * sequence: P(next | prev) with a deterministic total event order.
    * One user-key window exchange feeds both the lag and the rollups;
    * the probability denominator joins back per prev-state (25 rows,
    * broadcast).
    */
  val x80_markov_transitions: QuerySpec = q("x80_markov_transitions",
    """WITH steps AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev, event_type AS next
      |  FROM events),
      |trans AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
      |  FROM steps WHERE prev IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev, sum(n) AS t FROM trans GROUP BY 1)
      |SELECT trans.prev, trans.next, trans.n,
      |  round(CAST(trans.n AS DOUBLE) / tot.t, 6) AS p
      |FROM trans JOIN tot USING (prev)
      |ORDER BY prev, next""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, d)
      .select(lag(col("event_type"), 1).over(w).as("prev"),
        col("event_type").as("next"))
    // persisted (r21): `tot` derives from `trans`, and without the
    // persist the scan→window→aggregate subtree executed twice per
    // action (once per join side — Spark does not share common
    // subtrees across a join). The transition table is bounded by
    // |event-type vocabulary|² at ANY corpus size, so caching it is
    // free while the recompute it saves is a full raw pass.
    val trans = graft.CacheLifecycle.persist(
      steps.where(col("prev").isNotNull)
        .groupBy("prev", "next").agg(count(lit(1)).cast("bigint").as("n")))
    val tot = trans.groupBy("prev").agg(sum(col("n")).as("t"))
    trans.join(broadcast(tot), "prev")
      .select(col("prev"), col("next"), col("n"),
        round(col("n").cast("double") / col("t"), 6).as("p"))
      .orderBy("prev", "next")
  }

  /** Cohort retention: users grouped by signup week, counted per week
    * offset of later activity. All time arithmetic is integer epoch
    * math (µs → days → weeks), the proven cross-engine parity pair —
    * no date-function dialect at all.
    */
  val x81_cohort_retention: QuerySpec = q("x81_cohort_retention",
    """WITH cohort AS (
      |  SELECT user_id,
      |    CAST(floor(min(epoch_us(ts)) / 604800000000.0) AS BIGINT) AS cw
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |activity AS (
      |  SELECT DISTINCT e.user_id, c.cw,
      |    CAST(floor(epoch_us(e.ts) / 604800000000.0) AS BIGINT) - c.cw AS wk
      |  FROM events e JOIN cohort c ON c.user_id = e.user_id)
      |SELECT cw AS cohort_week, wk AS week_offset,
      |  CAST(count(*) AS BIGINT) AS active_users
      |FROM activity WHERE wk >= 0
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    // single floor'd division by week-µs (see x79: cast-vs-floor trap)
    def weeks(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / lit(604800000000.0)).cast("bigint")
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(weeks(min(col("ts"))).as("cw"))
    ev.join(broadcast(cohort), "user_id")
      .select(col("user_id"), col("cw"), (weeks(col("ts")) - col("cw")).as("wk"))
      .distinct()
      .where(col("wk") >= 0)
      .groupBy(col("cw").as("cohort_week"), col("wk").as("week_offset"))
      .agg(count(lit(1)).cast("bigint").as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** RFM segmentation: per-user recency/frequency/monetary quartiles
    * via ntile with a user-id tiebreak (without a total order the
    * quartile boundaries are engine-dependent), then segment counts.
    */
  val x82_rfm: QuerySpec = q("x82_rfm",
    """WITH rfm AS (
      |  SELECT user_id, max(epoch_us(ts)) AS r,
      |    CAST(count(*) AS BIGINT) AS f,
      |    CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS m
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |scored AS (
      |  SELECT user_id,
      |    ntile(4) OVER (ORDER BY r DESC, user_id) AS rq,
      |    ntile(4) OVER (ORDER BY f DESC, user_id) AS fq,
      |    ntile(4) OVER (ORDER BY m DESC, user_id) AS mq
      |  FROM rfm)
      |SELECT rq, fq, mq, CAST(count(*) AS BIGINT) AS users
      |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val rfm = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max(unix_micros(col("ts").cast("timestamp"))).as("r"),
        count(lit(1)).cast("bigint").as("f"),
        round(sum(col("value").cast("decimal(18,6)")), 4).cast("double").as("m"))
    // three global ntile windows over the per-user rollup (one row per
    // user) — the windows sort users, never raw events
    val scored = rfm.select(col("user_id"),
      ntile(4).over(Window.orderBy(col("r").desc, col("user_id")))
        .cast("bigint").as("rq"),
      ntile(4).over(Window.orderBy(col("f").desc, col("user_id")))
        .cast("bigint").as("fq"),
      ntile(4).over(Window.orderBy(col("m").desc, col("user_id")))
        .cast("bigint").as("mq"))
    scored.groupBy("rq", "fq", "mq")
      .agg(count(lit(1)).cast("bigint").as("users"))
      .orderBy("rq", "fq", "mq")
  }

  /** Streaming KMV distinct-count: the sketch aggregate runs inside a
    * live StreamingQuery (complete-mode memory sink) over the event
    * stream DOUBLED — exact streaming `count(distinct)` is unsupported
    * by design (unbounded state), and this is the bounded-state
    * replacement. The doubling proves the set-union merge semantics in
    * motion: duplicate arrivals cannot move any of the k minima, so
    * the live sketch — and therefore the estimate — hash-matches the
    * single-pass batch oracle (x74's event_id branch).
    */
  val x83_streaming_kmv: QuerySpec = duck("x83_streaming_kmv",
    """WITH eh AS (SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) AS h FROM events),
      |ek AS (SELECT h FROM eh ORDER BY h LIMIT 1 OFFSET 255)
      |SELECT 'event_id' AS metric,
      |  round(CASE WHEN (SELECT count(*) FROM eh) < 256
      |    THEN CAST((SELECT count(*) FROM eh) AS DOUBLE)
      |    ELSE 255.0 / (CAST(concat('0x', substr((SELECT h FROM ek), 1, 12)) AS BIGINT)
      |                  / power(16, 12)) END, 4) AS est""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggs
    import graft.streaming.StreamingTwins
    val k = 256
    val sink = "x83_kmv_sink"
    s.catalog.dropTempView(sink)
    val ev = StreamingTwins.readEvents(s, s"$d/events.parquet")
    // complete-mode sink (replaced wholesale per batch) — the same
    // noDataBatches=false class as x54/x93/x96 (r20 review)
    withStateParts(s, 8, noDataBatches = false) {
      val query = ev.unionAll(ev)
        .select(md5(col("event_id").cast("string")).as("h"))
        .agg(SketchAggs.kmv_min_k(k)(col("h")).as("sk"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .select(lit("event_id").as("metric"),
        SketchAggs.kmvEstimate(col("sk"), k).as("est"))
  }

  /** Matryoshka-style truncated-embedding retrieval (Kusupati et al.
    * 2022): rank by cosine over the FIRST 16 of 64 dimensions — the
    * cheap first-stage pass an MRL-trained index runs before full-dim
    * re-scoring — and carry the full-dim cosine of the survivors
    * alongside (the re-scoring column). 4× less vector arithmetic and
    * 4× smaller scan footprint per candidate; same TakeOrderedAndProject
    * shape as x07. Oracle: DuckDB list slicing + its own cosine.
    */
  val x84_matryoshka: QuerySpec = {
    val qv64 = (1 to 64).map(i => s"CAST(CAST(sin($i) AS REAL) AS DOUBLE)")
      .mkString("[", ", ", "]")
    val qv16 = (1 to 16).map(i => s"CAST(CAST(sin($i) AS REAL) AS DOUBLE)")
      .mkString("[", ", ", "]")
    duck("x84_matryoshka",
      s"""SELECT vec_id,
         |  round(list_cosine_similarity(CAST(embedding[1:16] AS DOUBLE[]), $qv16), 4) AS cos16,
         |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), $qv64), 4) AS cos64
         |FROM embeddings ORDER BY cos16 DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      import graft.functions.VectorFunctions.vec_cosine
      val q64 = typedLit(Array.tabulate(64)(i => math.sin(i + 1).toFloat))
      val q16 = typedLit(Array.tabulate(16)(i => math.sin(i + 1).toFloat))
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          round(vec_cosine(slice(col("embedding"), 1, 16), q16), 4).as("cos16"),
          round(vec_cosine(col("embedding"), q64), 4).as("cos64"))
        .orderBy(col("cos16").desc, col("vec_id"))
        .limit(10)
    }
  }

  /** Deterministic A/B experiment readout: users hash-split 50/50 into
    * arms ([[graft.operators.HashSplit]] thresholds, so assignment is
    * reproducible and engine-portable), conversion = any purchase,
    * pooled two-proportion z-score. The whole readout is one scan +
    * two tiny aggregates; the z arithmetic is spelled in the same
    * literal shape on both sides so the doubles fold identically.
    *
    * KNOWN EDGE (documented, not reachable on the md5-50/50 fixture):
    * if a future corpus hashed every user into ONE arm, the Spark
    * cross-join returns ZERO rows while the oracle's scalar subqueries
    * return one row of NULLs — a row-count divergence, not a silent
    * wrong value. Making the shapes agree would need NULL-exact
    * conditional aggregation on the Spark side; revisit only if a
    * fixture can actually produce an empty arm (r20 review).
    */
  val x85_ab_test: QuerySpec = {
    val Seq(t1) = graft.operators.HashSplit.armThresholds(
      Seq("A" -> 0.5, "B" -> 0.5)).toList
    q("x85_ab_test",
      s"""WITH arms AS (
         |  SELECT user_id,
         |    CASE WHEN md5(CAST(user_id AS VARCHAR)) < '$t1' THEN 'A' ELSE 'B' END AS arm,
         |    max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END)
         |      AS converted
         |  FROM events GROUP BY 1, 2),
         |s AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(converted) AS BIGINT) AS conv
         |  FROM arms GROUP BY 1),
         |w AS (SELECT
         |    (SELECT n FROM s WHERE arm = 'A') AS na,
         |    (SELECT conv FROM s WHERE arm = 'A') AS ca,
         |    (SELECT n FROM s WHERE arm = 'B') AS nb,
         |    (SELECT conv FROM s WHERE arm = 'B') AS cb)
         |SELECT na, ca, nb, cb,
         |  round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) /
         |    nullif(sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) *
         |         (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb)) *
         |         (1.0 / na + 1.0 / nb)), 0.0), 4) AS z
         |FROM w""".stripMargin) { (s, d) =>
      val arms = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(md5(col("user_id").cast("string")) < lit(t1), "A")
            .otherwise("B").as("arm"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150, 1)
          .otherwise(0)).as("converted"))
      val stats = arms.groupBy("arm")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("converted")).cast("bigint").as("conv"))
      val a = stats.where(col("arm") === "A")
        .select(col("n").as("na"), col("conv").as("ca"))
      val b = stats.where(col("arm") === "B")
        .select(col("n").as("nb"), col("conv").as("cb"))
      val pooled = (col("ca") + col("cb")).cast("double") / (col("na") + col("nb"))
      // nullif-guarded like the oracle: an all-convert (or no-convert)
      // experiment reads as z = NULL, not a division error
      val se = sqrt(pooled * (lit(1.0) - pooled) *
        (lit(1.0) / col("na") + lit(1.0) / col("nb")))
      a.crossJoin(broadcast(b))
        .select(col("na"), col("ca"), col("nb"), col("cb"),
          round((col("ca").cast("double") / col("na") -
              col("cb").cast("double") / col("nb")) /
            when(se === 0.0, lit(null)).otherwise(se), 4).as("z"))
    }
  }

  /** Binary-quantized retrieval (1 bit/dim, 64× compression): Hamming
    * shortlist over `sign_pack`ed words (native XOR+POPCNT codegen),
    * float-cosine rerank of the 40 survivors. Oracle recomputes the
    * sign bits, the Hamming count, and the rerank in DuckDB list SQL —
    * both stages are ordered on (integer, id) / (rounded, id) keys so
    * the rows are engine-portable.
    */
  val x86_binary_quantize: QuerySpec = {
    val qv64 = (1 to 64).map(i => s"CAST(CAST(sin($i) AS REAL) AS DOUBLE)")
      .mkString("[", ", ", "]")
    duck("x86_binary_quantize",
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |h AS (SELECT vec_id, e,
         |    CAST(list_sum([CASE WHEN (e[i] > 0) != (sin(i) > 0) THEN 1 ELSE 0 END
         |                   FOR i IN range(1, 65)]) AS BIGINT) AS hamming
         |  FROM v),
         |s AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT 40)
         |SELECT vec_id, hamming,
         |  round(list_cosine_similarity(e, $qv64), 4) AS cos_rerank
         |FROM s ORDER BY cos_rerank DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Similarity.binaryTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        Array.tabulate(64)(i => math.sin(i + 1).toFloat), k = 10)
    }
  }

  /** Hard-negative mining (ANCE-style): per anchor, the 3 most-similar
    * corpus vectors below the near-dup cutoff — broadcast anchors, one
    * corpus scan, bounded TopKAgg ranking. Oracle is the row_number
    * window over DuckDB's own cosine.
    */
  val x87_hard_negatives: QuerySpec = duck("x87_hard_negatives",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |a AS (SELECT vec_id AS anchor_id, e AS ae FROM v WHERE vec_id < 4),
      |p AS (SELECT anchor_id, vec_id, round(list_cosine_similarity(ae, e), 6) AS cos
      |      FROM a JOIN v ON vec_id != anchor_id)
      |SELECT anchor_id, CAST(rn AS BIGINT) AS rank, vec_id AS negative_id, cos
      |FROM (SELECT anchor_id, vec_id, cos,
      |        row_number() OVER (PARTITION BY anchor_id ORDER BY cos DESC, vec_id) AS rn
      |      FROM p WHERE cos < 0.95) t
      |WHERE rn <= 3
      |ORDER BY anchor_id, rank""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 4),
        "vec_id", "embedding", k = 3)
      .orderBy("anchor_id", "rank")
  }

  /** Per-document duplication coverage: fraction of token positions
    * under ≥1 cross-doc shared 8-token span (interval union via a
    * running-max sweep — no positions explosion). The oracle mirrors
    * the same sweep in DuckDB window SQL over raw span strings, so the
    * interval arithmetic is verified end-to-end, not just the census.
    */
  val x88_dup_coverage: QuerySpec = duck("x88_dup_coverage",
    """WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |g AS (SELECT doc_id, len(t) AS n,
      |    [array_to_string(t[i:i+7], ' ')
      |     FOR i IN range(1, greatest(len(t)-6, 2))] AS grams
      |  FROM tok),
      |e AS (SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM g),
      |shared AS (SELECT gram FROM e GROUP BY gram HAVING count(*) > 1),
      |pos0 AS (SELECT doc_id, n,
      |    unnest([{'i': i, 'gr': grams[i]} FOR i IN range(1, len(grams) + 1)]) AS u
      |  FROM g),
      |pos AS (SELECT doc_id, CAST(u['i'] AS BIGINT) AS s,
      |    least(CAST(u['i'] AS BIGINT) + 7, n) AS e, u['gr'] AS gram
      |  FROM pos0),
      |cv AS (SELECT doc_id, s, e,
      |    coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pm
      |  FROM pos JOIN shared USING (gram)),
      |cov AS (SELECT doc_id,
      |    CAST(sum(greatest(0, e - greatest(pm, s - 1))) AS BIGINT) AS covered_tokens
      |  FROM cv GROUP BY doc_id)
      |SELECT g.doc_id, CAST(g.n AS BIGINT) AS n_tokens, cov.covered_tokens,
      |  round(CAST(cov.covered_tokens AS DOUBLE) / g.n, 4) AS dup_coverage
      |FROM g JOIN cov USING (doc_id) ORDER BY g.doc_id""".stripMargin) { (s, d) =>
    Dedup.dupSpanCoverage(Tables.documents(s, d), "doc_id", "text", k = 8)
      .orderBy("doc_id")
  }

  /** Gopher-style quality-rule census (Rae et al. 2021): every rule as
    * an independent per-document boolean plus the conjunctive keep —
    * the rule-attribution readout a corpus-curation run reports.
    * Thresholds tuned to this corpus's 10–99-word synthetic documents
    * (the published web-crawl constants would fire uniformly).
    */
  val x89_gopher_rules: QuerySpec = duck("x89_gopher_rules",
    """WITH w AS (SELECT doc_id, text,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
      |m AS (SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(toks) AS mwl,
      |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
      |      / len(toks) AS alpha_frac,
      |    len(list_intersect(toks,
      |      ['the','be','to','of','and','that','have','with'])) AS n_stops,
      |    CAST(len(text) - len(replace(text, '#', ''))
      |      + (len(text) - len(replace(text, '...', ''))) // 3 AS DOUBLE)
      |      / len(toks) AS sym_ratio
      |  FROM w)
      |SELECT doc_id, n_words, round(mwl, 4) AS mean_wlen,
      |  n_words BETWEEN 20 AND 80 AS wc_ok,
      |  mwl BETWEEN 3.0 AND 10.0 AS mwl_ok,
      |  alpha_frac >= 0.8 AS alpha_ok,
      |  n_stops >= 1 AS stop_ok,
      |  sym_ratio <= 0.1 AS sym_ok,
      |  (n_words BETWEEN 20 AND 80) AND (mwl BETWEEN 3.0 AND 10.0)
      |    AND alpha_frac >= 0.8 AND n_stops >= 1 AND sym_ratio <= 0.1 AS keep
      |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("f",
        TA.gopherFlags(col("text"), minWords = 20, maxWords = 80, minStopWords = 1))
      .select(col("doc_id"), col("f.n_words"), col("f.mean_wlen"),
        col("f.wc_ok"), col("f.mwl_ok"), col("f.alpha_ok"), col("f.stop_ok"),
        col("f.sym_ok"), TA.gopherKeep(col("f")).as("keep"))
      .orderBy("doc_id")
  }

  /** LEFT OUTER stream-stream attribution as a driver row: x61's
    * matches plus a null-purchase row per click whose match window the
    * final watermark proved unmatchable. The oracle reproduces the
    * emission rule exactly: the global watermark is the MIN over both
    * sides' (max event time − delay), and an unmatched click emits iff
    * its whole `[c_ts, c_ts + horizon]` window sits strictly before
    * that watermark — clicks still inside the window when the stream
    * drains stay in state, unemitted (no retractable false negatives).
    * The oracle watermark is MILLISECOND-truncated before the delay is
    * subtracted — Spark's EventTimeStats tracks event-time maxima in
    * ms (µs div 1000), so an exact-µs oracle watermark would classify
    * a click whose window end lands inside the sub-ms truncation band
    * differently (emitted-null vs held-in-state) than the engine.
    */
  val x90_streaming_attribution_outer: QuerySpec = q("x90_streaming_attribution_outer",
    """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
      |           WHERE event_type = 'click'),
      |p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
      |      WHERE event_type = 'purchase'),
      |wm AS (SELECT m - m % 1000 - 3600000000 AS w FROM
      |  (SELECT least((SELECT max(epoch_us(ts)) FROM c),
      |                (SELECT max(epoch_us(ts)) FROM p)) AS m))
      |SELECT c.click_id, p.purchase_id, c.user_id
      |FROM c JOIN p ON p.user_id = c.user_id
      |  AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 1800000000
      |UNION ALL
      |SELECT c.click_id, NULL AS purchase_id, c.user_id
      |FROM c, wm
      |WHERE epoch_us(c.ts) + 1800000000 < wm.w
      |  AND NOT EXISTS (SELECT 1 FROM p
      |    WHERE p.user_id = c.user_id
      |      AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 1800000000)
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
    import graft.streaming.StreamingTwins
    val sink = "x90_attribution_outer_sink"
    s.catalog.dropTempView(sink)
    val events1 = StreamingTwins.readEvents(s, s"$d/events.parquet")
    val events2 = StreamingTwins.readEvents(s, s"$d/events.parquet")
    withStateParts(s, 8) {
      val query = StreamingTwins.attributionOuter(
          events1.where(col("event_type") === "click"),
          events2.where(col("event_type") === "purchase"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .select(col("click_id"), col("purchase_id"), col("user_id"))
      .orderBy("click_id", "purchase_id")
  }

  /** Population covariance matrix of the embedding corpus (upper
    * triangle) via the one-pass [[graft.functions.GramAgg]] second-
    * moment aggregate — the input PCA / ZCA-whitening needs. The SQL
    * twin explodes to (vec_id, i, x) and self-joins, which multiplies
    * the data d× before aggregating — exactly the shape the typed
    * aggregate exists to avoid at scale (its exchange carries one
    * d(d+3)/2-double buffer per map task instead).
    */
  val x91_embedding_covariance: QuerySpec = duck("x91_embedding_covariance",
    """WITH v AS (SELECT vec_id, CAST(u['i'] AS INTEGER) AS i,
      |    CAST(u['x'] AS DOUBLE) AS x
      |  FROM (SELECT vec_id,
      |      unnest([{'i': i, 'x': embedding[i]}
      |              FOR i IN range(1, len(embedding) + 1)]) AS u
      |    FROM embeddings
      |    WHERE len(list_filter(embedding, x -> x IS NULL)) = 0)),
      |s AS (SELECT i, sum(x) AS sx, count(*) AS n FROM v GROUP BY i),
      |p AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
      |      FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
      |      GROUP BY a.i, b.i)
      |SELECT p.i, p.j,
      |  round(p.sxy / si.n - (si.sx / si.n) * (sj.sx / sj.n), 6) + 0.0 AS cov
      |FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j
      |ORDER BY p.i, p.j""".stripMargin) { (s, d) =>
    val cov = graft.functions.GramAgg.covariance(64)
    Tables.embeddings(s, d)
      .agg(cov(col("embedding")).as("entries"))
      .select(explode(col("entries")).as("e"))
      .select(col("e._1").as("i"), col("e._2").as("j"), col("e._3").as("cov"))
      .orderBy("i", "j")
  }

  /** Sessionization AGAIN, but through Spark's built-in
    * `session_window` — the composition-first variant (§7.3 preference
    * (a): built-in op over custom state) of x51's
    * `flatMapGroupsWithState` twin, hashed against the SAME oracle.
    * The built-in merges overlapping `[t, t+gap)` windows in the
    * streaming aggregation's state store; the custom twin keeps only
    * (last-ts, count) per user. Same answer, different state shape —
    * having both driver-visible pins that the two session definitions
    * agree on this corpus (they can only diverge on an exact-gap
    * boundary, which µs-random timestamps never hit).
    */
  val x93_session_window: QuerySpec = q("x93_session_window",
    x51_streaming_sessionize.oracle.get) { (s, d) =>
    import graft.streaming.StreamingTwins
    val sink = "x93_session_window_sink"
    s.catalog.dropTempView(sink)
    val ev = StreamingTwins.readEvents(s, s"$d/events.parquet")
    withStateParts(s, 8, noDataBatches = false) {
      // complete mode: session merging cannot retract an update-mode
      // emission (Spark rejects update outright), and append would
      // hold back sessions still inside the watermark when the stream
      // drains — complete replaces the sink with the full final window
      // table every batch, so the entry is also multi-batch-safe
      val query = ev
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .groupBy("user_id").agg(count(lit(1)).as("sessions"))
      .orderBy("user_id")
  }

  /** Deterministic global corpus shuffle + dataloader shard assignment
    * via [[graft.operators.GlobalOrder]]: md5-keyed total order at
    * shuffle parallelism (range exchange + bounded per-partition
    * offsets), where the oracle's `row_number() OVER (ORDER BY …)`
    * funnels everything through one task — the plan this operator
    * exists to avoid at 100 TB.
    */
  val x92_global_shuffle: QuerySpec = q("x92_global_shuffle",
    """WITH k AS (SELECT doc_id,
      |    md5(CAST(doc_id AS VARCHAR) || ':shuffle42') AS k FROM documents)
      |SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT) AS pos,
      |  CAST((row_number() OVER (ORDER BY k, doc_id) - 1) % 8 AS BIGINT) AS shard
      |FROM k ORDER BY pos""".stripMargin) { (s, d) =>
    graft.operators.GlobalOrder.shuffleShards(
        Tables.documents(s, d), "doc_id", "shuffle42", nShards = 8, parts = 8)
      .select(col("doc_id"), col("pos"), col("shard"))
      .orderBy("pos")
  }

  /** Hybrid retrieval: BM25 lexical top-50 and dense cosine top-50
    * fused by reciprocal-rank fusion (Cormack et al. 2009,
    * score = Σ 1/(60+rank)) — the standard first-stage fusion of a RAG
    * retrieval stack. Ranks are assigned INSIDE the k-bounded
    * shortlists (a window over ≤ 50 rows after `TakeOrderedAndProject`
    * — bounded by construction, never a corpus-wide window), so at
    * 100 TB the only full scans are the two scoring passes x39/x07
    * already make.
    */
  val x94_rrf_fusion: QuerySpec = q("x94_rrf_fusion", {
    val qv = (1 to 64).map(i => s"CAST(CAST(sin($i) AS REAL) AS DOUBLE)")
      .mkString("[", ", ", "]")
    bm25ScoredCte + s""",
       |lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS lrank
       |  FROM scored ORDER BY round(score, 4) DESC, doc_id LIMIT 50),
       |dense AS (
       |  SELECT vec_id AS doc_id,
       |    row_number() OVER (
       |      ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), $qv), 4) DESC,
       |        vec_id) AS drank
       |  FROM embeddings
       |  ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), $qv), 4) DESC,
       |    vec_id LIMIT 50)
       |SELECT doc_id,
       |  round(coalesce(CAST(1 AS DOUBLE) / (60 + lrank), 0)
       |      + coalesce(CAST(1 AS DOUBLE) / (60 + drank), 0), 6) AS rrf
       |FROM lex FULL OUTER JOIN dense USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val lex = Bm25.topK(Tables.documents(s, d), "doc_id", "text",
        Seq("spark", "join", "vector"), k = 50)
      .withColumn("lrank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "lrank")
    val query = typedLit(Array.tabulate(64)(i => math.sin(i + 1).toFloat))
    val dense = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"),
        round(graft.functions.VectorFunctions.vec_cosine(col("embedding"), query), 4)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id")).limit(50)
      .withColumn("drank",
        row_number().over(Window.orderBy(col("cosine").desc, col("doc_id"))))
      .select("doc_id", "drank")
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        round(coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("drank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
      .select("doc_id", "rrf")
  }

  /** Sessionization a THIRD way: Spark 4's `transformWithState`
    * arbitrary-state API (typed ValueState in a StatefulProcessor, the
    * successor to x51's flatMapGroupsWithState), pinned to the same
    * oracle as x51/x93 — three state APIs, one answer. TWS requires the
    * RocksDB state-store provider, set (and restored) around the query
    * the same way the partition sizing is.
    */
  val x95_tws_sessionize: QuerySpec = q("x95_tws_sessionize",
    x51_streaming_sessionize.oracle.get) { (s, d) =>
    import s.implicits._
    import graft.streaming.StreamingTwins
    val sink = "x95_tws_sessions_sink"
    s.catalog.dropTempView(sink)
    val events = StreamingTwins.typedEvents(
      StreamingTwins.readEvents(s, s"$d/events.parquet"))
    StreamingTwins.withRocksDbProvider(s) {
      withStateParts(s, 8) {
        val query = StreamingTwins.sessionizeTws(events).toDF()
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try { query.processAllAvailable() } finally { query.stop() }
      }
    }
    s.table(sink)
      .groupBy("user_id").agg(max(col("sessions")).as("sessions"))
      .orderBy("user_id")
  }

  /** Watermarked SLIDING-window aggregate (1 h window, 15 min slide) —
    * the overlapping-window face of §2.11 that q31/x54's tumbling
    * windows don't cover: every event belongs to exactly four windows,
    * so state is 4× a tumbling window's and the watermark is what keeps
    * it bounded. Complete-mode sink like x54 (multi-batch-safe). The
    * oracle expands each event into its four aligned window starts in
    * integer-µs arithmetic.
    */
  val x96_streaming_sliding: QuerySpec = duck("x96_streaming_sliding",
    """SELECT make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000) AS w,
      |  event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS v
      |FROM events, unnest([0, 1, 2, 3]) AS t(k)
      |GROUP BY 1, 2 ORDER BY w, event_type""".stripMargin) { (s, d) =>
    import graft.streaming.StreamingTwins
    val sink = "x96_sliding_sink"
    s.catalog.dropTempView(sink)
    withStateParts(s, 8, noDataBatches = false) {
      val query = StreamingTwins.readEvents(s, s"$d/events.parquet")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").getField("start").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .select(col("w").cast("timestamp_ntz").as("w"), col("event_type"),
        col("n"), col("v"))
      .orderBy("w", "event_type")
  }

  /** Duplicated-span REMOVAL (x88's census as a rewrite, Lee et al.
    * 2022): tokens covered by any cross-document shared 8-gram span are
    * dropped, the rest keep their order. The oracle rebuilds every
    * document in DuckDB list SQL and both engines hash the rebuilt
    * text — rewrite verified byte-for-byte, not just counted.
    */
  val x97_dup_span_removal: QuerySpec = duck("x97_dup_span_removal",
    """WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |g AS (SELECT doc_id, len(t) AS n,
      |    [array_to_string(t[i:i+7], ' ')
      |     FOR i IN range(1, greatest(len(t)-6, 2))] AS grams
      |  FROM tok),
      |e AS (SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM g),
      |shared AS (SELECT gram FROM e GROUP BY gram HAVING count(*) > 1),
      |pos0 AS (SELECT doc_id, n,
      |    unnest([{'i': i, 'gr': grams[i]} FOR i IN range(1, len(grams) + 1)]) AS u
      |  FROM g),
      |pos AS (SELECT doc_id, CAST(u['i'] AS BIGINT) AS s,
      |    least(CAST(u['i'] AS BIGINT) + 7, n) AS e, u['gr'] AS gram
      |  FROM pos0),
      |sp AS (SELECT doc_id, list({'s': s, 'e': e}) AS sps
      |  FROM pos JOIN shared USING (gram) GROUP BY doc_id),
      |kept AS (SELECT tok.doc_id,
      |    [tok.t[j] FOR j IN range(1, len(tok.t) + 1)
      |     IF sp.sps IS NULL
      |        OR len(list_filter(sp.sps, x -> x['s'] <= j AND j <= x['e'])) = 0] AS kt
      |  FROM tok LEFT JOIN sp USING (doc_id))
      |SELECT doc_id, CAST(len(kt) AS BIGINT) AS kept_tokens,
      |  md5(coalesce(array_to_string(kt, ' '), '')) AS text_md5
      |FROM kept ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.removeDupSpans(Tables.documents(s, d), "doc_id", "text", k = 8)
      .orderBy("doc_id")
  }

  /** x71's doubled-stream dedup on the newer
    * `dropDuplicatesWithinWatermark` API — strictly-bounded state
    * (evicted once the watermark passes first-seen + delay) vs
    * `dropDuplicates`' grow-with-keys contract; same oracle, proving
    * the two state disciplines agree on a drained stream.
    */
  val x98_streaming_dedup_within_wm: QuerySpec = q("x98_streaming_dedup_within_wm",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    import graft.streaming.StreamingTwins
    val sink = "x98_dedup_wm_sink"
    s.catalog.dropTempView(sink)
    val ev = StreamingTwins.readEvents(s, s"$d/events.parquet")
    withStateParts(s, 8, noDataBatches = false) {
      val query = StreamingTwins.dedupEventsWithinWatermark(ev.unionAll(ev))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try { query.processAllAvailable() } finally { query.stop() }
    }
    s.table(sink)
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** Warm-started sessionization: the first half of the corpus is
    * summarized IN BATCH to per-user (last-ts, sessions) snapshots, the
    * second half streams through `transformWithState` with that
    * snapshot as INITIAL STATE, and the merged readout must equal the
    * full-corpus oracle — bootstrap + continuation ≡ continuous run,
    * including sessions that span the snapshot boundary. This is the
    * restart path a long-lived 100 TB sessionizer actually takes: seed
    * state from the batch summary instead of replaying history.
    */
  val x99_tws_bootstrap: QuerySpec = q("x99_tws_bootstrap",
    x51_streaming_sessionize.oracle.get) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.StreamingTwins
    val sink = "x99_bootstrap_sink"
    s.catalog.dropTempView(sink)
    // the same boundary instant on both sides. The ntz wall values ARE
    // UTC instants by the testdata contract, but the batch side's
    // ntz→timestamp cast (and the ntz literal cutoff below vs the
    // instant cutoff on the stream side) goes through the session tz —
    // so the equivalence rests on the UTC session contract, enforced
    // here exactly as in Tables.events / StreamingTwins.readEvents
    // rather than assumed (a non-UTC session would silently shift the
    // snapshot boundary and every session timestamp).
    require(s.conf.get("spark.sql.session.timeZone") == "UTC",
      "x99_tws_bootstrap: ntz→timestamp snapshot arithmetic requires " +
        "spark.sql.session.timeZone=UTC")
    val cutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z
    val prefix = Tables.events(s, d)
      .filter(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
      // same corrupt-row policy as typedEvents on the stream side —
      // including the null event_id drop, so a corrupt row is treated
      // identically on WHICHEVER side of the bootstrap cutoff it lands
      // (a null user_id would also become a NULL snapshot group whose
      // (Long, SessionState) encoder kills the query); null ts is
      // already dropped by the cutoff comparison above. Explicit
      // isNotNull (pushable), not na.drop (AtLeastNNonNulls is not)
      .filter(col("event_id").isNotNull && col("user_id").isNotNull)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // persisted: feeds BOTH the streaming query's initial-state relation
    // and the final readout join — without it the prefix scan + window
    // would run twice, against the entry's own don't-replay-history point
    val snapDf = prefix
      .withColumn("__us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull ||
          col("__us") - lag(col("__us"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(max(col("__us")).as("lastTsMicros"), sum(col("__new")).as("sessions"))
      .transform(graft.CacheLifecycle.persist(_))
    val snapshot = snapDf
      .select(col("user_id"),
        struct(col("lastTsMicros"), col("sessions")).as("state"))
      .as[(Long, StreamingTwins.SessionState)]
    val stream = StreamingTwins.typedEvents(
      StreamingTwins.readEvents(s, s"$d/events.parquet")
        .filter(col("ts") >= timestamp_micros(lit(cutoffUs))))
    StreamingTwins.withRocksDbProvider(s) {
      withStateParts(s, 8) {
        val query = StreamingTwins.sessionizeTwsBootstrap(stream, snapshot).toDF()
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try { query.processAllAvailable() } finally { query.stop() }
      }
    }
    // users quiet after the cutoff keep their snapshot count; streamed
    // users carry the continued count
    val streamed = s.table(sink)
      .groupBy("user_id").agg(max(col("sessions")).as("__live"))
    snapDf.select(col("user_id"), col("sessions").as("__snap"))
      .join(streamed, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("__live"), col("__snap")).as("sessions"))
      .orderBy("user_id")
  }

  /** Capstone composite — the curation path a training corpus actually
    * takes, each stage one of the operators above: exact dedup
    * (keep-min-id per content key, two-phase aggregate) → Gopher rule
    * gate (x89 thresholds) → deterministic global shuffle + dataloader
    * shard assignment (x92). One declarative plan end-to-end; the
    * oracle recomputes all three stages in SQL.
    */
  val x100_curation_pipeline: QuerySpec = duck("x100_curation_pipeline",
    """WITH survivors AS (
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
      |    FROM documents) t WHERE rn = 1),
      |m AS (SELECT doc_id,
      |    len(regexp_split_to_array(lower(trim(text)), '\s+')) AS nw,
      |    CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS mwl,
      |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |        x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
      |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS alpha_frac,
      |    len(list_intersect(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      ['the','be','to','of','and','that','have','with'])) AS n_stops
      |  FROM survivors),
      |kept AS (SELECT doc_id FROM m
      |  WHERE nw BETWEEN 20 AND 80 AND mwl BETWEEN 3.0 AND 10.0
      |    AND alpha_frac >= 0.8 AND n_stops >= 1),
      |ranked AS (SELECT doc_id,
      |    CAST(row_number() OVER (
      |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':curate42'), doc_id) - 1
      |      AS BIGINT) AS pos
      |  FROM kept)
      |SELECT doc_id, pos, CAST(pos % 4 AS BIGINT) AS shard
      |FROM ranked ORDER BY pos""".stripMargin) { (s, d) =>
    val survivors = Dedup.exact(Tables.documents(s, d), "text", "doc_id")
    val gated = survivors
      .withColumn("__f",
        TA.gopherFlags(col("text"), minWords = 20, maxWords = 80, minStopWords = 1))
      // sym rule dropped here: the corpus has no symbols, and the SQL
      // twin stays shorter — x89 pins the full rule set
      .filter(col("__f.wc_ok") && col("__f.mwl_ok") &&
        col("__f.alpha_ok") && col("__f.stop_ok"))
      .select("doc_id")
    graft.operators.GlobalOrder.shuffleShards(
        gated, "doc_id", "curate42", nShards = 4, parts = 8)
      .select(col("doc_id"), col("pos"), col("shard"))
      .orderBy("pos")
  }

  val all: Seq[QuerySpec] = Seq(
    x01_dedup_exact, x02_dedup_groups, x03_minhash_neardup, x04_ngram_jaccard,
    x05_simhash, x06_embedding_neardup, x07_ann_bruteforce, x08_ann_lsh,
    x09_langid, x10_quality, x11_tokens, x12_fingerprint, x13_multimodal,
    x14_neardup_remove, x15_ann_ivf, x16_clean_corpus, x17_winnowing,
    x18_region_rollup, x19_multimodal_frames, x20_cube, x21_percentile,
    x22_asof, x23_rangejoin, x24_sample, x25_neardup_clusters, x26_json,
    x27_interval_overlap, x28_decontaminate, x29_repetition, x30_token_budget,
    x31_quantize, x32_chunking, x33_mix_weights, x34_asof_forward,
    x35_embedding_neardup_banded, x36_ann_lsh_layout, x37_paragraph_dedup,
    x38_pii_scrub, x39_bm25_topk, x40_topk_per_group, x41_sessions,
    x42_hash_split, x43_vocab_topdf, x44_tfidf_keywords, x45_unigram_logprob,
    x46_seq_packing, x47_ann_pq, x48_ann_ivfpq, x49_dedup_incremental,
    x50_keep_latest, x51_streaming_sessionize, x52_streaming_paragraph_dedup,
    x53_streaming_topk, x54_streaming_hourly, x55_profile, x56_compaction,
    x57_zorder_key, x58_streaming_geofence, x59_fuzzy_match, x60_expectations,
    x61_streaming_attribution, x62_perplexity_bands, x63_pagerank,
    x64_bpe_pairs, x65_agg_merge, x66_histogram, x67_weighted_sample,
    x68_dup_spans, x69_dsir_weights, x70_semdedup, x71_streaming_dedup,
    x72_frequent_pairs, x73_triangles, x74_kmv_distinct, x75_mad_outliers,
    x76_cms_heavy, x77_cluster_split, x78_funnel, x79_moving_avg,
    x80_markov_transitions, x81_cohort_retention, x82_rfm,
    x83_streaming_kmv, x84_matryoshka, x85_ab_test, x86_binary_quantize,
    x87_hard_negatives, x88_dup_coverage, x89_gopher_rules,
    x90_streaming_attribution_outer, x91_embedding_covariance,
    x92_global_shuffle, x93_session_window, x94_rrf_fusion,
    x95_tws_sessionize, x96_streaming_sliding, x97_dup_span_removal,
    x98_streaming_dedup_within_wm, x99_tws_bootstrap,
    x100_curation_pipeline, x101_semdedup_layout)
}
