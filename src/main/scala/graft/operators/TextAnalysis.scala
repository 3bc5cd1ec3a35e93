package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.12):
  * language-ID, quality scoring, token counting, fingerprinting. All
  * built-in (codegen'd) expressions — no UDFs — so they inline into
  * whole-stage codegen over a 100 TB scan.
  */
object TextAnalysis {

  /** Tiny per-language marker sets for the n-gram/stopword heuristic.
    * Real pipelines plug in a bigger table; the operator shape (argmax
    * over per-language hit counts, computed in one pass) is the point.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "ein"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "人"))

  /** THE canonical whitespace tokenizer — public so every corpus-
    * statistics operator (BM25, vocab, TF-IDF, unigram LM) shares one
    * definition instead of a copy; desynchronized tokenization would
    * silently skew df/tf against vocabulary statistics.
    */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Per-language marker-hit count. */
  def langHits(text: Column, lang: String): Column =
    size(array_intersect(tokens(text), typedLit(markers(lang))))

  /** Heuristic language ID: argmax of marker hits, 'und' when no
    * marker matches.
    */
  def languageId(text: Column): Column = {
    val scored = markers.keys.toSeq.sorted.map(l => struct(langHits(text, l).as("hits"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality metrics: length, word stats, whitespace/alpha ratios —
    * cheap per-row signals that large-scale filters threshold on.
    */
  def nWords(text: Column): Column = size(tokens(text))
  def nChars(text: Column): Column = length(text)

  def meanWordLen(text: Column): Column =
    when(nWords(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / nWords(text))

  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))

  /** Composite 0..1 quality score: penalize extreme doc lengths, word
    * lengths outside 3..12, and low alpha content.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(nChars(text).between(20, 100000), 1.0).otherwise(0.3)
    val wordOk = when(meanWordLen(text).between(2.0, 12.0), 1.0).otherwise(0.5)
    val alpha = greatest(alphaRatio(text), lit(0.1))
    round(lenOk * wordOk * alpha, 4)
  }

  /** Whitespace token count (the cheap estimator). */
  def wsTokenCount(text: Column): Column =
    length(text) - length(regexp_replace(text, " ", "")) + 1

  /** BPE-ish token count: alphanumeric runs + isolated punctuation,
    * the standard pre-tokenizer shape.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Order-insensitive document fingerprint: md5 over the sorted token
    * multiset — catches shuffled/reordered copies that exact dedup
    * misses.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))))

  /** Token n-grams as space-joined strings (positions 1..len-n+1; a
    * doc shorter than n tokens yields itself as its only gram). The
    * unit of eval-set decontamination overlap — raw strings, not
    * hashes, so an independent oracle needs no hash-function parity.
    */
  /** All positional token n-grams (with duplicates) — the shared gram
    * builder under [[tokenNgrams]] and [[repetitionRatio]], so x28's
    * oracle-parity proof of the boundary arithmetic covers both.
    *
    * Native codegen kernel ([[graft.functions.TokenNgramsExpr]]), not
    * the `transform(sequence(…), i => array_join(slice(t, i, n)))`
    * composition: HOF lambdas evaluate interpreted, and on that path
    * the captured `tokens(text)` split re-runs once per array ELEMENT
    * — O(tokens²) regex work per document, measured at ~26 CPU-s per
    * gram-census pass over the sf0.1 corpus (dominant cost of
    * x68/x69/x88/x97 before r11). The kernel produces the identical
    * array (same trim/lower/split semantics, same shorter-than-n
    * boundary) in one pass; `TokenNgramsSpec` pins equivalence against
    * the composed form.
    */
  private[operators] def rawTokenNgrams(text: Column, n: Int): Column =
    graft.functions.TextFunctions.token_ngrams(text, n)

  def tokenNgrams(text: Column, n: Int): Column =
    array_distinct(rawTokenNgrams(text, n))

  /** Within-document repetition: 1 − distinct/total token n-grams —
    * the Gopher-style repetitious-text signal (loops, boilerplate,
    * keyword stuffing score high; clean prose near 0).
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val all = rawTokenNgrams(text, n)
    lit(1.0) - size(array_distinct(all)).cast("double") / size(all)
  }

  /** Gopher-style per-rule quality flags (Rae et al. 2021, §A1.1):
    * each filter rule as an INDEPENDENT boolean plus the conjunction
    * `keep`, so a census can attribute removals rule-by-rule instead of
    * reporting one opaque drop count. Rules: word count in
    * [minWords, maxWords]; mean word length in [3, 10]; ≥ 80% of words
    * contain an alphabetic character; ≥ `minStopWords` distinct
    * stop-words present; symbol-to-word ratio (`#` or `...`) ≤ 0.1.
    * Thresholds are parameters — the published constants (50..100k
    * words, 2 stop-words) assume web-crawl prose; callers tune to their
    * corpus.
    *
    * All pure per-row built-in expressions, no UDF, no shuffle — the
    * 100 TB cost is the corpus scan itself, and every rule (including
    * alpha-word, a `regexp_count` over the normalized text) stays
    * inside whole-stage codegen.
    */
  def gopherFlags(
      text: Column, minWords: Int = 50, maxWords: Int = 100000,
      minStopWords: Int = 2): Column = {
    val toks = tokens(text)
    val nw = size(toks)
    val mwl = meanWordLen(text)
    // words containing a letter, counted directly on the normalized
    // string the tokenizer splits: \S*[a-z]\S* consumes a whole
    // whitespace-delimited token per match (greedy \S* cannot cross
    // whitespace), so the count equals filtering tokens(text) on
    // rlike("[a-z]") — without the interpreted higher-order-function
    // lambda that form pins into the plan (codegen falls back to
    // interpreted eval for HOF predicates)
    val alphaWords = regexp_count(lower(trim(text)), lit("\\S*[a-z]\\S*"))
    val stops = typedLit(Seq("the", "be", "to", "of", "and", "that", "have", "with"))
    val nStops = size(array_intersect(toks, stops))
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symRatio = (hashes + ellipses).cast("double") / nw
    struct(
      nw.cast("long").as("n_words"),
      round(mwl, 4).as("mean_wlen"),
      nw.between(minWords, maxWords).as("wc_ok"),
      mwl.between(3.0, 10.0).as("mwl_ok"),
      (alphaWords.cast("double") / nw >= 0.8).as("alpha_ok"),
      (nStops >= minStopWords).as("stop_ok"),
      (symRatio <= 0.1).as("sym_ok"))
  }

  /** The conjunction of every boolean field of a [[gopherFlags]]
    * struct — the document-level keep decision.
    */
  def gopherKeep(flags: Column): Column =
    flags.getField("wc_ok") && flags.getField("mwl_ok") &&
      flags.getField("alpha_ok") && flags.getField("stop_ok") &&
      flags.getField("sym_ok")

  // --- PII scrubbing ---------------------------------------------------

  /** Email/phone patterns kept to the regex subset where Java
    * (`java.util.regex`, Spark) and RE2 (DuckDB, Go tooling) agree —
    * character classes, bounded repetition, no lookaround, no word
    * boundaries — so the scrub is reproducible across engines.
    * Production pipelines extend the pattern table; the operator shape
    * (codegen'd `regexp_replace` chain + `regexp_extract_all` counts,
    * zero UDFs) is the point.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{4}-\\d{4}"

  /** Redact emails then phones. Single pass per pattern, inside
    * whole-stage codegen — the 100 TB cost is the scan itself.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Redaction audit counts (what a compliance report aggregates). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0)))

  /** Fixed-size token windows (training-sequence chunking): the text's
    * whitespace tokens packed into consecutive `chunkSize`-token
    * chunks, each rejoined with single spaces — the
    * document→training-sequence step of a pretraining pipeline. The
    * last chunk is the (possibly short) remainder; an empty doc yields
    * one empty chunk.
    */
  def chunkTokens(text: Column, chunkSize: Int): Column =
    // native stride-n kernel, same rationale as rawTokenNgrams: the
    // ceil+slice HOF form re-splits the text once per CHUNK on the
    // interpreted lambda path (TokenNgramsSpec pins equivalence)
    graft.functions.TextFunctions.token_chunks(text, chunkSize)

  /** Winnowing fingerprints (the rolling-hash document fingerprint of
    * Schleimer/Wilkerson/Aiken): k-gram rolling hashes → minimum of
    * each window of `w` consecutive hashes → distinct selected set.
    * Guarantees any shared substring of length ≥ w+k-1 between two
    * documents yields at least one shared fingerprint, with ~2/(w+1)
    * of positions selected — the sparse local-similarity signal used
    * for plagiarism/copy detection at corpus scale.
    */
  def winnowingFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    // native canonicalization-stable kernel: the pre-r13 method-local
    // UDF captured (k, w), so x17's persisted fingerprint frame could
    // never serve a rebuilt plan (see WinnowingOps scaladoc)
    graft.functions.TextFunctions.winnowing_fingerprints(text, k, w)

  /** Per-document mean unigram log-probability under the corpus's own
    * unigram LM — the CCNet perplexity-quality signal (Wenzek 2020
    * scores against an external KenLM; self-trained unigram stats are
    * the same shape without shipping a model). Scale: the corpus is
    * tokenized twice — once for the frequency table (partial-
    * aggregated on token), once for the score join; deliberately NOT
    * persisted, because the exploded token stream is strictly larger
    * than the corpus and re-tokenizing is cheaper than materializing
    * it. Corpus totals reduce over the tiny freq table and broadcast
    * as one row; the token-frequency join rides SMJ with AQE skew
    * split (stopword keys are hot by definition).
    *
    * Scores are round(·, `digits`) so cross-engine double drift in the
    * avg's summation order cannot leak into downstream threshold cuts.
    */
  def unigramLogProb(
      docs: DataFrame, idCol: String, textCol: String, digits: Int = 4): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    // persisted (r21): `freq` feeds BOTH the one-row total and the
    // score join, and without the persist each action ran the
    // corpus-sized explode + frequency aggregation TWICE (the plan
    // showed two independent Generate→HashAggregate chains). The
    // frequency table is vocabulary-bounded — the canonical
    // persist-worthy frame: tiny at rest, corpus-priced to rebuild.
    // Plan is canonicalization-stable (built-ins only), so repeated
    // invocations share one cache entry; released by CacheLifecycle
    // like every operator persist.
    val freq = graft.CacheLifecycle.persist(
      toks.groupBy("token").agg(count(lit(1)).as("c")))
    val tot = freq.agg(sum(col("c")).cast("double").as("t"))
    toks.join(freq, "token").crossJoin(broadcast(tot))
      .groupBy(idCol)
      .agg(round(avg(log(col("c") / col("t"))), digits).as("logprob"))
  }

  /** One BPE merge-selection step (Sennrich 2016): frequency of every
    * adjacent character pair, counted over the WORD-FREQUENCY table
    * weighted by word count — the classic trick that makes tokenizer
    * induction tractable at corpus scale: the pair scan runs over the
    * vocabulary (≤ millions of types), not the 100 TB token stream;
    * only the one word-count aggregation touches the corpus. The
    * top-scoring pair is the next merge a BPE trainer would apply.
    */
  def bpePairStep(docs: DataFrame, textCol: String): DataFrame = {
    val wf = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .where(length(col("w")) >= 2)
    wf.select(
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"),
        col("c"))
      .groupBy("pair").agg(sum(col("c")).as("freq"))
  }

  /** Inverted index build: term → document frequency + the sorted
    * posting list (the retrieval-side artifact next to [[Bm25]]'s
    * scoring). One explode + distinct (term, doc) + one groupBy:
    * `sort_array(collect_list(...))` makes the posting order
    * deterministic regardless of which partition delivered which doc.
    * `minDf` keeps the output to the head of the vocabulary — at
    * 100 TB a full index is written SHARDED BY TERM anyway (the
    * groupBy's hash partitioning IS that sharding; each reducer owns
    * a term range and writes its shard), and posting lists of
    * hub terms are the skew case AQE splits.
    * Output: `term`, `df`, `postings` (sorted ids).
    */
  def invertedIndex(
      docs: DataFrame, textCol: String, idCol: String, minDf: Long): DataFrame =
    docs.select(col(idCol).as("__doc"), explode(tokens(col(textCol))).as("term"))
      .distinct()
      .groupBy("term")
      .agg(count(lit(1)).cast("bigint").as("df"),
        sort_array(collect_list(col("__doc"))).as("postings"))
      .where(col("df") >= minDf)

  /** CCNet-style quality banding: assign each scored document to the
    * FIRST band whose floor its (rounded) score clears; documents
    * below every floor land in `tailBand`. The canonical
    * head/middle/tail split that decides which corpus slice trains
    * and which gets held back.
    */
  def perplexityBand(
      score: Column, floors: Seq[(String, Double)], tailBand: String = "tail"): Column =
    floors.foldRight(lit(tailBand): Column) { case ((name, floor), rest) =>
      when(score >= floor, name).otherwise(rest)
    }
}
