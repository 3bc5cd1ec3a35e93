package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword relevance scoring over a document corpus — the lexical
  * retrieval side of a training-data / RAG pipeline (the dense side is
  * `Similarity`). Okapi BM25 with the Lucene-style non-negative idf:
  *
  *   score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )
  *
  * Execution shape, designed for a 100 TB corpus and a human-sized
  * query (tens of terms):
  *
  *  1. ONE stats pass computes N, avgdl, and every per-term df in a
  *     single partial-aggregated scan (each df is a conditional sum —
  *     no explode, no per-term scan, no shuffle of tokens; the
  *     exchange carries one partial-agg row per task).
  *  2. The one-row stats result is broadcast (`crossJoin(broadcast)`)
  *     and the scoring pass evaluates tf per term with the native
  *     `filter` higher-order function — the whole score is a codegen'd
  *     expression tree over the token array, inside whole-stage
  *     codegen, zero UDFs, zero extra shuffles.
  *
  * Term frequencies use exact token equality on whitespace-split
  * lowercased text — the same tokenizer as `TextAnalysis` so corpus
  * statistics are consistent across operators.
  */
object Bm25 {

  // the shared canonical tokenizer — corpus statistics must agree
  // with TextAnalysis/vocab/TF-IDF operators
  private def tokens(text: Column): Column = TextAnalysis.tokens(text)

  /** Append a `score` column (BM25 of `queryTerms` against `textCol`).
    * Terms must be lowercase (the tokenizer lowercases the corpus side).
    */
  def score(
      df: DataFrame, textCol: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      scoreCol: String = "score"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.forall(t => t == t.toLowerCase),
      s"queryTerms must be lowercase (tokenizer lowercases the corpus): $queryTerms")
    val t = tokens(col(textCol))

    // one aggregate row: N, avgdl, df per term — partial-agg scan
    val dfCols = queryTerms.zipWithIndex.map { case (term, i) =>
      sum(when(array_contains(t, term), 1L).otherwise(0L)).as(s"__df_$i")
    }
    val aggs = count(lit(1)).as("__n") +: avg(size(t)).as("__avgdl") +: dfCols
    val stats = df.agg(aggs.head, aggs.tail: _*)

    // ONE scan of the token array keeps only query terms; per-term tf
    // then counts over the tiny filtered array, so scoring cost is
    // O(|d| + q·|matches|) not O(q·|d|). Materialized as a column so
    // CollapseProject keeps the filter single-evaluation.
    val qtArr = array(queryTerms.map(lit): _*)
    val withToks = df.crossJoin(broadcast(stats))
      .withColumn("__qtoks", filter(t, x => array_contains(qtArr, x)))
      .withColumn("__dl", size(t).cast("double"))

    val contributions = queryTerms.zipWithIndex.map { case (term, i) =>
      val dft = col(s"__df_$i").cast("double")
      val idf = log((col("__n").cast("double") - dft + lit(0.5)) / (dft + lit(0.5)) + lit(1.0))
      val tf = size(filter(col("__qtoks"), x => x === lit(term))).cast("double")
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    }
    withToks
      .withColumn(scoreCol, contributions.reduce(_ + _))
      .drop((Seq("__n", "__avgdl", "__qtoks", "__dl") ++
        queryTerms.indices.map(i => s"__df_$i")): _*)
  }

  /** Top-k retrieval: ids and rounded scores, best first (rounded
    * score is the sort key so independent oracles agree at ties, the
    * x07/x15 convention). Plans to `TakeOrderedAndProject` — k rows
    * per partition reach the driver, never the corpus.
    */
  def topK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      scoreRound: Int = 4): DataFrame =
    score(df, textCol, queryTerms, k1, b)
      .select(col(idCol), round(col("score"), scoreRound).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}
