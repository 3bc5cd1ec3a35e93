package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Batch-surface companion to [[StreamChaosProbe]]: runs EVERY
  * `SparkEntry.queries` entry against a scale-factor dir whose
  * LLM-pipeline tables (documents / embeddings / events) are
  * deliberately hostile, and reports which entries uphold their
  * documented corrupt-row policy, fail loudly with a clear message, or
  * die with an opaque encoder/codegen task error.
  *
  * Hostile ingredients beyond the streaming probe's events:
  *  - documents: null / empty / whitespace-only / single-char text,
  *    null doc_id, conflicting duplicate doc_ids, exact- and near-dup
  *    text pairs, null lang/source/n_chars, non-ASCII text, one
  *    10k-char outlier;
  *  - embeddings: null vector, RAGGED vector (16 of 64 dims),
  *    right-length vector with a null element, NaN element, Infinity
  *    element, the ALL-ZERO vector (norm 0 — the cosine-normalize
  *    division hazard), null vec_id, duplicate vec_id, null label.
  *
  * TPC-H tables are byte-copied CLEAN from sf0.001 — the corpus
  * queries over them are stock SQL operators whose null semantics
  * Spark itself owns; the engine-owned surface is the x-family over
  * the hostile three. Adjudications are pinned in `BatchChaosSpec`.
  *
  * Usage: `sbt "runMain graft.tools.BatchChaosProbe"`.
  */
object BatchChaosProbe {

  // documents schema + Long boxing shared with StreamChaosProbe — the
  // two probes build one coupled fixture and must not drift
  private def documentsSchema = StreamChaosProbe.documentsSchema
  private def L(v: Long): java.lang.Long = StreamChaosProbe.L(v)

  private val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true),
    StructField("label", IntegerType, nullable = true)))

  private def I(v: Int): java.lang.Integer = java.lang.Integer.valueOf(v)

  /** 50 well-formed docs with enough shared vocabulary that the
    * shingle/minhash/winnowing paths produce real candidates, plus the
    * hostile block.
    */
  private def hostileDocuments: Seq[Row] = {
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val normal = (1 to 50).map { i =>
      val words = (0 until 40).map(j => vocab((i * 7 + j * 3) % vocab.length))
      Row(L(i), words.mkString(" "), if (i % 3 == 0) "en" else "de", "web",
        L(words.mkString(" ").length))
    }
    val dupText = normal(4).getString(1)           // doc 5's exact text
    val nearDup = dupText.replaceFirst("alpha", "omega")
    val hostile = Seq(
      Row(L(101), null, "en", "web", null),         // null text
      Row(L(102), "", "en", "web", L(0)),           // empty text
      Row(L(103), "   \t  \n ", "en", "web", L(8)), // whitespace only
      Row(L(104), "x", "en", "web", L(1)),          // single char
      Row(null, "orphan text with no id at all", "en", "web", L(29)), // null id
      Row(L(7), "conflicting duplicate id payload", "en", "web", L(32)), // dup id, other text
      Row(L(105), dupText, "en", "web", L(dupText.length)),   // exact dup of doc 5
      Row(L(106), nearDup, "en", "web", L(nearDup.length)),   // near dup of doc 5
      Row(L(107), "sin acentos no, con acentos sí — Cañada ünïcode ✓", null, null, null),
      Row(L(108), ("long " * 2000).trim, "en", "crawl", L(10000))) // 10k outlier
    normal ++ hostile
  }

  /** 40 clean deterministic 64-dim vectors plus the hostile block. */
  private def hostileEmbeddings: Seq[Row] = {
    def vec(seed: Int): Array[java.lang.Float] =
      Array.tabulate(64)(j => java.lang.Float.valueOf(
        math.sin(seed * 64 + j + 1).toFloat))
    val normal = (1 to 40).map(i => Row(L(i), vec(i), I(i % 4)))
    val withNullElem = vec(41); withNullElem(7) = null
    val withNaN = vec(42); withNaN(3) = java.lang.Float.valueOf(Float.NaN)
    val withInf = vec(43); withInf(5) = java.lang.Float.valueOf(Float.PositiveInfinity)
    val hostile = Seq(
      Row(L(201), null, I(0)),                                  // null vector
      Row(L(202), vec(44).take(16), I(1)),                      // ragged (16 of 64)
      Row(L(203), withNullElem, I(2)),                          // null element
      Row(L(204), withNaN, I(3)),                               // NaN element
      Row(L(205), withInf, I(0)),                               // Infinity element
      Row(L(206), Array.fill(64)(java.lang.Float.valueOf(0f)), I(1)), // all-zero (norm 0)
      Row(null, vec(45), I(2)),                                 // null id
      Row(L(5), vec(46), I(3)),                                 // duplicate id
      Row(L(207), vec(47), null))                               // null label
    normal ++ hostile
  }

  /** Hostile dir usable as a full `sfDir`: the streaming probe's
    * hostile events + richer hostile documents + hostile embeddings +
    * clean TPC-H tables copied from sf0.001.
    */
  def hostileDir(spark: SparkSession, cleanSf: String = "/root/testdata/sf0.001"): String = {
    val root = java.nio.file.Paths.get(StreamChaosProbe.hostileDir(spark))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(hostileDocuments, 2), documentsSchema)
    docs.coalesce(1).write.mode("overwrite")
      .parquet(root.resolve("documents.parquet").toString)
    val embs = spark.createDataFrame(
      spark.sparkContext.parallelize(hostileEmbeddings, 2), embeddingsSchema)
    embs.coalesce(1).write.mode("overwrite")
      .parquet(root.resolve("embeddings.parquet").toString)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$cleanSf/$t.parquet"),
          root.resolve(s"$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    root.toString
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("batch-chaos-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = hostileDir(spark)
    println(s"[chaos] hostile sf dir at $dir")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    var errs = 0
    names.foreach { n =>
      val o = StreamChaosProbe.run(spark, dir, n)
      o match {
        case StreamChaosProbe.Outcome(name, Some(r), None) =>
          println(f"[chaos] $name%-34s rows=$r")
        case StreamChaosProbe.Outcome(name, _, Some(e)) =>
          errs += 1
          println(f"[chaos] $name%-34s ERROR $e")
        case _ =>
      }
      graft.CacheLifecycle.release(spark)
      spark.catalog.clearCache()
    }
    println(s"[chaos] ${names.size} entries, $errs errors")
    spark.stop()
  }
}
