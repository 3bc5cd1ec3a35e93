package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.{TextAnalysis => TA}

/** Semantics tests for the §2.12 extension operators: planted
  * duplicates must be found, clean rows must not be flagged.
  */
class ExtOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the green hills tonight"
  private val docs = Seq(
    (1L, base),
    (2L, base),                                           // exact dup of 1
    (3L, base.replace("green", "blue")),                  // near dup of 1
    (4L, "completely different content about spark query engines and shuffle planning at scale"),
    (5L, "另一个 完全 不同 的 文档 关于 火车 和 天气")
  ).toDF("doc_id", "text")

  test("exact dedup keeps first per content key") {
    val kept = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("paragraph dedup keeps first occurrence across and within docs") {
    val pdocs = Seq(
      (1L, "banner text\n\nunique one\n\nunique one"),   // within-doc dup
      (2L, "banner text\n\nunique two"),                 // cross-doc dup of banner
      (3L, "banner text"),                               // all-dup doc -> empty
      (4L, null.asInstanceOf[String])                    // null -> empty
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(pdocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "banner text\n\nunique one")
    assert(out(2L) == "unique two")
    assert(out(3L) == "")
    assert(out(4L) == "")
    // non-text columns survive
    val extra = Dedup.paragraphDedup(
      pdocs.withColumn("lang", lit("en")), "doc_id", "text")
    assert(extra.columns.toSet == Set("doc_id", "lang", "text"))
    assert(extra.filter($"lang" =!= "en").count() == 0)
    // a non-numeric id fails LOUDLY at plan time: under ANSI the
    // decimal rank cast would throw mid-job, and with ANSI off it
    // yields NULL ranks and rebuilds EVERY document as empty text
    val e = intercept[IllegalArgumentException] {
      Dedup.paragraphDedup(
        pdocs.withColumn("doc_id", concat(lit("u"), $"doc_id")),
        "doc_id", "text")
    }
    assert(e.getMessage.contains("integral or decimal"))
  }

  test("exact dedup groups NULL-text rows as one key (SQL GROUP BY semantics)") {
    // documented policy: md5(NULL) is NULL, groupBy treats NULL as one
    // group (exactly what the DuckDB oracle's GROUP BY does), so all
    // but the min-id NULL-text row drop — callers preserving
    // failed-extraction rows filter them out first
    val withNulls = docs.unionByName(Seq(
      (6L, null.asInstanceOf[String]),
      (7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val kept = Dedup.exact(withNulls, "text", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("pii scrub redacts emails and phones and counts them") {
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or 555-0123-4567 thanks"),
      (2L, "no contact info here at all"),
      (3L, "two mails a@b.io c@d.co one phone 111-2222-3333")
    ).toDF("id", "text")
      .select($"id", TA.scrubPii($"text").as("s"),
        TA.emailCount($"text").as("e"), TA.phoneCount($"text").as("p"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toList
    assert(rows(0)._2 == "reach me at <EMAIL> or <PHONE> thanks")
    assert(rows(0)._3 == 1 && rows(0)._4 == 1)
    assert(rows(1)._2 == "no contact info here at all" && rows(1)._3 == 0 && rows(1)._4 == 0)
    assert(rows(2)._2 == "two mails <EMAIL> <EMAIL> one phone <PHONE>")
    assert(rows(2)._3 == 2 && rows(2)._4 == 1)
  }

  test("minhash LSH finds the exact and near dup, not the unrelated docs") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .filter($"est_jaccard" >= 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)))
    assert(!cands.exists { case (a, b) => b == 4L || a == 4L || a == 5L || b == 5L })
  }

  test("ngram jaccard verifies candidates exactly") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
    val verified = Dedup.ngramJaccard(docs, "doc_id", "text", cands)
      .filter($"a" === 1L && $"b" === 2L).collect()
    assert(verified.length == 1)
    assert(math.abs(verified(0).getAs[Double]("jaccard") - 1.0) < 1e-9)
  }

  test("simhash candidates find the near dup within hamming 3") {
    val pairs = Dedup.simhashCandidates(docs, "doc_id", "text")
      .withColumn("hamming", col("hamming").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toList
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0L })
  }

  test("embedding near-dup flags planted high-cosine pair only") {
    val v = Array.tabulate(64)(i => math.cos(i * 0.1).toFloat)
    val vNear = v.clone(); vNear(0) = v(0) + 0.01f
    val vFar = Array.tabulate(64)(i => math.sin(i * 1.7 + 1).toFloat)
    val emb = Seq((1L, v.toSeq), (2L, vNear.toSeq), (3L, vFar.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.99, 64)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("lsh top-k agrees with brute force on its own candidates") {
    val rnd = new scala.util.Random(7)
    val emb = (1L to 200L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 5)
      .collect().map(_.getLong(0)).toSeq
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", query, 5, 64,
      signBits = 4, probeHamming = 4) // full probe = must equal brute force
    assert(lsh.collect().map(_.getLong(0)).toSeq == brute)
  }

  test("language id picks the marked language") {
    val t = Seq(
      ("en", "the cat and the dog sat in the garden for a while"),
      ("de", "der hund und die katze sind mit dem mann zu haus"),
      ("fr", "le chien et le chat sont dans la maison des amis"),
      ("es", "el perro y el gato de la casa que está en un pueblo")
    ).toDF("truth", "text")
      .select($"truth", TA.languageId($"text").as("pred"))
      .collect()
    t.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("token counts and fingerprint are order-insensitive where expected") {
    val df = Seq(("a b c", "c b a"), ("x y", "x y")).toDF("t1", "t2")
      .select(
        TA.fingerprint($"t1").as("f1"), TA.fingerprint($"t2").as("f2"),
        TA.wsTokenCount($"t1").as("n1"), TA.bpeishTokenCount($"t1").as("n2"))
      .collect()
    assert(df(0).getString(0) == df(0).getString(1)) // shuffled copy, same fp
    assert(df(0).getAs[Int]("n1") == 3 && df(0).getAs[Int]("n2") == 3)
  }

  test("near-dup removal drops the exact and near copies, keeps originals") {
    val kept = Dedup.nearDupRemove(docs, "doc_id", "text", jaccardThreshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 2 (exact copy of 1) and 3 (one-word variant of 1) are removed
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("precomputed verified/components reuse hooks equal the internal chain") {
    // the r12 sharing hooks (one verified edge set fanned out to pair
    // drop, cluster dedup, and splitting) must be drop-in: identical
    // output to each operator's own candidate→verify→CC chain
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.65)
    val verified = Dedup.ngramJaccard(docs, "doc_id", "text", cands, 5)
      .filter(col("jaccard") >= 0.8)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(Dedup.nearDupRemove(docs, "doc_id", "text",
        precomputedVerified = Some(verified))) ==
      ids(Dedup.nearDupRemove(docs, "doc_id", "text")))
    val comps = Dedup.connectedComponents(verified, "a", "b")
    assert(ids(Dedup.nearDupRemoveCC(docs, "doc_id", "text",
        precomputedComponents = Some(comps))) ==
      ids(Dedup.nearDupRemoveCC(docs, "doc_id", "text")))
    assert(ids(Dedup.nearDupRemoveCC(docs, "doc_id", "text",
        precomputedVerified = Some(verified))) ==
      ids(Dedup.nearDupRemoveCC(docs, "doc_id", "text")))
  }

  test("ivf top-k agrees with brute force when probing all cells") {
    val rnd = new scala.util.Random(11)
    val emb = (1L to 300L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 5)
      .collect().map(_.getLong(0)).toSeq
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8)
    val full = Similarity.ivfTopK(index, "vec_id", "embedding", query, 5, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute)                       // nprobe = all cells == exact
    val probed = Similarity.ivfTopK(index, "vec_id", "embedding", query, 5, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(probed.nonEmpty && probed.toSet.subsetOf(emb.select("vec_id")
      .collect().map(_.getLong(0)).toSet))
  }

  test("ivf KMeans training input is capped at trainN and null-free") {
    val rnd = new scala.util.Random(7)
    val emb = (1L to 500L).map { i =>
      val v = if (i % 50 == 0) null else Array.fill(8)(rnd.nextGaussian().toFloat).toSeq
      (i, v)
    }.toDF("vec_id", "embedding")
    // the rows reaching the KMeans fit — bounded regardless of table size
    assert(Similarity.ivfTrainInput(emb, "vec_id", "embedding", 100).count() == 100L)
    assert(Similarity.ivfTrainInput(emb, "vec_id", "embedding", 100)
      .filter(col("embedding").isNull).count() == 0L)
    // a table smaller than trainN trains on all its non-null rows
    assert(Similarity.ivfTrainInput(emb, "vec_id", "embedding", 4096).count() == 490L)
    // the index itself still assigns EVERY non-null row a cell
    val index = Similarity.ivfBuild(emb.filter(col("embedding").isNotNull),
      "vec_id", "embedding", nCells = 4, trainN = 100)
    assert(index.assigned.count() == 490L)
    assert(index.assigned.select("cell").distinct().count() <= 4L)
    // and a corpus CONTAINING null embeddings builds instead of NPE-ing
    // in the kmeans predict UDF — null rows are simply never indexed
    val dirty = Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCells = 4, trainN = 100)
    assert(dirty.assigned.count() == 490L)
  }

  test("ivf assign fails LOUDLY on ragged null-free vectors (r21 local-Lloyd path)") {
    // the r21 rewrite replaced MLlib's dimension require with an
    // explicit raise_error in the assign projection — PqOps.ivfCell
    // alone would silently truncate the distance loop and route the
    // ragged row into a real cell. The loud-failure contract must
    // survive the rewrite.
    val emb = ((1L to 8L).map(i => (i, Seq.fill(8)(i.toFloat))) :+
      (9L, Seq.fill(5)(1.0f))).toDF("vec_id", "embedding")
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCells = 2, trainN = 4)
    // collect(), not count(): column pruning would drop the unused
    // cell projection from a count plan and never evaluate the guard
    val e = intercept[Exception] { index.assigned.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("cannot assign into a dim=8")), e.toString)
  }

  test("corrupt vectors neither index into IVF cells nor pad any top-k tail") {
    val rnd = new scala.util.Random(13)
    // 6 finite vectors + NaN/Inf rows: the assign pass must exclude
    // them (findClosest on all-NaN distances argmins into cell 0 —
    // permanently indexing the corrupt row, r20 review), and with
    // k > finite-row count no NULL-cosine row may pad the result
    // (the pqTopK/binaryTopK policy, now on every top-k path)
    val emb = ((1L to 6L).map(i =>
        (i, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq)) ++ Seq(
      (7L, Seq.fill(8)(Float.NaN)),
      (8L, (Float.PositiveInfinity +: Array.fill(7)(1.0f)).toSeq)))
      .toDF("vec_id", "embedding")
    val query = Array.tabulate(8)(i => math.cos(i + 1).toFloat)
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCells = 2, trainN = 100)
    assert(index.assigned.count() == 6L,
      "non-finite vectors must not be assigned a cell")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val clean = Set(1L, 2L, 3L, 4L, 5L, 6L)
    assert(ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 8)) == clean)
    assert(ids(Similarity.lshTopK(emb, "vec_id", "embedding", query, 8, 8,
      signBits = 4, probeHamming = 4)) == clean)
    assert(ids(Similarity.ivfTopK(index, "vec_id", "embedding", query, 8,
      nprobe = 2)) == clean)
  }

  test("table profile: null handling, one scan, string-typed extremes") {
    val df = Seq(
      (1L, Some("en"), Some(10L)),
      (2L, None, Some(5L)),
      (3L, Some("fr"), None),
      (4L, Some("en"), Some(25L)))
      .toDF("id", "lang", "n")
    val p = TableStats.profile(df, Seq("id", "lang", "n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 4L, 4L, "1", "4")))
    assert(p("lang") == ((4L, 3L, 2L, "en", "fr")))   // count/min/max skip nulls
    assert(p("n") == ((4L, 3L, 3L, "5", "25")))
    // single scan: the plan reads the source exactly once (the
    // multi-distinct rewrite expands rows, it does not rescan)
    val scans = TableStats.profile(df, Seq("id", "lang"))
      .queryExecution.executedPlan.collectLeaves().size
    assert(scans == 1, s"expected 1 leaf scan, got $scans")
  }

  test("profile and funnel survive non-identifier names (quoting, not splicing)") {
    // column names with spaces/quotes are routine in ingested CSVs;
    // bare splicing into selectExpr was a ParseException (and an
    // injection vector through the quoted literal)
    val odd = Seq((1L, "x"), (2L, "y")).toDF("my col", "it's")
    val p = TableStats.profile(odd, Seq("my col", "it's"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p("my col") == 2L && p("it's") == 2L, p)

    val events = Seq(
      (1L, "2024-01-01 00:00:00", "add'l view"),
      (1L, "2024-01-01 00:00:01", "buy"),
      (2L, "2024-01-01 00:00:00", "add'l view"))
      .toDF("user_id", "ts", "etype")
    val f = Sessionize.funnel(events, "user_id", "ts", "etype",
      Seq("add'l view", "buy"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f("add'l view") == 2L && f("buy") == 1L, f)
  }

  test("winnowing guarantees a shared fingerprint for long shared substrings") {
    import graft.operators.{TextAnalysis => T}
    val shared = "this exact long passage appears verbatim in both documents of the pair"
    val df = Seq(
      (1L, s"prefix one $shared and then some suffix"),
      (2L, s"a totally different lead-in $shared closing words here"),
      (3L, "nothing in common with the others at all, separate content entirely"))
      .toDF("id", "text")
      .select($"id", T.winnowingFingerprints($"text").as("fps"))
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Long]]("fps").toSet).toMap
    assert((df(1L) & df(2L)).nonEmpty)      // guaranteed overlap (len >= w+k-1)
    assert((df(1L) & df(3L)).size < (df(1L) & df(2L)).size)
  }

  test("multimodal resize stub downsamples deterministically") {
    val big = Array.tabulate[Byte](1000)(i => (i % 127).toByte)
    val small = Multimodal.resizeStub(big, 100)
    assert(small.length == 100)
    assert(Multimodal.resizeStub(big, 100).toSeq == small.toSeq)
    assert(Multimodal.resizeStub(small, 200) eq small) // no upscaling
  }

  test("null-text docs are never LSH candidates (no quadratic null blowup)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // every null doc used to share the identical empty-set signature,
    // so N nulls produced N²/2 candidate pairs at est_jaccard = 1.0
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val withNulls = docs.unionByName(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (100L until 110L).map(i => Row(i, null)), 2), schema))
    val cands = Dedup.minhashCandidates(withNulls, "doc_id", "text")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!cands.exists { case (a, b) => a >= 100L || b >= 100L },
      cands.filter { case (a, b) => a >= 100L || b >= 100L }.take(5).toSeq)
  }

  test("CC driver path picks the same representative as min(label) for every id type") {
    import spark.implicits._
    // Double ids: a toString comparison roots {9.0, 10.0} at "10.0"
    // (lexicographic), diverging from the distributed path's min()
    val dpairs = Seq((10.0, 9.0), (10.0, 11.0)).toDF("a", "b")
    val viaDriver = Dedup.connectedComponents(dpairs, "a", "b")
      .as[(Double, Double)].collect().toMap
    val viaCluster = Dedup.connectedComponents(dpairs, "a", "b", driverThreshold = 0)
      .as[(Double, Double)].collect().toMap
    assert(viaDriver == viaCluster, s"driver=$viaDriver cluster=$viaCluster")
    assert(viaDriver.values.toSet == Set(9.0))

    // string ids with a supplementary-plane char: UTF-8 binary order
    // (Spark's min) vs Java UTF-16 compareTo diverge — "𐀀"
    // (U+10000) is ABOVE "�" in UTF-8 but below it in UTF-16
    val s1 = "𐀀"; val s2 = "�"
    val spairs = Seq((s1, s2)).toDF("a", "b")
    val sd = Dedup.connectedComponents(spairs, "a", "b")
      .as[(String, String)].collect().toMap
    val sc = Dedup.connectedComponents(spairs, "a", "b", driverThreshold = 0)
      .as[(String, String)].collect().toMap
    assert(sd == sc, s"driver=$sd cluster=$sc")
  }

  test("connected components converge to the min id per cluster (both paths)") {
    import spark.implicits._
    // components: {1,2,3} (chain), {7,9} via one edge
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 7L)).toDF("a", "b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    // driver union-find path (default threshold)
    val viaDriver = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == expect)
    // distributed label-propagation path (threshold forced to 0)
    val viaCluster = Dedup.connectedComponents(pairs, "a", "b", driverThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(viaCluster == expect)
  }

  test("CC dedup keeps one row per cluster where pair policy keeps two") {
    import spark.implicits._
    // edges (a,c) and (b,c): one cluster {a,b,c}. Pair policy (drop
    // higher member of each pair) keeps {a,b}; CC keeps only a.
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val verifiedShape = Seq((1L, 3L, 0.9, 0.9), (2L, 3L, 0.9, 0.9))
      .toDF("a", "b", "est_jaccard", "jaccard")
    val kept = Dedup.nearDupRemoveCC(docs, "doc_id", "text",
        jaccardThreshold = 0.8,
        precomputedCandidates = Some(verifiedShape))
      .select("doc_id").as[Long].collect().toSet
    // note: ngramJaccard re-verifies, and these texts aren't really
    // similar — so instead check the component logic directly:
    val comps = Dedup.connectedComponents(verifiedShape, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(kept.contains(1L)) // doc 1 always survives
  }

  test("as-of join attaches the latest preceding right row per key") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val trades = Seq((1L, 10L, ts(100)), (2L, 10L, ts(200)), (3L, 20L, ts(50)))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq((10L, ts(90), 1.0), (10L, ts(150), 2.0), (10L, ts(200), 3.0),
      (20L, ts(60), 9.0)).toDF("sym", "ts", "px")
    val out = graft.operators.AsOfJoin
      .asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .select($"trade_id", $"asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(1.0))   // quote@90 precedes trade@100
    assert(out(2L).contains(3.0))   // equal-ts quote@200 counts (>= semantics)
    assert(out(3L).isEmpty)         // no quote before trade@50
  }

  test("as-of join: NULL attach values come from the MATCHED row, not a stale one") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val trades = Seq((1L, 10L, ts(100))).toDF("trade_id", "sym", "ts")
    // latest preceding quote has px=NULL but sz=7: native ASOF JOIN
    // attaches (NULL, 7) — a per-column last(ignoreNulls) sweep would
    // wrongly resurrect the older row's px=1.0
    val quotes = Seq(
      (10L, ts(50), Some(1.0), Some(5L)),
      (10L, ts(90), None, Some(7L))).toDF("sym", "ts", "px", "sz")
    val out = graft.operators.AsOfJoin
      .asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("px", "sz"))
      .select($"asof_px", $"asof_sz").as[(Option[Double], Option[Long])]
      .collect()
    assert(out.toSeq == Seq((None, Some(7L))),
      s"expected attach (NULL, 7) from the matched row, got ${out.toSeq}")
  }

  test("as-of join: NULL timestamps never match, either side") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // a NULL-ts quote sorts NULLS FIRST with a non-null struct: the
    // backward sweep would hand it to every trade lacking an earlier
    // real quote — native ASOF JOIN (the oracle) returns NULL there
    val trades = Seq((1L, 10L, Some(ts(100))), (2L, 10L, Some(ts(40))),
      (3L, 10L, None)).toDF("trade_id", "sym", "ts")
    val quotes = Seq((10L, Option.empty[java.sql.Timestamp], 99.0),
      (10L, Some(ts(90)), 1.0)).toDF("sym", "ts", "px")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = graft.operators.AsOfJoin
        .asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("px"), dir)
        .select($"trade_id", $"asof_px").as[(Long, Option[Double])]
        .collect().toMap
      // trade@40: no quote <= 40 exists — the NULL-ts quote must not
      // stand in for one (backward); trade with NULL ts matches nothing
      // in any direction
      if (dir == "backward") {
        assert(out(1L).contains(1.0) && out(2L).isEmpty, s"$dir: $out")
      }
      assert(out(3L).isEmpty, s"$dir: NULL-ts left row must not match, got $out")
    }
  }

  test("connected components converge on a chain deeper than maxIter (pointer doubling)") {
    import spark.implicits._
    // a 40-node path: diameter 39 >> the 10-round budget of plain
    // min-label propagation; pointer doubling must still converge
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = Dedup.connectedComponents(pairs, "a", "b", driverThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(comps.size == 40 && comps.values.forall(_ == 0L), s"got $comps")
  }

  test("band join equals the naive inequality join, exactly once per pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val intervals = (0 until 50).map { i =>
      val lo = rnd.nextDouble() * 100; (s"i$i", lo, lo + rnd.nextDouble() * 40)
    }.toDF("iid", "lo", "hi")
    val values = (0 until 200).map(j => (s"v$j", rnd.nextDouble() * 160 - 10))
      .toDF("vid", "v")
    val naive = intervals.join(values, $"v" >= $"lo" && $"v" <= $"hi")
      .select("iid", "vid").as[(String, String)].collect().sorted.toSeq
    for (w <- Seq(5.0, 33.0, 500.0)) {
      val banded = graft.operators.RangeJoin
        .bandJoin(intervals, "lo", "hi", values, "v", w)
        .select("iid", "vid").as[(String, String)].collect().sorted.toSeq
      assert(banded == naive, s"width=$w")
    }
  }

  test("interval overlap join equals the naive inequality join, exactly once per pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def intervals(n: Int, p: String) = (0 until n).map { i =>
      val lo = rnd.nextDouble() * 100; (s"$p$i", lo, lo + rnd.nextDouble() * 50)
    }
    val a = intervals(60, "a").toDF("aid", "a_lo", "a_hi")
    val b = intervals(60, "b").toDF("bid", "b_lo", "b_hi")
    val naive = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("aid", "bid").as[(String, String)].collect().sorted.toSeq
    for (w <- Seq(7.0, 40.0, 1000.0)) {
      val got = graft.operators.RangeJoin
        .intervalOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select("aid", "bid").as[(String, String)].collect().sorted.toSeq
      assert(got == naive, s"width=$w: ${got.size} vs ${naive.size}")
    }
    // auto width (median interval length) gives the same answer and a
    // sane width for this data (lengths uniform in [0,50] -> median ~25)
    val autoW = graft.operators.RangeJoin.autoBucketWidth(a, "a_lo", "a_hi", b, "b_lo", "b_hi")
    assert(autoW > 5.0 && autoW < 50.0, s"auto width $autoW")
    val gotAuto = graft.operators.RangeJoin
      .intervalOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi")
      .select("aid", "bid").as[(String, String)].collect().sorted.toSeq
    assert(gotAuto == naive)
    // degenerate inputs don't produce a zero width
    val pts = Seq(("p", 3.0, 3.0)).toDF("pid", "p_lo", "p_hi")
    assert(graft.operators.RangeJoin.autoBucketWidth(pts, "p_lo", "p_hi", pts, "p_lo", "p_hi") > 0)
  }

  test("autoBucketWidth memoizes per canonicalized input — repeats run zero jobs") {
    // r21: the width derivation is a driver-blocking aggregation job at
    // plan-construction time; re-invoking the operator on the SAME
    // inputs (every bench rep, every re-use of a declared query) must
    // serve the deterministic value from the memo instead of re-running
    // the job. Evicts on CacheLifecycle.release like every memo.
    import spark.implicits._
    def freshInputs() = {
      val rnd = new scala.util.Random(7)
      val rows = (0 until 40).map { i =>
        val lo = rnd.nextDouble() * 100; (s"m$i", lo, lo + rnd.nextDouble() * 20)
      }
      (rows.toDF("aid", "a_lo", "a_hi"), rows.toDF("bid", "b_lo", "b_hi"))
    }
    // count only jobs ATTRIBUTABLE to the width derivation (job group
    // set on the calling thread — autoBucketWidth's aggregation runs
    // synchronously on it): a global counter plus a fixed sleep was
    // flaky in both directions on a shared test session — any
    // incidental job in the drain window false-failed the zero
    // assertion, and a slow bus false-passed it (r21 advisor)
    val groupId = "width-memo-spec"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (e.properties != null &&
            groupId == e.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
    }
    graft.CacheLifecycle.release(spark)
    val (a1, b1) = freshInputs()
    val w1 = graft.operators.RangeJoin.autoBucketWidth(a1, "a_lo", "a_hi", b1, "b_lo", "b_hi")
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(groupId, "width memo spec")
    try {
      // fresh DataFrames, same derivation: canonicalized plans match
      val (a2, b2) = freshInputs()
      val w2 = graft.operators.RangeJoin.autoBucketWidth(a2, "a_lo", "a_hi", b2, "b_lo", "b_hi")
      Thread.sleep(300)  // bounded drain of the async listener bus
      assert(w2 == w1)
      assert(jobs.get() == 0, s"memoized derivation still ran ${jobs.get()} job(s)")
      // release evicts: the next derivation recomputes (runs jobs again)
      graft.CacheLifecycle.release(spark)
      val (a3, b3) = freshInputs()
      val w3 = graft.operators.RangeJoin.autoBucketWidth(a3, "a_lo", "a_hi", b3, "b_lo", "b_hi")
      val deadline = System.nanoTime() + 3_000_000_000L
      while (jobs.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(w3 == w1 && jobs.get() > 0, "release did not evict the width memo")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("HLL approx distinct stays within 5% of exact at corpus scale") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val exact = row.getAs[Long]("exact").toDouble
    val approx = row.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("kNN join matches brute-force nearest for k=1 and k=2 on mixed geometries") {
    import graft.geom.GeomCodec
    val rnd = new scala.util.Random(13)
    val pts = (1 to 60).map { i =>
      (i.toLong, GeomCodec.wktToWkb(
        s"POINT(${rnd.nextDouble() * 100} ${rnd.nextDouble() * 100})"))
    }.toDF("id", "geom")
    val sites = (1 to 12).map { j =>
      val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
      (j.toLong, GeomCodec.wktToWkb(
        s"POLYGON(($x $y, ${x + 3} $y, ${x + 3} ${y + 3}, $x ${y + 3}, $x $y))"))
    }.toDF("sid", "sgeom")

    def brute(k: Int): Set[(Long, Long)] = {
      val ss = sites.collect().map(r => (r.getLong(0), GeomCodec.read(r.getAs[Array[Byte]](1))))
      pts.collect().flatMap { r =>
        val g = GeomCodec.read(r.getAs[Array[Byte]](1))
        ss.map { case (sid, sg) => (r.getLong(0), sid, g.distance(sg)) }
          .sortBy { case (_, sid, d) => (d, sid) }.take(k)
          .map { case (id, sid, _) => (id, sid) }
      }.toSet
    }
    for (k <- Seq(1, 2)) {
      val got = NearestJoin.nearestJoin(pts, "geom", sites, "sgeom", k)
        .select("id", "near_sid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(k), s"k=$k")
    }
  }

  test("kNN join refuses an over-sized right side with an actionable error") {
    import graft.geom.GeomCodec
    val pts = Seq((1L, GeomCodec.wktToWkb("POINT(0 0)"))).toDF("id", "geom")
    val sites = (1 to 11).map(j =>
      (j.toLong, GeomCodec.wktToWkb(s"POINT($j 0)"))).toDF("sid", "sgeom")
    val e = intercept[IllegalArgumentException] {
      NearestJoin.nearestJoin(pts, "geom", sites, "sgeom", k = 1, maxRightRows = 10L)
    }
    assert(e.getMessage.contains("maxRightRows"), e.getMessage)
    assert(e.getMessage.contains("broadcast-sized"), e.getMessage)
    // at exactly the bound it proceeds
    assert(NearestJoin.nearestJoin(pts, "geom", sites, "sgeom",
      k = 1, maxRightRows = 11L).count() == 1)
  }

  test("decontamination drops exactly the docs sharing an n-gram with the eval set") {
    val eval = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "zzz alpha beta gamma delta yyy"),  // contains the eval 4-gram
      (2L, "alpha beta delta gamma"),          // same tokens, different order — clean
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val kept = Decontaminate.removeContaminated(train, eval, "doc_id", "text", n = 4)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 3L))
    // short eval doc (< n tokens) contaminates via its whole-doc gram
    val evalShort = Seq((200L, "rare pair")).toDF("doc_id", "text")
    val keptShort = Decontaminate.removeContaminated(
      Seq((1L, "rare pair"), (2L, "other text")).toDF("doc_id", "text"),
      evalShort, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(keptShort == Seq(2L))
  }

  test("bloom decontamination flags a superset of the exact contaminated ids") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val train = (1 to 50).map(i => (i.toLong, s"doc $i filler words " + ("x " * i).trim))
      .toDF("doc_id", "text")
      .union(Seq((99L, "pre alpha beta gamma delta epsilon zeta eta theta post"))
        .toDF("doc_id", "text"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val exact = ids(Decontaminate.contaminatedIds(train, eval, "doc_id", "text", n = 8))
    val bloom = ids(Decontaminate.contaminatedIdsBloom(train, eval, "doc_id", "text", n = 8))
    assert(exact == Set(99L))
    // no false negatives ever; false positives bounded by fpp
    assert(exact.subsetOf(bloom))
  }

  test("repetition ratio is 0 for all-distinct trigrams and rises with repeats") {
    val df = Seq(
      (1L, "a b c d e f"),          // all 4 trigrams distinct -> 0
      (2L, "x y x y x y x y"),      // cycling -> high repetition
      (3L, "w")                     // shorter than n -> single gram -> 0
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        TextAnalysis.repetitionRatio($"text", 3).as("rep"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got(0)._2 == 0.0)
    assert(got(1)._2 > 0.5)
    assert(got(2)._2 == 0.0)
  }

  test("as-of forward and nearest directions pick the right neighbor") {
    val l = Seq((1L, "k", 10L), (2L, "k", 25L), (3L, "k", 100L)).toDF("id", "k", "ts")
    val r = Seq(("k", 8L, "a"), ("k", 20L, "b"), ("k", 30L, "c")).toDF("k", "ts", "v")
    def run(dir: String): Map[Long, String] =
      AsOfJoin.asOfJoin(l, r, Seq("k"), "ts", Seq("v"), direction = dir)
        .collect().map(row => row.getAs[Long]("id") -> row.getAs[String]("asof_v")).toMap
    // backward: latest <=; forward: earliest >=; nearest: closer, ties backward
    assert(run("backward") == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(run("forward") == Map(1L -> "b", 2L -> "c", 3L -> null))
    // ts=25 is 5 from b(20) and 5 from c(30): tie -> backward -> b
    assert(run("nearest") == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // nearest must work on real timestamp types too (TIMESTAMP_NTZ has
    // no cast to DOUBLE — the distance math goes through unix_micros)
    val lTs = l.withColumn("ts", timestamp_micros($"ts" * 1000000L).cast("timestamp_ntz"))
    val rTs = r.withColumn("ts", timestamp_micros($"ts" * 1000000L).cast("timestamp_ntz"))
    val nearTs = AsOfJoin.asOfJoin(lTs, rTs, Seq("k"), "ts", Seq("v"), "nearest")
      .collect().map(row => row.getAs[Long]("id") -> row.getAs[String]("asof_v")).toMap
    assert(nearTs == Map(1L -> "a", 2L -> "b", 3L -> "c"))

    // inclusive on equal ts in both directions
    val lEq = Seq((1L, "k", 20L)).toDF("id", "k", "ts")
    assert(AsOfJoin.asOfJoin(lEq, r, Seq("k"), "ts", Seq("v"), "forward")
      .collect()(0).getAs[String]("asof_v") == "b")
    assert(AsOfJoin.asOfJoin(lEq, r, Seq("k"), "ts", Seq("v"), "backward")
      .collect()(0).getAs[String]("asof_v") == "b")
  }

  test("token chunking packs full windows plus a short tail and loses nothing") {
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = df.select(TextAnalysis.chunkTokens($"text", 4).as("c"))
      .collect()(0).getSeq[String](0)
    assert(chunks == Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    // round-trip: rejoined chunks == original token stream
    assert(chunks.mkString(" ") == (1 to 10).map(i => s"w$i").mkString(" "))
    // short doc -> one chunk, whole text
    val one = df.select(TextAnalysis.chunkTokens(lit("a b"), 4)).collect()(0).getSeq[String](0)
    assert(one == Seq("a b"))
  }

  test("scalar quantization bounds reconstruction error by half a step") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))      // zero vector: scale 0, q all 0
    ).toDF("vec_id", "embedding")
    val q = df.withColumn("qt", Similarity.scalarQuantize($"embedding"))
    val r1 = q.filter($"vec_id" === 1)
      .select($"qt.scale", Similarity.dequantError($"embedding", $"qt").as("err"))
      .collect()(0)
    assert(r1.getDouble(0) == 127.0)            // 127 / max|v| = 127/1.0
    // max error of round-to-int quantization is half a quantization step
    assert(r1.getDouble(1) <= 0.5 / 127.0 + 1e-12)
    val r2 = q.filter($"vec_id" === 2).select($"qt.scale", $"qt.q").collect()(0)
    assert(r2.getDouble(0) == 0.0)
    assert(r2.getSeq[Int](1).forall(_ == 0))
  }

  test("multimodal stub features are deterministic and batched") {
    val df = Seq((1L, "hello"), (2L, "world")).toDF("id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = Multimodal.extractFeatures(
      Multimodal.attachBlob(df, "payload", "text/plain"))
      .select($"id", element_at($"features", 1).as("len"))
      .orderBy("id").collect()
    assert(out(0).getAs[Float]("len") == 5.0f)
    assert(out(1).getAs[Float]("len") == 5.0f)
    // deterministic: same input twice -> same features
    val again = Multimodal.extractFeatures(
      Multimodal.attachBlob(df, "payload", "text/plain"))
      .select(element_at($"features", 3)).collect().map(_.getFloat(0))
    assert(again.toSeq == Multimodal.extractFeatures(
      Multimodal.attachBlob(df, "payload", "text/plain"))
      .select(element_at($"features", 3)).collect().map(_.getFloat(0)).toSeq)
  }

  test("duplicated-span census finds cross-doc spans and skips unique docs") {
    // 3-token spans: docs 1 and 2 share "a b c" and "b c d" (the spans of
    // the common prefix "a b c d"); doc 3 is fully unique; doc 4 repeats
    // a span WITHIN itself only — within-doc repeats are not duplication
    val sdocs = Seq(
      (1L, "a b c d x1 y1 z1"),
      (2L, "a b c d x2 y2 z2"),
      (3L, "p q r s t u v"),
      (4L, "m n o m n o m n o")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(sdocs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // doc1: spans {abc,bcd,cdx1,dx1y1,x1y1z1} -> 2 shared; same for doc2
    assert(out == List((1L, 5L, 2L), (2L, 5L, 2L)))
    // dup_frac is the rounded ratio
    val frac = Dedup.duplicatedSpans(sdocs, "doc_id", "text", k = 3)
      .filter($"doc_id" === 1).select($"dup_frac").collect()(0).getDouble(0)
    assert(frac == 0.4)
  }

  test("semDedup drops later same-cell near-identical vectors, keeps distinct ones") {
    // two tight groups far apart -> 2 cells; within each group the
    // lowest id survives and near-copies drop; the lone distinct
    // vector in each cell is kept
    def v(xs: Float*): Array[Float] = xs.toArray
    val rows = Seq(
      (1L, v(1f, 0f, 0f, 0f)),
      (2L, v(0.999f, 0.001f, 0f, 0f)),   // near-copy of 1 -> dropped
      (3L, v(0f, 0f, 1f, 0f)),
      (4L, v(0f, 0.001f, 0.999f, 0f)),   // near-copy of 3 -> dropped
      (5L, v(0.7f, 0.7f, 0f, 0f)),       // same half-space as 1, not similar enough
      (6L, null.asInstanceOf[Array[Float]]) // null vec: never paired, kept
    ).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(rows, "vec_id", "embedding",
        tau = 0.95, nCells = 2, trainN = 5)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true, 6L -> true))
  }

  test("semDedup layout round-trip reproduces the inline result") {
    // write-then-read through the cell-partitioned layout must give
    // the same (cell, kept) verdicts as the inline path — same
    // deterministic k-means, same keep rule, vectors and cells
    // surviving the parquet round-trip bit-exactly. Null vectors are
    // excluded on BOTH sides (the layout path's contract, like x101):
    // hive-partitioned writes park cell=NULL rows in the default
    // partition, which is a quarantine directory, not dedup input.
    def v(xs: Float*): Array[Float] = xs.toArray
    val rows = Seq(
      (1L, v(1f, 0f, 0f, 0f)),
      (2L, v(0.999f, 0.001f, 0f, 0f)),
      (3L, v(0f, 0f, 1f, 0f)),
      (4L, v(0f, 0.001f, 0.999f, 0f)),
      (5L, v(0.7f, 0.7f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val inline = Dedup.semDedup(rows, "vec_id", "embedding",
        tau = 0.95, nCells = 2, trainN = 5)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val dir = java.nio.file.Files.createTempDirectory("semdl").toString + "/emb"
    Dedup.semDedupWrite(rows, "vec_id", "embedding", dir,
      nCells = 2, trainN = 5)
    val viaLayout = Dedup.semDedupAssigned(
        spark.read.parquet(dir).select("vec_id", "embedding", "cell"),
        "vec_id", "embedding", tau = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(viaLayout == inline, s"layout path diverged: $viaLayout vs $inline")

    // the layout's write-once contract: re-deduping at a DIFFERENT tau
    // re-reads the same files, and a looser threshold must drop a
    // superset of a stricter one (cosine >= 0.95 pairs are also
    // >= 0.5 pairs; same cells, same lowest-id-wins rule)
    val layout = spark.read.parquet(dir).select("vec_id", "embedding", "cell")
    def dropped(tau: Double): Set[Long] =
      Dedup.semDedupAssigned(layout, "vec_id", "embedding", tau)
        .filter(!col("kept")).collect().map(_.getLong(0)).toSet
    val strict = dropped(0.95)
    val loose = dropped(0.5)
    assert(strict.subsetOf(loose),
      s"tau monotonicity violated: dropped@0.95=$strict not within dropped@0.5=$loose")
  }

  test("DSIR weights rank target-like docs above off-target docs") {
    // target slice = "spark" docs; a raw doc about spark must out-score
    // a raw doc about cooking under the target-vs-raw likelihood ratio
    val corpus = Seq(
      (1L, "spark shuffle partitions spark executor memory", "t"),
      (2L, "spark catalyst optimizer spark codegen stages", "t"),
      (3L, "spark shuffle executor catalyst partitions plan", "r"),
      (4L, "flour butter sugar eggs oven baking tray", "r"),
      (5L, "spark oven executor sugar partitions eggs", "r")
    ).toDF("doc_id", "text", "slice")
    val w = ImportanceWeights.weights(
        corpus, corpus.filter($"slice" === "t"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(3) > w(5) && w(5) > w(4))
    // weights exist for every corpus doc, including the target slice
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // the single-census slice specialization matches the general
    // two-corpus path to libm-ulp tolerance on the filter-of-corpus
    // case (same counts, same smoothing literals, same Σ llr·n
    // algebra; only the float summation ORDER differs — the two
    // censuses group on different key sets, so per-doc terms arrive
    // in different partition orders). x69's oracle rounds to 4
    // decimals for exactly this class of difference.
    val w1 = ImportanceWeights.weightsWithin(
        corpus, $"slice" === "t", "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1.keySet == w.keySet, s"specialization diverged: $w1 vs $w")
    w.foreach { case (k, v) =>
      assert(math.abs(w1(k) - v) < 1e-9,
        s"specialization diverged at doc $k: ${w1(k)} vs $v")
    }
  }
}
