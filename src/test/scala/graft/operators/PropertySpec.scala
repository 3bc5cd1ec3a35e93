package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.SparkTestBase
import graft.geom.{GeomFunctions => G}

/** Property tests (SURVEY §5 item 4): algebraic invariants of the
  * spatial and dedup operators over generated inputs. Samples are drawn
  * deterministically (fixed seed) and kept small — each case runs a
  * real Spark job.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sq(x0: Double, y0: Double, side: Double): String =
    s"POLYGON(($x0 $y0, ${x0 + side} $y0, ${x0 + side} ${y0 + side}, $x0 ${y0 + side}, $x0 $y0))"

  /** Disjoint unit squares on a sparse grid with random group keys. */
  private def sampleGrids(n: Int, seed: Long): Seq[Seq[(String, String)]] = {
    val gen = for {
      cells <- Gen.nonEmptyListOf(Gen.choose(0, 400))
      keys <- Gen.listOfN(cells.distinct.size, Gen.oneOf("A", "B", "C"))
    } yield cells.distinct.zip(keys).map { case (cell, k) =>
      (k, sq((cell % 20) * 3.0, (cell / 20) * 3.0, 1.0)) // gap 2 => disjoint
    }
    val params = Gen.Parameters.default
    (0 until n).map(i => gen.pureApply(params, rng.Seed(seed + i)))
  }

  test("dissolve preserves total area for disjoint inputs") {
    for (rows <- sampleGrids(4, seed = 7)) {
      val df = rows.toDF("key", "wkt")
        .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
      val total = df.select(sum(G.st_area($"geom"))).collect()(0).getDouble(0)
      val dissolved = SpatialOps.dissolve(df, Seq("key"))
        .select(sum(G.st_area($"geom"))).collect()(0).getDouble(0)
      assert(math.abs(total - dissolved) < 1e-6, s"$total vs $dissolved")
    }
  }

  test("erase output is contained in the target: area never grows") {
    for (rows <- sampleGrids(3, seed = 21)) {
      val df = rows.toDF("key", "wkt")
        .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
      // erase a band covering part of the grid
      val eraser = Seq(sq(0, 0, 25)).toDF("wkt")
        .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
      val before = df.select(sum(G.st_area($"geom"))).collect()(0).getDouble(0)
      val erased = SpatialOps.erase(df, eraser)
      val after = Option(erased.select(sum(G.st_area($"geom"))).collect()(0).get(0))
        .map(_.asInstanceOf[Double]).getOrElse(0.0)
      assert(after <= before + 1e-9, s"$after > $before")
      // every output geometry is disjoint from the eraser interior
      val overlaps = erased
        .crossJoin(eraser.select($"geom".as("egeom")))
        .select(G.st_area(G.st_intersection($"geom", $"egeom")).as("a"))
        .filter($"a" > 1e-9).count()
      assert(overlaps == 0)
    }
  }

  test("overlay union conserves covered area (pieces partition the input)") {
    for (rows <- sampleGrids(3, seed = 33)) {
      val a = rows.toDF("ka", "wkt")
        .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
      val b = Seq(("B1", sq(1.5, 1.5, 20))).toDF("kb", "wkt")
        .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
      val out = SpatialOps.overlayUnion(a, b)
      // total piece area == area(a ∪ b) (planar partition, no overlap)
      val pieceSum = out.select(sum(G.st_area($"geom"))).collect()(0).getDouble(0)
      val aArea = a.select(sum(G.st_area($"geom"))).collect()(0).getDouble(0)
      val bArea = b.select(sum(G.st_area($"geom"))).collect()(0).getDouble(0)
      val interArea = a.crossJoin(b.select($"geom".as("g2")))
        .select(sum(G.st_area(G.st_intersection($"geom", $"g2")))).collect()(0).getDouble(0)
      val unionArea = aArea + bArea - interArea
      assert(math.abs(pieceSum - unionArea) < 1e-6, s"$pieceSum vs $unionArea")
    }
  }

  test("merge row count is the sum of the inputs") {
    val a = (1 to 37).map(i => (i.toLong, s"a$i")).toDF("id", "name")
    val b = (1 to 21).map(i => (s"b$i", i.toDouble)).toDF("name", "score")
    val merged = a.unionByName(b.withColumn("id", lit(null).cast("long")),
      allowMissingColumns = true)
    assert(merged.count() == 58)
  }

  test("exact dedup is idempotent and minimal-id-keeping") {
    val docs = (1L to 60L).map(i => (i, s"text ${i % 7}")).toDF("doc_id", "text")
    val once = Dedup.exact(docs, "text", "doc_id")
    val twice = Dedup.exact(once, "text", "doc_id")
    assert(once.count() == 7 && twice.count() == 7)
    assert(once.select(min("doc_id")).collect()(0).getLong(0) == 1L)
  }

  test("incremental exact dedup: batch-internal first wins, base-seen content dropped") {
    val base = Seq((1L, "seen"), (2L, "other")).toDF("doc_id", "text")
    val inc = Seq((10L, "seen"), (11L, "new"), (12L, "new"), (13L, "fresh"))
      .toDF("doc_id", "text")
    val got = Dedup.exactIncremental(inc, base, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 10 drops (content in base), 12 drops (11 is the within-batch first)
    assert(got == Set(11L, 13L), got)
    // empty increment and disjoint base are both safe
    assert(Dedup.exactIncremental(inc.limit(0), base, "text", "doc_id").count() == 0)
    assert(Dedup.exactIncremental(inc, base.limit(0), "text", "doc_id").count() == 3)
  }

  test("keep-latest compaction: newest version wins, version ties break on min id") {
    val df = Seq(
      ("k1", 1L, 10L), ("k1", 3L, 11L), ("k1", 2L, 12L), // k1: v3 wins
      ("k2", 5L, 20L), ("k2", 5L, 21L),                  // k2: tie -> id 20
      ("k3", 7L, 30L)
    ).toDF("key", "version", "id")
    val got = Dedup.keepLatest(df, "key", "version", "id")
      .select("key", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("k1" -> 11L, "k2" -> 20L, "k3" -> 30L), got)
    // no window anywhere in the plan — the whole point vs row_number
    val plan = Dedup.keepLatest(df, "key", "version", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("minhash estimated jaccard stays in [0,1] and is 1 for identical docs") {
    val docs = Seq((1L, "aaaa bbbb cccc dddd eeee"), (2L, "aaaa bbbb cccc dddd eeee"),
      (3L, "zzzz yyyy xxxx wwww vvvv")).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text").collect()
    cands.foreach { r =>
      val j = r.getAs[Double]("est_jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
    val identical = cands.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(identical.exists(_.getAs[Double]("est_jaccard") == 1.0))
  }

  /** Random word-soup docs with a tiny vocabulary (forces repeats). */
  private def sampleDocs(n: Int, seed: Long): Seq[String] = {
    val gen = Gen.nonEmptyListOf(Gen.oneOf("ax", "bx", "cx", "dx", "ex"))
      .map(_.mkString(" "))
    val params = Gen.Parameters.default
    (0 until n).map(i => gen.pureApply(params, rng.Seed(seed + i)))
  }

  test("chunking round-trips the token stream; all chunks full except the tail") {
    val docs = sampleDocs(24, seed = 31)
    val rows = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", $"text",
        TextAnalysis.chunkTokens($"text", 4).as("chunks"))
      .collect()
    rows.foreach { r =>
      val text = r.getAs[String]("text")
      val chunks = r.getSeq[String](2)
      assert(chunks.mkString(" ") == text, s"round-trip lost tokens for '$text'")
      val sizes = chunks.map(_.split(" ").length)
      assert(sizes.dropRight(1).forall(_ == 4), s"non-tail chunk not full: $sizes")
      assert(sizes.last >= 1 && sizes.last <= 4)
    }
  }

  test("paragraph dedup is idempotent and never grows a document") {
    val gen = Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta"))
    val params = Gen.Parameters.default
    val docs = (1L to 20L).map { i =>
      (i, gen.pureApply(params, rng.Seed(i)).mkString("\n\n"))
    }.toDF("doc_id", "text")
    val once = Dedup.paragraphDedup(docs, "doc_id", "text")
    val twice = Dedup.paragraphDedup(once, "doc_id", "text")
    assert(once.count() == 20) // rows preserved, never dropped
    val o = once.orderBy("doc_id").collect().map(_.getString(1))
    val t = twice.orderBy("doc_id").collect().map(_.getString(1))
    assert(o.toSeq == t.toSeq, "not idempotent")
    val before = docs.orderBy("doc_id").collect().map(_.getString(1))
    o.zip(before).foreach { case (after, b) =>
      assert(after.length <= b.length, s"document grew: '$b' -> '$after'")
    }
    // every distinct paragraph survives exactly once corpus-wide
    val survivors = once.select(explode(split(col("text"), "\n\n"))).
      filter(length(col("col")) > 0).groupBy("col").count().
      filter(col("count") > 1).count()
    assert(survivors == 0, "a paragraph survived twice")
  }

  test("bm25 scores are non-negative and zero exactly when no term matches") {
    val docs = (1L to 30L).map(i => (i, s"tok${i % 5} tok${i % 3} filler")).toDF("doc_id", "text")
    val scored = Bm25.score(docs, "text", Seq("tok1", "tok2")).collect()
    scored.foreach { r =>
      val s = r.getDouble(2)
      val text = r.getString(1)
      assert(s >= 0.0, s"negative score $s")
      val hits = text.split(" ").count(t => t == "tok1" || t == "tok2")
      assert((s == 0.0) == (hits == 0), s"score $s with $hits hits in '$text'")
    }
  }

  test("sessionize: session count is monotone in shrinking gap, bounded by event count") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 80L).map { i =>
      (i % 5, new java.sql.Timestamp(1700000000000L + rnd.nextInt(36000) * 1000L), i)
    }.toDF("user_id", "ts", "event_id")
    def sessions(gap: Long): Long =
      Sessionize.sessions(rows, "user_id", "ts", gap, Seq("event_id")).count()
    val wide = sessions(36000) // gap >= whole span: one session per user
    val mid = sessions(600)
    val tight = sessions(1) // almost every event its own session
    assert(wide == 5, wide)
    assert(wide <= mid && mid <= tight, s"$wide <= $mid <= $tight violated")
    assert(tight <= 80)
  }

  test("kmv estimate brackets truth and cms never undercounts on random multisets") {
    import graft.functions.SketchAggs
    val gen = Gen.listOfN(400, Gen.choose(0, 3000))
    val params = Gen.Parameters.default
    for (i <- 0 until 3) {
      val vals = gen.pureApply(params, rng.Seed(91 + i))
      val truth = vals.distinct.size.toLong
      val df = vals.map(_.toString).toDF("v")
      // KMV with k > distinct: exact. KMV with small k: within 50%
      // (loose prop bound; the tight statistical bound is spec-tested)
      val exact = df.select(md5($"v").as("h"))
        .agg(SketchAggs.kmvEstimate(SketchAggs.kmv_min_k(4096)($"h"), 4096))
        .collect()(0).getDouble(0)
      assert(exact == truth.toDouble, s"under-full KMV must be exact: $exact vs $truth")
      val est = df.select(md5($"v").as("h"))
        .agg(SketchAggs.kmvEstimate(SketchAggs.kmv_min_k(64)($"h"), 64))
        .collect()(0).getDouble(0)
      assert(est > truth * 0.5 && est < truth * 2.0, s"KMV est $est vs $truth")
      // CMS point estimates dominate the exact counts
      val sk = df.agg(SketchAggs.cms_sketch(4, 128)($"v").as("s"))
      val exactCounts = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val probes = exactCounts.keys.take(20).toSeq
      val ests = sk.select(probes.map(p =>
          SketchAggs.cmsEstimate($"s", lit(p.toString), 4, 128).as(s"p$p")): _*)
        .collect()(0)
      probes.zipWithIndex.foreach { case (p, j) =>
        assert(ests.getLong(j) >= exactCounts(p),
          s"CMS undercounted $p: ${ests.getLong(j)} < ${exactCounts(p)}")
      }
    }
  }

  test("funnel depths are antitone in stage list extension; split fractions stay sane") {
    // appending a stage can only keep or shrink every earlier count
    val gen = Gen.listOfN(120,
      for {
        u <- Gen.choose(0L, 9L); t <- Gen.choose(0, 10000)
        e <- Gen.oneOf("view", "click", "purchase")
      } yield (u, new java.sql.Timestamp(t * 1000L), e))
    val params = Gen.Parameters.default
    val rows = gen.pureApply(params, rng.Seed(131))
    val df = rows.toDF("user_id", "ts", "event_type")
    def counts(stages: Seq[String]): Map[String, Long] =
      Sessionize.funnel(df, "user_id", "ts", "event_type", stages)
        .collect().map(r => r.getAs[String]("stage_name") -> r.getAs[Long]("users")).toMap
    val two = counts(Seq("view", "click"))
    val three = counts(Seq("view", "click", "purchase"))
    assert(two("view") == three("view") && two("click") == three("click"))
    // counts non-increasing down the funnel
    assert(three("view") >= three("click") && three("click") >= three("purchase"))
  }

  test("ngram count and repetition ratio invariants hold on random docs") {
    val docs = sampleDocs(24, seed = 57)
    val rows = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"text",
        size(split($"text", " ")).as("len"),
        TextAnalysis.tokenNgrams($"text", 3).as("grams"),
        TextAnalysis.repetitionRatio($"text", 3).as("rep"))
      .collect()
    rows.foreach { r =>
      val len = r.getAs[Int]("len")
      val grams = r.getSeq[String](2)
      val rep = r.getAs[Double]("rep")
      // distinct grams bounded by total positional grams
      assert(grams.size <= math.max(len - 2, 1))
      assert(grams.distinct.size == grams.size)  // tokenNgrams is distinct
      assert(rep >= 0.0 && rep < 1.0, s"rep=$rep")
      // a doc of one repeated token is maximally repetitive for its length
      if (len >= 3 && r.getSeq[String](2).size == 1)
        assert(rep == 1.0 - 1.0 / (len - 2))
    }
  }

  test("vec_normalize algebra: unit norms, zero-vector pass-through, cosine = dot of normalized") {
    import graft.functions.VectorFunctions._
    val gen = Gen.listOfN(64, Gen.choose(-5.0f, 5.0f))
    val params = Gen.Parameters.default
    val vecs: Seq[Seq[Float]] =
      (0 until 40).map(i => gen.pureApply(params, rng.Seed(100 + i)).toSeq) :+
        Seq.fill(64)(0.0f)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

    val rows = df.select(
        vec_is_clean($"v", 64).as("clean"),
        vec_dot(vec_normalize($"v"), vec_normalize($"v")).as("selfdot"))
      .collect()
    rows.dropRight(1).foreach { r =>
      assert(r.getBoolean(0), "generated vectors are clean")
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-5,
        s"normalized self-dot ${r.getDouble(1)} != 1")
    }
    assert(rows.last.getDouble(1) == 0.0, "zero vector passes through as zeros")

    // the identity embeddingNearDup's per-row pre-normalization rests
    // on: cosine(a, b) == dot(normalize(a), normalize(b)) up to fp
    val pairs = vecs.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
    pairs.toDF("va", "vb")
      .select(vec_cosine($"va", $"vb").as("cos"),
        vec_dot(vec_normalize($"va"), vec_normalize($"vb")).as("ndot"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6,
          s"cos ${r.getDouble(0)} vs normalized dot ${r.getDouble(1)}")
      }
  }

  test("vec_cosine corrupt-row contract: finite OR NULL, never NaN/Infinity") {
    import graft.functions.VectorFunctions._
    // random clean vectors crossed with every corruption shape the
    // chaos fixture carries: NaN element, Infinity element, null
    // element, ragged, all-zero. The r17 no-hijack guarantee rests on
    // exactly this: the expression output is a finite double or NULL.
    val gen = Gen.listOfN(8, Gen.choose(-5.0f, 5.0f))
    val params = Gen.Parameters.default
    val clean: Seq[Seq[java.lang.Float]] =
      (0 until 10).map(i => gen.pureApply(params, rng.Seed(7 + i)).map(
        java.lang.Float.valueOf).toSeq)
    def corrupt(base: Seq[java.lang.Float], kind: Int): Seq[java.lang.Float] = kind match {
      case 0 => base.updated(3, java.lang.Float.valueOf(Float.NaN))
      case 1 => base.updated(5, java.lang.Float.valueOf(Float.PositiveInfinity))
      case 2 => base.updated(1, null.asInstanceOf[java.lang.Float])
      case 3 => base.take(3)
      case 4 => Seq.fill(8)(java.lang.Float.valueOf(0f))
    }
    val pairs = for {
      a <- clean; k <- 0 until 5
    } yield (a, corrupt(clean((k * 3) % clean.size), k))
    val rows = pairs.toDF("va", "vb")
      .select(vec_cosine($"va", $"vb").as("c")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) ||
        (!r.getDouble(0).isNaN && !r.getDouble(0).isInfinite),
        s"vec_cosine emitted a non-finite non-null: $r")
    }
    // and clean x clean stays non-null (the guard fires only on corruption)
    val cleanRows = clean.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
      .toDF("va", "vb").select(vec_cosine($"va", $"vb")).collect()
    assert(cleanRows.forall(!_.isNullAt(0)), "clean pairs must keep a real cosine")

    // ragged FINITE vectors sink too (r20): cosine/dot over the
    // min-length overlap read a ragged 1-element vector as a finite
    // ±1.0 — hijacking rank 1 of every top-k exactly like NaN used to.
    // A length mismatch is corruption, not a prefix comparison
    // (prefix callers slice explicitly — x84).
    val ragged = Seq(
      (Seq(5.0f), clean.head.map(_.floatValue)),
      (clean.head.map(_.floatValue), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("va", "vb")
      .select(vec_cosine($"va", $"vb").as("c"), vec_dot($"va", $"vb").as("d"))
      .collect()
    ragged.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1),
        s"ragged pair must score NULL on both kernels: $r")
    }
    // vec_dot shares the full null-out contract (its >= threshold
    // consumer would otherwise emit NaN as TRUE — Spark orders NaN
    // above every real double)
    val dotRows = pairs.toDF("va", "vb")
      .select(vec_dot($"va", $"vb").as("d")).collect()
    dotRows.foreach { r =>
      assert(r.isNullAt(0) ||
        (!r.getDouble(0).isNaN && !r.getDouble(0).isInfinite),
        s"vec_dot emitted a non-finite non-null: $r")
    }
  }

  test("embeddingNearDup: a corrupt (NaN) embedding never emits a pair") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(5)
    val base = Array.fill(8)(rnd.nextGaussian().toFloat)
    val rows = Seq(
      (1L, base.toSeq),
      (2L, base.map(x => x + 1e-4f).toSeq),     // true near-dup of 1
      (3L, Seq.fill(8)(Float.NaN)),             // corrupt: all-NaN
      (4L, base.map(-_).toSeq))                 // genuinely far
      .toDF("doc_id", "embedding")
    val pairs = graft.operators.Dedup.embeddingNearDup(
      rows, "doc_id", "embedding", threshold = 0.95, dim = 8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the NaN row signs to bucket 0 of every table (NaN > 0 is false)
    // and its dot is NaN: pre-r20 `NaN >= threshold` was TRUE in
    // Spark's ordering and row 3 paired with everything it met
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    graft.CacheLifecycle.release(spark)
  }
}
