package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.sources.Layout

/** Plan-quality regression tests: the physical plans the engine is
  * designed around must not silently degrade. These assert on
  * `executedPlan`, the same thing `.explain` prints.
  */
class PlanQualitySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Every physical node of an EXECUTED adaptive plan, descending
    * through AQE wrappers and query stages. String surgery on
    * `executedPlan.toString` cannot do this reliably once cached
    * relations are in play: InMemoryRelation prints its own nested
    * "== Final/Initial Plan ==" sections, so any marker-based cut
    * either truncates real branches or includes initial-plan text
    * (the r14 x68 pin shipped with exactly that hole). `intoCaches`
    * additionally walks each InMemoryRelation's cached plan —
    * off by default so "the consuming plan re-executes X" and "X
    * lives inside the cache" stay distinguishable assertions.
    */
  private def physNodes(
      p: org.apache.spark.sql.execution.SparkPlan,
      intoCaches: Boolean = false): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    p match {
      case a: AdaptiveSparkPlanExec => p +: physNodes(a.executedPlan, intoCaches)
      case q: QueryStageExec => p +: physNodes(q.plan, intoCaches)
      case i: InMemoryTableScanExec if intoCaches =>
        p +: physNodes(i.relation.cachedPlan, intoCaches)
      case _ => p +: p.children.flatMap(physNodes(_, intoCaches))
    }
  }

  test("q01 filter reaches the parquet scan (pushdown + pruning)") {
    val plan = CorpusQueries.q01.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(l_returnflag,R)"), plan)
    // column pruning: p_name etc. absent, only the 6 needed columns read
    assert(plan.contains("ReadSchema") && !plan.contains("l_shipdate"), plan)
  }

  test("typedEvents null-key filters PUSH into the parquet scan (not AtLeastNNonNulls)") {
    // na.drop would compile to AtLeastNNonNulls — a DataFilter parquet
    // cannot push; the explicit isNotNull conjunction reaches
    // PushedFilters, so at 100 TB row-group null-count stats can skip
    val plan = graft.streaming.StreamingTwins.typedEvents(
        spark.read.parquet(s"$sfDir/events.parquet"))
      .toDF().queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), IsNotNull(ts), IsNotNull(user_id)]"), plan)
    assert(!plan.contains("atleastnnonnulls"), plan)
    // pruning: only the three projected columns are read
    assert(!plan.contains("event_type") && !plan.contains("props"), plan)
  }

  test("q14 lookup joins broadcast; the fact side never exchanges before joining") {
    val plan = CorpusQueries.q14.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q15 aggregation is two-phase (map-side partial before the exchange)") {
    val plan = CorpusQueries.q15.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    val firstAgg = plan.indexOf("HashAggregate")
    val exchange = plan.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
    // partial aggregate appears below (later in the printed tree than)
    // the exchange — i.e. there are two HashAggregate levels
    assert(plan.indexOf("HashAggregate", firstAgg + 1) >= 0, plan)
  }

  test("dissolve aggregates partially map-side (two-phase union aggregator)") {
    import spark.implicits._
    import graft.geom.{GeomFunctions => G}
    val df = Seq(("A", "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .toDF("k", "wkt").withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val plan = graft.operators.SpatialOps.dissolve(df, Seq("k"))
      .queryExecution.executedPlan.toString
    // typed Aggregator over WKB plans as ObjectHashAggregate; partial
    // (map-side) level must appear below the exchange in addition to
    // the final merge level
    val first = plan.indexOf("ObjectHashAggregate")
    assert(first >= 0, plan)
    assert(plan.indexOf("ObjectHashAggregate", first + 1) >= 0, plan)
    assert(plan.contains("Exchange"), plan)
  }

  test("exact dedup aggregates partially map-side; no window funnels the hot key") {
    // the keeper-set aggregate must be two-phase (partial min(id) before
    // the exchange) so duplicate mass collapses map-side — a row_number
    // window here would shuffle EVERY row to its key's partition with no
    // partial agg and no AQE skew split, stalling one task on the hot
    // key exact-dedup exists to remove
    val plan = ExtQueries.x01_dedup_exact.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val first = plan.indexOf("HashAggregate")
    assert(first >= 0, plan)
    assert(plan.indexOf("HashAggregate", first + 1) >= 0,
      s"expected partial+final HashAggregate pair:\n$plan")
  }

  test("paragraph dedup keeper set aggregates partially map-side, like exact dedup") {
    // same guarantee as x01: the hot boilerplate-paragraph hash is the
    // skewed key, so its mass must collapse in a partial min before any
    // exchange — and no window operator may appear anywhere in the plan
    val plan = ExtQueries.x37_paragraph_dedup.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val first = plan.indexOf("HashAggregate")
    assert(first >= 0, plan)
    assert(plan.indexOf("HashAggregate", first + 1) >= 0,
      s"expected partial+final HashAggregate pair:\n$plan")
  }

  test("winnowing stop-fingerprint filter broadcasts the bounded frequent side") {
    // the broadcast must carry the frequent set (bounded by n_fps/20 at
    // any corpus size) as a LEFT ANTI probe — never the rare complement,
    // which is nearly all distinct fingerprints (O(corpus) rows through
    // the driver)
    val plan = ExtQueries.x17_winnowing.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("LeftSemi"), plan)
  }

  test("winnowing fixture pair keeps x17 non-vacuous at every scale") {
    // the r15 fixtures exist because at sf0.1 the synthetic corpus has
    // no natural shared-window pairs and the golden compared
    // empty-vs-empty; the engine must emit the planted pair wherever
    // it runs, with the exact count tools/golden_ext.py derives
    val rows = ExtQueries.x17_winnowing.run(spark, sfDir).collect()
    assert(rows.exists(r =>
      r.getLong(0) == -2L && r.getLong(1) == -1L && r.getLong(2) == 45L),
      s"fixture pair (-2,-1,45) missing from ${rows.mkString(", ")}")
  }

  test("q30 top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = CorpusQueries.q30.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bucketed co-located join has no Exchange on either side") {
    // fresh metastore per JVM but the warehouse dir persists: clear any
    // stale table locations from previous runs
    for (t <- Seq("orders_b", "customer_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Layout.writeBucketed(Tables.orders(spark, sfDir), "orders_b",
      Seq("o_custkey"), buckets = 8)
    Layout.writeBucketed(Tables.customer(spark, sfDir), "customer_b",
      Seq("c_custkey"), buckets = 8)
    // disable broadcast so the join strategy itself is under test
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.table(spark, "customer_b")
        .join(Layout.table(spark, "orders_b"),
          col("c_custkey") === col("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // either co-partitioned strategy proves the bucket layout served;
      // with spark.sql.join.preferSortMergeJoin=false (r21, guide §9)
      // the planner picks shuffled-hash when the build side fits
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("IVF probe on the cell-partitioned layout reads only nprobe partitions") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/emb_by_cell"
    Similarity.ivfWrite(index, dir)

    val query = emb.select("embedding").head().getSeq[Float](0).toArray
    val nprobe = 2
    val probed = Similarity.ivfProbe(
      spark.read.parquet(dir), index.centroids,
      "vec_id", "embedding", query, k = 5, nprobe = nprobe)

    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    // collect() (not count()) so the metric lands on THIS QueryExecution
    assert(probed.collect().nonEmpty)

    // the scan's own metric: directories actually read == nprobe
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = probed.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, plan)
    val partitionsRead = scans.map(_.metrics("numPartitions").value).sum
    assert(partitionsRead == nprobe,
      s"expected $nprobe partitions read, got $partitionsRead:\n$plan")
  }

  test("ivfPqEncode: coarse argmin once per row; cell predicate prunes before the code kernel") {
    import graft.operators.Similarity
    import graft.functions.{IvfCellExpr, IvfPqCodeAtExpr}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val emb = Tables.embeddings(spark, sfDir)
    val model = Similarity.ivfPqTrain(emb, "vec_id", "embedding", dim = 64,
      nCells = 4, trainN = 64)
    val enc = Similarity.ivfPqEncode(emb, "vec_id", "embedding", model)

    // bulk path: exactly ONE ivf_cell in the optimized plan — the r15
    // ivfpq_code_at change exists to stop the in-kernel argmin recompute,
    // and CollapseProject must not undo it by inlining the twice-referenced
    // cell projection
    val bulkCells = enc.queryExecution.optimizedPlan.collect {
      case p => p.expressions.map(_.collect { case e: IvfCellExpr => e }.size).sum
    }.sum
    assert(bulkCells == 1,
      s"expected one ivf_cell in the bulk encode plan, got $bulkCells:\n" +
        enc.queryExecution.optimizedPlan)

    // probe path: a cell predicate must sit BELOW the residual-code
    // projection (prune first, encode survivors)
    val probePlan = enc.filter(col("cell") === 1).queryExecution.optimizedPlan
    val filters = probePlan.collect { case f: Filter => f }
    assert(filters.nonEmpty, s"no Filter in:\n$probePlan")
    filters.foreach { f =>
      val codeBelow = f.child.collect {
        case p => p.expressions.map(_.collect { case e: IvfPqCodeAtExpr => e }.size).sum
      }.sum
      assert(codeBelow == 0,
        s"cell predicate must prune before the code kernel runs:\n$probePlan")
    }
    val codeAbove = probePlan.collect {
      case p => p.expressions.map(_.collect { case e: IvfPqCodeAtExpr => e }.size).sum
    }.sum
    assert(codeAbove == 1, s"code kernel missing from probe plan:\n$probePlan")

    // and the encode output itself is unchanged vs the one-kernel form
    val coarse = model.coarse.map(_.toSeq).toSeq
    val cbs = model.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq
    val legacy = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.ivf_cell(col("embedding"), coarse, model.dim).as("cell"),
      graft.functions.VectorFunctions.ivfpq_code(col("embedding"), coarse, cbs, model.dim).as("code"))
    assert(enc.orderBy("vec_id").collect().toSeq ==
      legacy.orderBy("vec_id").collect().toSeq)
  }

  test("LSH probe on the bucket-partitioned layout reads only Hamming-ball partitions") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("lsh").toString + "/emb_by_bucket"
    val signBits = 8
    Similarity.lshWrite(emb, "embedding", dir, dim = 64, signBits = signBits)

    val query = emb.select("embedding").head().getSeq[Float](0).toArray
    val layout = spark.read.parquet(dir)
    val probed = Similarity.lshProbe(layout, "vec_id", "embedding", query,
      k = 5, dim = 64, signBits = signBits, probeHamming = 1)

    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    // the query vector is a table row: its own bucket is non-empty
    assert(probed.collect().nonEmpty)

    // directories actually read == ball buckets that exist in the data,
    // strictly fewer than the table's bucket count (real pruning)
    val ball = Similarity.hammingBall(
      Similarity.signatureOf(query, 64, signBits), signBits, radius = 1).toSet
    // hive partition values are re-inferred on read (int if they fit)
    val present = layout.select(col("bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = ball.intersect(present).size
    assert(expected < present.size, s"ball covers all $expected buckets — no pruning to prove")
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = probed.queryExecution.executedPlan.collectLeaves().collect {
      case sc: FileSourceScanExec => sc
    }
    assert(scans.nonEmpty, plan)
    val partitionsRead = scans.map(_.metrics("numPartitions").value).sum
    assert(partitionsRead == expected,
      s"expected $expected partitions read, got $partitionsRead:\n$plan")
  }

  test("decontamination probes the eval grams via broadcast — the corpus side never shuffles") {
    import graft.operators.Decontaminate
    val docs = Tables.documents(spark, sfDir)
    val cont = Decontaminate.contaminatedIds(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", n = 8)
    val plan = cont.queryExecution.executedPlan.toString
    // the gram probe is a broadcast LEFT SEMI: only the distinct doc
    // ids (not the exploded grams) ever reach an exchange
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("top-k-per-group aggregates partially map-side (two-phase ObjectHashAggregate), no window") {
    // the whole point of TopKAgg vs the row_number window: each map task
    // pre-truncates its groups to k pairs before the exchange, so a hot
    // group never funnels its full mass through one task
    val plan = ExtQueries.x40_topk_per_group.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val first = plan.indexOf("ObjectHashAggregate")
    assert(first >= 0, plan)
    assert(plan.indexOf("ObjectHashAggregate", first + 1) >= 0,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
  }

  test("sessionize assign+rollup share ONE user-key exchange (two Windows, one Sort)") {
    // prefix scans can't partially aggregate, so one shuffle on the user
    // key is the floor — and the rollup's groupBy(user, session) must
    // reuse that partitioning (hash(user) clusters it), not re-exchange
    import graft.operators.Sessionize
    val plan = Sessionize.sessions(Tables.events(spark, sfDir), "user_id", "ts",
        gapSeconds = 900, tieBreakCols = Seq("event_id"))
      .queryExecution.executedPlan.toString
    def occurrences(needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    // Spark extracts the nested lag into its own Window node: exactly 2
    assert(occurrences("Window") == 2, plan)
    assert(occurrences("Exchange hashpartitioning") == 1,
      s"rollup re-exchanged instead of reusing the window partitioning:\n$plan")
    assert(occurrences("Sort ") == 1, plan)
  }

  test("bm25 broadcasts the one-row stats and plans top-k as TakeOrderedAndProject") {
    // stats ride a broadcast nested-loop (one row x corpus); the corpus
    // itself is scanned twice (stats pass + scoring pass) but never
    // shuffled on a row key, and retrieval never global-sorts
    val plan = ExtQueries.x39_bm25_topk.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("vocab top-k partial-aggregates the exploded tokens and never global-sorts") {
    // the canonical wordcount shape: hot tokens collapse map-side before
    // the exchange, and top-30 is TakeOrderedAndProject (k rows per
    // partition), not a full sort of the vocabulary
    val plan = ExtQueries.x43_vocab_topdf.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    val first = plan.indexOf("HashAggregate")
    assert(first >= 0 && plan.indexOf("HashAggregate", first + 1) >= 0, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("unigram logprob broadcasts the one-row total; the token join is not a broadcast of the corpus") {
    val plan = ExtQueries.x45_unigram_logprob.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // one-row total rides a broadcast nested-loop
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("sequence packing: window and bin rollup share one source-key exchange") {
    // groupBy(source, seq_id) must reuse the window's hash(source)
    // partitioning (hash(source) clusters every (source, seq_id) pair)
    val plan = ExtQueries.x46_seq_packing.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    def occurrences(needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    assert(occurrences("Exchange hashpartitioning") == 1,
      s"bin rollup re-exchanged instead of reusing the window partitioning:\n$plan")
  }

  test("pq ADC top-k scans only the code column and plans TakeOrderedAndProject") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val model = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    val query = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val plan = Similarity.pqTopK(codes, "vec_id", model, query, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("fuzzy match scores pairs inside whole-stage codegen, blocked join is equi not NLJ") {
    val plan = ExtQueries.x59_fuzzy_match.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the JW kernel is a native expression in the generated stage, not
    // a BatchEvalPython/ScalaUDF island
    assert(plan.contains("jaro_winkler_similarity"), plan)
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"), plan)
    // candidates come from an equi-join on the block key — a quadratic
    // NestedLoop/cartesian over the table would be the scale bug
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the probe side carries a pinned block-keyed exchange: the join
    // OUTPUT (Σ|block|² pairs) dwarfs its input, so parallelism must
    // not depend on the scan's file layout, and the explicit N keeps
    // AQE's input-byte coalescing (blind to expansion) from folding
    // the scoring back into one task (r11: 4.3 s serial → 0.6 s)
    assert(plan.contains("REPARTITION_BY_NUM"), plan)
  }

  test("triangle wedge join reuses the pre-partitioned oriented cache — no live u-exchange") {
    // r21 (guide §2.4): `oriented` persists REPARTITION_BY_NUM on the
    // wedge-join key u, so both wedge legs read a co-partitioned cache
    // and the EXECUTED plan re-exchanges the edge-cardinality frame
    // zero times on u (measured under no-broadcast: 6 → 4 stages,
    // 320 → 100 shuffle-KB at sf0.1). Broadcast is disabled so the
    // wedge join takes the shuffle path it would take at scale; the
    // remaining live exchanges are the closure probe's pair-keyed ones
    // and the final single-partition count — neither is keyed on u
    // alone, which is exactly what this pins.
    import graft.operators.GraphOps
    import spark.implicits._
    val edges = (1L to 60L).flatMap { i =>
      Seq((i, (i % 7) + 100L), ((i % 7) + 100L, (i % 5) + 200L), (i, (i % 5) + 200L))
    }.toDF("s", "t")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = GraphOps.triangleCount(edges, "s", "t")
      assert(df.collect().head.getLong(0) > 0)  // AQE finalizes
      val liveUExchanges = physNodes(df.queryExecution.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if (e.outputPartitioning match {
              case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
                h.expressions.flatMap(_.references.toSeq).map(_.name) == Seq("u")
              case _ => false
            }) => e
      }
      assert(liveUExchanges.isEmpty,
        s"wedge legs re-exchanged on u:\n${df.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      graft.CacheLifecycle.release(spark)
    }
  }

  test("pagerank persists the edge prep — iterations reuse one materialization") {
    import graft.operators.PageRank
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("s", "t")
    try {
      val plan = PageRank.run(edges, "s", "t", iters = 3)
        .queryExecution.optimizedPlan.toString
      // each of the 3 iterations references the cached prep, so the
      // edge+degree derivation appears as InMemoryRelation, and the
      // raw degree aggregation is not re-derived once per iteration
      assert(plan.contains("InMemoryRelation"), plan)
    } finally graft.CacheLifecycle.release(spark)
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString + "/events_p"
    val events = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    Layout.writePartitioned(events, dir, Seq("day"))
    val firstDay = spark.read.parquet(dir).select(min("day")).collect()(0).getDate(0)
    val pruned = spark.read.parquet(dir).filter(col("day") === lit(firstDay))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"), plan)
    assert(pruned.count() > 0)
  }

  test("duplicated-span census tokenizes ONCE — census and probe read the cached span index") {
    // r14 contract (supersedes the r11 ReusedExchange pin): the
    // exploded span stream is hash-exchanged on the 64-bit span key
    // once and PERSISTED; both consumers (sharing census + positional
    // probe) read InMemoryTableScans of that one span index, so the
    // corpus is tokenized exactly once per cache lifetime — including
    // across re-executions, which the exchange-reuse shape did not
    // cover (it re-tokenized every action; the r13 driver sweep's x88
    // family flag). Cache replacement only lands in the AQE FINAL
    // plan, so this pin executes first. Still: no window, no
    // cartesian.
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val df = ExtQueries.x68_dup_spans.run(spark, sfDir)
    df.collect()
    val nodes = physNodes(df.queryExecution.executedPlan)
    val names = nodes.map(_.nodeName)
    // census AND probe must each scan the cached span index...
    assert(nodes.count(_.isInstanceOf[InMemoryTableScanExec]) >= 2,
      s"expected census AND probe to scan the cached span index:\n${names.mkString("\n")}")
    // ...and the consuming plan itself must not re-tokenize — every
    // Generate lives inside the cached relation, which physNodes does
    // not descend into by default
    assert(!names.exists(_.contains("Generate")),
      s"tokenize Generate outside the cached span index:\n${names.mkString("\n")}")
    assert(!names.exists(_.contains("Window")), names.mkString("\n"))
    assert(!names.exists(_.contains("CartesianProduct")), names.mkString("\n"))
    // the per-doc rollup (n_spans + dup_spans in ONE aggregate) is
    // still two-phase: partial before its doc-id exchange
    assert(nodes.count(_.isInstanceOf[HashAggregateExec]) >= 2,
      s"expected partial+final HashAggregate pair:\n${names.mkString("\n")}")
  }

  test("semDedup pairs only within cells — equi join on cell, no cartesian") {
    // the pairwise stage must be an equi join keyed on the cell id
    // (Σ s_c² cost, AQE-skew-splittable), never a cross/NLJ pairing
    // of the whole table with itself
    val plan = ExtQueries.x70_semdedup.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("semDedup layout: single-cell probe reads ONE hive partition; keep rule stays equi") {
    // the point of semDedupWrite's cell-partitioned layout (x101): a
    // probe of one cell must prune to one `cell=` directory at the
    // scan (the ivfProbe proof applied to semantic dedup), and the
    // layout-backed keep rule must plan the same equi-join shape as
    // the inline path — never a cross/NLJ pairing
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("semdl").toString + "/emb_by_cell"
    Dedup.semDedupWrite(
      Tables.embeddings(spark, sfDir).filter(col("embedding").isNotNull),
      "vec_id", "embedding", dir, nCells = 8)
    val layout = spark.read.parquet(dir)

    val probed = layout.filter(col("cell") === lit(0))
    assert(probed.collect().nonEmpty)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = probed.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val partitionsRead = scans.map(_.metrics("numPartitions").value).sum
    assert(partitionsRead == 1,
      s"expected 1 hive partition read, got $partitionsRead")

    val keepPlan = Dedup.semDedupAssigned(layout, "vec_id", "embedding", tau = 0.3)
      .queryExecution.executedPlan.toString
    assert(!keepPlan.contains("CartesianProduct") &&
      !keepPlan.contains("BroadcastNestedLoopJoin"), keepPlan)
  }

  test("kmv/cms sketch aggregates are two-phase ObjectHashAggregate (bounded partials cross the shuffle)") {
    import graft.functions.SketchAggs
    val kmvPlan = Tables.events(spark, sfDir)
      .select(md5(col("event_id").cast("string")).as("h"))
      .agg(SketchAggs.kmv_min_k(64)(col("h")))
      .queryExecution.executedPlan.toString
    val cmsPlan = Tables.events(spark, sfDir)
      .agg(SketchAggs.cms_sketch(4, 256)(col("event_type")))
      .queryExecution.executedPlan.toString
    for (plan <- Seq(kmvPlan, cmsPlan)) {
      val first = plan.indexOf("ObjectHashAggregate")
      assert(first >= 0, plan)
      // partial + final: the exchange carries one k-bounded (resp.
      // depth·width-long) buffer per map task, never raw rows
      assert(plan.indexOf("ObjectHashAggregate", first + 1) >= 0,
        s"expected partial+final ObjectHashAggregate pair:\n$plan")
    }
  }

  test("funnel depth is a two-phase typed aggregate; stage counts collapse to one row with no join") {
    val plan = ExtQueries.x78_funnel.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    val first = plan.indexOf("ObjectHashAggregate")
    assert(first >= 0, plan)
    assert(plan.indexOf("ObjectHashAggregate", first + 1) >= 0,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
    // stage rows come from stack() over a single-row conditional
    // aggregate — no join against a stage table anywhere
    assert(!plan.contains("Join"), plan)
  }

  test("moving average and RFM windows sort rollups, not raw rows") {
    // both queries aggregate to a per-entity rollup FIRST; the global
    // window then sorts |days| (resp. |users|) rows. The guard: the
    // window input must be an aggregate, so exactly two HashAggregate
    // levels (partial+final) appear BELOW the first Window in the tree.
    for (spec <- Seq(ExtQueries.x79_moving_avg, ExtQueries.x82_rfm)) {
      val plan = spec.run(spark, sfDir).queryExecution.executedPlan.toString
      val win = plan.indexOf("Window")
      assert(win >= 0, plan)
      assert(plan.indexOf("HashAggregate", win) >= 0,
        s"window must consume an aggregated rollup:\n$plan")
    }
  }

  test("frequent pairs expand in-row — no corpus self-join, lift LUTs broadcast") {
    // r12 shape: the only exchanges the corpus-sized item stream
    // crosses are the distinct and the basket collect; pair generation
    // is a Generate over the basket array. A SortMergeJoin in the
    // FINAL adaptive plan would mean the self-join came back or the
    // bounded freq/lift frames stopped broadcasting — pre-AQE the
    // static estimator does plan SMJs here (aggregate outputs have no
    // usable stats), which is exactly why the frames carry no
    // hard-coded hints and AQE's runtime sizes decide (the HashSplit
    // lesson: a hint is a 100 TB driver-collect bomb if the frame is
    // ever corpus-proportional).
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
    val items = li
      .join(broadcast(Tables.part(spark, sfDir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
    // minSupport = 2, NOT a value that filters everything out: the
    // pair census is persisted (r14), so an empty filtered result
    // gives AQE a 0-row cached relation and the whole final plan
    // collapses to EmptyRelation — a degenerate input proves nothing
    // about the expansion shape (the pre-r14 in-stage filter hid the
    // emptiness from AQE, which is the only reason the old threshold
    // appeared to work).
    val df = graft.operators.Cooccur.frequentPairs(items, "ok", "item", 2)
    df.collect() // finalize AQE: assertions must read runtime decisions
    // node walk INTO the cached pair census (that is where the
    // expansion now lives), never string surgery on the adaptive
    // printout — see physNodes
    val nodes = physNodes(df.queryExecution.executedPlan, intoCaches = true)
    val names = nodes.map(_.nodeName)
    assert(!names.exists(_.contains("SortMergeJoin")), names.mkString("\n"))
    assert(!names.exists(_.contains("CartesianProduct")), names.mkString("\n"))
    assert(names.exists(_.contains("Generate")),
      s"expected the in-row pair expansion Generate:\n${names.mkString("\n")}")
  }

  test("cluster split probes components via broadcast; assignment is a row-local CASE") {
    // r12: the join strategy is SIZE-ADAPTIVE — leakageSafeAssign
    // carries no broadcast hint (components is corpus-proportional on a
    // dup-heavy corpus, so a hard-coded hint is a 100 TB driver-collect
    // bomb). The planner must still BROADCAST the typical small
    // cluster map on its own size estimate, which is what this pins.
    val comps = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("doc_id").as("component")).limit(10)
    val plan = graft.operators.HashSplit.leakageSafeAssign(
        Tables.documents(spark, sfDir), "doc_id", comps)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("DSIR scoring probes the bucket LUT via broadcast; per-doc rollup is two-phase") {
    // the B-row log-likelihood-ratio table must broadcast into the
    // scoring scan (the corpus-sized gram stream never shuffles to
    // meet it), and the per-doc weight sum must partial-aggregate
    // map-side before its exchange on the unique doc id
    val df = graft.operators.ImportanceWeights.weights(
      Tables.documents(spark, sfDir),
      Tables.documents(spark, sfDir).filter(col("lang") === "en"),
      "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // both 1-row totals joins carry the broadcast hint (r11: the
    // corpus-side totals join gained parity with its :79 sibling) —
    // nothing in the plan may fall back to an unbroadcast cartesian
    assert(!plan.contains("CartesianProduct"), plan)
    val first = plan.indexOf("HashAggregate")
    assert(first >= 0, plan)
    assert(plan.indexOf("HashAggregate", first + 1) >= 0,
      s"expected partial+final HashAggregate pair:\n$plan")
  }

  test("overlay/erase constructive chain evaluates ONCE per candidate pair") {
    // the emptiness post-filter used to push below the projection with
    // the chain substituted in (PushDownPredicates), running the JTS
    // construction twice per pair — once in the pushed filter, once in
    // the project. filterNonEmpty's nondeterministic probe column blocks
    // that; this pin counts kernel occurrences in the optimized plan.
    import graft.geom.{GeomFunctions => G}
    import spark.implicits._
    def shapes(wkts: (String, String)*) =
      wkts.toSeq.toDF("name", "wkt")
        .withColumn("geom", G.st_geomfromwkt(col("wkt"))).drop("wkt")
    val a = shapes(("a0", "POLYGON((0 0,2 0,2 2,0 2,0 0))"))
      .withColumnRenamed("name", "aname")
    val b = shapes(("b0", "POLYGON((1 1,3 1,3 3,1 3,1 1))"))
      .withColumnRenamed("name", "bname")

    val ov = graft.operators.SpatialOps.overlayUnion(a, b, "geom")
    val ovPlan = ov.queryExecution.optimizedPlan.toString
    def cnt(plan: String, k: String) = k.r.findAllIn(plan).size
    assert(cnt(ovPlan, "st_intersection_polygonal") == 1, ovPlan)
    assert(cnt(ovPlan, "st_difference_polygonal") == 2, ovPlan)
    // and only the FUSED kernels — a bare st_polygonal in the plan means
    // the WKB round trip between the kernels came back
    assert(cnt(ovPlan, "st_polygonal") == 0, ovPlan)

    val er = graft.operators.SpatialOps.erase(a, b, "geom")
    val erPlan = er.queryExecution.optimizedPlan.toString
    assert(cnt(erPlan, "st_difference_polygonal") == 1, erPlan)
    assert(cnt(erPlan, "st_polygonal") == 0, erPlan)

    // and the rewrite didn't change results: one lens-shaped leftover
    // each plus the intersection piece
    val rows = ov.collect()
    assert(rows.length == 3, rows.mkString(";"))
    assert(er.collect().length == 1)
  }

  test("gopher flags stay inside whole-stage codegen — one scan, no shuffle, no UDF, no HOF") {
    import graft.operators.{TextAnalysis => TA}
    val df = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TA.gopherFlags(col("text")).as("f"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)          // pure per-row
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    // r11: the alpha-word rule is a regexp_count, not a higher-order
    // filter — HOF lambdas force the enclosing project out of
    // whole-stage codegen into interpreted eval, the one hole x89 had
    assert(!plan.toLowerCase.contains("lambdafunction"), plan)
    // the `*(n)` prefix is the simple-string marker for operators
    // inside a whole-stage-codegen stage
    assert(plan.contains("*(1) Project"), plan)
  }

  test("global rank moves the data exactly once (one range exchange, no hash re-exchange)") {
    // the rank itself must not introduce a second full-data movement:
    // one RangePartitioning exchange, then partition-preserving
    // mapPartitions — a window-by-pid implementation would add a hash
    // exchange of the whole table on top
    val df = graft.operators.GlobalOrder.globalRank(
      Tables.documents(spark, sfDir).select("doc_id"),
      Seq(col("doc_id")), parts = 4)
    val plan = df.queryExecution.executedPlan.toString
    // the cached AQE subtree prints its initial AND final plan, so the
    // one real exchange can appear twice in the text — assert on KIND,
    // not count: every exchange is the range one, none is a hash
    // re-exchange, and SinglePartition never appears
    val exchanges = "Exchange \\w+".r.findAllIn(plan).toList
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("rangepartitioning")),
      s"expected only range exchanges, got $exchanges:\n$plan")
    graft.CacheLifecycle.release(spark)
  }

  test("embedding covariance is a two-phase ObjectHashAggregate — no explode before the exchange") {
    val cov = graft.functions.GramAgg.covariance(64)
    val df = Tables.embeddings(spark, sfDir).agg(cov(col("embedding")))
    val plan = df.queryExecution.executedPlan.toString
    val first = plan.indexOf("ObjectHashAggregate")
    assert(first >= 0 && plan.indexOf("ObjectHashAggregate", first + 1) >= 0, plan)
    assert(!plan.contains("Generate"), plan)          // no d× explode of the corpus
  }

  test("rrf fusion shortlists via TakeOrderedAndProject before any rank window") {
    val df = ExtQueries.x94_rrf_fusion.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // both retrieval arms bound to k rows with TakeOrderedAndProject;
    // the rank windows run after, over ≤ k rows each
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val firstWindow = plan.indexOf("Window")
    val firstTop = plan.indexOf("TakeOrderedAndProject")
    assert(firstTop >= 0 && (firstWindow < 0 || firstTop < firstWindow ||
      plan.indexOf("TakeOrderedAndProject", firstWindow) >= 0), plan)
  }

  test("AQE skew split still engages on a forced shuffled-hash join (the SHJ default's safety net)") {
    // r21 advisor (medium): preferSortMergeJoin=false is session-wide,
    // and SHJ's per-partition build side cannot spill the way SMJ's
    // sort does — so the defense against a skewed stream partition at
    // scale is AQE's OptimizeSkewedJoin splitting it. That rewrite
    // supports shuffled-hash joins, but nothing PINNED the interaction:
    // a Spark upgrade (or conf drift) that quietly limited skew
    // handling to sort-merge would leave every SHUFFLE_HASH-hinted
    // known-skew path (the span-dedup family) one hot key away from an
    // executor OOM with no test failing. Executed-plan assertion on
    // the join operator's own isSkewJoin flag, not plan-text grep.
    // Thresholds are scaled DOWN to fixture bytes (the decision inputs,
    // not the decision rule); factor/min-partition-num stay default.
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",          // no broadcast escape
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1", // ...nor at AQE time
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k",
      "spark.sql.shuffle.partitions" -> "8")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // one hot key owns 90% of a wide-payload fact side; the dim side
      // is uniform. Deterministic skew, no rand() (the §2.5 retry rule).
      val fact = spark.range(0, 60000).select(
        when($"id" < 54000, 0L).otherwise($"id" % 50 + 1).as("k"),
        concat(lit("p" * 96), $"id".cast("string")).as("payload"))
      val dim = spark.range(0, 51).select($"id".as("k"), lit("d").as("tag"))
      // the span-dedup family's shape: SHUFFLE_HASH hint on the small
      // side forces SHJ (under no-broadcast the size conditions alone
      // would fall back to SMJ, which is not the path being pinned)
      val joined = fact.join(dim.hint("shuffle_hash"), Seq("k"))
      // execute THIS Dataset's QueryExecution (a write/count would plan
      // a fresh one and the asserted plan would stay isFinalPlan=false)
      joined.queryExecution.toRdd.count()
      val joins = physNodes(joined.queryExecution.executedPlan)
        .collect { case j: ShuffledHashJoinExec => j }
      assert(joins.nonEmpty, "expected a ShuffledHashJoinExec in the executed plan")
      assert(joins.exists(_.isSkewJoin),
        s"AQE did not split the skewed SHJ partition: " +
          joined.queryExecution.executedPlan.toString)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
