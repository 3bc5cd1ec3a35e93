package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.geom.{GeomCodec, GeomFunctions => G}

/** The grid-partitioned join must produce EXACTLY the broadcast index
  * join's pairs — in particular no duplicates for geometries spanning
  * many grid cells (reference-point rule) and no misses across cell
  * boundaries.
  */
class GridSpatialJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def wkt(s: String): Array[Byte] = GeomCodec.wktToWkb(s)
  private def square(x: Double, y: Double, s: Double): Array[Byte] =
    wkt(s"POLYGON(($x $y, ${x + s} $y, ${x + s} ${y + s}, $x ${y + s}, $x $y))")

  // parcels sized 0.5..40 so many span multiple 10-unit cells
  private lazy val parcels: DataFrame =
    (0 until 40).map { i =>
      (s"p$i", square((i % 8) * 7.0, (i / 8) * 7.0, 0.5 + (i % 5) * 10.0))
    }.toDF("pid", "geom")
  private lazy val zones: DataFrame =
    (0 until 12).map { i =>
      (s"z$i", square((i % 4) * 13.0 - 5.0, (i / 4) * 11.0 - 3.0, 8.0 + (i % 3) * 12.0))
    }.toDF("zid", "zgeom")

  /** Exec path: RDD-cogroup [[GridSpatialJoinExec]] (gridMode=exec). */
  private def withGrid[A](cell: Double)(f: => A): A = {
    spark.conf.set(SpatialJoinStrategy.GridCellKey, cell.toString)
    spark.conf.set(SpatialJoinStrategy.ThresholdKey, "1") // force the huge-huge path
    spark.conf.set(GridJoinRewrite.GridModeKey, "exec")
    try f finally {
      spark.conf.unset(SpatialJoinStrategy.GridCellKey)
      spark.conf.unset(SpatialJoinStrategy.ThresholdKey)
      spark.conf.unset(GridJoinRewrite.GridModeKey)
    }
  }

  /** Default path: the logical exploded-equi-join rewrite. */
  private def withRewrite[A](cell: Double)(f: => A): A = {
    spark.conf.set(SpatialJoinStrategy.GridCellKey, cell.toString)
    spark.conf.set(SpatialJoinStrategy.ThresholdKey, "1")
    try f finally {
      spark.conf.unset(SpatialJoinStrategy.GridCellKey)
      spark.conf.unset(SpatialJoinStrategy.ThresholdKey)
    }
  }

  private def pairsOf(df: DataFrame): Seq[(String, String)] =
    df.select("pid", "zid").as[(String, String)].collect().toSeq

  test("grid join plans when both sides exceed the broadcast budget and a cell size is set") {
    withGrid(10.0) {
      val df = parcels.join(zones, G.st_intersects($"geom", $"zgeom"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GridSpatialJoin"), plan)
    }
  }

  test("grid join pairs == broadcast join pairs, exactly once each") {
    val expected = pairsOf(parcels.join(zones, G.st_intersects($"geom", $"zgeom")))
      .sorted
    assert(expected.nonEmpty)
    for (cell <- Seq(3.0, 10.0, 50.0)) {
      val got = withGrid(cell) {
        pairsOf(parcels.join(zones, G.st_intersects($"geom", $"zgeom")))
      }.sorted
      assert(got == expected, s"cell=$cell: ${got.size} vs ${expected.size}")
    }
  }

  test("grid dwithin matches broadcast dwithin") {
    val expected = pairsOf(
      parcels.join(zones, G.st_dwithin($"geom", $"zgeom", lit(4.0)))).sorted
    val got = withGrid(10.0) {
      pairsOf(parcels.join(zones, G.st_dwithin($"geom", $"zgeom", lit(4.0))))
    }.sorted
    assert(got == expected && got.size > expected.count(_ => false))
    assert(got == expected)
  }

  test("grid contains matches broadcast contains (asymmetric relation)") {
    val expected = pairsOf(
      zones.join(parcels, G.st_contains($"zgeom", $"geom")).select("pid", "zid")).sorted
    val got = withGrid(10.0) {
      pairsOf(zones.join(parcels, G.st_contains($"zgeom", $"geom")).select("pid", "zid"))
    }.sorted
    assert(got == expected)
  }

  test("residual condition applies in the grid path") {
    val expected = pairsOf(parcels.join(zones,
      G.st_intersects($"geom", $"zgeom") && $"zid" =!= "z0")).sorted
    val got = withGrid(10.0) {
      pairsOf(parcels.join(zones,
        G.st_intersects($"geom", $"zgeom") && $"zid" =!= "z0"))
    }.sorted
    assert(got == expected && !got.exists(_._2 == "z0"))
  }

  test("salted cells produce exactly the unsalted pairs (skew splitting)") {
    val expected = pairsOf(parcels.join(zones, G.st_intersects($"geom", $"zgeom"))).sorted
    for (salts <- Seq(2, 5)) {
      spark.conf.set(SpatialJoinStrategy.GridSaltsKey, salts.toString)
      try {
        val got = withGrid(10.0) {
          pairsOf(parcels.join(zones, G.st_intersects($"geom", $"zgeom")))
        }.sorted
        assert(got == expected, s"salts=$salts")
      } finally spark.conf.unset(SpatialJoinStrategy.GridSaltsKey)
    }
  }

  test("scale smoke: 10k x 10k random boxes — grid equals broadcast, cells stay bounded") {
    val rnd = new scala.util.Random(7)
    def randBoxes(n: Int, tag: String) =
      (0 until n).map { i =>
        val x = rnd.nextDouble() * 1000.0 - 500.0
        val y = rnd.nextDouble() * 1000.0 - 500.0
        (s"$tag$i", square(x, y, 0.2 + rnd.nextDouble() * 3.0))
      }
    val a = randBoxes(10000, "a").toDF("pid", "geom").repartition(8)
    val b = randBoxes(10000, "b").toDF("zid", "zgeom").repartition(8)

    val expected = pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom"))).sorted
    val got = withGrid(25.0) {
      pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom")))
    }.sorted
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("rewrite: both-huge spatial join plans as an exploded equi-join, not GridSpatialJoin") {
    withRewrite(10.0) {
      // tiny fixtures would broadcast the cell join; force the shape a
      // both-huge join takes at scale (shuffled equi-join)
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
      val df = parcels.join(zones, G.st_intersects($"geom", $"zgeom"))
      df.collect()   // finalize the AQE plan so codegen spans are visible
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("GridSpatialJoin"), plan)
      assert(!plan.contains("SpatialIndexJoin"), plan)
      // PBSM shape with stock operators: explode of the cell array
      // feeding a shuffled equi-join on the packed cell id
      assert(plan.contains("st_grid_cells") || plan.contains("Generate"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // the join runs inside whole-stage codegen (the `*(n)` span
      // prefix) — the thing the RDD-cogroup exec can never give
      assert("""\*\(\d+\) (SortMergeJoin|ShuffledHashJoin)""".r
        .findFirstIn(plan).isDefined, plan)
      // and AQE owns the shuffle (runtime coalesce/skew-split)
      assert(plan.contains("AdaptiveSparkPlan"), plan)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }

  test("rewrite pairs == broadcast join pairs, exactly once each") {
    val expected = pairsOf(parcels.join(zones, G.st_intersects($"geom", $"zgeom")))
      .sorted
    assert(expected.nonEmpty)
    for (cell <- Seq(3.0, 10.0, 50.0)) {
      val got = withRewrite(cell) {
        pairsOf(parcels.join(zones, G.st_intersects($"geom", $"zgeom")))
      }.sorted
      assert(got == expected, s"cell=$cell: ${got.size} vs ${expected.size}")
    }
  }

  test("rewrite dwithin and contains match broadcast; residual applies") {
    val expectedD = pairsOf(
      parcels.join(zones, G.st_dwithin($"geom", $"zgeom", lit(4.0)))).sorted
    assert(withRewrite(10.0) {
      pairsOf(parcels.join(zones, G.st_dwithin($"geom", $"zgeom", lit(4.0))))
    }.sorted == expectedD)

    val expectedC = pairsOf(
      zones.join(parcels, G.st_contains($"zgeom", $"geom")).select("pid", "zid")).sorted
    assert(withRewrite(10.0) {
      pairsOf(zones.join(parcels, G.st_contains($"zgeom", $"geom")).select("pid", "zid"))
    }.sorted == expectedC)

    val expectedR = pairsOf(parcels.join(zones,
      G.st_intersects($"geom", $"zgeom") && $"zid" =!= "z0")).sorted
    val gotR = withRewrite(10.0) {
      pairsOf(parcels.join(zones,
        G.st_intersects($"geom", $"zgeom") && $"zid" =!= "z0"))
    }.sorted
    assert(gotR == expectedR && !gotR.exists(_._2 == "z0"))
  }

  test("rewrite scale smoke: 10k x 10k random boxes equals broadcast") {
    val rnd = new scala.util.Random(11)
    def randBoxes(n: Int, tag: String) =
      (0 until n).map { i =>
        val x = rnd.nextDouble() * 1000.0 - 500.0
        val y = rnd.nextDouble() * 1000.0 - 500.0
        (s"$tag$i", square(x, y, 0.2 + rnd.nextDouble() * 3.0))
      }
    val a = randBoxes(10000, "a").toDF("pid", "geom").repartition(8)
    val b = randBoxes(10000, "b").toDF("zid", "zgeom").repartition(8)
    val expected = pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom"))).sorted
    val got = withRewrite(25.0) {
      pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom")))
    }.sorted
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("rewrite: AQE skew-splits a hot cell (what the RDD-cogroup exec needed static salts for)") {
    // one pathological cell: thousands of rows pile into cell (0,0)
    // while the rest of the grid is sparse
    val hotA = (0 until 4000).map(i => (s"h$i", square(1.0 + (i % 7) * 0.001, 1.0, 0.5)))
    val coldA = (0 until 40).map(i => (s"c$i", square(100.0 + i * 30.0, 50.0, 0.5)))
    val a = (hotA ++ coldA).toDF("pid", "geom").repartition(8)
    val hotB = (0 until 300).map(i => (s"H$i", square(1.2, 1.0 + (i % 5) * 0.001, 0.5)))
    val coldB = (0 until 40).map(i => (s"C$i", square(100.0 + i * 30.0, 50.0, 0.5)))
    val b = (hotB ++ coldB).toDF("zid", "zgeom").repartition(8)

    val expected = pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom"))).sorted
    assert(expected.size > 1000000 / 2 || expected.nonEmpty)

    val skewConfs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prior = skewConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val got = withRewrite(25.0) {
        val df = a.join(b, G.st_intersects($"geom", $"zgeom"))
        df.collect()   // finalize AQE
        val plan = df.queryExecution.executedPlan.toString
        // AQE recognized and split the hot cell at runtime — no salt
        // conf anywhere
        assert(plan.contains("skewed"), plan)
        pairsOf(df)
      }.sorted
      assert(got == expected)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("FP-adversarial cell boundaries: exec owns each pair exactly once") {
    // cellSize 0.1 is not FP-representable, so corners at multiples of
    // 0.1 land EXACTLY on cell boundaries where the old interval
    // ownership test (refX >= cx*cs && refX < cx*cs + cs) disagreed
    // with the floor(refX/cs) cell assignment: e.g. refX=1.5 satisfied
    // the interval in BOTH cell 14 (14*0.1+0.1 = 1.5000000000000002)
    // and cell 15 (15*0.1 = 1.5) → duplicate pairs; other boundary
    // values satisfied it in NO cell → dropped pairs. The fix owns via
    // the same floor arithmetic as the assignment.
    // base -24.6: the lattice -24.6 + k*0.1 lands on doubles where
    // floor(v/0.1)*0.1 and the interval bound round OPPOSITE ways (e.g.
    // v = -24.200000000000003 satisfies the interval in two adjacent
    // cells) — simulated: the interval form emits 3844 pairs for 3136
    // true ones on this fixture
    val a = (0 until 144).map { i =>
      (s"p$i", square(-24.6 + (i % 12) * 0.1, -24.6 + (i / 12) * 0.1, 0.25))
    }.toDF("pid", "geom")
    val b = (0 until 144).map { i =>
      (s"z$i", square(-24.65 + (i % 12) * 0.1, -24.65 + (i / 12) * 0.1, 0.25))
    }.toDF("zid", "zgeom")

    val expected = pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom"))).sorted
    assert(expected.nonEmpty)
    val gotExec = withGrid(0.1) {
      pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom")))
    }.sorted
    assert(gotExec == expected,
      s"exec: ${gotExec.size} vs ${expected.size} " +
        s"(dups=${gotExec.diff(expected).take(5)}, missing=${expected.diff(gotExec).take(5)})")
    val gotRewrite = withRewrite(0.1) {
      pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom")))
    }.sorted
    assert(gotRewrite == expected, s"rewrite: ${gotRewrite.size} vs ${expected.size}")
  }

  test("empty geometries join nothing in both grid paths instead of corrupting cell 0") {
    G.registerAll(spark)
    // POLYGON EMPTY has a null JTS envelope: the old gridCells computed
    // negative spans whose positive product allocated an all-zero cell
    // array, piling every empty row into cell encode(0,0)
    val cells = spark.sql(
      """SELECT size(st_grid_cells(st_geomfromwkt('POLYGON EMPTY'), 10.0D, 0.0D)) AS n,
        |       size(st_grid_cells(st_geomfromwkt('GEOMETRYCOLLECTION EMPTY'), 10.0D, 0.0D)) AS m
        |""".stripMargin).collect()(0)
    assert(cells.getInt(0) == 0 && cells.getInt(1) == 0)

    val a = Seq(("real", square(1.0, 1.0, 3.0)), ("empty", wkt("POLYGON EMPTY")))
      .toDF("pid", "geom")
    val b = Seq(("cellzero", square(2.0, 2.0, 3.0))).toDF("zid", "zgeom")
    for (mode <- Seq("exec", "rewrite")) {
      val got = (if (mode == "exec") withGrid(10.0) {
        pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom")))
      } else withRewrite(10.0) {
        pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom")))
      }).sorted
      assert(got == Seq(("real", "cellzero")), s"$mode: $got")
    }
  }

  test("non-finite coordinates fail LOUDLY in both grid paths, never a sentinel cell") {
    G.registerAll(spark)
    // min==max==Inf saturates both Long bounds equally: span read 1 and
    // the corrupt row sailed into cell (MaxValue, MaxValue) where JTS
    // intersects(POINT(Inf Inf), POINT(Inf Inf)) is TRUE — the exec
    // path emitted silent garbage where the rewrite threw (r20 review)
    val infWkb = GeomCodec.write(GeomCodec.factory.createPoint(
      new org.locationtech.jts.geom.Coordinate(
        Double.PositiveInfinity, Double.PositiveInfinity)))
    val inf = Seq(("bad", infWkb)).toDF("pid", "geom")
    val b = Seq(("z", square(0.0, 0.0, 2.0))).toDF("zid", "zgeom")
    for (mode <- Seq("exec", "rewrite")) {
      val e = intercept[Exception] {
        if (mode == "exec") withGrid(10.0) {
          pairsOf(inf.join(b, G.st_intersects($"geom", $"zgeom")))
        } else withRewrite(10.0) {
          pairsOf(inf.join(b, G.st_intersects($"geom", $"zgeom")))
        }
      }
      val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
      assert(msg.contains("non-finite"), s"$mode: $msg")
    }
    // st_grid_refcell refuses an empty geometry instead of cell (0,0)
    val re = intercept[Exception] {
      spark.sql(
        """SELECT st_grid_refcell(st_geomfromwkt('POLYGON EMPTY'),
          |  st_geomfromwkt('POLYGON((0 0,1 0,1 1,0 1,0 0))'), 10.0D, 0.0D)
          |""".stripMargin).collect()
    }
    val rmsg = Iterator.iterate(re: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(rmsg.contains("no reference"), rmsg)
  }

  test("a typo'd gridMode fails loudly instead of silently selecting the exec path") {
    spark.conf.set(GridJoinRewrite.GridModeKey, "Rewrite")
    try {
      val e = intercept[Exception] {
        withGrid(10.0) { // sets cell size; mode stays the typo
          spark.conf.set(GridJoinRewrite.GridModeKey, "Rewrite")
          pairsOf(parcels.join(zones, G.st_intersects($"geom", $"zgeom")))
        }
      }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
        .contains(GridJoinRewrite.GridModeKey))
    } finally spark.conf.unset(GridJoinRewrite.GridModeKey)
  }

  test("exec path fails fast on a wrong-units cell size (same cap as the rewrite)") {
    // a 40-unit envelope at cellSize 1e-5 spans 4e6 cells per axis — the
    // rewrite path always errored clearly; the exec path used to emit
    // ~10^13 shuffle tuples instead
    val e = intercept[Exception] {
      withGrid(1e-5) {
        parcels.join(zones, G.st_intersects($"geom", $"zgeom")).count()
      }
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("raise " + SpatialJoinStrategy.GridCellKey), msg)
  }

  test("gridCellSize=Infinity is malformed conf: falls back instead of one-cell cartesian") {
    spark.conf.set(SpatialJoinStrategy.GridCellKey, "Infinity")
    spark.conf.set(SpatialJoinStrategy.ThresholdKey, "1")
    try {
      val df = parcels.join(zones, G.st_intersects($"geom", $"zgeom"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("GridSpatialJoin"), plan)
      assert(df.count() > 0)
    } finally {
      spark.conf.unset(SpatialJoinStrategy.GridCellKey)
      spark.conf.unset(SpatialJoinStrategy.ThresholdKey)
    }
  }

  test("identical-geometry hot rows stay exact under salting (content-hash salts)") {
    // the classic spatial skew: many records geocoded to ONE point —
    // a geometry-only salt hash put them all in the same sub-group;
    // full-row content hashing spreads them and must not change output
    val hot = (0 until 500).map(i => (s"e$i", square(1.0, 1.0, 0.5)))
    val a = hot.toDF("pid", "geom").repartition(4)
    val b = Seq(("zone", square(0.5, 0.5, 2.0))).toDF("zid", "zgeom")
    val expected = pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom"))).sorted
    assert(expected.size == 500)
    spark.conf.set(SpatialJoinStrategy.GridSaltsKey, "4")
    try {
      val got = withGrid(10.0) {
        pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom")))
      }.sorted
      assert(got == expected)
    } finally spark.conf.unset(SpatialJoinStrategy.GridSaltsKey)
  }

  test("rewrite orders the cheap ownership check before the exact predicate") {
    withRewrite(10.0) {
      val df = parcels.join(zones, G.st_intersects($"geom", $"zgeom"))
      val cond = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.condition.map(_.toString)
      }.flatten.mkString(" ")
      val refIdx = cond.indexOf("st_grid_refcell")
      val exactIdx = cond.indexOf("st_intersects")
      assert(refIdx >= 0 && exactIdx >= 0, cond)
      // And short-circuits left-to-right: the envelope-only refcell
      // check must kill non-owning copies before the JTS predicate runs
      assert(refIdx < exactIdx, cond)
    }
  }

  test("negative-coordinate geometries hash to the correct cells") {
    val a = Seq(("a1", square(-25.0, -25.0, 10.0))).toDF("pid", "geom")
    val b = Seq(("b1", square(-20.0, -20.0, 10.0)), ("b2", square(5.0, 5.0, 1.0)))
      .toDF("zid", "zgeom")
    val got = withGrid(7.0) {
      pairsOf(a.join(b, G.st_intersects($"geom", $"zgeom")))
    }
    assert(got == Seq(("a1", "b1")))
  }
}
