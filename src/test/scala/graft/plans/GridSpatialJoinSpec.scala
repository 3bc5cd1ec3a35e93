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

  private def withGrid[A](cell: Double)(f: => A): A = {
    spark.conf.set(SpatialJoinStrategy.GridCellKey, cell.toString)
    spark.conf.set(SpatialJoinStrategy.ThresholdKey, "1") // force the huge-huge path
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
