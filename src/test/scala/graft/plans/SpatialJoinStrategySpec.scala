package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.geom.{GeomCodec, GeomFunctions => G}

/** The planner strategy must rewrite spatial predicate joins into the
  * STRtree index exec — and produce exactly the rows the naive
  * predicate join produces.
  */
class SpatialJoinStrategySpec extends SparkTestBase {

  import spark.implicits._

  private def wkt(s: String): Array[Byte] = GeomCodec.wktToWkb(s)

  private def square(x: Double, y: Double, s: Double): Array[Byte] =
    wkt(s"POLYGON(($x $y, ${x + s} $y, ${x + s} ${y + s}, $x ${y + s}, $x $y))")

  // 6 parcels on a line; 3 zones covering parcels {0,1}, {2}, {none}
  private lazy val parcels: DataFrame =
    (0 until 6).map(i => (s"p$i", square(i * 10.0, 0.0, 8.0)))
      .toDF("pid", "geom")
  private lazy val zones: DataFrame =
    Seq(("zA", square(0.0, 0.0, 18.0)), ("zB", square(20.0, 0.0, 8.0)),
        ("zC", square(100.0, 100.0, 5.0)))
      .toDF("zid", "zgeom")

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("DataFrame st_intersects join plans as SpatialIndexJoin and matches brute force") {
    val joined = parcels.join(zones, G.st_intersects($"geom", $"zgeom"))
    assert(planOf(joined).contains("SpatialIndexJoin"), planOf(joined))
    assert(!planOf(joined).contains("BroadcastNestedLoopJoin"), planOf(joined))

    val got = joined.select("pid", "zid").as[(String, String)].collect().toSet
    // brute force on the driver
    val expect = (for {
      (pid, pg) <- parcels.as[(String, Array[Byte])].collect()
      (zid, zg) <- zones.as[(String, Array[Byte])].collect()
      if GeomCodec.read(pg).intersects(GeomCodec.read(zg))
    } yield (pid, zid)).toSet
    assert(got == expect)
    assert(got == Set(("p0", "zA"), ("p1", "zA"), ("p2", "zB")))
  }

  test("SQL JOIN ON st_intersects goes through the same exec") {
    parcels.createOrReplaceTempView("parcels_sj")
    zones.createOrReplaceTempView("zones_sj")
    val df = spark.sql(
      "SELECT pid, zid FROM parcels_sj JOIN zones_sj ON st_intersects(geom, zgeom)")
    assert(planOf(df).contains("SpatialIndexJoin"), planOf(df))
    assert(df.as[(String, String)].collect().toSet ==
      Set(("p0", "zA"), ("p1", "zA"), ("p2", "zB")))
  }

  test("st_contains orientation survives build-side mirroring, both argument orders") {
    // zones contain parcels fully inside them: zA (0..18) contains p0 (0..8) only
    // (p1 spans 10..18 — touching zA's edge from inside, still contained)
    val c1 = zones.join(parcels, G.st_contains($"zgeom", $"geom"))
      .select("zid", "pid").as[(String, String)].collect().toSet
    val c2 = parcels.join(zones, G.st_contains($"zgeom", $"geom"))
      .select("zid", "pid").as[(String, String)].collect().toSet
    val expect = (for {
      (pid, pg) <- parcels.as[(String, Array[Byte])].collect()
      (zid, zg) <- zones.as[(String, Array[Byte])].collect()
      if GeomCodec.read(zg).contains(GeomCodec.read(pg))
    } yield (zid, pid)).toSet
    assert(c1 == expect && c2 == expect)
    assert(expect == Set(("zA", "p0"), ("zA", "p1"), ("zB", "p2")))
  }

  test("st_dwithin with literal distance expands the probe envelope") {
    // p3 at 30..38; zB at 20..28 — gap of 2 between them
    val df = parcels.join(zones, G.st_dwithin($"geom", $"zgeom", lit(3.0)))
      .select("pid", "zid")
    assert(planOf(df).contains("dwithin"), planOf(df))
    val got = df.as[(String, String)].collect().toSet
    assert(got.contains(("p3", "zB")), got)   // within 3
    assert(!got.contains(("p4", "zB")), got)  // gap of 12
  }

  test("extra non-spatial conjuncts become a residual condition") {
    val df = parcels.join(zones,
      G.st_intersects($"geom", $"zgeom") && $"zid" =!= "zA")
    assert(planOf(df).contains("SpatialIndexJoin"), planOf(df))
    assert(df.select("pid", "zid").as[(String, String)].collect().toSet ==
      Set(("p2", "zB")))
  }

  test("a col=literal conjunct is NOT an equi-key: the spatial planner still engages") {
    // the empty reference set is a subset of both outputSets, so
    // EqualTo(col, literal) used to count as an equi-conjunct and bail
    // the spatial planner toward a hash join Catalyst cannot build on
    // a one-sided key (r20 review). Normally pushdown removes the
    // conjunct first; the plan must stay spatial either way.
    val df = parcels.join(zones,
      G.st_intersects($"geom", $"zgeom") && $"zid" === lit("zA"))
    assert(planOf(df).contains("SpatialIndexJoin"), planOf(df))
    assert(df.select("pid", "zid").as[(String, String)].collect().toSet ==
      Set(("p0", "zA"), ("p1", "zA")))
  }

  test("equi-conjunct joins are left to Catalyst's hash join") {
    val z2 = zones.withColumn("pid_key", lit("p0"))
    val df = parcels.join(z2,
      $"pid" === $"pid_key" && G.st_intersects($"geom", $"zgeom"))
    assert(!planOf(df).contains("SpatialIndexJoin"), planOf(df))
    assert(df.select("pid", "zid").as[(String, String)].collect().toSet ==
      Set(("p0", "zA")))
  }

  test("both sides over threshold fall back to Spark's own planning") {
    spark.conf.set(SpatialJoinStrategy.ThresholdKey, "1")
    try {
      val df = parcels.join(zones, G.st_intersects($"geom", $"zgeom"))
      assert(!planOf(df).contains("SpatialIndexJoin"), planOf(df))
      // still correct, just nested-loop
      assert(df.select("pid", "zid").as[(String, String)].collect().toSet ==
        Set(("p0", "zA"), ("p1", "zA"), ("p2", "zB")))
    } finally spark.conf.unset(SpatialJoinStrategy.ThresholdKey)
  }

  test("null geometries never match (inner-join semantics)") {
    val withNull = parcels.union(Seq(("pnull", null: Array[Byte])).toDF("pid", "geom"))
    val df = withNull.join(zones, G.st_intersects($"geom", $"zgeom"))
    assert(df.filter($"pid" === "pnull").count() == 0)
  }
}
