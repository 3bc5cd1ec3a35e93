package graft.geom

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeomFunctions => G}

/** Native codegen'd ST expressions: DataFrame path, SQL registration
  * via GraftExtensions, and null propagation.
  */
class GeomExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("native st_area/st_intersects evaluate correctly incl. nulls") {
    val df = Seq(
      ("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))"),
      ("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON((5 5, 6 5, 6 6, 5 6, 5 5))"),
      (null, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")
    ).toDF("wa", "wb")
      .withColumn("ga", G.st_geomfromwkt($"wa"))
      .withColumn("gb", G.st_geomfromwkt($"wb"))
      .select(
        GeomExpressions.st_area_native($"ga").as("area"),
        GeomExpressions.st_intersects_native($"ga", $"gb").as("x"))
      .collect()
    assert(df(0).getDouble(0) == 4.0 && df(0).getBoolean(1))
    assert(df(1).getDouble(0) == 1.0 && !df(1).getBoolean(1))
    assert(df(2).isNullAt(0) && df(2).isNullAt(1)) // nullIntolerant propagation
  }

  test("st_area/st_intersects registered in SQL via GraftExtensions") {
    val df = Seq(("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))"))
      .toDF("wa", "wb")
      .withColumn("ga", G.st_geomfromwkt($"wa"))
      .withColumn("gb", G.st_geomfromwkt($"wb"))
    df.createOrReplaceTempView("geoms")
    val out = spark.sql(
      "SELECT st_area(ga) AS a, st_intersects(ga, gb) AS x FROM geoms").collect()(0)
    assert(out.getDouble(0) == 4.0 && out.getBoolean(1))
  }

  test("native constructive ops match JTS semantics incl. nulls and pass-through") {
    val rows = Seq(
      // overlapping squares: intersection 1x1, difference L-shape area 3
      ("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))"),
      // touching squares: intersection is a LINE -> polygonal() empties it
      ("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON((1 0, 2 0, 2 1, 1 1, 1 0))"),
      (null, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")
    ).toDF("wa", "wb")
      .withColumn("ga", G.st_geomfromwkt($"wa"))
      .withColumn("gb", G.st_geomfromwkt($"wb"))
      .select(
        GeomExpressions.st_area_native(GeomExpressions.st_polygonal_native(
          GeomExpressions.st_intersection_native($"ga", $"gb"))).as("xarea"),
        GeomExpressions.st_area_native(
          GeomExpressions.st_difference_native($"ga", $"gb")).as("darea"),
        GeomExpressions.st_area_native(
          GeomExpressions.st_union_native($"ga", $"gb")).as("uarea"))
      .collect()
    assert(rows(0).getDouble(0) == 1.0 && rows(0).getDouble(1) == 3.0
      && rows(0).getDouble(2) == 7.0)
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getDouble(1) == 1.0
      && rows(1).getDouble(2) == 2.0)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("fused intersection/difference+polygonal bit-match the composed forms") {
    // the fused kernels skip a WKB serialize→parse round trip per pair;
    // they must stay BYTE-identical to st_polygonal(st_intersection(…))
    // etc. on every branch: overlapping (pure polygon), touching (mixed
    // dims → empties), mixed-dimension union path, and nulls
    val rows = Seq(
      ("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))"),
      ("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON((1 0, 2 0, 2 1, 1 1, 1 0))"),
      // GC(poly, line) difference path: a multipolygon minus a square that
      // splits it — exercises the multi-part pass-through
      ("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((2 0,3 0,3 1,2 1,2 0)))",
        "POLYGON((0.4 -1, 0.6 -1, 0.6 2, 0.4 2, 0.4 -1))"),
      (null, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")
    ).toDF("wa", "wb")
      .withColumn("ga", G.st_geomfromwkt($"wa"))
      .withColumn("gb", G.st_geomfromwkt($"wb"))
      .select(
        GeomExpressions.st_intersection_polygonal_native($"ga", $"gb").as("fx"),
        GeomExpressions.st_polygonal_native(
          GeomExpressions.st_intersection_native($"ga", $"gb")).as("cx"),
        GeomExpressions.st_difference_polygonal_native($"ga", $"gb").as("fd"),
        GeomExpressions.st_polygonal_native(
          GeomExpressions.st_difference_native($"ga", $"gb")).as("cd"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
      else {
        assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("fx"), r.getAs[Array[Byte]]("cx")))
        assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("fd"), r.getAs[Array[Byte]]("cd")))
      }
    }
  }

  test("st_polygonal passes all-polygonal input through byte-identical") {
    val wkb = GeomCodec.wktToWkb("MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)))")
    val out = Seq(Tuple1(wkb)).toDF("g")
      .select(GeomExpressions.st_polygonal_native($"g").as("p"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(out, wkb))
  }

  test("constructive ops registered in SQL via GraftExtensions") {
    GeomFunctions.registerAll(spark) // for st_geomfromwkt; must NOT shadow the natives
    val out = spark.sql(
      """SELECT st_area(st_polygonal(st_intersection(
        |         st_geomfromwkt('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))'),
        |         st_geomfromwkt('POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))')))) AS x,
        |       st_area(st_difference(
        |         st_geomfromwkt('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))'),
        |         st_geomfromwkt('POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS d,
        |       st_area(st_union(
        |         st_geomfromwkt('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))'),
        |         st_geomfromwkt('POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS u
        |""".stripMargin).collect()(0)
    assert(out.getDouble(0) == 1.0 && out.getDouble(1) == 3.0 && out.getDouble(2) == 7.0)
  }

  test("native st_makevalid repairs bowties, passes valid/null through, codegens") {
    // bowtie (self-intersecting) square: invalid; fixer splits it at
    // the crossing point (1,1) into two unit-area triangles
    val rows = Seq(
      "POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))",       // bowtie -> repaired
      "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))",       // valid -> untouched
      null
    ).toDF("w")
      .withColumn("g", G.st_geomfromwkt($"w"))
      .select(
        GeomExpressions.st_makevalid_native($"g").as("fixed"),
        $"g")
      .collect()
    val fixed0 = GeomCodec.read(rows(0).getAs[Array[Byte]]("fixed"))
    assert(fixed0.isValid && math.abs(fixed0.getArea - 2.0) < 1e-9)
    // valid input passes through byte-identical (no re-encode)
    assert(java.util.Arrays.equals(
      rows(1).getAs[Array[Byte]]("fixed"), rows(1).getAs[Array[Byte]]("g")))
    assert(rows(2).isNullAt(0))

    // SQL registration
    GeomFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT st_area(st_makevalid(st_geomfromwkt('POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))'))) AS a")
      .collect()(0).getDouble(0)
    assert(math.abs(viaSql - 2.0) < 1e-9)

    // hot path demand: stays inside whole-stage codegen
    val plan = spark.range(4)
      .withColumn("g", G.st_geomfromwkt(lit("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")))
      .select(GeomExpressions.st_area_native(
        GeomExpressions.st_makevalid_native($"g")).as("a"))
      .filter($"a" > 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"), plan)
  }

  test("native st_area_sqmi matches the 3310 equal-area contract and codegens") {
    // 0.1° square at the equator in 4326; value pinned by CrsMathSpec's
    // forward transforms — here we pin native == previous UDF semantics
    val wkt = "POLYGON((-120 38, -119.9 38, -119.9 38.1, -120 38.1, -120 38))"
    val rows = Seq(Some(wkt), None).toDF("w")
      .withColumn("g", G.st_geomfromwkt($"w"))
      .select(GeomExpressions.st_area_sqmi_native($"g", lit(4326)).as("sqmi"))
      .collect()
    val viaKernel = GeomOps.areaSqmi(GeomCodec.wktToWkb(wkt), 4326)
    assert(math.abs(rows(0).getDouble(0) - viaKernel) < 1e-12)
    assert(rows(0).getDouble(0) > 20 && rows(0).getDouble(0) < 60) // ~38 mi² sanity
    assert(rows(1).isNullAt(0))

    val viaSql = spark.sql(
      s"SELECT st_area_sqmi(st_geomfromwkt('$wkt'), 4326) AS a").collect()(0).getDouble(0)
    assert(math.abs(viaSql - viaKernel) < 1e-12)

    val plan = spark.range(4)
      .withColumn("g", G.st_geomfromwkt(lit(wkt)))
      .select(GeomExpressions.st_area_sqmi_native($"g", lit(4326)).as("a"))
      .filter($"a" > 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"), plan)
  }

  test("constructive chain stays inside whole-stage codegen") {
    val df = spark.range(4)
      .withColumn("a", G.st_geomfromwkt(lit("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")))
      .withColumn("b", G.st_geomfromwkt(lit("POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))")))
      .select(GeomExpressions.st_area_native(GeomExpressions.st_polygonal_native(
        GeomExpressions.st_intersection_native($"a", $"b"))).as("x"))
      .filter($"x" > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"), plan)
  }

  test("native expressions stay inside whole-stage codegen") {
    // range source: a LocalRelation would be eagerly collapsed by the
    // optimizer before any codegen happens
    val df = spark.range(4)
      .withColumn("g", G.st_geomfromwkt(lit("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")))
      .select(GeomExpressions.st_area_native($"g").as("a"))
      .filter($"a" > 1)
    // '*' prefixes mark WholeStageCodegen spans; both the Project
    // computing st_area and the Filter must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"), plan)
  }
}
