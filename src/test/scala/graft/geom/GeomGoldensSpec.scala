package graft.geom

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkTestBase
import graft.geom.{GeomFunctions => G}
import graft.operators.SpatialOps

/** Geometry golden tests G1–G8 (SURVEY §2.14) on hand-built WKT
  * micro-fixtures (FIXTURES.md §3). Areas to 1e-6, coords to 1e-9.
  */
class GeomGoldensSpec extends SparkTestBase {
  import spark.implicits._

  private def sq(x0: Double, y0: Double, x1: Double, y1: Double): String =
    s"POLYGON(($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"

  test("G1: make-valid fixes a bowtie; null geometry preserved (OP-44, bunny.py:226)") {
    val df = Seq(
      (1, "POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))"), // self-intersecting bowtie
      (2, null.asInstanceOf[String])
    ).toDF("id", "wkt")
      .withColumn("geom", G.st_makevalid(G.st_geomfromwkt($"wkt")))
      .withColumn("area", G.st_area($"geom"))
      .withColumn("valid", G.st_isvalid($"geom"))
      .orderBy("id")
    val rows = df.collect()
    assert(math.abs(rows(0).getAs[Double]("area") - 2.0) < 1e-6) // two unit triangles
    assert(rows(0).getAs[Boolean]("valid"))
    assert(rows(1).getAs[Array[Byte]]("geom") == null)            // delete_null=False
  }

  test("G2: dissolve 4 touching squares by key -> 2 multipart unions (OP-38, bunny.py:266-270)") {
    val df = Seq(
      ("A", sq(0, 0, 1, 1)), ("A", sq(1, 0, 2, 1)),  // touching -> single polygon
      ("B", sq(3, 0, 4, 1)), ("B", sq(5, 0, 6, 1))   // disjoint -> 2-part multi
    ).toDF("key", "wkt").withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val out = SpatialOps.dissolve(df, Seq("key"))
      .withColumn("area", G.st_area($"geom"))
      .withColumn("nparts", G.st_numgeometries($"geom"))
      .orderBy("key").collect()
    assert(out.length == 2)
    assert(math.abs(out(0).getAs[Double]("area") - 2.0) < 1e-6)
    assert(out(0).getAs[Int]("nparts") == 1)
    assert(math.abs(out(1).getAs[Double]("area") - 2.0) < 1e-6)
    assert(out(1).getAs[Int]("nparts") == 2)
  }

  test("G3: planar overlay union -> 3 pieces, blank '' on non-matching side (OP-43, coastline.py:52,63)") {
    val a = Seq(("A", sq(0, 0, 2, 2))).toDF("la", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val b = Seq(("B", sq(1, 1, 3, 3))).toDF("lb", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val out = SpatialOps.overlayUnion(a, b)
      .withColumn("area", G.st_area($"geom"))
      .select("la", "lb", "area").orderBy("la", "lb").collect()
    assert(out.length == 3)
    // sorted: ("", "B", 3.0), ("A", "", 3.0), ("A", "B", 1.0)
    assert(out(0) == Row("", "B", 3.0))
    assert(out(1) == Row("A", "", 3.0))
    assert(out(2) == Row("A", "B", 1.0))
  }

  test("G4: erase city from county -> L-shape; fully-covered county vanishes (OP-42, bunny.py:396)") {
    val counties = Seq(("County1", sq(0, 0, 2, 2)), ("County2", sq(5, 5, 6, 6)))
      .toDF("name", "wkt").withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val cities = Seq(sq(0, 0, 1, 1), sq(5, 5, 6, 6)).toDF("wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val out = SpatialOps.erase(counties, cities)
      .withColumn("area", G.st_area($"geom")).select("name", "area").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("name") == "County1")
    assert(math.abs(out(0).getAs[Double]("area") - 3.0) < 1e-6)
  }

  test("G5: reproject 4326->3310 + area in mi² (OP-45/46, config.py:48-51)") {
    // densified 1°x1° cell so edges track the projection curves
    val n = 100
    val pts = (0 to n).map(i => s"${-120.0 + i / n.toDouble} 37.0") ++
      (0 to n).map(i => s"-119.0 ${37.0 + i / n.toDouble}") ++
      (0 to n).map(i => s"${-119.0 - i / n.toDouble} 38.0") ++
      (0 to n).map(i => s"-120.0 ${38.0 - i / n.toDouble}")
    val wkt = s"POLYGON((${pts.mkString(", ")}))"
    val df = Seq(wkt).toDF("wkt").withColumn("geom", G.st_geomfromwkt($"wkt"))
      .withColumn("sqmi", G.st_area_sqmi($"geom", lit(4326)))
    val sqmi = df.collect()(0).getAs[Double]("sqmi")
    // golden: authalic area of the cell = 9813.63 km² = 3789.188 mi²
    // (CrsMathSpec proves projected == authalic to 1e-6 relative)
    assert(math.abs(sqmi - 3789.188) < 0.01, s"got $sqmi mi²")
  }

  test("G6: part decomposition, area threshold, touches/disjoint classification (OP-48/49)") {
    val multi = "MULTIPOLYGON(((0 0, 100 0, 100 100, 0 100, 0 0)), ((100 0, 105 0, 105 5, 100 5, 100 0)))"
    val df = Seq(multi).toDF("wkt").withColumn("geom", G.st_geomfromwkt($"wkt"))
      .select(explode(G.st_dump($"geom")).as("part"))
      .withColumn("area", G.st_area($"part"))
    val areas = df.collect().map(_.getAs[Double]("area")).sorted
    assert(areas.length == 2)
    assert(math.abs(areas(0) - 25.0) < 1e-6 && math.abs(areas(1) - 10000.0) < 1e-6)

    val pair = Seq((sq(0, 0, 1, 1), sq(1, 0, 2, 1), sq(5, 5, 6, 6))).toDF("a", "b", "c")
      .withColumn("ga", G.st_geomfromwkt($"a"))
      .withColumn("gb", G.st_geomfromwkt($"b"))
      .withColumn("gc", G.st_geomfromwkt($"c"))
      .select(
        G.st_touches($"ga", $"gb").as("t"),
        G.st_disjoint($"ga", $"gc").as("d"),
        G.st_touches($"ga", $"gc").as("t2"))
      .collect()(0)
    assert(pair.getAs[Boolean]("t") && pair.getAs[Boolean]("d") && !pair.getAs[Boolean]("t2"))
  }

  test("G7: sliver fix moves small touching parts, honors keep-list (coastline.py:68-149)") {
    val threshold = 100.0
    val keep = Seq(GeomCodec.wktToWkb(sq(100, 50, 102, 52))) // protects S3
    // place "Alpha": land polygon + coastal buffer with 3 parts:
    //  S1 25m² touching land -> moves; S2 10000m² big -> stays;
    //  S3 4m² touching land but inside keep-list -> stays
    val land = sq(0, 0, 100, 100)
    val coastal = "MULTIPOLYGON(" +
      "((100 0, 105 0, 105 5, 100 5, 100 0))," +       // S1
      "((200 0, 300 0, 300 100, 200 100, 200 0))," +    // S2
      "((100 50, 102 50, 102 52, 100 52, 100 50)))"     // S3
    // place "Solo": one polygon -> untouched
    val df = Seq(
      (1L, "Alpha", land),
      (2L, "Alpha", coastal),
      (3L, "Solo", sq(500, 500, 510, 510))
    ).toDF("oid", "name", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")

    val out = SpatialOps.sliverFix(df, "name", "oid", "geom", keep, threshold)
      .withColumn("area", G.st_area($"geom"))
      .select("oid", "area").orderBy("oid").collect()
    assert(math.abs(out(0).getAs[Double]("area") - 10025.0) < 1e-6) // land + S1
    assert(math.abs(out(1).getAs[Double]("area") - 10004.0) < 1e-6) // S2 + S3
    assert(math.abs(out(2).getAs[Double]("area") - 100.0) < 1e-6)   // untouched
  }

  test("G8: keep-list constant geometries round-trip 3310->3857->3310 (OP-47, config.py:62-66)") {
    // authored in 3310 (Farallon box, Alcatraz point, Angel Island box)
    val fixtures = Seq(
      (1, sq(-281052.0, -38503.0, -257873.0, -16085.0), 23179.0 * 22418.0),
      (2, "POINT(-212926 -18383)", 0.0),
      (3, sq(-212938.0, -15762.0, -211711.0, -14187.0), 1227.0 * 1575.0))
    val out = fixtures.map { case (id, wkt, _) => (id, wkt) }
      .toDF("id", "wkt")
      .withColumn("g", G.st_geomfromwkt($"wkt"))
      .withColumn("rt", G.st_transform(G.st_transform($"g", lit(3310), lit(3857)),
        lit(3857), lit(3310)))
      .withColumn("area", G.st_area($"rt"))
      .orderBy("id").collect()
    fixtures.zip(out).foreach { case ((_, wkt, expectArea), row) =>
      assert(math.abs(row.getAs[Double]("area") - expectArea) < 1.0, wkt)
      val orig = GeomCodec.read(GeomCodec.wktToWkb(wkt)).getCoordinate
      val rt = GeomCodec.read(row.getAs[Array[Byte]]("rt")).getCoordinate
      assert(math.abs(rt.x - orig.x) < 1e-4 && math.abs(rt.y - orig.y) < 1e-4,
        s"round-trip drift: $orig -> $rt")
    }
  }

  test("dissolve survives invalid (self-intersecting) inputs via the fallback ladder") {
    val df = Seq(
      ("K", "POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))"),   // bowtie, invalid
      ("K", sq(0, 0, 1, 1)),
      ("K", sq(10, 10, 11, 11))
    ).toDF("key", "wkt").withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val out = SpatialOps.dissolve(df, Seq("key"))
      .withColumn("area", G.st_area($"geom"))
      .withColumn("valid", G.st_isvalid($"geom"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Boolean]("valid"))
    // bowtie(2.0) ∪ unit square overlapping one lobe + disjoint square:
    // exact overlap area varies with how the lobe is fixed, but the
    // union must be at least each input and at most their sum
    val a = out(0).getAs[Double]("area")
    assert(a >= 2.0 && a <= 4.0, s"area $a")
  }

  test("G7b: three-polygon place pairs all members (coastline.py:92-106)") {
    val threshold = 100.0
    val p1 = sq(0, 0, 100, 100)                       // big
    val p2 = sq(100, 0, 104, 4)                       // 16m² touches p1 -> moves
    val p3 = sq(0, 100, 100, 200)                     // big, touches p1
    val df = Seq((1L, "SF", p1), (2L, "SF", p2), (3L, "SF", p3))
      .toDF("oid", "name", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val out = SpatialOps.sliverFix(df, "name", "oid", "geom", Seq.empty, threshold)
      .withColumn("area", G.st_area($"geom"))
      .select("oid", "area").orderBy("oid").collect()
    assert(math.abs(out(0).getAs[Double]("area") - 10016.0) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("area") - 0.0) < 1e-6)     // emptied
    assert(math.abs(out(2).getAs[Double]("area") - 10000.0) < 1e-6)
  }
}
