package graft.geom

import graft.SparkTestBase

/** The full ST vocabulary through `spark.sql` after
  * `GeomFunctions.registerAll` — a SQL user's view of the geometry
  * engine, including the dissolve aggregate.
  */
class GeomSqlSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  test("injected vector kernels work from pure SQL") {
    val r = spark.sql(
      """SELECT round(vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)), 6) AS d,
        |  round(vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS c,
        |  sig_eqcount(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS e,
        |  vec_normalize(array(3.0F, 4.0F)) AS n""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getInt(2) == 2)
    assert(r.getSeq[Float](3) == Seq(0.6f, 0.8f))
  }

  test("registered ST functions drive a dissolve + metrics query in pure SQL") {
    GeomFunctions.registerAll(spark)
    Seq(
      ("A", "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"),
      ("A", "POLYGON((1 0, 2 0, 2 1, 1 1, 1 0))"),
      ("B", "POLYGON((4 4, 6 4, 6 6, 4 6, 4 4))"))
      .toDF("key", "wkt").createOrReplaceTempView("shapes")

    val out = spark.sql(
      """SELECT key,
        |  st_area(g) AS area,
        |  st_aswkt(st_centroid(g)) AS centroid,
        |  st_length(st_boundary(g)) AS perimeter,
        |  st_numgeometries(g) AS nparts
        |FROM (SELECT key, st_union_agg(st_geomfromwkt(wkt)) AS g
        |      FROM shapes GROUP BY key)
        |ORDER BY key""".stripMargin).collect()

    assert(out(0).getAs[Double]("area") == 2.0)
    assert(out(0).getAs[String]("centroid") == "POINT (1 0.5)")
    assert(out(0).getAs[Double]("perimeter") == 6.0)
    assert(out(1).getAs[Double]("area") == 4.0)

    val preds = spark.sql(
      """SELECT
        |  st_within(st_geomfromwkt('POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))'),
        |            st_geomfromwkt('POLYGON((0 0, 5 0, 5 5, 0 5, 0 0))')) AS w,
        |  st_distance(st_geomfromwkt('POINT(0 0)'), st_geomfromwkt('POINT(3 4)')) AS d,
        |  st_area(st_buffer(st_geomfromwkt('POINT(0 0)'), 1.0)) AS buf,
        |  st_aswkt(st_simplify(st_geomfromwkt(
        |    'POLYGON((0 0, 1 0.01, 2 0, 2 2, 0 2, 0 0))'), 0.1)) AS simp
        |""".stripMargin).collect()(0)
    assert(preds.getAs[Boolean]("w"))
    assert(preds.getAs[Double]("d") == 5.0)

    val dw = spark.sql(
      """SELECT st_dwithin(st_point(0, 0), st_point(3, 4), 5.0) AS inside,
        |       st_dwithin(st_point(0, 0), st_point(3, 4), 4.9) AS outside""".stripMargin)
      .collect()(0)
    assert(dw.getAs[Boolean]("inside") && !dw.getAs[Boolean]("outside"))
    // 8 quadrant segments (JTS default) undershoot the circle by ~0.02
    assert(math.abs(preds.getAs[Double]("buf") - math.Pi) < 0.03)
    assert(!preds.getAs[String]("simp").contains("0.01"))          // vertex simplified away
  }

  test("st_dump/st_collect round-trip from pure SQL (OP-48 surface)") {
    GeomFunctions.registerAll(spark)
    // the registerAll drift trap: these two were once present on the
    // Column API but missing from the SQL registration
    val r = spark.sql(
      """SELECT size(st_dump(g)) AS nparts,
        |       st_area(st_collect(st_dump(g))) AS area
        |FROM (SELECT st_geomfromwkt(
        |  'MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((2 2,4 2,4 4,2 4,2 2)))') AS g)
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.getDouble(1) == 5.0)
  }

  test("st_x/st_y: null for empties; collections skip empty leading parts") {
    GeomFunctions.registerAll(spark)
    // This JTS's GeometryCollection.getCoordinate returns the first
    // NON-empty member's coordinate (it does not NPE on, or return, an
    // empty leading part); empty geometries are SQL NULL. Pinned here so
    // a JTS upgrade that regresses either contract (older releases
    // returned null past the isEmpty guard) fails visibly.
    val r = spark.sql(
      """SELECT st_x(st_geomfromwkt('GEOMETRYCOLLECTION(LINESTRING EMPTY, POINT(1 2))')) AS cx,
        |       st_y(st_geomfromwkt('GEOMETRYCOLLECTION(LINESTRING EMPTY, POINT(1 2))')) AS cy,
        |       st_x(st_geomfromwkt('LINESTRING EMPTY')) AS ex,
        |       st_x(st_geomfromwkt('POINT(3 7)')) AS px,
        |       st_y(st_geomfromwkt('POINT(3 7)')) AS py""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 2.0)
    assert(r.isNullAt(2))
    assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 7.0)
  }

  test("wrong-arity SQL call fails with a clear message, not IndexOutOfBounds") {
    GeomFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT st_intersects(st_point(0, 0))").collect()
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msg.contains("st_intersects expects 2 argument(s), got 1"), msg)
    assert(!msg.contains("IndexOutOfBounds"), msg)
  }

  test("st_transform to 3857 fails loudly on a polar latitude instead of NaN") {
    GeomFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT st_transform(st_point(0, 90), 4326, 3857)").collect()
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msg.contains("outside the EPSG:3857 domain"), msg)
    // in-domain high latitude still projects (finite, huge y)
    val y = spark.sql(
      "SELECT st_y(st_transform(st_point(0, 89.9), 4326, 3857)) AS y")
      .collect()(0).getDouble(0)
    assert(!y.isNaN && !y.isInfinite && y > 2e7, y)
  }

  test("grid decomposition primitives work from pure SQL") {
    GeomFunctions.registerAll(spark)
    // a 2x1-cell envelope at cell size 10: cells (0,0) and (1,0)
    val r = spark.sql(
      """SELECT st_grid_cells(st_geomfromwkt('POLYGON((1 1, 15 1, 15 5, 1 5, 1 1))'),
        |                     10.0D, 0.0D) AS cells,
        |       st_grid_refcell(st_geomfromwkt('POLYGON((1 1, 15 1, 15 5, 1 5, 1 1))'),
        |                       st_geomfromwkt('POLYGON((12 2, 14 2, 14 4, 12 4, 12 2))'),
        |                       10.0D, 0.0D) AS refcell""".stripMargin)
      .collect()(0)
    val cells = r.getSeq[Long](0)
    assert(cells.length == 2 && cells.contains(0L) && cells.contains(1L << 32), cells)
    // ref point = (max(1,12), max(1,2)) = (12,2) -> cell (1,0)
    assert(r.getLong(1) == (1L << 32))
  }
}
