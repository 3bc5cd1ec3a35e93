package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{GeomFunctions => G}
import graft.operators.SpatialOps

/** Geometry-operator queries (SURVEY §2.8/§2.7/§2.9, goldens §2.14).
  *
  * DuckDB has no spatial types, but most goldens emit plain numbers
  * from hand-built axis-aligned fixtures whose exact outputs are
  * derivable on paper (areas of unit squares and their unions /
  * differences). Those carry a VALUES-literal oracle — the same
  * precomputed-golden contract as §2.14, but driver-checked per round
  * instead of only in ScalaTest. The CRS query (g9) gets a REAL
  * computed oracle: the Snyder Albers/Mercator formulas re-implemented
  * independently in DuckDB SQL arithmetic. Operators whose output is
  * geometry itself (g5 round-trip WKT) stay rows-only; their semantics
  * are pinned by `GeomGoldensSpec`/`CrsMathSpec`.
  */
object GeomQueries {

  private def sq(x0: Double, y0: Double, x1: Double, y1: Double): String =
    s"POLYGON(($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"

  private def q(name: String, oracle: String)(
      body: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, body, Some(oracle))

  /** OP-44 make-valid over a mixed valid/invalid fixture. Golden: the
    * bowtie POLYGON((0 0, 2 2, 2 0, 0 2, 0 0)) fixes to two unit
    * triangles (area 2), the unit square stays area 1.
    */
  val g1_makevalid: QuerySpec = q("g1_makevalid",
    """SELECT * FROM (VALUES (1, true, CAST(2.0 AS DOUBLE)),
      |                     (2, true, CAST(1.0 AS DOUBLE))) AS t(id, valid, area)
      |ORDER BY id""".stripMargin) { (s, _) =>
    import s.implicits._
    Seq((1, "POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))"), (2, sq(0, 0, 1, 1)))
      .toDF("id", "wkt")
      .withColumn("geom", G.st_makevalid(G.st_geomfromwkt($"wkt")))
      .select($"id", G.st_isvalid($"geom").as("valid"),
        round(G.st_area($"geom"), 6).as("area"))
      .orderBy("id")
  }

  /** OP-38 dissolve. Golden: A = two touching unit squares → one
    * 2-unit polygon; B = two disjoint unit squares → 2-part multi.
    */
  val g2_dissolve: QuerySpec = q("g2_dissolve",
    """SELECT * FROM (VALUES ('A', CAST(2.0 AS DOUBLE), CAST(1 AS INTEGER)),
      |                     ('B', CAST(2.0 AS DOUBLE), CAST(2 AS INTEGER))) AS t(key, area, nparts)
      |ORDER BY key""".stripMargin) { (s, _) =>
    import s.implicits._
    val df = Seq(("A", sq(0, 0, 1, 1)), ("A", sq(1, 0, 2, 1)),
      ("B", sq(3, 0, 4, 1)), ("B", sq(5, 0, 6, 1)))
      .toDF("key", "wkt").withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    SpatialOps.dissolve(df, Seq("key"))
      .select($"key", round(G.st_area($"geom"), 6).as("area"),
        G.st_numgeometries($"geom").as("nparts"))
      .orderBy("key")
  }

  /** OP-43 planar overlay of 2×2 and offset 2×2 squares overlapping in
    * a unit square. Golden: intersection (A,B,1), leftovers (A,'',3)
    * and ('',B,3) — blank-not-NULL on the non-matching side.
    */
  val g3_overlay: QuerySpec = q("g3_overlay",
    """SELECT * FROM (VALUES ('', 'B', CAST(3.0 AS DOUBLE)),
      |                     ('A', '', CAST(3.0 AS DOUBLE)),
      |                     ('A', 'B', CAST(1.0 AS DOUBLE))) AS t(la, lb, area)
      |ORDER BY la, lb""".stripMargin) { (s, _) =>
    import s.implicits._
    val a = Seq(("A", sq(0, 0, 2, 2))).toDF("la", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val b = Seq(("B", sq(1, 1, 3, 3))).toDF("lb", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    SpatialOps.overlayUnion(a, b)
      .select($"la", $"lb", round(G.st_area($"geom"), 6).as("area"))
      .orderBy("la", "lb")
  }

  /** OP-42 erase. Golden: County1 (2×2) minus city (unit square at its
    * corner) → L-shape of area 3; County2 fully covered → vanishes.
    */
  val g4_erase: QuerySpec = q("g4_erase",
    """SELECT * FROM (VALUES ('County1', CAST(3.0 AS DOUBLE))) AS t(name, area)
      |ORDER BY name""".stripMargin) { (s, _) =>
    import s.implicits._
    val counties = Seq(("County1", sq(0, 0, 2, 2)), ("County2", sq(5, 5, 6, 6)))
      .toDF("name", "wkt").withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val cities = Seq(sq(0, 0, 1, 1), sq(5, 5, 6, 6)).toDF("wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    SpatialOps.erase(counties, cities)
      .select($"name", round(G.st_area($"geom"), 6).as("area")).orderBy("name")
  }

  /** OP-45/46 reprojection + equal-area mi² (4326→3310). The oracle
    * projects the same 4 corners with the Snyder Albers formulas in
    * DuckDB SQL and runs the same shoelace — so the full
    * reproject-then-measure path is independently recomputed each
    * round. (The authalic-area interpretation of the densified cell is
    * separately pinned by GeomGoldensSpec G5 / CrsMathSpec.)
    */
  val g5_reproject: QuerySpec = q("g5_reproject",
    """WITH pts(seq, lon, lat) AS (VALUES (1, -120.0, 37.0), (2, -119.0, 37.0),
      |                                   (3, -119.0, 38.0), (4, -120.0, 38.0)),
      |c AS (SELECT 6378137.0 AS a, 1.0/298.257222101 AS f),
      |e AS (SELECT a, f*(2.0-f) AS e2, sqrt(f*(2.0-f)) AS ee FROM c),
      |par AS (SELECT a, e2, ee,
      |  (1.0-e2)*(sin(radians(34.0))/(1.0-e2*sin(radians(34.0))*sin(radians(34.0)))
      |    - (1.0/(2.0*ee))*ln((1.0-ee*sin(radians(34.0)))/(1.0+ee*sin(radians(34.0))))) AS q1,
      |  (1.0-e2)*(sin(radians(40.5))/(1.0-e2*sin(radians(40.5))*sin(radians(40.5)))
      |    - (1.0/(2.0*ee))*ln((1.0-ee*sin(radians(40.5)))/(1.0+ee*sin(radians(40.5))))) AS q2,
      |  cos(radians(34.0))/sqrt(1.0-e2*sin(radians(34.0))*sin(radians(34.0))) AS m1,
      |  cos(radians(40.5))/sqrt(1.0-e2*sin(radians(40.5))*sin(radians(40.5))) AS m2
      |  FROM e),
      |k AS (SELECT a, e2, ee, (m1*m1-m2*m2)/(q2-q1) AS n, m1*m1+((m1*m1-m2*m2)/(q2-q1))*q1 AS cc FROM par),
      |proj AS (SELECT p.seq,
      |  (a*sqrt(cc-n*((1.0-e2)*(sin(radians(p.lat))/(1.0-e2*sin(radians(p.lat))*sin(radians(p.lat)))
      |    - (1.0/(2.0*ee))*ln((1.0-ee*sin(radians(p.lat)))/(1.0+ee*sin(radians(p.lat)))))))/n)
      |    * sin(n*(radians(p.lon)-radians(-120.0))) AS x,
      |  a*sqrt(cc)/n -
      |  (a*sqrt(cc-n*((1.0-e2)*(sin(radians(p.lat))/(1.0-e2*sin(radians(p.lat))*sin(radians(p.lat)))
      |    - (1.0/(2.0*ee))*ln((1.0-ee*sin(radians(p.lat)))/(1.0+ee*sin(radians(p.lat)))))))/n)
      |    * cos(n*(radians(p.lon)-radians(-120.0))) + (-4000000.0) AS y
      |  FROM pts p CROSS JOIN k),
      |ring AS (SELECT p1.x AS x1, p1.y AS y1, p2.x AS x2, p2.y AS y2
      |  FROM proj p1 JOIN proj p2 ON p2.seq = CASE WHEN p1.seq = 4 THEN 1 ELSE p1.seq + 1 END)
      |SELECT 'cell' AS name,
      |  round(abs(sum(x1*y2 - x2*y1)) / 2.0 / 2589988.110336, 2) AS area_sqmi
      |FROM ring""".stripMargin) { (s, _) =>
    import s.implicits._
    Seq(("cell", sq(-120.0, 37.0, -119.0, 38.0))).toDF("name", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt"))
      .select($"name",
        round(G.st_area_sqmi($"geom", lit(4326)), 2).as("area_sqmi"))
  }

  /** OP-48/49 part decomposition. Golden: 100×100 and 5×5 parts. */
  val g6_parts: QuerySpec = q("g6_parts",
    """SELECT * FROM (VALUES (CAST(25.0 AS DOUBLE)),
      |                     (CAST(10000.0 AS DOUBLE))) AS t(area)
      |ORDER BY area""".stripMargin) { (s, _) =>
    import s.implicits._
    Seq("MULTIPOLYGON(((0 0, 100 0, 100 100, 0 100, 0 0)), ((100 0, 105 0, 105 5, 100 5, 100 0)))")
      .toDF("wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt"))
      .select(explode(G.st_dump($"geom")).as("part"))
      .select(round(G.st_area($"part"), 6).as("area"))
      .orderBy("area")
  }

  /** §2.9 coastal sliver fix. Golden: the 25 m² coastal sliver touching
    * the land square moves into it (10000+25); the big coastal part
    * stays (10000).
    */
  val g7_sliver_fix: QuerySpec = q("g7_sliver_fix",
    """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'Alpha', CAST(10025.0 AS DOUBLE)),
      |                     (CAST(2 AS BIGINT), 'Alpha', CAST(10000.0 AS DOUBLE))) AS t(oid, name, area)
      |ORDER BY oid""".stripMargin) { (s, _) =>
    import s.implicits._
    val coastal = "MULTIPOLYGON(" +
      "((100 0, 105 0, 105 5, 100 5, 100 0))," +
      "((200 0, 300 0, 300 100, 200 100, 200 0)))"
    val df = Seq((1L, "Alpha", sq(0, 0, 100, 100)), (2L, "Alpha", coastal))
      .toDF("oid", "name", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    SpatialOps.sliverFix(df, "name", "oid", "geom", Seq.empty, 100.0)
      .select($"oid", $"name", round(G.st_area($"geom"), 6).as("area"))
      .orderBy("oid")
  }

  /** G8 (OP-47): keep-list constant geometries round-trip 3310→3857→3310
    * (`config.py:62-66`). Golden: the boxes' 3310 areas are exact
    * integer products of their corner deltas (23179×22418 and
    * 1227×1575); the round-trip must close to well under a millimeter.
    */
  val g8_keeplist_roundtrip: QuerySpec = q("g8_keeplist_roundtrip",
    """SELECT * FROM (VALUES (1, CAST(519626822.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
      |                     (2, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
      |                     (3, CAST(1932525.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS t(id, area, rt_err)
      |ORDER BY id""".stripMargin) { (s, _) =>
    import s.implicits._
    // the reference's keep-list constants, authored in EPSG:3310
    // (config.py:62-66): Farallon box, Alcatraz point, Angel Island box
    val farallon = sq(-281052.0, -38503.0, -257873.0, -16085.0)
    val alcatraz = "POINT(-212926 -18383)"
    val angel = sq(-212938.0, -15762.0, -211711.0, -14187.0)
    val df = Seq((1, farallon), (2, alcatraz), (3, angel)).toDF("id", "wkt")
      .withColumn("g3310", G.st_geomfromwkt($"wkt"))
      .withColumn("rt",
        G.st_transform(G.st_transform($"g3310", lit(3310), lit(3857)),
          lit(3857), lit(3310)))
    df.select($"id",
        round(G.st_area($"rt"), 2).as("area"),
        // round-trip closure: |Δx| + |Δy| of the representative vertex
        round(abs(G.st_x($"rt") - G.st_x($"g3310")) +
          abs(G.st_y($"rt") - G.st_y($"g3310")), 4).as("rt_err"))
      .orderBy("id")
  }

  /** G9: forward CRS projections with a COMPUTED oracle — the DuckDB
    * side re-implements the published Snyder formulas (USGS PP 1395,
    * eq. 3-12/14-12..15) and spherical Mercator in plain SQL, so the
    * engine's hand-rolled CrsMath is checked against an independent
    * implementation every round, not a stored constant.
    */
  val g9_crs_forward: QuerySpec = q("g9_crs_forward",
    """WITH pts(id, lon, lat) AS (VALUES (1, -120.0, 37.0), (2, -119.0, 38.0),
      |                                  (3, -122.4194, 37.7749)),
      |c AS (SELECT 6378137.0 AS a, 1.0/298.257222101 AS f),
      |e AS (SELECT a, f*(2.0-f) AS e2, sqrt(f*(2.0-f)) AS ee FROM c),
      |par AS (SELECT a, e2, ee,
      |  (1.0-e2)*(sin(radians(34.0))/(1.0-e2*sin(radians(34.0))*sin(radians(34.0)))
      |    - (1.0/(2.0*ee))*ln((1.0-ee*sin(radians(34.0)))/(1.0+ee*sin(radians(34.0))))) AS q1,
      |  (1.0-e2)*(sin(radians(40.5))/(1.0-e2*sin(radians(40.5))*sin(radians(40.5)))
      |    - (1.0/(2.0*ee))*ln((1.0-ee*sin(radians(40.5)))/(1.0+ee*sin(radians(40.5))))) AS q2,
      |  cos(radians(34.0))/sqrt(1.0-e2*sin(radians(34.0))*sin(radians(34.0))) AS m1,
      |  cos(radians(40.5))/sqrt(1.0-e2*sin(radians(40.5))*sin(radians(40.5))) AS m2
      |  FROM e),
      |k AS (SELECT a, e2, ee, (m1*m1-m2*m2)/(q2-q1) AS n, m1*m1+((m1*m1-m2*m2)/(q2-q1))*q1 AS cc FROM par),
      |k2 AS (SELECT a, e2, ee, n, cc, a*sqrt(cc)/n AS rho0 FROM k),
      |proj AS (SELECT p.id, p.lon, p.lat, k2.*,
      |  (1.0-e2)*(sin(radians(p.lat))/(1.0-e2*sin(radians(p.lat))*sin(radians(p.lat)))
      |    - (1.0/(2.0*ee))*ln((1.0-ee*sin(radians(p.lat)))/(1.0+ee*sin(radians(p.lat))))) AS qq
      |  FROM pts p CROSS JOIN k2),
      |proj2 AS (SELECT id, lon, lat, a, n, rho0,
      |  a*sqrt(cc-n*qq)/n AS rho, n*(radians(lon)-radians(-120.0)) AS theta FROM proj)
      |SELECT id,
      |  round(rho*sin(theta), 3) AS x3310,
      |  round(rho0 - rho*cos(theta) + (-4000000.0), 3) AS y3310,
      |  round(a*radians(lon), 3) AS x3857,
      |  round(a*ln(tan(pi()/4.0 + radians(lat)/2.0)), 3) AS y3857
      |FROM proj2 ORDER BY id""".stripMargin) { (s, _) =>
    import s.implicits._
    val df = Seq((1, -120.0, 37.0), (2, -119.0, 38.0), (3, -122.4194, 37.7749))
      .toDF("id", "lon", "lat")
      .withColumn("p", G.st_point($"lon", $"lat"))
      .withColumn("p3310", G.st_transform($"p", lit(4326), lit(3310)))
      .withColumn("p3857", G.st_transform($"p", lit(4326), lit(3857)))
    df.select($"id",
        round(G.st_x($"p3310"), 3).as("x3310"),
        round(G.st_y($"p3310"), 3).as("y3310"),
        round(G.st_x($"p3857"), 3).as("x3857"),
        round(G.st_y($"p3857"), 3).as("y3857"))
      .orderBy("id")
  }

  /** G10 (OP-06-adjacent interchange format): native Shapefile
    * write→read round-trip — polygons with holes plus typed dBASE
    * attributes survive the .shp/.shx/.dbf encoding. Golden: areas and
    * the N-field attribute are hand-known.
    */
  val g10_shapefile_io: QuerySpec = q("g10_shapefile_io",
    """SELECT * FROM (VALUES ('Donut', CAST(96.0 AS DOUBLE), CAST(96.0 AS DOUBLE)),
      |                     ('Square', CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) AS t(name, area_attr, area)
      |ORDER BY name""".stripMargin) { (s, _) =>
    import s.implicits._
    val donut = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    val df = Seq(("Donut", 96.0, donut), ("Square", 1.0, sq(20, 20, 21, 21)))
      .toDF("name", "area_attr", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    // registered for JVM-exit cleanup: g10 runs per verify round AND
    // per bench warmup/rep — unregistered, a long session piles up one
    // orphaned 5-file shapefile dir per execution (r20 review)
    val base = graft.TempDirs.register(
      java.nio.file.Files.createTempDirectory("g10_shp")).toString + "/layer"
    graft.sources.Shapefile.write(df, base)
    graft.sources.Shapefile.read(s, base)
      .select($"NAME".as("name"), $"AREA_ATTR".as("area_attr"),
        round(G.st_area($"geom"), 6).as("area"))
      .orderBy("name")
  }

  /** G11: broadcast kNN join — each query point matched to its nearest
    * site. Oracle recomputes the argmin over the cross join in plain
    * SQL (fixture coordinates chosen with no distance ties); round(6)
    * absorbs hypot-vs-sqrt last-ulp differences.
    */
  val g11_nearest: QuerySpec = q("g11_nearest",
    """WITH pts(id, x, y) AS (VALUES (1, 0.3, 0.2), (2, 4.1, 1.3), (3, 2.2, 6.1),
      |                              (4, 8.7, 8.2), (5, 5.5, 5.5), (6, 0.1, 7.9)),
      |sites(sid, sx, sy) AS (VALUES (10, 0.0, 0.0), (20, 5.0, 1.0),
      |                              (30, 2.0, 7.0), (40, 9.0, 9.0)),
      |d AS (SELECT p.id, s.sid,
      |        sqrt((p.x-s.sx)*(p.x-s.sx) + (p.y-s.sy)*(p.y-s.sy)) AS dist
      |      FROM pts p CROSS JOIN sites s),
      |best AS (SELECT id, sid, dist,
      |           row_number() OVER (PARTITION BY id ORDER BY dist, sid) AS rn FROM d)
      |SELECT id, sid AS near_sid, round(dist, 6) AS near_distance
      |FROM best WHERE rn = 1 ORDER BY id""".stripMargin) { (s, _) =>
    import s.implicits._
    val pts = Seq((1, 0.3, 0.2), (2, 4.1, 1.3), (3, 2.2, 6.1),
        (4, 8.7, 8.2), (5, 5.5, 5.5), (6, 0.1, 7.9))
      .toDF("id", "x", "y")
      .withColumn("geom", G.st_point($"x", $"y")).drop("x", "y")
    val sites = Seq((10, 0.0, 0.0), (20, 5.0, 1.0), (30, 2.0, 7.0), (40, 9.0, 9.0))
      .toDF("sid", "sx", "sy")
      .withColumn("sgeom", G.st_point($"sx", $"sy")).drop("sx", "sy")
    graft.operators.NearestJoin.nearestJoin(pts, "geom", sites, "sgeom", k = 1)
      .select($"id", $"near_sid", round($"near_distance", 6).as("near_distance"))
      .orderBy("id")
  }

  /** G12: the grid-partitioned kNN fallback on g11's exact fixture and
    * oracle — the driver hash proves the both-sides-huge path returns
    * the identical answer the broadcast path does (the equivalence the
    * NearestJoinGridSpec pins at scale, made driver-visible). cellSize
    * forces multi-cell search; k=2 exercises the per-cell top-k merge.
    */
  val g12_nearest_grid: QuerySpec = q("g12_nearest_grid",
    """WITH pts(id, x, y) AS (VALUES (1, 0.3, 0.2), (2, 4.1, 1.3), (3, 2.2, 6.1),
      |                              (4, 8.7, 8.2), (5, 5.5, 5.5), (6, 0.1, 7.9)),
      |sites(sid, sx, sy) AS (VALUES (10, 0.0, 0.0), (20, 5.0, 1.0),
      |                              (30, 2.0, 7.0), (40, 9.0, 9.0)),
      |d AS (SELECT p.id, s.sid,
      |        sqrt((p.x-s.sx)*(p.x-s.sx) + (p.y-s.sy)*(p.y-s.sy)) AS dist
      |      FROM pts p CROSS JOIN sites s),
      |best AS (SELECT id, sid, dist,
      |           row_number() OVER (PARTITION BY id ORDER BY dist, sid) AS rn FROM d)
      |SELECT id, sid AS near_sid, round(dist, 6) AS near_distance
      |FROM best WHERE rn <= 2 ORDER BY id, near_distance, near_sid""".stripMargin) { (s, _) =>
    import s.implicits._
    val pts = Seq((1, 0.3, 0.2), (2, 4.1, 1.3), (3, 2.2, 6.1),
        (4, 8.7, 8.2), (5, 5.5, 5.5), (6, 0.1, 7.9))
      .toDF("id", "x", "y")
      .withColumn("geom", G.st_point($"x", $"y")).drop("x", "y")
    val sites = Seq((10, 0.0, 0.0), (20, 5.0, 1.0), (30, 2.0, 7.0), (40, 9.0, 9.0))
      .toDF("sid", "sx", "sy")
      .withColumn("sgeom", G.st_point($"sx", $"sy")).drop("sx", "sy")
    graft.operators.NearestJoin.nearestJoinGrid(pts, "geom", sites, "sgeom", k = 2,
        cellSize = 2.0, numPartitions = 4)
      .select($"id", $"near_sid", round($"near_distance", 6).as("near_distance"))
      .orderBy($"id", $"near_distance", $"near_sid")
  }

  val all: Seq[QuerySpec] = Seq(
    g1_makevalid, g2_dissolve, g3_overlay, g4_erase,
    g5_reproject, g6_parts, g7_sliver_fix, g8_keeplist_roundtrip,
    g9_crs_forward, g10_shapefile_io, g11_nearest, g12_nearest_grid)
}
