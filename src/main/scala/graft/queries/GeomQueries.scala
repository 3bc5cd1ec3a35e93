package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{GeomFunctions => G}
import graft.operators.SpatialOps

/** Geometry-operator queries (SURVEY §2.8/§2.7/§2.9, goldens §2.14).
  *
  * DuckDB cannot oracle JTS geometry, so these are declared WITHOUT
  * oracle SQL → the driver records the weaker rows-only check; the
  * precise semantics are pinned by the ScalaTest goldens G1–G8
  * (`src/test/scala/graft/geom/`). Inputs are inline WKT micro-fixtures
  * (FIXTURES.md §3) — the reference's spatial layers are live ArcGIS
  * services, unreachable offline.
  */
object GeomQueries {

  private def sq(x0: Double, y0: Double, x1: Double, y1: Double): String =
    s"POLYGON(($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"

  private def noOracle(name: String)(body: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, body, None)

  /** OP-44 make-valid over a mixed valid/invalid/null fixture. */
  val g1_makevalid: QuerySpec = noOracle("g1_makevalid") { (s, _) =>
    import s.implicits._
    Seq((1, "POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))"), (2, sq(0, 0, 1, 1)))
      .toDF("id", "wkt")
      .withColumn("geom", G.st_makevalid(G.st_geomfromwkt($"wkt")))
      .select($"id", G.st_isvalid($"geom").as("valid"), G.st_area($"geom").as("area"))
      .orderBy("id")
  }

  /** OP-38 dissolve (geometric group-by union). */
  val g2_dissolve: QuerySpec = noOracle("g2_dissolve") { (s, _) =>
    import s.implicits._
    val df = Seq(("A", sq(0, 0, 1, 1)), ("A", sq(1, 0, 2, 1)),
      ("B", sq(3, 0, 4, 1)), ("B", sq(5, 0, 6, 1)))
      .toDF("key", "wkt").withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    SpatialOps.dissolve(df, Seq("key"))
      .select($"key", G.st_area($"geom").as("area"),
        G.st_numgeometries($"geom").as("nparts"))
      .orderBy("key")
  }

  /** OP-43 full planar overlay union with ''-blank fill. */
  val g3_overlay: QuerySpec = noOracle("g3_overlay") { (s, _) =>
    import s.implicits._
    val a = Seq(("A", sq(0, 0, 2, 2))).toDF("la", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val b = Seq(("B", sq(1, 1, 3, 3))).toDF("lb", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    SpatialOps.overlayUnion(a, b)
      .select($"la", $"lb", G.st_area($"geom").as("area"))
      .orderBy("la", "lb")
  }

  /** OP-42 erase (spatial anti-overlay). */
  val g4_erase: QuerySpec = noOracle("g4_erase") { (s, _) =>
    import s.implicits._
    val counties = Seq(("County1", sq(0, 0, 2, 2)), ("County2", sq(5, 5, 6, 6)))
      .toDF("name", "wkt").withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val cities = Seq(sq(0, 0, 1, 1), sq(5, 5, 6, 6)).toDF("wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    SpatialOps.erase(counties, cities)
      .select($"name", G.st_area($"geom").as("area")).orderBy("name")
  }

  /** OP-45/46 reprojection + equal-area mi² (4326→3310). */
  val g5_reproject: QuerySpec = noOracle("g5_reproject") { (s, _) =>
    import s.implicits._
    Seq(("cell", sq(-120.0, 37.0, -119.0, 38.0))).toDF("name", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt"))
      .select($"name",
        G.st_area_sqmi($"geom", lit(4326)).as("area_sqmi"),
        G.st_aswkt(G.st_transform(G.st_transform($"geom", lit(4326), lit(3310)),
          lit(3310), lit(4326))).as("roundtrip_wkt"))
  }

  /** OP-48/49 part decomposition + predicates. */
  val g6_parts: QuerySpec = noOracle("g6_parts") { (s, _) =>
    import s.implicits._
    Seq("MULTIPOLYGON(((0 0, 100 0, 100 100, 0 100, 0 0)), ((100 0, 105 0, 105 5, 100 5, 100 0)))")
      .toDF("wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt"))
      .select(explode(G.st_dump($"geom")).as("part"))
      .select(G.st_area($"part").as("area"))
      .orderBy("area")
  }

  /** §2.9 coastal sliver fix via flatMapGroups. */
  val g7_sliver_fix: QuerySpec = noOracle("g7_sliver_fix") { (s, _) =>
    import s.implicits._
    val coastal = "MULTIPOLYGON(" +
      "((100 0, 105 0, 105 5, 100 5, 100 0))," +
      "((200 0, 300 0, 300 100, 200 100, 200 0)))"
    val df = Seq((1L, "Alpha", sq(0, 0, 100, 100)), (2L, "Alpha", coastal))
      .toDF("oid", "name", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    SpatialOps.sliverFix(df, "name", "oid", "geom", Seq.empty, 100.0)
      .select($"oid", $"name", G.st_area($"geom").as("area"))
      .orderBy("oid")
  }

  val all: Seq[QuerySpec] = Seq(
    g1_makevalid, g2_dissolve, g3_overlay, g4_erase,
    g5_reproject, g6_parts, g7_sliver_fix)
}
