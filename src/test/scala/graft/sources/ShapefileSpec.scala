package graft.sources

import graft.SparkTestBase
import graft.geom.{GeomFunctions => G}
import org.apache.spark.sql.functions._

/** Shapefile source: spec-conformant fixture with a holed polygon and
  * dBASE attributes.
  */
class ShapefileSpec extends SparkTestBase {

  private def base: String =
    getClass.getResource("/shapefile/test.shp").getPath.stripSuffix(".shp")

  test("reads polygons with holes and typed dbf attributes") {
    val df = Shapefile.read(spark, base)
      .withColumn("area", G.st_area(col("geom")))
      .withColumn("valid", G.st_isvalid(col("geom")))
    val rows = df.orderBy("NAME").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("NAME") == "Alpha")
    assert(rows(0).getAs[Double]("AREA_KM") == 96.0)           // N field -> double
    assert(math.abs(rows(0).getAs[Double]("area") - 96.0) < 1e-9) // 100 - 4 hole
    assert(rows(0).getAs[Boolean]("valid"))
    assert(rows(1).getAs[String]("NAME") == "Beta")
    assert(math.abs(rows(1).getAs[Double]("area") - 1.0) < 1e-9)
  }

  test("shapefile geometries flow into the spatial operators") {
    val df = Shapefile.read(spark, base)
    val dissolved = graft.operators.SpatialOps.dissolve(
      df.withColumn("k", lit("all")), Seq("k"))
    val area = dissolved.select(G.st_area(col("geom"))).collect()(0).getDouble(0)
    assert(math.abs(area - 97.0) < 1e-9) // 96 + 1, disjoint multipart union
  }
}
