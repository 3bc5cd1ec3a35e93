package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geom.GeomCodec

/** Output sinks (OP-05 `retrieve.py:44,132`, OP-10 publish artifacts).
  *
  * `writeCsv` is the distributed path (one file per partition);
  * `writeCsvSingle` coalesces for the reference's single-file parity —
  * only for small result tables, never for bulk data. `writeGeoJson`
  * renders a FeatureCollection from a WKB geometry column: the publish
  * artifact the reference's ArcGIS upload step consumes.
  */
object Writers {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeCsvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** GeoJSON FeatureCollection: geometry from WKB, all other columns as
    * properties. Executors render feature fragments in parallel
    * (toLocalIterator streams them); the driver only stitches the
    * envelope — fine for publish-sized layers.
    */
  def writeGeoJson(df: DataFrame, geomCol: String, path: String): Unit = {
    val props = df.columns.filterNot(_ == geomCol)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    val fragments = df.select(
      (props.map(col) :+ col(geomCol).as("__geom")): _*)

    val out = Files.newBufferedWriter(Paths.get(path),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      out.write("""{"type":"FeatureCollection","features":[""")
      var first = true
      val it = fragments.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val node = mapper.createObjectNode()
        node.put("type", "Feature")
        val propsNode = node.putObject("properties")
        props.zipWithIndex.foreach { case (p, i) =>
          row.get(i) match {
            case null       => propsNode.putNull(p)
            case v: String  => propsNode.put(p, v)
            case v: Long    => propsNode.put(p, v)
            case v: Int     => propsNode.put(p, v)
            case v: Double  => propsNode.put(p, v)
            case v: Boolean => propsNode.put(p, v)
            case v          => propsNode.put(p, v.toString)
          }
        }
        val wkb = row.getAs[Array[Byte]](props.length)
        val geomJson =
          if (wkb == null) "null" else geoJsonGeometry(GeomCodec.read(wkb))
        if (!first) out.write(",")
        first = false
        out.write(node.toString.dropRight(1) + s""","geometry":$geomJson}""")
      }
      out.write("]}")
    } finally out.close()
  }

  /** Read a GeoJSON FeatureCollection file back as a DataFrame (every
    * property a string column + `geom` WKB) — the round-trip of
    * [[writeGeoJson]] and the same parser the feature-service scan
    * uses. Driver-side parse: GeoJSON artifacts are publish-sized by
    * design (the 100 TB interchange format is parquet).
    */
  def readGeoJson(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val features = FeatureService.parsePage(new String(
      Files.readAllBytes(Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
    val columns = features.flatMap(_._1.keys).distinct.sorted
    FeatureService.toDataFrame(spark, features, columns)
  }

  /** JTS Polygon/MultiPolygon → GeoJSON geometry text. */
  def geoJsonGeometry(g: org.locationtech.jts.geom.Geometry): String = {
    def ring(r: org.locationtech.jts.geom.LineString): String =
      r.getCoordinates.map(c => s"[${c.x},${c.y}]").mkString("[", ",", "]")
    def poly(p: org.locationtech.jts.geom.Polygon): String = {
      val rings = (Seq(p.getExteriorRing) ++
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN)).map(ring)
      rings.mkString("[", ",", "]")
    }
    g match {
      case p: org.locationtech.jts.geom.Polygon =>
        s"""{"type":"Polygon","coordinates":${poly(p)}}"""
      case mp: org.locationtech.jts.geom.MultiPolygon =>
        val polys = (0 until mp.getNumGeometries)
          .map(i => poly(mp.getGeometryN(i).asInstanceOf[org.locationtech.jts.geom.Polygon]))
        s"""{"type":"MultiPolygon","coordinates":${polys.mkString("[", ",", "]")}}"""
      case other =>
        throw new IllegalArgumentException(s"unsupported geometry ${other.getGeometryType}")
    }
  }
}
