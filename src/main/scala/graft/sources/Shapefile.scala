package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, Polygon}
import org.locationtech.jts.algorithm.Orientation
import scala.collection.mutable.ArrayBuffer

import graft.geom.GeomCodec

/** ESRI Shapefile reader (.shp polygons + .dbf attributes), implemented
  * from the published spec (ESRI Shapefile Technical Description,
  * July 1998; dBASE III header layout). The reference's ecosystem
  * exchanges data in exactly this format, so the "complete engine"
  * reads it natively — no GDAL/GeoTools in the jars.
  *
  * Driver-side parse + parallelize, sized for source-ingest layers
  * (boundary files are ≤ tens of MB); a shapefile *lake* at scale
  * would list files and parse inside mapPartitions with this same
  * record parser.
  */
object Shapefile {

  /** Read `base.shp` + `base.dbf` into a DataFrame: one column per
    * dbf field (C→string, N/F→double, L→boolean, else string) plus
    * `geom` WKB.
    */
  def read(spark: SparkSession, base: String): DataFrame = {
    val geoms = readShp(s"$base.shp")
    val (fields, allAttrs, live) = readDbfRaw(s"$base.dbf")
    require(geoms.length == allAttrs.length,
      s".shp has ${geoms.length} records but .dbf has ${allAttrs.length}")
    val schema = StructType(fields :+ StructField("geom", BinaryType, nullable = true))
    // records flagged deleted in the .dbf drop together with their
    // positional .shp twin — dBASE deletion is logical, the .shp record
    // is still physically present
    val rows = allAttrs.zip(geoms).zip(live).collect { case ((a, g), true) =>
      Row.fromSeq(a :+ (if (g == null) null else GeomCodec.write(g)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** .shp: 100-byte header then length-prefixed records. Supports
    * Polygon (5) and the null shape (0).
    */
  def readShp(path: String): Seq[Geometry] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, s"$path: not a shapefile (bad magic)")
    val fileWords = buf.getInt(24)                      // length in 16-bit words
    val out = new ArrayBuffer[Geometry]
    var pos = 100
    while (pos < fileWords * 2) {
      val contentWords = buf.getInt(pos + 4)            // record header: num, length (BE)
      val content = ByteBuffer.wrap(bytes, pos + 8, contentWords * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      out += parsePolygonRecord(content)
      pos += 8 + contentWords * 2
    }
    out.toSeq
  }

  private def parsePolygonRecord(b: ByteBuffer): Geometry = {
    val gf = GeomCodec.factory
    b.getInt match {                                    // shape type (LE)
      case 0 => null                                    // null shape
      case 5 =>
        b.position(b.position() + 32)                   // skip bbox
        val numParts = b.getInt
        val numPoints = b.getInt
        val parts = Array.fill(numParts)(b.getInt)
        val pts = Array.fill(numPoints)(new Coordinate(b.getDouble, b.getDouble))
        val rings = (0 until numParts).map { i =>
          val from = parts(i)
          val until = if (i + 1 < numParts) parts(i + 1) else numPoints
          gf.createLinearRing(pts.slice(from, until))
        }
        // spec: clockwise rings are shells, counter-clockwise are holes;
        // attach each hole to the first shell containing it
        val (holes, shells) = rings.partition(r => Orientation.isCCW(r.getCoordinateSequence))
        val polys = shells.map { shell =>
          val myHoles = holes.filter(h =>
            gf.createPolygon(shell).contains(gf.createPoint(h.getCoordinateN(0))))
          gf.createPolygon(shell, myHoles.toArray)
        }
        if (polys.isEmpty && holes.nonEmpty)            // degenerate: all-CCW writer
          gf.createPolygon(holes.head)
        else if (polys.size == 1) polys.head
        else gf.createMultiPolygon(polys.toArray)
      case other => throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  /** .dbf: dBASE III — 32-byte field descriptors, fixed-width ASCII
    * records with a deletion-flag byte. Records flagged deleted
    * (0x2A '*') are dropped.
    */
  def readDbf(path: String): (Seq[StructField], Seq[Seq[Any]]) = {
    val (schema, rows, live) = readDbfRaw(path)
    (schema, rows.zip(live).collect { case (r, true) => r })
  }

  /** All records plus a liveness mask, so [[read]] can drop the .shp
    * twin of a deleted .dbf record by position.
    */
  private def readDbfRaw(path: String): (Seq[StructField], Seq[Seq[Any]], Seq[Boolean]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff

    final case class DbfField(name: String, typ: Char, len: Int)
    val fields = new ArrayBuffer[DbfField]
    var fp = 32
    while (fp < headerSize - 1 && bytes(fp) != 0x0d) {
      val name = new String(bytes, fp, 11, "ASCII").takeWhile(_ != 0).trim
      val typ = bytes(fp + 11).toChar
      val len = bytes(fp + 16) & 0xff
      fields += DbfField(name, typ, len)
      fp += 32
    }

    def sparkType(t: Char): DataType = t match {
      case 'N' | 'F' => DoubleType
      case 'L'       => BooleanType
      case _         => StringType
    }
    val schema = fields.map(f => StructField(f.name, sparkType(f.typ), nullable = true)).toSeq

    val live = (0 until numRecords).map(r => bytes(headerSize + r * recordSize) != 0x2a)
    val rows = (0 until numRecords).map { r =>
      var off = headerSize + r * recordSize + 1         // +1 deletion flag
      fields.map { f =>
        val raw = new String(bytes, off, f.len, "ASCII").trim
        off += f.len
        if (raw.isEmpty) null
        else f.typ match {
          case 'N' | 'F' => try java.lang.Double.valueOf(raw) catch { case _: Throwable => null }
          case 'L'       => java.lang.Boolean.valueOf(raw == "T" || raw == "Y" || raw == "t" || raw == "y")
          case _         => raw
        }
      }.toSeq
    }
    (schema, rows, live)
  }
}
