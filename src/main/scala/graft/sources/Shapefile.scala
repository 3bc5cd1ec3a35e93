package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.{Configuration => HadoopConf}
import org.apache.hadoop.fs.{Path => HPath}

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
  * Two scan paths share one record parser: [[read]] parses a single
  * base driver-side (sized for source-ingest boundary layers, ≤ tens
  * of MB), and [[readDir]] scans a directory of shapefiles
  * distributed — one executor task per file, the driver touching only
  * the file listing and one .dbf header.
  */
object Shapefile {

  /** One file's live rows, parsed with the shared record parser —
    * the per-task unit of both [[read]] and [[readDir]].
    */
  private def fileRows(base: String, conf: HadoopConf): Seq[Row] = {
    val geoms = readShp(s"$base.shp", conf)
    val (_, allAttrs, live) = readDbfRaw(s"$base.dbf", conf)
    require(geoms.length == allAttrs.length,
      s"$base.shp has ${geoms.length} records but .dbf has ${allAttrs.length}")
    // records flagged deleted in the .dbf drop together with their
    // positional .shp twin — dBASE deletion is logical, the .shp record
    // is still physically present
    allAttrs.zip(geoms).zip(live).collect { case ((a, g), true) =>
      Row.fromSeq(a :+ (if (g == null) null else GeomCodec.write(g)))
    }
  }

  /** Read `base.shp` + `base.dbf` into a DataFrame: one column per
    * dbf field (C→string, N/F→double, L→boolean, else string) plus
    * `geom` WKB.
    */
  def read(spark: SparkSession, base: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val schema = StructType(
      readDbfSchema(s"$base.dbf", conf) :+ StructField("geom", BinaryType, nullable = true))
    spark.createDataFrame(
      spark.sparkContext.parallelize(fileRows(base, conf), 1), schema)
  }

  /** Rebuildable Hadoop configuration: `Configuration` itself is not
    * serializable, so the driver captures the session's entries and
    * each task rebuilds — the same filesystem credentials/settings
    * Spark's own sources use, for any scheme (file://, hdfs://, s3a://).
    */
  private def confEntries(conf: HadoopConf): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    conf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  private def rebuildConf(entries: Map[String, String]): HadoopConf = {
    val c = new HadoopConf()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Distributed scan of a DIRECTORY of shapefiles (a shapefile lake):
    * the driver only LISTS the `.shp` bases and reads one .dbf HEADER
    * for the schema; each executor task then parses whole files with
    * the same record parser `read` uses — bytes never pass through the
    * driver, and parallelism is one task per file (a shapefile caps at
    * 2 GB, so a file is a bounded work unit). Every member must share
    * the schema (verified per task, not just on the probe file).
    */
  def readDir(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dirPath = new HPath(dir)
    val fs = dirPath.getFileSystem(conf)
    val bases = fs.listStatus(dirPath).iterator
      .map(_.getPath.toString).filter(_.endsWith(".shp"))
      .map(_.stripSuffix(".shp")).toSeq.sorted
    require(bases.nonEmpty, s"no .shp files under $dir")
    val probe = readDbfSchema(s"${bases.head}.dbf", conf)
    val schema = StructType(probe :+ StructField("geom", BinaryType, nullable = true))
    val names = probe.map(f => f.name -> f.dataType)
    val entries = confEntries(conf)
    val rdd = spark.sparkContext.parallelize(bases, bases.length).flatMap { base =>
      val taskConf = rebuildConf(entries)
      val fields = readDbfSchema(s"$base.dbf", taskConf).map(f => f.name -> f.dataType)
      require(fields == names,
        s"$base.dbf schema $fields differs from ${bases.head}: $names")
      fileRows(base, taskConf)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Whole file through the Hadoop FS API (the format caps at 2 GB, so
    * a full-file byte array is a bounded task unit by spec).
    */
  private def readFully(path: String, conf: HadoopConf): Array[Byte] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"$path exceeds the 2 GB shapefile limit")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    bytes
  }

  /** .shp: 100-byte header then length-prefixed records. Supports
    * Point (1), PolyLine (3), Polygon (5), MultiPoint (8) and the null
    * shape (0) — every 2D type the spec defines. M/Z variants are not
    * emitted by the reference's ecosystem exports and raise.
    */
  def readShp(path: String, conf: HadoopConf = new HadoopConf()): Seq[Geometry] = {
    val bytes = readFully(path, conf)
    // Hostile-file policy (SourceChaosProbe): a corrupt FILE — unlike a
    // corrupt row — is a whole ingestion unit; it must fail LOUDLY with
    // the path and offset, never parse garbage into the pipeline and
    // never surface as an opaque IndexOutOfBounds from ByteBuffer.
    require(bytes.length >= 100,
      s"$path: ${bytes.length} bytes — shorter than the 100-byte shapefile header")
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, s"$path: not a shapefile (bad magic)")
    val fileWords = buf.getInt(24)                      // length in 16-bit words
    // the header's declared length is authoritative (ESRI spec).
    // LONGER than the file = truncated download, fatal. SHORTER =
    // trailing bytes past the declared length: real-world exporters
    // occasionally pad, and lenient readers (and this one before r19)
    // stop at the declared length — downgrade to a logged warning and
    // parse exactly the declared extent, so benign padding neither
    // kills ingestion nor gets parsed as phantom records (r18 advisor)
    val declared = fileWords.toLong * 2
    // a declared length below the header's own 100 bytes (incl. a
    // negative fileWords) is corruption, not padding — without this
    // leg a doctored fileWords=0 would silently parse ZERO records
    // under the lenient policy (r19 review finding)
    require(declared >= 100,
      s"$path: header declares $declared bytes — less than the 100-byte " +
        "header itself (corrupt length field)")
    require(declared <= bytes.length,
      s"$path: header declares $declared bytes but the file has " +
        s"${bytes.length} — truncated file")
    // the tolerated slack is BOUNDED below one minimal record (8-byte
    // record header + 4-byte shape type = 12 bytes): real exporter
    // padding is a few alignment bytes, while a corrupted/doctored
    // length field that cuts off whole trailing records produces
    // record-sized slack — unbounded leniency would silently DROP that
    // data with only a log line (r19 advisor). At 12+ bytes of slack
    // the mismatch is corruption, not padding, and stays fatal.
    val slack = bytes.length - declared
    require(slack < 12,
      s"$path: header declares $declared bytes but the file has " +
        s"${bytes.length} — the $slack trailing bytes are at least one " +
        "whole record; the declared length cuts off trailing records " +
        "(corrupt length field, not exporter padding)")
    if (slack > 0)
      org.slf4j.LoggerFactory.getLogger("graft.sources.Shapefile").warn(
        s"$path: $slack trailing bytes past the header-declared " +
          s"$declared — ignored (benign sub-record padding policy)")
    val end = declared.toInt
    val out = new ArrayBuffer[Geometry]
    var pos = 100
    while (pos < end) {
      require(pos + 8 <= end,
        s"$path: truncated record header at offset $pos (record ${out.length + 1})")
      val contentWords = buf.getInt(pos + 4)            // record header: num, length (BE)
      // minimum record content is the 4-byte shape type (2 words); a
      // negative or overrunning length is a torn or doctored file
      require(contentWords >= 2 &&
          pos + 8 + contentWords.toLong * 2 <= end,
        s"$path: record ${out.length + 1} at offset $pos declares " +
          s"$contentWords content words — overruns the $end-byte declared extent")
      val content = ByteBuffer.wrap(bytes, pos + 8, contentWords * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      // context wrapper for EVERY record-parse failure — unsupported
      // shape type, JTS ring rejection, count guards, a bounded view
      // too short for its own shape type (BufferUnderflow): the loud
      // policy requires the file, record number and offset, whatever
      // the inner error class (r18 review: a token-filtered wrapper
      // let 'unsupported shape type' and JTS errors escape pathless)
      out += (try parseRecord(content) catch {
        case e: java.nio.BufferUnderflowException =>
          throw new IllegalArgumentException(
            s"$path: record ${out.length + 1} at offset $pos: content " +
              s"($contentWords words) too short for its shape type", e)
        case e: Exception =>
          // e.toString when the message is null: "record 1 at offset
          // 100: null" would carry the context but erase the defect
          throw new IllegalArgumentException(
            s"$path: record ${out.length + 1} at offset $pos: " +
              (if (e.getMessage != null) e.getMessage else e.toString), e)
      })
      pos += 8 + contentWords * 2
    }
    out.toSeq
  }

  /** (parts[], points[]) for the poly types' shared record layout. */
  private def readPartedPoints(b: ByteBuffer): (Array[Int], Array[Coordinate]) = {
    b.position(b.position() + 32)                       // skip bbox
    val numParts = b.getInt
    val numPoints = b.getInt
    // negative counts would make Array.fill return EMPTY silently and
    // the remaining content parse as garbage coordinates — the bounded
    // record view can't catch that (everything stays in-bounds); the
    // size check below turns an overrunning count into a loud error
    // instead of a BufferUnderflow deep in a coordinate read
    require(numParts >= 0 && numPoints >= 0,
      s"corrupt shapefile record: negative counts numParts=$numParts numPoints=$numPoints")
    require(4L * numParts + 16L * numPoints <= b.remaining(),
      s"corrupt shapefile record: numParts=$numParts numPoints=$numPoints need " +
        s"${4L * numParts + 16L * numPoints} bytes but only ${b.remaining()} remain")
    val parts = Array.fill(numParts)(b.getInt)
    val pts = Array.fill(numPoints)(new Coordinate(b.getDouble, b.getDouble))
    (parts, pts)
  }

  private def parseRecord(b: ByteBuffer): Geometry = {
    val gf = GeomCodec.factory
    b.getInt match {                                    // shape type (LE)
      case 0 => null                                    // null shape
      case 1 =>                                         // Point
        gf.createPoint(new Coordinate(b.getDouble, b.getDouble))
      case 8 =>                                         // MultiPoint
        b.position(b.position() + 32)                   // skip bbox
        val n = b.getInt
        require(n >= 0 && 16L * n <= b.remaining(),
          s"corrupt shapefile record: numPoints=$n needs ${16L * n} bytes " +
            s"but only ${b.remaining()} remain")
        val pts = Array.fill(n)(new Coordinate(b.getDouble, b.getDouble))
        if (n == 1) gf.createPoint(pts(0))
        else gf.createMultiPoint(pts.map(gf.createPoint))
      case 3 =>                                         // PolyLine
        val (parts, pts) = readPartedPoints(b)
        val lines = parts.indices.map { i =>
          val from = parts(i)
          val until = if (i + 1 < parts.length) parts(i + 1) else pts.length
          gf.createLineString(pts.slice(from, until))
        }
        if (lines.size == 1) lines.head
        else gf.createMultiLineString(lines.toArray)
      case 5 =>                                         // Polygon
        val (parts, pts) = readPartedPoints(b)
        val rings = parts.indices.map { i =>
          val from = parts(i)
          val until = if (i + 1 < parts.length) parts(i + 1) else pts.length
          gf.createLinearRing(pts.slice(from, until))
        }
        // spec: clockwise rings are shells, counter-clockwise are holes.
        // Each hole attaches to its INNERMOST containing shell — "every
        // shell containing the test vertex" duplicated an island's pond
        // into the outer landmass in nested records (island-in-lake),
        // and the containment test is on the shell RING with boundary
        // counted as inside (JTS Polygon.contains rejects a hole whose
        // test vertex touches the shell — legal in valid polygons — and
        // would silently fill it). A hole no shell contains is a broken
        // all-CCW writer's shell in disguise: promote it instead of
        // dropping it (the old fallback kept only the FIRST such ring).
        val (holes, shells) = rings.partition(r => Orientation.isCCW(r.getCoordinateSequence))
        val shellHoles = Array.fill(shells.length)(ArrayBuffer.empty[LinearRing])
        val promoted = ArrayBuffer.empty[LinearRing]
        holes.foreach { h =>
          val p = h.getCoordinateN(0)
          val containing = shells.indices.filter { i =>
            org.locationtech.jts.algorithm.RayCrossingCounter
              .locatePointInRing(p, shells(i).getCoordinateSequence) !=
              org.locationtech.jts.geom.Location.EXTERIOR
          }
          if (containing.isEmpty) promoted += h
          else shellHoles(containing.minBy(i => org.locationtech.jts.algorithm.Area
            .ofRing(shells(i).getCoordinateSequence))) += h
        }
        val polys = shells.indices.map(i =>
          gf.createPolygon(shells(i), shellHoles(i).toArray)) ++
          promoted.map(gf.createPolygon(_))
        if (polys.isEmpty) gf.createPolygon()
        else if (polys.size == 1) polys.head
        else gf.createMultiPolygon(polys.toArray)
      case other => throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  // --- writer ---------------------------------------------------------

  /** Write a DataFrame as `base.shp` + `base.shx` + `base.dbf`
    * (driver-side collect — shapefile is a publish format for final
    * layers, reference-ecosystem interchange, not a lake format; the
    * format itself caps at 2 GB). Geometry type is inferred from the
    * rows: points → 1, (multi)linestrings → 3, (multi)polygons → 5,
    * multipoints → 8; null geometries become null-shape records.
    */
  def write(df: org.apache.spark.sql.DataFrame, base: String, geomCol: String = "geom",
      maxRows: Int = 1_000_000): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    // collect bounded at maxRows + 1, so a lake-scale frame pointed at a
    // publish sink fails with instructions instead of an
    // executor-to-driver OOM (the NearestJoin maxResidualRows pattern);
    // the +1 row is only fetched to DETECT overflow, never written.
    // (maxRows = Int.MaxValue means "no cap" — the +1 must not wrap.)
    val probeN = if (maxRows == Int.MaxValue) maxRows else maxRows + 1
    val rows = df.limit(probeN).collect()
    require(rows.length <= maxRows,
      s"Shapefile.write collected more than maxRows=$maxRows rows — " +
        "shapefile is a driver-side publish format (the format itself caps " +
        "at 2 GB), not a lake sink. Aggregate or filter the layer to " +
        "publish size first, write parquet for bulk data, or raise maxRows " +
        "if the layer genuinely fits.")
    val geoms = rows.map { r =>
      val wkb = r.getAs[Array[Byte]](geomIdx)
      if (wkb == null) null else GeomCodec.read(wkb)
    }

    val shapeType = {
      val kinds = geoms.filter(_ != null).map {
        case _: org.locationtech.jts.geom.Point => 1
        case _: org.locationtech.jts.geom.MultiPoint => 8
        case _: org.locationtech.jts.geom.LineString => 3
        case _: org.locationtech.jts.geom.MultiLineString => 3
        case _: Polygon => 5
        case _: org.locationtech.jts.geom.MultiPolygon => 5
        case g => throw new IllegalArgumentException(s"unsupported geometry ${g.getGeometryType}")
      }.distinct
      require(kinds.length <= 1 || kinds.toSet == Set(1, 8),
        s"mixed geometry types ${kinds.mkString(",")} — a shapefile holds one type")
      if (kinds.isEmpty) 0 else if (kinds.contains(8)) 8 else kinds.head
    }

    val contents = geoms.map(g => if (g == null) nullRecord() else recordBytes(g, shapeType))
    // ALL THREE members are built in memory before ANY file is written
    // (r19 writer-side no-torn-artifact contract): a validation failure
    // in the .dbf builder (field width, record size) used to land AFTER
    // .shp/.shx were already on disk — a torn trio at the published
    // base. Each member then promotes via sibling-temp + atomic rename,
    // so a mid-write kill can tear no individual file either. (A kill
    // BETWEEN promotes can still leave a mixed old/new trio when
    // overwriting an existing base — full trio atomicity needs a
    // directory swap, out of scope; each file is individually complete.)
    val (shpBytes, shxBytes) = buildShpShx(shapeType, geoms, contents)
    val dbfBytes = buildDbf(
      schema.fields.zipWithIndex.filter(_._1.name != geomCol), rows)
    AtomicFiles.write(Paths.get(s"$base.shp"), shpBytes)
    AtomicFiles.write(Paths.get(s"$base.shx"), shxBytes)
    AtomicFiles.write(Paths.get(s"$base.dbf"), dbfBytes)
  }

  private def nullRecord(): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0)
    b.array()
  }

  private def ringCoords(ring: org.locationtech.jts.geom.LinearRing, wantCCW: Boolean): Array[Coordinate] = {
    val cs = ring.getCoordinates
    if (Orientation.isCCW(ring.getCoordinateSequence) == wantCCW) cs else cs.reverse
  }

  private def recordBytes(g: Geometry, shapeType: Int): Array[Byte] = {
    val gf = GeomCodec.factory
    def env = g.getEnvelopeInternal
    shapeType match {
      case 1 =>
        val b = ByteBuffer.allocate(4 + 16).order(ByteOrder.LITTLE_ENDIAN)
        val c = g.getCoordinate
        b.putInt(1).putDouble(c.x).putDouble(c.y)
        b.array()
      case 8 =>
        val pts = g.getCoordinates
        val b = ByteBuffer.allocate(4 + 32 + 4 + 16 * pts.length).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(8).putDouble(env.getMinX).putDouble(env.getMinY)
          .putDouble(env.getMaxX).putDouble(env.getMaxY).putInt(pts.length)
        pts.foreach(c => b.putDouble(c.x).putDouble(c.y))
        b.array()
      case 3 | 5 =>
        // part coordinate arrays: lines as-is; polygon shells CW,
        // holes CCW per the spec's orientation rule
        val parts: Seq[Array[Coordinate]] =
          (0 until g.getNumGeometries).flatMap { i =>
            g.getGeometryN(i) match {
              case p: Polygon =>
                ringCoords(p.getExteriorRing, wantCCW = false) +:
                  (0 until p.getNumInteriorRing).map(h =>
                    ringCoords(p.getInteriorRingN(h), wantCCW = true))
              case l: org.locationtech.jts.geom.LineString => Seq(l.getCoordinates)
              case other =>
                throw new IllegalArgumentException(s"unexpected part ${other.getGeometryType}")
            }
          }
        val totalPts = parts.map(_.length).sum
        val b = ByteBuffer.allocate(4 + 32 + 8 + 4 * parts.length + 16 * totalPts)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(shapeType).putDouble(env.getMinX).putDouble(env.getMinY)
          .putDouble(env.getMaxX).putDouble(env.getMaxY)
          .putInt(parts.length).putInt(totalPts)
        parts.scanLeft(0)(_ + _.length).dropRight(1).foreach(b.putInt)
        parts.foreach(_.foreach(c => b.putDouble(c.x).putDouble(c.y)))
        b.array()
    }
  }

  private def buildShpShx(
      shapeType: Int,
      geoms: Array[Geometry], contents: Array[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    val totalContent = contents.map(_.length).sum
    val shpLen = 100 + 8 * contents.length + totalContent
    val shp = ByteBuffer.allocate(shpLen)
    val shx = ByteBuffer.allocate(100 + 8 * contents.length)

    // ONE bbox fold, outside header(): header runs twice (shp + shx)
    // and the old per-call four-pass min/max over fresh envelopes
    // scanned a 1M-geometry layer eight times for two identical
    // 32-byte header fields (r20 review)
    val bbox = {
      var minX = 0.0; var minY = 0.0; var maxX = 0.0; var maxY = 0.0
      var seen = false
      geoms.foreach { g =>
        if (g != null) {
          val e = g.getEnvelopeInternal
          if (!seen) { minX = e.getMinX; minY = e.getMinY
            maxX = e.getMaxX; maxY = e.getMaxY; seen = true }
          else {
            if (e.getMinX < minX) minX = e.getMinX
            if (e.getMinY < minY) minY = e.getMinY
            if (e.getMaxX > maxX) maxX = e.getMaxX
            if (e.getMaxY > maxY) maxY = e.getMaxY
          }
        }
      }
      (minX, minY, maxX, maxY)
    }
    def header(b: ByteBuffer, fileLenBytes: Int): Unit = {
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(0, 9994)
      b.putInt(24, fileLenBytes / 2)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(28, 1000)
      b.putInt(32, shapeType)
      b.putDouble(36, bbox._1).putDouble(44, bbox._2)
        .putDouble(52, bbox._3).putDouble(60, bbox._4)
      // Z/M ranges (68..99) stay zero
    }
    header(shp, shpLen)
    header(shx, 100 + 8 * contents.length)

    shp.position(100)
    shx.position(100)
    var offsetWords = 50
    contents.zipWithIndex.foreach { case (c, i) =>
      shp.order(ByteOrder.BIG_ENDIAN).putInt(i + 1).putInt(c.length / 2)
      shp.put(c)
      shx.order(ByteOrder.BIG_ENDIAN).putInt(offsetWords).putInt(c.length / 2)
      offsetWords += 4 + c.length / 2
    }
    (shp.array(), shx.array())
  }

  private def buildDbf(
      fields: Array[(StructField, Int)],
      rows: Array[org.apache.spark.sql.Row]): Array[Byte] = {
    final case class Fld(name: String, typ: Char, len: Int, dec: Int, idx: Int)
    def numText(v: Any, dec: Int): String = v match {
      case null => ""
      // Locale.ROOT: the f interpolator formats with the JVM default
      // locale, so a comma-decimal locale (de_DE) would write '3,14'
      // into the N field and corrupt every numeric column
      case x: java.lang.Number if dec > 0 =>
        String.format(java.util.Locale.ROOT, "%.8f", x.doubleValue())
      case x => x.toString
    }
    val flds = fields.map { case (f, idx) =>
      def maxLen(dec: Int): Int =
        rows.map(r => if (r.isNullAt(idx)) 0 else numText(r.get(idx), dec).length)
          .foldLeft(1)(math.max)
      f.dataType match {
        case StringType =>
          val w = math.max(1, math.min(254,
            rows.map(r => if (r.isNullAt(idx)) 0 else r.getAs[String](idx).length).foldLeft(1)(math.max)))
          Fld(f.name.take(10), 'C', w, 0, idx)
        case BooleanType => Fld(f.name.take(10), 'L', 1, 0, idx)
        // numeric widths sized from the actual formatted values (never
        // silently truncate a number — Long.MinValue is 20 chars, large
        // doubles at %.8f exceed a fixed 19)
        case IntegerType | LongType =>
          Fld(f.name.take(10), 'N', math.max(19, maxLen(0)), 0, idx)
        case _: org.apache.spark.sql.types.NumericType =>
          Fld(f.name.take(10), 'N', math.max(19, maxLen(8)), 8, idx)
        case _ =>
          // dates, timestamps, and anything else non-numeric write as
          // character fields via toString: the old numeric catch-all
          // mapped them to 'N' and the row writer then died in
          // toString.toDouble with an opaque NumberFormatException on
          // the first date column (r20 review). dBASE 'C' round-trips
          // readDbf as the string the value printed as.
          val w = math.max(1, math.min(254,
            rows.map(r => if (r.isNullAt(idx)) 0 else r.get(idx).toString.length)
              .foldLeft(1)(math.max)))
          Fld(f.name.take(10), 'C', w, 0, idx)
      }
    }
    flds.foreach(f => require(f.len <= 254,
      s"dbf field ${f.name} needs width ${f.len} (> 254, the dBASE limit)"))
    val recordSize = 1 + flds.map(_.len).sum
    // dBASE stores record size as UNSIGNED 16-bit; ~129 max-width fields
    // push it past 32767 and putShort would silently wrap negative,
    // emitting a corrupt .dbf (the per-field check above can't see this)
    require(recordSize <= 0xFFFF,
      s"dbf record size $recordSize exceeds 65535 (unsigned 16-bit dBASE limit); " +
        "drop or narrow columns")
    val headerSize = 32 + 32 * flds.length + 1
    val out = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0, 0x03.toByte)
    out.put(1, 95.toByte); out.put(2, 7.toByte); out.put(3, 26.toByte) // fixed date: deterministic output
    out.put(29, 0x57.toByte)  // language driver: ANSI/Latin-1 (we encode ISO-8859-1)
    out.putInt(4, rows.length)
    out.putShort(8, headerSize.toShort)
    out.putShort(10, recordSize.toShort)
    var fp = 32
    flds.foreach { f =>
      val nameBytes = f.name.getBytes("ISO-8859-1")
      var i = 0
      while (i < math.min(10, nameBytes.length)) { out.put(fp + i, nameBytes(i)); i += 1 }
      out.put(fp + 11, f.typ.toByte)
      out.put(fp + 16, f.len.toByte)
      out.put(fp + 17, f.dec.toByte)
      fp += 32
    }
    out.put(fp, 0x0d.toByte)
    out.position(headerSize)
    def pad(s: String, len: Int, left: Boolean): String = {
      // left-justified C fields truncate (dBASE semantics for text);
      // numeric fields are pre-sized to their longest value, so an
      // overflow here is a bug — fail loudly rather than write a
      // silently wrong number
      require(left == false || s.length <= len,
        s"numeric value '$s' exceeds dbf field width $len")
      val t = if (s.length > len) s.take(len) else s
      if (left) (" " * (len - t.length)) + t else t + (" " * (len - t.length))
    }
    rows.foreach { r =>
      out.put(' '.toByte)                                // live record flag
      flds.foreach { f =>
        val s =
          if (r.isNullAt(f.idx)) " " * f.len
          else f.typ match {
            case 'C' => pad(r.get(f.idx).toString, f.len, left = false)
            case 'L' => if (r.getAs[Boolean](f.idx)) "T" else "F"
            case 'N' if f.dec == 0 => pad(r.get(f.idx).toString, f.len, left = true)
            case 'N' =>
              val d = r.get(f.idx) match {
                case x: java.lang.Number => x.doubleValue()
                case x => x.toString.toDouble
              }
              pad(String.format(java.util.Locale.ROOT, "%.8f", d), f.len, left = true)
          }
        // ISO-8859-1, not ASCII: ASCII getBytes replaces every
        // non-ASCII char with '?', silently corrupting place names
        // ("Cañada" → "Ca?ada") in the published artifact; Latin-1 is
        // the single-byte dBASE convention and round-trips readDbf
        s.getBytes("ISO-8859-1").foreach(out.put)
      }
    }
    out.put(0x1a.toByte)                                 // EOF
    out.array()
  }

  /** .dbf: dBASE III — 32-byte field descriptors, fixed-width ASCII
    * records with a deletion-flag byte. Records flagged deleted
    * (0x2A '*') are dropped.
    */
  def readDbf(path: String, conf: HadoopConf = new HadoopConf()): (Seq[StructField], Seq[Seq[Any]]) = {
    val (schema, rows, live) = readDbfRaw(path, conf)
    (schema, rows.zip(live).collect { case (r, true) => r })
  }

  private final case class DbfField(name: String, typ: Char, len: Int)

  private def parseFieldDescriptors(bytes: Array[Byte], headerSize: Int): Seq[DbfField] = {
    val fields = new ArrayBuffer[DbfField]
    var fp = 32
    while (fp < headerSize - 1 && bytes(fp) != 0x0d) {
      // a header size that is not 32 + 32·k + 1 leaves a partial
      // descriptor before the terminator — reading it would index past
      // the header (opaque AIOOBE on a doctored file)
      require(fp + 32 <= headerSize - 1,
        s"malformed dBASE header: partial field descriptor at offset $fp " +
          s"(header size $headerSize)")
      val name = new String(bytes, fp, 11, "ISO-8859-1").takeWhile(_ != 0).trim
      val typ = bytes(fp + 11).toChar
      val len = bytes(fp + 16) & 0xff
      fields += DbfField(name, typ, len)
      fp += 32
    }
    fields.toSeq
  }

  private def sparkType(t: Char): DataType = t match {
    case 'N' | 'F' => DoubleType
    case 'L'       => BooleanType
    case _         => StringType
  }

  /** Schema from the .dbf HEADER alone (32-byte prologue + field
    * descriptors) — the driver-side cost of [[readDir]] stays a few
    * hundred bytes per probe regardless of file size.
    */
  def readDbfSchema(path: String, conf: HadoopConf = new HadoopConf()): Seq[StructField] = {
    val p = new HPath(path)
    val fileLen = p.getFileSystem(conf).getFileStatus(p).getLen
    require(fileLen >= 33,
      s"$path: $fileLen bytes — shorter than the minimal dBASE header")
    val in = p.getFileSystem(conf).open(p)
    try {
      val pro = new Array[Byte](32)
      in.readFully(0, pro)
      val headerSize =
        (pro(8) & 0xff) | ((pro(9) & 0xff) << 8)   // LE unsigned short
      // a doctored header size would otherwise surface as an opaque
      // negative-length or EOF error from readFully
      require(headerSize >= 33 && headerSize <= fileLen,
        s"$path: header size $headerSize out of range for a $fileLen-byte file")
      val header = new Array[Byte](headerSize)
      System.arraycopy(pro, 0, header, 0, 32)
      in.readFully(32, header, 32, headerSize - 32)
      parseFieldDescriptors(header, headerSize)
        .map(f => StructField(f.name, sparkType(f.typ), nullable = true))
    } finally in.close()
  }

  /** All records plus a liveness mask, so [[read]] can drop the .shp
    * twin of a deleted .dbf record by position.
    */
  private def readDbfRaw(
      path: String, conf: HadoopConf): (Seq[StructField], Seq[Seq[Any]], Seq[Boolean]) = {
    val bytes = readFully(path, conf)
    // Hostile-file policy (SourceChaosProbe): doctored header counts
    // must fail loudly with the numbers that disagree — unguarded, an
    // overrunning declared record size is an opaque
    // ArrayIndexOutOfBounds, and an UNDER-declared one silently reads
    // field bytes from the NEXT record (in-bounds garbage, the worst
    // case: no error at all).
    require(bytes.length >= 33,
      s"$path: ${bytes.length} bytes — shorter than the minimal dBASE header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff
    require(numRecords >= 0, s"$path: negative record count $numRecords")
    require(headerSize >= 33 && headerSize <= bytes.length,
      s"$path: header size $headerSize out of range for a ${bytes.length}-byte file")
    require(recordSize >= 1,
      s"$path: record size $recordSize — a record is at least the deletion flag")
    // Long arithmetic: a hostile numRecords×recordSize overflows Int
    // and a wrapped product could pass a naive <= check
    require(headerSize + numRecords.toLong * recordSize <= bytes.length,
      s"$path: $numRecords records × $recordSize bytes + $headerSize-byte header " +
        s"overruns the ${bytes.length}-byte file (truncated or doctored count)")

    val fields = new ArrayBuffer[DbfField]
    fields ++= parseFieldDescriptors(bytes, headerSize)
    // descriptors wider than the declared record size would read each
    // row's tail from the FOLLOWING record — silent corruption
    require(1 + fields.map(_.len).sum <= recordSize,
      s"$path: field widths sum to ${fields.map(_.len).sum} + 1 flag byte " +
        s"> declared record size $recordSize — descriptors and records disagree")

    val schema = fields.map(f => StructField(f.name, sparkType(f.typ), nullable = true)).toSeq

    val live = (0 until numRecords).map(r => bytes(headerSize + r * recordSize) != 0x2a)
    val rows = (0 until numRecords).map { r =>
      var off = headerSize + r * recordSize + 1         // +1 deletion flag
      fields.map { f =>
        val raw = new String(bytes, off, f.len, "ISO-8859-1").trim
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
