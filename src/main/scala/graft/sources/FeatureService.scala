package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, Polygon}
import scala.collection.mutable.ArrayBuffer

import graft.geom.GeomCodec

/** ArcGIS REST Feature Service scan (OP-06, `bunny.py:213-216`,
  * `coastline.py:39-42`): paginated
  * `…/query?where=1=1&outFields=*&f=geojson&resultOffset=N` fetch, each
  * page a GeoJSON FeatureCollection, geometry landing as a WKB column.
  *
  * Transport is injected (`fetch: url → body`) so the engine itself
  * stays zero-egress: production wires `java.net.http`, tests wire a
  * local page map. Pagination runs driver-side (matching the
  * reference's full-layer fetch) and the parsed features parallelize
  * into a DataFrame; a 100 TB-scale source would instead partition by
  * offset ranges and fetch inside mapPartitions — same page parser.
  */
object FeatureService {

  private val mapper = new ObjectMapper()

  def queryUrl(baseUrl: String, offset: Int, pageSize: Int): String =
    s"$baseUrl/query?where=1%3D1&outFields=*&f=geojson&resultOffset=$offset&resultRecordCount=$pageSize"

  /** Fetch all pages until a page comes back empty. A short page does
    * NOT terminate the scan: ArcGIS servers clamp `resultRecordCount`
    * to the service's `maxRecordCount`, so when that cap is below the
    * requested page size every page is "short" — stopping there would
    * silently truncate the layer to its first page. The offset always
    * advances by the number of rows actually returned.
    */
  def fetchAll(fetch: String => String, baseUrl: String, pageSize: Int = 1000,
      maxPages: Int = 100000): Seq[(Map[String, String], Array[Byte])] = {
    val out = new ArrayBuffer[(Map[String, String], Array[Byte])]
    var offset = 0
    var more = true
    var pages = 0
    var prevSig: Option[Seq[(Map[String, String], Seq[Byte])]] = None
    // page-parse failures (truncated JSON, error page, non-collection
    // body, corrupt geometry) name the URL and offset they struck at —
    // "malformed JSON" without the page that produced it is undebuggable
    // on a 100k-page fetch
    def parsedPage(off: Int): Seq[(Map[String, String], Array[Byte])] =
      try parsePage(fetch(queryUrl(baseUrl, off, pageSize)))
      catch { case e: IllegalArgumentException => throw new IllegalArgumentException(
        s"$baseUrl at resultOffset=$off: ${e.getMessage}", e) }
    while (more) {
      val page = parsedPage(offset)
      // a server that ignores resultOffset (supportsPagination=false)
      // returns the same page for every offset — detect the lack of
      // progress instead of looping forever. The comparison covers the
      // WHOLE page (every feature's attributes + geometry bytes), not
      // just the head feature: consecutive pages can legitimately start
      // with identical attribute maps (sparse/duplicated attributes),
      // and a head-only check would abort a valid fetch.
      val sig = page.map { case (attrs, wkb) =>
        (attrs, if (wkb == null) Seq.empty[Byte] else wkb.toSeq)
      }
      val stalled = page.nonEmpty && prevSig.contains(sig)
      if (stalled)
        throw new IllegalStateException(
          s"$baseUrl ignores resultOffset (identical page at offset $offset) — " +
            "the service does not support pagination")
      out ++= page
      prevSig = Some(sig)
      pages += 1
      offset += page.size
      // hitting the page cap with a NON-empty page in hand: probe ONE
      // page further before deciding. A non-empty final page does not
      // prove rows remain (the data may be exactly exhausted at the
      // cap); only a non-empty page PAST the cap does — and returning
      // that prefix would silently truncate the layer (which loadCached
      // then persists forever)
      if (pages >= maxPages && page.nonEmpty) {
        val probe = parsedPage(offset)
        if (probe.nonEmpty)
          throw new IllegalStateException(
            s"$baseUrl still returning rows after maxPages=$maxPages pages " +
              s"(${out.size} rows so far) — raise maxPages or pageSize; " +
              "refusing to return a silently truncated layer")
        more = false
      } else more = page.nonEmpty
    }
    out.toSeq
  }

  /** One GeoJSON FeatureCollection page → (properties, WKB) pairs.
    *
    * Hostile-page policy (SourceChaosProbe): ArcGIS servers return
    * HTTP 200 with an `{"error": …}` JSON body on failure, and a page
    * that is valid JSON but NOT a FeatureCollection has no `features`
    * array — both previously read as size-0 and TERMINATED the
    * pagination loop, silently truncating the layer to the pages
    * fetched so far (which loadCached then persists forever). Only a
    * real FeatureCollection with an empty `features` ARRAY means
    * end-of-layer; anything else fails loudly. Malformed JSON
    * (truncated mid-pagination) and per-feature geometry corruption
    * carry the feature index so [[fetchAll]] can add the URL + offset.
    */
  def parsePage(json: String): Seq[(Map[String, String], Array[Byte])] = {
    val root =
      try mapper.readTree(json)
      catch { case e: com.fasterxml.jackson.core.JacksonException =>
        throw new IllegalArgumentException(
          s"malformed page: not parseable JSON (${e.getOriginalMessage})", e) }
    val err = root.path("error")
    if (!err.isMissingNode)
      throw new IllegalArgumentException(
        s"service returned an error page: ${err.toString.take(300)}")
    val features = root.path("features")
    if (!features.isArray)
      throw new IllegalArgumentException(
        "malformed page: no 'features' array (not a GeoJSON FeatureCollection; " +
          s"top-level fields: ${
            scala.jdk.CollectionConverters.IteratorHasAsScala(root.fieldNames())
              .asScala.take(8).mkString(", ")})")
    (0 until features.size()).map { i =>
      val f = features.get(i)
      val props = f.path("properties")
      val attrs = scala.collection.mutable.Map[String, String]()
      props.fieldNames().forEachRemaining { n =>
        val v = props.get(n)
        // containers keep their JSON text: asText() returns "" for
        // object/array nodes, silently blanking every non-scalar
        // property — the silent-loss class the hostile-page policy
        // above exists to prevent (r20 review)
        attrs(n) =
          if (v.isNull) null
          else if (v.isContainerNode) v.toString
          else v.asText()
      }
      val wkb =
        try GeomCodec.write(parseGeometry(f.path("geometry")))
        catch { case e: Exception => throw new IllegalArgumentException(
          s"feature $i: corrupt geometry (${e.getMessage})", e) }
      (attrs.toMap, wkb)
    }
  }

  /** GeoJSON Polygon / MultiPolygon → JTS. */
  def parseGeometry(g: JsonNode): Geometry = {
    if (g.isMissingNode || g.isNull) return null
    val gf = GeomCodec.factory
    def ring(coords: JsonNode): LinearRing = {
      val pts = (0 until coords.size()).map { i =>
        val c = coords.get(i)
        new Coordinate(c.get(0).asDouble(), c.get(1).asDouble())
      }
      gf.createLinearRing(pts.toArray)
    }
    def polygon(rings: JsonNode): Polygon = {
      val shell = ring(rings.get(0))
      val holes = (1 until rings.size()).map(i => ring(rings.get(i))).toArray
      gf.createPolygon(shell, holes)
    }
    g.path("type").asText() match {
      case "Polygon"      => polygon(g.path("coordinates"))
      case "MultiPolygon" =>
        val cs = g.path("coordinates")
        gf.createMultiPolygon((0 until cs.size()).map(i => polygon(cs.get(i))).toArray)
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON type $other")
    }
  }

  /** Features → DataFrame: every property a string column (file-GDB
    * TEXT semantics) + `geom` WKB.
    */
  def toDataFrame(
      spark: SparkSession,
      features: Seq[(Map[String, String], Array[Byte])],
      columns: Seq[String]): DataFrame = {
    val schema = StructType(
      columns.map(c => StructField(c, StringType, nullable = true)) :+
        StructField("geom", BinaryType, nullable = true))
    val rows = features.map { case (attrs, wkb) =>
      Row.fromSeq(columns.map(attrs.getOrElse(_, null)) :+ wkb)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Full scan: fetch + assemble. The column set is the UNION of keys
    * across all features (sorted), not the first feature's — GeoJSON
    * responses may omit null-valued properties per feature, so a
    * first-feature schema would drop whole columns (and change
    * run-to-run with feature order). Same rule as
    * [[Writers.readGeoJson]].
    */
  def load(spark: SparkSession, fetch: String => String, baseUrl: String): DataFrame = {
    val features = fetchAll(fetch, baseUrl)
    require(features.nonEmpty, s"feature service $baseUrl returned no features")
    toDataFrame(spark, features,
      features.iterator.flatMap(_._1.keys).toSeq.distinct.sorted)
  }

  /** OP-09 idempotent source caching (`coastline.py:38`'s
    * `arcpy.Exists` skip-download): the fetched layer lands as parquet
    * keyed by URL (+ an optional vintage tag, e.g. a date); a later
    * load with the same key never touches the network. The cache is
    * also what makes re-runs of a 100 TB pipeline cheap — sources are
    * scanned from columnar storage, not re-paginated over HTTP.
    */
  def loadCached(
      spark: SparkSession, fetch: String => String, baseUrl: String,
      cacheDir: String, vintage: String = ""): DataFrame = {
    // full MD5 of the key: a truncated hash could collide two services
    // and silently serve the wrong cached layer
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$baseUrl#$vintage".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val path = s"$cacheDir/fs_$key.parquet"
    // Hadoop FS, not java.io.File: a java.io probe can't see hdfs://
    // or s3a:// cache dirs, so the cache would NEVER hit there and
    // every call would re-paginate the layer over HTTP — silently
    // defeating the never-touches-the-network contract
    val marker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      // staging-dir + atomic swap (the r20 directory-sink contract),
      // not a bare overwrite: two pipelines cold-starting the same URL
      // both miss the marker and run overlapping overwrite jobs into
      // ONE path — the later delete races the earlier commit and the
      // mixed part files sit under a valid _SUCCESS forever (a cache
      // hit can never detect it). With the swap each job builds its
      // own tagged staging dir and the promote is a rename.
      AtomicDirs.writeVia(spark, path) { staging =>
        load(spark, fetch, baseUrl).write.mode("overwrite").parquet(staging)
      }
    }
    spark.read.parquet(path)
  }
}
