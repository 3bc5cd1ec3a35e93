package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeomFunctions => G}

/** Sinks (OP-05/OP-10): GeoJSON round-trips through the engine's own
  * feature-service parser; CSV single-file parity.
  */
class WritersSpec extends SparkTestBase {
  import spark.implicits._

  test("geojson writer round-trips through the feature-service parser") {
    val df = Seq(
      ("Alpha", 1L, "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"),
      ("Beta", 2L, "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((3 3, 4 3, 4 4, 3 4, 3 3)))"))
      .toDF("name", "id", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")

    val path = Files.createTempFile("layer", ".geojson").toString
    Writers.writeGeoJson(df, "geom", path)

    val parsed = FeatureService.parsePage(
      new String(Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
    assert(parsed.length == 2)
    val byName = parsed.map { case (attrs, wkb) => attrs("name") -> wkb }.toMap
    assert(graft.geom.GeomCodec.read(byName("Alpha")).getArea == 4.0)
    assert(graft.geom.GeomCodec.read(byName("Beta")).getNumGeometries == 2)
    assert(parsed.head._1("id") == "1" || parsed.head._1("id") == "2")
  }

  test("readGeoJson round-trips writeGeoJson as a DataFrame") {
    val df = Seq(("Gamma", 7L, "POLYGON((0 0, 3 0, 3 3, 0 3, 0 0))"))
      .toDF("name", "id", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val path = Files.createTempFile("layer2", ".geojson").toString
    Writers.writeGeoJson(df, "geom", path)
    val back = Writers.readGeoJson(spark, path)
    val row = back.collect()(0)
    assert(row.getAs[String]("name") == "Gamma")
    assert(row.getAs[String]("id") == "7")      // file-GDB TEXT semantics
    assert(graft.geom.GeomCodec.read(row.getAs[Array[Byte]]("geom")).getArea == 9.0)
  }

  test("readGeoJson names the FILE on a corrupt artifact") {
    // same parser as the feature-service page scan, so it inherits the
    // hostile-input diagnostics — but from a file they must carry the
    // path, not a page-generic message
    val p = java.nio.file.Files.createTempFile("corrupt_", ".geojson")
    try {
      java.nio.file.Files.write(p, """{"features":[{""".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        Writers.readGeoJson(spark, p.toString)
      }
      assert(e.getMessage.contains(p.getFileName.toString) &&
        e.getMessage.contains("not parseable JSON"), e.getMessage)
      java.nio.file.Files.write(p, """{"error":{"code":403}}""".getBytes("UTF-8"))
      val e2 = intercept[IllegalArgumentException] {
        Writers.readGeoJson(spark, p.toString)
      }
      assert(e2.getMessage.contains(p.getFileName.toString) &&
        e2.getMessage.contains("error page"), e2.getMessage)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  test("feature-service cache is idempotent: second load makes zero fetches (OP-09)") {
    val page = """{"type":"FeatureCollection","features":[
      {"type":"Feature","properties":{"NAME":"A"},
       "geometry":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}}]}"""
    var fetches = 0
    val fetch: String => String = url => {
      fetches += 1
      if (url.contains("resultOffset=0")) page
      else """{"type":"FeatureCollection","features":[]}"""
    }
    val cacheDir = java.nio.file.Files.createTempDirectory("fs_cache").toString
    val first = FeatureService.loadCached(spark, fetch, "http://svc/layer/0", cacheDir)
    assert(first.count() == 1)
    val fetchesAfterFirst = fetches
    assert(fetchesAfterFirst >= 2) // data page + terminating empty page
    val second = FeatureService.loadCached(spark, fetch, "http://svc/layer/0", cacheDir)
    assert(second.count() == 1)
    assert(fetches == fetchesAfterFirst) // cache hit: no network
    // a different vintage is a different key -> refetches
    FeatureService.loadCached(spark, fetch, "http://svc/layer/0", cacheDir, vintage = "2026-08")
      .count()
    assert(fetches > fetchesAfterFirst)
  }

  test("loadCached never caches a failed fetch: a mid-pagination error page leaves no snapshot") {
    // the hostile-file policy's cache corollary: a pagination that dies
    // on an ArcGIS HTTP-200 error page must not leave ANY cache entry —
    // loadCached persists the layer forever, so a partial snapshot here
    // would silently truncate every future read of this service
    val page = """{"type":"FeatureCollection","features":[
      {"type":"Feature","properties":{"NAME":"A"},
       "geometry":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}}]}"""
    var healthy = false
    val fetch: String => String = url =>
      if (url.contains("resultOffset=0")) page
      else if (!healthy) """{"error":{"code":500,"message":"transient"}}"""
      else """{"type":"FeatureCollection","features":[]}"""
    val cacheDir = java.nio.file.Files.createTempDirectory("fs_cache_fail").toString
    val e = intercept[IllegalArgumentException] {
      FeatureService.loadCached(spark, fetch, "http://svc/layer/9", cacheDir)
    }
    assert(e.getMessage.contains("error page") &&
      e.getMessage.contains("resultOffset="), e.getMessage)
    // no _SUCCESS-marked snapshot may exist after the failure
    val leftovers = new java.io.File(cacheDir).listFiles()
      .filter(d => new java.io.File(d, "_SUCCESS").exists())
    assert(leftovers.isEmpty, s"failed fetch left a cache snapshot: ${leftovers.toSeq}")
    // once the service recovers, the SAME key fetches and caches fine
    healthy = true
    assert(FeatureService.loadCached(spark, fetch, "http://svc/layer/9", cacheDir)
      .count() == 1)
  }

  test("feature-service: hitting maxPages with rows in hand throws, never truncates") {
    val onePage = """{"type":"FeatureCollection","features":[
      {"type":"Feature","properties":{"NAME":"A"},
       "geometry":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}}]}"""
    // a different NAME per offset so the stall detector doesn't fire
    val fetch: String => String = url => {
      val off = "resultOffset=(\\d+)".r.findFirstMatchIn(url).get.group(1)
      onePage.replace("\"A\"", s""""A$off"""")
    }
    val e = intercept[IllegalStateException] {
      FeatureService.fetchAll(fetch, "http://svc/layer/0", maxPages = 3)
    }
    assert(e.getMessage.contains("maxPages"), e.getMessage)

    // but data EXACTLY exhausted at the cap is complete, not truncated:
    // the guard must probe one page further before throwing
    val exact: String => String = url => {
      val off = "resultOffset=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      if (off < 3) onePage.replace("\"A\"", s""""A$off"""")
      else """{"type":"FeatureCollection","features":[]}"""
    }
    val rows = FeatureService.fetchAll(exact, "http://svc/layer/0", maxPages = 3)
    assert(rows.size == 3, rows.size)
  }

  test("feature-service schema is the UNION of property keys, not the first feature's") {
    // sparse GeoJSON: the first feature omits ALAND entirely
    val page = """{"type":"FeatureCollection","features":[
      {"type":"Feature","properties":{"NAME":"A"},
       "geometry":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}},
      {"type":"Feature","properties":{"NAME":"B","ALAND":"42"},
       "geometry":{"type":"Polygon","coordinates":[[[2,2],[3,2],[3,3],[2,3],[2,2]]]}}]}"""
    val fetch: String => String = url =>
      if (url.contains("resultOffset=0")) page
      else """{"type":"FeatureCollection","features":[]}"""
    val df = FeatureService.load(spark, fetch, "http://svc/layer/1")
    assert(df.columns.contains("ALAND"), df.columns.toSeq)
    val rows = df.orderBy("NAME").collect()
    assert(rows(0).getAs[String]("ALAND") == null)
    assert(rows(1).getAs[String]("ALAND") == "42")
  }

  test("compaction sizes a hive-partitioned directory from the recursive listing") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact_part").toString
    val in = s"$base/in"; val out = s"$base/out"
    val df = (1L to 4000L).map(i => (i, i % 4, s"row_$i")).toDF("id", "part", "payload")
    df.repartition(10).write.partitionBy("part").parquet(in)
    def leafBytes(dir: java.io.File): Long =
      dir.listFiles().map(f => if (f.isDirectory) leafBytes(f)
        else if (f.getName.endsWith(".parquet")) f.length else 0L).sum
    val totalBytes = leafBytes(new java.io.File(in))
    assert(totalBytes > 0)
    // a flat listing saw only the part= subdirectories (0 bytes -> 1
    // file); the recursive fix must size from the leaves
    val n = graft.sources.Layout.compact(spark, in, out,
      targetBytes = (totalBytes + 2) / 3)
    assert(n >= 3, s"n=$n (flat listing would give 1)")
    assert(spark.read.parquet(out).count() == 4000L)
  }

  test("compaction preserves a hive-partitioned layout (in place)") {
    import spark.implicits._
    // a plain rewrite folded the partition columns into the data files
    // and destroyed the part=… directory structure — pruning reverted
    // to full scans and path-addressed readers found nothing (r20)
    val dir = java.nio.file.Files.createTempDirectory("compact_keep").toString + "/t"
    val df = (1L to 2000L).map(i => (i, i % 3, s"row_$i")).toDF("id", "part", "payload")
    df.repartition(8).write.partitionBy("part").parquet(dir)
    def partDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("part=")).sortBy(_.getName)
    assert(partDirs.length == 3)
    assert(partDirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) == 8))
    graft.sources.Layout.compact(spark, dir, dir)
    assert(partDirs.map(_.getName).toSeq == Seq("part=0", "part=1", "part=2"),
      "in-place compaction must keep the partition directories")
    // the small-file fix: each partition dir collapses to ONE file
    assert(partDirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      partDirs.map(d => d.getName -> d.listFiles().length).mkString(","))
    // content-preserving (column ORDER differs: partition discovery
    // appends the partition column — compare on an explicit order)
    assert(spark.read.parquet(dir).select("id", "part", "payload")
      .orderBy("id").collect().toSeq ==
      df.select("id", "part", "payload").orderBy("id").collect().toSeq)
    // and partition pruning still works on the compacted layout
    val pruned = spark.read.parquet(dir).filter($"part" === 1)
    assert(pruned.count() == df.filter($"part" === 1).count())
  }

  test("geojson container properties publish as real JSON, not scala toString") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"), Map("k" -> 2L),
        "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .toDF("id", "tags", "meta", "wkt")
      .withColumn("geom", G.st_geomfromwkt($"wkt")).drop("wkt")
    val path = Files.createTempFile("containers", ".geojson").toString
    Writers.writeGeoJson(df, "geom", path)
    val text = new String(Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    assert(!text.contains("WrappedArray") && !text.contains("ArraySeq"),
      s"scala debug strings leaked into the artifact: $text")
    // parsePage keeps container properties as their JSON text (r20)
    val attrs = FeatureService.parsePage(text).head._1
    assert(attrs("tags") == """["a","b"]""", attrs("tags"))
    assert(attrs("meta") == """{"k":2}""", attrs("meta"))
  }

  test("compaction: fewer target-sized files, identical content, even sizes") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact_spec").toString
    val small = s"$base/small"; val out = s"$base/out"
    val df = (1L to 5000L).map(i => (i, s"row_$i")).toDF("id", "payload")
    df.repartition(40).write.parquet(small)

    def parts(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(parts(small).length == 40)
    val totalBytes = parts(small).map(_.length).sum
    // target half the data per file -> exactly 2 output files
    val n = graft.sources.Layout.compact(spark, small, out,
      targetBytes = (totalBytes + 1) / 2)
    assert(n == 2 && parts(out).length == 2)
    // round-robin repartition: the two files are evenly sized (±30%)
    val sizes = parts(out).map(_.length.toDouble)
    assert(sizes.max / sizes.min < 1.3, sizes.mkString(","))
    // content-preserving
    assert(spark.read.parquet(out).orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("single-file csv sink writes one part with header") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val dir = Files.createTempDirectory("csvout").toString + "/out"
    Writers.writeCsvSingle(df, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1)
    val lines = scala.io.Source.fromFile(parts(0)).getLines().toList
    assert(lines.head == "k,v" && lines.size == 3)
  }

  test("single-file csv sink refuses oversized input with instructions") {
    val big = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    val dir = Files.createTempDirectory("csvbig").toString + "/out"
    val e = intercept[IllegalArgumentException] {
      Writers.writeCsvSingle(big, dir, maxRows = 50)
    }
    assert(e.getMessage.contains("writeCsv"), e.getMessage)
    assert(!new java.io.File(dir).exists(), "no partial output on refusal")
    // at the limit it still writes
    Writers.writeCsvSingle(big, dir, maxRows = 100)
    assert(new java.io.File(dir).exists())
  }

  test("single-file csv sink rejects unenforceable caps, honors the no-cap sentinel") {
    val df = Seq((1, "a")).toDF("k", "v")
    val base = Files.createTempDirectory("csvcap").toString
    // caps past the probe's Int-row reach used to pass silently
    // unenforced (e.g. 3e9 rows); now they are rejected up front
    Seq(3_000_000_000L, Int.MaxValue.toLong, Int.MaxValue - 1L,
        Long.MaxValue - 1L).foreach { cap =>
      val e = intercept[IllegalArgumentException] {
        Writers.writeCsvSingle(df, base + s"/r$cap", maxRows = cap)
      }
      assert(e.getMessage.contains("Long.MaxValue"), s"cap=$cap: ${e.getMessage}")
      assert(!new java.io.File(base + s"/r$cap").exists())
    }
    // the explicit sentinel still means "no cap"
    Writers.writeCsvSingle(df, base + "/nocap", maxRows = Long.MaxValue)
    assert(new java.io.File(base + "/nocap").exists())
    // nonsensical caps are rejected up front, not passed to limit()
    Seq(0L, -1L, -2L).foreach { cap =>
      val e = intercept[IllegalArgumentException] {
        Writers.writeCsvSingle(df, base + s"/n$cap", maxRows = cap)
      }
      assert(e.getMessage.contains("positive"), s"cap=$cap: ${e.getMessage}")
    }
  }

  test("publish manifest round-trips, nulls lastEditDate, keeps blue/green as data") {
    val layers = Seq(
      Writers.LayerManifest(
        name = "cities",
        title = "City Boundaries",
        summary = "City boundaries with third-party identifiers.",
        description = "<p>Boundaries from the authoritative source…</p>",
        tags = Seq("boundaries", "cities"),
        artifacts = Map(
          "geojson" -> "/out/cities.geojson", "csv" -> "/out/cities.csv"),
        blueGreen = Some(("item-blue-1", "item-green-1"))),
      Writers.LayerManifest(
        name = "counties", title = "County Boundaries", summary = "s",
        description = "d", tags = Nil, artifacts = Map.empty, blueGreen = None))
    val path = Files.createTempFile("manifest", ".json").toString
    Writers.publishManifest(layers, path)
    // round-trip: the driver publish script reads back exactly what
    // the engine wrote
    assert(Writers.readManifest(path) == layers)
    // the updateDefinition contract: lastEditDate must be an explicit
    // null per layer, serviceDescription is the summary field
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(java.nio.file.Paths.get(path)))
    val first = root.get("layers").get(0)
    assert(first.get("editingInfo").get("lastEditDate").isNull)
    assert(first.get("serviceDescription").asText.startsWith("City boundaries"))
    assert(root.get("layers").get(1).get("blueGreen") == null)
  }
}
