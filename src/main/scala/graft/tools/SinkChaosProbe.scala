package graft.tools

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.geom.GeomCodec
import graft.sources.{AtomicFiles, Shapefile, Writers}

/** Writer-side chaos probe (r18 verdict task 4): SourceChaosProbe fed
  * the READERS hostile files; this one drives the driver-side SINKS
  * into mid-write failure and adjudicates the no-torn-artifact
  * contract — after a failed publish the destination path must hold
  * either NOTHING or its PREVIOUS COMPLETE content, never a partial
  * artifact, and no `.writing` temp may survive.
  *
  * Failure injection is semantic, not signal-based: the sinks fail
  * mid-stream on real data defects (a corrupt WKB row deep in the
  * frame, an unsupported geometry type, a .dbf field past the dBASE
  * width limit) — the same interruption point a crash would hit, with
  * a deterministic trigger. Three verdicts per scenario:
  *  - CLEAN   the contract held (failure raised, dest absent-or-previous,
  *            no temp residue; or a success scenario produced the artifact)
  *  - TORN    a partial/incorrect artifact survived at the dest
  *  - RESIDUE a temp file survived next to the dest
  *
  * `SinkChaosSpec` pins every scenario; this main is the runnable
  * end-state report (COVERAGE.md records the output).
  *
  * Usage: `sbt "runMain graft.tools.SinkChaosProbe"`.
  */
object SinkChaosProbe {

  final case class Scenario(sink: String, name: String, run: Path => Unit)
  final case class Outcome(scenario: Scenario, verdict: String, detail: String) {
    def ok: Boolean = verdict == "CLEAN"
  }

  // --- fixtures -------------------------------------------------------

  private def poly(x: Double): Array[Byte] = {
    val gf = GeomCodec.factory
    GeomCodec.write(gf.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(x, 0),
      new org.locationtech.jts.geom.Coordinate(x + 1, 0),
      new org.locationtech.jts.geom.Coordinate(x + 1, 1),
      new org.locationtech.jts.geom.Coordinate(x, 1),
      new org.locationtech.jts.geom.Coordinate(x, 0))))
  }

  private def point(x: Double): Array[Byte] = {
    val gf = GeomCodec.factory
    GeomCodec.write(gf.createPoint(
      new org.locationtech.jts.geom.Coordinate(x, 0)))
  }

  private val geomSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("geom", BinaryType, nullable = true)))

  private def frame(spark: SparkSession, rows: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, g) => Row(i, g) }, 2),
      geomSchema)

  /** Temp-file residue left by a failed sink next to `dest`. The
    * Files.list stream holds an open DirectoryStream — closed
    * explicitly, or every scenario leaks a directory fd (r19 review).
    */
  private def residue(dest: Path): Seq[String] =
    listNames(dest.toAbsolutePath.getParent,
      n => n.startsWith(dest.getFileName.toString) && n.endsWith(".writing"))

  private def listNames(dir: Path, keep: String => Boolean): Seq[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).filter(keep).toSeq
    finally s.close()
  }

  /** Adjudicate a FAILING publish over `dest`: the run must throw, the
    * dest must hold exactly `before` (None = absent), and no temp may
    * survive.
    */
  private def failedPublish(
      s: Scenario, dest: Path, before: Option[Array[Byte]]): Outcome = {
    val threw =
      try { s.run(dest); false }
      catch { case _: Throwable => true }
    val res = residue(dest)
    val after =
      if (Files.exists(dest)) Some(Files.readAllBytes(dest)) else None
    if (!threw)
      Outcome(s, "TORN", "scenario did not fail — injection broken")
    else if (res.nonEmpty)
      Outcome(s, "RESIDUE", s"temp survived: ${res.mkString(",")}")
    else (before, after) match {
      case (None, None) => Outcome(s, "CLEAN", "failed, dest absent, no residue")
      case (Some(b), Some(a)) if java.util.Arrays.equals(b, a) =>
        Outcome(s, "CLEAN", "failed, previous artifact intact, no residue")
      case (None, Some(a)) =>
        Outcome(s, "TORN", s"partial artifact survived (${a.length} bytes)")
      case (Some(_), None) =>
        Outcome(s, "TORN", "previous artifact DESTROYED by failed publish")
      case (Some(_), Some(a)) =>
        Outcome(s, "TORN", s"previous artifact REPLACED by partial (${a.length} bytes)")
    }
  }

  def scenarios(spark: SparkSession): Seq[() => Outcome] = {
    val dir = graft.TempDirs.register(Files.createTempDirectory("graft_sinkchaos_"))
    val good = frame(spark, (0L until 20L).map(i => (i, poly(i * 2.0))))
    // corrupt WKB row buried mid-frame: GeomCodec.read throws after
    // ~half the features are already streamed to the writer
    val corruptWkb = frame(spark, (0L until 20L).map(i =>
      (i, if (i == 13L) Array[Byte](9, 9, 9, 9) else poly(i * 2.0))))
    // a Point mid-frame: geoJsonGeometry supports (Multi)Polygon only
    val pointMid = frame(spark, (0L until 20L).map(i =>
      (i, if (i == 13L) point(1.0) else poly(i * 2.0))))

    def geojson(df: org.apache.spark.sql.DataFrame)(dest: Path): Unit =
      Writers.writeGeoJson(df, "geom", dest.toString)

    Seq(
      // ---------------- GeoJSON sink ----------------
      () => {
        val d = dir.resolve("sanity.geojson")
        val s = Scenario("geojson", "valid frame publishes (sanity)", geojson(good))
        try {
          s.run(d)
          val roundTrip = Writers.readGeoJson(spark, d.toString).count()
          if (roundTrip == 20 && residue(d).isEmpty)
            Outcome(s, "CLEAN", "20 features round-trip, no residue")
          else Outcome(s, "TORN", s"round-trip $roundTrip rows, residue ${residue(d)}")
        } catch { case e: Throwable => Outcome(s, "TORN", s"sanity failed: $e") }
      },
      () => failedPublish(
        Scenario("geojson", "corrupt WKB mid-frame, fresh dest", geojson(corruptWkb)),
        dir.resolve("wkb_fresh.geojson"), before = None),
      () => failedPublish(
        Scenario("geojson", "unsupported geometry mid-frame, fresh dest", geojson(pointMid)),
        dir.resolve("point_fresh.geojson"), before = None),
      () => {
        // failure OVER an existing published artifact: previous content
        // must survive byte-for-byte
        val d = dir.resolve("wkb_over.geojson")
        Writers.writeGeoJson(good, "geom", d.toString)
        val prev = Files.readAllBytes(d)
        failedPublish(
          Scenario("geojson", "corrupt WKB mid-frame over existing artifact",
            geojson(corruptWkb)), d, before = Some(prev))
      },
      // ---------------- shapefile trio ----------------
      () => {
        // a .dbf NUMERIC field past the 254-byte dBASE width limit (a
        // 1e300 double renders >300 chars at %.8f; string fields
        // truncate by dBASE semantics, numerics must refuse): the trio
        // builder must fail BEFORE any of .shp/.shx/.dbf is written
        // (pre-r19, .shp/.shx were already on disk when the .dbf
        // builder threw — a torn trio at the published base)
        val base = dir.resolve("wide").toString
        val wide = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(
            Row(1L, 1.0e300, poly(0.0))), 1),
          StructType(Seq(
            StructField("id", LongType, nullable = false),
            StructField("huge", DoubleType, nullable = true),
            StructField("geom", BinaryType, nullable = true))))
        val s = Scenario("shapefile", "dbf width overflow leaves NO trio member",
          _ => Shapefile.write(wide, base))
        val threw = try { s.run(null); false } catch { case _: Throwable => true }
        val left = Seq(".shp", ".shx", ".dbf").filter(e =>
          Files.exists(java.nio.file.Paths.get(base + e)))
        val res = listNames(dir,
          n => n.startsWith("wide") && n.endsWith(".writing"))
        if (!threw) Outcome(s, "TORN", "width overflow did not fail")
        else if (left.nonEmpty) Outcome(s, "TORN", s"members survived: $left")
        else if (res.nonEmpty) Outcome(s, "RESIDUE", s"temp survived: $res")
        else Outcome(s, "CLEAN", "failed pre-write, no trio member, no residue")
      },
      () => {
        // overwrite sanity: a second write over an existing trio
        // replaces all three members with the new content
        val base = dir.resolve("trio").toString
        val df1 = frame(spark, Seq((1L, poly(0.0)), (2L, poly(3.0))))
        val df2 = frame(spark, Seq((7L, poly(9.0))))
        val s = Scenario("shapefile", "overwrite replaces the whole trio (sanity)",
          _ => ())
        try {
          Shapefile.write(df1, base)
          Shapefile.write(df2, base)
          val back = Shapefile.read(spark, base).collect()
          if (back.length == 1 && residue(dir.resolve("trio.shp")).isEmpty)
            Outcome(s, "CLEAN", "trio overwritten, 1 row back, no residue")
          else Outcome(s, "TORN", s"read back ${back.length} rows")
        } catch { case e: Throwable => Outcome(s, "TORN", s"overwrite failed: $e") }
      },
      // ---------------- manifest sink ----------------
      () => {
        val d = dir.resolve("manifest.json")
        val s = Scenario("manifest", "publish + round-trip, no residue (sanity)", _ => ())
        try {
          Writers.publishManifest(Seq(Writers.LayerManifest(
            "cities", "Cities", "sum", "desc", Seq("a"),
            Map("csv" -> "cities.csv"), Some(("blue", "green")))), d.toString)
          val back = Writers.readManifest(d.toString)
          // the promoted artifact must stay world-readable: the temp
          // route creates 0600 and a web server / group pipeline
          // reading the publish dir would EACCES (r19 review)
          val readable =
            try Files.getPosixFilePermissions(d).contains(
              java.nio.file.attribute.PosixFilePermission.OTHERS_READ)
            catch { case _: UnsupportedOperationException => true }
          if (back.length == 1 && back.head.name == "cities" &&
              residue(d).isEmpty && readable)
            Outcome(s, "CLEAN", "manifest round-trips, world-readable, no residue")
          else Outcome(s, "TORN",
            s"round-trip broken or perms wrong (readable=$readable): $back")
        } catch { case e: Throwable => Outcome(s, "TORN", s"manifest failed: $e") }
      },
      // ---------------- the shared idiom itself ----------------
      () => {
        // writeVia body failure: dest untouched, temp deleted — the
        // primitive every sink above rides on, pinned directly
        val d = dir.resolve("via.bin")
        Files.write(d, Array[Byte](1, 2, 3))
        val s = Scenario("atomicfiles", "writeVia body failure preserves dest",
          dest => AtomicFiles.writeVia(dest) { tmp =>
            Files.write(tmp, Array[Byte](9))
            sys.error("mid-write kill")
          })
        failedPublish(s, d, before = Some(Array[Byte](1, 2, 3)))
      }) ++ sparkDirScenarios(spark, dir)
  }

  // --- Spark-native directory sinks (r20: the mode("overwrite")
  // delete-before-commit loss class — Layout/Writers now publish via
  // AtomicDirs' staging-dir + rename swap) -----------------------------

  /** Recursive (relative-name → size) listing of a directory sink —
    * the dir analog of the byte compare: after a failed publish the
    * destination must hold exactly its previous files, byte sizes
    * included, or be absent.
    */
  private def dirState(dir: Path): Option[Map[String, Long]] =
    if (!Files.exists(dir)) None
    else {
      val s = Files.walk(dir)
      try Some(s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => dir.relativize(p).toString -> Files.size(p)).toMap)
      finally s.close()
    }

  /** Staging/stash residue next to a directory sink: the AtomicDirs
    * idiom names them `.{name}.writing-{tag}` / `.{name}.replaced-{tag}`.
    */
  private def dirResidue(dest: Path): Seq[String] =
    listNames(dest.toAbsolutePath.getParent, n =>
      n.startsWith("." + dest.getFileName.toString + ".") &&
        (n.contains(".writing-") || n.contains(".replaced-")))

  /** Adjudicate a FAILING directory publish: must throw, dest must
    * hold exactly `before` (None = absent), no staging/stash residue.
    */
  private def failedDirPublish(
      s: Scenario, dest: Path, before: Option[Map[String, Long]]): Outcome = {
    val threw =
      try { s.run(dest); false }
      catch { case _: Throwable => true }
    val res = dirResidue(dest)
    val after = dirState(dest)
    if (!threw)
      Outcome(s, "TORN", "scenario did not fail — injection broken")
    else if (res.nonEmpty)
      Outcome(s, "RESIDUE", s"staging/stash survived: ${res.mkString(",")}")
    else if (after == before) Outcome(s, "CLEAN",
      if (before.isEmpty) "failed, dest absent, no residue"
      else "failed, previous dataset intact, no residue")
    else (before, after) match {
      case (None, Some(a)) =>
        Outcome(s, "TORN", s"partial dataset survived (${a.size} files)")
      case (Some(_), None) =>
        Outcome(s, "TORN", "previous dataset DESTROYED by failed publish")
      case _ =>
        Outcome(s, "TORN", s"previous dataset MUTATED by failed publish")
    }
  }

  private def sparkDirScenarios(
      spark: SparkSession, dir: Path): Seq[() => Outcome] = {
    import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}
    import graft.sources.Layout

    // plain (id, s) frame — CSV-writable; `poisoned` raises INSIDE the
    // write job on one mid-frame row (semantic injection: the same
    // interruption point a task crash hits, with a deterministic
    // trigger — constant-folding can't lift it, the condition is data)
    def plain = spark.range(0, 20, 1, 2)
      .select(col("id"), concat(lit("row"), col("id")).as("s"),
        (col("id") % 7).as("k"))
    def poisoned = plain.withColumn("s",
      when(col("id") === 13L, raise_error(lit("mid-job chaos")))
        .otherwise(col("s")))

    Seq(
      () => {
        // sanity: the staging swap still publishes a readable dataset
        val d = dir.resolve("pq_sanity")
        val s = Scenario("parquet-dir", "writeParquet publishes through the swap (sanity)",
          dest => Writers.writeParquet(plain, dest.toString))
        try {
          s.run(d)
          val n = spark.read.parquet(d.toString).count()
          if (n == 20 && dirResidue(d).isEmpty)
            Outcome(s, "CLEAN", "20 rows round-trip, no staging residue")
          else Outcome(s, "TORN", s"round-trip $n rows, residue ${dirResidue(d)}")
        } catch { case e: Throwable => Outcome(s, "TORN", s"sanity failed: $e") }
      },
      () => {
        // the r19 verdict's loss class, pinned: mid-JOB failure over a
        // LIVE dataset must leave the previous files byte-identical
        val d = dir.resolve("pq_over")
        Writers.writeParquet(plain, d.toString)
        failedDirPublish(
          Scenario("parquet-dir", "mid-job failure over existing dataset",
            dest => Writers.writeParquet(poisoned, dest.toString)),
          d, before = dirState(d))
      },
      () => failedDirPublish(
        Scenario("parquet-dir", "mid-job failure, fresh dest stays absent",
          dest => Writers.writeParquet(poisoned, dest.toString)),
        dir.resolve("pq_fresh"), before = None),
      () => {
        val d = dir.resolve("part_over")
        Layout.writePartitioned(plain, d.toString, Seq("k"))
        failedDirPublish(
          Scenario("partitioned-dir", "mid-job failure over hive-partitioned dataset",
            dest => Layout.writePartitioned(poisoned, dest.toString, Seq("k"))),
          d, before = dirState(d))
      },
      () => {
        val d = dir.resolve("csv_over")
        Writers.writeCsvSingle(plain, d.toString)
        failedDirPublish(
          Scenario("csv-dir", "mid-job failure over single-file CSV",
            dest => Writers.writeCsvSingle(poisoned, dest.toString)),
          d, before = dirState(d))
      },
      () => {
        val d = dir.resolve("zorder_over")
        Layout.writeZOrdered(plain, d.toString, "id", "k", files = 2, bits = 8)
        failedDirPublish(
          Scenario("zorder-dir", "mid-job failure over z-ordered dataset",
            dest => Layout.writeZOrdered(
              poisoned, dest.toString, "id", "k", files = 2, bits = 8)),
          d, before = dirState(d))
      },
      () => {
        // IN-PLACE compaction (outDir == inDir): the maintenance shape
        // the swap exists for — same rows back, previous files gone
        val d = dir.resolve("compact_live")
        Writers.writeParquet(plain.repartition(8), d.toString)
        val s = Scenario("compact", "in-place compaction rewrites a live dir (sanity)",
          dest => { Layout.compact(spark, dest.toString, dest.toString); () })
        try {
          s.run(d)
          val back = spark.read.parquet(d.toString)
          val rows = back.count()
          val files = dirState(d).get.keys.count(_.endsWith(".parquet"))
          if (rows == 20 && files == 1 && dirResidue(d).isEmpty)
            Outcome(s, "CLEAN", s"20 rows in $files file after in-place compact")
          else Outcome(s, "TORN", s"rows=$rows files=$files residue=${dirResidue(d)}")
        } catch { case e: Throwable => Outcome(s, "TORN", s"compact failed: $e") }
      },
      () => {
        // in-place compaction over a dir holding one CORRUPT member:
        // the rewrite job fails mid-read — the live dir (corrupt file
        // included) must survive untouched for diagnosis
        val d = dir.resolve("compact_corrupt")
        Writers.writeParquet(plain.repartition(4), d.toString)
        Files.write(d.resolve("part-junk.parquet"), Array[Byte](80, 65, 82, 49, 9, 9))
        failedDirPublish(
          Scenario("compact", "corrupt member fails compaction, live dir intact",
            dest => { Layout.compact(spark, dest.toString, dest.toString); () }),
          d, before = dirState(d))
      },
      () => {
        // the dir primitive pinned directly (the AtomicFiles.writeVia
        // analog): body failure preserves dest, no staging residue
        val d = dir.resolve("dirvia")
        Writers.writeParquet(plain, d.toString)
        failedDirPublish(
          Scenario("atomicdirs", "writeVia body failure preserves dest dir",
            dest => graft.sources.AtomicDirs.writeVia(spark, dest.toString) {
              staging =>
                plain.limit(3).write.parquet(staging)
                sys.error("mid-publish kill")
            }),
          d, before = dirState(d))
      },
      () => {
        // the catalog analog: a mid-job failure while re-publishing a
        // bucketed TABLE must leave the live table fully readable and
        // no staging/stash table behind (pre-r20, overwrite-saveAsTable
        // DROPPED the live table before writing)
        val t = "chaos_bucketed"
        val s = Scenario("bucketed-table", "mid-job failure over live bucketed table", _ => ())
        try {
          // cross-JVM fixture hygiene: the in-memory catalog forgets
          // tables between runs while the shared warehouse KEEPS their
          // managed locations — an orphan dir makes the next
          // saveAsTable/rename fail with LOCATION_ALREADY_EXISTS
          spark.sql(s"DROP TABLE IF EXISTS $t")
          val wh = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"))
          val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
            if (st.getPath.getName.startsWith(t))
              fs.delete(st.getPath, true)
          }
          Layout.writeBucketed(plain, t, Seq("k"), buckets = 2)
          val threw =
            try { Layout.writeBucketed(poisoned, t, Seq("k"), buckets = 2); false }
            catch { case _: Throwable => true }
          val rows = spark.table(t).count()
          val leftovers = spark.catalog.listTables().collect()
            .map(_.name).filter(n =>
              n.startsWith(t + "__writing") || n.startsWith(t + "__replaced"))
          if (!threw) Outcome(s, "TORN", "injection did not fail")
          else if (rows != 20)
            Outcome(s, "TORN", s"live table read $rows rows after failed publish")
          else if (leftovers.nonEmpty)
            Outcome(s, "RESIDUE", s"staging/stash tables survived: ${leftovers.mkString(",")}")
          else Outcome(s, "CLEAN", "failed, live table intact (20 rows), no residue")
        } catch { case e: Throwable => Outcome(s, "TORN", s"scenario broke: $e") }
      })
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("sink-chaos").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outcomes = scenarios(spark).map(_())
    outcomes.foreach { o =>
      println(f"${if (o.ok) "ok  " else "FAIL"} [${o.scenario.sink}%-11s] " +
        f"${o.scenario.name}%-55s ${o.verdict}: ${o.detail}")
    }
    val bad = outcomes.filterNot(_.ok)
    println(s"\nSinkChaosProbe: ${outcomes.size} scenarios, " +
      s"${outcomes.count(_.ok)} clean, ${bad.size} failed")
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
