package graft.tools

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{Archive, FeatureService, Shapefile, XlsxReader}

/** Hostile-SOURCE chaos probe (r17 verdict task 1): the r17 chaos
  * program fed the operators hostile ROWS; this one feeds the
  * from-spec I/O readers hostile FILES — truncated shapefile records,
  * dBASE headers whose declared sizes overrun (or under-run) the
  * actual bytes, xlsx workbooks with torn shared-strings tables, zip
  * archives with corrupt members, and feature-service pagination that
  * turns hostile mid-fetch (the ArcGIS HTTP-200-error-page trap).
  *
  * Policy being adjudicated: a corrupt FILE — unlike a corrupt row —
  * is a whole ingestion unit, so every scenario must fail LOUDLY with
  * a message naming the file/URL and what disagreed. Three verdicts:
  *  - LOUD    expected: IllegalArgument/IllegalState naming the context
  *  - GARBAGE the reader returned data from a corrupt file (worst case:
  *            silent corruption enters the pipeline)
  *  - OPAQUE  it threw, but a raw AIOOBE / BufferUnderflow / NPE / SAX
  *            error with no file context (undebuggable at 100k files)
  *
  * Pure JVM — none of the probed entry points need a SparkSession.
  * `SourceChaosSpec` pins every scenario's verdict; this main is the
  * runnable end-state report (COVERAGE.md records the output).
  *
  * Usage: `sbt "runMain graft.tools.SourceChaosProbe"`.
  */
object SourceChaosProbe {

  final case class Scenario(reader: String, name: String,
      expectToken: String, run: () => Any)

  sealed trait Verdict { def ok: Boolean }
  final case class Loud(msg: String) extends Verdict { def ok = true }
  final case class Garbage(returned: String) extends Verdict { def ok = false }
  final case class Opaque(e: Throwable) extends Verdict { def ok = false }
  final case class WrongMessage(msg: String, wanted: String) extends Verdict { def ok = false }

  def adjudicate(s: Scenario): Verdict =
    try {
      val r = s.run()
      Garbage(String.valueOf(r).take(80))
    } catch {
      case e @ (_: IllegalArgumentException | _: IllegalStateException) =>
        val m = String.valueOf(e.getMessage)
        if (m.contains(s.expectToken)) Loud(m) else WrongMessage(m, s.expectToken)
      case e: Throwable => Opaque(e)
    }

  // ---- minimal VALID fixtures, built from the same public specs the
  // readers implement, then doctored per scenario --------------------

  /** 100-byte header + one Point record (128 bytes, spec-exact). */
  private[graft] def validShp(): Array[Byte] = {
    val b = ByteBuffer.allocate(128)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994)                 // magic
    b.putInt(24, 64)                  // file length: 128 bytes = 64 words
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1000)                // version
    b.putInt(32, 1)                   // shape type: Point
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(100, 1)                  // record number
    b.putInt(104, 10)                 // content words: 20 bytes
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(108, 1)                  // Point
    b.putDouble(112, 1.5)
    b.putDouble(120, 2.5)
    b.array()
  }

  /** One Polygon record with doctored interior counts: header-level
    * sizes all consistent, corruption INSIDE the record content —
    * the class only the parser's own guards can see.
    */
  private[tools] def polyShp(numParts: Int, numPoints: Int,
      actualPoints: Int): Array[Byte] = {
    val content = 4 + 32 + 8 + 4 * math.max(numParts, 0) + 16 * actualPoints
    require(content % 2 == 0)
    val total = 100 + 8 + content
    val b = ByteBuffer.allocate(total)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994)
    b.putInt(24, total / 2)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1000)
    b.putInt(32, 5)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(100, 1)
    b.putInt(104, content / 2)
    b.order(ByteOrder.LITTLE_ENDIAN)
    var off = 108
    b.putInt(off, 5); off += 4        // shape type Polygon
    off += 32                         // bbox zeros
    b.putInt(off, numParts); off += 4
    b.putInt(off, numPoints); off += 4
    (0 until math.max(numParts, 0)).foreach { i => b.putInt(off, 0); off += 4 }
    (0 until actualPoints).foreach { i =>
      b.putDouble(off, i.toDouble); b.putDouble(off + 8, i.toDouble); off += 16
    }
    b.array()
  }

  /** 32-byte prologue + one 'NAME' C(4) descriptor + 0x0d + records. */
  private[graft] def validDbf(numRecords: Int = 2): Array[Byte] = {
    val headerSize = 32 + 32 + 1
    val recordSize = 1 + 4
    val b = ByteBuffer.allocate(headerSize + numRecords * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(0, 0x03.toByte)
    b.putInt(4, numRecords)
    b.putShort(8, headerSize.toShort)
    b.putShort(10, recordSize.toShort)
    "NAME".getBytes("ISO-8859-1").zipWithIndex.foreach { case (c, i) => b.put(32 + i, c) }
    b.put(32 + 11, 'C'.toByte)
    b.put(32 + 16, 4.toByte)
    b.put(64, 0x0d.toByte)
    (0 until numRecords).foreach { r =>
      val off = headerSize + r * recordSize
      b.put(off, ' '.toByte)
      s"ab$r ".getBytes("ISO-8859-1").zipWithIndex.foreach { case (c, i) =>
        b.put(off + 1 + i, c) }
    }
    b.put(headerSize + numRecords * recordSize, 0x1a.toByte)
    b.array()
  }

  /** Minimal xlsx: a zip with sharedStrings + sheet1, both overridable
    * so scenarios can tear either part.
    */
  private[tools] def xlsx(dir: Path, name: String,
      shared: String = "<sst><si><t>hello</t></si></sst>",
      sheet: String =
        """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row></sheetData></worksheet>"""): Path = {
    val p = dir.resolve(name)
    val z = new ZipOutputStream(Files.newOutputStream(p))
    try {
      z.putNextEntry(new ZipEntry("xl/sharedStrings.xml"))
      z.write(shared.getBytes("UTF-8")); z.closeEntry()
      z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      z.write(sheet.getBytes("UTF-8")); z.closeEntry()
    } finally z.close()
    p
  }

  /** A zip with one sizeable member (compressible payload so the
    * deflate stream has room to corrupt without touching structure).
    */
  private[tools] def zipWithMember(dir: Path, name: String, member: String): Path = {
    val p = dir.resolve(name)
    val z = new ZipOutputStream(Files.newOutputStream(p))
    try {
      z.putNextEntry(new ZipEntry(member))
      z.write(("the quick brown fox " * 600).getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close()
    p
  }

  private def write(dir: Path, name: String, bytes: Array[Byte]): String = {
    val p = dir.resolve(name); Files.write(p, bytes); p.toString
  }

  private def doctored(bytes: Array[Byte])(f: ByteBuffer => Unit): Array[Byte] = {
    val c = bytes.clone()
    f(ByteBuffer.wrap(c).order(ByteOrder.LITTLE_ENDIAN))
    c
  }

  // ---- GeoJSON pages for the feature-service scenarios --------------

  private def featurePage(ids: Seq[Int]): String = {
    val feats = ids.map { i =>
      s"""{"type":"Feature","properties":{"id":"$i"},"geometry":{"type":"Polygon",
         |"coordinates":[[[0,0],[0,1],[1,1],[0,0]]]}}""".stripMargin.replace("\n", "")
    }
    s"""{"type":"FeatureCollection","features":[${feats.mkString(",")}]}"""
  }
  private val emptyPage = """{"type":"FeatureCollection","features":[]}"""

  /** fetch stub: pages served by resultOffset; URLs not in the map get
    * the empty page (end of layer).
    */
  private def paged(pages: Map[Int, String]): String => String = { url =>
    val off = "resultOffset=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toInt).getOrElse(0)
    pages.getOrElse(off, emptyPage)
  }

  def scenarios(): Seq[Scenario] = {
    val dir = graft.TempDirs.register(Files.createTempDirectory("graft_srcchaos_"))
    val shp = validShp()
    val dbf = validDbf()
    Seq(
      // ---------------- .shp ----------------
      Scenario("shp", "valid baseline parses (sanity)", "IMPOSSIBLE", () => {
        val g = Shapefile.readShp(write(dir, "ok.shp", shp))
        require(g.length == 1 && g.head.toText.startsWith("POINT"),
          s"baseline broken: $g")
        throw new IllegalArgumentException("IMPOSSIBLE (baseline parsed 1 point)")
      }),
      Scenario("shp", "bad magic", "bad magic", () =>
        Shapefile.readShp(write(dir, "magic.shp",
          doctored(shp)(_.order(ByteOrder.BIG_ENDIAN).putInt(0, 1234))))),
      Scenario("shp", "shorter than the 100-byte header", "100-byte", () =>
        Shapefile.readShp(write(dir, "tiny.shp", shp.take(60)))),
      Scenario("shp", "truncated mid-record (declared > actual)", "truncated", () =>
        Shapefile.readShp(write(dir, "trunc.shp", shp.take(110)))),
      // r19 policy change (r18 advisor): benign trailing padding past
      // the header-declared length is TOLERATED (warn + parse exactly
      // the declared extent) — exporters pad, and the old both-ways
      // strictness rejected real-world files. The padding must neither
      // kill the parse nor be read as phantom records.
      Scenario("shp", "trailing bytes past the declared length parse (warn, ignored)",
        "IMPOSSIBLE", () => {
        val g = Shapefile.readShp(
          write(dir, "trail.shp", shp ++ Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
        require(g.length == 1 && g.head.toText.startsWith("POINT"),
          s"padding policy broken: $g")
        throw new IllegalArgumentException(
          "IMPOSSIBLE (padding ignored, 1 point parsed)")
      }),
      Scenario("shp", "declared length cuts off a whole record (record-sized slack)",
        "cuts off trailing records", () =>
        // fileWords=50 → declared 100 bytes on a 128-byte file: the 28
        // bytes of slack are a whole record — under the BOUNDED
        // padding policy (r20, r19 advisor) record-sized slack is a
        // corrupt length field dropping data, and must stay fatal
        Shapefile.readShp(write(dir, "cutlen.shp",
          doctored(shp)(_.order(ByteOrder.BIG_ENDIAN).putInt(24, 50))))),
      Scenario("shp", "declared length below the 100-byte header", "corrupt length field", () =>
        // fileWords=10 → declared 20 bytes: under the lenient padding
        // policy this must stay FATAL (a zeroed length field would
        // otherwise silently parse zero records — r19 review finding)
        Shapefile.readShp(write(dir, "shortlen.shp",
          doctored(shp)(_.order(ByteOrder.BIG_ENDIAN).putInt(24, 10))))),
      Scenario("shp", "record content words overrun the file", "overruns", () =>
        Shapefile.readShp(write(dir, "overrun.shp",
          doctored(shp)(_.order(ByteOrder.BIG_ENDIAN).putInt(104, 5000))))),
      Scenario("shp", "negative record content words", "overruns", () =>
        Shapefile.readShp(write(dir, "negrec.shp",
          doctored(shp)(_.order(ByteOrder.BIG_ENDIAN).putInt(104, -10))))),
      Scenario("shp", "polygon record with negative numPoints", "negative counts", () =>
        Shapefile.readShp(write(dir, "negpts.shp", polyShp(1, -4, 4)))),
      Scenario("shp", "polygon numPoints overruns its record", "remain", () =>
        Shapefile.readShp(write(dir, "ptsover.shp", polyShp(1, 1000, 4)))),
      Scenario("shp", "unsupported shape type carries file+record context",
        "record 1 at offset 100", () =>
        Shapefile.readShp(write(dir, "badtype.shp",
          doctored(shp)(_.putInt(108, 99))))),
      Scenario("shp", "polygon ring JTS rejection carries file+record context",
        "record 1 at offset 100", () =>
        // 2-point ring: sizes all consistent, JTS refuses the ring —
        // the wrapper must still name the file/record/offset
        Shapefile.readShp(write(dir, "shortring.shp", polyShp(1, 2, 2)))),
      Scenario("shp", "record too short for its shape type", "too short", () => {
        // Point record with only the 4-byte type (contentWords=2):
        // sizes consistent at file level, content lies about its type
        val b = ByteBuffer.allocate(112)
        b.order(ByteOrder.BIG_ENDIAN).putInt(0, 9994).putInt(24, 56)
        b.order(ByteOrder.LITTLE_ENDIAN).putInt(28, 1000).putInt(32, 1)
        b.order(ByteOrder.BIG_ENDIAN).putInt(100, 1).putInt(104, 2)
        b.order(ByteOrder.LITTLE_ENDIAN).putInt(108, 1) // Point, but no coords
        Shapefile.readShp(write(dir, "short.shp", b.array()))
      }),
      // ---------------- .dbf ----------------
      Scenario("dbf", "valid baseline parses (sanity)", "IMPOSSIBLE", () => {
        val (schema, rows) = Shapefile.readDbf(write(dir, "ok.dbf", dbf))
        require(schema.map(_.name) == Seq("NAME") && rows.length == 2,
          s"baseline broken: $schema / $rows")
        throw new IllegalArgumentException("IMPOSSIBLE (baseline parsed 2 rows)")
      }),
      Scenario("dbf", "declared records overrun the file", "overruns", () =>
        Shapefile.readDbf(write(dir, "count.dbf",
          doctored(dbf)(_.putInt(4, 50000))))),
      Scenario("dbf", "declared record size overruns the file", "overruns", () =>
        Shapefile.readDbf(write(dir, "recsz.dbf",
          doctored(dbf)(_.putShort(10, 4096.toShort))))),
      Scenario("dbf", "hostile count x size overflows Int", "overruns", () =>
        Shapefile.readDbf(write(dir, "ovf.dbf",
          doctored(dbf) { b => b.putInt(4, 1 << 30); b.putShort(10, 16384.toShort) }))),
      Scenario("dbf", "record size zero", "record size 0", () =>
        Shapefile.readDbf(write(dir, "zerosz.dbf",
          doctored(dbf)(_.putShort(10, 0.toShort))))),
      Scenario("dbf", "field widths exceed the record size (silent cross-record reads)",
        "descriptors and records disagree", () =>
        Shapefile.readDbf(write(dir, "wide.dbf",
          doctored(dbf)(_.put(32 + 16, 40.toByte))))),
      Scenario("dbf", "header size past the file", "out of range", () =>
        Shapefile.readDbf(write(dir, "hdr.dbf",
          doctored(dbf)(_.putShort(8, 30000.toShort))))),
      Scenario("dbf", "header size past the file (schema probe)", "out of range", () =>
        Shapefile.readDbfSchema(write(dir, "hdr2.dbf",
          doctored(dbf)(_.putShort(8, 30000.toShort))))),
      Scenario("dbf", "partial field descriptor (header not 32+32k+1)",
        "partial field descriptor", () =>
        Shapefile.readDbf(write(dir, "partial.dbf",
          doctored(dbf) { b =>
            b.putShort(8, 50.toShort)   // mid-descriptor terminator position
            b.put(49, 0x41.toByte)      // ensure no 0x0d stops the walk early
          }))),
      Scenario("dbf", "shorter than the minimal header", "minimal dBASE header", () =>
        Shapefile.readDbf(write(dir, "tiny.dbf", dbf.take(20)))),
      // ---------------- xlsx ----------------
      Scenario("xlsx", "valid baseline parses (sanity)", "IMPOSSIBLE", () => {
        val rows = XlsxReader.readRows(xlsx(dir, "ok.xlsx").toString)
        require(rows == Seq(Seq("hello")), s"baseline broken: $rows")
        throw new IllegalArgumentException("IMPOSSIBLE (baseline parsed)")
      }),
      Scenario("xlsx", "not a zip at all", "zip container rejected", () =>
        XlsxReader.readRows(write(dir, "garbage.xlsx",
          Array.tabulate[Byte](512)(i => (i * 7).toByte)))),
      Scenario("xlsx", "truncated workbook (central directory gone)",
        "zip container rejected", () => {
        val ok = Files.readAllBytes(xlsx(dir, "full.xlsx"))
        XlsxReader.readRows(write(dir, "cut.xlsx", ok.take(ok.length / 2)))
      }),
      Scenario("xlsx", "torn sharedStrings XML", "corrupt xl/sharedStrings.xml", () =>
        XlsxReader.readRows(
          xlsx(dir, "tornss.xlsx", shared = "<sst><si><t>a</t>").toString)),
      Scenario("xlsx", "shared-string index past the table", "out of range", () =>
        XlsxReader.readRows(xlsx(dir, "ssidx.xlsx",
          sheet = """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>99</v></c></row></sheetData></worksheet>""").toString)),
      Scenario("xlsx", "non-numeric shared-string index", "non-numeric", () =>
        XlsxReader.readRows(xlsx(dir, "ssnan.xlsx",
          sheet = """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>abc</v></c></row></sheetData></worksheet>""").toString)),
      Scenario("xlsx", "torn sheet XML", "corrupt xl/worksheets/sheet1.xml", () =>
        XlsxReader.readRows(xlsx(dir, "tornsheet.xlsx",
          sheet = "<worksheet><sheetData><row").toString)),
      // ---------------- zip archive ----------------
      Scenario("zip", "valid baseline extracts (sanity)", "IMPOSSIBLE", () => {
        val z = zipWithMember(dir, "ok.zip", "Text/data.txt")
        val out = Archive.extractZipMember(z.toString, "Text/data.txt", dir)
        require(Files.size(out) == 20 * 600, "baseline broken")
        throw new IllegalArgumentException("IMPOSSIBLE (baseline extracted)")
      }),
      Scenario("zip", "truncated archive", "not a readable zip", () => {
        val ok = Files.readAllBytes(zipWithMember(dir, "full.zip", "Text/data.txt"))
        Archive.extractZipMember(
          write(dir, "cut.zip", ok.take(ok.length / 2)), "Text/data.txt", dir)
      }),
      Scenario("zip", "member deflate stream corrupted (local/central disagree)",
        "corrupt member", () => {
        val ok = Files.readAllBytes(zipWithMember(dir, "good.zip", "Text/data.txt"))
        // flip bytes inside the compressed data: local header is
        // 30 + len("Text/data.txt") = 43 bytes; corrupt well past it
        val bad = ok.clone()
        (60 until 70).foreach(i => bad(i) = (bad(i) ^ 0xff).toByte)
        val extractDir = Files.createDirectories(dir.resolve("torn_out"))
        try Archive.extractZipMember(
          write(dir, "badmember.zip", bad), "Text/data.txt", extractDir)
        finally {
          // the POLICY half: no torn extraction may remain at the
          // published path (tmp siblings are cleaned by the extractor)
          require(!Files.exists(extractDir.resolve("data.txt")),
            "GARBAGE: torn extraction left at the published path")
        }
      }),
      // ---------------- feature service ----------------
      Scenario("featureservice", "valid two-page fetch (sanity)", "IMPOSSIBLE", () => {
        val rows = FeatureService.fetchAll(
          paged(Map(0 -> featurePage(1 to 3), 3 -> featurePage(4 to 5))), "http://svc", 3)
        require(rows.length == 5, s"baseline broken: ${rows.length}")
        throw new IllegalArgumentException("IMPOSSIBLE (baseline fetched 5)")
      }),
      Scenario("featureservice", "HTTP-200 error page mid-pagination",
        "error page", () =>
        FeatureService.fetchAll(
          paged(Map(0 -> featurePage(1 to 3),
            3 -> """{"error":{"code":500,"message":"Unable to complete operation"}}""")),
          "http://svc", 3)),
      Scenario("featureservice", "malformed JSON mid-pagination",
        "not parseable JSON", () =>
        FeatureService.fetchAll(
          paged(Map(0 -> featurePage(1 to 3), 3 -> """{"features":[{""")),
          "http://svc", 3)),
      Scenario("featureservice", "valid JSON but not a FeatureCollection",
        "no 'features' array", () =>
        FeatureService.fetchAll(
          paged(Map(0 -> featurePage(1 to 3), 3 -> """{"html":"<body>503</body>"}""")),
          "http://svc", 3)),
      Scenario("featureservice", "corrupt geometry mid-page (2-point ring)",
        "corrupt geometry", () =>
        FeatureService.fetchAll(
          paged(Map(0 -> ("""{"type":"FeatureCollection","features":[""" +
            """{"type":"Feature","properties":{"id":"1"},"geometry":""" +
            """{"type":"Polygon","coordinates":[[[0,0],[1,1]]]}}]}"""))),
          "http://svc", 3)),
      Scenario("featureservice", "error page carries the URL and offset",
        "resultOffset=3", () =>
        FeatureService.fetchAll(
          paged(Map(0 -> featurePage(1 to 3), 3 -> """{"error":{"code":500}}""")),
          "http://svc", 3))
    )
  }

  def main(args: Array[String]): Unit = {
    var fails = 0
    val all = scenarios()
    all.foreach { s =>
      val v = adjudicate(s)
      val tag = v match {
        case Loud(m)            => s"LOUD    $m"
        case Garbage(r)         => fails += 1; s"GARBAGE returned: $r"
        case Opaque(e)          => fails += 1; s"OPAQUE  ${e.getClass.getSimpleName}: ${e.getMessage}"
        case WrongMessage(m, w) => fails += 1; s"WRONGMSG wanted '$w' in: $m"
      }
      println(f"[srcchaos] ${s.reader}%-15s ${s.name}%-58s ${tag.take(160)}")
    }
    println(s"[srcchaos] ${all.size} scenarios, $fails failures")
    if (fails > 0) sys.exit(1)
  }
}
