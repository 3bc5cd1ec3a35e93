package graft.sources

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkTestBase

/** OP-01/OP-02 retrieval utilities: chunked download + zip member
  * extraction, chained into a GNIS-shaped read.
  */
class ArchiveSpec extends SparkTestBase {

  test("download streams through the injected transport in chunks") {
    val payload = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val dest = Files.createTempFile("dl_", ".bin")
    Archive.download(_ => payload, "http://example/gnis.zip", dest, chunkSize = 4096)
    assert(Files.readAllBytes(dest).toSeq == payload.toSeq)
  }

  test("zip member extraction + pipe-CSV read (the GNIS retrieval chain)") {
    val gnis = "feature_id|feature_name|feature_class|state_name|census_class_code\n" +
      "1|City of Alameda|Civil|California|C1\n" +
      "2|Nevada Town|Civil|Nevada|H1\n"
    val zip = Files.createTempFile("gnis_", ".zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new ZipEntry("Text/FederalCodes_CA.txt"))
    zos.write(gnis.getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("Text/README.txt"))
    zos.write("ignore".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()

    val outDir = Files.createTempDirectory("gnis_out")
    val extracted = Archive.extractZipMember(zip.toString, "Text/FederalCodes_CA.txt", outDir)
    val df = spark.read.option("sep", "|").option("header", "true").csv(extracted.toString)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq(
      "feature_id", "feature_name", "feature_class", "state_name", "census_class_code"))
    val ca = df.filter(df("state_name") === "California").collect()
    assert(ca.length == 1 && ca(0).getAs[String]("feature_name") == "City of Alameda")
  }

  test("xlsx: data rows wider than the header keep trailing cells as Unnamed columns") {
    // pandas surfaces an unlabeled trailing column as 'Unnamed: N';
    // the shim used to silently DROP every cell of it (r20 review)
    val shared = "<sst>" +
      Seq("a", "b", "x1", "y1", "z1", "x2", "y2", "z2")
        .map(s => s"<si><t>$s</t></si>").mkString + "</sst>"
    def row(r: Int, cells: Seq[Int]): String =
      s"""<row r="$r">""" + cells.zipWithIndex.map { case (si, c) =>
        s"""<c r="${('A' + c).toChar}$r" t="s"><v>$si</v></c>"""
      }.mkString + "</row>"
    val sheet = "<worksheet><sheetData>" +
      row(1, Seq(0, 1)) +            // header: 2 cells
      row(2, Seq(2, 3, 4)) +         // data: 3 cells — one unlabeled
      row(3, Seq(5, 6, 7)) +
      "</sheetData></worksheet>"
    val p = Files.createTempFile("wide_", ".xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(p))
    try {
      zos.putNextEntry(new ZipEntry("xl/sharedStrings.xml"))
      zos.write(shared.getBytes("UTF-8")); zos.closeEntry()
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(sheet.getBytes("UTF-8")); zos.closeEntry()
    } finally zos.close()
    val df = XlsxReader.toDataFrame(spark, p.toString)
    assert(df.columns.toSeq == Seq("a", "b", "Unnamed: 2"))
    val got = df.orderBy("a").collect().map(_.toSeq)
    assert(got.toSeq == Seq(Seq("x1", "y1", "z1"), Seq("x2", "y2", "z2")))
  }

  test("missing zip member raises with the member listing") {
    val zip = Files.createTempFile("empty_", ".zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new ZipEntry("other.txt")); zos.write(1); zos.closeEntry(); zos.close()
    val e = intercept[IllegalArgumentException] {
      Archive.extractZipMember(zip.toString, "nope.txt", Files.createTempDirectory("x"))
    }
    assert(e.getMessage.contains("other.txt"))
  }
}
