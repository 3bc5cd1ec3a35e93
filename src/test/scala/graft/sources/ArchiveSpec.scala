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
