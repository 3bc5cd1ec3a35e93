package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins every [[SourceChaosProbe]] scenario's adjudication: each
  * hostile FILE fed to a from-spec reader must fail LOUDLY with the
  * file/URL context (verdict Loud) — never parse garbage (Garbage),
  * never die with a context-free low-level error (Opaque), never with
  * a message missing the expected diagnostic token (WrongMessage).
  * One test per scenario so a regression names the exact reader and
  * corruption that went quiet. Pure JVM — no SparkSession.
  */
class SourceChaosSpec extends AnyFunSuite {

  SourceChaosProbe.scenarios().foreach { s =>
    test(s"${s.reader}: ${s.name} fails loudly") {
      SourceChaosProbe.adjudicate(s) match {
        case SourceChaosProbe.Loud(_) => // pinned policy upheld
        case SourceChaosProbe.Garbage(r) =>
          fail(s"reader returned data from a corrupt file: $r")
        case SourceChaosProbe.Opaque(e) =>
          fail(s"opaque low-level error (no file context): " +
            s"${e.getClass.getName}: ${e.getMessage}")
        case SourceChaosProbe.WrongMessage(m, wanted) =>
          fail(s"loud but missing the diagnostic token '$wanted': $m")
      }
    }
  }

  test("shp/dbf record-count mismatch names both files and counts") {
    // the cross-file consistency require in Shapefile.read's row
    // builder — corrupt the .dbf record count to a SMALLER still-valid
    // value so both parsers succeed and only the pairing check can
    // catch the disagreement. Exercised via the probe fixtures.
    val dir = java.nio.file.Files.createTempDirectory("graft_srcchaos_pair_")
    try {
      java.nio.file.Files.write(dir.resolve("t.shp"), SourceChaosProbe.validShp())
      java.nio.file.Files.write(dir.resolve("t.dbf"), SourceChaosProbe.validDbf(2))
      val spark = graft.GraftSession.builder("srcchaos-pair")
        .master("local[2]").getOrCreate()
      val e = intercept[Exception] {
        graft.sources.Shapefile.read(spark, dir.resolve("t").toString).collect()
      }
      val m = e.getMessage
      assert(m.contains("1 records") && m.contains("2"),
        s"mismatch message must carry both counts: $m")
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}
