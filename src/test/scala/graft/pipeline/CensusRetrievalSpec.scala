package graft.pipeline

import graft.SparkTestBase

/** OP-51 year walk-back (`retrieve.py:61-95`): probe downward from the
  * current year, skip unpublished vintages, reject invalid ones via
  * the missing-FIPS guard, stop at the floor.
  */
class CensusRetrievalSpec extends SparkTestBase {

  private def fixture: String =
    getClass.getResource("/bunnyhop/census_geocodes.xlsx").getPath

  test("walks back past a 404'd current year to the latest published vintage") {
    val probed = scala.collection.mutable.ArrayBuffer.empty[Int]
    val v = CensusRetrieval.retrieve(spark, currentYear = 2026,
      fetch = { y => probed += y; if (y <= 2025) Some(fixture) else None })
    assert(v.year == 2025)
    assert(probed.toSeq == Seq(2026, 2025), "must probe newest-first, stopping at the hit")
    // the returned branch is the processed one (validated + statewide
    // record dropped + GEOID derived), same as the direct pipeline path
    val direct = BunnyHopFlow.processCensus(
      graft.sources.BunnySources.readCensusXlsx(spark, fixture))
    assert(v.census.collect().toSeq == direct.collect().toSeq)
  }

  test("a published but invalid vintage walks back too (validation failure)") {
    val probed = scala.collection.mutable.ArrayBuffer.empty[Int]
    // maxMissing = -1 makes the guard reject every workbook (the
    // fixture has the expected statewide blank-FIPS row), standing in
    // for a restructured vintage: retrieval must try every year down
    // to the floor, then refuse
    val e = intercept[IllegalStateException] {
      CensusRetrieval.retrieve(spark, currentYear = 2025,
        fetch = { y => probed += y; Some(fixture) }, maxMissing = -1)
    }
    assert(probed.toSeq == Seq(2025, 2024, 2023), "must stop at the 2023 floor")
    assert(e.getMessage.contains("2023"))
    assert(e.getMessage.contains("blank-FIPS"))
  }

  test("a corrupt workbook (non-validation failure) walks back instead of aborting") {
    // HEAD 200 but the body is garbage (half-written file / HTML error
    // page): the parse throws OUTSIDE the missing-FIPS guard's
    // exception type, and the walk-back must survive it — the prior
    // year's good workbook is one probe away
    val garbage = java.nio.file.Files.createTempFile("census_bad", ".xlsx")
    java.nio.file.Files.write(garbage, "<html>503 Service Unavailable</html>".getBytes)
    val v = CensusRetrieval.retrieve(spark, currentYear = 2026,
      fetch = { y => if (y == 2026) Some(garbage.toString) else Some(fixture) })
    assert(v.year == 2025)
    assert(v.census.count() > 0)
  }

  test("an empty-California vintage is rejected, not vacuously accepted") {
    // a restructured sheet whose State FIPS codes no longer match '06'
    // yields ZERO California rows; counting blank-FIPS rows over an
    // empty frame used to pass and silently publish a NULL census
    import org.apache.spark.sql.functions.lit
    val raw = graft.sources.BunnySources.readCensusXlsx(spark, fixture)
      .withColumn("State FIPS Code", lit("6"))   // numeric-cell style
    val e = intercept[IllegalStateException] {
      BunnyHopFlow.processCensus(raw)
    }
    assert(e.getMessage.contains("ZERO California rows"), e.getMessage)
  }

  test("nothing published at all reports every probed year") {
    val e = intercept[IllegalStateException] {
      CensusRetrieval.retrieve(spark, currentYear = 2024, fetch = _ => None)
    }
    assert(e.getMessage.contains("not published"))
  }
}
