package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.BunnySources

/** OP-51 — census year-probing retrieval (`retrieve.py:61-95`).
  *
  * The census vintage URL embeds the year and the new vintage appears
  * at an unannounced point in the year, so retrieval probes DOWNWARD
  * from the current year: HEAD-check the vintage URL (404 → prior
  * year), download + parse the workbook, validate it with the
  * missing-FIPS guard (`retrieve.py:108-117`; a vintage with more than
  * `maxMissing` all-blank-FIPS California rows is malformed or
  * restructured → prior year), and stop at the 2023 floor
  * (`config.py:132` — if 2023 fails, STOP). This is what lets the
  * January run survive the gap before the new vintage publishes.
  *
  * `fetch` abstracts the network step (HEAD + streamed GET →
  * temp-file path, `retrieve.py:51-58`): `None` for a 404'd year,
  * `Some(localXlsxPath)` on success — injectable for offline tests
  * and for cluster-side retrieval caches.
  */
object CensusRetrieval {

  val EarliestYear = 2023

  def urlForYear(year: Int): String =
    s"https://www2.census.gov/programs-surveys/popest/geographies/$year/all-geocodes-v$year.xlsx"

  /** The validated, processed census branch plus the vintage year that
    * satisfied the checks.
    */
  final case class Vintage(census: DataFrame, year: Int)

  def retrieve(
      spark: SparkSession,
      currentYear: Int,
      fetch: Int => Option[String],
      earliestYear: Int = EarliestYear,
      maxMissing: Long = 5): Vintage = {
    var year = currentYear
    val failures = Seq.newBuilder[String]
    while (year >= earliestYear) {
      fetch(year) match {
        case Some(path) =>
          // the WHOLE vintage attempt — download parse AND validation —
          // is a walk-back condition, not a fatal error, until the
          // floor year is exhausted: a URL that HEAD-checks 200 can
          // still serve a half-written workbook or an HTML error page
          // (ZipException, "no sheet1"), and a restructured sheet can
          // fail anywhere in processCensus (AnalysisException on a
          // renamed column), not only at the missing-FIPS guard. Any of
          // those on the NEWEST vintage must fall back to the prior
          // year — that survival is this module's whole purpose.
          try {
            val raw = BunnySources.readCensusXlsx(spark, path)
            return Vintage(BunnyHopFlow.processCensus(raw, maxMissing), year)
          } catch {
            case scala.util.control.NonFatal(e) =>
              failures += s"$year: ${e.getMessage}"
          }
        case None =>
          failures += s"$year: not published (HEAD 404)"
      }
      year -= 1
    }
    throw new IllegalStateException(
      s"couldn't retrieve census data for any year in $earliestYear..$currentYear " +
        s"(${failures.result().mkString("; ")}) — URL structure changed?")
  }
}
