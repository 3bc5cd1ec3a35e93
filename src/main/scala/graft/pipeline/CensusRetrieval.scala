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
          val raw = BunnySources.readCensusXlsx(spark, path)
          // processCensus re-applies the reference's validation (the
          // missing-FIPS guard) and throws on a wrong vintage — that is
          // exactly the walk-back condition, not a fatal error, until
          // the floor year is exhausted
          try return Vintage(BunnyHopFlow.processCensus(raw, maxMissing), year)
          catch {
            case e: IllegalStateException =>
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
