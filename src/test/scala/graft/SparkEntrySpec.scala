package graft

/** The driver contract itself: entry() runs and returns rows, every
  * query key has a runnable body, and every oracle key has a matching
  * query (the driver joins them by name).
  */
class SparkEntrySpec extends SparkTestBase {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracle key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query body: $orphans")
  }

  test("query names are unique across groups") {
    val specs = Seq(
      queries.CorpusQueries.all, queries.GeomQueries.all,
      queries.ExtQueries.all, queries.PipelineQueries.all).flatten
    val dupes = specs.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }
}
