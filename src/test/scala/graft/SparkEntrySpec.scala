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

  test("valuesTable stays valid SQL for an EMPTY golden (zero-row TSV)") {
    // surfaced regenerating goldens at sf0.1 (r14): a golden family
    // with no pairs at some scale must oracle as an empty typed
    // table, not a "(VALUES )" parse error
    val sql = queries.Goldens.valuesTable("empty_test.tsv",
      Seq("a" -> "BIGINT", "b" -> "DOUBLE"))
    assert(sql.contains("WHERE false") && sql.contains("CAST(NULL AS BIGINT) AS a"),
      sql)
    // and a non-empty golden still renders the VALUES form
    assert(queries.Goldens.valuesTable("x08_ann_lsh.tsv",
      Seq("vec_id" -> "BIGINT", "cosine" -> "DOUBLE")).contains("(VALUES"))
  }

  test("query names are unique across groups") {
    val specs = Seq(
      queries.CorpusQueries.all, queries.GeomQueries.all,
      queries.ExtQueries.all, queries.PipelineQueries.all).flatten
    val dupes = specs.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }

  test("every declared QuerySpec val is registered in its group's all list") {
    // the `all` lists are maintained by hand; a declared-but-unlisted
    // spec would silently vanish from the driver sweep
    def declared(obj: AnyRef): Set[String] =
      obj.getClass.getMethods
        .filter(m => m.getReturnType == classOf[queries.QuerySpec] &&
          m.getParameterCount == 0)
        .map(_.invoke(obj).asInstanceOf[queries.QuerySpec].name).toSet
    val groups: Seq[(String, AnyRef, Seq[queries.QuerySpec])] = Seq(
      ("CorpusQueries", queries.CorpusQueries, queries.CorpusQueries.all),
      ("GeomQueries", queries.GeomQueries, queries.GeomQueries.all),
      ("ExtQueries", queries.ExtQueries, queries.ExtQueries.all),
      ("PipelineQueries", queries.PipelineQueries, queries.PipelineQueries.all))
    groups.foreach { case (name, obj, all) =>
      val missing = declared(obj) -- all.map(_.name).toSet
      assert(missing.isEmpty, s"$name: declared but not in `all`: $missing")
    }
  }
}
