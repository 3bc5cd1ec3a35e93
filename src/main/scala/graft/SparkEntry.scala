package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{CorpusQueries, ExtQueries, GeomQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the declared-query corpus
  * (SURVEY §2.13) plus the extension-operator queries (SURVEY §2.12).
  * Keys present in `queries` but not `oracleSql` get the driver's
  * weaker rows-only check (used for ops DuckDB cannot express, e.g.
  * MinHash-LSH near-dup or JTS geometry).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Dissolve-shaped aggregation with a broadcast dim join (the two
    * plan shapes the whole engine is built around).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"), "left")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        countDistinct(col("p_brand")).as("brands"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // lazy val, and name-uniqueness asserted ONCE: toMap silently
  // collapses duplicate keys, so two specs accidentally sharing a name
  // would drop one query from bench, verify, AND the oracle set with
  // no error — coverage shrinking invisibly
  private lazy val specs = {
    val all =
      CorpusQueries.all ++ GeomQueries.all ++ ExtQueries.all ++ PipelineQueries.all
    val dups = all.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(sp => sp.name -> sp.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    specs.flatMap(sp => sp.oracle.map(sp.name -> _)).toMap
}
