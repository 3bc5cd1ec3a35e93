package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the latest right row with
  * `right.ts <= left.ts` per key — the standard event-enrichment join
  * (trade↔quote, click↔view) that plain SQL joins can't express
  * without a per-row subquery.
  *
  * Composed from built-ins (the SURVEY §4 preference order): tag and
  * union both sides, then one `last(value, ignoreNulls) OVER
  * (PARTITION BY keys ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)`
  * window. At scale that is ONE shuffle on the key columns and a
  * sorted within-partition sweep — the same cost envelope as the
  * dedicated merge-join implementations in kdb/DuckDB/Flink, with
  * Spark's window machinery handling spill. Right rows order before
  * left rows at equal ts (tag 0 < 1), giving `>=` semantics.
  */
object AsOfJoin {

  /** Left as-of join. Attached right columns surface as `asof_<name>`
    * (NULL when no right row precedes the left row).
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      attach: Seq[String]): DataFrame = {

    val leftCols = left.columns
    // shared layout: left columns ++ __asof_<attach> ++ __tag
    val lSel = left.select(
      (leftCols.map(col) ++
        attach.map(c => lit(null).cast(right.schema(c).dataType).as(s"__asof_$c")) :+
        lit(1).as("__tag")).toIndexedSeq: _*)
    val rSel = right.select(
      (leftCols.map { c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        attach.map(c => col(c).as(s"__asof_$c")) :+
        lit(0).as("__tag")).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val swept = lSel.unionByName(rSel).select(
      ((leftCols.map(col) :+
        col("__tag")) ++
        attach.map(c => last(col(s"__asof_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c"))).toIndexedSeq: _*)

    swept.filter(col("__tag") === 1).drop("__tag")
  }
}
