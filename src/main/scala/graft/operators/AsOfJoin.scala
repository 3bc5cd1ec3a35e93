package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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
    *
    * All attach columns are swept as ONE struct so every attached value
    * comes from the SAME latest right row, and a NULL inside that row
    * propagates as NULL instead of being skipped in favor of a stale
    * older row (per-column `last(ignoreNulls)` would do exactly that,
    * deviating from native ASOF JOIN semantics).
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      attach: Seq[String]): DataFrame = {

    val leftCols = left.columns
    val packType = StructType(attach.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    // shared layout: left columns ++ __asof_s (struct of attach cols) ++ __tag
    val lSel = left.select(
      (leftCols.map(col) :+
        lit(null).cast(packType).as("__asof_s") :+
        lit(1).as("__tag")).toIndexedSeq: _*)
    val rSel = right.select(
      (leftCols.map { c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+
        struct(attach.map(c => col(c).as(c)): _*).as("__asof_s") :+
        lit(0).as("__tag")).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // the struct is non-null exactly on right rows, so last(ignoreNulls)
    // lands on the latest right row as a UNIT; inner fields may be NULL
    val swept = lSel.unionByName(rSel)
      .withColumn("__asof_hit", last(col("__asof_s"), ignoreNulls = true).over(w))
      .select(
        ((leftCols.map(col) :+ col("__tag")) ++
          attach.map(c => col(s"__asof_hit.$c").as(s"asof_$c"))).toIndexedSeq: _*)

    swept.filter(col("__tag") === 1).drop("__tag")
  }
}
