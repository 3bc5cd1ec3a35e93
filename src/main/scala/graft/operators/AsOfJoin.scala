package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: attach to each left row the nearest right row per key
  * in the requested direction — the standard event-enrichment join
  * (trade↔quote, click↔view) that plain SQL joins can't express
  * without a per-row subquery.
  *
  *  - `backward` (default): latest right row with `right.ts <= left.ts`
  *  - `forward`: earliest right row with `right.ts >= left.ts`
  *  - `nearest`: whichever of the two is closer in time (ties →
  *    backward, the pandas `merge_asof` convention)
  *
  * Composed from built-ins (the SURVEY §4 preference order): tag and
  * union both sides, then ONE window sweep per direction —
  * `last(value, ignoreNulls) ROWS UNBOUNDED PRECEDING` for backward,
  * `first(value, ignoreNulls) ROWS UNBOUNDED FOLLOWING` for forward.
  * At scale that is ONE shuffle on the key columns and sorted
  * within-partition sweeps — the same cost envelope as the dedicated
  * merge-join implementations in kdb/DuckDB/Flink, with Spark's window
  * machinery handling spill (`nearest` runs both sweeps over the same
  * exchange). Tag ordering makes both directions inclusive: right rows
  * order before left rows at equal ts for backward (tag 0 < 1, ts asc),
  * and after them for forward (tag desc).
  */
object AsOfJoin {

  /** Left as-of join. Attached right columns surface as `asof_<name>`
    * (NULL when no right row matches in the direction).
    *
    * All attach columns are swept as ONE struct so every attached value
    * comes from the SAME matched right row, and a NULL inside that row
    * propagates as NULL instead of being skipped in favor of a stale
    * older row (per-column `last(ignoreNulls)` would do exactly that,
    * deviating from native ASOF JOIN semantics).
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      attach: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")

    val leftCols = left.columns
    // the matched row's ts rides inside the struct (as __rts) so
    // `nearest` can compare time distances; it is not surfaced
    val packType = StructType(attach.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)) :+
      StructField("__rts", right.schema(tsCol).dataType, nullable = true))
    // shared layout: left columns ++ __asof_s (struct of attach cols) ++ __tag
    val lSel = left.select(
      (leftCols.map(col) :+
        lit(null).cast(packType).as("__asof_s") :+
        lit(1).as("__tag")).toIndexedSeq: _*)
    // a NULL-timestamp right row can never legitimately match (the
    // direction predicate right.ts <= / >= left.ts is unknowable), but
    // it sorts NULLS FIRST under ts asc with a NON-null struct, so the
    // backward sweep would hand it to every left row that lacks an
    // earlier real match — fabricated asof_* values where native ASOF
    // JOIN (the DuckDB oracle) returns NULL. Drop them before the union.
    val rSel = right.filter(col(tsCol).isNotNull).select(
      (leftCols.map { c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+
        struct(attach.map(c => col(c).as(c)) :+ col(tsCol).as("__rts"): _*).as("__asof_s") :+
        lit(0).as("__tag")).toIndexedSeq: _*)

    val part = Window.partitionBy(keys.map(col): _*)
    val wBack = part.orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = part.orderBy(col(tsCol).asc, col("__tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // the struct is non-null exactly on right rows, so last/first with
    // ignoreNulls lands on the matched right row as a UNIT
    val u = lSel.unionByName(rSel)
    val withHit = direction match {
      case "backward" =>
        u.withColumn("__asof_hit", last(col("__asof_s"), ignoreNulls = true).over(wBack))
      case "forward" =>
        u.withColumn("__asof_hit", first(col("__asof_s"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        // both sweeps share the one shuffle (same partitioning); pick
        // the closer match, backward on ties. Time distance needs a
        // numeric image of the ts type: TIMESTAMP/TIMESTAMP_NTZ do not
        // cast to DOUBLE (AnalysisException) — go through unix_micros.
        import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
        def num(c: Column): Column = left.schema(tsCol).dataType match {
          case TimestampType => unix_micros(c)
          case TimestampNTZType => unix_micros(c.cast(TimestampType))
          case DateType => unix_date(c).cast("long")
          case _ => c.cast("double")
        }
        val ts: Column = num(col(tsCol))
        val back = col("__b"); val fwd = col("__f")
        u.withColumn("__b", last(col("__asof_s"), ignoreNulls = true).over(wBack))
          .withColumn("__f", first(col("__asof_s"), ignoreNulls = true).over(wFwd))
          .withColumn("__asof_hit",
            when(back.isNull, fwd)
              .when(fwd.isNull, back)
              .when(ts - num(back.getField("__rts")) <=
                num(fwd.getField("__rts")) - ts, back)
              .otherwise(fwd))
          .drop("__b", "__f")
    }

    // a NULL-timestamp LEFT row gets NULL attach columns for the same
    // reason (in forward/nearest it sorts to the front where the sweep
    // would hand it the earliest right row)
    withHit
      .select(
        ((leftCols.map(col) :+ col("__tag")) ++
          attach.map(c =>
            when(col(tsCol).isNotNull, col(s"__asof_hit.$c"))
              .as(s"asof_$c"))).toIndexedSeq: _*)
      .filter(col("__tag") === 1).drop("__tag")
  }
}
