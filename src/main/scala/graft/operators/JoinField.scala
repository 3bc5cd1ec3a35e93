package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `arcpy.management.JoinField` semantics (OP-33..37, SURVEY §2.4): a
  * left outer join that attaches a selected subset of right-side fields,
  * keeping only the FIRST matching right row when the right side has
  * duplicate keys.
  *
  * The reference's "first" depends on physical row order; we declare a
  * deterministic tiebreak instead — ascending by the attached fields
  * themselves (documented divergence, SURVEY §7.5). The deduped right
  * side is tiny in every reference call site (≤ a few hundred rows), so
  * it is broadcast: the left side never shuffles.
  */
object JoinField {

  def apply(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      fields: Seq[String]): DataFrame = {

    val w = Window.partitionBy(col(rightKey))
      .orderBy(fields.map(f => col(f).asc_nulls_last): _*)
    // Rename every right-side column to a fresh name BEFORE joining:
    // left and right often derive from the same source DataFrame (e.g.
    // two dissolves of the CDTFA layer, bunny.py:327-334), where the
    // shared key column resolves to the SAME attribute on both sides
    // and the join predicate degenerates to trivially-true.
    val firstMatch = right
      .select((rightKey +: fields).map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .toDF(("__jf_key" +: fields.map("__jf_" + _)): _*)

    val joined = left.join(broadcast(firstMatch),
      col(leftKey) === col("__jf_key"), "left")
      .drop("__jf_key")
    // one toDF instead of a withColumnRenamed per field (each Dataset
    // transformation re-analyzes the whole plan)
    joined.toDF(joined.columns.map(c =>
      if (c.startsWith("__jf_")) c.stripPrefix("__jf_") else c).toIndexedSeq: _*)
  }
}
