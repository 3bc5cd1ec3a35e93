package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's scalar-derivation surface (OP-19..OP-31, SURVEY §2.3):
  * every `CalculateField` embedded-Python expression re-expressed as a
  * codegen'd built-in Spark expression (never a UDF — Catalyst folds,
  * prunes, and pushes these).
  */
object Calc {

  /** OP-19 `split_name` (`bunny.py:45-61`): C1 ("City of X"/"Town of X")
    * drops the first two tokens; H1 and everything else pass through.
    * Python's `name.split(" ", 2)[2]` would raise on short names; here a
    * short C1 name yields NULL (divergence ledger §7.5).
    */
  def splitName(classCode: Column, name: Column): Column =
    when(classCode === "C1", split(name, " ", 3).getItem(2)).otherwise(name)

  /** OP-21/OP-30 dictionary value replacement (`bunny.py:77-101`,
    * `retrieve.py:122-127`): map lookup with pass-through on miss.
    */
  def valueReplace(c: Column, replacements: Map[String, String]): Column =
    replacements.foldLeft(c) { case (acc, (from, to)) =>
      when(c === from, lit(to)).otherwise(acc)
    }

  /** OP-22 (`bunny.py:122-125`): last whitespace token, Python
    * `.capitalize()` semantics — first char upper, REST LOWERED
    * ("CDP" → "Cdp"; NOT initcap).
    */
  def lastTokenCapitalize(c: Column): Column = {
    val tok = element_at(split(trim(c), "\\s+"), -1)
    concat(upper(substring(tok, 1, 1)), lower(substring(tok, 2, 100000)))
  }

  /** OP-23 (`bunny.py:127-140`): County keeps Area_Name; others drop the
    * last token (Python `rsplit(" ", 1)[0]`).
    */
  def placeName(areaName: Column, placeType: Column): Column =
    when(placeType === "County", areaName)
      .otherwise(regexp_replace(areaName, " [^ ]*$", ""))

  /** OP-24 GEOID synthesis (`bunny.py:142-155`): zero-padded
    * state+county for County, state+place for Town/City, NULL otherwise
    * (CDPs etc.). Inputs cast to string first — they arrive as ints
    * after CSV re-inference (the FIPS trap, SURVEY §1.2).
    */
  def censusGeoid(placeType: Column, state: Column, county: Column, place: Column): Column = {
    def pad(c: Column, n: Int) = lpad(c.cast("string"), n, "0")
    when(placeType === "County", concat(pad(state, 2), pad(county, 3)))
      .when(placeType === "Town" || placeType === "City", concat(pad(state, 2), pad(place, 5)))
      .otherwise(lit(null).cast("string"))
  }

  /** OP-25 CDT_NAME_SHORT (`bunny.py:405-420`): strip 'City of ',
    * 'Town of ', ' County' via chained literal replaces.
    */
  def nameShort(c: Column): Column =
    replace(replace(replace(c, lit("City of "), lit("")),
      lit("Town of "), lit("")), lit(" County"), lit(""))

  /** OP-26 conditional point-fix (`bunny.py:508-531`): where
    * `checkField == checkValue`, set `updateField = updateValue`.
    */
  def fixIndividual(
      df: DataFrame, checkField: String, checkValue: String,
      updateField: String, updateValue: String): DataFrame =
    df.withColumn(updateField,
      when(col(checkField) === checkValue, lit(updateValue))
        .otherwise(col(updateField)))

  /** OP-28 blank→NULL (`coastline.py:66`). */
  def blankToNull(c: Column): Column = nullif(c, lit(""))

  /** OP-29 row-wise any-FIPS-present flag (`retrieve.py:112`): pandas
    * `.any(axis=1)` over string columns — truthy = non-empty, non-null,
    * and (matching pandas on numeric-inferred columns) non-"0".
    */
  def hasData(cols: Seq[Column]): Column =
    cols.map(c => c.isNotNull && length(trim(c)) > 0 && trim(c) =!= lit("0"))
      .reduce(_ || _)

  /** OP-31 null-coalescing naming (`BoundaryUpdates.py:67-71`). */
  def coalesceName(city: Column, county: Column): Column = coalesce(city, county)

  /** OP-18 bulk rename driven by a field map (`bunny.py:236-248`). */
  def renameFields(df: DataFrame, fieldMap: Map[String, String]): DataFrame =
    // one toDF, not a withColumnRenamed per field — each Dataset
    // transformation re-runs the analyzer over the whole plan
    df.toDF(df.columns.map(c => fieldMap.getOrElse(c, c)).toIndexedSeq: _*)

  /** Spaces→underscores header rename (`retrieve.py:109`). */
  def underscoreColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.replace(" ", "_")).toIndexedSeq: _*)
}
