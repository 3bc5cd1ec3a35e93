package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Pinned-schema readers for the reference's attribute inputs
  * (FIXTURES.md §1). Schemas are explicit — never CSV-inferred — so
  * FIPS codes keep their leading zeros (the SURVEY §1.2 trap).
  */
object BunnySources {

  /** GNIS federal-codes pipe file (OP-03, `retrieve.py:37`): 21 columns. */
  val gnisSchema: StructType = StructType(Seq(
    StructField("feature_id", LongType),
    StructField("feature_name", StringType),
    StructField("feature_class", StringType),
    StructField("census_code", StringType),
    StructField("census_class_code", StringType),
    StructField("gsa_code", StringType),
    StructField("opm_code", StringType),
    StructField("state_name", StringType),
    StructField("state_numeric", StringType),
    StructField("county_sequence", IntegerType),
    StructField("county_name", StringType),
    StructField("county_numeric", StringType),
    StructField("date_created", StringType),
    StructField("date_edited", StringType),
    StructField("bgn_type", StringType),
    StructField("bgn_authority", StringType),
    StructField("bgn_date", StringType),
    StructField("prim_lat_dms", StringType),
    StructField("prim_long_dms", StringType),
    StructField("prim_lat_dec", DoubleType),
    StructField("prim_long_dec", DoubleType)))

  def readGnis(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "|")
      .option("header", "true")
      .schema(gnisSchema)
      .csv(path)

  /** DLA abbreviations table (OP-07, `bunny.py:357`; live key
    * CENSUS_PLACE_NAME, `bunny.py:458`).
    */
  val dlaSchema: StructType = StructType(Seq(
    StructField("CENSUS_PLACE_NAME", StringType),
    StructField("CDT_CITY_ABBR", StringType),
    StructField("CDT_COUNTY_ABBR", StringType)))

  def readDla(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(dlaSchema).csv(path)

  /** Census geocodes: via the xlsx shim (OP-04) with pandas-equivalent
    * skiprows; all columns strings (dtype pinning).
    */
  def readCensusXlsx(spark: SparkSession, path: String, skipRows: Int = 4): DataFrame =
    XlsxReader.toDataFrame(spark, path, skipRows)
}
