package graft.functions

import graft.SparkTestBase
import graft.operators.FuzzyMatch
import org.apache.spark.sql.functions._

/** Jaro-Winkler kernel goldens: every expected value below is the
  * EXACT double DuckDB 1.x returns for `jaro_winkler_similarity` /
  * `jaro_similarity` on the same inputs (probed directly) — the x59
  * oracle's threshold cut relies on bit-identical scores, so these
  * assert `==` on doubles deliberately.
  */
class StringExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StrOps.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("jaro-winkler matches DuckDB bit-for-bit on calibration pairs") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("crate", "trace") == 0.7333333333333334)
    assert(jw("appleby x", "appleby y") == 0.9555555555555556)
    assert(jw("aaaaaa", "aaaaaa") == 1.0)
  }

  test("boost threshold, prefix cap, and empty/degenerate semantics match DuckDB") {
    // below jaro 0.7 the Winkler boost is suppressed
    assert(jw("abcdefgh", "abcdzzzz") == 0.6666666666666666)
    assert(jw("abcdef", "fedcba") == 0.38888888888888884)
    // common prefix capped at 4 chars
    assert(jw("abcdefghij", "abcdefzzzz") == 0.8400000000000001)
    assert(jw("prefixaa", "prefixbb") == 0.9)
    // zero match window: adjacent transposition scores 0
    assert(jw("ab", "ba") == 0.0)
    // DuckDB scores empty-vs-anything (incl. empty-vs-empty) as 0
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
  }

  test("jaro_winkler_similarity is on the SQL surface and null-safe") {
    val r = spark.sql(
      """SELECT jaro_winkler_similarity('martha', 'marhta') AS s,
        |       jaro_winkler_similarity(CAST(NULL AS STRING), 'x') AS n""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 0.9611111111111111)
    assert(r.isNullAt(1))
  }

  test("blockedSelfMatch pairs within blocks only, each pair once") {
    val df = Seq(
      (1L, "small ring", "B1"), (2L, "small rings", "B1"), (3L, "small gear", "B1"),
      (4L, "small ring", "B2"), // other block: never paired with 1/2
      (5L, "red bolt", "B1")) // different first token: own block
      .toDF("id", "name", "brand")
    val out = FuzzyMatch.blockedSelfMatch(
        df, "id", "name",
        concat_ws("|", col("brand"), split_part(col("name"), lit(" "), lit(1))),
        minScore = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // (1,2) near-identical; (1,3)/(2,3) share the block but score < 0.9;
    // 4 is brand-blocked away from its exact twin 1; 5 is token-blocked.
    assert(out == Set((1L, 2L)))
  }
}
