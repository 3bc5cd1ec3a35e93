package graft.operators

import graft.SparkTestBase

/** JoinField semantics (SURVEY §2.4 / §7.4 hard-part #4): left-outer,
  * attach selected fields only, FIRST match on duplicate right keys
  * with the declared deterministic tiebreak (ascending attached
  * fields), never row multiplication.
  */
class JoinFieldSpec extends SparkTestBase {
  import spark.implicits._

  private val left = Seq(("Alameda", 1), ("Hills", 2), ("Nowhere", 3))
    .toDF("city", "pop")

  test("first-match keeps exactly one row per left row; tiebreak is deterministic") {
    // right side has THREE rows for Alameda in scrambled order
    val right = Seq(
      ("Alameda", "Z-county"), ("Alameda", "A-county"), ("Alameda", "M-county"),
      ("Hills", "H-county"))
      .toDF("city", "county")
    val out = JoinField(left, "city", right, "city", Seq("county"))
      .orderBy("pop").collect()
    assert(out.length == 3)                            // no row multiplication
    assert(out(0).getAs[String]("county") == "A-county") // asc tiebreak
    assert(out(1).getAs[String]("county") == "H-county")
    assert(out(2).getAs[String]("county") == null)       // left outer
  }

  test("differently-named keys and multiple attached fields") {
    val right = Seq(("Alameda", "0600562", "City"), ("Hills", "0633000", "Town"))
      .toDF("join_name", "geoid", "ptype")
    val out = JoinField(left, "city", right, "join_name", Seq("geoid", "ptype"))
      .orderBy("pop").collect()
    assert(out(0).getAs[String]("geoid") == "0600562")
    assert(out(0).getAs[String]("ptype") == "City")
    assert(!out(0).schema.fieldNames.contains("join_name")) // key not attached
  }

  test("self-lineage right side does not degenerate (regression for the SF bug)") {
    val base = Seq(("A", "x"), ("A", "y"), ("B", "z")).toDF("k", "v")
    val l = base.groupBy("k").count()
    val out = JoinField(l, "k", base, "k", Seq("v")).orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("v") == "x") // first by asc tiebreak
    assert(out(1).getAs[String]("v") == "z")
  }
}
