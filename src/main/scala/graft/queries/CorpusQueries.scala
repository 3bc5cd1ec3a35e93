package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** One declared query: DataFrame-API implementation + (optionally) the
  * equivalent SQL the driver runs in DuckDB as the oracle.
  * `sparkParity = false` marks oracles that are DuckDB-dialect-only
  * (VALUES goldens pinned at sf0.01, list comprehensions, recursive
  * CTEs) and therefore excluded from the spark.sql parity run — the
  * driver's DuckDB compare still checks them in full.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    sparkParity: Boolean = true)

/** The declared query corpus from SURVEY.md §2.13 (Q01–Q34).
  *
  * Contract (see SURVEY §2.13): portable Spark/DuckDB semantics, total
  * ORDER BY on every query, float aggregates wrapped in round(x,2),
  * timestamps passed through date_trunc/cast-to-date, output column
  * names identical on both sides, and output column TYPES matched too
  * (the driver checks schema): Spark `row_number`/`datediff` are int32
  * while DuckDB's are int64, so those are cast to bigint on the Spark
  * side; DuckDB `sum(BIGINT)` is int128, so those are cast to bigint in
  * the oracle SQL.
  *
  * Reference call sites for the REF-kind queries are cited per query
  * (file:line into /root/reference).
  */
object CorpusQueries {

  private def q(name: String, oracle: String)(
      body: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, body, Some(oracle))

  /** Q01 — conjunction/disjunction filter (OP-11, bunny.py:38). */
  val q01: QuerySpec = q("q01",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_returnflag = 'R' AND l_linestatus = 'F'
      |  AND (l_quantity > 45 OR l_discount > 0.08)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("lineitem")
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F" &&
        (col("l_quantity") > 45 || col("l_discount") > 0.08))
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q02 — inequality filter (OP-12, bunny.py:259-262). */
  val q02: QuerySpec = q("q02",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_mktsegment <> 'BUILDING' ORDER BY c_custkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("customer")
      .filter(col("c_mktsegment") =!= "BUILDING")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q03 — IN-list filter (OP-13, coastline.py:47). */
  val q03: QuerySpec = q("q03",
    """SELECT o_orderkey, o_orderpriority FROM orders
      |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** Q04 — conditional token-drop (OP-19 split_name, bunny.py:45-61). */
  val q04: QuerySpec = q("q04",
    """SELECT p_partkey,
      |  CASE WHEN p_size > 25 THEN substr(p_name, instr(p_name, ' ') + 1)
      |       ELSE p_name END AS nm
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("part")
      .select(col("p_partkey"),
        when(col("p_size") > 25,
          expr("substr(p_name, instr(p_name, ' ') + 1)"))
          .otherwise(col("p_name")).as("nm"))
      .orderBy("p_partkey")
  }

  /** Q05 — last token + Python-`capitalize` semantics (OP-22,
    * bunny.py:122-125; `.capitalize()` lowercases the tail, NOT initcap).
    */
  val q05: QuerySpec = q("q05",
    """SELECT p_partkey,
      |  concat(upper(substr(tok,1,1)), lower(substr(tok,2,1000))) AS cap
      |FROM (SELECT p_partkey,
      |        substr(p_type, length(p_type) - instr(reverse(p_type),' ') + 2) AS tok
      |      FROM part) t
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("part")
      .withColumn("tok",
        expr("substr(p_type, length(p_type) - instr(reverse(p_type),' ') + 2)"))
      .select(col("p_partkey"),
        concat(upper(substring(col("tok"), 1, 1)),
          lower(substring(col("tok"), 2, 1000))).as("cap"))
      .orderBy("p_partkey")
  }

  /** Q06 — conditional rsplit-drop-last (OP-23, bunny.py:127-140). */
  val q06: QuerySpec = q("q06",
    """SELECT p_partkey,
      |  CASE WHEN p_size = 1 THEN p_type
      |       ELSE substr(p_type, 1, length(p_type) - instr(reverse(p_type),' ')) END AS base
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("part")
      .select(col("p_partkey"),
        when(col("p_size") === 1, col("p_type"))
          .otherwise(expr(
            "substr(p_type, 1, length(p_type) - instr(reverse(p_type),' '))"))
          .as("base"))
      .orderBy("p_partkey")
  }

  /** Q07 — zero-padded GEOID synthesis (OP-24, bunny.py:142-155; the
    * FIPS leading-zero trap, SURVEY §1.2).
    */
  val q07: QuerySpec = q("q07",
    """SELECT c_custkey,
      |  concat(lpad(cast(c_nationkey AS VARCHAR),2,'0'),
      |         lpad(cast(c_custkey AS VARCHAR),5,'0')) AS geoid
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("customer")
      .select(col("c_custkey"),
        concat(lpad(col("c_nationkey").cast("string"), 2, "0"),
          lpad(col("c_custkey").cast("string"), 5, "0")).as("geoid"))
      .orderBy("c_custkey")
  }

  /** Q08 — dictionary value replacement (OP-21 GNIS_ADJUSTMENTS,
    * bunny.py:77-101, config.py:115-123).
    */
  val q08: QuerySpec = q("q08",
    """SELECT n_nationkey,
      |  CASE n_name WHEN 'FRANCE' THEN 'FR' WHEN 'GERMANY' THEN 'DE'
      |              WHEN 'CHINA' THEN 'CN' ELSE n_name END AS adj
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("nation")
      .select(col("n_nationkey"),
        when(col("n_name") === "FRANCE", "FR")
          .when(col("n_name") === "GERMANY", "DE")
          .when(col("n_name") === "CHINA", "CN")
          .otherwise(col("n_name")).as("adj"))
      .orderBy("n_nationkey")
  }

  /** Q09 — conditional point-fix (OP-26 fix_individual, bunny.py:508-531). */
  val q09: QuerySpec = q("q09",
    """SELECT c_custkey,
      |  CASE WHEN c_name = 'Customer#000000042' THEN 'PATCHED'
      |       ELSE c_mktsegment END AS seg
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("customer")
      .select(col("c_custkey"),
        when(col("c_name") === "Customer#000000042", "PATCHED")
          .otherwise(col("c_mktsegment")).as("seg"))
      .orderBy("c_custkey")
  }

  /** Q10 — multi-replace strip (OP-25 add_cdt_name_field, bunny.py:405-420). */
  val q10: QuerySpec = q("q10",
    """SELECT p_partkey,
      |  replace(replace(replace(p_type, 'PROMO ', ''), 'STANDARD ', ''), ' BRASS', '') AS short_type
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    // literal replace(), matching the oracle's replace() semantics
    // exactly: the regexp form only agreed because these three tokens
    // happen to carry no regex metacharacters — a future token with
    // '.', '+', '(' would silently diverge from the literal oracle
    // (r20 review)
    t("part")
      .select(col("p_partkey"),
        replace(
          replace(
            replace(col("p_type"), lit("PROMO "), lit("")),
            lit("STANDARD "), lit("")),
          lit(" BRASS"), lit("")).as("short_type"))
      .orderBy("p_partkey")
  }

  /** Q11 — blank→NULL normalization (OP-28, coastline.py:66). */
  val q11: QuerySpec = q("q11",
    """SELECT o_orderkey, nullif(trim(o_orderstatus), '') AS st
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("orders")
      .select(col("o_orderkey"), nullif(trim(col("o_orderstatus")), lit("")).as("st"))
      .orderBy("o_orderkey")
  }

  /** Q12 — rename + project (OP-18/OP-17, bunny.py:236-248). */
  val q12: QuerySpec = q("q12",
    """SELECT o_orderkey AS order_id, upper(o_orderpriority) AS prio
      |FROM orders ORDER BY order_id""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("orders")
      .select(col("o_orderkey").as("order_id"),
        upper(col("o_orderpriority")).as("prio"))
      .orderBy("order_id")
  }

  /** Q13 — deterministic "attach one value from many-row right side"
    * (OP-33 JoinField first-match, bunny.py:274-280). Right side is the
    * per-customer aggregate → broadcast to avoid shuffling customer.
    */
  val q13: QuerySpec = q("q13",
    """SELECT c.c_custkey, c.c_name, f.first_date FROM customer c
      |LEFT JOIN (SELECT o_custkey, min(cast(o_orderdate AS DATE)) AS first_date
      |           FROM orders GROUP BY o_custkey) f
      |  ON c.c_custkey = f.o_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    val firsts = t("orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("first_date"))
    t("customer")
      .join(broadcast(firsts), col("c_custkey") === col("o_custkey"), "left")
      .select("c_custkey", "c_name", "first_date")
      .orderBy("c_custkey")
  }

  /** Q14 — sequential left lookup joins (OP-35/36/37, bunny.py:436-461).
    * part and supplier are small dims → broadcast both; lineitem never
    * shuffles.
    */
  val q14: QuerySpec = q("q14",
    """SELECT l.l_orderkey, l.l_linenumber, p.p_brand, s.s_name
      |FROM lineitem l
      |LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("lineitem")
      .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"), "left")
      .select("l_orderkey", "l_linenumber", "p_brand", "s_name")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q15 — dissolve-shaped group-by (OP-38, bunny.py:264-270; sum stands
    * in for geometric union). Partial aggregation (map-side combine) is
    * automatic with groupBy+agg.
    */
  val q15: QuerySpec = q("q15",
    """SELECT l_orderkey, count(*) AS n, round(sum(l_quantity),2) AS qty,
      |  cast(round(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))),2) AS DOUBLE) AS rev
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    // Money math in DECIMAL: the inputs are exact 2-decimal values, so
    // decimal products/sums are exact and round(x,2) agrees with the
    // oracle even on .005 boundaries (double rounding does not).
    t("lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
          .cast("double").as("rev"))
      .orderBy("l_orderkey")
  }

  /** Q16 — two-level dissolve, counties_pathway shape (OP-38,
    * bunny.py:312-324). DuckDB sum(BIGINT) is int128 → oracle casts to
    * bigint to match Spark's sum(long)=long.
    */
  val q16: QuerySpec = q("q16",
    """SELECT n_regionkey, count(*) AS nations, cast(sum(sup) AS BIGINT) AS suppliers
      |FROM (SELECT n.n_regionkey, n.n_nationkey, count(s.s_suppkey) AS sup
      |      FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
      |      GROUP BY n.n_regionkey, n.n_nationkey) t
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    val inner = t("nation")
      .join(broadcast(t("supplier")), col("s_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_regionkey"), col("n_nationkey"))
      .agg(count(col("s_suppkey")).as("sup"))
    inner
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("nations"), sum(col("sup")).as("suppliers"))
      .orderBy("n_regionkey")
  }

  /** Q17 — row count guard (OP-39, bunny.py:228-229). */
  val q17: QuerySpec = q("q17",
    "SELECT count(*) AS n FROM lineitem") { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("lineitem").agg(count(lit(1)).as("n"))
  }

  /** Q18 — missing-record QA aggregate (OP-29, retrieve.py:112-116). */
  val q18: QuerySpec = q("q18",
    """SELECT cast(sum(CASE WHEN o_totalprice IS NULL AND o_orderstatus IS NULL
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS missing,
      |  count(*) AS total FROM orders""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("orders")
      .agg(sum(when(col("o_totalprice").isNull && col("o_orderstatus").isNull, 1L)
        .otherwise(0L)).as("missing"),
        count(lit(1)).as("total"))
  }

  /** Q19 — merge / schema-aligning union (OP-41, bunny.py:469-473). */
  val q19: QuerySpec = q("q19",
    """SELECT id, name FROM
      |  (SELECT c_custkey AS id, c_name AS name FROM customer
      |   UNION ALL SELECT s_suppkey, s_name FROM supplier) u
      |ORDER BY id, name""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("customer").select(col("c_custkey").as("id"), col("c_name").as("name"))
      .unionByName(
        t("supplier").select(col("s_suppkey").as("id"), col("s_name").as("name")))
      .orderBy("id", "name")
  }

  /** Q20 — erase-shaped anti join (OP-42, bunny.py:393-400). */
  val q20: QuerySpec = q("q20",
    """SELECT c_custkey FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("customer")
      .join(t("orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  /** Q21 — EXT semi join. */
  val q21: QuerySpec = q("q21",
    """SELECT c_custkey FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("customer")
      .join(t("orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  /** Q22 — EXT set op: EXCEPT. */
  val q22_except: QuerySpec = q("q22_except",
    """SELECT k FROM
      |  ((SELECT o_custkey AS k FROM orders)
      |   EXCEPT
      |   (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) t
      |ORDER BY k""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("orders").select(col("o_custkey").as("k"))
      .except(t("customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k")))
      .orderBy("k")
  }

  /** Q22 — EXT set op: INTERSECT twin. */
  val q22_intersect: QuerySpec = q("q22_intersect",
    """SELECT k FROM
      |  ((SELECT o_custkey AS k FROM orders)
      |   INTERSECT
      |   (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) t
      |ORDER BY k""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("orders").select(col("o_custkey").as("k"))
      .intersect(t("customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k")))
      .orderBy("k")
  }

  /** Q23 — first-N-per-group window (§2.6; sliver-fix pairing /
    * JoinField first-match). Spark row_number is int32, DuckDB's is
    * int64 → cast to bigint on both sides.
    */
  val q23: QuerySpec = q("q23",
    """SELECT o_custkey, o_orderkey, cast(rn AS BIGINT) AS rn FROM
      |  (SELECT o_custkey, o_orderkey,
      |     row_number() OVER (PARTITION BY o_custkey
      |                        ORDER BY cast(o_orderdate AS DATE), o_orderkey) AS rn
      |   FROM orders) t
      |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("date"), col("o_orderkey"))
    t("orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("bigint").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Q24 — EXT running-sum window frame. */
  val q24: QuerySpec = q("q24",
    """SELECT o_custkey, o_orderkey,
      |  cast(round(sum(cast(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
      |    ORDER BY cast(o_orderdate AS DATE), o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS DOUBLE) AS run
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("date"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t("orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).over(w), 2)
          .cast("double").as("run"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q25 — EXT lag/lead gap-days. Spark `datediff` is int32 → cast to
    * bigint to match DuckDB `date_diff`.
    */
  val q25: QuerySpec = q("q25",
    """SELECT o_custkey, o_orderkey,
      |  date_diff('day',
      |    lag(cast(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |      ORDER BY cast(o_orderdate AS DATE), o_orderkey),
      |    cast(o_orderdate AS DATE)) AS gap_days
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("date"), col("o_orderkey"))
    t("orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate").cast("date"), 1).over(w))
          .cast("bigint").as("gap_days"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q26 — EXT rollup. */
  val q26: QuerySpec = q("q26",
    """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
      |  cast(round(sum(cast(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS rev
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double").as("rev"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("rev"))
      .orderBy("rf", "ls")
  }

  /** Q27 — EXT distinct aggregates. */
  val q27: QuerySpec = q("q27",
    """SELECT count(DISTINCT l_partkey) AS parts, count(DISTINCT l_suppkey) AS sups
      |FROM lineitem""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("lineitem")
      .agg(countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("sups"))
  }

  /** Q28 — EXT exact-dup detection (§2.12): normalize → md5 → group. */
  val q28: QuerySpec = q("q28",
    """SELECT k, count(*) AS c FROM
      |  (SELECT md5(lower(trim(text))) AS k FROM documents) t
      |GROUP BY k HAVING count(*) > 1 ORDER BY k""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("documents")
      .select(md5(lower(trim(col("text")))).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .orderBy("k")
  }

  /** Q29 — EXT text analysis aggregates (§2.12). */
  val q29: QuerySpec = q("q29",
    """SELECT lang, count(*) AS docs, round(avg(n_chars),2) AS avg_chars,
      |  round(avg(length(text) - length(replace(text,' ','')) + 1),2) AS avg_words
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        round(avg(length(col("text")) -
          length(regexp_replace(col("text"), lit(" "), lit(""))) + 1), 2)
          .as("avg_words"))
      .orderBy("lang")
  }

  /** Q30 — EXT top-k (TakeOrderedAndProject, no full sort at scale). */
  val q30: QuerySpec = q("q30",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
  }

  /** Q31 — EXT tumbling window, batch twin of §2.11 streaming. */
  /** Shared by q31 (batch) and the streaming twin x54. */
  val hourlyOracle: String =
    """SELECT cast(date_trunc('hour', ts) AS TIMESTAMP) AS w, event_type,
      |  count(*) AS n, round(sum(value),2) AS v
      |FROM events GROUP BY 1, 2 ORDER BY w, event_type""".stripMargin

  val q31: QuerySpec = q("q31", hourlyOracle) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("events")
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .orderBy("w", "event_type")
  }

  /** Q32 — EXT sessionization analog (30-min gap). Gap measured in
    * integer microseconds on both sides: DuckDB `epoch()` is fractional
    * DOUBLE and Spark `unix_timestamp` floors to seconds — `epoch_us`
    * vs `unix_micros` is the shim that agrees exactly.
    */
  val q32: QuerySpec = q("q32",
    """SELECT user_id, count(*) AS sessions FROM
      |  (SELECT user_id,
      |     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |            OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |          THEN 1 ELSE 0 END AS new_s
      |   FROM events) t
      |WHERE new_s = 1 GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    t("events")
      .withColumn("new_s",
        when(prev.isNull || us(col("ts")) - us(prev) > 1800000000L, 1)
          .otherwise(0))
      .filter(col("new_s") === 1)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("sessions"))
      .orderBy("user_id")
  }

  /** Q33 — null-coalescing naming (OP-31, BoundaryUpdates.py:67-71). */
  val q33: QuerySpec = q("q33",
    """SELECT o_orderkey, coalesce(nullif(o_orderstatus,''), o_orderpriority) AS place_name
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("orders")
      .select(col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("")), col("o_orderpriority"))
          .as("place_name"))
      .orderBy("o_orderkey")
  }

  /** Q34 — filter + row-drop combo (OP-16+OP-15, retrieve.py:111,119). */
  val q34: QuerySpec = q("q34",
    """SELECT n_nationkey, n_name FROM nation
      |WHERE n_regionkey = 1 AND n_name <> 'CANADA' ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    def t(n: String): DataFrame = Tables.load(s, d, n)
    t("nation")
      .filter(col("n_regionkey") === 1 && col("n_name") =!= "CANADA")
      .select("n_nationkey", "n_name")
      .orderBy("n_nationkey")
  }

  val all: Seq[QuerySpec] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22_except, q22_intersect, q23, q24, q25, q26, q27, q28, q29,
    q30, q31, q32, q33, q34)
}
