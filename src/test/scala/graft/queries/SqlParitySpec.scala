package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.operators.Skew

/** Every oracle-backed declared query must ALSO run through
  * `spark.sql` (after mechanical dialect shims) and produce exactly the
  * DataFrame implementation's rows — the engine's SQL surface is as
  * real as its DataFrame surface. Plus the salted-aggregation
  * equivalence check.
  */
class SqlParitySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def registerTables(): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  test("all oracle SQL runs via spark.sql and matches the DataFrame results") {
    registerTables()
    // DuckDB-dialect-only oracles (ASOF JOIN, VALUES goldens) declare
    // sparkParity=false at the spec — no string sniffing here, so a
    // reworded oracle can neither dodge the exclusion nor be silently
    // dropped from parity coverage by a stray substring
    val specs = (CorpusQueries.all ++ ExtQueries.all)
      .filter(_.oracle.isDefined)
      .filter(_.sparkParity)
    assert(specs.nonEmpty)
    val failures = specs.flatMap { spec =>
      try {
        val sql = DialectShim.toSparkSql(spec.oracle.get)
        val viaSql = spark.sql(sql)
        val viaDf = spec.run(spark, sfDir)
        // row-wise exact compare in declared order, columns sorted by name
        val cols = viaDf.columns.sorted.toSeq
        val a = viaSql.select(cols.map(col): _*).collect()
        val b = viaDf.select(cols.map(col): _*).collect()
        if (a.length != b.length)
          Some(s"${spec.name}: rows ${a.length} vs ${b.length}")
        else a.zip(b).collectFirst {
          case (ra, rb) if ra != rb => s"${spec.name}: $ra != $rb"
        }
      } catch {
        case e: Throwable => Some(s"${spec.name}: EXC ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("salted aggregation equals plain groupBy") {
    val li = Tables.lineitem(spark, sfDir)
    val plain = li.groupBy("l_returnflag").count()
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val salted = Skew.saltedCount(li, Seq("l_returnflag"), buckets = 8)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(plain.toSeq == salted.toSeq)

    val plainSum = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s")).orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val saltedSum = Skew.saltedSum(li, Seq("l_returnflag"), "l_quantity", buckets = 8)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    plainSum.zip(saltedSum).foreach { case ((k1, v1), (k2, v2)) =>
      assert(k1 == k2 && math.abs(v1 - v2) < 1e-6)
    }

    // the salt feeds a shuffle's grouping key, so it MUST be
    // deterministic: a nondeterministic salt (the first cut used
    // monotonically_increasing_id) re-salts rows differently when a
    // lost map task recomputes, silently double-/zero-counting across
    // completed and re-run reducers (r20 review)
    val analyzed = Skew.saltedCount(li, Seq("l_returnflag"), buckets = 8)
      .queryExecution.analyzed
    val nondet = analyzed.collect {
      case p => p.expressions.flatMap(_.collect { case e if !e.deterministic => e })
    }.flatten
    assert(nondet.isEmpty,
      s"salted aggregate plan carries nondeterministic expressions: $nondet")
  }
}
