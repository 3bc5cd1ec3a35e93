package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** The bench output contract: the driver keeps only the last ~2000
  * chars of stdout, so the summary line must parse as JSON and stay
  * under 1900 chars even for a worst-case entry set — round 7's plain
  * per-entry map overflowed the window and the round's perf signal was
  * lost to a truncated line. No SparkSession needed: rendering is pure.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper

  /** Worst case: more entries than the real sweep, maximal name
    * lengths, large values (wide formatting), plus failures.
    */
  private def worstCase: Seq[(String, Option[Bench.Sample])] = {
    val groups = Seq("q", "g", "x", "p")
    (1 to 130).map { i =>
      val name = f"${groups(i % 4)}${i}%02d_${"a" * 28}"
      val sample =
        if (i % 23 == 0) None
        else Some(Bench.Sample(wall = 1234.5678, cpu = 9876.5432, gcMs = 123456L))
      name -> sample
    }
  }

  test("summary line parses as JSON and fits the driver's capture window") {
    val line = Bench.renderSummaryLine(
      worstCase, "/root/testdata/sf0.1", "/root/repo/bench_detail.json")
    assert(!line.contains("\n"))
    assert(line.length < 1900, s"summary line is ${line.length} chars")
    val root = mapper.readTree(line)
    assert(root.get("metric").asText == "corpus_sweep")
    assert(root.get("value").isNumber)
    assert(root.get("total").isArray && root.get("total").size == 3)
    assert(root.get("groups").size == 4)
    assert(root.get("queries").size == 18)      // slowest-entry cap
    assert(root.get("failed").isArray && root.get("failed").size > 0)
  }

  test("detail JSON parses, carries every entry, nulls the failed ones") {
    val detail = Bench.renderDetail(worstCase, "/root/testdata/sf0.1", 3)
    val root = mapper.readTree(detail)
    assert(root.get("entries").size == 130)
    assert(root.get("reps").asInt == 3)
    val failedName = worstCase.collectFirst { case (n, None) => n }.get
    assert(root.get("entries").get(failedName).isNull)
    val okName = worstCase.collectFirst { case (n, Some(_)) => n }.get
    assert(root.get("entries").get(okName).size == 3)
  }

  test("group triples sum only their own prefix") {
    val rs = Seq(
      "q01" -> Some(Bench.Sample(1.0, 2.0, 10L)),
      "q02" -> Some(Bench.Sample(0.5, 1.0, 5L)),
      "x01" -> Some(Bench.Sample(3.0, 6.0, 30L)),
      "g01" -> Some(Bench.Sample(0.25, 0.5, 1L)),
      "p01" -> None)
    val root = mapper.readTree(Bench.renderSummaryLine(rs, "sf", "d"))
    assert(root.get("value").asDouble == 1.5)                    // corpus walls only
    val g = root.get("groups")
    assert(g.get("corpus_q01_q34").get(0).asDouble == 1.5)
    assert(g.get("corpus_q01_q34").get(1).asDouble == 3.0)
    assert(g.get("corpus_q01_q34").get(2).asLong == 15L)
    assert(g.get("extension").get(0).asDouble == 3.0)
    assert(g.get("pipeline").get(0).asDouble == 0.0)             // failed → excluded
    assert(root.get("failed").get(0).asText == "p01")
  }
}
