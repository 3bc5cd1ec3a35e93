package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  // path graph A-B-C, both directions listed (undirected convention)
  private def edges = Seq(
    ("A", "B"), ("B", "A"), ("B", "C"), ("C", "B"))
    .toDF("src", "dst")

  test("one iteration matches the hand-computed distribution") {
    val r = PageRank.run(edges, "src", "dst", iters = 1)
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    // r0 = 1/3 each; deg A=1 B=2 C=1
    // r1(A) = 0.15/3 + 0.85*(r0(B)/2); r1(B) = 0.15/3 + 0.85*(r0(A)+r0(C))
    assert(math.abs(r("A") - 0.1916666667) < 1e-9)
    assert(math.abs(r("B") - 0.6166666667) < 1e-9)
    assert(math.abs(r("C") - 0.1916666667) < 1e-9)
  }

  test("rank mass is conserved across iterations (no dangling leak)") {
    val total = PageRank.run(edges, "src", "dst", iters = 3)
      .agg(sum(col("rank"))).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
  }

  test("directed chain keeps every vertex across iterations (no truncation)") {
    // A -> B -> C: A has no in-edges (teleport floor only), C is a
    // sink (absorbs mass, documented leak)
    val chain = Seq(("A", "B"), ("B", "C")).toDF("src", "dst")
    val r = PageRank.run(chain, "src", "dst", iters = 2)
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(r.keySet == Set("A", "B", "C"))
    // N=3, r0=1/3 each; iter1: A=0.05, B=0.05+0.85/3, C=0.05+0.85/3
    // iter2: A=0.05, B=0.05+0.85*0.05, C=0.05+0.85*(0.05+0.85/3)
    assert(math.abs(r("A") - 0.05) < 1e-9)
    assert(math.abs(r("B") - 0.0925) < 1e-9)
    assert(math.abs(r("C") - 0.3333333333) < 1e-9)
  }

  test("vertices with in-edges but asymmetric degree rank by structure") {
    // star: hub H linked both ways to 3 leaves — hub concentrates rank
    val star = Seq(("H", "L1"), ("L1", "H"), ("H", "L2"), ("L2", "H"),
      ("H", "L3"), ("L3", "H")).toDF("src", "dst")
    val r = PageRank.run(star, "src", "dst", iters = 3)
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(r("H") > r("L1"))
    assert(math.abs(r("L1") - r("L3")) < 1e-12) // symmetric leaves tie
  }
}
