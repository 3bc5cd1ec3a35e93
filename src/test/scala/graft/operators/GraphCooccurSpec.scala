package graft.operators

import graft.SparkTestBase

class GraphCooccurSpec extends SparkTestBase {
  import spark.implicits._

  // K4 on {1,2,3,4} — complete graph, C(4,3) = 4 triangles — plus a
  // pendant vertex 5 attached to 1 (closes nothing).
  private def k4Plus = Seq(
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5))
    .toDF("s", "t")

  test("triangleCount: K4 + pendant = 4 triangles") {
    val n = GraphOps.triangleCount(k4Plus, "s", "t")
      .collect()(0).getLong(0)
    assert(n == 4L)
  }

  test("triangleCount: duplicate and reversed edges are canonicalized") {
    val noisy = k4Plus
      .unionAll(k4Plus.selectExpr("t as s", "s as t"))
      .unionAll(k4Plus)
    val n = GraphOps.triangleCount(noisy, "s", "t").collect()(0).getLong(0)
    assert(n == 4L)
  }

  test("triangleCount: triangle-free graph (star) counts zero") {
    val star = Seq((0, 1), (0, 2), (0, 3), (0, 4)).toDF("s", "t")
    assert(GraphOps.triangleCount(star, "s", "t").collect()(0).getLong(0) == 0L)
  }

  test("frequentPairs: support, lift, and Apriori pruning by hand") {
    // baskets: b1={x,y}, b2={x,y}, b3={x,y,z}, b4={x}  (N=4 baskets)
    // item counts: x=4, y=3, z=1. minSupport=2 drops z before pairing.
    // pair (x,y): support 3, lift = 3*4/(4*3) = 1.0
    val rows = Seq(
      ("b1", "x"), ("b1", "y"),
      ("b2", "x"), ("b2", "y"),
      ("b3", "x"), ("b3", "y"), ("b3", "z"),
      ("b4", "x")).toDF("basket", "item")
    val out = Cooccur.frequentPairs(rows, "basket", "item", minSupport = 2L)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("pa") == "x" && r.getAs[String]("pb") == "y")
    assert(r.getAs[Long]("support") == 3L)
    assert(math.abs(r.getAs[Double]("lift") - 1.0) < 1e-9)
  }

  test("frequentPairs: duplicate items within a basket count once") {
    val rows = Seq(
      ("b1", "x"), ("b1", "x"), ("b1", "y"),
      ("b2", "x"), ("b2", "y")).toDF("basket", "item")
    val out = Cooccur.frequentPairs(rows, "basket", "item", minSupport = 2L)
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("support") == 2L)
  }

  test("frequentPairs: NULL baskets and NULL items are excluded, not merged") {
    // NULL basket ids would groupBy into ONE giant basket (spurious
    // pairs + lift overstated, since countDistinct skips NULL in N);
    // SQL equi-join semantics never match NULL baskets (r20 review)
    val rows = Seq(
      (Some("b1"), Some("x")), (Some("b1"), Some("y")),
      (Some("b2"), Some("x")), (Some("b2"), Some("y")),
      (None, Some("x")), (None, Some("y")), (None, Some("w")),
      (Some("b3"), None)).toDF("basket", "item")
    val out = Cooccur.frequentPairs(rows, "basket", "item", minSupport = 2L)
      .collect()
    // only the real (x, y) pair from b1/b2; the null-basket rows
    // contribute no pairs and no basket to N (lift = 2*2/(2*2) = 1)
    assert(out.length == 1)
    assert(out(0).getAs[Long]("support") == 2L)
    assert(math.abs(out(0).getAs[Double]("lift") - 1.0) < 1e-9)
  }

  test("frequentPairs: randomized parity with a brute-force reference") {
    // guards the r12 in-row pair expansion (sorted collect_list +
    // nested-transform slice) against its edge cases — empty baskets
    // after pruning, singleton baskets, large baskets, ties — by
    // recomputing support/lift from first principles on a seeded
    // random basket set and comparing exactly.
    val rnd = new scala.util.Random(7)
    val items = ('a' to 'j').map(_.toString)
    val rows = (1 to 120).flatMap { b =>
      val size = rnd.nextInt(6) // 0..5 items, empties exercise pruning
      Seq.fill(size)(items(rnd.nextInt(items.size))).map(i => (s"b$b", i))
    }
    val minSupport = 3L
    // brute force in plain Scala
    val baskets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemN = baskets.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val freq = itemN.filter(_._2 >= minSupport).keySet
    val nB = baskets.size.toDouble
    val expected = baskets.values.toSeq
      .map(_.filter(freq))
      .flatMap(s => s.toSeq.sorted.combinations(2))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minSupport)
      .map { case (Seq(pa, pb), sup) =>
        (pa, pb, sup,
          BigDecimal(sup * nB / (itemN(pa).toDouble * itemN(pb)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
    val got = Cooccur.frequentPairs(
        rows.toDF("basket", "item"), "basket", "item", minSupport)
      .collect()
      .map(r => (r.getAs[String]("pa"), r.getAs[String]("pb"),
        r.getAs[Long]("support"), r.getAs[Double]("lift"))).toSet
    assert(got.map(t => (t._1, t._2, t._3)) == expected.map(t => (t._1, t._2, t._3)),
      s"pair/support mismatch: got ${got.size}, expected ${expected.size}")
    got.foreach { case (pa, pb, sup, lift) =>
      val exp = expected.find(e => e._1 == pa && e._2 == pb).get._4
      assert(math.abs(lift - exp) < 1e-9, s"lift($pa,$pb): $lift vs $exp")
    }
  }
}
