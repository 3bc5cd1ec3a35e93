package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.Coordinate

/** Pins [[StUnionAgg]]'s tiered compaction (r19 — the GeomScaleProbe
  * finding: the old single-threshold compact re-unioned the whole
  * accumulated geometry every FanIn rows, O(n²/FanIn) per group,
  * ×617 task-CPU at 64× features in the fixed-group-count leg).
  * Aggregator-level tests, no SparkSession: reduce/merge/finish are
  * pure functions over the buffer.
  */
class StUnionAggSpec extends AnyFunSuite {

  private val gf = GeomCodec.factory
  private def square(x: Double): Array[Byte] =
    GeomCodec.write(gf.createPolygon(Array(
      new Coordinate(x, 0), new Coordinate(x + 1, 0),
      new Coordinate(x + 1, 1), new Coordinate(x, 1),
      new Coordinate(x, 0))))

  test("a 300-square group unions correctly across multiple tiers") {
    // 300 raw rows = 4 full level-0 compactions + remainder: the
    // cascade path runs, and the result is exact (disjoint squares:
    // area 300, 300 parts)
    val buf = (0 until 300).foldLeft(StUnionAgg.zero) { (b, i) =>
      StUnionAgg.reduce(b, square(i * 2.0))
    }
    val g = GeomCodec.read(StUnionAgg.finish(buf))
    assert(g.getArea == 300.0)
    assert(g.getNumGeometries == 300)
  }

  test("buffer stays bounded at FanIn entries per level (never re-unions the world)") {
    val buf = (0 until 500).foldLeft(StUnionAgg.zero) { (b, i) =>
      StUnionAgg.reduce(b, square(i * 2.0))
    }
    // 500 rows = 7 level-1 entries + 52 level-0 leftovers; the old
    // compact held exactly 1 ever-growing giant instead
    val byLevel = buf.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byLevel.values.forall(_ < StUnionAgg.FanIn), byLevel.toString)
    assert(byLevel.getOrElse(1, 0) == 7 && byLevel.getOrElse(0, 0) == 52,
      byLevel.toString)
  }

  test("merge of two partial buffers equals the single-pass union") {
    val left = (0 until 100).foldLeft(StUnionAgg.zero) { (b, i) =>
      StUnionAgg.reduce(b, square(i * 2.0))
    }
    val right = (100 until 200).foldLeft(StUnionAgg.zero) { (b, i) =>
      StUnionAgg.reduce(b, square(i * 2.0))
    }
    val g = GeomCodec.read(StUnionAgg.finish(StUnionAgg.merge(left, right)))
    assert(g.getArea == 200.0)
    assert(g.getNumGeometries == 200)
  }

  test("nulls are skipped; empty group finishes null; touching squares fuse") {
    val b0 = StUnionAgg.reduce(StUnionAgg.zero, null)
    assert(StUnionAgg.finish(b0) == null)
    val fused = Seq(square(0.0), square(1.0)) // share an edge
      .foldLeft(StUnionAgg.zero)(StUnionAgg.reduce)
    val g = GeomCodec.read(StUnionAgg.finish(fused))
    assert(g.getArea == 2.0)
    assert(g.getNumGeometries == 1, "touching squares must fuse into one part")
  }
}
