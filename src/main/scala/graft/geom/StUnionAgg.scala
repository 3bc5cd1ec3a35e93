package graft.geom

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.collection.mutable.ArrayBuffer

/** Tiered geometric-union aggregation, parameterized on fan-in so the
  * scaling probe can measure the fan-in trade directly (r20 — the
  * production aggregate is [[StUnionAgg]], pinned at 64). A smaller
  * fan-in trades more union passes (depth log_f n instead of log₆₄ n)
  * for a smaller per-call working set; the r19 remainder question —
  * is the ×178-vs-~117 gap at 64× a fan-in artifact? — is answered by
  * running the same leg at several fan-ins (GeomScaleProbe
  * `dissolve_grow_f*` legs, BASELINE.md r20).
  */
class TieredUnionAgg(val fanIn: Int)
    extends Aggregator[Array[Byte], ArrayBuffer[(Int, Array[Byte])], Array[Byte]]
    with Serializable {
  require(fanIn >= 2, s"fanIn must be >= 2, got $fanIn")

  /** Cascaded union with the SURVEY §7.4 robustness ladder: plain union
    * first; on TopologyException fix invalid inputs and retry; as the
    * last resort snap everything to a 1e-6 precision grid (micron-scale
    * for projected meters) and retry — dirty real-world polygons with
    * near-coincident vertices land here, and a deterministic slightly-
    * snapped union beats a failed job.
    */
  private def unionAll(wkbs: Seq[Array[Byte]]): Geometry = {
    val geoms = new java.util.ArrayList[Geometry](wkbs.size)
    wkbs.foreach(w => if (w != null) geoms.add(GeomCodec.read(w)))
    try UnaryUnionOp.union(geoms, GeomCodec.factory)
    catch {
      case _: org.locationtech.jts.geom.TopologyException =>
        val fixed = new java.util.ArrayList[Geometry](geoms.size)
        geoms.forEach { g =>
          fixed.add(if (g.isValid) g else org.locationtech.jts.geom.util.GeometryFixer.fix(g))
        }
        try UnaryUnionOp.union(fixed, GeomCodec.factory)
        catch {
          case _: org.locationtech.jts.geom.TopologyException =>
            val pm = new org.locationtech.jts.geom.PrecisionModel(1e6)
            val snapped = new java.util.ArrayList[Geometry](fixed.size)
            fixed.forEach { g =>
              snapped.add(org.locationtech.jts.precision.GeometryPrecisionReducer.reduce(g, pm))
            }
            UnaryUnionOp.union(snapped, GeomCodec.factory)
        }
    }
  }

  /** Add one entry at `level`, cascading any fanIn-full level into a
    * single next-level union. The buffer never exceeds
    * fanIn × (levels+1) entries (levels = log_fanIn of the group size).
    */
  private def push(
      b: ArrayBuffer[(Int, Array[Byte])], level: Int,
      wkb: Array[Byte]): ArrayBuffer[(Int, Array[Byte])] = {
    b += ((level, wkb))
    var l = level
    while (b.count(_._1 == l) >= fanIn) {
      val (same, rest) = b.partition(_._1 == l)
      b.clear()
      b ++= rest
      b += ((l + 1, GeomCodec.write(unionAll(same.map(_._2).toSeq))))
      l += 1
    }
    b
  }

  override def zero: ArrayBuffer[(Int, Array[Byte])] = ArrayBuffer.empty

  override def reduce(
      b: ArrayBuffer[(Int, Array[Byte])], a: Array[Byte]): ArrayBuffer[(Int, Array[Byte])] =
    if (a == null) b else push(b, 0, a)

  override def merge(
      a: ArrayBuffer[(Int, Array[Byte])],
      b: ArrayBuffer[(Int, Array[Byte])]): ArrayBuffer[(Int, Array[Byte])] = {
    b.foreach { case (l, w) => push(a, l, w) }
    a
  }

  override def finish(b: ArrayBuffer[(Int, Array[Byte])]): Array[Byte] =
    if (b.isEmpty) null else GeomCodec.write(unionAll(b.map(_._2).toSeq))

  override def bufferEncoder: Encoder[ArrayBuffer[(Int, Array[Byte])]] =
    Encoders.kryo[ArrayBuffer[(Int, Array[Byte])]]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Geometric union aggregate — the dissolve kernel (OP-38,
  * `bunny.py:264-270`; SURVEY §7.4 hard-part #2).
  *
  * Buffers (level, WKB) entries and compacts them TIERED, like an LSM
  * tree / binary counter: raw inputs enter at level 0; when a level
  * accumulates [[StUnionAgg.FanIn]] entries they are cascaded-unioned
  * (JTS `UnaryUnionOp`) into ONE entry at the next level, cascading
  * upward. Every coordinate therefore passes through O(log₆₄ n)
  * unions — O(n log n) total work per group.
  *
  * The r19 GeomScaleProbe measured why the tiers matter: the previous
  * single-threshold compaction ("≥ 64 entries → union ALL into one")
  * re-unioned the whole accumulated geometry every 63 rows — O(n²/64)
  * coordinate work per group, ×617 task-CPU at 64× the features in
  * the fixed-group-count leg (`dissolve_grow`), the exact shape a
  * continental dissolve at 100 TB would hit. With tiers the same leg
  * is ~linear (each level's unions see geometry once per tier).
  *
  * FanIn = 64 is a measured choice, not a guess: the r20 fan-in
  * sensitivity legs (`dissolve_grow_f8`/`_f16` vs `_f64`,
  * BASELINE.md) ran the growing-group leg at fan-ins 8/16/64.
  *
  * Partial aggregation (map-side combine) works unchanged — `merge`
  * pushes one buffer's entries into the other at their levels — so
  * the shuffle still carries at most FanIn·levels compacted entries
  * per key per map task, not every input row.
  */
object StUnionAgg extends TieredUnionAgg(64) {
  // alias of the constructor argument, never a second literal: a
  // future retune that edits one spelling but not the other would
  // leave the spec's buffer-bound assertion checking a fan-in that
  // isn't running
  val FanIn: Int = fanIn

  /** Column form: `df.groupBy(keys).agg(st_union_agg($"geom"))`. */
  lazy val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(StUnionAgg)
  val st_union_agg: Column => Column = asUdaf.apply(_)
}
