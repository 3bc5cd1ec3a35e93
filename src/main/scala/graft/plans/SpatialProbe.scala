package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BasePredicate, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.execution.metric.SQLMetric
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.index.strtree.STRtree

/** The shared STRtree probe loop of [[SpatialIndexJoinExec]] (broadcast
  * path) and [[GridSpatialJoinExec]] (partitioned path): envelope query
  * with the dwithin expansion, JOIN-orientation of the exact predicate,
  * optional per-pair ownership filter (the grid reference-point rule),
  * residual condition, projected output. One implementation so the two
  * join paths cannot drift apart.
  */
private[plans] object SpatialProbe {

  val AlwaysOwns: (Geometry, Geometry) => Boolean = (_, _) => true

  /** Probe `index` with one streamed row. `buildIsRight` orients the
    * JTS predicate and row concatenation back into JOIN order.
    */
  def probeOne(
      index: STRtree,
      g: Geometry,
      srow: InternalRow,
      rel: SpatialRel,
      buildIsRight: Boolean,
      joined: JoinedRow,
      proj: UnsafeProjection,
      pred: Option[BasePredicate],
      numOutputRows: SQLMetric,
      owns: (Geometry, Geometry) => Boolean): Iterator[InternalRow] = {
    val env = new Envelope(g.getEnvelopeInternal)
    // the index holds UNexpanded envelopes: the probe side always
    // carries the dwithin expansion
    if (rel.expand > 0) env.expandBy(rel.expand)
    val candidates = index.query(env)
    val out = Seq.newBuilder[InternalRow]
    val it = candidates.iterator()
    while (it.hasNext) {
      val (brow, bg) = it.next().asInstanceOf[(InternalRow, Geometry)]
      val (lg, rg) = if (buildIsRight) (g, bg) else (bg, g)
      if (owns(lg, rg) && rel.eval(lg, rg)) {
        val (lr, rr) = if (buildIsRight) (srow, brow) else (brow, srow)
        val j = joined(lr, rr)
        if (pred.forall(_.eval(j))) {
          numOutputRows += 1
          out += proj(j).copy()
        }
      }
    }
    out.result().iterator
  }
}
