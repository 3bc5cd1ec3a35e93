package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, Predicate, UnsafeProjection}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.index.strtree.STRtree

import graft.geom.GeomCodec

/** Grid-partitioned spatial join — the both-sides-huge path
  * (SURVEY §4 item 3's 100 TB upgrade; the SpatialHadoop / PBSM
  * partitioned-join shape).
  *
  * Neither side fits an executor, so instead of broadcasting: every row
  * is assigned to each fixed-size grid cell its envelope (expanded by
  * the distance for dwithin) overlaps, both sides shuffle by cell id,
  * and each cell joins locally — an STRtree over the smaller-side rows
  * of the cell, probed by the other side. A pair whose envelopes span
  * k cells would surface k times; the REFERENCE-POINT rule (emit only
  * in the cell that contains the top-left corner of the envelope
  * intersection) makes every pair unique without a global distinct —
  * no second shuffle, no dedup state.
  *
  * Scale properties: shuffle volume is O(rows × cells-per-envelope)
  * (≈1–4 for a well-chosen cell size), parallelism is #occupied cells
  * (millions at 100 TB), memory per task is one cell's rows. The RDD
  * cogroup sits OUTSIDE AQE's skew splitting, so hot cells (urban
  * cores) are handled by the static `salts` sub-grouping below — AQE
  * skew-split applies only to the [[GridJoinRewrite]] path, which
  * plans a stock shuffle join.
  */
case class GridSpatialJoinExec(
    leftGeom: Expression,
    rightGeom: Expression,
    rel: SpatialRel,
    extraCondition: Option[Expression],
    cellSize: Double,
    numPartitions: Int,
    salts: Int,
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  require(cellSize > 0, "cellSize must be positive")
  require(salts >= 1, "salts must be >= 1")

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** ((cellKey, salt), (wkb, row)) for every grid cell the (possibly
    * expanded) envelope overlaps. Hot cells (spatial skew — think urban
    * cores) would otherwise be single straggler tasks, since an RDD
    * cogroup sits outside AQE's skew splitting: with `salts` > 1 each
    * LEFT row lands in exactly one of `salts` sub-groups of its cell
    * (`replicate = false`) while each RIGHT row is replicated to all of
    * them (`replicate = true`) — the standard salted-join decomposition,
    * output unchanged because every (left, right) pair still meets in
    * exactly one (cell, salt) group.
    */
  private def tag(
      plan: SparkPlan, geomExpr: Expression, expand: Double,
      replicate: Boolean): RDD[((Long, Long, Int), (Array[Byte], InternalRow))] = {
    val bound = BindReferences.bindReference(geomExpr, plan.output)
    val cs = cellSize
    val nSalts = salts
    plan.execute().mapPartitions { iter =>
      iter.flatMap { row =>
        val wkb = bound.eval(row).asInstanceOf[Array[Byte]]
        if (wkb == null) Iterator.empty
        else {
          val env = new Envelope(GeomCodec.read(wkb).getEnvelopeInternal)
          if (expand > 0) env.expandBy(expand)
          // shared with the rewrite path: same floor arithmetic, same
          // MaxCellsPerRow guard (a wrong-CRS-units cellSize fails fast
          // instead of silently emitting ~10^10 shuffle tuples per row),
          // same empty/NaN-envelope drop
          GridOps.cellRange(env, cs) match {
            case None => Iterator.empty
            case Some((x0, x1, y0, y1)) =>
              val copied = row.copy()
              // salt by FULL row content, not geometry alone: the most
              // common spatial skew is many records sharing one geocoded
              // point, and a geometry-only hash would land them all in
              // the same salt, defeating the split. Content hash (not a
              // position counter) so a task retry that reorders upstream
              // rows reassigns nothing — the same recompute-determinism
              // rule as withRowKey in SpatialOps.
              val saltSeq: Seq[Int] =
                if (nSalts == 1) Seq(0)
                else if (replicate) 0 until nSalts
                else Seq(math.floorMod(copied.hashCode, nSalts))
              for {
                cx <- (x0 to x1).iterator
                cy <- (y0 to y1).iterator
                s <- saltSeq.iterator
              } yield ((cx, cy, s), (wkb, copied))
          }
        }
      }
    }
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val rel0 = rel
    val cs = cellSize
    val outAttrs = output
    val cond = extraCondition

    // expand only one side for dwithin — expanding both double-counts
    // the distance. Left is the salted (stream) side, right replicates.
    val leftTagged = tag(left, leftGeom, rel0.expand, replicate = false)
    val rightTagged = tag(right, rightGeom, 0.0, replicate = true)

    leftTagged.cogroup(rightTagged, numPartitions).mapPartitionsWithIndex { (pIdx, groups) =>
      // projection/predicate built once per TASK, not once per occupied
      // cell — at scale a partition holds many small cells. initialize
      // with the REAL partition index (not 0): a nondeterministic
      // residual (rand() sampling) must seed independently per task,
      // same as Spark's own join execs.
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val pred = cond.map(c => Predicate.create(c, outAttrs))
      pred.foreach(_.initialize(pIdx))

      groups.flatMap { case ((cx, cy, _), (ls, rs)) =>
      if (ls.isEmpty || rs.isEmpty) Iterator.empty
      else {
        // index the smaller group, stream the larger
        val (buildSide, streamSide, buildIsRight) =
          if (ls.size <= rs.size) (ls, rs, false) else (rs, ls, true)
        val index = new STRtree()
        buildSide.foreach { case (wkb, row) =>
          val g = GeomCodec.read(wkb)
          index.insert(g.getEnvelopeInternal, (row, g))
        }
        // reference point: top-left corner of the (dwithin-expanded)
        // envelope intersection — exactly one cell owns each pair.
        // MUST use the same floor(coord / cs) arithmetic as the cell
        // assignment in tag(): the interval form (refX >= cx*cs &&
        // refX < cx*cs + cs) is floating-point-inconsistent with it —
        // cx*cs rounds differently from floor(refX/cs), so boundary
        // reference points were owned by two cells (duplicate pairs) or
        // by none (dropped pairs).
        val owns: (Geometry, Geometry) => Boolean = (lg, rg) => {
          val lEnv = new Envelope(lg.getEnvelopeInternal)
          if (rel0.expand > 0) lEnv.expandBy(rel0.expand)
          val rEnv = rg.getEnvelopeInternal
          val refX = math.max(lEnv.getMinX, rEnv.getMinX)
          val refY = math.max(lEnv.getMinY, rEnv.getMinY)
          math.floor(refX / cs).toLong == cx && math.floor(refY / cs).toLong == cy
        }
        streamSide.iterator.flatMap { case (wkb, srow) =>
          SpatialProbe.probeOne(index, GeomCodec.read(wkb), srow, rel0,
            buildIsRight, joined, proj, pred, numOutputRows, owns)
        }
      }
      }
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GridSpatialJoin ${rel.name}, cell=$cellSize" +
      (if (salts > 1) s", salts=$salts" else "")

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): GridSpatialJoinExec =
    copy(left = newLeft, right = newRight)
}
