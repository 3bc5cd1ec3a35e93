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
  * (millions at 100 TB), memory per task is one cell's rows. Skewed
  * cells split further by AQE since the shuffle is a plain hash
  * repartition on cell id.
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
          val copied = row.copy()
          val x0 = math.floor(env.getMinX / cs).toLong
          val x1 = math.floor(env.getMaxX / cs).toLong
          val y0 = math.floor(env.getMinY / cs).toLong
          val y1 = math.floor(env.getMaxY / cs).toLong
          val saltSeq: Seq[Int] =
            if (nSalts == 1) Seq(0)
            else if (replicate) 0 until nSalts
            else Seq(math.floorMod(java.util.Arrays.hashCode(wkb), nSalts))
          for {
            cx <- (x0 to x1).iterator
            cy <- (y0 to y1).iterator
            s <- saltSeq.iterator
          } yield ((cx, cy, s), (wkb, copied))
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

    leftTagged.cogroup(rightTagged, numPartitions).mapPartitions { groups =>
      // projection/predicate built once per TASK, not once per occupied
      // cell — at scale a partition holds many small cells
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val pred = cond.map(c => Predicate.create(c, outAttrs))
      pred.foreach(_.initialize(0))

      groups.flatMap { case ((cx, cy, _), (ls, rs)) =>
      if (ls.isEmpty || rs.isEmpty) Iterator.empty
      else {
        val cellMinX = cx * cs
        val cellMinY = cy * cs
        val cellMaxX = cellMinX + cs
        val cellMaxY = cellMinY + cs

        // index the smaller group, stream the larger
        val (buildSide, streamSide, buildIsRight) =
          if (ls.size <= rs.size) (ls, rs, false) else (rs, ls, true)
        val index = new STRtree()
        buildSide.foreach { case (wkb, row) =>
          val g = GeomCodec.read(wkb)
          index.insert(g.getEnvelopeInternal, (row, g))
        }
        // reference point: top-left corner of the (dwithin-expanded)
        // envelope intersection — exactly one cell owns each pair
        val owns: (Geometry, Geometry) => Boolean = (lg, rg) => {
          val lEnv = new Envelope(lg.getEnvelopeInternal)
          if (rel0.expand > 0) lEnv.expandBy(rel0.expand)
          val rEnv = rg.getEnvelopeInternal
          val refX = math.max(lEnv.getMinX, rEnv.getMinX)
          val refY = math.max(lEnv.getMinY, rEnv.getMinY)
          refX >= cellMinX && refX < cellMaxX &&
            refY >= cellMinY && refY < cellMaxY
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
