package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, Predicate, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.index.strtree.STRtree

import graft.geom.GeomCodec

/** The spatial relation an index join evaluates. `expand` widens the
  * probe envelope (distance joins); `eval` is the exact test run only
  * on envelope-candidates, in JOIN-clause orientation (a = left side).
  */
sealed trait SpatialRel extends Serializable {
  def eval(a: Geometry, b: Geometry): Boolean
  def expand: Double = 0.0
  def name: String
}
case object IntersectsRel extends SpatialRel {
  def eval(a: Geometry, b: Geometry): Boolean = a.intersects(b)
  def name = "intersects"
}
case object ContainsRel extends SpatialRel {
  def eval(a: Geometry, b: Geometry): Boolean = a.contains(b)
  def name = "contains"
}
case object WithinRel extends SpatialRel {
  def eval(a: Geometry, b: Geometry): Boolean = a.within(b)
  def name = "within"
}
final case class DWithinRel(d: Double) extends SpatialRel {
  def eval(a: Geometry, b: Geometry): Boolean = a.isWithinDistance(b, d)
  override def expand: Double = d
  def name = s"dwithin($d)"
}

/** Broadcast spatial index join (SURVEY §4 item 3, the planner-visible
  * form of [[graft.operators.SpatialJoin.broadcastIntersects]]).
  *
  * The build side arrives through a real `BroadcastExchange`
  * (`BroadcastDistribution(IdentityBroadcastMode)`), so AQE can reuse
  * the exchange across consumers exactly as it does for broadcast hash
  * joins. Each task bulk-loads the broadcast rows into an STRtree once
  * and probes it with the streamed side's (envelope-expanded) geometry:
  * O(n log m) envelope tests + exact JTS predicate on candidates,
  * versus the O(n·m) full cartesian of the BroadcastNestedLoopJoin this
  * operator replaces. The streamed side's partitioning is preserved —
  * no shuffle at any scale; 1000 executors each probe their own slice.
  */
case class SpatialIndexJoinExec(
    leftGeom: Expression,
    rightGeom: Expression,
    rel: SpatialRel,
    extraCondition: Option[Expression],
    buildRight: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  private def buildPlan: SparkPlan = if (buildRight) right else left
  private def streamPlan: SparkPlan = if (buildRight) left else right

  override def requiredChildDistribution: Seq[Distribution] =
    if (buildRight) Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))
    else Seq(BroadcastDistribution(IdentityBroadcastMode), UnspecifiedDistribution)

  override def outputPartitioning: Partitioning = streamPlan.outputPartitioning

  override def simpleString(maxFields: Int): String =
    s"SpatialIndexJoin ${rel.name}, build=${if (buildRight) "right" else "left"}" +
      extraCondition.map(c => s", condition=${c.sql}").getOrElse("")

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")

    val buildGeomBound = BindReferences.bindReference(
      if (buildRight) rightGeom else leftGeom, buildPlan.output)
    val streamGeomBound = BindReferences.bindReference(
      if (buildRight) leftGeom else rightGeom, streamPlan.output)

    val broadcastRows = buildPlan.executeBroadcast[Array[InternalRow]]()
    val rel0 = rel
    val buildIsRight = buildRight
    val outAttrs = output
    val cond = extraCondition

    streamPlan.execute().mapPartitionsWithIndex { (pIdx, iter) =>
      // Bulk-load the index once per task; geometries decode once here,
      // not once per probe.
      val index = new STRtree()
      broadcastRows.value.foreach { row =>
        val wkb = buildGeomBound.eval(row).asInstanceOf[Array[Byte]]
        if (wkb != null) {
          val g = GeomCodec.read(wkb)
          index.insert(g.getEnvelopeInternal, (row, g))
        }
      }

      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val pred = cond.map(c => Predicate.create(c, outAttrs))
      // real partition index, not 0: nondeterministic residuals must
      // seed independently per task (same as Spark's own join execs)
      pred.foreach(_.initialize(pIdx))

      iter.flatMap { srow =>
        val wkb = streamGeomBound.eval(srow).asInstanceOf[Array[Byte]]
        if (wkb == null) Iterator.empty
        else SpatialProbe.probeOne(index, GeomCodec.read(wkb), srow, rel0,
          buildIsRight, joined, proj, pred, numOutputRows, SpatialProbe.AlwaysOwns)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SpatialIndexJoinExec =
    copy(left = newLeft, right = newRight)
}
