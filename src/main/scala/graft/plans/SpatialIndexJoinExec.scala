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

    // stable cache key for the bound build-geometry expression: the
    // ordinal identifies the column within THIS broadcast's row layout
    val buildExprKey = buildGeomBound.toString

    streamPlan.execute().mapPartitionsWithIndex { (pIdx, iter) =>
      if (!iter.hasNext) Iterator.empty
      else {
        // the index is built ONCE PER EXECUTOR per (broadcast, column)
        // and shared across tasks: the old per-task bulk-load re-parsed
        // every build-side WKB for every stream partition scheduled on
        // the executor — 200 partitions × 1M polygons = 200M redundant
        // decodes of identical content (r20 review). STRtree queries
        // are thread-safe once built.
        val rows = broadcastRows.value
        val index = SpatialIndexJoinExec.cachedIndex(rows, buildExprKey) {
          val idx = new STRtree()
          rows.foreach { row =>
            val wkb = buildGeomBound.eval(row).asInstanceOf[Array[Byte]]
            if (wkb != null) {
              val g = GeomCodec.read(wkb)
              idx.insert(g.getEnvelopeInternal, (row, g))
            }
          }
          idx.build()
          idx
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
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SpatialIndexJoinExec =
    copy(left = newLeft, right = newRight)
}

object SpatialIndexJoinExec {
  /** Executor-side STRtree cache, keyed WEAKLY by the broadcast VALUE
    * (the one `Array[InternalRow]` each executor holds): the index
    * lives exactly as long as the broadcast it decodes and evaporates
    * with it when ContextCleaner destroys the broadcast — no arbitrary
    * LRU bound to tune, no pinning past the data's own lifetime. The
    * inner key is the bound geometry expression (two joins may index
    * DIFFERENT columns of the same broadcast).
    */
  private val indexCache = new java.util.WeakHashMap[Array[InternalRow],
    java.util.concurrent.ConcurrentHashMap[String, STRtree]]()

  private[plans] def cachedIndex(
      rows: Array[InternalRow], exprKey: String)(build: => STRtree): STRtree = {
    val inner = indexCache.synchronized {
      var m = indexCache.get(rows)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, STRtree]()
        indexCache.put(rows, m)
      }
      m
    }
    // computeIfAbsent: concurrent first tasks build once, later tasks
    // (and later jobs reusing the exchange) read the built tree
    inner.computeIfAbsent(exprKey, _ => build)
  }
}
