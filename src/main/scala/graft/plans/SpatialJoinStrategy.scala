package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

import graft.geom.{StContainsExpr, StDWithinExpr, StIntersectsExpr, StWithinExpr}

/** Plans `a JOIN b ON st_intersects(a.geom, b.geom)` (and contains /
  * within / dwithin-with-literal-distance) as [[SpatialIndexJoinExec]]
  * instead of the O(n·m) BroadcastNestedLoopJoin Spark would pick for
  * an arbitrary-predicate join (SURVEY §4 item 3).
  *
  * Applies only when:
  *  - the join is Inner with a spatial predicate conjunct whose two
  *    geometry expressions resolve one-per-side;
  *  - no equi-join conjunct exists (if one does, a hash join keyed on
  *    it with the spatial predicate as a residual filter is the better
  *    plan — leave it to Catalyst);
  *  - at least one side's stats fit the broadcast budget
  *    (`spark.graft.spatial.broadcastThreshold`, default 256 MiB —
  *    geometry joins tolerate a much larger build side than the 10 MB
  *    autoBroadcastJoinThreshold because the index probe replaces a
  *    per-row cartesian, not a hash lookup). Both-sides-huge falls
  *    through to Spark's planner unchanged.
  *
  * The smaller side becomes the broadcast build side; asymmetric
  * relations (contains/within) are mirrored when the build side swaps.
  */
object SpatialJoinStrategy extends SparkStrategy with PredicateHelper {

  val ThresholdKey = "spark.graft.spatial.broadcastThreshold"
  /** Grid cell size (geometry units) for the both-sides-huge
    * partitioned join. Unset → huge-huge joins fall through to Spark
    * (a blind default cell size in an unknown CRS could replicate every
    * row across thousands of cells; the caller knows the units).
    */
  val GridCellKey = "spark.graft.spatial.gridCellSize"
  /** Sub-splits per grid cell for spatial skew (hot urban cells):
    * left rows hash into one of N sub-groups, right rows replicate to
    * all of them. 1 = off.
    */
  val GridSaltsKey = "spark.graft.spatial.gridSalts"
  private val DefaultThreshold: Long = 256L * 1024 * 1024

  private def asDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  /** (leftGeomExpr, rightGeomExpr, relation) if `e` is a supported
    * spatial predicate in JOIN orientation.
    */
  private def asSpatial(e: Expression): Option[(Expression, Expression, SpatialRel)] = e match {
    case StIntersectsExpr(a, b) => Some((a, b, IntersectsRel))
    case StContainsExpr(a, b) => Some((a, b, ContainsRel))
    case StWithinExpr(a, b) => Some((a, b, WithinRel))
    case StDWithinExpr(a, b, d) if d.foldable =>
      asDouble(d.eval(null)).map(dist => (a, b, DWithinRel(dist)))
    case _ => None
  }

  private[plans] def isEqui(left: LogicalPlan, right: LogicalPlan)(e: Expression): Boolean = e match {
    // both sides must REFERENCE their plan side: the empty set is a
    // subset of both outputSets, so `col = literal` (reachable when
    // predicate pushdown is excluded) used to count as an equi-key —
    // bailing the spatial planner out in favor of a hash join Catalyst
    // cannot actually build on a one-sided key (r20 review)
    case EqualTo(l, r) if l.references.nonEmpty && r.references.nonEmpty =>
      (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
        (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
    case _ => false
  }

  /** The first conjunct that is a supported spatial predicate with one
    * geometry expression per side, in JOIN orientation (mirrored if it
    * was written right-to-left). Shared by this strategy and the
    * [[GridJoinRewrite]] logical rule so both paths recognize exactly
    * the same joins.
    */
  private[plans] def findSpatial(
      left: LogicalPlan, right: LogicalPlan,
      conjuncts: Seq[Expression]): Option[(Expression, Expression, Expression, SpatialRel)] =
    conjuncts.iterator.flatMap { c =>
      asSpatial(c).flatMap { case (a, b, rel) =>
        if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
          Some((c, a, b, rel))
        else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          // mirror into JOIN orientation: pred(a,b) with a from the
          // right side ≡ mirrored-pred(b,a) with b from the left
          Some((c, b, a, rel match {
            case ContainsRel => WithinRel
            case WithinRel => ContainsRel
            case other => other
          }))
        else None
      }
    }.nextOption()

  private[plans] def threshold: Long =
    try SQLConf.get.getConfString(ThresholdKey, DefaultThreshold.toString).toLong
    catch { case _: NumberFormatException => DefaultThreshold }

  /** The caller-declared grid cell size, if valid. Malformed conf →
    * None: huge-huge spatial joins fall back to Spark's planner
    * instead of failing at planning time. Shared with
    * [[GridJoinRewrite]] so both paths accept exactly the same conf.
    */
  private[plans] def gridCellSize: Option[Double] =
    // isInfinity: "Infinity".toDouble parses and passes > 0, but
    // floor(x/Inf) = 0 would put every row of both huge sides into one
    // cell — a single-task cartesian instead of the documented fallback
    try Some(SQLConf.get.getConfString(GridCellKey, "").toDouble)
      .filter(cs => cs > 0 && !cs.isInfinity)
    catch { case _: NumberFormatException => None }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.exists(isEqui(left, right))) return Nil

      val spatial = findSpatial(left, right, conjuncts)

      spatial match {
        case Some((chosen, lg, rg, rel)) =>
          val lSize = left.stats.sizeInBytes
          val rSize = right.stats.sizeInBytes
          val extra = conjuncts.filterNot(_ eq chosen).reduceOption(And)
          if (lSize.min(rSize) > threshold) {
            // both sides too big to broadcast: grid-partitioned join if
            // the caller declared a cell size, else leave it to Spark
            val cellSize = gridCellSize
            val saltCount =
              try math.max(1, SQLConf.get.getConfString(GridSaltsKey, "1").toInt)
              catch { case _: NumberFormatException => 1 }
            cellSize match {
              case None => Nil
              case Some(cs) =>
                GridSpatialJoinExec(lg, rg, rel, extra, cs,
                  SQLConf.get.numShufflePartitions, saltCount,
                  planLater(left), planLater(right)) :: Nil
            }
          } else {
            val buildRight = rSize <= lSize
            SpatialIndexJoinExec(lg, rg, rel, extra, buildRight,
              planLater(left), planLater(right)) :: Nil
          }
        case None => Nil
      }
    case _ => Nil
  }
}
