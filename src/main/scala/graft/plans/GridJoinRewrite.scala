package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Explode, Expression, ImplicitCastInputTypes, Literal, PredicateHelper, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}
import org.locationtech.jts.geom.Envelope

import graft.geom.GeomCodec

/** Static grid kernels invoked from generated Java (same pattern as
  * [[graft.geom.GeomOps]]): WKB in, primitives out, no boxing in the
  * generated loop.
  *
  * Cell ids are packed `(cx << 32) | (cy & 0xFFFFFFFF)` with cx/cy the
  * floor of coordinate / cellSize — 32 bits per axis spans ±2.1e9
  * cells, far beyond any real CRS extent at any sane cell size.
  */
object GridOps {
  def encode(cx: Int, cy: Int): Long = (cx.toLong << 32) | (cy.toLong & 0xFFFFFFFFL)

  /** Hard cap on cells a single row may replicate into: far beyond any
    * sane cellSize (a 2048×2048-cell envelope), yet it turns the
    * wrong-CRS-units mistake (degrees-sized cells on a meters layer, or
    * one continent-spanning outlier) into a clear per-row error instead
    * of an Int overflow / multi-GB allocation inside generated code.
    */
  val MaxCellsPerRow: Long = 4L * 1024 * 1024

  /** Floor-based cell bounds (x0, x1, y0, y1) of an already-expanded
    * envelope, span-guarded — the ONE place both grid paths (this
    * logical rewrite and the RDD-cogroup [[GridSpatialJoinExec]]) turn
    * an envelope into cells, so their arithmetic cannot drift. Returns
    * None for a null envelope (empty geometry — such a row overlaps no
    * cell and joins nothing) and for the NaN envelope the WKB codec
    * produces for POINT EMPTY (NaN / cellSize would otherwise floor to
    * cell 0 silently). Bounds are computed in Long BEFORE any
    * narrowing: a Double→Int cast saturates, which would collapse an
    * out-of-range extent into one cell and sail past the span guard
    * this helper exists to enforce.
    */
  private[plans] def cellRange(
      env: Envelope, cellSize: Double): Option[(Long, Long, Long, Long)] = {
    if (env.isNull || env.getMinX.isNaN || env.getMinY.isNaN) return None
    // infinities are rejected explicitly: min==max==+Inf saturates
    // BOTH bounds to the same Long, span reads 1, and the corrupt row
    // sails past the span guard into a sentinel cell where JTS happily
    // intersects two POINT(Inf Inf) geometries — the exec path then
    // emits silent garbage where the rewrite path throws (r20 review)
    if (env.getMinX.isInfinite || env.getMaxX.isInfinite ||
        env.getMinY.isInfinite || env.getMaxY.isInfinite)
      throw new IllegalArgumentException(
        s"geometry envelope [${env.getMinX},${env.getMinY} .. " +
          s"${env.getMaxX},${env.getMaxY}] has a non-finite coordinate — " +
          "repair the geometry before the grid join")
    val x0 = math.floor(env.getMinX / cellSize).toLong
    val x1 = math.floor(env.getMaxX / cellSize).toLong
    val y0 = math.floor(env.getMinY / cellSize).toLong
    val y1 = math.floor(env.getMaxY / cellSize).toLong
    // guard each axis BEFORE multiplying: two ~2^32 spans (a saturated
    // world-extent envelope) would overflow the Long product right past
    // the cap this check exists to enforce
    val spanX = x1 - x0 + 1
    val spanY = y1 - y0 + 1
    // a valid envelope has span >= 1; a non-positive span only arises
    // when floor(coord/cellSize).toLong SATURATED on an astronomically
    // large coordinate and the subtraction wrapped — without this check
    // the wrapped span sails under the cap and the exec path iterates
    // (x0 to x1) across ~2^63 cells for the one corrupt row
    if (spanX <= 0 || spanY <= 0) throw new IllegalArgumentException(
      s"geometry envelope [${env.getMinX},${env.getMinY} .. ${env.getMaxX},${env.getMaxY}] " +
        s"has a non-finite or astronomically large coordinate at cellSize=$cellSize " +
        "(cell index saturated 64 bits) — repair the geometry or raise " +
        s"${SpatialJoinStrategy.GridCellKey}")
    if (spanX > MaxCellsPerRow || spanY > MaxCellsPerRow ||
        spanX * spanY > MaxCellsPerRow) throw new IllegalArgumentException(
      s"geometry envelope [${env.getMinX},${env.getMinY} .. ${env.getMaxX},${env.getMaxY}] " +
        s"spans $spanX x $spanY grid cells at cellSize=$cellSize (limit $MaxCellsPerRow " +
        s"total) — raise ${SpatialJoinStrategy.GridCellKey} (is it in the layer's CRS units?)")
    Some((x0, x1, y0, y1))
  }

  /** Every grid cell the geometry's (optionally expanded) envelope
    * overlaps — the replication set of the PBSM decomposition. Empty
    * geometries produce an empty array (they overlap nothing).
    */
  def gridCells(wkb: Array[Byte], cellSize: Double, expand: Double): ArrayData = {
    val env = new Envelope(GeomCodec.read(wkb).getEnvelopeInternal)
    if (expand > 0) env.expandBy(expand)
    cellRange(env, cellSize) match {
      case None => ArrayData.toArrayData(Array.emptyLongArray)
      case Some((x0, x1, y0, y1)) =>
        // the packed id holds 32 bits per axis; a legitimate small span
        // far from the origin (fine cells at large coordinates) must
        // error rather than saturate into a shared Int.MaxValue cell
        if (x0 < Int.MinValue || x1 > Int.MaxValue ||
            y0 < Int.MinValue || y1 > Int.MaxValue)
          throw new IllegalArgumentException(
            s"grid cell coordinates [$x0..$x1, $y0..$y1] exceed the 32-bit " +
              s"cell-id packing range at cellSize=$cellSize — raise " +
              s"${SpatialJoinStrategy.GridCellKey}")
        val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
        var i = 0
        var cx = x0
        while (cx <= x1) {
          var cy = y0
          while (cy <= y1) { out(i) = encode(cx.toInt, cy.toInt); i += 1; cy += 1 }
          cx += 1
        }
        ArrayData.toArrayData(out)
    }
  }

  /** The one cell that OWNS the pair under the reference-point rule:
    * the cell containing the top-left corner of the envelope
    * intersection (left envelope expanded by `expand` for dwithin —
    * matching the replication in [[gridCells]], where only the left
    * side expands). A pair meets in every shared cell; emitting it only
    * where `gridRefCell == cell` makes output exactly-once without a
    * global distinct.
    */
  def gridRefCell(a: Array[Byte], b: Array[Byte], cellSize: Double, expand: Double): Long = {
    val lEnv = new Envelope(GeomCodec.read(a).getEnvelopeInternal)
    if (expand > 0) lEnv.expandBy(expand)
    val rEnv = GeomCodec.read(b).getEnvelopeInternal
    val refX = math.max(lEnv.getMinX, rEnv.getMinX)
    val refY = math.max(lEnv.getMinY, rEnv.getMinY)
    // the same guards gridCells has (r20 review): an empty geometry's
    // reference point floored to cell (0,0) silently — the exact
    // cell-0 corruption gridCells was hardened against — and a
    // beyond-32-bit coordinate saturated via Double.toInt into a
    // shared Int.MaxValue cell, mis-owning extreme-coordinate pairs
    // in a hand-built st_grid_refcell join. BOTH empty shapes are
    // checked: a JTS NULL envelope (POLYGON EMPTY) reports minX=0,
    // not NaN, so isNull must be tested alongside the POINT EMPTY
    // NaN envelope.
    if (lEnv.isNull || rEnv.isNull || refX.isNaN || refY.isNaN)
      throw new IllegalArgumentException(
        "st_grid_refcell: empty geometry (NaN envelope) has no reference " +
          "cell — filter empty geometries before the join")
    val cx = math.floor(refX / cellSize)
    val cy = math.floor(refY / cellSize)
    if (cx < Int.MinValue || cx > Int.MaxValue ||
        cy < Int.MinValue || cy > Int.MaxValue)
      throw new IllegalArgumentException(
        s"st_grid_refcell: cell ($cx, $cy) exceeds the 32-bit cell-id " +
          s"packing range at cellSize=$cellSize — raise " +
          s"${SpatialJoinStrategy.GridCellKey}")
    encode(cx.toInt, cy.toInt)
  }
}

/** `st_grid_cells(geom, cellSize, expand)` → array<bigint> of packed
  * cell ids. Codegen'd so the explode feeding the grid join stays
  * cheap.
  */
case class StGridCellsExpr(geom: Expression, cellSize: Expression, expand: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def first: Expression = geom
  override def second: Expression = cellSize
  override def third: Expression = expand
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_grid_cells"

  override protected def nullSafeEval(g: Any, cs: Any, ex: Any): Any =
    GridOps.gridCells(g.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[Double], ex.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (g, cs, ex) => s"graft.plans.GridOps.gridCells($g, $cs, $ex)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): StGridCellsExpr =
    copy(geom = f, cellSize = s, expand = t)
}

/** `st_grid_refcell(a, b, cellSize, expand)` → the packed id of the
  * cell owning the (a, b) pair under the reference-point rule.
  */
case class StGridRefCellExpr(
    a: Expression, b: Expression, cellSize: Expression, expand: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = cellSize
  override def fourth: Expression = expand
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_grid_refcell"

  override protected def nullSafeEval(ga: Any, gb: Any, cs: Any, ex: Any): Any =
    GridOps.gridRefCell(ga.asInstanceOf[Array[Byte]], gb.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[Double], ex.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (ga, gb, cs, ex) => s"graft.plans.GridOps.gridRefCell($ga, $gb, $cs, $ex)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): StGridRefCellExpr =
    copy(a = f, b = s, cellSize = t, expand = q)
}

/** Logical rewrite of the both-sides-huge spatial join into an exploded
  * CELL EQUI-JOIN — the same PBSM decomposition as
  * [[GridSpatialJoinExec]], but expressed with stock logical operators
  * (Generate / Join / Project) so everything downstream is Spark's own
  * machinery:
  *
  *  - the join plans as a shuffled hash / sort-merge join on the packed
  *    cell id — inside whole-stage codegen;
  *  - AQE sees a plain shuffle join, so its skew-split handles hot
  *    cells (urban cores) with runtime sizes instead of the static
  *    salt count the RDD-cogroup exec needs;
  *  - the exact spatial predicate and the reference-point ownership
  *    check ride along as residual join conditions (exactly-once
  *    output, no global distinct).
  *
  * Fires under the same guards as the strategy's grid path: inner join,
  * a supported spatial conjunct one-geometry-per-side, NO equi conjunct
  * (its own output contains one, so the rule is self-stabilizing),
  * both sides above `spark.graft.spatial.broadcastThreshold`, and
  * `spark.graft.spatial.gridCellSize` set by the caller (a blind
  * default in an unknown CRS could replicate every row across
  * thousands of cells). `spark.graft.spatial.gridMode=exec` disables
  * the rewrite, falling back to the RDD-cogroup [[GridSpatialJoinExec]].
  */
object GridJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val GridModeKey = "spark.graft.spatial.gridMode"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // only the two documented values are accepted: a typo ("Rewrite",
    // "on") used to silently select the exec path — no AQE skew-split,
    // no whole-stage codegen — as an invisible performance-path change
    // (r20 review; gridCellSize rejects malformed values the same way)
    val mode = conf.getConfString(GridModeKey, "rewrite")
    require(mode == "rewrite" || mode == "exec",
      s"$GridModeKey must be 'rewrite' or 'exec', got '$mode'")
    if (mode != "rewrite") return plan
    SpatialJoinStrategy.gridCellSize match {
      case None => plan
      case Some(cs) => plan.transform {
        case j @ Join(left, right, Inner, Some(cond), hint) =>
          val conjuncts = splitConjunctivePredicates(cond)
          if (conjuncts.exists(SpatialJoinStrategy.isEqui(left, right))) j
          else SpatialJoinStrategy.findSpatial(left, right, conjuncts) match {
            case Some((chosen, lg, rg, rel))
                if left.stats.sizeInBytes.min(right.stats.sizeInBytes) >
                  SpatialJoinStrategy.threshold =>
              val cellL: Attribute =
                AttributeReference("__grid_cell_l", LongType, nullable = false)()
              val cellR: Attribute =
                AttributeReference("__grid_cell_r", LongType, nullable = false)()
              // only the left side expands for dwithin — expanding both
              // would double-count the distance (same as the exec)
              val genL = Generate(
                Explode(StGridCellsExpr(lg, Literal(cs), Literal(rel.expand))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(cellL), child = left)
              val genR = Generate(
                Explode(StGridCellsExpr(rg, Literal(cs), Literal(0.0))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(cellR), child = right)
              val owns = EqualTo(
                StGridRefCellExpr(lg, rg, Literal(cs), Literal(rel.expand)), cellL)
              // owns BEFORE chosen: And short-circuits left-to-right, and
              // a pair whose envelopes span k cells meets in all k — the
              // cheap envelope/ref-point check kills the k-1 non-owning
              // copies so the expensive exact JTS predicate runs once per
              // pair, not once per shared cell
              val newCond = (EqualTo(cellL, cellR) +: owns +: chosen +:
                conjuncts.filterNot(_ eq chosen)).reduce(And)
              Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
            case _ => j
          }
      }
    }
  }
}
