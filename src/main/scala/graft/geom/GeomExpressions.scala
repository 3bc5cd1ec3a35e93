package graft.geom

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, IntegerType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Static geometry kernels invoked from generated Java — keeping the
  * hot ST functions inside whole-stage codegen (SURVEY §4 item 2,
  * phase 2): no UDF closure serialization, no Option boxing, direct
  * byte[]-in/primitive-out calls in the generated loop.
  */
object GeomOps {
  def area(wkb: Array[Byte]): Double = GeomCodec.read(wkb).getArea
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean =
    GeomCodec.read(a).intersects(GeomCodec.read(b))
  def transform(wkb: Array[Byte], fromSrid: Int, toSrid: Int): Array[Byte] =
    GeomCodec.write(CrsMath.transformGeometry(GeomCodec.read(wkb), fromSrid, toSrid))
  def contains(a: Array[Byte], b: Array[Byte]): Boolean =
    GeomCodec.read(a).contains(GeomCodec.read(b))
  def within(a: Array[Byte], b: Array[Byte]): Boolean =
    GeomCodec.read(a).within(GeomCodec.read(b))
  def dwithin(a: Array[Byte], b: Array[Byte], d: Double): Boolean =
    GeomCodec.read(a).isWithinDistance(GeomCodec.read(b), d)
  // constructive kernels — the overlay/erase inner loop (SpatialOps)
  // evaluates these once per candidate pair, so they live here with the
  // predicates rather than behind a UDF boundary
  def intersection(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    GeomCodec.write(GeomCodec.read(a).intersection(GeomCodec.read(b)))
  def difference(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    GeomCodec.write(GeomCodec.read(a).difference(GeomCodec.read(b)))
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    GeomCodec.write(GeomCodec.read(a).union(GeomCodec.read(b)))
  /** OP-44 RepairGeometry kernel: already-valid geometries pass
    * through byte-identical (the overwhelmingly common case — the
    * validity check is cheap relative to a fix), invalid ones are
    * repaired with JTS GeometryFixer.
    */
  def makeValid(wkb: Array[Byte]): Array[Byte] = {
    val g = GeomCodec.read(wkb)
    if (g.isValid) wkb
    else GeomCodec.write(org.locationtech.jts.geom.util.GeometryFixer.fix(g))
  }

  /** OP-46 kernel: planar area in mi² computed in equal-area EPSG:3310
    * regardless of the layer's CRS (`config.py:48-51` semantics).
    */
  def areaSqmi(wkb: Array[Byte], fromSrid: Int): Double =
    CrsMath.transformGeometry(GeomCodec.read(wkb), fromSrid, 3310).getArea /
      CrsMath.SquareMetersPerSquareMile

  /** Polygonal component of a mixed-dimension overlay result (touching
    * inputs intersect in lines/points; planar overlay wants areas only).
    * All-polygonal inputs pass through byte-identical — note the
    * deliberate asymmetry in part structure: a MIXED collection has its
    * areal parts run through UnaryUnionOp (dissolving shared
    * boundaries), while an already-polygonal input keeps its parts
    * intact. Areal CONTENT is identical either way; consumers that
    * count parts (st_numgeometries/st_dump) should not assume a
    * normalized decomposition across the two paths.
    */
  def polygonal(wkb: Array[Byte]): Array[Byte] = {
    val g = GeomCodec.read(wkb)
    val polys = (0 until g.getNumGeometries).map(g.getGeometryN)
      .filter(_.getDimension == 2)
    if (polys.isEmpty) GeomCodec.write(GeomCodec.factory.createPolygon())
    else if (polys.size == g.getNumGeometries) wkb
    else GeomCodec.write(
      org.locationtech.jts.operation.union.UnaryUnionOp.union(
        java.util.Arrays.asList(polys: _*)))
  }

  /** [[polygonal]] on an in-memory JTS result — shared tail of the fused
    * constructive kernels below. Byte-compatible with composing
    * `polygonal(write(g))`: the pass-through branch re-serializes `g`
    * with the same writer, so the bytes match what the standalone
    * kernel would have been handed.
    */
  private def polygonalOf(g: org.locationtech.jts.geom.Geometry): Array[Byte] = {
    val polys = (0 until g.getNumGeometries).map(g.getGeometryN)
      .filter(_.getDimension == 2)
    if (polys.isEmpty) GeomCodec.write(GeomCodec.factory.createPolygon())
    else if (polys.size == g.getNumGeometries) GeomCodec.write(g)
    else GeomCodec.write(
      org.locationtech.jts.operation.union.UnaryUnionOp.union(
        java.util.Arrays.asList(polys: _*)))
  }

  /** Fused `st_polygonal(st_intersection(a, b))` — the overlay inner
    * loop evaluates this once per candidate pair, and the composed form
    * paid a full WKB serialize→parse round trip between the two kernels
    * for a geometry that can be large (the intersection of two detailed
    * polygons). Fusing hands the JTS object straight to the polygonal
    * tail. Output is bit-identical to the composition (pinned by spec).
    */
  def intersectionPolygonal(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    polygonalOf(GeomCodec.read(a).intersection(GeomCodec.read(b)))

  /** Fused `st_polygonal(st_difference(a, b))` — twin of
    * [[intersectionPolygonal]] for the erase/leftover branches.
    */
  def differencePolygonal(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    polygonalOf(GeomCodec.read(a).difference(GeomCodec.read(b)))
}

/** `st_area(geom)` as a native Catalyst expression with codegen. */
case class StAreaExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_area"

  override protected def nullSafeEval(input: Any): Any =
    GeomOps.area(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geom.GeomOps.area($c)")

  override protected def withNewChildInternal(newChild: Expression): StAreaExpr =
    copy(child = newChild)
}

/** `st_intersects(a, b)` as a native Catalyst expression with codegen. */
case class StIntersectsExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_intersects"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.intersects(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geom.GeomOps.intersects($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersectsExpr =
    copy(left = l, right = r)
}

/** `st_contains(a, b)` — native, codegen'd, and pattern-matchable by
  * [[graft.plans.SpatialJoinStrategy]] (a ScalaUDF would be opaque to
  * the planner).
  */
case class StContainsExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_contains"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.contains(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geom.GeomOps.contains($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): StContainsExpr =
    copy(left = l, right = r)
}

/** `st_within(a, b)` — native twin of [[StContainsExpr]]. */
case class StWithinExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_within"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.within(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geom.GeomOps.within($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): StWithinExpr =
    copy(left = l, right = r)
}

/** `st_dwithin(a, b, distance)` — native; the planner rewrites distance
  * joins on it when the distance is foldable.
  */
case class StDWithinExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_dwithin"

  override protected def nullSafeEval(a: Any, b: Any, d: Any): Any =
    GeomOps.dwithin(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, d) => s"graft.geom.GeomOps.dwithin($a, $b, $d)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): StDWithinExpr =
    copy(first = f, second = s, third = t)
}

/** `st_intersection(a, b)` — native constructive op. The overlay inner
  * loop (`SpatialOps.overlayUnion`) computes it for every candidate
  * pair, so it stays inside whole-stage codegen with the predicates
  * instead of crossing a UDF boundary per row.
  */
case class StIntersectionExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_intersection"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.intersection(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geom.GeomOps.intersection($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersectionExpr =
    copy(left = l, right = r)
}

/** `st_difference(a, b)` — native constructive twin for the erase
  * kernel (`SpatialOps.erase`).
  */
case class StDifferenceExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_difference"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.difference(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geom.GeomOps.difference($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): StDifferenceExpr =
    copy(left = l, right = r)
}

/** `st_union(a, b)` — native binary union (the n-ary/aggregate form is
  * [[StUnionAgg]]).
  */
case class StUnionExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_union"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geom.GeomOps.union($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): StUnionExpr =
    copy(left = l, right = r)
}

/** `st_intersection_polygonal(a, b)` — the fused overlay inner-loop
  * kernel (see [[GeomOps.intersectionPolygonal]]): one JTS pass, no WKB
  * round trip between intersection and the polygonal extraction.
  */
case class StIntersectionPolygonalExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_intersection_polygonal"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.intersectionPolygonal(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geom.GeomOps.intersectionPolygonal($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): StIntersectionPolygonalExpr =
    copy(left = l, right = r)
}

/** `st_difference_polygonal(a, b)` — fused twin for erase/leftovers. */
case class StDifferencePolygonalExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_difference_polygonal"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.differencePolygonal(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geom.GeomOps.differencePolygonal($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): StDifferencePolygonalExpr =
    copy(left = l, right = r)
}

/** `st_polygonal(g)` — keep only the areal component; composed directly
  * over st_intersection/st_difference in overlay and erase, so making it
  * native keeps the whole constructive chain in one codegen span.
  */
case class StPolygonalExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_polygonal"

  override protected def nullSafeEval(input: Any): Any =
    GeomOps.polygonal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geom.GeomOps.polygonal($c)")

  override protected def withNewChildInternal(newChild: Expression): StPolygonalExpr =
    copy(child = newChild)
}

/** `st_makevalid(geom)` as a native Catalyst expression with codegen —
  * SURVEY §4's repair-up-front rule passes EVERY source row through it
  * (p01/p02 hot path), so it belongs inside whole-stage codegen, not
  * behind a UDF boundary. NULL in → NULL out (delete_null=False
  * semantics, via nullIntolerant).
  */
case class StMakeValidExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_makevalid"

  override protected def nullSafeEval(input: Any): Any =
    GeomOps.makeValid(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geom.GeomOps.makeValid($c)")

  override protected def withNewChildInternal(newChild: Expression): StMakeValidExpr =
    copy(child = newChild)
}

/** `st_area_sqmi(geom, srid)` as a native Catalyst expression with
  * codegen — `finalizeLayer` stamps it on every published row (p01/p02
  * hot path), the same repair-up-front argument as st_makevalid.
  */
case class StAreaSqmiExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_area_sqmi"

  override protected def nullSafeEval(g: Any, srid: Any): Any =
    GeomOps.areaSqmi(g.asInstanceOf[Array[Byte]], srid.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, s) => s"graft.geom.GeomOps.areaSqmi($g, $s)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): StAreaSqmiExpr =
    copy(left = l, right = r)
}

/** `st_transform(geom, fromSrid, toSrid)` as a native Catalyst
  * expression with codegen — the reprojection kernel runs on every row
  * of every published layer, so it stays inside whole-stage codegen.
  */
case class StTransformExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_transform"

  override protected def nullSafeEval(g: Any, from: Any, to: Any): Any =
    GeomOps.transform(g.asInstanceOf[Array[Byte]],
      from.asInstanceOf[Int], to.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, f, t) => s"graft.geom.GeomOps.transform($g, $f, $t)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): StTransformExpr =
    copy(first = f, second = s, third = t)
}

object GeomExpressions {
  /** Column wrappers around the native expressions. */
  def st_area_native(c: Column): Column =
    GraftColumnBridge.column(StAreaExpr(GraftColumnBridge.expression(c)))

  def st_transform_native(g: Column, from: Column, to: Column): Column =
    GraftColumnBridge.column(StTransformExpr(
      GraftColumnBridge.expression(g),
      GraftColumnBridge.expression(from),
      GraftColumnBridge.expression(to)))
  def st_intersects_native(a: Column, b: Column): Column =
    GraftColumnBridge.column(StIntersectsExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def st_contains_native(a: Column, b: Column): Column =
    GraftColumnBridge.column(StContainsExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def st_within_native(a: Column, b: Column): Column =
    GraftColumnBridge.column(StWithinExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def st_dwithin_native(a: Column, b: Column, d: Column): Column =
    GraftColumnBridge.column(StDWithinExpr(
      GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b),
      GraftColumnBridge.expression(d)))

  def st_intersection_native(a: Column, b: Column): Column =
    GraftColumnBridge.column(StIntersectionExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def st_difference_native(a: Column, b: Column): Column =
    GraftColumnBridge.column(StDifferenceExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def st_union_native(a: Column, b: Column): Column =
    GraftColumnBridge.column(StUnionExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def st_polygonal_native(c: Column): Column =
    GraftColumnBridge.column(StPolygonalExpr(GraftColumnBridge.expression(c)))

  def st_intersection_polygonal_native(a: Column, b: Column): Column =
    GraftColumnBridge.column(StIntersectionPolygonalExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def st_difference_polygonal_native(a: Column, b: Column): Column =
    GraftColumnBridge.column(StDifferencePolygonalExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def st_makevalid_native(c: Column): Column =
    GraftColumnBridge.column(StMakeValidExpr(GraftColumnBridge.expression(c)))

  def st_area_sqmi_native(g: Column, srid: Column): Column =
    GraftColumnBridge.column(StAreaSqmiExpr(
      GraftColumnBridge.expression(g), GraftColumnBridge.expression(srid)))

  import graft.functions.SqlBuilders.nArgs

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("st_area"),
      new ExpressionInfo(classOf[StAreaExpr].getName, "st_area"),
      nArgs("st_area", 1)(exprs => StAreaExpr(exprs.head))),
    (FunctionIdentifier("st_intersects"),
      new ExpressionInfo(classOf[StIntersectsExpr].getName, "st_intersects"),
      nArgs("st_intersects", 2)(exprs => StIntersectsExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("st_contains"),
      new ExpressionInfo(classOf[StContainsExpr].getName, "st_contains"),
      nArgs("st_contains", 2)(exprs => StContainsExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("st_within"),
      new ExpressionInfo(classOf[StWithinExpr].getName, "st_within"),
      nArgs("st_within", 2)(exprs => StWithinExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("st_dwithin"),
      new ExpressionInfo(classOf[StDWithinExpr].getName, "st_dwithin"),
      nArgs("st_dwithin", 3)(exprs => StDWithinExpr(exprs(0), exprs(1), exprs(2)))),
    (FunctionIdentifier("st_transform"),
      new ExpressionInfo(classOf[StTransformExpr].getName, "st_transform"),
      nArgs("st_transform", 3)(exprs => StTransformExpr(exprs(0), exprs(1), exprs(2)))),
    (FunctionIdentifier("st_intersection"),
      new ExpressionInfo(classOf[StIntersectionExpr].getName, "st_intersection"),
      nArgs("st_intersection", 2)(exprs => StIntersectionExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("st_difference"),
      new ExpressionInfo(classOf[StDifferenceExpr].getName, "st_difference"),
      nArgs("st_difference", 2)(exprs => StDifferenceExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("st_union"),
      new ExpressionInfo(classOf[StUnionExpr].getName, "st_union"),
      nArgs("st_union", 2)(exprs => StUnionExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("st_polygonal"),
      new ExpressionInfo(classOf[StPolygonalExpr].getName, "st_polygonal"),
      nArgs("st_polygonal", 1)(exprs => StPolygonalExpr(exprs.head))),
    (FunctionIdentifier("st_intersection_polygonal"),
      new ExpressionInfo(classOf[StIntersectionPolygonalExpr].getName, "st_intersection_polygonal"),
      nArgs("st_intersection_polygonal", 2)(exprs => StIntersectionPolygonalExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("st_difference_polygonal"),
      new ExpressionInfo(classOf[StDifferencePolygonalExpr].getName, "st_difference_polygonal"),
      nArgs("st_difference_polygonal", 2)(exprs => StDifferencePolygonalExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("st_makevalid"),
      new ExpressionInfo(classOf[StMakeValidExpr].getName, "st_makevalid"),
      nArgs("st_makevalid", 1)(exprs => StMakeValidExpr(exprs.head))),
    (FunctionIdentifier("st_area_sqmi"),
      new ExpressionInfo(classOf[StAreaSqmiExpr].getName, "st_area_sqmi"),
      nArgs("st_area_sqmi", 2)(exprs => StAreaSqmiExpr(exprs(0), exprs(1)))),
    // grid decomposition primitives (the PBSM building blocks the
    // GridJoinRewrite emits) — exposed so SQL users can hand-build a
    // cell-partitioned spatial join or a cell-keyed layout
    (FunctionIdentifier("st_grid_cells"),
      new ExpressionInfo(classOf[graft.plans.StGridCellsExpr].getName, "st_grid_cells"),
      nArgs("st_grid_cells", 3)(exprs => graft.plans.StGridCellsExpr(exprs(0), exprs(1), exprs(2)))),
    (FunctionIdentifier("st_grid_refcell"),
      new ExpressionInfo(classOf[graft.plans.StGridRefCellExpr].getName, "st_grid_refcell"),
      nArgs("st_grid_refcell", 4)(exprs => graft.plans.StGridRefCellExpr(exprs(0), exprs(1), exprs(2), exprs(3)))))
}

/** SparkSessionExtensions hook: `spark.sql("SELECT st_area(geom) …")`
  * works once the session is built `.withExtensions(new GraftExtensions)`
  * or with `spark.sql.extensions=graft.geom.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GeomExpressions.functions.foreach(e.injectFunction)
    graft.functions.VectorFunctions.functions.foreach(e.injectFunction)
    graft.functions.StringFunctions.functions.foreach(e.injectFunction)
    // grid rewrite first: a both-huge spatial join becomes a stock
    // exploded equi-join (AQE + codegen); the strategy then only sees
    // joins the rewrite left alone (broadcast-sized, or gridMode=exec)
    e.injectOptimizerRule(_ => graft.plans.GridJoinRewrite)
    e.injectPlannerStrategy(_ => graft.plans.SpatialJoinStrategy)
  }
}
