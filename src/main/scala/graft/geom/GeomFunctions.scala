package graft.geom

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.Geometry

/** ST_* column functions over WKB (OP-44..49, SURVEY §2.8).
  *
  * The hot-path vocabulary — predicates planned by the spatial join
  * strategy (st_intersects/st_contains/st_within/st_dwithin), the
  * per-row kernels (st_area, st_transform), and the constructive chain
  * in overlay/erase (st_intersection/st_difference/st_union/
  * st_polygonal) — is native codegen'd Catalyst expressions
  * ([[GeomExpressions]], SURVEY §4 phase 2). The long tail of cold
  * accessors stays as Scala UDFs: correctness-identical, and their
  * call sites are driver-side config or QA paths where the UDF
  * boundary is noise.
  *
  * Each UDF body lives in exactly ONE `UserDefinedFunction` value; the
  * Column API and [[registerAll]] both use that value, so the SQL and
  * Column surfaces cannot drift apart (an earlier inline-lambda
  * registerAll had silently dropped st_dump/st_collect).
  */
object GeomFunctions {
  import GeomCodec.{read, write}

  private val stGeomFromWktUdf: UserDefinedFunction =
    udf((wkt: String) => if (wkt == null) null else GeomCodec.wktToWkb(wkt))

  private val stAsWktUdf: UserDefinedFunction =
    udf((wkb: Array[Byte]) => if (wkb == null) null else GeomCodec.wkbToWkt(wkb))

  /** WKT → WKB (test fixtures and literals). */
  val st_geomfromwkt: Column => Column = stGeomFromWktUdf.apply(_)

  val st_aswkt: Column => Column = stAsWktUdf.apply(_)

  /** OP-44 RepairGeometry (`bunny.py:221-226`): fix invalid rings,
    * preserve nulls (delete_null=False semantics) — native codegen'd
    * expression ([[GeomExpressions.st_makevalid_native]]): every source
    * row passes through it (repair-up-front), so it stays inside
    * whole-stage codegen.
    */
  val st_makevalid: Column => Column = GeomExpressions.st_makevalid_native(_)

  /** Planar area in the geometry's own CRS units — native codegen'd
    * expression ([[GeomExpressions.st_area_native]]), not a UDF.
    */
  val st_area: Column => Column = GeomExpressions.st_area_native(_)

  private val stIsEmptyUdf: UserDefinedFunction =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else java.lang.Boolean.valueOf(g.isEmpty) })

  private val stIsValidUdf: UserDefinedFunction =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else java.lang.Boolean.valueOf(g.isValid) })

  private val stNumGeometriesUdf: UserDefinedFunction =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else java.lang.Integer.valueOf(g.getNumGeometries) })

  val st_isempty: Column => Column = stIsEmptyUdf.apply(_)
  val st_isvalid: Column => Column = stIsValidUdf.apply(_)
  val st_numgeometries: Column => Column = stNumGeometriesUdf.apply(_)

  /** OP-45 Project (`bunny.py:475-498`): reproject between
    * 4326/3857/3310 — native codegen'd expression.
    */
  def st_transform(geom: Column, fromSrid: Column, toSrid: Column): Column =
    GeomExpressions.st_transform_native(geom, fromSrid, toSrid)

  /** OP-46 area in mi², computed in equal-area EPSG:3310 regardless of
    * layer CRS (`bunny.py:500-506`, `config.py:48-51`) — native
    * codegen'd expression ([[GeomExpressions.st_area_sqmi_native]]):
    * `finalizeLayer` stamps it on every published row.
    */
  def st_area_sqmi(geom: Column, srid: Column): Column =
    GeomExpressions.st_area_sqmi_native(geom, srid)

  // --- binary predicates (OP-49, coastline.py:129-147) ----------------

  private def pred(f: (Geometry, Geometry) => Boolean): UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val (ga, gb) = (read(a), read(b))
      if (ga == null || gb == null) null
      else java.lang.Boolean.valueOf(f(ga, gb))
    })

  private val stTouchesUdf  = pred(_ touches _)
  private val stDisjointUdf = pred(_ disjoint _)
  private val stCoversUdf   = pred(_ covers _)
  private val stCrossesUdf  = pred(_ crosses _)
  private val stOverlapsUdf = pred(_ overlaps _)

  /** Native codegen'd expressions (see [[GeomExpressions]]) — also
    * what [[graft.plans.SpatialJoinStrategy]] pattern-matches to plan
    * index joins, so predicate joins written with these get the STRtree
    * physical operator automatically.
    */
  val st_intersects: (Column, Column) => Column = GeomExpressions.st_intersects_native(_, _)
  val st_contains:   (Column, Column) => Column = GeomExpressions.st_contains_native(_, _)
  val st_touches:    (Column, Column) => Column = stTouchesUdf.apply(_, _)
  val st_disjoint:   (Column, Column) => Column = stDisjointUdf.apply(_, _)

  // --- binary constructive ops (OP-42/43/49) --------------------------

  /** Native codegen'd expressions (see [[GeomExpressions]]): the
    * overlay/erase inner loops compose st_polygonal over
    * st_intersection/st_difference per candidate pair, so the whole
    * constructive chain evaluates inside one codegen span with no UDF
    * boxing.
    */
  val st_intersection: (Column, Column) => Column = GeomExpressions.st_intersection_native(_, _)
  val st_difference:   (Column, Column) => Column = GeomExpressions.st_difference_native(_, _)
  val st_union:        (Column, Column) => Column = GeomExpressions.st_union_native(_, _)

  /** Keep only the polygonal component of a mixed-dimension overlay
    * result (touching inputs intersect in lines/points; planar overlay
    * semantics want areas only). Native codegen'd expression.
    */
  val st_polygonal: Column => Column = GeomExpressions.st_polygonal_native(_)

  /** Fused `st_polygonal(st_intersection(…))` / `st_polygonal(
    * st_difference(…))` — bit-identical to the compositions but with no
    * WKB serialize→parse round trip between the kernels; what the
    * overlay/erase inner loops evaluate per candidate pair.
    */
  val st_intersection_polygonal: (Column, Column) => Column =
    GeomExpressions.st_intersection_polygonal_native(_, _)
  val st_difference_polygonal: (Column, Column) => Column =
    GeomExpressions.st_difference_polygonal_native(_, _)

  private val stDumpUdf: UserDefinedFunction =
    udf((wkb: Array[Byte]) => {
      val g = read(wkb)
      if (g == null) null
      else (0 until g.getNumGeometries).map(i => write(g.getGeometryN(i))).toArray
    })

  private val stCollectUdf: UserDefinedFunction =
    udf((parts: Array[Array[Byte]]) => {
      if (parts == null) null
      else {
        val gs = parts.filter(_ != null).map(read)
        if (gs.isEmpty) null
        else write(GeomCodec.factory.buildGeometry(java.util.Arrays.asList(gs: _*)))
      }
    })

  /** OP-48 multipart decomposition: WKB → array of per-part WKBs
    * (explode for st_dump semantics, coastline.py:121-127).
    */
  val st_dump: Column => Column = stDumpUdf.apply(_)

  /** OP-48 recomposition: array of WKBs → one (multi)geometry union. */
  val st_collect: Column => Column = stCollectUdf.apply(_)

  // --- general GIS vocabulary (beyond the reference's call sites, part
  // --- of the complete engine surface) --------------------------------

  private def geo1(f: Geometry => Geometry): UserDefinedFunction =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else write(f(g)) })

  private def num1(f: Geometry => Double): UserDefinedFunction =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else java.lang.Double.valueOf(f(g)) })

  private val stCentroidUdf   = geo1(_.getCentroid)
  private val stEnvelopeUdf   = geo1(_.getEnvelope)
  private val stConvexHullUdf = geo1(_.convexHull())
  private val stBoundaryUdf   = geo1(_.getBoundary)
  private val stLengthUdf     = num1(_.getLength)

  val st_centroid: Column => Column = stCentroidUdf.apply(_)
  val st_envelope: Column => Column = stEnvelopeUdf.apply(_)
  val st_convexhull: Column => Column = stConvexHullUdf.apply(_)
  val st_boundary: Column => Column = stBoundaryUdf.apply(_)
  val st_length: Column => Column = stLengthUdf.apply(_)

  private val stBufferUdf: UserDefinedFunction =
    udf((wkb: Array[Byte], d: Double) => {
      val g = read(wkb); if (g == null) null else write(g.buffer(d))
    })

  private val stSimplifyUdf: UserDefinedFunction =
    udf((wkb: Array[Byte], t: Double) => {
      val g = read(wkb)
      if (g == null) null
      else write(org.locationtech.jts.simplify.DouglasPeuckerSimplifier.simplify(g, t))
    })

  private val stDistanceUdf: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val (ga, gb) = (read(a), read(b))
      if (ga == null || gb == null) null else java.lang.Double.valueOf(ga.distance(gb))
    })

  def st_buffer(geom: Column, distance: Column): Column = stBufferUdf(geom, distance)

  def st_simplify(geom: Column, tolerance: Column): Column = stSimplifyUdf(geom, tolerance)

  val st_distance: (Column, Column) => Column = stDistanceUdf.apply(_, _)

  // JTS getCoordinate returns null for a non-empty GeometryCollection
  // whose FIRST component is empty (isEmpty alone doesn't cover it), so
  // the coordinate itself is null-checked too
  private val stXUdf: UserDefinedFunction =
    udf((wkb: Array[Byte]) => {
      val g = read(wkb)
      if (g == null || g.isEmpty) null
      else {
        val c = g.getCoordinate
        if (c == null) null else java.lang.Double.valueOf(c.x)
      }
    })

  private val stYUdf: UserDefinedFunction =
    udf((wkb: Array[Byte]) => {
      val g = read(wkb)
      if (g == null || g.isEmpty) null
      else {
        val c = g.getCoordinate
        if (c == null) null else java.lang.Double.valueOf(c.y)
      }
    })

  /** First-coordinate accessors (point X/Y; for non-points, the first
    * coordinate — matching the "representative vertex" reading used by
    * CRS checks). NULL for empty geometries and for collections whose
    * first component is empty.
    */
  val st_x: Column => Column = stXUdf.apply(_)
  val st_y: Column => Column = stYUdf.apply(_)

  private val stPointUdf: UserDefinedFunction =
    udf((px: Double, py: Double) =>
      GeomCodec.write(GeomCodec.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(px, py))))

  def st_point(x: Column, y: Column): Column = stPointUdf(x, y)

  def st_dwithin(a: Column, b: Column, distance: Column): Column =
    GeomExpressions.st_dwithin_native(a, b, distance)

  val st_within:   (Column, Column) => Column = GeomExpressions.st_within_native(_, _)
  val st_covers:   (Column, Column) => Column = stCoversUdf.apply(_, _)
  val st_crosses:  (Column, Column) => Column = stCrossesUdf.apply(_, _)
  val st_overlaps: (Column, Column) => Column = stOverlapsUdf.apply(_, _)

  /** Register the ST vocabulary for `spark.sql` users as named UDFs —
    * the SAME `UserDefinedFunction` values the Column API uses, so the
    * two surfaces cannot drift. Functions with native codegen'd twins
    * (st_area, st_intersects, st_contains, st_within, st_dwithin,
    * st_transform, st_intersection, st_difference, st_union,
    * st_polygonal, st_makevalid, st_area_sqmi) are NOT registered here —
    * they come via [[GraftExtensions]], and a UDF registration would
    * shadow the native (hiding it from both codegen and the
    * spatial-join planner strategy).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val u = spark.udf
    u.register("st_geomfromwkt", stGeomFromWktUdf)
    u.register("st_aswkt", stAsWktUdf)
    u.register("st_isempty", stIsEmptyUdf)
    u.register("st_isvalid", stIsValidUdf)
    u.register("st_numgeometries", stNumGeometriesUdf)
    u.register("st_centroid", stCentroidUdf)
    u.register("st_envelope", stEnvelopeUdf)
    u.register("st_convexhull", stConvexHullUdf)
    u.register("st_boundary", stBoundaryUdf)
    u.register("st_length", stLengthUdf)
    u.register("st_buffer", stBufferUdf)
    u.register("st_simplify", stSimplifyUdf)
    u.register("st_distance", stDistanceUdf)
    u.register("st_x", stXUdf)
    u.register("st_y", stYUdf)
    u.register("st_point", stPointUdf)
    u.register("st_dump", stDumpUdf)
    u.register("st_collect", stCollectUdf)
    u.register("st_touches", stTouchesUdf)
    u.register("st_disjoint", stDisjointUdf)
    u.register("st_covers", stCoversUdf)
    u.register("st_crosses", stCrossesUdf)
    u.register("st_overlaps", stOverlapsUdf)
    spark.udf.register("st_union_agg", StUnionAgg.asUdaf)
  }
}
