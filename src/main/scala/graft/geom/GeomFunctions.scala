package graft.geom

import org.apache.spark.sql.Column
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
  */
object GeomFunctions {
  import GeomCodec.{read, write}

  /** WKT → WKB (test fixtures and literals). */
  val st_geomfromwkt: Column => Column =
    udf((wkt: String) => if (wkt == null) null else GeomCodec.wktToWkb(wkt)).apply(_)

  val st_aswkt: Column => Column =
    udf((wkb: Array[Byte]) => if (wkb == null) null else GeomCodec.wkbToWkt(wkb)).apply(_)

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

  val st_isempty: Column => Column =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else java.lang.Boolean.valueOf(g.isEmpty) }).apply(_)

  val st_isvalid: Column => Column =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else java.lang.Boolean.valueOf(g.isValid) }).apply(_)

  val st_numgeometries: Column => Column =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else java.lang.Integer.valueOf(g.getNumGeometries) }).apply(_)

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

  private def pred(f: (Geometry, Geometry) => Boolean) =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val (ga, gb) = (read(a), read(b))
      if (ga == null || gb == null) null
      else java.lang.Boolean.valueOf(f(ga, gb))
    })

  /** Native codegen'd expressions (see [[GeomExpressions]]) — also
    * what [[graft.plans.SpatialJoinStrategy]] pattern-matches to plan
    * index joins, so predicate joins written with these get the STRtree
    * physical operator automatically.
    */
  val st_intersects: (Column, Column) => Column = GeomExpressions.st_intersects_native(_, _)
  val st_contains:   (Column, Column) => Column = GeomExpressions.st_contains_native(_, _)
  val st_touches:    (Column, Column) => Column = pred(_ touches _).apply(_, _)
  val st_disjoint:   (Column, Column) => Column = pred(_ disjoint _).apply(_, _)

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

  /** OP-48 multipart decomposition: WKB → array of per-part WKBs
    * (explode for st_dump semantics, coastline.py:121-127).
    */
  val st_dump: Column => Column =
    udf((wkb: Array[Byte]) => {
      val g = read(wkb)
      if (g == null) null
      else (0 until g.getNumGeometries).map(i => write(g.getGeometryN(i))).toArray
    }).apply(_)

  /** OP-48 recomposition: array of WKBs → one (multi)geometry union. */
  val st_collect: Column => Column =
    udf((parts: Array[Array[Byte]]) => {
      if (parts == null) null
      else {
        val gs = parts.filter(_ != null).map(read)
        if (gs.isEmpty) null
        else write(GeomCodec.factory.buildGeometry(java.util.Arrays.asList(gs: _*)))
      }
    }).apply(_)

  // --- general GIS vocabulary (beyond the reference's call sites, part
  // --- of the complete engine surface) --------------------------------

  private def geo1(f: Geometry => Geometry) =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else write(f(g)) })

  private def num1(f: Geometry => Double) =
    udf((wkb: Array[Byte]) => { val g = read(wkb); if (g == null) null else java.lang.Double.valueOf(f(g)) })

  val st_centroid: Column => Column = geo1(_.getCentroid).apply(_)
  val st_envelope: Column => Column = geo1(_.getEnvelope).apply(_)
  val st_convexhull: Column => Column = geo1(_.convexHull()).apply(_)
  val st_boundary: Column => Column = geo1(_.getBoundary).apply(_)
  val st_length: Column => Column = num1(_.getLength).apply(_)

  def st_buffer(geom: Column, distance: Column): Column =
    udf((wkb: Array[Byte], d: Double) => {
      val g = read(wkb); if (g == null) null else write(g.buffer(d))
    }).apply(geom, distance)

  def st_simplify(geom: Column, tolerance: Column): Column =
    udf((wkb: Array[Byte], t: Double) => {
      val g = read(wkb)
      if (g == null) null
      else write(org.locationtech.jts.simplify.DouglasPeuckerSimplifier.simplify(g, t))
    }).apply(geom, tolerance)

  val st_distance: (Column, Column) => Column =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val (ga, gb) = (read(a), read(b))
      if (ga == null || gb == null) null else java.lang.Double.valueOf(ga.distance(gb))
    }).apply(_, _)

  /** First-coordinate accessors (point X/Y; for non-points, the first
    * coordinate — matching the "representative vertex" reading used by
    * CRS checks).
    */
  val st_x: Column => Column =
    udf((wkb: Array[Byte]) => {
      val g = read(wkb)
      if (g == null || g.isEmpty) null else java.lang.Double.valueOf(g.getCoordinate.x)
    }).apply(_)

  val st_y: Column => Column =
    udf((wkb: Array[Byte]) => {
      val g = read(wkb)
      if (g == null || g.isEmpty) null else java.lang.Double.valueOf(g.getCoordinate.y)
    }).apply(_)

  def st_point(x: Column, y: Column): Column =
    udf((px: Double, py: Double) =>
      GeomCodec.write(GeomCodec.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(px, py)))).apply(x, y)

  def st_dwithin(a: Column, b: Column, distance: Column): Column =
    GeomExpressions.st_dwithin_native(a, b, distance)

  val st_within:   (Column, Column) => Column = GeomExpressions.st_within_native(_, _)
  val st_covers:   (Column, Column) => Column = pred(_ covers _).apply(_, _)
  val st_crosses:  (Column, Column) => Column = pred(_ crosses _).apply(_, _)
  val st_overlaps: (Column, Column) => Column = pred(_ overlaps _).apply(_, _)

  /** Register the ST vocabulary for `spark.sql` users as named UDFs.
    * Functions with native codegen'd twins (st_area, st_intersects,
    * st_contains, st_within, st_dwithin, st_transform, st_intersection,
    * st_difference, st_union, st_polygonal) are NOT registered here —
    * they come via [[GraftExtensions]], and a UDF registration would
    * shadow the native (hiding it from both codegen and the
    * spatial-join planner strategy).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val u = spark.udf
    u.register("st_geomfromwkt", (w: String) => if (w == null) null else GeomCodec.wktToWkb(w))
    u.register("st_aswkt", (b: Array[Byte]) => if (b == null) null else GeomCodec.wkbToWkt(b))
    // st_makevalid is NOT registered here: it is a native injected
    // expression (GraftExtensions), and a UDF of the same name would
    // shadow it out of whole-stage codegen
    u.register("st_isempty", (b: Array[Byte]) => { val g = read(b); if (g == null) null else java.lang.Boolean.valueOf(g.isEmpty) })
    u.register("st_isvalid", (b: Array[Byte]) => { val g = read(b); if (g == null) null else java.lang.Boolean.valueOf(g.isValid) })
    u.register("st_numgeometries", (b: Array[Byte]) => { val g = read(b); if (g == null) null else java.lang.Integer.valueOf(g.getNumGeometries) })
    // st_area_sqmi is NOT registered here: native injected expression
    // (GraftExtensions), same shadowing rule as st_makevalid
    u.register("st_centroid", (b: Array[Byte]) => { val g = read(b); if (g == null) null else write(g.getCentroid) })
    u.register("st_envelope", (b: Array[Byte]) => { val g = read(b); if (g == null) null else write(g.getEnvelope) })
    u.register("st_convexhull", (b: Array[Byte]) => { val g = read(b); if (g == null) null else write(g.convexHull()) })
    u.register("st_boundary", (b: Array[Byte]) => { val g = read(b); if (g == null) null else write(g.getBoundary) })
    u.register("st_length", (b: Array[Byte]) => { val g = read(b); if (g == null) null else java.lang.Double.valueOf(g.getLength) })
    u.register("st_buffer", (b: Array[Byte], d: Double) => { val g = read(b); if (g == null) null else write(g.buffer(d)) })
    u.register("st_simplify", (b: Array[Byte], t: Double) => {
      val g = read(b)
      if (g == null) null
      else write(org.locationtech.jts.simplify.DouglasPeuckerSimplifier.simplify(g, t))
    })
    u.register("st_distance", (a: Array[Byte], b: Array[Byte]) => {
      val (ga, gb) = (read(a), read(b))
      if (ga == null || gb == null) null else java.lang.Double.valueOf(ga.distance(gb))
    })
    def reg2(name: String, f: (Geometry, Geometry) => Boolean): Unit =
      u.register(name, (a: Array[Byte], b: Array[Byte]) => {
        val (ga, gb) = (read(a), read(b))
        if (ga == null || gb == null) null else java.lang.Boolean.valueOf(f(ga, gb))
      })
    u.register("st_x", (b: Array[Byte]) => {
      val g = read(b)
      if (g == null || g.isEmpty) null else java.lang.Double.valueOf(g.getCoordinate.x)
    })
    u.register("st_y", (b: Array[Byte]) => {
      val g = read(b)
      if (g == null || g.isEmpty) null else java.lang.Double.valueOf(g.getCoordinate.y)
    })
    u.register("st_point", (x: Double, y: Double) =>
      GeomCodec.write(GeomCodec.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(x, y))))
    reg2("st_touches", _ touches _)
    reg2("st_disjoint", _ disjoint _)
    reg2("st_covers", _ covers _)
    reg2("st_crosses", _ crosses _)
    reg2("st_overlaps", _ overlaps _)
    spark.udf.register("st_union_agg", StUnionAgg.asUdaf)
  }
}
