package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry}

import graft.geom.{GeomCodec, GeomFunctions => G}
import graft.operators.{NearestJoin, SpatialOps}

/** Geometry-family scaling probe (r18 verdict task 2): the spatial
  * core — dissolve ([[graft.geom.StUnionAgg]], SURVEY §7.4's "single
  * hardest custom aggregate"), overlay/erase ([[SpatialOps]]),
  * sliverFix, makeValid, and the grid kNN join — was the only operator
  * family with NO measured scaling curve (ScaleProbe's 13 families are
  * all text/vector). This probe measures CPU growth over synthetic
  * polygon grids at 1×/16×/64× feature counts, with multipart and
  * invalid-ring salt, and prints the same GROWTH table as ScaleProbe.
  *
  * Fixture design (the same density-preservation principle as
  * ScaleProbe's affine text permutation): copy `i` of the base N×N
  * unit-square grid is TRANSLATED to its own tile along x, so feature
  * DENSITY is constant — k× the features means k× the real pairing
  * work, never k² stacked overlaps. Salt, deterministic by cell id:
  * every 37th cell is a bowtie (self-intersecting ring — the
  * RepairGeometry class), every 11th is a MultiPolygon (main square +
  * a detached far square inside the tile). Operators that require
  * valid input (JTS union/difference throw TopologyException on
  * bowties) consume the REPAIRED stage output, exactly like the
  * pipeline (OP-44 runs before OP-38/42/43).
  *
  * Scaling knobs follow the 100 TB contract like ScaleProbe's: the
  * dissolve KEY COUNT grows ∝ k at constant group size (`dissolve`),
  * and a second leg (`dissolve_grow`) holds 64 groups fixed so group
  * SIZE grows ∝ k — the partial-merge (map-side combine) claim of
  * SURVEY §7.4 under test; superlinear growth there is a round-20 fix
  * with this curve as its spec. Overlay's b-side is a half-offset 2×2
  * grid (≤ 4 partners per a-row, pair count ∝ k); erase's eraser is
  * one central rectangle per tile (hit count per target row constant).
  *
  * Usage: `sbt "runMain graft.tools.GeomScaleProbe [k1 k2 ...]"`
  * (defaults 1 16 64; `PROBE_GRID_N` overrides the base grid edge).
  */
object GeomScaleProbe {

  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]

  // --- fixture construction (driver-side JTS, staged to parquet) ------

  private val gf = GeomCodec.factory

  private def square(x: Double, y: Double, s: Double = 1.0): Geometry =
    gf.createPolygon(Array(
      new Coordinate(x, y), new Coordinate(x + s, y),
      new Coordinate(x + s, y + s), new Coordinate(x, y + s),
      new Coordinate(x, y)))

  /** Self-intersecting "bowtie" ring over the cell — structurally a
    * polygon, topologically invalid (the OP-44 repair class).
    */
  private def bowtie(x: Double, y: Double): Geometry =
    gf.createPolygon(Array(
      new Coordinate(x, y), new Coordinate(x + 1, y + 1),
      new Coordinate(x + 1, y), new Coordinate(x, y + 1),
      new Coordinate(x, y)))

  /** One copy tile of the base grid: (cell_id, place, wkb). `place`
    * groups 2×2 blocks, namespaced per copy so dissolve group COUNT
    * grows ∝ k at constant group size.
    */
  private def tileRows(copy: Int, n: Int, tileW: Double): Seq[(Long, String, Array[Byte])] = {
    val x0 = copy * tileW
    (0 until n * n).map { c =>
      val (cx, cy) = (c % n, c / n)
      val id = copy.toLong * n * n + c
      val place = s"p${copy}_${cx / 2}_${cy / 2}"
      val g: Geometry =
        if (c % 37 == 13) bowtie(x0 + cx, cy)
        else if (c % 11 == 3) gf.createGeometryCollection(Array(
          square(x0 + cx, cy),
          square(x0 + (cx + n / 2) % n + 0.25, cy + 0.25, 0.5))).union()
        else square(x0 + cx, cy)
      (id, place, GeomCodec.write(g))
    }
  }

  def main(args: Array[String]): Unit = {
    val scales = if (args.isEmpty) Seq(1, 16, 64) else args.toSeq.map(_.toInt)
    // base edge 100 (10k cells): the k=1 cell must sit well above the
    // ~0.3 task-s scheduling/codegen floor of a 32-task stage, or the
    // floor inflates the base and every later ratio reads falsely
    // sublinear (the first probe run at n=50 did exactly that)
    val n = sys.env.getOrElse("PROBE_GRID_N", "100").toInt
    val spark = graft.GraftSession.builder("geom-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val scratch = java.nio.file.Files.createTempDirectory("geom_scale_probe_")
    def stage(df: DataFrame, name: String): DataFrame = {
      val p = scratch.resolve(name).toString
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    // GROWTH compares TASK cpu (the Bench lesson): process CPU charges
    // background C2 compile bursts to whatever runs — the session's
    // startup JIT tail lands in the k=1 (first) cells and fakes
    // sublinear curves at every later k
    val meter = new TaskCpuMeter(spark.sparkContext)

    // leg filter (comma-separated name prefixes): a sensitivity study
    // re-measures ONE family in minutes instead of the whole battery.
    // Empty/unset = run everything (the official battery shape).
    val legOnly = sys.env.get("PROBE_LEGS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    def legSelected(op: String): Boolean =
      legOnly.forall(_.exists(op.startsWith))
    // a typo'd PROBE_LEGS must fail loudly at startup: a prefix that
    // matches no leg would otherwise run an EMPTY battery — staging
    // fixtures for minutes, timing nothing, and printing a header-only
    // GROWTH table (the repo's "no silent caps" norm, r20 review)
    val allLegs = Seq("makevalid", "area_sqmi", "dissolve",
      "dissolve_grow", "grow_const_out", "dissolve_grow_f8",
      "dissolve_grow_f16", "overlay_union", "erase", "sliver_fix",
      "grid_knn")
    legOnly.foreach { sel =>
      val dead = sel.filterNot(p => allLegs.exists(_.startsWith(p)))
      require(dead.isEmpty,
        s"PROBE_LEGS prefixes match no leg: ${dead.mkString(", ")} " +
          s"(legs: ${allLegs.mkString(", ")})")
    }

    val cpuBy = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]
    def time(op: String, k: Int, rows: Long)(body: => Long): Unit = if (legSelected(op)) {
      body // warm pass (JIT + codegen), the ScaleProbe protocol
      graft.CacheLifecycle.release(spark)
      spark.catalog.clearCache()
      meter.settle()
      val w0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val t0 = meter.now
      val out = body
      val wall = (System.nanoTime() - w0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      meter.settle()
      val task = (meter.now - t0) / 1e9
      graft.CacheLifecycle.release(spark)
      spark.catalog.clearCache()
      cpuBy((op, k)) = task
      println(f"PROBE $op%-16s k=$k%2d rows=$rows%8d out=$out%8d " +
        f"wall=$wall%7.2f cpu=$cpu%8.2f task=$task%8.2f")
    }

    val tileW = n + 4.0 // gap keeps copies disjoint: density constant
    scales.foreach { k =>
      val nRows = k.toLong * n * n
      // LAZY fixtures: `time` guards every body with legSelected, so a
      // filtered sensitivity run (PROBE_LEGS=grow_const_out) pays for
      // NO shared staging it doesn't touch — the first cut staged
      // raw/valid/pts at every scale regardless, most of the battery's
      // fixture cost (r20 review)
      lazy val raw = stage(
        (0 until k).flatMap(tileRows(_, n, tileW))
          .toDF("cell_id", "place", "geom")
          .repartition(32), s"grid_$k")

      // OP-44 repair over the salted grid (the bowtie rows do real
      // make-valid work); sum(length) forces the kernel — a bare
      // count() would prune the projection and measure nothing
      time("makevalid", k, nRows) {
        raw.agg(sum(length(G.st_makevalid(col("geom"))))).collect()
          .head.getLong(0)
      }

      // every constructive operator consumes repaired geometry, like
      // the pipeline (OP-44 before OP-38/42/43)
      lazy val valid = stage(raw.select(col("cell_id"), col("place"),
        G.st_makevalid(col("geom")).as("geom")), s"valid_$k")

      // planar-math scan: area in mi² through the native 3310 path
      time("area_sqmi", k, nRows) {
        valid.agg(sum(G.st_area_sqmi(col("geom"), lit(4326)))).collect()
        nRows
      }

      // dissolve, group count ∝ k at constant (~4-cell) group size —
      // the shape a 100 TB dissolve actually has (many places, bounded
      // features per place). sum(length(geom)) forces the union: a
      // bare count() lets column pruning DROP the unused st_union_agg
      // expression from the Aggregate and measures only the groupBy
      // (the first probe run recorded exactly that — flat 0.5 task-s
      // across 64x, a fixture artifact)
      time("dissolve", k, nRows) {
        SpatialOps.dissolve(valid, Seq("place"))
          .agg(sum(length(col("geom")))).collect().head.getLong(0)
      }

      // dissolve, 64 FIXED groups so group size grows ∝ k: the
      // StUnionAgg partial-merge claim under test (SURVEY §7.4) —
      // superlinear CPU here is a real finding, not a fixture artifact
      time("dissolve_grow", k, nRows) {
        SpatialOps.dissolve(
          valid.withColumn("place", col("cell_id") % 64), Seq("place"))
          .agg(sum(length(col("geom")))).collect().head.getLong(0)
      }

      // r20 remainder isolation (the ×178-vs-~117 question): the same
      // 64 fixed groups with input count ∝ k, but every group is two
      // overlapping squares repeated — union OUTPUT stays
      // constant-size while inputs grow, so tier entries never fatten.
      // ~linear here while dissolve_grow reads above its n·log n model
      // pins the excess on the growing accumulated MULTIPOLYGON each
      // tier must traverse (coordinate volume ∝ level), not on tier
      // mechanics or fan-in bookkeeping.
      if (legSelected("grow_const_out")) {
        // the overlap offset must be INDEPENDENT of p = id % 64 (an
        // id % 2 offset is fully determined by p since 2 | 64 — every
        // group would hold one identical square repeated, a JTS
        // coincident-geometry fast path instead of real overlap
        // noding; r20 review finding): (id / 64) % 2 alternates WITHIN
        // each group, so every group unions two genuinely overlapping
        // distinct squares, each repeated k·n²/128 times
        val cstRows = (0 until k).flatMap { copy =>
          (0 until n * n).map { c =>
            val id = copy.toLong * n * n + c
            val p = id % 64
            (id, p, GeomCodec.write(square(p * 3.0 + ((id / 64) % 2) * 0.5, 0.0)))
          }
        }
        val cst = stage(cstRows.toDF("cell_id", "place", "geom")
          .repartition(32), s"cst_$k")
        time("grow_const_out", k, nRows) {
          SpatialOps.dissolve(cst, Seq("place"))
            .agg(sum(length(col("geom")))).collect().head.getLong(0)
        }
      }

      // fan-in sensitivity on the growing-output leg: is FanIn=64 the
      // right constant for coordinate-heavy groups? A smaller fan-in
      // doubles tier depth (more unions) but shrinks the per-call
      // working set — if cache effects dominate, f8/f16 should WIN at
      // 64×; if union-pass count dominates, f64 wins.
      Seq(8, 16).foreach { f =>
        val u = udaf(new graft.geom.TieredUnionAgg(f))
        time(s"dissolve_grow_f$f", k, nRows) {
          valid.withColumn("place", col("cell_id") % 64)
            .groupBy(col("place")).agg(u(col("geom")).as("geom"))
            .agg(sum(length(col("geom")))).collect().head.getLong(0)
        }
      }

      // full planar overlay vs a half-offset coarse grid: ≤ 4 partners
      // per a-row, pair count ∝ k. Attribute names disjoint by
      // construction (overlayUnion contract).
      if (legSelected("overlay_union")) {
  val bRows = (0 until k).flatMap { copy =>
          val x0 = copy * tileW
          (0 until (n / 2) * (n / 2)).map { c =>
            val (cx, cy) = (c % (n / 2), c / (n / 2))
            (copy.toLong * n * n + c,
              GeomCodec.write(square(x0 + 2 * cx + 0.5, 2 * cy + 0.5, 2.0)))
          }
        }
        val b = stage(bRows.toDF("b_id", "geom").repartition(32), s"coarse_$k")
        time("overlay_union", k, nRows) {
          SpatialOps.overlayUnion(
            valid.select(col("cell_id").as("a_id"), col("geom")), b).count()
        }
      }

      // erase: one central rectangle per tile (eraser rows ∝ k, hits
      // per target row constant) — the broadcast-eraser OP-42 shape
      if (legSelected("erase")) {
  val erasers = (0 until k).map { copy =>
          val x0 = copy * tileW
          (copy.toLong, GeomCodec.write(
            square(x0 + n / 4.0, n / 4.0, n / 2.0)))
        }
        val e = stage(erasers.toDF("e_id", "geom").repartition(4), s"erasers_$k")
        time("erase", k, nRows) {
          SpatialOps.erase(valid.select(col("cell_id"), col("geom")),
            e.select(col("geom"))).count()
        }
      }

      // sliverFix: buckets ∝ k, 2 rows per place — a big square and a
      // partner whose multipart carries a sub-threshold sliver touching
      // it (the reference's coastal shape); flatMapGroups per bucket
      if (legSelected("sliver_fix")) {
  val sliverRows = (0 until k).flatMap { copy =>
          val x0 = copy * tileW
          (0 until n * n / 4).flatMap { p =>
            val (px, py) = (p % (n / 2), p / (n / 2))
            val (bx, by) = (x0 + 2 * px, 2 * py.toDouble)
            val id0 = (copy.toLong * n * n + p) * 2
            val big = square(bx, by)
            val sliver = square(bx, by + 1.0, 0.05) // touches big's top edge
            val partner = square(bx + 1, by).union(sliver)
            Seq((s"s${copy}_$p", id0, GeomCodec.write(big)),
              (s"s${copy}_$p", id0 + 1, GeomCodec.write(partner)))
          }
        }
        val sliverDf = stage(
          sliverRows.toDF("place", "oid", "geom").repartition(32), s"sliver_$k")
        time("sliver_fix", k, nRows / 2) {
          SpatialOps.sliverFix(sliverDf, "place", "oid", "geom",
            keepFragments = Seq.empty, thresholdArea = 0.01).count()
        }
      }

      // grid kNN join: cell-center points, right side offset by 0.3 —
      // both sides ∝ k, constant density, so the cell-cogroup rounds
      // must stay linear
      lazy val pts = stage(valid.select(col("cell_id"),
        G.st_point(
          (col("cell_id") % lit(n)).cast("double") +
            (col("cell_id") / lit(n.toLong * n)).cast("long").cast("double") * tileW + 0.5,
          ((col("cell_id") % lit(n.toLong * n)) / lit(n)).cast("long").cast("double") + 0.5)
          .as("geom")), s"pts_$k")
      lazy val ptsR = stage(pts.select((col("cell_id") + lit(1_000_000_000L)).as("r_id"),
        G.st_point(G.st_x(col("geom")) + lit(0.3), G.st_y(col("geom")) + lit(0.3))
          .as("r_geom")), s"pts_r_$k")
      time("grid_knn", k, nRows) {
        NearestJoin.nearestJoinGrid(pts, "geom", ptsR, "r_geom",
          k = 1, cellSize = 4.0).count()
      }
    }

    val base = scales.head
    println(f"\nGROWTH (cpu_k / cpu_${base}%d; linear ⇒ ≈k/${base}%d)")
    cpuBy.keys.map(_._1).toSeq.distinct.foreach { op =>
      val line = scales.map { k =>
        val r = cpuBy((op, k)) / cpuBy((op, base))
        f"k=$k%2d:${r}%6.2f"
      }.mkString("  ")
      println(f"GROWTH $op%-16s $line")
    }
    spark.stop()
  }
}
