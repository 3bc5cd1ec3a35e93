package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.index.strtree.{GeometryItemDistance, STRtree}

import graft.geom.GeomCodec

/** Broadcast k-nearest-neighbour spatial join: for every left row, the
  * `k` nearest right rows by geometric distance — "which jurisdiction
  * is this address closest to", the lookup the reference's users run
  * against its published layers.
  *
  * Scale shape: the right side is a reference layer (jurisdictions,
  * fences — broadcast-sized by nature, same contract as
  * [[JoinField]]); it broadcasts once and each partition builds one
  * STRtree, probed per left row with JTS's branch-and-bound
  * `nearestNeighbour` (no distance bound needed, no cross join). The
  * 100 TB side streams partition-parallel and never shuffles.
  * `mapPartitions` rather than a Catalyst operator because kNN's
  * ordered-result semantics don't decompose into relational built-ins
  * (SURVEY §7.3 preference order, tier d).
  */
object NearestJoin {

  /** Left kNN join. Right columns surface as `near_<name>`, plus
    * `near_distance` (geometry units). Rows with NULL left geometry
    * are dropped (inner semantics); fewer than `k` right rows yield
    * that many neighbours.
    *
    * `maxRightRows` enforces the broadcast-sized contract BEFORE the
    * driver collect: misuse fails with an actionable error instead of
    * a driver OOM. Raise it explicitly for a bigger reference layer
    * (and a bigger driver), or pre-aggregate/simplify the right side.
    */
  def nearestJoin(
      left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String,
      k: Int = 1,
      maxRightRows: Long = 4_000_000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRightRows >= 1, "maxRightRows must be >= 1")
    // limit(max+1) bounds the probe itself: it never scans or collects
    // more than maxRightRows+1 rows even when the right side is huge
    val overLimit = right.limit(
      (maxRightRows + 1).min(Int.MaxValue.toLong).toInt).count()
    require(overLimit <= maxRightRows,
      s"nearestJoin right side exceeds maxRightRows=$maxRightRows: it is " +
        "collected to the driver and broadcast as a built STRtree, so it must " +
        "be a broadcast-sized reference layer (same contract as JoinField). " +
        "Swap the sides if the other input is the small one, pre-aggregate " +
        "(e.g. dissolve) the reference layer, or raise maxRightRows if the " +
        "driver really has the memory.")
    val spark = left.sparkSession
    val rightSchema = right.schema

    val outNames = left.schema.fieldNames ++
      rightSchema.fieldNames.map(n => s"near_$n") :+ "near_distance"
    val dups = outNames.groupBy(identity).collect { case (n, vs) if vs.length > 1 => n }
    require(dups.isEmpty,
      s"output column collision: ${dups.mkString(", ")} — rename the offending " +
        "left column or right column (right columns surface as near_<name>, " +
        "plus the synthetic near_distance)")

    val rightGeomIdx = rightSchema.fieldIndex(rightGeom)
    // build the STRtree ONCE on the driver (right is broadcast-sized
    // by contract) and broadcast it BUILT — tasks pay only the probe,
    // not a per-task O(n) WKB decode + O(n log n) tree build
    val tree = new STRtree()
    var n = 0
    right.collect().foreach { row =>
      val wkb = row.getAs[Array[Byte]](rightGeomIdx)
      if (wkb != null) {
        val g = GeomCodec.read(wkb)
        tree.insert(g.getEnvelopeInternal, (g, row))
        n += 1
      }
    }
    if (n > 0) tree.build()
    val bcTree = spark.sparkContext.broadcast(tree)
    val nRight = n
    val leftGeomIdx = left.schema.fieldIndex(leftGeom)
    val kk = k

    val outSchema = StructType(
      left.schema.fields ++
        rightSchema.fields.map(f => f.copy(name = s"near_${f.name}")) :+
        StructField("near_distance", DoubleType, nullable = false))

    val rdd = left.rdd.mapPartitions { iter =>
      if (nRight == 0) Iterator.empty
      else {
        val tree = bcTree.value
        val dist = new GeometryItemDistance {
          override def distance(
              a: org.locationtech.jts.index.strtree.ItemBoundable,
              b: org.locationtech.jts.index.strtree.ItemBoundable): Double = {
            def geomOf(x: org.locationtech.jts.index.strtree.ItemBoundable): Geometry =
              x.getItem match {
                case (g: Geometry, _) => g
                case g: Geometry => g
              }
            geomOf(a).distance(geomOf(b))
          }
        }
        iter.flatMap { lrow =>
          val wkb = lrow.getAs[Array[Byte]](leftGeomIdx)
          if (wkb == null) Iterator.empty
          else {
            val g = GeomCodec.read(wkb)
            val nbrs = tree.nearestNeighbour(
              g.getEnvelopeInternal, (g, null), dist, math.min(kk, nRight))
            nbrs.iterator.map { item =>
              val (ng, nrow) = item.asInstanceOf[(Geometry, Row)]
              Row.fromSeq(lrow.toSeq ++ nrow.toSeq :+ g.distance(ng))
            }
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
