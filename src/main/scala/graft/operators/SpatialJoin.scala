package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.index.strtree.STRtree

import graft.geom.GeomCodec

/** Broadcast spatial join on an STRtree (SURVEY §4 item 3 — the 100 TB
  * path for erase/overlay).
  *
  * A predicate join like `a JOIN b ON st_intersects(a.geom, b.geom)`
  * plans as BroadcastNestedLoopJoin: every (a, b) pair is tested —
  * O(|a|·|b|) geometry decodes. Here the small side is collected,
  * indexed once into an STRtree (R-tree bulk load), broadcast, and each
  * streaming-side partition probes the index: O(|a|·log|b|) with only
  * envelope tests before the exact predicate. The big side never
  * shuffles and the index is built once per executor, not per row.
  *
  * The output schema is left columns ++ right columns (caller ensures
  * disjoint names), matching what the equivalent predicate join yields.
  */
object SpatialJoin {

  /** Inner intersects-join of `big` against broadcast-indexed `small`. */
  def broadcastIntersects(
      big: DataFrame, small: DataFrame,
      bigGeom: String = "geom", smallGeom: String = "geom"): DataFrame = {

    val spark = big.sparkSession
    val smallSchema = small.schema
    val smallRows = small.collect()
    require(smallRows.length <= 5000000,
      s"broadcast side too large (${smallRows.length} rows) for an in-memory STRtree")
    val smallGeomIdx = smallSchema.fieldIndex(smallGeom)
    val bc = spark.sparkContext.broadcast(smallRows)

    val bigSchema = big.schema
    val bigGeomIdx = bigSchema.fieldIndex(bigGeom)
    val outSchema = StructType(bigSchema.fields ++ smallSchema.fields)

    big.mapPartitions { rows =>
      // build (or reuse) the index once per partition from the
      // broadcast rows; JTS geometries decode once per executor-task
      val entries = bc.value.map { r =>
        val wkb = r.getAs[Array[Byte]](smallGeomIdx)
        (r, if (wkb == null) null else GeomCodec.read(wkb))
      }
      val index = new STRtree()
      entries.foreach { case (r, g) => if (g != null) index.insert(g.getEnvelopeInternal, (r, g)) }

      rows.flatMap { row =>
        val wkb = row.getAs[Array[Byte]](bigGeomIdx)
        val g = if (wkb == null) null else GeomCodec.read(wkb)
        if (g == null) Iterator.empty
        else {
          val candidates = index.query(g.getEnvelopeInternal)
          val it = candidates.iterator()
          val out = scala.collection.mutable.ArrayBuffer[Row]()
          while (it.hasNext) {
            val (sr, sg) = it.next().asInstanceOf[(Row, Geometry)]
            if (g.intersects(sg))
              out += Row.fromSeq(row.toSeq ++ sr.toSeq)
          }
          out.iterator
        }
      }
    }(Encoders.row(outSchema))
  }
}
