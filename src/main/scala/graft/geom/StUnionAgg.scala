package graft.geom

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.collection.mutable.ArrayBuffer

/** Geometric union aggregate — the dissolve kernel (OP-38,
  * `bunny.py:264-270`; SURVEY §7.4 hard-part #2).
  *
  * Buffers WKBs and unions them in batches of [[StUnionAgg.CompactAt]]
  * via JTS `UnaryUnionOp` (cascaded union): memory per group stays
  * bounded, partial aggregation (map-side combine) works — `merge`
  * concatenates two partial buffers and compacts — and the cascaded
  * union is O(n log n) rather than the O(n²) of naive incremental
  * union. This is what makes dissolve survive a 100 TB shuffle: each
  * map task pre-unions its local slice of every key, so the shuffle
  * carries one compacted geometry per key per task, not every input row.
  */
object StUnionAgg extends Aggregator[Array[Byte], ArrayBuffer[Array[Byte]], Array[Byte]] {
  val CompactAt = 64

  /** Cascaded union with the SURVEY §7.4 robustness ladder: plain union
    * first; on TopologyException fix invalid inputs and retry; as the
    * last resort snap everything to a 1e-6 precision grid (micron-scale
    * for projected meters) and retry — dirty real-world polygons with
    * near-coincident vertices land here, and a deterministic slightly-
    * snapped union beats a failed job.
    */
  private def unionAll(wkbs: Seq[Array[Byte]]): Geometry = {
    val geoms = new java.util.ArrayList[Geometry](wkbs.size)
    wkbs.foreach(w => if (w != null) geoms.add(GeomCodec.read(w)))
    try UnaryUnionOp.union(geoms, GeomCodec.factory)
    catch {
      case _: org.locationtech.jts.geom.TopologyException =>
        val fixed = new java.util.ArrayList[Geometry](geoms.size)
        geoms.forEach { g =>
          fixed.add(if (g.isValid) g else org.locationtech.jts.geom.util.GeometryFixer.fix(g))
        }
        try UnaryUnionOp.union(fixed, GeomCodec.factory)
        catch {
          case _: org.locationtech.jts.geom.TopologyException =>
            val pm = new org.locationtech.jts.geom.PrecisionModel(1e6)
            val snapped = new java.util.ArrayList[Geometry](fixed.size)
            fixed.forEach { g =>
              snapped.add(org.locationtech.jts.precision.GeometryPrecisionReducer.reduce(g, pm))
            }
            UnaryUnionOp.union(snapped, GeomCodec.factory)
        }
    }
  }

  private def compact(b: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] =
    if (b.length < CompactAt) b
    else ArrayBuffer(GeomCodec.write(unionAll(b.toSeq)))

  override def zero: ArrayBuffer[Array[Byte]] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Array[Byte]], a: Array[Byte]): ArrayBuffer[Array[Byte]] = {
    if (a != null) b += a
    compact(b)
  }

  override def merge(a: ArrayBuffer[Array[Byte]], b: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] =
    compact(a ++= b)

  override def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] =
    if (b.isEmpty) null else GeomCodec.write(unionAll(b.toSeq))

  override def bufferEncoder: Encoder[ArrayBuffer[Array[Byte]]] =
    Encoders.kryo[ArrayBuffer[Array[Byte]]]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  /** Column form: `df.groupBy(keys).agg(st_union_agg($"geom"))`. */
  lazy val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(StUnionAgg)
  val st_union_agg: Column => Column = asUdaf.apply(_)
}
