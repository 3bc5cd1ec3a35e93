package graft.geom

import org.locationtech.jts.geom.{Geometry, GeometryFactory, PrecisionModel}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** WKB/WKT codec. Geometry at rest is a `BinaryType` WKB column (the
  * engine's "multimodal" column pattern, SURVEY §1.1); JTS objects exist
  * only transiently inside expressions. JTS readers/writers are not
  * thread-safe → one per thread.
  */
object GeomCodec {
  val factory = new GeometryFactory(new PrecisionModel(), 0)

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter())

  def read(wkb: Array[Byte]): Geometry =
    if (wkb == null) null else wkbReader.get().read(wkb)

  def write(g: Geometry): Array[Byte] =
    if (g == null) null else wkbWriter.get().write(g)

  def fromWkt(wkt: String): Geometry =
    if (wkt == null) null else wktReader.get().read(wkt)

  def toWkt(g: Geometry): String =
    if (g == null) null else wktWriter.get().write(g)

  def wktToWkb(wkt: String): Array[Byte] = write(fromWkt(wkt))
  def wkbToWkt(wkb: Array[Byte]): String = toWkt(read(wkb))
}
