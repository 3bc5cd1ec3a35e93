package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.Row

/** Minimal XLSX reader (OP-04, `retrieve.py:97-106`): Spark has no xlsx
  * source and no POI in the jars, so this parses the OOXML directly —
  * an .xlsx is a zip holding `xl/sharedStrings.xml` and
  * `xl/worksheets/sheet1.xml` (ECMA-376, public spec). Driver-side
  * utility for small workbooks (the reference's inputs are ≤ a few
  * thousand rows); big data never arrives as xlsx.
  *
  * All cells surface as strings — exactly the dtype pinning the
  * reference applies to FIPS columns to keep leading zeros.
  */
object XlsxReader {

  /** Parse sheet1 into rows of (possibly null) strings.
    *
    * Hostile-file policy (SourceChaosProbe): a torn or doctored
    * workbook — truncated zip, corrupt shared-strings XML, a cell
    * indexing past the shared-string table — fails LOUDLY with the
    * path and which part is corrupt; it must never surface as a
    * pathless ZipException/SAXParseException or an opaque
    * IndexOutOfBounds, and never parse garbage cells.
    */
  def readRows(path: String): Seq[Seq[String]] = {
    val zip =
      try new ZipFile(path)
      catch {
        case e: java.util.zip.ZipException => throw new IllegalArgumentException(
          s"$path: not a readable xlsx (zip container rejected: ${e.getMessage})", e)
        case e: java.io.IOException => throw new IllegalArgumentException(
          s"$path: cannot open xlsx: ${e.getMessage}", e)
      }
    try {
      // Corruption vs environment (the Archive.extractZipMember
      // policy, r18 advisor): only PARSE-error classes earn the
      // "corrupt part" diagnosis — SAXException (malformed XML) and
      // ZipException/EOFException (torn deflate stream mid-member).
      // Any other IOException (disk error mid-read) is an environment
      // failure and propagates as an IOException carrying only the
      // path prefix, so the operator is sent at the disk, not the file.
      def classified[A](part: String)(body: => A): A =
        try body
        catch {
          case ex @ (_: org.xml.sax.SAXException |
              _: java.util.zip.ZipException | _: java.io.EOFException) =>
            throw new IllegalArgumentException(
              s"$path: corrupt $part: ${ex.getMessage}", ex)
          case ex: java.io.IOException =>
            throw new java.io.IOException(
              s"$path: I/O error reading $part: ${ex.getMessage}", ex)
          // any OTHER runtime blowup a hostile workbook drives the
          // parser into (NegativeArraySize, DOM errors) is corruption
          // too — it must carry the path, never escape pathless (r19
          // review: the narrowed classifier dropped the old catch-all)
          case scala.util.control.NonFatal(ex)
              if !ex.isInstanceOf[IllegalArgumentException] =>
            throw new IllegalArgumentException(
              s"$path: corrupt $part: ${ex.getClass.getSimpleName}: ${ex.getMessage}", ex)
        }
      val shared: IndexedSeq[String] = Option(zip.getEntry("xl/sharedStrings.xml")) match {
        case Some(e) => classified("xl/sharedStrings.xml")(
          parseSharedStrings(zip.getInputStream(e)))
        case None    => IndexedSeq.empty
      }
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no sheet1 in $path"))
      try classified("xl/worksheets/sheet1.xml")(
        parseSheet(zip.getInputStream(sheetEntry), shared))
      catch {
        case ex: IllegalArgumentException
            if ex.getMessage == null || !ex.getMessage.startsWith(path) =>
          // parseSheet's own cell-level diagnoses: prefix the path once
          throw new IllegalArgumentException(s"$path: ${ex.getMessage}", ex)
      }
    } finally zip.close()
  }

  /** Rows → DataFrame with `skipRows` leading rows dropped and the next
    * row used as the header (pandas `skiprows` + header semantics).
    */
  def toDataFrame(spark: SparkSession, path: String, skipRows: Int = 0): DataFrame = {
    val rows = readRows(path).drop(skipRows)
    require(rows.nonEmpty, s"no data rows in $path after skipping $skipRows")
    val named = rows.head.map(h => Option(h).getOrElse(""))
    // data rows wider than the header keep their trailing cells under
    // pandas' "Unnamed: N" columns (N = 0-based column index) instead
    // of being silently truncated — a manually-edited workbook with an
    // unlabeled trailing column used to lose every cell of it with no
    // signal (r20 review)
    val width = rows.map(_.length).max
    val header = named ++ (named.length until width).map(i => s"Unnamed: $i")
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val data = rows.tail.map { r =>
      Row.fromSeq(r.padTo(width, null).take(width))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  private def parseXml(in: InputStream): Element = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(in).getDocumentElement
  }

  private def children(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] =
    children(parseXml(in), "si").map(si =>
      children(si, "t").map(_.getTextContent).mkString).toIndexedSeq

  private def parseSheet(in: InputStream, shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val rows = new ArrayBuffer[Seq[String]]
    children(parseXml(in), "row").foreach { row =>
      val cells = new ArrayBuffer[String]
      children(row, "c").foreach { c =>
        val colIdx = refToCol(c.getAttribute("r"))
        while (cells.length < colIdx) cells += null
        val t = c.getAttribute("t")
        val v = children(c, "v").headOption.map(_.getTextContent)
        val text = t match {
          case "s" => v.map { i =>
            // a shared-string index past the table (or non-numeric) is
            // a corrupt workbook — name the cell instead of throwing an
            // opaque IndexOutOfBounds/NumberFormat from deep inside
            val idx = try i.toInt catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"cell ${c.getAttribute("r")}: non-numeric shared-string index '$i'") }
            if (idx < 0 || idx >= shared.length) throw new IllegalArgumentException(
              s"cell ${c.getAttribute("r")}: shared-string index $idx out of " +
                s"range (table has ${shared.length} strings — corrupt workbook)")
            shared(idx)
          }.orNull
          case "inlineStr" => children(c, "t").map(_.getTextContent).mkString
          case "b"         => v.map(x => if (x == "1") "True" else "False").orNull
          case _           => v.map(trimNumeric).orNull
        }
        cells += text
      }
      rows += cells.toSeq
    }
    rows.toSeq
  }

  /** "1234.0" → "1234": xlsx stores every number as double; integral
    * values come back int-looking, matching pandas' default rendering.
    */
  private def trimNumeric(s: String): String =
    if (s.matches("-?\\d+\\.0+")) s.substring(0, s.indexOf('.')) else s

  /** "BC12" → 0-based column index 54. */
  private def refToCol(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    math.max(0, acc - 1)
  }
}
