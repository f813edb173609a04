package graft.sources

import java.io.{ByteArrayInputStream, StringReader}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S3 — native Excel (xlsx) reading without POI: an xlsx is a zip of
  * XML parts, so this composes the [[ArchiveSource]] zip handling with
  * the [[XmlSource]] StAX approach. Reference sites that read xlsx
  * directly: `regelleistung.py:535`, `jrc-idees.py:55-91`,
  * `iwugebaeudetypen.py:44-47`, `scigrid.py:37-42`.
  *
  * Coverage matches what those sites need: sheet selection by name,
  * shared-string / inline-string / numeric cells, empty-cell gaps,
  * header row → column names, and pandas-style `na_values`
  * substitution. Everything lands as strings (the reference coerces
  * types downstream, same as the CSV dialects path).
  *
  * Scale posture: a single xlsx is bounded (Excel caps at ~1M rows) and
  * the reference treats workbooks as small dimension inputs; the data
  * pass still runs on executors via `binaryFiles` (one task per
  * workbook, so a directory of workbooks parses in parallel). Only the
  * schema probe (header row of the first workbook) touches the driver.
  */
object XlsxSource {

  /** "BC" in "BC12" → 0-based column index 54. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && Character.isLetter(ref.charAt(i))) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** Decompression-bomb guards: a crafted workbook can deflate KBs
    * into GBs (zip ratios beyond 1000:1), and the previous
    * readAllBytes would OOM the executor before any row was parsed.
    * Caps sit far above any real workbook (Excel itself stops at
    * ~1M rows per sheet) but bound task memory BY CONSTRUCTION. */
  private val MaxMemberBytes: Long = 512L << 20
  private val MaxArchiveBytes: Long = 1L << 30

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] =
    zipEntries(bytes, MaxMemberBytes, MaxArchiveBytes)

  private[graft] def zipEntries(bytes: Array[Byte], maxMember: Long,
      maxTotal: Long): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var total = 0L
    val out = Map.newBuilder[String, Array[Byte]]
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory)
      .foreach { e =>
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = zin.read(chunk)
        while (n >= 0) {
          total += n
          require(buf.size() + n <= maxMember && total <= maxTotal,
            s"xlsx member '${e.getName}' inflates past the bomb guard " +
              s"(member cap $maxMember B, archive cap $maxTotal B)")
          buf.write(chunk, 0, n)
          n = zin.read(chunk)
        }
        out += e.getName -> buf.toByteArray
      }
    out.result()
  }

  private def stax(xml: String) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f.createXMLStreamReader(new StringReader(xml))
  }

  /** `xl/sharedStrings.xml` → string table (concatenated `<t>` runs per
    * `<si>`, so rich-text strings read as their plain text). */
  private def sharedStrings(entries: Map[String, Array[Byte]]): Array[String] =
    entries.get("xl/sharedStrings.xml").map { bytes =>
      val r = stax(new String(bytes, StandardCharsets.UTF_8))
      val out = Array.newBuilder[String]
      val sb = new StringBuilder
      var inT = false; var inSi = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; sb.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += sb.toString
              case _ =>
            }
          case _ =>
        }
      }
      r.close()
      out.result()
    }.getOrElse(Array.empty)

  /** Resolve a sheet name to its worksheet part path via
    * `xl/workbook.xml` (name → r:id) + `xl/_rels/workbook.xml.rels`
    * (r:id → target). */
  private def sheetPath(entries: Map[String, Array[Byte]], sheet: String)
      : String = {
    val wb = new String(entries("xl/workbook.xml"), StandardCharsets.UTF_8)
    var rid: String = null
    val r = stax(wb)
    while (r.hasNext && rid == null) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet" &&
          r.getAttributeValue(null, "name") == sheet) {
        // the r:id attribute is namespaced; scan attributes by local name
        rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue).orNull
      }
    }
    r.close()
    require(rid != null, s"xlsx sheet '$sheet' not found in workbook " +
      s"(sheets: ${listSheetNames(entries).mkString(", ")})")
    val rels = new String(entries("xl/_rels/workbook.xml.rels"),
      StandardCharsets.UTF_8)
    var target: String = null
    val rr = stax(rels)
    while (rr.hasNext && target == null) {
      if (rr.next() == XMLStreamConstants.START_ELEMENT &&
          rr.getLocalName == "Relationship" &&
          rr.getAttributeValue(null, "Id") == rid)
        target = rr.getAttributeValue(null, "Target")
    }
    rr.close()
    require(target != null, s"xlsx relationship '$rid' unresolved")
    if (target.startsWith("/")) target.substring(1)
    else "xl/" + target
  }

  private def listSheetNames(entries: Map[String, Array[Byte]]): Seq[String] = {
    val wb = new String(entries("xl/workbook.xml"), StandardCharsets.UTF_8)
    val out = Seq.newBuilder[String]
    val r = stax(wb)
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet")
        out += r.getAttributeValue(null, "name")
    }
    r.close()
    out.result()
  }

  /** Sheet names of a workbook (reference `jrc-idees.py:55` iterates
    * sheets). Driver-side: reads one file's workbook part. */
  def sheetNames(spark: SparkSession, path: String): Seq[String] =
    listSheetNames(zipEntries(readFirstFile(spark, path)))

  /** Worksheet XML → rows of raw cell strings (positional, gaps =
    * null). Cell types: `t="s"` shared string, `t="inlineStr"`
    * `<is><t>`, `t="str"`/`t="b"`/default numeric read `<v>` verbatim. */
  private def sheetRows(entries: Map[String, Array[Byte]], path: String,
      shared: Array[String]): Seq[Array[String]] = {
    val xml = new String(entries(path), StandardCharsets.UTF_8)
    val r = stax(xml)
    val rows = Seq.newBuilder[Array[String]]
    var cells: collection.mutable.ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    var cellType: String = null
    var inV = false; var inIsT = false
    var sawValue = false // <v> or inline <t> present: style-only blanks have neither
    var nextCol = 0
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              cells = collection.mutable.ArrayBuffer.empty; nextCol = 0
            case "c" if cells != null =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colIndex(ref) else nextCol
              nextCol = cellCol + 1
              cellType = r.getAttributeValue(null, "t")
              sawValue = false
              sb.clear()
            case "v" if cellCol >= 0 => inV = true; sawValue = true
            case "t" if cellCol >= 0 && cellType == "inlineStr" =>
              inIsT = true; sawValue = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" if cellCol >= 0 =>
              val raw = sb.toString
              val value = cellType match {
                case "s" if sawValue && raw.trim.nonEmpty =>
                  shared(raw.trim.toInt)
                case _ => raw
              }
              // a cell with no <v>/<is> at all (style-only blank, any
              // t attribute) is a GAP — null, same as an absent cell;
              // a present-but-empty string value stays ""
              if (sawValue &&
                  (value.nonEmpty || cellType == "s" || cellType == "inlineStr"))
                cells += ((cellCol, value))
              cellCol = -1; cellType = null
            case "row" if cells != null =>
              if (cells.nonEmpty) {
                val width = cells.map(_._1).max + 1
                val arr = new Array[String](width)
                cells.foreach { case (i, v) => arr(i) = v }
                rows += arr
              } else rows += Array.empty[String]
              cells = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  private def readFirstFile(spark: SparkSession, pathGlob: String)
      : Array[Byte] = {
    val first = spark.sparkContext.binaryFiles(pathGlob).first()
    first._2.toArray()
  }

  /** Read one sheet (by name) of every workbook under `pathGlob` into a
    * DataFrame. First row = header (column names, first workbook wins);
    * all columns are strings; cells whose text is in `naValues` become
    * null — the reference's `pd.read_excel(..., na_values=...)`
    * semantics (`jrc-idees.py:58`). */
  def readSheet(spark: SparkSession, pathGlob: String, sheet: String,
      naValues: Set[String] = Set("")): DataFrame = {
    // schema probe: header row of the first workbook, driver-side
    val firstEntries = zipEntries(readFirstFile(spark, pathGlob))
    val headerRow = sheetRows(firstEntries,
      sheetPath(firstEntries, sheet), sharedStrings(firstEntries))
      .headOption.getOrElse(
        throw new IllegalArgumentException(s"xlsx sheet '$sheet' is empty"))
    val columns = headerRow.map(h => Option(h).getOrElse("")).toSeq
    val width = columns.length
    val rows = spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (_, stream) =>
        val entries = zipEntries(stream.toArray())
        val shared = sharedStrings(entries)
        sheetRows(entries, sheetPath(entries, sheet), shared)
          .drop(1) // header
          .map { raw =>
            val vals = (0 until width).map { i =>
              val v = if (i < raw.length) raw(i) else null
              if (v == null || naValues.contains(v)) null else v
            }
            Row.fromSeq(vals)
          }
      }
    val schema = StructType(columns.map(StructField(_, StringType)))
    spark.createDataFrame(rows, schema)
  }

  // ---- minimal writer (fixture generation / Excel landing) ----

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** Write a minimal valid xlsx: `sheets` = (name, rows), where a cell
    * is null (skipped), a Number (numeric cell) or anything else
    * (shared-string cell). Exercises the same part layout real
    * producers emit, so the reader round-trips production workbooks. */
  def writeXlsx(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    val strings = collection.mutable.LinkedHashMap.empty[String, Int]
    def sid(s: String): Int =
      strings.getOrElseUpdate(s, strings.size)

    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }

    val sheetXmls = sheets.map { case (_, rows) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.flatMap { case (v, ci) =>
          val ref = s"${colRef(ci)}${ri + 1}"
          v match {
            case null => None
            case n: Int => Some(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Long => Some(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Double => Some(s"""<c r="$ref"><v>$n</v></c>""")
            case s => Some(s"""<c r="$ref" t="s"><v>${sid(s.toString)}</v></c>""")
          }
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    }

    val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetTags</sheets></workbook>"""
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString +
      s"""<Relationship Id="rIdS" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>"""
    val workbookRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>"""
    // sheet XMLs are already built, so the shared-string table is final
    val sst = {
      val sis = strings.keys
        .map(s => s"""<si><t>${xmlEscape(s)}</t></si>""").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">$sis</sst>"""
    }

    val zout = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes(StandardCharsets.UTF_8))
      zout.closeEntry()
    }
    put("[Content_Types].xml", contentTypes)
    put("_rels/.rels", rootRels)
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", workbookRels)
    put("xl/sharedStrings.xml", sst)
    sheetXmls.zipWithIndex.foreach { case (xml, i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", xml)
    }
    zout.close()
  }
}
