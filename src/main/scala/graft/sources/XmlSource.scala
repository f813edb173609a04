package graft.sources

import java.nio.charset.Charset

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S4 — XML registry scan (reference: `mastr.py:97-148` reads utf-16le
  * part-files of flat `<rowTag><Field>value</Field>…</rowTag>` rows;
  * one table per filename prefix, `Datum*` columns coerce-parsed
  * downstream).
  *
  * Parsing uses the JDK StAX pull parser over `binaryFiles` — each
  * part-file STREAMS through `PortableDataStream.open()` and rows are
  * emitted from a lazy pull-iterator, so task memory is O(one row)
  * even for the multi-GB MaStR part-files (previously the whole file
  * was decoded into one String and all rows buffered). Only Rows
  * cross the shuffle boundary. Columns are declared up front (the
  * registry schema is known per entity type), so no inference pass is
  * needed.
  */
object XmlSource {

  def readFlatXml(spark: SparkSession, pathGlob: String, rowTag: String,
      columns: Seq[String], charset: String = "UTF-16LE"): DataFrame = {
    val colIndex = columns.zipWithIndex.toMap
    val rows = spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (_, stream) =>
        val raw = new java.io.InputStreamReader(
          stream.open(), Charset.forName(charset))
        // strip a BOM if present (the charset decoder surfaces it as
        // U+FEFF); push anything else back
        val rd = new java.io.PushbackReader(raw, 1)
        val first = rd.read()
        if (first != -1 && first != 0xFEFF) rd.unread(first)
        parseRows(rd, rowTag, colIndex)
      }
    val schema = StructType(columns.map(StructField(_, StringType)))
    spark.createDataFrame(rows, schema)
  }

  /** Lazy pull-iterator: advances the StAX reader just far enough to
    * produce the next `rowTag` row; closes the reader (and with it the
    * underlying stream) at document end. */
  private def parseRows(in: java.io.Reader, rowTag: String,
      colIndex: Map[String, Int]): Iterator[Row] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    val reader: XMLStreamReader = factory.createXMLStreamReader(in)
    new Iterator[Row] {
      private var nextRow: Row = null
      private var done = false
      private var current: Array[Any] = null
      private var field: String = null
      private val sb = new StringBuilder

      private def advance(): Unit = {
        while (nextRow == null && !done) {
          if (!reader.hasNext) {
            reader.close(); in.close(); done = true
          } else reader.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              val name = reader.getLocalName
              if (name == rowTag) {
                current = Array.fill[Any](colIndex.size)(null)
                // attribute-shaped records (the iso-codes / appstream
                // style: <entry code="AED" name="…"/>) fill columns
                // from the row tag's attributes; a child ELEMENT of
                // the same name written later overrides (MaStR-style
                // child fields stay authoritative)
                var i = 0
                while (i < reader.getAttributeCount) {
                  colIndex.get(reader.getAttributeLocalName(i))
                    .foreach(ix => current(ix) = reader.getAttributeValue(i))
                  i += 1
                }
              } else if (current != null && colIndex.contains(name)) {
                field = name; sb.clear()
              }
            case XMLStreamConstants.CHARACTERS =>
              if (field != null) sb.append(reader.getText)
            case XMLStreamConstants.END_ELEMENT =>
              val name = reader.getLocalName
              if (name == rowTag && current != null) {
                nextRow = Row.fromSeq(current.toSeq)
                current = null
              } else if (field != null && name == field) {
                current(colIndex(field)) = sb.toString
                field = null
              }
            case _ => ()
          }
        }
      }

      def hasNext: Boolean = { advance(); nextRow != null }
      def next(): Row = {
        advance()
        if (nextRow == null) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }
}
