package graft.sources

import java.io.StringReader
import java.nio.charset.Charset

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S4 — XML registry scan (reference: `mastr.py:97-148` reads utf-16le
  * part-files of flat `<rowTag><Field>value</Field>…</rowTag>` rows;
  * one table per filename prefix, `Datum*` columns coerce-parsed
  * downstream).
  *
  * Parsing uses the JDK StAX pull parser inside `mapPartitions` over
  * `binaryFiles` — each part-file is decoded with its charset and
  * streamed element-by-element on executors; only Rows cross the
  * shuffle boundary. Columns are declared up front (the registry schema
  * is known per entity type), so no inference pass is needed.
  */
object XmlSource {

  def readFlatXml(spark: SparkSession, pathGlob: String, rowTag: String,
      columns: Seq[String], charset: String = "UTF-16LE"): DataFrame = {
    val colIndex = columns.zipWithIndex.toMap
    val rows = spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (_, stream) =>
        val text = new String(stream.toArray(), Charset.forName(charset))
          // strip BOM if present
          .dropWhile(c => c == '﻿')
        parseRows(text, rowTag, colIndex)
      }
    val schema = StructType(columns.map(StructField(_, StringType)))
    spark.createDataFrame(rows, schema)
  }

  private def parseRows(xml: String, rowTag: String,
      colIndex: Map[String, Int]): Iterator[Row] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    val reader = factory.createXMLStreamReader(new StringReader(xml))
    val out = Seq.newBuilder[Row]
    var current: Array[Any] = null
    var field: String = null
    val sb = new StringBuilder
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val name = reader.getLocalName
          if (name == rowTag) current = Array.fill[Any](colIndex.size)(null)
          else if (current != null && colIndex.contains(name)) {
            field = name; sb.clear()
          }
        case XMLStreamConstants.CHARACTERS =>
          if (field != null) sb.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          val name = reader.getLocalName
          if (name == rowTag && current != null) {
            out += Row.fromSeq(current.toSeq)
            current = null
          } else if (field != null && name == field) {
            current(colIndex(field)) = sb.toString
            field = null
          }
        case _ => ()
      }
    }
    reader.close()
    out.result().iterator
  }
}
