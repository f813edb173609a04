package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S8 — native read-only SQLite scan, no JDBC driver required
  * (reference: `opsd.py:49-51` ingests the OPSD national generation
  * capacity sqlite dump; the build is offline, so a driver jar can't be
  * resolved — instead this parses the public, stable SQLite file format
  * directly: page-based table B-trees, varint records, overflow-page
  * chains).
  *
  * Coverage: table B-trees (leaf + interior, any depth), all record
  * serial types (NULL, 1/2/3/4/6/8-byte ints, float64, const 0/1,
  * TEXT, BLOB), payload overflow chains, `INTEGER PRIMARY KEY` rowid
  * aliasing, and schema discovery from `sqlite_schema`. Indexes, WAL
  * sidecars and freelists are ignored — a read of a committed database
  * file never needs them.
  *
  * Values land as strings (ints/floats via toString, blobs as lowercase
  * hex, NULL as null) — the same land-then-coerce posture as the CSV /
  * XML / xlsx sources. The data pass runs on executors via
  * `binaryFiles`, one task per database file, so a directory of dumps
  * parses in parallel; only the schema probe touches the driver.
  */
object SqliteSource {

  // ---- low-level file parsing ----

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** SQLite varint: ≤9 bytes, 7 bits each for the first 8, all 8 bits
    * of the 9th. Returns (value, bytesRead). */
  private def varint(b: Array[Byte], o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(o + i)
      v = (v << 7) | (x & 0x7fL)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(o + 8) & 0xffL), 9)
  }

  private class Db(bytes: Array[Byte]) {
    require(bytes.length > 100 &&
      new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3",
      "not a SQLite database file")
    val pageSize: Int = {
      val raw = u16(bytes, 16)
      if (raw == 1) 65536 else raw
    }
    private val reserved = bytes(20) & 0xff
    private val usable = pageSize - reserved
    private val maxLocal = usable - 35
    private val minLocal = (usable - 12) * 32 / 255 - 23

    private def pageOff(page: Long): Int = ((page - 1) * pageSize).toInt

    /** Full payload of a table-leaf cell, following the overflow chain
      * when the record doesn't fit locally. */
    private def payload(cellOff: Int, payloadLen: Long): Array[Byte] = {
      if (payloadLen <= maxLocal) {
        java.util.Arrays.copyOfRange(bytes, cellOff, cellOff + payloadLen.toInt)
      } else {
        val surplus = minLocal + ((payloadLen - minLocal) % (usable - 4)).toInt
        val local = if (surplus <= maxLocal) surplus else minLocal
        val out = new Array[Byte](payloadLen.toInt)
        System.arraycopy(bytes, cellOff, out, 0, local)
        var written = local
        var overflow = u32(bytes, cellOff + local)
        while (overflow != 0 && written < payloadLen) {
          val po = pageOff(overflow)
          overflow = u32(bytes, po)
          val n = math.min(usable - 4, payloadLen.toInt - written)
          System.arraycopy(bytes, po + 4, out, written, n)
          written += n
        }
        out
      }
    }

    /** Depth-first walk of a table B-tree → (rowid, record payload). */
    def rows(rootPage: Long): Iterator[(Long, Array[Byte])] = {
      val off = pageOff(rootPage)
      val hdr = if (rootPage == 1) off + 100 else off
      val pageType = bytes(hdr) & 0xff
      // header: type u8, first-freeblock u16 @1, cell count u16 @3,
      // content start u16 @5, fragmented u8 @7, right-child u32 @8
      // (interior only)
      val nCells = u16(bytes, hdr + 3)
      pageType match {
        case 0x0d => // leaf table
          (0 until nCells).iterator.map { i =>
            val cellOff = off + u16(bytes, hdr + 8 + i * 2)
            val (plen, n1) = varint(bytes, cellOff)
            val (rowid, n2) = varint(bytes, cellOff + n1)
            (rowid, payload(cellOff + n1 + n2, plen))
          }
        case 0x05 => // interior table
          val children = (0 until nCells).iterator.map { i =>
            val cellOff = off + u16(bytes, hdr + 12 + i * 2)
            u32(bytes, cellOff)
          } ++ Iterator.single(u32(bytes, hdr + 8))
          children.flatMap(rows)
        case other => throw new IllegalStateException(
          s"unexpected b-tree page type 0x${other.toHexString} " +
            s"on page $rootPage (index page reached from a table root?)")
      }
    }

    /** Decode a record payload → column values (Any: null, Long,
      * Double, String, Array[Byte]). */
    def record(p: Array[Byte]): Array[Any] = {
      val (hdrLen, n0) = varint(p, 0)
      var ho = n0
      val types = Array.newBuilder[Long]
      while (ho < hdrLen) {
        val (t, n) = varint(p, ho)
        types += t; ho += n
      }
      var vo = hdrLen.toInt
      types.result().map { t =>
        val (v, size): (Any, Int) = t match {
          case 0 => (null, 0)
          case 1 => (p(vo).toLong, 1)
          case 2 => ((p(vo).toLong << 8) | (p(vo + 1) & 0xffL), 2)
          case 3 =>
            ((p(vo).toLong << 16) | ((p(vo + 1) & 0xffL) << 8) |
              (p(vo + 2) & 0xffL), 3)
          case 4 =>
            ((p(vo).toLong << 24) | ((p(vo + 1) & 0xffL) << 16) |
              ((p(vo + 2) & 0xffL) << 8) | (p(vo + 3) & 0xffL), 4)
          case 5 =>
            var v = p(vo).toLong
            for (i <- 1 until 6) v = (v << 8) | (p(vo + i) & 0xffL)
            (v, 6)
          case 6 =>
            var v = p(vo).toLong
            for (i <- 1 until 8) v = (v << 8) | (p(vo + i) & 0xffL)
            (v, 8)
          case 7 =>
            var v = p(vo).toLong
            for (i <- 1 until 8) v = (v << 8) | (p(vo + i) & 0xffL)
            (java.lang.Double.longBitsToDouble(v), 8)
          case 8 => (0L, 0)
          case 9 => (1L, 0)
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            (new String(p, vo, len, StandardCharsets.UTF_8), len)
          case n if n >= 12 && n % 2 == 0 =>
            val len = ((n - 12) / 2).toInt
            (java.util.Arrays.copyOfRange(p, vo, vo + len), len)
          case n => throw new IllegalStateException(s"serial type $n")
        }
        vo += size
        v
      }
    }
  }

  // ---- schema handling ----

  private case class TableInfo(name: String, rootPage: Long,
      columns: Seq[String], rowidAlias: Int)

  /** sqlite_schema rows: (type, name, tbl_name, rootpage, sql). */
  private def schema(db: Db): Seq[TableInfo] =
    db.rows(1).map(r => db.record(r._2)).collect {
      case Array("table", name: String, _, root: Long, sql: String) =>
        val (cols, alias) = parseCreate(sql)
        TableInfo(name, root, cols, alias)
    }.toSeq

  /** Column names (and the INTEGER-PRIMARY-KEY rowid-alias index, -1 if
    * none) from a CREATE TABLE statement. */
  private[graft] def parseCreate(sql: String): (Seq[String], Int) = {
    val open = sql.indexOf('(')
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    // split on top-level commas (types like DECIMAL(10,2) nest parens)
    val parts = Seq.newBuilder[String]
    var depth = 0; var start = 0
    for (i <- body.indices) body.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => parts += body.substring(start, i); start = i + 1
      case _ =>
    }
    parts += body.substring(start)
    val constraint =
      "(?i)^\\s*(PRIMARY\\s+KEY|UNIQUE|CHECK|FOREIGN\\s+KEY|CONSTRAINT)\\b".r
    val all = parts.result().map(_.trim).filter(_.nonEmpty)
    val (constraints, defs) =
      all.partition(d => constraint.findFirstIn(d).isDefined)
    def ident(t: String): String =
      t.charAt(0) match {
        // quoted identifiers may contain whitespace
        case '"' => t.substring(1, t.indexOf('"', 1))
        case '`' => t.substring(1, t.indexOf('`', 1))
        case '[' => t.substring(1, t.indexOf(']'))
        case _ => t.split("\\s+")(0)
      }
    val names = defs.map(ident)
    // rowid aliasing: either the column-def form `id INTEGER PRIMARY
    // KEY` or the table-constraint form `..., PRIMARY KEY (id)` over a
    // single INTEGER-typed column — both store NULL in the record and
    // mean rowid (sqlite docs §rowid); missing the latter would read
    // the PK back as all NULLs.
    val colFormAlias = defs.indexWhere(d =>
      "(?i)\\bINTEGER\\s+PRIMARY\\s+KEY\\b".r.findFirstIn(d).isDefined)
    val alias =
      if (colFormAlias >= 0) colFormAlias
      else {
        // optionally named: `CONSTRAINT t_pk PRIMARY KEY (id)`; the
        // name may be a quoted identifier containing whitespace
        val pkRe = ("(?i)^(?:CONSTRAINT\\s+(?:\"[^\"]*\"|`[^`]*`|" +
          "\\[[^\\]]*\\]|\\S+)\\s+)?PRIMARY\\s+KEY\\s*\\(([^,)]+)\\)\\s*$").r
        constraints.collectFirst {
          // Regex.unapplySeq anchors to the whole string — one
          // evaluation, no .get
          case pkRe(inner0) =>
            val name = ident(inner0.trim)
            defs.indexWhere { d =>
              ident(d) == name &&
                "(?i)\\bINTEGER\\b".r.findFirstIn(d).isDefined
            }
        }.getOrElse(-1)
      }
    (names, alias)
  }

  private def readFirstFile(spark: SparkSession, pathGlob: String)
      : Array[Byte] =
    spark.sparkContext.binaryFiles(pathGlob).first()._2.toArray()

  /** Table names in the database (schema probe, driver-side). */
  def tableNames(spark: SparkSession, path: String): Seq[String] =
    schema(new Db(readFirstFile(spark, path))).map(_.name)

  private def toStringValue(v: Any): String = v match {
    case null => null
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case other => other.toString
  }

  /** Read one table of every database under `pathGlob` into a
    * DataFrame of strings. */
  def readTable(spark: SparkSession, pathGlob: String, table: String)
      : DataFrame = {
    val probe = schema(new Db(readFirstFile(spark, pathGlob)))
    val info = probe.find(_.name == table).getOrElse(
      throw new IllegalArgumentException(s"sqlite table '$table' not " +
        s"found (tables: ${probe.map(_.name).mkString(", ")})"))
    val width = info.columns.length
    val rows = spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (_, stream) =>
        val db = new Db(stream.toArray())
        val ti = schema(db).find(_.name == table).getOrElse(
          throw new IllegalArgumentException(
            s"sqlite table '$table' missing in one input file"))
        db.rows(ti.rootPage).map { case (rowid, payload) =>
          val rec = db.record(payload)
          val vals = (0 until width).map { i =>
            if (i == ti.rowidAlias && (i >= rec.length || rec(i) == null))
              rowid.toString // INTEGER PRIMARY KEY stores NULL = rowid
            else if (i < rec.length) toStringValue(rec(i))
            else null
          }
          Row.fromSeq(vals)
        }
      }
    val schemaStruct = StructType(info.columns.map(StructField(_, StringType)))
    spark.createDataFrame(rows, schemaStruct)
  }
}
