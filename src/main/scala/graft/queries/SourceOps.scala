package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactAgg
import graft.sources.{ArchiveSource, SqliteSource, XlsxSource, XmlSource}

/** Source-format round-trips surfaced as oracle-checked queries: the
  * workbook is LANDED from the parquet tables at runtime (deterministic
  * bytes), read back through the native source, and the result is
  * hash-compared against DuckDB running directly on the original
  * tables — so the source's parsing semantics (shared strings, numeric
  * cells, empty gaps, na_values) are part of the correctness gate, not
  * just spec-asserted.
  */
object SourceOps {

  /** Land a fixture file via temp-file + atomic rename: a concurrent
    * JVM reading the previous copy keeps its open inode, and nobody
    * ever observes a half-written file at the target path. */
  private def landAtomically(target: java.io.File)
      (write: java.io.File => Unit): String = {
    val staging = java.io.File.createTempFile(
      target.getName + ".", ".tmp", target.getParentFile)
    try {
      write(staging)
      java.nio.file.Files.move(staging.toPath, target.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case e: Throwable =>
      java.nio.file.Files.deleteIfExists(staging.toPath)
      throw e
    }
    target.toString
  }

  val qs: Seq[Q] = Seq(

    // S3 — native xlsx: multi-sheet workbook (nation + region sheets,
    // the `jrc-idees.py:55-91` shape), na_values substitution
    // (`pd.read_excel(..., na_values=...)`), string/number cells, then
    // a join + aggregate over the landed sheets. The oracle computes
    // the same result from the parquet tables directly, so any parsing
    // defect breaks the hash.
    Q("q59_xlsx_roundtrip",
      (s, dir) => {
        val nation = Tables.load(s, dir, "nation")
          .selectExpr("CAST(n_nationkey AS LONG) AS k", "n_name",
            "CAST(n_regionkey AS LONG) AS rk")
          .orderBy("k").collect()
        val region = Tables.load(s, dir, "region")
          .selectExpr("CAST(r_regionkey AS LONG) AS k", "r_name")
          .orderBy("k").collect()
        // `note` exercises na_values: the literal "NA" for even keys
        // must come back as null; odd keys carry a real note
        val natRows: Seq[Seq[Any]] = nation.toSeq.map { r =>
          Seq[Any](r.getLong(0), r.getString(1), r.getLong(2),
            if (r.getLong(0) % 2 == 0) "NA" else s"note-${r.getLong(0)}")
        }
        val regRows: Seq[Seq[Any]] =
          region.toSeq.map(r => Seq[Any](r.getLong(0), r.getString(1)))
        val path = landAtomically(new java.io.File(
          sys.props("java.io.tmpdir"),
          "graft-q59-" + dir.replaceAll("[^A-Za-z0-9._-]", "_") + ".xlsx")) {
          f => XlsxSource.writeXlsx(f.toString, Seq(
            ("nation",
              Seq[Any]("n_nationkey", "n_name", "n_regionkey", "note") +: natRows),
            ("region", Seq[Any]("r_regionkey", "r_name") +: regRows)))
        }
        val nat = XlsxSource
          .readSheet(s, path, "nation", naValues = Set("", "NA"))
          .select(col("n_nationkey").cast("long").as("n_nationkey"),
            col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"),
            col("note"))
        val reg = XlsxSource.readSheet(s, path, "region")
          .select(col("r_regionkey").cast("long").as("r_regionkey"),
            col("r_name"))
        nat.join(reg, col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n"),
            sum(col("n_nationkey")).as("keysum"),
            count(col("note")).as("n_notes"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, count(*) AS n,
          CAST(sum(n_nationkey) AS BIGINT) AS keysum,
          CAST(sum(CASE WHEN n_nationkey % 2 = 0 THEN 0 ELSE 1 END)
            AS BIGINT) AS n_notes
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // S8 — native SQLite scan (`opsd.py:49-51`): the committed sample
    // database (page_size=512 → multi-level B-tree + overflow chains,
    // INTEGER PRIMARY KEY rowid aliasing, NULLs) is parsed by the
    // pure-Scala format reader and aggregated; the oracle pins the
    // golden group aggregates (independently computed by sqlite3
    // itself at fixture-generation time).
    Q("q62_sqlite_scan",
      (s, dir) => {
        // landing path is keyed by the resource's content md5 (a
        // regenerated fixture can't silently reuse a stale copy) and
        // written via temp-file + atomic move (a concurrent JVM never
        // observes a half-written database)
        val bytes = {
          val in = getClass.getResourceAsStream("/graft/opsd_sample.sqlite")
          try in.readAllBytes() finally in.close()
        }
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map(b => f"${b & 0xff}%02x").mkString
        val tmp = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft-opsd-sample-$md5.sqlite")
        if (!tmp.exists()) {
          val staging = java.nio.file.Files.createTempFile(
            tmp.getParentFile.toPath, "graft-opsd-", ".tmp")
          java.nio.file.Files.write(staging, bytes)
          try java.nio.file.Files.move(staging, tmp.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException =>
            java.nio.file.Files.deleteIfExists(staging) // lost the race
          }
        }
        SqliteSource.readTable(s, tmp.toString, "plants")
          .groupBy(col("technology"))
          .agg(count(lit(1)).as("n"),
            ExactAgg.dsum(col("capacity_mw").cast("double")).as("total_mw"),
            count(col("notes")).as("with_notes"))
          .orderBy("technology")
      },
      Some("""SELECT technology, CAST(n AS BIGINT) AS n,
          CAST(total_mw AS DOUBLE) AS total_mw,
          CAST(with_notes AS BIGINT) AS with_notes
        FROM (VALUES
          ('biomass', 500, 625000.0, 429),
          ('gas', 500, 625625.0, 428),
          ('solar', 500, 624375.0, 429),
          ('wind', 500, 626250.0, 429))
        AS t(technology, n, total_mw, with_notes)
        ORDER BY technology""")),

    // S5 — archive expansion: a dimension-sized slice of the customer
    // table landed as a two-member zip (csv per key-parity, the
    // frequency.py zip-of-csv shape), expanded executor-side,
    // member-tagged, parsed as headered CSV, aggregated. Oracle
    // recomputes from parquet with the same key cap — the cap keeps
    // the driver-side fixture synthesis O(1k rows) at ANY scale
    // factor (the operator under test runs on executors; only the
    // test fixture is driver-built).
    Q("q65_zip_csv_roundtrip",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 1000)
          .selectExpr("CAST(c_custkey AS LONG) AS k", "c_mktsegment",
            "CAST(c_acctbal AS DOUBLE) AS bal")
          .orderBy("k").collect()
        val path = landAtomically(new java.io.File(
          sys.props("java.io.tmpdir"),
          "graft-q65-" + dir.replaceAll("[^A-Za-z0-9._-]", "_") + ".zip")) {
          f =>
            val zout = new java.util.zip.ZipOutputStream(
              new java.io.FileOutputStream(f))
            try {
              for (parity <- Seq(0, 1)) {
                zout.putNextEntry(
                  new java.util.zip.ZipEntry(s"part$parity.csv"))
                val lines = "c_custkey,c_mktsegment,c_acctbal\n" +
                  cust.filter(_.getLong(0) % 2 == parity).map(r =>
                    s"${r.getLong(0)},${r.getString(1)},${r.getDouble(2)}")
                    .mkString("\n")
                zout.write(
                  lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                zout.closeEntry()
              }
            } finally zout.close()
        }
        val a = ArchiveSource.zipMemberCsv(s, path, "part0.csv")
        val b = ArchiveSource.zipMemberCsv(s, path, "part1.csv")
        a.unionByName(b)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            ExactAgg.dsum(col("c_acctbal").cast("double")).as("total_bal"),
            max(col("c_custkey").cast("long")).as("max_key"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n,
          ${ExactAgg.sqlSum("c_acctbal")} AS total_bal,
          CAST(max(c_custkey) AS BIGINT) AS max_key
        FROM customer WHERE c_custkey <= 1000
        GROUP BY 1 ORDER BY 1""")),

    // S5 (bz2) — the dwd.py:106 shape: a bz2-compressed payload
    // decompressed executor-side (commons-compress, multi-stream
    // aware) and parsed as CSV lines. The nation table (dimension-
    // sized at every SF) is landed as one bz2 CSV, read back through
    // bz2Lines, and aggregated; oracle recomputes from parquet.
    Q("q139_bz2_roundtrip",
      (s, dir) => {
        val nat = Tables.load(s, dir, "nation")
          .selectExpr("CAST(n_nationkey AS LONG) AS k", "n_name",
            "CAST(n_regionkey AS LONG) AS rk")
          .orderBy("k").collect()
        val path = landAtomically(new java.io.File(
          sys.props("java.io.tmpdir"),
          "graft-q139-" + dir.replaceAll("[^A-Za-z0-9._-]", "_") +
            ".csv.bz2")) { f =>
          val out = new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorOutputStream(new java.io.FileOutputStream(f))
          try {
            val text = "n_nationkey,n_name,n_regionkey\n" +
              nat.map(r =>
                s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)}")
                .mkString("\n")
            out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          } finally out.close()
        }
        import s.implicits._
        val lines = ArchiveSource.bz2Lines(s, path)
          .select("line").as[String]
        s.read.option("header", "true").csv(lines)
          .groupBy(col("n_regionkey").cast("long").as("region_key"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_nationkey").cast("long")).as("keysum"),
            max(col("n_name")).as("max_name"))
          .orderBy("region_key")
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS region_key,
          count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS keysum,
          max(n_name) AS max_name
        FROM nation GROUP BY 1 ORDER BY 1""")),

    // S5 (7z) — the refit.py:50-61 shape: a 7z-of-CSV archive
    // (py7zr writes LZMA2) whose members are read by name. A capped
    // supplier slice lands as two LZMA2 members split by key parity,
    // both read back through sevenZMemberCsv (commons-compress + xz —
    // Spark's own classpath), unioned, aggregated; oracle recomputes
    // from parquet under the same cap.
    Q("q140_sevenz_roundtrip",
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
          .filter(col("s_suppkey") <= 1000)
          .selectExpr("CAST(s_suppkey AS LONG) AS k",
            "CAST(s_nationkey AS LONG) AS nk",
            "CAST(s_acctbal AS DOUBLE) AS bal")
          .orderBy("k").collect()
        val path = landAtomically(new java.io.File(
          sys.props("java.io.tmpdir"),
          "graft-q140-" + dir.replaceAll("[^A-Za-z0-9._-]", "_") +
            ".7z")) { f =>
          val out = new org.apache.commons.compress.archivers.sevenz
            .SevenZOutputFile(f)
          try {
            for (parity <- Seq(0, 1)) {
              val e = new org.apache.commons.compress.archivers.sevenz
                .SevenZArchiveEntry()
              e.setName(s"House_$parity.csv")
              out.putArchiveEntry(e)
              val text = "s_suppkey,s_nationkey,s_acctbal\n" +
                sup.filter(_.getLong(0) % 2 == parity).map(r =>
                  s"${r.getLong(0)},${r.getLong(1)},${r.getDouble(2)}")
                  .mkString("\n")
              out.write(
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              out.closeArchiveEntry()
            }
          } finally out.close()
        }
        val a = ArchiveSource.sevenZMemberCsv(s, path, "House_0.csv")
        val b = ArchiveSource.sevenZMemberCsv(s, path, "House_1.csv")
        a.unionByName(b)
          .groupBy(col("s_nationkey").cast("long").as("nation_key"))
          .agg(count(lit(1)).as("n"),
            ExactAgg.dsum(col("s_acctbal").cast("double")).as("total_bal"),
            max(col("s_suppkey").cast("long")).as("max_key"))
          .orderBy("nation_key")
      },
      Some(s"""SELECT CAST(s_nationkey AS BIGINT) AS nation_key,
          count(*) AS n,
          ${ExactAgg.sqlSum("s_acctbal")} AS total_bal,
          CAST(max(s_suppkey) AS BIGINT) AS max_key
        FROM supplier WHERE s_suppkey <= 1000
        GROUP BY 1 ORDER BY 1""")),

    // S4 — XML registry: the supplier table landed as a MaStR-style
    // utf-16le flat-row XML part-file, StAX-parsed on executors,
    // aggregated. Oracle recomputes from parquet. Missing optional
    // elements (phone for even keys) exercise the null path.
    Q("q66_xml_roundtrip",
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
          .selectExpr("CAST(s_suppkey AS LONG) AS k",
            "CAST(s_nationkey AS LONG) AS nk",
            "CAST(s_acctbal AS DOUBLE) AS bal")
          .orderBy("k").collect()
        val sb = new StringBuilder
        sb.append("<?xml version=\"1.0\" encoding=\"UTF-16LE\"?>\n")
        sb.append("<EinheitenLieferant>\n")
        sup.foreach { r =>
          sb.append("<Lieferant><SuppKey>").append(r.getLong(0))
            .append("</SuppKey><NationKey>").append(r.getLong(1))
            .append("</NationKey><Saldo>").append(r.getDouble(2))
            .append("</Saldo>")
          if (r.getLong(0) % 2 == 1)
            sb.append("<Telefon>+49-").append(r.getLong(0)).append("</Telefon>")
          sb.append("</Lieferant>\n")
        }
        sb.append("</EinheitenLieferant>\n")
        val path = landAtomically(new java.io.File(
          sys.props("java.io.tmpdir"),
          "graft-q66-" + dir.replaceAll("[^A-Za-z0-9._-]", "_") + ".xml")) {
          f => java.nio.file.Files.write(f.toPath,
            sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
        }
        XmlSource.readFlatXml(s, path, "Lieferant",
            Seq("SuppKey", "NationKey", "Saldo", "Telefon"))
          .groupBy(col("NationKey").cast("long").as("nation_key"))
          .agg(count(lit(1)).as("n"),
            ExactAgg.dsum(col("Saldo").cast("double")).as("total_bal"),
            count(col("Telefon")).as("with_phone"))
          .orderBy("nation_key")
      },
      Some(s"""SELECT CAST(s_nationkey AS BIGINT) AS nation_key,
          count(*) AS n,
          ${ExactAgg.sqlSum("s_acctbal")} AS total_bal,
          CAST(sum(CASE WHEN s_suppkey % 2 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS with_phone
        FROM supplier GROUP BY 1 ORDER BY 1""")),

    // ORC round-trip: lineitem landed as ORC (the other columnar
    // format Spark ships a vectorized reader for), read back and
    // aggregated; oracle recomputes from the parquet original. Landing
    // is fingerprinted by the source files (count+mtime+bytes) so a
    // regenerated dataset re-lands instead of reusing a stale copy.
    Q("q81_orc_roundtrip",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val srcFiles = Option(
          new java.io.File(dir, "lineitem.parquet").listFiles())
          .getOrElse(Array.empty[java.io.File]).filter(_.isFile)
        val fp = s"${srcFiles.length}-" +
          s"${srcFiles.map(_.lastModified).foldLeft(0L)(math.max)}-" +
          s"${srcFiles.map(_.length).sum}"
        val landing = new java.io.File(sys.props("java.io.tmpdir"),
          "graft-q81-orc-" +
            dir.replaceAll("[^A-Za-z0-9._-]", "_") + "-" + fp)
        if (!new java.io.File(landing, "_SUCCESS").exists())
          li.select("l_orderkey", "l_returnflag", "l_quantity",
              "l_extendedprice")
            .write.mode("overwrite").orc(landing.toString)
        s.read.orc(landing.toString)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            ExactAgg.dsum(col("l_quantity")).as("sum_qty"),
            ExactAgg.dsum(col("l_extendedprice")).as("sum_price"),
            max(col("l_orderkey")).as("max_key"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, count(*) AS n,
          ${ExactAgg.sqlSum("l_quantity")} AS sum_qty,
          ${ExactAgg.sqlSum("l_extendedprice")} AS sum_price,
          CAST(max(l_orderkey) AS BIGINT) AS max_key
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // S10 — filesystem-tree scan with PATH-derived labels (the
    // eex.py:135-184 / enet.py:69-92 shape) as an oracle row instead
    // of a spec-only surface (r14 verdict #5): the nation table is
    // landed as one headered CSV per `rk=<region>` subdirectory, the
    // tree is read back through ONE glob scan whose label column comes
    // from input_file_name(), and the per-label aggregate must equal
    // DuckDB grouping the parquet original by the same key the paths
    // encode.
    Q("q318_tree_scan",
      (s, dir) => {
        val nat = Tables.load(s, dir, "nation")
          .selectExpr("CAST(n_nationkey AS LONG) AS k", "n_name",
            "CAST(n_regionkey AS LONG) AS rk")
          .orderBy("k").collect()
        val base = new java.io.File(sys.props("java.io.tmpdir"),
          "graft-q318-" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))
        if (!new java.io.File(base, "_SUCCESS").exists()) {
          val staging = java.nio.file.Files.createTempDirectory(
            base.getParentFile.toPath, "graft-q318-").toFile
          nat.groupBy(_.getLong(2)).foreach { case (rk, rows) =>
            val sub = new java.io.File(staging, s"rk=$rk")
            sub.mkdirs()
            val lines = "n_nationkey,n_name\n" + rows.map(r =>
              s"${r.getLong(0)},${r.getString(1)}").mkString("\n")
            java.nio.file.Files.write(
              new java.io.File(sub, "nations.csv").toPath,
              lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          java.nio.file.Files.write(
            new java.io.File(staging, "_SUCCESS").toPath, Array.empty[Byte])
          try java.nio.file.Files.move(staging.toPath, base.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileSystemException =>
            // lost the landing race — the winner's tree is identical
            org.apache.commons.io.FileUtils.deleteDirectory(staging)
          }
        }
        graft.sources.CsvDialects.treeScan(s, base.toString + "/*/*.csv",
            path => raw"rk=(\d+)".r.findFirstMatchIn(path)
              .map(_.group(1)).getOrElse("?"))
          .groupBy(col("source_label").cast("long").as("region_key"))
          .agg(count(lit(1)).as("n_nations"),
            min(col("n_name")).as("first_name"),
            max(col("n_nationkey").cast("long")).as("max_key"))
          .orderBy("region_key")
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS region_key,
          count(*) AS n_nations, min(n_name) AS first_name,
          CAST(max(n_nationkey) AS BIGINT) AS max_key
        FROM nation GROUP BY 1 ORDER BY 1""")),

    // Scan-free cardinality census: every contract table's row count
    // from parquet FOOTER metadata alone (graft.sources.ParquetStats —
    // the same probe the dedup/eval dispatch gates use, surfaced as a
    // catalog operator). The oracle replays it as full count(*) scans,
    // pinning footer-metadata == data for every table, every round;
    // at 100 TB this census costs one lightweight task per file while
    // the oracle's shape would read the lake.
    Q("q325_footer_cardinality",
      (s, dir) => {
        import s.implicits._
        Tables.all.map { t =>
          val df = Tables.load(s, dir, t)
          val n = graft.sources.ParquetStats.footerRowCount(s, df)
            .getOrElse(df.count()) // non-parquet layouts only
          (t, n)
        }.toDF("table_name", "n_rows").orderBy("table_name")
      },
      Some("""SELECT * FROM (
          SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows FROM region
          UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT) FROM nation
          UNION ALL SELECT 'customer', CAST(count(*) AS BIGINT) FROM customer
          UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT) FROM supplier
          UNION ALL SELECT 'part', CAST(count(*) AS BIGINT) FROM part
          UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
          UNION ALL SELECT 'lineitem', CAST(count(*) AS BIGINT) FROM lineitem
          UNION ALL SELECT 'events', CAST(count(*) AS BIGINT) FROM events
          UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT) FROM documents
          UNION ALL SELECT 'embeddings', CAST(count(*) AS BIGINT) FROM embeddings
        ) ORDER BY table_name"""))
  )
}
