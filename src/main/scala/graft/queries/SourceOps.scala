package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactAgg
import graft.sources.{SqliteSource, XlsxSource}

/** Source-format round-trips surfaced as oracle-checked queries: the
  * workbook is LANDED from the parquet tables at runtime (deterministic
  * bytes), read back through the native source, and the result is
  * hash-compared against DuckDB running directly on the original
  * tables — so the source's parsing semantics (shared strings, numeric
  * cells, empty gaps, na_values) are part of the correctness gate, not
  * just spec-asserted.
  */
object SourceOps {

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
        val path = new java.io.File(sys.props("java.io.tmpdir"),
          "graft-q59-" + dir.replaceAll("[^A-Za-z0-9._-]", "_") +
            ".xlsx").toString
        // `note` exercises na_values: the literal "NA" for even keys
        // must come back as null; odd keys carry a real note
        val natRows: Seq[Seq[Any]] = nation.toSeq.map { r =>
          Seq[Any](r.getLong(0), r.getString(1), r.getLong(2),
            if (r.getLong(0) % 2 == 0) "NA" else s"note-${r.getLong(0)}")
        }
        val regRows: Seq[Seq[Any]] =
          region.toSeq.map(r => Seq[Any](r.getLong(0), r.getString(1)))
        XlsxSource.writeXlsx(path, Seq(
          ("nation",
            Seq[Any]("n_nationkey", "n_name", "n_regionkey", "note") +: natRows),
          ("region", Seq[Any]("r_regionkey", "r_name") +: regRows)))
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
        val tmp = new java.io.File(sys.props("java.io.tmpdir"),
          "graft-opsd-sample.sqlite")
        if (!tmp.exists()) {
          val in = getClass.getResourceAsStream("/graft/opsd_sample.sqlite")
          try java.nio.file.Files.copy(in, tmp.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
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
        ORDER BY technology"""))
  )
}
