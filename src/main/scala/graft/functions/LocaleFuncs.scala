package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Locale/format parsing from the reference's CSV dialects (SURVEY.md
  * §2.8 F2/F3, §7.2 hard part 3): German decimal commas with dot
  * thousands separators, source-specific null markers, date+time+zone
  * label composition across DST, epoch-millisecond timestamps. All pure
  * Catalyst expressions — parsing stays inside codegen, never a UDF.
  */
object LocaleFuncs {

  /** Null markers seen across the reference's sources
    * (`netztransparenz.py:94` "N.A.", `regelleistung.py:535`
    * na_values=["-","n.a.","n.e."]). */
  val NullMarkers: Seq[String] = Seq("-", "n.a.", "n.e.", "N.A.", "")

  /** Parse a German-formatted number: `1.234,56` → 1234.56, honoring
    * null markers (reference: `ladesaeulenregister.py:48-52`
    * str.replace(",",".") + to_numeric; `netztransparenz.py:88-95`). */
  def germanDouble(c: Column): Column = {
    val trimmed = trim(c)
    when(trimmed.isin(NullMarkers: _*), lit(null).cast(DoubleType))
      .otherwise(
        regexp_replace(regexp_replace(trimmed, "\\.", ""), ",", ".")
          .cast(DoubleType))
  }

  /** Compose a UTC instant from separate German date / time / zone-label
    * columns (reference: `netztransparenz.py:97-106` builds
    * `dd.mm.YYYY HH:MM` + "CET"/"CEST" and normalizes to naive UTC).
    * The zone label disambiguates the DST-fold hour, which a bare
    * `Europe/Berlin` parse cannot. */
  def composeUtcTimestamp(
      dateCol: Column, timeCol: Column, zoneLabel: Column): Column = {
    val local = to_timestamp(
      concat(dateCol, lit(" "), timeCol), "dd.MM.yyyy HH:mm")
    val offsetHours =
      when(zoneLabel === "CEST", lit(2))
        .when(zoneLabel === "CET", lit(1))
        .otherwise(lit(0))
    timestamp_seconds(unix_timestamp(local) - offsetHours * 3600L)
  }

  /** Epoch milliseconds → timestamp (reference: `smard.py:112`,
    * `e2watch.py:133`). */
  def epochMillis(c: Column): Column = timestamp_millis(c)

  /** F1 — identifier sanitization applied to column names (driver-side,
    * exact port of the reference's normalizers: strip `()',`, spaces→_,
    * lowercase; `entsoe_crawler.py:52-77`, `entsog.py:92`). */
  def sanitizeIdentifier(name: String): String = {
    val cleaned = name.trim.toLowerCase
      .replaceAll("[()',]", "")
      .replaceAll("[\\s/-]+", "_")
    if (cleaned == "0") "value" else cleaned
  }

  /** Rename all columns of a frame through [[sanitizeIdentifier]]. */
  def sanitizeColumns(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.toDF(df.columns.map(sanitizeIdentifier): _*)

  /** American Soundex (the public NARA algorithm) — the phonetic
    * blocking key record linkage uses when spellings drift: first
    * letter + three digits from the consonant classes, with h/w
    * transparent (adjacent equal codes separated only by h/w
    * collapse) and vowels as separators. Deterministic and mirrored
    * step-for-step by the window-SQL oracle: drop h/w → code → keep
    * run heads → drop the first letter's slot → drop vowels → first
    * three digits, zero-padded. */
  def soundex(word: String): String = {
    val w = word.toLowerCase.filter(c => c >= 'a' && c <= 'z')
    if (w.isEmpty) return ""
    def code(c: Char): Char = c match {
      case 'b' | 'f' | 'p' | 'v' => '1'
      case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => '2'
      case 'd' | 't' => '3'
      case 'l' => '4'
      case 'm' | 'n' => '5'
      case 'r' => '6'
      case _ => '0' // vowels + y
    }
    // h/w are transparent: remove BEFORE run collapsing, but the
    // FIRST letter survives even if it is h/w (per the standard)
    val kept = w.head +: w.tail.filter(c => c != 'h' && c != 'w')
    val codes = kept.map(code)
    val collapsed = codes.zipWithIndex.collect {
      case (c, i) if i == 0 || c != codes(i - 1) => c
    }
    val digits = collapsed.drop(1).filter(_ != '0').take(3)
    (w.head.toUpper + digits.mkString).padTo(4, '0')
  }
}
