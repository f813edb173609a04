package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake (UTF-8 read as cp1252) detection and repair — the classic
  * double-encoding corruption of web corpora: a UTF-8 document served
  * or re-encoded as Windows-1252 turns every 'é' into 'Ã©' and every
  * right single quote into 'â€™'. A training-data pipeline wants to
  * (a) MEASURE the corruption rate per source and (b) REPAIR it, since
  * the fix is a deterministic byte-level inverse.
  *
  * The mapping below IS that inverse, precomputed: for each supported
  * character, the digraph/trigraph its UTF-8 bytes decode to under
  * cp1252 (é = C3 A9 → 'Ã'+'©'… all chosen so every mojibake byte maps
  * to a PRINTABLE cp1252 codepoint — the high-frequency real-world
  * cases). Detection and repair are then plain string algebra
  * (replace / length-difference counting), which keeps the whole
  * operator inside codegen'd string expressions — no UDF, no encoding
  * library — and lets the DuckDB oracle mirror it literally.
  */
object MojibakeFuncs {

  /** (clean character, its cp1252-mojibake rendering). Multi-char
    * sequences first: repair strips 'â€™'-class trigraphs before
    * 'Ã©'-class pairs (no overlaps here, but the order is part of the
    * contract). */
  private[graft] val mapping: Seq[(String, String)] = Seq(
    "—" -> "â€”", // em dash   E2 80 94 → â € ”
    "’" -> "â€™", // rsquo     E2 80 99 → â € ™
    "“" -> "â€œ", // ldquo     E2 80 9C → â € œ
    "é" -> "Ã©", // C3 A9
    "ü" -> "Ã¼", // C3 BC
    "ö" -> "Ã¶", // C3 B6
    "ñ" -> "Ã±", // C3 B1
    "ß" -> "ÃŸ") // C3 9F → Ã Ÿ

  private def rep(c: Column, from: String, to: String): Column =
    call_function("replace", c, lit(from), lit(to))

  /** Simulate the corruption (clean → mojibake) — the eval arm. */
  def corrupt(c: Column): Column =
    mapping.foldLeft(c) { case (acc, (clean, moji)) =>
      rep(acc, clean, moji)
    }

  /** Count mojibake sequences via length differences — one codegen'd
    * expression chain, no extraction. The difference is always an
    * exact multiple of the pattern length, so the double division is
    * integer-valued before the cast. */
  def count(c: Column): Column =
    mapping.map { case (_, moji) =>
      ((length(c) - length(rep(c, moji, ""))) /
        lit(moji.length)).cast("long")
    }.reduce(_ + _)

  /** Invert the corruption (mojibake → clean), longest first. */
  def repair(c: Column): Column =
    mapping.foldLeft(c) { case (acc, (clean, moji)) =>
      rep(acc, moji, clean)
    }

  // ---- DuckDB oracle mirrors (plain replace, integer `//`) ----------

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  def corruptSql(e: String): String =
    mapping.foldLeft(e) { case (acc, (clean, moji)) =>
      s"replace($acc, ${q(clean)}, ${q(moji)})"
    }

  def countSql(e: String): String =
    mapping.map { case (_, moji) =>
      s"(length($e) - length(replace($e, ${q(moji)}, ''))) " +
        s"// ${moji.length}"
    }.mkString("(", " + ", ")")

  def repairSql(e: String): String =
    mapping.foldLeft(e) { case (acc, (clean, moji)) =>
      s"replace($acc, ${q(moji)}, ${q(clean)})"
    }
}
