package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis primitives for large-scale corpus pipelines: token
  * counting, quality scoring, n-gram language ID, fingerprinting,
  * shingling. All pure Catalyst expressions (codegen'd, no UDFs) so the
  * hot path stays inside whole-stage codegen at 100 TB.
  */
object TextFuncs {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Word array (single-space tokenizer — matches the oracle's
    * string_split semantics; use tokenCount's regex split for counts). */
  def words(text: Column): Column = split(text, " ")

  /** Ratio of tokens that are common function words of `lang`'s stopword
    * list — a standard quality / fluency signal. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val hits = size(filter(words(text), w => w.isInCollection(stopwords)))
    hits.cast(DoubleType) / tokenCount(text).cast(DoubleType)
  }

  /** Mean token length in characters. */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast(DoubleType) /
      tokenCount(text).cast(DoubleType)

  /** Deterministic document fingerprint: md5 of the
    * lowercased, alphanumeric-only normalization. Identical across
    * engines (md5 is bit-exact), so it doubles as the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))

  /** Marker-word language ID (n-gram heuristic): score a text against
    * per-language marker lists, pick the argmax with a fixed priority
    * order. `markers` maps lang -> marker words. */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = markers.map { case (lang, ws) =>
      val score = ws.map(w =>
        when(padded.contains(s" $w "), 1).otherwise(0))
        .reduce(_ + _)
      (lang, score)
    }
    // argmax with first-listed-language priority on ties
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** BPE-style pre-tokenizer (GPT-2 pattern family, restricted to the
    * RE2-compatible subset so the same pattern runs in any engine):
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs, residual whitespace. No lookarounds — the
    * `\\s+(?!\\S)` tail of the original pattern is dropped, which only
    * changes how trailing whitespace groups, not token counts on
    * normalized text. Whitespace is spelled as an explicit class
    * rather than `\\s` because the two engines' `\\s` sets differ
    * (Java's non-Unicode `\\s` includes vertical tab, RE2's does not) —
    * an explicit class means both engines tokenize identical character
    * sets. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\f\\r]+|[ \\t\\n\\f\\r]+"

  /** Token array under [[bpePattern]] — the standard proxy for "how many
    * BPE tokens will this document cost" in corpus budgeting. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Word k-shingles as an array column: slides a k-window over the
    * word array with Catalyst `transform` over an index sequence —
    * map-side only, no UDF. */
  def shingles(text: Column, k: Int): Column = {
    val ws = split(text, " ")
    transform(
      sequence(lit(0), greatest(size(ws) - lit(k), lit(0))),
      i => concat_ws(" ", slice(ws, i + lit(1), lit(k))))
  }
}
