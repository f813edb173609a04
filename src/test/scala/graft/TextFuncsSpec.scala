package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFuncs

class TextFuncsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount counts whitespace tokens") {
    val df = Seq("a b c", "one", "x  y\tz").toDF("text")
    assert(df.select(TextFuncs.tokenCount($"text")).as[Int].collect()
      .toSeq == Seq(3, 1, 3))
  }

  test("shingles slides a k-window over words") {
    val df = Seq("a b c d").toDF("text")
    val sh = df.select(TextFuncs.shingles($"text", 3)).as[Seq[String]]
      .head()
    assert(sh == Seq("a b c", "b c d"))
  }

  test("shingles on short text yields one truncated shingle") {
    val df = Seq("a b").toDF("text")
    assert(df.select(TextFuncs.shingles($"text", 3)).as[Seq[String]]
      .head() == Seq("a b"))
  }

  test("fingerprint is case/punctuation insensitive") {
    val df = Seq(("Hello, World!", "hello world")).toDF("a", "b")
    val r = df.select(
      TextFuncs.fingerprint($"a") === TextFuncs.fingerprint($"b"))
      .as[Boolean].head()
    assert(r)
  }

  test("langId picks the language with most marker hits") {
    val markers = Seq(
      "de" -> Seq("der", "und"), "en" -> Seq("the", "and"))
    val df = Seq(
      "der hund und die katze",
      "the cat and the dog",
      "xyzzy plugh").toDF("text")
    assert(df.select(TextFuncs.langId($"text", markers)).as[String]
      .collect().toSeq == Seq("de", "en", "und"))
  }

  test("stopwordRatio is hits/tokens") {
    val df = Seq("the cat sat").toDF("text")
    val r = df.select(TextFuncs.stopwordRatio($"text", Seq("the")))
      .as[Double].head()
    assert(math.abs(r - 1.0 / 3.0) < 1e-12)
  }

  test("stopwordRatio scores the passed column, not a column named text") {
    val df = Seq(("the cat sat", "unrelated")).toDF("body", "text")
    val r = df.select(TextFuncs.stopwordRatio($"body", Seq("the")))
      .as[Double].head()
    assert(math.abs(r - 1.0 / 3.0) < 1e-12)
  }

  test("bpeTokens splits contractions, words, numbers, punctuation") {
    val df = Seq("I'll pay $42, won't I?").toDF("text")
    val toks = df.select(TextFuncs.bpeTokens($"text")).as[Seq[String]]
      .head()
    assert(toks == Seq("I", "'ll", " pay", " $", "42", ",", " won",
      "'t", " I", "?"))
  }

  test("soundex matches the NARA reference vectors") {
    import graft.functions.LocaleFuncs.soundex
    // the canonical published test set, incl. the h/w-transparency
    // cases (Ashcraft: s and c collapse across the silent h)
    assert(soundex("Robert") == "R163")
    assert(soundex("Rupert") == "R163")
    assert(soundex("Ashcraft") == "A261")
    assert(soundex("Ashcroft") == "A261")
    assert(soundex("Tymczak") == "T522")
    assert(soundex("Pfister") == "P236")
    assert(soundex("Honeyman") == "H555")
    // padding and degenerate inputs
    assert(soundex("Lee") == "L000")
    assert(soundex("a") == "A000")
    assert(soundex("") == "")
  }

  test("mojibake corrupt→count→repair round-trips; ASCII counts zero") {
    import graft.functions.MojibakeFuncs
    import spark.implicits._
    val docs = Seq(
      (1L, "café — “naïve” isn’t here, Müßiggang"), // é — “ ’ ü ß
      (2L, "pure ascii text, untouched"),
      (3L, "señor piñata"), // ñ twice
      (4L, "")).toDF("id", "text")
    val out = docs.select($"id",
        MojibakeFuncs.corrupt($"text").as("c"))
      .select($"id", $"c",
        MojibakeFuncs.count($"c").as("n"),
        MojibakeFuncs.repair($"c").as("r"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1: é — “ ’ ü ß = 6 sequences. ï and the CLOSING ” are
    // unmapped by design: their trailing UTF-8 bytes (0x8F / 0x9D)
    // have no cp1252 codepoint, so that corruption class never
    // round-trips through printable text in the wild either.
    assert(out(1L)._2 == 6L, out(1L)._1)
    assert(out(1L)._1.contains("Ã©") && out(1L)._1.contains("â€”") &&
      out(1L)._1.contains("ÃŸ"))
    assert(out(1L)._3 == "café — “naïve” isn’t here, Müßiggang")
    assert(out(2L) == (("pure ascii text, untouched", 0L,
      "pure ascii text, untouched")))
    assert(out(3L)._2 == 2L && out(3L)._3 == "señor piñata")
    assert(out(4L) == (("", 0L, "")))
    // repair is a strict no-op on already-clean text
    val reClean = docs.select(
      (MojibakeFuncs.repair($"text") === $"text").as("ok"))
      .collect().forall(_.getBoolean(0))
    assert(reClean)
  }

  test("q302 streaming script router equals the q299 batch rows " +
      "(the edge deploy shape computes the batch semantics)") {
    def rows(name: String) =
      queries.Registry.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_latin"),
          r.getAs[Long]("n_cyrillic"), r.getAs[Long]("n_greek"),
          r.getAs[Long]("n_han"), r.getAs[Long]("n_arabic"),
          r.getAs[String]("dominant"), r.getAs[Boolean]("mixed"))).toSet
    val batch = rows("q299_script_mix")
    val stream = rows("q302_stream_script_mix")
    assert(stream == batch,
      s"stream twin diverged: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
  }

  test("q309 streaming mojibake repair equals the q298 batch rows") {
    def rows(name: String) =
      queries.Registry.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_mojibake"),
          r.getAs[Long]("bloat_chars"), r.getAs[Boolean]("repaired_ok"),
          r.getAs[Boolean]("clean_is_clean"))).toSet
    val batch = rows("q298_mojibake_repair")
    val stream = rows("q309_stream_mojibake")
    assert(stream == batch,
      s"twin diverged: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
    // every row round-trips: repair(corrupt(clean)) == clean
    assert(batch.forall(_._4), "repaired_ok must hold corpus-wide")
    assert(batch.forall(_._5), "clean text must count zero")
  }

  test("script counting covers the planted ranges and only them") {
    import spark.implicits._
    def cnt(c: org.apache.spark.sql.Column, cls: String) =
      (length(c) - length(regexp_replace(c, cls, ""))).cast("long")
    val row = Seq("abc данные ερώτημα 表格 صف 123!")
      .toDF("t")
      .select(cnt($"t", "[A-Za-z]").as("lat"),
        cnt($"t", "[Ѐ-ӿ]").as("cyr"),
        cnt($"t", "[Ͱ-Ͽ]").as("grk"),
        cnt($"t", "[一-鿿]").as("han"),
        cnt($"t", "[؀-ۿ]").as("ara"))
      .head()
    assert(row.getLong(0) == 3L) // digits/punct/spaces excluded
    assert(row.getLong(1) == 6L) // данные
    assert(row.getLong(2) == 7L) // ερώτημα
    assert(row.getLong(3) == 2L) // 表格
    assert(row.getLong(4) == 2L) // صف
  }
}
