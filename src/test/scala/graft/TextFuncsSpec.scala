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
}
