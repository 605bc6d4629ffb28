package graft

import graft.analyze.Analyzer
import org.scalatest.funsuite.AnyFunSuite

/** Analyzer goldens — mirrors the reference's lemmatizer golden test style
  * (/root/reference/src/test/java/searchengine/tools/LemmatizatorTest.java:9-17:
  * exact expected normal-form expansion, order-sensitive). */
class AnalyzerSpec extends AnyFunSuite {

  test("camelCase and acronym identifier splitting") {
    assert(Analyzer.rawTokens("parseHTTPResponse") == Seq("parse", "http", "response"))
    assert(Analyzer.rawTokens("fooBarBaz") == Seq("foo", "bar", "baz"))
    assert(Analyzer.rawTokens("XMLHttpRequest2") == Seq("xml", "http", "request2"))
  }

  test("snake_case and punctuation splitting") {
    assert(Analyzer.rawTokens("snake_case_name") == Seq("snake", "case", "name"))
    assert(Analyzer.rawTokens("a.b(c,d); e->f") == Seq("a", "b", "c", "d", "e", "f"))
  }

  test("lowercase + digits preserved") {
    assert(Analyzer.rawTokens("Spark4 SQL v2") == Seq("spark4", "sql", "v2"))
  }

  test("stoplist is per-lang: code keywords dropped, natural stop dropped") {
    assert(Analyzer.analyze("scala", "def foo = new Bar") == Seq("foo", "bar"))
    assert(Analyzer.analyze("java", "public static void main") == Seq("main"))
    assert(Analyzer.analyze("en", "the quick a fox") == Seq("quick", "fox"))
  }

  test("normal-forms expansion preserves ambiguity (1 -> N), like the reference") {
    // latin analog of LemmatizatorTest's ["дом","вчатв"] -> ["дом","вчатва"]
    val lex: Analyzer.Lexicon = Map("running" -> Seq("run", "running"), "mice" -> Seq("mouse"))
    assert(Analyzer.analyze("en", "running mice", lex) == Seq("run", "running", "mouse"))
  }

  test("words shorter than 2 chars bypass the lexicon verbatim") {
    val lex: Analyzer.Lexicon = Map("x" -> Seq("SHOULD-NOT-APPLY"))
    assert(Analyzer.normalForms("x", lex) == Seq("x"))
  }

  test("SHIPPED lexicon: inflections fold, ambiguity expands 1 -> N end-to-end") {
    import graft.analyze.DefaultLexicon.lexicon
    // the reference golden's shape: one surface word -> every normal form
    assert(Analyzer.analyze("en", "data joins", lexicon) == Seq("data", "datum", "join"))
    assert(Analyzer.analyze("en", "queries sorted fastest", lexicon) ==
      Seq("query", "sort", "fast"))
    assert(Analyzer.normalForms("axes", lexicon) == Seq("axe", "axis"))
    // and through the Spark index-build path (tokens with lexicon UDF)
    val spark = SparkTestSession.spark
    import spark.implicits._
    val c = Seq((0L, "r", "en", "the data joins tables"))
      .toDF("doc_id", "repo", "lang", "content")
    val got = graft.index.InvertedIndex.tokens(c, lexicon)
      .collect().map(_.getString(2)).toList
    assert(got == List("data", "datum", "join", "table"))
  }

  test("Russian branch: ё-fold + Cyrillic class + 1→N expansion mirror the reference exactly") {
    import graft.analyze.DefaultLexicon.russian
    // the reference golden VERBATIM (LemmatizatorTest.java:10-17):
    // getLemss(["дом","вчатв"]) == ["дом","вчатва"]
    assert(Analyzer.analyze("ru", "дом вчатв", russian) == Seq("дом", "вчатва"))
    // getWordsFromText chain: ё→е fold, strip to [а-яА-ЯёЁ ], lowercase, split
    assert(Analyzer.rawTokensRu("Привет, мир! 123 abc Ёлка-ёлка") ==
      Seq("привет", "мир", "елка", "елка"))
    // ambiguity preserved 1→N (luceneMorph semantics)
    assert(Analyzer.normalForms("стали", russian) == Seq("сталь", "стать"))
    assert(Analyzer.analyze("ru", "и банка в лесу", russian) ==
      Seq("банк", "банка", "лесу")) // stops и/в dropped, банка expands
    // tf counting shape of getLemmsInPage/counterWord
    val counted = Analyzer.analyze("ru", "Дом дом и ёлка", russian)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(counted == Map("дом" -> 2, "елка" -> 1))
  }

  test("Russian Column form agrees with the pure form (incl. stop filter)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val samples = Seq("Ёжик и дом; в лесу not-русский text123",
      "Привет, мир! Ёлка", "", "только русский текст")
    val got = samples.toDF("s")
      .select(Analyzer.termsColRu(col("s")).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    val want = samples.map(s => Analyzer.rawTokensRu(s).filterNot(Analyzer.ruStop).toList)
    assert(got.toList == want.toList)
  }

  test("analyze is total: empty, whitespace, symbol-only input") {
    assert(Analyzer.analyze("en", "") == Nil)
    assert(Analyzer.analyze("en", "   \t\n") == Nil)
    assert(Analyzer.analyze("en", "!!! ??? ***") == Nil)
  }

  test("Column form agrees with pure form on mixed input") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val samples = Seq("parseHTTPResponse foo_bar", "the Quick; aX (b)", "", "x y2Z")
    val got = samples.toDF("s")
      .select(Analyzer.termsCol(col("s"), Analyzer.naturalStop).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    val want = samples.map(s =>
      Analyzer.rawTokens(s).filterNot(Analyzer.naturalStop).toList)
    assert(got.toList == want.toList)
  }
}
