package graft

import graft.analyze.Html
import graft.corpus.Corpus
import graft.index.InvertedIndex
import graft.query.Search
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML→text extraction (reference Jsoup.parse().text() analog) and <title>
  * extraction (SearchServiceImpl.java:284-296), plus the end-to-end search
  * behavior over an HTML corpus: index over extracted text, title from
  * <title>, snippet free of tag soup. */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val page = "<html><head><title>Spark Joins</title>" +
    "<style>body { color: red; }</style></head>" +
    "<body><h1>Intro</h1><p>the spark join runs fast.</p>" +
    "<script>var x = 1 < 2; alert('join');</script></body></html>"

  def one(c: org.apache.spark.sql.Column): String =
    Seq(page).toDF("h").select(c).collect().head.getString(0)

  test("extractText strips tags, script (incl. inner '<'), style; collapses space") {
    assert(one(Html.extractText(col("h"))) == "Spark Joins Intro the spark join runs fast.")
  }

  test("title extraction and fallback to path") {
    assert(one(Html.title(col("h"))) == "Spark Joins")
    val rows = Seq((page, "p1"), ("plain text, no markup", "p2"))
      .toDF("content", "path")
      .select(Html.titleOf(col("content"), col("path"))).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("Spark Joins", "p2"))
  }

  test("textOf: identity for non-HTML (code corpora keep exact content)") {
    val code = "def foo<T>(x: T) = x < 1 // not html"
    val got = Seq(code).toDF("c").select(Html.textOf(col("c"))).collect().head.getString(0)
    assert(got == code)
  }

  test("htmlAware=false: a raw-indexed template file keeps path title + raw snippet") {
    // a CODE corpus indexed RAW may store an html template; decoration must
    // match the indexing choice, not re-sniff per row
    val code = Seq(
      (0L, "r", "tpl/index.html", "c0", "en", page),
      (1L, "r", "src/a.scala", "c1", "en", "plain spark join code"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    val t = InvertedIndex.build(code) // raw: markup tokens ARE indexed
    val got = Search.search(code, t.postings, t.docStats, t.termStats, t.nDocs, t.avgDl,
      query = "spark join", lang = "en", limit = 5, htmlAware = false).collect()
    val tpl = got.find(_.getAs[Long]("doc_id") == 0L).get
    assert(tpl.getAs[String]("title") == "tpl/index.html") // NOT "Spark Joins"
    assert(got.forall(r => r.getAs[String]("snippet").contains("<b>")))
  }

  test("search over an HTML corpus: tag-free index, <title> title, clean snippet") {
    val html = Seq(
      (0L, "site1", "page/0", "c0", "en", page),
      (1L, "site1", "page/1", "c1", "en",
        "<html><head><title>Other</title></head><body>nothing relevant here</body></html>"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    // ingestion normalizes content for indexing (extract-then-tokenize);
    // the raw content stays in the corpus for title/snippet decoration
    val indexed = html.withColumn("content_text", Html.textOf(col("content")))
    val t = InvertedIndex.build(indexed.drop("content")
      .withColumnRenamed("content_text", "content"))
    // "script"/"style"/"var"/"alert" never reach the index
    val vocab = t.termStats.select("term").collect().map(_.getString(0)).toSet
    assert(!vocab.contains("script") && !vocab.contains("var") && !vocab.contains("alert")
      && !vocab.contains("color"))
    assert(vocab.contains("join") && vocab.contains("spark"))
    val got = Search.search(html, t.postings, t.docStats, t.termStats, t.nDocs, t.avgDl,
      query = "spark join", lang = "en", limit = 5).collect()
    assert(got.length == 1 && got.head.getAs[Long]("doc_id") == 0L)
    assert(got.head.getAs[String]("title") == "Spark Joins")
    val snip = got.head.getAs[String]("snippet")
    assert(snip.contains("<b>spark</b>") && snip.contains("<b>join</b>"))
    assert(!snip.contains("<p>") && !snip.contains("var") && !snip.contains("alert"))
  }
}
