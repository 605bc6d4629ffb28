package graft

import graft.api.SearchEngine
import graft.corpus.Corpus
import org.scalatest.funsuite.AnyFunSuite

/** API-facade behavior: endpoint semantics mirrored from the reference
  * (ApiController paths, SearchResponce shape, error payloads, result
  * cache, upsert visibility). */
class SearchEngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def freshEngine(): SearchEngine = {
    val e = new SearchEngine(spark, Corpus.fromDocuments(spark, "/root/testdata/sf0.001"))
    assert(e.startIndexing())
    e
  }
  lazy val engine = freshEngine()

  test("search returns decorated, ranked items") {
    val r = engine.search("spark join", limit = 5)
    assert(r.result && r.count == 5)
    assert(r.data.head.relevance >= r.data.last.relevance)
    assert(r.data.forall(i => i.snippet.contains("<b>")))
    assert(r.data.forall(i => i.uri.startsWith("doc/")))
  }

  test("empty query and missing-term error payloads mirror the reference") {
    val empty = engine.search("the a")
    assert(!empty.result && empty.error != null)
    val missing = engine.search("spark warpdrive flux")
    assert(!missing.result)
    assert(missing.error.contains("flux") && missing.error.contains("warpdrive"))
  }

  test("site-scoped search restricts results") {
    val r = engine.search("spark join", site = Some("src3"), limit = 10)
    assert(r.result)
    assert(r.data.forall(_.site == "src3"))
  }

  test("offset past the end clamps to the last result (reference pagination quirk)") {
    // total matches for this query is small; an offset far past it must
    // return the LAST ranked element, not an empty page
    // (SearchServiceImpl.java:101-118)
    val all = engine.search("dup spark", limit = 1000)
    assert(all.result && all.count > 0 && all.count < 900)
    val past = engine.search("dup spark", offset = 5000, limit = 10)
    assert(past.result && past.count == 1)
    assert(past.data.head.uri == all.data.last.uri)
  }

  test("result cache: repeated query within TTL returns the same object") {
    val a = engine.search("hash", limit = 3)
    val b = engine.search("hash", limit = 3)
    assert(a eq b) // cache hit returns the identical response instance
  }

  test("statistics mirrors TotalStatistics + detailed items") {
    val s = engine.statistics()
    assert(s.sites == 20 && s.pages == 500)
    assert(s.detailed.map(_._2).sum == s.pages)
    assert(s.lemmas > 0)
  }

  test("HTTP-status gate: error pages never enter the index (code > 299)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val c = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
      .withColumn("code", when(col("doc_id") === 0L, lit(404)).otherwise(col("code")))
    val word0 = graft.analyze.Analyzer
      .analyze("en", c.filter(col("doc_id") === 0L).select("content").head.getString(0)).head
    val e = new SearchEngine(spark, c)
    assert(e.startIndexing())
    val r = e.search(word0, limit = 1000)
    assert(!r.data.exists(_.uri == "doc/0"), "404 page must not be searchable")
    assert(e.statistics().pages == 499)
  }

  test("indexPage with an error status removes the old version, indexes nothing") {
    import spark.implicits._
    val e = freshEngine()
    // re-fetch of page 0 came back 404: reference deletes the old page and
    // the status gate skips indexing the new fetch
    val doc = Seq((0L, "src0", "doc/0",
      "0000000000000000000000000000000000000000", "en", "error page body", 404))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content", "code")
    assert(e.indexPage(doc))
    assert(e.statistics().pages == 499)
    val r = e.search("error", limit = 10)
    assert(!r.data.exists(_.uri == "doc/0"))
  }

  test("indexPage upsert: new content is searchable, old is gone") {
    import spark.implicits._
    val e = freshEngine()
    val before = e.search("dup", limit = 100)
    val doc = Seq((0L, "src0", "doc/0",
      "0000000000000000000000000000000000000000", "en", "dup dup dup unique999word"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    assert(e.indexPage(doc))
    val after = e.search("unique999word", limit = 10)
    assert(after.result && after.count == 1 && after.data.head.uri == "doc/0")
    val dupAfter = e.search("dup", limit = 100)
    assert(dupAfter.count == before.count + 1 ||
      before.data.exists(_.uri == "doc/0") && dupAfter.count == before.count)
  }
}
