package graft

import graft.analyze.Analyzer
import graft.corpus.Anchors
import graft.query.Search
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Anchor-text indexing: the distributed (dst, term) aggregate ≡ a scalar
  * recount, withAnchors' field math, and the signature behavior — a page is
  * findable by terms that appear ONLY in its in-links' anchor text. */
class AnchorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, s"page p$i links alpha beta gamma delta w$i word${i % 3}"))
    .toDF("doc_id", "content")

  test("anchorPostings ≡ scalar recount over the synthetic anchors") {
    val n = 40
    val docs = corpus(n)
    // scalar twin: take the ANALYZED token arrays from the same expression,
    // then redo the edge/slice/count logic in plain Scala
    val arrs = docs.select(col("doc_id"),
        Analyzer.termsCol(col("content"), Analyzer.naturalStop).as("arr"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = arrs.toSeq.flatMap { case (src, arr) =>
      Seq(((src * 2 + 1) % n, arr.slice(0, 3)), ((src * 3 + 7) % n, arr.slice(3, 6)))
    }.flatMap { case (dst, terms) => terms.map(t => (dst, t)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = Anchors.anchorPostings(Anchors.syntheticAnchors(docs, n))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("withAnchors: tf' = tf + w*atf, anchor-only and body-only rows kept") {
    val post = Seq((1L, "alpha", 2L), (1L, "beta", 1L), (2L, "alpha", 5L))
      .toDF("doc_id", "term", "tf")
    val ap = Seq((1L, "alpha", 1L), (1L, "gamma", 4L)).toDF("doc_id", "term", "atf")
    val got = Anchors.withAnchors(post, ap, wAnchor = 3)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map((1L, "alpha") -> 5L, (1L, "beta") -> 1L,
      (1L, "gamma") -> 12L, (2L, "alpha") -> 5L))
    intercept[IllegalArgumentException](Anchors.withAnchors(post, ap, wAnchor = 0))
  }

  test("a page is findable by terms appearing ONLY in in-link anchors") {
    // doc 1's body never says "gamma"; an in-link's anchor does
    val post = Seq((1L, "alpha", 2L), (1L, "beta", 1L), (2L, "alpha", 1L))
      .toDF("doc_id", "term", "tf")
    val anchors = Seq((2L, 1L, Seq("gamma", "beta")))
      .toDF("src", "dst", "anchor_terms")
    val eff = Anchors.withAnchors(post, Anchors.anchorPostings(anchors), wAnchor = 3)
    val hits = Search.bm25fTopKFromPostings(eff, Seq("gamma"), nDocs = 2, k = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(hits == Seq(1L))
    // and the plain body-postings path cannot see it
    val plain = Search.bm25fTopKFromPostings(
      post.select(col("doc_id"), col("term"), col("tf")),
      Seq("gamma"), nDocs = 2, k = 10).count()
    assert(plain == 0L)
  }
}
