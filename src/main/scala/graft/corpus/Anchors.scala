package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** Anchor-text indexing: terms in link text score toward the TARGET page,
  * not the page that wrote them (Brin & Page 1998 §2.2; Manning IIR §21.3 —
  * the single strongest web-ranking signal the reference's per-site engine
  * never needs, because its crawl never leaves one site,
  * LinksParsing.java:32-57 keeps only same-host links). A whole-web index
  * treats every in-link's anchor as a high-weight field of the destination
  * document, exactly like BM25F treats a title.
  *
  * Scale shape: the only new distributed step is ONE explode + hash
  * aggregate shuffled on (dst, term) — a popular page with 10^8 in-links is
  * just a large aggregate group, absorbed map-side by partial aggregation
  * (same argument as LinkRank's in-degree aggregate). Blending into the
  * ranking reuses the BM25F build/score split: `withAnchors` produces an
  * effective-tf postings relation that is an INDEX ARTIFACT (built once,
  * persisted/cached like `bm25fPostings`), and queries score through
  * `Search.bm25fTopKFromPostings` without ever touching the edge table.
  */
object Anchors {

  /** Deterministic anchor-bearing edge table for tests and benchmarks (the
    * sandbox has no real web graph): the same two out-links per doc as
    * `Crawl.syntheticEdges`, with edge 1 carrying the SOURCE doc's first 3
    * analyzed tokens as its anchor and edge 2 carrying tokens 4-6 — anchors
    * are authored by the linking page, so they vary per source, and a
    * target accumulates different anchor terms from different in-links. */
  def syntheticAnchors(docs: DataFrame, nDocs: Long): DataFrame = {
    val base = docs.select(col("doc_id").as("src"),
      Analyzer.termsCol(col("content"), Analyzer.naturalStop).as("arr"))
    base.select(col("src"), ((col("src") * 2 + 1) % nDocs).as("dst"),
        slice(col("arr"), 1, 3).as("anchor_terms"))
      .unionByName(base.select(col("src"), ((col("src") * 3 + 7) % nDocs).as("dst"),
        slice(col("arr"), 4, 3).as("anchor_terms")))
  }

  /** Anchor postings (doc_id, term, atf): every anchor token of every
    * in-link of `dst`, counted. Input `anchors` is (src, dst, anchor_terms:
    * array<string>) with anchors ALREADY analyzed (tokenized/stop-filtered
    * at crawl time, when the source page is in hand — re-analyzing at index
    * time would re-shuffle raw strings). */
  def anchorPostings(anchors: DataFrame): DataFrame =
    anchors.select(col("dst").as("doc_id"), explode(col("anchor_terms")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("atf"))

  /** Field-weighted effective postings tf′ = tf_body + wAnchor·atf — the
    * anchor analog of `Search.bm25fPostings` (anchors are a field whose
    * text arrives from OTHER documents): one co-partitioned full-outer
    * join, BIGINT throughout so the downstream BM25F score is
    * cross-engine-exact. wAnchor ≥ 1 keeps every eff row's tf′ > 0 (a
    * zero-weight anchor field would inject tf′ = 0 rows that inflate df). */
  def withAnchors(postings: DataFrame, anchorPostings: DataFrame,
                  wAnchor: Int = 3): DataFrame = {
    require(wAnchor >= 1, "wAnchor must be >= 1")
    postings.select(col("doc_id"), col("term"), col("tf"))
      .join(anchorPostings, Seq("doc_id", "term"), "full_outer")
      .select(col("doc_id"), col("term"),
        (coalesce(col("tf"), lit(0L)) +
          lit(wAnchor.toLong) * coalesce(col("atf"), lit(0L))).as("tf"))
  }
}
