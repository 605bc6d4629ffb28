package graft.query

import graft.analyze.Analyzer

/** In-memory scalar reference implementation — pure Scala, no Spark — of
  * the full index+query pipeline. This is the committed oracle that defines
  * truth for the rank-identical tests (FIXTURES.md §2-3): the reference's
  * own tie behavior is HashMap-order nondeterministic (/root/reference/src/
  * main/java/searchengine/tools/SearcherPage.java:80-89), so per the north
  * rule ties are broken deterministically by docId ascending here.
  *
  * Deliberately naive (loops + maps) so it can be audited by eye; never run
  * at scale.
  */
object Oracle {

  case class Doc(docId: Long, repo: String, lang: String, content: String)
  case class Scored(docId: Long, bm25: Double, sumTf: Long)

  final class Index(docs: Seq[Doc], lexicon: Analyzer.Lexicon = Analyzer.emptyLexicon) {
    val terms: Map[Long, Seq[String]] =
      docs.map(d => d.docId -> Analyzer.analyze(d.lang, d.content, lexicon)).toMap
    val tf: Map[(Long, String), Long] =
      terms.toSeq.flatMap { case (id, ts) => ts.map(t => (id, t)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df: Map[String, Long] =
      terms.toSeq.flatMap { case (id, ts) => ts.distinct.map(t => (t, id)) }
        .groupBy(_._1).map { case (t, v) => t -> v.size.toLong }
    val dl: Map[Long, Long] = terms.map { case (id, ts) => id -> ts.size.toLong }
    val nDocs: Long = docs.size.toLong
    // avg over docs with >=1 token only — matches InvertedIndex.build (avg
    // over docStats, which has no zero-length rows) and the DuckDB statsCte;
    // an all-stopword doc must not drag avgDl down on one side only.
    val avgDl: Double = {
      val pos = dl.values.filter(_ > 0L)
      if (pos.isEmpty) 0.0 else pos.sum.toDouble / pos.size
    }

    def postingList(term: String): Seq[Long] =
      tf.keys.collect { case (id, t) if t == term => id }.toSeq.sorted

    /** front-end plan: analyze, missing short-circuit, mean+2σ prune,
      * df-asc order — exactly QueryFrontend's semantics. */
    def plan(lang: String, query: String): QueryFrontend.Plan = {
      val qTerms = Analyzer.queryTerms(lang, query, lexicon)
      if (qTerms.isEmpty) return QueryFrontend.Plan(Nil, Nil, Nil)
      val missing = qTerms.filterNot(df.contains).toSeq.sorted
      if (missing.nonEmpty) return QueryFrontend.Plan(Nil, missing, Nil)
      val infos = qTerms.toSeq.map(t => QueryFrontend.TermInfo(t, df(t)))
      val (kept, dropped) = QueryFrontend.pruneCommon(infos)
      QueryFrontend.Plan(kept.sortBy(t => (t.df, t.term)), missing, dropped.sortBy(_.term))
    }

    /** conjunctive candidates + BM25 and Σtf scores for the planned terms */
    def score(planTerms: Seq[String]): Seq[Scored] = {
      if (planTerms.isEmpty) return Nil
      val candidate = planTerms.map(t => postingList(t).toSet).reduce(_ intersect _)
      candidate.toSeq.sorted.map { id =>
        val bm25 = planTerms.sorted.map { t =>
          Bm25.scoreS(tf((id, t)), df(t), dl(id), nDocs, avgDl)
        }.sum
        val sumTf = planTerms.map(t => tf((id, t))).sum
        Scored(id, bm25, sumTf)
      }
    }

    def topK(lang: String, query: String, k: Int, offset: Int = 0): Seq[Scored] = {
      val p = plan(lang, query)
      if (p.missing.nonEmpty || p.isEmpty) return Nil
      score(p.terms.map(_.term))
        .sortBy(s => (-s.bm25, s.docId))
        .slice(offset, offset + k)
    }

    /** disjunctive (OR) variant: any doc containing ≥1 query term */
    def topKDisjunctive(lang: String, query: String, k: Int): Seq[Scored] = {
      val p = plan(lang, query)
      if (p.missing.nonEmpty || p.isEmpty) return Nil
      val planTerms = p.terms.map(_.term)
      val candidate = planTerms.flatMap(t => postingList(t)).distinct
      candidate.sorted.map { id =>
        val present = planTerms.filter(t => tf.contains((id, t)))
        val bm25 = present.sorted.map(t =>
          Bm25.scoreS(tf((id, t)), df(t), dl(id), nDocs, avgDl)).sum
        Scored(id, bm25, present.map(t => tf((id, t))).sum)
      }.sortBy(s => (-s.bm25, s.docId)).take(k)
    }

    def topKSumTf(lang: String, query: String, k: Int): Seq[Scored] = {
      val p = plan(lang, query)
      if (p.missing.nonEmpty || p.isEmpty) return Nil
      score(p.terms.map(_.term))
        .sortBy(s => (-s.sumTf, s.docId))
        .take(k)
    }
  }
}
