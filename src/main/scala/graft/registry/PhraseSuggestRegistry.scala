package graft.registry

import graft.analyze.{Analyzer, DefaultLexicon, Html}
import graft.ann.Ann
import graft.corpus.Corpus
import graft.dedup.Dedup
import graft.index.{IndexWriter, InvertedIndex, ShardPosting, Shards}
import graft.mm.Multimodal
import graft.query.{Bm25, QueryFrontend, Search, Snippets, Wand}
import graft.textan.{TextAnalysis, TextHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registry.Shared._

/** positional/phrase/proximity retrieval, passages, prefix/fuzzy/wildcard, suggesters, snippets, facets. */
private[graft] object PhraseSuggestRegistry extends QueryRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Positional index (positions over the analyzed token sequence) and
    // exact adjacent-phrase matching — beyond the reference's tf-only index
    "ft_positions" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.index.Positional.positionalPostings(c)
        .select(col("doc_id"), col("term"), col("tf"),
          array_join(col("positions"), ",").as("positions_s"))
    }),
    "ft_phrase" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.index.Positional.phraseTopK(graft.index.Positional.tokenPositions(c), q2, 10)
    }),
    // Compressed positional index: per-term delta+varint position blobs
    // built once, the phrase query decodes |q|=2 blobs and runs the same
    // relational intersection. Shares ft_phrase's oracle — hash equality
    // proves encode∘decode = id on every position the query touches
    "ft_phrase_coded" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val blobs = graft.index.PositionalCodec.buildBlobs(
        graft.index.Positional.positionalPostings(c))
      graft.index.Positional.phraseTopK(
        graft.index.PositionalCodec.readPositions(blobs, q2), q2, 10)
    }),
    // Biword fast path: build-time adjacent-pair index, 2-word phrase =
    // ONE equality probe. Shares ft_phrase's oracle SQL — the hash gate
    // itself proves biword ≡ positional-intersection across engines
    "ft_biword" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.index.Positional.biwordTopK(
        graft.index.Positional.biwordPostings(c), q2(0), q2(1), 10)
    }),
    // Proximity ("phrase within slop"): same count-k-over-windowed-starts
    // relational shape as ft_phrase, slop=2 — the natural next query
    // operator after exact phrase
    "ft_proximity" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.index.Positional.proximityTopK(
        graft.index.Positional.tokenPositions(c), q2, slop = 2, k = 10)
    }),
    // Unordered proximity (NEAR/2): any-order co-occurrence inside a
    // width-(|q|+slop) window — the unordered complement of ft_proximity
    "ft_near" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.index.Positional.nearTopK(
        graft.index.Positional.tokenPositions(c), q2, slop = 2, k = 10)
    }),
    // Phrase-boosted ranking: BM25 + β·ln(1+phrase_tf) — exact-phrase docs
    // outrank bag-of-words matches at equal BM25 (boost promotes, never
    // excludes); the boost side rides the biword-fast-path relation
    "ft_phrase_boost" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val ph = graft.index.Positional.biwordPhrase(
        graft.index.Positional.biwordPostings(c), q2(0), q2(1))
      Search.bm25PhraseBoost(t.postings, t.docStats, dfs, t.nDocs, t.avgDl,
          ph, k = 10, beta = 0.5)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    // Sequential dependence model (Metzler & Croft 2005): unigram +
    // ordered-adjacency + unordered-window-8 Dirichlet features at the
    // canonical (0.85, 0.10, 0.05) weights — the term-dependence ranker
    "ft_sdm_topk" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val cfs = graft.query.Lm.lookupCf(t.postings, q2.toSet)
      val total = t.docStats.agg(sum("dl")).head.getLong(0)
      graft.query.Sdm.sdmTopK(t.postings,
          graft.index.Positional.tokenPositions(c), t.docStats,
          q2, cfs, total, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    // Passage retrieval + MaxP (Callan 1994): docs scored by their BEST
    // sliding window over analyzer positions; the winning (doc, start) is
    // the RAG chunk. Passage-level BM25 stats, window 30 / stride 15
    "ft_maxp_topk" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val pp = graft.query.Passage.passagePostings(
        graft.index.Positional.tokenPositions(c), window = 30, stride = 15)
      val pl = graft.query.Passage.passageLengths(pp)
      val st = pl.agg(count(lit(1)).as("np"), avg("pl").as("avgpl")).head()
      val dfs = pp.filter(col("term").isin(q2.map(x => x: Any): _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.query.Passage.maxpTopK(pp, pl, dfs, st.getLong(0), st.getDouble(1), k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), col("s"),
          round(col("score"), 4).as("score_r"))
    }),
    // MaxP winners materialized as chunk TEXT (the RAG deliverable):
    // top-5 (doc, start) joined back to k token arrays, window sliced
    "ft_maxp_snippet" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val pp = graft.query.Passage.passagePostings(
        graft.index.Positional.tokenPositions(c), window = 30, stride = 15)
      val pl = graft.query.Passage.passageLengths(pp)
      val st = pl.agg(count(lit(1)).as("np"), avg("pl").as("avgpl")).head()
      val dfs = pp.filter(col("term").isin(q2.map(x => x: Any): _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val winners = graft.query.Passage.maxpTopK(pp, pl, dfs,
        st.getLong(0), st.getDouble(1), k = 5)
      graft.query.Passage.chunkText(c, winners, window = 30)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          col("s"), col("chunk"))
    }),
    // Prefix (wildcard) term expansion over the dictionary — pushed
    // StringStartsWith range probe, fan-out capped
    "ft_prefix" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      QueryFrontend.prefixTerms(t.termStats, "sp")
    }),
    // edge-n-gram autocomplete: precomputed top-3 completions per prefix
    // (cf desc, term asc), three keystroke lookups
    "ft_autocomplete" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      QueryFrontend.autocompleteLookup(
        QueryFrontend.autocompleteBuild(t.postings), Seq("sp", "jo", "qu"))
    }),
    // Fuzzy term match (edit distance <= 1) via SymSpell deletion-
    // neighborhood equi-join + levenshtein verify on candidates only
    "ft_fuzzy" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      QueryFrontend.fuzzyTerms(t.termStats, "sprk")
    }),
    // General wildcard via the k-gram index + LIKE post-filter (IIR
    // 3.2.2); the brute-force LIKE twin proves candidate completeness
    "ft_wildcard" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      QueryFrontend.wildcardTerms(t.termStats, "s*a*")
    }),
    // Wildcard COLD: same probe over the PERSISTED gram-partitioned k-gram
    // artifact — shares ft_wildcard's oracle (the round trip is lossless)
    "ft_wildcard_persisted" -> ((s, dir) =>
      QueryFrontend.wildcardTermsPersisted(s, persistedAux(s, dir), "s*a*")),
    // "More like this": TF-IDF-cosine doc-to-doc top-k (broadcast pruned
    // query vector, equi-join candidates, reusable norm pass)
    "ft_more_like" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      // maxDfFrac 0.9: the sf corpora have a ~31-term synthetic vocabulary
      // where every term is hot (median df ≈ 0.78N) — the default 0.25
      // informative-term prune would empty the query vector
      val (w, norms) = mltIndex(s, dir)
      Search.mltQuery(w, norms, t.nDocs, docId = 42L, k = 10, maxDfFrac = 0.9)
    }),
    // Query segmentation by corpus-bigram evidence: adjacent terms glue
    // iff the biword index saw them together ≥ 3 times
    "ft_query_segment" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      QueryFrontend.segmentQuery(
        graft.index.Positional.biwordPostings(c), qSeg, minCf = 3L)
    }),
    // batched "did-you-mean": best correction per query term in ONE plan
    // (SymSpell dict-side neighborhood ⋈ broadcast query variants; top-1 =
    // rank-1 window; oracle is brute-force levenshtein over the dictionary
    // — equality also PROVES the deletion-neighborhood candidates complete)
    "ft_suggest" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      QueryFrontend.suggestBatch(t.termStats, suggestQ, maxDist = 2)
    }),
    // Context-aware did-you-mean (noisy channel + bigram prior): "merge
    // sart" → sort beats the equal-distance part because (merge, sort)
    // is the stronger corpus bigram
    "ft_suggest_context" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val bw = graft.index.Positional.biwordPostings(c)
      QueryFrontend.suggestInContext(t.termStats, bw,
        context = "merge", typo = "sart")
    }),
    // A6/A7 + §2.9: snippet pipeline (sentence argmax, 30-word trim around
    // the first hit, <b> highlight) over every doc for the fixed query terms
    "ft_snippet" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val snip = graft.query.Snippets.makeSnippetUdf(q2.toSet)
      c.select(col("doc_id"), snip(col("content"), lit("en")).as("snippet"))
    }),
    // Multi-fragment snippet: the 2 best sentences, document order, "…"-joined
    "ft_snippet_multi" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val snip = graft.query.Snippets.makeSnippetMultiUdf(q2.toSet, m = 2)
      c.select(col("doc_id"), snip(col("content"), lit("en")).as("snippet"))
    }),
    // term facets: top-3 terms per repo by per-repo df (WindowGroupLimit)
    "ft_facets" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.stats.Stats.topTermsPerRepo(
        InvertedIndex.termStatsByRepo(InvertedIndex.tokens(c)), k = 3)
    }),
    // facets COLD: same rollup over the persisted per-repo stats artifact —
    // zero tokenization on the query path
    "ft_facets_persisted" -> ((s, dir) =>
      graft.stats.Stats.facetsPersisted(s, persistedAux(s, dir), k = 3)),
    // related terms by co-occurrence lift (query-expansion association)
    "ft_related" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Search.relatedTerms(t.postings, t.termStats, "spark", k = 10)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ft_positions" ->
      s"""WITH ${tokArrCte},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr)
         |SELECT doc_id, term, count(*)::BIGINT AS tf,
         |       array_to_string(list(pos ORDER BY pos), ',') AS positions_s
         |FROM tp GROUP BY doc_id, term""".stripMargin,
    "ft_phrase" -> phraseSql(q2, 10),
    // coded-positional shares the phrase oracle: the hash gate proves the
    // varint round-trip loses no position
    "ft_phrase_coded" -> phraseSql(q2, 10),
    // deliberately the SAME twin as ft_phrase: the biword index must be
    // indistinguishable from the positional intersection for k = 2
    "ft_biword" -> phraseSql(q2, 10),
    "ft_proximity" -> proximitySql(q2, 2, 10),
    "ft_near" -> nearSql(q2, 2, 10),
    "ft_phrase_boost" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val shifts = q2.zipWithIndex.map { case (t, i) =>
        s"SELECT doc_id, pos - $i AS start FROM tp WHERE term = '$t'"
      }.mkString("\n  UNION ALL ")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |${tokArrCte},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
         |m AS ($shifts),
         |hits AS (SELECT doc_id, start FROM m GROUP BY doc_id, start HAVING count(*) = ${q2.size}),
         |ph AS (SELECT doc_id, count(*)::BIGINT AS phrase_tf FROM hits GROUP BY doc_id),
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id),
         |b AS (SELECT sc.doc_id,
         |        sc.score + 0.5 * ln(1.0 + coalesce(ph.phrase_tf, 0)) AS score
         |      FROM scored sc LEFT JOIN ph USING (doc_id)
         |      WHERE sc.n_terms = ${q2.size})
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r FROM b)
         |WHERE rank <= 10""".stripMargin
    },
    // SDM twin: same matched-only decomposition per feature family; the
    // one adjacent pair's ordered/unordered counts via a positions
    // self-join; zero collection count zeroes the family (CASE), exactly
    // the Spark drop rule
    "ft_sdm_topk" ->
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tokArrCte}, ${qCte(q2)},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
         |tot AS (SELECT sum(dl)::DOUBLE AS c FROM ds),
         |qcf AS (SELECT term, sum(tf)::BIGINT AS cf FROM post JOIN q USING (term) GROUP BY term),
         |qc AS (SELECT sum(ln(2000.0 * (cf / c))) AS qconst, count(*)::DOUBLE AS nq FROM qcf, tot),
         |sdt AS (SELECT p.doc_id, sum(ln(1.0 + p.tf / (2000.0 * (f.cf / t.c)))) AS sd_t
         |        FROM post p JOIN qcf f USING (term), tot t GROUP BY p.doc_id),
         |owc AS (SELECT a.doc_id, count(*)::BIGINT AS cnt
         |        FROM tp a JOIN tp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |        WHERE a.term = '${q2(0)}' AND b.term = '${q2(1)}' GROUP BY a.doc_id),
         |ocf AS (SELECT coalesce(sum(cnt), 0)::BIGINT AS cf FROM owc),
         |uwc AS (SELECT a.doc_id, count(*)::BIGINT AS cnt
         |        FROM tp a JOIN tp b ON a.doc_id = b.doc_id AND abs(b.pos - a.pos) < 8
         |        WHERE a.term = '${q2(0)}' AND b.term = '${q2(1)}' GROUP BY a.doc_id),
         |ucf AS (SELECT coalesce(sum(cnt), 0)::BIGINT AS cf FROM uwc),
         |sc AS (SELECT s.doc_id,
         |  0.85 * (s.sd_t + qc.qconst - qc.nq * ln(d.dl + 2000.0))
         |  + 0.1 * (CASE WHEN ocf.cf > 0 THEN
         |      coalesce(ln(1.0 + o.cnt / (2000.0 * (ocf.cf / t.c))), 0.0)
         |      + ln(2000.0 * (ocf.cf / t.c)) - ln(d.dl + 2000.0) ELSE 0.0 END)
         |  + 0.05 * (CASE WHEN ucf.cf > 0 THEN
         |      coalesce(ln(1.0 + u.cnt / (2000.0 * (ucf.cf / t.c))), 0.0)
         |      + ln(2000.0 * (ucf.cf / t.c)) - ln(d.dl + 2000.0) ELSE 0.0 END) AS score
         |  FROM sdt s JOIN ds d USING (doc_id)
         |  CROSS JOIN qc CROSS JOIN ocf CROSS JOIN ucf CROSS JOIN tot t
         |  LEFT JOIN owc o ON o.doc_id = s.doc_id
         |  LEFT JOIN uwc u ON u.doc_id = s.doc_id)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r
         |  FROM sc
         |) WHERE rank <= 10""".stripMargin,
    // MaxP twin: same window-covering explode (range with stride step),
    // same passage-level stats, same best-passage-then-doc ranking
    "ft_maxp_topk" -> {
      val score = Bm25.sql("p.tf", "f.df", "l.pl", "st.np", "st.avgpl")
      s"""WITH ${tokArrCte},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
         |pp0 AS (SELECT doc_id, term,
         |          unnest(range(((greatest(pos - 30 + 1, 0) + 15 - 1) // 15) * 15,
         |                       (pos // 15) * 15 + 1, 15)) AS s
         |        FROM tp),
         |ppc AS (SELECT doc_id, s, term, count(*)::BIGINT AS tf FROM pp0 GROUP BY doc_id, s, term),
         |plc AS (SELECT doc_id, s, sum(tf)::BIGINT AS pl FROM ppc GROUP BY doc_id, s),
         |pstats AS (SELECT count(*)::DOUBLE AS np, avg(pl) AS avgpl FROM plc),
         |pdf AS (SELECT term, count(*)::BIGINT AS df FROM ppc GROUP BY term),
         |${qCte(q2)},
         |scored AS (SELECT p.doc_id, p.s, sum($score) AS pscore
         |  FROM ppc p JOIN q USING (term) JOIN pdf f USING (term)
         |       JOIN plc l ON p.doc_id = l.doc_id AND p.s = l.s, pstats st
         |  GROUP BY p.doc_id, p.s),
         |best AS (SELECT doc_id, s, pscore,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY pscore DESC, s ASC) AS rn
         |         FROM scored)
         |SELECT rank, doc_id, s, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY pscore DESC, doc_id ASC) AS rank,
         |         doc_id, s, round(pscore, 4) AS score_r
         |  FROM best WHERE rn = 1
         |) WHERE rank <= 10""".stripMargin
    },
    // MaxP-snippet twin: the same maxp chain (k=5) + a tokarr slice
    "ft_maxp_snippet" -> {
      val score = Bm25.sql("p.tf", "f.df", "l.pl", "st.np", "st.avgpl")
      s"""WITH ${tokArrCte},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
         |pp0 AS (SELECT doc_id, term,
         |          unnest(range(((greatest(pos - 30 + 1, 0) + 15 - 1) // 15) * 15,
         |                       (pos // 15) * 15 + 1, 15)) AS s
         |        FROM tp),
         |ppc AS (SELECT doc_id, s, term, count(*)::BIGINT AS tf FROM pp0 GROUP BY doc_id, s, term),
         |plc AS (SELECT doc_id, s, sum(tf)::BIGINT AS pl FROM ppc GROUP BY doc_id, s),
         |pstats AS (SELECT count(*)::DOUBLE AS np, avg(pl) AS avgpl FROM plc),
         |pdf AS (SELECT term, count(*)::BIGINT AS df FROM ppc GROUP BY term),
         |${qCte(q2)},
         |scored AS (SELECT p.doc_id, p.s, sum($score) AS pscore
         |  FROM ppc p JOIN q USING (term) JOIN pdf f USING (term)
         |       JOIN plc l ON p.doc_id = l.doc_id AND p.s = l.s, pstats st
         |  GROUP BY p.doc_id, p.s),
         |best AS (SELECT doc_id, s, pscore,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY pscore DESC, s ASC) AS rn
         |         FROM scored),
         |win AS (SELECT rank, doc_id, s FROM (
         |  SELECT row_number() OVER (ORDER BY pscore DESC, doc_id ASC) AS rank, doc_id, s
         |  FROM best WHERE rn = 1
         |) WHERE rank <= 5)
         |SELECT w.rank, w.doc_id, w.s,
         |       array_to_string(t.arr[(w.s + 1):(w.s + 30)], ' ') AS chunk
         |FROM win w JOIN tokarr t USING (doc_id)""".stripMargin
    },
    "ft_prefix" ->
      s"""WITH ${termsCte}, ${tstatsCte}
         |SELECT term, df FROM tstats WHERE term LIKE 'sp%'
         |ORDER BY df DESC, term ASC LIMIT 50""".stripMargin,
    // autocomplete twin: same edge-n-gram explode (len 2..5), same per-
    // prefix (cf desc, term) top-3, same keystroke lookups
    "ft_autocomplete" ->
      s"""WITH ${termsCte}, ${postCte},
         |cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM post GROUP BY term),
         |pre AS (SELECT term, cf, term[1:l] AS prefix
         |        FROM (SELECT term, cf,
         |                unnest(range(2, least(length(term), 5) + 1)) AS l
         |              FROM cf WHERE length(term) >= 2)),
         |r AS (SELECT prefix,
         |        row_number() OVER (PARTITION BY prefix
         |                           ORDER BY cf DESC, term ASC)::BIGINT AS rank,
         |        term, cf FROM pre)
         |SELECT prefix, rank, term, cf FROM r
         |WHERE rank <= 3 AND prefix IN ('sp', 'jo', 'qu')""".stripMargin,
    "ft_fuzzy" -> fuzzySql("sprk", 1),
    // brute-force LIKE over the whole vocabulary: equality with the
    // k-gram-index path proves candidate completeness AND that the
    // post-filter killed every false positive
    "ft_wildcard" ->
      s"""WITH ${termsCte}, ${tstatsCte}
         |SELECT term, df FROM tstats WHERE term LIKE 's%a%'
         |ORDER BY df DESC, term ASC LIMIT 50""".stripMargin,
    // the persisted variant must agree with the SAME oracle — write →
    // gram-partitioned aux → pruned cold read is provably lossless
    "ft_wildcard_persisted" ->
      s"""WITH ${termsCte}, ${tstatsCte}
         |SELECT term, df FROM tstats WHERE term LIKE 's%a%'
         |ORDER BY df DESC, term ASC LIMIT 50""".stripMargin,
    "ft_more_like" ->
      s"""WITH ${termsCte}, ${postCte}, ${tstatsCte},
         |w AS (SELECT doc_id, term, df,
         |             tf * ln((SELECT count(*) FROM documents)::DOUBLE / df) AS wt
         |      FROM post JOIN tstats USING (term)),
         |norms AS (SELECT doc_id, sqrt(sum(wt*wt)) AS norm FROM w GROUP BY doc_id),
         |qv AS (SELECT term, wt AS qwt FROM w
         |       WHERE doc_id = 42 AND df <= 0.9 * (SELECT count(*) FROM documents)),
         |dotp AS (SELECT w.doc_id, sum(w.wt * qv.qwt) AS dot
         |         FROM w JOIN qv USING (term) WHERE w.doc_id <> 42 GROUP BY w.doc_id),
         |scored AS (SELECT d.doc_id,
         |                  round(d.dot / (n.norm * (SELECT norm FROM norms WHERE doc_id = 42)), 4) AS score_r
         |           FROM dotp d JOIN norms n USING (doc_id))
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score_r DESC, doc_id ASC) AS rank,
         |         doc_id, score_r FROM scored
         |) WHERE rank <= 10""".stripMargin,
    // segmentation twin: corpus bigram cf from the same ordered token
    // arrays, cumulative cut-count window over the |q| query rows
    "ft_query_segment" -> {
      val qvals = qSeg.zipWithIndex
        .map { case (t, i) => s"($i::BIGINT, '$t')" }.mkString(", ")
      s"""WITH ${tokArrCte},
         |bw AS (SELECT unnest(list_transform(range(greatest(len(arr) - 1, 0)),
         |         i -> arr[i + 1] || ' ' || arr[i + 2])) AS gram FROM tokarr),
         |cf AS (SELECT split_part(gram, ' ', 1) AS w1, split_part(gram, ' ', 2) AS w2,
         |              count(*)::BIGINT AS cf FROM bw GROUP BY 1, 2),
         |q AS (SELECT * FROM (VALUES $qvals) t(pos, term)),
         |g AS (SELECT q2.pos, coalesce(c.cf, 0)::BIGINT AS pair_cf,
         |             coalesce(c.cf, 0) >= 3 AS glue
         |      FROM q q1 JOIN q q2 ON q2.pos = q1.pos + 1
         |      LEFT JOIN cf c ON c.w1 = q1.term AND c.w2 = q2.term)
         |SELECT q.pos, q.term,
         |       sum(CASE WHEN q.pos = 0 OR NOT coalesce(g.glue, false)
         |                THEN 1 ELSE 0 END)
         |         OVER (ORDER BY q.pos ROWS UNBOUNDED PRECEDING)::BIGINT AS seg_id,
         |       coalesce(g.pair_cf, 0)::BIGINT AS pair_cf
         |FROM q LEFT JOIN g USING (pos) ORDER BY pos ASC""".stripMargin
    },
    "ft_suggest" -> {
      val qVals = suggestQ.map(q => s"'$q'").mkString(",")
      s"""WITH ${termsCte}, ${tstatsCte},
         |q AS (SELECT unnest(ARRAY[$qVals]) AS qterm),
         |cand AS (SELECT q.qterm, t.term, t.df, levenshtein(t.term, q.qterm) AS dist
         |         FROM tstats t CROSS JOIN q)
         |SELECT qterm, suggestion, dist, df FROM (
         |  SELECT qterm, term AS suggestion, dist::BIGINT AS dist, df,
         |         row_number() OVER (PARTITION BY qterm ORDER BY dist, df DESC, term) AS rn
         |  FROM cand WHERE dist <= 2) WHERE rn = 1""".stripMargin
    },
    // context-suggest twin: brute-force levenshtein candidates (SymSpell
    // completeness makes the engine's delete-join equal), bigram prior
    // from the same zipped token arrays
    "ft_suggest_context" ->
      s"""WITH ${termsCte}, ${tstatsCte}, ${tokArrCte},
         |cand AS (SELECT term, levenshtein(term, 'sart')::BIGINT AS dist
         |         FROM tstats WHERE levenshtein(term, 'sart') <= 2),
         |bw0 AS (SELECT doc_id, unnest(arr[1:len(arr)-1]) AS w1,
         |               unnest(arr[2:len(arr)]) AS w2 FROM tokarr),
         |cf AS (SELECT w2 AS term, count(*)::BIGINT AS ctx_cf FROM bw0
         |       WHERE w1 = 'merge' GROUP BY w2)
         |SELECT suggestion, dist, ctx_cf FROM (
         |  SELECT c.term AS suggestion, c.dist,
         |         coalesce(f.ctx_cf, 0)::BIGINT AS ctx_cf,
         |         row_number() OVER (ORDER BY c.dist ASC,
         |           coalesce(f.ctx_cf, 0) DESC, c.term ASC) AS rn
         |  FROM cand c LEFT JOIN cf f USING (term)) WHERE rn <= 3""".stripMargin,
    "ft_snippet" -> snippetSql,
    "ft_snippet_multi" -> snippetMultiSql,
    "ft_facets" -> facetsSql,
    "ft_facets_persisted" -> facetsSql,
    "ft_related" ->
      s"""WITH ${termsCte}, ${postCte}, ${tstatsCte},
         |seed AS (SELECT DISTINCT doc_id FROM post WHERE term = 'spark'),
         |cooc AS (SELECT p.term, count(*)::BIGINT AS cooc
         |         FROM post p JOIN seed USING (doc_id)
         |         WHERE p.term <> 'spark' GROUP BY p.term HAVING count(*) >= 2),
         |sc AS (SELECT c.term, c.cooc, t.df, round(c.cooc::DOUBLE / t.df, 4) AS lift_r
         |       FROM cooc c JOIN tstats t USING (term))
         |SELECT rank, term, cooc, df, lift_r FROM (
         |  SELECT row_number() OVER (ORDER BY lift_r DESC, cooc DESC, term) AS rank,
         |         term, cooc, df, lift_r FROM sc)
         |WHERE rank <= 10""".stripMargin
  )
}
