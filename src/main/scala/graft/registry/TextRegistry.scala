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

/** text analysis: lang-id, quality, tokens, BPE, fingerprints, keywords, readability, sketch fits. */
private[graft] object TextRegistry extends QueryRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Corpus-scale diagnostics: exact dl quantiles per repo + ALL (the
    // partition-sizing / skew report) and the Zipf slope (skew forecast)
    "text_len_quantiles" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      graft.stats.Stats.lengthQuantiles(t.docStats, c)
        .select(col("repo"), col("docs"), round(col("p50"), 4).as("p50_r"),
          round(col("p90"), 4).as("p90_r"), round(col("p99"), 4).as("p99_r"),
          col("max_dl"))
    }),
    "text_zipf_fit" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      graft.stats.Stats.zipfFit(t.postings, topN = 1000)
        .select(col("n_terms"), round(col("slope"), 4).as("slope_r"),
          round(col("intercept"), 4).as("intercept_r"), round(col("r2"), 4).as("r2_r"))
    }),
    // Heaps-law fit: vocabulary growth V = K·N^β over log-spaced doc-id
    // prefixes — the dictionary-memory forecast at 100 TB
    "text_heaps_fit" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.stats.Stats.heapsFit(InvertedIndex.tokens(c), heapsThresholds)
        .select(col("n_points"), round(col("slope"), 4).as("slope_r"),
          round(col("intercept"), 4).as("intercept_r"), round(col("r2"), 4).as("r2_r"))
    }),
    // Vocabulary drift between the corpus and its recrawl: per-term Δp +
    // corpus-level Jensen-Shannon divergence (the recrawl QA monitor)
    "text_vocab_drift" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val old = c.select("doc_id", "content")
      val kept = old.filter(col("doc_id") % 17 =!= 0)
        .withColumn("content", when(col("doc_id") % 13 === 0,
          concat(col("content"), lit(" updated"))).otherwise(col("content")))
      val added = old.filter(col("doc_id") % 23 === 0)
        .select((col("doc_id") + t.nDocs).as("doc_id"),
          concat(lit("new page "), col("doc_id").cast("string")).as("content"))
      TextAnalysis.vocabDrift(old, kept.unionByName(added), k = 20)
        .select(col("term"), col("c_old"), col("c_new"),
          round(col("dp"), 6).as("dp_r"), round(col("jsd"), 6).as("jsd_r"))
    }),
    // Seed-lexicon topic tagging (Snorkel-style labeling functions):
    // BIGINT hit votes, argmax topic per doc, no-hit docs stay unlabeled
    "text_topic_tag" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      TextAnalysis.topicTag(t.postings, seedTopics)
    }),
    // Dunning LLR distinctive terms: what vocabulary makes repo src0
    // different from the rest of the pile (domain fingerprint)
    "text_llr_keywords" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      TextAnalysis.llrKeywords(t.postings, c.select("doc_id", "repo"), "src0")
        .select(col("rank"), col("term"), col("k11"), col("k12"),
          round(col("g2"), 4).as("g2_r"))
    }),
    // Flesch reading-ease as a per-doc quality signal (vowel-group
    // syllables; pseudo-sentences of 15 tokens on this unpunctuated corpus)
    "text_readability" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.readability(c)
    }),
    // Content-defined chunking (LBFS/FastCDC): cut where the rolling
    // 3-token fingerprint hits 0 mod 16 — edit-stable chunk boundaries
    "text_cdc_chunks" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.cdcChunks(c, mask = 16)
    }),
    // Logistic-regression quality filter trained with FULL-BATCH GD (the
    // order-independent, cluster-reproducible trainer; 2 unrolled steps)
    "text_lr_classify" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val labels = c.select(col("doc_id"),
        when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
      val w = graft.pipeline.Classify.lrTrain(t.postings, labels, t.nDocs, iters = 2)
      graft.pipeline.Classify.lrScores(t.postings, w)
        .join(labels, "doc_id")
        .select(col("doc_id"), round(col("p"), 4).as("p_r"),
          (col("p") >= 0.5).cast("long").as("pred"), col("y").cast("long").as("y"))
    }),
    // Multinomial Naive Bayes domain classifier (the fastText-style cheap
    // filter of LLM pipelines): train on the hash-split train docs with
    // repo as label, predict the held-out docs. Model = vocab×classes
    // count matrix (corpus-size-independent); apply = one postings⋈model
    // join, absent (term,class) pairs vanish algebraically (ln 1 = 0)
    "text_nb_classify" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val labels = c.select(col("doc_id"), col("repo").as("label"))
      val split = graft.pipeline.Splits.assign(c.select("doc_id"))
      val trainIds = split.filter(col("split") === "train").select("doc_id")
      val heldIds = split.filter(col("split") =!= "train").select("doc_id")
      val (model, cs) = graft.pipeline.Classify.nbTrain(
        t.postings.join(trainIds, Seq("doc_id"), "left_semi"),
        labels.join(trainIds, Seq("doc_id"), "left_semi"))
      graft.pipeline.Classify.nbPredict(
          t.postings.join(heldIds, Seq("doc_id"), "left_semi"), model, cs)
        .join(labels.withColumnRenamed("label", "truth"), "doc_id")
        .select(col("doc_id"), col("truth"), col("label").as("pred"),
          (col("label") === col("truth")).cast("long").as("hit"),
          round(col("score"), 4).as("score_r"))
    }),
    // language-ID heuristic
    "text_lang_id" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.langId(c)
    }),
    // quality features (length / stopword / alnum ratios)
    "text_quality" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.quality(c)
    }),
    // token counting: whitespace + BPE-ish pre-tokens
    "text_token_counts" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.tokenCounts(c)
    }),
    // per-doc unigram surprisal: mean −ln p(token) under the corpus's own
    // unigram LM — the model-free CCNet-style quality/perplexity signal
    "text_surprisal" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      TextAnalysis.surprisal(t.postings, t.docStats)
        .select(col("doc_id"), col("dl"), round(col("h"), 4).as("h_r"))
    }),
    // overlapping token-window chunking (context-window prep): window 24,
    // stride 16 — same overlap ratio as a 512/384 production config scaled
    // to the short synthetic docs
    "text_chunks" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.chunk(c, window = 24, stride = 16)
    }),
    // BPE vocabulary induction: 3 merge steps over the corpus word counts —
    // the tokenizer-training operator; every merge decision hash-gated
    "text_bpe_merges" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.textan.Bpe.merges(c, steps = 3)
    }),
    // BPE ENCODE: apply the 3 learned merges back to the corpus — per-doc
    // token counts under the trained vocab (train → encode round-trip)
    "text_bpe_encode" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val m = graft.textan.Bpe.merges(c, steps = 3).collect()
        .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
      graft.textan.Bpe.encode(c, m)
    }),
    // bigram surprisal: mean −ln p(w_i | w_{i−1}) under the corpus bigram
    // MLE — the word-ORDER quality signal unigram surprisal cannot see
    "text_bigram_lm" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.bigramSurprisal(c)
        .select(col("doc_id"), col("n_bigrams"), round(col("h2"), 4).as("h2_r"))
    }),
    // KMV distinct sketch (k=64) over the 3-shingle stream — "how big
    // would the shingle dictionary be" without building it; deterministic,
    // so oracle-gated unlike HLL. The tiny fixed term vocabulary (29)
    // would take the exact-below-k path; shingles exercise the estimator
    "text_kmv_shingles" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val sh = Dedup.shingles(c, 3).select(col("shingle").as("v"))
      val exact = sh.distinct().count()
      graft.stats.Sketches.kmvDistinct(sh, "v", k = 64)
        .select(col("k_n"), round(col("est"), 4).as("est_r"),
          lit(exact).as("exact"),
          round(abs(col("est") - lit(exact.toDouble)) / lit(exact.toDouble), 4)
            .as("err_r"))
    }),
    // order-sensitive rolling document fingerprint
    "text_fingerprint" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.fingerprint(c)
    }),
    // PII scrub over deterministically injected emails/IPs/phones (the
    // corpus itself is synthetic, so the fixtures inject the PII to find)
    "text_redact" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.redactPii(c.withColumn("content", piiInject))
    }),
    // Gopher-style repetition quality signals (dup-word / top-bigram)
    "text_repetition" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.repetition(c)
    }),
    // PMI collocations: statistically-bound adjacent pairs (phrase discovery)
    "text_collocations" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      TextAnalysis.collocations(c, minCount = 5L, k = 50)
        .select(col("a"), col("b"), col("c_ab"), round(col("pmi"), 4).as("pmi_r"))
    }),
    // tf-idf keyword extraction: top-5 informative terms per doc (document
    // tagging; j-row heap per doc via WindowGroupLimit)
    "text_keywords" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      graft.stats.Stats.keywords(t.postings, t.termStats, t.nDocs, j = 5, minDf = 2)
    }),
    // Within-site boilerplate: fraction of a doc's shingles recurring in
    // ≥ 2 docs of the SAME site (nav/footer/template mass)
    "text_boilerplate" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.textan.TextAnalysis.boilerplate(c, n = 3, minSiteDf = 2L)
    })
  )

  val oracleSql: Map[String, String] = Map(
    // exact-quantile twin: Spark `percentile` and DuckDB `quantile_cont`
    // share the (n−1)·p linear-interpolation definition
    "text_len_quantiles" ->
      s"""WITH ${termsCte}, ${dsCte},
         |dr AS (SELECT ds.doc_id, ds.dl, d.source AS repo
         |       FROM ds JOIN documents d USING (doc_id)),
         |per AS (SELECT repo, count(*)::BIGINT AS docs,
         |               quantile_cont(dl, 0.5) AS p50, quantile_cont(dl, 0.9) AS p90,
         |               quantile_cont(dl, 0.99) AS p99, max(dl) AS max_dl
         |        FROM dr GROUP BY repo
         |        UNION ALL
         |        SELECT 'ALL', count(*)::BIGINT,
         |               quantile_cont(dl, 0.5), quantile_cont(dl, 0.9),
         |               quantile_cont(dl, 0.99), max(dl)
         |        FROM dr)
         |SELECT repo, docs, round(p50, 4) AS p50_r, round(p90, 4) AS p90_r,
         |       round(p99, 4) AS p99_r, max_dl FROM per""".stripMargin,
    "text_zipf_fit" ->
      s"""WITH ${termsCte}, ${postCte},
         |cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM post GROUP BY term),
         |xy AS (SELECT ln(rank::DOUBLE) AS x, ln(cf::DOUBLE) AS y FROM (
         |  SELECT cf, row_number() OVER (ORDER BY cf DESC, term ASC)::BIGINT AS rank FROM cf
         |) WHERE rank <= 1000)
         |SELECT count(*)::BIGINT AS n_terms,
         |       round(covar_pop(x, y) / var_pop(x), 4) AS slope_r,
         |       round(avg(y) - (covar_pop(x, y) / var_pop(x)) * avg(x), 4) AS intercept_r,
         |       round((covar_pop(x, y) * covar_pop(x, y)) / (var_pop(x) * var_pop(y)), 4) AS r2_r
         |FROM xy""".stripMargin,
    "text_heaps_fit" -> {
      val thList = heapsThresholds.mkString(", ")
      s"""WITH ${termsCte},
         |th AS (SELECT unnest([$thList])::BIGINT AS t),
         |pd AS (SELECT doc_id, count(*)::BIGINT AS cnt FROM terms GROUP BY doc_id),
         |fd AS (SELECT term, min(doc_id) AS fd FROM terms GROUP BY term),
         |ns AS (SELECT th.t, sum(CASE WHEN p.doc_id < th.t THEN p.cnt ELSE 0 END)::BIGINT AS n
         |       FROM th, pd p GROUP BY th.t),
         |vs AS (SELECT th.t, sum(CASE WHEN f.fd < th.t THEN 1 ELSE 0 END)::BIGINT AS v
         |       FROM th, fd f GROUP BY th.t),
         |xy AS (SELECT ln(n::DOUBLE) AS x, ln(v::DOUBLE) AS y
         |       FROM ns JOIN vs USING (t) WHERE n > 0 AND v > 0)
         |SELECT count(*)::BIGINT AS n_points,
         |       round(covar_pop(x, y) / var_pop(x), 4) AS slope_r,
         |       round(avg(y) - (covar_pop(x, y) / var_pop(x)) * avg(x), 4) AS intercept_r,
         |       round((covar_pop(x, y) * covar_pop(x, y)) / (var_pop(x) * var_pop(y)), 4) AS r2_r
         |FROM xy""".stripMargin
    },
    // vocab-drift twin: same recrawl-v2 construction as ft_recrawl_delta,
    // same token pipeline per version, JSD with the same zero-handling CASEs
    "text_vocab_drift" -> {
      val toks = Analyzer.sqlTokens("content")
      val pred = Analyzer.sqlStopPredicate("term", stops)
      s"""WITH old AS (SELECT doc_id, text AS content FROM documents),
         |nn AS (SELECT count(*) AS n FROM documents),
         |kept AS (SELECT doc_id,
         |           CASE WHEN doc_id % 13 = 0 THEN content || ' updated' ELSE content END AS content
         |         FROM old WHERE doc_id % 17 <> 0),
         |added AS (SELECT doc_id + (SELECT n FROM nn) AS doc_id,
         |                 'new page ' || doc_id AS content
         |          FROM old WHERE doc_id % 23 = 0),
         |newv AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
         |fa AS (SELECT term, count(*)::BIGINT AS c_old
         |       FROM (SELECT unnest($toks) AS term FROM old) WHERE $pred GROUP BY term),
         |fb AS (SELECT term, count(*)::BIGINT AS c_new
         |       FROM (SELECT unnest($toks) AS term FROM newv) WHERE $pred GROUP BY term),
         |na AS (SELECT sum(c_old)::DOUBLE AS v FROM fa),
         |nbt AS (SELECT sum(c_new)::DOUBLE AS v FROM fb),
         |u AS (SELECT coalesce(fa.term, fb.term) AS term,
         |             coalesce(fa.c_old, 0)::BIGINT AS c_old,
         |             coalesce(fb.c_new, 0)::BIGINT AS c_new
         |      FROM fa FULL OUTER JOIN fb ON fa.term = fb.term),
         |pq AS (SELECT term, c_old, c_new, c_old / na.v AS p, c_new / nbt.v AS q
         |       FROM u, na, nbt),
         |jsd AS (SELECT sum(0.5 *
         |         (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END +
         |          CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)) AS jsd
         |        FROM pq)
         |SELECT term, c_old, c_new, round(q - p, 6) AS dp_r,
         |       round(jsd.jsd, 6) AS jsd_r
         |FROM pq, jsd ORDER BY abs(q - p) DESC, term ASC LIMIT 20""".stripMargin
    },
    // topic-tag twin: same seed VALUES, BIGINT votes, argmax tie topic asc
    "text_topic_tag" -> {
      val seedVals = seedTopics.toSeq.sortBy(_._1)
        .flatMap { case (topic, ts) => ts.sorted.map(t => s"('$t', '$topic')") }
        .mkString(", ")
      s"""WITH ${termsCte}, ${postCte},
         |sd AS (SELECT * FROM (VALUES $seedVals) AS t(term, topic)),
         |h AS (SELECT p.doc_id, sd.topic, sum(p.tf)::BIGINT AS hits
         |      FROM post p JOIN sd USING (term) GROUP BY p.doc_id, sd.topic)
         |SELECT doc_id, topic, hits FROM (
         |  SELECT doc_id, topic, hits,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, topic ASC) AS rn
         |  FROM h) WHERE rn = 1""".stripMargin
    },
    // LLR twin: same 2×2 contingency and CASE-guarded cell sums, same
    // integer cross-multiplication overrepresentation gate
    "text_llr_keywords" ->
      s"""WITH ${termsCte}, ${postCte},
         |dr AS (SELECT doc_id, source AS repo FROM documents),
         |cf AS (SELECT p.term,
         |         sum(CASE WHEN d.repo = 'src0' THEN p.tf ELSE 0 END)::BIGINT AS k11,
         |         sum(CASE WHEN d.repo = 'src0' THEN 0 ELSE p.tf END)::BIGINT AS k12
         |       FROM post p JOIN dr d USING (doc_id) GROUP BY p.term),
         |tot AS (SELECT sum(k11)::BIGINT AS nf, sum(k12)::BIGINT AS nr FROM cf),
         |g AS (SELECT term, k11, k12, 2.0 * (
         |    (CASE WHEN k11 > 0 THEN k11 * ln(k11 /
         |        ((k11 + k12)::DOUBLE * nf / (nf + nr)::DOUBLE)) ELSE 0.0 END) +
         |    (CASE WHEN k12 > 0 THEN k12 * ln(k12 /
         |        ((k11 + k12)::DOUBLE * nr / (nf + nr)::DOUBLE)) ELSE 0.0 END) +
         |    (CASE WHEN nf - k11 > 0 THEN (nf - k11) * ln((nf - k11) /
         |        (((nf + nr)::DOUBLE - (k11 + k12)::DOUBLE) * nf / (nf + nr)::DOUBLE)) ELSE 0.0 END) +
         |    (CASE WHEN nr - k12 > 0 THEN (nr - k12) * ln((nr - k12) /
         |        (((nf + nr)::DOUBLE - (k11 + k12)::DOUBLE) * nr / (nf + nr)::DOUBLE)) ELSE 0.0 END)
         |  ) AS g2
         |  FROM cf, tot WHERE k11 * nr > k12 * nf)
         |SELECT row_number() OVER (ORDER BY g2 DESC, term ASC)::BIGINT AS rank,
         |       term, k11, k12, round(g2, 4) AS g2_r
         |FROM g ORDER BY g2 DESC, term ASC LIMIT 20""".stripMargin,
    // readability twin: same whitespace explode, same vowel-run syllable
    // heuristic, same ⌈w/15⌉ pseudo-sentence integer division
    "text_readability" ->
      s"""WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents),
         |wf AS (SELECT doc_id,
         |         greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)::BIGINT AS syl
         |       FROM w WHERE w <> ''),
         |a AS (SELECT doc_id, count(*)::BIGINT AS n_words, sum(syl)::BIGINT AS n_syll
         |      FROM wf GROUP BY doc_id),
         |s AS (SELECT doc_id, n_words, (n_words + 14) // 15 AS n_sent, n_syll FROM a)
         |SELECT doc_id, n_words, n_sent, n_syll,
         |       round(206.835 - 1.015 * (n_words::DOUBLE / n_sent::DOUBLE)
         |                     - 84.6 * (n_syll::DOUBLE / n_words::DOUBLE), 4) AS flesch_r
         |FROM s""".stripMargin,
    // CDC twin: same ordered token stream, same lag-shingle fingerprint,
    // same strictly-preceding cut cumsum
    "text_cdc_chunks" -> {
      val h = tokenHashSqlInner("l2 || ' ' || l1 || ' ' || term")
      s"""WITH ${tokArrCte},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
         |lg AS (SELECT doc_id, pos, term,
         |         lag(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS l2,
         |         lag(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS l1
         |       FROM tp),
         |ct AS (SELECT doc_id, pos,
         |         CASE WHEN l2 IS NULL THEN 0
         |              WHEN ($h) % 16 = 0 THEN 1 ELSE 0 END AS cut
         |       FROM lg),
         |ch AS (SELECT doc_id, coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
         |       FROM ct),
         |cl AS (SELECT doc_id, chunk_id, count(*)::BIGINT AS clen FROM ch GROUP BY doc_id, chunk_id)
         |SELECT doc_id, sum(clen)::BIGINT AS n_tokens, count(*)::BIGINT AS n_chunks,
         |       max(clen)::BIGINT AS max_chunk
         |FROM cl GROUP BY doc_id""".stripMargin
    },
    // LR twin: both GD steps unrolled — the w⁰=0 step is the σ=0.5 closed
    // form, the second replays the same join/aggregate decomposition
    "text_lr_classify" ->
      s"""WITH ${termsCte}, ${postCte},
         |lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM documents),
         |nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |w1 AS (SELECT p.term, 0.01 * sum(p.tf * (l.y - 0.5)) / (SELECT n FROM nd) AS w
         |       FROM post p JOIN lab l USING (doc_id) GROUP BY p.term),
         |z2 AS (SELECT p.doc_id, coalesce(sum(p.tf * w.w), 0.0) AS z
         |       FROM post p LEFT JOIN w1 w USING (term) GROUP BY p.doc_id),
         |p2 AS (SELECT doc_id, 1.0 / (1.0 + exp(-z)) AS p FROM z2),
         |g2 AS (SELECT p.term, sum(p.tf * (l.y - pp.p)) AS g
         |       FROM post p JOIN lab l USING (doc_id) JOIN p2 pp USING (doc_id)
         |       GROUP BY p.term),
         |w2 AS (SELECT w1.term, w1.w + 0.01 * g2.g / (SELECT n FROM nd) AS w
         |       FROM w1 JOIN g2 USING (term)),
         |zf AS (SELECT p.doc_id, coalesce(sum(p.tf * w.w), 0.0) AS z
         |       FROM post p LEFT JOIN w2 w USING (term) GROUP BY p.doc_id),
         |pf AS (SELECT doc_id, 1.0 / (1.0 + exp(-z)) AS p FROM zf)
         |SELECT pf.doc_id, round(pf.p, 4) AS p_r,
         |       (pf.p >= 0.5)::BIGINT AS pred, l.y::BIGINT AS y
         |FROM pf JOIN lab l USING (doc_id)""".stripMargin,
    // Naive Bayes twin: same train/apply hash split, same Laplace
    // fold (score = prior + Σ tf·ln(ctf+1) − dl_v·ln(T_c+V)), same
    // vocab restriction and argmax tie-break
    "text_nb_classify" ->
      s"""WITH ${termsCte}, ${postCte},
         |b AS (SELECT doc_id,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM documents),
         |tr AS (SELECT doc_id FROM b WHERE bucket < 800),
         |te AS (SELECT doc_id FROM b WHERE bucket >= 800),
         |lab AS (SELECT doc_id, source AS label FROM documents),
         |ctf AS (SELECT l.label, p.term, sum(p.tf)::BIGINT AS ctf
         |        FROM post p JOIN tr USING (doc_id) JOIN lab l USING (doc_id)
         |        GROUP BY l.label, p.term),
         |nbm AS (SELECT label, term, ln(ctf + 1.0) AS lw FROM ctf),
         |tc AS (SELECT label, sum(ctf)::BIGINT AS tc FROM ctf GROUP BY label),
         |voc AS (SELECT count(DISTINCT term)::BIGINT AS v FROM ctf),
         |pri AS (SELECT l.label, count(*)::BIGINT AS nc
         |        FROM lab l JOIN tr USING (doc_id) GROUP BY l.label),
         |ntr AS (SELECT count(*)::BIGINT AS n FROM tr),
         |cs AS (SELECT t.label, ln(p.nc::DOUBLE / n.n) AS prior_ln,
         |              ln((t.tc + voc.v)::DOUBLE) AS denom_ln
         |       FROM tc t JOIN pri p USING (label), voc, ntr n),
         |tep AS (SELECT p.* FROM post p JOIN te USING (doc_id)
         |        WHERE p.term IN (SELECT DISTINCT term FROM nbm)),
         |dlv AS (SELECT doc_id, sum(tf)::BIGINT AS dlv FROM tep GROUP BY doc_id),
         |con AS (SELECT p.doc_id, m.label, sum(p.tf * m.lw) AS s
         |        FROM tep p JOIN nbm m USING (term) GROUP BY p.doc_id, m.label),
         |sc AS (SELECT d.doc_id, c.label,
         |         c.prior_ln + coalesce(con.s, 0.0) - d.dlv * c.denom_ln AS score
         |       FROM dlv d CROSS JOIN cs c
         |       LEFT JOIN con ON con.doc_id = d.doc_id AND con.label = c.label),
         |best AS (SELECT doc_id, label, score,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
         |         FROM sc)
         |SELECT bb.doc_id, l.label AS truth, bb.label AS pred,
         |       (CASE WHEN bb.label = l.label THEN 1 ELSE 0 END)::BIGINT AS hit,
         |       round(bb.score, 4) AS score_r
         |FROM best bb JOIN lab l USING (doc_id) WHERE rn = 1""".stripMargin,
    "text_lang_id" -> {
      val langs = TextAnalysis.langMarkers.keys.toSeq.sorted
      val cnts = langs.map { l =>
        val ms = TextAnalysis.langMarkers(l).map(m => s"'$m'").mkString(", ")
        s"SELECT doc_id, '$l' AS lang, len(list_filter(tk, t -> t IN ($ms))) AS hits FROM tk"
      }.mkString("\n UNION ALL ")
      s"""WITH tk AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tk FROM documents),
         |cnt AS ($cnts),
         |r AS (SELECT doc_id, lang, hits,
         |             row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
         |      FROM cnt)
         |SELECT doc_id, CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_guess,
         |       hits::BIGINT AS marker_hits
         |FROM r WHERE rn = 1""".stripMargin
    },
    "text_quality" -> {
      val stopsIn = Analyzer.naturalStop.toSeq.sorted.map(s => s"'$s'").mkString(", ")
      s"""WITH b AS (SELECT doc_id, text,
         |  list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ws FROM documents)
         |SELECT doc_id,
         |  length(text)::BIGINT AS n_chars,
         |  len(ws)::BIGINT AS n_tokens,
         |  round(CASE WHEN len(ws) > 0 THEN
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(ws, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b)::DOUBLE / len(ws)
         |    ELSE 0.0 END, 4) AS avg_token_len_r,
         |  round(CASE WHEN len(ws) > 0 THEN
         |    len(list_filter(ws, t -> lower(t) IN ($stopsIn)))::DOUBLE / len(ws)
         |    ELSE 0.0 END, 4) AS stop_ratio_r,
         |  round(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END, 4) AS alnum_ratio_r
         |FROM b""".stripMargin
    },
    "text_token_counts" ->
      s"""SELECT doc_id,
         |  len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))::BIGINT AS ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS bpe_tokens
         |FROM documents""".stripMargin,
    // surprisal twin: same decomposition and operation order —
    // Σ −tf·ln(cf/C) per doc, divided by dl at the end
    "text_surprisal" ->
      s"""WITH ${termsCte}, ${postCte}, ${dsCte},
         |tot AS (SELECT sum(dl)::DOUBLE AS c FROM ds),
         |cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM post GROUP BY term),
         |hs AS (SELECT p.doc_id, sum(-(p.tf) * ln(f.cf / t.c)) AS hsum
         |       FROM post p JOIN cf f USING (term), tot t GROUP BY p.doc_id)
         |SELECT h.doc_id, d.dl, round(h.hsum / d.dl, 4) AS h_r
         |FROM hs h JOIN ds d USING (doc_id)""".stripMargin,
    // chunking twin: same start generation (0 by stride while < len), same
    // BERT-striding emit rule (s = 0 or previous chunk short of the end),
    // same slice bounds — RAW tokens, no stop filter
    "text_chunks" -> {
      val (w, st) = (24, 16)
      s"""WITH tk AS (SELECT doc_id,
         |  list_filter(${Analyzer.sqlTokens("text")}, t -> t <> '') AS arr FROM documents),
         |stt AS (SELECT doc_id, arr, len(arr) AS l,
         |        unnest(range(0, greatest(len(arr), 1), $st)) AS s FROM tk),
         |ch AS (SELECT doc_id, s, arr, l FROM stt WHERE s = 0 OR s - $st + $w < l)
         |SELECT doc_id, (s // $st)::BIGINT AS chunk_id, s::BIGINT AS pos,
         |       len(list_slice(arr, s + 1, least(s + $w, l)))::BIGINT AS n_tokens,
         |       array_to_string(list_slice(arr, s + 1, least(s + $w, l)), ' ') AS text
         |FROM ch""".stripMargin
    },
    // BPE twin: the 3 merge steps unrolled — same sentinel-padded double-
    // space representation, same literal replace, same (cnt desc, a, b)
    // arg-max; the gate proves every merge decision identical
    "text_bpe_merges" -> {
      val steps = 3
      def pm(i: Int, prev: String) =
        s"""pr$i AS (SELECT n, arr, unnest(range(greatest(len(arr) - 1, 0))) AS i
           |         FROM (SELECT n, regexp_split_to_array(trim(s), '  ') AS arr FROM $prev)),
           |p$i AS (SELECT arr[i + 1] AS a, arr[i + 2] AS b, sum(n)::BIGINT AS cnt
           |        FROM pr$i GROUP BY 1, 2),
           |m$i AS (SELECT $i::BIGINT AS step, a, b, cnt FROM p$i
           |        ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin
      def wn(i: Int, prev: String) =
        s"""w$i AS (SELECT n, replace(s,
           |  ' ' || (SELECT a FROM m$i) || '  ' || (SELECT b FROM m$i) || ' ',
           |  ' ' || (SELECT a FROM m$i) || (SELECT b FROM m$i) || ' ') AS s FROM $prev)""".stripMargin
      val chain = (1 to steps).map { i =>
        val prev = if (i == 1) "w0" else s"w${i - 1}"
        if (i < steps) s"${pm(i, prev)},\n${wn(i, prev)}" else pm(i, prev)
      }.mkString(",\n")
      val unions = (1 to steps)
        .map(i => s"SELECT step, a, b, cnt FROM m$i").mkString("\nUNION ALL ")
      s"""WITH tkk AS (SELECT unnest(list_filter(${Analyzer.sqlTokens("text")},
         |  t -> t <> '')) AS w FROM documents),
         |wc AS (SELECT w, count(*)::BIGINT AS n FROM tkk GROUP BY w),
         |w0 AS (SELECT n, ' ' || array_to_string(regexp_split_to_array(w, ''), '  ') || ' ' AS s
         |       FROM wc),
         |$chain
         |$unions""".stripMargin
    },
    // BPE-encode twin: the SAME unrolled 3-step merge chain, then each
    // merge applied in training order to a (word → symbols) relation and
    // the resulting token lengths joined back to word instances per doc
    "text_bpe_encode" -> {
      val steps = 3
      def pm(i: Int, prev: String) =
        s"""pr$i AS (SELECT n, arr, unnest(range(greatest(len(arr) - 1, 0))) AS i
           |         FROM (SELECT n, regexp_split_to_array(trim(s), '  ') AS arr FROM $prev)),
           |p$i AS (SELECT arr[i + 1] AS a, arr[i + 2] AS b, sum(n)::BIGINT AS cnt
           |        FROM pr$i GROUP BY 1, 2),
           |m$i AS (SELECT $i::BIGINT AS step, a, b, cnt FROM p$i
           |        ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin
      def wn(i: Int, prev: String) =
        s"""w$i AS (SELECT n, replace(s,
           |  ' ' || (SELECT a FROM m$i) || '  ' || (SELECT b FROM m$i) || ' ',
           |  ' ' || (SELECT a FROM m$i) || (SELECT b FROM m$i) || ' ') AS s FROM $prev)""".stripMargin
      def en(i: Int) =
        s"""e$i AS (SELECT w, replace(s,
           |  ' ' || (SELECT a FROM m$i) || '  ' || (SELECT b FROM m$i) || ' ',
           |  ' ' || (SELECT a FROM m$i) || (SELECT b FROM m$i) || ' ') AS s FROM e${i - 1})""".stripMargin
      val chain = (1 to steps).map { i =>
        val prev = if (i == 1) "w0" else s"w${i - 1}"
        if (i < steps) s"${pm(i, prev)},\n${wn(i, prev)}" else pm(i, prev)
      }.mkString(",\n")
      val echain = (1 to steps).map(en).mkString(",\n")
      s"""WITH tk AS (SELECT doc_id, unnest(list_filter(${Analyzer.sqlTokens("text")},
         |  t -> t <> '')) AS w FROM documents),
         |wc AS (SELECT w, count(*)::BIGINT AS n FROM tk GROUP BY w),
         |w0 AS (SELECT n, ' ' || array_to_string(regexp_split_to_array(w, ''), '  ') || ' ' AS s
         |       FROM wc),
         |$chain,
         |e0 AS (SELECT w, ' ' || array_to_string(regexp_split_to_array(w, ''), '  ') || ' ' AS s
         |       FROM wc),
         |$echain,
         |lens AS (SELECT w, len(regexp_split_to_array(trim(s), '  '))::BIGINT AS ntok FROM e$steps)
         |SELECT tk.doc_id, count(*)::BIGINT AS n_words, sum(l.ntok)::BIGINT AS n_bpe
         |FROM tk JOIN lens l USING (w) GROUP BY tk.doc_id""".stripMargin
    },
    // bigram-surprisal twin: same decomposition — instance-level
    // −ln(c_ab/c_a) summed per doc, head totals from the gram aggregate
    "text_bigram_lm" ->
      s"""WITH ${tokArrCte},
         |bigr AS (SELECT doc_id, unnest(list_transform(range(greatest(len(arr) - 1, 0)),
         |         i -> arr[i + 1] || ' ' || arr[i + 2])) AS gram FROM tokarr),
         |cab AS (SELECT gram, count(*)::BIGINT AS c_ab FROM bigr GROUP BY gram),
         |ha AS (SELECT split_part(gram, ' ', 1) AS a, sum(c_ab)::BIGINT AS c_a
         |       FROM cab GROUP BY 1),
         |hs AS (SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
         |              sum(-ln(c.c_ab / h.c_a)) AS hsum
         |       FROM bigr b JOIN cab c USING (gram)
         |            JOIN ha h ON split_part(b.gram, ' ', 1) = h.a
         |       GROUP BY b.doc_id)
         |SELECT doc_id, n_bigrams, round(hsum / n_bigrams, 4) AS h2_r FROM hs""".stripMargin,
    // Count-Min twin: the bit-identical 4×64 sketch (same mixer family,
    // same cells), min over probed cells, absent cells read 0
    // KMV twin: same hash, same distinct k-cut, same (k−1)·P/h_k estimate
    "text_kmv_shingles" -> {
      val hSql = TextHash.mixSql(5, tokenHashSqlInner("shingle"))
      s"""WITH ${shinglesCte},
         |vh AS (SELECT DISTINCT ($hSql) AS h FROM shd),
         |topk AS (SELECT h FROM vh ORDER BY h ASC LIMIT 64),
         |ag AS (SELECT count(*)::BIGINT AS k_n, max(h) AS hk FROM topk),
         |ex AS (SELECT count(DISTINCT shingle)::BIGINT AS exact FROM shd),
         |es AS (SELECT k_n,
         |         CASE WHEN k_n < 64 THEN k_n::DOUBLE
         |              ELSE 63.0 * ${TextHash.P} / hk::DOUBLE END AS est
         |       FROM ag)
         |SELECT k_n, round(est, 4) AS est_r, ex.exact,
         |       round(abs(est - ex.exact::DOUBLE) / ex.exact::DOUBLE, 4) AS err_r
         |FROM es, ex""".stripMargin
    },
    "text_fingerprint" ->
      s"""WITH b AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ws FROM documents),
         |hh AS (SELECT doc_id, list_transform(ws, t -> ${tokenHashSqlInner("t")}) AS hs FROM b)
         |SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
         |    (a, b) -> (a * 1000003 + b) % ${TextHash.P}) AS fp
         |FROM hh""".stripMargin,
    "text_redact" ->
      s"""WITH pii AS (SELECT doc_id, $piiInjectSql AS text FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${TextAnalysis.emailRe}', '<EMAIL>', 'g'),
         |    '${TextAnalysis.ipRe}', '<IP>', 'g'),
         |    '${TextAnalysis.phoneRe}', '<PHONE>', 'g') AS red,
         |  len(regexp_extract_all(text, '${TextAnalysis.emailRe}'))::BIGINT AS n_email,
         |  len(regexp_extract_all(text, '${TextAnalysis.ipRe}'))::BIGINT AS n_ip,
         |  len(regexp_extract_all(text, '${TextAnalysis.phoneRe}'))::BIGINT AS n_phone
         |FROM pii""".stripMargin,
    "text_repetition" ->
      s"""WITH ${tokArrCte},
         |g AS (SELECT doc_id, unnest(list_transform(range(greatest(len(arr) - 1, 0)),
         |  i -> arr[i + 1] || ' ' || arr[i + 2])) AS gram FROM tokarr),
         |bg AS (SELECT doc_id, count(*)::BIGINT AS c FROM g GROUP BY doc_id, gram),
         |bstat AS (SELECT doc_id, max(c) AS top_c, sum(c)::BIGINT AS n_grams FROM bg GROUP BY doc_id)
         |SELECT t.doc_id,
         |  len(arr)::BIGINT AS n_tokens,
         |  round(CASE WHEN len(arr) > 0
         |    THEN 1.0 - len(list_distinct(arr))::DOUBLE / len(arr) ELSE 0.0 END, 4) AS dup_word_frac_r,
         |  round(CASE WHEN coalesce(b.n_grams, 0) > 0
         |    THEN b.top_c::DOUBLE / b.n_grams ELSE 0.0 END, 4) AS top_bigram_frac_r,
         |  (dup_word_frac_r <= 0.7 AND top_bigram_frac_r <= 0.2) AS keep
         |FROM tokarr t LEFT JOIN bstat b USING (doc_id)""".stripMargin,
    // PMI twin — same counts, same IEEE op order:
    // ln((c_ab/nb) / ((ca/nu)*(cb/nu))), totals as whole-corpus aggregates
    "text_collocations" ->
      s"""WITH ${tokArrCte},
         |bi AS (SELECT split_part(gram, ' ', 1) AS a, split_part(gram, ' ', 2) AS b,
         |              count(*)::BIGINT AS c_ab
         |       FROM (SELECT unnest(list_transform(range(greatest(len(arr) - 1, 0)),
         |                    i -> arr[i + 1] || ' ' || arr[i + 2])) AS gram FROM tokarr)
         |       GROUP BY 1, 2 HAVING count(*) >= 5),
         |uni AS (SELECT t, count(*)::BIGINT AS c
         |        FROM (SELECT unnest(arr) AS t FROM tokarr) GROUP BY t),
         |tot AS (SELECT sum(len(arr))::DOUBLE AS nu,
         |               sum(greatest(len(arr) - 1, 0))::DOUBLE AS nb FROM tokarr)
         |SELECT a, b, c_ab, round(pmi, 4) AS pmi_r FROM (
         |  SELECT bi.a, bi.b, bi.c_ab,
         |         ln((bi.c_ab / t.nb) / ((ua.c / t.nu) * (ub.c / t.nu))) AS pmi
         |  FROM bi JOIN uni ua ON bi.a = ua.t JOIN uni ub ON bi.b = ub.t, tot t
         |) ORDER BY pmi DESC, a ASC, b ASC LIMIT 50""".stripMargin,
    "text_keywords" ->
      s"""WITH ${termsCte}, ${postCte}, ${tstatsCte},
         |kw AS (SELECT doc_id, term,
         |              tf * ln((SELECT count(*) FROM documents)::DOUBLE / df) AS wt
         |       FROM post JOIN tstats USING (term) WHERE df >= 2),
         |rk AS (SELECT doc_id, term, wt,
         |              row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, term ASC) AS kw_rank
         |       FROM kw)
         |SELECT doc_id, kw_rank, term, round(wt, 4) AS wt_r FROM rk WHERE kw_rank <= 5""".stripMargin,
    // boilerplate twin: within-site shingle df, per-doc boiler fraction
    "text_boilerplate" ->
      s"""WITH ${shinglesCte},
         |sh2 AS (SELECT s.doc_id, d.source AS repo, s.shingle
         |        FROM shd s JOIN documents d USING (doc_id)),
         |sdf AS (SELECT repo, shingle, count(*)::BIGINT AS site_df
         |        FROM sh2 GROUP BY 1, 2)
         |SELECT doc_id, count(*)::BIGINT AS n_shingles,
         |       sum(CASE WHEN site_df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
         |       round(sum(CASE WHEN site_df >= 2 THEN 1 ELSE 0 END)::DOUBLE
         |             / count(*), 4) AS boiler_r
         |FROM sh2 JOIN sdf USING (repo, shingle)
         |GROUP BY doc_id""".stripMargin
  )
}
