package graft.textan

import graft.analyze.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators a training-data pipeline runs over every
  * document: language ID, quality scoring, token counting, fingerprinting.
  * All pure Column chains (codegen'd, no UDF) with DuckDB-SQL twins in
  * SparkEntry.oracleSql.
  */
object TextAnalysis {

  /** marker words per language for the heuristic language-ID; kept tiny and
    * deterministic (the real-world version would load n-gram profiles — the
    * *shape* is the same: broadcast profile, one scan, argmax). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  private def markerCount(tokens: Column, lang: String): Column =
    size(filter(tokens, t => t.isin(langMarkers(lang).map(x => x: Any): _*)))

  /** (doc_id, lang_guess, marker_hits) — argmax marker count, ties by
    * language code asc, no markers ⇒ 'und'. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = split(lower(col("content")), "\\s+")
    val langs = langMarkers.keys.toSeq.sorted
    val counts = langs.map(l => markerCount(toks, l).as(s"c_$l"))
    val withCounts = docs.select(col("doc_id") +: counts: _*)
    val best = langs.map(l => struct(col(s"c_$l").as("hits"), lit(l).as("lang")))
      .reduce((a, b) => when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    withCounts.select(col("doc_id"),
      when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und")).as("lang_guess"),
      best.getField("hits").cast("long").as("marker_hits"))
  }

  /** Seed-lexicon topic tagging — the weak-supervision labeling move of a
    * training-data pipeline (Snorkel-style labeling functions, Ratner et
    * al. 2017; each topic is a keyword labeling function and the tag is
    * the argmax vote): per doc, per topic, hits = Σ tf over that topic's
    * seed terms — pure BIGINT, so the argmax has no float edge; ties break
    * topic-name asc; docs hitting no topic are absent (unlabeled pool).
    * Scale shape: ONE postings scan IN-filtered to the union of seed terms
    * (pushed to the scan), a broadcast seed→topic join, a (doc, topic)
    * aggregate, and a per-doc top-1 window over ≤ |topics| rows. */
  def topicTag(postings: DataFrame, topics: Map[String, Seq[String]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topics.nonEmpty && topics.values.forall(_.nonEmpty))
    val spark = postings.sparkSession
    import spark.implicits._
    val seeds = topics.toSeq.flatMap { case (topic, ts) => ts.map(t => (t, topic)) }
      .toDF("term", "topic")
    val all = topics.values.flatten.toSeq.distinct
    postings.filter(col("term").isin(all.map(x => x: Any): _*))
      .join(broadcast(seeds), "term")
      .groupBy("doc_id", "topic").agg(sum("tf").as("hits"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("hits"), asc("topic"))))
      .filter(col("rn") === 1)
      .select("doc_id", "topic", "hits")
  }

  /** quality features: (doc_id, n_chars, n_tokens, avg_token_len_r,
    * stop_ratio_r, alnum_ratio_r) — the length/punct/stopword-ratio scores
    * used for corpus filtering. Ratios rounded to 4dp for oracle parity. */
  def quality(docs: DataFrame): DataFrame = {
    val ws = filter(split(col("content"), "\\s+"), t => length(t) > 0)
    val stops = Analyzer.naturalStop.toSeq.sorted
    docs.select(
      col("doc_id"),
      length(col("content")).cast("long").as("n_chars"),
      size(ws).cast("long").as("n_tokens"),
      round(
        when(size(ws) > 0,
          aggregate(ws, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ws))
          .otherwise(lit(0.0)), 4).as("avg_token_len_r"),
      round(
        when(size(ws) > 0,
          size(filter(ws, t => lower(t).isin(stops.map(x => x: Any): _*))).cast("double") / size(ws))
          .otherwise(lit(0.0)), 4).as("stop_ratio_r"),
      round(
        when(length(col("content")) > 0,
          length(regexp_replace(col("content"), "[^A-Za-z0-9]", "")).cast("double") / length(col("content")))
          .otherwise(lit(0.0)), 4).as("alnum_ratio_r"))
  }

  /** token counting two ways: whitespace tokens and a BPE-ish pre-token
    * count (letter runs | digit runs | single non-alnum-non-space), the
    * standard GPT-style pre-tokenizer shape. */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val ws = filter(split(col("content"), "\\s+"), t => length(t) > 0)
    val bpeish = regexp_extract_all(col("content"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    docs.select(col("doc_id"),
      size(ws).cast("long").as("ws_tokens"),
      size(bpeish).cast("long").as("bpe_tokens"))
  }

  /** rolling document fingerprint: polynomial fold (base 1000003 mod
    * 2^31−1) over per-token TextHash values, order-sensitive — equal
    * fingerprints ⇔ (whp) equal token sequences. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val ws = filter(split(col("content"), "\\s+"), t => length(t) > 0)
    val hashes = transform(ws, t => TextHash.tokenHashCol(t))
    docs.select(col("doc_id"),
      aggregate(hashes, lit(0L), (acc, h) => (acc * 1000003L + h) % lit(TextHash.P)).as("fp"))
  }

  /** pure-Scala twin of fingerprint (oracle/tests) */
  def fingerprintS(content: String): Long =
    content.split("\\s+").filter(_.nonEmpty)
      .foldLeft(0L)((acc, t) => (acc * 1000003L + TextHash.tokenHash(t)) % TextHash.P)

  // PII patterns kept RE2-compatible (no lookarounds, no backrefs) so the
  // DuckDB twin runs the IDENTICAL strings — one source of truth per pattern
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+\\d{7,15}"

  /** PII redaction — the scrub pass every training-data pipeline runs
    * before anything leaves the raw zone: emails / IPv4 addresses /
    * international phone numbers replaced by typed placeholders, with
    * per-doc match counts for the audit trail. Pure codegen'd
    * regexp_replace/regexp_count chain (one scan, no UDF); counts are
    * measured on the ORIGINAL text so the audit is independent of
    * replacement order. Returns (doc_id, red, n_email, n_ip, n_phone). */
  def redactPii(docs: DataFrame): DataFrame = {
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(col("content"), emailRe, "<EMAIL>"),
        ipRe, "<IP>"),
      phoneRe, "<PHONE>")
    docs.select(col("doc_id"), red.as("red"),
      regexp_count(col("content"), lit(emailRe)).cast("long").as("n_email"),
      regexp_count(col("content"), lit(ipRe)).cast("long").as("n_ip"),
      regexp_count(col("content"), lit(phoneRe)).cast("long").as("n_phone"))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021, app. A1.1 —
    * the repetition rules used to drop boilerplate/spam docs):
    * dup_word_frac = 1 − distinct/total tokens, top_bigram_frac = count of
    * the single most frequent word 2-gram / total 2-grams; `keep` applies
    * both thresholds to the ROUNDED values (cross-engine-stable booleans).
    *
    * Scale shape: token stats come from array functions on the analyzed
    * token array (no explode); only the 2-gram mode needs an explode +
    * (doc_id, gram) hash aggregate — partial aggregation absorbs repetitive
    * docs map-side, which is exactly the skew this operator hunts. */
  def repetition(docs: DataFrame, dupWordMax: Double = 0.7,
                 topBigramMax: Double = 0.2): DataFrame = {
    val base = docs.select(col("doc_id"),
      Analyzer.termsCol(col("content"), Analyzer.naturalStop).as("arr"))
    val idxs = when(size(col("arr")) >= 2, sequence(lit(0), size(col("arr")) - 2))
      .otherwise(expr("array()").cast("array<int>"))
    val grams = base.select(col("doc_id"), explode(
      transform(idxs, i => concat_ws(" ",
        element_at(col("arr"), i + 1), element_at(col("arr"), i + 2)))).as("gram"))
    val bg = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_c"), sum("c").as("n_grams"))
    base.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("arr")).cast("long").as("n_tokens"),
        round(when(size(col("arr")) > 0,
          lit(1.0) - size(array_distinct(col("arr"))).cast("double") / size(col("arr")))
          .otherwise(lit(0.0)), 4).as("dup_word_frac_r"),
        round(when(coalesce(col("n_grams"), lit(0L)) > 0,
          col("top_c").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)), 4).as("top_bigram_frac_r"))
      .withColumn("keep",
        col("dup_word_frac_r") <= dupWordMax && col("top_bigram_frac_r") <= topBigramMax)
  }

  /** PMI collocations (Church & Hanks 1990): adjacent word pairs whose
    * co-occurrence beats the independence assumption —
    * pmi = ln( (c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)) ) over the analyzed
    * (stop-filtered) token stream. The standard phrase-discovery pass a
    * pipeline runs before query segmentation or vocabulary building.
    *
    * Scale shape: one explode → (a, b) hash aggregate for bigram counts
    * (map-side partials absorb Zipf-head pairs), one explode → unigram
    * aggregate, and the two corpus totals as broadcast 1-row aggregates.
    * `minCount` prunes the long tail BEFORE the unigram joins, so the join
    * input is the (small) candidate set, not the bigram universe. Returns
    * top-k by (pmi desc, a asc, b asc). */
  def collocations(docs: DataFrame, minCount: Long = 5L, k: Int = 50): DataFrame = {
    val base = docs.select(col("doc_id"),
      Analyzer.termsCol(col("content"), Analyzer.naturalStop).as("arr"))
    val idxs = when(size(col("arr")) >= 2, sequence(lit(0), size(col("arr")) - 2))
      .otherwise(expr("array()").cast("array<int>"))
    val bi = base.select(explode(transform(idxs, i => concat_ws(" ",
        element_at(col("arr"), i + 1), element_at(col("arr"), i + 2)))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .select(split(col("gram"), " ").getItem(0).as("a"),
        split(col("gram"), " ").getItem(1).as("b"), col("c_ab"))
    val uni = base.select(explode(col("arr")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val totals = base.agg(
      sum(size(col("arr"))).cast("double").as("nu"),
      sum(greatest(size(col("arr")) - 1, lit(0))).cast("double").as("nb"))
    val pmi = log((col("c_ab") / col("nb")) /
      ((col("ca") / col("nu")) * (col("cb") / col("nu"))))
    val scored = bi
      .join(uni.withColumnRenamed("t", "a").withColumnRenamed("c", "ca"), "a")
      .join(uni.withColumnRenamed("t", "b").withColumnRenamed("c", "cb"), "b")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", pmi)
    scored.orderBy(desc("pmi"), asc("a"), asc("b")).limit(k)
      .select(col("a"), col("b"), col("c_ab"), col("pmi"))
  }

  /** Vocabulary drift between two corpus versions — the recrawl QA monitor:
    * per-term probability shift Δp = p_new − p_old over the analyzed token
    * stream, plus the corpus-level Jensen-Shannon divergence (natural-log
    * base) attached to every row. Top-k terms by |Δp| (ties term asc) is
    * the "what changed" report; JSD is the alarm threshold a pipeline pages
    * on when a recrawl or extractor change silently shifts the language
    * distribution.
    *
    * Scale shape: one explode + term hash aggregate per version, a
    * full-outer join on term (union vocabulary), totals and the JSD as
    * broadcast 1-row aggregates. Zero-probability sides contribute only
    * through the other distribution (the JSD zero-handling CASE), so the
    * union join needs no densification. */
  def vocabDrift(oldDocs: DataFrame, newDocs: DataFrame, k: Int = 20): DataFrame = {
    def counts(d: DataFrame) =
      d.select(explode(Analyzer.termsCol(col("content"), Analyzer.naturalStop)).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
    val a = counts(oldDocs).withColumnRenamed("c", "c_old")
    val b = counts(newDocs).withColumnRenamed("c", "c_new")
    val na = a.agg(sum("c_old").cast("double").as("na"))
    val nb = b.agg(sum("c_new").cast("double").as("nb"))
    val u = a.join(b, Seq("t"), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("p", col("c_old") / col("na"))
      .withColumn("q", col("c_new") / col("nb"))
    val m = (col("p") + col("q")) / lit(2.0)
    val contrib = lit(0.5) *
      (when(col("p") > 0, col("p") * log(col("p") / m)).otherwise(lit(0.0)) +
       when(col("q") > 0, col("q") * log(col("q") / m)).otherwise(lit(0.0)))
    val jsd = u.agg(sum(contrib).as("jsd"))
    u.orderBy(abs(col("q") - col("p")).desc, col("t").asc).limit(k)
      .crossJoin(broadcast(jsd))
      .select(col("t").as("term"), col("c_old"), col("c_new"),
        (col("q") - col("p")).as("dp"), col("jsd"))
  }

  /** Distinctive-term report for a FOCUS sub-corpus against the rest —
    * Dunning's log-likelihood ratio (Dunning 1993, "Accurate Methods for
    * the Statistics of Surprise and Coincidence" — public literature), the
    * standard corpus-comparison keyword statistic: per term, the 2×2
    * contingency of token counts (term/other × focus/rest) scores
    * G² = 2·Σ_cells k·ln(k/E), E the independence expectation — unlike raw
    * frequency ratios, G² is calibrated for rare terms (a χ²-distributed
    * surprise). The domain-fingerprint move of a mixture pipeline: "what
    * vocabulary makes this source different from the pile".
    *
    * Only terms OVERREPRESENTED in focus are returned, gated by the
    * integer cross-multiplication k11·Nrest > k12·Nfocus (no float in the
    * gate). Scale shape: one postings⋈docRepo aggregate (vocabulary-
    * bounded output), totals as a broadcast 1-row aggregate, a closed-form
    * per-row score, and a top-k heap — no second corpus pass. */
  def llrKeywords(postings: DataFrame, docRepo: DataFrame, focus: String,
                  k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cf = postings.join(docRepo, "doc_id")
      .groupBy("term")
      .agg(sum(when(col("repo") === focus, col("tf")).otherwise(lit(0L))).as("k11"),
        sum(when(col("repo") === focus, lit(0L)).otherwise(col("tf"))).as("k12"))
    val tot = cf.agg(sum("k11").as("nf"), sum("k12").as("nr"))
    def cell(kc: Column, e: Column): Column =
      when(kc > 0L, kc.cast("double") * log(kc.cast("double") / e))
        .otherwise(lit(0.0))
    cf.crossJoin(broadcast(tot))
      .filter(col("k11") * col("nr") > col("k12") * col("nf"))
      .withColumn("n", (col("nf") + col("nr")).cast("double"))
      .withColumn("row1", (col("k11") + col("k12")).cast("double"))
      .withColumn("g2", lit(2.0) * (
        cell(col("k11"), col("row1") * col("nf") / col("n")) +
        cell(col("k12"), col("row1") * col("nr") / col("n")) +
        cell(col("nf") - col("k11"),
          (col("n") - col("row1")) * col("nf") / col("n")) +
        cell(col("nr") - col("k12"),
          (col("n") - col("row1")) * col("nr") / col("n"))))
      .orderBy(desc("g2"), asc("term")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("g2"), asc("term"))).cast("long"))
      .select("rank", "term", "k11", "k12", "g2")
  }

  /** Per-document unigram surprisal: mean negative log-likelihood of the
    * doc's tokens under the CORPUS unigram language model,
    * H(d) = −Σ_t tf_{t,d}·ln(cf_t/C) / dl_d — the model-free stand-in for
    * the perplexity filter CCNet-style training pipelines run (Wenzek 2020,
    * public literature). Boilerplate and template docs score LOW (their
    * tokens are corpus-frequent); rare-token gibberish scores HIGH; both
    * tails are curation candidates, and the score needs no trained model —
    * the corpus is its own LM.
    *
    * Scale shape: the collection frequencies are one postings aggregate
    * (vocabulary-sized, co-partitioned with the postings on term so the
    * join reuses the exchange), the corpus total is a broadcast 1-row
    * aggregate, and the per-doc sum is one hash aggregate over the
    * postings — no per-doc arrays, no second tokenization. */
  def surprisal(postings: DataFrame, docStats: DataFrame): DataFrame = {
    val cf = postings.groupBy("term").agg(sum("tf").as("cf"))
    val tot = docStats.agg(sum("dl").cast("double").as("c"))
    postings.join(cf, "term")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(sum(-col("tf") * log(col("cf") / col("c"))).as("hsum"))
      .join(docStats, "doc_id")
      .select(col("doc_id"), col("dl"), (col("hsum") / col("dl")).as("h"))
  }

  /** Per-document BIGRAM surprisal: mean −ln p(w_i | w_{i−1}) under the
    * corpus's own bigram MLE, p(b|a) = c(a b) / c(a ·) — the second-order
    * companion of [[surprisal]]: a doc of individually common words in
    * UNUSUAL order (shuffled/templated spam, word-salad SEO text) scores
    * high here while its unigram surprisal stays low. MLE never hits a zero
    * because every scored bigram is in the corpus that defines the model.
    * Docs with fewer than two analyzed tokens have no bigrams and are
    * absent from the output.
    *
    * Scale shape: one bigram explode; c(a b) is one hash aggregate; the
    * head totals c(a ·) derive from THAT aggregate (vocabulary²-bounded,
    * not instance-bounded); instances join both on their gram key —
    * Zipf-head grams absorbed map-side. No per-doc arrays survive the
    * explode. */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      Analyzer.termsCol(col("content"), Analyzer.naturalStop).as("arr"))
    val idxs = when(size(col("arr")) >= 2, sequence(lit(0), size(col("arr")) - 2))
      .otherwise(expr("array()").cast("array<int>"))
    val inst = base.select(col("doc_id"), explode(transform(idxs, i => concat_ws(" ",
      element_at(col("arr"), i + 1), element_at(col("arr"), i + 2)))).as("gram"))
    val cAb = inst.groupBy("gram").agg(count(lit(1)).as("c_ab"))
    val heads = cAb.select(split(col("gram"), " ").getItem(0).as("a"), col("c_ab"))
      .groupBy("a").agg(sum("c_ab").as("c_a"))
    inst.join(cAb, "gram")
      .withColumn("a", split(col("gram"), " ").getItem(0))
      .join(heads, "a")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(-log(col("c_ab") / col("c_a"))).as("hsum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("hsum") / col("n_bigrams")).as("h2"))
  }

  /** Overlapping token-window chunking — the context-window prep step of a
    * training/RAG pipeline ("split every doc into ≤`window`-token pieces
    * with `window − stride` tokens of overlap"). Chunk starts advance by
    * `stride`; a start is emitted iff it is 0 or the PREVIOUS chunk did not
    * already reach the document's end (start − stride + window < len), so
    * the last chunk is the only short one and no chunk is fully contained
    * in its predecessor (the BERT striding rule). Raw tokens, NOT
    * stop-filtered — chunks feed a model, not an index. An empty doc
    * yields one empty chunk (the doc stays representable downstream).
    *
    * Scale shape: map-only — tokenize, generate ≤ len/stride starts per
    * doc, slice; output rows ≈ corpus tokens / stride with zero shuffles,
    * and chunk_id is derived from the start offset so ids need no window
    * function. */
  def chunk(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window)
    docs.select(col("doc_id"), Analyzer.tokensCol(col("content")).as("_arr"))
      .withColumn("_len", size(col("_arr")))
      .withColumn("start", explode(filter(
        sequence(lit(0), greatest(col("_len") - 1, lit(0)), lit(stride)),
        s => (s === 0) || (s - stride + window < col("_len")))))
      .withColumn("_chunk", slice(col("_arr"), col("start") + 1, lit(window)))
      .select(col("doc_id"), (col("start") / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("pos"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        array_join(col("_chunk"), " ").as("text"))
  }

  /** Within-site BOILERPLATE score: the fraction of a doc's distinct
    * n-gram shingles that recur across ≥ `minSiteDf` documents of the SAME
    * site (nav bars, footers, license headers — the text a site stamps on
    * every page). Cross-site line dedup (C4's rule, `dedup_segments`)
    * misses boilerplate unique to one site; this is the within-site
    * complement (Gibson/Punera/Tomkins 2005, "The volume and evolution of
    * web page templates" — public literature). A training pipeline drops
    * or down-weights docs whose boiler_r is high: their token mass is
    * template, not content.
    *
    * Scale shape: shingle → (repo, shingle) df aggregate (shuffle on the
    * shingle key, map-side partials absorb hot shingles) → co-partitioned
    * join back → per-doc aggregate. |sites| is immaterial; nothing pairs. */
  def boilerplate(docs: DataFrame, n: Int = 3, minSiteDf: Long = 3L): DataFrame = {
    val sh = graft.dedup.Dedup.shingles(docs, n)
      .join(docs.select(col("doc_id"), col("repo")), "doc_id")
    val siteDf = sh.groupBy("repo", "shingle")
      .agg(count(lit(1)).as("site_df"))
    sh.join(siteDf, Seq("repo", "shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("site_df") >= minSiteDf, lit(1L)).otherwise(lit(0L)))
          .as("n_boiler"))
      .withColumn("boiler_r", round(
        col("n_boiler").cast("double") / col("n_shingles").cast("double"), 4))
  }

  /** Content-defined chunking (Muthitacharoen, Chen & Mazières, LBFS SOSP
    * 2001; FastCDC — public literature): cut the token stream where a
    * rolling fingerprint of the last `w` tokens hits 0 mod `mask`, so
    * chunk boundaries are CONTENT-anchored — an insertion early in a page
    * shifts every fixed-window chunk but only the one CDC chunk it lands
    * in. This is the chunking a 100 TB dedup/RAG pipeline wants under
    * recrawls: stable chunk fingerprints across edits.
    *
    * A cut at position i ends the chunk AT i; the fingerprint is the
    * cross-engine TextHash of the w-token shingle ending at i (defined for
    * i ≥ w−1). Per doc: (n_tokens, n_chunks, max_chunk) — expected chunk
    * length ≈ mask.
    *
    * Scale shape: one posexplode + two windows PARTITIONED ON doc_id (the
    * same per-doc shuffle every positional operator pays) + two
    * aggregates; nothing cross-doc. */
  def cdcChunks(corpus: DataFrame, mask: Int = 16): DataFrame = {
    import graft.textan.TextHash
    import org.apache.spark.sql.expressions.Window
    val tp = graft.index.Positional.tokenPositions(corpus)
    val ww = Window.partitionBy("doc_id").orderBy(asc("pos"))
    val cut = when(lag(col("term"), 2).over(ww).isNotNull &&
      TextHash.tokenHashCol(concat_ws(" ",
        lag(col("term"), 2).over(ww), lag(col("term"), 1).over(ww),
        col("term"))) % mask === 0, lit(1L)).otherwise(lit(0L))
    val chunked = tp.withColumn("cut", cut)
      .withColumn("chunk_id", coalesce(sum("cut").over(
        ww.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    chunked.groupBy("doc_id", "chunk_id").agg(count(lit(1)).as("clen"))
      .groupBy("doc_id")
      .agg(sum("clen").as("n_tokens"), count(lit(1)).as("n_chunks"),
        max("clen").as("max_chunk"))
  }

  /** Flesch reading-ease (Flesch 1948; Kincaid et al. 1975 — public
    * literature) as a per-doc quality signal:
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * Syllables by the standard vowel-group heuristic (count of maximal
    * [aeiouy]+ runs, min 1 per word). The synthetic corpus carries no
    * sentence punctuation, so sentences are the fixed pseudo-sentence
    * convention ⌈words/15⌉ — integer arithmetic both engines floor
    * identically; real corpora pass a punctuation-derived sentence count
    * instead (the formula is the operator; the splitter is an input).
    *
    * Scale shape: one explode → per-doc aggregate with map-side partials;
    * the vowel-run count is a codegen'd regexp over each token — no
    * corpus-sized join anywhere. */
  def readability(docs: DataFrame, wordsPerSentence: Int = 15): DataFrame = {
    val words = docs.select(col("doc_id"),
        explode(split(col("content"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("syl", greatest(
        size(expr("regexp_extract_all(w, '[aeiouy]+', 0)")).cast("long"), lit(1L)))
    words.groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("syl").as("n_syll"))
      .withColumn("n_sent",
        expr(s"(n_words + ${wordsPerSentence - 1}) div $wordsPerSentence"))
      .withColumn("flesch_r", round(
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sent").cast("double"))
          - lit(84.6) * (col("n_syll").cast("double") / col("n_words").cast("double")), 4))
      .select("doc_id", "n_words", "n_sent", "n_syll", "flesch_r")
  }
}
