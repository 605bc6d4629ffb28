package graft.index

import graft.analyze.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The three index artifacts the north star names, as pure batch
  * aggregations (replacing the reference's per-page read-modify-write under
  * global locks, /root/reference/src/main/java/searchengine/services/
  * IndexingServiceImpl.java:138-193):
  *
  *   - postings  (term, doc_id, tf)   ≙ reference `index` table (tf = rank)
  *   - termStats (term, df)           ≙ reference `lemma` table (df = frequency)
  *   - docStats  (doc_id, dl)         — BM25 document length (post-stop tokens)
  *
  * All are hash aggregates with map-side partial aggregation; no UDFs on the
  * hot path (tokenization is a codegen'd Column chain, Analyzer.tokensCol).
  */
object InvertedIndex {

  /** Per-lang stop set as a Column CASE chain (constant-folded per branch).
    * Corpora with a single effective stop set collapse to one branch.
    * `lang = "ru"` dispatches to the Cyrillic analyzer (the reference's
    * actual domain: ё-fold + [а-яА-ЯёЁ ] class, Lemmatizator.java:1). */
  def termsForLang(text: Column, lang: Column): Column = {
    val allLangSets = Analyzer.codeStop
    val base = allLangSets.foldRight(Analyzer.termsCol(text, Analyzer.naturalStop)) {
      case ((l, stops), elseCol) =>
        when(lang === lit(l), Analyzer.termsCol(text, stops)).otherwise(elseCol)
    }
    when(lang === lit("ru"), Analyzer.termsColRu(text)).otherwise(base)
  }

  /** Exploded token stream: (doc_id, repo, term). Column pruning keeps the
    * parquet scan at (doc_id, source, lang, text) only.
    *
    * A non-empty lexicon enables the reference's 1→N normal-form expansion
    * (luceneMorph.getNormalForms analog, SURVEY.md §2.3 T4) via a
    * broadcast-captured UDF — index-build-time only, never on the query
    * hot path; the default (empty lexicon) stays fully codegen'd. */
  def tokens(corpus: DataFrame,
             lexicon: Analyzer.Lexicon = Analyzer.emptyLexicon): DataFrame = {
    val arr = termsForLang(col("content"), col("lang"))
    val expanded =
      if (lexicon.isEmpty) arr
      else {
        val expand = udf((ts: Seq[String]) =>
          if (ts == null) Seq.empty[String]
          else ts.flatMap(Analyzer.normalForms(_, lexicon)))
        expand(arr)
      }
    corpus.select(col("doc_id"), col("repo"), explode(expanded).as("term"))
  }

  /** Per-LANGUAGE 1→N expansion: each row's tokens expand through the
    * lexicon registered for its `lang` (`default` covers unregistered
    * langs) — the reference picks its morphology dictionary by language
    * (RussianLuceneMorphology for ru; SearcherPage.java:39 query side,
    * IndexingServiceImpl.java:144-155 index side). All-empty lexicons keep
    * the fully codegen'd path; the UDF is index-build-time only. */
  def tokensByLang(corpus: DataFrame, byLang: Map[String, Analyzer.Lexicon],
                   default: Analyzer.Lexicon = Analyzer.emptyLexicon): DataFrame = {
    if (byLang.values.forall(_.isEmpty) && default.isEmpty) return tokens(corpus)
    val arr = termsForLang(col("content"), col("lang"))
    val expand = udf((lang: String, ts: Seq[String]) => {
      val lex = byLang.getOrElse(lang, default)
      if (ts == null) Seq.empty[String]
      else if (lex.isEmpty) ts
      else ts.flatMap(Analyzer.normalForms(_, lex))
    })
    corpus.select(col("doc_id"), col("repo"),
      explode(expand(col("lang"), arr)).as("term"))
  }

  /** tf per (doc, term) — reference A1 (`counterWord`, Lemmatizator.java:1),
    * as one shuffle-partial hash aggregate. */
  def postings(tokens: DataFrame): DataFrame =
    tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** df per term — reference A2 (IndexingServiceImpl.java:171-193) without
    * the lock-serialized increments: distinct (doc,term) then count.
    * Implemented as a two-level aggregate so the wide distinct is partial
    * on the map side. */
  def termStats(tokens: DataFrame): DataFrame =
    tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** Approximate df via HyperLogLog++ (Heule et al. 2013; Spark's
    * `approx_count_distinct`) — the sketch path for term statistics when
    * exact distinct state is the bottleneck: at 10^12 docs the exact df
    * needs the full (term, doc) pre-distinct shuffle, while the sketch
    * holds a FIXED-size register set per term that merges associatively —
    * so it also composes with streaming/incremental maintenance, where
    * exact df needs the whole signed-delta machinery
    * (IncrementalIndex.termStats) and a sketch just unions. `rsd` is the
    * target relative standard deviation (Spark default 0.05). Approximate
    * values are engine-specific (register hashing differs per
    * implementation), so this is deliberately NOT oracle-gated — IndexSpec
    * bounds its relative error against the exact df instead. */
  def termStatsApprox(tokens: DataFrame, rsd: Double = 0.05): DataFrame =
    tokens.groupBy("term")
      .agg(approx_count_distinct(col("doc_id"), rsd).as("df_approx"))

  /** df scoped per repo — the reference's per-site lemma table key
    * (site FK on `lemma`, model/Lemma.java:24-27). */
  def termStatsByRepo(tokens: DataFrame): DataFrame =
    tokens.select("repo", "doc_id", "term").distinct()
      .groupBy("repo", "term").agg(count(lit(1)).as("df"))

  /** Document length (post-stop token count) for BM25 normalization. */
  def docStats(tokens: DataFrame): DataFrame =
    tokens.groupBy("doc_id").agg(count(lit(1)).as("dl"))

  case class Tables(postings: DataFrame, termStats: DataFrame, docStats: DataFrame,
                    nDocs: Long, avgDl: Double)

  /** Postings-centric build: the exploded token stream is consumed EXACTLY
    * once (by the tf aggregate); docStats (dl = Σtf) and termStats (df =
    * row count per term) derive from the much smaller postings relation,
    * which is cached serialized. Caching the raw exploded tokens instead
    * costs ~5× the memory and the GC pressure anti-scales at high core
    * counts. */
  def build(corpus: DataFrame, cacheTokens: Boolean = true,
            knownNDocs: Long = -1L,
            lexicons: Map[String, Analyzer.Lexicon] = Map.empty,
            defaultLexicon: Analyzer.Lexicon = Analyzer.emptyLexicon): Tables = {
    // The tf aggregate keeps its map-side partial combine (exchange on
    // (doc_id, term)), then ONE extra postings-sized repartition lands the
    // cached relation on HashPartitioning(doc_id). Everything downstream
    // that clusters on doc_id — the dl aggregate below, the docStats join
    // on the encode path, every BM25 docStats join — now satisfies its
    // distribution straight off the cache, removing two exchanges and two
    // stage barriers per consumer (the round-4 Amdahl serial cost lived in
    // exactly those barriers).
    val p = postings(tokensByLang(corpus, lexicons, defaultLexicon))
      .repartition(col("doc_id"))
    val pc = if (cacheTokens)
      p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else p
    val ts = pc.groupBy("term").agg(count(lit(1)).as("df"))
    val ds = pc.groupBy("doc_id").agg(sum("tf").as("dl"))
    // one extra count job only when the caller can't supply N (generated
    // corpora know their size; parquet counts are metadata-fast anyway)
    val nDocs = if (knownNDocs >= 0) knownNDocs else corpus.count()
    // empty/fully-gated corpus: avg over zero rows is NULL, not a crash
    val avgRow = ds.agg(avg(col("dl"))).head()
    val avgDl = if (avgRow.isNullAt(0)) 0.0 else avgRow.getDouble(0)
    Tables(pc, ts, ds, nDocs, avgDl)
  }
}
