package graft

import graft.analyze.Analyzer
import graft.corpus.Corpus
import graft.index.{IndexWriter, InvertedIndex, ShardPosting}
import graft.query.{Bm25, QueryFrontend, Search, Wand}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry runs over the driver-provided parquet tables in
  * `sfDir` (documents/embeddings/...), and every `oracleSql` entry is the
  * ANSI-SQL equivalent DuckDB runs over the same files. Column names are
  * aligned pairwise (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  // ---- shared fixed fixtures (deterministic; FIXTURES.md §3) ------------
  /** stop set effective for the documents corpus (natural langs only) */
  private val stops = Analyzer.naturalStop
  /** fixed reference queries over the documents vocabulary */
  val q2 = Seq("join", "spark")           // 2-term conjunction
  val q3 = Seq("dup", "hash", "spark")    // rare + hot conjunction
  val qMissingInput = "spark warpdrive flux" // terms absent from corpus

  // ---- DuckDB SQL building blocks --------------------------------------
  private def termsCte: String = {
    val toks = Analyzer.sqlTokens("text")
    val pred = Analyzer.sqlStopPredicate("term", stops)
    s"""toks AS (SELECT doc_id, source AS repo, unnest($toks) AS term FROM documents),
       |terms AS (SELECT doc_id, repo, term FROM toks WHERE $pred)""".stripMargin
  }
  private def postCte =
    "post AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term)"
  private def dsCte =
    "ds AS (SELECT doc_id, count(*)::BIGINT AS dl FROM terms GROUP BY doc_id)"
  private def tstatsCte =
    "tstats AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms GROUP BY term)"
  private def statsCte =
    "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, (SELECT avg(dl) FROM ds) AS avgdl)"
  private def qCte(terms: Seq[String]) =
    s"q AS (SELECT unnest(ARRAY[${terms.map(t => s"'$t'").mkString(",")}]) AS term)"

  private def bm25TopKSql(terms: Seq[String], k: Int): String = {
    val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
    s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(terms)},
       |scored AS (
       |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
       |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
       |       JOIN ds d ON p.doc_id = d.doc_id, stats s
       |  GROUP BY p.doc_id
       |)
       |SELECT rank, doc_id, score_r FROM (
       |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       |         doc_id, round(score, 4) AS score_r
       |  FROM scored WHERE n_terms = ${terms.size}
       |) WHERE rank <= $k""".stripMargin
  }

  // ---- corpus + index (built lazily per sfDir, cached per session) ------
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, InvertedIndex.Tables)]()
  def index(spark: SparkSession, sfDir: String): (DataFrame, InvertedIndex.Tables) =
    cache.computeIfAbsent(s"${spark.hashCode}|$sfDir", _ => {
      val corpus = Corpus.fromDocuments(spark, sfDir).cache()
      (corpus, InvertedIndex.build(corpus))
    })
  private val shardCache = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Dataset[ShardPosting]]()
  def shards(spark: SparkSession, sfDir: String): org.apache.spark.sql.Dataset[ShardPosting] =
    shardCache.computeIfAbsent(s"${spark.hashCode}|$sfDir", _ => {
      val (_, t) = index(spark, sfDir)
      IndexWriter.shardPostings(t.postings, t.docStats, t.avgDl).cache()
    })

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val (corpus, t) = index(spark, "/root/testdata/sf0.001")
    Search.search(corpus, t.postings, t.docStats, t.termStats, t.nDocs, t.avgDl,
      query = "spark join", lang = "en", limit = 10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S4: corpus scan + derived invariant columns (input_hint shape)
    "ft_corpus" -> ((s, dir) => {
      Corpus.fromDocuments(s, dir).select("doc_id", "repo", "path", "commit", "lang", "sha256")
    }),
    // A1/T1-T5: page-index mapping (term frequency per doc)
    "ft_postings" -> ((s, dir) => {
      val (_, t) = index(s, dir); t.postings.select("doc_id", "term", "tf")
    }),
    // A2: lemma frequency table (document frequency per term)
    "ft_term_stats" -> ((s, dir) => {
      val (_, t) = index(s, dir); t.termStats.select("term", "df")
    }),
    // A2 per-site variant (lemma.site FK semantics)
    "ft_term_stats_repo" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      InvertedIndex.termStatsByRepo(InvertedIndex.tokens(c)).select("repo", "term", "df")
    }),
    // BM25 dl component
    "ft_doc_stats" -> ((s, dir) => {
      val (_, t) = index(s, dir); t.docStats.select("doc_id", "dl")
    }),
    // A8: statistics rollup (pages + lemmas per repo + grand total)
    "ft_stats_rollup" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val toks = InvertedIndex.tokens(c)
      val pages = c.groupBy("repo").agg(count(lit(1)).as("pages"))
      val lemmas = InvertedIndex.termStatsByRepo(toks).groupBy("repo").agg(count(lit(1)).as("lemmas"))
      val per = pages.join(lemmas, "repo")
      val total = per.agg(sum("pages").as("pages"), sum("lemmas").as("lemmas"))
        .withColumn("repo", lit("ALL")).select("repo", "pages", "lemmas")
      per.select("repo", "pages", "lemmas").union(total)
    }),
    // J5/E4: k-way posting-list intersection (conjunction of all terms)
    "ft_intersect" -> ((s, dir) => {
      val (_, t) = index(s, dir); Search.conjunctive(t.postings, q3)
    }),
    // A3/A4/O2: reference-parity Σtf relevance top-k (int cast + max-normalize)
    "ft_sumtf_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Search.sumTfTopK(t.postings, q2, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          col("abs_rank").cast("long").as("abs_rank"), round(col("rel_rank"), 4).as("rel_r"))
    }),
    // North-rule scoring: BM25 conjunctive top-k
    "ft_bm25_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.bm25TopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // J2: missing-term anti-join (error short-circuit path)
    "ft_missing_terms" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val qt = Analyzer.queryTerms("en", qMissingInput).toSeq.sorted.toDF("term")
      qt.join(t.termStats, Seq("term"), "left_anti")
    }),
    // A5/O1: common-term prune + rarest-first ordering of the query plan
    "ft_prune_common" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val plan = QueryFrontend.plan(t.termStats, "en", q3.mkString(" "))
      plan.terms.zipWithIndex.map { case (ti, i) => (i.toLong + 1, ti.term, ti.df) }
        .toDF("ord", "term", "df")
    }),
    // North-star scale path: block-max WAND over the compressed sharded
    // index — must be rank-identical to ft_bm25_topk (shared oracle SQL)
    "ft_wand_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val idfs = dfs.map { case (k, v) => k -> Bm25.idfS(v, t.nDocs) }
      val qShards = shards(s, dir).filter(sp => idfs.contains(sp.term))
      Wand.topK(qShards, idfs, t.avgDl, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Salted two-phase shard merge: one global compressed list per term;
    // its decoded length must equal df (oracle = term_stats)
    "ft_compressed_postings" -> ((s, dir) => {
      val merged = IndexWriter.mergeShards(shards(s, dir))
      merged.toDF().select(col("term"), col("numDocs").cast("long").as("df"))
    }),
    // Flagship end-to-end (front-end + BM25 + decoration minus snippet)
    "ft_search_flagship" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      Search.search(c, t.postings, t.docStats, t.termStats, t.nDocs, t.avgDl,
        query = q2.mkString(" "), lang = "en", limit = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), col("repo"),
          col("path"), round(col("score"), 4).as("score_r"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ft_corpus" ->
      """SELECT doc_id, source AS repo, 'doc/' || doc_id AS path,
        |substring(sha256(source), 1, 40) AS commit, lang, sha256(text) AS sha256
        |FROM documents""".stripMargin,
    "ft_postings" ->
      s"WITH ${termsCte}, ${postCte} SELECT doc_id, term, tf FROM post",
    "ft_term_stats" ->
      s"WITH ${termsCte}, ${tstatsCte} SELECT term, df FROM tstats",
    "ft_term_stats_repo" ->
      s"""WITH ${termsCte}
         |SELECT repo, term, count(DISTINCT doc_id)::BIGINT AS df
         |FROM terms GROUP BY repo, term""".stripMargin,
    "ft_doc_stats" ->
      s"WITH ${termsCte}, ${dsCte} SELECT doc_id, dl FROM ds",
    "ft_stats_rollup" ->
      s"""WITH ${termsCte},
         |tr AS (SELECT repo, term, count(DISTINCT doc_id) AS df FROM terms GROUP BY repo, term),
         |pages AS (SELECT source AS repo, count(*)::BIGINT AS pages FROM documents GROUP BY source),
         |lemmas AS (SELECT repo, count(*)::BIGINT AS lemmas FROM tr GROUP BY repo)
         |SELECT repo, pages, lemmas FROM pages JOIN lemmas USING (repo)
         |UNION ALL
         |SELECT 'ALL' AS repo, (SELECT sum(pages) FROM pages)::BIGINT,
         |       (SELECT sum(lemmas) FROM lemmas)::BIGINT""".stripMargin,
    "ft_intersect" ->
      s"""WITH ${termsCte}, ${postCte}, ${qCte(q3)}
         |SELECT doc_id FROM post JOIN q USING (term)
         |GROUP BY doc_id HAVING count(*) = ${q3.size}""".stripMargin,
    "ft_sumtf_topk" ->
      s"""WITH ${termsCte}, ${postCte}, ${qCte(q2)},
         |scored AS (
         |  SELECT doc_id, count(*) AS n_terms, CAST(trunc(sum(tf)) AS BIGINT) AS abs_rank
         |  FROM post JOIN q USING (term) GROUP BY doc_id
         |),
         |cand AS (SELECT doc_id, abs_rank,
         |                abs_rank::DOUBLE / (max(abs_rank) OVER ()) AS rel_rank
         |         FROM scored WHERE n_terms = ${q2.size})
         |SELECT rank, doc_id, abs_rank, rel_r FROM (
         |  SELECT row_number() OVER (ORDER BY abs_rank DESC, doc_id ASC) AS rank,
         |         doc_id, abs_rank, round(rel_rank, 4) AS rel_r
         |  FROM cand
         |) WHERE rank <= 10""".stripMargin,
    "ft_bm25_topk" -> bm25TopKSql(q2, 10),
    "ft_wand_topk" -> bm25TopKSql(q2, 10),
    "ft_compressed_postings" ->
      s"WITH ${termsCte}, ${tstatsCte} SELECT term, df FROM tstats",
    "ft_missing_terms" ->
      s"""WITH ${termsCte}, ${tstatsCte},
         |qt AS (SELECT unnest(ARRAY['flux', 'spark', 'warpdrive']) AS term)
         |SELECT term FROM qt WHERE term NOT IN (SELECT term FROM tstats)""".stripMargin,
    "ft_prune_common" ->
      s"""WITH ${termsCte}, ${tstatsCte}, ${qCte(q3)},
         |qdf AS (SELECT t.term, t.df FROM tstats t JOIN q USING (term)),
         |st AS (SELECT sum(df) // count(*) AS avgi, count(*) AS n FROM qdf),
         |sig AS (SELECT sqrt(sum((df - avgi) * (df - avgi)) / (n - 1.0)) AS sigma
         |        FROM qdf, st GROUP BY n, avgi),
         |kept AS (SELECT term, df FROM qdf, st, sig
         |         WHERE df <= CAST(trunc(avgi + 2 * sigma) AS BIGINT))
         |SELECT row_number() OVER (ORDER BY df ASC, term ASC) AS ord, term, df FROM kept""".stripMargin,
    "ft_search_flagship" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |qdf AS (SELECT t.term, t.df FROM tstats t JOIN q USING (term)),
         |st AS (SELECT sum(df) // count(*) AS avgi, count(*) AS n FROM qdf),
         |sig AS (SELECT sqrt(sum((df - avgi) * (df - avgi)) / (n - 1.0)) AS sigma
         |        FROM qdf, st GROUP BY n, avgi),
         |kept AS (SELECT term FROM qdf, st, sig
         |         WHERE df <= CAST(trunc(avgi + 2 * sigma) AS BIGINT)),
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN kept USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id
         |),
         |topk AS (
         |  SELECT rank, doc_id, score_r FROM (
         |    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |           doc_id, round(score, 4) AS score_r
         |    FROM scored WHERE n_terms = (SELECT count(*) FROM kept)
         |  ) WHERE rank <= 10
         |)
         |SELECT rank, doc_id, source AS repo, 'doc/' || doc_id AS path, score_r
         |FROM topk JOIN documents USING (doc_id)""".stripMargin
    }
  )
}
