package graft

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
  /** segmentation input: 'spark join' is a corpus collocation (cf ≥ 3),
    * 'join dup' and 'dup table' are not → segments [spark join][dup][table] */
  val qSeg = Seq("spark", "join", "dup", "table")
  /** INFLECTED flagship-search input: the shipped lexicon maps joins→join,
    * so the end-to-end lexical path must return docs indexed under `join` */
  val qLexInput = "joins spark"
  /** its lexicon-expanded term set — what both engines actually score */
  def qLexTerms: Seq[String] =
    Analyzer.analyze("en", qLexInput, DefaultLexicon.lexicon).distinct.sorted
  /** synonym-group query: position 1 matches {join, merge}, position 2
    * {spark} — SynonymQuery semantics over the documents vocabulary */
  val synGroups: Seq[(String, Seq[String])] =
    Seq("join" -> Seq("join", "merge"), "spark" -> Seq("spark"))
  /** Count-Min point-query terms: the fixed query vocabulary plus one
    * absent term (its estimate is pure collision mass) */
  val cmsTerms = Seq("dup", "hash", "join", "spark", "warpdrive")
  /** mixture-resampling targets (permille of the ORIGINAL corpus size):
    * en is over-represented (downsampled), zh under (kept whole),
    * de mid (partially downsampled); es/fr absent (dropped) */
  val mixTargets: Map[String, Int] = Map("en" -> 300, "zh" -> 200, "de" -> 100)
  /** fixed query log for the batched scorer (query_id, term) */
  /** seed lexicons for weak-supervision topic tagging (over the synthetic
    * vocabulary — each topic is a keyword labeling function) */
  val seedTopics: Map[String, Seq[String]] = Map(
    "joins" -> Seq("join", "merge", "hash"),
    "streaming" -> Seq("stream", "window", "batch"),
    "scans" -> Seq("scan", "table", "row"))

  val batchQ: Seq[(Long, String)] = Seq(
    (0L, "join"), (0L, "spark"),
    (1L, "dup"), (1L, "hash"), (1L, "spark"),
    (2L, "hash"))

  /** deterministic synthetic URL table (url_id, url) over the corpus: a
    * clean URL plus a tracking/case/slash/fragment-noised variant per doc —
    * both must canonicalize to the same string (twin built verbatim in the
    * dedup_url_canon oracle) */
  private def syntheticUrls(c: DataFrame): DataFrame = {
    val clean = c.select((col("doc_id") * 2).as("url_id"),
      concat(lit("https://"), col("repo"), lit(".example.com/"), col("path")).as("url"))
    val noisy = c.select((col("doc_id") * 2 + 1).as("url_id"),
      concat(lit("HTTPS://"), upper(col("repo")), lit(".example.com/"), col("path"),
        when(col("doc_id") % 3 === 0,
          concat(lit("?utm_source=feed&utm_campaign=c"), (col("doc_id") % 5).cast("string")))
          .when(col("doc_id") % 3 === 1, lit("#section"))
          .otherwise(lit("/"))).as("url"))
    clean.unionByName(noisy)
  }

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

  // ordered, stop-filtered token ARRAY per doc (shingling needs order,
  // which the exploded terms CTE loses)
  private def tokArrCte: String = {
    val toks = Analyzer.sqlTokens("text")
    val stopList = stops.toSeq.sorted.map(s => s"'$s'").mkString(", ")
    s"""tokarr AS (SELECT doc_id, list_filter($toks, t -> t <> '' AND t NOT IN ($stopList)) AS arr
       |FROM documents)""".stripMargin
  }
  /** distinct 3-gram shingles per doc — twin of Dedup.shingles(n=3) */
  private def shinglesCte: String =
    s"""${tokArrCte},
       |shd AS (SELECT DISTINCT doc_id, unnest(list_transform(range(greatest(len(arr) - 2, 0)),
       |  i -> arr[i + 1] || ' ' || arr[i + 2] || ' ' || arr[i + 3])) AS shingle FROM tokarr)""".stripMargin
  /** inner lambda vars renamed so nesting inside another list_reduce works */
  private def tokenHashSqlInner(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(regexp_split_to_array($expr, ''), " +
      s"c -> CAST(unicode(c) AS BIGINT))), (h, cc) -> (h * 31 + cc) % ${TextHash.P})"
  /** MinHash-LSH candidate chain (8 hashes, 4 bands × 2 rows) up to the
    * verified intersection counts — shared by the pairs and clusters twins */
  private def lshCtes: String = {
    val mins = (0 until 8).map(i =>
      s"min(${TextHash.mixSql(i, "h")}) AS s$i").mkString(", ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, s${2 * b}::VARCHAR || '_' || s${2 * b + 1}::VARCHAR AS key FROM sig")
      .mkString("\n UNION ALL ")
    s"""${shinglesCte},
       |shh AS (SELECT doc_id, ${tokenHashSqlInner("shingle")} AS h FROM shd),
       |sig AS (SELECT doc_id, $mins FROM shh GROUP BY doc_id),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
       |inter AS (SELECT c.a_id, c.b_id, count(*) AS i
       |          FROM cand c JOIN shd a ON a.doc_id = c.a_id
       |               JOIN shd b ON b.doc_id = c.b_id AND a.shingle = b.shingle
       |          GROUP BY c.a_id, c.b_id)""".stripMargin
  }
  private def jaccardPairsSql(candCte: String): String =
    s"""sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
       |  FROM $candCte
       |  GROUP BY a.doc_id, b.doc_id
       |)
       |SELECT a_id, b_id, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jac_r
       |FROM inter
       |JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
       |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8""".stripMargin

  /** flagship-search twin over the LEXICON-EXPANDED postings: same prune +
    * conjunctive BM25 + decoration chain as the ft_search_flagship twin, but
    * post/ds/tstats/stats all derive from the lexCte-expanded token stream
    * (what the engine's lexIndex holds) and `queryTerms` arrive pre-expanded
    * through the SAME shipped lexicon. */
  private def lexSearchSql(queryTerms: Seq[String], k: Int): String = {
    val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
    s"""WITH ${termsCte}, ${lexCte},
       |lexp AS (SELECT t.doc_id, coalesce(l.form, t.term) AS term
       |         FROM terms t LEFT JOIN lex l ON t.term = l.surface),
       |post AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM lexp GROUP BY doc_id, term),
       |ds AS (SELECT doc_id, count(*)::BIGINT AS dl FROM lexp GROUP BY doc_id),
       |tstats AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM lexp GROUP BY term),
       |${statsCte}, ${qCte(queryTerms)},
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
       |  ) WHERE rank <= $k
       |)
       |SELECT rank, doc_id, source AS repo, 'doc/' || doc_id AS path, score_r
       |FROM topk JOIN documents USING (doc_id)""".stripMargin
  }

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

  /** DuckDB twin of the pseudo-relevance-feedback pipeline: conjunctive
    * top-r feedback docs → Σtf-weighted top-e expansion terms (BIGINT
    * weight: the top-e cut is exact, no float-order hazard) → weighted
    * disjunctive BM25 re-rank (original terms wOrig×, expansion 1×). */
  private def prfSql(terms: Seq[String], k: Int, r: Int, e: Int, wOrig: Int): String = {
    val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
    val origList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(terms)},
       |s0 AS (
       |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
       |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
       |       JOIN ds d ON p.doc_id = d.doc_id, stats s
       |  GROUP BY p.doc_id
       |),
       |fb AS (
       |  SELECT doc_id FROM (
       |    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
       |    FROM s0 WHERE n_terms = ${terms.size}
       |  ) WHERE rank <= $r
       |),
       |exp AS (
       |  SELECT term FROM (
       |    SELECT p.term, sum(p.tf) AS w
       |    FROM post p JOIN fb USING (doc_id)
       |    WHERE p.term NOT IN ($origList)
       |    GROUP BY p.term ORDER BY w DESC, term ASC LIMIT $e
       |  )
       |),
       |qx AS (SELECT term, $wOrig AS wq FROM q UNION ALL SELECT term, 1 AS wq FROM exp),
       |rescored AS (
       |  SELECT p.doc_id, sum(x.wq * $score) AS score
       |  FROM post p JOIN qx x USING (term) JOIN tstats t USING (term)
       |       JOIN ds d ON p.doc_id = d.doc_id, stats s
       |  GROUP BY p.doc_id
       |)
       |SELECT rank, doc_id, score_r FROM (
       |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       |         doc_id, round(score, 4) AS score_r
       |  FROM rescored
       |) WHERE rank <= $k""".stripMargin
  }

  /** DuckDB twin of MMR diversification: BM25 top-`poolSize` pool +
    * pool-restricted pairwise term-set Jaccard, then the greedy selection
    * UNROLLED as one CTE pair (argmax stage + selected-set union) per pick —
    * the same unroll technique as the k-means and PageRank twins. λ = 0.5. */
  private def mmrSql(terms: Seq[String], poolSize: Int, k: Int): String = {
    val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
    val stages = (2 to k).map { i =>
      val prevSel = (1 until i).map(j => s"SELECT doc_id FROM s$j").mkString(" UNION ALL ")
      s"""sel$i AS ($prevSel),
         |m$i AS (SELECT p.doc_id, 0.5 * p.score - 0.5 * coalesce(max(v.sim), 0) AS mmr
         |        FROM pool p
         |        LEFT JOIN (SELECT x, sim FROM sim2 JOIN sel$i ON sim2.y = sel$i.doc_id) v
         |               ON v.x = p.doc_id
         |        WHERE p.doc_id NOT IN (SELECT doc_id FROM sel$i)
         |        GROUP BY p.doc_id, p.score),
         |s$i AS (SELECT doc_id, mmr FROM m$i ORDER BY mmr DESC, doc_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (Seq(s"SELECT CAST(1 AS BIGINT) AS rank, doc_id, round(0.5 * score, 4) AS mmr_r FROM s1") ++
      (2 to k).map(i => s"SELECT CAST($i AS BIGINT) AS rank, doc_id, round(mmr, 4) AS mmr_r FROM s$i"))
      .mkString("\nUNION ALL ")
    s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(terms)},
       |scored AS (
       |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
       |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
       |       JOIN ds d ON p.doc_id = d.doc_id, stats s
       |  GROUP BY p.doc_id
       |),
       |pool AS (
       |  SELECT doc_id, score FROM (
       |    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
       |    FROM scored WHERE n_terms = ${terms.size}
       |  ) WHERE rank <= $poolSize
       |),
       |pp AS (SELECT p.doc_id, p.term FROM post p JOIN pool USING (doc_id)),
       |psz AS (SELECT doc_id, count(*) AS sz FROM pp GROUP BY doc_id),
       |pint AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
       |         FROM pp a JOIN pp b ON a.term = b.term AND a.doc_id < b.doc_id
       |         GROUP BY a.doc_id, b.doc_id),
       |sims AS (SELECT a_id, b_id, i::DOUBLE / (sa.sz + sb.sz - i) AS sim
       |         FROM pint JOIN psz sa ON a_id = sa.doc_id JOIN psz sb ON b_id = sb.doc_id),
       |sim2 AS (SELECT a_id AS x, b_id AS y, sim FROM sims
       |         UNION ALL SELECT b_id, a_id, sim FROM sims),
       |s1 AS (SELECT doc_id, score FROM pool ORDER BY score DESC, doc_id ASC LIMIT 1),
       |$stages
       |$out""".stripMargin
  }

  /** DuckDB twin of the xQuAD greedy: the novelty products are unrolled
    * stage by stage in the same sequential order the Scala greedy updates
    * them, and the aspect sum is written in sorted-topic order — every
    * float op shares its association with the engine side. */
  private def xquadSql(terms: Seq[String], topics: Map[String, Seq[String]],
                       poolSize: Int, k: Int): String = {
    val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
    val ts = topics.keys.toSeq.sorted
    val nT = ts.size
    val seedVals = ts.flatMap(t => topics(t).map(st => s"('$t', '$st')")).mkString(", ")
    val pCols = ts.zipWithIndex.map { case (t, i) =>
      s"coalesce(max(CASE WHEN c.topic = '$t' THEN c.mt END), 0)::DOUBLE / ${topics(t).size}.0 AS p$i"
    }.mkString(",\n       ")
    def divExpr(novRel: String) =
      ts.indices.map(i => s"(1.0 / $nT.0) * pv.p$i * $novRel.n$i").mkString(" + ")
    val s1 =
      s"""nov1 AS (SELECT ${ts.indices.map(i => s"1.0 AS n$i").mkString(", ")}),
         |s1 AS (SELECT pv.*, 0.5 * pv.score + 0.5 * (${divExpr("nov1")}) AS obj
         |       FROM pv, nov1 ORDER BY obj DESC, doc_id ASC LIMIT 1)""".stripMargin
    val stages = (2 to k).map { j =>
      val prevSel = (1 until j).map(x => s"SELECT doc_id FROM s$x").mkString(" UNION ALL ")
      s"""nov$j AS (SELECT ${ts.indices.map(i => s"nv.n$i * (1.0 - sp.p$i) AS n$i").mkString(", ")}
         |          FROM nov${j - 1} nv, s${j - 1} sp),
         |sel$j AS ($prevSel),
         |s$j AS (SELECT pv.*, 0.5 * pv.score + 0.5 * (${divExpr(s"nov$j")}) AS obj
         |        FROM pv, nov$j WHERE pv.doc_id NOT IN (SELECT doc_id FROM sel$j)
         |        ORDER BY obj DESC, doc_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, doc_id, round(obj, 4) AS xquad_r FROM s$i")
      .mkString("\nUNION ALL ")
    s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(terms)},
       |seeds AS (SELECT * FROM (VALUES $seedVals) AS t(topic, seed_term)),
       |scored AS (
       |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
       |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
       |       JOIN ds d ON p.doc_id = d.doc_id, stats s
       |  GROUP BY p.doc_id
       |),
       |pool AS (
       |  SELECT doc_id, score FROM (
       |    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
       |    FROM scored WHERE n_terms = ${terms.size}
       |  ) WHERE rank <= $poolSize
       |),
       |cov AS (SELECT p.doc_id, sd.topic, count(*)::BIGINT AS mt
       |        FROM post p JOIN seeds sd ON p.term = sd.seed_term
       |             JOIN pool ON p.doc_id = pool.doc_id
       |        GROUP BY p.doc_id, sd.topic),
       |pv AS (SELECT pool.doc_id, pool.score,
       |       $pCols
       |       FROM pool LEFT JOIN cov c ON pool.doc_id = c.doc_id
       |       GROUP BY pool.doc_id, pool.score),
       |$s1,
       |$stages
       |$out""".stripMargin
  }

  /** shared DuckDB twin of the champion-list tier — referenced by BOTH
    * ft_champions (in-memory build) and ft_champions_persisted (cold read of
    * the aux artifact): one oracle, two engine paths. */
  private lazy val championsSql: String = {
    val tfn = s"(tf * ${Bm25.k1 + 1.0}) / (tf + ${Bm25.k1} * (${1.0 - Bm25.b} + ${Bm25.b} * dl / s.avgdl))"
    val score = Bm25.sql("c.tf", "t.df", "c.dl", "s.n", "s.avgdl")
    s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
       |pj AS (SELECT p.doc_id, p.term, p.tf, d.dl FROM post p JOIN ds d ON p.doc_id = d.doc_id),
       |ch AS (SELECT doc_id, term, tf, dl FROM (
       |  SELECT doc_id, term, tf, dl,
       |         row_number() OVER (PARTITION BY term ORDER BY $tfn DESC, doc_id) AS rn
       |  FROM pj, stats s) WHERE rn <= 5),
       |scored AS (
       |  SELECT c.doc_id, sum($score) AS score
       |  FROM ch c JOIN q USING (term) JOIN tstats t USING (term), stats s
       |  GROUP BY c.doc_id)
       |SELECT rank, doc_id, score_r FROM (
       |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       |         doc_id, round(score, 4) AS score_r FROM scored
       |) WHERE rank <= 10""".stripMargin
  }

  /** shared DuckDB twin of the per-repo facets rollup — referenced by BOTH
    * ft_facets (in-memory) and ft_facets_persisted (cold aux artifact). */
  private lazy val facetsSql: String =
    s"""WITH ${termsCte},
       |rdf AS (SELECT repo, term, count(DISTINCT doc_id)::BIGINT AS df
       |        FROM terms GROUP BY repo, term)
       |SELECT repo, facet_rank, term, df FROM (
       |  SELECT repo, term, df,
       |         row_number() OVER (PARTITION BY repo ORDER BY df DESC, term) AS facet_rank
       |  FROM rdf) WHERE facet_rank <= 3""".stripMargin

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
  private val persistedCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** write the compressed index of sfDir once per JVM, return its table dir */
  def persistedIndex(spark: SparkSession, sfDir: String): String =
    persistedCache.computeIfAbsent(s"${spark.hashCode}|$sfDir", _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-qidx").toString
      val (_, t) = index(spark, sfDir)
      IndexWriter.write(shards(spark, sfDir), dir, 1L)
      graft.io.TableIO.writeMeta(dir, graft.io.TableIO.IndexMeta(t.nDocs, t.avgDl))
      dir
    })

  private val auxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** persistedIndex dir with the derived aux artifacts committed (champion
    * lists m=5, per-repo term stats) — built once per (session, sfDir).
    * These are index-BUILD products persisted beside the bucket index with
    * manifest lineage (IndexWriter.writeAux); the _persisted query variants
    * read them COLD. */
  def persistedAux(s: SparkSession, dir: String): String =
    auxCache.computeIfAbsent(s"${s.hashCode}|$dir", _ => {
      val tableDir = persistedIndex(s, dir)
      val (c, t) = index(s, dir)
      // per-query evaluation metrics for the fixed df-top-40 bootstrap log:
      // the two FULL ranking passes are index-build-time products (the
      // bootstrap itself is cheap b·Q-row work) — committed with the same
      // writeAux lineage contract champions use, read COLD by the entry
      val (mA, mB) = bootstrapMetrics(s, dir)
      // the six artifacts are INDEPENDENT derivatives of the one committed
      // snapshot: submit them from separate driver threads so Spark
      // schedules the jobs side by side (none saturates the cluster alone;
      // a multi-executor driver overlaps them the same way). writeAux
      // serializes only the manifest read-modify-commit, so no lineage row
      // is lost to a concurrent committer.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      def job(body: => Unit): Future[Unit] = Future {
        org.apache.spark.sql.SparkSession.setActiveSession(s); body
      }
      val jobs = Seq(
        job(graft.index.Champions.persist(t.postings, t.docStats, t.avgDl, m = 5, tableDir)),
        job(graft.stats.Stats.persistRepoTermStats(
          InvertedIndex.termStatsByRepo(InvertedIndex.tokens(c)), tableDir)),
        job(QueryFrontend.persistKgrams(t.termStats, tableDir)),
        job(graft.ann.Quantize.persist(s.read.parquet(s"$dir/embeddings.parquet"), 64, tableDir)),
        job(IndexWriter.writeAux(mA, tableDir, "eval_metrics_a")),
        job(IndexWriter.writeAux(mB, tableDir, "eval_metrics_b")))
      try jobs.foreach(Await.result(_, Duration.Inf))
      finally { pool.shutdown(); () }
      tableDir
    })

  /** the paired-bootstrap fixture: BM25 vs binary-tf BM25 over a df-top-40
    * synthetic query log, reduced to the two Q-row per-query metric
    * relations (see persistedAux — these persist as aux artifacts). */
  private def bootstrapMetrics(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val (_, t) = index(s, dir)
    val top = t.termStats.orderBy(desc("df"), asc("term")).limit(40)
      .collect().map(_.getString(0))
    val qs = top.grouped(2).zipWithIndex.flatMap { case (pair, i) =>
      pair.map(term => (i.toLong, term)) }.toSeq.toDF("query_id", "term")
    val rankA = Search.bm25TopKBatch(t.postings, t.docStats, t.termStats,
      qs, t.nDocs, t.avgDl, k = 10).select("query_id", "rank", "doc_id")
    val capped = t.postings.withColumn("tf", least(col("tf"), lit(1L)))
    val rankB = Search.bm25TopKBatch(capped, t.docStats, t.termStats,
      qs, t.nDocs, t.avgDl, k = 10).select("query_id", "rank", "doc_id")
    val qrels = graft.query.Eval.sumTfQrels(t.postings, qs)
    (graft.query.Eval.rankingMetrics(rankA, qrels, k = 10),
      graft.query.Eval.rankingMetrics(rankB, qrels, k = 10))
  }

  private val bm25fCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  /** field-weighted BM25F postings tf' for dir's HTML-wrapped corpus, built
    * once per (session, sfDir) and cached serialized — the index-artifact
    * shape (Search.bm25fPostings doc) */
  def bm25fEff(s: SparkSession, dir: String): DataFrame =
    bm25fCache.computeIfAbsent(s"${s.hashCode}|$dir", _ => {
      val (c, _) = index(s, dir)
      val html = htmlWrapCol
      Search.bm25fPostings(c.select(col("doc_id"), col("lang"),
          Html.title(html).as("title"), Html.extractText(html).as("body")), wTitle = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    })

  private val anchorEffCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  /** Anchor-blended effective postings tf′ = tf + 3·atf, built ONCE per
    * (session, sfDir) and cached — the anchor field is an index artifact
    * exactly like `bm25fEff` (Anchors.withAnchors doc): queries score
    * through it without re-touching the edge table or re-tokenizing. */
  def anchorEff(s: SparkSession, dir: String): DataFrame =
    anchorEffCache.computeIfAbsent(s"${s.hashCode}|$dir", _ => {
      val (c, t) = index(s, dir)
      val apost = graft.corpus.Anchors.anchorPostings(
        graft.corpus.Anchors.syntheticAnchors(c, t.nDocs))
      graft.corpus.Anchors.withAnchors(t.postings, apost, wAnchor = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    })

  private val lexIdxCache = new java.util.concurrent.ConcurrentHashMap[String, InvertedIndex.Tables]()
  /** Lexicon-EXPANDED index tables (1→N through the shipped lexicon), built
    * once per (session, sfDir) — the index side of the end-to-end lexical
    * search path: the reference lemmatizes BOTH sides
    * (IndexingServiceImpl.java:144-155 index, SearcherPage.java:39 query). */
  def lexIndex(s: SparkSession, dir: String): InvertedIndex.Tables =
    lexIdxCache.computeIfAbsent(s"${s.hashCode}|$dir", _ => {
      val (c, _) = index(s, dir)
      InvertedIndex.build(c, defaultLexicon = DefaultLexicon.lexicon)
    })

  private val mltCache = new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame)]()
  /** moreLikeThis index artifacts (TF-IDF weighted postings + per-doc
    * norms), built once per (session, sfDir) and cached serialized — the
    * per-query path pushes an isin term filter into this relation instead
    * of re-aggregating the postings (Search.mltBuild/mltQuery split). */
  def mltIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    mltCache.computeIfAbsent(s"${s.hashCode}|$dir", _ => {
      val (_, t) = index(s, dir)
      val (w, norms) = Search.mltBuild(t.postings, t.termStats, t.nDocs)
      (w.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER),
        norms.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
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
    // CORI resource selection (Callan 1995): rank index shards (= repos)
    // for a query so selective search fans out to top shards only; the
    // stats relation is (shards × vocab)-bounded, a broker-side artifact
    "ft_shard_select" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val sts = Shards.shardTermStats(
        t.postings, c.select(col("doc_id"), col("repo").as("shard")))
      Shards.coriScores(sts, Seq("spark", "join"))
        .select(col("shard"), round(col("score"), 6).as("score_r"), col("rank"))
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
    // Hierarchical facet counts: ROLLUP (repo, lang) in ONE aggregate
    "ft_rollup_facets" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.stats.Stats.facetRollup(c)
    }),
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
    // Pre-retrieval cost estimate per query (admission control): Σdf scan
    // cost + min-df candidate bound; missing term ⇒ 0 candidates
    "ft_query_cost" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      QueryFrontend.planCost(t.termStats, costQ.toDF("query_id", "term"))
    }),
    // Score explain (Lucene explain as a relation): per-term BM25 breakdown
    // for the query's top-3 docs
    "ft_explain" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.explain(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, k = 3)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), col("term"),
          col("tf"), col("df"), col("dl"), round(col("idf"), 4).as("idf_r"),
          round(col("tfnorm"), 4).as("tfnorm_r"), round(col("contrib"), 4).as("contrib_r"))
    }),
    // Recency-decayed BM25: score × 0.5^(age/halfLife) over a deterministic
    // synthetic age column (doc_id % 365 days; production = crawl ts)
    "ft_recency_topk" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val ages = c.select(col("doc_id"), (col("doc_id") % 365).as("age_days"))
      Search.recencyTopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl,
          ages, halfLifeDays = 30.0, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    // Grouped top-k ("top hits per facet"): best 2 docs per repo for q2
    "ft_group_topk" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.groupedTopK(t.postings, t.docStats, c, dfs, t.nDocs, t.avgDl, m = 2)
        .select(col("repo"), col("grp_rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
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
    // Dirichlet query-likelihood top-k (Zhai & Lafferty) — the LM-smoothing
    // alternative to BM25, disjunctive candidates with full-QL semantics
    "ft_lm_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val cfs = graft.query.Lm.lookupCf(t.postings, q2.toSet)
      val total = t.docStats.agg(sum("dl")).head.getLong(0)
      graft.query.Lm.qlTopK(t.postings, t.docStats, cfs, total, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // DFR PL2 top-k (Amati & van Rijsbergen; Terrier's default): the third
    // scoring family — Poisson divergence + Laplace after-effect + length
    // normalization 2, disjunctive matched-only
    "ft_pl2_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val cfs = graft.query.Dfr.lookupCf(t.postings, q2.toSet)
      graft.query.Dfr.pl2TopK(t.postings, t.docStats, cfs, t.nDocs, t.avgDl, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Impact-ordered quantized index (Anh & Moffat): BM25 impacts
    // pre-quantized to 8-bit integers at build; the serve path is one
    // integer aggregate with no stats joins and no float ties
    "ft_impact_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val qz = graft.query.Impact.quantize(t.postings, t.docStats, t.termStats,
        t.nDocs, t.avgDl, bits = 8)
      graft.query.Impact.impactTopK(qz, q2, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), col("impact"))
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
    // Minimum-should-match BM25 (mm=2 of 3): the AND/OR middle ground —
    // same one-pass shape, the match-count gate runs on candidates
    "ft_bm25_mm" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = t.termStats.filter(col("term").isin(q3.map(x => x: Any): _*))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      Search.bm25TopKMinMatch(t.postings, t.docStats, dfs, t.nDocs, t.avgDl,
          minMatch = 2, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          col("n_terms"), round(col("score"), 4).as("score_r"))
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
    // SMART lnc.ltc vector-space cosine (Salton & Buckley 1988) — the
    // third ranking family next to BM25 and Dirichlet QL; doc norms are
    // an index artifact, the query path is one IN-filtered postings scan
    "ft_vsm_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = t.termStats.filter(col("term").isin(q2.map(x => x: Any): _*))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.query.Vsm.vsmTopK(t.postings, graft.query.Vsm.docNorms(t.postings),
          dfs, t.nDocs, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    // F1: path-validity filter (reference validUrl: reject media/binary
    // extensions and fragment links, IndexingServiceImpl.java:239-243)
    "ft_valid_paths" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      c.filter(!col("path").rlike("\\.(jpg|jpeg|png|gif|pdf|doc|xml|mp3|mp4|zip)$") &&
          !col("path").contains("#"))
        .select("doc_id", "path")
    }),
    // F3: year-sanity predicate on crawl links (reference dontCrazyYear,
    // ParserForkJoinAction.java:80-92) — deterministic synthetic query
    // strings over the corpus paths; nowYear injected (2026), no wall clock
    "ft_year_filter" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val link = concat(col("path"),
        when(col("doc_id") % 4 === 0,
          concat(lit("?p=1&year="), (lit(2020) + col("doc_id") % 12).cast("string")))
          .when(col("doc_id") % 7 === 0, lit("?q=x"))
          .otherwise(lit("")))
      c.select(col("doc_id"), link.as("link"))
        .filter(graft.corpus.Crawl.yearSane(col("link"), nowYear = 2026))
    }),
    // O3: pagination — second page (offset 10, limit 10) of the BM25 ranking
    "ft_bm25_page2" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.bm25TopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, k = 10, offset = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
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
    // Cursor (search-after) pagination: page 2 via a strict-after filter on
    // the page-1 cursor — the deep-paging scale path; provably identical to
    // the offset page under the deterministic total order (shared ranking)
    "ft_search_after" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val cur = Search.bm25TopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, k = 10)
        .filter(col("rank") === 10).select("score", "doc_id").head()
      Search.bm25TopKAfter(t.postings, t.docStats, dfs, t.nDocs, t.avgDl,
          k = 10, afterScore = cur.getDouble(0), afterDoc = cur.getLong(1))
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    // Boolean query tree: (join OR merge) AND spark AND NOT dup — Lucene
    // semantics: the tree filters, the positive leaves score
    "ft_boolean" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      import graft.query.BooleanQuery
      import graft.query.BooleanQuery._
      val tree = And(Seq(Or(Seq(Term("join"), Term("merge"))),
        Term("spark"), Not(Term("dup"))))
      val dfs = QueryFrontend.lookupDf(t.termStats, Set("join", "merge", "spark"))
      BooleanQuery.topK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, tree, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
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
      // Column-level isin, NOT a typed lambda: a Scala-closure filter would
      // deserialize every ShardPosting (incl. the posting blob) per query
      val qShards = shards(s, dir).filter(col("term").isin(idfs.keys.toSeq.map(x => x: Any): _*))
      Wand.topK(qShards, idfs, t.avgDl, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Disjunctive (OR) BM25 top-k: DataFrame aggregate path and classic
    // block-max WAND — both rank-identical to the same SQL oracle
    "ft_bm25_or_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.bm25TopKDisjunctive(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // synonym-group BM25 (SynonymQuery semantics): "join" expands to
    // {join, merge} as ONE pseudo-term (Σtf, union df), conjunctive with
    // the {spark} group
    "ft_synonym" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Search.synonymTopK(t.postings, t.docStats, synGroups, t.nDocs, t.avgDl, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    "ft_wand_or_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val idfs = dfs.map { case (k, v) => k -> Bm25.idfS(v, t.nDocs) }
      val qShards = shards(s, dir).filter(col("term").isin(idfs.keys.toSeq.map(x => x: Any): _*))
      Wand.topKDisjunctive(qShards, idfs, t.avgDl, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // MaxScore dynamic pruning (Turtle–Flood 1995): the third pruning
    // strategy beside conj/disj block-max WAND — essential-suffix candidate
    // generation, skipTo probes into the non-essential prefix. Shares the
    // disjunctive BM25 oracle shape (q3: rare + hot terms stress the
    // essential/non-essential split); hash equality = exactness proof
    "ft_maxscore_topk" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q3.toSet)
      val idfs = dfs.map { case (kk, v) => kk -> Bm25.idfS(v, t.nDocs) }
      val qShards = shards(s, dir).filter(col("term").isin(idfs.keys.toSeq.map(x => x: Any): _*))
      Wand.maxScoreTopK(qShards, idfs, t.avgDl, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Hybrid lexical+vector retrieval: BM25 top-10 fused with brute-force
    // cosine top-10 (query = doc 0's embedding; vec_id ≡ doc_id) by RRF
    "hybrid_rrf" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val lex = Search.bm25TopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, 10)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val vec = graft.ann.Ann.bruteForceTopK(emb, graft.ann.Ann.fixedQueries(s, emb, 1), 10)
        .select(col("vec_id").as("doc_id"), col("rank"))
      Search.rrfFuse(lex.select("doc_id", "rank"), vec, k0 = 60, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("rrf"), 6).as("rrf_r"))
    }),
    // CombMNZ score fusion (Fox & Shaw): min-max-normalized CombSUM ×
    // #systems-agreeing — the score-level sibling of hybrid_rrf
    "hybrid_combmnz" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val lex = Search.bm25TopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, 10)
        .select(col("doc_id"), col("score"))
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val vec = graft.ann.Ann.bruteForceTopK(emb, graft.ann.Ann.fixedQueries(s, emb, 1), 10)
        .select(col("vec_id").as("doc_id"), col("cos").as("score"))
      Search.combMnzFuse(lex, vec, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("mnz"), 6).as("mnz_r"))
    }),
    // MMR diversification: greedy re-rank of the BM25 top-20 pool by
    // relevance minus max-Jaccard-to-picks (pool-restricted sim self-join)
    "ft_mmr" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.mmrTopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, poolSize = 20, k = 5)
        .select(col("rank"), col("doc_id"), round(col("mmr"), 4).as("mmr_r"))
    }),
    // xQuAD aspect diversification (Santos et al.): greedy cover of the
    // seed-lexicon topics, sequential novelty products, uniform P(t|q)
    "ft_xquad" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.xquadTopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl,
          seedTopics, poolSize = 20, k = 5)
        .select(col("rank"), col("doc_id"), round(col("xquad"), 4).as("xquad_r"))
    }),
    // Pseudo-relevance feedback: Rocchio-style blind expansion from the
    // top-5 docs, weighted disjunctive re-rank (orig 2x, expansion 1x)
    "ft_prf" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.prfTopK(t.postings, t.docStats, t.termStats, dfs, t.nDocs, t.avgDl, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Cold-start query over the PERSISTED index: write-once per sfDir, then
    // read back with bucket partition pruning + term pushdown; same oracle
    "ft_wand_persisted" -> ((s, dir) => {
      val idxDir = persistedIndex(s, dir)
      val meta = graft.io.TableIO.readMeta(idxDir).get
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val idfs = dfs.map { case (k, v) => k -> Bm25.idfS(v, meta.nDocs) }
      Wand.topK(IndexWriter.readForTerms(s, idxDir, q2), idfs, meta.avgDl, 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Salted two-phase shard merge: one global compressed list per term;
    // its decoded length must equal df (oracle = term_stats)
    "ft_compressed_postings" -> ((s, dir) => {
      val merged = IndexWriter.mergeShards(shards(s, dir))
      merged.toDF().select(col("term"), col("numDocs").cast("long").as("df"))
    }),
    // T4: 1→N normal-form expansion through the SHIPPED lexicon (reference
    // luceneMorph.getNormalForms; golden LemmatizatorTest.java:10-17 shape)
    "ft_postings_lex" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      InvertedIndex.postings(InvertedIndex.tokens(c, DefaultLexicon.lexicon))
        .select("doc_id", "term", "tf")
    }),
    // T1 + title: HTML→text extraction over a deterministically HTML-wrapped
    // variant of the corpus (reference Jsoup.parse(content).text() +
    // SearchServiceImpl.java:284-296 title regexp)
    "ft_html_extract" -> ((s, dir) => {
      val c = Corpus.fromDocuments(s, dir)
      val html = htmlWrapCol
      c.select(col("doc_id"), html.as("html"))
        .select(col("doc_id"), Html.title(col("html")).as("title"),
          Html.extractText(col("html")).as("text"))
    }),
    // S2: recursive crawl frontier — iterative BFS (join + left_anti visited)
    // over a deterministic synthetic link graph; DuckDB twin is a recursive CTE
    "ft_crawl_frontier" -> ((s, dir) => {
      import s.implicits._
      val (c, t) = index(s, dir)
      graft.corpus.Crawl.frontier(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), Seq(0L).toDF("doc_id"), maxDepth = 8)
    }),
    // Recrawl delta: added/removed/changed/unchanged between two corpus
    // versions by sha256 — hashes only cross the join, content never moves
    "ft_recrawl_delta" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val old = c.select("doc_id", "content")
      val kept = old.filter(col("doc_id") % 17 =!= 0)
        .withColumn("content", when(col("doc_id") % 13 === 0,
          concat(col("content"), lit(" updated"))).otherwise(col("content")))
      val added = old.filter(col("doc_id") % 23 === 0)
        .select((col("doc_id") + t.nDocs).as("doc_id"),
          concat(lit("new page "), col("doc_id").cast("string")).as("content"))
      graft.corpus.Crawl.recrawlDelta(old, kept.unionByName(added))
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
    // F4: HTTP-status gate (code <= 299, IndexingServiceImpl.java:135-137)
    // over a synthesized deterministic status column
    "ft_http_filter" -> ((s, dir) => {
      val c = Corpus.fromDocuments(s, dir).withColumn("code",
        when(col("doc_id") % 97 === 0, lit(404)).otherwise(lit(200)).cast("long"))
      Corpus.httpOk(c).select("doc_id", "code")
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
    // Per-site collapse: best result per repo from a top-100 pool, re-ranked
    "ft_collapse_repo" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      val pool = Search.bm25TopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, 100)
        .join(c.select("doc_id", "repo"), "doc_id")
      Search.collapseByRepo(pool, perRepo = 1, k = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), col("repo"),
          round(col("score"), 4).as("score_r"))
    }),
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
    // Front-coded dictionary study (IIR §5.2): exact byte model of blocked
    // prefix compression over the term and 3-shingle dictionaries
    "ft_dict_frontcode" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val sh = Dedup.shingles(c, 3).select(col("shingle").as("term")).distinct()
      graft.index.IndexLayout.frontCodeStudy(t.termStats.select("term"), "terms")
        .unionByName(graft.index.IndexLayout.frontCodeStudy(sh, "shingles"))
    }),
    // docID-assignment compression study (Silvestri 2007): exact varint
    // byte cost of every delta-gap under original vs URL-sorted ids
    "ft_docid_remap" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      graft.index.IndexLayout.remapStudy(t.postings, c)
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
    // T2/T4 TRUE reference-domain parity: Russian analyzer branch (ё-fold +
    // Cyrillic class, Lemmatizator.java:1) + Russian 1→N lexicon over a
    // deterministically Russian-wrapped corpus variant
    "ft_postings_ru" -> ((s, dir) => {
      val c = Corpus.fromDocuments(s, dir)
        .withColumn("content", ruWrapCol)
        .withColumn("lang", lit("ru"))
      InvertedIndex.postings(InvertedIndex.tokens(c, DefaultLexicon.russian))
        .select("doc_id", "term", "tf")
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
    // Link-graph authority ranking: fixed-point PageRank (3 power
    // iterations, BIGINT mass units — order-independent sums, hash-exact
    // vs the unrolled-CTE twin) over the deterministic crawl edge graph
    "ft_pagerank" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val pr = graft.corpus.LinkRank.pagerank(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        t.nDocs, iters = 3)
      graft.corpus.LinkRank.topK(pr, 20)
    }),
    // TrustRank: teleport only to the trusted seed set (doc_id % 17 = 0)
    // — spam-farm pages unreachable from seeds score exactly 0
    "ft_trustrank" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val seeds = c.select("doc_id").filter(col("doc_id") % 17 === 0)
      val nSeeds = seeds.count()
      val pr = graft.corpus.LinkRank.trustRank(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        seeds, nSeeds, iters = 3)
      graft.corpus.LinkRank.topK(pr, 20)
    }),
    // Composition: the crawl dispatcher — per-host politeness queues
    // ordered by OPIC importance (what the frontier actually fetches next)
    "ft_crawl_priority" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val imp = graft.corpus.LinkRank.opic(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        t.nDocs, iters = 3)
      val frontier = c.select(col("doc_id"), col("repo").as("host"), col("path"))
        .join(imp.select(col("doc_id"), col("importance").as("priority")), "doc_id")
      graft.corpus.Crawl.politeSchedule(frontier, limit = 100)
    }),
    // OPIC crawl prioritization (Abiteboul): cash/history fixed point in
    // BIGINT; importance = history + cash after 3 synchronized rounds
    "ft_opic" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val imp = graft.corpus.LinkRank.opic(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        t.nDocs, iters = 3)
      graft.corpus.LinkRank.topK(
          imp.select(col("doc_id"), col("importance").as("pr")), 20)
        .select(col("rank"), col("doc_id"), col("pr").as("importance"))
    }),
    // SALSA authorities (Lempel & Moran): degree-normalized HITS without
    // the TKC bias — two integer divisions per round, BIGINT-exact
    "ft_salsa" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val a = graft.corpus.LinkRank.salsa(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"), iters = 2)
      graft.corpus.LinkRank.topK(a.select(col("doc_id"), col("auth").as("pr")), 20)
        .select(col("rank"), col("doc_id"), col("pr").as("auth"))
    }),
    // robots.txt gate with RFC 9309 longest-match semantics: the deeper
    // allow overrides the shallower disallow; unmatched paths pass
    "ft_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val (c, _) = index(s, dir)
      val rules = c.select(col("repo")).distinct()
        .crossJoin(Seq(("doc/1", 0L), ("doc/12", 1L)).toDF("prefix", "allow"))
      graft.corpus.Crawl.robotsFilter(
        c.select("doc_id", "repo", "path"), rules)
    }),
    // Co-citation related-pages: pairs cited together, hot-citer pruned
    "ft_cocitation" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val pairs = graft.corpus.LinkRank.cocitation(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs))
      pairs.orderBy(desc("cocite"), col("a_id"), col("b_id")).limit(25)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("cocite"), col("a_id"), col("b_id"))).cast("long"))
        .select(col("rank"), col("a_id"), col("b_id"), col("cocite"))
    }),
    // Bibliographic coupling: pages CITING the same targets (the dual of
    // co-citation — swapped edge orientation, in-degree prune)
    "ft_coupling" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val pairs = graft.corpus.LinkRank.coupling(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs))
      pairs.orderBy(desc("couple"), col("a_id"), col("b_id")).limit(25)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("couple"), col("a_id"), col("b_id"))).cast("long"))
        .select(col("rank"), col("a_id"), col("b_id"), col("couple"))
    }),
    // HITS hubs/authorities over the same link graph (fixed-point BIGINT,
    // two join+agg passes per iteration)
    "ft_hits" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val ah = graft.corpus.LinkRank.hits(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        iters = 2)
      graft.corpus.LinkRank.hitsTopK(ah, 20)
    }),
    // Anchor-text postings: link text counts toward the TARGET page (one
    // explode + hash aggregate shuffled on (dst, term))
    "ft_anchor_postings" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      graft.corpus.Anchors.anchorPostings(
        graft.corpus.Anchors.syntheticAnchors(c, t.nDocs))
    }),
    // Anchor-blended ranking: body postings + in-link anchor field (w=3),
    // scored through the shared BM25F build/score split over the CACHED
    // anchor-eff index artifact (build/query split like bm25fEff)
    "ft_anchor_search" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Search.bm25fTopKFromPostings(anchorEff(s, dir), q2, t.nDocs, k = 10)
        .select(col("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Batched multi-query BM25: the whole query log scored in ONE postings
    // pass (query-eval harness shape; WindowGroupLimit per query)
    "ft_batch_bm25" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val qs = batchQ.toDF("query_id", "term")
      Search.bm25TopKBatch(t.postings, t.docStats, t.termStats, qs,
        t.nDocs, t.avgDl, k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    // Hard-negative mining: top-5 DISJUNCTIVELY-ranked docs per query that
    // are NOT in the (conjunctive) qrels — the ranker's own best mistakes
    "ltr_hard_negatives" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val qs = batchQ.toDF("query_id", "term")
      val ranking = Search.bm25TopKBatch(t.postings, t.docStats, t.termStats,
        qs, t.nDocs, t.avgDl, k = 20, conjunctive = false)
      val qrels = graft.query.Eval.sumTfQrels(t.postings, qs)
      graft.pipeline.Features.hardNegatives(ranking, qrels, n = 5)
    }),
    // Ranking-eval harness: nDCG@10 + MAP@10 of the batched BM25 ranking
    // against Σtf-graded synthetic qrels — the text twin of ann_recall
    "ft_eval_metrics" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val qs = batchQ.toDF("query_id", "term")
      val ranking = Search.bm25TopKBatch(t.postings, t.docStats, t.termStats,
        qs, t.nDocs, t.avgDl, k = 10).select("query_id", "rank", "doc_id")
      val qrels = graft.query.Eval.sumTfQrels(t.postings, qs)
      graft.query.Eval.rankingMetrics(ranking, qrels, k = 10)
        .select(col("query_id"), round(col("ndcg"), 4).as("ndcg_r"),
          round(col("ap"), 4).as("ap_r"))
    }),
    // RBP + ERR (user-model metrics beside nDCG/MAP): rank-biased
    // persistence and the cascade stopping model over the same batched
    // ranking + Σtf qrels
    "ft_eval_rbp" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val qs = batchQ.toDF("query_id", "term")
      val ranking = Search.bm25TopKBatch(t.postings, t.docStats, t.termStats,
        qs, t.nDocs, t.avgDl, k = 10).select("query_id", "rank", "doc_id")
      val qrels = graft.query.Eval.sumTfQrels(t.postings, qs)
      graft.query.Eval.rbpErr(ranking, qrels, k = 10)
        .select(col("query_id"), round(col("rbp"), 4).as("rbp_r"),
          round(col("err"), 4).as("err_r"))
    }),
    // TAAT accumulator limiting (Moffat & Zobel Quit/Continue): rarest-
    // first term order, accumulator budget L = N/2, both strategies
    "ft_taat_quit" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q3.toSet)
      graft.query.Taat.quitContinueTopK(t.postings, t.docStats, dfs,
          t.nDocs, t.avgDl, limit = t.nDocs / 2, k = 10)
        .select(col("strategy"), col("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    // Static result-cache admission study (Markatos; Baeza-Yates): top-C
    // most frequent train queries pinned, hit rates on the eval half
    "ft_cache_static" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val stream = graft.query.ResultCache.argmaxTermStream(t.postings)
      graft.query.ResultCache.staticCacheStudy(stream, c = 8)
    }),
    // Query-traffic Gini: how concentrated the load is — the number cache
    // sizes and replica counts are planned from
    "ft_query_gini" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val stream = graft.query.ResultCache.argmaxTermStream(t.postings)
      graft.query.ResultCache.trafficGini(stream)
    }),
    // PQ recall vs exact brute force: what the 6-bit codes cost in top-5
    // agreement — the quantization-quality gate before shipping an index
    "ann_pq_recall" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = Ann.fixedQueries(s, emb, 5)
      Ann.recallAtK(
        Ann.bruteForceTopK(emb, q, 5),
        Ann.pqAdcTopK(emb, q, k = 5, m = 2, codebook = 8, iters = 2), k = 5)
    }),
    // Posting-list cache admission by QTF/DF (Baeza-Yates SIGIR 2007):
    // best query-mass per byte, pinned prefix under a df budget of 10%
    "ft_cache_postings" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val stream = graft.query.ResultCache.argmaxTermStream(t.postings)
      graft.query.ResultCache.postingCacheStudy(stream, t.termStats)
    }),
    // Per-site change rates from one recrawl interval (Cho & Garcia-Molina
    // Poisson MLE): the recrawl scheduler's priority signal
    "ft_recrawl_rate" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val old = c.select("doc_id", "repo", "content")
      val kept = old.filter(col("doc_id") % 17 =!= 0)
        .withColumn("content", when(col("doc_id") % 13 === 0,
          concat(col("content"), lit(" updated"))).otherwise(col("content")))
      val added = old.filter(col("doc_id") % 23 === 0)
        .select((col("doc_id") + t.nDocs).as("doc_id"), col("repo"),
          concat(lit("new page "), col("doc_id").cast("string")).as("content"))
      graft.corpus.Crawl.changeRates(old, kept.unionByName(added).select("doc_id", "content"))
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
    // Skip-pointer merge-cost model (MG §3.6): linear vs √n-skip vs
    // galloping, integer closed forms per query pair
    "ft_skip_study" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val ts = Seq("dup", "hash", "join", "spark")
      val pairs = for { i <- ts.indices; j <- i + 1 until ts.size }
        yield (ts(i), ts(j))
      graft.index.IndexLayout.skipStudy(t.termStats, pairs)
    }),
    // Fagin's TA depth study: rank-join (pagerank, in-degree) under a
    // monotone f; d* is the prefix a middleware top-1 actually scans
    "ft_fagin_ta" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val edges = graft.corpus.Crawl.syntheticEdges(c, t.nDocs)
      val pr = graft.corpus.LinkRank.pagerank(edges, c.select("doc_id"), t.nDocs, iters = 3)
      val ideg = edges.groupBy(col("dst").as("doc_id")).agg(count(lit(1)).as("b"))
      val attrs = pr.select(col("doc_id"), col("pr").as("a"))
        .join(ideg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("a"), coalesce(col("b"), lit(0L)).as("b"))
      Search.faginTaStudy(attrs, wB = 1000000000000L)
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
    // Balanced interleaving (online A/B of two rankers in one list):
    // leader by query-hash coin, closed-form slot merge, keep-first dedup
    "ft_interleave" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val qs = batchQ.toDF("query_id", "term")
      val rankA = Search.bm25TopKBatch(t.postings, t.docStats, t.termStats,
        qs, t.nDocs, t.avgDl, k = 10).select("query_id", "rank", "doc_id")
      val capped = t.postings.withColumn("tf", least(col("tf"), lit(1L)))
      val rankB = Search.bm25TopKBatch(capped, t.docStats, t.termStats,
        qs, t.nDocs, t.avgDl, k = 10).select("query_id", "rank", "doc_id")
      graft.query.Eval.balancedInterleave(rankA, rankB, k = 10)
    }),
    // Post-retrieval query-performance prediction (NQC-family score
    // dispersion): tightly-bunched top-k scores = hard query
    "ft_qpp_nqc" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val qs = batchQ.toDF("query_id", "term")
      val ranking = Search.bm25TopKBatch(t.postings, t.docStats, t.termStats,
        qs, t.nDocs, t.avgDl, k = 10)
      graft.query.Eval.nqc(ranking, k = 10)
        .select(col("query_id"), col("k_n"), round(col("nqc"), 4).as("nqc_r"))
    }),
    // Paired bootstrap significance test: BM25 vs binary-tf BM25 (tf
    // capped at 1) over a df-top-40 synthetic query log — deterministic
    // hash resamples, integer micro-unit deltas (exact sign test). The two
    // Q-row per-query metric relations are index-build-time aux artifacts
    // (persistedAux → writeAux lineage); the entry reads them COLD and runs
    // only the bootstrap proper (b·Q-row work) — bench accounting now
    // charges the two full ranking passes to index_aux_build, not here.
    "ft_eval_bootstrap" -> ((s, dir) => {
      val tableDir = persistedAux(s, dir)
      val mA = IndexWriter.readAux(s, tableDir, "eval_metrics_a")
      val mB = IndexWriter.readAux(s, tableDir, "eval_metrics_b")
      graft.query.Eval.pairedBootstrap(mA, mB, "ndcg", b = 200, seed = 11)
    }),
    // Reverse search / percolation: every stored query matched against the
    // corpus in ONE postings pass (the alerting primitive)
    "ft_percolate" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      Search.percolate(t.postings, batchQ.toDF("query_id", "term"))
    }),
    // Flagship end-to-end (front-end + BM25 + decoration minus snippet)
    "ft_search_flagship" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      Search.search(c, t.postings, t.docStats, t.termStats, t.nDocs, t.avgDl,
        query = q2.mkString(" "), lang = "en", limit = 10)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), col("repo"),
          col("path"), round(col("score"), 4).as("score_r"))
    }),
    // Flagship search with the 1→N lexicon threaded through BOTH sides: the
    // index is lexicon-expanded (lexIndex) and the query analyzer expands
    // the INFLECTED input ("joins") through the same lexicon — the
    // reference's lemmatize-query-and-index contract (SearcherPage.java:39;
    // IndexingServiceImpl.java:144-155)
    "ft_search_lex" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val t = lexIndex(s, dir)
      Search.search(c, t.postings, t.docStats, t.termStats, t.nDocs, t.avgDl,
        query = qLexInput, lang = "en", limit = 10,
        lexicon = DefaultLexicon.lexicon)
        .select(col("rank").cast("long").as("rank"), col("doc_id"), col("repo"),
          col("path"), round(col("score"), 4).as("score_r"))
    }),

    // ===== training-data pipeline operators =====
    // deterministic hash train/val/test split (stable under data growth)
    "split_assign" -> ((s, dir) => {
      graft.pipeline.Splits.assign(Corpus.fromDocuments(s, dir))
    }),
    // importance sampling: keep probability ∝ alnum quality ratio, as a
    // pure function of (doc_id, weight) — map-only, growth-stable
    "split_importance" -> ((s, dir) => {
      val c = Corpus.fromDocuments(s, dir)
      val w = TextAnalysis.quality(c).select(col("doc_id"), col("alnum_ratio_r"))
      graft.pipeline.Splits.importanceSample(c.join(w, "doc_id"), col("alnum_ratio_r"))
        .select("doc_id", "bucket", "thr")
    }),
    // domain-mixture resampling: deterministic downsample toward target
    // language shares (keep iff bucket·n_dom < tw·N, pure BIGINT)
    "split_mixture" -> ((s, dir) => {
      graft.pipeline.Mixture.resample(
        Corpus.fromDocuments(s, dir), "lang", mixTargets)
    }),
    // stratified per-stratum quota sampling (training-data mixing): at most
    // 40 docs per lang, selected by the cross-engine hash order — a pure
    // function of ids, so the subset is stable under growth and engines
    "split_stratified" -> ((s, dir) => {
      graft.pipeline.Splits.stratifiedSample(
        Corpus.fromDocuments(s, dir).select("doc_id", "lang"), "lang", quota = 40)
    }),
    // Sequence packing (concat-and-chop, capacity 512): each doc's exact
    // position in the packed training stream — two-phase range-bucket
    // prefix sum; the twin's GLOBAL cumsum proves the phases lose nothing
    "split_packing" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      graft.pipeline.Packing.pack(t.docStats, capacity = 512L)
    }),
    // Leakage-safe split: near-dup cluster members share a split (hash the
    // cluster representative, not the doc) — singletons fall back to the
    // plain assign hash, so only dup groups move
    "split_leakage_safe" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val pairs = Dedup.minhashLshPairs(c, numHashes = 8, rowsPerBand = 2,
        threshold = 0.8).select("a_id", "b_id")
      graft.pipeline.Splits.leakageSafeAssign(
        c.select("doc_id"), Dedup.clusters(pairs))
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
    // LTR training-set export: per-(query,doc) feature vectors for the
    // whole query log in ONE postings pass (disjunctive candidates keep the
    // partial-match hard negatives a ranker trains on)
    "ltr_features" -> ((s, dir) => {
      import s.implicits._
      val (c, t) = index(s, dir)
      val pr = graft.corpus.LinkRank.pagerank(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        t.nDocs, iters = 3)
      graft.pipeline.Features.ltr(t.postings, t.docStats, t.termStats,
        batchQ.toDF("query_id", "term"), pr, t.nDocs, t.avgDl, k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("f_matched"), col("q_n"), col("f_sum_tf"), col("f_max_tf"),
          col("f_dl"), round(col("f_idf"), 4).as("f_idf_r"),
          round(col("f_bm25"), 4).as("f_bm25_r"), col("f_prior"))
    }),
    // one-plan curation: quality gate → exact-dedup keep → hash split
    "pipeline_curate" -> ((s, dir) => {
      graft.pipeline.Curation.curate(Corpus.fromDocuments(s, dir))
    }),
    // per-source quality-percentile gate: keep each repo's top half by
    // alnum quality — exact via the bounded (source, q@4dp) histogram,
    // never a per-source doc sort; threshold ties all kept
    "pipeline_quality_gate" -> ((s, dir) => {
      val c = Corpus.fromDocuments(s, dir)
      val q = TextAnalysis.quality(c)
        .select(col("doc_id"), col("alnum_ratio_r").as("q"))
      graft.pipeline.Curation.qualityQuantileGate(
          c.select("doc_id", "repo").withColumnRenamed("repo", "source").join(q, "doc_id"),
          keepPermille = 500)
        .select(col("doc_id"), col("source").as("repo"),
          col("q").as("q_r"), col("thr").as("thr_r"))
    }),
    // benchmark-contamination audit: bench set = doc_id < 20 stand-in
    // (single-pass split variant: one shingle computation for both sides)
    "dedup_contamination" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.contaminationSplit(c, col("doc_id") < 20)
        .select(col("train_id"), col("bench_id"), col("overlap"),
          round(col("contamination"), 4).as("contamination_r"))
    }),
    // exact dedup (hash-groupBy on content sha)
    "dedup_exact" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.exact(c)
    }),
    // ExactSubstr duplicated-span REMOVAL (Lee et al. 2022): every 8-token
    // span repeated anywhere in the corpus is dropped keep-first
    // (min (doc_id, pos)); emits the REWRITTEN per-doc content — the dedup
    // most large pretraining corpora actually run, beyond pair detection
    "dedup_substring_rm" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.dedup.SubstrDedup.rewrite(c, w = 8)
    }),
    // canonical-URL dedup: deterministic synthetic URL variants per doc
    // (clean vs tracking/case/slash/fragment-noised) must collapse to one
    // canonical form — the crawl-frontier one-fetch-per-page normalizer
    "dedup_url_canon" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.corpus.Crawl.urlDedup(syntheticUrls(c))
    }),
    // n-gram (3-shingle) Jaccard near-dup pairs
    "dedup_ngram" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.ngramJaccardPairs(c, n = 3, threshold = 0.8, maxShingleDf = 1000L)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jac_r"))
    }),
    // n-gram novelty: fraction of a doc's shingles FIRST seen in it
    // (ingestion order = doc_id) — the recycled-text signal no pairwise
    // threshold catches
    "dedup_novelty" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.novelty(c, n = 3)
        .select(col("doc_id"), col("n_shingles"), col("n_first"),
          round(col("novelty"), 4).as("novelty_r"))
    }),
    // Containment (subset-duplication): inter / min(|A|,|B|) >= 0.9 — the
    // quoted-whole-inside case Jaccard misses on size-skewed pairs
    "dedup_containment" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.containmentPairs(c, n = 3, threshold = 0.9, maxShingleDf = 1000L)
        .select(col("a_id"), col("b_id"), round(col("containment"), 4).as("cont_r"))
    }),
    // MinHash signatures (8 hash functions, codegen'd min-aggregates)
    "dedup_minhash_sig" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.minhashSignatures(c, numHashes = 8)
    }),
    // MinHash LSH (4 bands × 2 rows) candidates + exact-Jaccard verify
    "dedup_minhash_lsh" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.minhashLshPairs(c, numHashes = 8, rowsPerBand = 2, threshold = 0.8)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jac_r"))
    }),
    // Incremental dedup: pairs touching the "new batch" (doc_id even) via
    // batch-band probe of the full band index — O(batch) candidates
    "dedup_minhash_incr" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.minhashIncrementalPairs(c, col("doc_id") % 2 === 0,
          numHashes = 8, rowsPerBand = 2, threshold = 0.8)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jac_r"))
    }),
    // Duplicate CLUSTERS: connected components (min-label propagation) over
    // the LSH near-dup pairs — turns pairwise evidence into the keep-one-
    // per-cluster dedup decision; DuckDB twin is a recursive-CTE closure
    "dedup_clusters" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val pairs = Dedup.minhashLshPairs(c, numHashes = 8, rowsPerBand = 2,
        threshold = 0.8).select("a_id", "b_id")
      Dedup.clusters(pairs)
    }),
    // Canonical selection: keep each cluster's highest-quality member
    // (alnum ratio, ties doc_id asc) — not blindly the min id
    "dedup_canonical" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val pairs = Dedup.minhashLshPairs(c, numHashes = 8, rowsPerBand = 2,
        threshold = 0.8).select("a_id", "b_id")
      val q = TextAnalysis.quality(c).select(col("doc_id"), col("alnum_ratio_r").as("q"))
      Dedup.canonical(Dedup.clusters(pairs), q)
        .select(col("cluster_id"), col("canonical_id"),
          round(col("q"), 4).as("q_r"), col("members"))
    }),
    // 31-bit SimHash per doc
    "dedup_simhash" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.simhash(c)
    }),
    // SimHash near-dup pairs (banded candidates, exact for hamming<=3)
    "dedup_simhash_pairs" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.simhashPairs(c, maxHamming = 3)
        .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
    }),
    // embedding-cosine near-dup pairs (label-blocked)
    "dedup_embedding" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Dedup.embeddingPairs(emb, threshold = 0.4)
        .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // exact all-pairs cosine ≥ 0.85 via prefix filtering (Bayardo 2007)
    // over a deterministic doc sample; the oracle is the BRUTE-FORCE
    // all-pairs join — hash equality proves the filter loses nothing
    "dedup_apss" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Dedup.apssPairs(t.postings.filter(col("doc_id") % 5 === 0), 0.85)
        .select(col("doc_a"), col("doc_b"), round(col("sim"), 4).as("sim_r"))
    }),
    // brute-force cosine top-5 for 5 fixed query vectors (= ANN oracle)
    "ann_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.bruteForceTopK(emb, Ann.fixedQueries(s, emb, 5), 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // Filtered vector search: exact top-k among SAME-label vectors — the
    // filter is the join key (co-partition), never a post-filter on an
    // unfiltered top-k (the classic recall bug)
    "ann_filtered_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("qv"),
          col("label").as("qlabel"))
      Ann.filteredTopK(emb, qs, k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // LSH-bucketed ANN (multiprobe) — approximate but deterministic; recall
    // vs ann_topk asserted in AnnSpec, exact output hash-gated vs DuckDB
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      // bits pinned to 8 (matching the inlined-plane oracle SQL); the
      // production default derives bits from N via Ann.deriveBits
      Ann.lshTopK(emb, Ann.fixedQueries(s, emb, 5), dim = 64, k = 5, bits = 8)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // IVF (coarse k-means) ANN — deterministic Lloyd's (ordered float
    // accumulation), hash-gated vs an unrolled-SQL k-means twin
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.ivfTopK(emb, Ann.fixedQueries(s, emb, 5), 5, nCentroids = 8, nprobe = 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // PQ-ADC (Jégou FAISS codec): 2 subspaces × 8-entry codebooks, vectors
    // compressed to 6-bit codes, asymmetric distance via per-query LUT
    "ann_pq_adc" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.pqAdcTopK(emb, Ann.fixedQueries(s, emb, 5), k = 5, m = 2,
          codebook = 8, iters = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("adc"), 4).as("adc_r"))
    }),
    // SQ8 scalar-quantized ANN: per-dim affine int8 codes (4× smaller scan),
    // asymmetric (raw-query vs dequantized) cosine top-5
    "ann_sq8_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val p = graft.ann.Quantize.sqTrain(emb, 64)
      graft.ann.Quantize.sqTopK(
          graft.ann.Quantize.sqEncode(emb, p), Ann.fixedQueries(s, emb, 5), p, 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // SQ8 two-stage: quantized scan picks 3k candidates, exact cosine
    // rescored on the isin-pruned raw table — full precision never scanned
    "ann_sq8_rerank" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val p = graft.ann.Quantize.sqTrain(emb, 64)
      graft.ann.Quantize.sqRerankTopK(emb,
          graft.ann.Quantize.sqEncode(emb, p), Ann.fixedQueries(s, emb, 5), p, k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // SQ8 COLD: the persisted codes+params aux artifacts serve the same
    // ADC top-5 — write → manifest-lineaged read is provably lossless
    // (same oracle as ann_sq8_topk)
    "ann_sq8_persisted" -> ((s, dir) => {
      val td = persistedAux(s, dir)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val p = graft.ann.Quantize.readParams(s, td)
      graft.ann.Quantize.sqTopK(
          graft.ann.Quantize.readCodes(s, td), Ann.fixedQueries(s, emb, 5), p, 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // recall@k of the LSH index vs exact brute force — the ANN eval harness
    // (per-query integer hits; recall = hits/k, hash-exact)
    "ann_recall" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = Ann.fixedQueries(s, emb, 5)
      Ann.recallAtK(
        Ann.bruteForceTopK(emb, q, 5),
        Ann.lshTopK(emb, q, dim = 64, k = 5, bits = 8), k = 5)
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
    // C4-style duplicated-segment stats over non-overlapping 3-token
    // windows (the line-dedup analog for punctuation-free text)
    "dedup_segments" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.segmentDupStats(TextAnalysis.chunk(c, window = 3, stride = 3), minCount = 2)
        .select(col("doc_id"), col("n_segs"), col("n_dup"),
          round(col("dup_frac"), 4).as("dup_frac_r"))
    }),
    // Count-Min sketch (4×64) of collection frequencies; point estimates
    // for the fixed terms — the hash gate proves the sketch bit-identical
    "ft_cms_cf" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val cms = graft.stats.Sketches.cmsBuild(t.postings, "term", "tf", width = 64)
      graft.stats.Sketches.cmsEstimate(s, cms, cmsTerms, width = 64)
    }),
    // Grouped KMV: daily-active-users without a COUNT DISTINCT shuffle of
    // raw ids — one 32-row sketch per day (WindowGroupLimit heap)
    "events_kmv_daily" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(to_date(col("ts")).cast("string").as("day"),
          col("user_id").cast("string").as("uid"))
      graft.stats.Sketches.kmvDistinctBy(ev, "day", "uid", k = 32)
        .select(col("grp").as("day"), col("k_n"), round(col("est"), 4).as("est_r"))
    }),
    // Daily event-volume anomaly flags (z-score vs the whole series)
    "events_anomaly" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.streaming.Events.dailyAnomaly(ev, threshold = 2.0)
    }),
    // k-fold CV ledger: fold = permille bucket mod 5, nested with assign's
    // buckets; every doc tests once and trains k−1 times
    "split_kfold" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.pipeline.Splits.kfoldLedger(c.select("doc_id"), k = 5)
    }),
    // Bloom-filter dictionary gate (Bloom 1970): m=2^16, kh=4 TextHash
    // mixers; absent-term probes short-circuit before touching the index —
    // the oracle hash-checks the no-false-negative invariant every run
    "ft_bloom_dict" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      val vocab = t.termStats.select(col("term"))
      val bits = graft.stats.Sketches.bloomBits(vocab, "term", m = 65536, kh = 4)
      val probes = cmsTerms.toDF("term")
      graft.stats.Sketches.probeBloom(bits, probes, "term", m = 65536, kh = 4)
        .join(vocab.withColumn("p", lit(1L)), Seq("term"), "left")
        .select(col("term"), col("in_bloom"),
          coalesce(col("p"), lit(0L)).as("present"))
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
    // multimodal: metadata projection over the binary media table
    // frame-sampling plumbing made oracle-checkable: every 64-byte stride
    // window of a video blob is a "frame"; the hash is over the UTF-8
    // decode (the synthetic blobs are ASCII, so bytes == chars)
    "mm_frames" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, dir)
      Multimodal.sampleFrames(media, stride = 64, frameLen = 16)
        .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
          graft.textan.TextHash.tokenHashCol(
            decode(col("frame_bytes"), "UTF-8")).as("frame_hash"))
    }),
    // aspect-fit resize plan: integer-exact output geometry per image
    "mm_resize" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, dir)
      Multimodal.resizePlan(media, target = 224)
    }),
    "mm_meta" -> ((s, dir) => {
      Multimodal.meta(Multimodal.mediaFromDocuments(s, dir))
    }),
    // multimodal: stubbed decode via mapPartitions (batch plumbing is real;
    // decode is a deterministic fake) — checksum/meta hash-gated vs DuckDB
    "mm_features" -> ((s, dir) => {
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
        .toDF().select(col("media_id"), col("modality"), col("n_bytes"), col("checksum"))
    }),
    // BM25F: field-weighted (title, body) ranking over the HTML-wrapped
    // corpus — integer field weight keeps tf'/dl' BIGINT (hash-exact);
    // the field-postings relation is built once per session (the at-scale
    // shape: tf' is an index artifact, queries must not re-tokenize)
    "ft_bm25f" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Search.bm25fTopKFromPostings(bm25fEff(s, dir), q2, t.nDocs, k = 10)
        .select(col("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Authority-blended final ranking: BM25 × PageRank prior (β = 0.5)
    "ft_blend" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val pr = graft.corpus.LinkRank.pagerank(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        t.nDocs, iters = 3)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.blendTopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, pr,
        k = 10, beta = 0.5)
        .select(col("rank"), col("doc_id"), round(col("blend"), 4).as("blend_r"))
    }),
    // event-time tumbling window aggregate (same plan batch/streaming;
    // integer-cents sums — order-independent, hash-exact)
    "events_window" -> ((s, dir) =>
      graft.streaming.Events.windowedAgg(graft.streaming.Events.read(s, dir))),
    // gap-rule sessionization rollup (batch twin of flatMapGroupsWithState)
    "events_sessions" -> ((s, dir) =>
      graft.streaming.Events.sessions(graft.streaming.Events.read(s, dir))),
    // burst detection: hour buckets vs trailing-6 baseline, BIGINT test
    "events_bursts" -> ((s, dir) =>
      graft.streaming.Events.bursts(graft.streaming.Events.read(s, dir))),
    // AS-OF join: each click enriched with the latest prior purchase (the
    // "dimension state as of the event" lookup); union+window plan gated
    // against DuckDB's NATIVE ASOF JOIN — an independent algorithm
    "events_asof" -> ((s, dir) => {
      val ev = graft.streaming.Events.read(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val dim = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("version"))
      graft.streaming.Events.asofJoin(clicks, dim, "user_id", "ts", "version")
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_version"), lit(-1L)).as("version"))
    }),
    // winnowing (MOSS): local fingerprints + shared-fp candidate pairs —
    // the ≥(w+k−1)-token shared-run guarantee MinHash resemblance lacks
    "dedup_winnow" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.winnowPairs(Dedup.winnowFingerprints(c, k = 3, w = 4), minShared = 2)
    }),
    // retention cohorts: first-activity-day matrix, BIGINT day arithmetic
    "events_retention" -> ((s, dir) =>
      graft.streaming.Events.retention(graft.streaming.Events.read(s, dir))),
    // strict-order funnel view -> click -> purchase (min-timestamp chain)
    "events_funnel" -> ((s, dir) =>
      graft.streaming.Events.funnel(graft.streaming.Events.read(s, dir),
        Seq("view", "click", "purchase"))),
    // champion lists: per-term top-m impact-ordered candidates (index-build
    // artifact), approximate disjunctive BM25 over champions only — the
    // hard-cost-ceiling query tier (IIR §7.1.3)
    "ft_champions" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val ch = graft.index.Champions.build(t.postings, t.docStats, t.avgDl, m = 5)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      graft.index.Champions.topK(ch, dfs, t.nDocs, t.avgDl, 10)
        .select(col("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // champion lists COLD: the persisted aux artifact (bucket-partitioned
    // beside the index, lineage in the manifest) read back with partition
    // pruning + pushed term filter — the index-artifact round trip
    "ft_champions_persisted" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val ch = graft.index.Champions.readForTerms(s, persistedAux(s, dir), q2)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      graft.index.Champions.topK(ch, dfs, t.nDocs, t.avgDl, 10)
        .select(col("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // tiered retrieval: champion tier-1 candidates rescored exactly, served
    // when the outside-docs certificate holds, exhaustive fallback otherwise
    // — EXACT either way: shares ft_bm25_or_topk's oracle, so the hash gate
    // is the equality proof (IIR §7.2.1 made exact)
    "ft_tiered" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val ch = graft.index.Champions.build(t.postings, t.docStats, t.avgDl, m = 40)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      graft.index.Champions.tieredTopK(ch, t.postings, t.docStats, dfs,
        t.nDocs, t.avgDl, m = 40, k = 10)._1
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
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
    // tf-idf keyword extraction: top-5 informative terms per doc (document
    // tagging; j-row heap per doc via WindowGroupLimit)
    "text_keywords" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      graft.stats.Stats.keywords(t.postings, t.termStats, t.nDocs, j = 5, minDf = 2)
    }),
    // related terms by co-occurrence lift (query-expansion association)
    "ft_related" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Search.relatedTerms(t.postings, t.termStats, "spark", k = 10)
    }),
    // semi-structured props: JSON field extraction + BIGINT rollup
    "events_props" -> ((s, dir) =>
      graft.streaming.Events.propsRollup(graft.streaming.Events.read(s, dir))),
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
    // Multi-stage ranking cascade (Wang/Lin/Metzler): Σtf 50 → BM25 20 →
    // phrase-boost 10; the positional probe touches 20 docs, period
    "ft_cascade" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      Search.cascadeTopK(t.postings, t.docStats,
          graft.index.Positional.tokenPositions(c), dfs, t.nDocs, t.avgDl, q2)
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          round(col("score"), 4).as("score_r"))
    }),
    // Politeness scheduler: ≤ 1 fetch per host per slot (Mercator crawl-
    // delay discipline) over a deterministic synthetic frontier
    "ft_crawl_polite" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.corpus.Crawl.politeSchedule(
        c.select(col("repo").as("host"), col("path"),
          (col("doc_id") % 100).as("priority")), limit = 100)
    }),
    // Host-level mirror detection (Bharat–Broder): shingle resemblance
    // lifted from docs to repos — finds whole mirror farms in one pair
    "dedup_mirrors" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.mirrorPairs(c, n = 3, threshold = 0.05, maxShingleHosts = 15L)
    }),
    // Bit-level codec study: byte-aligned varint vs Elias γ/δ priced over
    // the SAME delta-gap stream under both docID assignments — integer-
    // exact (bit lengths via bin(), no float log)
    "ft_codec_study" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      graft.index.IndexLayout.codecStudy(t.postings, c)
    }),
    // Rice/Golomb with a LOCAL per-term parameter k(t)=⌊log2(mean gap)⌋ —
    // the classical beats-varint coder for clustered docID gaps
    "ft_rice_study" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      graft.index.IndexLayout.riceStudy(t.postings, c)
    }),
    // Static index pruning (Carmel 2001, uniform top-N by tf): index size
    // vs top-10 result overlap of the lossy hot-tier index
    "ft_static_prune" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      val dfs = QueryFrontend.lookupDf(t.termStats, q2.toSet)
      graft.index.IndexLayout.staticPruneStudy(t.postings, t.docStats,
        dfs, t.nDocs, t.avgDl, n = 20, k = 10)
    }),
    // Query segmentation by corpus-bigram evidence: adjacent terms glue
    // iff the biword index saw them together ≥ 3 times
    "ft_query_segment" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      QueryFrontend.segmentQuery(
        graft.index.Positional.biwordPostings(c), qSeg, minCf = 3L)
    }),
    // Within-site boilerplate: fraction of a doc's shingles recurring in
    // ≥ 2 docs of the SAME site (nav/footer/template mass)
    "text_boilerplate" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.textan.TextAnalysis.boilerplate(c, n = 3, minSiteDf = 2L)
    }),
    // Rendezvous (HRW) term→shard routing: top-2 weight shards per term;
    // adding a shard moves only ~1/S of the dictionary
    "ft_shard_route" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      graft.index.Sharding.route(t.termStats, nShards = 8, replicas = 2)
    }),
    // per-shard load ledger over the same routing (capacity-planner view)
    "ft_shard_load" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      graft.index.Sharding.loadSummary(t.termStats, nShards = 8, replicas = 2)
    }),
    // Consistent-hash ring with 16 vnodes/shard (Karger; Dynamo): balance
    // at S=8 plus the terms each shard cedes when a 9th joins
    "ft_ring_balance" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      graft.index.Sharding.ringBalance(t.termStats, nShards = 8, vnodes = 16)
    }),
    // LSM merge-policy write amplification (O'Neil; Lucene tiered merge):
    // leveled vs tiered-F4 over the per-site ingest batches
    "ft_merge_policy" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.index.IndexLayout.mergePolicyStudy(c, fanout = 4)
    }),
    // Term- vs doc-partitioned serving cost for the batch workload
    // (Moffat/Webber/Zobel/Baeza-Yates): probes vs balance, S = 4
    "ft_partition_study" -> ((s, dir) => {
      import s.implicits._
      val (_, t) = index(s, dir)
      graft.index.Sharding.partitionStudy(t.termStats, t.postings,
        batchQ.toDF("query_id", "term"), nShards = 4)
    })
  )

  /** fixed misspelled-query inputs for ft_suggest (dist 0/1/2 + no-match) */
  val suggestQ = Seq("sprk", "jion", "hash", "window")

  /** log-spaced doc-id prefix thresholds for the Heaps fit (1 .. 4096) */
  val heapsThresholds: Seq[Long] = (0 to 12).map(1L << _)

  /** cost-estimator query log: batchQ + a query with a missing term */
  val costQ: Seq[(Long, String)] = batchQ ++ Seq((3L, "spark"), (3L, "warpdrive"))

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
    // CORI twin: same one-pass shard stats, same belief formula with the
    // paper's 50/150/b=0.4 constants; 2-term query keeps the score sum
    // fold-order-proof (IEEE addition is commutative)
    "ft_shard_select" ->
      s"""WITH ${termsCte}, ${postCte},
         |dr AS (SELECT doc_id, source AS shard FROM documents),
         |sts AS (SELECT d.shard, p.term, count(*)::BIGINT AS df,
         |               sum(p.tf)::BIGINT AS tfs
         |        FROM post p JOIN dr d USING (doc_id) GROUP BY 1, 2),
         |sz AS (SELECT shard, sum(tfs)::DOUBLE AS cw FROM sts GROUP BY 1),
         |g AS (SELECT (SELECT count(*) FROM sz)::DOUBLE AS ns,
         |             (SELECT avg(cw) FROM sz) AS avgcw),
         |q AS (SELECT unnest(ARRAY['spark', 'join']) AS term),
         |cf AS (SELECT term, count(*)::DOUBLE AS cf FROM sts
         |       WHERE term IN (SELECT term FROM q) GROUP BY term),
         |grid AS (SELECT sz.shard, sz.cw, q.term FROM sz CROSS JOIN q),
         |belief AS (SELECT grid.shard,
         |    0.4 + 0.6 * (coalesce(sts.df, 0) /
         |                 (coalesce(sts.df, 0) + 50.0 + 150.0 * grid.cw / g.avgcw))
         |        * (ln((g.ns + 0.5) / cf.cf) / ln(g.ns + 1.0)) AS p
         |  FROM grid LEFT JOIN sts USING (shard, term)
         |       JOIN cf USING (term) CROSS JOIN g)
         |SELECT shard, round(sum(p), 6) AS score_r,
         |       row_number() OVER (ORDER BY sum(p) DESC, shard ASC)::BIGINT AS rank
         |FROM belief GROUP BY shard""".stripMargin,
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
    "ft_rollup_facets" ->
      """SELECT coalesce(source, 'ALL') AS repo, coalesce(lang, 'ALL') AS lang,
        |       count(*)::BIGINT AS pages
        |FROM documents GROUP BY ROLLUP (source, lang)""".stripMargin,
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
    // cost twin: dictionary-only join, no postings touch
    "ft_query_cost" -> {
      val qVals = costQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      s"""WITH ${termsCte}, ${tstatsCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |j AS (SELECT q.query_id, t.df FROM q LEFT JOIN tstats t USING (term))
         |SELECT query_id, count(*)::BIGINT AS n_terms, count(df)::BIGINT AS matched,
         |       coalesce(sum(df), 0)::BIGINT AS sum_df,
         |       (CASE WHEN count(df) < count(*) THEN 0
         |             ELSE coalesce(min(df), 0) END)::BIGINT AS est_candidates
         |FROM j GROUP BY query_id""".stripMargin
    },
    // explain twin: top-3 ranking + per-term factor breakdown from the
    // SAME formula fragments (Bm25.sqlIdf/sqlTfNorm compose Bm25.sql)
    "ft_explain" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val idf = Bm25.sqlIdf("t.df", "s.n")
      val tfn = Bm25.sqlTfNorm("p.tf", "d.dl", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id
         |),
         |topk AS (SELECT rank::BIGINT AS rank, doc_id FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
         |  FROM scored WHERE n_terms = ${q2.size}
         |) WHERE rank <= 3)
         |SELECT k.rank, p.doc_id, p.term, p.tf, t.df, d.dl,
         |       round($idf, 4) AS idf_r, round($tfn, 4) AS tfnorm_r,
         |       round($score, 4) AS contrib_r
         |FROM post p JOIN topk k USING (doc_id) JOIN q USING (term)
         |     JOIN tstats t USING (term) JOIN ds d ON p.doc_id = d.doc_id, stats s""".stripMargin
    },
    // recency twin: same conjunctive scored relation × power(0.5, age/HL)
    "ft_recency_topk" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id
         |),
         |dec AS (SELECT doc_id,
         |               score * power(0.5, (doc_id % 365) / 30.0) AS score
         |        FROM scored WHERE n_terms = ${q2.size})
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r
         |  FROM dec
         |) WHERE rank <= 10""".stripMargin
    },
    // grouped top-k twin: same conjunctive scored relation, per-repo
    // row_number heap cut at m = 2
    "ft_group_topk" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id
         |)
         |SELECT repo, grp_rank, doc_id, score_r FROM (
         |  SELECT d.source AS repo,
         |         row_number() OVER (PARTITION BY d.source
         |                            ORDER BY s.score DESC, s.doc_id ASC)::BIGINT AS grp_rank,
         |         s.doc_id, round(s.score, 4) AS score_r
         |  FROM scored s JOIN documents d USING (doc_id)
         |  WHERE s.n_terms = ${q2.size}
         |) WHERE grp_rank <= 2""".stripMargin
    },
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
    // Dirichlet QL twin — SAME matched-only decomposition, same operation
    // order: ln(1 + tf/(μ·(cf/|C|))) summed per doc, + Σln(μ·p_t) − |q|·ln(dl+μ)
    "ft_lm_topk" ->
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${qCte(q2)},
         |tot AS (SELECT sum(dl)::DOUBLE AS c FROM ds),
         |qcf AS (SELECT term, sum(tf)::BIGINT AS cf FROM post JOIN q USING (term) GROUP BY term),
         |qc AS (SELECT sum(ln(2000.0 * (cf / c))) AS qconst, count(*)::DOUBLE AS nq FROM qcf, tot),
         |sd AS (SELECT p.doc_id, sum(ln(1.0 + p.tf / (2000.0 * (f.cf / t.c)))) AS sdelta
         |       FROM post p JOIN qcf f USING (term), tot t GROUP BY p.doc_id),
         |scored AS (SELECT sd.doc_id, sd.sdelta + qc.qconst - qc.nq * ln(d.dl + 2000.0) AS score
         |           FROM sd JOIN ds d USING (doc_id), qc)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r
         |  FROM scored
         |) WHERE rank <= 10""".stripMargin,
    // PL2 twin: the same ln·(1/ln2) decomposition with the same literal
    // constants; lambda = cf/N as the identical IEEE division
    "ft_pl2_topk" ->
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${statsCte}, ${qCte(q2)},
         |qcf AS (SELECT term, sum(tf)::BIGINT AS cf FROM post JOIN q USING (term) GROUP BY term),
         |base AS (SELECT p.doc_id,
         |           (p.tf * ln(1.0 + 1.0 * s.avgdl / d.dl) * 1.4426950408889634) AS tfn,
         |           (f.cf / s.n) AS lambda
         |         FROM post p JOIN qcf f USING (term)
         |              JOIN ds d ON p.doc_id = d.doc_id, stats s),
         |scored AS (SELECT doc_id, sum(
         |    (1.0 / (tfn + 1.0)) * (tfn * ln(tfn / lambda) * 1.4426950408889634
         |      + (lambda - tfn) * 1.4426950408889634
         |      + 0.5 * ln(6.283185307179586 * tfn) * 1.4426950408889634)) AS score
         |  FROM base GROUP BY doc_id)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r FROM scored
         |) WHERE rank <= 10""".stripMargin,
    // impact twin: same BM25 weight chain, same global bounds, the floor
    // is the only discretization point and both engines hit it with the
    // identical IEEE product
    "ft_impact_topk" -> {
      val w = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |wt AS (SELECT p.term, p.doc_id, $w AS w
         |       FROM post p JOIN tstats t USING (term)
         |            JOIN ds d ON p.doc_id = d.doc_id, stats s),
         |b AS (SELECT min(w) AS wmin, max(w) AS wmax FROM wt),
         |qz AS (SELECT term, doc_id,
         |         CASE WHEN b.wmax = b.wmin THEN 1::BIGINT
         |              ELSE (floor((w - b.wmin) / (b.wmax - b.wmin) * 255.0) + 1)::BIGINT
         |         END AS impact
         |       FROM wt, b),
         |cand AS (SELECT doc_id, count(*) AS n_terms, sum(impact)::BIGINT AS impact
         |         FROM qz JOIN q USING (term) GROUP BY doc_id)
         |SELECT rank, doc_id, impact FROM (
         |  SELECT row_number() OVER (ORDER BY impact DESC, doc_id ASC) AS rank,
         |         doc_id, impact FROM cand WHERE n_terms = ${q2.size}
         |) WHERE rank <= 10""".stripMargin
    },
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
    // min-should-match twin: the conjunctive chain with the gate relaxed
    // to >= 2 and the match count carried into the output
    "ft_bm25_mm" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q3)},
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id)
         |SELECT rank, doc_id, n_terms, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, n_terms::BIGINT AS n_terms, round(score, 4) AS score_r
         |  FROM scored WHERE n_terms >= 2
         |) WHERE rank <= 10""".stripMargin
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
    // lnc.ltc twin: same decomposition — doc norms over FULL postings,
    // query idf/norm from the dictionary, candidate sum / dnorm
    "ft_vsm_topk" ->
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |dn AS (SELECT doc_id, sqrt(sum(pow(1.0 + ln(tf), 2))) AS dnorm
         |       FROM post GROUP BY doc_id),
         |qw AS (SELECT q.term, ln((SELECT n FROM stats) / ts.df) AS idf
         |       FROM q JOIN tstats ts USING (term)),
         |qn AS (SELECT sqrt(sum(idf * idf)) AS qnorm FROM qw),
         |sc AS (SELECT p.doc_id,
         |              sum((w.idf / (SELECT qnorm FROM qn)) * (1.0 + ln(p.tf))) AS num
         |       FROM post p JOIN qw w USING (term) GROUP BY p.doc_id)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY num / dn.dnorm DESC, doc_id ASC)::BIGINT AS rank,
         |         doc_id, round(num / dn.dnorm, 4) AS score_r
         |  FROM sc JOIN dn USING (doc_id)
         |) WHERE rank <= 10""".stripMargin,
    "ft_wand_topk" -> bm25TopKSql(q2, 10),
    "ft_bm25_or_topk" -> bm25TopKSql(q2, 10).replace(s"WHERE n_terms = ${q2.size}", ""),
    // MaxScore twin: the plain disjunctive top-k over q3 — the pruning
    // must be invisible in the result
    "ft_maxscore_topk" -> bm25TopKSql(q3, 10).replace(s"WHERE n_terms = ${q3.size}", ""),
    // tiered retrieval SHARES the exhaustive disjunctive twin: the hash
    // equality IS the proof that the tier-1 certificate + fallback return
    // the exact global top-k
    "ft_tiered" -> bm25TopKSql(q2, 10).replace(s"WHERE n_terms = ${q2.size}", ""),
    // synonym-group twin: same pseudo-term decomposition — Σtf per
    // (doc, group), union df per group, conjunctive over groups
    "ft_synonym" -> {
      val synRows = synGroups
        .flatMap { case (g, ms) => ms.map(m => s"('$m', '$g')") }.mkString(", ")
      val score = Bm25.sql("g.gtf", "f.gdf", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${statsCte},
         |syn AS (SELECT * FROM (VALUES $synRows) v(term, grp)),
         |gtf AS (SELECT p.doc_id, s.grp, sum(p.tf)::BIGINT AS gtf
         |        FROM post p JOIN syn s USING (term) GROUP BY p.doc_id, s.grp),
         |gdf AS (SELECT grp, count(*)::BIGINT AS gdf FROM gtf GROUP BY grp),
         |sc AS (SELECT g.doc_id, count(*) AS n_grps, sum($score) AS score
         |       FROM gtf g JOIN gdf f USING (grp) JOIN ds d USING (doc_id), stats s
         |       GROUP BY g.doc_id)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r
         |  FROM sc WHERE n_grps = ${synGroups.size}
         |) WHERE rank <= 10""".stripMargin
    },
    "ft_wand_or_topk" -> bm25TopKSql(q2, 10).replace(s"WHERE n_terms = ${q2.size}", ""),
    "ft_wand_persisted" -> bm25TopKSql(q2, 10),
    "ft_prf" -> prfSql(q2, k = 10, r = 5, e = 3, wOrig = 2),
    "ft_mmr" -> mmrSql(q2, poolSize = 20, k = 5),
    "ft_xquad" -> xquadSql(q2, seedTopics, poolSize = 20, k = 5),
    // lexical CTEs + the cosine twin fused on integer ranks: each
    // reciprocal is one IEEE division, so the fusion is hash-exact
    "hybrid_rrf" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id
         |),
         |lex AS (SELECT doc_id, r FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
         |  FROM scored WHERE n_terms = ${q2.size}) WHERE r <= 10),
         |vq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vscored AS (SELECT e.vec_id, ${cosSql("vq.qv", "e.embedding")} AS cos
         |            FROM embeddings e, vq),
         |vec AS (SELECT vec_id AS doc_id, r FROM (
         |  SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS r
         |  FROM vscored) WHERE r <= 10),
         |fused AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         |                 coalesce(1.0 / (60 + l.r), 0) + coalesce(1.0 / (60 + v.r), 0) AS rrf
         |          FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
         |SELECT rank, doc_id, rrf_r FROM (
         |  SELECT row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank,
         |         doc_id, round(rrf, 6) AS rrf_r FROM fused
         |) WHERE rank <= 10""".stripMargin
    },
    // CombMNZ twin: the same top-10 chains as hybrid_rrf but keeping
    // SCORES; per-system min-max as 1-row aggregates, same MNZ product
    "hybrid_combmnz" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id
         |),
         |lex AS (SELECT doc_id, score FROM (
         |  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
         |  FROM scored WHERE n_terms = ${q2.size}) WHERE r <= 10),
         |vq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vscored AS (SELECT e.vec_id, ${cosSql("vq.qv", "e.embedding")} AS cos
         |            FROM embeddings e, vq),
         |vec AS (SELECT vec_id AS doc_id, cos AS score FROM (
         |  SELECT vec_id, cos, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS r
         |  FROM vscored) WHERE r <= 10),
         |lmm AS (SELECT min(score) AS mn, max(score) AS mx FROM lex),
         |lnorm AS (SELECT doc_id, CASE WHEN mx = mn THEN 1.0
         |            ELSE (score - mn) / (mx - mn) END AS na FROM lex, lmm),
         |vmm AS (SELECT min(score) AS mn, max(score) AS mx FROM vec),
         |vnorm AS (SELECT doc_id, CASE WHEN mx = mn THEN 1.0
         |            ELSE (score - mn) / (mx - mn) END AS nb FROM vec, vmm),
         |fused AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         |            (coalesce(l.na, 0.0) + coalesce(v.nb, 0.0)) *
         |            ((CASE WHEN l.na IS NOT NULL THEN 1 ELSE 0 END
         |              + CASE WHEN v.nb IS NOT NULL THEN 1 ELSE 0 END))::DOUBLE AS mnz
         |          FROM lnorm l FULL OUTER JOIN vnorm v ON l.doc_id = v.doc_id)
         |SELECT rank, doc_id, mnz_r FROM (
         |  SELECT row_number() OVER (ORDER BY mnz DESC, doc_id ASC) AS rank,
         |         doc_id, round(mnz, 6) AS mnz_r FROM fused
         |) WHERE rank <= 10""".stripMargin
    },
    "ft_bm25_page2" -> bm25TopKSql(q2, 20)
      .replace("WHERE rank <= 20", "WHERE rank > 10 AND rank <= 20"),
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
    // cursor page 2 ≡ offset page 2 under the deterministic total order —
    // the twin STATES the equality the cursor plan must reproduce
    "ft_search_after" -> bm25TopKSql(q2, 20)
      .replace("SELECT rank, doc_id, score_r FROM (",
        "SELECT rank - 10 AS rank, doc_id, score_r FROM (")
      .replace("WHERE rank <= 20", "WHERE rank > 10 AND rank <= 20"),
    "ft_boolean" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |c1 AS (SELECT DISTINCT doc_id FROM post WHERE term IN ('join', 'merge')),
         |c2 AS (SELECT doc_id FROM c1
         |       WHERE doc_id IN (SELECT doc_id FROM post WHERE term = 'spark')),
         |cand AS (SELECT doc_id FROM c2
         |         WHERE doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'dup')),
         |scored AS (
         |  SELECT p.doc_id, sum($score) AS score
         |  FROM post p JOIN tstats t USING (term) JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  WHERE p.term IN ('join', 'merge', 'spark')
         |    AND p.doc_id IN (SELECT doc_id FROM cand)
         |  GROUP BY p.doc_id)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r FROM scored)
         |WHERE rank <= 10""".stripMargin
    },
    "ft_year_filter" ->
      """WITH links AS (
        |  SELECT doc_id, 'doc/' || doc_id ||
        |    CASE WHEN doc_id % 4 = 0 THEN '?p=1&year=' || CAST(2020 + doc_id % 12 AS VARCHAR)
        |         WHEN doc_id % 7 = 0 THEN '?q=x'
        |         ELSE '' END AS link
        |  FROM documents)
        |SELECT doc_id, link FROM links
        |WHERE CASE WHEN NOT regexp_matches(link, '^.+\?.+year=\d{4}') THEN true
        |           ELSE CAST(regexp_extract(link, 'year=(\d{4})', 1) AS INT) BETWEEN 2025 AND 2027
        |      END""".stripMargin,
    "ft_valid_paths" ->
      """SELECT doc_id, 'doc/' || doc_id AS path FROM documents
        |WHERE NOT regexp_matches('doc/' || doc_id, '\.(jpg|jpeg|png|gif|pdf|doc|xml|mp3|mp4|zip)$')
        |  AND NOT contains('doc/' || doc_id, '#')""".stripMargin,
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
    },

    "ft_search_lex" -> lexSearchSql(qLexTerms, 10),

    "ft_postings_lex" ->
      s"""WITH ${termsCte}, ${lexCte},
         |lexp AS (SELECT t.doc_id, coalesce(l.form, t.term) AS term
         |         FROM terms t LEFT JOIN lex l ON t.term = l.surface),
         |postx AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM lexp GROUP BY doc_id, term)
         |SELECT doc_id, term, tf FROM postx""".stripMargin,
    "ft_html_extract" ->
      s"""WITH h AS (SELECT doc_id, $htmlWrapSql AS html FROM documents)
         |SELECT doc_id, ${Html.sqlTitle("html")} AS title,
         |       ${Html.sqlExtractText("html")} AS text
         |FROM h""".stripMargin,
    "ft_collapse_repo" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id
         |),
         |pool AS (SELECT doc_id, score FROM (
         |  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM scored WHERE n_terms = ${q2.size}) WHERE rank <= 100),
         |coll AS (SELECT doc_id, score, repo FROM (
         |  SELECT pl.doc_id, pl.score, dd.source AS repo,
         |         row_number() OVER (PARTITION BY dd.source
         |                            ORDER BY pl.score DESC, pl.doc_id ASC) AS rr
         |  FROM pool pl JOIN documents dd USING (doc_id)) WHERE rr = 1)
         |SELECT rank, doc_id, repo, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, repo, round(score, 4) AS score_r
         |  FROM coll) WHERE rank <= 10""".stripMargin
    },
    "ft_snippet" -> snippetSql,
    "ft_snippet_multi" -> snippetMultiSql,
    "ft_positions" ->
      s"""WITH ${tokArrCte},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr)
         |SELECT doc_id, term, count(*)::BIGINT AS tf,
         |       array_to_string(list(pos ORDER BY pos), ',') AS positions_s
         |FROM tp GROUP BY doc_id, term""".stripMargin,
    // front-code twin: same sorted-window lcp (list mismatch scan), same
    // integer byte model, same block restarts
    "ft_dict_frontcode" -> {
      val vb = (x: String) =>
        s"(CASE WHEN $x < 128 THEN 1 WHEN $x < 16384 THEN 2 ELSE 3 END)"
      def chain(dictSel: String, label: String, pfx: String) =
        s"""${pfx}d AS ($dictSel),
           |${pfx}r AS (SELECT term, row_number() OVER (ORDER BY term) AS rn,
           |        coalesce(lag(term, 1) OVER (ORDER BY term), '') AS prev FROM ${pfx}d),
           |${pfx}e AS (SELECT rn, length(term)::BIGINT AS len,
           |        coalesce(list_min(list_filter(range(1, least(length(prev), length(term)) + 1),
           |          i -> substr(prev, i::INT, 1) <> substr(term, i::INT, 1))) - 1,
           |          least(length(prev), length(term)))::BIGINT AS lcp FROM ${pfx}r),
           |${pfx}c AS (SELECT '$label' AS variant, count(*)::BIGINT AS n_terms,
           |        sum(${vb("len")} + len)::BIGINT AS raw_bytes,
           |        sum(CASE WHEN rn % 16 = 1 THEN ${vb("len")} + len
           |                 ELSE ${vb("lcp")} + ${vb("(len - lcp)")} + (len - lcp)
           |            END)::BIGINT AS front_bytes
           |        FROM ${pfx}e)""".stripMargin
      s"""WITH ${termsCte}, ${shinglesCte},
         |${chain("SELECT DISTINCT term FROM terms", "terms", "ta")},
         |${chain("SELECT DISTINCT shingle AS term FROM shd", "shingles", "sa")}
         |SELECT variant, n_terms, raw_bytes, front_bytes,
         |       round(1.0 - front_bytes::DOUBLE / raw_bytes::DOUBLE, 4) AS saved_r
         |FROM (SELECT * FROM tac UNION ALL SELECT * FROM sac)""".stripMargin
    },
    // remap twin: same lag-gap windows, same integer varint thresholds
    "ft_docid_remap" -> {
      val gb = (g: String) =>
        s"""sum(CASE WHEN $g < 128 THEN 1 WHEN $g < 16384 THEN 2
           |         WHEN $g < 2097152 THEN 3 WHEN $g < 268435456 THEN 4
           |         WHEN $g < 34359738368 THEN 5 ELSE 6 END)::BIGINT""".stripMargin
      s"""WITH ${termsCte}, ${postCte},
         |rm AS (SELECT doc_id,
         |         (row_number() OVER (ORDER BY source ASC,
         |            'doc/' || doc_id::VARCHAR ASC, doc_id ASC) - 1)::BIGINT AS new_id
         |       FROM documents),
         |g1 AS (SELECT doc_id - lag(doc_id, 1, -1)
         |         OVER (PARTITION BY term ORDER BY doc_id) AS gap FROM post),
         |c1 AS (SELECT 'original' AS variant, count(*)::BIGINT AS n_postings,
         |              ${gb("gap")} AS gap_bytes FROM g1),
         |post2 AS (SELECT p.term, r.new_id AS doc_id FROM post p JOIN rm r USING (doc_id)),
         |g2 AS (SELECT doc_id - lag(doc_id, 1, -1)
         |         OVER (PARTITION BY term ORDER BY doc_id) AS gap FROM post2),
         |c2 AS (SELECT 'url_sorted' AS variant, count(*)::BIGINT AS n_postings,
         |              ${gb("gap")} AS gap_bytes FROM g2)
         |SELECT variant, n_postings, gap_bytes,
         |       round(gap_bytes::DOUBLE / n_postings, 4) AS bytes_per_posting_r
         |FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)""".stripMargin
    },
    "ft_phrase" -> phraseSql(q2, 10),
    // deliberately the SAME twin as ft_phrase: the biword index must be
    // indistinguishable from the positional intersection for k = 2
    "ft_biword" -> phraseSql(q2, 10),
    // coded-positional shares the phrase oracle: the hash gate proves the
    // varint round-trip loses no position
    "ft_phrase_coded" -> phraseSql(q2, 10),
    "ft_proximity" -> proximitySql(q2, 2, 10),
    "ft_near" -> nearSql(q2, 2, 10),
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
    "ft_pagerank" ->
      s"""WITH $pagerankCtes
         |SELECT rank, doc_id, pr FROM (
         |  SELECT row_number() OVER (ORDER BY pr DESC, doc_id ASC) AS rank, doc_id, pr
         |  FROM p3) WHERE rank <= 20""".stripMargin,
    // TrustRank twin: pagerank chain with the teleport gated by the seed
    // flag and divided by |seeds| instead of N
    "ft_trustrank" -> {
      val S = "1000000000000"
      val tele = s"(15 * ($S // (SELECT k FROM sk))) // 100"
      def iter(prev: String, cur: String) =
        s"""$cur AS (SELECT b.doc_id,
           |  CAST(b.is_seed * ($tele) + (85 * coalesce(s.acc, 0)) // 100 AS BIGINT) AS pr
           |  FROM sbase b LEFT JOIN (
           |    SELECT e.dst AS doc_id, sum(p.pr // o.odeg) AS acc
           |    FROM $prev p JOIN odeg o ON p.doc_id = o.src
           |         JOIN edges e ON p.doc_id = e.src
           |    GROUP BY e.dst) s USING (doc_id))""".stripMargin
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |edges AS (
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM nn) AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM nn) FROM documents),
         |odeg AS (SELECT src, count(*)::BIGINT AS odeg FROM edges GROUP BY src),
         |sbase AS (SELECT doc_id,
         |            CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END::BIGINT AS is_seed
         |          FROM nodes),
         |sk AS (SELECT sum(is_seed)::BIGINT AS k FROM sbase),
         |p0 AS (SELECT doc_id,
         |         CAST(is_seed * ($S // (SELECT k FROM sk)) AS BIGINT) AS pr
         |       FROM sbase),
         |${iter("p0", "p1")},
         |${iter("p1", "p2")},
         |${iter("p2", "p3")}
         |SELECT rank, doc_id, pr FROM (
         |  SELECT row_number() OVER (ORDER BY pr DESC, doc_id ASC) AS rank, doc_id, pr
         |  FROM p3) WHERE rank <= 20""".stripMargin
    },
    // OPIC twin: the identical BIGINT cash/history recurrence unrolled,
    // incl. the (vacuous on this graph) dangling-share division
    "ft_opic" ->
      s"""WITH $opicCtes
         |SELECT rank, doc_id, importance FROM (
         |  SELECT row_number() OVER (ORDER BY h.hist + c.cash DESC, h.doc_id ASC) AS rank,
         |         h.doc_id, (h.hist + c.cash)::BIGINT AS importance
         |  FROM oh3 h JOIN oc3 c USING (doc_id)) WHERE rank <= 20""".stripMargin,
    // crawl-priority twin: OPIC importance feeding the same per-host
    // politeness window
    "ft_crawl_priority" ->
      s"""WITH $opicCtes,
         |imp AS (SELECT h.doc_id, (h.hist + c.cash)::BIGINT AS priority
         |        FROM oh3 h JOIN oc3 c USING (doc_id)),
         |f AS (SELECT d.doc_id, d.source AS host, 'doc/' || d.doc_id::VARCHAR AS path,
         |             i.priority
         |      FROM documents d JOIN imp i USING (doc_id)),
         |sch AS (SELECT host, path, priority,
         |          row_number() OVER (PARTITION BY host
         |            ORDER BY priority DESC, path ASC)::BIGINT AS slot
         |        FROM f)
         |SELECT slot, host, path, priority FROM sch
         |ORDER BY slot ASC, host ASC, path ASC LIMIT 100""".stripMargin,
    // Bloom twin: same mixer family, same distinct-bit relation, and the
    // present column makes any false negative a hash mismatch
    "ft_bloom_dict" -> {
      val th = TextHash.tokenHashSql("term")
      val mixes = (0 until 4).map(i =>
        s"SELECT term, (${TextHash.mixSql(i, th)}) % 65536 AS bit FROM vocab")
        .mkString(" UNION ALL ")
      val pmixes = (0 until 4).map(i =>
        s"SELECT term, (${TextHash.mixSql(i, th)}) % 65536 AS bit FROM pr")
        .mkString(" UNION ALL ")
      s"""WITH ${termsCte},
         |vocab AS (SELECT DISTINCT term FROM terms),
         |bits AS (SELECT DISTINCT bit FROM ($mixes)),
         |pr AS (SELECT unnest(ARRAY[${cmsTerms.map(t => s"'$t'").mkString(", ")}]) AS term),
         |pb AS (SELECT DISTINCT term, bit FROM ($pmixes)),
         |need AS (SELECT term, count(*)::BIGINT AS need FROM pb GROUP BY term),
         |hits AS (SELECT pb.term, count(*)::BIGINT AS hits FROM pb JOIN bits USING (bit)
         |         GROUP BY pb.term)
         |SELECT n.term,
         |       (coalesce(h.hits, 0) = n.need)::BIGINT AS in_bloom,
         |       (CASE WHEN n.term IN (SELECT term FROM vocab) THEN 1 ELSE 0 END)::BIGINT AS present
         |FROM need n LEFT JOIN hits h USING (term)""".stripMargin
    },
    // SALSA twin: identical two-division recurrence unrolled
    "ft_salsa" -> {
      def iter(i: Int) =
        s"""bk$i AS (SELECT a.doc_id AS k, a.auth // ii.ideg AS share
           |         FROM sa${i - 1} a JOIN ideg ii ON a.doc_id = ii.dst),
           |hb$i AS (SELECT h.src, h.hubm // oo.odeg AS hshare FROM (
           |           SELECT e.src, sum(b.share) AS hubm
           |           FROM edges e JOIN bk$i b ON e.dst = b.k GROUP BY e.src
           |         ) h JOIN odeg oo ON h.src = oo.src),
           |sa$i AS (SELECT n.doc_id, coalesce(x.acc, 0)::BIGINT AS auth
           |         FROM nodes n LEFT JOIN (
           |           SELECT e.dst AS doc_id, sum(h.hshare) AS acc
           |           FROM edges e JOIN hb$i h ON e.src = h.src GROUP BY e.dst
           |         ) x USING (doc_id))""".stripMargin
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |edges AS (
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM nn) AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM nn) FROM documents),
         |ideg AS (SELECT dst, count(*)::BIGINT AS ideg FROM edges GROUP BY dst),
         |odeg AS (SELECT src, count(*)::BIGINT AS odeg FROM edges GROUP BY src),
         |sa0 AS (SELECT doc_id, (1000000000000 // (SELECT n FROM nn))::BIGINT AS auth FROM nodes),
         |${iter(1)},
         |${iter(2)}
         |SELECT rank, doc_id, auth FROM (
         |  SELECT row_number() OVER (ORDER BY auth DESC, doc_id ASC) AS rank, doc_id, auth
         |  FROM sa2) WHERE rank <= 20""".stripMargin
    },
    // robots twin: same prefix join, same longest-match allow-wins window
    "ft_robots_filter" ->
      s"""WITH f AS (SELECT doc_id, source AS repo, 'doc/' || doc_id::VARCHAR AS path FROM documents),
         |r AS (SELECT DISTINCT source AS repo, prefix, allow FROM documents,
         |        (VALUES ('doc/1', 0), ('doc/12', 1)) AS t(prefix, allow)),
         |m AS (SELECT doc_id, allow FROM (
         |        SELECT f.doc_id, r.allow,
         |               row_number() OVER (PARTITION BY f.doc_id
         |                 ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
         |        FROM f JOIN r ON f.repo = r.repo AND starts_with(f.path, r.prefix)
         |      ) WHERE rn = 1)
         |SELECT f.doc_id, f.repo, f.path, coalesce(m.allow, 1)::BIGINT AS allowed
         |FROM f LEFT JOIN m USING (doc_id)""".stripMargin,
    "ft_cocitation" ->
      s"""WITH ccn AS (SELECT count(*) AS n FROM documents),
         |cce AS (SELECT DISTINCT src, dst FROM (
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM ccn) AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM ccn) FROM documents)),
         |ccdeg AS (SELECT src FROM cce GROUP BY src HAVING count(*) <= 64),
         |cck AS (SELECT cce.src, cce.dst FROM cce JOIN ccdeg USING (src)),
         |ccp AS (SELECT a.dst AS a_id, b.dst AS b_id, count(*)::BIGINT AS cocite
         |        FROM cck a JOIN cck b ON a.src = b.src AND a.dst < b.dst
         |        GROUP BY a.dst, b.dst)
         |SELECT rank, a_id, b_id, cocite FROM (
         |  SELECT row_number() OVER (ORDER BY cocite DESC, a_id ASC, b_id ASC) AS rank,
         |         a_id, b_id, cocite FROM ccp
         |) WHERE rank <= 25""".stripMargin,
    // the dual twin: prune on IN-degree, pair the citing SOURCES per target
    "ft_coupling" ->
      s"""WITH ccn AS (SELECT count(*) AS n FROM documents),
         |cce AS (SELECT DISTINCT src, dst FROM (
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM ccn) AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM ccn) FROM documents)),
         |ccdeg AS (SELECT dst FROM cce GROUP BY dst HAVING count(*) <= 64),
         |cck AS (SELECT cce.src, cce.dst FROM cce JOIN ccdeg USING (dst)),
         |ccp AS (SELECT a.src AS a_id, b.src AS b_id, count(*)::BIGINT AS couple
         |        FROM cck a JOIN cck b ON a.dst = b.dst AND a.src < b.src
         |        GROUP BY a.src, b.src)
         |SELECT rank, a_id, b_id, couple FROM (
         |  SELECT row_number() OVER (ORDER BY couple DESC, a_id ASC, b_id ASC) AS rank,
         |         a_id, b_id, couple FROM ccp
         |) WHERE rank <= 25""".stripMargin,
    "ft_hits" ->
      s"""WITH $hitsCtes
         |SELECT rank, doc_id, auth, hub FROM (
         |  SELECT row_number() OVER (ORDER BY a.s DESC, a.doc_id ASC) AS rank,
         |         a.doc_id, a.s AS auth, h.s AS hub
         |  FROM a2 a JOIN h2 h USING (doc_id)) WHERE rank <= 20""".stripMargin,
    "ft_anchor_postings" ->
      s"""WITH ${tokArrCte},
         |$anchorCtes
         |SELECT doc_id, term, atf FROM ap""".stripMargin,
    "ft_anchor_search" ->
      s"""WITH ${termsCte}, ${postCte}, ${tokArrCte},
         |$anchorCtes,
         |eff AS (SELECT coalesce(p.doc_id, ap.doc_id) AS doc_id,
         |               coalesce(p.term, ap.term) AS term,
         |               coalesce(p.tf, 0) + 3 * coalesce(ap.atf, 0) AS tf
         |        FROM post p FULL OUTER JOIN ap ON p.doc_id = ap.doc_id AND p.term = ap.term),
         |ds2 AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM eff GROUP BY doc_id),
         |ts2 AS (SELECT term, count(*)::BIGINT AS df FROM eff GROUP BY term),
         |st2 AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         |               (SELECT avg(dl) FROM ds2) AS avgdl),
         |${qCte(q2)},
         |scored AS (
         |  SELECT e.doc_id, count(*) AS n_terms,
         |         sum(${Bm25.sql("e.tf", "t.df", "d.dl", "s.n", "s.avgdl")}) AS score
         |  FROM eff e JOIN q USING (term) JOIN ts2 t USING (term)
         |       JOIN ds2 d ON e.doc_id = d.doc_id, st2 s
         |  GROUP BY e.doc_id)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r
         |  FROM scored WHERE n_terms = ${q2.size}
         |) WHERE rank <= 10""".stripMargin,
    "ft_blend" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |$pagerankCtes,
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY p.doc_id),
         |prm AS (SELECT max(pr)::DOUBLE AS pr_max FROM p3),
         |bl AS (SELECT sc.doc_id,
         |         sc.score * (0.5 + 0.5 * coalesce(p3.pr, 0)::DOUBLE / prm.pr_max) AS blend
         |       FROM scored sc LEFT JOIN p3 ON sc.doc_id = p3.doc_id, prm
         |       WHERE sc.n_terms = ${q2.size})
         |SELECT rank, doc_id, blend_r FROM (
         |  SELECT row_number() OVER (ORDER BY blend DESC, doc_id ASC) AS rank,
         |         doc_id, round(blend, 4) AS blend_r FROM bl) WHERE rank <= 10""".stripMargin
    },
    "ft_bm25f" -> {
      val pred = Analyzer.sqlStopPredicate("term", stops)
      s"""WITH h AS (SELECT doc_id, $htmlWrapSql AS html FROM documents),
         |f AS (SELECT doc_id, ${Html.sqlTitle("html")} AS title,
         |             ${Html.sqlExtractText("html")} AS body FROM h),
         |tt AS (SELECT doc_id, unnest(${Analyzer.sqlTokens("title")}) AS term FROM f),
         |bt AS (SELECT doc_id, unnest(${Analyzer.sqlTokens("body")}) AS term FROM f),
         |tp AS (SELECT doc_id, term, count(*)::BIGINT AS tf_t FROM tt WHERE $pred GROUP BY doc_id, term),
         |bp AS (SELECT doc_id, term, count(*)::BIGINT AS tf_b FROM bt WHERE $pred GROUP BY doc_id, term),
         |eff AS (SELECT coalesce(bp.doc_id, tp.doc_id) AS doc_id,
         |               coalesce(bp.term, tp.term) AS term,
         |               coalesce(tf_b, 0) + 2 * coalesce(tf_t, 0) AS tf
         |        FROM bp FULL OUTER JOIN tp ON bp.doc_id = tp.doc_id AND bp.term = tp.term),
         |ds2 AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM eff GROUP BY doc_id),
         |ts2 AS (SELECT term, count(*)::BIGINT AS df FROM eff GROUP BY term),
         |st2 AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         |               (SELECT avg(dl) FROM ds2) AS avgdl),
         |${qCte(q2)},
         |scored AS (
         |  SELECT e.doc_id, count(*) AS n_terms,
         |         sum(${Bm25.sql("e.tf", "t.df", "d.dl", "s.n", "s.avgdl")}) AS score
         |  FROM eff e JOIN q USING (term) JOIN ts2 t USING (term)
         |       JOIN ds2 d ON e.doc_id = d.doc_id, st2 s
         |  GROUP BY e.doc_id)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r
         |  FROM scored WHERE n_terms = ${q2.size}
         |) WHERE rank <= 10""".stripMargin
    },
    "events_window" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
        |count(*)::BIGINT AS n_events,
        |sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    // as-of twin: DuckDB's NATIVE ASOF JOIN (inclusive l.ts >= r.ts) — a
    // genuinely different algorithm from the engine's union+window plan
    "events_asof" ->
      """WITH cl AS (SELECT event_id, user_id, ts FROM events
        |            WHERE event_type = 'click'),
        |dim AS (SELECT user_id, ts, max(event_id)::BIGINT AS version
        |        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, coalesce(r.version, -1)::BIGINT AS version
        |FROM cl l ASOF LEFT JOIN dim r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    // winnowing twin: positional 3-shingle hashes, 4-hash window minima
    // (full windows only), distinct fingerprints, pruned self-join
    "dedup_winnow" ->
      s"""WITH ${tokArrCte},
         |shp AS (SELECT doc_id, i AS pos, arr[i + 1] || ' ' || arr[i + 2] || ' ' || arr[i + 3] AS sh
         |        FROM (SELECT doc_id, arr, unnest(range(greatest(len(arr) - 2, 0))) AS i
         |              FROM tokarr)),
         |shh AS (SELECT doc_id, pos, ${tokenHashSqlInner("sh")} AS h FROM shp),
         |wmin AS (SELECT doc_id,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
         |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
         |  FROM shh),
         |fps AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE cnt = 4),
         |kept AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 1000),
         |fk AS (SELECT doc_id, fp FROM fps JOIN kept USING (fp))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS shared
         |FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2""".stripMargin,
    "events_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, epoch_us(date_trunc('day', ts)) AS day_us FROM events),
        |fst AS (SELECT user_id, min(day_us) AS cohort_us FROM act GROUP BY user_id)
        |SELECT f.cohort_us, (a.day_us - f.cohort_us) // 86400000000 AS k,
        |       count(*)::BIGINT AS users
        |FROM act a JOIN fst f USING (user_id)
        |WHERE (a.day_us - f.cohort_us) // 86400000000 <= 7
        |GROUP BY 1, 2""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY e.user_id)
        |SELECT 1::BIGINT AS step, 'view' AS event_type, (SELECT count(*) FROM s1)::BIGINT AS users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin,
    "events_bursts" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket, count(*)::BIGINT AS cnt
        |           FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, bucket, cnt,
        |        coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
        |          ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS trail,
        |        count(cnt) OVER (PARTITION BY event_type ORDER BY bucket
        |          ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS nprev
        |      FROM b)
        |SELECT event_type, epoch_us(bucket) AS bucket_us, cnt, trail,
        |       (nprev = 6 AND cnt * 6 > 2 * trail) AS is_burst
        |FROM t""".stripMargin,
    "ft_champions" -> championsSql,
    // the persisted variant must agree with the SAME oracle — the artifact
    // round trip (write → manifest lineage → bucket-pruned cold read) is
    // exactly what the shared twin proves lossless
    "ft_champions_persisted" -> championsSql,
    "ft_facets" -> facetsSql,
    "text_keywords" ->
      s"""WITH ${termsCte}, ${postCte}, ${tstatsCte},
         |kw AS (SELECT doc_id, term,
         |              tf * ln((SELECT count(*) FROM documents)::DOUBLE / df) AS wt
         |       FROM post JOIN tstats USING (term) WHERE df >= 2),
         |rk AS (SELECT doc_id, term, wt,
         |              row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, term ASC) AS kw_rank
         |       FROM kw)
         |SELECT doc_id, kw_rank, term, round(wt, 4) AS wt_r FROM rk WHERE kw_rank <= 5""".stripMargin,
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
         |WHERE rank <= 10""".stripMargin,
    "events_props" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
        |max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
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
    // cascade twin: the same three funnels with the same cuts
    "ft_cascade" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val shifts = q2.zipWithIndex.map { case (t, i) =>
        s"SELECT doc_id, pos - $i AS start FROM tpc WHERE term = '$t'"
      }.mkString("\n  UNION ALL ")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |${tokArrCte},
         |m AS (SELECT p.* FROM post p JOIN q USING (term)),
         |c1 AS (SELECT doc_id FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY stf DESC, doc_id ASC) AS r FROM (
         |    SELECT doc_id, sum(tf) AS stf FROM m GROUP BY doc_id)) WHERE r <= 50),
         |s2 AS (SELECT p.doc_id, sum($score) AS score
         |       FROM m p JOIN c1 USING (doc_id) JOIN tstats t USING (term)
         |            JOIN ds d ON p.doc_id = d.doc_id, stats s
         |       GROUP BY p.doc_id),
         |c2 AS (SELECT doc_id, score FROM (
         |  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
         |  FROM s2) WHERE r <= 20),
         |tp0 AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
         |tpc AS (SELECT tp0.* FROM tp0 JOIN c2 USING (doc_id)),
         |mm2 AS ($shifts),
         |hits AS (SELECT doc_id, start FROM mm2 GROUP BY doc_id, start
         |         HAVING count(*) = ${q2.size}),
         |ph AS (SELECT doc_id, count(*)::BIGINT AS phrase_tf FROM hits GROUP BY doc_id),
         |s3 AS (SELECT c2.doc_id,
         |         c2.score + 0.5 * ln(1.0 + coalesce(ph.phrase_tf, 0)) AS score
         |       FROM c2 LEFT JOIN ph USING (doc_id))
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r FROM s3) WHERE rank <= 10""".stripMargin
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
    "events_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS nw
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |),
        |s AS (SELECT user_id, ts,
        |        sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM x)
        |SELECT user_id, session_idx::BIGINT AS session_idx, count(*)::BIGINT AS n_events,
        |       epoch_us(min(ts)) AS t_start_us, epoch_us(max(ts)) AS t_end_us
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "ft_batch_bm25" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |qn AS (SELECT query_id, count(*) AS q_n FROM q GROUP BY query_id),
         |scored AS (
         |  SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY q.query_id, p.doc_id)
         |SELECT query_id, rank, doc_id, score_r FROM (
         |  SELECT s.query_id,
         |         row_number() OVER (PARTITION BY s.query_id
         |                            ORDER BY s.score DESC, s.doc_id ASC) AS rank,
         |         s.doc_id, round(s.score, 4) AS score_r
         |  FROM scored s JOIN qn USING (query_id) WHERE s.n_terms = qn.q_n
         |) WHERE rank <= 10""".stripMargin
    },
    // hard-negative twin: disjunctive batch ranking, anti-join conjunctive
    // qrels, per-query top-5 survivors by rank
    "ltr_hard_negatives" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |qn AS (SELECT query_id, count(*) AS q_n FROM q GROUP BY query_id),
         |scored AS (
         |  SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY q.query_id, p.doc_id),
         |ranking AS (SELECT query_id, rank, doc_id FROM (
         |  SELECT query_id,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         |         doc_id
         |  FROM scored) WHERE rank <= 20),
         |qrels AS (
         |  SELECT x.query_id, x.doc_id FROM (
         |    SELECT q.query_id, p.doc_id, count(*) AS n_terms
         |    FROM post p JOIN q USING (term) GROUP BY q.query_id, p.doc_id
         |  ) x JOIN qn USING (query_id) WHERE x.n_terms = qn.q_n)
         |SELECT query_id, neg_rank, doc_id, rank FROM (
         |  SELECT r.query_id, r.doc_id, r.rank,
         |         row_number() OVER (PARTITION BY r.query_id
         |                            ORDER BY r.rank ASC)::BIGINT AS neg_rank
         |  FROM ranking r ANTI JOIN qrels USING (query_id, doc_id)
         |) WHERE neg_rank <= 5""".stripMargin
    },
    // nDCG@10 + MAP@10 twin: identical gain formula ((2^grade − 1)/ln(rank+1),
    // base cancels in the ratio), identical ideal-tie order (grade desc,
    // doc_id asc), AP denominator = |relevant| in the FULL qrels
    "ft_eval_metrics" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |qn AS (SELECT query_id, count(*) AS q_n FROM q GROUP BY query_id),
         |scored AS (
         |  SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY q.query_id, p.doc_id),
         |ranking AS (SELECT query_id, rank, doc_id FROM (
         |  SELECT s.query_id,
         |         row_number() OVER (PARTITION BY s.query_id
         |                            ORDER BY s.score DESC, s.doc_id ASC)::BIGINT AS rank,
         |         s.doc_id
         |  FROM scored s JOIN qn USING (query_id) WHERE s.n_terms = qn.q_n
         |) WHERE rank <= 10),
         |qrels AS (
         |  SELECT x.query_id, x.doc_id, least(x.stf, 3)::BIGINT AS grade FROM (
         |    SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum(p.tf)::BIGINT AS stf
         |    FROM post p JOIN q USING (term) GROUP BY q.query_id, p.doc_id
         |  ) x JOIN qn USING (query_id) WHERE x.n_terms = qn.q_n),
         |j AS (SELECT r.query_id, r.rank, coalesce(qr.grade, 0)::BIGINT AS grade
         |      FROM ranking r LEFT JOIN qrels qr
         |           ON r.query_id = qr.query_id AND r.doc_id = qr.doc_id),
         |dcg AS (SELECT query_id, sum((power(2.0, grade) - 1.0) / ln(rank + 1.0)) AS dcg
         |        FROM j GROUP BY query_id),
         |ideal AS (SELECT query_id, sum((power(2.0, grade) - 1.0) / ln(irank + 1.0)) AS idcg
         |          FROM (SELECT query_id, grade,
         |                       row_number() OVER (PARTITION BY query_id
         |                                          ORDER BY grade DESC, doc_id ASC)::BIGINT AS irank
         |                FROM qrels) WHERE irank <= 10 GROUP BY query_id),
         |ap1 AS (SELECT query_id, rank, grade,
         |               sum(CASE WHEN grade >= 2 THEN 1 ELSE 0 END)
         |                 OVER (PARTITION BY query_id ORDER BY rank
         |                       ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM j),
         |apq AS (SELECT query_id,
         |               sum(CASE WHEN grade >= 2 THEN cum::DOUBLE / rank::DOUBLE
         |                        ELSE 0.0 END) AS sump
         |        FROM ap1 GROUP BY query_id),
         |nrel AS (SELECT query_id, count(*)::BIGINT AS n_rel
         |         FROM qrels WHERE grade >= 2 GROUP BY query_id)
         |SELECT d.query_id, round(d.dcg / i.idcg, 4) AS ndcg_r,
         |       round(CASE WHEN coalesce(n.n_rel, 0) > 0 THEN a.sump / n.n_rel
         |                  ELSE 0.0 END, 4) AS ap_r
         |FROM dcg d JOIN ideal i USING (query_id) JOIN apq a USING (query_id)
         |     LEFT JOIN nrel n USING (query_id)""".stripMargin
    },
    // RBP/ERR twin: same ranking + qrels chain as eval_metrics; the
    // cascade product is the same exp(Σ ln(1−stop)) preceding-rows window,
    // (1−p) left as the literal subtraction so both engines fold it alike
    "ft_eval_rbp" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |qn AS (SELECT query_id, count(*) AS q_n FROM q GROUP BY query_id),
         |scored AS (
         |  SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY q.query_id, p.doc_id),
         |ranking AS (SELECT query_id, rank, doc_id FROM (
         |  SELECT s.query_id,
         |         row_number() OVER (PARTITION BY s.query_id
         |                            ORDER BY s.score DESC, s.doc_id ASC)::BIGINT AS rank,
         |         s.doc_id
         |  FROM scored s JOIN qn USING (query_id) WHERE s.n_terms = qn.q_n
         |) WHERE rank <= 10),
         |qrels AS (
         |  SELECT x.query_id, x.doc_id, least(x.stf, 3)::BIGINT AS grade FROM (
         |    SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum(p.tf)::BIGINT AS stf
         |    FROM post p JOIN q USING (term) GROUP BY q.query_id, p.doc_id
         |  ) x JOIN qn USING (query_id) WHERE x.n_terms = qn.q_n),
         |j AS (SELECT r.query_id, r.rank, coalesce(qr.grade, 0)::BIGINT AS grade
         |      FROM ranking r LEFT JOIN qrels qr
         |           ON r.query_id = qr.query_id AND r.doc_id = qr.doc_id),
         |m AS (SELECT query_id, rank,
         |             (grade::DOUBLE / 3.0) AS u,
         |             (power(2.0, grade) - 1.0) / 8.0 AS stop
         |      FROM j),
         |sv AS (SELECT query_id, rank, u, stop,
         |             exp(coalesce(sum(ln(1.0 - stop))
         |               OVER (PARTITION BY query_id ORDER BY rank
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)) AS surv
         |       FROM m)
         |SELECT query_id,
         |       round(sum((1.0 - 0.8) * u * power(0.8, rank - 1)), 4) AS rbp_r,
         |       round(sum(stop / rank::DOUBLE * surv), 4) AS err_r
         |FROM sv GROUP BY query_id""".stripMargin
    },
    // TAAT Quit/Continue twin: same rarest-first order, same densified
    // accumulator window, same budget N//2
    "ft_taat_quit" -> {
      val w = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q3)},
         |ord AS (SELECT term, row_number() OVER (ORDER BY df ASC, term ASC)::BIGINT AS idx
         |        FROM tstats JOIN q USING (term)),
         |m AS (SELECT p.doc_id, o.idx, $w AS w
         |      FROM post p JOIN ord o USING (term) JOIN tstats t USING (term)
         |           JOIN ds d ON p.doc_id = d.doc_id, stats s),
         |fi AS (SELECT doc_id, min(idx) AS first_idx FROM m GROUP BY doc_id),
         |created AS (SELECT first_idx, count(*)::BIGINT AS n_new FROM fi GROUP BY first_idx),
         |cum AS (SELECT o.idx, sum(coalesce(c.n_new, 0))
         |          OVER (ORDER BY o.idx ROWS UNBOUNDED PRECEDING) AS acc
         |        FROM ord o LEFT JOIN created c ON o.idx = c.first_idx),
         |istar AS (SELECT coalesce(max(idx), 0)::BIGINT AS i FROM cum
         |          WHERE acc <= (SELECT count(*) FROM documents) // 2),
         |adm AS (SELECT doc_id FROM fi, istar WHERE first_idx <= istar.i),
         |qs AS (SELECT m.doc_id, sum(m.w) AS score FROM m, istar
         |       WHERE m.idx <= istar.i GROUP BY m.doc_id),
         |cs AS (SELECT m.doc_id, sum(m.w) AS score
         |       FROM m JOIN adm USING (doc_id) GROUP BY m.doc_id),
         |rq AS (SELECT 'quit' AS strategy,
         |              row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         |              doc_id, round(score, 4) AS score_r FROM qs),
         |rc AS (SELECT 'continue' AS strategy,
         |              row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         |              doc_id, round(score, 4) AS score_r FROM cs)
         |SELECT * FROM rq WHERE rank <= 10
         |UNION ALL SELECT * FROM rc WHERE rank <= 10""".stripMargin
    },
    // static-cache twin: same argmax-tf stream, same even/odd split, same
    // top-C frequency cut
    "ft_cache_static" ->
      s"""WITH ${termsCte}, ${postCte},
         |stream AS (SELECT doc_id AS event_id, term AS query FROM (
         |    SELECT doc_id, term,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS r
         |    FROM post) WHERE r = 1),
         |train AS (SELECT query FROM stream WHERE event_id % 2 = 0),
         |ev AS (SELECT query FROM stream WHERE event_id % 2 = 1),
         |freq AS (SELECT query, count(*)::BIGINT AS f FROM train GROUP BY query),
         |cache AS (SELECT query FROM (
         |    SELECT query, row_number() OVER (ORDER BY f DESC, query ASC) AS r FROM freq
         |  ) WHERE r <= 8)
         |SELECT 8::BIGINT AS c_size,
         |       (SELECT count(*) FROM ev)::BIGINT AS n_eval,
         |       (SELECT count(*) FROM ev JOIN cache USING (query))::BIGINT AS hits_static,
         |       (SELECT count(*) FROM ev JOIN freq USING (query))::BIGINT AS hits_infinite""".stripMargin,
    // Gini twin: same frequency table, same ascending rank window, one
    // final division
    "ft_query_gini" ->
      s"""WITH ${termsCte}, ${postCte},
         |stream AS (SELECT doc_id AS event_id, term AS query FROM (
         |    SELECT doc_id, term,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS r
         |    FROM post) WHERE r = 1),
         |freq AS (SELECT query, count(*)::BIGINT AS f FROM stream GROUP BY query),
         |st AS (SELECT count(*)::BIGINT AS n, sum(f)::BIGINT AS tot FROM freq),
         |rk AS (SELECT f, query,
         |         row_number() OVER (ORDER BY f ASC, query ASC)::BIGINT AS i FROM freq)
         |SELECT st.tot AS n_queries, st.n AS distinct_queries,
         |       round(sum((2 * rk.i - st.n - 1) * rk.f)::DOUBLE
         |             / (st.n * st.tot)::DOUBLE, 4) AS gini_r
         |FROM rk, st GROUP BY st.n, st.tot""".stripMargin,
    // posting-cache twin: same argmax stream, same QTF/DF ranking, same
    // cumulative-df budget cut
    "ft_cache_postings" ->
      s"""WITH ${termsCte}, ${postCte}, ${tstatsCte},
         |stream AS (SELECT doc_id AS event_id, term AS query FROM (
         |    SELECT doc_id, term,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS r
         |    FROM post) WHERE r = 1),
         |qtf AS (SELECT query AS term, count(*)::BIGINT AS qtf FROM stream GROUP BY query),
         |b AS (SELECT sum(df) // 10 AS budget FROM tstats),
         |ranked AS (SELECT t.term, q.qtf, t.df,
         |             sum(t.df) OVER (ORDER BY q.qtf::DOUBLE / t.df::DOUBLE DESC, t.term ASC
         |                             ROWS UNBOUNDED PRECEDING) AS cum_df
         |           FROM qtf q JOIN tstats t USING (term)),
         |p AS (SELECT count(*)::BIGINT AS pinned_terms,
         |             coalesce(sum(df), 0)::BIGINT AS pinned_df,
         |             coalesce(sum(qtf), 0)::BIGINT AS hit_mass
         |      FROM ranked, b WHERE cum_df <= b.budget)
         |SELECT b.budget::BIGINT AS budget, p.pinned_terms, p.pinned_df, p.hit_mass,
         |       (SELECT count(*) FROM stream)::BIGINT AS total_mass
         |FROM p, b""".stripMargin,
    // recrawl-rate twin: the kept/changed synthesis replicated (deleted
    // %17, changed %13 — added pages join to nothing), same Poisson MLE
    "ft_recrawl_rate" ->
      s"""WITH c AS (SELECT source AS repo,
         |             count(*) FILTER (WHERE doc_id % 17 <> 0)::BIGINT AS n_common,
         |             count(*) FILTER (WHERE doc_id % 17 <> 0 AND doc_id % 13 = 0)::BIGINT AS n_changed
         |           FROM documents GROUP BY source)
         |SELECT repo, n_common, n_changed,
         |       round(n_changed::DOUBLE / n_common::DOUBLE, 4) AS change_frac_r,
         |       CASE WHEN n_changed = n_common THEN NULL
         |            ELSE round(-ln(1.0 - n_changed::DOUBLE / n_common::DOUBLE), 4)
         |       END AS lambda_r
         |FROM c""".stripMargin,
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
    // skip-study twin: same integer closed forms (shared IEEE floor-sqrt,
    // bin()-length bitlen)
    "ft_skip_study" -> {
      val ts = Seq("dup", "hash", "join", "spark")
      val prVals = (for { i <- ts.indices; j <- i + 1 until ts.size }
        yield s"('${ts(i)}', '${ts(j)}')").mkString(", ")
      s"""WITH ${termsCte}, ${tstatsCte},
         |prs AS (SELECT * FROM (VALUES $prVals) v(term_a, term_b)),
         |j AS (SELECT p.term_a, p.term_b, ta.df AS dfa, tb.df AS dfb
         |      FROM prs p JOIN tstats ta ON ta.term = p.term_a
         |           JOIN tstats tb ON tb.term = p.term_b),
         |c AS (SELECT term_a, term_b, least(dfa, dfb) AS m, greatest(dfa, dfb) AS n FROM j),
         |k AS (SELECT *, CAST(floor(sqrt(n::DOUBLE)) AS BIGINT) AS k FROM c)
         |SELECT term_a, term_b, m, n, (m + n)::BIGINT AS cost_linear,
         |       (n // k + m * k)::BIGINT AS cost_skip_sqrt,
         |       (2 * m * length(bin(n // m)))::BIGINT AS cost_gallop
         |FROM k""".stripMargin
    },
    // TA twin: same rank windows, same marginal-threshold join, same
    // running max over the densified depth axis
    "ft_fagin_ta" ->
      s"""WITH $pagerankCtes,
         |idg AS (SELECT dst AS doc_id, count(*)::BIGINT AS b FROM edges GROUP BY dst),
         |at AS (SELECT p.doc_id, p.pr AS a, coalesce(i.b, 0)::BIGINT AS b,
         |              (coalesce(i.b, 0) * 1000000000000 + p.pr)::BIGINT AS f
         |       FROM p3 p LEFT JOIN idg i USING (doc_id)),
         |rk AS (SELECT doc_id, a, b, f,
         |         row_number() OVER (ORDER BY a DESC, doc_id ASC)::BIGINT AS da,
         |         row_number() OVER (ORDER BY b DESC, doc_id ASC)::BIGINT AS db
         |       FROM at),
         |rk2 AS (SELECT *, least(da, db) AS seen_d FROM rk),
         |tau AS (SELECT x.d, (y.bv * 1000000000000 + x.av)::BIGINT AS tau
         |        FROM (SELECT da AS d, a AS av FROM rk2) x
         |             JOIN (SELECT db AS d, b AS bv FROM rk2) y USING (d)),
         |bd AS (SELECT seen_d AS d, max(f) AS bf FROM rk2 GROUP BY seen_d),
         |dn AS (SELECT t.d, t.tau,
         |         max(coalesce(b.bf, -9223372036854775808))
         |           OVER (ORDER BY t.d ROWS UNBOUNDED PRECEDING) AS runbest
         |       FROM tau t LEFT JOIN bd b USING (d)),
         |ds AS (SELECT min(d)::BIGINT AS d_star FROM dn WHERE runbest >= tau),
         |tp AS (SELECT doc_id AS top_doc, f AS top_f FROM at
         |       ORDER BY f DESC, doc_id ASC LIMIT 1)
         |SELECT (SELECT count(*) FROM at)::BIGINT AS n_docs, ds.d_star,
         |       ds.d_star * 1000 // (SELECT count(*) FROM at) AS scanned_permille,
         |       tp.top_doc, tp.top_f
         |FROM ds, tp""".stripMargin,
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
    // interleave twin: both batch ranking chains, the same coin, the same
    // closed-form slot merge
    "ft_interleave" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      val aLeads = s"(${TextHash.mixSql(13, tokenHashSqlInner("query_id::VARCHAR"))}) % 2 = 0"
      def rankChain(postRel: String, pfx: String) =
        s"""${pfx}scored AS (
           |  SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum($score) AS score
           |  FROM $postRel p JOIN q USING (term) JOIN tstats t USING (term)
           |       JOIN ds d ON p.doc_id = d.doc_id, stats s
           |  GROUP BY q.query_id, p.doc_id),
           |${pfx}ranking AS (SELECT query_id, rank, doc_id FROM (
           |  SELECT s.query_id,
           |         row_number() OVER (PARTITION BY s.query_id
           |                            ORDER BY s.score DESC, s.doc_id ASC)::BIGINT AS rank,
           |         s.doc_id
           |  FROM ${pfx}scored s JOIN qn USING (query_id) WHERE s.n_terms = qn.q_n
           |) WHERE rank <= 10)""".stripMargin
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |qn AS (SELECT query_id, count(*) AS q_n FROM q GROUP BY query_id),
         |cpost AS (SELECT doc_id, term, least(tf, 1)::BIGINT AS tf FROM post),
         |${rankChain("post", "ra_")},
         |${rankChain("cpost", "rb_")},
         |ab AS (SELECT query_id, doc_id,
         |         rank * 2 - (CASE WHEN $aLeads THEN 1 ELSE 0 END) AS slot
         |       FROM ra_ranking
         |       UNION ALL
         |       SELECT query_id, doc_id,
         |         rank * 2 - (CASE WHEN $aLeads THEN 0 ELSE 1 END)
         |       FROM rb_ranking),
         |mg AS (SELECT query_id, doc_id, min(slot)::BIGINT AS slot
         |       FROM ab GROUP BY query_id, doc_id),
         |tm AS (SELECT query_id, doc_id, slot,
         |         CASE WHEN (slot % 2 = 1) = ($aLeads) THEN 'A' ELSE 'B' END AS team
         |       FROM mg)
         |SELECT query_id, irank, doc_id, team, slot FROM (
         |  SELECT query_id, doc_id, slot, team,
         |         row_number() OVER (PARTITION BY query_id ORDER BY slot ASC)::BIGINT AS irank
         |  FROM tm) WHERE irank <= 10""".stripMargin
    },
    // NQC twin: same batch scored chain, population σ over the top-k
    // scores normalized by their mean
    "ft_qpp_nqc" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |qn AS (SELECT query_id, count(*) AS q_n FROM q GROUP BY query_id),
         |scored AS (
         |  SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum($score) AS score
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY q.query_id, p.doc_id),
         |ranking AS (SELECT query_id, score FROM (
         |  SELECT s.query_id, s.score,
         |         row_number() OVER (PARTITION BY s.query_id
         |                            ORDER BY s.score DESC, s.doc_id ASC)::BIGINT AS rank
         |  FROM scored s JOIN qn USING (query_id) WHERE s.n_terms = qn.q_n
         |) WHERE rank <= 10)
         |SELECT query_id, count(*)::BIGINT AS k_n,
         |       round(stddev_pop(score) / avg(score), 4) AS nqc_r
         |FROM ranking GROUP BY query_id""".stripMargin
    },
    // bootstrap twin: BOTH nDCG chains (full vs tf-capped postings) over
    // the same df-top-40 query log, integer micro-unit deltas, and the
    // exact hash-replayed draw table (id = resample·nq + slot)
    "ft_eval_bootstrap" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      def ndcgChain(postRel: String, pfx: String) =
        s"""${pfx}scored AS (
           |  SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum($score) AS score
           |  FROM $postRel p JOIN q USING (term) JOIN tstats t USING (term)
           |       JOIN ds d ON p.doc_id = d.doc_id, stats s
           |  GROUP BY q.query_id, p.doc_id),
           |${pfx}ranking AS (SELECT query_id, rank, doc_id FROM (
           |  SELECT s.query_id,
           |         row_number() OVER (PARTITION BY s.query_id
           |                            ORDER BY s.score DESC, s.doc_id ASC)::BIGINT AS rank,
           |         s.doc_id
           |  FROM ${pfx}scored s JOIN qn USING (query_id) WHERE s.n_terms = qn.q_n
           |) WHERE rank <= 10),
           |${pfx}j AS (SELECT r.query_id, r.rank, coalesce(qr.grade, 0)::BIGINT AS grade
           |      FROM ${pfx}ranking r LEFT JOIN qrels qr
           |           ON r.query_id = qr.query_id AND r.doc_id = qr.doc_id),
           |${pfx}dcg AS (SELECT query_id, sum((power(2.0, grade) - 1.0) / ln(rank + 1.0)) AS dcg
           |        FROM ${pfx}j GROUP BY query_id),
           |${pfx}nd AS (SELECT dd.query_id, dd.dcg / i.idcg AS ndcg
           |        FROM ${pfx}dcg dd JOIN ideal i USING (query_id))""".stripMargin
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |qt AS (SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS i
         |       FROM tstats ORDER BY df DESC, term ASC LIMIT 40),
         |q AS (SELECT (i // 2)::BIGINT AS query_id, term FROM qt),
         |qn AS (SELECT query_id, count(*) AS q_n FROM q GROUP BY query_id),
         |qrels AS (
         |  SELECT x.query_id, x.doc_id, least(x.stf, 3)::BIGINT AS grade FROM (
         |    SELECT q.query_id, p.doc_id, count(*) AS n_terms, sum(p.tf)::BIGINT AS stf
         |    FROM post p JOIN q USING (term) GROUP BY q.query_id, p.doc_id
         |  ) x JOIN qn USING (query_id) WHERE x.n_terms = qn.q_n),
         |ideal AS (SELECT query_id, sum((power(2.0, grade) - 1.0) / ln(irank + 1.0)) AS idcg
         |          FROM (SELECT query_id, grade,
         |                       row_number() OVER (PARTITION BY query_id
         |                                          ORDER BY grade DESC, doc_id ASC)::BIGINT AS irank
         |                FROM qrels) WHERE irank <= 10 GROUP BY query_id),
         |cpost AS (SELECT doc_id, term, least(tf, 1)::BIGINT AS tf FROM post),
         |${ndcgChain("post", "ra_")},
         |${ndcgChain("cpost", "rb_")},
         |del AS (SELECT x.query_id,
         |          CAST(round((x.ndcg - y.ndcg) * 1000000.0) AS BIGINT) AS du
         |        FROM ra_nd x JOIN rb_nd y USING (query_id)),
         |idx AS (SELECT du, row_number() OVER (ORDER BY query_id ASC) - 1 AS qidx FROM del),
         |nqv AS (SELECT count(*)::BIGINT AS nq FROM del),
         |draws AS (SELECT r.range AS bs,
         |                 (r.range * (SELECT nq FROM nqv) + s.qidx) AS id
         |          FROM range(200) r CROSS JOIN idx s),
         |dpick AS (SELECT bs,
         |            (${TextHash.mixSql(11, tokenHashSqlInner("id::VARCHAR"))})
         |              % (SELECT nq FROM nqv) AS pick
         |          FROM draws),
         |bsum AS (SELECT d.bs, sum(i.du) AS sdu
         |         FROM dpick d JOIN idx i ON d.pick = i.qidx GROUP BY d.bs),
         |obs AS (SELECT sum(du)::BIGINT AS odu FROM del)
         |SELECT (SELECT nq FROM nqv) AS n_queries,
         |       count(*)::BIGINT AS n_resamples,
         |       round((SELECT odu FROM obs)::DOUBLE
         |             / ((SELECT nq FROM nqv) * 1000000.0), 4) AS mean_delta_r,
         |       round(sum(CASE WHEN sdu <= 0 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS p_r,
         |       (CASE WHEN sum(CASE WHEN sdu <= 0 THEN 1 ELSE 0 END) * 20 < count(*)
         |             THEN 1 ELSE 0 END)::BIGINT AS significant
         |FROM bsum""".stripMargin
    },
    "ltr_features" -> {
      val idf = "ln((((SELECT n FROM stats) - t.df + 0.5) / (t.df + 0.5)) + 1.0)"
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte},
         |$pagerankCtes,
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |qn AS (SELECT query_id, count(*)::BIGINT AS q_n FROM q GROUP BY query_id),
         |cand AS (
         |  SELECT q.query_id, p.doc_id,
         |         count(*)::BIGINT AS f_matched,
         |         sum(p.tf)::BIGINT AS f_sum_tf,
         |         max(p.tf)::BIGINT AS f_max_tf,
         |         max(d.dl)::BIGINT AS f_dl,
         |         sum($idf) AS f_idf,
         |         sum($score) AS f_bm25
         |  FROM post p JOIN q USING (term) JOIN tstats t USING (term)
         |       JOIN ds d ON p.doc_id = d.doc_id, stats s
         |  GROUP BY q.query_id, p.doc_id)
         |SELECT query_id, rank, doc_id, f_matched, q_n, f_sum_tf, f_max_tf,
         |       f_dl, f_idf_r, f_bm25_r, f_prior
         |FROM (
         |  SELECT c.query_id,
         |         row_number() OVER (PARTITION BY c.query_id
         |                            ORDER BY c.f_bm25 DESC, c.doc_id ASC)::BIGINT AS rank,
         |         c.doc_id, c.f_matched, qn.q_n, c.f_sum_tf, c.f_max_tf, c.f_dl,
         |         round(c.f_idf, 4) AS f_idf_r, round(c.f_bm25, 4) AS f_bm25_r,
         |         coalesce(p3.pr, 0)::BIGINT AS f_prior
         |  FROM cand c JOIN qn USING (query_id)
         |       LEFT JOIN p3 ON c.doc_id = p3.doc_id
         |) WHERE rank <= 10""".stripMargin
    },
    "ft_percolate" -> {
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      s"""WITH ${termsCte}, ${postCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |qn AS (SELECT query_id, count(*) AS q_n FROM q GROUP BY query_id)
         |SELECT p.doc_id, q.query_id
         |FROM post p JOIN q USING (term) JOIN qn ON q.query_id = qn.query_id
         |GROUP BY p.doc_id, q.query_id, qn.q_n
         |HAVING count(*) = qn.q_n""".stripMargin
    },
    "ft_postings_ru" ->
      s"""WITH ru AS (SELECT doc_id, $ruWrapSql AS rtext FROM documents),
         |rt AS (SELECT doc_id, unnest(${Analyzer.sqlTokensRu("rtext")}) AS term FROM ru),
         |rterms AS (SELECT doc_id, term FROM rt
         |           WHERE ${Analyzer.sqlStopPredicate("term", Analyzer.ruStop)}),
         |$ruLexCte,
         |lexp AS (SELECT t.doc_id, coalesce(l.form, t.term) AS term
         |         FROM rterms t LEFT JOIN rulex l ON t.term = l.surface)
         |SELECT doc_id, term, count(*)::BIGINT AS tf FROM lexp GROUP BY doc_id, term""".stripMargin,
    // grouped-KMV twin: same (day, hash) distinct, same per-day rank cut,
    // same (k−1)·P/h_k estimator
    "events_kmv_daily" -> {
      val h = TextHash.mixSql(5, tokenHashSqlInner("uid"))
      s"""WITH e AS (SELECT CAST(ts AS DATE)::VARCHAR AS day, user_id::VARCHAR AS uid FROM events),
         |hs AS (SELECT DISTINCT day AS grp, ($h) AS h FROM e),
         |rk AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS r FROM hs),
         |agg AS (SELECT grp, count(*)::BIGINT AS k_n, max(h) AS hk FROM rk WHERE r <= 32 GROUP BY grp)
         |SELECT grp AS day, k_n,
         |       round(CASE WHEN k_n < 32 THEN k_n::DOUBLE
         |                  ELSE 31.0 * ${TextHash.P}.0 / hk::DOUBLE END, 4) AS est_r
         |FROM agg""".stripMargin
    },
    // anomaly twin: same date aggregate, same population σ, flag on the
    // ROUNDED z like the engine
    "events_anomaly" ->
      """WITH d AS (SELECT CAST(ts AS DATE)::VARCHAR AS day, count(*)::BIGINT AS n_events
        |           FROM events GROUP BY 1),
        |st AS (SELECT avg(n_events::DOUBLE) AS mu, stddev_pop(n_events::DOUBLE) AS sigma FROM d),
        |z AS (SELECT day, n_events,
        |        round(CASE WHEN sigma = 0.0 THEN 0.0
        |                   ELSE (n_events::DOUBLE - mu) / sigma END, 4) AS z_r
        |      FROM d, st)
        |SELECT day, n_events, z_r, (abs(z_r) > 2.0)::BIGINT AS is_anomaly FROM z""".stripMargin,
    // kfold twin: same permille-bucket-mod-k folds, same ledger
    "split_kfold" ->
      s"""WITH b AS (SELECT ((${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000) % 5 AS fold
         |           FROM documents),
         |f AS (SELECT fold::BIGINT AS fold, count(*)::BIGINT AS n_test FROM b GROUP BY fold)
         |SELECT fold, n_test,
         |       ((SELECT count(*) FROM documents) - n_test)::BIGINT AS n_train
         |FROM f""".stripMargin,
    "split_assign" ->
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM documents)""".stripMargin,
    // packing twin: the GLOBAL single-window cumsum the two-phase Spark
    // path must equal exactly
    "split_packing" -> {
      val hSql = TextHash.mixSql(9, tokenHashSqlInner("doc_id::VARCHAR"))
      s"""WITH ${termsCte}, ${dsCte},
         |hd AS (SELECT doc_id, dl, ($hSql) AS h FROM ds),
         |po AS (SELECT doc_id, h, dl,
         |         (sum(dl) OVER (ORDER BY h ASC, doc_id ASC
         |            ROWS UNBOUNDED PRECEDING) - dl)::BIGINT AS off
         |       FROM hd)
         |SELECT doc_id, h, off,
         |       (off // 512)::BIGINT AS seq_first,
         |       ((off + dl - 1) // 512)::BIGINT AS seq_last,
         |       (CASE WHEN (off + dl - 1) // 512 > off // 512 THEN 1 ELSE 0 END)::BIGINT AS split
         |FROM po""".stripMargin
    },
    // leakage-safe twin: the SAME recursive clusters closure, then the
    // permille hash over coalesce(cluster_id, doc_id)
    "split_leakage_safe" ->
      s"""WITH RECURSIVE ${lshCtes},
         |pairs AS (
         |  SELECT a_id, b_id
         |  FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8),
         |und AS (SELECT a_id AS u, b_id AS v FROM pairs
         |        UNION SELECT b_id, a_id FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |cl AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
         |k AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS group_id
         |      FROM documents d LEFT JOIN cl USING (doc_id)),
         |kb AS (SELECT doc_id, group_id,
         |         (${TextHash.mixSql(7, tokenHashSqlInner("group_id::VARCHAR"))}) % 1000 AS bucket
         |       FROM k)
         |SELECT doc_id, group_id, bucket,
         |  CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM kb""".stripMargin,
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
    // importance-sampling twin: same permille hash, same rounded weight
    "split_importance" ->
      s"""WITH w AS (SELECT doc_id,
         |  round(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END, 4) AS alnum_ratio_r
         |  FROM documents),
         |b AS (SELECT doc_id,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM documents)
         |SELECT b.doc_id, b.bucket::BIGINT AS bucket,
         |       floor(1000.0 * w.alnum_ratio_r)::BIGINT AS thr
         |FROM b JOIN w USING (doc_id)
         |WHERE b.bucket < floor(1000.0 * w.alnum_ratio_r)""".stripMargin,
    // quality-gate twin: same 4dp histogram, same BIGINT cross-multiplied
    // ties-or-better threshold, same keep-all-ties rule
    "pipeline_quality_gate" ->
      s"""WITH q AS (SELECT doc_id, source,
         |  round(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END, 4) AS q
         |  FROM documents),
         |h AS (SELECT source, q, count(*)::BIGINT AS c FROM q GROUP BY source, q),
         |cu AS (SELECT source, q, sum(c) OVER (PARTITION BY source ORDER BY q DESC) AS cum FROM h),
         |nn AS (SELECT source, count(*)::BIGINT AS n FROM q GROUP BY source),
         |thr AS (SELECT cu.source, max(cu.q) AS thr
         |        FROM cu JOIN nn USING (source)
         |        WHERE cu.cum * 1000 >= nn.n * 500 GROUP BY cu.source)
         |SELECT q.doc_id, q.source AS repo, q.q AS q_r, thr.thr AS thr_r
         |FROM q JOIN thr USING (source) WHERE q.q >= thr.thr""".stripMargin,
    "pipeline_curate" ->
      s"""WITH q AS (SELECT doc_id, text,
         |  len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
         |  CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END AS alnum
         |  FROM documents),
         |g AS (SELECT doc_id, n_tokens, text FROM q WHERE n_tokens >= 30 AND alnum >= 0.7),
         |keep AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY sha256(text)),
         |k AS (SELECT g.doc_id, g.n_tokens FROM g JOIN keep USING (doc_id)),
         |b AS (SELECT doc_id, n_tokens,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM k)
         |SELECT doc_id, n_tokens, bucket,
         |  CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,
    // mixture twin: same permille hash, same pure-BIGINT keep rule
    // bucket·n_dom < tw·N; absent domains coalesce to weight 0
    "split_mixture" -> {
      val twRows = mixTargets.toSeq.sorted
        .map { case (d, w) => s"('$d', $w)" }.mkString(", ")
      s"""WITH cnt AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
         |tot AS (SELECT count(*)::BIGINT AS t FROM documents),
         |tw AS (SELECT * FROM (VALUES $twRows) v(lang, w)),
         |b AS (SELECT doc_id, lang,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM documents)
         |SELECT b.doc_id, b.lang, b.bucket::BIGINT AS bucket
         |FROM b JOIN cnt USING (lang) LEFT JOIN tw USING (lang), tot
         |WHERE b.bucket * cnt.n < coalesce(tw.w, 0)::BIGINT * tot.t""".stripMargin
    },
    "split_stratified" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |  (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) AS h
         |  FROM documents),
         |r AS (SELECT doc_id, lang,
         |  row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)::BIGINT AS samp_rank
         |  FROM h)
         |SELECT doc_id, lang, samp_rank FROM r WHERE samp_rank <= 40""".stripMargin,
    "dedup_contamination" ->
      s"""WITH ${shinglesCte},
         |bs AS (SELECT doc_id AS bench_id, shingle FROM shd WHERE doc_id < 20),
         |tr AS (SELECT doc_id AS train_id, shingle FROM shd WHERE doc_id >= 20),
         |bsz AS (SELECT bench_id, count(*) AS bsz FROM bs GROUP BY bench_id),
         |inter AS (SELECT train_id, bench_id, count(*)::BIGINT AS overlap
         |          FROM tr JOIN bs USING (shingle) GROUP BY train_id, bench_id)
         |SELECT train_id, bench_id, overlap, round(overlap::DOUBLE / bsz, 4) AS contamination_r
         |FROM inter JOIN bsz USING (bench_id)""".stripMargin,
    "ft_crawl_frontier" ->
      """WITH RECURSIVE walk(doc_id, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS doc_id, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT e.dst, w.depth + 1
        |  FROM walk w JOIN (
        |    SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT count(*) FROM documents) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 3 + 7) % (SELECT count(*) FROM documents)
        |    FROM documents) e
        |  ON e.src = w.doc_id
        |  WHERE w.depth < 8
        |)
        |SELECT doc_id, min(depth) AS depth FROM walk GROUP BY doc_id""".stripMargin,
    "ft_http_filter" ->
      """SELECT doc_id, code FROM (
        |  SELECT doc_id, (CASE WHEN doc_id % 97 = 0 THEN 404 ELSE 200 END)::BIGINT AS code
        |  FROM documents)
        |WHERE code <= 299""".stripMargin,
    "ft_recrawl_delta" ->
      """WITH old AS (SELECT doc_id, text AS content FROM documents),
        |nn AS (SELECT count(*) AS n FROM documents),
        |kept AS (SELECT doc_id,
        |           CASE WHEN doc_id % 13 = 0 THEN content || ' updated' ELSE content END AS content
        |         FROM old WHERE doc_id % 17 <> 0),
        |added AS (SELECT doc_id + (SELECT n FROM nn) AS doc_id,
        |                 'new page ' || doc_id AS content
        |          FROM old WHERE doc_id % 23 = 0),
        |newv AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
        |a AS (SELECT doc_id, sha256(content) AS so FROM old),
        |b AS (SELECT doc_id, sha256(content) AS sn FROM newv)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |       CASE WHEN a.doc_id IS NULL THEN 'added'
        |            WHEN b.doc_id IS NULL THEN 'removed'
        |            WHEN so = sn THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin,

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

    // ===== training-data ops =====
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_dups
        |FROM documents GROUP BY sha256(text)""".stripMargin,
    // ExactSubstr twin: replays the identical anchor → keep-first →
    // span-union → rewrite chain (w = 8). Keep-first is the lexicographic
    // (doc_id, pos) minimum (row_number twin of Spark's min-of-struct);
    // the rewrite anti-joins marked token indices and re-joins in order.
    "dedup_substring_rm" ->
      s"""WITH ${tokArrCte},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
         |anch AS (SELECT doc_id,
         |           unnest(range(greatest(len(arr) - 7, 0))) AS pos,
         |           unnest(list_transform(range(greatest(len(arr) - 7, 0)),
         |             i -> array_to_string(arr[i + 1:i + 8], ' '))) AS sh
         |         FROM tokarr),
         |firsts AS (SELECT sh, doc_id AS fdoc, pos AS fpos FROM (
         |    SELECT sh, doc_id, pos,
         |           row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn,
         |           count(*) OVER (PARTITION BY sh) AS cnt
         |    FROM anch) WHERE rn = 1 AND cnt > 1),
         |rm AS (SELECT a.doc_id, a.pos FROM anch a JOIN firsts f USING (sh)
         |       WHERE NOT (a.doc_id = f.fdoc AND a.pos = f.fpos)),
         |rmtok AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS idx FROM rm),
         |kept AS (SELECT t.doc_id, t.term, t.pos FROM tp t
         |         LEFT JOIN rmtok r ON t.doc_id = r.doc_id AND t.pos = r.idx
         |         WHERE r.doc_id IS NULL),
         |ag AS (SELECT doc_id, count(*)::BIGINT AS nk,
         |              array_to_string(list(term ORDER BY pos), ' ') AS cd
         |       FROM kept GROUP BY doc_id)
         |SELECT ta.doc_id, len(ta.arr)::BIGINT AS n_tokens,
         |       (len(ta.arr) - coalesce(ag.nk, 0))::BIGINT AS n_removed,
         |       coalesce(ag.cd, '') AS content_dedup
         |FROM tokarr ta LEFT JOIN ag USING (doc_id)""".stripMargin,
    // canonical-URL twin: the SAME synthetic variants and the SAME
    // RE2-safe regex chain, step for step (fragment → mid tracking →
    // trailing tracking → host lowering → trailing slash)
    "dedup_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id * 2 AS url_id,
        |         'https://' || source || '.example.com/doc/' || doc_id AS url
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id * 2 + 1,
        |         'HTTPS://' || upper(source) || '.example.com/doc/' || doc_id ||
        |         CASE WHEN doc_id % 3 = 0
        |                THEN '?utm_source=feed&utm_campaign=c' || (doc_id % 5)::VARCHAR
        |              WHEN doc_id % 3 = 1 THEN '#section'
        |              ELSE '/' END
        |  FROM documents),
        |s1 AS (SELECT url_id, regexp_replace(url, '#.*', '', 'g') AS u FROM u),
        |s2 AS (SELECT url_id,
        |         regexp_replace(u, '(utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*&', '', 'g') AS u
        |       FROM s1),
        |s3 AS (SELECT url_id,
        |         regexp_replace(u, '[?&](utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*$', '', 'g') AS u
        |       FROM s2),
        |s4 AS (SELECT url_id,
        |         lower(regexp_extract(u, '^([A-Za-z]+://[^/?#]*)', 1)) ||
        |         regexp_replace(u, '^[A-Za-z]+://[^/?#]*', '', 'g') AS u
        |       FROM s3),
        |c AS (SELECT url_id, regexp_replace(u, '/$', '', 'g') AS canon FROM s4)
        |SELECT canon, count(*)::BIGINT AS members, min(url_id) AS keeper
        |FROM c GROUP BY canon""".stripMargin,
    // containment twin: same candidate chain, score inter / least sizes
    "dedup_containment" ->
      s"""WITH ${shinglesCte},
         |keptsh AS (SELECT shingle FROM shd GROUP BY shingle HAVING count(*) <= 1000),
         |shk AS (SELECT doc_id, shingle FROM shd JOIN keptsh USING (shingle)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |          FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, round(i::DOUBLE / least(sa.sz, sb.sz), 4) AS cont_r
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |WHERE i::DOUBLE / least(sa.sz, sb.sz) >= 0.9""".stripMargin,
    "dedup_ngram" ->
      s"""WITH ${shinglesCte},
         |keptsh AS (SELECT shingle FROM shd GROUP BY shingle HAVING count(*) <= 1000),
         |shk AS (SELECT doc_id, shingle FROM shd JOIN keptsh USING (shingle)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |          FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jac_r
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8""".stripMargin,
    // novelty twin: same distinct-shingle relation, min-doc_id first
    // occurrence, per-doc first-fraction
    "dedup_novelty" ->
      s"""WITH ${shinglesCte},
         |fi AS (SELECT shingle, min(doc_id) AS first_doc FROM shd GROUP BY shingle)
         |SELECT s.doc_id, count(*)::BIGINT AS n_shingles,
         |       sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_first,
         |       round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::DOUBLE
         |             / count(*), 4) AS novelty_r
         |FROM shd s JOIN fi f USING (shingle) GROUP BY s.doc_id""".stripMargin,
    "dedup_minhash_sig" -> {
      val mins = (0 until 8).map(i =>
        s"min(${TextHash.mixSql(i, "h")}) AS s$i").mkString(", ")
      s"""WITH ${shinglesCte},
         |shh AS (SELECT doc_id, ${tokenHashSqlInner("shingle")} AS h FROM shd)
         |SELECT doc_id, $mins FROM shh GROUP BY doc_id""".stripMargin
    },
    "dedup_minhash_lsh" ->
      s"""WITH ${lshCtes}
         |SELECT a_id, b_id, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jac_r
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8""".stripMargin,
    // incremental twin: the FULL LSH pipeline restricted to pairs touching
    // the batch — the restriction IS the incremental contract, so the hash
    // gate proves probe-side candidates lose nothing
    "dedup_minhash_incr" ->
      s"""WITH ${lshCtes}
         |SELECT a_id, b_id, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jac_r
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8
         |  AND (a_id % 2 = 0 OR b_id % 2 = 0)""".stripMargin,
    "dedup_clusters" ->
      // transitive closure of the symmetrized LSH pair graph; cluster_id =
      // min doc_id in the component (bit-exact integer semantics, same as
      // the Spark min-label propagation fixpoint)
      s"""WITH RECURSIVE ${lshCtes},
         |pairs AS (
         |  SELECT a_id, b_id
         |  FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8),
         |und AS (SELECT a_id AS u, b_id AS v FROM pairs
         |        UNION SELECT b_id, a_id FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
         |SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u""".stripMargin,
    // canonical twin: the clusters closure + quality argmax per cluster
    "dedup_canonical" ->
      s"""WITH RECURSIVE ${lshCtes},
         |pairs AS (
         |  SELECT a_id, b_id
         |  FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8),
         |und AS (SELECT a_id AS u, b_id AS v FROM pairs
         |        UNION SELECT b_id, a_id FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |cl AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
         |qual AS (SELECT doc_id,
         |  round(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END, 4) AS q
         |  FROM documents),
         |mem AS (SELECT cluster_id, count(*)::BIGINT AS members FROM cl GROUP BY cluster_id)
         |SELECT cluster_id, canonical_id, q_r, members FROM (
         |  SELECT cl.cluster_id, cl.doc_id AS canonical_id, round(qual.q, 4) AS q_r,
         |         row_number() OVER (PARTITION BY cl.cluster_id
         |                            ORDER BY qual.q DESC, cl.doc_id ASC) AS pick
         |  FROM cl JOIN qual USING (doc_id)
         |) JOIN mem USING (cluster_id) WHERE pick = 1""".stripMargin,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash_pairs" ->
      s"""WITH sh AS ($simhashSql)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    "dedup_embedding" ->
      s"""SELECT a_id, b_id, round(cos, 4) AS cos_r FROM (
         |  SELECT x.vec_id AS a_id, y.vec_id AS b_id,
         |         ${cosSql("x.embedding", "y.embedding")} AS cos
         |  FROM embeddings x JOIN embeddings y
         |    ON x.label = y.label AND x.vec_id < y.vec_id)
         |WHERE cos >= 0.4""".stripMargin,
    // APSS twin: brute-force all-pairs cosine over the same doc sample —
    // no prefix filter here, so equality proves candidate completeness
    "dedup_apss" ->
      s"""WITH ${termsCte}, ${postCte},
         |p AS (SELECT * FROM post WHERE doc_id % 5 = 0),
         |nrm AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM p GROUP BY doc_id),
         |w AS (SELECT p.doc_id, p.term, p.tf / n.nrm AS w
         |      FROM p JOIN nrm n USING (doc_id)),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                 sum(a.w * b.w) AS sim
         |          FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, round(sim, 4) AS sim_r
         |FROM pairs WHERE sim >= 0.85""".stripMargin,
    "ann_topk" -> annBfSql,
    // filtered-ANN twin: the label equi-predicate joins query to corpus
    "ann_filtered_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
         |           FROM embeddings WHERE vec_id < 5),
         |scored AS (SELECT q.query_id, e.vec_id, ${cosSql("q.qv", "e.embedding")} AS cos
         |           FROM embeddings e JOIN q ON e.label = q.qlabel)
         |SELECT query_id, rank, vec_id, cos_r FROM (
         |  SELECT query_id, vec_id, round(cos, 4) AS cos_r,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    "ann_sq8_topk" -> annSq8Sql,
    // deliberately the SAME twin: the persisted artifact must be
    // indistinguishable from the in-memory encode
    "ann_sq8_persisted" -> annSq8Sql,
    "ann_sq8_rerank" -> annSq8RerankSql,
    // recall@k harness: LEFT JOIN the exact top-k against the approximate
    // top-k (both full nested-WITH twins) — integer hits, exact recall
    "ann_recall" ->
      s"""WITH bf AS ($annBfSql), l AS ($annLshSql)
         |SELECT bf.query_id, count(l.vec_id)::BIGINT AS hits,
         |       count(l.vec_id) / 5.0 AS recall_r
         |FROM bf LEFT JOIN l ON bf.query_id = l.query_id AND bf.vec_id = l.vec_id
         |GROUP BY bf.query_id""".stripMargin,
    // deterministic by construction (splitmix64 planes / seed-free k-means),
    // so the approximate paths get full hash gates, not rows-only checks
    "ann_lsh_topk" -> annLshSql,
    "ann_ivf_topk" -> annIvfSql,
    // PQ-ADC twin: per-subspace codebooks unrolled (same Lloyd recurrence
    // as IVF's twin on the sliced vectors), ADC as the LUT join q1.d + q2.d
    "ann_pq_adc" -> annPqSql,
    // PQ recall twin: exact brute-force vs the PQ chain, joined per query
    "ann_pq_recall" ->
      s"""WITH bf AS ($annBfSql), p AS ($annPqSql)
         |SELECT bf.query_id, count(p.vec_id)::BIGINT AS hits,
         |       count(p.vec_id) / 5.0 AS recall_r
         |FROM bf LEFT JOIN p ON bf.query_id = p.query_id AND bf.vec_id = p.vec_id
         |GROUP BY bf.query_id""".stripMargin,
    "mm_features" -> mmFeaturesSql,
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
    // duplicated-segment twin: the text_chunks chain at window=stride=3,
    // segments keyed by sha256, same ≥2 duplication rule
    "dedup_segments" -> {
      val (w, st) = (3, 3)
      s"""WITH tk AS (SELECT doc_id,
         |  list_filter(${Analyzer.sqlTokens("text")}, t -> t <> '') AS arr FROM documents),
         |stt AS (SELECT doc_id, arr, len(arr) AS l,
         |        unnest(range(0, greatest(len(arr), 1), $st)) AS s FROM tk),
         |ch AS (SELECT doc_id,
         |         sha256(array_to_string(list_slice(arr, s + 1, least(s + $w, l)), ' ')) AS seg
         |       FROM stt WHERE s = 0 OR s - $st + $w < l),
         |cn AS (SELECT seg, count(*)::BIGINT AS n FROM ch GROUP BY seg),
         |agg AS (SELECT doc_id, count(*)::BIGINT AS n_segs,
         |               sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
         |        FROM ch JOIN cn USING (seg) GROUP BY doc_id)
         |SELECT doc_id, n_segs, n_dup,
         |       round(n_dup::DOUBLE / n_segs, 4) AS dup_frac_r FROM agg""".stripMargin
    },
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
    "ft_cms_cf" -> {
      val w = 64
      val shards = (0 until 4).map(i =>
        s"SELECT $i AS i, (${TextHash.mixSql(i, "th")}) % $w AS cell, tf FROM ph")
        .mkString("\n  UNION ALL ")
      val probeCell = s"CASE d.i ${(0 until 4).map(i =>
        s"WHEN $i THEN (${TextHash.mixSql(i, "th")}) % $w").mkString(" ")} END"
      val qVals = cmsTerms.map(t => s"('$t')").mkString(", ")
      s"""WITH ${termsCte}, ${postCte},
         |ph AS (SELECT ${tokenHashSqlInner("term")} AS th, tf FROM post),
         |cms AS (SELECT i, cell, sum(tf)::BIGINT AS total FROM (
         |  $shards
         |) GROUP BY i, cell),
         |qt AS (SELECT term, ${tokenHashSqlInner("term")} AS th
         |       FROM (VALUES $qVals) v(term)),
         |qc AS (SELECT term, d.i AS i, $probeCell AS cell
         |       FROM qt CROSS JOIN (VALUES (0), (1), (2), (3)) d(i))
         |SELECT q.term, min(coalesce(c.total, 0))::BIGINT AS est
         |FROM qc q LEFT JOIN cms c ON q.i = c.i AND q.cell = c.cell
         |GROUP BY q.term""".stripMargin
    },
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
    // frames twin: video = doc_id%3=2; ASCII blobs ⇒ byte windows ==
    // char windows, so substr replays the stride slices exactly
    "mm_frames" -> {
      val h = tokenHashSqlInner("ft")
      s"""WITH v AS (SELECT doc_id AS media_id, text, length(text)::BIGINT AS n
         |           FROM documents WHERE doc_id % 3 = 2),
         |fr0 AS (SELECT media_id, text,
         |          unnest(range(greatest((n - 16) // 64 + 1, 0))) AS f FROM v),
         |fr AS (SELECT media_id, f::BIGINT AS frame_no,
         |         substr(text, (f * 64 + 1)::INT, 16) AS ft FROM fr0)
         |SELECT media_id, frame_no, ($h) AS frame_hash FROM fr""".stripMargin
    },
    // resize twin: same synthesized dims, same aspect-fit integer division
    "mm_resize" ->
      """WITH i AS (SELECT doc_id AS media_id,
        |             (doc_id % 640 + 16)::BIGINT AS width,
        |             (doc_id % 480 + 16)::BIGINT AS height
        |           FROM documents WHERE doc_id % 3 = 0)
        |SELECT media_id, width, height,
        |  (CASE WHEN width >= height THEN 224 ELSE width * 224 // height END)::BIGINT AS out_w,
        |  (CASE WHEN width >= height THEN height * 224 // width ELSE 224 END)::BIGINT AS out_h
        |FROM i""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  (doc_id % 640 + 16)::BIGINT AS width,
        |  (doc_id % 480 + 16)::BIGINT AS height,
        |  (CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END)::BIGINT AS sample_rate
        |FROM documents""".stripMargin,
    // politeness twin: same per-host rank → slot, same dispatch order
    "ft_crawl_polite" ->
      """WITH f AS (SELECT source AS host, 'doc/' || doc_id AS path,
        |             (doc_id % 100)::BIGINT AS priority FROM documents),
        |r AS (SELECT host, path, priority,
        |        row_number() OVER (PARTITION BY host
        |          ORDER BY priority DESC, path ASC)::BIGINT AS slot FROM f)
        |SELECT slot, host, path, priority FROM r
        |ORDER BY slot ASC, host ASC, path ASC LIMIT 100""".stripMargin,
    // mirror twin: per-repo distinct shingles, hot-shingle prune on the
    // candidate side only (sizes stay unpruned, exactly as the operator)
    "dedup_mirrors" ->
      s"""WITH ${shinglesCte},
         |rs AS (SELECT DISTINCT d.source AS repo, s.shingle
         |       FROM shd s JOIN documents d USING (doc_id)),
         |kept AS (SELECT rs.repo, rs.shingle FROM rs JOIN (
         |           SELECT shingle FROM rs GROUP BY shingle
         |           HAVING count(*) <= 15) k USING (shingle)),
         |sizes AS (SELECT repo, count(*)::BIGINT AS sz FROM rs GROUP BY repo),
         |p AS (SELECT a.repo AS repo_a, b.repo AS repo_b, count(*)::BIGINT AS inter
         |      FROM kept a JOIN kept b
         |           ON a.shingle = b.shingle AND a.repo < b.repo
         |      GROUP BY 1, 2)
         |SELECT repo_a, repo_b, inter,
         |       (sa.sz + sb.sz - inter)::BIGINT AS uni,
         |       round(inter::DOUBLE / (sa.sz + sb.sz - inter), 4) AS jacc_r
         |FROM p JOIN sizes sa ON repo_a = sa.repo
         |       JOIN sizes sb ON repo_b = sb.repo
         |WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.05""".stripMargin,
    // codec twin: same lag-gap stream, same integer varint thresholds,
    // bit lengths via bin() string length (no float log on either engine)
    "ft_codec_study" -> {
      val vb = (g: String) =>
        s"""(CASE WHEN $g < 128 THEN 1 WHEN $g < 16384 THEN 2
           |      WHEN $g < 2097152 THEN 3 WHEN $g < 268435456 THEN 4
           |      WHEN $g < 34359738368 THEN 5 ELSE 6 END)""".stripMargin
      val bl = (e: String) => s"length(bin($e))::BIGINT"
      val cost = (g: String) =>
        s"""sum((${vb(g)}) * 8)::BIGINT AS varint_bits,
           |sum(2 * ${bl(g)} - 1)::BIGINT AS gamma_bits,
           |sum(2 * ${bl(bl(g))} - 1 + ${bl(g)} - 1)::BIGINT AS delta_bits""".stripMargin
      s"""WITH ${termsCte}, ${postCte},
         |rm AS (SELECT doc_id,
         |         (row_number() OVER (ORDER BY source ASC,
         |            'doc/' || doc_id::VARCHAR ASC, doc_id ASC) - 1)::BIGINT AS new_id
         |       FROM documents),
         |g1 AS (SELECT doc_id - lag(doc_id, 1, -1)
         |         OVER (PARTITION BY term ORDER BY doc_id) AS gap FROM post),
         |c1 AS (SELECT 'original' AS variant, count(*)::BIGINT AS n_postings,
         |              ${cost("gap")} FROM g1),
         |post2 AS (SELECT p.term, r.new_id AS doc_id FROM post p JOIN rm r USING (doc_id)),
         |g2 AS (SELECT doc_id - lag(doc_id, 1, -1)
         |         OVER (PARTITION BY term ORDER BY doc_id) AS gap FROM post2),
         |c2 AS (SELECT 'url_sorted' AS variant, count(*)::BIGINT AS n_postings,
         |              ${cost("gap")} FROM g2)
         |SELECT * FROM c1 UNION ALL SELECT * FROM c2""".stripMargin
    },
    // rice twin: per-term k from the integral mean gap (both engines floor
    // the div and the shift identically on BIGINT — hash-exact)
    "ft_rice_study" -> {
      val vb = (g: String) =>
        s"""(CASE WHEN $g < 128 THEN 1 WHEN $g < 16384 THEN 2
           |      WHEN $g < 2097152 THEN 3 WHEN $g < 268435456 THEN 4
           |      WHEN $g < 34359738368 THEN 5 ELSE 6 END)""".stripMargin
      val cost = (gtab: String, label: String) =>
        s"""SELECT '$label' AS variant, count(*)::BIGINT AS n_postings,
           |  sum((${vb("gap")}) * 8)::BIGINT AS varint_bits,
           |  sum((gap - 1) // (1::BIGINT << k::INT) + 1 + k)::BIGINT AS rice_bits
           |FROM $gtab JOIN (SELECT term,
           |    (length(bin(sum(gap) // count(*))) - 1)::BIGINT AS k
           |  FROM $gtab GROUP BY term) kk USING (term)""".stripMargin
      s"""WITH ${termsCte}, ${postCte},
         |rm AS (SELECT doc_id,
         |         (row_number() OVER (ORDER BY source ASC,
         |            'doc/' || doc_id::VARCHAR ASC, doc_id ASC) - 1)::BIGINT AS new_id
         |       FROM documents),
         |g1 AS (SELECT term, doc_id - lag(doc_id, 1, -1)
         |         OVER (PARTITION BY term ORDER BY doc_id) AS gap FROM post),
         |post2 AS (SELECT p.term, r.new_id AS doc_id FROM post p JOIN rm r USING (doc_id)),
         |g2 AS (SELECT term, doc_id - lag(doc_id, 1, -1)
         |         OVER (PARTITION BY term ORDER BY doc_id) AS gap FROM post2),
         |c1 AS (${cost("g1", "original")}),
         |c2 AS (${cost("g2", "url_sorted")})
         |SELECT * FROM c1 UNION ALL SELECT * FROM c2""".stripMargin
    },
    // static-prune twin: same top-N-by-tf window, both rankings scored
    // with the ORIGINAL collection statistics
    "ft_static_prune" -> {
      val score = Bm25.sql("p.tf", "t.df", "d.dl", "s.n", "s.avgdl")
      def top(rel: String, name: String) =
        s"""$name AS (SELECT doc_id FROM (
           |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id FROM (
           |    SELECT p.doc_id, count(*) AS n_terms, sum($score) AS score
           |    FROM $rel p JOIN q USING (term) JOIN tstats t USING (term)
           |         JOIN ds d ON p.doc_id = d.doc_id, stats s
           |    GROUP BY p.doc_id) WHERE n_terms = ${q2.size}
           |) WHERE rank <= 10)""".stripMargin
      s"""WITH ${termsCte}, ${postCte}, ${dsCte}, ${tstatsCte}, ${statsCte}, ${qCte(q2)},
         |pruned AS (SELECT term, doc_id, tf FROM (
         |    SELECT term, doc_id, tf,
         |           row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS kr
         |    FROM post) WHERE kr <= 20),
         |${top("post", "topo")},
         |${top("pruned", "topp")}
         |SELECT 'original' AS variant,
         |       (SELECT count(*) FROM post)::BIGINT AS n_postings,
         |       (SELECT count(*) FROM topo)::BIGINT AS top10_overlap
         |UNION ALL
         |SELECT 'pruned',
         |       (SELECT count(*) FROM pruned)::BIGINT,
         |       (SELECT count(*) FROM topp JOIN topo USING (doc_id))::BIGINT""".stripMargin
    },
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
         |GROUP BY doc_id""".stripMargin,
    // rendezvous twins: same tokenHash → per-shard mixer weights, same
    // (w desc, shard asc) rank — bit-identical placement across engines
    "ft_shard_route" -> (shardRouteSql + "\nSELECT term, df, shard, rnk FROM r WHERE rnk <= 2"),
    "ft_shard_load" -> (shardRouteSql +
      """
        |SELECT shard, rnk, count(*)::BIGINT AS n_terms, sum(df)::BIGINT AS df_mass
        |FROM r WHERE rnk <= 2 GROUP BY shard, rnk
        |ORDER BY shard ASC, rnk ASC""".stripMargin),
    // ring twin: the vnode positions are the SAME mixer-family constants
    // (inlined as fixture literals), the successor/wrap logic in-engine
    "ft_ring_balance" -> {
      import graft.index.Sharding
      val th = tokenHashSqlInner("term")
      def ringVals(nShards: Int) = (0 until nShards).flatMap(s =>
        (0 until 16).map(v =>
          s"($s, ${TextHash.mix(s * 16 + v, Sharding.RingSeed)})")).mkString(", ")
      def ownerCtes(ring: String, pfx: String) =
        s"""${pfx}s AS (SELECT term, shard FROM (
           |  SELECT t.term, r.shard,
           |         row_number() OVER (PARTITION BY t.term
           |           ORDER BY r.pos ASC, r.shard ASC) AS rn
           |  FROM t JOIN $ring r ON r.pos >= t.th) WHERE rn = 1),
           |${pfx}w AS (SELECT t.term,
           |    (SELECT shard FROM $ring ORDER BY pos ASC, shard ASC LIMIT 1) AS shard
           |  FROM t WHERE t.term NOT IN (SELECT term FROM ${pfx}s)),
           |${pfx}o AS (SELECT * FROM ${pfx}s UNION ALL SELECT * FROM ${pfx}w)""".stripMargin
      s"""WITH ${termsCte}, ${tstatsCte},
         |t AS (SELECT term, df, $th AS th FROM tstats),
         |r8 AS (SELECT CAST(shard AS BIGINT) AS shard, CAST(pos AS BIGINT) AS pos
         |       FROM (VALUES ${ringVals(8)}) v(shard, pos)),
         |r9 AS (SELECT CAST(shard AS BIGINT) AS shard, CAST(pos AS BIGINT) AS pos
         |       FROM (VALUES ${ringVals(9)}) v(shard, pos)),
         |${ownerCtes("r8", "x8")},
         |${ownerCtes("r9", "x9")}
         |SELECT a.shard, count(*)::BIGINT AS n_terms, sum(t.df)::BIGINT AS df_mass,
         |       sum(CASE WHEN b.shard <> a.shard THEN 1 ELSE 0 END)::BIGINT AS moved_to_new
         |FROM t JOIN x8o a USING (term) JOIN x9o b USING (term)
         |GROUP BY a.shard""".stripMargin
    },
    // merge-policy twin: same cumsum for leveled, same closed-form
    // F^L·(N div F^L) participation predicates for tiered
    "ft_merge_policy" -> {
      val levels = (1 to 6).map { l =>
        val f = math.pow(4.0, l.toDouble).toLong
        s"CASE WHEN i < $f * ((SELECT nn FROM nn) // $f) THEN 1 ELSE 0 END"
      }.mkString(" + ")
      s"""WITH sz AS (SELECT source AS repo, count(*)::BIGINT AS sz FROM documents GROUP BY source),
         |si AS (SELECT repo, sz, (row_number() OVER (ORDER BY repo ASC) - 1)::BIGINT AS i FROM sz),
         |nn AS (SELECT count(*)::BIGINT AS nn FROM si),
         |lev AS (SELECT sum(sz)::BIGINT AS input_units, sum(cum)::BIGINT AS written_units FROM (
         |  SELECT sz, sum(sz) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS cum FROM si)),
         |tier AS (SELECT sum(sz)::BIGINT AS input_units,
         |                sum(sz * (1 + $levels))::BIGINT AS written_units
         |         FROM si)
         |SELECT 'leveled' AS policy, input_units, written_units,
         |       written_units * 1000 // input_units AS amp_permille FROM lev
         |UNION ALL
         |SELECT 'tiered_f4', input_units, written_units,
         |       written_units * 1000 // input_units FROM tier""".stripMargin
    },
    // partition-study twin: same rendezvous owners (S=4), same doc-hash
    // scatter, same probe/row/max-load accounting
    "ft_partition_study" -> {
      val h = tokenHashSqlInner("term")
      val qVals = batchQ.map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
      val branches = (0 until 4).map(i =>
        s"SELECT term, $i::BIGINT AS shard, ${TextHash.mixSql(i, "h")} AS w FROM th")
        .mkString("\n UNION ALL ")
      s"""WITH ${termsCte}, ${postCte}, ${tstatsCte},
         |q AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term
         |      FROM (VALUES $qVals) AS t(query_id, term)),
         |vocab AS (SELECT DISTINCT term FROM q),
         |wl AS (SELECT q.query_id, q.term, t.df FROM q JOIN tstats t USING (term)),
         |th AS (SELECT term, $h AS h FROM vocab),
         |placed AS ($branches),
         |rt AS (SELECT term, shard FROM (
         |  SELECT term, shard, row_number() OVER (PARTITION BY term
         |           ORDER BY w DESC, shard ASC) AS rnk FROM placed) WHERE rnk = 1),
         |tpj AS (SELECT wl.query_id, wl.term, wl.df, rt.shard FROM wl JOIN rt USING (term)),
         |ps AS (SELECT p.term, (${TextHash.mixSql(7, "p.doc_id")}) % 4 AS shard,
         |              count(*)::BIGINT AS dfs
         |       FROM post p JOIN vocab USING (term) GROUP BY p.term, shard),
         |dpl AS (SELECT ps.shard, sum(ps.dfs) AS r FROM q JOIN ps USING (term) GROUP BY ps.shard)
         |SELECT 'term_part' AS strategy,
         |       (SELECT count(*) FROM (SELECT DISTINCT query_id, shard FROM tpj))::BIGINT AS shard_probes,
         |       (SELECT sum(df) FROM wl)::BIGINT AS rows_fetched,
         |       (SELECT max(r) FROM (SELECT shard, sum(df) AS r FROM tpj GROUP BY shard))::BIGINT AS max_shard_rows
         |UNION ALL
         |SELECT 'doc_part',
         |       (SELECT count(DISTINCT query_id) * 4 FROM q)::BIGINT,
         |       (SELECT sum(df) FROM wl)::BIGINT,
         |       (SELECT max(r) FROM dpl)::BIGINT""".stripMargin
    }
  )

  /** shared rendezvous-routing CTE chain (through ranked placements `r`) —
    * referenced by BOTH ft_shard_route and ft_shard_load twins */
  private def shardRouteSql: String = {
    val h = tokenHashSqlInner("term")
    val branches = (0 until 8).map(i =>
      s"SELECT term, df, $i::BIGINT AS shard, ${TextHash.mixSql(i, "h")} AS w FROM th")
      .mkString("\n UNION ALL ")
    s"""WITH ${termsCte}, ${tstatsCte},
       |th AS (SELECT term, df, $h AS h FROM tstats),
       |placed AS ($branches),
       |r AS (SELECT term, df, shard,
       |        row_number() OVER (PARTITION BY term
       |          ORDER BY w DESC, shard ASC)::BIGINT AS rnk FROM placed)""".stripMargin
  }

  /** exact-adjacent-phrase top-k: per term i, starts = pos − i; a
    * (doc, start) hit by all |terms| streams is one phrase occurrence —
    * mirrors Positional.phraseMatches */
  private def phraseSql(terms: Seq[String], k: Int): String = {
    val shifts = terms.zipWithIndex.map { case (t, i) =>
      s"SELECT doc_id, pos - $i AS start FROM tp WHERE term = '$t'"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${tokArrCte},
       |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
       |m AS ($shifts),
       |hits AS (SELECT doc_id, start FROM m GROUP BY doc_id, start HAVING count(*) = ${terms.size}),
       |ph AS (SELECT doc_id, count(*)::BIGINT AS phrase_tf FROM hits GROUP BY doc_id)
       |SELECT rank, doc_id, phrase_tf FROM (
       |  SELECT row_number() OVER (ORDER BY phrase_tf DESC, doc_id ASC) AS rank,
       |         doc_id, phrase_tf
       |  FROM ph) WHERE rank <= $k""".stripMargin
  }

  /** ordered proximity (phrase within `slop`) top-k: term i matches start
    * when pos ∈ [start + i, start + i + slop] — mirrors
    * Positional.proximityMatches (distinct per term INDEX, count-k, count
    * starts) */
  /** unordered-NEAR twin: same start-witness construction without the
    * per-term-index shift; window width w = |terms| + slop */
  private def nearSql(terms: Seq[String], slop: Int, k: Int): String = {
    val w = terms.size + slop
    val starts = terms.map { t =>
      s"SELECT doc_id, unnest(range(pos - $w + 1, pos + 1)) AS start, '$t' AS qt FROM tp WHERE term = '$t'"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${tokArrCte},
       |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
       |m AS ($starts),
       |md AS (SELECT DISTINCT doc_id, start, qt FROM m),
       |hits AS (SELECT doc_id, start FROM md GROUP BY doc_id, start HAVING count(*) = ${terms.size}),
       |ph AS (SELECT doc_id, count(*)::BIGINT AS near_tf FROM hits GROUP BY doc_id)
       |SELECT rank, doc_id, near_tf FROM (
       |  SELECT row_number() OVER (ORDER BY near_tf DESC, doc_id ASC) AS rank,
       |         doc_id, near_tf
       |  FROM ph) WHERE rank <= $k""".stripMargin
  }

  private def proximitySql(terms: Seq[String], slop: Int, k: Int): String = {
    val shifts = terms.zipWithIndex.map { case (t, i) =>
      s"SELECT doc_id, unnest(range(pos - $i - $slop, pos - $i + 1)) AS start, $i AS ti FROM tp WHERE term = '$t'"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${tokArrCte},
       |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
       |m AS ($shifts),
       |md AS (SELECT DISTINCT doc_id, start, ti FROM m),
       |hits AS (SELECT doc_id, start FROM md GROUP BY doc_id, start HAVING count(*) = ${terms.size}),
       |ph AS (SELECT doc_id, count(*)::BIGINT AS prox_tf FROM hits GROUP BY doc_id)
       |SELECT rank, doc_id, prox_tf FROM (
       |  SELECT row_number() OVER (ORDER BY prox_tf DESC, doc_id ASC) AS rank,
       |         doc_id, prox_tf
       |  FROM ph) WHERE rank <= $k""".stripMargin
  }

  /** SymSpell deletion-neighborhood fuzzy twin: dictionary variants via a
    * 1-deletion list comprehension, query variants inlined, candidates by
    * equi-join, exact levenshtein verify — mirrors QueryFrontend.fuzzyTerms */
  private def fuzzySql(query: String, maxDist: Int): String = {
    // the SQL dict side unrolls ONE deletion level; keep the twin honest
    require(maxDist == 1, "fuzzySql twin models the maxDist=1 neighborhood only")
    val qVariants = QueryFrontend.deletionVariants(query, maxDist)
    val qvArr = qVariants.map(v => s"'$v'").mkString(", ")
    s"""WITH ${termsCte}, ${tstatsCte},
       |v AS (SELECT term, df, unnest(list_prepend(term,
       |        list_transform(range(1, length(term) + 1),
       |          i -> substring(term, 1, CAST(i - 1 AS INTEGER)) ||
       |               substring(term, CAST(i + 1 AS INTEGER))))) AS variant
       |      FROM tstats),
       |qv AS (SELECT unnest(ARRAY[$qvArr]) AS variant),
       |cand AS (SELECT DISTINCT term, df FROM v JOIN qv USING (variant))
       |SELECT term, df, CAST(levenshtein(term, '$query') AS BIGINT) AS dist
       |FROM cand WHERE levenshtein(term, '$query') <= $maxDist""".stripMargin
  }

  // ---- Russian corpus wrap + lexicon twins -----------------------------
  /** deterministic Russian content per doc (no external data): fixed
    * sentence + two doc_id-indexed picks. Exercises ё-fold (Ёжик/ёлка),
    * the Cyrillic char class (Latin/digits/punctuation stripped), the ru
    * stoplist (и/в) and the 1→N lexicon (вчатв/стали/банка/дома/мыши). */
  private val ruPick7 = Seq("дом", "вчатв", "стали", "печи", "ёлка", "банка", "леса")
  private val ruPick3 = Seq("дома", "мыши", "хорошо")
  private def ruWrapCol: org.apache.spark.sql.Column =
    concat_ws(" ",
      lit("Ёжик и дом;"),
      elt(((col("doc_id") % 7 + 1).cast("int") +: ruPick7.map(lit)): _*),
      lit("в лесу not-русский text123"),
      elt(((col("doc_id") % 3 + 1).cast("int") +: ruPick3.map(lit)): _*))
  private def ruWrapSql: String = {
    def pick(words: Seq[String], m: Int) =
      s"list_extract(ARRAY[${words.map(w => s"'$w'").mkString(", ")}], CAST(doc_id % $m + 1 AS INTEGER))"
    s"'Ёжик и дом;' || ' ' || ${pick(ruPick7, 7)} || ' ' || " +
      s"'в лесу not-русский text123' || ' ' || ${pick(ruPick3, 3)}"
  }
  /** the Russian lexicon as a VALUES relation (same 1→N join as lexCte) */
  private def ruLexCte: String = {
    val vals = DefaultLexicon.russian.toSeq.sortBy(_._1)
      .flatMap { case (sf, fs) => fs.map(f => s"('$sf', '$f')") }.mkString(", ")
    s"rulex(surface, form) AS (VALUES $vals)"
  }

  /** Fixed-point integer PageRank as an unrolled 3-iteration CTE chain
    * (every per-iteration quantity is a BIGINT — hash-exact); terminal CTE
    * is `p3` (doc_id, pr). Shared by ft_pagerank and ft_blend. */
  /** shared OPIC CTE chain (3 unrolled rounds → oh3/oc3) — referenced by
    * BOTH the ft_opic and ft_crawl_priority twins */
  private def opicCtes: String = {
    def iter(i: Int) = {
      val pc = s"oc${i - 1}"
      s"""oh$i AS (SELECT h.doc_id, h.hist + c.cash AS hist
         |         FROM oh${i - 1} h JOIN $pc c USING (doc_id)),
         |inf$i AS (SELECT e.dst AS doc_id, sum(c.cash // o.odeg) AS acc
         |          FROM $pc c JOIN odeg o ON c.doc_id = o.src
         |               JOIN edges e ON c.doc_id = e.src
         |          GROUP BY e.dst),
         |dng$i AS (SELECT coalesce(sum(c.cash), 0) // (SELECT n FROM nn) AS share
         |          FROM $pc c LEFT JOIN odeg o ON c.doc_id = o.src
         |          WHERE o.src IS NULL),
         |oc$i AS (SELECT n.doc_id,
         |           (coalesce(i.acc, 0) + (SELECT share FROM dng$i))::BIGINT AS cash
         |         FROM nodes n LEFT JOIN inf$i i USING (doc_id))""".stripMargin
    }
    s"""nodes AS (SELECT doc_id FROM documents),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |edges AS (
       |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM nn) AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM nn) FROM documents),
       |odeg AS (SELECT src, count(*)::BIGINT AS odeg FROM edges GROUP BY src),
       |oh0 AS (SELECT doc_id, 0::BIGINT AS hist FROM nodes),
       |oc0 AS (SELECT doc_id, (1000000000000 // (SELECT n FROM nn))::BIGINT AS cash FROM nodes),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}""".stripMargin
  }

  private def pagerankCtes: String = {
    val S = "1000000000000"
    val tele = s"(15 * ($S // (SELECT n FROM nn))) // 100"
    def iter(prev: String, cur: String) =
      s"""$cur AS (SELECT nd.doc_id,
         |  CAST($tele + (85 * coalesce(s.acc, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS doc_id, sum(p.pr // o.odeg) AS acc
         |    FROM $prev p JOIN odeg o ON p.doc_id = o.src
         |         JOIN edges e ON p.doc_id = e.src
         |    GROUP BY e.dst) s USING (doc_id))""".stripMargin
    s"""nodes AS (SELECT doc_id FROM documents),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |edges AS (
       |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM nn) AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM nn) FROM documents),
       |odeg AS (SELECT src, count(*)::BIGINT AS odeg FROM edges GROUP BY src),
       |p0 AS (SELECT doc_id, CAST($S // (SELECT n FROM nn) AS BIGINT) AS pr FROM nodes),
       |${iter("p0", "p1")},
       |${iter("p1", "p2")},
       |${iter("p2", "p3")}""".stripMargin
  }

  /** Twin of LinkRank.hits (2 iterations, scale 10^9): same nodes/edges as
    * pagerankCtes; each ℓ1-normalized half-step is raw // (Σraw // scale),
    * integer-exact in both engines. Exports a2/h2 (doc_id, s). */
  private def hitsCtes: String = {
    val S = "1000000000"
    // one half-step: scores flow from `from` to `to` across edges
    def half(score: String, from: String, to: String, out: String) =
      s"""${out}raw AS (SELECT nd.doc_id, coalesce(r.raw, 0)::BIGINT AS raw
         |  FROM hnodes nd LEFT JOIN (
         |    SELECT e.$to AS doc_id, sum(x.s)::BIGINT AS raw
         |    FROM hedges e JOIN $score x ON e.$from = x.doc_id
         |    GROUP BY e.$to) r USING (doc_id)),
         |${out}den AS (SELECT greatest(sum(raw) // $S, 1)::BIGINT AS d FROM ${out}raw),
         |$out AS (SELECT doc_id, (raw // (SELECT d FROM ${out}den))::BIGINT AS s FROM ${out}raw)""".stripMargin
    s"""hnodes AS (SELECT doc_id FROM documents),
       |hnn AS (SELECT count(*) AS n FROM hnodes),
       |hedges AS (
       |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM hnn) AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM hnn) FROM documents),
       |h0 AS (SELECT doc_id, CAST($S AS BIGINT) AS s FROM hnodes),
       |${half("h0", "src", "dst", "a1")},
       |${half("a1", "dst", "src", "h1")},
       |${half("h1", "src", "dst", "a2")},
       |${half("a2", "dst", "src", "h2")}""".stripMargin
  }

  /** Twin of Anchors.syntheticAnchors + anchorPostings: consumes `tokarr`
    * (ordered stop-filtered token arrays), exports `ap` (doc_id, term, atf).
    * Shared by ft_anchor_postings and ft_anchor_search. */
  private def anchorCtes: String =
    s"""ann AS (SELECT count(*) AS n FROM documents),
       |anch AS (
       |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM ann) AS dst, arr[1:3] AS a FROM tokarr
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM ann), arr[4:6] FROM tokarr),
       |at AS (SELECT dst, unnest(a) AS term FROM anch),
       |ap AS (SELECT dst AS doc_id, term, count(*)::BIGINT AS atf FROM at GROUP BY dst, term)""".stripMargin

  // ---- HTML wrap / lexicon twins ---------------------------------------
  /** deterministic HTML wrapper around the documents corpus (no external
    * data): exercises script/style/tag stripping incl. a '<' inside script */
  private def htmlWrapCol: org.apache.spark.sql.Column =
    concat(lit("<html><head><title>Doc "), col("doc_id"), lit(" - "), col("repo"),
      lit("</title><style>body { color: #000; }</style></head><body><p>"),
      col("content"), lit("</p><script>var x = 1 < 2;</script></body></html>"))
  private def htmlWrapSql: String =
    "'<html><head><title>Doc ' || doc_id || ' - ' || source || " +
      "'</title><style>body { color: #000; }</style></head><body><p>' || text || " +
      "'</p><script>var x = 1 < 2;</script></body></html>'"

  /** deterministic PII injection for text_redact (the synthetic corpus
    * carries no real PII, so the fixture plants emails/IPs/phones to find) */
  private def piiInject: org.apache.spark.sql.Column =
    concat(col("content"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"), lit(".1"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call +1555"), lpad((col("doc_id") % 10000).cast("string"), 7, "0"))).otherwise(lit("")))
  private def piiInjectSql: String =
    "text || " +
      "CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END || " +
      "CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.' || (doc_id % 256) || '.1' ELSE '' END || " +
      "CASE WHEN doc_id % 11 = 0 THEN ' call +1555' || lpad((doc_id % 10000)::VARCHAR, 7, '0') ELSE '' END"

  /** the shipped lexicon as a VALUES relation — the oracle applies the SAME
    * surface→forms map as a 1→N left join */
  private def lexCte: String = {
    val vals = DefaultLexicon.lexicon.toSeq.sortBy(_._1)
      .flatMap { case (sf, fs) => fs.map(f => s"('$sf', '$f')") }.mkString(", ")
    s"lex(surface, form) AS (VALUES $vals)"
  }

  /** word-matches-query predicate of the snippet pipeline: analyze the word
    * (same token chain as the index) and test membership in the fixed query
    * set — `v` is the SQL variable holding the word */
  private def snipMatchSql(v: String): String = {
    val stopsIn = stops.toSeq.sorted.map(s => s"'$s'").mkString(", ")
    val termsIn = q2.sorted.map(t => s"'$t'").mkString(", ")
    s"len(list_filter(${Analyzer.sqlTokens(v)}, " +
      s"t -> t <> '' AND t NOT IN ($stopsIn) AND t IN ($termsIn))) > 0"
  }

  /** DuckDB twin of Snippets.makeSnippet (sentence argmax with index
    * tie-break, 30-word window from first hit − 15, single-space join,
    * <b> wrap) — mirrors SearchServiceImpl.java:135-296 semantics */
  private def snippetSql: String =
    s"""WITH sraw AS (SELECT doc_id, regexp_split_to_array(text, '[.!?]\\s*') AS arr FROM documents),
       |sent0 AS (SELECT doc_id, unnest(arr) AS sentence, unnest(range(len(arr))) AS idx FROM sraw),
       |scnt AS (SELECT doc_id, idx, sentence,
       |  len(list_filter(regexp_split_to_array(sentence, '[«»“”[:punct:]\\s]+'),
       |      w -> w <> '' AND ${snipMatchSql("w")})) AS cnt
       |  FROM sent0 WHERE sentence <> ''),
       |best AS (SELECT doc_id, sentence FROM (
       |  SELECT doc_id, sentence,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, idx ASC) AS rn
       |  FROM scnt) WHERE rn = 1),
       |wrds AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(sentence, '\\s+'), w -> w <> '') AS ws FROM best),
       |win AS (SELECT doc_id, ws,
       |  CASE WHEN len(ws) < ${Snippets.snippetWords + 1} THEN ws
       |       ELSE ws[CAST(st + 1 AS INTEGER):CAST(st + ${Snippets.snippetWords} AS INTEGER)] END AS sw
       |  FROM (SELECT doc_id, ws,
       |          CASE WHEN len(hl) > 0 THEN greatest(0, hl[1] - ${Snippets.snippetWords / 2}) ELSE 0 END AS st
       |        FROM (SELECT doc_id, ws,
       |                list_filter(range(len(ws)), i -> ${snipMatchSql("ws[CAST(i + 1 AS INTEGER)]")}) AS hl
       |              FROM wrds))),
       |snip AS (SELECT doc_id, array_to_string(list_transform(sw,
       |  w -> CASE WHEN ${snipMatchSql("w")} THEN '<b>' || w || '</b>' ELSE w END), ' ') AS snippet
       |  FROM win)
       |SELECT d.doc_id, coalesce(s.snippet, '') AS snippet
       |FROM documents d LEFT JOIN snip s ON d.doc_id = s.doc_id""".stripMargin

  /** multi-fragment twin: rn ≤ 2 keeps idx; per-(doc, idx) window +
    * highlight; fragments re-joined in DOCUMENT order */
  private def snippetMultiSql: String =
    s"""WITH sraw AS (SELECT doc_id, regexp_split_to_array(text, '[.!?]\\s*') AS arr FROM documents),
       |sent0 AS (SELECT doc_id, unnest(arr) AS sentence, unnest(range(len(arr))) AS idx FROM sraw),
       |scnt AS (SELECT doc_id, idx, sentence,
       |  len(list_filter(regexp_split_to_array(sentence, '[«»“”[:punct:]\\s]+'),
       |      w -> w <> '' AND ${snipMatchSql("w")})) AS cnt
       |  FROM sent0 WHERE sentence <> ''),
       |best AS (SELECT doc_id, idx, sentence FROM (
       |  SELECT doc_id, idx, sentence,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, idx ASC) AS rn
       |  FROM scnt) WHERE rn <= 2),
       |wrds AS (SELECT doc_id, idx,
       |  list_filter(regexp_split_to_array(sentence, '\\s+'), w -> w <> '') AS ws FROM best),
       |win AS (SELECT doc_id, idx, ws,
       |  CASE WHEN len(ws) < ${Snippets.snippetWords + 1} THEN ws
       |       ELSE ws[CAST(st + 1 AS INTEGER):CAST(st + ${Snippets.snippetWords} AS INTEGER)] END AS sw
       |  FROM (SELECT doc_id, idx, ws,
       |          CASE WHEN len(hl) > 0 THEN greatest(0, hl[1] - ${Snippets.snippetWords / 2}) ELSE 0 END AS st
       |        FROM (SELECT doc_id, idx, ws,
       |                list_filter(range(len(ws)), i -> ${snipMatchSql("ws[CAST(i + 1 AS INTEGER)]")}) AS hl
       |              FROM wrds))),
       |snipf AS (SELECT doc_id, idx, array_to_string(list_transform(sw,
       |  w -> CASE WHEN ${snipMatchSql("w")} THEN '<b>' || w || '</b>' ELSE w END), ' ') AS frag
       |  FROM win),
       |snip AS (SELECT doc_id, array_to_string(list(frag ORDER BY idx), ' … ') AS snippet
       |  FROM snipf GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(s.snippet, '') AS snippet
       |FROM documents d LEFT JOIN snip s ON d.doc_id = s.doc_id""".stripMargin

  // ---- ANN / multimodal oracle twins -----------------------------------
  private val embDim = 64

  /** LSH bucket id in SQL: per-plane dot product written as the SAME
    * left-associated chain of double multiply-adds as Ann.bucketCol, with
    * the splitmix64-derived plane constants inlined as literals
    * (Double.toString round-trips, so DuckDB parses the identical double —
    * the sign decisions are bit-identical). */
  private def lshBucketSql(v: String, bits: Int = 8): String =
    (0 until bits).map { b =>
      val dot = (0 until embDim)
        .map(d => s"$v[${d + 1}] * (${Ann.planeComponent(b, d)})").mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  /** squared L2 distance as the same 0.0-seeded left fold as the Scala
    * while-loop in Ann.ivfCentroids/assignUdf */
  private def d2Sql(v: String, cv: String): String = d2SqlDim(v, cv, embDim)

  private def d2SqlDim(v: String, cv: String, dim: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range($dim), " +
      s"i -> ($v[CAST(i + 1 AS INTEGER)] - $cv[CAST(i + 1 AS INTEGER)]) * " +
      s"($v[CAST(i + 1 AS INTEGER)] - $cv[CAST(i + 1 AS INTEGER)]))), (acc, x) -> acc + x)"

  /** one Lloyd iteration over an arbitrary (sub-)vector relation — the
    * subspace-parameterized twin of ivfIterSql, for the PQ codebooks */
  private def pqIterSql(eRel: String, subDim: Int, prev: String, a: String,
                        m: String, next: String): String =
    s"""$a AS (SELECT vec_id, v, cid FROM (
       |  SELECT e.vec_id, e.v, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY ${d2SqlDim("e.v", "c.cv", subDim)} ASC, c.cid ASC) AS rn
       |  FROM $eRel e, $prev c) WHERE rn = 1),
       |$m AS (SELECT cid, i,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list(v[CAST(i + 1 AS INTEGER)] ORDER BY vec_id)), (acc, x) -> acc + x)
       |         / count(*) AS mi
       |       FROM $a, (SELECT unnest(range($subDim)) AS i) GROUP BY cid, i),
       |$next AS (SELECT cid, cv FROM $prev WHERE cid NOT IN (SELECT cid FROM $m)
       |          UNION ALL SELECT cid, list(mi ORDER BY i) AS cv FROM $m GROUP BY cid)""".stripMargin

  /** one Lloyd iteration: assign (ties → lowest cid) + per-dim mean summed
    * in vec_id order (mirrors the sorted accumulation in ivfCentroids);
    * a centroid with no members keeps its previous position. */
  private def ivfIterSql(prev: String, a: String, m: String, next: String): String =
    s"""$a AS (SELECT vec_id, v, cid FROM (
       |  SELECT e.vec_id, e.v, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY ${d2Sql("e.v", "c.cv")} ASC, c.cid ASC) AS rn
       |  FROM e, $prev c) WHERE rn = 1),
       |$m AS (SELECT cid, i,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list(v[CAST(i + 1 AS INTEGER)] ORDER BY vec_id)), (acc, x) -> acc + x)
       |         / count(*) AS mi
       |       FROM $a, (SELECT unnest(range($embDim)) AS i) GROUP BY cid, i),
       |$next AS (SELECT cid, cv FROM $prev WHERE cid NOT IN (SELECT cid FROM $m)
       |          UNION ALL SELECT cid, list(mi ORDER BY i) AS cv FROM $m GROUP BY cid)""".stripMargin

  /** exact brute-force cosine top-5 twin (composable: used standalone as
    * ann_topk and nested inside ann_recall) */
  private def annBfSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |scored AS (SELECT q.query_id, e.vec_id, ${cosSql("q.qv", "e.embedding")} AS cos
       |           FROM embeddings e, q)
       |SELECT query_id, rank, vec_id, cos_r FROM (
       |  SELECT query_id, vec_id, round(cos, 4) AS cos_r,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  private def annLshSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |eb AS (SELECT vec_id, v, ${lshBucketSql("v")} AS bucket FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM eb WHERE vec_id < 5),
       |pr AS (SELECT unnest(ARRAY[${(Seq(0L) ++ (0 until 8).map(b => 1L << b)).mkString(", ")}]) AS p),
       |qp AS (SELECT query_id, xor(qbucket, CAST(p AS BIGINT)) AS bucket FROM q, pr),
       |cand AS (SELECT DISTINCT qp.query_id, eb.vec_id FROM qp JOIN eb USING (bucket)),
       |scored AS (SELECT c.query_id, c.vec_id, ${cosSql("qq.qv", "ee.v")} AS cos
       |           FROM cand c JOIN q qq ON c.query_id = qq.query_id
       |                JOIN eb ee ON c.vec_id = ee.vec_id)
       |SELECT query_id, rank, vec_id, cos_r FROM (
       |  SELECT query_id, vec_id, round(cos, 4) AS cos_r,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  /** DuckDB twin of the PQ-ADC chain — referenced by BOTH ann_pq_adc and
    ann_pq_recall */
  private lazy val annPqSql: String = {
      val sub = 32
      def chain(s: Int) = {
        val e = s"pe$s"
        s"""$e AS (SELECT vec_id, v[${s * sub + 1}:${(s + 1) * sub}] AS v FROM pe),
           |p${s}c0 AS (SELECT vec_id AS cid, v AS cv FROM $e WHERE vec_id < 8),
           |${pqIterSql(e, sub, s"p${s}c0", s"p${s}a1", s"p${s}m1", s"p${s}c1")},
           |${pqIterSql(e, sub, s"p${s}c1", s"p${s}a2", s"p${s}m2", s"p${s}c2")},
           |code$s AS (SELECT vec_id, cid FROM (
           |  SELECT e.vec_id, c.cid,
           |         row_number() OVER (PARTITION BY e.vec_id
           |                            ORDER BY ${d2SqlDim("e.v", "c.cv", sub)} ASC, c.cid ASC) AS rn
           |  FROM $e e, p${s}c2 c) WHERE rn = 1),
           |qd$s AS (SELECT q.vec_id AS query_id, c.cid, ${d2SqlDim("q.v", "c.cv", sub)} AS d
           |         FROM $e q, p${s}c2 c WHERE q.vec_id < 5)""".stripMargin
      }
      s"""WITH pe AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |${chain(0)},
         |${chain(1)},
         |adc AS (SELECT q1.query_id, c0.vec_id, q1.d + q2.d AS adc
         |        FROM code0 c0 JOIN code1 c1 USING (vec_id)
         |             JOIN qd0 q1 ON q1.cid = c0.cid
         |             JOIN qd1 q2 ON q2.cid = c1.cid AND q2.query_id = q1.query_id)
         |SELECT query_id, rank, vec_id, adc_r FROM (
         |  SELECT query_id, vec_id, round(adc, 4) AS adc_r,
         |         row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, vec_id ASC) AS rank
         |  FROM adc) WHERE rank <= 5""".stripMargin
    }

  private def annIvfSql: String = {
    val iters = (1 to 4).map(t => ivfIterSql(s"c${t - 1}", s"a$t", s"m$t", s"c$t")).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
       |$iters,
       |fin AS (SELECT vec_id, v, cid AS bucket FROM (
       |  SELECT e.vec_id, e.v, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY ${d2Sql("e.v", "c.cv")} ASC, c.cid ASC) AS rn
       |  FROM e, c4 c) WHERE rn = 1),
       |qp AS (SELECT query_id, qv, bucket FROM (
       |  SELECT qe.vec_id AS query_id, qe.v AS qv, c.cid AS bucket,
       |         row_number() OVER (PARTITION BY qe.vec_id
       |                            ORDER BY ${d2Sql("qe.v", "c.cv")} ASC, c.cid ASC) AS rn
       |  FROM e qe, c4 c WHERE qe.vec_id < 5) WHERE rn <= 3),
       |scored AS (SELECT qp.query_id, a.vec_id, ${cosSql("qp.qv", "a.v")} AS cos
       |           FROM fin a JOIN qp ON a.bucket = qp.bucket)
       |SELECT query_id, rank, vec_id, cos_r FROM (
       |  SELECT query_id, vec_id, round(cos, 4) AS cos_r,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin
  }

  /** SQ8 shared CTE chain: per-dim global (min, step), 0..255 codes, and
    * the dequantized vector relation `dq` (twin of Quantize.sqTrain +
    * sqEncode + dequantize — same double expressions before round, so
    * knife-edge .5 cases agree) plus the raw-double query set `q`. */
  private def sq8Ctes: String =
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |dims AS (SELECT unnest(range($embDim)) AS d),
       |ex AS (SELECT vec_id, d, v[CAST(d + 1 AS INTEGER)] AS x FROM e, dims),
       |mm AS (SELECT d, min(x) AS lo,
       |         CASE WHEN max(x) > min(x) THEN (max(x) - min(x)) / 255.0 ELSE 0.0 END AS step
       |       FROM ex GROUP BY d),
       |cd AS (SELECT vec_id, d,
       |         CASE WHEN step = 0.0 THEN CAST(0 AS BIGINT)
       |              ELSE CAST(least(greatest(round((x - lo) / step), 0.0), 255.0) AS BIGINT)
       |         END AS c, lo, step
       |       FROM ex JOIN mm USING (d)),
       |dq AS (SELECT vec_id, list(lo + c * step ORDER BY d) AS v FROM cd GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5)""".stripMargin

  private def annSq8Sql: String =
    s"""WITH $sq8Ctes,
       |scored AS (SELECT q.query_id, dq.vec_id, ${cosSql("q.qv", "dq.v")} AS cos
       |           FROM dq, q)
       |SELECT query_id, rank, vec_id, cos_r FROM (
       |  SELECT query_id, vec_id, round(cos, 4) AS cos_r,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  private def annSq8RerankSql: String =
    s"""WITH $sq8Ctes,
       |s1 AS (SELECT q.query_id, dq.vec_id, ${cosSql("q.qv", "dq.v")} AS cos
       |       FROM dq, q),
       |cand AS (SELECT query_id, vec_id FROM (
       |  SELECT query_id, vec_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM s1) WHERE rank <= 15),
       |s2 AS (SELECT c.query_id, c.vec_id, ${cosSql("qq.qv", "ee.v")} AS cos
       |       FROM cand c JOIN q qq USING (query_id)
       |            JOIN e ee ON c.vec_id = ee.vec_id)
       |SELECT query_id, rank, vec_id, cos_r FROM (
       |  SELECT query_id, vec_id, round(cos, 4) AS cos_r,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM s2)
       |WHERE rank <= 5""".stripMargin

  /** byte-exact checksum twin: blob bytes recovered via hex() so multibyte
    * UTF-8 text hashes identically to the Scala fold over Array[Byte] */
  private def mmFeaturesSql: String = {
    val hexval = (c: String) => s"(strpos('0123456789ABCDEF', $c) - 1)"
    val byteAt = s"CAST(${hexval("substring(hx, CAST(2 * i + 1 AS INTEGER), 1)")} * 16 + " +
      s"${hexval("substring(hx, CAST(2 * i + 2 AS INTEGER), 1)")} AS BIGINT)"
    s"""WITH b AS (SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents)
       |SELECT doc_id AS media_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |  (length(hx) // 2)::BIGINT AS n_bytes,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(length(hx) // 2), i -> $byteAt)),
       |    (a, v) -> (a * 31 + v) % 2147483647) AS checksum
       |FROM b""".stripMargin
  }

  /** sequential-fold cosine between two float-list SQL expressions —
    * mirrors Dedup.cosine's left-to-right double accumulation exactly */
  private def cosSql(a: String, b: String): String = {
    def fold(products: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $products), (acc, v) -> acc + v)"
    val dot = fold(s"list_transform(range(len($a)), i -> CAST($a[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE))")
    val na = s"sqrt(${fold(s"list_transform(range(len($a)), i -> CAST($a[i + 1] AS DOUBLE) * CAST($a[i + 1] AS DOUBLE))")})"
    val nb = s"sqrt(${fold(s"list_transform(range(len($b)), i -> CAST($b[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE))")})"
    s"($dot / ($na * $nb))"
  }

  private def simhashSql: String =
    s"""WITH ${termsCte},
       |post AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term),
       |ph0 AS (SELECT doc_id, tf, ${tokenHashSqlInner("term")} AS h0 FROM post),
       |ph AS (SELECT doc_id, tf,
       |         (${TextHash.mixSql(100, "h0")}) + ((${TextHash.mixSql(101, "h0")}) << 31) AS h
       |       FROM ph0),
       |bits AS (SELECT doc_id, j,
       |           CASE WHEN sum(CASE WHEN (h >> CAST(j AS INTEGER)) & 1 = 1 THEN tf ELSE -tf END) > 0
       |                THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |         FROM ph, (SELECT unnest(range(${graft.dedup.Dedup.simhashBits})) AS j) GROUP BY doc_id, j)
       |SELECT doc_id, sum(bit * (1::BIGINT << CAST(j AS INTEGER)))::BIGINT AS simhash
       |FROM bits GROUP BY doc_id""".stripMargin
}
