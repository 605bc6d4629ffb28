package graft.api

import graft.analyze.{Analyzer, Html}
import graft.index.{IndexWriter, InvertedIndex}
import graft.io.TableIO
import graft.query.{BooleanQuery, QueryFrontend, Search}
import graft.stats.Stats
import graft.streaming.IncrementalIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's API surface (controllers/ApiController.java:21-47) as a
  * Spark-native facade — a user of the reference can switch endpoint by
  * endpoint:
  *
  *   GET  /api/startIndexing  -> startIndexing() / startIndexingPersisted(dir)
  *   POST /api/indexPage      -> indexPage(doc)
  *   GET  /api/search         -> search(query, site, offset, limit)
  *   GET  /api/statistics     -> statistics()
  *   GET  /api/stopIndexing   -> stopIndexing()  (cooperative flag; a
  *                               persisted build aborts at the next bucket-
  *                               group boundary, records FAILED status, and
  *                               a restart resumes from committed buckets)
  *
  * DTO shapes mirror dto/search/SearchResponce.java and the dto/statistics
  * classes (DetailedStatisticsItem carries status/statusTime/error). The
  * 60-second query-result cache replicates
  * SearchServiceImpl.java:40-43,68-85 (off the correctness path).
  *
  * Index maintenance is INCREMENTAL: the facade's live tables are backed by
  * the LSM batch log (IncrementalIndex.ParquetStateStore), so `indexPage`'s
  * index work costs O(page) — tokenize the one doc, point-read its old
  * postings, append a delta batch — exactly the reference's per-page cost
  * profile (IndexingServiceImpl.java:244-264), never an O(corpus) rebuild.
  * The corpus replace is a lazy page-sized delta chain folded into a fresh
  * localCheckpoint every `checkpointEvery` upserts: amortized
  * O(corpus / checkpointEvery) per call, analyzed-plan size bounded by the
  * fold period. Reads reconstruct live tables from the batch log lazily
  * (cached until the next mutation); the log is compacted once its batch
  * fan-in exceeds `compactEvery`.
  *
  * Ingestion runs extract-then-lemmatize (reference: Jsoup text() before
  * Lemmatizator, tools/Lemmatizator.java:1): `indexedView` normalizes HTML
  * content via Html.textOf before tokenization, keeping the index coherent
  * with the htmlAware=true decoration in Search.search. The stored corpus
  * keeps RAW content (reference `page.content` stores the fetched HTML).
  *
  * `clock` supplies statusTime timestamps (driver-side wall clock — the
  * engine itself stays wall-clock-free and deterministic).
  */
class SearchEngine(spark: SparkSession, initialCorpus: DataFrame,
                   stateDir: Option[String] = None,
                   clock: () => Long = () => System.currentTimeMillis(),
                   checkpointEvery: Int = 32,
                   val lexicons: Map[String, Analyzer.Lexicon] = Map.empty) {

  case class SearchItem(site: String, siteName: String, uri: String,
                        title: String, snippet: String, relevance: Double)
  case class SearchResponse(result: Boolean, count: Long, data: Seq[SearchItem], error: String)
  /** reference dto/statistics/DetailedStatisticsItem.java field-for-field
    * (url ≙ site, name ≙ siteName) */
  case class DetailedItem(site: String, siteName: String, status: String,
                          statusTime: Long, error: String, pages: Long, lemmas: Long)
  case class Statistics(sites: Long, pages: Long, lemmas: Long,
                        detailed: Seq[DetailedItem])

  // mutable facade state: writes happen under `synchronized`; the volatile
  // markers keep unsynchronized readers (require-guards, statistics) from
  // seeing stale values on another thread
  @volatile private[graft] var corpus: DataFrame = initialCorpus
  @volatile private var indexed = false
  private val inFlight = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val cancel = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile private var lastErr: String = null
  @volatile private var indexStatusTime: Long = 0L
  /** upserts since the corpus lineage was last folded into a checkpoint */
  private var sinceCheckpoint = 0
  /** committed compressed index servable via the WAND path; cleared by any
    * mutation (the persisted snapshot is stale once the live LSM moves) */
  @volatile private var persistedDir: Option[String] = None
  private var persistedCfg: IndexWriter.Config = IndexWriter.Config()
  /** query-independent authority prior (doc_id, pr) + blend β; when set,
    * every search blends it into the ranking (Search.blendScores). Survives
    * corpus mutations by design: docs absent from the prior take pr = 0
    * (rank on relevance alone until the next prior refresh) */
  @volatile private var authorityPrior: Option[(DataFrame, Double)] = None

  // ---- LSM state store backing the live tables -------------------------
  private val baseDir = stateDir.getOrElse(
    java.nio.file.Files.createTempDirectory("graft-engine-state").toString)
  private var runSeq = 0
  private[graft] var store: IncrementalIndex.ParquetStateStore = _
  /** batch fan-in bound before the log is folded into a fresh base */
  val compactEvery = 64

  private def freshStore(): IncrementalIndex.ParquetStateStore = {
    runSeq += 1
    val d = s"$baseDir/run-$runSeq"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    new IncrementalIndex.ParquetStateStore(d)
  }

  /** extract-then-lemmatize view: what the tokenizer sees (HTML stripped,
    * code/plain text passed through) — the stored corpus stays raw. */
  private def indexedView(df: DataFrame): DataFrame =
    df.withColumn("content", Html.textOf(col("content")))

  // ---- lazily reconstructed live tables (invalidated per mutation) -----
  private var live: Option[InvertedIndex.Tables] = None

  private def invalidateTables(): Unit = {
    live.foreach { t =>
      t.postings.unpersist(); t.termStats.unpersist(); t.docStats.unpersist(): Unit
    }
    live = None
  }

  private[graft] def tables: InvertedIndex.Tables = synchronized {
    live.getOrElse {
      val p = IncrementalIndex.readPostings(store, spark).get
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      val ts = IncrementalIndex.readTermStats(store, spark).get.cache()
      val ds = IncrementalIndex.readDocStats(store, spark).get.cache()
      val nDocs = corpus.count() // checkpointed blocks — no source rescan
      val avgRow = ds.agg(avg(col("dl"))).head()
      val avgDl = if (avgRow.isNullAt(0)) 0.0 else avgRow.getDouble(0)
      val t = InvertedIndex.Tables(p, ts, ds, nDocs, avgDl)
      live = Some(t)
      t
    }
  }

  /** full index build — refuses while one is in flight (reference guard,
    * IndexingServiceImpl.java:58-65; the reference answers the start
    * endpoint with an error body while any site is INDEXING). A repeated
    * call rebuilds into a fresh state lineage (the reference's re-crawl). */
  def startIndexing(): Boolean = {
    if (!inFlight.compareAndSet(false, true)) return false
    try synchronized {
      cancel.set(false)
      // HTTP-status gate (reference IndexingServiceImpl.java:135-137):
      // error pages never enter the index
      val gated =
        if (corpus.columns.contains("code")) graft.corpus.Corpus.httpOk(corpus)
        else corpus
      corpus = gated.cache()
      invalidateTables()
      store = freshStore()
      // one whole-corpus batch through the SAME merge path upserts use —
      // the initial build is just the first (big) delta. Raw docs ride
      // along into the durable docs log (reattach + statistics source).
      IncrementalIndex.mergeBatch(store, indexedView(corpus),
        lexicons = lexicons, rawDocs = Some(corpus))
      indexStatusTime = clock()
      lastErr = null
      indexed = true
      sinceCheckpoint = 0
      persistedDir = None // any previously attached snapshot is superseded
      cache.clear() // a rebuilt index invalidates every cached response
      true
    } finally inFlight.set(false)
  }

  /** Full build into a PERSISTED bucket-partitioned index at `tableDir`,
    * committing bucket groups incrementally: a stop (or crash) leaves the
    * committed buckets resumable, and a restart call skips them
    * byte-identically (IndexWriter.write resume contract). Returns false
    * if stopped before completion (FAILED status + lastError recorded —
    * reference IndexingServiceImpl.java:67-83). */
  /** `championsM = Some(m)` additionally persists the champion-list aux
    * artifact (per-term top-m, Champions.persist) and the per-repo term
    * stats beside the bucket index — the snapshot then ships with its
    * derived artifacts and a cold reader gets facets + the champions tier
    * without any recompute. */
  def startIndexingPersisted(tableDir: String, snapshotId: Long = 1L,
                             cfg: IndexWriter.Config = IndexWriter.Config(),
                             groupSize: Int = 4,
                             onGroupCommitted: Int => Unit = _ => (),
                             championsM: Option[Int] = None,
                             priorEdges: Option[DataFrame] = None,
                             priorIters: Int = 3,
                             priorBeta: Double = 0.5): Boolean = {
    if (!inFlight.compareAndSet(false, true)) return false
    try {
      cancel.set(false)
      val gated =
        if (corpus.columns.contains("code")) graft.corpus.Corpus.httpOk(corpus)
        else corpus
      synchronized { corpus = gated.cache() }
      val t = InvertedIndex.build(indexedView(corpus), lexicons = lexicons)
      val shards = IndexWriter.shardPostings(t.postings, t.docStats, t.avgDl, cfg)
        .persist(StorageLevel.MEMORY_AND_DISK_SER) // encode once across groups
      try {
        val committed0 = TableIO.readCurrent(tableDir).map(_.committed).getOrElse(Set.empty)
        val groups = (0 until cfg.nBuckets).filterNot(committed0).grouped(groupSize).toSeq
        for (g <- groups) {
          if (cancel.get()) {
            // cooperative stop observed at a group boundary: committed
            // buckets stay, FAILED status row records the abort
            lastErr = "Indexing stopped by user"
            TableIO.recordFailure(tableDir, snapshotId, clock(), lastErr)
            return false
          }
          IndexWriter.write(
            shards.filter(col("bucket").isin(g.map(x => x: Any): _*)),
            tableDir, snapshotId, cfg, statusTime = clock())
          // progress callback (status heartbeat analog; also lets tests
          // drive a deterministic mid-build stopIndexing)
          onGroupCommitted(g.size)
        }
        TableIO.writeMeta(tableDir, TableIO.IndexMeta(t.nDocs, t.avgDl))
        // per-repo df derives from the cached postings + the corpus's
        // (doc_id, repo) map — no second tokenization pass
        val tsRepo = t.postings
          .join(corpus.select("doc_id", "repo"), "doc_id")
          .groupBy("repo", "term").agg(count(lit(1)).as("df"))
        // optional derived artifacts ride along with the snapshot (manifest
        // aux lineage): champion lists + the facets/statistics source
        championsM.foreach { m =>
          graft.index.Champions.persist(t.postings, t.docStats, t.avgDl, m, tableDir, cfg)
          Stats.persistRepoTermStats(tsRepo, tableDir): Unit
        }
        // optional authority prior: PageRank over the supplied crawl graph,
        // persisted beside the index (manifest aux lineage, decommitted by
        // postings mutations like any aux artifact) and installed for the
        // serve path in the same breath
        priorEdges.foreach { ed =>
          val pr = graft.corpus.LinkRank.pagerank(
            ed, corpus.select("doc_id"), t.nDocs, priorIters)
          IndexWriter.writeAux(pr, tableDir, "prior")
          setAuthorityPrior(pr, priorBeta)
        }
        // the facade stays fully usable after a persisted build: seed the
        // live LSM store from the tables already in hand (one parquet
        // write, NO second tokenization pass), so search()/statistics()/
        // indexPage() work exactly as after startIndexing()
        synchronized {
          store = freshStore()
          IncrementalIndex.seedBase(store, t, rawDocs = Some(corpus),
            termStatsRepo = Some(tsRepo))
          invalidateTables()
          indexStatusTime = clock()
          lastErr = null
          indexed = true
          sinceCheckpoint = 0
          // the committed compressed index is queryable via the WAND path
          // with its frozen stats until the next mutation
          persistedDir = Some(tableDir)
          persistedCfg = cfg
          cache.clear()
        }
        true
      } finally {
        shards.unpersist()
        t.postings.unpersist(): Unit
      }
    } finally inFlight.set(false)
  }

  /** true while search() serves global queries from the committed
    * compressed snapshot via block-max WAND; false once a mutation
    * invalidates the snapshot (search falls back to the live LSM tables). */
  def servesFromPersisted: Boolean = persistedDir.isDefined

  /** GET /api/stopIndexing: arm the cooperative stop flag. Returns false
    * when no indexing run is in flight (the reference's "Индексация не
    * запущена" error body, IndexingServiceImpl.java:67-71). */
  def stopIndexing(): Boolean = {
    if (!inFlight.get()) return false
    cancel.set(true)
    true
  }

  /** single-doc upsert (POST /api/indexPage): replace-by-doc_id in the
    * corpus (lineage cut by localCheckpoint), then an O(page) delta batch
    * through the LSM store — delete-only for gated error re-fetches,
    * tokenize-and-merge otherwise. The full corpus is never re-tokenized. */
  def indexPage(doc: DataFrame): Boolean = synchronized {
    require(indexed, "index not built")
    // incoming docs get their integrity column recomputed (input_hint
    // invariant), never trusted from the caller
    val doc1 =
      if (corpus.columns.contains("sha256"))
        doc.withColumn("sha256", sha2(col("content"), 256))
      else doc
    // an upserted page was by definition fetched successfully (the caller
    // hands us its content) unless it carries an explicit status
    val doc2 =
      if (corpus.columns.contains("code") && !doc1.columns.contains("code"))
        doc1.withColumn("code", lit(200).cast("int"))
      else doc1
    // HTTP gate on the upsert path too (reference delete+reindex: an error
    // re-fetch REMOVES the old version and indexes nothing,
    // IndexingServiceImpl.java:135-137 via :244-264)
    // page-sized pins (O(page) jobs): the corpus lineage below references
    // ONLY checkpointed blocks, never the caller's live plan
    val docOk = (
      if (doc2.columns.contains("code")) graft.corpus.Corpus.httpOk(doc2) else doc2
    ).localCheckpoint(true)
    val ids = doc2.select("doc_id").localCheckpoint(true)
    // corpus replace is a LAZY delta chain over the last checkpoint — an
    // upsert itself never rewrites the corpus. The chain (one broadcast
    // anti-join + one page-sized union per upsert) is folded into a fresh
    // checkpoint every `checkpointEvery` calls, so the replace cost is
    // amortized O(corpus / checkpointEvery) per call and the analyzed plan
    // is bounded by the fold period instead of growing without bound.
    corpus = corpus.join(ids, Seq("doc_id"), "left_anti").unionByName(docOk)
    sinceCheckpoint += 1
    if (sinceCheckpoint >= checkpointEvery) {
      corpus = corpus.localCheckpoint(true)
      sinceCheckpoint = 0
    }
    // O(page) index delta: docs whose re-fetch was gated out are deletions;
    // the rest merge through the batch log (which itself removes their old
    // postings via point-read + signed df deltas)
    val delIds = ids.join(docOk.select("doc_id"), Seq("doc_id"), "left_anti")
    if (!delIds.isEmpty) IncrementalIndex.deleteDocs(store, delIds)
    if (!docOk.isEmpty) {
      IncrementalIndex.mergeBatch(store, indexedView(docOk),
        lexicons = lexicons, rawDocs = Some(docOk))
      // percolate the BATCH ONLY against the stored alert queries — the
      // alerting cost of an upsert is O(page), never O(corpus); matches
      // accumulate until drainAlerts()
      if (alertQueries.nonEmpty) {
        import spark.implicits._
        val q = alertQueries.toSeq
          .flatMap { case (id, ts) => ts.map(t => (id, t)) }
          .toDF("query_id", "term")
        val bp = InvertedIndex.tokensByLang(indexedView(docOk), lexicons)
          .select("doc_id", "term").distinct()
        alertHits ++= Search.percolate(bp, q).collect()
          .map(r => (r.getLong(1), r.getLong(0)))
      }
    }
    // bound read fan-in: fold the log once it grows past compactEvery
    if (store.pointer.exists(p => p._1 - p._2 >= compactEvery))
      IncrementalIndex.compactState(store, spark)
    invalidateTables()
    persistedDir = None // the compressed snapshot no longer matches the LSM
    cache.clear() // cached responses may cite the replaced/deleted doc
    true
  }

  // 60s TTL result cache (reference: SearchServiceImpl.outdated)
  private val cache = new java.util.concurrent.ConcurrentHashMap[(String, Option[String], Int, Int, String), (Long, SearchResponse)]()
  val cacheTtlMs = 60000L

  /** `lang` picks the query-analysis branch (stoplist/normalizer — "ru"
    * routes through the Cyrillic chain) and must match how the corpus was
    * tokenized, exactly like Search.search's contract. */
  // ---- percolation alerts (reverse search over incoming pages) ----------
  /** stored alert queries: id → analyzed conjunctive terms (the SAME
    * analyzer chain as search, so an alert fires exactly when the search
    * for its query would start matching the page) */
  private val alertQueries = scala.collection.concurrent.TrieMap.empty[Long, Seq[String]]
  private val alertHits = scala.collection.mutable.Buffer.empty[(Long, Long)]

  /** Register "notify me when a page matching `query` is indexed". Returns
    * false when the query analyzes to nothing (same guard as search). */
  def registerAlert(alertId: Long, query: String, lang: String = "en"): Boolean = {
    val lex = lexicons.getOrElse(lang, Analyzer.emptyLexicon)
    val terms = Analyzer.queryTerms(lang, query, lex)
    if (terms.isEmpty) false
    else { alertQueries.put(alertId, terms.toSeq); true }
  }

  def removeAlert(alertId: Long): Unit = alertQueries.remove(alertId): Unit

  /** (alertId, docId) matches accumulated by indexPage since the last
    * drain — the pull side of the alerting contract. */
  def drainAlerts(): Seq[(Long, Long)] = synchronized {
    val out = alertHits.toSeq
    alertHits.clear()
    out
  }

  /** Install a static authority prior (doc_id, pr) — e.g. `LinkRank
    * .pagerank` over the crawl graph — blended into every subsequent
    * search's ranking: blend = bm25 · (β + (1−β)·pr/max(pr)). The response
    * cache is invalidated (same query, different ranking). */
  def setAuthorityPrior(prior: DataFrame, beta: Double = 0.5): Unit = synchronized {
    authorityPrior.foreach(_._1.unpersist())
    authorityPrior = Some((prior.select(col("doc_id"), col("pr")).cache(), beta))
    cache.clear()
  }

  def clearAuthorityPrior(): Unit = synchronized {
    authorityPrior.foreach(_._1.unpersist())
    authorityPrior = None
    cache.clear()
  }

  /** Restore a persisted prior (the `prior` aux artifact written by
    * `startIndexingPersisted(priorEdges = …)`) — fails fast if the artifact
    * was decommitted by a postings mutation (IndexWriter.readAux). */
  def loadAuthorityPrior(tableDir: String, beta: Double = 0.5): Unit =
    setAuthorityPrior(IndexWriter.readAux(spark, tableDir, "prior"), beta)

  def search(query: String, site: Option[String] = None,
             offset: Int = 0, limit: Int = 20, lang: String = "en"): SearchResponse = {
    require(indexed, "index not built")
    val key = (query, site, offset, limit, lang)
    val now = System.currentTimeMillis()
    val hit = cache.get(key)
    if (hit != null && now - hit._1 < cacheTtlMs) return hit._2
    val resp = doSearch(query, site, offset, limit, lang)
    cache.put(key, (now, resp))
    resp
  }

  /** Cursor (search-after) deep paging — beyond the reference's offset
    * pager: the page strictly AFTER the (relevance, docId) cursor of the
    * previous page in the deterministic total order (score desc, docId
    * asc), so page 10^4 costs what page 1 costs
    * ([[graft.query.Search.bm25TopKAfter]]). The cursor is the last item
    * of the previous page: its `relevance` and its docId (the numeric
    * tail of `uri` = "doc/<id>"). Serves the pure-BM25 DataFrame path;
    * prior-blended rankings keep paging by offset (a cursor there would
    * need the blended score as its key). `count` carries the total match
    * count, as in [[search]]. */
  def searchAfter(query: String, afterScore: Double, afterDoc: Long,
                  limit: Int = 20, lang: String = "en"): SearchResponse = {
    require(indexed, "index not built")
    val (corpus, t) = synchronized { (this.corpus, tables) }
    val lex = lexicons.getOrElse(lang, Analyzer.emptyLexicon)
    if (Analyzer.queryTerms(lang, query, lex).isEmpty)
      return SearchResponse(result = false, 0, Nil, "Empty search query")
    val plan = QueryFrontend.plan(t.termStats, lang, query, lex)
    if (plan.missing.nonEmpty)
      return SearchResponse(result = false, 0, Nil,
        s"No data for words: ${plan.missing.mkString(", ")}, ")
    if (plan.isEmpty) return SearchResponse(result = true, 0, Nil, null)
    val kept = plan.terms.map(_.term)
    val dfs = plan.terms.map(pt => pt.term -> pt.df).toMap
    val total = Search.conjunctive(t.postings, kept).count()
    val top = Search.bm25TopKAfter(t.postings, t.docStats, dfs, t.nDocs,
      t.avgDl, limit, afterScore, afterDoc)
    val items = Search.decorate(corpus, top, dfs.keySet).collect().map { r =>
      SearchItem(r.getAs[String]("repo"), r.getAs[String]("repo"),
        r.getAs[String]("path"), r.getAs[String]("title"),
        r.getAs[String]("snippet"), r.getAs[Double]("score"))
    }
    SearchResponse(result = true, total, items.toSeq, null)
  }

  /** Boolean-tree search (AND/OR/NOT, [[graft.query.BooleanQuery]]) —
    * beyond the reference's conjunctive-only search. Every Term leaf is
    * analyzed through the SAME per-lang lexicon as the index; a 1→N leaf
    * becomes an OR of its normal forms — including under NOT, where the
    * expansion correctly WIDENS the exclusion. The tree filters, positive
    * leaves score by BM25; `count` = full candidate-set size. */
  def searchBoolean(tree: BooleanQuery.Node, limit: Int = 20,
                    lang: String = "en"): SearchResponse = {
    require(indexed, "index not built")
    val (corpus, t) = synchronized { (this.corpus, tables) }
    val lex = lexicons.getOrElse(lang, Analyzer.emptyLexicon)
    def leaves(n: BooleanQuery.Node): Seq[String] = n match {
      case BooleanQuery.Term(s) => Seq(s)
      case BooleanQuery.And(qs) => qs.flatMap(leaves)
      case BooleanQuery.Or(qs)  => qs.flatMap(leaves)
      case BooleanQuery.Not(q)  => leaves(q)
    }
    if (leaves(tree).exists(s => Analyzer.queryTerms(lang, s, lex).isEmpty))
      return SearchResponse(result = false, 0, Nil, "Empty search query")
    def analyzed(n: BooleanQuery.Node): BooleanQuery.Node = n match {
      case BooleanQuery.Term(s) =>
        Analyzer.queryTerms(lang, s, lex).toSeq.sorted match {
          case Seq(one) => BooleanQuery.Term(one)
          case many     => BooleanQuery.Or(many.map(BooleanQuery.Term))
        }
      case BooleanQuery.And(qs) => BooleanQuery.And(qs.map(analyzed))
      case BooleanQuery.Or(qs)  => BooleanQuery.Or(qs.map(analyzed))
      case BooleanQuery.Not(q)  => BooleanQuery.Not(analyzed(q))
    }
    val q = analyzed(tree)
    val pos = BooleanQuery.positiveTerms(q).toSeq.sorted
    val dfs = QueryFrontend.lookupDf(t.termStats, pos.toSet)
    val missing = pos.filterNot(dfs.contains)
    if (missing.nonEmpty)
      return SearchResponse(result = false, 0, Nil,
        s"No data for words: ${missing.mkString(", ")}, ")
    val total = BooleanQuery.matches(t.postings, q).count()
    if (total == 0) return SearchResponse(result = true, 0, Nil, null)
    val top = BooleanQuery.topK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, q, limit)
    val items = Search.decorate(corpus, top, dfs.keySet).collect().map { r =>
      SearchItem(r.getAs[String]("repo"), r.getAs[String]("repo"),
        r.getAs[String]("path"), r.getAs[String]("title"),
        r.getAs[String]("snippet"), r.getAs[Double]("score"))
    }
    SearchResponse(result = true, total, items.toSeq, null)
  }

  private def doSearch(query: String, site: Option[String],
                       offset: Int, limit: Int, lang: String): SearchResponse = {
    // one coherent snapshot: corpus and tables are reassigned together by
    // mutators (under the same lock), so reading them under it prevents a
    // concurrent indexPage from pairing new corpus content with old
    // postings mid-search
    val (corpus, t, pDir) = synchronized { (this.corpus, tables, persistedDir) }
    // BOTH sides analyze through the same per-lang lexicon (reference
    // lemmatizes query and index alike: SearcherPage.java:39,
    // IndexingServiceImpl.java:144-155)
    val lex = lexicons.getOrElse(lang, Analyzer.emptyLexicon)
    // empty-after-analysis -> error (reference SearchServiceImpl.java:54-57)
    val qTerms = Analyzer.queryTerms(lang, query, lex)
    // (the reference's messages are Russian — "Задан пустой поисковый
    // запрос" / "Нет данных по словам: …" — kept in English here)
    if (qTerms.isEmpty)
      return SearchResponse(result = false, 0, Nil, "Empty search query")
    val plan = QueryFrontend.plan(t.termStats, lang, query, lex)
    if (plan.missing.nonEmpty)
      // reference sentinel row lists the missing words (SearcherPage.java:58-79)
      return SearchResponse(result = false, 0, Nil,
        s"No data for words: ${plan.missing.mkString(", ")}, ")
    if (plan.isEmpty) return SearchResponse(result = true, 0, Nil, null)
    val kept = plan.terms.map(_.term)
    val dfs = plan.terms.map(pt => pt.term -> pt.df).toMap
    val scoped = site match {
      case Some(r) => t.postings.join(
        corpus.filter(col("repo") === r).select("doc_id"), Seq("doc_id"), "left_semi")
      case None => t.postings
    }
    // FULL result-set size before pagination — the reference's response
    // count is resultSearch.size(), not the page length
    // (SearchServiceImpl.java:90); a UI pager needs the total
    val total = Search.conjunctive(scoped, kept).count()
    if (total == 0) return SearchResponse(result = true, 0, Nil, null)
    // reference quirk (SearchServiceImpl.java:101-118): an offset at or
    // past the end of the result list clamps to the LAST element rather
    // than returning an empty page. Dataset.offset takes an Int; clamp so
    // a >2^31-row match count can't become a negative offset.
    val (effOffset, effLimit) =
      if (offset > 0 && offset >= total)
        (math.min(total - 1, Int.MaxValue.toLong - 1).toInt, 1)
      else (offset, limit)
    // rank tier: a committed compressed snapshot (startIndexingPersisted,
    // not yet invalidated by a mutation) serves global queries through the
    // block-max WAND path with the snapshot's FROZEN stats (_meta.json) —
    // rank-identical to the DataFrame aggregate by construction (shared
    // formula + tie-breaks; asserted in SearchEngineSpec). Site-scoped
    // queries stay on the DataFrame path (shards are not repo-scoped).
    val prior = authorityPrior
    val top = pDir match {
      case Some(dir) if site.isEmpty =>
        val meta = TableIO.readMeta(dir).get
        val idfs = dfs.map { case (tm, d) => tm -> graft.query.Bm25.idfS(d, meta.nDocs) }
        def wandTopK(k: Int) = graft.query.Wand.topK(
          IndexWriter.readForTerms(spark, dir, kept, persistedCfg),
          idfs, meta.avgDl, k)
        prior match {
          case Some((p, beta)) =>
            // two-stage ranking: WAND retrieves C candidates by pure BM25
            // (an upper bound of the blended score, Search.rerankWithPrior
            // doc), the prior reranks those C rows only
            val c = math.max(8 * (effOffset + effLimit), 64)
            Search.rerankWithPrior(wandTopK(c), p, beta, effLimit, effOffset)
          case None =>
            wandTopK(effOffset + effLimit).filter(col("rank") > effOffset)
        }
      case _ =>
        prior match {
          case Some((p, beta)) =>
            Search.blendTopK(scoped, t.docStats, dfs, t.nDocs, t.avgDl, p,
                effOffset + effLimit, beta)
              .filter(col("rank") > effOffset)
              .withColumnRenamed("blend", "score")
          case None =>
            Search.bm25TopK(scoped, t.docStats, dfs, t.nDocs, t.avgDl, effLimit, effOffset)
        }
    }
    val rows = Search.decorate(corpus, top, dfs.keySet).collect()
    val items = rows.map { r =>
      SearchItem(r.getAs[String]("repo"), r.getAs[String]("repo"),
        r.getAs[String]("path"), r.getAs[String]("title"),
        r.getAs[String]("snippet"), r.getAs[Double]("score"))
    }
    SearchResponse(result = true, total, items.toSeq, null)
  }

  /** per-repo (repo, pages, lemmas) rows + the ALL total, computed from
    * STORE tables only (docs log + signed per-repo df deltas) — a status
    * poll never re-tokenizes the corpus, mirroring the reference's two
    * COUNT queries over existing tables (StatisticsServiceImpl.java:30-87,
    * PageRepository.countBySite / LemmaRepository.countBySite). Falls back
    * to the tokenize rollup only for legacy stores that never carried raw
    * docs. Exposed for the no-Analyzer-nodes plan assertion in spec. */
  private[graft] def statisticsFrame(): DataFrame = synchronized {
    val fromStore = for {
      docs <- IncrementalIndex.readDocs(store, spark)
      tsr <- IncrementalIndex.readTermStatsRepo(store, spark)
    } yield {
      val pages = docs.groupBy("repo").agg(count(lit(1)).as("pages"))
      val lemmas = tsr.groupBy("repo").agg(count(lit(1)).as("lemmas"))
      val per = pages.join(lemmas, "repo")
      val totalRow = per.agg(coalesce(sum("pages"), lit(0L)).as("pages"),
          coalesce(sum("lemmas"), lit(0L)).as("lemmas"))
        .withColumn("repo", lit("ALL")).select("repo", "pages", "lemmas")
      per.select("repo", "pages", "lemmas").union(totalRow)
    }
    fromStore.getOrElse(Stats.statistics(indexedView(corpus)))
  }

  def statistics(): Statistics = {
    require(indexed, "index not built")
    val rows = statisticsFrame().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = rows.find(_._1 == "ALL").getOrElse(("ALL", 0L, 0L))
    // status mirrors the reference Site.status: a recorded error (e.g. a
    // stopped persisted build) reports FAILED with last_error, not a
    // contradictory INDEXED-with-error row
    val status = if (lastErr != null) "FAILED" else "INDEXED"
    val detailed = rows.filterNot(_._1 == "ALL").sortBy(_._1).map { case (site, pages, lemmas) =>
      DetailedItem(site, site, status, indexStatusTime, lastErr, pages, lemmas)
    }
    Statistics(detailed.length.toLong, total._2, total._3, detailed.toSeq)
  }

  /** adopt an already-committed LSM store (the attach path): serve reads
    * immediately; `runSeq` continues the run numbering so a later rebuild
    * never collides with the adopted lineage. */
  private[graft] def adoptStore(st: IncrementalIndex.ParquetStateStore, seq: Int): Unit =
    synchronized {
      store = st
      runSeq = math.max(runSeq, seq)
      invalidateTables()
      indexStatusTime = clock()
      lastErr = null
      indexed = true
      sinceCheckpoint = 0
      cache.clear()
    }
}

object SearchEngine {

  /** Reattach to an existing engine state WITHOUT rebuilding: open the
    * newest committed `run-N` LSM store under `stateDir`, restore the
    * corpus from its durable docs log, and serve queries immediately — the
    * reference survives a restart because MySQL persists its page/lemma/
    * index tables (application.yaml:13-26, `ddl-auto: update`); the LSM
    * batch log is this engine's equivalent. The attached engine runs ZERO
    * tokenization jobs until the next mutation (asserted on the postings
    * plan in SearchEngineSpec). */
  def attach(spark: SparkSession, stateDir: String,
             clock: () => Long = () => System.currentTimeMillis(),
             checkpointEvery: Int = 32,
             lexicons: Map[String, Analyzer.Lexicon] = Map.empty): SearchEngine = {
    val base = java.nio.file.Paths.get(stateDir)
    require(java.nio.file.Files.isDirectory(base), s"no engine state at $stateDir")
    val runRe = "^run-(\\d+)$".r
    val s = java.nio.file.Files.list(base)
    val runs = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).collect {
        case runRe(n) => n.toInt
      }.toSeq.sorted(Ordering[Int].reverse)
    } finally s.close()
    // newest run whose pointer committed AND whose batches carry the docs
    // log (an aborted or legacy run is skipped, not trusted)
    val picked = runs.iterator.map { n =>
      (n, new IncrementalIndex.ParquetStateStore(s"$stateDir/run-$n"))
    }.find { case (_, st) => st.pointer.isDefined && st.batches("docs").nonEmpty }
    require(picked.isDefined, s"no committed run with a docs log under $stateDir")
    val (seq, store) = picked.get
    val corpus = IncrementalIndex.readDocs(store, spark).get
    val e = new SearchEngine(spark, corpus, Some(stateDir), clock, checkpointEvery, lexicons)
    e.adoptStore(store, seq)
    e
  }
}
