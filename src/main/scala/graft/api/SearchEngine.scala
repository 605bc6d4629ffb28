package graft.api

import graft.analyze.Analyzer
import graft.index.{IndexWriter, InvertedIndex}
import graft.io.TableIO
import graft.query.{QueryFrontend, Search}
import graft.stats.Stats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's API surface (controllers/ApiController.java:21-47) as a
  * Spark-native facade — a user of the reference can switch endpoint by
  * endpoint:
  *
  *   GET  /api/startIndexing  -> startIndexing(corpus)
  *   POST /api/indexPage      -> indexPage(doc)
  *   GET  /api/search         -> search(query, site, offset, limit)
  *   GET  /api/statistics     -> statistics()
  *   GET  /api/stopIndexing   -> (cooperative stop ≙ job abort + snapshot
  *                                resume; see IndexWriter.write(resume))
  *
  * DTO shapes mirror dto/search/SearchResponce.java and the
  * dto/statistics classes. The 60-second query-result cache replicates
  * SearchServiceImpl.java:40-43,68-85 (off the correctness path).
  */
class SearchEngine(spark: SparkSession, var corpus: DataFrame) {

  case class SearchItem(site: String, siteName: String, uri: String,
                        title: String, snippet: String, relevance: Double)
  case class SearchResponse(result: Boolean, count: Long, data: Seq[SearchItem], error: String)
  case class Statistics(sites: Long, pages: Long, lemmas: Long,
                        detailed: Seq[(String, Long, Long)])

  private var tables: InvertedIndex.Tables = _
  private var indexed = false
  private val inFlight = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** full index build — refuses while one is in flight (reference guard,
    * IndexingServiceImpl.java:58-65; the reference answers the start
    * endpoint with an error body while any site is INDEXING). */
  def startIndexing(): Boolean = {
    if (!inFlight.compareAndSet(false, true)) return false
    try synchronized {
      // HTTP-status gate (reference IndexingServiceImpl.java:135-137):
      // error pages never enter the index
      val gated =
        if (corpus.columns.contains("code")) graft.corpus.Corpus.httpOk(corpus)
        else corpus
      corpus = gated.cache()
      tables = InvertedIndex.build(corpus)
      indexed = true
      true
    } finally inFlight.set(false)
  }

  /** single-doc upsert (POST /api/indexPage): replace-by-doc_id, then
    * recompute the in-memory tables (the persisted-index variant is
    * IndexWriter.upsertBuckets). */
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
    val docOk =
      if (doc2.columns.contains("code")) graft.corpus.Corpus.httpOk(doc2) else doc2
    val ids = doc2.select("doc_id")
    corpus = corpus.join(ids, Seq("doc_id"), "left_anti").unionByName(docOk).cache()
    tables = InvertedIndex.build(corpus)
    true
  }

  // 60s TTL result cache (reference: SearchServiceImpl.outdated)
  private val cache = new java.util.concurrent.ConcurrentHashMap[(String, Option[String], Int, Int), (Long, SearchResponse)]()
  val cacheTtlMs = 60000L

  def search(query: String, site: Option[String] = None,
             offset: Int = 0, limit: Int = 20): SearchResponse = {
    require(indexed, "index not built")
    val key = (query, site, offset, limit)
    val now = System.currentTimeMillis()
    val hit = cache.get(key)
    if (hit != null && now - hit._1 < cacheTtlMs) return hit._2
    val resp = doSearch(query, site, offset, limit)
    cache.put(key, (now, resp))
    resp
  }

  private def doSearch(query: String, site: Option[String],
                       offset: Int, limit: Int): SearchResponse = {
    // empty-after-analysis -> error (reference SearchServiceImpl.java:54-57)
    val qTerms = Analyzer.queryTerms("en", query)
    // (the reference's messages are Russian — "Задан пустой поисковый
    // запрос" / "Нет данных по словам: …" — kept in English here)
    if (qTerms.isEmpty)
      return SearchResponse(result = false, 0, Nil, "Empty search query")
    val plan = QueryFrontend.plan(tables.termStats, "en", query)
    if (plan.missing.nonEmpty)
      // reference sentinel row lists the missing words (SearcherPage.java:58-79)
      return SearchResponse(result = false, 0, Nil,
        s"No data for words: ${plan.missing.mkString(", ")}, ")
    if (plan.isEmpty) return SearchResponse(result = true, 0, Nil, null)
    var rows = Search.search(corpus, tables.postings, tables.docStats, tables.termStats,
        tables.nDocs, tables.avgDl, query, "en", site, limit, offset)
      .collect()
    if (rows.isEmpty && offset > 0) {
      // reference quirk (SearchServiceImpl.java:101-118): an offset at or
      // past the end of the result list clamps to the LAST element rather
      // than returning an empty page
      val scoped = site match {
        case Some(r) => tables.postings.join(
          corpus.filter(col("repo") === r).select("doc_id"), Seq("doc_id"), "left_semi")
        case None => tables.postings
      }
      val total = Search.conjunctive(scoped, plan.terms.map(_.term)).count()
      if (total > 0) {
        // Dataset.offset takes an Int; clamp so a >2^31-row match count
        // can't become a negative offset
        val lastOffset = math.min(total - 1, Int.MaxValue.toLong - 1).toInt
        rows = Search.search(corpus, tables.postings, tables.docStats, tables.termStats,
            tables.nDocs, tables.avgDl, query, "en", site, 1, lastOffset)
          .collect()
      }
    }
    val items = rows.map { r =>
      SearchItem(r.getAs[String]("repo"), r.getAs[String]("repo"),
        r.getAs[String]("path"), r.getAs[String]("title"),
        r.getAs[String]("snippet"), r.getAs[Double]("score"))
    }
    SearchResponse(result = true, items.length.toLong, items.toSeq, null)
  }

  def statistics(): Statistics = {
    require(indexed, "index not built")
    val rows = Stats.statistics(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = rows.find(_._1 == "ALL").getOrElse(("ALL", 0L, 0L))
    val detailed = rows.filterNot(_._1 == "ALL").sortBy(_._1)
    Statistics(detailed.length.toLong, total._2, total._3, detailed.toSeq)
  }
}
