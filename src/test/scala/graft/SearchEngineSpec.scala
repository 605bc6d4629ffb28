package graft

import graft.api.SearchEngine
import graft.corpus.Corpus
import org.scalatest.funsuite.AnyFunSuite

/** API-facade behavior: endpoint semantics mirrored from the reference
  * (ApiController paths, SearchResponce shape, error payloads, result
  * cache, upsert visibility). */
class SearchEngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def freshEngine(): SearchEngine = {
    val e = new SearchEngine(spark, Corpus.fromDocuments(spark, "/root/testdata/sf0.001"))
    assert(e.startIndexing())
    e
  }
  lazy val engine = freshEngine()

  test("search returns decorated, ranked items") {
    val r = engine.search("spark join", limit = 5)
    // count = TOTAL matches (reference resultSearch.size()); data = the page
    assert(r.result && r.data.length == 5 && r.count >= 5)
    assert(r.data.head.relevance >= r.data.last.relevance)
    assert(r.data.forall(i => i.snippet.contains("<b>")))
    assert(r.data.forall(i => i.uri.startsWith("doc/")))
  }

  test("empty query and missing-term error payloads mirror the reference") {
    val empty = engine.search("the a")
    assert(!empty.result && empty.error != null)
    val missing = engine.search("spark warpdrive flux")
    assert(!missing.result)
    assert(missing.error.contains("flux") && missing.error.contains("warpdrive"))
  }

  test("site-scoped search restricts results") {
    val r = engine.search("spark join", site = Some("src3"), limit = 10)
    assert(r.result)
    assert(r.data.forall(_.site == "src3"))
  }

  test("offset past the end clamps to the last result (reference pagination quirk)") {
    // total matches for this query is small; an offset far past it must
    // return the LAST ranked element, not an empty page
    // (SearchServiceImpl.java:101-118)
    val all = engine.search("dup spark", limit = 1000)
    assert(all.result && all.count > 0 && all.count < 900)
    val past = engine.search("dup spark", offset = 5000, limit = 10)
    assert(past.result && past.data.length == 1)
    assert(past.count == all.count) // total is total regardless of the page
    assert(past.data.head.uri == all.data.last.uri)
  }

  test("searchAfter: cursor page ≡ offset page; count stays the total") {
    val p1 = engine.search("spark join", limit = 5)
    assert(p1.result && p1.data.length == 5)
    val cursor = p1.data.last
    val docId = cursor.uri.stripPrefix("doc/").toLong
    val p2 = engine.searchAfter("spark join", cursor.relevance, docId, limit = 5)
    val off = engine.search("spark join", offset = 5, limit = 5)
    assert(p2.result)
    assert(p2.data.map(_.uri) == off.data.map(_.uri),
      s"cursor ${p2.data.map(_.uri)} vs offset ${off.data.map(_.uri)}")
    assert(p2.count == p1.count)
    // error payloads mirror search()
    assert(!engine.searchAfter("the a", 1.0, 0L).result)
    assert(!engine.searchAfter("spark warpdrive", 1.0, 0L).result)
  }

  test("searchBoolean: NOT excludes through the facade; missing positive term errors") {
    import graft.query.BooleanQuery._
    val r = engine.searchBoolean(And(Seq(Term("spark"), Not(Term("dup")))), limit = 10)
    assert(r.result && r.data.nonEmpty)
    val dupUris = engine.search("dup", limit = 1000).data.map(_.uri).toSet
    assert(dupUris.nonEmpty)
    assert(r.data.forall(i => !dupUris.contains(i.uri)), "an excluded doc leaked through NOT")
    // count is the full candidate-set size, not the page size
    assert(r.count >= r.data.length)
    val bad = engine.searchBoolean(And(Seq(Term("spark"), Term("warpdrive"))))
    assert(!bad.result && bad.error.contains("warpdrive"))
  }

  test("result cache: repeated query within TTL returns the same object") {
    val a = engine.search("hash", limit = 3)
    val b = engine.search("hash", limit = 3)
    assert(a eq b) // cache hit returns the identical response instance
  }

  test("statistics mirrors TotalStatistics + detailed items incl. status/statusTime/error") {
    val s = engine.statistics()
    assert(s.sites == 20 && s.pages == 500)
    assert(s.detailed.map(_.pages).sum == s.pages)
    assert(s.lemmas > 0)
    // DetailedStatisticsItem parity: status + heartbeat timestamp + error payload
    assert(s.detailed.forall(d => d.status == "INDEXED" && d.statusTime > 0 && d.error == null))
  }

  test("HTTP-status gate: error pages never enter the index (code > 299)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val c = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
      .withColumn("code", when(col("doc_id") === 0L, lit(404)).otherwise(col("code")))
    val word0 = graft.analyze.Analyzer
      .analyze("en", c.filter(col("doc_id") === 0L).select("content").head.getString(0)).head
    val e = new SearchEngine(spark, c)
    assert(e.startIndexing())
    val r = e.search(word0, limit = 1000)
    assert(!r.data.exists(_.uri == "doc/0"), "404 page must not be searchable")
    assert(e.statistics().pages == 499)
  }

  test("indexPage with an error status removes the old version, indexes nothing") {
    import spark.implicits._
    val e = freshEngine()
    // re-fetch of page 0 came back 404: reference deletes the old page and
    // the status gate skips indexing the new fetch
    val doc = Seq((0L, "src0", "doc/0",
      "0000000000000000000000000000000000000000", "en", "error page body", 404))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content", "code")
    assert(e.indexPage(doc))
    assert(e.statistics().pages == 499)
    val r = e.search("error", limit = 10)
    assert(!r.data.exists(_.uri == "doc/0"))
  }

  test("indexPage upsert: new content is searchable, old is gone") {
    import spark.implicits._
    val e = freshEngine()
    val before = e.search("dup", limit = 100)
    val doc = Seq((0L, "src0", "doc/0",
      "0000000000000000000000000000000000000000", "en", "dup dup dup unique999word"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    assert(e.indexPage(doc))
    val after = e.search("unique999word", limit = 10)
    assert(after.result && after.count == 1 && after.data.head.uri == "doc/0")
    val dupAfter = e.search("dup", limit = 100)
    assert(dupAfter.count == before.count + 1 ||
      before.data.exists(_.uri == "doc/0") && dupAfter.count == before.count)
  }

  test("indexPage is O(page): delta batch carries only the doc; no corpus rescan; plan size stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // checkpointEvery = 2: the corpus delta chain must fold back to a flat
    // checkpoint every second upsert (amortized replace, bounded plan)
    val e = new SearchEngine(spark,
      Corpus.fromDocuments(spark, "/root/testdata/sf0.001"), checkpointEvery = 2)
    assert(e.startIndexing())
    def up(id: Long, content: String): Unit = {
      val doc = Seq((id, "src0", s"doc/$id", "0" * 40, "en", content))
        .toDF("doc_id", "repo", "path", "commit", "lang", "content")
      assert(e.indexPage(doc))
    }
    up(1L, "alphaone betaone gammaone alphaone")
    // the newest LSM batch holds ONLY this doc's postings (3 distinct terms)
    val latest = e.store.latestBatch.get
    val delta = spark.read.parquet(s"${e.store.dir}/postings/batch=$latest")
    assert(delta.count() == 3)
    assert(delta.select("doc_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
    // plan size right after each fold boundary must be identical — the
    // delta chain may grow BETWEEN folds (by a constant per upsert) but
    // must never grow across them
    up(2L, "deltaone epsilonone") // fold #1
    val nodes2 = e.corpus.queryExecution.analyzed.collect { case p => p }.size
    up(3L, "zetaone etaone")
    val nodes3 = e.corpus.queryExecution.analyzed.collect { case p => p }.size
    up(4L, "thetaone iotaone")    // fold #2
    val nodes4 = e.corpus.queryExecution.analyzed.collect { case p => p }.size
    assert(nodes4 == nodes2, s"corpus plan grew across folds: $nodes2 -> $nodes4")
    assert(nodes3 > nodes2, "between folds the replace must stay a lazy delta chain" +
      s" (got $nodes2 -> $nodes3)") // i.e. no O(corpus) checkpoint per upsert
    // live tables reconstruct from the LSM batch log, never from a corpus
    // re-tokenization: the postings plan reads state parquet only
    val postPlan = e.tables.postings.queryExecution.executedPlan.toString
    assert(!postPlan.contains("documents.parquet"),
      "postings plan must not scan the corpus source")
    // and the merged content is searchable with correct stats
    val r = e.search("epsilonone", limit = 5)
    assert(r.result && r.count == 1 && r.data.head.uri == "doc/2")
    assert(e.statistics().pages == 500) // 4 replaced docs, none added
  }

  test("HTML corpus facade coherence: markup never indexed, body searchable, <title> used") {
    import spark.implicits._
    val c = Seq(
      (0L, "site0", "doc/0", "0" * 40, "en",
        "<html><head><title>Greeting Page</title><style>body { colorvalue: red; }</style></head>" +
          "<body><p>hello zanzibar world</p><script>var scriptsecret = 1;</script></body></html>"),
      (1L, "site0", "doc/1", "0" * 40, "en", "plain text document mentioning zanzibar too"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    val e = new SearchEngine(spark, c)
    assert(e.startIndexing())
    // script/style/tag tokens must NOT be indexed (extract-then-lemmatize,
    // matching the reference's Jsoup text() before Lemmatizator)
    assert(!e.search("scriptsecret").result)
    assert(!e.search("colorvalue").result)
    // body text IS searchable; title from <title>; snippet highlights the
    // extracted text — decoration coherent with what was indexed
    val r = e.search("zanzibar", limit = 5)
    assert(r.result && r.count == 2)
    val hit0 = r.data.find(_.uri == "doc/0").get
    assert(hit0.title == "Greeting Page")
    assert(hit0.snippet.contains("<b>zanzibar</b>"))
    assert(!hit0.snippet.contains("scriptsecret"))
    // a plain-text doc keeps path-as-title
    assert(r.data.find(_.uri == "doc/1").get.title == "doc/1")
  }

  test("lang=ru search end-to-end through the facade (Cyrillic analyzer branch)") {
    import spark.implicits._
    val c = Seq(
      (0L, "ru0", "doc/0", "0" * 40, "ru", "Ёлка и дом стоят в лесу"),
      (1L, "ru0", "doc/1", "0" * 40, "ru", "дом у реки"),
      (2L, "ru0", "doc/2", "0" * 40, "ru", "только лес"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    val e = new SearchEngine(spark, c)
    assert(e.startIndexing())
    val r = e.search("дом", lang = "ru", limit = 10)
    assert(r.result && r.count == 2, s"got $r")
    assert(r.data.map(_.uri).toSet == Set("doc/0", "doc/1"))
    assert(r.data.forall(_.snippet.contains("<b>дом</b>")))
    // ё-fold: a query spelled with ё matches the indexed fold
    val r2 = e.search("ёлка", lang = "ru", limit = 10)
    assert(r2.result && r2.count == 1 && r2.data.head.uri == "doc/0")
    // ru stopword-only query -> empty-query error, as the reference
    assert(!e.search("и в на", lang = "ru").result)
  }

  test("stopIndexing: abort mid persisted build -> FAILED status; restart resumes byte-identically") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    val cfg = graft.index.IndexWriter.Config(docsPerShard = 64, nBuckets = 8)
    def fingerprint(dir: String): Map[(String, Int), Long] =
      spark.read.parquet(s"$dir/data")
        .select(col("term"), col("shard"), xxhash64(col("term"), col("shard"), col("bytes")).as("h"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    // uninterrupted reference build
    val refDir = Files.createTempDirectory("graft-api-ref").toString
    assert(new SearchEngine(spark, corpus).startIndexingPersisted(refDir, 1L, cfg, groupSize = 2))
    // interrupted build: the PUBLIC stopIndexing() is driven after the
    // first committed group; the next group boundary observes it
    val dir = Files.createTempDirectory("graft-api-stop").toString
    val e = new SearchEngine(spark, corpus)
    assert(!e.stopIndexing()) // nothing in flight yet -> reference error body
    var stopped = false
    val ok = e.startIndexingPersisted(dir, 1L, cfg, groupSize = 2,
      onGroupCommitted = _ => if (!stopped) { stopped = true; assert(e.stopIndexing()) })
    assert(!ok, "build must report stopped")
    val committed = graft.io.TableIO.readCurrent(dir).get.committed
    assert(committed.nonEmpty && committed.size < cfg.nBuckets,
      s"stop must land mid-build: $committed")
    // FAILED row with the error payload is visible in the status surface
    val failedRows = graft.stats.Stats.runStatus(spark, dir).collect()
      .filter(_.getAs[String]("status") == "FAILED")
    assert(failedRows.nonEmpty)
    assert(failedRows.head.getAs[String]("lastError").contains("stopped by user"))
    assert(failedRows.head.getAs[Long]("statusTime") > 0)
    // while stopped-and-not-resumed, the status surface reports FAILED
    // with the error payload (reference Site.status + last_error)
    // restart resumes the remaining buckets -> identical to uninterrupted
    assert(e.startIndexingPersisted(dir, 2L, cfg, groupSize = 2))
    assert(fingerprint(dir) == fingerprint(refDir))
    val mGot = graft.io.TableIO.readCurrent(dir).get
    val mRef = graft.io.TableIO.readCurrent(refDir).get
    assert(mGot.partitions.map(p => p.partition -> (p.rows, p.bytes, p.hashAgg)).toMap ==
      mRef.partitions.map(p => p.partition -> (p.rows, p.bytes, p.hashAgg)).toMap)
    // ...and the resumed engine is fully live: search + clean statistics
    val r = e.search("spark join", limit = 5)
    assert(r.result && r.data.length == 5)
    assert(e.statistics().detailed.forall(d => d.status == "INDEXED" && d.error == null))
  }

  test("persisted build leaves the facade fully usable: search/statistics/upsert") {
    import spark.implicits._
    import java.nio.file.Files
    val cfg = graft.index.IndexWriter.Config(docsPerShard = 64, nBuckets = 8)
    val dir = Files.createTempDirectory("graft-api-pers").toString
    val e = new SearchEngine(spark, Corpus.fromDocuments(spark, "/root/testdata/sf0.001"))
    assert(e.startIndexingPersisted(dir, 1L, cfg, groupSize = 4))
    val r = e.search("spark join", limit = 5)
    assert(r.result && r.data.length == 5 && r.data.forall(_.snippet.contains("<b>")))
    val s = e.statistics()
    assert(s.pages == 500 && s.detailed.forall(_.status == "INDEXED"))
    // upserts flow through the same live store the seed created
    val doc = Seq((0L, "src0", "doc/0", "0" * 40, "en", "persistedword only"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    assert(e.indexPage(doc))
    val r2 = e.search("persistedword", limit = 5)
    assert(r2.result && r2.count == 1 && r2.data.head.uri == "doc/0")
  }

  test("persisted build ships aux artifacts: champions + per-repo stats committed with lineage") {
    import java.nio.file.Files
    val cfg = graft.index.IndexWriter.Config(docsPerShard = 64, nBuckets = 8)
    val dir = Files.createTempDirectory("graft-api-aux").toString
    val e = new SearchEngine(spark, Corpus.fromDocuments(spark, "/root/testdata/sf0.001"))
    assert(e.startIndexingPersisted(dir, 1L, cfg, groupSize = 4, championsM = Some(3)))
    val man = graft.io.TableIO.readCurrent(dir).get
    assert(man.aux.map(_.name).toSet ==
      Set(graft.index.Champions.auxName, graft.stats.Stats.repoTermStatsAux))
    assert(man.aux.forall(a => a.rows > 0 && a.bytes > 0))
    // the cold champions tier answers from the artifact alone
    val ch = graft.index.Champions.readForTerms(spark, dir, Seq("spark", "join"), cfg)
    assert(ch.count() > 0)
    // and the cold facets path needs no tokenization
    val f = graft.stats.Stats.facetsPersisted(spark, dir, k = 2)
    assert(f.count() > 0)
    assert(!f.queryExecution.analyzed.toString.contains("regexp_replace"),
      "cold facets must not tokenize")
  }

  test("query cache cannot serve a doc the upsert path just deleted") {
    import spark.implicits._
    val e = freshEngine()
    val q = "dup"
    val before = e.search(q, limit = 1000)
    assert(before.result && before.count > 0)
    val victim = before.data.head.uri.stripPrefix("doc/").toLong
    // error re-fetch -> delete path removes the doc from corpus and index;
    // the cached response for q must NOT survive the mutation
    val doc = Seq((victim, "src0", s"doc/$victim", "0" * 40, "en", "gone", 404))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content", "code")
    assert(e.indexPage(doc))
    val after = e.search(q, limit = 1000)
    assert(!(after eq before), "mutation must invalidate the result cache")
    assert(!after.data.exists(_.uri == s"doc/$victim"), "deleted doc still served")
  }

  test("count reports the TOTAL match count; data is the page (page 1 and 2)") {
    // reference: count = resultSearch.size() BEFORE pagination
    // (SearchServiceImpl.java:90) — what a UI pager needs
    val total = engine.search("spark join", limit = 1000)
    assert(total.result && total.count == total.data.length && total.count > 20)
    val p1 = engine.search("spark join", offset = 0, limit = 10)
    val p2 = engine.search("spark join", offset = 10, limit = 10)
    assert(p1.data.length == 10 && p2.data.length == 10)
    assert(p1.count == total.count && p2.count == total.count)
    assert(p1.data.map(_.uri).toSet.intersect(p2.data.map(_.uri).toSet).isEmpty)
  }

  test("per-lang lexicon end-to-end: query 'дома' finds docs indexed under 'дом'") {
    import spark.implicits._
    val c = Seq(
      (0L, "ru0", "doc/0", "0" * 40, "ru", "дом стоит в лесу"),   // indexed form: дом
      (1L, "ru0", "doc/1", "0" * 40, "ru", "дома у реки"),        // surface дома -> дом
      (2L, "ru0", "doc/2", "0" * 40, "ru", "только лес"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    val e = new SearchEngine(spark, c,
      lexicons = Map("ru" -> graft.analyze.DefaultLexicon.russian))
    assert(e.startIndexing())
    // query side expands дома -> дом; index side indexed doc/1's "дома"
    // under дом — BOTH docs must match (reference lemmatizes both sides)
    val r = e.search("дома", lang = "ru", limit = 10)
    assert(r.result && r.count == 2, s"got $r")
    assert(r.data.map(_.uri).toSet == Set("doc/0", "doc/1"))
    // without the lexicon the same query finds only the literal surface
    val plain = new SearchEngine(spark, c)
    assert(plain.startIndexing())
    val rp = plain.search("дома", lang = "ru", limit = 10)
    assert(rp.count == 1 && rp.data.head.uri == "doc/1")
  }

  test("reattach: a new SearchEngine over an existing stateDir serves without rebuilding") {
    import java.nio.file.Files
    val stateDir = Files.createTempDirectory("graft-reattach").toString
    val e = new SearchEngine(spark,
      Corpus.fromDocuments(spark, "/root/testdata/sf0.001"), stateDir = Some(stateDir))
    assert(e.startIndexing())
    val before = e.search("spark join", limit = 10)
    val statsBefore = e.statistics()
    // drop the object; attach a fresh engine to the surviving state
    val e2 = SearchEngine.attach(spark, stateDir)
    val after = e2.search("spark join", limit = 10)
    assert(after.result && after.count == before.count)
    assert(after.data.map(i => (i.uri, i.title, i.snippet, i.relevance)) ==
      before.data.map(i => (i.uri, i.title, i.snippet, i.relevance)))
    // ZERO tokenization on reattach: the live tables read state parquet
    // only — no Analyzer chain (regexp_replace) and no corpus source scan
    val postPlan = e2.tables.postings.queryExecution.executedPlan.toString
    assert(!postPlan.contains("regexp_replace"), "reattach must not re-tokenize")
    assert(!postPlan.contains("documents.parquet"))
    // statistics agree and also come from store tables only
    val statsAfter = e2.statistics()
    assert(statsAfter.pages == statsBefore.pages && statsAfter.lemmas == statsBefore.lemmas)
    // the attached engine stays fully mutable: an upsert lands in the SAME
    // state lineage and is immediately searchable
    import spark.implicits._
    val doc = Seq((0L, "src0", "doc/0", "0" * 40, "en", "reattachword only"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    assert(e2.indexPage(doc))
    val r2 = e2.search("reattachword", limit = 5)
    assert(r2.result && r2.count == 1 && r2.data.head.uri == "doc/0")
  }

  test("facade serves persisted WAND path when a tableDir is attached, rank-identical to the DataFrame path") {
    import java.nio.file.Files
    val cfg = graft.index.IndexWriter.Config(docsPerShard = 64, nBuckets = 8)
    val dir = Files.createTempDirectory("graft-api-wandpath").toString
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val pe = new SearchEngine(spark, corpus)
    assert(pe.startIndexingPersisted(dir, 1L, cfg, groupSize = 4))
    assert(pe.servesFromPersisted, "committed snapshot must arm the WAND tier")
    // LSM-only engine = the DataFrame reference path
    val de = new SearchEngine(spark, corpus)
    assert(de.startIndexing())
    assert(!de.servesFromPersisted)
    for (q <- Seq("spark join", "dup hash spark", "hash")) {
      val a = pe.search(q, limit = 10)
      val b = de.search(q, limit = 10)
      assert(a.count == b.count, s"$q: count ${a.count} vs ${b.count}")
      // rank-identical; scores agree to 1e-9 (summation order across the
      // two physical paths differs in the last ulp — same gate the DuckDB
      // oracle applies via 4dp rounding)
      assert(a.data.map(_.uri) == b.data.map(_.uri),
        s"$q: WAND tier rank order diverged from DataFrame tier")
      a.data.zip(b.data).foreach { case (x, y) =>
        assert(math.abs(x.relevance - y.relevance) < 1e-9, s"$q: ${x.uri} score diverged")
      }
    }
    // page 2 through the WAND tier (rank offset semantics shared)
    val p2a = pe.search("spark join", offset = 10, limit = 10)
    val p2b = de.search("spark join", offset = 10, limit = 10)
    assert(p2a.data.map(_.uri) == p2b.data.map(_.uri))
    // a mutation invalidates the snapshot: fall back to the live tables
    import spark.implicits._
    val doc = Seq((0L, "src0", "doc/0", "0" * 40, "en", "wandfallbackword"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    assert(pe.indexPage(doc))
    assert(!pe.servesFromPersisted, "mutation must invalidate the persisted tier")
    val r = pe.search("wandfallbackword", limit = 5)
    assert(r.result && r.count == 1)
  }

  test("authority prior: blend across both tiers, persisted restore, graceful staleness") {
    import java.nio.file.Files
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val nDocs = corpus.count()
    val edges = graft.corpus.Crawl.syntheticEdges(corpus, nDocs)

    // DataFrame tier: installing the prior changes scores, clearing restores
    val de = new SearchEngine(spark, corpus)
    assert(de.startIndexing())
    val plain = de.search("spark join", limit = 10)
    val pr = graft.corpus.LinkRank.pagerank(edges, corpus.select("doc_id"), nDocs, iters = 3)
    de.setAuthorityPrior(pr, beta = 0.5)
    val blended = de.search("spark join", limit = 10)
    assert(blended.result && blended.count == plain.count) // candidates unchanged
    assert(blended.data.map(_.relevance) != plain.data.map(_.relevance),
      "blend must rescale scores (factor <= 1)")
    de.clearAuthorityPrior()
    assert(de.search("spark join", limit = 10).data.map(_.uri) == plain.data.map(_.uri))

    // persisted tier: the prior rides the build as an aux artifact and the
    // WAND two-stage rerank must agree with the DataFrame blend tier
    val cfg = graft.index.IndexWriter.Config(docsPerShard = 64, nBuckets = 8)
    val dir = Files.createTempDirectory("graft-api-prior").toString
    val pe = new SearchEngine(spark, corpus)
    assert(pe.startIndexingPersisted(dir, 1L, cfg, groupSize = 4,
      priorEdges = Some(edges)))
    assert(pe.servesFromPersisted)
    de.setAuthorityPrior(pr, beta = 0.5)
    for (q <- Seq("spark join", "hash")) {
      val a = pe.search(q, limit = 10) // WAND candidates -> rerank
      val b = de.search(q, limit = 10) // exhaustive DataFrame blend
      assert(a.data.map(_.uri) == b.data.map(_.uri),
        s"$q: two-stage rerank diverged from exhaustive blend")
      a.data.zip(b.data).foreach { case (x, y) =>
        assert(math.abs(x.relevance - y.relevance) < 1e-9, s"$q: ${x.uri} score diverged")
      }
    }

    // a fresh engine restores the persisted prior by lineage
    val fe = new SearchEngine(spark, corpus)
    assert(fe.startIndexing())
    fe.loadAuthorityPrior(dir, beta = 0.5)
    val restored = fe.search("spark join", limit = 10)
    assert(restored.data.map(_.uri) == de.search("spark join", limit = 10).data.map(_.uri))

    // graceful staleness: an upserted page is absent from the prior (pr = 0)
    // yet stays searchable on relevance alone
    import spark.implicits._
    val doc = Seq((0L, "src0", "doc/0", "0" * 40, "en", "priorstaleword"))
      .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    assert(pe.indexPage(doc))
    val r = pe.search("priorstaleword", limit = 5)
    assert(r.result && r.count == 1)
  }

  test("percolation alerts: registerAlert fires on matching upserts only, drain clears") {
    import spark.implicits._
    val e = freshEngine()
    assert(!e.registerAlert(1L, "the a")) // analyzes to nothing -> refused
    assert(e.registerAlert(2L, "percolword spark"))
    assert(e.registerAlert(3L, "neverseenterm"))
    def page(id: Long, content: String) =
      Seq((id, "src1", s"doc/$id", "0" * 40, "en", content))
        .toDF("doc_id", "repo", "path", "commit", "lang", "content")
    assert(e.indexPage(page(7001L, "percolword spark here")))  // matches 2
    assert(e.indexPage(page(7002L, "spark only, no match")))   // partial ≠ match
    assert(e.drainAlerts() == Seq((2L, 7001L)))
    assert(e.drainAlerts().isEmpty) // drained
    e.removeAlert(2L)
    assert(e.indexPage(page(7003L, "percolword spark again")))
    assert(e.drainAlerts().isEmpty) // removed alerts stay silent
  }

  test("statistics() reads only store tables — no Analyzer nodes, values unchanged") {
    val e = freshEngine()
    val plan = e.statisticsFrame().queryExecution.analyzed.toString
    assert(!plan.contains("regexp_replace"),
      "statistics must not re-tokenize the corpus")
    assert(!plan.toLowerCase.contains("udf"), "statistics must stay store-table reads")
    // values match the tokenize rollup exactly
    val viaStore = e.statistics()
    val rolled = graft.stats.Stats.statistics(e.corpus).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaStore.pages == rolled("ALL")._1 && viaStore.lemmas == rolled("ALL")._2)
    viaStore.detailed.foreach { d =>
      assert((d.pages, d.lemmas) == rolled(d.site), s"repo ${d.site} diverged")
    }
  }

  test("fully gated corpus: persisted build completes empty instead of crashing") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    val cfg = graft.index.IndexWriter.Config(docsPerShard = 64, nBuckets = 8)
    val dir = Files.createTempDirectory("graft-api-allgated").toString
    val c = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
      .withColumn("code", lit(500))
    val e = new SearchEngine(spark, c)
    assert(e.startIndexingPersisted(dir, 1L, cfg, groupSize = 4))
    assert(e.statistics().pages == 0)
  }
}
