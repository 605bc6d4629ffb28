package graft

import graft.streaming.IncrementalIndex
import graft.streaming.IncrementalIndex.ParquetStateStore
import graft.index.InvertedIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental/streaming ingestion over the LSM-style batch log: merge
  * semantics (idempotent re-index, no df drift), per-batch cost shape
  * (delta stats + pushed-down point reads, never an O(index) rewrite),
  * replay/crash contract, compaction, and a real Structured Streaming
  * file-source run end-to-end. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def docsDf(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "repo", "lang", "content")
  }

  def postSet(store: ParquetStateStore) =
    IncrementalIndex.readPostings(store, spark).get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
  def dfMap(store: ParquetStateStore) =
    IncrementalIndex.readTermStats(store, spark).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("mergeBatch: two batches accumulate; stats equal a from-scratch build") {
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    val b1 = docsDf((0L, "r0", "en", "spark join query"), (1L, "r0", "en", "spark filter"))
    val b2 = docsDf((2L, "r1", "en", "join join plan"))
    IncrementalIndex.mergeBatch(store, b1, 0L)
    IncrementalIndex.mergeBatch(store, b2, 1L)
    val all = docsDf((0L, "r0", "en", "spark join query"), (1L, "r0", "en", "spark filter"),
      (2L, "r1", "en", "join join plan"))
    val wantPost = InvertedIndex.postings(InvertedIndex.tokens(all))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(postSet(store) == wantPost)
    assert(dfMap(store) ==
      Map("spark" -> 2L, "join" -> 2L, "query" -> 1L, "filter" -> 1L, "plan" -> 1L))
    // doc_stats reconstruct too
    val dl = IncrementalIndex.readDocStats(store, spark).get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == Map(0L -> 3L, 1L -> 2L, 2L -> 3L))
  }

  test("re-indexing the same doc is idempotent (no df drift — reference bug not replicated)") {
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    val doc = docsDf((0L, "r0", "en", "spark join"))
    IncrementalIndex.mergeBatch(store, doc, 0L)
    val df1 = dfMap(store)
    // reference increments lemma.frequency on every re-index
    // (IndexingServiceImpl.java:171-178 via :244-264); we must NOT
    IncrementalIndex.mergeBatch(store, doc, 1L)
    IncrementalIndex.mergeBatch(store, doc, 2L)
    assert(dfMap(store) == df1)
  }

  test("upsert replaces a doc's old postings (delete + reindex in one path)") {
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    IncrementalIndex.mergeBatch(store,
      docsDf((0L, "r0", "en", "alpha beta"), (1L, "r0", "en", "alpha gamma")), 0L)
    IncrementalIndex.upsertDoc(store, docsDf((0L, "r0", "en", "delta")))
    assert(postSet(store).map(p => (p._1, p._2)) ==
      Set((0L, "delta"), (1L, "alpha"), (1L, "gamma")))
    assert(dfMap(store) == Map("delta" -> 1L, "alpha" -> 1L, "gamma" -> 1L))
  }

  test("per-batch work is a DELTA: point-read pushed to parquet, no stats recompute") {
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    IncrementalIndex.mergeBatch(store,
      docsDf((0L, "r", "en", "alpha beta"), (1L, "r", "en", "gamma beta"),
        (2L, "r", "en", "alpha gamma")), 0L)
    // the replaced-doc lookup compiles to an In(doc_id,...) filter pushed to
    // the parquet scan — per-batch cost reads the touched docs' row groups,
    // not the whole postings state
    val probe = IncrementalIndex.postingsForDocs(store, spark, Seq(1L)).get
    val plan = probe.queryExecution.executedPlan.toString
    // Catalyst folds a 1-element isin to EqualTo; either way it reaches the scan
    assert(plan.contains("PushedFilters") &&
      (plan.contains("In(doc_id") || plan.contains("EqualTo(doc_id")),
      s"expected pushed doc_id filter, plan:\n$plan")
    // and the batch's own term_stats artifact holds signed deltas only
    // (touched terms), not a recomputed full table
    IncrementalIndex.mergeBatch(store, docsDf((1L, "r", "en", "alpha")), 1L)
    val delta1 = spark.read.parquet(s"${store.dir}/term_stats/batch=1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(delta1 == Map("alpha" -> 1L, "gamma" -> -1L, "beta" -> -1L),
      s"expected only touched-term deltas, got $delta1")
    assert(dfMap(store) == Map("alpha" -> 3L, "beta" -> 1L, "gamma" -> 1L))
  }

  test("crash contract: torn batch invisible; replay reproduces identical state") {
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    IncrementalIndex.mergeBatch(store, docsDf((0L, "r", "en", "x y z")), 0L)
    // a torn write (data without the pointer flip) is ignored by readers
    docsDf((9L, "r", "en", "orphan")).write.parquet(s"${store.dir}/postings/batch=99")
    assert(!postSet(store).exists(_._1 == 9L))
    // replay AFTER commit (streaming checkpoint lost the ack): same batch id,
    // same input — state must be byte-equal, not cancelled or doubled
    val b1 = docsDf((0L, "r", "en", "x q"))
    IncrementalIndex.mergeBatch(store, b1, 1L)
    val (p1, d1) = (postSet(store), dfMap(store))
    IncrementalIndex.mergeBatch(store, b1, 1L) // replay
    assert(postSet(store) == p1 && dfMap(store) == d1)
    assert(store.latestBatch.contains(1L))
  }

  test("compaction folds the log into one base batch with identical live tables") {
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    IncrementalIndex.mergeBatch(store,
      docsDf((0L, "r", "en", "alpha beta"), (1L, "r", "en", "gamma")), 0L)
    IncrementalIndex.mergeBatch(store, docsDf((0L, "r", "en", "beta beta")), 1L)
    val (p0, d0) = (postSet(store), dfMap(store))
    IncrementalIndex.compactState(store, spark)
    assert(postSet(store) == p0 && dfMap(store) == d0)
    // read fan-in is now ONE batch
    assert(store.batches("postings") == Seq(2L))
    // and further merges keep working on top of the new base
    IncrementalIndex.upsertDoc(store, docsDf((1L, "r", "en", "delta")))
    assert(dfMap(store) == Map("beta" -> 1L, "delta" -> 1L))
  }

  test("stream ids never collide with compaction/upsert batches (separate id spaces)") {
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    IncrementalIndex.mergeBatch(store, docsDf((0L, "r", "en", "alpha")), 0L)
    IncrementalIndex.mergeBatch(store, docsDf((1L, "r", "en", "beta")), 1L)
    IncrementalIndex.compactState(store, spark) // folds into base batch 2
    // the stream's NEXT checkpoint id is 2 — storage ids are store-allocated,
    // so this must land in a fresh batch, not overwrite the compacted base
    IncrementalIndex.mergeBatch(store, docsDf((2L, "r", "en", "gamma")), 2L)
    assert(dfMap(store) == Map("alpha" -> 1L, "beta" -> 1L, "gamma" -> 1L))
    // and a stale (already-applied) stream id is skipped entirely
    IncrementalIndex.mergeBatch(store, docsDf((3L, "r", "en", "delta")), 1L)
    assert(!dfMap(store).contains("delta"))
  }

  test("a batch carrying two versions of one doc keeps ONE deterministic version") {
    val b = docsDf((0L, "r", "en", "alpha beta"), (0L, "r", "en", "gamma"))
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    IncrementalIndex.mergeBatch(store, b)
    val terms = postSet(store).map(_._2)
    assert(terms == Set("alpha", "beta") || terms == Set("gamma"),
      s"must be one version's terms, not a union: $terms")
    // deterministic: a fresh store ingesting the same batch picks the same version
    val store2 = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    IncrementalIndex.mergeBatch(store2, b)
    assert(postSet(store2) == postSet(store))
  }

  test("a seq column orders within-batch last-writer-wins (latest version kept)") {
    import spark.implicits._
    // two sequential updates of doc 0 in ONE micro-batch: the higher seq
    // must win (reference delete+reindex last-write-wins), regardless of
    // the sha tie-break order
    for (swap <- Seq(false, true)) {
      val rows = Seq((0L, "r", "en", "older version one", 1L),
                     (0L, "r", "en", "newest version two", 2L))
      val b = (if (swap) rows.reverse else rows)
        .toDF("doc_id", "repo", "lang", "content", "seq")
      val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
      IncrementalIndex.mergeBatch(store, b)
      val terms = postSet(store).map(_._2)
      assert(terms == Set("newest", "version", "two"), s"swap=$swap kept: $terms")
    }
  }

  test("deleteDocs removes a doc O(page): postings masked, df decremented, no index rescan") {
    import spark.implicits._
    val store = new ParquetStateStore(Files.createTempDirectory("graft-stream").toString)
    IncrementalIndex.mergeBatch(store,
      docsDf((0L, "r0", "en", "spark join"), (1L, "r0", "en", "spark filter")))
    IncrementalIndex.deleteDocs(store, Seq(0L).toDF("doc_id"))
    assert(postSet(store).map(_._1) == Set(1L))
    assert(dfMap(store) == Map("spark" -> 1L, "filter" -> 1L)) // join dropped to 0 -> absent
    // doc_stats row gone too
    val ds = IncrementalIndex.readDocStats(store, spark).get.collect().map(_.getLong(0)).toSet
    assert(ds == Set(1L))
    // the delete batch wrote only the ids + signed term deltas — postings
    // dir for that batch must not exist (no index rewrite)
    val latest = store.latestBatch.get
    assert(!Files.exists(java.nio.file.Paths.get(s"${store.dir}/postings/batch=$latest")))
    // deleting an absent doc is a no-op that stays consistent
    IncrementalIndex.deleteDocs(store, Seq(99L).toDF("doc_id"))
    assert(postSet(store).map(_._1) == Set(1L))
    assert(dfMap(store) == Map("spark" -> 1L, "filter" -> 1L))
  }

  test("end-to-end Structured Streaming: file source -> foreachBatch -> queryable state") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$dir/incoming"
    val store = new ParquetStateStore(s"$dir/state")
    docsDf((0L, "r0", "en", "spark join query"), (1L, "r0", "en", "hash join"))
      .write.parquet(inDir)
    val schema = docsDf().schema
    val q = IncrementalIndex.start(spark.readStream.schema(schema).parquet(inDir),
      store, s"$dir/ckpt")
    q.awaitTermination(60000)
    assert(dfMap(store) == Map("spark" -> 1L, "join" -> 2L, "query" -> 1L, "hash" -> 1L))
    // second drop of files resumes from the checkpoint without reprocessing
    docsDf((2L, "r1", "en", "plan scan")).write.mode("append").parquet(inDir)
    val q2 = IncrementalIndex.start(spark.readStream.schema(schema).parquet(inDir),
      store, s"$dir/ckpt")
    q2.awaitTermination(60000)
    assert(dfMap(store) == Map("spark" -> 1L, "join" -> 2L, "query" -> 1L, "hash" -> 1L,
      "plan" -> 1L, "scan" -> 1L))
  }
}
