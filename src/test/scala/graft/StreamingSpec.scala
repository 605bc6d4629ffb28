package graft

import graft.streaming.IncrementalIndex
import graft.corpus.Corpus
import graft.index.InvertedIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental/streaming ingestion: batch-merge semantics (idempotent
  * re-index, no df drift), the parquet state store's crash contract, and a
  * real Structured Streaming file-source run end-to-end. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def docsDf(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "repo", "lang", "content")
  }

  test("mergeBatch: two batches accumulate; stats equal a from-scratch build") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val store = new IncrementalIndex.ParquetStateStore(dir)
    val b1 = docsDf((0L, "r0", "en", "spark join query"), (1L, "r0", "en", "spark filter"))
    val b2 = docsDf((2L, "r1", "en", "join join plan"))
    IncrementalIndex.mergeBatch(store, b1, 0L)
    IncrementalIndex.mergeBatch(store, b2, 1L)
    val all = docsDf((0L, "r0", "en", "spark join query"), (1L, "r0", "en", "spark filter"),
      (2L, "r1", "en", "join join plan"))
    val wantPost = InvertedIndex.postings(InvertedIndex.tokens(all))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val gotPost = store.read(spark, "postings").get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(gotPost == wantPost)
    val gotDf = store.read(spark, "term_stats").get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotDf == Map("spark" -> 2L, "join" -> 2L, "query" -> 1L, "filter" -> 1L, "plan" -> 1L))
  }

  test("re-indexing the same doc is idempotent (no df drift — reference bug not replicated)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val store = new IncrementalIndex.ParquetStateStore(dir)
    val doc = docsDf((0L, "r0", "en", "spark join"))
    IncrementalIndex.mergeBatch(store, doc, 0L)
    val df1 = store.read(spark, "term_stats").get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference increments lemma.frequency on every re-index
    // (IndexingServiceImpl.java:171-178 via :244-264); we must NOT
    IncrementalIndex.mergeBatch(store, doc, 1L)
    IncrementalIndex.mergeBatch(store, doc, 2L)
    val df3 = store.read(spark, "term_stats").get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df3 == df1)
  }

  test("upsert replaces a doc's old postings (delete + reindex in one path)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val store = new IncrementalIndex.ParquetStateStore(dir)
    IncrementalIndex.mergeBatch(store,
      docsDf((0L, "r0", "en", "alpha beta"), (1L, "r0", "en", "alpha gamma")), 0L)
    IncrementalIndex.mergeBatch(store, docsDf((0L, "r0", "en", "delta")), 1L)
    val post = store.read(spark, "postings").get.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(post == Set((0L, "delta"), (1L, "alpha"), (1L, "gamma")))
    val df = store.read(spark, "term_stats").get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("delta" -> 1L, "alpha" -> 1L, "gamma" -> 1L))
  }

  test("state store: uncommitted batch invisible, committed batch atomic") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val store = new IncrementalIndex.ParquetStateStore(dir)
    assert(store.read(spark, "postings").isEmpty)
    IncrementalIndex.mergeBatch(store, docsDf((0L, "r", "en", "x y z")), 0L)
    assert(store.latestBatch("postings").contains(0L))
    // a torn write (data without commit pointer) is ignored by read
    val orphan = s"$dir/postings/batch=99"
    docsDf((9L, "r", "en", "orphan")).write.parquet(orphan)
    assert(store.read(spark, "postings").get
      .filter(col("doc_id") === 9L).count() == 0)
  }

  test("end-to-end Structured Streaming: file source -> foreachBatch -> queryable state") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$dir/incoming"
    val store = new IncrementalIndex.ParquetStateStore(s"$dir/state")
    docsDf((0L, "r0", "en", "spark join query"), (1L, "r0", "en", "hash join"))
      .write.parquet(inDir)
    val schema = docsDf().schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = IncrementalIndex.start(stream, store, s"$dir/ckpt")
    q.awaitTermination(60000)
    val df = store.read(spark, "term_stats").get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("spark" -> 1L, "join" -> 2L, "query" -> 1L, "hash" -> 1L))
    // second drop of files resumes from the checkpoint without reprocessing
    docsDf((2L, "r1", "en", "plan scan")).write.mode("append").parquet(inDir)
    val q2 = IncrementalIndex.start(spark.readStream.schema(schema).parquet(inDir),
      store, s"$dir/ckpt")
    q2.awaitTermination(60000)
    val df2 = store.read(spark, "term_stats").get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df2 == Map("spark" -> 1L, "join" -> 2L, "query" -> 1L, "hash" -> 1L,
      "plan" -> 1L, "scan" -> 1L))
  }
}
