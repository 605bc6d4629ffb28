package graft.streaming

import graft.index.InvertedIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion surface. The reference has no streaming (SURVEY.md
  * §2.10) — its analog is the long-running crawl job with cooperative stop
  * and the single-page re-index. This module provides the natural Spark
  * shape for both: a Structured Streaming source of new/changed docs feeding
  * `foreachBatch`, where each micro-batch
  *
  *   1. tokenizes the delta docs,
  *   2. computes delta postings/term_stats,
  *   3. merges them into the running state tables
  *      (old UNION delta → groupBy → sum — the pure-aggregation replacement
  *      for the reference's lock-guarded read-modify-write df increments,
  *      IndexingServiceImpl.java:171-193).
  *
  * State lives in an exchangeable `StateStore` trait: tests use in-memory,
  * production writes parquet snapshots per batch (append-only, resumable
  * from the last committed batch id — same manifest contract as the batch
  * writer).
  */
object IncrementalIndex {

  trait StateStore {
    def read(spark: SparkSession, name: String): Option[DataFrame]
    def write(name: String, df: DataFrame, batchId: Long): Unit
  }

  /** parquet-snapshot store: each batch writes `name/batch=<id>`, read
    * resolves the latest committed batch (crash between write and commit
    * replays the batch — idempotent because batch output is deterministic). */
  final class ParquetStateStore(dir: String) extends StateStore {
    private def committedPath(name: String) = s"$dir/$name/_committed"
    def latestBatch(name: String): Option[Long] = {
      val f = new java.io.File(committedPath(name))
      if (f.exists) Some(java.nio.file.Files.readString(f.toPath).trim.toLong) else None
    }
    def read(spark: SparkSession, name: String): Option[DataFrame] =
      latestBatch(name).map(b => spark.read.parquet(s"$dir/$name/batch=$b"))
    def write(name: String, df: DataFrame, batchId: Long): Unit = {
      df.write.mode("overwrite").parquet(s"$dir/$name/batch=$batchId")
      val tmp = java.nio.file.Paths.get(s"$dir/$name/_committed.tmp")
      java.nio.file.Files.createDirectories(tmp.getParent)
      java.nio.file.Files.writeString(tmp, batchId.toString)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(committedPath(name)),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** merge one micro-batch of docs (doc_id, repo, lang, content) into the
    * postings/term_stats/doc_stats state. Exposed for direct unit testing
    * (exactly what the foreachBatch closure runs). Re-indexed docs (doc_id
    * already present) replace their old contribution — idempotent, unlike
    * the reference's ever-incrementing df (SURVEY.md §3.3 quirk). */
  def mergeBatch(state: StateStore, batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val deltaPost = InvertedIndex.postings(InvertedIndex.tokens(batch)).cache()
    val docIds = batch.select("doc_id").distinct()
    val oldPost = state.read(spark, "postings")
    val mergedPost = oldPost match {
      case Some(old) =>
        // drop replaced docs' old postings, then append the fresh ones
        old.join(docIds, Seq("doc_id"), "left_anti").unionByName(deltaPost)
      case None => deltaPost
    }
    val post = mergedPost.cache()
    state.write("postings", post, batchId)
    // stats derive from the merged postings (never incremental drift)
    val persisted = state.read(spark, "postings").get
    state.write("term_stats", persisted.groupBy("term").agg(count(lit(1)).as("df")), batchId)
    state.write("doc_stats", persisted.groupBy("doc_id").agg(sum("tf").as("dl")), batchId)
    deltaPost.unpersist()
    post.unpersist()
  }

  /** wire a streaming docs source into the merge — file source, rate
    * source, or any readStream DataFrame with the corpus schema. */
  def start(docsStream: DataFrame, state: StateStore,
            checkpointDir: String): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(state, batch, batchId)
      }
      .start()

  /** Single-doc upsert (reference POST /api/indexPage,
    * IndexingServiceImpl.java:84-94,244-264): one-row batch through the
    * same merge path — delete + reindex collapses into the left_anti +
    * union. */
  def upsertDoc(state: StateStore, doc: DataFrame): Unit =
    mergeBatch(state, doc, batchId = System.identityHashCode(doc).toLong & 0xFFFFFF)
}
