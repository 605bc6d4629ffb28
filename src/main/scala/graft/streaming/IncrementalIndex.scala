package graft.streaming

import graft.index.InvertedIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion surface. The reference has no streaming (SURVEY.md
  * §2.10) — its analog is the long-running crawl job with cooperative stop
  * and the single-page re-index. This module provides the natural Spark
  * shape for both: a Structured Streaming source of new/changed docs feeding
  * `foreachBatch`, over an LSM-style append-only state:
  *
  *   state/postings/batch=<id>    delta postings of the docs in batch <id>
  *   state/doc_ids/batch=<id>     doc_ids (re)written by batch <id>
  *   state/term_stats/batch=<id>  SIGNED df deltas (+new terms, −replaced)
  *   state/doc_stats/batch=<id>   (doc_id, dl) of the batch docs
  *   state/_committed             "<latest> <base>" — single atomic pointer
  *
  * Per-batch WRITE cost is O(|batch| + |touched docs|), never O(index): a
  * batch appends its deltas and flips one pointer. The old snapshot design
  * (rewrite old∪delta every batch) cost O(total index) per micro-batch —
  * streaming ingestion degraded linearly with index size. Reads reconstruct
  * live tables with a last-writer-wins mask on doc_id (postings/doc_stats)
  * or a running sum of signed deltas (term_stats — the old-minus-replaced-
  * plus-new shape of SURVEY.md §2.5 A2). `compact` folds all batches into a
  * fresh base so read fan-in stays bounded.
  *
  * Crash contract: all four tables are written BEFORE the pointer moves, so
  * a torn batch is invisible; a replay after a crash recomputes the same
  * deterministic deltas into the same batch dir and re-commits — and never
  * reads a path it is overwriting, because reads only consult batches ≤ the
  * committed pointer (< the replayed id). Re-indexed docs replace their old
  * contribution — idempotent, unlike the reference's ever-incrementing df
  * (SURVEY.md §3.3 quirk; IndexingServiceImpl.java:171-193).
  */
object IncrementalIndex {

  /** parquet-dir batch store with one atomic commit pointer */
  final class ParquetStateStore(val dir: String) {
    private def pointerPath = java.nio.file.Paths.get(s"$dir/_committed")

    /** (latest, base) committed batch ids, if any batch ever committed */
    def pointer: Option[(Long, Long)] = {
      if (!java.nio.file.Files.exists(pointerPath)) None
      else java.nio.file.Files.readString(pointerPath).trim.split("\\s+") match {
        case Array(l, b) => Some((l.toLong, b.toLong))
        case Array(l)    => Some((l.toLong, 0L))
        case _           => None
      }
    }
    def latestBatch: Option[Long] = pointer.map(_._1)

    /** committed, visible batch ids in [base, min(latest, before-1)] that
      * exist on disk for `name` (a batch may lack rows for a table).
      * `before` (exclusive) lets a REPLAYED batch read only strictly older
      * state — never the dirs it is about to overwrite. */
    def batches(name: String, before: Long = Long.MaxValue): Seq[Long] = pointer match {
      case None => Nil
      case Some((latest, base)) =>
        (base to math.min(latest, before - 1)).filter(b =>
          java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/$name/batch=$b")))
    }

    def writeTable(name: String, df: DataFrame, batchId: Long): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name/batch=$batchId")

    /** atomic pointer flip — publishes every table of the batch at once.
      * A replayed (already-committed) batch id never regresses the pointer. */
    def commit(batchId: Long, base: Long = -1L): Unit = {
      val lat = math.max(batchId, pointer.map(_._1).getOrElse(Long.MinValue))
      val b = if (base >= 0) base else pointer.map(_._2).getOrElse(0L)
      val tmp = java.nio.file.Paths.get(s"$dir/_committed.tmp")
      java.nio.file.Files.createDirectories(tmp.getParent)
      java.nio.file.Files.writeString(tmp, s"$lat $b")
      java.nio.file.Files.move(tmp, pointerPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    /** union of committed batch dirs for `name`, tagged with `_b` */
    def readUnion(spark: SparkSession, name: String,
                  before: Long = Long.MaxValue): Option[DataFrame] = {
      val bs = batches(name, before)
      if (bs.isEmpty) None
      else Some(bs.map(b => spark.read.parquet(s"$dir/$name/batch=$b")
        .withColumn("_b", lit(b))).reduce(_ unionByName _))
    }
  }

  /** last-writer-wins mask: keep rows of `df` (carrying `_b`) whose doc_id
    * was not rewritten by any LATER committed batch (< before) */
  private def lastWins(store: ParquetStateStore, spark: SparkSession, df: DataFrame,
                       before: Long = Long.MaxValue): DataFrame = {
    val ids = store.readUnion(spark, "doc_ids", before).get
      .groupBy("doc_id").agg(max("_b").as("_bmax"))
    df.join(ids, "doc_id").filter(col("_b") === col("_bmax")).drop("_b", "_bmax")
  }

  /** live postings (doc_id, term, tf) reconstructed from the batch log */
  def readPostings(store: ParquetStateStore, spark: SparkSession,
                   before: Long = Long.MaxValue): Option[DataFrame] =
    store.readUnion(spark, "postings", before).map(lastWins(store, spark, _, before))

  /** live doc_stats (doc_id, dl) */
  def readDocStats(store: ParquetStateStore, spark: SparkSession,
                   before: Long = Long.MaxValue): Option[DataFrame] =
    store.readUnion(spark, "doc_stats", before).map(lastWins(store, spark, _, before))

  /** live term_stats (term, df): running sum of the signed per-batch deltas
    * — O(vocabulary + churn) rows, never touches postings */
  def readTermStats(store: ParquetStateStore, spark: SparkSession,
                    before: Long = Long.MaxValue): Option[DataFrame] =
    store.readUnion(spark, "term_stats", before).map(
      _.groupBy("term").agg(sum("ddf").as("df")).filter(col("df") > 0))

  /** point-read the CURRENT postings of `ids` only. Small id sets (the
    * normal micro-batch case) become an isin predicate pushed to the
    * parquet scans — per-batch work reads the touched docs' row groups,
    * not the whole postings state (asserted on the plan in StreamingSpec). */
  def postingsForDocs(store: ParquetStateStore, spark: SparkSession,
                      ids: Seq[Long], before: Long = Long.MaxValue): Option[DataFrame] =
    store.readUnion(spark, "postings", before).map { posts =>
      val hit = posts.filter(col("doc_id").isin(ids.map(x => x: Any): _*))
      lastWins(store, spark, hit, before)
    }

  /** maximum batch size for which replaced-doc lookup uses the pushed-down
    * isin path; larger batches fall back to a semi join */
  val isinThreshold = 10000

  /** merge one micro-batch of docs (doc_id, repo, lang, content) into the
    * state — exactly what the foreachBatch closure runs. */
  def mergeBatch(store: ParquetStateStore, batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val deltaPost = InvertedIndex.postings(InvertedIndex.tokens(batch)).cache()
    val docIds = batch.select("doc_id").distinct()
    val idList = docIds.collect().map(_.getLong(0)).toSeq
    // df decrements from the replaced docs' OLD postings (point-read), df
    // increments from the delta — old stats are never recomputed
    // `before = batchId`: a replay of an already-committed batch reads ONLY
    // strictly older state, so it reproduces the original deltas instead of
    // cancelling against its own previous attempt (and never reads a dir it
    // is overwriting)
    val removed =
      if (store.latestBatch.isEmpty) None
      else if (idList.size <= isinThreshold) postingsForDocs(store, spark, idList, batchId)
      else readPostings(store, spark, batchId).map(_.join(docIds, Seq("doc_id"), "left_semi"))
    val added = deltaPost.groupBy("term").agg(count(lit(1)).as("ddf"))
    val termDelta = removed match {
      case Some(old) =>
        old.groupBy("term").agg((-count(lit(1))).as("ddf")).unionByName(added)
          .groupBy("term").agg(sum("ddf").as("ddf")).filter(col("ddf") =!= 0)
      case None => added
    }
    val docDelta = deltaPost.groupBy("doc_id").agg(sum("tf").as("dl"))
    // write every table, THEN flip the pointer (atomic publish)
    store.writeTable("postings", deltaPost, batchId)
    import spark.implicits._
    store.writeTable("doc_ids", idList.toDF("doc_id"), batchId)
    store.writeTable("term_stats", termDelta, batchId)
    store.writeTable("doc_stats", docDelta, batchId)
    store.commit(batchId)
    deltaPost.unpersist(): Unit
  }

  /** fold the whole batch log into a fresh base batch (bounds read fan-in
    * after many micro-batches; the streaming twin of IndexWriter.compact) */
  def compactState(store: ParquetStateStore, spark: SparkSession): Unit =
    readPostings(store, spark) match {
      case None => ()
      case Some(p) =>
        val next = store.latestBatch.map(_ + 1).getOrElse(0L)
        val posts = p.cache()
        store.writeTable("postings", posts, next)
        store.writeTable("doc_ids", posts.select("doc_id").distinct()
          .unionByName(readDocStats(store, spark).get.select("doc_id")).distinct(), next)
        store.writeTable("term_stats",
          posts.groupBy("term").agg(count(lit(1)).as("ddf")), next)
        store.writeTable("doc_stats", readDocStats(store, spark).get, next)
        store.commit(next, base = next)
        posts.unpersist(): Unit
    }

  /** wire a streaming docs source into the merge — file source, rate
    * source, or any readStream DataFrame with the corpus schema. */
  def start(docsStream: DataFrame, state: ParquetStateStore,
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
    * same merge path; batch ids advance monotonically from the committed
    * pointer (replay-safe — no hash-derived ids that could collide). */
  def upsertDoc(state: ParquetStateStore, doc: DataFrame): Unit =
    mergeBatch(state, doc, state.latestBatch.map(_ + 1).getOrElse(0L))
}
