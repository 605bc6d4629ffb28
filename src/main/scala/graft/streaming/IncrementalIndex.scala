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
  *   state/_committed             "<latest> <base> <lastAppliedStreamId>" —
  *                                single atomic pointer (3rd field = highest
  *                                Structured-Streaming batch id applied)
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

  /** parquet-dir batch store with one atomic commit pointer.
    *
    * INTERNAL batch ids (dir names, the pointer) are allocated by the store
    * (always latest+1) and are a SEPARATE id space from Structured
    * Streaming's checkpoint batch ids: the pointer's third field records the
    * highest APPLIED streaming id, so replays skip exactly-once WITHOUT the
    * two spaces ever colliding (a streaming id can no longer overwrite a
    * compacted base or an upsert batch). One state dir pairs with ONE
    * streaming checkpoint lineage — reusing the store with a fresh
    * checkpoint (stream ids restarting at 0) requires a fresh state dir,
    * the same pairing rule every foreachBatch sink has. */
  final class ParquetStateStore(val dir: String) {
    private def pointerPath = java.nio.file.Paths.get(s"$dir/_committed")

    /** (latest, base, lastAppliedStreamId) — lastStream = -1 if none yet */
    def pointer: Option[(Long, Long, Long)] = {
      if (!java.nio.file.Files.exists(pointerPath)) None
      else java.nio.file.Files.readString(pointerPath).trim.split("\\s+") match {
        case Array(l, b, s) => Some((l.toLong, b.toLong, s.toLong))
        case Array(l, b)    => Some((l.toLong, b.toLong, -1L))
        case Array(l)       => Some((l.toLong, 0L, -1L))
        case _              => None
      }
    }
    def latestBatch: Option[Long] = pointer.map(_._1)
    def lastStreamId: Long = pointer.map(_._3).getOrElse(-1L)
    /** next internal batch id (store-allocated, never caller-chosen) */
    def nextBatch: Long = latestBatch.map(_ + 1).getOrElse(0L)

    /** committed, visible batch ids in [base, min(latest, before-1)] that
      * exist on disk for `name` (a batch may lack rows for a table).
      * `before` (exclusive) lets an uncommitted batch read only strictly
      * older state — never the dirs it is writing. */
    def batches(name: String, before: Long = Long.MaxValue): Seq[Long] = pointer match {
      case None => Nil
      case Some((latest, base, _)) =>
        (base to math.min(latest, before - 1)).filter(b =>
          java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/$name/batch=$b")))
    }

    def writeTable(name: String, df: DataFrame, batchId: Long): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name/batch=$batchId")

    /** atomic pointer flip — publishes every table of the batch at once.
      * `streamId >= 0` additionally records the streaming batch as applied. */
    def commit(batchId: Long, base: Long = -1L, streamId: Long = -1L): Unit = {
      val prev = pointer
      val lat = math.max(batchId, prev.map(_._1).getOrElse(Long.MinValue))
      val b = if (base >= 0) base else prev.map(_._2).getOrElse(0L)
      val s = math.max(streamId, prev.map(_._3).getOrElse(-1L))
      val tmp = java.nio.file.Paths.get(s"$dir/_committed.tmp")
      java.nio.file.Files.createDirectories(tmp.getParent)
      java.nio.file.Files.writeString(tmp, s"$lat $b $s")
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

  /** live per-repo term stats (repo, term, df): same signed-delta shape as
    * term_stats, keyed (repo, term) — the reference's per-site lemma table
    * (LemmaRepository.countBySite feeds the statistics endpoint). Present
    * only for stores whose batches carried raw docs (the facade always
    * does); O(per-repo vocabulary + churn) rows, never touches postings. */
  def readTermStatsRepo(store: ParquetStateStore, spark: SparkSession,
                        before: Long = Long.MaxValue): Option[DataFrame] =
    store.readUnion(spark, "term_stats_repo", before).map(
      _.groupBy("repo", "term").agg(sum("ddf").as("df")).filter(col("df") > 0))

  /** live RAW document rows (the durable corpus — reference `page` table,
    * persisted across restarts by MySQL): last-writer-wins over the per-
    * batch docs, masked by the same doc_ids log deletes use. This is what
    * lets a new SearchEngine reattach to an existing state dir without
    * re-crawling or re-tokenizing anything. */
  def readDocs(store: ParquetStateStore, spark: SparkSession,
               before: Long = Long.MaxValue): Option[DataFrame] =
    store.readUnion(spark, "docs", before).map(lastWins(store, spark, _, before))

  /** point-read the CURRENT rows of `name` for `ids` only: an isin
    * predicate pushed to the parquet scans — per-batch work reads the
    * touched docs' row groups, not the whole state. */
  private def tableForDocs(store: ParquetStateStore, spark: SparkSession, name: String,
                           ids: Seq[Long], before: Long): Option[DataFrame] =
    store.readUnion(spark, name, before).map { rows =>
      val hit = rows.filter(col("doc_id").isin(ids.map(x => x: Any): _*))
      lastWins(store, spark, hit, before)
    }

  /** point-read the CURRENT postings of `ids` only. Small id sets (the
    * normal micro-batch case) become an isin predicate pushed to the
    * parquet scans — per-batch work reads the touched docs' row groups,
    * not the whole postings state (asserted on the plan in StreamingSpec). */
  def postingsForDocs(store: ParquetStateStore, spark: SparkSession,
                      ids: Seq[Long], before: Long = Long.MaxValue): Option[DataFrame] =
    tableForDocs(store, spark, "postings", ids, before)

  /** maximum batch size for which replaced-doc lookup uses the pushed-down
    * isin path; larger batches fall back to a semi join */
  val isinThreshold = 10000

  /** merge one micro-batch of docs (doc_id, repo, lang, content) into the
    * state — exactly what the foreachBatch closure runs. A batch MAY carry
    * a `seq` column (source offset / event timestamp): when present it
    * orders within-batch last-writer-wins, matching the reference's
    * delete+reindex latest-version semantics for sources that do carry
    * ordering (the file stream's modification time, a Kafka offset). */
  /** `lexicons` is the per-lang 1→N normal-form registry (reference
    * lemmatizes the INDEX side with its morphology dictionary,
    * IndexingServiceImpl.java:144-155) — it must match the lexicon the
    * query side analyzes with.
    *
    * `rawDocs` — when supplied, the batch's RAW document rows (one row per
    * doc_id) are persisted in the `docs` log table (the reference's durable
    * `page` table) and the per-repo signed-df deltas are maintained in
    * `term_stats_repo`. CONTRACT: supply rawDocs on EVERY mutation of a
    * store or never — a mixed store would undercount the repo-scoped
    * decrements of docs whose raw rows were never logged. */
  def mergeBatch(store: ParquetStateStore, batch: DataFrame, streamId: Long = -1L,
                 lexicons: Map[String, graft.analyze.Analyzer.Lexicon] = Map.empty,
                 rawDocs: Option[DataFrame] = None): Unit = {
    if (streamId >= 0 && streamId <= store.lastStreamId) return // replay: already applied
    val spark = batch.sparkSession
    val batchId = store.nextBatch // storage id is ALWAYS store-allocated
    // within-batch last-writer-wins: highest `seq` wins when the source
    // carries one; the deterministic sha/lang/repo order is the tie-break
    // (and the whole order when no seq exists), so a batch carrying several
    // versions of one doc keeps ONE replayable version — never a tf/dl
    // union of versions no source ever held
    val orderCols =
      (if (batch.columns.contains("seq")) Seq(col("seq").desc) else Nil) ++
        Seq(sha2(col("content"), 256).desc, col("lang").desc, col("repo").desc)
    val oneVersion = batch.withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(orderCols: _*)))
      .filter(col("_rn") === 1).drop("_rn").drop("seq")
    // repo kept through the tf aggregate (it is functionally dependent on
    // doc_id) so the per-repo df deltas need no extra join for the ADDED side
    val deltaPostR = InvertedIndex.tokensByLang(oneVersion, lexicons)
      .groupBy("doc_id", "repo", "term").agg(count(lit(1)).as("tf")).cache()
    val deltaPost = deltaPostR.select("doc_id", "term", "tf")
    val docIds = oneVersion.select("doc_id").distinct().cache()
    // df decrements from the replaced docs' OLD postings (point-read), df
    // increments from the delta — old stats are never recomputed. Reads see
    // only batches < batchId: committed state, never this batch's own dirs
    // (a crashed attempt's orphans stay invisible and get overwritten).
    // Strategy decided from a COUNT — collecting a huge id list is exactly
    // what the fallback branch exists to avoid.
    val nIds = docIds.count()
    lazy val idList = docIds.collect().map(_.getLong(0)).toSeq
    val removed =
      if (store.latestBatch.isEmpty) None
      else if (nIds <= isinThreshold) postingsForDocs(store, spark, idList, batchId)
      else readPostings(store, spark, batchId).map(_.join(docIds, Seq("doc_id"), "left_semi"))
    val added = deltaPost.groupBy("term").agg(count(lit(1)).as("ddf"))
    val termDelta = removed match {
      case Some(old) =>
        old.groupBy("term").agg((-count(lit(1))).as("ddf")).unionByName(added)
          .groupBy("term").agg(sum("ddf").as("ddf")).filter(col("ddf") =!= 0)
      case None => added
    }
    // per-repo df deltas (only for stores carrying raw docs): added side
    // straight off the cached delta; removed side joins the replaced docs'
    // OLD repo from the docs log (a doc may move repos on upsert)
    val termRepoDelta: Option[DataFrame] = rawDocs.map { _ =>
      val addedR = deltaPostR.groupBy("repo", "term").agg(count(lit(1)).as("ddf"))
      val oldRepos =
        if (store.latestBatch.isEmpty) None
        else if (nIds <= isinThreshold)
          tableForDocs(store, spark, "docs", idList, batchId).map(_.select("doc_id", "repo"))
        else readDocs(store, spark, batchId)
          .map(_.select("doc_id", "repo").join(docIds, Seq("doc_id"), "left_semi"))
      (removed, oldRepos) match {
        case (Some(old), Some(or)) =>
          old.select("doc_id", "term").join(or, "doc_id")
            .groupBy("repo", "term").agg((-count(lit(1))).as("ddf"))
            .unionByName(addedR)
            .groupBy("repo", "term").agg(sum("ddf").as("ddf")).filter(col("ddf") =!= 0)
        case _ => addedR
      }
    }
    val docDelta = deltaPost.groupBy("doc_id").agg(sum("tf").as("dl"))
    // write every table, THEN flip the pointer (atomic publish)
    store.writeTable("postings", deltaPost, batchId)
    store.writeTable("doc_ids", docIds, batchId)
    store.writeTable("term_stats", termDelta, batchId)
    store.writeTable("doc_stats", docDelta, batchId)
    rawDocs.foreach(d => store.writeTable("docs", d, batchId))
    termRepoDelta.foreach(t => store.writeTable("term_stats_repo", t, batchId))
    store.commit(batchId, streamId = streamId)
    deltaPostR.unpersist()
    docIds.unpersist(): Unit
  }

  /** fold the whole batch log into a fresh base batch (bounds read fan-in
    * after many micro-batches; the streaming twin of IndexWriter.compact) */
  def compactState(store: ParquetStateStore, spark: SparkSession): Unit =
    readPostings(store, spark) match {
      case None => ()
      case Some(p) =>
        val next = store.nextBatch
        val posts = p.cache()
        val dstats = readDocStats(store, spark).get.cache() // reconstructed ONCE
        store.writeTable("postings", posts, next)
        store.writeTable("doc_ids", posts.select("doc_id").distinct()
          .unionByName(dstats.select("doc_id")).distinct(), next)
        store.writeTable("term_stats",
          posts.groupBy("term").agg(count(lit(1)).as("ddf")), next)
        store.writeTable("doc_stats", dstats, next)
        // docs / per-repo stats fold only when the store maintains them
        readDocs(store, spark).foreach(d => store.writeTable("docs", d, next))
        readTermStatsRepo(store, spark).foreach(t =>
          store.writeTable("term_stats_repo",
            t.select(col("repo"), col("term"), col("df").as("ddf")), next))
        store.commit(next, base = next)
        posts.unpersist()
        dstats.unpersist(): Unit
    }

  /** seed an EMPTY (or fresh) store with prebuilt tables as its base batch
    * — the persisted-build facade path reuses the InvertedIndex.build
    * output it already has instead of re-tokenizing the whole corpus
    * through mergeBatch. Writes the same shapes compactState produces. */
  def seedBase(store: ParquetStateStore, t: graft.index.InvertedIndex.Tables,
               rawDocs: Option[DataFrame] = None,
               termStatsRepo: Option[DataFrame] = None): Unit = {
    val next = store.nextBatch
    store.writeTable("postings", t.postings, next)
    store.writeTable("doc_ids", t.postings.select("doc_id").distinct()
      .unionByName(t.docStats.select("doc_id")).distinct(), next)
    store.writeTable("term_stats", t.termStats.select(col("term"), col("df").as("ddf")), next)
    store.writeTable("doc_stats", t.docStats, next)
    rawDocs.foreach(d => store.writeTable("docs", d, next))
    termStatsRepo.foreach(r =>
      store.writeTable("term_stats_repo",
        r.select(col("repo"), col("term"), col("df").as("ddf")), next))
    store.commit(next, base = next)
  }

  /** wire a streaming docs source into the merge — file source, rate
    * source, or any readStream DataFrame with the corpus schema. */
  def start(docsStream: DataFrame, state: ParquetStateStore,
            checkpointDir: String,
            lexicons: Map[String, graft.analyze.Analyzer.Lexicon] = Map.empty): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(state, batch, batchId, lexicons)
      }
      .start()

  /** Single-doc upsert (reference POST /api/indexPage,
    * IndexingServiceImpl.java:84-94,244-264): one-row batch through the
    * same merge path; storage ids are store-allocated, so upserts can
    * interleave freely with streaming batches and compaction. */
  def upsertDoc(state: ParquetStateStore, doc: DataFrame): Unit =
    mergeBatch(state, doc)

  /** Remove `ids` (a doc_id DataFrame) from the live index — the
    * reference's delete-without-reindex path (an error re-fetch REMOVES the
    * old page and indexes nothing, IndexingServiceImpl.java:135-137 via
    * :244-264). O(|ids| + touched postings): a doc_ids-only batch masks the
    * docs' postings/doc_stats via last-writer-wins, and term_stats gets the
    * signed negative deltas from a point-read of their OLD postings — the
    * index is never rescanned. */
  def deleteDocs(store: ParquetStateStore, ids: DataFrame): Unit = {
    val spark = ids.sparkSession
    val batchId = store.nextBatch
    val docIds = ids.select("doc_id").distinct().cache()
    val nIds = docIds.count()
    if (nIds == 0) { docIds.unpersist(); return }
    lazy val idList = docIds.collect().map(_.getLong(0)).toSeq
    val removed =
      if (store.latestBatch.isEmpty) None
      else if (nIds <= isinThreshold) postingsForDocs(store, spark, idList, batchId)
      else readPostings(store, spark, batchId).map(_.join(docIds, Seq("doc_id"), "left_semi"))
    store.writeTable("doc_ids", docIds, batchId)
    removed.foreach { old =>
      val oldC = old.cache()
      store.writeTable("term_stats",
        oldC.groupBy("term").agg((-count(lit(1))).as("ddf")), batchId)
      // per-repo decrements when the store maintains the docs log (the
      // doc_ids mask row above already deletes the docs-table rows)
      val oldRepos =
        if (nIds <= isinThreshold)
          tableForDocs(store, spark, "docs", idList, batchId).map(_.select("doc_id", "repo"))
        else readDocs(store, spark, batchId)
          .map(_.select("doc_id", "repo").join(docIds, Seq("doc_id"), "left_semi"))
      oldRepos.foreach { or =>
        store.writeTable("term_stats_repo",
          oldC.select("doc_id", "term").join(or, "doc_id")
            .groupBy("repo", "term").agg((-count(lit(1))).as("ddf")), batchId)
      }
      oldC.unpersist(): Unit
    }
    store.commit(batchId)
    docIds.unpersist(): Unit
  }
}
