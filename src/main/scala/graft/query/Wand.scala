package graft.query

import graft.index.{IndexWriter, PostingCodec, ShardPosting}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conjunctive BM25 top-k over the compressed sharded index with block-max
  * pruning — the scale path of the query core (north star: "BM25 top-k with
  * posting-list intersection and block-max WAND pruning").
  *
  * Distribution shape: the query touches |terms| × |shards| blobs; they are
  * grouped by shard (each group = the query's full working set for one
  * docId range, ≤ |terms| blobs), intersected + scored + top-k'd inside
  * `mapGroups` with zero further shuffle, then the tiny per-shard top-k
  * lists (≤ k rows each) meet in a global TakeOrderedAndProject. Adding
  * executors splits shards, not terms — scaling is embarrassing in the
  * shard dimension, which is why hot terms don't skew this path.
  *
  * Pruning: rarest-first driving list (reference's df-asc ordering,
  * SearcherPage.java:47,201-206) + skipTo on the others (skip blocks are
  * never decoded, PostingCodec.Cursor.skipTo), and a block-max θ check
  * that skips scoring when Σ idf·blockMaxTfNorm of the current blocks
  * cannot beat the k-th best score so far.
  */
object Wand {

  case class Hit(shard: Int, docId: Long, score: Double)

  /** Exact conjunctive top-k per shard. `idfs` must be keyed by every query
    * term; `avgDl` must be the value the index was encoded with; returns
    * (rank, doc_id, score) global top-k, ties docId asc. */
  def topK(shards: Dataset[ShardPosting], idfs: Map[String, Double], avgDl: Double, k: Int): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    val idfB = spark.sparkContext.broadcast(idfs)
    val nTerms = idfs.size
    val hits = shards.groupByKey(_.shard).flatMapGroups { (shard, it) =>
      val blobs = it.toArray
      if (blobs.length < nTerms) Iterator.empty // some term absent from shard => no conjunction
      else {
        val idf = idfB.value
        // rarest-first: fewest docs drives the intersection
        val ordered = blobs.sortBy(_.numDocs)
        val cursors = ordered.map(b => (idf(b.term), new PostingCodec.Cursor(new PostingCodec.Decoded(b.bytes))))
        // top-k heap: root = current worst of the best k
        implicit val ord: Ordering[Hit] = Ordering.by(h => (-h.score, h.docId))
        val heap = new scala.collection.mutable.PriorityQueue[Hit]()(ord)
        var theta = Double.NegativeInfinity
        val lead = cursors(0)._2
        while (!lead.exhausted && !cursors.exists(_._2.exhausted)) {
          val cand = lead.docId
          var aligned = true
          var i = 1
          while (aligned && i < cursors.length) {
            val c = cursors(i)._2
            c.skipTo(cand)
            if (c.exhausted) { aligned = false }
            else if (c.docId != cand) {
              // candidate dead; restart from the larger docId
              if (c.docId > cand) lead.skipTo(c.docId)
              aligned = false
            }
            i += 1
          }
          if (aligned) {
            // block-max θ check before exact scoring
            var ub = 0.0
            var j = 0
            while (j < cursors.length) { ub += cursors(j)._1 * cursors(j)._2.blockMaxTfNorm; j += 1 }
            // `>= theta` (not `>`) so equal-score smaller-docId candidates
            // still get scored and can win the tie-break
            if (heap.size < k || ub >= theta) {
              var score = 0.0
              j = 0
              while (j < cursors.length) {
                val (w, c) = cursors(j)
                score += w * Bm25.tfNormS(c.tf, c.dl, avgDl)
                j += 1
              }
              val h = Hit(shard, cand, score)
              if (heap.size < k) { heap.enqueue(h); if (heap.size == k) theta = heap.head.score }
              else if (score > theta || (score == theta && cand < heap.head.docId)) {
                heap.dequeue(); heap.enqueue(h); theta = heap.head.score
              }
            }
            lead.next()
          }
        }
        heap.iterator.map(h => (h.docId, h.score))
      }
    }.toDF("doc_id", "score")
    val top = hits.orderBy(desc("score"), asc("doc_id")).limit(k)
    top.withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("doc_id"))))
      .select(col("rank"), col("doc_id"), col("score"))
  }
}
