package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional index + exact phrase matching — beyond the reference (its
  * `index` table stores only tf, model/Index.java), but a capability any
  * complete fulltext engine offers and the standard next step after BM25
  * (positions → phrases → proximity).
  *
  * Positions are indices into the STOP-FILTERED token sequence (the same
  * sequence the tf index sees), so phrase adjacency means "adjacent after
  * analysis" — mirrored exactly by the DuckDB oracle over the ordered token
  * array.
  *
  * Scale shape: phrase matching is pure relational algebra — per query
  * term i, project (doc_id, pos − i) from the positional postings and keep
  * the (doc_id, start) groups hit by ALL k terms (the count-k conjunctive
  * shape of Search.conjunctive, reused on (doc, start) instead of (doc)).
  * One shuffle on (doc_id, start); no per-doc array materialization on the
  * query path, hot terms shard exactly like the tf index.
  */
object Positional {

  /** (doc_id, term, pos) — posexplode over the analyzed token array */
  def tokenPositions(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
        posexplode(InvertedIndex.termsForLang(col("content"), col("lang"))))
      .select(col("doc_id"), col("col").as("term"), col("pos").cast("long").as("pos"))

  /** positional postings: (doc_id, term, tf, positions asc) */
  def positionalPostings(corpus: DataFrame): DataFrame =
    tokenPositions(corpus)
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))

  /** docs containing `terms` as an exact adjacent phrase:
    * (doc_id, phrase_tf = number of occurrences). `tokenPos` is the
    * (doc_id, term, pos) relation from [[tokenPositions]] (or the exploded
    * form of a persisted positional index). */
  def phraseMatches(tokenPos: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    val k = terms.size
    val shifted = terms.zipWithIndex.map { case (t, i) =>
      tokenPos.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }.reduce(_ unionByName _)
    // a (doc, start) hit by all k shifted streams = a phrase occurrence
    // ((term,pos) is unique per doc, so each i contributes ≤ 1 row per group)
    shifted.groupBy("doc_id", "start").agg(count(lit(1)).as("n"))
      .filter(col("n") === k)
      .groupBy("doc_id").agg(count(lit(1)).as("phrase_tf"))
  }

  /** phrase top-k: most occurrences first, ties by doc_id asc */
  def phraseTopK(tokenPos: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val top = phraseMatches(tokenPos, terms)
      .orderBy(desc("phrase_tf"), asc("doc_id")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("phrase_tf"), asc("doc_id"))).cast("long"))
      .select("rank", "doc_id", "phrase_tf")
  }

  /** Biword (next-word) index (Manning IIR §2.4.1): consecutive analyzed
    * token pairs materialized as single index entries at BUILD time, so an
    * exact 2-word phrase is answered by ONE equality probe of a
    * pre-aggregated relation instead of the k-way positional intersection —
    * the standard high-QPS phrase fast path (positional postings remain the
    * general path for k > 2, and [[IndexWriter.writeAux]] persists this
    * relation beside the index like any derived artifact).
    *
    * Build is MAP-ONLY up to the final partial+final hash aggregate: pairs
    * come straight off each doc's ordered token array (zip with its own
    * 1-shift — no Window, no per-doc shuffle-and-sort), so the only
    * exchange is the aggregate's, keyed on (doc, w1, w2). */
  def biwordPostings(corpus: DataFrame): DataFrame = {
    val toks = InvertedIndex.termsForLang(col("content"), col("lang"))
    corpus
      .select(col("doc_id"), toks.as("arr"))
      .select(col("doc_id"),
        explode(zip_with(col("arr"),
          slice(col("arr"), lit(2), greatest(size(col("arr")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bw"))
      // zip_with pads the shorter side with null: the last token's pair
      .filter(col("bw.w2").isNotNull)
      .select(col("doc_id"), col("bw.w1").as("w1"), col("bw.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("tf"))
  }

  /** 2-word exact phrase via the biword relation: one equality probe.
    * Row-identical to `phraseMatches(tokenPos, Seq(w1, w2))` — proven by
    * the shared oracle (ft_biword hashes against ft_phrase's twin) and
    * PositionalSpec's relation-equality test. */
  def biwordPhrase(biwords: DataFrame, w1: String, w2: String): DataFrame =
    biwords.filter(col("w1") === w1 && col("w2") === w2)
      .select(col("doc_id"), col("tf").as("phrase_tf"))

  /** biword phrase top-k, same ranking contract as [[phraseTopK]] */
  def biwordTopK(biwords: DataFrame, w1: String, w2: String, k: Int): DataFrame = {
    val top = biwordPhrase(biwords, w1, w2)
      .orderBy(desc("phrase_tf"), asc("doc_id")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("phrase_tf"), asc("doc_id"))).cast("long"))
      .select("rank", "doc_id", "phrase_tf")
  }

  /** Ordered proximity ("phrase within slop"): a start position matches
    * when term i occurs at some pos ∈ [start + i, start + i + slop] for
    * EVERY i — slop = 0 degenerates to exact [[phraseMatches]]. Returns
    * (doc_id, prox_tf = number of matching starts).
    *
    * Same relational shape as phrase: per (term i, occurrence pos) the
    * candidate starts are pos − i − slop .. pos − i (a bounded slop+1
    * explode), distinct per term INDEX (one term's several occurrences can
    * land on the same start), then the count-k conjunctive filter on
    * (doc, start). One shuffle on (doc, start); no per-doc arrays; hot
    * terms shard exactly like the tf index. Starts may be negative (a
    * window anchored before position 0) — consistent in both engines and
    * harmless: each matching start still witnesses one proximity match. */
  def proximityMatches(tokenPos: DataFrame, terms: Seq[String], slop: Int): DataFrame = {
    require(terms.nonEmpty && slop >= 0)
    val k = terms.size
    val shifted = terms.zipWithIndex.map { case (t, i) =>
      tokenPos.filter(col("term") === t)
        .select(col("doc_id"),
          explode(sequence(col("pos") - i - slop, col("pos") - i)).as("start"),
          lit(i).as("ti"))
    }.reduce(_ unionByName _)
    shifted.distinct()
      .groupBy("doc_id", "start").agg(count(lit(1)).as("n"))
      .filter(col("n") === k)
      .groupBy("doc_id").agg(count(lit(1)).as("prox_tf"))
  }

  /** proximity top-k: most matching windows first, ties by doc_id asc */
  def proximityTopK(tokenPos: DataFrame, terms: Seq[String], slop: Int, k: Int): DataFrame = {
    val top = proximityMatches(tokenPos, terms, slop)
      .orderBy(desc("prox_tf"), asc("doc_id")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("prox_tf"), asc("doc_id"))).cast("long"))
      .select("rank", "doc_id", "prox_tf")
  }

  /** UNORDERED proximity (NEAR/slop, Lucene SpanNear unordered): every term
    * occurs somewhere inside a width-w token window, w = |terms| + slop, in
    * ANY order — slop = 0 means the terms are adjacent-up-to-permutation.
    * Returns (doc_id, near_tf = number of matching window placements).
    *
    * Same bounded-explode relational shape as [[proximityMatches]] minus
    * the per-term-index shift: each occurrence of ANY query term witnesses
    * the w candidate window starts pos − w + 1 .. pos, distinct per term
    * (one term repeating inside a window counts once), then the count-k
    * conjunctive filter on (doc, start) and a per-doc count of surviving
    * starts. One shuffle on (doc, start); no per-doc arrays. */
  def nearMatches(tokenPos: DataFrame, terms: Seq[String], slop: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size && slop >= 0)
    val k = terms.size
    val w = k + slop
    val starts = terms.map { t =>
      tokenPos.filter(col("term") === t)
        .select(col("doc_id"),
          explode(sequence(col("pos") - w + 1, col("pos"))).as("start"),
          lit(t).as("qt"))
    }.reduce(_ unionByName _)
    starts.distinct()
      .groupBy("doc_id", "start").agg(count(lit(1)).as("n"))
      .filter(col("n") === k)
      .groupBy("doc_id").agg(count(lit(1)).as("near_tf"))
  }

  /** unordered-proximity top-k, same ranking contract as [[proximityTopK]] */
  def nearTopK(tokenPos: DataFrame, terms: Seq[String], slop: Int, k: Int): DataFrame = {
    val top = nearMatches(tokenPos, terms, slop)
      .orderBy(desc("near_tf"), asc("doc_id")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("near_tf"), asc("doc_id"))).cast("long"))
      .select("rank", "doc_id", "near_tf")
  }
}
