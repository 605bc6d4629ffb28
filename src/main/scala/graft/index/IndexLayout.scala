package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index-layout diagnostics: what does the posting-list compression pay
  * for the current docID assignment, and what would it pay if docIDs were
  * reassigned in URL order? Assigning consecutive ids to same-site pages
  * shrinks docID delta-gaps dramatically because pages of one site share
  * vocabulary (Silvestri, ECIR 2007, "Sorting out the document identifier
  * assignment problem" — public literature; the trick behind "sort your
  * corpus by URL before building the index" folklore).
  *
  * The cost model is the EXACT varint byte count of every docID delta-gap
  * in every posting list — the same varint [[PostingCodec]] writes — via
  * pure integer threshold comparisons (no float log), so both engines
  * count identical bytes.
  *
  * Scale shape: the gap computation is a lag window partitioned on term —
  * the same per-term ordering the index build itself materializes (this
  * diagnostic costs one extra pass over postings, nothing more). The
  * URL-order remap uses one global row_number over (repo, path) — a
  * corpus-sized single-partition sort in THIS diagnostic form; the
  * production remap is the ordinary two-phase distributed sort the build
  * already performs (range-partition + per-partition offsets), noted here
  * because the diagnostic is run offline on samples, not per query. */
object IndexLayout {

  /** exact LEB128 byte count of a positive BIGINT, by integer thresholds */
  def varintBytes(v: Column): Column =
    when(v < (1L << 7), lit(1L))
      .when(v < (1L << 14), lit(2L))
      .when(v < (1L << 21), lit(3L))
      .when(v < (1L << 28), lit(4L))
      .when(v < (1L << 35), lit(5L))
      .otherwise(lit(6L))

  /** one-row summary of the docID delta-gap varint cost of `postings`
    * (term, doc_id): (variant, n_postings, gap_bytes, bytes_per_posting).
    * First gap per term = docId + 1 (delta from the imaginary −1), every
    * gap ≥ 1 so varint cost is defined. */
  def gapStats(postings: DataFrame, label: String): DataFrame = {
    val w = Window.partitionBy("term").orderBy(asc("doc_id"))
    postings.select(col("term"), col("doc_id"))
      .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1, -1L).over(w))
      .agg(count(lit(1)).as("n_postings"),
        sum(varintBytes(col("gap"))).as("gap_bytes"))
      .select(lit(label).as("variant"), col("n_postings"), col("gap_bytes"),
        round(col("gap_bytes").cast("double") / col("n_postings").cast("double"), 4)
          .as("bytes_per_posting_r"))
  }

  /** URL-order docID remap: (doc_id, new_id) with new_id dense in
    * (repo, path, doc_id) order. */
  def remapByUrl(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), col("repo"), col("path"))
      .withColumn("new_id", (row_number().over(
        Window.orderBy(asc("repo"), asc("path"), asc("doc_id"))) - 1).cast("long"))
      .select("doc_id", "new_id")

  /** the study: gap cost under the original ids vs URL-sorted ids */
  def remapStudy(postings: DataFrame, corpus: DataFrame): DataFrame = {
    val remapped = postings.join(remapByUrl(corpus), "doc_id")
      .select(col("term"), col("new_id").as("doc_id"))
    gapStats(postings, "original")
      .unionByName(gapStats(remapped, "url_sorted"))
  }
}
