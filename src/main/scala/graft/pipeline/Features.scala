package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.query.Bm25

/** Learning-to-rank training-set export — the bridge between the search
  * engine and the training-data pipeline: for every query of a query log,
  * emit the top-k candidates with the per-(query, doc) feature vector a
  * ranker trains on (Liu, "Learning to Rank for Information Retrieval",
  * 2009 — the standard feature families: query-document matching, document
  * statics, link authority). The reference ranks by a single score
  * (/root/reference/src/main/java/searchengine/tools/SearcherPage.java:91);
  * an LTR exporter generalizes that to the feature matrix the score is
  * learned FROM.
  *
  * Features (one row per candidate):
  *   f_matched  distinct query terms present in the doc (BIGINT)
  *   q_n        query length in distinct terms (BIGINT; f_matched/q_n is
  *              the match fraction, left to the trainer — keeping both
  *              BIGINT keeps the row hash-exact)
  *   f_sum_tf   Σ tf over matched terms (BIGINT)
  *   f_max_tf   max tf over matched terms (BIGINT)
  *   f_dl       document length (BIGINT)
  *   f_idf      Σ idf(df) over matched terms (double)
  *   f_bm25     Σ BM25 term scores — also the candidate-cut key (double)
  *   f_prior    static authority mass (PageRank fixed-point BIGINT units;
  *              0 when the doc is absent from the prior — same graceful
  *              staleness as [[graft.query.Search.blendScores]])
  *
  * Scale shape (identical to [[graft.query.Search.bm25TopKBatch]], which is
  * the point — feature export must cost what batch scoring costs): ONE pass
  * over the postings → broadcast-join the deduped (query_id, term) log (a
  * posting row fans out only to queries containing its term) → broadcast
  * the vocabulary-restricted df table → shuffle-join docStats on doc_id →
  * ONE hash aggregate on (query_id, doc_id) → left-join the prior on the
  * aggregated candidates (never the raw postings) → per-query rank window
  * cut at k, which Catalyst rewrites to a WindowGroupLimit k-row heap.
  * Candidates are DISJUNCTIVE: partial matches are exactly the hard
  * negatives an LTR trainer needs, so no conjunctive filter.
  */
object Features {
  def ltr(postings: DataFrame, docStats: DataFrame, termStats: DataFrame,
          queries: DataFrame, prior: DataFrame, nDocs: Long, avgDl: Double,
          k: Int): DataFrame = {
    val q = queries.select("query_id", "term").distinct()
    val vocab = q.select("term").distinct()
    val dfs = termStats.join(vocab, "term").select(col("term"), col("df"))
    val qn = q.groupBy("query_id").agg(count(lit(1)).as("q_n"))
    val cand = postings
      .join(broadcast(q), "term")
      .join(broadcast(dfs), "term")
      .join(docStats, "doc_id")
      .withColumn("term_idf", Bm25.idf(col("df"), nDocs))
      .withColumn("term_score", Bm25.score(col("tf"), col("df"), col("dl"), nDocs, avgDl))
      .groupBy("query_id", "doc_id")
      .agg(
        count(lit(1)).as("f_matched"),
        sum(col("tf")).as("f_sum_tf"),
        max(col("tf")).as("f_max_tf"),
        // dl is constant within the (query, doc) group; max() reads it back
        max(col("dl")).as("f_dl"),
        sum(col("term_idf")).as("f_idf"),
        sum(col("term_score")).as("f_bm25"))
      .join(broadcast(qn), "query_id")
      .join(prior.select(col("doc_id"), col("pr")), Seq("doc_id"), "left")
      .withColumn("f_prior", coalesce(col("pr"), lit(0L)))
    cand.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("f_bm25"), asc("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("f_matched"), col("q_n"), col("f_sum_tf"),
        col("f_max_tf"), col("f_dl"), col("f_idf"), col("f_bm25"),
        col("f_prior"))
  }

  /** HARD-NEGATIVE mining for LTR/retrieval training: the top-n docs the
    * ranker scored highest per query that are NOT in the qrels — the
    * negatives that actually move a model, because they are the mistakes
    * the current ranker makes (vs random negatives, which any model
    * separates trivially). Pure relational: a (query_id, doc_id) anti-join
    * against qrels, then a per-query WindowGroupLimit heap keeps the n
    * highest-ranked survivors. Both inputs are per-query top-k relations —
    * a million-query mining run shuffles k-row groups, never the corpus. */
  def hardNegatives(ranking: DataFrame, qrels: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ranking
      .join(qrels.select("query_id", "doc_id"), Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("rank"))).cast("long"))
      .filter(col("neg_rank") <= n)
      .select(col("query_id"), col("neg_rank"), col("doc_id"), col("rank"))
  }
}
