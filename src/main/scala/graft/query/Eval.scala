package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation harness — nDCG@k and MAP@k per query, the
  * text-ranking counterpart of the ANN recall@k harness (ann/Ann.recallAtK).
  * The reference ships no evaluation tooling; a 100 TB engine tuning BM25
  * variants (BM25F, phrase boost, blends, PRF) needs the metric loop to be
  * an operator, not a notebook: rankings are (query_id, rank, doc_id)
  * relations and qrels are (query_id, doc_id, grade) relations, so one call
  * scores a whole query log.
  *
  * Scale shape: every step is an equi-join or window PARTITIONED ON
  * query_id — a million-query eval shuffles k-row groups, never the corpus.
  * The ranking side is Q×k rows by construction; the qrels side is touched
  * once for the ideal-DCG window and once (aggregated) for |relevant|.
  */
object Eval {

  /** Deterministic graded qrels synthesized from the corpus itself:
    * conjunctive matches graded by capped Σtf (grade = least(Σtf, cap)).
    * This is a FIXTURE generator — real deployments load human judgments —
    * but it exercises the exact relational shape (sparse, graded, per-query)
    * and both engines derive it identically. One postings pass for the whole
    * query log, map-side partial agg on (query_id, doc_id). */
  def sumTfQrels(postings: DataFrame, queries: DataFrame, cap: Long = 3L): DataFrame = {
    val q = queries.select("query_id", "term").distinct()
    val qn = q.groupBy("query_id").agg(count(lit(1)).as("q_n"))
    postings.join(broadcast(q), "term")
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("stf"))
      .join(broadcast(qn), "query_id")
      .filter(col("n_terms") === col("q_n"))
      .select(col("query_id"), col("doc_id"), least(col("stf"), lit(cap)).as("grade"))
  }

  /** nDCG@k + MAP@k per query.
    * ranking: (query_id, rank, doc_id) with rank 1-based; qrels:
    * (query_id, doc_id, grade ≥ 1). Binary relevance for AP is
    * grade ≥ relThreshold; graded gain for DCG is (2^grade − 1)/ln(rank+1)
    * (the log base cancels in the nDCG ratio, and ln keeps the two engines
    * on the same libm call). Ideal ranking ties break doc_id asc so IDCG is
    * deterministic. Queries with no qrels drop out (inner join) — they have
    * no defined ideal. AP denominator is |relevant| in the FULL qrels (not
    * just retrieved), the trec_eval convention. */
  def rankingMetrics(ranking: DataFrame, qrels: DataFrame, k: Int,
                     relThreshold: Long = 2L): DataFrame = {
    val ranked = ranking.filter(col("rank") <= k)
      .join(qrels, Seq("query_id", "doc_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0L)))
    val gain = (pow(lit(2.0), col("grade")) - lit(1.0)) / log(col("rank") + lit(1.0))
    val dcg = ranked.withColumn("g", gain)
      .groupBy("query_id").agg(sum("g").as("dcg"))
    val iw = Window.partitionBy("query_id").orderBy(desc("grade"), asc("doc_id"))
    val ideal = qrels.withColumn("irank", row_number().over(iw).cast("long"))
      .filter(col("irank") <= k)
      .withColumn("g", (pow(lit(2.0), col("grade")) - lit(1.0)) / log(col("irank") + lit(1.0)))
      .groupBy("query_id").agg(sum("g").as("idcg"))
    val cumW = Window.partitionBy("query_id").orderBy(asc("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ap = ranked
      .withColumn("r", when(col("grade") >= relThreshold, 1L).otherwise(0L))
      .withColumn("cum", sum("r").over(cumW))
      .withColumn("p_at", when(col("r") === 1L,
        col("cum").cast("double") / col("rank").cast("double")).otherwise(lit(0.0)))
      .groupBy("query_id").agg(sum("p_at").as("sump"))
    val nRel = qrels.filter(col("grade") >= relThreshold)
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    dcg.join(ideal, "query_id").join(ap, "query_id")
      .join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        (col("dcg") / col("idcg")).as("ndcg"),
        when(coalesce(col("n_rel"), lit(0L)) > 0L,
          col("sump") / col("n_rel")).otherwise(lit(0.0)).as("ap"))
  }
}
