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

  /** Paired bootstrap significance test (Smucker, Allan & Carterette,
    * CIKM 2007 — the standard IR answer to "is ranker A actually better
    * than B, or did I get lucky on this query set?"): resample the query
    * set with replacement `b` times, measure how often the resampled mean
    * per-query metric delta (A − B) fails to stay positive — that fraction
    * is the one-sided p-value.
    *
    * Determinism across engines, the part worth care:
    *  - resampling uses the cross-engine TextHash family over the FLAT
    *    draw id (resample·nq + slot), not an engine RNG — the DuckDB twin
    *    replays the exact draws;
    *  - per-query deltas are converted to INTEGER micro-units
    *    (round(Δndcg·10⁶)) so every resample sum is exact BIGINT
    *    arithmetic — the `≤ 0` sign test can never flip on summation
    *    order, and p is a ratio of integers.
    *
    * Scale shape: deltas are one join of two Q-row metric relations; the
    * draw table is b·Q rows joined against the Q-row delta relation
    * (broadcast — Q ≪ corpus by construction) and aggregated on the
    * resample id. The global row_number windows run over Q-row relations
    * only, never anything corpus-sized. Returns ONE row:
    * (n_queries, n_resamples, mean_delta_r, p_r, significant@0.05). */
  def pairedBootstrap(metricsA: DataFrame, metricsB: DataFrame, metric: String,
                      b: Int = 200, seed: Int = 11): DataFrame = {
    import graft.textan.TextHash
    val d = metricsA.select(col("query_id"), col(metric).as("ma"))
      .join(metricsB.select(col("query_id"), col(metric).as("mb")), "query_id")
      .select(col("query_id"),
        round((col("ma") - col("mb")) * lit(1000000.0), 0).cast("long").as("du"))
    val idx = d.withColumn("qidx",
      (row_number().over(Window.orderBy(asc("query_id"))) - 1).cast("long"))
    val nq = idx.count()
    require(nq > 0, "paired bootstrap needs a non-empty shared query set")
    val spark = metricsA.sparkSession
    val draws = spark.range(b.toLong * nq).select(
      expr(s"id div $nq").as("bs"),
      (TextHash.mixCol(seed, TextHash.tokenHashCol(col("id").cast("string")))
        % nq).as("pick"))
    val sums = draws
      .join(broadcast(idx.select(col("qidx"), col("du"))), col("pick") === col("qidx"))
      .groupBy("bs").agg(sum("du").as("sdu"))
    val cnt = sums.agg(count(lit(1)).as("nb"),
      sum(when(col("sdu") <= 0L, lit(1L)).otherwise(lit(0L))).as("le0"))
    val obs = d.agg(sum("du").as("odu"))
    cnt.crossJoin(obs).select(
      lit(nq).as("n_queries"), col("nb").as("n_resamples"),
      round(col("odu").cast("double") / lit(nq * 1000000.0), 4).as("mean_delta_r"),
      round(col("le0").cast("double") / col("nb").cast("double"), 4).as("p_r"),
      (col("le0") * lit(20L) < col("nb")).cast("long").as("significant"))
  }

  /** Balanced interleaving (Joachims, KDD 2002 — public literature): the
    * ONLINE ranker comparison — merge A's and B's rankings into one list
    * shown to users, credit clicks by team. Joachims's pointer walk with a
    * per-query leader coin reduces to a closed relational form: leader's
    * rank r lands in slot 2r−1, follower's in slot 2r; a doc in both lists
    * keeps its FIRST slot. So: one union, one (query, doc) min-slot
    * aggregate, one WindowGroupLimit top-k — no per-step state, whole
    * query logs interleave in one plan. The coin is the cross-engine
    * TextHash of the query id (no RNG — the DuckDB twin replays it); team
    * attribution = leader iff the kept slot is odd. */
  def balancedInterleave(rankA: DataFrame, rankB: DataFrame, k: Int,
                         seed: Int = 13): DataFrame = {
    import graft.textan.TextHash
    def aLeads = (TextHash.mixCol(seed,
      TextHash.tokenHashCol(col("query_id").cast("string"))) % 2) === 0
    val a = rankA.select(col("query_id"), col("doc_id"),
      (col("rank") * 2 - when(aLeads, lit(1L)).otherwise(lit(0L))).as("slot"))
    val b = rankB.select(col("query_id"), col("doc_id"),
      (col("rank") * 2 - when(aLeads, lit(0L)).otherwise(lit(1L))).as("slot"))
    a.unionByName(b)
      .groupBy("query_id", "doc_id").agg(min("slot").as("slot"))
      .withColumn("team",
        when((col("slot") % 2 === 1) === aLeads, lit("A")).otherwise(lit("B")))
      .withColumn("irank", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("slot"))).cast("long"))
      .filter(col("irank") <= k)
      .select("query_id", "irank", "doc_id", "team", "slot")
  }

  /** Post-retrieval query-performance prediction — the score-dispersion
    * predictor in the NQC family (Shtok, Kurland & Carmel 2012: queries
    * whose top-k scores are tightly bunched are hard — the ranker can't
    * separate; NQC proper normalizes σ by the full-collection score, this
    * uses the standard lightweight surrogate of the mean top-k score).
    * One aggregate over the already-computed (query, rank, score) top-k
    * relation — Q×k rows, nothing corpus-sized. */
  def nqc(ranking: DataFrame, k: Int): DataFrame =
    ranking.filter(col("rank") <= k)
      .groupBy("query_id")
      .agg(count(lit(1)).as("k_n"),
        avg("score").as("mu"), stddev_pop(col("score")).as("sigma"))
      .select(col("query_id"), col("k_n"),
        (col("sigma") / col("mu")).as("nqc"))

  /** RBP + ERR per query — the two user-model metrics beside nDCG/MAP.
    *
    * RBP (Moffat & Zobel, TOIS 2008, "Rank-biased precision for measurement
    * of retrieval effectiveness"): the user inspects rank r with
    * persistence p^(r−1); RBP = (1−p)·Σ_r u_r·p^(r−1) with graded utility
    * u = grade/gradeMax ∈ [0,1]. Needs no ideal ranking and no |relevant|
    * — the metric of choice when qrels are incomplete.
    *
    * ERR (Chapelle et al., CIKM 2009, "Expected reciprocal rank for graded
    * relevance"): cascade model — the user stops at rank r with
    * probability R_r = (2^g − 1)/2^gmax; ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i).
    * The cascade product is computed as exp(Σ ln(1−R_i)) over the
    * preceding-rows window — the same closed form on both engines (R_i < 1
    * always since (2^gmax − 1)/2^gmax < 1), so the decomposition is shared
    * and IEEE-aligned.
    *
    * Scale shape: one left join of the Q×k ranking against qrels + two
    * windows PARTITIONED on query_id over k-row groups — same cost class
    * as rankingMetrics, nothing corpus-sized. */
  def rbpErr(ranking: DataFrame, qrels: DataFrame, k: Int,
             p: Double = 0.8, gradeMax: Long = 3L): DataFrame = {
    val ranked = ranking.filter(col("rank") <= k)
      .join(qrels, Seq("query_id", "doc_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0L)))
    val stopP = (pow(lit(2.0), col("grade")) - lit(1.0)) /
      lit(math.pow(2.0, gradeMax.toDouble))
    val prevW = Window.partitionBy("query_id").orderBy(asc("rank"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranked
      .withColumn("u", col("grade").cast("double") / lit(gradeMax.toDouble))
      .withColumn("rbp_t", lit(1.0 - p) * col("u") * pow(lit(p), col("rank") - lit(1L)))
      .withColumn("stop", stopP)
      .withColumn("surv", exp(coalesce(sum(log(lit(1.0) - col("stop"))).over(prevW), lit(0.0))))
      .withColumn("err_t", col("stop") / col("rank").cast("double") * col("surv"))
      .groupBy("query_id")
      .agg(sum("rbp_t").as("rbp"), sum("err_t").as("err"))
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
