package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resource selection for SELECTIVE SEARCH: rank index shards per query so
  * the broker fans a query out to the few shards that can hold competitive
  * results instead of broadcasting it to every shard (Callan, Lu & Croft,
  * SIGIR 1995 "Searching Distributed Collections with Inference Networks" —
  * CORI; Kulkarni & Callan, CIKM 2010 selective search — public
  * literature). At 1000 executors a query that touches every posting shard
  * pays 1000 task launches for ~10 useful ones; the shard-statistics
  * relation below is (shards × vocabulary) small, lives broadcast at the
  * broker, and prices each shard BEFORE any posting is read.
  *
  * The reference's per-site lemma table (model/Lemma.java:24-27 site FK) is
  * the single-node seed of the same idea: per-site df is exactly the
  * statistic CORI needs, kept per shard instead.
  */
object Shards {

  /** Per-(shard, term) statistics — an INDEX ARTIFACT built in ONE pass
    * over postings (no re-tokenization): df = docs in the shard containing
    * the term, tfs = the term's total tf in the shard. `docShard` maps
    * doc_id → shard (the natural shard key here is repo — the unit a
    * placement policy co-locates). Shuffle key is (shard, term); the
    * output is vocabulary-bounded per shard, NOT corpus-bounded. */
  def shardTermStats(postings: DataFrame, docShard: DataFrame): DataFrame =
    postings.join(docShard, "doc_id")
      .groupBy("shard", "term")
      .agg(count(lit(1)).as("df"), sum("tf").as("tfs"))

  /** CORI shard ranking for one query. Belief that shard s satisfies term
    * t: p = b + (1−b)·T·I with T = df/(df + 50 + 150·cw_s/avg_cw) (df
    * normalized by shard size in tokens) and I = ln((nShards+0.5)/cf_t) /
    * ln(nShards+1) (an ICF — "idf over shards"); score(s) = Σ_t∈q p, a
    * term absent from a shard contributing the b floor (T = 0). Constants
    * 50/150/b=0.4 are the paper's.
    *
    * Everything here is sized in SHARDS, not documents: the two scalar
    * stats (nShards, avg cw) are driver lookups on a ≤|shards|-row
    * relation, the scoring grid is |shards|·|q| rows, and the final
    * ranking window sorts |shards| rows — all broker-side costs,
    * independent of corpus size. */
  def coriScores(shardStats: DataFrame, queryTerms: Seq[String],
                 b: Double = 0.4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = shardStats.groupBy("shard")
      .agg(sum("tfs").cast("double").as("cw"))
    val Array(nShards, avgcw) =
      sizes.agg(count(lit(1)).cast("double"), avg("cw")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
    val q = queryTerms.distinct
    val cf = shardStats.filter(col("term").isin(q.map(x => x: Any): _*))
      .groupBy("term").agg(count(lit(1)).cast("double").as("cf"))
    val grid = sizes.select(col("shard"), col("cw"),
      explode(array(q.map(lit(_)): _*)).as("term"))
    grid
      .join(shardStats.select("shard", "term", "df"), Seq("shard", "term"), "left")
      // a query term absent corpus-wide has no cf — it adds the same b
      // floor to every shard, so the inner join drops it rank-neutrally
      .join(cf, Seq("term"))
      .na.fill(0L, Seq("df"))
      .withColumn("t_", col("df") /
        (col("df") + lit(50.0) + lit(150.0) * col("cw") / lit(avgcw)))
      .withColumn("i_",
        log((lit(nShards) + lit(0.5)) / col("cf")) / log(lit(nShards) + lit(1.0)))
      .groupBy("shard")
      .agg(sum(lit(b) + lit(1.0 - b) * col("t_") * col("i_")).as("score"))
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score"), asc("shard"))).cast("long"))
  }
}
