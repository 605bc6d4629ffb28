package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Static result-cache admission study (Markatos, 2001 "On caching search
  * engine query results"; Baeza-Yates et al., SIGIR 2007 "The impact of
  * caching on search engines" — public literature). Production engines put
  * a results cache in front of the index; the STATIC policy — precompute
  * and pin the results of the C historically most frequent queries —
  * captures most of the skew of real query logs without any eviction
  * machinery, and its hit rate is a pure relational computation:
  *
  *   train/eval split of the stream → top-C train queries by frequency
  *   (ties lexicographic) → hit rate = fraction of eval queries in the
  *   cache. The infinite-cache rate (eval queries seen ANYWHERE in train)
  *   upper-bounds every admission policy fed by the same history.
  *
  * Scale shape: a query log aggregates to its distinct-query frequency
  * table (≪ log), the top-C cut is one WindowGroupLimit, and both hit
  * counts are semi-join aggregates of the eval stream against
  * dictionary-sized relations — the log is scanned once per side.
  *
  * `stream` is (event_id, query); train = even event_id, eval = odd —
  * the deterministic interleaved split both engines replay. */
object ResultCache {

  /** One row: (c_size, n_eval, hits_static, hits_infinite). */
  def staticCacheStudy(stream: DataFrame, c: Int): DataFrame = {
    val train = stream.filter(col("event_id") % 2 === 0)
    val eval = stream.filter(col("event_id") % 2 === 1)
    val freq = train.groupBy("query").agg(count(lit(1)).as("f"))
    val cache = freq
      .withColumn("r", row_number().over(Window.orderBy(desc("f"), asc("query"))))
      .filter(col("r") <= c)
      .select("query")
    val nEval = eval.agg(count(lit(1)).as("n_eval"))
    val hitsS = eval.join(cache, "query")
      .agg(count(lit(1)).as("hits_static"))
    val hitsI = eval.join(freq.select("query"), "query")
      .agg(count(lit(1)).as("hits_infinite"))
    nEval.crossJoin(hitsS).crossJoin(hitsI)
      .select(lit(c.toLong).as("c_size"), col("n_eval"),
        col("hits_static"), col("hits_infinite"))
  }

  /** Static POSTING-LIST cache admission by the QTF/DF policy (Baeza-Yates
    * et al., SIGIR 2007 §6: pin the lists with the best query-popularity
    * per byte; df proxies list size). Terms rank by qtf/df desc (ties
    * lexicographic); the pinned set is the longest prefix whose cumulative
    * df fits the budget. Returns ONE row:
    * (budget, pinned_terms, pinned_df, hit_mass, total_mass) — hit_mass is
    * the query-stream mass the pinned lists absorb.
    *
    * Scale shape: everything after the stream's frequency aggregate is
    * dictionary-sized; the cumulative cut is one global window over the
    * vocabulary (fine — vocabularies are millions, not trillions), and the
    * budget enters as a broadcast 1-row aggregate. */
  def postingCacheStudy(stream: DataFrame, termStats: DataFrame,
                        budgetDiv: Long = 10L): DataFrame = {
    val qtf = stream.groupBy(col("query").as("term"))
      .agg(count(lit(1)).as("qtf"))
    val budget = termStats.agg(expr(s"sum(df) div $budgetDiv").as("budget"))
    val ranked = qtf.join(termStats.select("term", "df"), "term")
      .withColumn("value", col("qtf").cast("double") / col("df").cast("double"))
      .withColumn("cum_df", sum("df").over(Window.orderBy(desc("value"), asc("term"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val pinned = ranked.crossJoin(broadcast(budget))
      .filter(col("cum_df") <= col("budget"))
    val tot = stream.agg(count(lit(1)).as("total_mass"))
    pinned.agg(count(lit(1)).as("pinned_terms"),
        coalesce(sum("df"), lit(0L)).as("pinned_df"),
        coalesce(sum("qtf"), lit(0L)).as("hit_mass"))
      .crossJoin(budget).crossJoin(tot)
      .select(col("budget"), col("pinned_terms"), col("pinned_df"),
        col("hit_mass"), col("total_mass"))
  }

  /** Query-traffic concentration as a Gini coefficient (Lorenz/Gini —
    * standard inequality measure; applied to query logs in the caching
    * literature, e.g. Baeza-Yates et al. 2007's skew analyses): how much
    * of the traffic the head queries carry decides cache sizes, replica
    * counts and admission policies before any simulation runs.
    *
    *   G = Σ_i (2i − n − 1)·x_i / (n·Σx),  x sorted ascending
    *
    * Integer numerator/denominator, ONE final IEEE division — hash-exact
    * to the rounding tolerance. The rank window runs over the DISTINCT
    * query frequency table (dictionary-sized), never the raw log. Returns
    * one row: (n_queries, distinct_queries, gini_r). */
  def trafficGini(stream: DataFrame): DataFrame = {
    val freq = stream.groupBy("query").agg(count(lit(1)).as("f"))
    val st = freq.agg(count(lit(1)).as("n"), sum("f").as("tot"))
    val ranked = freq.withColumn("i", row_number().over(
      Window.orderBy(asc("f"), asc("query"))).cast("long"))
    ranked.crossJoin(broadcast(st))
      .agg(sum((lit(2L) * col("i") - col("n") - lit(1L)) * col("f")).as("num"),
        max("n").as("n"), max("tot").as("tot"))
      .select(col("tot").as("n_queries"), col("n").as("distinct_queries"),
        round(col("num").cast("double") / (col("n") * col("tot")).cast("double"), 4)
          .as("gini_r"))
  }

  /** Deterministic query stream synthesized from the corpus: event i is
    * document i's most frequent term (ties lexicographic) — the stream
    * inherits the vocabulary's Zipf skew, which is exactly what makes
    * result caching pay. */
  def argmaxTermStream(postings: DataFrame): DataFrame =
    postings
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("tf"), asc("term"))))
      .filter(col("r") === 1)
      .select(col("doc_id").as("event_id"), col("term").as("query"))
}
