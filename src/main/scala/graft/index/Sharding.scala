package graft.index

import graft.textan.TextHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) routing of the term dictionary onto
  * index shards (Thaler & Ravishankar 1998 — public literature; the same
  * scheme behind consistent request routing in memcache-style tiers).
  *
  * Every (term, shard) pair gets a deterministic weight
  * w(t, s) = mix_s(tokenHash(t)); term t lives on the `replicas` shards
  * with the highest weights. The property that matters at cluster scale:
  * adding or removing ONE shard only moves the terms whose top-weight
  * shard changed — expected 1/S of the dictionary — where mod-S hashing
  * reshuffles almost everything. The hash family is [[TextHash]], so the
  * placement is bit-identical in Scala, Spark SQL, and the DuckDB oracle.
  *
  * Scale shape: routing explodes the DICTIONARY (vocabulary-sized relation,
  * ≪ corpus) by S rows and ranks with one window partitioned on term —
  * a per-term top-R, never a global sort. Queries route the same way
  * driver-side: |q| terms × S weights, microseconds, no cluster round-trip.
  */
object Sharding {

  /** per-(term, shard) rendezvous weight, shard index fixed at plan time */
  def weight(shard: Int, termHash: Column): Column = TextHash.mixCol(shard, termHash)

  /** (term, df, shard, rnk): the `replicas` highest-weight shards per term,
    * rnk = 1 the primary. Ties (astronomically unlikely but the oracle gate
    * demands total determinism) break toward the smaller shard index. */
  def route(termStats: DataFrame, nShards: Int, replicas: Int = 2): DataFrame = {
    require(nShards >= replicas && replicas >= 1)
    val h = TextHash.tokenHashCol(col("term"))
    val placed = termStats.select(col("term"), col("df"), h.as("_h"))
      .select(col("term"), col("df"), explode(array(
        (0 until nShards).map(s =>
          struct(lit(s).as("shard"), weight(s, col("_h")).as("w"))): _*)).as("p"))
      .select(col("term"), col("df"), col("p.shard").as("shard"), col("p.w").as("w"))
    val byTerm = Window.partitionBy("term").orderBy(desc("w"), asc("shard"))
    placed.withColumn("rnk", row_number().over(byTerm).cast("long"))
      .filter(col("rnk") <= replicas)
      .select(col("term"), col("df"), col("shard").cast("long").as("shard"), col("rnk"))
  }

  /** per-shard load ledger: how many terms (and how much df mass — a proxy
    * for posting bytes) each shard carries at each replica rank. The
    * balance check a capacity planner reads before resharding. */
  def loadSummary(termStats: DataFrame, nShards: Int, replicas: Int = 2): DataFrame =
    route(termStats, nShards, replicas)
      .groupBy("shard", "rnk")
      .agg(count(lit(1)).as("n_terms"), sum("df").as("df_mass"))
      .orderBy(asc("shard"), asc("rnk"))
}
