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

  /** Consistent-hash ring with virtual nodes (Karger et al., STOC 1997;
    * DeCandia et al., "Dynamo", SOSP 2007 — public literature): the OTHER
    * minimal-disruption placement beside rendezvous ([[route]]). Each
    * shard plants `vnodes` points on the hash circle (position =
    * mix_{s·V+v}(RingSeed) from the cross-engine mixer family); a term
    * belongs to the first vnode clockwise from its hash, wrapping to the
    * globally minimal position. V virtual nodes per shard flatten the
    * arc-length variance a single point per shard would have.
    *
    * [[ringBalance]] reports, per shard at S shards: (n_terms, df_mass,
    * moved_to_new) — the terms this shard cedes when shard S joins with
    * its own V vnodes (consistent hashing's guarantee: terms only ever
    * move TO the new shard). Dictionary-sized throughout; the ring is a
    * broadcast literal relation. */
  val RingSeed = 12345L

  def vnodePositions(spark: org.apache.spark.sql.SparkSession,
                     nShards: Int, vnodes: Int): DataFrame = {
    import spark.implicits._
    (0 until nShards).flatMap(s => (0 until vnodes).map(v =>
      (s.toLong, TextHash.mix(s * vnodes + v, RingSeed)))).toDF("shard", "pos")
  }

  /** (term, shard) under the ring: successor vnode, wrap to global min. */
  def ringOwner(termStats: DataFrame, ring: DataFrame): DataFrame = {
    val t = termStats.select(col("term"),
      TextHash.tokenHashCol(col("term")).as("th"))
    val succ = t.join(broadcast(ring), col("pos") >= col("th"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("term").orderBy(asc("pos"), asc("shard"))))
      .filter(col("rn") === 1)
      .select(col("term"), col("shard"))
    val wrapOwner = ring.orderBy(asc("pos"), asc("shard")).limit(1).select("shard")
    val wrapped = t.join(succ, Seq("term"), "left_anti")
      .crossJoin(broadcast(wrapOwner))
      .select(col("term"), col("shard"))
    succ.unionByName(wrapped)
  }

  def ringBalance(termStats: DataFrame, nShards: Int, vnodes: Int): DataFrame = {
    val spark = termStats.sparkSession
    val o8 = ringOwner(termStats, vnodePositions(spark, nShards, vnodes))
    val o9 = ringOwner(termStats, vnodePositions(spark, nShards + 1, vnodes))
      .withColumnRenamed("shard", "shard_grown")
    termStats.select("term", "df")
      .join(o8, "term").join(o9, "term")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_terms"), sum("df").as("df_mass"),
        sum(when(col("shard_grown") =!= col("shard"), lit(1L)).otherwise(lit(0L)))
          .as("moved_to_new"))
  }

  /** Term-partitioned vs document-partitioned serving cost for a query
    * workload (Moffat, Webber, Zobel & Baeza-Yates, Inf. Retr. 2007, "A
    * pipelined architecture for distributed text query evaluation"; MRS
    * ch. 4/20 — public literature). The two classic layouts trade probes
    * for balance:
    *
    *  - TERM-partitioned: a term's whole list lives on its rendezvous
    *    shard — a query probes only |q| shards, but hot terms pile their
    *    full df onto one machine (skew).
    *  - DOC-partitioned: every list spreads by doc hash — every query
    *    probes ALL S shards, but each shard carries ~1/S of every list
    *    (balance), and this is what real engines ship.
    *
    * One row per strategy: (strategy, shard_probes, rows_fetched,
    * max_shard_rows) over the workload — rows_fetched is identical by
    * construction (both fetch every matching posting once); the probes and
    * the max-loaded shard are where the strategies separate. All BIGINT.
    *
    * Scale shape: the term side is dictionary-sized (route + workload
    * join); the doc side is one postings pass restricted to the workload
    * vocabulary with a (term, shard) aggregate. */
  def partitionStudy(termStats: DataFrame, postings: DataFrame,
                     queries: DataFrame, nShards: Int): DataFrame = {
    val q = queries.select("query_id", "term").distinct()
    val vocab = q.select("term").distinct()
    val wl = q.join(termStats.select("term", "df"), "term")
    // term-partitioned: primary rendezvous owner per term
    val tp = wl.join(route(termStats.join(vocab, "term"), nShards, replicas = 1)
      .select("term", "shard"), "term")
    val tpProbes = tp.select("query_id", "shard").distinct()
      .agg(count(lit(1)).as("shard_probes"))
    val tpRows = tp.agg(sum("df").as("rows_fetched"))
    val tpMax = tp.groupBy("shard").agg(sum("df").as("r"))
      .agg(max("r").as("max_shard_rows"))
    // doc-partitioned: postings scatter by doc hash; a query touches all S
    val perShard = postings.join(vocab, "term")
      .withColumn("shard", TextHash.mixCol(7, col("doc_id")) % nShards)
      .groupBy("term", "shard").agg(count(lit(1)).as("dfs"))
    val dpLoad = q.join(perShard, "term")
      .groupBy("shard").agg(sum("dfs").as("r"))
    val dpProbes = q.select("query_id").distinct()
      .agg((count(lit(1)) * nShards).as("shard_probes"))
    val dpMax = dpLoad.agg(max("r").as("max_shard_rows"))
    val one = (a: DataFrame, b: DataFrame, c: DataFrame, label: String) =>
      a.crossJoin(b).crossJoin(c)
        .select(lit(label).as("strategy"), col("shard_probes"),
          col("rows_fetched"), col("max_shard_rows"))
    one(tpProbes, tpRows, tpMax, "term_part")
      .unionByName(one(dpProbes, tpRows, dpMax, "doc_part"))
  }
}
