package graft.pipeline

import graft.textan.TextHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every doc lands
  * in train/val/test purely as a function of its id — stable across runs,
  * engines, partitionings and cluster sizes (no randomSplit, whose
  * assignment depends on partition layout and reshuffles under AQE). The
  * hash is the cross-engine TextHash family, so the DuckDB oracle
  * reproduces the assignment bit-identically; adding data never moves an
  * existing doc between splits (the property leakage audits rely on).
  */
object Splits {

  /** permille bucket in [0, 1000) from the doc id */
  def bucketCol(docId: Column): Column =
    TextHash.mixCol(7, TextHash.tokenHashCol(docId.cast("string"))) % 1000

  /** (doc_id, bucket, split) with train/val/test by permille thresholds */
  def assign(docs: DataFrame, trainPermille: Int = 800, valPermille: Int = 100): DataFrame = {
    require(trainPermille + valPermille <= 1000)
    val b = bucketCol(col("doc_id"))
    docs.select(col("doc_id"), b.as("bucket"),
      when(b < trainPermille, lit("train"))
        .when(b < trainPermille + valPermille, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** scalar twin (tests) */
  def bucketS(docId: Long): Long =
    TextHash.mix(7, TextHash.tokenHash(docId.toString)) % 1000

  /** k-fold cross-validation assignment over the SAME hash family as
    * [[assign]] (fold = permille bucket mod k — so folds nest consistently
    * with the train/val/test buckets and stay a pure function of ids).
    * Returns the fold LEDGER (fold, n_test, n_train): every doc is test in
    * exactly one fold and train in the other k−1, the invariant a CV
    * harness audits before spending k training runs. */
  def kfoldLedger(docs: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 2)
    val fold = bucketCol(col("doc_id")) % k
    val perFold = docs.select(fold.as("fold"))
      .groupBy("fold").agg(count(lit(1)).as("n_test"))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    perFold.crossJoin(broadcast(tot))
      .select(col("fold"), col("n_test"),
        (col("n_total") - col("n_test")).as("n_train"))
  }

  /** Deterministic stratified sampling with a per-stratum quota — the
    * data-mixing primitive of a training pipeline ("at most n docs per
    * (language, quality-bin)"). Docs are ordered WITHIN each stratum by the
    * same cross-engine hash family as [[assign]] (doc_id as total
    * tie-break) and the first `quota` win, so the selection is a pure
    * function of ids: stable across runs, engines and partitionings, and
    * under growth a kept doc is displaced only by a new doc hashing ahead
    * of it — never by reordering. The rank filter compiles to
    * WindowGroupLimit: a quota-row heap per stratum, never a full
    * per-stratum sort (the hot-stratum shuffle key is absorbed map-side).
    * Keeps the input columns and adds `samp_rank`. */
  def stratifiedSample(docs: DataFrame, strataCol: String, quota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("_h", TextHash.mixCol(7, TextHash.tokenHashCol(col("doc_id").cast("string"))))
      .withColumn("samp_rank", row_number().over(
        Window.partitionBy(strataCol).orderBy(col("_h"), col("doc_id"))).cast("long"))
      .filter(col("samp_rank") <= quota)
      .drop("_h")
  }

  /** Leakage-safe split: hash the dedup-CLUSTER representative instead of
    * the doc itself, so near-duplicates never straddle train/test — the
    * contamination mode a group-unaware split creates (a test doc whose
    * near-twin was trained on scores as memorization, not generalization;
    * the GPT-3 appendix-C audit exists because of exactly this).
    * `clusterOf` = (doc_id, cluster_id) from [[graft.dedup.Dedup.clusters]];
    * docs absent from it are singletons and split by their own id —
    * bit-identical to [[assign]] for them (the spec pins). Scale shape: one
    * left equi-join on doc_id (the cluster relation is the SMALL side —
    * only docs with a near-dup appear) + the same map-only permille hash;
    * every cluster member shares the key, so the no-straddle property is
    * structural, not probabilistic. */
  def leakageSafeAssign(docs: DataFrame, clusterOf: DataFrame,
                        trainPermille: Int = 800, valPermille: Int = 100): DataFrame = {
    require(trainPermille + valPermille <= 1000)
    val key = coalesce(col("cluster_id"), col("doc_id"))
    val b = bucketCol(key)
    docs.join(clusterOf, Seq("doc_id"), "left")
      .select(col("doc_id"), key.as("group_id"), b.as("bucket"),
        when(b < trainPermille, lit("train"))
          .when(b < trainPermille + valPermille, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  /** Deterministic IMPORTANCE sampling — keep probability proportional to a
    * per-doc quality weight w ∈ [0, 1]: doc kept iff bucket < ⌊1000·w⌋,
    * with the same permille hash as [[assign]]. The training-data mixing
    * move ("upsample high-quality, downsample boilerplate") as a pure
    * function of (id, weight): rerunning, repartitioning, or growing the
    * corpus never flips an existing doc's fate unless its own weight
    * changed. Map-only — no shuffle, no state; w = 0 drops always,
    * w = 1 keeps always (bucket < 1000 by construction). */
  def importanceSample(docs: DataFrame, weight: Column): DataFrame =
    docs.withColumn("bucket", bucketCol(col("doc_id")))
      .withColumn("thr", floor(lit(1000.0) * weight).cast("long"))
      .filter(col("bucket") < col("thr"))
}

/** Domain-mixture resampling: reshape a corpus toward TARGET domain
  * proportions (the Pile/ROOTS-style mixing step — "the web crawl is 44%
  * English but the training mix wants 30%") by deterministic downsampling.
  * `targets` gives each domain its target permille of the ORIGINAL corpus
  * size; a domain keeps min(n_dom, tw·N/1000) docs, so over-represented
  * domains shrink to target and under-represented ones keep everything
  * (downsample-only — upsampling is duplication, a separate policy).
  * Domains absent from `targets` drop entirely.
  *
  * The keep rule is the pure-BIGINT cross-multiplication of
  * P(keep) = min(1, (tw/1000)/(n_dom/N)):  keep  iff  bucket·n_dom < tw·N
  * with the same cross-engine permille hash as [[Splits.assign]] — no
  * float division anywhere, so engines agree bit-exactly and a doc's fate
  * is a pure function of (id, its domain's count, N): stable across runs,
  * partitionings and engines.
  *
  * Scale shape: one count aggregate per domain (|domains| rows, broadcast
  * back), one 1-row total, then a map-only filter — the corpus is scanned
  * once and never shuffled. */
object Mixture {
  def resample(docs: DataFrame, domCol: String, targets: Map[String, Int]): DataFrame = {
    require(targets.values.forall(w => w >= 0 && w <= 1000))
    val tw = targets.foldLeft(lit(0L)) { case (acc, (d, w)) =>
      when(col(domCol) === d, lit(w.toLong)).otherwise(acc)
    }
    val counts = docs.groupBy(domCol).agg(count(lit(1)).as("_n"))
    val tot = docs.agg(count(lit(1)).as("_tot"))
    docs.join(broadcast(counts), domCol)
      .crossJoin(broadcast(tot))
      .withColumn("bucket", Splits.bucketCol(col("doc_id")))
      .filter(col("bucket") * col("_n") < tw * col("_tot"))
      .select(col("doc_id"), col(domCol), col("bucket"))
  }
}
