package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-plan training-set curation — the composition every LLM-data pipeline
  * runs before training:
  *
  *   1. quality gate (whitespace-token count + alnum ratio thresholds)
  *   2. exact-dedup keep-list (canonical doc per content = min doc_id over
  *      the sha256 group — the 32-byte shuffle key of Dedup.exact)
  *   3. deterministic train/val/test assignment (Splits hash permille)
  *
  * Declarative end to end, so Catalyst sees ONE plan: the quality
  * predicates sit directly over the scan (codegen'd Column chain, no
  * intermediate corpus materialized), the keep-list is a single hash
  * aggregate + left-semi join back, and the split is a pure projection.
  * At 100 TB this is one shuffle (the sha256 group) plus one semi join on
  * doc_id — nothing corpus-sized ever collects or caches.
  */
object Curation {

  /** (doc_id, n_tokens, bucket, split) for the docs that survive curation */
  def curate(docs: DataFrame, minTokens: Long = 30,
             minAlnumRatio: Double = 0.7): DataFrame = {
    val ws = filter(split(col("content"), "\\s+"), t => length(t) > 0)
    val gated = docs
      .withColumn("n_tokens", size(ws).cast("long"))
      .withColumn("_alnum",
        when(length(col("content")) > 0,
          length(regexp_replace(col("content"), "[^A-Za-z0-9]", "")).cast("double")
            / length(col("content")))
          .otherwise(lit(0.0)))
      .filter(col("n_tokens") >= minTokens && col("_alnum") >= minAlnumRatio)
    val keep = gated.groupBy(sha2(col("content"), 256).as("csha"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val kept = gated.join(keep, Seq("doc_id"), "left_semi")
    val b = Splits.bucketCol(col("doc_id"))
    kept.select(col("doc_id"), col("n_tokens"), b.as("bucket"),
      when(b < 800, lit("train")).when(b < 900, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Per-source quality-percentile gate — "keep each source's top p‰ by
    * quality" (the CCNet move: an ABSOLUTE quality threshold lets one
    * clean domain flood the mix and silently drops whole noisy-but-useful
    * domains; a PER-SOURCE percentile keeps the mixture shape).
    *
    * Exact and scale-safe without a per-source sort: `q` is a score
    * already rounded to fixed precision, so the per-source histogram
    * groupBy("source", "q") has BOUNDED cardinality (≤ 10⁴ rows per
    * source at 4dp in [0,1]) no matter the corpus size — the cumulative
    * window then runs over histogram rows, never docs (contrast: exact
    * `percentile`/window-rank buffers or sorts every doc of a source in
    * one place). Threshold = the highest q whose ties-or-better count
    * reaches ⌈p‰·n⌉, by pure-BIGINT cross-multiplication; ALL docs tying
    * the threshold are kept (quantile_disc semantics — deterministic, no
    * intra-tie ordering dependence), so the kept count can slightly
    * exceed p‰·n. docs = (doc_id, source, q). */
  def qualityQuantileGate(docs: DataFrame, keepPermille: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepPermille >= 0 && keepPermille <= 1000)
    val hist = docs.groupBy("source", "q").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.partitionBy("source").orderBy(desc("q"))))
    val n = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val thr = cum.join(n, "source")
      .filter(col("cum") * 1000L >= col("n") * lit(keepPermille.toLong))
      .groupBy("source").agg(max("q").as("thr"))
    docs.join(broadcast(thr), "source")
      .filter(col("q") >= col("thr"))
      .select(col("doc_id"), col("source"), col("q"), col("thr"))
  }
}
