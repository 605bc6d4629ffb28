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
}
