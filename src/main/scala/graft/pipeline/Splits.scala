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
}
