package graft.pipeline

import graft.textan.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chop step every LLM training pipeline
  * runs last (GPT-style pretraining concatenates documents in a fixed
  * order and splits the stream at context-window boundaries; cf. the
  * GPT-3 paper's data pipeline, public literature): given per-doc token
  * counts, compute each document's byte-exact position in the packed
  * stream — which training sequence it starts in, which it ends in, and
  * its offset inside the first — as a pure function of ids.
  *
  * The concat order is the cross-engine hash of the doc id (a
  * deterministic shuffle: dissimilar neighbors, stable under reruns and
  * engines — NOT ingestion order, which would pack whole crawls
  * back-to-back).
  *
  * Scale shape — the part that is easy to get wrong: the packed offset is
  * a PREFIX SUM over the whole corpus, and a naive
  * `sum() over (order by h)` is a single-partition window. This computes
  * it in two exact phases instead: contiguous hash-RANGE buckets (range,
  * not modulo — bucket order must equal global order), a per-bucket
  * cumulative window (parallel), and driver-collected per-bucket totals
  * folded into base offsets (nBuckets scalars — the same pattern as
  * Corpus.docIds). The DuckDB twin computes the GLOBAL single-window
  * cumsum, so the oracle gate proves two-phase ≡ global. */
object Packing {

  /** (doc_id, h, off, seq_first, seq_last, split) for every doc with a
    * token count; `split` = 1 when the doc crosses a sequence boundary.
    * docStats = (doc_id, dl). */
  def pack(docStats: DataFrame, capacity: Long, nBuckets: Int = 32): DataFrame = {
    require(capacity > 0 && nBuckets > 0)
    val bucketWidth = (TextHash.P + nBuckets - 1) / nBuckets
    val withB = docStats
      .select(col("doc_id"), col("dl"),
        TextHash.mixCol(9, TextHash.tokenHashCol(col("doc_id").cast("string"))).as("h"))
      .withColumn("bucket", (col("h") / bucketWidth).cast("int"))
    val w = Window.partitionBy("bucket").orderBy(asc("h"), asc("doc_id"))
    val local = withB.withColumn("loff", sum("dl").over(w) - col("dl"))
    val totals = withB.groupBy("bucket").agg(sum("dl").as("btot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val bases = (0 until nBuckets).map { b =>
      val base = acc; acc += totals.getOrElse(b, 0L); b -> base
    }.toMap
    val baseCol = bases.foldLeft(lit(0L)) { case (e, (b, base)) =>
      when(col("bucket") === b, lit(base)).otherwise(e)
    }
    local.withColumn("off", col("loff") + baseCol)
      .withColumn("seq_first", expr(s"off div $capacity"))
      .withColumn("seq_last", expr(s"(off + dl - 1) div $capacity"))
      .withColumn("split", (col("seq_last") > col("seq_first")).cast("long"))
      .select("doc_id", "h", "off", "seq_first", "seq_last", "split")
  }
}
