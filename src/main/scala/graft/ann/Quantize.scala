package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Int8 scalar quantization (SQ8) of the embedding column — the standard
  * first compression rung of a vector index (FAISS's ScalarQuantizer /
  * Milvus SQ8; Guo et al. 2020 "Accelerating Large-Scale Inference with
  * Anisotropic Vector Quantization" motivates the asymmetric scoring):
  * each dimension is affinely mapped to an 8-bit code, so a stored vector
  * costs `dim` bytes instead of `4·dim` — at 10^10 × 64-dim float vectors
  * (~2.5 TB raw), SQ8 cuts the scan to ~0.6 TB while keeping recall high.
  *
  * Everything is deterministic and engine-portable:
  *   - train: per-dimension global (min, max) — ONE aggregate pass, 2·dim
  *     doubles to the driver (the same driver-known-scalar shape as
  *     nDocs/avgDl).
  *   - encode: code_d = round((x_d − lo_d) / step_d) clamped to [0, 255],
  *     step_d = (hi_d − lo_d)/255; both engines compute the same double
  *     before rounding, so even knife-edge .5 cases agree. Codes ship as
  *     array<tinyint> (shifted by −128): 1-byte logical elements — the
  *     storage relation.
  *   - score: ASYMMETRIC (ADC): the raw double query against the
  *     dequantized vector x̂_d = lo_d + code_d · step_d, cosine via the
  *     same left-to-right folds as the exact path (Dedup.cosinePre) —
  *     bit-identical across engines and partitionings.
  *
  * Scale shape: encode is map-only (no shuffle, codegen'd Column chain);
  * ADC top-k is one scan of the codes relation against a broadcast query
  * set + a WindowGroupLimit heap; the two-stage re-rank collects the
  * ≤ |Q|·rf·k candidate ids (tiny by construction) and pushes them into
  * the raw-table scan as an `isin` filter — parquet row-group pruning,
  * never a full-precision scan at query time.
  */
object Quantize {

  /** per-dimension affine params; lo(d) = min, step(d) = (max−min)/255
    * (0 when the dimension is constant — every code 0, dequantized to lo) */
  final case class SqParams(lo: Array[Double], step: Array[Double]) {
    def dim: Int = lo.length
  }

  /** ONE aggregate pass: global per-dimension (min, max). */
  def sqTrain(emb: DataFrame, dim: Int): SqParams = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val aggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(v, d + 1)).as(s"lo$d"), max(element_at(v, d + 1)).as(s"hi$d"))
    }
    val row = emb.agg(aggs.head, aggs.tail: _*).head()
    val lo = Array.tabulate(dim)(d => row.getDouble(2 * d))
    val hi = Array.tabulate(dim)(d => row.getDouble(2 * d + 1))
    SqParams(lo, Array.tabulate(dim)(d => if (hi(d) > lo(d)) (hi(d) - lo(d)) / 255.0 else 0.0))
  }

  private def litArr(xs: Array[Double]): Column = array(xs.map(lit): _*)

  /** 0..255 code for one dimension (double in, long out, clamped) */
  private def codeCol(x: Column, lo: Column, step: Column): Column =
    when(step === 0.0, lit(0L)).otherwise(
      least(greatest(round((x - lo) / step), lit(0.0)), lit(255.0)).cast("long"))

  /** encode: (vec_id, codes array<tinyint>) — the stored SQ8 relation.
    * Map-only (asserted in QuantizeSpec): no shuffle enters the plan. */
  def sqEncode(emb: DataFrame, p: SqParams): DataFrame = {
    val lo = litArr(p.lo); val step = litArr(p.step)
    val v = transform(col("embedding"), x => x.cast("double"))
    val codes = transform(v, (x, d) =>
      codeCol(x, element_at(lo, d + 1), element_at(step, d + 1)))
    emb.select(col("vec_id"),
      transform(codes, c => (c - 128L).cast("byte")).as("codes"))
  }

  /** dequantized double vector from the tinyint codes */
  def dequantize(codes: Column, p: SqParams): Column = {
    val lo = litArr(p.lo); val step = litArr(p.step)
    transform(codes, (c, d) =>
      element_at(lo, d + 1) +
        (c.cast("long") + 128L).cast("double") * element_at(step, d + 1))
  }

  /** ADC top-k over the codes relation: raw double queries
    * (query_id, qv: array<double>) against dequantized codes. Same output
    * schema as [[Ann.bruteForceTopK]]. */
  def sqTopK(codes: DataFrame, queries: DataFrame, p: SqParams, k: Int): DataFrame = {
    val e = codes.select(col("vec_id"), dequantize(col("codes"), p).as("v"))
      .withColumn("nrm", Dedup.normCol(col("v")))
    val scored = e.join(broadcast(queries.withColumn("qnrm", Dedup.normCol(col("qv")))))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosinePre(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  /** Persist the SQ8 artifact beside a committed index snapshot: the codes
    * relation plus a 1-row params relation, both manifest-lineaged aux
    * artifacts ([[graft.index.IndexWriter.writeAux]]) — decommitted by any
    * postings mutation like every derived artifact, so a cold reader can
    * never score against params or codes trained on a different corpus
    * version. Returns the trained params (idempotent: a committed artifact
    * is not rewritten; training is deterministic, so re-derived params
    * equal the committed ones). */
  def persist(emb: DataFrame, dim: Int, tableDir: String): SqParams = {
    val p = sqTrain(emb, dim)
    graft.index.IndexWriter.writeAux(sqEncode(emb, p), tableDir, "sq8_codes")
    val spark = emb.sparkSession
    import spark.implicits._
    graft.index.IndexWriter.writeAux(
      Seq((p.lo.toSeq, p.step.toSeq)).toDF("lo", "step"), tableDir, "sq8_params")
    p
  }

  /** cold-read the persisted affine params (fails fast when decommitted) */
  def readParams(spark: org.apache.spark.sql.SparkSession, tableDir: String): SqParams = {
    val r = graft.index.IndexWriter.readAux(spark, tableDir, "sq8_params").head()
    SqParams(r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray)
  }

  /** cold-read the persisted codes relation */
  def readCodes(spark: org.apache.spark.sql.SparkSession, tableDir: String): DataFrame =
    graft.index.IndexWriter.readAux(spark, tableDir, "sq8_codes")

  /** Two-stage search: SQ8 ADC scan selects `rf·k` candidates per query,
    * the raw embedding table rescores ONLY those candidates with exact
    * cosine, top-k of the rescored set. Exact whenever the true top-k
    * survive stage 1 (recall measured in QuantizeSpec). The candidate id
    * list (≤ |Q|·rf·k — driver-bounded by construction, the MLT pattern)
    * is pushed into the full-precision scan as an `isin` filter, so the
    * raw table serves row-group-pruned point-reads, never a scan. */
  def sqRerankTopK(emb: DataFrame, codes: DataFrame, queries: DataFrame,
                   p: SqParams, k: Int, rf: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cand = sqTopK(codes, queries, p, k * rf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = cand.map(_._2).distinct.toSeq
    val candDf = cand.toSeq.toDF("query_id", "vec_id")
    val e = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", Dedup.normCol(col("v")))
    val scored = e.join(broadcast(candDf), "vec_id")
      .join(broadcast(queries.withColumn("qnrm", Dedup.normCol(col("qv")))), "query_id")
      .select(col("query_id"), col("vec_id"),
        Dedup.cosinePre(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }
}
