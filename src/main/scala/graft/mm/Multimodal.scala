package graft.mm

import graft.corpus.Corpus
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video are opaque `binary`
  * columns with typed metadata. The Spark-side contract — schema,
  * partitioning, batch shape of the decode stage — is real and tested; the
  * actual media decode is STUBBED with a deterministic fake (this container
  * has no image/audio libraries), clearly marked below.
  *
  * Scale shape: decode/feature-extract runs as `mapPartitions` over the
  * binary column so a real decoder amortizes model/codec init per
  * PARTITION (the same reason PySpark uses mapInPandas batches), and the
  * media table is repartitioned by byte-size bins first so one partition
  * doesn't get all the 4K videos.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String, bytes: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  /** synthesize a deterministic media table from the documents corpus:
    * content bytes stand in for encoded media; metadata derives from
    * doc_id. (No external data — FIXTURES.md rule.) */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("bytes"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))
      .as[MediaRow]
  }

  /** STUB — deterministic fake decode. A real deployment replaces ONLY this
    * function body (e.g. JNI image decode / JCodec frame grab); everything
    * around it — batching, schema, partitioning — is production-shaped. */
  def decodeStub(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val acc = new Array[Float](dims)
    var i = 0
    while (i < bytes.length) {
      acc(i % dims) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** per-partition feature extraction over the binary column. Size-binned
    * repartition first: key = (log2-size bin, salt), so decode batches hold
    * similar-sized blobs (uniform batch memory for a real codec) while the
    * salt spreads each bin across the WHOLE cluster — parallelism scales
    * with the cluster, never capped by a modulus, and one bin of 4K videos
    * can't pile onto one executor. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 8,
                      numPartitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val nPart = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    media
      .repartition(nPart,
        floor(log2(greatest(length(col("bytes")), lit(1)).cast("double"))).as("size_bin"),
        pmod(col("media_id"), lit(nPart)).as("salt"))
      .mapPartitions { rows =>
        // per-partition init happens HERE in a real decoder (codec/model load)
        rows.map { r =>
          val feat = decodeStub(r.bytes, dims)
          val checksum = r.bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xFF)) % 2147483647L)
          MediaFeatures(r.media_id, r.modality, r.bytes.length.toLong, checksum, feat)
        }
      }
  }

  /** deterministic frame-sampling stub: every `stride`-th byte window
    * stands in for a frame; shape (media_id, frame_no, frame_bytes). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 64, frameLen: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      // floor semantics matching the DuckDB twin's `//`: a blob shorter than
      // frameLen yields ZERO frames (no short tail frame). Java integer
      // division truncates toward zero, so (len-frameLen)/stride would be 0
      // (not negative) for len < frameLen and the old max(0,..)+1 emitted a
      // spurious 1-frame result — guard explicitly instead.
      val n = if (r.bytes.length < frameLen) 0 else (r.bytes.length - frameLen) / stride + 1
      (0 until n).map(f => (r.media_id, f, r.bytes.slice(f * stride, f * stride + frameLen)))
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Aspect-fit resize PLAN (integer-exact target dims): the geometry a
    * preprocessing pipeline must agree on before any pixels move — the
    * pixel resample itself is the decode stub's job in this container. A
    * landscape image pins width to `target`, portrait pins height; the
    * other dim scales by integer division (floor), the convention ML
    * loaders (torchvision Resize with a single int) use. */
  def resizePlan(media: Dataset[MediaRow], target: Int = 224): DataFrame =
    media.toDF().filter(col("modality") === "image")
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        when(col("width") >= col("height"), lit(target.toLong))
          .otherwise(expr(s"CAST(width AS BIGINT) * $target div height")).as("out_w"),
        when(col("width") >= col("height"),
            expr(s"CAST(height AS BIGINT) * $target div width"))
          .otherwise(lit(target.toLong)).as("out_h"))

  /** metadata projection — pure Column ops on the binary column (this part
    * needs no stub and is DuckDB-oracle-checkable). */
  def meta(media: Dataset[MediaRow]): DataFrame =
    media.toDF().select(
      col("media_id"), col("modality"),
      length(col("bytes")).cast("long").as("n_bytes"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"),
      col("sample_rate").cast("long").as("sample_rate"))
}
