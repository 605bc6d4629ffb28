package graft

import graft.mm.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("media table schema and deterministic metadata") {
    val m = Multimodal.mediaFromDocuments(spark, sfDir)
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "bytes", "width", "height", "sample_rate"))
    val rows = m.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val expected = (r.media_id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(r.modality == expected)
      assert(r.bytes.nonEmpty)
      assert(r.sample_rate == (if (r.media_id % 3 == 1) 16000 else 0))
    }
    // byte content round-trips the document text (opaque binary plumbing)
    val doc0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .collect().head.getAs[String]("text")
    assert(new String(rows.find(_.media_id == 0L).get.bytes, "UTF-8") == doc0)
  }

  test("feature extraction: mapPartitions batch shape, deterministic stub output") {
    val m = Multimodal.mediaFromDocuments(spark, sfDir)
    val f1 = Multimodal.extractFeatures(m).collect().map(r => r.media_id -> r).toMap
    val f2 = Multimodal.extractFeatures(m).collect().map(r => r.media_id -> r).toMap
    assert(f1.keySet == f2.keySet && f1.keySet.size == 500)
    f1.foreach { case (id, r) =>
      assert(r.feature.length == 8)
      assert(r.checksum == f2(id).checksum)
      assert(r.feature.toSeq == f2(id).feature.toSeq)
      assert(r.n_bytes > 0)
    }
    // stub decode agrees with its scalar definition
    val bytes = "abc".getBytes("UTF-8")
    val feat = Multimodal.decodeStub(bytes, 8)
    assert(feat(0) == 97 / 255.0f && feat(1) == 98 / 255.0f && feat(2) == 99 / 255.0f)
  }

  test("feature extraction parallelism scales with the cluster (no % 16 cap)") {
    val m = Multimodal.mediaFromDocuments(spark, sfDir)
    // at parallelism 32 the (size-bin, salt) key must actually occupy more
    // than 16 partitions — the old media_id % 16 key could not
    val feats = Multimodal.extractFeatures(m, numPartitions = 32)
    assert(feats.rdd.getNumPartitions == 32)
    val nonEmpty = feats.rdd.mapPartitions(it => Iterator(if (it.hasNext) 1 else 0)).sum()
    assert(nonEmpty > 16, s"only $nonEmpty non-empty partitions")
  }

  test("frame sampling: only video rows, deterministic frame count and content") {
    val m = Multimodal.mediaFromDocuments(spark, sfDir)
    val frames = Multimodal.sampleFrames(m, stride = 64, frameLen = 16).collect()
    val vids = m.collect().filter(_.modality == "video")
    val expect = vids.map(v => v.media_id ->
      (if (v.bytes.length < 16) 0 else (v.bytes.length - 16) / 64 + 1)).toMap
    val got = frames.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(got == expect.filter(_._2 > 0))
    // frame 0 is the first 16 bytes
    val v0 = vids.minBy(_.media_id)
    val f0 = frames.filter(r => r.getLong(0) == v0.media_id && r.getInt(1) == 0).head
    assert(f0.getAs[Array[Byte]](2).toSeq == v0.bytes.take(16).toSeq)
  }

  test("sampleFrames floor semantics: blob shorter than frameLen yields ZERO frames") {
    import spark.implicits._
    // matches the DuckDB twin's floor division: no spurious short tail frame
    val rows = Seq(
      Multimodal.MediaRow(7L, "video", Array.fill[Byte](10)(1), 1, 1, 0),  // < frameLen
      Multimodal.MediaRow(8L, "video", Array.fill[Byte](16)(1), 1, 1, 0)   // exactly one
    ).toDS()
    val got = Multimodal.sampleFrames(rows, stride = 64, frameLen = 16).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(got == Map(8L -> 1))
  }

  test("resizePlan: aspect-fit integer geometry, landscape and portrait") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](1), 640, 480, 0),  // landscape
      Multimodal.MediaRow(2L, "image", Array[Byte](1), 100, 400, 0),  // portrait
      Multimodal.MediaRow(3L, "video", Array[Byte](1), 640, 480, 0)   // filtered out
    ).toDS()
    val got = Multimodal.resizePlan(rows, target = 224).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(1L -> ((224L, 480L * 224L / 640L)),
                      2L -> ((100L * 224L / 400L, 224L))))
  }

  test("sampleFrames hash projection replays a scalar byte-window walk") {
    import spark.implicits._
    import graft.textan.TextHash
    val text = ("abcdefgh" * 20) // 160 ASCII bytes -> frames at 0,64,128
    val rows = Seq(Multimodal.MediaRow(5L, "video",
      text.getBytes("UTF-8"), 16, 16, 0)).toDS()
    val got = Multimodal.sampleFrames(rows, stride = 64, frameLen = 16)
      .select(org.apache.spark.sql.functions.col("media_id"),
        org.apache.spark.sql.functions.col("frame_no"),
        TextHash.tokenHashCol(org.apache.spark.sql.functions.decode(
          org.apache.spark.sql.functions.col("frame_bytes"), "UTF-8")).as("h"))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val want = (0 until 3).map(f =>
      f -> TextHash.tokenHash(text.substring(f * 64, f * 64 + 16))).toMap
    assert(got == want)
  }
}
