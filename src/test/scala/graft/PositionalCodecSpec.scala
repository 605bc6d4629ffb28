package graft

import graft.index.{Positional, PositionalCodec}
import org.scalatest.funsuite.AnyFunSuite

class PositionalCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("encode: byte-exact layout on a crafted list") {
    val blob = PositionalCodec.encode(IndexedSeq(
      (5L, Array(0L, 3L, 7L)), (9L, Array(2L))))
    // n=2 | Δdoc=5, np=3, Δpos=1,3,4 | Δdoc=4, np=1, Δpos=3
    assert(blob.toSeq == Seq[Byte](2, 5, 3, 1, 3, 4, 4, 1, 3))
  }

  test("round-trip: multi-byte varints, varying list lengths, many docs") {
    val data = (0 until 200).map { i =>
      val doc = i.toLong * 1000L + 7L
      val ps = (0 until (i % 5)).scanLeft(i.toLong * 3L) { (p, j) => p + 1L + j * 130L }
      (doc, ps.toArray)
    }.toIndexedSeq
    assert(PositionalCodec.decode(PositionalCodec.encode(data)).map {
      case (d, ps) => (d, ps.toSeq) } == data.map { case (d, ps) => (d, ps.toSeq) })
    // compression sanity: positions cost ~1–2 bytes, not 8
    val totalPositions = data.map(_._2.length).sum + data.length * 2
    assert(PositionalCodec.encode(data).length < totalPositions * 4)
  }

  test("buildBlobs + readPositions ≡ original tokenPositions for the read terms") {
    import spark.implicits._
    val docs = Seq(
      (0L, "r", "en", "alpha beta alpha gamma"),
      (1L, "r", "en", "beta beta alpha"),
      (2L, "r", "en", "gamma delta"))
      .toDF("doc_id", "repo", "lang", "content")
    val tp = Positional.tokenPositions(docs)
    val blobs = PositionalCodec.buildBlobs(Positional.positionalPostings(docs))
    val got = PositionalCodec.readPositions(blobs, Seq("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = tp.filter($"term".isin("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }
}
