package graft

import graft.index.PostingCodec
import graft.index.PostingCodec.Posting
import graft.query.Bm25
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Posting-codec properties (FIXTURES.md §4): roundtrip, skip-block
  * integrity, block-max correctness, order-preserving concat. */
class CodecSpec extends AnyFunSuite with PropHelper {

  val avgDl = 57.3
  def norm(tf: Int, dl: Int): Double = Bm25.tfNormS(tf, dl, avgDl)

  val postingsGen: Gen[IndexedSeq[Posting]] = for {
    n <- Gen.choose(0, 700)
    gaps <- Gen.listOfN(n, Gen.choose(1L, 1000L))
    tfs <- Gen.listOfN(n, Gen.choose(1, 500))
    dls <- Gen.listOfN(n, Gen.choose(1, 2000))
    start <- Gen.choose(0L, 1L << 40)
  } yield {
    val ids = gaps.scanLeft(start)(_ + _).tail
    ids.lazyZip(tfs).lazyZip(dls).map(Posting.apply).toIndexedSeq
  }

  test("roundtrip: decode(encode(x)) == x") {
    forAllG(postingsGen) { ps =>
      val bytes = PostingCodec.encode(ps, norm)
      assert(new PostingCodec.Decoded(bytes).decodeAll() == ps)
    }
  }

  test("block-max metadata is the exact max tfNorm of each block") {
    forAllG(postingsGen) { ps =>
      if (ps.nonEmpty) {
        val d = new PostingCodec.Decoded(PostingCodec.encode(ps, norm))
        ps.grouped(PostingCodec.blockSize).zipWithIndex.foreach { case (block, i) =>
          val expected = block.map(p => norm(p.tf, p.dl).toFloat).max
          assert(d.headers(i).maxTfNorm == expected)
        }
      }
    }
  }

  test("cursor skipTo agrees with linear scan") {
    val g = for { ps <- postingsGen; ts <- Gen.listOf(Gen.choose(0L, 1L << 41)) } yield (ps, ts)
    forAllG(g) { case (ps, targets0) =>
      if (ps.nonEmpty) {
        val d = new PostingCodec.Decoded(PostingCodec.encode(ps, norm))
        val c = new PostingCodec.Cursor(d)
        targets0.sorted.foreach { t =>
          c.skipTo(t)
          ps.find(_.docId >= t) match {
            case None => assert(c.exhausted)
            case Some(p) =>
              assert(!c.exhausted, s"cursor exhausted early at target $t")
              assert(c.docId == p.docId && c.tf == p.tf && c.dl == p.dl)
          }
        }
      }
    }
  }

  test("concat of ascending parts decodes to the concatenated postings, skip intact") {
    val partsGen = for {
      nParts <- Gen.choose(1, 5)
      parts <- Gen.listOfN(nParts, postingsGen)
    } yield parts
    forAllG(partsGen) { rawParts =>
      var base = 0L
      val parts = rawParts.map { p =>
        val shifted = p.map(x => x.copy(docId = x.docId + base))
        if (shifted.nonEmpty) base = shifted.last.docId + 1
        shifted
      }
      val whole = parts.flatten.toIndexedSeq
      val merged = PostingCodec.concat(parts.map(PostingCodec.encode(_, norm)))
      val md = new PostingCodec.Decoded(merged)
      assert(md.decodeAll() == whole)
      if (whole.nonEmpty) {
        val c = new PostingCodec.Cursor(md)
        val mid = whole(whole.length / 2).docId
        c.skipTo(mid)
        assert(!c.exhausted && c.docId == mid)
      }
    }
  }

  test("empty list encodes and decodes") {
    val bytes = PostingCodec.encode(Vector.empty, norm)
    val d = new PostingCodec.Decoded(bytes)
    assert(d.numDocs == 0 && d.decodeAll().isEmpty)
    assert(new PostingCodec.Cursor(d).exhausted)
  }

  test("compression: delta+varint beats fixed-width rows on dense lists") {
    val dense = (0 until 10000).map(i => Posting(i.toLong * 3, 1 + i % 4, 60)).toIndexedSeq
    val bytes = PostingCodec.encode(dense, norm)
    assert(bytes.length < dense.length * 4) // ~3 bytes/posting vs 16+ naive
  }
}
