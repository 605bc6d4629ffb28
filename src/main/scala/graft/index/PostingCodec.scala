package graft.index

import java.nio.ByteBuffer

/** Compressed posting-list codec — the north star's "docID-delta + varint
  * compressed, with skip blocks and block-max metadata" binary format,
  * replacing the reference's exploded MySQL `index` rows (/root/reference/
  * src/main/java/searchengine/model/Index.java:17-35) with a BinaryType
  * column.
  *
  * Postings are self-contained for scoring: each carries (docId, tf, dl)
  * so BM25 needs no docStats join at query time (impact-ordered-index
  * style payload, cf. block-max WAND literature).
  *
  * Layout (all varints unless noted):
  *   numDocs
  *   numBlocks
  *   block headers × numBlocks:              <- the skip list
  *     lastDocId (delta from prev block's lastDocId)
  *     count      (explicit: concat produces mid-list partial blocks)
  *     bodyBytes  (lets skipTo jump whole bodies)
  *     blockMaxTfNorm: float32 (4 raw bytes) <- block-max BM25 tf-component
  *   block bodies × numBlocks:
  *     docId deltas × n, then tfs × n, then dls × n
  *
  * blockMaxTfNorm = max over docs in the block of
  *   tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
  * so a term's score upper bound for a block is idf(df)·blockMaxTfNorm —
  * WAND prunes when the Σ of upper bounds can't beat the current θ
  * (graft.query.Wand).
  */
object PostingCodec {
  val blockSize = 128

  case class Posting(docId: Long, tf: Int, dl: Int)

  // --- varint ------------------------------------------------------------
  def writeVarLong(buf: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"varint requires non-negative, got $v0")
    var v = v0
    while ((v & ~0x7FL) != 0L) { buf.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    buf.write(v.toInt)
  }
  final class Reader(val bytes: Array[Byte], var pos: Int) {
    def readVarLong(): Long = {
      var shift = 0; var result = 0L; var b = 0
      do {
        b = bytes(pos) & 0xFF; pos += 1
        result |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    def readFloat(): Float = {
      val f = ByteBuffer.wrap(bytes, pos, 4).getFloat; pos += 4; f
    }
  }

  /** Encode a docId-ascending posting list. `tfNorm(tf, dl)` supplies the
    * BM25 tf-component for block-max metadata. Input MUST be sorted by
    * docId strictly ascending. */
  def encode(postings: IndexedSeq[Posting], tfNorm: (Int, Int) => Double): Array[Byte] = {
    val n = postings.length
    val nBlocks = (n + blockSize - 1) / blockSize
    val headers = new java.io.ByteArrayOutputStream()
    val bodies = new java.io.ByteArrayOutputStream()
    writeVarLong(headers, n.toLong)
    writeVarLong(headers, nBlocks.toLong)
    var prevBlockLast = 0L
    var i = 0
    while (i < nBlocks) {
      val start = i * blockSize
      val end = math.min(start + blockSize, n)
      val body = new java.io.ByteArrayOutputStream()
      var prev = prevBlockLast
      var maxNorm = 0.0
      var j = start
      while (j < end) {
        val p = postings(j)
        require(j == 0 || p.docId > postings(j - 1).docId,
          s"docIds must be strictly ascending at index $j")
        writeVarLong(body, p.docId - prev)
        prev = p.docId
        val norm = tfNorm(p.tf, p.dl)
        if (norm > maxNorm) maxNorm = norm
        j += 1
      }
      j = start
      while (j < end) { writeVarLong(body, postings(j).tf.toLong); j += 1 }
      j = start
      while (j < end) { writeVarLong(body, postings(j).dl.toLong); j += 1 }
      val last = postings(end - 1).docId
      writeVarLong(headers, last - prevBlockLast)
      writeVarLong(headers, (end - start).toLong)
      writeVarLong(headers, body.size().toLong)
      val fb = ByteBuffer.allocate(4).putFloat(maxNorm.toFloat).array()
      headers.write(fb, 0, 4)
      prevBlockLast = last
      body.writeTo(bodies)
      i += 1
    }
    headers.write(bodies.toByteArray)
    headers.toByteArray
  }

  case class BlockHeader(lastDocId: Long, bodyOffset: Int, bodyBytes: Int, maxTfNorm: Float, count: Int)

  final class Decoded(val bytes: Array[Byte]) {
    private val r = new Reader(bytes, 0)
    val numDocs: Int = r.readVarLong().toInt
    val numBlocks: Int = r.readVarLong().toInt
    val headers: Array[BlockHeader] = {
      val hs = new Array[BlockHeader](numBlocks)
      var prevLast = 0L
      var off = 0
      var i = 0
      while (i < numBlocks) {
        val last = prevLast + r.readVarLong()
        val cnt = r.readVarLong().toInt
        val len = r.readVarLong().toInt
        val mx = r.readFloat()
        hs(i) = BlockHeader(last, off, len, mx, cnt)
        prevLast = last; off += len; i += 1
      }
      val base = r.pos // bodies start here; rebase offsets to absolute
      var k = 0
      while (k < numBlocks) { hs(k) = hs(k).copy(bodyOffset = hs(k).bodyOffset + base); k += 1 }
      hs
    }
    /** term-level upper bound for WAND */
    def maxTfNorm: Float = if (numBlocks == 0) 0f else headers.map(_.maxTfNorm).max

    def decodeBlock(i: Int, prevLast: Long): (Array[Long], Array[Int], Array[Int]) = {
      val h = headers(i)
      val br = new Reader(bytes, h.bodyOffset)
      val ids = new Array[Long](h.count)
      val tfs = new Array[Int](h.count)
      val dls = new Array[Int](h.count)
      var prev = prevLast
      var j = 0
      while (j < h.count) { prev += br.readVarLong(); ids(j) = prev; j += 1 }
      j = 0
      while (j < h.count) { tfs(j) = br.readVarLong().toInt; j += 1 }
      j = 0
      while (j < h.count) { dls(j) = br.readVarLong().toInt; j += 1 }
      (ids, tfs, dls)
    }
    def decodeAll(): IndexedSeq[Posting] = {
      val out = IndexedSeq.newBuilder[Posting]
      var prevLast = 0L
      var i = 0
      while (i < numBlocks) {
        val (ids, tfs, dls) = decodeBlock(i, prevLast)
        var j = 0
        while (j < ids.length) { out += Posting(ids(j), tfs(j), dls(j)); j += 1 }
        prevLast = headers(i).lastDocId
        i += 1
      }
      out.result()
    }
  }

  /** Streaming cursor with block-skip support — drives WAND. */
  final class Cursor(d: Decoded) {
    private var block = -1
    private var ids: Array[Long] = Array.emptyLongArray
    private var tfs: Array[Int] = Array.emptyIntArray
    private var dls: Array[Int] = Array.emptyIntArray
    private var idx = 0
    private var done = d.numBlocks == 0
    private def loadBlock(i: Int): Unit = {
      val prevLast = if (i == 0) 0L else d.headers(i - 1).lastDocId
      val t = d.decodeBlock(i, prevLast)
      ids = t._1; tfs = t._2; dls = t._3; block = i; idx = 0
    }
    if (!done) loadBlock(0)
    def exhausted: Boolean = done
    def docId: Long = ids(idx)
    def tf: Int = tfs(idx)
    def dl: Int = dls(idx)
    def blockMaxTfNorm: Float = d.headers(block).maxTfNorm
    def next(): Unit = {
      idx += 1
      if (idx >= ids.length) {
        if (block + 1 < d.numBlocks) loadBlock(block + 1) else done = true
      }
    }
    /** advance to the first posting with docId >= target; skips whole block
      * bodies via the header skip list (never decodes skipped blocks). */
    def skipTo(target: Long): Unit = {
      if (done) return
      if (d.headers(block).lastDocId < target) {
        var b = block + 1
        while (b < d.numBlocks && d.headers(b).lastDocId < target) b += 1
        if (b >= d.numBlocks) { done = true; return }
        loadBlock(b)
      }
      while (idx < ids.length && ids(idx) < target) idx += 1
    }
  }

  /** Concatenate encoded lists whose docId ranges are ascending in `parts`
    * order (shard order) into one list WITHOUT decoding bodies: headers are
    * re-based and each part's first block delta is rewritten; everything
    * else is a straight byte copy. This is the cheap merge that makes the
    * salted two-phase shard merge scale (IndexWriter). */
  def concat(parts: Seq[Array[Byte]]): Array[Byte] = {
    val decs = parts.map(new Decoded(_)).filter(_.numDocs > 0)
    if (decs.isEmpty) return encode(Vector.empty, (_, _) => 0.0)
    val headers = new java.io.ByteArrayOutputStream()
    val bodies = new java.io.ByteArrayOutputStream()
    writeVarLong(headers, decs.map(_.numDocs.toLong).sum)
    writeVarLong(headers, decs.map(_.numBlocks.toLong).sum)
    var prevLast = 0L
    decs.foreach { d =>
      var partPrev = 0L
      var i = 0
      while (i < d.numBlocks) {
        val h = d.headers(i)
        val br = new Reader(d.bytes, h.bodyOffset)
        val firstDelta = br.readVarLong()
        val firstDocId = partPrev + firstDelta
        require(firstDocId > prevLast || (prevLast == 0L && firstDocId >= 0L),
          "concat parts must have ascending docId ranges")
        val rebased = new java.io.ByteArrayOutputStream()
        writeVarLong(rebased, firstDocId - prevLast)
        rebased.write(d.bytes, br.pos, h.bodyOffset + h.bodyBytes - br.pos)
        writeVarLong(headers, h.lastDocId - prevLast)
        writeVarLong(headers, h.count.toLong)
        writeVarLong(headers, rebased.size().toLong)
        val fb = ByteBuffer.allocate(4).putFloat(h.maxTfNorm).array()
        headers.write(fb, 0, 4)
        rebased.writeTo(bodies)
        prevLast = h.lastDocId
        partPrev = h.lastDocId
        i += 1
      }
    }
    headers.write(bodies.toByteArray)
    headers.toByteArray
  }
}
