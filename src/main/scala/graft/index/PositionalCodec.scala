package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Compressed POSITIONAL posting lists — the phrase-query counterpart of
  * [[PostingCodec]]: per term one blob holding, for each doc (docId
  * ascending), the sorted in-doc token positions, everything
  * delta-gap + varint coded (positions compress brutally well: within a
  * doc the gaps are small, so a position costs ~1 byte where the raw
  * representation costs 8 — the standard positional-index layout, cf.
  * Manning IIR §2.4.2 / Lucene's .prx shape).
  *
  * Layout (all varints, reusing [[PostingCodec.writeVarLong]]):
  *   numDocs
  *   per doc: docIdDelta (from previous docId),
  *            numPositions,
  *            position deltas (first = pos₀ + 1 so every varint is ≥ 1,
  *            then pᵢ − pᵢ₋₁)
  *
  * Scale + integration notes: [[buildBlobs]] groups the positional
  * postings BY TERM — the same one-blob-per-term shape as
  * IndexWriter's phase-2 concat merge, and it carries the same SCALE
  * CAUTION (a Zipf-head term's full list lands in one task; the
  * production path shards blobs by the bucketed doc-id range exactly like
  * the tf index, then [[PostingCodec.concat]]-style concatenation applies
  * because deltas reset per shard boundary only at the first doc). The
  * QUERY path decodes |q| blobs — two for a 2-word phrase — never the
  * corpus: decode → explode to (doc_id, term, pos) → the existing
  * relational phrase intersection ([[Positional.phraseMatches]]), so the
  * round-trip is gated by the SAME DuckDB oracle as the uncompressed
  * phrase query (shared-oracle equivalence: hash equality proves
  * encode ∘ decode = id on every position the query touches). */
object PositionalCodec {

  /** encode one term's postings: (docId, sorted positions) in docId order */
  def encode(postings: IndexedSeq[(Long, Array[Long])]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    PostingCodec.writeVarLong(buf, postings.length.toLong)
    var prevDoc = 0L
    postings.foreach { case (docId, ps) =>
      require(docId >= prevDoc, "postings must be docId-ascending")
      PostingCodec.writeVarLong(buf, docId - prevDoc)
      prevDoc = docId
      PostingCodec.writeVarLong(buf, ps.length.toLong)
      var prevPos = -1L
      ps.foreach { p =>
        require(p > prevPos, "positions must be strictly ascending")
        PostingCodec.writeVarLong(buf, p - prevPos)
        prevPos = p
      }
    }
    buf.toByteArray
  }

  /** decode a blob back to (docId, positions) pairs, docId ascending */
  def decode(bytes: Array[Byte]): IndexedSeq[(Long, Array[Long])] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    def readVar(): Long = {
      var v = 0L; var shift = 0
      var b = in.get()
      while ((b & 0x80) != 0) { v |= (b & 0x7fL) << shift; shift += 7; b = in.get() }
      v | ((b & 0x7fL) << shift)
    }
    val n = readVar().toInt
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Array[Long])](n)
    var prevDoc = 0L
    var i = 0
    while (i < n) {
      val docId = prevDoc + readVar()
      prevDoc = docId
      val np = readVar().toInt
      val ps = new Array[Long](np)
      var prevPos = -1L
      var j = 0
      while (j < np) { prevPos += readVar(); ps(j) = prevPos; j += 1 }
      out += ((docId, ps))
      i += 1
    }
    out.toIndexedSeq
  }

  /** (term, blob) per term from the positional postings relation
    * (doc_id, term, tf, positions) — one shuffle on term, blobs built in
    * docId order inside each group. */
  def buildBlobs(positionalPostings: DataFrame): DataFrame = {
    val spark = positionalPostings.sparkSession
    import spark.implicits._
    positionalPostings
      .select(col("term"), col("doc_id"), col("positions"))
      .as[(String, Long, Seq[Long])]
      .groupByKey(_._1)
      .mapGroups { (term, rows) =>
        val sorted = rows.map { case (_, d, ps) => (d, ps.toArray) }
          .toIndexedSeq.sortBy(_._1)
        (term, encode(sorted))
      }
      .toDF("term", "blob")
  }

  /** decode the blobs of `terms` back to a (doc_id, term, pos) relation —
    * the query-side read: |q| blobs, never the corpus. */
  def readPositions(blobs: DataFrame, terms: Seq[String]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(col("term").isin(terms.map(x => x: Any): _*))
      .as[(String, Array[Byte])]
      .flatMap { case (term, blob) =>
        decode(blob).flatMap { case (docId, ps) => ps.map(p => (docId, term, p)) }
      }
      .toDF("doc_id", "term", "pos")
  }
}
