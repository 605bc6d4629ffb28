package graft

import graft.ann.{Ann, Quantize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization: storage schema + reconstruction-error bound,
  * recall of the quantized scan vs exact, two-stage re-rank exactness of
  * stage-2 scores, and the map-only / pushed-filter plan contracts. */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val params = Quantize.sqTrain(emb, 64)
  lazy val codes = Quantize.sqEncode(emb, params)

  test("codes are array<tinyint> and dequantization error <= step/2 per dim") {
    assert(codes.schema("codes").dataType == ArrayType(ByteType, containsNull = false)
      || codes.schema("codes").dataType.isInstanceOf[ArrayType])
    assert(codes.schema("codes").dataType.asInstanceOf[ArrayType].elementType == ByteType,
      "storage codes must be 1-byte elements")
    val raw = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val deq = codes.select(col("vec_id"), Quantize.dequantize(col("codes"), params).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(deq.length == raw.size)
    deq.foreach { case (id, xh) =>
      val x = raw(id)
      (0 until 64).foreach { d =>
        val bound = params.step(d) / 2.0 + 1e-9
        assert(math.abs(x(d) - xh(d)) <= bound,
          s"vec $id dim $d: |${x(d)} - ${xh(d)}| > $bound")
      }
    }
  }

  test("constant dimension quantizes to code 0 and dequantizes to lo") {
    import spark.implicits._
    val one = Seq((0L, Seq(1.5f, 2.0f)), (1L, Seq(1.5f, 3.0f)))
      .toDF("vec_id", "embedding")
    val p = Quantize.sqTrain(one, 2)
    assert(p.step(0) == 0.0 && p.step(1) > 0.0)
    val d = Quantize.sqEncode(one, p)
      .select(col("vec_id"), Quantize.dequantize(col("codes"), p).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(d(0L)(0) == 1.5 && d(1L)(0) == 1.5)
  }

  test("quantized top-k recall vs exact >= 0.8 on the fixture; self still rank 1") {
    val q = Ann.fixedQueries(spark, emb, 5)
    val exact = Ann.bruteForceTopK(emb, q, 5)
    val sq = Quantize.sqTopK(codes, q, params, 5)
    val rec = Ann.recallAtK(exact, sq, 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rec.size == 5)
    rec.foreach { case (qid, r) => assert(r >= 0.8, s"query $qid recall $r") }
    // a query against its own quantized vector still wins rank 1
    sq.filter(col("rank") === 1).collect()
      .foreach(r => assert(r.getLong(2) == r.getLong(0), s"rank-1 not self: $r"))
  }

  test("two-stage rerank: stage-2 scores are the EXACT cosines for those pairs") {
    val q = Ann.fixedQueries(spark, emb, 5)
    val rr = Quantize.sqRerankTopK(emb, codes, q, params, k = 5, rf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exact = Ann.bruteForceTopK(emb, q, 500)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rr.foreach { case (k2, c) =>
      assert(math.abs(exact(k2) - c) < 1e-12, s"$k2: rerank $c vs exact ${exact(k2)}")
    }
  }

  test("persisted codes+params round-trip: cold read serves identical top-k, schema kept") {
    import graft.index.{IndexWriter, InvertedIndex}
    import graft.corpus.Corpus
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val t = InvertedIndex.build(corpus)
    IndexWriter.write(
      IndexWriter.shardPostings(t.postings, t.docStats, t.avgDl), dir, snapshotId = 1L)
    val pw = Quantize.persist(emb, 64, dir)
    assert(pw.lo.sameElements(params.lo) && pw.step.sameElements(params.step))
    val pr = Quantize.readParams(spark, dir)
    assert(pr.lo.sameElements(params.lo) && pr.step.sameElements(params.step))
    val cold = Quantize.readCodes(spark, dir)
    assert(cold.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.ByteType, "tinyint codes must survive parquet")
    val q = Ann.fixedQueries(spark, emb, 5)
    val hot = Quantize.sqTopK(codes, q, params, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaCold = Quantize.sqTopK(cold, q, pr, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaCold == hot)
  }

  test("plan contracts: encode is map-only; rerank pushes the candidate isin") {
    val encPlan = codes.queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), s"sqEncode must not shuffle:\n$encPlan")
    val q = Ann.fixedQueries(spark, emb, 5)
    val rr = Quantize.sqRerankTopK(emb, codes, q, params, k = 5, rf = 3)
    val plan = rr.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(vec_id"),
      s"expected pushed isin on the raw-table scan in:\n$plan")
  }
}
