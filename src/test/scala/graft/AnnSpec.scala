package graft

import graft.ann.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force top-k: self is rank 1 with cos 1; ranks deterministic") {
    val got = Ann.bruteForceTopK(emb, Ann.fixedQueries(spark, emb, 3), 5).collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.foreach { case (q, rows) =>
      val r1 = rows.find(_.getInt(1) == 1).get
      assert(r1.getLong(2) == q, s"query $q rank-1 should be itself")
      assert(math.abs(r1.getDouble(3) - 1.0) < 1e-9)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      // scores non-increasing with rank
      val sorted = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("brute-force matches a scalar cosine computation") {
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = 0L
    val want = vecs.toSeq.map { case (id, v) => (id, cos(vecs(q), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    val got = Ann.bruteForceTopK(emb, Ann.fixedQueries(spark, emb, 1), 5)
      .filter(col("query_id") === q).orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    got.zip(want).foreach { case ((gi, gc), (wi, wc)) =>
      assert(gi == wi); assert(math.abs(gc - wc) < 1e-9)
    }
  }

  test("LSH bucket assignment is deterministic and balanced-ish") {
    val e = emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val b1 = e.withColumn("b", Ann.bucketCol(col("v"), 64, 8)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b2 = e.withColumn("b", Ann.bucketCol(col("v"), 64, 8)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(b1 == b2)
    val sizes = b1.values.groupBy(identity).map(_._2.size)
    assert(sizes.max < b1.size) // more than one bucket in use
  }

  test("LSH top-k recall vs brute force is reasonable; hits are a subset ranked identically") {
    val queries = Ann.fixedQueries(spark, emb, 5)
    // bits sized to the corpus: 16 buckets over 500 vecs (+1-bit multiprobe
    // => ~30% of the table scanned); production default 8 bits assumes many
    // more rows per bucket
    val brute = Ann.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Ann.lshTopK(emb, queries, dim = 64, k = 5, bits = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      val hit = lsh.getOrElse(q, Set.empty).intersect(brute(q)).size
      hit.toDouble / brute(q).size
    }
    val avgRecall = recalls.sum / recalls.size
    assert(avgRecall >= 0.4, s"avg recall $avgRecall too low for multiprobe LSH")
    // self vector always lands in its own bucket -> rank 1 everywhere
    Ann.lshTopK(emb, queries, dim = 64, k = 5, bits = 4)
      .filter(col("rank") === 1).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(2)))
  }

  test("IVF: deterministic centroids, bounded buckets, reasonable recall") {
    val c1 = Ann.ivfCentroids(emb, 8)
    val c2 = Ann.ivfCentroids(emb, 8)
    assert(c1.length == 8 && c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val queries = Ann.fixedQueries(spark, emb, 5)
    val brute = Ann.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Ann.ivfTopK(emb, queries, 5, nCentroids = 8, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size
    }
    assert(recalls.sum / recalls.size >= 0.5, s"IVF avg recall too low: ${recalls.sum / recalls.size}")
    // self always retrievable (its own bucket is the nearest centroid)
    Ann.ivfTopK(emb, queries, 5, 8, 3).collect()
      .filter(_.getInt(1) == 1).foreach(r => assert(r.getLong(0) == r.getLong(2)))
  }

  test("IVF centroid loop on a hash sample: deterministic across runs AND partitionings, recall holds") {
    // maxSample far below the table size forces the sampling path
    val c1 = Ann.ivfCentroids(emb, 4, maxSample = 100)
    val c2 = Ann.ivfCentroids(emb, 4, maxSample = 100)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "sampled centroids must be deterministic")
    // the hash-permille sample is value-addressed: identical at any layout
    val c3 = Ann.ivfCentroids(emb.repartition(7), 4, maxSample = 100)
    assert(c1.map(_.toSeq).toSeq == c3.map(_.toSeq).toSeq, "sample must be partition-layout-independent")
    // recall with sampled centroids stays reasonable (Lloyd's needs only
    // representative statistics; assignment is still full-table)
    val queries = Ann.fixedQueries(spark, emb, 5)
    val brute = Ann.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Ann.ivfTopK(emb, queries, 5, nCentroids = 4, nprobe = 2, maxSample = 100).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size
    }
    assert(recalls.sum / recalls.size >= 0.4, s"sampled-IVF recall too low: ${recalls.sum / recalls.size}")
  }

  test("deriveBits keeps expected bucket occupancy bounded as N grows") {
    // the fixed bits=8 default was the scale flaw: 256 buckets forever
    for ((n, target) <- Seq((500L, 4096L), (1000000L, 4096L), (10000000000L, 4096L),
                            (1000000L, 1024L), (123L, 1L))) {
      val bits = Ann.deriveBits(n, target)
      assert(bits >= 8 && bits <= 32)
      // 2^bits buckets keep expected occupancy <= target (until the 32-bit
      // cap, where 4e9 buckets is already beyond any broadcastable probe set)
      if (bits < 32) assert(n.toDouble / (1L << bits) <= target.toDouble,
        s"n=$n target=$target bits=$bits occupancy=${n.toDouble / (1L << bits)}")
    }
    assert(Ann.deriveBits(10L * 1000 * 1000 * 1000, 4096) > 8,
      "bucket count must grow with N")
  }

  test("recallAtK: exact-vs-itself is 1.0; exact-vs-LSH matches a scalar set intersection") {
    val q = Ann.fixedQueries(spark, emb, 3)
    val bf = Ann.bruteForceTopK(emb, q, 5)
    val self = Ann.recallAtK(bf, bf, 5).collect()
    assert(self.length == 3 && self.forall(r => r.getLong(1) == 5L && r.getDouble(2) == 1.0))
    val lsh = Ann.lshTopK(emb, q, dim = 64, k = 5, bits = 8)
    val got = Ann.recallAtK(bf, lsh, 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val bfSets = bf.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    val lshSets = lsh.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    bfSets.foreach { case (qid, s) =>
      val hits = s.intersect(lshSets.getOrElse(qid, Set.empty)).size.toLong
      assert(got(qid) == ((hits, hits / 5.0)), s"query $qid")
    }
  }

  test("filteredTopK: exact top-k of the SAME-LABEL subset; != post-filtered unfiltered top-k") {
    import org.apache.spark.sql.functions._
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"),
        col("label").as("qlabel"))
    val got = Ann.filteredTopK(emb, qs, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // scalar ground truth: cosine over the label-restricted set only
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byQ = got.groupBy(_._1)
    rows.filter(_._1 < 5).foreach { case (qid, qv, qlabel) =>
      val want = rows.filter(_._3 == qlabel)
        .map { case (id, v, _) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
      val g = byQ(qid).sortBy(_._2)
      assert(g.length == want.length, s"q$qid size")
      g.zip(want).foreach { case ((_, _, id, c), (wid, wc)) =>
        assert(id == wid, s"q$qid: got $id want $wid")
        assert(math.abs(c - wc) < 1e-9)
      }
      // every returned vec shares the query's label (the filter is exact)
      val labelOf = rows.map(r => r._1 -> r._3).toMap
      assert(g.forall { case (_, _, id, _) => labelOf(id) == qlabel })
    }
    // the recall bug this operator avoids: post-filtering the UNFILTERED
    // top-5 must lose results for at least one query on this fixture
    val unfiltered = Ann.bruteForceTopK(emb, qs.drop("qlabel"), 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    val qlabelOf = rows.filter(_._1 < 5).map(r => r._1 -> r._3).toMap
    val lossy = (0L until 5L).exists { q =>
      unfiltered(q).map(_._2).count(id => labelOf(id) == qlabelOf(q)) < byQ(q).length }
    assert(lossy, "fixture should demonstrate the post-filter recall loss")
  }

  test("pqAdcTopK: converged codebooks make ADC exact on a clustered fixture") {
    import spark.implicits._
    // 4 vectors, dim 4, m=2 subspaces of 2 dims; each subspace holds
    // exactly {(0,0), (1,1)} twice, and the first-2 init is already the
    // fixed point -> codes are exact and ADC = true squared distance
    val emb = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(1f, 1f, 1f, 1f)),
      (2L, Seq(0f, 0f, 1f, 1f)), (3L, Seq(1f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = graft.ann.Ann.fixedQueries(spark, emb, 1)
    val got = graft.ann.Ann.pqAdcTopK(emb, q, k = 4, m = 2, codebook = 2,
        iters = 2, dim = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // q0 = v0: adc 0 to itself, 2 to v2/v3 (tie -> vec_id asc), 4 to v1
    assert(got.map(x => (x._1, x._2)).toSeq ==
      Seq((1, 0L), (2, 2L), (3, 3L), (4, 1L)))
    assert(got.map(_._3).toSeq == Seq(0.0, 2.0, 2.0, 4.0))
  }
}
