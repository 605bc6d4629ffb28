package graft.ann

import graft.corpus.Corpus
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — one scan of the table joined
  * against a BROADCAST query set (queries are few; the big side never
  * shuffles), per-query top-k via window rank. Exact; the correctness
  * oracle for the bucketed variant.
  *
  * Scale path: random-hyperplane LSH (sign bits of dots with seeded
  * pseudo-random planes) — table bucketed once (write-time), probe cost =
  * |bucket| ≈ N / 2^bits per query, multiprobe over Hamming-adjacent
  * buckets recovers recall. All planes derive from splitmix64, so bucket
  * assignment is deterministic across engines and runs.
  */
object Ann {

  /** exact cosine top-k per query vector. `queries` columns:
    * (query_id: long, qv: array<double>). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms once per vector/query (not per scored pair): the per-pair work
    // is a single dot fold — bit-identical values (Dedup.cosinePre)
    val e = emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", Dedup.normCol(col("v")))
    val scored = e.join(broadcast(queries.withColumn("qnrm", Dedup.normCol(col("qv")))))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosinePre(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  /** Recall@k evaluation: how much of the EXACT top-k an approximate index
    * (LSH / IVF / anything emitting (query_id, vec_id)) recovered, per query
    * — the eval-harness operator every ANN deployment runs before trusting
    * an index at scale. One plan: equi-join on (query_id, vec_id) + a hash
    * aggregate; hits are integers and recall = hits / k, so the output is
    * hash-exact across engines. Scale shape: both inputs are top-k
    * relations (|queries| × k rows) — tiny regardless of corpus size; the
    * join never touches the embedding table. */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val hit = approx.select(col("query_id"), col("vec_id")).distinct()
      .withColumn("_hit", lit(1L))
    exact.select(col("query_id"), col("vec_id"))
      .join(hit, Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / lit(k.toDouble)).as("recall_r"))
  }

  /** deterministic pseudo-random hyperplane component p(plane, dim) ∈ [-1, 1) */
  def planeComponent(plane: Int, dim: Int): Double =
    Corpus.u01(Corpus.splitmix64(0x9E1A * (plane + 1) + dim.toLong * 0x7F4A7C15L)) * 2.0 - 1.0

  /** sign-bit bucket id for a vector column of length `dim` under `bits`
    * hyperplanes — a codegen'd expression (no UDF). */
  def bucketCol(v: org.apache.spark.sql.Column, dim: Int, bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map { b =>
      val dot = (0 until dim).map(d => element_at(v, d + 1) * lit(planeComponent(b, d)))
        .reduce(_ + _)
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Scale-aware bucket-bit count: 2^bits ≈ n / targetBucketSize, floored at
    * 8 bits and capped at 32 (a probe term is codegen'd per bit). A fixed
    * default (the old `bits = 8` ⇒ 256 buckets forever) means ~4×10^7
    * vectors per probe at N = 10^10 — the default must grow with N so the
    * safe behavior is the default one. */
  def deriveBits(n: Long, targetBucketSize: Long = 4096L): Int = {
    val buckets = math.max(1L, n / math.max(1L, targetBucketSize))
    val ceilLog2 =
      if (buckets <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1L)
    math.min(32, math.max(8, ceilLog2))
  }

  /** LSH-bucketed ANN: probe only buckets within `probeHamming` bit flips of
    * the query's bucket (multiprobe). Returns the same schema as
    * bruteForceTopK; recall < 1 by construction, measured in AnnSpec.
    * `bits <= 0` (the default) derives the bucket count from the table size
    * via [[deriveBits]] (one metadata-cheap count); pass an explicit value
    * to pin the layout (the harness pins 8 for its committed oracle). */
  def lshTopK(emb: DataFrame, queries: DataFrame, dim: Int, k: Int,
              bits: Int = 0, probeHamming: Int = 1): DataFrame = {
    val nBits = if (bits > 0) bits else deriveBits(emb.count())
    val e = emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("bucket", bucketCol(col("v"), dim, nBits))
      .withColumn("nrm", Dedup.normCol(col("v")))
    val qb = queries.withColumn("qbucket", bucketCol(col("qv"), dim, nBits))
      .withColumn("qnrm", Dedup.normCol(col("qv")))
    // multiprobe: expand each query to its bucket + all single-bit flips
    val probes: Seq[org.apache.spark.sql.Column] = lit(0L) +:
      (if (probeHamming >= 1) (0 until nBits).map(b => lit(1L << b)) else Nil)
    val qprobed = qb.select(col("query_id"), col("qv"), col("qnrm"),
      explode(array(probes.map(p => col("qbucket").bitwiseXOR(p)): _*)).as("bucket"))
    // dedup candidate pairs BEFORE scoring: a vector reachable through
    // several probe buckets must pay the 64-dim cosine only once
    val scored = e.join(broadcast(qprobed), "bucket")
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id"),
        Dedup.cosinePre(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  // ---------------- IVF (inverted-file / coarse k-means) ----------------

  /** Deterministic Lloyd's k-means over the embedding column: centroids
    * initialized from the `k` lowest vec_ids of the loop input (seed-free
    * determinism), a few fixed iterations, L2 assignment.
    *
    * The centroid LOOP runs on at most `maxSample` vectors: when the table
    * exceeds that, a deterministic hash-permille filter on vec_id (xxhash64
    * — value-addressed, so the sample is identical at any partitioning)
    * selects the loop input. Lloyd's needs only representative statistics;
    * full-table assignment stays a single broadcast pass (ivfTopK). This
    * both bounds the per-iteration scan to O(maxSample) and bounds every
    * mapGroups group below (a centroid's member set) by the sample size —
    * the whole-group materialization is safe BECAUSE the loop input is
    * capped. Returns the centroid matrix. */
  def ivfCentroids(emb: DataFrame, k: Int, iters: Int = 4,
                   maxSample: Long = 100000L): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val all = emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    // bare-source count (parquet metadata-fast), not over the projection
    val n = emb.count()
    val permille = if (n <= maxSample) 1000L else math.max(1L, maxSample * 1000L / n)
    val e = (if (permille >= 1000L) all
             else all.filter(pmod(xxhash64(col("vec_id")), lit(1000L)) < lit(permille)))
      .as[(Long, Seq[Double])].cache()
    // init = k lowest vec_ids of the loop input; the full-fraction path
    // keeps the cheap pushed-down range filter (dense ids from 0)
    var centroids =
      if (permille >= 1000L) e.filter(col("vec_id") < k).collect().sortBy(_._1).map(_._2.toArray)
      else e.orderBy(col("vec_id")).limit(k).collect().sortBy(_._1).map(_._2.toArray)
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assigned = e.map { case (id, v) =>
        val cs = bc.value
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (best, id, v)
      }
      // member sums accumulate in vec_id order: float addition is not
      // associative, and a shuffle-order sum would make the centroids (and
      // hence bucket assignment) run-dependent — this keeps k-means
      // bit-reproducible across runs AND engines (the DuckDB oracle sums in
      // the same order). Group size is bounded by maxSample: the loop input
      // `e` is the capped sample, never the raw table.
      val updated = assigned.groupByKey(_._1)
        .mapGroups { (cid, it) =>
          val members = it.toArray.sortBy(_._2)
          val acc = new Array[Double](centroids(0).length)
          members.foreach { case (_, _, v) =>
            var i = 0
            while (i < v.length) { acc(i) += v(i); i += 1 }
          }
          (cid, acc.map(_ / members.length))
        }.collect().toMap
      // a centroid that lost every member keeps its previous position (cid
      // labels stay stable — no index compaction that would silently remap
      // tie-breaks)
      centroids = centroids.indices.map(c => updated.getOrElse(c, centroids(c))).toArray
    }
    e.unpersist()
    centroids
  }

  /** IVF ANN: table bucketed by nearest centroid (write-time at scale);
    * queries probe the `nprobe` nearest centroid buckets, exact cosine
    * within. Same output schema as bruteForceTopK; recall measured in
    * AnnSpec. */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nprobe: Int = 4,
              maxSample: Long = 100000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(emb, nCentroids, maxSample = maxSample)
    val bc = spark.sparkContext.broadcast(cents)
    val assignUdf = udf((v: Seq[Double]) => {
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    })
    val probeUdf = udf((v: Seq[Double]) => {
      val cs = bc.value
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        (d, c)
      }.sortBy(x => (x._1, x._2)).take(nprobe).map(_._2)
    })
    val e = emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("bucket", assignUdf(col("v")))
      .withColumn("nrm", Dedup.normCol(col("v")))
    val qprobed = queries.withColumn("qnrm", Dedup.normCol(col("qv")))
      .withColumn("bucket", explode(probeUdf(col("qv"))))
    val scored = e.join(broadcast(qprobed), "bucket")
      .select(col("query_id"), col("vec_id"),
        Dedup.cosinePre(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  /** Product quantization with asymmetric distance computation (Jégou,
    * Douze & Schmid, TPAMI 2011, "Product quantization for nearest
    * neighbor search" — public literature; the codec behind FAISS's
    * IVF-PQ). The embedding splits into `m` subspaces; each subspace gets
    * its own k-means codebook (the SAME deterministic Lloyd's as
    * [[ivfCentroids]], run on the sliced vectors); a vector compresses to
    * m small codes (m·log2(k') bits — 6 bits here vs 2048 for the raw
    * floats). ADC scores a query against CODES: per subspace, the distance
    * from the query's sub-vector to the centroid the code names —
    * precomputed once per (query, centroid) as the classic lookup table —
    * and the approximate distance is the sum over subspaces.
    *
    * Determinism: code assignment is strict-< argmin (ties → lowest cid,
    * mirroring the SQL row_number tie-break); the ADC sum folds subspaces
    * in 0..m−1 order — fixed float association, twin-identical.
    *
    * Scale shape: the codes table IS the compressed index (it replaces the
    * vector column — 100× smaller, so the ADC pass scans codes, not
    * floats); the codebooks and the per-query LUT are driver/broadcast
    * data (m·k'·subDim doubles). The scan is embarrassingly parallel with
    * no shuffle; at 100 TB one composes it with the IVF bucketing above
    * (IVF-PQ) so only probed buckets scan. */
  def pqAdcTopK(emb: DataFrame, queries: DataFrame, k: Int, m: Int = 2,
                codebook: Int = 8, iters: Int = 2, dim: Int = 64,
                maxSample: Long = 100000L): DataFrame = {
    require(dim % m == 0, "dim must split evenly into subspaces")
    val spark = emb.sparkSession
    val sub = dim / m
    val books: Array[Array[Array[Double]]] = (0 until m).map { s =>
      ivfCentroids(
        emb.select(col("vec_id"), slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        codebook, iters, maxSample)
    }.toArray
    val bc = spark.sparkContext.broadcast(books)
    val codesUdf = udf((v: Seq[Double]) => {
      val bs = bc.value
      (0 until bs.length).map { s =>
        val cs = bs(s); val off = s * (v.length / bs.length)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          while (i < cs(c).length) { val t = v(off + i) - cs(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    })
    val adcUdf = udf((qv: Seq[Double], codes: Seq[Int]) => {
      val bs = bc.value
      var s = 0; var acc = 0.0
      while (s < bs.length) {
        val cv = bs(s)(codes(s)); val off = s * (qv.length / bs.length)
        var d = 0.0; var i = 0
        while (i < cv.length) { val t = qv(off + i) - cv(i); d += t * t; i += 1 }
        acc += d; s += 1
      }
      acc
    })
    val codes = emb
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("vec_id"), codesUdf(col("v")).as("codes"))
    val scored = codes.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"), adcUdf(col("qv"), col("codes")).as("adc"))
    val w = Window.partitionBy(col("query_id")).orderBy(asc("adc"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "adc")
  }

  /** the fixed query set used by the harness: the first `nq` vectors of the
    * embeddings table themselves. */
  def fixedQueries(spark: SparkSession, emb: DataFrame, nq: Int = 5): DataFrame =
    emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))

  /** FILTERED vector search (the "metadata-filtered ANN" every production
    * vector store offers): exact cosine top-k among vectors whose `label`
    * equals the query's `qlabel`. The filter is expressed as an EQUI-JOIN
    * key, not a post-filter — candidates co-partition by label, the scorer
    * touches only same-label rows, and a selective label turns the scan
    * into a partition-pruned read when the embedding table is
    * label-partitioned on disk. Post-filtering an unfiltered top-k is the
    * classic recall bug this operator exists to avoid (k survivors of a
    * filter ≠ top-k of the filtered set); this scores the filtered set
    * directly, so recall is exact by construction.
    * queries: (query_id, qv: array<double>, qlabel). */
  def filteredTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", Dedup.normCol(col("v")))
    val scored = e.join(broadcast(queries.withColumn("qnrm", Dedup.normCol(col("qv")))),
        col("label") === col("qlabel"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosinePre(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }
}
