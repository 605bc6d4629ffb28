package graft.registry

import graft.analyze.{Analyzer, DefaultLexicon, Html}
import graft.ann.Ann
import graft.corpus.Corpus
import graft.dedup.Dedup
import graft.index.{IndexWriter, InvertedIndex, ShardPosting, Shards}
import graft.mm.Multimodal
import graft.query.{Bm25, QueryFrontend, Search, Snippets, Wand}
import graft.textan.{TextAnalysis, TextHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registry.Shared._

/** embedding ANN: brute/LSH/IVF, SQ8/PQ quantization, recall gates. */
private[graft] object AnnRegistry extends QueryRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PQ recall vs exact brute force: what the 6-bit codes cost in top-5
    // agreement — the quantization-quality gate before shipping an index
    "ann_pq_recall" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = Ann.fixedQueries(s, emb, 5)
      Ann.recallAtK(
        Ann.bruteForceTopK(emb, q, 5),
        Ann.pqAdcTopK(emb, q, k = 5, m = 2, codebook = 8, iters = 2), k = 5)
    }),
    // brute-force cosine top-5 for 5 fixed query vectors (= ANN oracle)
    "ann_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.bruteForceTopK(emb, Ann.fixedQueries(s, emb, 5), 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // Filtered vector search: exact top-k among SAME-label vectors — the
    // filter is the join key (co-partition), never a post-filter on an
    // unfiltered top-k (the classic recall bug)
    "ann_filtered_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("qv"),
          col("label").as("qlabel"))
      Ann.filteredTopK(emb, qs, k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // LSH-bucketed ANN (multiprobe) — approximate but deterministic; recall
    // vs ann_topk asserted in AnnSpec, exact output hash-gated vs DuckDB
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      // bits pinned to 8 (matching the inlined-plane oracle SQL); the
      // production default derives bits from N via Ann.deriveBits
      Ann.lshTopK(emb, Ann.fixedQueries(s, emb, 5), dim = 64, k = 5, bits = 8)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // IVF (coarse k-means) ANN — deterministic Lloyd's (ordered float
    // accumulation), hash-gated vs an unrolled-SQL k-means twin
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.ivfTopK(emb, Ann.fixedQueries(s, emb, 5), 5, nCentroids = 8, nprobe = 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // PQ-ADC (Jégou FAISS codec): 2 subspaces × 8-entry codebooks, vectors
    // compressed to 6-bit codes, asymmetric distance via per-query LUT
    "ann_pq_adc" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.pqAdcTopK(emb, Ann.fixedQueries(s, emb, 5), k = 5, m = 2,
          codebook = 8, iters = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("adc"), 4).as("adc_r"))
    }),
    // SQ8 scalar-quantized ANN: per-dim affine int8 codes (4× smaller scan),
    // asymmetric (raw-query vs dequantized) cosine top-5
    "ann_sq8_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val p = graft.ann.Quantize.sqTrain(emb, 64)
      graft.ann.Quantize.sqTopK(
          graft.ann.Quantize.sqEncode(emb, p), Ann.fixedQueries(s, emb, 5), p, 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // SQ8 two-stage: quantized scan picks 3k candidates, exact cosine
    // rescored on the isin-pruned raw table — full precision never scanned
    "ann_sq8_rerank" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val p = graft.ann.Quantize.sqTrain(emb, 64)
      graft.ann.Quantize.sqRerankTopK(emb,
          graft.ann.Quantize.sqEncode(emb, p), Ann.fixedQueries(s, emb, 5), p, k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // SQ8 COLD: the persisted codes+params aux artifacts serve the same
    // ADC top-5 — write → manifest-lineaged read is provably lossless
    // (same oracle as ann_sq8_topk)
    "ann_sq8_persisted" -> ((s, dir) => {
      val td = persistedAux(s, dir)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val p = graft.ann.Quantize.readParams(s, td)
      graft.ann.Quantize.sqTopK(
          graft.ann.Quantize.readCodes(s, td), Ann.fixedQueries(s, emb, 5), p, 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // recall@k of the LSH index vs exact brute force — the ANN eval harness
    // (per-query integer hits; recall = hits/k, hash-exact)
    "ann_recall" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = Ann.fixedQueries(s, emb, 5)
      Ann.recallAtK(
        Ann.bruteForceTopK(emb, q, 5),
        Ann.lshTopK(emb, q, dim = 64, k = 5, bits = 8), k = 5)
    })
  )

  val oracleSql: Map[String, String] = Map(
    // PQ recall twin: exact brute-force vs the PQ chain, joined per query
    "ann_pq_recall" ->
      s"""WITH bf AS ($annBfSql), p AS ($annPqSql)
         |SELECT bf.query_id, count(p.vec_id)::BIGINT AS hits,
         |       count(p.vec_id) / 5.0 AS recall_r
         |FROM bf LEFT JOIN p ON bf.query_id = p.query_id AND bf.vec_id = p.vec_id
         |GROUP BY bf.query_id""".stripMargin,
    "ann_topk" -> annBfSql,
    // filtered-ANN twin: the label equi-predicate joins query to corpus
    "ann_filtered_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
         |           FROM embeddings WHERE vec_id < 5),
         |scored AS (SELECT q.query_id, e.vec_id, ${cosSql("q.qv", "e.embedding")} AS cos
         |           FROM embeddings e JOIN q ON e.label = q.qlabel)
         |SELECT query_id, rank, vec_id, cos_r FROM (
         |  SELECT query_id, vec_id, round(cos, 4) AS cos_r,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    // deterministic by construction (splitmix64 planes / seed-free k-means),
    // so the approximate paths get full hash gates, not rows-only checks
    "ann_lsh_topk" -> annLshSql,
    "ann_ivf_topk" -> annIvfSql,
    // PQ-ADC twin: per-subspace codebooks unrolled (same Lloyd recurrence
    // as IVF's twin on the sliced vectors), ADC as the LUT join q1.d + q2.d
    "ann_pq_adc" -> annPqSql,
    "ann_sq8_topk" -> annSq8Sql,
    "ann_sq8_rerank" -> annSq8RerankSql,
    // deliberately the SAME twin: the persisted artifact must be
    // indistinguishable from the in-memory encode
    "ann_sq8_persisted" -> annSq8Sql,
    // recall@k harness: LEFT JOIN the exact top-k against the approximate
    // top-k (both full nested-WITH twins) — integer hits, exact recall
    "ann_recall" ->
      s"""WITH bf AS ($annBfSql), l AS ($annLshSql)
         |SELECT bf.query_id, count(l.vec_id)::BIGINT AS hits,
         |       count(l.vec_id) / 5.0 AS recall_r
         |FROM bf LEFT JOIN l ON bf.query_id = l.query_id AND bf.vec_id = l.vec_id
         |GROUP BY bf.query_id""".stripMargin
  )
}
