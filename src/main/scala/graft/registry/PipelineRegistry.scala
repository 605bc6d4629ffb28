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

/** training-data pipeline: splits, packing, curation, classifiers, multimodal plumbing. */
private[graft] object PipelineRegistry extends QueryRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ===== training-data pipeline operators =====
    // deterministic hash train/val/test split (stable under data growth)
    "split_assign" -> ((s, dir) => {
      graft.pipeline.Splits.assign(Corpus.fromDocuments(s, dir))
    }),
    // importance sampling: keep probability ∝ alnum quality ratio, as a
    // pure function of (doc_id, weight) — map-only, growth-stable
    "split_importance" -> ((s, dir) => {
      val c = Corpus.fromDocuments(s, dir)
      val w = TextAnalysis.quality(c).select(col("doc_id"), col("alnum_ratio_r"))
      graft.pipeline.Splits.importanceSample(c.join(w, "doc_id"), col("alnum_ratio_r"))
        .select("doc_id", "bucket", "thr")
    }),
    // domain-mixture resampling: deterministic downsample toward target
    // language shares (keep iff bucket·n_dom < tw·N, pure BIGINT)
    "split_mixture" -> ((s, dir) => {
      graft.pipeline.Mixture.resample(
        Corpus.fromDocuments(s, dir), "lang", mixTargets)
    }),
    // stratified per-stratum quota sampling (training-data mixing): at most
    // 40 docs per lang, selected by the cross-engine hash order — a pure
    // function of ids, so the subset is stable under growth and engines
    "split_stratified" -> ((s, dir) => {
      graft.pipeline.Splits.stratifiedSample(
        Corpus.fromDocuments(s, dir).select("doc_id", "lang"), "lang", quota = 40)
    }),
    // Sequence packing (concat-and-chop, capacity 512): each doc's exact
    // position in the packed training stream — two-phase range-bucket
    // prefix sum; the twin's GLOBAL cumsum proves the phases lose nothing
    "split_packing" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      graft.pipeline.Packing.pack(t.docStats, capacity = 512L)
    }),
    // Leakage-safe split: near-dup cluster members share a split (hash the
    // cluster representative, not the doc) — singletons fall back to the
    // plain assign hash, so only dup groups move
    "split_leakage_safe" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val pairs = Dedup.minhashLshPairs(c, numHashes = 8, rowsPerBand = 2,
        threshold = 0.8).select("a_id", "b_id")
      graft.pipeline.Splits.leakageSafeAssign(
        c.select("doc_id"), Dedup.clusters(pairs))
    }),
    // one-plan curation: quality gate → exact-dedup keep → hash split
    "pipeline_curate" -> ((s, dir) => {
      graft.pipeline.Curation.curate(Corpus.fromDocuments(s, dir))
    }),
    // per-source quality-percentile gate: keep each repo's top half by
    // alnum quality — exact via the bounded (source, q@4dp) histogram,
    // never a per-source doc sort; threshold ties all kept
    "pipeline_quality_gate" -> ((s, dir) => {
      val c = Corpus.fromDocuments(s, dir)
      val q = TextAnalysis.quality(c)
        .select(col("doc_id"), col("alnum_ratio_r").as("q"))
      graft.pipeline.Curation.qualityQuantileGate(
          c.select("doc_id", "repo").withColumnRenamed("repo", "source").join(q, "doc_id"),
          keepPermille = 500)
        .select(col("doc_id"), col("source").as("repo"),
          col("q").as("q_r"), col("thr").as("thr_r"))
    }),
    // k-fold CV ledger: fold = permille bucket mod 5, nested with assign's
    // buckets; every doc tests once and trains k−1 times
    "split_kfold" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.pipeline.Splits.kfoldLedger(c.select("doc_id"), k = 5)
    }),
    // multimodal: metadata projection over the binary media table
    // frame-sampling plumbing made oracle-checkable: every 64-byte stride
    // window of a video blob is a "frame"; the hash is over the UTF-8
    // decode (the synthetic blobs are ASCII, so bytes == chars)
    "mm_frames" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, dir)
      Multimodal.sampleFrames(media, stride = 64, frameLen = 16)
        .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
          graft.textan.TextHash.tokenHashCol(
            decode(col("frame_bytes"), "UTF-8")).as("frame_hash"))
    }),
    // aspect-fit resize plan: integer-exact output geometry per image
    "mm_resize" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, dir)
      Multimodal.resizePlan(media, target = 224)
    }),
    "mm_meta" -> ((s, dir) => {
      Multimodal.meta(Multimodal.mediaFromDocuments(s, dir))
    }),
    // multimodal: stubbed decode via mapPartitions (batch plumbing is real;
    // decode is a deterministic fake) — checksum/meta hash-gated vs DuckDB
    "mm_features" -> ((s, dir) => {
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
        .toDF().select(col("media_id"), col("modality"), col("n_bytes"), col("checksum"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "split_assign" ->
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM documents)""".stripMargin,
    // importance-sampling twin: same permille hash, same rounded weight
    "split_importance" ->
      s"""WITH w AS (SELECT doc_id,
         |  round(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END, 4) AS alnum_ratio_r
         |  FROM documents),
         |b AS (SELECT doc_id,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM documents)
         |SELECT b.doc_id, b.bucket::BIGINT AS bucket,
         |       floor(1000.0 * w.alnum_ratio_r)::BIGINT AS thr
         |FROM b JOIN w USING (doc_id)
         |WHERE b.bucket < floor(1000.0 * w.alnum_ratio_r)""".stripMargin,
    // mixture twin: same permille hash, same pure-BIGINT keep rule
    // bucket·n_dom < tw·N; absent domains coalesce to weight 0
    "split_mixture" -> {
      val twRows = mixTargets.toSeq.sorted
        .map { case (d, w) => s"('$d', $w)" }.mkString(", ")
      s"""WITH cnt AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
         |tot AS (SELECT count(*)::BIGINT AS t FROM documents),
         |tw AS (SELECT * FROM (VALUES $twRows) v(lang, w)),
         |b AS (SELECT doc_id, lang,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM documents)
         |SELECT b.doc_id, b.lang, b.bucket::BIGINT AS bucket
         |FROM b JOIN cnt USING (lang) LEFT JOIN tw USING (lang), tot
         |WHERE b.bucket * cnt.n < coalesce(tw.w, 0)::BIGINT * tot.t""".stripMargin
    },
    "split_stratified" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |  (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) AS h
         |  FROM documents),
         |r AS (SELECT doc_id, lang,
         |  row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)::BIGINT AS samp_rank
         |  FROM h)
         |SELECT doc_id, lang, samp_rank FROM r WHERE samp_rank <= 40""".stripMargin,
    // packing twin: the GLOBAL single-window cumsum the two-phase Spark
    // path must equal exactly
    "split_packing" -> {
      val hSql = TextHash.mixSql(9, tokenHashSqlInner("doc_id::VARCHAR"))
      s"""WITH ${termsCte}, ${dsCte},
         |hd AS (SELECT doc_id, dl, ($hSql) AS h FROM ds),
         |po AS (SELECT doc_id, h, dl,
         |         (sum(dl) OVER (ORDER BY h ASC, doc_id ASC
         |            ROWS UNBOUNDED PRECEDING) - dl)::BIGINT AS off
         |       FROM hd)
         |SELECT doc_id, h, off,
         |       (off // 512)::BIGINT AS seq_first,
         |       ((off + dl - 1) // 512)::BIGINT AS seq_last,
         |       (CASE WHEN (off + dl - 1) // 512 > off // 512 THEN 1 ELSE 0 END)::BIGINT AS split
         |FROM po""".stripMargin
    },
    // leakage-safe twin: the SAME recursive clusters closure, then the
    // permille hash over coalesce(cluster_id, doc_id)
    "split_leakage_safe" ->
      s"""WITH RECURSIVE ${lshCtes},
         |pairs AS (
         |  SELECT a_id, b_id
         |  FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8),
         |und AS (SELECT a_id AS u, b_id AS v FROM pairs
         |        UNION SELECT b_id, a_id FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |cl AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
         |k AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS group_id
         |      FROM documents d LEFT JOIN cl USING (doc_id)),
         |kb AS (SELECT doc_id, group_id,
         |         (${TextHash.mixSql(7, tokenHashSqlInner("group_id::VARCHAR"))}) % 1000 AS bucket
         |       FROM k)
         |SELECT doc_id, group_id, bucket,
         |  CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM kb""".stripMargin,
    "pipeline_curate" ->
      s"""WITH q AS (SELECT doc_id, text,
         |  len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
         |  CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END AS alnum
         |  FROM documents),
         |g AS (SELECT doc_id, n_tokens, text FROM q WHERE n_tokens >= 30 AND alnum >= 0.7),
         |keep AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY sha256(text)),
         |k AS (SELECT g.doc_id, g.n_tokens FROM g JOIN keep USING (doc_id)),
         |b AS (SELECT doc_id, n_tokens,
         |        (${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000 AS bucket
         |      FROM k)
         |SELECT doc_id, n_tokens, bucket,
         |  CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,
    // quality-gate twin: same 4dp histogram, same BIGINT cross-multiplied
    // ties-or-better threshold, same keep-all-ties rule
    "pipeline_quality_gate" ->
      s"""WITH q AS (SELECT doc_id, source,
         |  round(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END, 4) AS q
         |  FROM documents),
         |h AS (SELECT source, q, count(*)::BIGINT AS c FROM q GROUP BY source, q),
         |cu AS (SELECT source, q, sum(c) OVER (PARTITION BY source ORDER BY q DESC) AS cum FROM h),
         |nn AS (SELECT source, count(*)::BIGINT AS n FROM q GROUP BY source),
         |thr AS (SELECT cu.source, max(cu.q) AS thr
         |        FROM cu JOIN nn USING (source)
         |        WHERE cu.cum * 1000 >= nn.n * 500 GROUP BY cu.source)
         |SELECT q.doc_id, q.source AS repo, q.q AS q_r, thr.thr AS thr_r
         |FROM q JOIN thr USING (source) WHERE q.q >= thr.thr""".stripMargin,
    // kfold twin: same permille-bucket-mod-k folds, same ledger
    "split_kfold" ->
      s"""WITH b AS (SELECT ((${TextHash.mixSql(7, tokenHashSqlInner("doc_id::VARCHAR"))}) % 1000) % 5 AS fold
         |           FROM documents),
         |f AS (SELECT fold::BIGINT AS fold, count(*)::BIGINT AS n_test FROM b GROUP BY fold)
         |SELECT fold, n_test,
         |       ((SELECT count(*) FROM documents) - n_test)::BIGINT AS n_train
         |FROM f""".stripMargin,
    // frames twin: video = doc_id%3=2; ASCII blobs ⇒ byte windows ==
    // char windows, so substr replays the stride slices exactly
    "mm_frames" -> {
      val h = tokenHashSqlInner("ft")
      s"""WITH v AS (SELECT doc_id AS media_id, text, length(text)::BIGINT AS n
         |           FROM documents WHERE doc_id % 3 = 2),
         |fr0 AS (SELECT media_id, text,
         |          unnest(range(greatest((n - 16) // 64 + 1, 0))) AS f FROM v),
         |fr AS (SELECT media_id, f::BIGINT AS frame_no,
         |         substr(text, (f * 64 + 1)::INT, 16) AS ft FROM fr0)
         |SELECT media_id, frame_no, ($h) AS frame_hash FROM fr""".stripMargin
    },
    // resize twin: same synthesized dims, same aspect-fit integer division
    "mm_resize" ->
      """WITH i AS (SELECT doc_id AS media_id,
        |             (doc_id % 640 + 16)::BIGINT AS width,
        |             (doc_id % 480 + 16)::BIGINT AS height
        |           FROM documents WHERE doc_id % 3 = 0)
        |SELECT media_id, width, height,
        |  (CASE WHEN width >= height THEN 224 ELSE width * 224 // height END)::BIGINT AS out_w,
        |  (CASE WHEN width >= height THEN height * 224 // width ELSE 224 END)::BIGINT AS out_h
        |FROM i""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  (doc_id % 640 + 16)::BIGINT AS width,
        |  (doc_id % 480 + 16)::BIGINT AS height,
        |  (CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END)::BIGINT AS sample_rate
        |FROM documents""".stripMargin,
    "mm_features" -> mmFeaturesSql
  )
}
