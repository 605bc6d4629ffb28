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

/** exact/near dedup: MinHash-LSH, SimHash, APSS, winnowing, clusters/canonical, substring removal, contamination. */
private[graft] object DedupRegistry extends QueryRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // benchmark-contamination audit: bench set = doc_id < 20 stand-in
    // (single-pass split variant: one shingle computation for both sides)
    "dedup_contamination" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.contaminationSplit(c, col("doc_id") < 20)
        .select(col("train_id"), col("bench_id"), col("overlap"),
          round(col("contamination"), 4).as("contamination_r"))
    }),
    // exact dedup (hash-groupBy on content sha)
    "dedup_exact" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.exact(c)
    }),
    // ExactSubstr duplicated-span REMOVAL (Lee et al. 2022): every 8-token
    // span repeated anywhere in the corpus is dropped keep-first
    // (min (doc_id, pos)); emits the REWRITTEN per-doc content — the dedup
    // most large pretraining corpora actually run, beyond pair detection
    "dedup_substring_rm" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.dedup.SubstrDedup.rewrite(c, w = 8)
    }),
    // canonical-URL dedup: deterministic synthetic URL variants per doc
    // (clean vs tracking/case/slash/fragment-noised) must collapse to one
    // canonical form — the crawl-frontier one-fetch-per-page normalizer
    "dedup_url_canon" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.corpus.Crawl.urlDedup(syntheticUrls(c))
    }),
    // n-gram (3-shingle) Jaccard near-dup pairs
    "dedup_ngram" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.ngramJaccardPairs(c, n = 3, threshold = 0.8, maxShingleDf = 1000L)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jac_r"))
    }),
    // n-gram novelty: fraction of a doc's shingles FIRST seen in it
    // (ingestion order = doc_id) — the recycled-text signal no pairwise
    // threshold catches
    "dedup_novelty" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.novelty(c, n = 3)
        .select(col("doc_id"), col("n_shingles"), col("n_first"),
          round(col("novelty"), 4).as("novelty_r"))
    }),
    // Containment (subset-duplication): inter / min(|A|,|B|) >= 0.9 — the
    // quoted-whole-inside case Jaccard misses on size-skewed pairs
    "dedup_containment" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.containmentPairs(c, n = 3, threshold = 0.9, maxShingleDf = 1000L)
        .select(col("a_id"), col("b_id"), round(col("containment"), 4).as("cont_r"))
    }),
    // MinHash signatures (8 hash functions, codegen'd min-aggregates)
    "dedup_minhash_sig" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.minhashSignatures(c, numHashes = 8)
    }),
    // MinHash LSH (4 bands × 2 rows) candidates + exact-Jaccard verify
    "dedup_minhash_lsh" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.minhashLshPairs(c, numHashes = 8, rowsPerBand = 2, threshold = 0.8)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jac_r"))
    }),
    // Incremental dedup: pairs touching the "new batch" (doc_id even) via
    // batch-band probe of the full band index — O(batch) candidates
    "dedup_minhash_incr" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.minhashIncrementalPairs(c, col("doc_id") % 2 === 0,
          numHashes = 8, rowsPerBand = 2, threshold = 0.8)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jac_r"))
    }),
    // Duplicate CLUSTERS: connected components (min-label propagation) over
    // the LSH near-dup pairs — turns pairwise evidence into the keep-one-
    // per-cluster dedup decision; DuckDB twin is a recursive-CTE closure
    "dedup_clusters" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val pairs = Dedup.minhashLshPairs(c, numHashes = 8, rowsPerBand = 2,
        threshold = 0.8).select("a_id", "b_id")
      Dedup.clusters(pairs)
    }),
    // Canonical selection: keep each cluster's highest-quality member
    // (alnum ratio, ties doc_id asc) — not blindly the min id
    "dedup_canonical" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      val pairs = Dedup.minhashLshPairs(c, numHashes = 8, rowsPerBand = 2,
        threshold = 0.8).select("a_id", "b_id")
      val q = TextAnalysis.quality(c).select(col("doc_id"), col("alnum_ratio_r").as("q"))
      Dedup.canonical(Dedup.clusters(pairs), q)
        .select(col("cluster_id"), col("canonical_id"),
          round(col("q"), 4).as("q_r"), col("members"))
    }),
    // 31-bit SimHash per doc
    "dedup_simhash" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.simhash(c)
    }),
    // SimHash near-dup pairs (banded candidates, exact for hamming<=3)
    "dedup_simhash_pairs" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.simhashPairs(c, maxHamming = 3)
        .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
    }),
    // embedding-cosine near-dup pairs (label-blocked)
    "dedup_embedding" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Dedup.embeddingPairs(emb, threshold = 0.4)
        .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_r"))
    }),
    // exact all-pairs cosine ≥ 0.85 via prefix filtering (Bayardo 2007)
    // over a deterministic doc sample; the oracle is the BRUTE-FORCE
    // all-pairs join — hash equality proves the filter loses nothing
    "dedup_apss" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Dedup.apssPairs(t.postings.filter(col("doc_id") % 5 === 0), 0.85)
        .select(col("doc_a"), col("doc_b"), round(col("sim"), 4).as("sim_r"))
    }),
    // C4-style duplicated-segment stats over non-overlapping 3-token
    // windows (the line-dedup analog for punctuation-free text)
    "dedup_segments" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.segmentDupStats(TextAnalysis.chunk(c, window = 3, stride = 3), minCount = 2)
        .select(col("doc_id"), col("n_segs"), col("n_dup"),
          round(col("dup_frac"), 4).as("dup_frac_r"))
    }),
    // winnowing (MOSS): local fingerprints + shared-fp candidate pairs —
    // the ≥(w+k−1)-token shared-run guarantee MinHash resemblance lacks
    "dedup_winnow" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.winnowPairs(Dedup.winnowFingerprints(c, k = 3, w = 4), minShared = 2)
    }),
    // Host-level mirror detection (Bharat–Broder): shingle resemblance
    // lifted from docs to repos — finds whole mirror farms in one pair
    "dedup_mirrors" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      Dedup.mirrorPairs(c, n = 3, threshold = 0.05, maxShingleHosts = 15L)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_contamination" ->
      s"""WITH ${shinglesCte},
         |bs AS (SELECT doc_id AS bench_id, shingle FROM shd WHERE doc_id < 20),
         |tr AS (SELECT doc_id AS train_id, shingle FROM shd WHERE doc_id >= 20),
         |bsz AS (SELECT bench_id, count(*) AS bsz FROM bs GROUP BY bench_id),
         |inter AS (SELECT train_id, bench_id, count(*)::BIGINT AS overlap
         |          FROM tr JOIN bs USING (shingle) GROUP BY train_id, bench_id)
         |SELECT train_id, bench_id, overlap, round(overlap::DOUBLE / bsz, 4) AS contamination_r
         |FROM inter JOIN bsz USING (bench_id)""".stripMargin,
    // ===== training-data ops =====
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_dups
        |FROM documents GROUP BY sha256(text)""".stripMargin,
    // ExactSubstr twin: replays the identical anchor → keep-first →
    // span-union → rewrite chain (w = 8). Keep-first is the lexicographic
    // (doc_id, pos) minimum (row_number twin of Spark's min-of-struct);
    // the rewrite anti-joins marked token indices and re-joins in order.
    "dedup_substring_rm" ->
      s"""WITH ${tokArrCte},
         |tp AS (SELECT doc_id, unnest(arr) AS term, unnest(range(len(arr))) AS pos FROM tokarr),
         |anch AS (SELECT doc_id,
         |           unnest(range(greatest(len(arr) - 7, 0))) AS pos,
         |           unnest(list_transform(range(greatest(len(arr) - 7, 0)),
         |             i -> array_to_string(arr[i + 1:i + 8], ' '))) AS sh
         |         FROM tokarr),
         |firsts AS (SELECT sh, doc_id AS fdoc, pos AS fpos FROM (
         |    SELECT sh, doc_id, pos,
         |           row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn,
         |           count(*) OVER (PARTITION BY sh) AS cnt
         |    FROM anch) WHERE rn = 1 AND cnt > 1),
         |rm AS (SELECT a.doc_id, a.pos FROM anch a JOIN firsts f USING (sh)
         |       WHERE NOT (a.doc_id = f.fdoc AND a.pos = f.fpos)),
         |rmtok AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS idx FROM rm),
         |kept AS (SELECT t.doc_id, t.term, t.pos FROM tp t
         |         LEFT JOIN rmtok r ON t.doc_id = r.doc_id AND t.pos = r.idx
         |         WHERE r.doc_id IS NULL),
         |ag AS (SELECT doc_id, count(*)::BIGINT AS nk,
         |              array_to_string(list(term ORDER BY pos), ' ') AS cd
         |       FROM kept GROUP BY doc_id)
         |SELECT ta.doc_id, len(ta.arr)::BIGINT AS n_tokens,
         |       (len(ta.arr) - coalesce(ag.nk, 0))::BIGINT AS n_removed,
         |       coalesce(ag.cd, '') AS content_dedup
         |FROM tokarr ta LEFT JOIN ag USING (doc_id)""".stripMargin,
    // canonical-URL twin: the SAME synthetic variants and the SAME
    // RE2-safe regex chain, step for step (fragment → mid tracking →
    // trailing tracking → host lowering → trailing slash)
    "dedup_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id * 2 AS url_id,
        |         'https://' || source || '.example.com/doc/' || doc_id AS url
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id * 2 + 1,
        |         'HTTPS://' || upper(source) || '.example.com/doc/' || doc_id ||
        |         CASE WHEN doc_id % 3 = 0
        |                THEN '?utm_source=feed&utm_campaign=c' || (doc_id % 5)::VARCHAR
        |              WHEN doc_id % 3 = 1 THEN '#section'
        |              ELSE '/' END
        |  FROM documents),
        |s1 AS (SELECT url_id, regexp_replace(url, '#.*', '', 'g') AS u FROM u),
        |s2 AS (SELECT url_id,
        |         regexp_replace(u, '(utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*&', '', 'g') AS u
        |       FROM s1),
        |s3 AS (SELECT url_id,
        |         regexp_replace(u, '[?&](utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*$', '', 'g') AS u
        |       FROM s2),
        |s4 AS (SELECT url_id,
        |         lower(regexp_extract(u, '^([A-Za-z]+://[^/?#]*)', 1)) ||
        |         regexp_replace(u, '^[A-Za-z]+://[^/?#]*', '', 'g') AS u
        |       FROM s3),
        |c AS (SELECT url_id, regexp_replace(u, '/$', '', 'g') AS canon FROM s4)
        |SELECT canon, count(*)::BIGINT AS members, min(url_id) AS keeper
        |FROM c GROUP BY canon""".stripMargin,
    "dedup_ngram" ->
      s"""WITH ${shinglesCte},
         |keptsh AS (SELECT shingle FROM shd GROUP BY shingle HAVING count(*) <= 1000),
         |shk AS (SELECT doc_id, shingle FROM shd JOIN keptsh USING (shingle)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |          FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jac_r
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8""".stripMargin,
    // novelty twin: same distinct-shingle relation, min-doc_id first
    // occurrence, per-doc first-fraction
    "dedup_novelty" ->
      s"""WITH ${shinglesCte},
         |fi AS (SELECT shingle, min(doc_id) AS first_doc FROM shd GROUP BY shingle)
         |SELECT s.doc_id, count(*)::BIGINT AS n_shingles,
         |       sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_first,
         |       round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::DOUBLE
         |             / count(*), 4) AS novelty_r
         |FROM shd s JOIN fi f USING (shingle) GROUP BY s.doc_id""".stripMargin,
    // containment twin: same candidate chain, score inter / least sizes
    "dedup_containment" ->
      s"""WITH ${shinglesCte},
         |keptsh AS (SELECT shingle FROM shd GROUP BY shingle HAVING count(*) <= 1000),
         |shk AS (SELECT doc_id, shingle FROM shd JOIN keptsh USING (shingle)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |          FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, round(i::DOUBLE / least(sa.sz, sb.sz), 4) AS cont_r
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |WHERE i::DOUBLE / least(sa.sz, sb.sz) >= 0.9""".stripMargin,
    "dedup_minhash_sig" -> {
      val mins = (0 until 8).map(i =>
        s"min(${TextHash.mixSql(i, "h")}) AS s$i").mkString(", ")
      s"""WITH ${shinglesCte},
         |shh AS (SELECT doc_id, ${tokenHashSqlInner("shingle")} AS h FROM shd)
         |SELECT doc_id, $mins FROM shh GROUP BY doc_id""".stripMargin
    },
    "dedup_minhash_lsh" ->
      s"""WITH ${lshCtes}
         |SELECT a_id, b_id, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jac_r
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8""".stripMargin,
    // incremental twin: the FULL LSH pipeline restricted to pairs touching
    // the batch — the restriction IS the incremental contract, so the hash
    // gate proves probe-side candidates lose nothing
    "dedup_minhash_incr" ->
      s"""WITH ${lshCtes}
         |SELECT a_id, b_id, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jac_r
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8
         |  AND (a_id % 2 = 0 OR b_id % 2 = 0)""".stripMargin,
    "dedup_clusters" ->
      // transitive closure of the symmetrized LSH pair graph; cluster_id =
      // min doc_id in the component (bit-exact integer semantics, same as
      // the Spark min-label propagation fixpoint)
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
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
         |SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u""".stripMargin,
    // canonical twin: the clusters closure + quality argmax per cluster
    "dedup_canonical" ->
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
         |qual AS (SELECT doc_id,
         |  round(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
         |    ELSE 0.0 END, 4) AS q
         |  FROM documents),
         |mem AS (SELECT cluster_id, count(*)::BIGINT AS members FROM cl GROUP BY cluster_id)
         |SELECT cluster_id, canonical_id, q_r, members FROM (
         |  SELECT cl.cluster_id, cl.doc_id AS canonical_id, round(qual.q, 4) AS q_r,
         |         row_number() OVER (PARTITION BY cl.cluster_id
         |                            ORDER BY qual.q DESC, cl.doc_id ASC) AS pick
         |  FROM cl JOIN qual USING (doc_id)
         |) JOIN mem USING (cluster_id) WHERE pick = 1""".stripMargin,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash_pairs" ->
      s"""WITH sh AS ($simhashSql)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    "dedup_embedding" ->
      s"""SELECT a_id, b_id, round(cos, 4) AS cos_r FROM (
         |  SELECT x.vec_id AS a_id, y.vec_id AS b_id,
         |         ${cosSql("x.embedding", "y.embedding")} AS cos
         |  FROM embeddings x JOIN embeddings y
         |    ON x.label = y.label AND x.vec_id < y.vec_id)
         |WHERE cos >= 0.4""".stripMargin,
    // APSS twin: brute-force all-pairs cosine over the same doc sample —
    // no prefix filter here, so equality proves candidate completeness
    "dedup_apss" ->
      s"""WITH ${termsCte}, ${postCte},
         |p AS (SELECT * FROM post WHERE doc_id % 5 = 0),
         |nrm AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM p GROUP BY doc_id),
         |w AS (SELECT p.doc_id, p.term, p.tf / n.nrm AS w
         |      FROM p JOIN nrm n USING (doc_id)),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                 sum(a.w * b.w) AS sim
         |          FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, round(sim, 4) AS sim_r
         |FROM pairs WHERE sim >= 0.85""".stripMargin,
    // duplicated-segment twin: the text_chunks chain at window=stride=3,
    // segments keyed by sha256, same ≥2 duplication rule
    "dedup_segments" -> {
      val (w, st) = (3, 3)
      s"""WITH tk AS (SELECT doc_id,
         |  list_filter(${Analyzer.sqlTokens("text")}, t -> t <> '') AS arr FROM documents),
         |stt AS (SELECT doc_id, arr, len(arr) AS l,
         |        unnest(range(0, greatest(len(arr), 1), $st)) AS s FROM tk),
         |ch AS (SELECT doc_id,
         |         sha256(array_to_string(list_slice(arr, s + 1, least(s + $w, l)), ' ')) AS seg
         |       FROM stt WHERE s = 0 OR s - $st + $w < l),
         |cn AS (SELECT seg, count(*)::BIGINT AS n FROM ch GROUP BY seg),
         |agg AS (SELECT doc_id, count(*)::BIGINT AS n_segs,
         |               sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
         |        FROM ch JOIN cn USING (seg) GROUP BY doc_id)
         |SELECT doc_id, n_segs, n_dup,
         |       round(n_dup::DOUBLE / n_segs, 4) AS dup_frac_r FROM agg""".stripMargin
    },
    // winnowing twin: positional 3-shingle hashes, 4-hash window minima
    // (full windows only), distinct fingerprints, pruned self-join
    "dedup_winnow" ->
      s"""WITH ${tokArrCte},
         |shp AS (SELECT doc_id, i AS pos, arr[i + 1] || ' ' || arr[i + 2] || ' ' || arr[i + 3] AS sh
         |        FROM (SELECT doc_id, arr, unnest(range(greatest(len(arr) - 2, 0))) AS i
         |              FROM tokarr)),
         |shh AS (SELECT doc_id, pos, ${tokenHashSqlInner("sh")} AS h FROM shp),
         |wmin AS (SELECT doc_id,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
         |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
         |  FROM shh),
         |fps AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE cnt = 4),
         |kept AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 1000),
         |fk AS (SELECT doc_id, fp FROM fps JOIN kept USING (fp))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS shared
         |FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2""".stripMargin,
    // mirror twin: per-repo distinct shingles, hot-shingle prune on the
    // candidate side only (sizes stay unpruned, exactly as the operator)
    "dedup_mirrors" ->
      s"""WITH ${shinglesCte},
         |rs AS (SELECT DISTINCT d.source AS repo, s.shingle
         |       FROM shd s JOIN documents d USING (doc_id)),
         |kept AS (SELECT rs.repo, rs.shingle FROM rs JOIN (
         |           SELECT shingle FROM rs GROUP BY shingle
         |           HAVING count(*) <= 15) k USING (shingle)),
         |sizes AS (SELECT repo, count(*)::BIGINT AS sz FROM rs GROUP BY repo),
         |p AS (SELECT a.repo AS repo_a, b.repo AS repo_b, count(*)::BIGINT AS inter
         |      FROM kept a JOIN kept b
         |           ON a.shingle = b.shingle AND a.repo < b.repo
         |      GROUP BY 1, 2)
         |SELECT repo_a, repo_b, inter,
         |       (sa.sz + sb.sz - inter)::BIGINT AS uni,
         |       round(inter::DOUBLE / (sa.sz + sb.sz - inter), 4) AS jacc_r
         |FROM p JOIN sizes sa ON repo_a = sa.repo
         |       JOIN sizes sb ON repo_b = sb.repo
         |WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.05""".stripMargin
  )
}
