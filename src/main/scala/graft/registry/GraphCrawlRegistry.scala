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

/** crawl frontier/recrawl, link-graph ranks (PageRank/TrustRank/HITS/SALSA/OPIC), anchors, politeness. */
private[graft] object GraphCrawlRegistry extends QueryRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2: recursive crawl frontier — iterative BFS (join + left_anti visited)
    // over a deterministic synthetic link graph; DuckDB twin is a recursive CTE
    "ft_crawl_frontier" -> ((s, dir) => {
      import s.implicits._
      val (c, t) = index(s, dir)
      graft.corpus.Crawl.frontier(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), Seq(0L).toDF("doc_id"), maxDepth = 8)
    }),
    // Recrawl delta: added/removed/changed/unchanged between two corpus
    // versions by sha256 — hashes only cross the join, content never moves
    "ft_recrawl_delta" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val old = c.select("doc_id", "content")
      val kept = old.filter(col("doc_id") % 17 =!= 0)
        .withColumn("content", when(col("doc_id") % 13 === 0,
          concat(col("content"), lit(" updated"))).otherwise(col("content")))
      val added = old.filter(col("doc_id") % 23 === 0)
        .select((col("doc_id") + t.nDocs).as("doc_id"),
          concat(lit("new page "), col("doc_id").cast("string")).as("content"))
      graft.corpus.Crawl.recrawlDelta(old, kept.unionByName(added))
    }),
    // Per-site change rates from one recrawl interval (Cho & Garcia-Molina
    // Poisson MLE): the recrawl scheduler's priority signal
    "ft_recrawl_rate" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val old = c.select("doc_id", "repo", "content")
      val kept = old.filter(col("doc_id") % 17 =!= 0)
        .withColumn("content", when(col("doc_id") % 13 === 0,
          concat(col("content"), lit(" updated"))).otherwise(col("content")))
      val added = old.filter(col("doc_id") % 23 === 0)
        .select((col("doc_id") + t.nDocs).as("doc_id"), col("repo"),
          concat(lit("new page "), col("doc_id").cast("string")).as("content"))
      graft.corpus.Crawl.changeRates(old, kept.unionByName(added).select("doc_id", "content"))
    }),
    // Link-graph authority ranking: fixed-point PageRank (3 power
    // iterations, BIGINT mass units — order-independent sums, hash-exact
    // vs the unrolled-CTE twin) over the deterministic crawl edge graph
    "ft_pagerank" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val pr = graft.corpus.LinkRank.pagerank(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        t.nDocs, iters = 3)
      graft.corpus.LinkRank.topK(pr, 20)
    }),
    // TrustRank: teleport only to the trusted seed set (doc_id % 17 = 0)
    // — spam-farm pages unreachable from seeds score exactly 0
    "ft_trustrank" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val seeds = c.select("doc_id").filter(col("doc_id") % 17 === 0)
      val nSeeds = seeds.count()
      val pr = graft.corpus.LinkRank.trustRank(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        seeds, nSeeds, iters = 3)
      graft.corpus.LinkRank.topK(pr, 20)
    }),
    // Composition: the crawl dispatcher — per-host politeness queues
    // ordered by OPIC importance (what the frontier actually fetches next)
    "ft_crawl_priority" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val imp = graft.corpus.LinkRank.opic(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        t.nDocs, iters = 3)
      val frontier = c.select(col("doc_id"), col("repo").as("host"), col("path"))
        .join(imp.select(col("doc_id"), col("importance").as("priority")), "doc_id")
      graft.corpus.Crawl.politeSchedule(frontier, limit = 100)
    }),
    // OPIC crawl prioritization (Abiteboul): cash/history fixed point in
    // BIGINT; importance = history + cash after 3 synchronized rounds
    "ft_opic" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val imp = graft.corpus.LinkRank.opic(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        t.nDocs, iters = 3)
      graft.corpus.LinkRank.topK(
          imp.select(col("doc_id"), col("importance").as("pr")), 20)
        .select(col("rank"), col("doc_id"), col("pr").as("importance"))
    }),
    // SALSA authorities (Lempel & Moran): degree-normalized HITS without
    // the TKC bias — two integer divisions per round, BIGINT-exact
    "ft_salsa" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val a = graft.corpus.LinkRank.salsa(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"), iters = 2)
      graft.corpus.LinkRank.topK(a.select(col("doc_id"), col("auth").as("pr")), 20)
        .select(col("rank"), col("doc_id"), col("pr").as("auth"))
    }),
    // robots.txt gate with RFC 9309 longest-match semantics: the deeper
    // allow overrides the shallower disallow; unmatched paths pass
    "ft_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val (c, _) = index(s, dir)
      val rules = c.select(col("repo")).distinct()
        .crossJoin(Seq(("doc/1", 0L), ("doc/12", 1L)).toDF("prefix", "allow"))
      graft.corpus.Crawl.robotsFilter(
        c.select("doc_id", "repo", "path"), rules)
    }),
    // Co-citation related-pages: pairs cited together, hot-citer pruned
    "ft_cocitation" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val pairs = graft.corpus.LinkRank.cocitation(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs))
      pairs.orderBy(desc("cocite"), col("a_id"), col("b_id")).limit(25)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("cocite"), col("a_id"), col("b_id"))).cast("long"))
        .select(col("rank"), col("a_id"), col("b_id"), col("cocite"))
    }),
    // Bibliographic coupling: pages CITING the same targets (the dual of
    // co-citation — swapped edge orientation, in-degree prune)
    "ft_coupling" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val pairs = graft.corpus.LinkRank.coupling(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs))
      pairs.orderBy(desc("couple"), col("a_id"), col("b_id")).limit(25)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("couple"), col("a_id"), col("b_id"))).cast("long"))
        .select(col("rank"), col("a_id"), col("b_id"), col("couple"))
    }),
    // HITS hubs/authorities over the same link graph (fixed-point BIGINT,
    // two join+agg passes per iteration)
    "ft_hits" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      val ah = graft.corpus.LinkRank.hits(
        graft.corpus.Crawl.syntheticEdges(c, t.nDocs), c.select("doc_id"),
        iters = 2)
      graft.corpus.LinkRank.hitsTopK(ah, 20)
    }),
    // Anchor-text postings: link text counts toward the TARGET page (one
    // explode + hash aggregate shuffled on (dst, term))
    "ft_anchor_postings" -> ((s, dir) => {
      val (c, t) = index(s, dir)
      graft.corpus.Anchors.anchorPostings(
        graft.corpus.Anchors.syntheticAnchors(c, t.nDocs))
    }),
    // Anchor-blended ranking: body postings + in-link anchor field (w=3),
    // scored through the shared BM25F build/score split over the CACHED
    // anchor-eff index artifact (build/query split like bm25fEff)
    "ft_anchor_search" -> ((s, dir) => {
      val (_, t) = index(s, dir)
      Search.bm25fTopKFromPostings(anchorEff(s, dir), q2, t.nDocs, k = 10)
        .select(col("rank"), col("doc_id"), round(col("score"), 4).as("score_r"))
    }),
    // Politeness scheduler: ≤ 1 fetch per host per slot (Mercator crawl-
    // delay discipline) over a deterministic synthetic frontier
    "ft_crawl_polite" -> ((s, dir) => {
      val (c, _) = index(s, dir)
      graft.corpus.Crawl.politeSchedule(
        c.select(col("repo").as("host"), col("path"),
          (col("doc_id") % 100).as("priority")), limit = 100)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ft_crawl_frontier" ->
      """WITH RECURSIVE walk(doc_id, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS doc_id, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT e.dst, w.depth + 1
        |  FROM walk w JOIN (
        |    SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT count(*) FROM documents) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 3 + 7) % (SELECT count(*) FROM documents)
        |    FROM documents) e
        |  ON e.src = w.doc_id
        |  WHERE w.depth < 8
        |)
        |SELECT doc_id, min(depth) AS depth FROM walk GROUP BY doc_id""".stripMargin,
    "ft_recrawl_delta" ->
      """WITH old AS (SELECT doc_id, text AS content FROM documents),
        |nn AS (SELECT count(*) AS n FROM documents),
        |kept AS (SELECT doc_id,
        |           CASE WHEN doc_id % 13 = 0 THEN content || ' updated' ELSE content END AS content
        |         FROM old WHERE doc_id % 17 <> 0),
        |added AS (SELECT doc_id + (SELECT n FROM nn) AS doc_id,
        |                 'new page ' || doc_id AS content
        |          FROM old WHERE doc_id % 23 = 0),
        |newv AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
        |a AS (SELECT doc_id, sha256(content) AS so FROM old),
        |b AS (SELECT doc_id, sha256(content) AS sn FROM newv)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |       CASE WHEN a.doc_id IS NULL THEN 'added'
        |            WHEN b.doc_id IS NULL THEN 'removed'
        |            WHEN so = sn THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin,
    // recrawl-rate twin: the kept/changed synthesis replicated (deleted
    // %17, changed %13 — added pages join to nothing), same Poisson MLE
    "ft_recrawl_rate" ->
      s"""WITH c AS (SELECT source AS repo,
         |             count(*) FILTER (WHERE doc_id % 17 <> 0)::BIGINT AS n_common,
         |             count(*) FILTER (WHERE doc_id % 17 <> 0 AND doc_id % 13 = 0)::BIGINT AS n_changed
         |           FROM documents GROUP BY source)
         |SELECT repo, n_common, n_changed,
         |       round(n_changed::DOUBLE / n_common::DOUBLE, 4) AS change_frac_r,
         |       CASE WHEN n_changed = n_common THEN NULL
         |            ELSE round(-ln(1.0 - n_changed::DOUBLE / n_common::DOUBLE), 4)
         |       END AS lambda_r
         |FROM c""".stripMargin,
    "ft_pagerank" ->
      s"""WITH $pagerankCtes
         |SELECT rank, doc_id, pr FROM (
         |  SELECT row_number() OVER (ORDER BY pr DESC, doc_id ASC) AS rank, doc_id, pr
         |  FROM p3) WHERE rank <= 20""".stripMargin,
    // TrustRank twin: pagerank chain with the teleport gated by the seed
    // flag and divided by |seeds| instead of N
    "ft_trustrank" -> {
      val S = "1000000000000"
      val tele = s"(15 * ($S // (SELECT k FROM sk))) // 100"
      def iter(prev: String, cur: String) =
        s"""$cur AS (SELECT b.doc_id,
           |  CAST(b.is_seed * ($tele) + (85 * coalesce(s.acc, 0)) // 100 AS BIGINT) AS pr
           |  FROM sbase b LEFT JOIN (
           |    SELECT e.dst AS doc_id, sum(p.pr // o.odeg) AS acc
           |    FROM $prev p JOIN odeg o ON p.doc_id = o.src
           |         JOIN edges e ON p.doc_id = e.src
           |    GROUP BY e.dst) s USING (doc_id))""".stripMargin
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |edges AS (
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM nn) AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM nn) FROM documents),
         |odeg AS (SELECT src, count(*)::BIGINT AS odeg FROM edges GROUP BY src),
         |sbase AS (SELECT doc_id,
         |            CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END::BIGINT AS is_seed
         |          FROM nodes),
         |sk AS (SELECT sum(is_seed)::BIGINT AS k FROM sbase),
         |p0 AS (SELECT doc_id,
         |         CAST(is_seed * ($S // (SELECT k FROM sk)) AS BIGINT) AS pr
         |       FROM sbase),
         |${iter("p0", "p1")},
         |${iter("p1", "p2")},
         |${iter("p2", "p3")}
         |SELECT rank, doc_id, pr FROM (
         |  SELECT row_number() OVER (ORDER BY pr DESC, doc_id ASC) AS rank, doc_id, pr
         |  FROM p3) WHERE rank <= 20""".stripMargin
    },
    // crawl-priority twin: OPIC importance feeding the same per-host
    // politeness window
    "ft_crawl_priority" ->
      s"""WITH $opicCtes,
         |imp AS (SELECT h.doc_id, (h.hist + c.cash)::BIGINT AS priority
         |        FROM oh3 h JOIN oc3 c USING (doc_id)),
         |f AS (SELECT d.doc_id, d.source AS host, 'doc/' || d.doc_id::VARCHAR AS path,
         |             i.priority
         |      FROM documents d JOIN imp i USING (doc_id)),
         |sch AS (SELECT host, path, priority,
         |          row_number() OVER (PARTITION BY host
         |            ORDER BY priority DESC, path ASC)::BIGINT AS slot
         |        FROM f)
         |SELECT slot, host, path, priority FROM sch
         |ORDER BY slot ASC, host ASC, path ASC LIMIT 100""".stripMargin,
    // OPIC twin: the identical BIGINT cash/history recurrence unrolled,
    // incl. the (vacuous on this graph) dangling-share division
    "ft_opic" ->
      s"""WITH $opicCtes
         |SELECT rank, doc_id, importance FROM (
         |  SELECT row_number() OVER (ORDER BY h.hist + c.cash DESC, h.doc_id ASC) AS rank,
         |         h.doc_id, (h.hist + c.cash)::BIGINT AS importance
         |  FROM oh3 h JOIN oc3 c USING (doc_id)) WHERE rank <= 20""".stripMargin,
    // SALSA twin: identical two-division recurrence unrolled
    "ft_salsa" -> {
      def iter(i: Int) =
        s"""bk$i AS (SELECT a.doc_id AS k, a.auth // ii.ideg AS share
           |         FROM sa${i - 1} a JOIN ideg ii ON a.doc_id = ii.dst),
           |hb$i AS (SELECT h.src, h.hubm // oo.odeg AS hshare FROM (
           |           SELECT e.src, sum(b.share) AS hubm
           |           FROM edges e JOIN bk$i b ON e.dst = b.k GROUP BY e.src
           |         ) h JOIN odeg oo ON h.src = oo.src),
           |sa$i AS (SELECT n.doc_id, coalesce(x.acc, 0)::BIGINT AS auth
           |         FROM nodes n LEFT JOIN (
           |           SELECT e.dst AS doc_id, sum(h.hshare) AS acc
           |           FROM edges e JOIN hb$i h ON e.src = h.src GROUP BY e.dst
           |         ) x USING (doc_id))""".stripMargin
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |edges AS (
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM nn) AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM nn) FROM documents),
         |ideg AS (SELECT dst, count(*)::BIGINT AS ideg FROM edges GROUP BY dst),
         |odeg AS (SELECT src, count(*)::BIGINT AS odeg FROM edges GROUP BY src),
         |sa0 AS (SELECT doc_id, (1000000000000 // (SELECT n FROM nn))::BIGINT AS auth FROM nodes),
         |${iter(1)},
         |${iter(2)}
         |SELECT rank, doc_id, auth FROM (
         |  SELECT row_number() OVER (ORDER BY auth DESC, doc_id ASC) AS rank, doc_id, auth
         |  FROM sa2) WHERE rank <= 20""".stripMargin
    },
    // robots twin: same prefix join, same longest-match allow-wins window
    "ft_robots_filter" ->
      s"""WITH f AS (SELECT doc_id, source AS repo, 'doc/' || doc_id::VARCHAR AS path FROM documents),
         |r AS (SELECT DISTINCT source AS repo, prefix, allow FROM documents,
         |        (VALUES ('doc/1', 0), ('doc/12', 1)) AS t(prefix, allow)),
         |m AS (SELECT doc_id, allow FROM (
         |        SELECT f.doc_id, r.allow,
         |               row_number() OVER (PARTITION BY f.doc_id
         |                 ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
         |        FROM f JOIN r ON f.repo = r.repo AND starts_with(f.path, r.prefix)
         |      ) WHERE rn = 1)
         |SELECT f.doc_id, f.repo, f.path, coalesce(m.allow, 1)::BIGINT AS allowed
         |FROM f LEFT JOIN m USING (doc_id)""".stripMargin,
    "ft_cocitation" ->
      s"""WITH ccn AS (SELECT count(*) AS n FROM documents),
         |cce AS (SELECT DISTINCT src, dst FROM (
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM ccn) AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM ccn) FROM documents)),
         |ccdeg AS (SELECT src FROM cce GROUP BY src HAVING count(*) <= 64),
         |cck AS (SELECT cce.src, cce.dst FROM cce JOIN ccdeg USING (src)),
         |ccp AS (SELECT a.dst AS a_id, b.dst AS b_id, count(*)::BIGINT AS cocite
         |        FROM cck a JOIN cck b ON a.src = b.src AND a.dst < b.dst
         |        GROUP BY a.dst, b.dst)
         |SELECT rank, a_id, b_id, cocite FROM (
         |  SELECT row_number() OVER (ORDER BY cocite DESC, a_id ASC, b_id ASC) AS rank,
         |         a_id, b_id, cocite FROM ccp
         |) WHERE rank <= 25""".stripMargin,
    // the dual twin: prune on IN-degree, pair the citing SOURCES per target
    "ft_coupling" ->
      s"""WITH ccn AS (SELECT count(*) AS n FROM documents),
         |cce AS (SELECT DISTINCT src, dst FROM (
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT n FROM ccn) AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM ccn) FROM documents)),
         |ccdeg AS (SELECT dst FROM cce GROUP BY dst HAVING count(*) <= 64),
         |cck AS (SELECT cce.src, cce.dst FROM cce JOIN ccdeg USING (dst)),
         |ccp AS (SELECT a.src AS a_id, b.src AS b_id, count(*)::BIGINT AS couple
         |        FROM cck a JOIN cck b ON a.dst = b.dst AND a.src < b.src
         |        GROUP BY a.src, b.src)
         |SELECT rank, a_id, b_id, couple FROM (
         |  SELECT row_number() OVER (ORDER BY couple DESC, a_id ASC, b_id ASC) AS rank,
         |         a_id, b_id, couple FROM ccp
         |) WHERE rank <= 25""".stripMargin,
    "ft_hits" ->
      s"""WITH $hitsCtes
         |SELECT rank, doc_id, auth, hub FROM (
         |  SELECT row_number() OVER (ORDER BY a.s DESC, a.doc_id ASC) AS rank,
         |         a.doc_id, a.s AS auth, h.s AS hub
         |  FROM a2 a JOIN h2 h USING (doc_id)) WHERE rank <= 20""".stripMargin,
    "ft_anchor_postings" ->
      s"""WITH ${tokArrCte},
         |$anchorCtes
         |SELECT doc_id, term, atf FROM ap""".stripMargin,
    "ft_anchor_search" ->
      s"""WITH ${termsCte}, ${postCte}, ${tokArrCte},
         |$anchorCtes,
         |eff AS (SELECT coalesce(p.doc_id, ap.doc_id) AS doc_id,
         |               coalesce(p.term, ap.term) AS term,
         |               coalesce(p.tf, 0) + 3 * coalesce(ap.atf, 0) AS tf
         |        FROM post p FULL OUTER JOIN ap ON p.doc_id = ap.doc_id AND p.term = ap.term),
         |ds2 AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM eff GROUP BY doc_id),
         |ts2 AS (SELECT term, count(*)::BIGINT AS df FROM eff GROUP BY term),
         |st2 AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         |               (SELECT avg(dl) FROM ds2) AS avgdl),
         |${qCte(q2)},
         |scored AS (
         |  SELECT e.doc_id, count(*) AS n_terms,
         |         sum(${Bm25.sql("e.tf", "t.df", "d.dl", "s.n", "s.avgdl")}) AS score
         |  FROM eff e JOIN q USING (term) JOIN ts2 t USING (term)
         |       JOIN ds2 d ON e.doc_id = d.doc_id, st2 s
         |  GROUP BY e.doc_id)
         |SELECT rank, doc_id, score_r FROM (
         |  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         |         doc_id, round(score, 4) AS score_r
         |  FROM scored WHERE n_terms = ${q2.size}
         |) WHERE rank <= 10""".stripMargin,
    // politeness twin: same per-host rank → slot, same dispatch order
    "ft_crawl_polite" ->
      """WITH f AS (SELECT source AS host, 'doc/' || doc_id AS path,
        |             (doc_id % 100)::BIGINT AS priority FROM documents),
        |r AS (SELECT host, path, priority,
        |        row_number() OVER (PARTITION BY host
        |          ORDER BY priority DESC, path ASC)::BIGINT AS slot FROM f)
        |SELECT slot, host, path, priority FROM r
        |ORDER BY slot ASC, host ASC, path ASC LIMIT 100""".stripMargin
  )
}
