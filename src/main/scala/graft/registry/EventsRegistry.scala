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

/** event analytics: windows, sessions, funnels, retention, as-of, bursts, KMV actives, anomalies. */
private[graft] object EventsRegistry extends QueryRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Grouped KMV: daily-active-users without a COUNT DISTINCT shuffle of
    // raw ids — one 32-row sketch per day (WindowGroupLimit heap)
    "events_kmv_daily" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(to_date(col("ts")).cast("string").as("day"),
          col("user_id").cast("string").as("uid"))
      graft.stats.Sketches.kmvDistinctBy(ev, "day", "uid", k = 32)
        .select(col("grp").as("day"), col("k_n"), round(col("est"), 4).as("est_r"))
    }),
    // Daily event-volume anomaly flags (z-score vs the whole series)
    "events_anomaly" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.streaming.Events.dailyAnomaly(ev, threshold = 2.0)
    }),
    // event-time tumbling window aggregate (same plan batch/streaming;
    // integer-cents sums — order-independent, hash-exact)
    "events_window" -> ((s, dir) =>
      graft.streaming.Events.windowedAgg(graft.streaming.Events.read(s, dir))),
    // gap-rule sessionization rollup (batch twin of flatMapGroupsWithState)
    "events_sessions" -> ((s, dir) =>
      graft.streaming.Events.sessions(graft.streaming.Events.read(s, dir))),
    // burst detection: hour buckets vs trailing-6 baseline, BIGINT test
    "events_bursts" -> ((s, dir) =>
      graft.streaming.Events.bursts(graft.streaming.Events.read(s, dir))),
    // AS-OF join: each click enriched with the latest prior purchase (the
    // "dimension state as of the event" lookup); union+window plan gated
    // against DuckDB's NATIVE ASOF JOIN — an independent algorithm
    "events_asof" -> ((s, dir) => {
      val ev = graft.streaming.Events.read(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val dim = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("version"))
      graft.streaming.Events.asofJoin(clicks, dim, "user_id", "ts", "version")
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_version"), lit(-1L)).as("version"))
    }),
    // retention cohorts: first-activity-day matrix, BIGINT day arithmetic
    "events_retention" -> ((s, dir) =>
      graft.streaming.Events.retention(graft.streaming.Events.read(s, dir))),
    // strict-order funnel view -> click -> purchase (min-timestamp chain)
    "events_funnel" -> ((s, dir) =>
      graft.streaming.Events.funnel(graft.streaming.Events.read(s, dir),
        Seq("view", "click", "purchase"))),
    // semi-structured props: JSON field extraction + BIGINT rollup
    "events_props" -> ((s, dir) =>
      graft.streaming.Events.propsRollup(graft.streaming.Events.read(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    // grouped-KMV twin: same (day, hash) distinct, same per-day rank cut,
    // same (k−1)·P/h_k estimator
    "events_kmv_daily" -> {
      val h = TextHash.mixSql(5, tokenHashSqlInner("uid"))
      s"""WITH e AS (SELECT CAST(ts AS DATE)::VARCHAR AS day, user_id::VARCHAR AS uid FROM events),
         |hs AS (SELECT DISTINCT day AS grp, ($h) AS h FROM e),
         |rk AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS r FROM hs),
         |agg AS (SELECT grp, count(*)::BIGINT AS k_n, max(h) AS hk FROM rk WHERE r <= 32 GROUP BY grp)
         |SELECT grp AS day, k_n,
         |       round(CASE WHEN k_n < 32 THEN k_n::DOUBLE
         |                  ELSE 31.0 * ${TextHash.P}.0 / hk::DOUBLE END, 4) AS est_r
         |FROM agg""".stripMargin
    },
    // anomaly twin: same date aggregate, same population σ, flag on the
    // ROUNDED z like the engine
    "events_anomaly" ->
      """WITH d AS (SELECT CAST(ts AS DATE)::VARCHAR AS day, count(*)::BIGINT AS n_events
        |           FROM events GROUP BY 1),
        |st AS (SELECT avg(n_events::DOUBLE) AS mu, stddev_pop(n_events::DOUBLE) AS sigma FROM d),
        |z AS (SELECT day, n_events,
        |        round(CASE WHEN sigma = 0.0 THEN 0.0
        |                   ELSE (n_events::DOUBLE - mu) / sigma END, 4) AS z_r
        |      FROM d, st)
        |SELECT day, n_events, z_r, (abs(z_r) > 2.0)::BIGINT AS is_anomaly FROM z""".stripMargin,
    "events_window" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
        |count(*)::BIGINT AS n_events,
        |sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS nw
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |),
        |s AS (SELECT user_id, ts,
        |        sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM x)
        |SELECT user_id, session_idx::BIGINT AS session_idx, count(*)::BIGINT AS n_events,
        |       epoch_us(min(ts)) AS t_start_us, epoch_us(max(ts)) AS t_end_us
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "events_bursts" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket, count(*)::BIGINT AS cnt
        |           FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, bucket, cnt,
        |        coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
        |          ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS trail,
        |        count(cnt) OVER (PARTITION BY event_type ORDER BY bucket
        |          ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS nprev
        |      FROM b)
        |SELECT event_type, epoch_us(bucket) AS bucket_us, cnt, trail,
        |       (nprev = 6 AND cnt * 6 > 2 * trail) AS is_burst
        |FROM t""".stripMargin,
    // as-of twin: DuckDB's NATIVE ASOF JOIN (inclusive l.ts >= r.ts) — a
    // genuinely different algorithm from the engine's union+window plan
    "events_asof" ->
      """WITH cl AS (SELECT event_id, user_id, ts FROM events
        |            WHERE event_type = 'click'),
        |dim AS (SELECT user_id, ts, max(event_id)::BIGINT AS version
        |        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, coalesce(r.version, -1)::BIGINT AS version
        |FROM cl l ASOF LEFT JOIN dim r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "events_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, epoch_us(date_trunc('day', ts)) AS day_us FROM events),
        |fst AS (SELECT user_id, min(day_us) AS cohort_us FROM act GROUP BY user_id)
        |SELECT f.cohort_us, (a.day_us - f.cohort_us) // 86400000000 AS k,
        |       count(*)::BIGINT AS users
        |FROM act a JOIN fst f USING (user_id)
        |WHERE (a.day_us - f.cohort_us) // 86400000000 <= 7
        |GROUP BY 1, 2""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY e.user_id)
        |SELECT 1::BIGINT AS step, 'view' AS event_type, (SELECT count(*) FROM s1)::BIGINT AS users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin,
    "events_props" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
        |max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k
        |FROM events GROUP BY event_type""".stripMargin
  )
}
