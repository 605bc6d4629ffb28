package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props) — the operators a crawl/usage telemetry feed
  * needs at 100 TB, each written ONCE as a Column/Dataset plan that runs
  * identically in batch and in Structured Streaming (brief §streams:
  * readStream → transforms → writeStream; watermarks + windowed aggs;
  * flatMapGroupsWithState for custom state).
  *
  * Determinism: money amounts aggregate as integer cents
  * (`round(value*100)::BIGINT`) so every sum is order-independent and
  * hash-exact across engines and parallelism levels — the same fixed-point
  * device as LinkRank's BIGINT mass units. A double `sum(value)` would
  * differ in the last ulp between partitionings.
  */
object Events {

  def read(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** integer money units: exact, order-independent sums */
  private def centsCol = round(col("value") * 100).cast("long")

  /** pandas-written parquet carries TIMESTAMP_NTZ; `unix_micros`/`window`
    * want TIMESTAMP. The session runs UTC, so the cast is the identity
    * wall-clock mapping (and matches DuckDB's naive-as-UTC `epoch_us`). */
  private def withTsLtz(events: DataFrame): DataFrame =
    events.withColumn("ts", col("ts").cast("timestamp"))

  /** Tumbling event-time window aggregate per event_type: (w_start_us,
    * event_type, n_events, sum_cents). The SAME plan serves batch and
    * streaming — a streaming caller adds `withWatermark("ts", ...)` upstream
    * and gets incremental state-store aggregation; a batch caller gets one
    * shuffle-partial hash aggregate. Window starts are epoch-aligned
    * (Spark `window()` ≡ `date_trunc` for whole-unit durations), emitted as
    * epoch micros so the cross-engine compare never touches timestamp tz
    * representation.
    *
    * Scale shape: keys are (window × type) — bounded cardinality per hour,
    * so state (streaming) and the shuffle (batch) stay tiny regardless of
    * event volume; partial aggregation absorbs the per-row work map-side. */
  def windowedAgg(events: DataFrame, win: String = "1 hour"): DataFrame =
    withTsLtz(events)
      .withColumn("cents", centsCol)
      .groupBy(window(col("ts"), win).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
        col("n_events"), col("sum_cents"))

  /** Burst detection over the event stream (trend/ops alerting): hour
    * buckets per event_type, flagged when a bucket's count exceeds
    * `factor`× the trailing mean of the previous `w` OBSERVED buckets. The
    * test is kept entirely in BIGINT (cnt·w > factor·trailΣ — the mean is
    * never materialized as a float), so the flag is hash-exact across
    * engines and parallelism levels. Buckets with fewer than `w`
    * predecessors stay unflagged (cold start). The trailing frame is
    * rows-based — the w preceding observed buckets, not wall-clock hours:
    * an empty hour emits no bucket row, so a quiet gap does not dilute the
    * baseline (the conservative choice for alerting). Cost: one hash
    * aggregate + one shuffle on event_type with an in-partition ordered
    * frame scan; per-type bucket counts are hours-per-retention-window
    * small, so the window sort never spills. */
  def bursts(events: DataFrame, w: Int = 6, factor: Int = 2): DataFrame = {
    val win = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-w, -1)
    withTsLtz(events)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("trail", coalesce(sum(col("cnt")).over(win), lit(0L)))
      .withColumn("nprev", count(col("cnt")).over(win))
      .select(col("event_type"), unix_micros(col("bucket")).as("bucket_us"),
        col("cnt"), col("trail"),
        (col("nprev") === w && col("cnt") * w > lit(factor) * col("trail")).as("is_burst"))
  }

  /** Gap-rule sessionization (batch): a new session starts when a user is
    * idle longer than `gapMin` minutes. One shuffle on user_id + an in-
    * partition sort — the canonical distributed sessionize; no per-user
    * arrays, no collect. Ties on ts break by event_id so the fold is total-
    * ordered and cross-engine identical. */
  def sessionize(events: DataFrame, gapMin: Int = 30): DataFrame = {
    val gapUs = gapMin * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val isNew = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapUs, 1L).otherwise(0L)
    withTsLtz(events).withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: (user_id, session_idx, n_events, t_start_us,
    * t_end_us). Batch twin of [[sessionizeStream]]. */
  def sessions(events: DataFrame, gapMin: Int = 30): DataFrame =
    sessionize(events, gapMin)
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("t_start_us"),
        unix_micros(max(col("ts"))).as("t_end_us"))

  /** Semi-structured props handling: extract a typed field from the JSON
    * `props` column and roll it up per event_type — the "schema-on-read"
    * step every telemetry pipeline runs. `get_json_object` is a codegen'd
    * expression (no UDF); all aggregates are BIGINT (count/sum/min/max of
    * an integer field), so the rollup is order-independent and hash-exact.
    * Rows whose props lack the field aggregate as NULL-skipped (count `n`
    * still counts them — the distinction is part of the contract). */
  def propsRollup(events: DataFrame, field: String = "k"): DataFrame = {
    val k = get_json_object(col("props"), s"$$.$field").cast("long")
    events.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
  }

  // ---- streaming form (flatMapGroupsWithState) --------------------------

  /** Per-user session state carried across micro-batches. */
  case class SessState(lastTsUs: Long, sessionIdx: Long, nEvents: Long, startUs: Long)
  /** One (upsert) output row per session touched in a micro-batch. */
  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
                        t_start_us: Long, t_end_us: Long)

  /** Pure per-user fold shared by the streaming path and its tests: advance
    * `prev` state over time-sorted event micros, returning the rollup of
    * every session TOUCHED (created or extended) plus the new state.
    * Touched-session rows are upserts — a later batch may re-emit a session
    * with higher n_events; consumers keep the latest row per
    * (user_id, session_idx), exactly the contract of every Update-mode
    * streaming aggregate. */
  def advanceSessions(userId: Long, prev: Option[SessState], tsSortedUs: Seq[Long],
                      gapUs: Long): (Vector[SessionOut], Option[SessState]) = {
    var st = prev
    var touched = scala.collection.immutable.SortedMap.empty[Long, SessionOut]
    tsSortedUs.foreach { ts =>
      st = st match {
        case None                                 => Some(SessState(ts, 1L, 1L, ts))
        case Some(s) if ts - s.lastTsUs > gapUs   => Some(SessState(ts, s.sessionIdx + 1, 1L, ts))
        case Some(s)                              =>
          // in-order: advance lastTs. LATE (ts < lastTs, cross-batch
          // stragglers): merge into the open session WITHOUT rewinding
          // lastTs — state is monotone, so a later in-order event can
          // never be tricked into a spurious split; the session's start
          // extends backward to cover the straggler, CLAMPED at
          // lastTs - gapUs. The clamp guarantees sessions never overlap:
          // session N opened > gapUs after session N-1's end, so
          // lastTs - gapUs can never precede N-1's t_end_us.
          Some(s.copy(lastTsUs = math.max(ts, s.lastTsUs),
            nEvents = s.nEvents + 1,
            startUs = math.max(math.min(ts, s.startUs), s.lastTsUs - gapUs)))
      }
      val s = st.get
      touched += s.sessionIdx ->
        SessionOut(userId, s.sessionIdx, s.nEvents, s.startUs, s.lastTsUs)
    }
    (touched.values.toVector, st)
  }

  /** Streaming sessionization: `flatMapGroupsWithState` keyed on user_id,
    * state = the open session's (lastTs, idx, count, start). Emits upsert
    * rows per touched session each micro-batch (Update semantics).
    *
    * Ordering contract: events are sorted by ts WITHIN each micro-batch
    * (bounded by per-user-per-batch volume — fine for any realistic trigger
    * interval), and batches should arrive in coarse time order (true for a
    * time-partitioned file/log source). Cross-batch stragglers (an event
    * older than the open session's lastTs) MERGE into the open session:
    * state is monotone (lastTs never rewinds), so a straggler can neither
    * split the ongoing session nor corrupt a closed one — its session
    * assignment may differ from the all-data batch answer (the straggler
    * might have belonged to an earlier session), which is the standard
    * best-effort contract; a source with heavy reordering needs an
    * event-time buffer + watermark in front. The backward extension of
    * t_start_us is clamped at lastTs - gapUs, so emitted session intervals
    * never overlap: consumers may rely on [t_start_us, t_end_us] ranges
    * being disjoint per user. */
  def sessionizeStream(events: DataFrame, gapMin: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMin * 60L * 1000000L
    events.select(col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[(Long, Long)], state: GroupState[SessState]) => {
          val (out, st) = advanceSessions(uid, state.getOption, it.map(_._2).toVector.sorted, gapUs)
          st.foreach(state.update)
          out.iterator
        })
  }

  /** Retention cohorts — the product-analytics staple: users grouped by
    * FIRST-activity day, counted on each subsequent day k they return
    * (0 ≤ k ≤ maxDays). Day arithmetic stays in epoch-microsecond BIGINTs
    * (day diff = exact multiple of 86,400,000,000), so the cohort matrix is
    * hash-exact across engines and timezone representations. Scale shape:
    * one distinct (user, day) pass, one min per user, one co-partitioned
    * user join — the output is |cohorts| × maxDays rows regardless of
    * event volume. */
  def retention(events: DataFrame, maxDays: Int = 7): DataFrame = {
    val act = withTsLtz(events)
      .select(col("user_id"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .distinct()
    val first = act.groupBy("user_id").agg(min("day_us").as("cohort_us"))
    act.join(first, "user_id")
      .withColumn("k",
        ((col("day_us") - col("cohort_us")) / lit(86400000000L)).cast("long"))
      .filter(col("k") <= maxDays)
      .groupBy("cohort_us", "k")
      .agg(count(lit(1)).as("users")) // act is distinct per (user, day)
  }

  /** Ordered funnel — users completing step i strictly AFTER their step
    * i−1 completion (min-timestamp semantics, the standard strict-order
    * funnel). Each stage is one event-type-filtered join + min-aggregate
    * co-partitioned on user_id; no window over the raw event stream, no
    * per-user arrays. Returns (step, event_type, users) — one row per
    * stage. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val e = withTsLtz(events)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    var cur = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("us").as("t"))
    val stages = scala.collection.mutable.ArrayBuffer((1, steps.head, cur))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      cur = e.filter(col("event_type") === st).join(cur, "user_id")
        .filter(col("us") > col("t"))
        .groupBy("user_id").agg(min("us").as("t"))
      stages += ((i + 2, st, cur))
    }
    stages.map { case (i, st, df) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i.toLong).as("step"), lit(st).as("event_type"), col("users"))
    }.reduce(_ unionByName _)
  }

  /** AS-OF join — enrich each left row with the right row of the same key
    * whose timestamp is the GREATEST one ≤ the left row's (inclusive, the
    * "state as of the event" lookup every event pipeline needs against a
    * slowly-changing dimension). Spark has no ASOF operator; the naive
    * range join explodes to O(events × versions) per key. This is the
    * scale-correct union+window form: tag right rows, union, ONE window
    * partitioned by key ordered by (ts, right-first), running
    * last(value, ignoreNulls) — O(n log n) sort inside each key partition,
    * one shuffle total, no row multiplication. Right rows must be unique
    * per (key, ts) (pre-aggregate them); at equal timestamps the right row
    * sorts first, making the match inclusive exactly like DuckDB's
    * `ASOF LEFT JOIN ... ON l.ts >= r.ts`, which is the independent-
    * algorithm oracle that gates this (events_asof).
    *
    * Output: the left rows + `asof_<rightVal>` (null when no right row
    * precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightVal: String): DataFrame = {
    val out = s"asof_$rightVal"
    val r = right.select(col(key), col(ts), lit(1).as("_isr"),
      col(rightVal).as("_rv"))
    val l = left.withColumn("_isr", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col(ts).asc, col("_isr").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    u.withColumn(out, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_isr") === 0)
      .drop("_isr", "_rv")
  }

  /** Daily-volume anomaly flags — the ops monitor every event pipeline
    * runs: per-day event counts z-scored against the whole series
    * (σ = population stddev, the same stddev_pop the NQC operator uses);
    * |z| > threshold flags the day. A constant series (σ = 0) flags
    * nothing. One date aggregate + a broadcast 1-row mean/σ — nothing
    * row-scale after the first aggregate. Output:
    * (day, n_events, z_r, is_anomaly). */
  def dailyAnomaly(events: DataFrame, threshold: Double = 2.0): DataFrame = {
    val daily = events.select(to_date(col("ts")).cast("string").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_events"))
    val stats = daily.agg(avg(col("n_events").cast("double")).as("mu"),
      stddev_pop(col("n_events").cast("double")).as("sigma"))
    daily.crossJoin(broadcast(stats))
      .select(col("day"), col("n_events"),
        round(when(col("sigma") === 0.0, lit(0.0))
          .otherwise((col("n_events").cast("double") - col("mu")) / col("sigma")), 4)
          .as("z_r"))
      .withColumn("is_anomaly",
        (abs(col("z_r")) > lit(threshold)).cast("long"))
  }
}
