package graft

import graft.streaming.Events
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Event-stream analytics: batch/streaming agreement for the tumbling-window
  * aggregate (watermark + window over readStream) and gap-rule sessionization
  * (flatMapGroupsWithState vs the batch window-function form), plus the pure
  * state-fold's chunk-invariance (the property that makes cross-micro-batch
  * continuation correct). */
class EventsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sfDir = "/root/testdata/sf0.001"
  lazy val events = Events.read(spark, sfDir).cache()

  val GAP_US = 30L * 60 * 1000000

  // scalar recomputation of the session rollups from first principles
  def scalarSessions(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long, Long)] = {
    // rows: (user_id, event_id, ts_us)
    rows.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2)).map(_._3)
      var idx = 0L; var last = Long.MinValue
      var acc = Vector.empty[(Long, Long)] // (session_idx, ts)
      sorted.foreach { ts =>
        if (last == Long.MinValue || ts - last > GAP_US) idx += 1
        acc = acc :+ ((idx, ts)); last = ts
      }
      acc.groupBy(_._1).map { case (si, g) =>
        (uid, si, g.size.toLong, g.map(_._2).min, g.map(_._2).max)
      }
    }.toSet
  }

  lazy val eventTuples: Seq[(Long, Long, Long)] =
    events.select(col("user_id"), col("event_id"), unix_micros(col("ts").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("windowedAgg (batch): counts and integer-cents sums match a scalar recomputation") {
    val got = Events.windowedAgg(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val raw = events.select(unix_micros(col("ts").cast("timestamp")), col("event_type"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = raw.groupBy { case (ts, et, _) => (ts - Math.floorMod(ts, 3600000000L), et) }
      .map { case (k, g) => k -> (g.size.toLong, g.map(_._3).sum) }
    assert(got == want)
  }

  test("windowedAgg: one plan serves batch AND readStream+watermark; outputs identical") {
    val dir = Files.createTempDirectory("graft-ev-win").toString
    try {
      events.coalesce(1).write.mode("overwrite").parquet(dir)
      val stream = spark.readStream.schema(events.schema).parquet(dir)
        .withColumn("ts", col("ts").cast("timestamp")) // watermark needs LTZ
        .withWatermark("ts", "1 hour")
      val q = Events.windowedAgg(stream).writeStream
        .format("memory").queryName("ev_win")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("ev_win").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val want = Events.windowedAgg(events).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want)
    } finally Bench.deleteRec(new java.io.File(dir))
  }

  test("sessions (batch): rollups match the scalar gap-rule fold") {
    val got = Events.sessions(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == scalarSessions(eventTuples))
  }

  test("advanceSessions: chunked folding is split-invariant (state continuation)") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      // event times with a mix of sub-gap and super-gap deltas
      val ts = Iterator.iterate(0L)(t =>
        t + (if (rnd.nextBoolean()) rnd.nextInt(1000000) else GAP_US + 1 + rnd.nextInt(1000000)))
        .take(n).toVector
      val (whole, stW) = Events.advanceSessions(1L, None, ts, GAP_US)
      // split into k chunks, fold with carried state, keep latest per session
      val k = 1 + rnd.nextInt(5)
      val cuts = (Vector(0, n) ++ Vector.fill(k - 1)(rnd.nextInt(n + 1))).sorted
      var st: Option[Events.SessState] = None
      var latest = Map.empty[Long, Events.SessionOut]
      cuts.sliding(2).foreach { case Seq(a, b) =>
        val (out, st2) = Events.advanceSessions(1L, st, ts.slice(a, b), GAP_US)
        st = st2
        out.foreach(o => latest += o.session_idx -> o)
      }
      assert(latest.values.toSet == whole.toSet)
      assert(st == stW)
    }
  }

  test("propsRollup: JSON field extraction matches a scalar recomputation") {
    val got = Events.propsRollup(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val raw = events.select("event_type", "props").collect()
      .map { r =>
        val m = """"k": (-?\d+)""".r.findFirstMatchIn(r.getString(1)).map(_.group(1).toLong)
        (r.getString(0), m)
      }
    raw.groupBy(_._1).foreach { case (et, rows) =>
      val ks = rows.flatMap(_._2)
      assert(got(et) == ((rows.size.toLong, ks.sum, ks.min, ks.max)), s"type $et")
    }
  }

  test("advanceSessions: a late cross-batch straggler merges without rewinding state") {
    val (_, st1) = Events.advanceSessions(1L, None, Vector(100L, 200L), GAP_US)
    val (out2, st2) = Events.advanceSessions(1L, st1, Vector(50L, 250L), GAP_US)
    val s = st2.get
    // straggler (50 < lastTs 200) merged; lastTs NEVER rewound; start extended
    assert(s.sessionIdx == 1L && s.nEvents == 4L && s.lastTsUs == 250L && s.startUs == 50L)
    val last = out2.last
    assert(last.t_start_us == 50L && last.t_end_us == 250L && last.n_events == 4L)
    assert(last.t_start_us <= last.t_end_us)
    // subsequent in-order event within gap of the TRUE lastTs must not split
    val (_, st3) = Events.advanceSessions(1L, st2, Vector(260L), GAP_US)
    assert(st3.get.sessionIdx == 1L)
  }

  test("advanceSessions: backward extension clamps at lastTs - gap (sessions stay disjoint)") {
    val (_, st1) = Events.advanceSessions(1L, None, Vector(0L), GAP_US)       // session 1 ends at 0
    val t2 = GAP_US + 1000000L
    val (_, st2) = Events.advanceSessions(1L, st1, Vector(t2, t2 + 500L), GAP_US)
    assert(st2.get.sessionIdx == 2L)
    // a straggler MORE than gap older than the open session's lastTs merges
    // (state is monotone) but the start extension clamps at lastTs - gap —
    // which by the session-split condition can never precede session 1's end
    val (out3, st3) = Events.advanceSessions(1L, st2, Vector(1L), GAP_US)
    val s = st3.get
    assert(s.sessionIdx == 2L && s.nEvents == 3L)
    assert(s.startUs == (t2 + 500L) - GAP_US)
    assert(s.startUs > 0L, "clamped start must not overlap session 1's end")
    assert(out3.last.t_start_us == s.startUs && out3.last.t_end_us == t2 + 500L)
  }

  test("sessionizeStream (flatMapGroupsWithState) over ordered micro-batches ≡ batch sessions") {
    val dir = Files.createTempDirectory("graft-ev-sess").toString
    try {
      // two time-ordered files → two micro-batches; sessions crossing the
      // file boundary must continue (state), their rollups upserted
      val cut = eventTuples.map(_._3).sorted.apply(eventTuples.size / 2)
      val d0 = new java.io.File(dir, "f0.parquet")
      val d1 = new java.io.File(dir, "f1.parquet")
      def writeOne(df: org.apache.spark.sql.DataFrame, target: java.io.File, mtime: Long): Unit = {
        val tmp = Files.createTempDirectory("graft-ev-one").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
        Files.move(part.toPath, target.toPath)
        target.setLastModified(mtime): Unit
        Bench.deleteRec(new java.io.File(tmp))
      }
      val now = System.currentTimeMillis()
      writeOne(events.filter(unix_micros(col("ts").cast("timestamp")) <= cut), d0, now - 60000)
      writeOne(events.filter(unix_micros(col("ts").cast("timestamp")) > cut), d1, now)
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val q = Events.sessionizeStream(stream).toDF().writeStream
        .format("memory").queryName("ev_sess")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // upsert contract: keep the LAST emission per (user, session)
      val byKey = spark.table("ev_sess").collect().zipWithIndex
        .map { case (r, i) => ((r.getLong(0), r.getLong(1)), (i, (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))) }
        .groupBy(_._1).map { case (_, vs) => vs.maxBy(_._2._1)._2._2 }.toSet
      assert(byKey == scalarSessions(eventTuples))
    } finally Bench.deleteRec(new java.io.File(dir))
  }

  test("bursts: crafted spike flagged, cold start unflagged; == scalar recompute on real data") {
    import spark.implicits._
    // type x: 6 calm hours (2 events each), then a 5-event spike at h6
    // (5*6=30 > 2*12=24 → burst), then calm h7 (trail now 15, not a burst)
    val crafted = (0 until 6).flatMap(h => Seq.fill(2)(("x", f"2024-01-01 $h%02d:10:00"))) ++
      Seq.fill(5)(("x", "2024-01-01 06:10:00")) ++ Seq.fill(2)(("x", "2024-01-01 07:10:00"))
    val cdf = crafted.toDF("event_type", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val cg = Events.bursts(cdf).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val hourUs = 3600L * 1000000
    val t0 = cg.keys.min
    assert(cg(t0 + 6 * hourUs) == ((5L, 12L, true)), s"spike hour: ${cg(t0 + 6 * hourUs)}")
    assert(cg(t0 + 7 * hourUs) == ((2L, 15L, false)))
    (0 until 6).foreach(h => assert(!cg(t0 + h * hourUs)._3, s"cold-start hour $h flagged"))
    // real data: full scalar recompute of the trailing-window test
    val raw = events.select(col("event_type"), unix_micros(col("ts").cast("timestamp")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = raw.groupBy(_._1).flatMap { case (et, rs) =>
      val buckets = rs.map(r => r._2 - Math.floorMod(r._2, hourUs))
        .groupBy(identity).map { case (b, g) => (b, g.size.toLong) }.toSeq.sortBy(_._1)
      buckets.zipWithIndex.map { case ((b, cnt), i) =>
        val prev = buckets.slice(math.max(0, i - 6), i)
        val trail = prev.map(_._2).sum
        (et, b) -> ((cnt, trail, prev.size == 6 && cnt * 6 > 2 * trail))
      }
    }
    val got = Events.bursts(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == want.toMap)
  }

  test("retention: cohort matrix exact on a crafted fixture (BIGINT day arithmetic)") {
    import spark.implicits._
    val day = 86400000000L
    def ts(d: Long, off: Long = 0L) = new java.sql.Timestamp((d * day + off) / 1000)
    // u1: days 0,1,3; u2: day 0 only; u3: days 1,2 (two activities on day 1)
    val ev = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(3)),
      (2L, ts(0, 3600L * 1000000)),
      (3L, ts(1)), (3L, ts(1, 7200L * 1000000)), (3L, ts(2))
    ).toDF("user_id", "ts")
    val got = Events.retention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val c0 = 0L // epoch day 0 in micros
    val c1 = day
    assert(got == Map(
      (c0, 0L) -> 2L, (c0, 1L) -> 1L, (c0, 3L) -> 1L,
      (c1, 0L) -> 1L, (c1, 1L) -> 1L), s"got $got")
  }

  test("funnel: strict order enforced; out-of-order completions do not count") {
    import spark.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val M = 1000000L
    val ev = Seq(
      // u1 completes the full funnel in order
      (1L, "view", ts(1 * M)), (1L, "click", ts(2 * M)), (1L, "purchase", ts(3 * M)),
      // u2: purchase BEFORE view -> reaches click but NOT purchase
      (2L, "purchase", ts(4 * M)), (2L, "view", ts(5 * M)), (2L, "click", ts(6 * M)),
      // u3: click only -> never enters the funnel
      (3L, "click", ts(7 * M)),
      // u4: view then click at the SAME us -> strict > excludes the click
      (4L, "view", ts(8 * M)), (4L, "click", ts(8 * M))
    ).toDF("user_id", "event_type", "ts")
    val got = Events.funnel(ev, Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (("view", 3L)),     // u1, u2, u4
      2L -> (("click", 2L)),    // u1, u2 (u4 blocked by strict order)
      3L -> (("purchase", 1L))  // u1 only
    ), s"got $got")
  }

  test("asofJoin: inclusive boundary, latest-wins, pre-first null, key isolation") {
    import spark.implicits._
    import graft.streaming.Events
    val left = Seq((1L, 10L, 50L), (2L, 10L, 100L), (3L, 10L, 200L), (4L, 20L, 150L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 100L, 7L), (10L, 180L, 8L), (30L, 1L, 9L))
      .toDF("user_id", "ts", "version")
    val got = Events.asofJoin(left, right, "user_id", "ts", "version").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("asof_version"))) None
         else Some(r.getLong(r.fieldIndex("asof_version"))))).toMap
    assert(got(1L).isEmpty)        // before the first version
    assert(got(2L).contains(7L))   // equal ts is INCLUSIVE
    assert(got(3L).contains(8L))   // latest ≤ wins
    assert(got(4L).isEmpty)        // user 20 has no versions; user 30 unseen
    assert(got.size == 4)          // right-only keys produce no rows
  }

  test("dailyAnomaly: z-scores against population sigma, constant series flags nothing") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int, i: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:0$i%01d:00")
    // days 1..3 with counts 1, 1, 4: mu = 2, sigma = sqrt(2) -> z = (4-2)/sqrt(2)
    val ev = (Seq(t(1, 1)) ++ Seq(t(2, 1)) ++ (1 to 4).map(i => t(3, i)))
      .map(Tuple1(_)).toDF("ts")
    val got = graft.streaming.Events.dailyAnomaly(ev, threshold = 1.2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val z3 = BigDecimal(2.0 / math.sqrt(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z1 = BigDecimal(-1.0 / math.sqrt(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("2024-01-03") == ((4L, z3, 1L)))
    assert(got("2024-01-01") == ((1L, z1, 0L)))
    // constant series: sigma = 0 -> z = 0, nothing flagged
    val flat = Seq(t(1, 1), t(2, 1)).map(Tuple1(_)).toDF("ts")
    assert(graft.streaming.Events.dailyAnomaly(flat).collect()
      .forall(r => r.getDouble(2) == 0.0 && r.getLong(3) == 0L))
  }
}
