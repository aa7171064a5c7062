package graft

import graft.operators._
import graft.sources.{MongoJsonSource, Tables}
import org.apache.spark.sql.functions._

class TimeAggSpec extends SparkSpec {
  import spark.implicits._

  test("day/month keys match reference YYYYMMDD/YYYYMM format") {
    val df = Seq("2024-03-07 13:45:12").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val r = df.select(TimeAgg.dayKey($"ts"), TimeAgg.monthKey($"ts")).head()
    assert(r.getString(0) == "20240307" && r.getString(1) == "202403")
  }

  test("weekBucket is Monday-based (TimescaleDB time_bucket('1 week'))") {
    val df = Seq("2024-01-10 05:00:00").toDF("s") // a Wednesday
      .select(col("s").cast("timestamp").as("ts"))
    assert(df.select(date_format(TimeAgg.weekBucket($"ts"), "yyyy-MM-dd EEEE"))
      .head().getString(0) == "2024-01-08 Monday")
  }

  test("timeBucket floors to arbitrary widths from the 2000-01-03 origin") {
    val df = Seq("2024-01-01 05:59:59").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    assert(df.select(TimeAgg.timeBucket($"ts", 4 * 3600).cast("string"))
      .head().getString(0) == "2024-01-01 04:00:00")
    // widths that do NOT divide the origin offset take the
    // TimescaleDB/DuckDB alignment, not epoch alignment: 10 h buckets
    // from 2000-01-03 00:00 put 2024-05-01 03:00 in the bucket that
    // STARTS 2024-05-01 00:00 (epoch alignment would say 02:00) —
    // the r12 fuzzer-caught divergence, pinned here
    val d2 = Seq("2024-05-01 03:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    assert(d2.select(TimeAgg.timeBucket($"ts", 10 * 3600).cast("string"))
      .head().getString(0) == "2024-05-01 00:00:00")
    // pre-origin timestamps floor toward -inf (no truncation-to-zero):
    // 2000-01-01 sits 48 h before the origin → bucket starts -50 h
    val d3 = Seq("2000-01-01 00:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    assert(d3.select(TimeAgg.timeBucket($"ts", 10 * 3600).cast("string"))
      .head().getString(0) == "1999-12-31 22:00:00")
  }

  test("bounded gapfill: full spine, leading null locf, trailing carry, range filter") {
    val rollup = Seq(
      ("u1", "2024-01-01 02:00:00", 3L, 5.0),  // inside range
      ("u1", "2024-01-01 04:00:00", 1L, 9.0),  // inside range
      ("u1", "2024-01-01 09:00:00", 2L, 1.0),  // outside -> dropped
      ("u2", "2024-01-01 23:00:00", 7L, 2.0))  // outside -> u2 absent
      .toDF("user_id", "s", "n_events", "avg_value")
      .select($"user_id", $"s".cast("timestamp").as("bucket"),
        $"n_events", $"avg_value")
    val got = TimeAgg.gapfillLocf(rollup, "user_id", "bucket", 3600,
        fillZero = Seq("n_events"), locf = Seq("avg_value"),
        bounds = Some((lit("2024-01-01 00:00:00").cast("timestamp"),
          lit("2024-01-01 06:00:00").cast("timestamp"))))
      .select($"user_id", $"bucket".cast("string").as("b"),
        $"n_events", $"avg_value_locf")
      .as[(String, String, Long, Option[Double])].collect()
      .sortBy(r => (r._1, r._2))
    // u2 had no in-range observation: no spine for it
    assert(got.forall(_._1 == "u1"))
    // full 7-bucket spine 00:00..06:00
    assert(got.map(_._2) === (0 to 6).map(h => f"2024-01-01 0$h%d:00:00"))
    // leading gaps: zero-filled counts, NULL locf before first observation
    assert(got(0)._3 == 0 && got(0)._4.isEmpty && got(1)._4.isEmpty)
    // observations keep their values; interior gap carries 5.0 forward
    assert(got(2) == ("u1", "2024-01-01 02:00:00", 3L, Some(5.0)))
    assert(got(3)._4 == Some(5.0) && got(3)._3 == 0)
    assert(got(4) == ("u1", "2024-01-01 04:00:00", 1L, Some(9.0)))
    // trailing gaps to `finish` carry the last observation
    assert(got(5)._4 == Some(9.0) && got(6)._4 == Some(9.0))
    assert(got(5)._3 == 0 && got(6)._3 == 0)
  }

  test("counterDelta: reset-aware increase, reset count, single-reading zero") {
    // u1: 10 → 15 (+5) → 3 (reset: +3) → 8 (+5) = 13, one reset
    val df = Seq(
      (1L, "d1", 1L, 10.0), (1L, "d1", 2L, 15.0),
      (1L, "d1", 3L, 3.0), (1L, "d1", 4L, 8.0),
      (2L, "d1", 5L, 42.0)) // single reading: delta 0
      .toDF("user_id", "day", "event_id", "value")
    val got = TimeAgg.counterDelta(df, Seq("user_id", "day"), "value",
        Seq("event_id"), 4)
      .as[(Long, String, Double, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "d1", 13.0, 1L, 4L)))
    assert(got(1) == ((2L, "d1", 0.0, 0L, 1L)))
  }

  test("counterRate: reset-corrected delta per second; zero-span groups NULL") {
    def t(sec: Int) = s"2024-01-01 00:00:${f"$sec%02d"}"
    // u1: 10 → 15 → 3 (reset) → 8 over 30s: delta 13 / 30s
    val df = Seq(
      (1L, t(0), 1L, 10.0), (1L, t(10), 2L, 15.0),
      (1L, t(20), 3L, 3.0), (1L, t(30), 4L, 8.0),
      (2L, t(5), 5L, 42.0)) // single reading: no span
      .toDF("user_id", "s", "event_id", "value")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"event_id", $"value")
    val got = TimeAgg.counterRate(df, Seq("user_id"), "value", "ts",
        Seq("ts", "event_id"), 4)
      .as[(Long, Option[Double], Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, Some(0.4333), 4L))) // 13/30 pround 4
    assert(got(1) == ((2L, None, 1L)))
  }

  test("timeWeightedAvg: LOCF hold-time weighting; zero-span groups NULL") {
    def t(sec: Int) = s"2024-01-01 00:00:${f"$sec%02d"}"
    // v=10 held 10s, v=20 held 20s, last reading unweighted:
    // (10*10 + 20*20) / 30 = 16.6667
    val df = Seq(
      (1L, t(0), 1L, 10.0), (1L, t(10), 2L, 20.0), (1L, t(30), 3L, 99.0),
      (2L, t(5), 4L, 7.0)) // single instant: no span
      .toDF("user_id", "s", "event_id", "value")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"event_id", $"value")
    val got = TimeAgg.timeWeightedAvg(df, Seq("user_id"), "ts",
        Seq("event_id"), "value", 4)
      .as[(Long, Option[Double], Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, Some(16.6667), 3L)))
    assert(got(1) == ((2L, None, 1L)))
  }

  test("stateAgg: exact-µs hold times; final event counts but holds nothing") {
    def t(sec: Int) = s"2024-01-01 00:00:${f"$sec%02d"}"
    // u1: on@0 (held 10s) → off@10 (held 5s) → on@15 (final: 0s, counts)
    val df = Seq(
      (1L, t(0), 1L, "on"), (1L, t(10), 2L, "off"), (1L, t(15), 3L, "on"),
      (2L, t(7), 4L, "idle")) // single event: zero hold, one entry
      .toDF("user_id", "s", "event_id", "state")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"event_id", $"state")
    val got = TimeAgg.stateAgg(df, "user_id", "state", "ts", "event_id")
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, "off", 5000000L, 1L),
      (1L, "on", 10000000L, 2L),
      (2L, "idle", 0L, 1L)))
  }

  test("candlestick: OHLC are exact input picks under tie-broken ordering") {
    def t(sec: Int) = s"2024-01-01 00:00:${f"$sec%02d"}"
    val df = Seq(
      (1L, "d1", t(0), 1L, 5.0), (1L, "d1", t(10), 2L, 9.0),
      (1L, "d1", t(20), 3L, 2.0), (1L, "d1", t(30), 4L, 7.0),
      (2L, "d1", t(5), 5L, 4.0)) // single reading: all four equal
      .toDF("user_id", "day", "s", "event_id", "value")
      .select($"user_id", $"day", $"s".cast("timestamp").as("ts"),
        $"event_id", $"value")
    val got = TimeAgg.candlestick(df, Seq("user_id", "day"), "ts",
        "event_id", "value")
      .as[(Long, String, Double, Double, Double, Double, Long)]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, "d1", 5.0, 9.0, 2.0, 7.0, 4L)))
    assert(got(1) == ((2L, "d1", 4.0, 4.0, 4.0, 4.0, 1L)))
  }

  test("heartbeatUptime: capped deltas + final-gap credit; lapses counted") {
    def t(sec: Int) = s"2024-01-01 00:${f"${sec / 60}%02d"}:${f"${sec % 60}%02d"}"
    // gap=60s. u1: Δ=30 (live 30) → Δ=100 (capped 60, dead) → final +60
    //   = 150s live, 1 lapse, 3 heartbeats
    val df = Seq(
      (1L, t(0), 1L), (1L, t(30), 2L), (1L, t(130), 3L),
      (2L, t(7), 4L)) // single heartbeat: gap credit only
      .toDF("user_id", "s", "event_id")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"event_id")
    val got = TimeAgg.heartbeatUptime(df, "user_id", "ts", "event_id",
        gapSeconds = 60)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 150000000L, 1L, 3L)))
    assert(got(1) == ((2L, 60000000L, 0L, 1L)))
  }

  test("regression: hand-checked slope/intercept/corr; degenerate groups NULL") {
    def t(sec: Int) = s"2024-01-01 00:00:${f"$sec%02d"}"
    val df = Seq(
      // u1: (0s, 10.0), (10s, 20.0) — slope 1, intercept 10, corr 1
      (1L, t(0), 10.0), (1L, t(10), 20.0),
      // u2: single reading — zero time variance, all NULL
      (2L, t(5), 7.0),
      // u3: two readings at one instant — zero time variance
      (3L, t(4), 1.0), (3L, t(4), 9.0))
      .toDF("user_id", "s", "value")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"value")
    val got = TimeAgg.regression(df, Seq("user_id"), "ts",
        date_trunc("DAY", $"ts"), "value", 4)
      .as[(Long, Option[Double], Option[Double], Option[Double], Long)]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, Some(1.0), Some(10.0), Some(1.0), 2L)))
    assert(got(1) == ((2L, None, None, None, 1L)))
    assert(got(2) == ((3L, None, None, None, 2L)))
  }

  test("firstLast: earliest/latest reading, ties broken by the unique key") {
    val df = Seq(
      // u1: ts tie at the start — event_id 1 is first; latest is event 3
      (1L, "2024-01-01 00:00:00", 1L, 5.0),
      (1L, "2024-01-01 00:00:00", 2L, 6.0),
      (1L, "2024-01-01 00:00:09", 3L, 7.0),
      // u2: ts tie at the end — event_id 6 is last
      (2L, "2024-01-01 00:00:00", 4L, 1.0),
      (2L, "2024-01-01 00:00:09", 5L, 2.0),
      (2L, "2024-01-01 00:00:09", 6L, 3.0))
      .toDF("user_id", "s", "event_id", "value")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"event_id", $"value")
    val got = TimeAgg.firstLast(df, Seq("user_id"), "value",
        Seq("ts", "event_id"))
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 5.0, 7.0, 3L)))
    assert(got(1) == ((2L, 1.0, 3.0, 3L)))
  }

  test("gapfillInterpolate: straight line through the gap, observed rows exact") {
    // observations at hours 0 (v=10) and 3 (v=40): gap hours 1,2 lerp
    // to 20, 30; nothing before the first or after the last observation
    val r = Seq((1L, "2024-01-01 00:00:00", 10.0),
        (1L, "2024-01-01 03:00:00", 40.0))
      .toDF("user_id", "s", "v")
      .select($"user_id", $"s".cast("timestamp").as("bucket"), $"v")
    val got = TimeAgg.gapfillInterpolate(r, "user_id", "bucket", "v", 3600)
      .orderBy("bucket")
      .select(date_format($"bucket", "HH").cast("int"), $"v")
      .as[(Int, Double)].collect().toSeq
    assert(got == Seq((0, 10.0), (1, 20.0), (2, 30.0), (3, 40.0)))
  }

  test("downsampleLttb: endpoints kept, one point per bucket, salient spike wins") {
    // one series, 20 points at minute spacing, flat at 0 except a spike
    // at t=7; 4 buckets of 5 → the spike's bucket must pick the spike,
    // bucket 0 the first point, bucket 3 the last point
    val df = (0 until 20).map(i =>
        (1L, f"2024-01-01 00:$i%02d:00", i.toLong,
          if (i == 7) 100.0 else 0.0))
      .toDF("user_id", "s", "event_id", "value")
      .select($"user_id", $"s".cast("timestamp").as("ts"),
        $"event_id", $"value")
    val got = TimeAgg.downsampleLttb(df, "user_id", "ts", "value",
        "event_id", nBuckets = 4, scale = 2)
      .orderBy("bucket")
      .select($"bucket", $"event_id").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L), s"one point per bucket: $got")
    assert(got.head._2 == 0L, "first bucket keeps the series' first point")
    assert(got.last._2 == 19L, "last bucket keeps the series' last point")
    assert(got(1)._2 == 7L, s"the spike must be selected: $got")
  }
}

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("newerThan keeps only rows past the high watermark") {
    val existing = Seq(1, 5, 9).toDF("k")
    val incoming = Seq(8, 9, 10, 12).toDF("k")
    val got = Incremental.newerThan(incoming, existing, "k")
      .as[Int].collect().sorted
    assert(got.toSeq == Seq(10, 12))
  }

  test("upsertLatest keeps one latest row per key with tie-break") {
    val df = Seq((1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (1, 20, "z"))
      .toDF("k", "v", "tag")
    val got = Incremental.upsertLatest(df, Seq("k"), Seq(col("v"), col("tag")))
      .select("k", "tag").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "z", 2 -> "c")) // v desc, then tag desc
  }

  test("goldenRecord: each field keeps its own latest non-null; the latest row does not win") {
    // u1's rows: (t1: v=10, tag='a'), (t2: v=null, tag='b'),
    // (t3: v=20, tag=null). upsertLatest would return (20, null) —
    // survivorship must merge to (20, 'b').
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 101L, Option(10.0), Option("a")),
      (1L, "2024-01-01 00:00:02", 102L, None, Option("b")),
      (1L, "2024-01-01 00:00:03", 103L, Option(20.0), None),
      (2L, "2024-01-01 00:00:01", 104L, None, None))
      .toDF("k", "ts", "id", "v", "tag")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Incremental.goldenRecord(df, "k", "ts", "id",
        Seq("v", "tag"))
      .select("k", "v", "tag", "n_rows")
      .as[(Long, Option[Double], Option[String], Long)].collect().toSet
    assert(got == Set((1L, Some(20.0), Some("b"), 3L),
      (2L, None, None, 1L)))   // an all-null key survives with nulls
  }

  test("applyCdc: highest-seq change wins, tombstones delete, unknown keys insert, untouched keys pass") {
    val snap = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "bal", "seg")
    val chg = Seq(
      (1L, 100L, "U", 11.0, "a2"),  // overwritten below by seq 200
      (1L, 200L, "U", 12.0, "a3"),  // k=1 final upsert
      (2L, 150L, "D", 0.0, "x"),    // k=2 tombstone
      (9L, 50L, "I", 90.0, "new"))  // k=9 insert (op != D upserts)
      .toDF("k", "seqn", "op", "bal", "seg")
    val got = Incremental.applyCdc(snap, chg, Seq("k"), "seqn", "op",
        Seq("bal", "seg"))
      .as[(Long, Double, String)].collect().toSet
    assert(got == Set((1L, 12.0, "a3"), (3L, 30.0, "c"), (9L, 90.0, "new")))
  }

  test("applyCdc: a delete followed by a later upsert resurrects the key") {
    val snap = Seq((1L, 1.0)).toDF("k", "v")
    val chg = Seq((1L, 10L, "D", 0.0), (1L, 20L, "U", 5.0))
      .toDF("k", "seqn", "op", "v")
    val got = Incremental.applyCdc(snap, chg, Seq("k"), "seqn", "op", Seq("v"))
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 5.0)))
    // and the reverse order of arrival rows changes nothing (seq wins)
    val got2 = Incremental.applyCdc(snap,
        Seq((1L, 20L, "U", 5.0), (1L, 10L, "D", 0.0)).toDF("k", "seqn", "op", "v"),
        Seq("k"), "seqn", "op", Seq("v"))
      .as[(Long, Double)].collect().toSet
    assert(got2 == Set((1L, 5.0)))
  }

  test("applyCdcFrom == applyCdc off a maintained latest-change table (the seam)") {
    val snap = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val chg = Seq((1L, 10L, "U", 9.0), (2L, 11L, "D", 0.0), (3L, 12L, "U", 3.0))
      .toDF("k", "seqn", "op", "v")
    val latest = Incremental.latestChange(chg, Seq("k"), "seqn", "op", Seq("v"))
    val viaSeam = Incremental.applyCdcFrom(snap, latest, Seq("k"), Seq("v"))
      .as[(Long, Double)].collect().toSet
    val direct = Incremental.applyCdc(snap, chg, Seq("k"), "seqn", "op", Seq("v"))
      .as[(Long, Double)].collect().toSet
    assert(viaSeam == direct && direct == Set((1L, 9.0), (3L, 3.0)))
  }

  test("goldenRecord: same-timestamp picks break by the tie column deterministically") {
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 5L, Option("lo")),
      (1L, "2024-01-01 00:00:01", 9L, Option("hi")))
      .toDF("k", "ts", "id", "tag")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Incremental.goldenRecord(df, "k", "ts", "id", Seq("tag"))
      .select("tag").as[String].head()
    assert(got == "hi")
  }

  test("snapshotDiff labels added/removed/changed and drops unchanged keys") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("k", "state")
    val after = Seq((1L, "a"), (2L, "B"), (5L, "e"), (4L, null.asInstanceOf[String]))
      .toDF("k", "state")
    val got = Incremental.snapshotDiff(before, after, Seq("k"), Seq("state"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSeq
    // k=1 unchanged → absent; k=4 null==null (null-safe) → absent
    assert(got == Seq(
      (2L, "changed", Some("b"), Some("B")),
      (3L, "removed", Some("c"), None),
      (5L, "added", None, Some("e"))))
  }

  test("outliers: exact z² flag — the lone far reading, not the cluster") {
    // group 1: nine readings at 10.0, one at 100.0 → mean 19, σ = 27,
    // z(100) = 3 exactly (the > is strict: k=3 would NOT flag it — the
    // boundary case the exact arithmetic pins down), z(10) = 1/3. At
    // k=2 only the far reading flags. n=2 groups can never flag
    // (max z = 1) and singletons are skipped
    val df = ((1 to 9).map(i => (1L, i.toLong, 10.0)) ++
      Seq((1L, 10L, 100.0), (2L, 11L, 0.0), (2L, 12L, 99.0), (3L, 13L, 5.0)))
      .toDF("g", "id", "v")
    val got = DataQuality.outliers(df, Seq("g"), "v", k = 2, scale = 2)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(10L))
    // the exact-boundary check: z == k is NOT an outlier
    assert(DataQuality.outliers(df, Seq("g"), "v", k = 3, scale = 2)
      .count() == 0)
  }

  test("latestPeriod filters to max period") {
    val df = Seq((1, "202401"), (2, "202402"), (3, "202402")).toDF("k", "m")
    assert(Incremental.latestPeriod(df, "m").count() == 2)
  }

  test("scd2 emits one interval per state change with closed/open bounds") {
    // key 1: a -> a (no change) -> b -> a; key 2: constant; null state
    // for key 3 is an ordinary tracked value
    val df = Seq(
      (1, 1L, Some("a")), (1, 2L, Some("a")), (1, 3L, Some("b")), (1, 4L, Some("a")),
      (2, 1L, Some("x")), (2, 9L, Some("x")),
      (3, 1L, None), (3, 2L, Some("z")))
      .toDF("k", "t", "state")
    val got = Incremental.scd2(df, Seq("k"), col("t"),
        order = Seq(col("t")), attrs = Seq("state"))
      .select("k", "state", "valid_from", "valid_to", "is_current")
      .as[(Int, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      (1, Some("a"), 1L, Some(3L), false),
      (1, Some("b"), 3L, Some(4L), false),
      (1, Some("a"), 4L, None, true),     // re-entering a state opens anew
      (2, Some("x"), 1L, None, true),     // unchanged run collapses to one
      (3, None, 1L, Some(2L), false),     // null is a state, not "no row"
      (3, Some("z"), 2L, None, true)))
  }
}

class ArrayOpsSpec extends SparkSpec {
  import spark.implicits._

  test("containmentJoin = x = ANY(arr) with membership (not multiplicity) semantics") {
    val fact = Seq(("d1", 10), ("d2", 20), ("d9", 90)).toDF("dev", "v")
    val dim = Seq((1, Seq("d1", "d2", "d1")), (2, Seq("d2"))).toDF("uid", "devs")
    val got = ArrayOps.containmentJoin(fact, dim, "dev", "devs", Seq("uid"))
      .groupBy("uid").agg(sum("v").as("s"))
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 30L, 2 -> 20L)) // d1 counted once despite dup in array
  }

  test("arrayAggDistinct is sorted and distinct") {
    val df = Seq((1, "b"), (1, "a"), (1, "b")).toDF("k", "v")
    val got = ArrayOps.arrayAggDistinct(df, Seq("k"), "v", "arr")
      .select("arr").as[Seq[String]].head()
    assert(got == Seq("a", "b"))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap > threshold starts a new session") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:10:00", 2L),
      (1L, "2024-01-01 01:00:00", 3L), // 50min gap > 30min
      (2L, "2024-01-01 00:00:00", 4L))
      .toDF("user_id", "s", "event_id")
      .withColumn("ts", col("s").cast("timestamp"))
      .withColumn("value", lit(1.0))
    val got = Sessionize.summarize(df, "user_id", "ts", "event_id", "value", 1800)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("retention cohorts: first-day cohort, offset counts, dedup within day") {
    val df = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 09:00:00"), // same day dedups
      (1L, "2024-01-02 08:00:00"),                              // day-1 return
      (2L, "2024-01-01 10:00:00"),                              // never returns
      (3L, "2024-01-02 10:00:00"), (3L, "2024-01-04 10:00:00")) // late cohort
      .toDF("user_id", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.retentionCohorts(df, "user_id", "ts")
      .select(col("cohort_day").cast("string"), col("day_offset"),
        col("n_entities"))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 2, 1L)))
  }

  test("funnel: ordered chain within the window; out-of-order and late drop") {
    def row(u: Long, s: String, t: String) = (u, s, t)
    val df = Seq(
      // u1 completes the full chain inside 1 h
      row(1L, "2024-01-01 00:00:00", "view"),
      row(1L, "2024-01-01 00:10:00", "click"),
      row(1L, "2024-01-01 00:20:00", "purchase"),
      // u2's purchase PRECEDES the click — chain stops at click
      row(2L, "2024-01-01 00:00:00", "view"),
      row(2L, "2024-01-01 00:05:00", "purchase"),
      row(2L, "2024-01-01 00:30:00", "click"),
      // u3's click lands past the 1 h window of the FIRST view
      row(3L, "2024-01-01 00:00:00", "view"),
      row(3L, "2024-01-01 02:00:00", "click"),
      // u4 never views — not in the funnel at all
      row(4L, "2024-01-01 00:00:00", "click"))
      .toDF("user_id", "s", "event_type")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 3600L)
      .select("step", "n_entities").as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
    // reliable pin mode (fault-tolerant checkpoint() instead of
    // executor-local localCheckpoint) computes the identical funnel
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString)
    val rel = Sessionize.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 3600L, reliable = true)
      .select("step", "n_entities").as[(Int, Long)].collect().toMap
    assert(rel == got)
  }
}

class MongoJsonSourceSpec extends SparkSpec {

  test("pack → normalize roundtrip preserves every metric row with stable ids") {
    val ev = Tables.events(spark, sf)
    val packed = MongoJsonSource.packDocuments(
      ev, "user_id", "ts", 4 * 3600, Seq("event_id", "event_type", "value"))
    val flat = MongoJsonSource.normalize(packed, Seq("user_id"))
    assert(flat.count() == ev.count())
    // deterministic ids: re-running yields identical doc_id/row_id sets
    val again = MongoJsonSource.normalize(packed, Seq("user_id"))
      .select("row_id")
    assert(flat.select("row_id").except(again).count() == 0)
    // pos is dense per doc starting at 0
    val bad = flat.groupBy("doc_id")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("readDocuments round-trips packed docs through JSON files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mongo-json").toString
    val ev = Tables.events(spark, sf).limit(2000)
    val packed = MongoJsonSource.packDocuments(
      ev, "user_id", "ts", 4 * 3600, Seq("event_id", "event_type", "value"))
    // land as ONE multiline JSON array per file — the mongo-init.js
    // collection dump format readDocuments is built for (Spark's own
    // json writer emits JSONL, which is NOT that format)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "collection.json"),
      packed.toJSON.collect().mkString("[\n", ",\n", "\n]"))
    val docs = MongoJsonSource.readDocuments(spark, dir, packed.schema)
    assert(docs.count() == packed.count())
    // normalized children from the JSON landing match the direct path
    val a = MongoJsonSource.normalize(docs, Seq("user_id"))
    val b = MongoJsonSource.normalize(packed, Seq("user_id"))
    assert(a.select("row_id").exceptAll(b.select("row_id")).count() == 0)
    assert(b.select("row_id").exceptAll(a.select("row_id")).count() == 0)
  }

  test("normalizeRecursive flattens depth-2 nesting into linked child tables") {
    import graft.operators.TimeAgg
    val ev = Tables.events(spark, sf)
    val buckets = MongoJsonSource.packDocuments(
      ev, "user_id", "ts", 4 * 3600, Seq("event_id", "event_type", "value"))
    val dayDocs = buckets
      .groupBy(col("user_id"), TimeAgg.dayKey(col("created_at")).as("day"))
      .agg(array_sort(collect_list(
        struct(col("created_at"), col("doc_id"), col("metrics")))).as("buckets"))
      .withColumn("day_id", md5(concat_ws("|", col("user_id"), col("day"))))
    val tables = MongoJsonSource.normalizeRecursive(dayDocs, "days", "day_id")
    assert(tables.keySet ==
      Set("days", "days__buckets", "days__buckets__metrics"))
    // no table keeps a nested array column
    tables.values.foreach(t => assert(!t.schema.fields.exists(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])))
    // every metric row survives, and every child's _parent_id resolves
    val mid = tables("days__buckets__metrics")
    assert(mid.count() == ev.count())
    val orphanBuckets = tables("days__buckets")
      .join(tables("days").select(col("day_id").as("_parent_id")),
        Seq("_parent_id"), "left_anti")
    val orphanMetrics = mid
      .join(tables("days__buckets").select(col("row_id").as("_parent_id")),
        Seq("_parent_id"), "left_anti")
    assert(orphanBuckets.count() == 0 && orphanMetrics.count() == 0)
    // ids are deterministic across re-runs
    val again = MongoJsonSource.normalizeRecursive(dayDocs, "days", "day_id")
    assert(mid.select("row_id")
      .exceptAll(again("days__buckets__metrics").select("row_id")).count() == 0)
  }

  test("readDocumentsEvolving merges drifted load schemas without breaking stage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve")
    val load1 = dir.resolve("load1.json")
    val load2 = dir.resolve("load2.json")
    // load 2 grows a `device` field and widens value int -> double —
    // the dlt evolution contract: old loads read null for new fields
    java.nio.file.Files.writeString(load1,
      """[{"event_id": 1, "user_id": 10, "value": 5},
        | {"event_id": 2, "user_id": 11, "value": 7}]""".stripMargin)
    java.nio.file.Files.writeString(load2,
      """[{"event_id": 3, "user_id": 10, "value": 2.5, "device": "watch"}]""".stripMargin)
    val df = MongoJsonSource.readDocumentsEvolving(spark,
      Seq(load1.toString, load2.toString))
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("event_id", "user_id", "value", "device"))
    // pre-evolution rows carry null for the new column
    assert(df.filter(col("event_id") < 3 && col("device").isNull).count() == 2)
    assert(df.filter(col("device") === "watch").count() == 1)
    // a stage projection over the evolved superset schema still runs
    val staged = df.select(col("event_id"), col("user_id"),
      col("value").cast("double").as("value"),
      coalesce(col("device"), lit("unknown")).as("device"))
    assert(staged.filter(col("device") === "unknown").count() == 2)
    assert(staged.schema("value").dataType.typeName == "double")
  }
}

class EventAnalyticsR9Spec extends SparkSpec {
  import spark.implicits._

  test("ewma: power-of-two weights over present lags, hand-computed") {
    val df = Seq((1L, "d1", 100L), (1L, "d2", 200L), (1L, "d3", 400L))
      .toDF("user_id", "day", "fs")
    val got = TimeAgg.ewma(df, "user_id", "day", "fs", span = 3, scale = 0)
      .select("day", "ewma").as[(String, Double)].collect().toMap
    // weights 4,2,1 (newest first); partial windows use present weights;
    // scale=0 ⇒ pround to whole units
    assert(got("d1") == 100.0)                       // 400/4
    assert(got("d2") == 167.0)                       // (4*200+2*100)/6 ≈ 166.67
    assert(got("d3") == 300.0)                       // (4*400+2*200+100)/7
  }

  test("autocorr: exact corr over lagged pairs; degenerate cases null") {
    val df = Seq(
      (1L, "d1", 1L), (1L, "d2", 2L), (1L, "d3", 3L), (1L, "d4", 4L),
      (2L, "d1", 5L), (2L, "d2", 5L), (2L, "d3", 5L), // zero variance
      (3L, "d1", 1L), (3L, "d2", 9L))                  // one pair only
      .toDF("user_id", "day", "fs")
    val got = TimeAgg.autocorr(df, "user_id", "day", "fs", k = 1)
      .select("user_id", "autocorr_1", "n_pairs")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2))).toMap
    assert(got(1L) == (Some(1.0), 3L))      // perfectly linear
    assert(got(2L) == (None, 2L))           // constant: undefined
    assert(got(3L) == (None, 1L))           // n < 2: undefined
  }

  test("transitions: per-entity ordered bigrams with entity counts") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:01:00", 2L, "click"),
      (1L, "2024-01-01 00:02:00", 3L, "click"),
      (2L, "2024-01-01 00:00:00", 4L, "view"),
      (2L, "2024-01-01 00:05:00", 5L, "click"),
      (3L, "2024-01-01 00:00:00", 6L, "purchase")) // single event: no pair
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.transitions(df, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == Map(
      ("view", "click") -> (2L, 2L),
      ("click", "click") -> (1L, 1L)))
  }

  test("last-touch attribution: latest touch within lookback; stale and touchless unattributed") {
    val df = Seq(
      // u1: view then click then purchase — credited to the LATEST touch (click)
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:30:00", 2L, "click"),
      (1L, "2024-01-01 01:00:00", 3L, "purchase"),
      // u2: touch 10 days before the purchase — outside the 7d lookback
      (2L, "2024-01-01 00:00:00", 4L, "click"),
      (2L, "2024-01-11 00:00:00", 5L, "purchase"),
      // u3: no touch at all
      (3L, "2024-01-01 00:00:00", 6L, "purchase"),
      // u4: touch AFTER the purchase never credits it
      (4L, "2024-01-01 00:00:00", 7L, "purchase"),
      (4L, "2024-01-01 00:01:00", 8L, "view"))
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.lastTouchAttribution(df, "user_id", "ts", "event_id",
        "event_type", Seq("click", "view"), "purchase", 7L * 24 * 3600)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "click" -> (1L, 1L),
      "(unattributed)" -> (3L, 3L)))
  }

  test("markov attribution: hand-solved removal effects on a 4-journey fixture") {
    // journeys: u1 click→CONV; u2 view→NULL; u3 click→view→CONV;
    // u4 CONV with no touch. Absorption (ppm): p(view)=1/2,
    // p(click)=3/4, p(start)=3/4. Remove click → p(start)=3/8;
    // remove view → p(start)=1/2. RE = (375000, 250000), shares 60/40.
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click"),
      (1L, "2024-01-01 00:01:00", 2L, "purchase"),
      (2L, "2024-01-01 00:00:00", 3L, "view"),
      (3L, "2024-01-01 00:00:00", 4L, "click"),
      (3L, "2024-01-01 00:01:00", 5L, "view"),
      (3L, "2024-01-01 00:02:00", 6L, "purchase"),
      (4L, "2024-01-01 00:00:00", 7L, "purchase"),
      // post-conversion events never join the journey
      (1L, "2024-01-01 00:02:00", 8L, "view"))
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.markovAttribution(df, "user_id", "ts",
        "event_id", "event_type", Seq("click", "view"), "purchase")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == Map(
      "click" -> (750000L, 375000L, 375000L, 600000L),
      "view" -> (750000L, 500000L, 250000L, 400000L)), s"got $got")
  }

  test("multi-touch attribution: hand-computed 4-model µ¢ splits, mass conserved") {
    val df = Seq(
      // u1: view, click, view → purchase $10; n=3, first=view, last=view
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (1L, "2024-01-01 00:10:00", 2L, "click", 0.0),
      (1L, "2024-01-01 00:20:00", 3L, "view", 0.0),
      (1L, "2024-01-01 01:00:00", 4L, "purchase", 10.0),
      // u2: single click → $5 (n=1: every model gives it all)
      (2L, "2024-01-01 00:00:00", 5L, "click", 0.0),
      (2L, "2024-01-01 00:30:00", 6L, "purchase", 5.0),
      // u3: touchless $2 → (unattributed)
      (3L, "2024-01-01 00:00:00", 7L, "purchase", 2.0),
      // u4: click then view → $1 (n=2: floor-half to last, rest first)
      (4L, "2024-01-01 00:00:00", 8L, "click", 0.0),
      (4L, "2024-01-01 00:01:00", 9L, "view", 0.0),
      (4L, "2024-01-01 00:02:00", 10L, "purchase", 1.0),
      // u5: touch 10 days stale → (unattributed) $3
      (5L, "2024-01-01 00:00:00", 11L, "view", 0.0),
      (5L, "2024-01-11 00:00:00", 12L, "purchase", 3.0),
      // u6: touch AFTER the purchase never credits → (unattributed) $4
      (6L, "2024-01-01 00:00:00", 13L, "purchase", 4.0),
      (6L, "2024-01-01 00:01:00", 14L, "view", 0.0),
      // u7: touch at the EXACT purchase instant counts (range frame
      // includes the current timestamp) → click takes the $1
      (7L, "2024-01-01 00:00:00", 15L, "click", 0.0),
      (7L, "2024-01-01 00:00:00", 16L, "purchase", 1.0))
      .toDF("user_id", "s", "event_id", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.multiTouchAttribution(df, "user_id", "ts",
        "event_id", "event_type", Seq("click", "view"), "purchase",
        "value", 7L * 24 * 3600)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // u1 (U=1e9): linear base 333333333 rem 1→first(view);
    //   pos: fsh=4e8 to first+last (both view), the 1 middle (click) 2e8
    val want = Map(
      "click" -> (333333333L + 500000000L + 50000000L + 100000000L, // linear
        500000000L + 100000000L + 100000000L,                        // first
        500000000L + 100000000L,                                     // last
        200000000L + 500000000L + 50000000L + 100000000L),           // position
      "view" -> (666666667L + 50000000L,
        1000000000L,
        1000000000L + 100000000L,
        800000000L + 50000000L),
      "(unattributed)" -> (900000000L, 900000000L, 900000000L, 900000000L))
    assert(got == want, s"got $got")
    // mass conservation: every model sums to Σ round(value·100)·10^6
    val total = 2600000000L
    Seq(1, 2, 3, 4).foreach { i =>
      val s = got.values.map(v => i match {
        case 1 => v._1; case 2 => v._2; case 3 => v._3; case 4 => v._4 }).sum
      assert(s == total, s"model $i sums to $s, want $total")
    }
  }

  test("multi-touch attribution: NULL-value conversion counts as 0, not dropped") {
    // a NULL value must not null-propagate through every credit
    // expression and silently erase the conversion from all four
    // models — it attributes with 0 mass (contract in the docstring)
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", Some(0.0)),
      (1L, "2024-01-01 00:05:00", 2L, "purchase", None: Option[Double]),
      (2L, "2024-01-01 00:00:00", 3L, "view", Some(0.0)),
      (2L, "2024-01-01 00:05:00", 4L, "purchase", Some(3.0)))
      .toDF("user_id", "s", "event_id", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.multiTouchAttribution(df, "user_id", "ts",
        "event_id", "event_type", Seq("click", "view"), "purchase",
        "value", 7L * 24 * 3600)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // u1's NULL-$ conversion lands on click with 0 µ¢ in all models —
    // the click row EXISTS (it would vanish entirely pre-fix);
    // u2's $3 = 300¢ = 3e8 µ¢ rides view untouched in every model
    assert(got == Map(
      "click" -> (0L, 0L, 0L, 0L),
      "view" -> (300000000L, 300000000L, 300000000L, 300000000L),
      "(unattributed)" -> (0L, 0L, 0L, 0L)),
      s"got $got")
  }
}

class SearchCurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("keywordSearch: conjunction filters, exact-integer rank order, k cap") {
    val df = Seq(
      (1L, "spark spark merge window"),   // all 3 terms, tf=2+1+1
      (2L, "spark merge window"),         // all 3, tf=1 each
      (3L, "spark merge"),                // missing window: excluded
      (4L, "window window window"),       // missing spark/merge: excluded
      (5L, "spark merge window noise noise"))
      .toDF("doc_id", "text")
    val got = Curation.keywordSearch(df, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 2)
      .select("doc_id", "score", "rnk").as[(Long, Long, Int)].collect()
    // N=5; df(spark)=4, df(merge)=4, df(window)=4 → weight 1 per hit
    // doc1 score = (2+1+1)*1 = 4; docs 2,5 score 3 — doc2 wins the tie
    assert(got.toList == List((1L, 4L, 1), (2L, 3L, 2)))
  }

  test("globalRank: exact row_number over the total order, no window") {
    val df = Seq((30, "c"), (10, "a"), (20, "b"), (10, "b")).toDF("v", "t")
    val got = Curation.globalRank(df, Seq(col("v").asc, col("t").asc), "rank")
      .select("v", "t", "rank").as[(Int, String, Long)].collect().toSet
    assert(got == Set((10, "a", 1L), (10, "b", 2L), (20, "b", 3L), (30, "c", 4L)))
  }

  test("curriculumPhases: exact ntile bucket sizes, remainder to early phases") {
    val df = (1 to 10).map(i => (i.toLong, 100 - i)).toDF("id", "score")
    val got = Curation.curriculumPhases(df,
        Seq(col("score").desc, col("id").asc), phases = 3)
      .select("id", "rank", "phase").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // score desc == id asc here; n=10, B=3 → sizes 4,3,3
    assert((1 to 10).forall(i => got(i.toLong)._1 == i.toLong))
    assert((1 to 4).forall(i => got(i.toLong)._2 == 1L))
    assert((5 to 7).forall(i => got(i.toLong)._2 == 2L))
    assert((8 to 10).forall(i => got(i.toLong)._2 == 3L))
    // more phases than rows: one row per phase, phase == rank
    val tiny = Curation.curriculumPhases(
        Seq((1L, 5), (2L, 4)).toDF("id", "score"),
        Seq(col("score").desc, col("id").asc), phases = 5)
      .select("id", "phase").as[(Long, Long)].collect().toMap
    assert(tiny == Map(1L -> 1L, 2L -> 2L))
  }
}

class TwaInterpolatedSpec extends SparkSpec {
  import spark.implicits._

  test("twaInterpolated: boundary-crossing holds split exactly; zero-length holds drop") {
    // 10s buckets; epoch seconds kept tiny so the µs math is readable
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      (1L, ts(2), 1L, 1.0),   // holds [2, 14): 8s in bucket0, 4s in bucket1
      (1L, ts(14), 3L, 3.0),  // zero-length hold (superseded at the same µs)
      (1L, ts(14), 4L, 9.0),  // holds [14, 26): 6s in bucket1, 6s in bucket2
      (1L, ts(26), 5L, 5.0))  // last point: opens nothing
      .toDF("user_id", "ts", "event_id", "value")
    val got = TimeAgg.twaInterpolated(df, "user_id", "ts", Seq("event_id"),
        "value", bucketSeconds = 10, scale = 4)
      .select(unix_micros(col("bucket")).as("b"), col("tw_avg"),
        col("covered_us"), col("n_segments"))
      .as[(Long, Double, Long, Long)].collect()
      .map(r => r._1 / 10000000L -> (r._2, r._3, r._4)).toMap
    assert(got(0L) == (1.0, 8000000L, 1L))
    // bucket1 integrates BOTH sides of the boundary: 4s of 1.0 + 6s of 9.0
    assert(got(1L) == (5.8, 10000000L, 2L))
    assert(got(2L) == (9.0, 6000000L, 1L))
  }

  test("twaInterpolated buckets align to the 2000-01-03 origin, not the epoch") {
    // r13: width 7 s does NOT divide the 946857600 s origin offset
    // (946857600 % 7 = 6), so epoch-aligned and origin-aligned buckets
    // DIFFER — the same disease the r12 fuzzer caught in timeBucket,
    // at the only other bucketing site. A hold over [origin+1s,
    // origin+8s) must split at origin+7s (origin-aligned boundary),
    // not at the epoch-aligned 7s grid.
    val originUs = 946857600000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    val df = Seq(
      (1L, ts(originUs + 1000000L), 1L, 2.0),
      (1L, ts(originUs + 8000000L), 2L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = TimeAgg.twaInterpolated(df, "user_id", "ts", Seq("event_id"),
        "value", bucketSeconds = 7, scale = 4)
      .select((unix_micros(col("bucket")) - originUs).as("rel"),
        col("tw_avg"), col("covered_us"))
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // bucket [origin, origin+7s): 6 s of 2.0; bucket [origin+7s, ...): 1 s
    assert(got == Map(0L -> ((2.0, 6000000L)), 7000000L -> ((2.0, 1000000L))),
      s"got $got")
  }

  test("twaInterpolated == b19 when no hold crosses a bucket boundary") {
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // all activity inside one 1h bucket: the interpolated TWA must
    // reduce to the plain per-bucket TWA
    val df = Seq(
      (1L, ts(100), 1L, 2.0), (1L, ts(200), 2L, 4.0), (1L, ts(400), 3L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val interp = TimeAgg.twaInterpolated(df, "user_id", "ts", Seq("event_id"),
        "value", bucketSeconds = 3600, scale = 4)
      .select("tw_avg").as[Double].head()
    // hand: (100s·2 + 200s·4)/300s = 10/3 ≈ 3.3333
    assert(interp == 3.3333)
  }
}

class PathsStickinessSpec extends SparkSpec {
  import spark.implicits._

  test("topPaths: ordered per-session sequences, truncation marker, rank") {
    def t(m: Int) = s"2024-01-01 00:${f"$m%02d"}:00"
    val df = (
      // u1 session: v>c ; u2 session: v>c ; u3 session: v (single)
      Seq((1L, t(0), 1L, "view"), (1L, t(1), 2L, "click"),
        (2L, t(0), 3L, "view"), (2L, t(2), 4L, "click"),
        (3L, t(0), 5L, "view")) ++
      // u4: 7 events in one session -> truncated at 5
      (0 until 7).map(i => (4L, t(i), 10L + i, "error")))
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.topPaths(df, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 1800, maxSteps = 5, k = 10)
      .as[(String, Long, Int)].collect().toList
    assert(got == List(
      ("view>click", 2L, 1),
      ("error>error>error>error>error>(truncated)", 1L, 2),
      ("view", 1L, 3)))
  }

  test("topPaths: a gap splits the session and the path") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 02:00:00", 2L, "click")) // 2h gap > 30min
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.topPaths(df, "user_id", "ts", "event_id",
        "event_type", 1800, 5, 10)
      .select("path").as[String].collect().toSet
    assert(got == Set("view", "click"))
  }

  test("stickiness: trailing-7d WAU counts an entity once; ratio exact") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"), // dedups
      (1L, "2024-01-03 10:00:00"),
      (2L, "2024-01-03 10:00:00"))
      .toDF("user_id", "s").withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.stickiness(df, "user_id", "ts")
      .select(col("day").cast("string"), col("dau"), col("wau"),
        col("stickiness"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // Jan 1: dau 1 (u1), wau window covers only Jan 1 activity -> 1
    assert(got("2024-01-01") == (1L, 1L, 1.0))
    // Jan 3: dau 2; u1 active Jan 1 AND Jan 3 counts ONCE in the window
    assert(got("2024-01-03") == (2L, 2L, 1.0))
    // gap days (Jan 2) have no DAU row
    assert(!got.contains("2024-01-02"))
  }
}

class GapsAsapSpec extends SparkSpec {
  import spark.implicits._

  test("topGaps: k longest silences per entity, earlier-start tie-break") {
    def t(h: Int) = s"2024-01-01 ${f"$h%02d"}:00:00"
    val df = Seq(
      (1L, t(0), 1L), (1L, t(1), 2L), (1L, t(5), 3L), (1L, t(6), 4L),
      (1L, t(12), 5L), // gaps: 1h, 4h, 1h, 6h
      (2L, t(0), 6L))  // single event: no gap
      .toDF("user_id", "s", "event_id")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = TimeAgg.topGaps(df, "user_id", "ts", "event_id", k = 2)
      .select(col("user_id"), col("gap_us"), col("rnk"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 6L * 3600000000L, 1), (1L, 4L * 3600000000L, 2)))
  }

  test("asapSmooth: a perfectly linear series ties every window -> W=1; pure alternation -> W=2") {
    // linear: ΔS_W = W·d so the cleared metric is d² for every W —
    // the tie chain resolves to the smallest window (no smoothing)
    val lin = (1 to 9).map(i => (1L, f"d$i%02d", 100L * i)).toDF("e", "d", "fs")
    val gotLin = TimeAgg.asapSmooth(lin, "e", "d", "fs", Seq(1, 2, 4, 8), 0)
    assert(gotLin.select("window").distinct().as[Long].collect().toSeq == Seq(1L))
    // raw values pass through unsmoothed at W=1
    assert(gotLin.filter(col("d") === "d03").select("smoothed")
      .as[Double].head() == 300.0)
    // period-2 alternation: every even window's sums are constant
    // (ssq = 0) — zero-roughness ties resolve to W=2
    val alt = (1 to 10).map(i => (1L, f"d$i%02d", if (i % 2 == 0) 200L else 100L))
      .toDF("e", "d", "fs")
    val gotAlt = TimeAgg.asapSmooth(alt, "e", "d", "fs", Seq(1, 2, 4, 8), 0)
    assert(gotAlt.select("window").distinct().as[Long].collect().toSeq == Seq(2L))
    assert(gotAlt.select("smoothed").distinct().as[Double].collect().toSeq
      == Seq(150.0))
    // an entity with a single observation has no first difference: absent
    val single = Seq((9L, "d01", 5L)).toDF("e", "d", "fs")
    assert(TimeAgg.asapSmooth(single, "e", "d", "fs", Seq(1, 2), 0).count() == 0)
  }
}

class CohortValueSpec extends SparkSpec {
  import spark.implicits._

  test("cohortValue: exact cells and cumulative LTV per cohort") {
    val df = Seq(
      (1L, "2024-01-01 08:00:00", 10.0), (1L, "2024-01-01 09:00:00", 5.0),
      (1L, "2024-01-03 08:00:00", 2.0),
      (2L, "2024-01-01 10:00:00", 1.0),
      (3L, "2024-01-03 10:00:00", 100.0))
      .toDF("user_id", "s", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.cohortValue(df, "user_id", "ts", "value")
      .select(col("cohort_day").cast("string"), col("day_offset"),
        col("n_entities"), col("revenue"), col("cum_revenue"))
      .as[(String, Int, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // Jan-1 cohort: day 0 = u1 (15) + u2 (1); day 2 = u1 (2)
    assert(got(("2024-01-01", 0)) == (2L, 16.0, 16.0))
    assert(got(("2024-01-01", 2)) == (1L, 2.0, 18.0))
    // Jan-3 cohort: its own curve starts at its own day 0
    assert(got(("2024-01-03", 0)) == (1L, 100.0, 100.0))
    assert(got.size == 3)
  }
}

class FunnelTimesSpec extends SparkSpec {
  import spark.implicits._

  test("funnelTimes: exact median/p90 seconds from anchor; empty steps null") {
    def row(u: Long, s: String, t: String) = (u, s, t)
    val df = Seq(
      // u1 converts in 10 min, u2 in 30 min; neither purchases
      row(1L, "2024-01-01 00:00:00", "view"),
      row(1L, "2024-01-01 00:10:00", "click"),
      row(2L, "2024-01-01 00:00:00", "view"),
      row(2L, "2024-01-01 00:30:00", "click"))
      .toDF("user_id", "s", "event_type")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = Sessionize.funnelTimes(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 3600L)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1) == (2L, Some(0.0), Some(0.0)))
    // interpolated: median of {600, 1800} = 1200; p90 = 600+0.8*1200
    assert(got(2) == (2L, Some(1200.0), Some(1680.0)))
    // nobody purchases: zero completers, null percentiles
    assert(got(3) == (0L, None, None))
  }
}
