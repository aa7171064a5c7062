package graft

import java.sql.Timestamp
import graft.operators.{Sketches, TemporalJoin, TimeAgg}
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left time") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 10:00:00"), "e3"), // key with no right rows
      (1L, ts("2023-12-01 00:00:00"), "e0")  // before any right row
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L) // equal ts matches
    ).toDF("k", "t", "pay")
    val got = TemporalJoin.asOf(left, right, ("k", "k"), ("t", "t"), Seq("pay"))
      .select("ev", "pay").as[(String, Option[Long])].collect().toMap
    assert(got == Map("e1" -> Some(100L), "e2" -> Some(200L),
      "e3" -> None, "e0" -> None))
  }

  test("asOf tolerance: stale matches null out, boundary-exact ones survive") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"),   // 1 h after the reading
      (1L, ts("2024-01-01 12:00:00"), "boundary"),// exactly 3 h after
      (1L, ts("2024-01-02 00:00:00"), "stale"),   // 15 h after — too old
      (2L, ts("2024-01-01 10:00:00"), "nomatch")
    ).toDF("k", "t", "ev")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 100L)).toDF("k", "t", "pay")
    val got = TemporalJoin.asOf(left, right, ("k", "k"), ("t", "t"),
        Seq("pay"), toleranceSeconds = 3 * 3600.0)
      .select("ev", "pay").as[(String, Option[Long])].collect().toMap
    assert(got == Map("fresh" -> Some(100L), "boundary" -> Some(100L),
      "stale" -> None, "nomatch" -> None))
    // tolerance off (default) keeps the stale match — unchanged contract
    val off = TemporalJoin.asOf(left, right, ("k", "k"), ("t", "t"), Seq("pay"))
      .select("ev", "pay").as[(String, Option[Long])].collect().toMap
    assert(off("stale") == Some(100L))
  }

  test("asOf pairs payload and time from the SAME right row when the newest payload is NULL") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(100L)),
      (1L, ts("2024-01-01 11:00:00"), None) // newest row: NULL payload
    ).toDF("k", "t", "pay")
    // per-column carries would leak 100 from the older row while the
    // staleness time reads 11:00 — the struct carry takes the whole
    // newest row, so the payload is honestly NULL
    val got = TemporalJoin.asOf(left, right, ("k", "k"), ("t", "t"), Seq("pay"))
      .select("ev", "pay").as[(String, Option[Long])].collect().toMap
    assert(got == Map("e1" -> None))
    // and under tolerance the 11:00 match is FRESH (1 h old), so the
    // result stays NULL rather than resurrecting the stale 100
    val tol = TemporalJoin.asOf(left, right, ("k", "k"), ("t", "t"),
        Seq("pay"), toleranceSeconds = 2 * 3600.0)
      .select("ev", "pay").as[(String, Option[Long])].collect().toMap
    assert(tol == Map("e1" -> None))
  }

  test("countPriorWithin counts right rows in (t-w, t] per key, 0 when none") {
    val clicks = Seq((1L, ts("2024-01-01 10:00:00"), "c1"),
      (2L, ts("2024-01-01 10:00:00"), "c2")).toDF("k", "t", "id")
    val views = Seq(
      (1L, ts("2024-01-01 09:45:00")), // within 30 min
      (1L, ts("2024-01-01 10:00:00")), // boundary: included
      (1L, ts("2024-01-01 09:30:00")), // boundary: excluded (strict >)
      (1L, ts("2024-01-01 08:00:00"))  // too old
    ).toDF("k", "t")
    val got = TemporalJoin.countPriorWithin(clicks, views, ("k", "k"), ("t", "t"),
        1800, "n").select("id", "n").as[(String, Long)].collect().toMap
    assert(got == Map("c1" -> 2L, "c2" -> 0L))
  }

  test("gapfillLocf fills missing buckets with zero counts and carried values") {
    val rollup = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, 10.0),
      (1L, ts("2024-01-01 03:00:00"), 1L, 20.0)
    ).toDF("g", "bucket", "n", "v")
    val got = TimeAgg.gapfillLocf(rollup, "g", "bucket", 3600,
        fillZero = Seq("n"), locf = Seq("v"))
      .orderBy("bucket")
      .select("n", "v_locf").as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 10.0), (0L, 10.0), (0L, 10.0), (1L, 20.0)))
  }

  test("approx_count_distinct stays within 5% of exact at sf0.001") {
    val e = graft.sources.Tables.events(spark, sf)
    val approx = SparkEntry.queries("b9_approx_distinct")(spark, sf)
      .select("event_type", "n_users_approx").as[(String, Long)].collect().toMap
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05, s"$k: ${approx(k)} vs $n")
    }
  }

  test("portable HLL estimate stays within 15% of exact at sf0.001 (m=256 → ~6.5% rse)") {
    val e = graft.sources.Tables.events(spark, sf)
    val est = Sketches.hllDistinct(e, Seq("event_type"), col("user_id"), 8)
      .select("event_type", "est_distinct").as[(String, Double)].collect().toMap
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) / n < 0.15, s"$k: ${est(k)} vs $n")
    }
  }

  test("portable HLL merge is lossless: day-rollup registers == direct registers") {
    val e = graft.sources.Tables.events(spark, sf)
      .withColumn("day", TimeAgg.dayKey(col("ts")))
    val rolled = Sketches.hllMerge(
      Sketches.hllRegisters(e, Seq("event_type", "day"), col("user_id"), 8),
      Seq("event_type"))
    val direct = Sketches.hllRegisters(e, Seq("event_type"), col("user_id"), 8)
    assert(rolled.exceptAll(direct).isEmpty && direct.exceptAll(rolled).isEmpty)
    val regs = direct.agg(min("reg"), max("reg"), min("rho"), max("rho"))
      .as[(Long, Long, Int, Int)].head()
    assert(regs._1 >= 0L && regs._2 <= 255L && regs._3 >= 1 && regs._4 <= 53)
  }

  test("portable HLL small-range branch: linear counting lands near tiny exact counts") {
    val tiny = (1 to 10).map(i => (s"u$i", "x")).toDF("uid", "g")
    val est = Sketches.hllDistinct(tiny, Seq("g"), col("uid"), 8)
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - 10.0) / 10.0 < 0.15, s"est $est vs 10")
  }

  test("rollup emits per-group, per-entity-subtotal and grand-total rows") {
    val df = SparkEntry.queries("b7_rollup_totals")(spark, sf)
    assert(df.filter(col("grp_user") === 1 && col("grp_month") === 1).count() == 1)
    val total = df.filter(col("grp_user") === 1 && col("grp_month") === 1)
      .select("n_events").as[Long].head()
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("pii scrub redacts emails and long digit runs") {
    val df = Seq((1L, "mail me at a.b@test.org or call 12345678 x")).toDF("doc_id", "text")
    val got = df.select(graft.functions.TextFunctions.scrubPii(col("text"))).as[String].head()
    assert(got == "mail me at <EMAIL> or call <NUM> x")
  }
}

class AsOfForwardSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfForward picks the earliest right row at-or-after each left time") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),  // next is 12:00
      (1L, ts("2024-01-01 12:00:00"), "e2"),  // equal ts matches
      (1L, ts("2024-01-01 13:00:00"), "e3"),  // after the last right row
      (2L, ts("2024-01-01 10:00:00"), "e4")   // key with no right rows
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L)
    ).toDF("k", "t", "pay")
    val got = TemporalJoin.asOfForward(left, right, ("k", "k"), ("t", "t"),
        Seq("pay"))
      .select("ev", "pay").as[(String, Option[Long])].collect().toMap
    assert(got == Map("e1" -> Some(200L), "e2" -> Some(200L),
      "e3" -> None, "e4" -> None))
  }

  test("asOfForward tolerance: matches beyond the future bound null out") {
    val left = Seq(
      (1L, ts("2024-01-01 11:30:00"), "fresh"),    // 30 min before
      (1L, ts("2024-01-01 09:00:00"), "boundary"), // exactly 3 h before
      (1L, ts("2024-01-01 00:00:00"), "far"),      // 12 h before — beyond
      (2L, ts("2024-01-01 10:00:00"), "nomatch")
    ).toDF("k", "t", "ev")
    val right = Seq((1L, ts("2024-01-01 12:00:00"), 100L)).toDF("k", "t", "pay")
    val got = TemporalJoin.asOfForward(left, right, ("k", "k"), ("t", "t"),
        Seq("pay"), toleranceSeconds = 3 * 3600.0)
      .select("ev", "pay").as[(String, Option[Long])].collect().toMap
    assert(got == Map("fresh" -> Some(100L), "boundary" -> Some(100L),
      "far" -> None, "nomatch" -> None))
    // a NULL payload field in the nearest right row must NOT fall
    // through to a later row — the struct carry keeps the pair intact
    val right2 = Seq(
      (1L, ts("2024-01-01 12:00:00"), Option.empty[Long]),
      (1L, ts("2024-01-01 13:00:00"), Some(999L))).toDF("k", "t", "pay")
    val carried = TemporalJoin.asOfForward(
        Seq((1L, ts("2024-01-01 11:00:00"), "x")).toDF("k", "t", "ev"),
        right2, ("k", "k"), ("t", "t"), Seq("pay"))
      .select("pay").as[Option[Long]].head()
    assert(carried.isEmpty)
  }
}

class IntervalUnionSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Sessionize

  private def run(rows: Seq[(Long, Long, Long)]) =
    Sessionize.intervalUnion(rows.toDF("k", "s", "e"),
      Seq("k"), col("s"), col("e"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("overlapping intervals merge; the union extent never double-counts") {
    // key 1: [0,10],[5,20],[30,40] → 2 islands, covered 20+10=30, max 20
    val got = run(Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 30L, 40L)))
    assert(got == Map(1L -> ((3L, 2L, 30L, 20L))))
  }

  test("touching intervals merge (closed semantics); containment adds nothing") {
    // [0,10] then [10,15] touch → ONE island of 15; [2,5] is contained
    val got = run(Seq((2L, 0L, 10L), (2L, 10L, 15L), (2L, 2L, 5L)))
    assert(got == Map(2L -> ((3L, 1L, 15L, 15L))))
  }

  test("zero-length intervals bridge islands but carry no extent") {
    // [0,5], point [5,5], [5,9]: all one island, covered 9
    val got = run(Seq((3L, 0L, 5L), (3L, 5L, 5L), (3L, 5L, 9L)))
    assert(got == Map(3L -> ((3L, 1L, 9L, 9L))))
    // a lone point island: covered 0
    val pt = run(Seq((4L, 7L, 7L)))
    assert(pt == Map(4L -> ((1L, 1L, 0L, 0L))))
  }

  test("keys do not interact; end < start fails loudly in-pass") {
    val got = run(Seq((5L, 0L, 10L), (6L, 5L, 8L)))
    assert(got == Map(5L -> ((1L, 1L, 10L, 10L)), 6L -> ((1L, 1L, 3L, 3L))))
    val ex = intercept[Exception] {
      run(Seq((7L, 10L, 3L)))
    }
    assert(ex.getMessage != null)
  }
}
