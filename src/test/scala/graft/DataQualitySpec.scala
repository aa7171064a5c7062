package graft

import graft.operators.{Curation, DataQuality, Dedup}
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val child = Seq(
    (1L, Option(10L), "view"),
    (2L, Option(10L), "click"),
    (2L, Option(20L), "view"),   // duplicate id 2
    (3L, None, "view"),          // null user
    (4L, Option(99L), "teleport") // orphan user + bad type
  ).toDF("event_id", "user_id", "event_type")

  private val parent = Seq(10L, 20L).toDF("c_custkey")

  test("not_null / accepted_values fuse into one scan and count violations") {
    val rep = DataQuality.columnChecks(child, Seq(
      ("not_null_user_id", $"user_id".isNull),
      ("accepted_values_event_type",
        $"event_type".isNotNull && !$"event_type".isin("view", "click"))))
    val got = rep.as[(String, Long, Boolean)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(got("not_null_user_id") == ((1L, false)))
    assert(got("accepted_values_event_type") == ((1L, false)))
    // single scan: exactly one aggregate over one relation
    val scans = rep.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1)
  }

  test("unique counts keys occurring more than once") {
    val got = DataQuality.unique(child, Seq("event_id"))
      .as[(String, Long, Boolean)].collect().head
    assert(got == (("unique_event_id", 1L, false)))
  }

  test("relationships counts child keys missing from the parent") {
    val got = DataQuality.relationships(child, "user_id", parent, "c_custkey")
      .as[(String, Long, Boolean)].collect().head
    assert(got == (("relationships_user_id", 1L, false))) // only 99L; null skipped
  }

  test("report on clean data passes every check") {
    val clean = Seq((1L, Option(10L), "view"), (2L, Option(20L), "click"))
      .toDF("event_id", "user_id", "event_type")
    val rep = DataQuality.report(Seq(
      DataQuality.notNull(clean, Seq("user_id", "event_type")),
      DataQuality.unique(clean, Seq("event_id")),
      DataQuality.relationships(clean, "user_id", parent, "c_custkey")))
      .as[(String, Long, Boolean)].collect()
    assert(rep.length == 4 && rep.forall(_._3))
  }

  test("token-budget sample keeps the greedy quality-desc prefix per stratum") {
    val df = Seq(
      // lang a: quality order 1,2,3 with tokens 40,50,20 -> cum 40,90,110
      ("a", 1L, 40L, 0.9), ("a", 2L, 50L, 0.8), ("a", 3L, 20L, 0.7),
      // lang b: single doc over budget is dropped
      ("b", 4L, 200L, 0.9))
      .toDF("lang", "doc_id", "n_tokens", "q")
    val got = Curation.tokenBudgetSample(df, Seq("lang"), $"n_tokens", $"q",
        $"doc_id", budget = 100L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 40L, 2L -> 90L)) // doc 3 blocked at cum 110
  }

  test("source mix shares sum to 1 and weigh token mass") {
    val df = Seq(
      ("s1", 100L, 0.5), ("s1", 100L, 0.7), ("s2", 200L, 0.9))
      .toDF("source", "n_tok", "q")
    val got = Curation.sourceMix(df, Seq("source"), $"n_tok", $"q")
      .select("source", "n_docs", "n_tokens", "token_share")
      .as[(String, Long, Long, Double)].collect()
      .map { case (s, nd, nt, sh) => s -> ((nd, nt, sh)) }.toMap
    assert(got("s1") == ((2L, 200L, 0.5)))
    assert(got("s2") == ((1L, 200L, 0.5)))
  }

  test("shared-shingle ratio flags cross-doc spans, not within-doc repeats") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),        // shares "alpha beta gamma" w/ 2
      (2L, "alpha beta gamma epsilon"),
      (3L, "zeta eta theta iota"),           // fully unique
      (4L, "kappa kappa kappa kappa kappa")) // repeated WITHIN doc only
      .toDF("doc_id", "text")
    val got = Dedup.sharedShingleRatio(df, "doc_id", "text", 3)
      .select("doc_id", "n_sh", "n_shared").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((2L, 1L)))
    assert(got(3L) == ((2L, 0L)))
    // within-doc repeats collapse to ONE distinct shingle, shared nowhere
    assert(got(4L) == ((1L, 0L)))
  }

  test("drift: identical distributions score 0; hand-computed TV; one-sided keys score 1") {
    // key A: ref [10,10,30] vs cur [10,30,30] over bins(0,40,4):
    // p = (2/3 @bin2, 1/3 @bin4), q = (1/3, 2/3) -> TV = 1/3, worst bin 1/3.
    // key B identical both sides -> 0. key C only in ref -> 1 / n_cur=0.
    val ref = Seq(("A", 10.0), ("A", 10.0), ("A", 30.0),
      ("B", 5.0), ("B", 15.0), ("C", 7.0)).toDF("k", "v")
    val cur = Seq(("A", 10.0), ("A", 30.0), ("A", 30.0),
      ("B", 5.0), ("B", 15.0)).toDF("k", "v")
    val got = DataQuality.distributionDrift(ref, cur, Seq("k"), col("v"),
        lo = 0.0, hi = 40.0, nBins = 4, scale = 6)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // KS: CDF gap peaks at bin2 (|2/3 - 1/3| = 1/3), closes by bin4
    assert(got("A") == (("A", 3L, 3L, 0.333333, 0.333333, 0.333333)))
    assert(got("B") == (("B", 2L, 2L, 0.0, 0.0, 0.0)))
    assert(got("C") == (("C", 1L, 0L, 1.0, 1.0, 1.0)))
  }

  test("drift is symmetric and lands in [0,1]; under/overflow bucketed not dropped") {
    val ref = Seq(("A", -5.0), ("A", 100.0), ("A", 10.0)).toDF("k", "v")
    val cur = Seq(("A", 10.0), ("A", 10.0), ("A", 100.0)).toDF("k", "v")
    def tv(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      DataQuality.distributionDrift(a, b, Seq("k"), col("v"), 0.0, 40.0, 4)
        .select("tv_dist").as[Double].head()
    val f = tv(ref, cur); val g = tv(cur, ref)
    // underflow (-5) and overflow (100) land in sentinel bins: the -5 vs
    // extra 10 shift is visible -> TV = 1/3
    assert(f == g && f == 0.333333)
  }

  test("driftFromBins: maintained histograms feed the same computation") {
    val refBins = Seq(("A", 2, 2L), ("A", 4, 1L)).toDF("k", "bucket", "cnt_ref")
    val curBins = Seq(("A", 2, 1L), ("A", 4, 2L)).toDF("k", "bucket", "cnt_cur")
    val got = DataQuality.driftFromBins(refBins, curBins, Seq("k"))
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(got == (("A", 3L, 3L, 0.333333, 0.333333, 0.333333)))
  }

  test("benford: hand ppm — sub-1 excluded, negatives by magnitude, 9-row spine with zeros") {
    // values 1, 19 (digit 1), 23 (2), -35 (3), 900 (9); 0.5 excluded.
    // total 5: obs_ppm d1=400000, d2=d3=d9=200000, rest 0.
    // tv = (Σ|obs−benford| over ALL 9 digits) div 2 = 704366 div 2
    val df = Seq(("X", 1.0), ("X", 19.0), ("X", 23.0), ("X", -35.0),
      ("X", 900.0), ("X", 0.5)).toDF("k", "v")
    val rows = DataQuality.benford(df, Seq("k"), "v")
      .as[(String, Int, Long, Long, Long, Long)].collect()
      .map { case (_, d, n, obs, exp, tv) => d -> ((n, obs, exp, tv)) }.toMap
    assert(rows.size == 9, "one row per digit 1..9, zeros included")
    assert(rows(1) == ((2L, 400000L, 301030L, 352183L)))
    assert(rows(2) == ((1L, 200000L, 176091L, 352183L)))
    assert(rows(9) == ((1L, 200000L, 45757L, 352183L)))
    assert(rows(5) == ((0L, 0L, 79181L, 352183L)))
  }

  test("benfordFromCounts: maintained digit counts feed the same report") {
    val df = Seq(("X", 1.0), ("X", 19.0), ("X", 23.0), ("X", -35.0),
      ("X", 900.0), ("X", 0.5)).toDF("k", "v")
    val counts = Seq(("X", 1, 2L), ("X", 2, 1L), ("X", 3, 1L), ("X", 9, 1L))
      .toDF("k", "digit", "n")
    val want = DataQuality.benford(df, Seq("k"), "v")
    val got = DataQuality.benfordFromCounts(counts, Seq("k"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("fdViolations: only multi-dependent determinants, nulls ignored per the dbt convention") {
    val df = Seq((1L, Some("x")), (1L, Some("x")), (2L, Some("x")),
      (2L, Some("y")), (2L, None), (3L, None)).toDF("det", "dep")
    val got = DataQuality.fdViolations(df, Seq("det"), "dep")
      .as[(Long, Long, Long, String, String)].collect().toList
    // det 1 is functional; det 3 has no non-null dependents; det 2
    // violates with 2 distinct over 2 counted rows (the null dropped)
    assert(got == List((2L, 2L, 2L, "x", "y")))
  }

  test("keySkew: ppm shares, HHI, deterministic top-N tie-break by key") {
    // a×4, b×2, c×2, d×1 (total 9). topN=2 keeps a then b (b beats the
    // tied c by key order). share a = 4e6 div 9, HHI = 25e6 div 81.
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") :+ "d")
      .toDF("k")
    val got = DataQuality.keySkew(df, "k", topN = 2)
      .as[(String, Long, Long, Long, Long, Long)].collect().toList.sorted
    assert(got == List(("a", 4L, 444444L, 4L, 9L, 308641L),
      ("b", 2L, 222222L, 4L, 9L, 308641L)))
  }
}

class ProfileCompareSpec extends SparkSpec {
  import spark.implicits._

  test("profileCompare: counts, nulls, extrema, exact means and shift") {
    val ref = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v")
    val cur = Seq(Some(2.0), Some(6.0)).toDF("v")
    val r = DataQuality.profileCompare(ref, cur, Seq(("v", 4))).collect().head
    assert(r.getAs[String]("col_name") == "v")
    assert(r.getAs[Long]("n_ref") == 3L && r.getAs[Long]("n_cur") == 2L)
    assert(r.getAs[Long]("nulls_ref") == 1L && r.getAs[Long]("nulls_cur") == 0L)
    assert(r.getAs[Double]("min_ref") == 1.0 && r.getAs[Double]("max_cur") == 6.0)
    assert(r.getAs[Double]("mean_ref") == 2.0)
    assert(r.getAs[Double]("mean_cur") == 4.0)
    assert(r.getAs[Double]("mean_shift") == 2.0)
  }

  test("profileCompare: an all-null side reports null mean, no crash") {
    val ref = Seq(Option.empty[Double], None).toDF("v")
    val cur = Seq(Some(5.0)).toDF("v")
    val r = DataQuality.profileCompare(ref, cur, Seq(("v", 4))).collect().head
    assert(r.getAs[Long]("n_ref") == 0L && r.getAs[Long]("nulls_ref") == 2L)
    assert(r.isNullAt(r.fieldIndex("mean_ref")))
    assert(r.isNullAt(r.fieldIndex("mean_shift")))
    assert(r.getAs[Double]("mean_cur") == 5.0)
  }
}

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextFunctions

  test("nfcNormalize composes decomposed sequences and singletons; idempotent") {
    val df = Seq(
      "café",          // e + combining acute -> é
      "Å",             // A + combining ring -> Å
      "Å",              // Angstrom sign singleton -> Å (U+00C5)
      "café",           // already NFC: unchanged
      "plain ascii").toDF("t")
    val got = df.select(TextFunctions.nfcNormalize(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq("café", "Å", "Å", "café", "plain ascii"))
    // idempotent: normalizing the normalized column is a fixpoint
    val twice = df.select(TextFunctions.nfcNormalize(
      TextFunctions.nfcNormalize(col("t"))).as("n")).as[String].collect().toSeq
    assert(twice == got)
  }

  test("nfc_normalize is SQL-registered and equals the Scala column") {
    GraftExtensions.register(spark)
    Seq("écolo", "x").toDF("t").createOrReplaceTempView("nfc_in")
    val sql = spark.sql("SELECT nfc_normalize(t) AS n FROM nfc_in")
      .as[String].collect().toSeq
    assert(sql == Seq("écolo", "x"))
  }
}

class RebalanceMixSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Curation

  test("rebalanceMix keeps exactly w*t rows per stratum, deterministically") {
    val df = (1 to 100).map(i => (i.toLong, if (i <= 60) "en" else if (i <= 90) "de" else "fr"))
      .toDF("id", "lang")
    // weights 3:2:1; t = min(60/3, 30/2, 10/1) = 10 -> keep 30/20/10
    val got = Curation.rebalanceMix(df, "lang",
      Map("en" -> 3L, "de" -> 2L, "fr" -> 1L), col("id"), "|s")
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 30L, "de" -> 20L, "fr" -> 10L))
    // deterministic: the same call selects the same id set
    val again = Curation.rebalanceMix(df, "lang",
      Map("en" -> 3L, "de" -> 2L, "fr" -> 1L), col("id"), "|s")
    assert(got.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
    // binding stratum fully consumed: all 10 fr rows kept
    assert(got.filter(col("lang") === "fr").count() == 10L)
  }

  test("rebalanceMix: unweighted strata drop; absent-stratum weight empties the mix") {
    val df = Seq((1L, "en"), (2L, "en"), (3L, "de")).toDF("id", "lang")
    val dropped = Curation.rebalanceMix(df, "lang", Map("en" -> 1L),
      col("id"), "|s")
    assert(dropped.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
    // a target weight for a stratum with zero rows is unsatisfiable
    val empty = Curation.rebalanceMix(df, "lang",
      Map("en" -> 1L, "xx" -> 1L), col("id"), "|s")
    assert(empty.count() == 0L)
  }
}

/** DQ9 CUSUM changepoints. */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def dailyOf(counts: Seq[Long], key: String = "k") = {
    counts.zipWithIndex.map { case (c, i) =>
      (key, java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"), c)
    }.toDF("key", "day", "cnt")
  }

  test("cusum: sustained upward drift alarms exactly when the scaled statistic crosses") {
    // counts 10×4 then 20×3, mu = 100/7; slack 2, threshold 10.
    // Hand-rolled N-scaled recurrence: NS+ = 0,0,0,0,26,52,78 vs N·h = 70
    // → alarm_up only on day 7; NS- peaks at 64 < 70 → alarm_dn never.
    val got = DataQuality.cusumFromDaily(
      dailyOf(Seq(10L, 10L, 10L, 10L, 20L, 20L, 20L)), Seq("key"),
      slack = 2, threshold = 10)
      .orderBy("day").as[(String, java.sql.Date, Long, Boolean, Boolean)]
      .collect()
    assert(got.map(_._4).toSeq ==
      Seq(false, false, false, false, false, false, true))
    assert(got.forall(!_._5))
  }

  test("cusum: the mirrored downward drop alarms alarm_dn only") {
    val got = DataQuality.cusumFromDaily(
      dailyOf(Seq(20L, 20L, 20L, 20L, 10L, 10L, 10L)), Seq("key"),
      slack = 2, threshold = 10)
      .orderBy("day").as[(String, java.sql.Date, Long, Boolean, Boolean)]
      .collect()
    assert(got.map(_._5).toSeq ==
      Seq(false, false, false, false, false, false, true))
    assert(got.forall(!_._4))
  }

  test("cusum: constant volume never alarms; threshold boundary is strict") {
    val flat = DataQuality.cusumFromDaily(dailyOf(Seq.fill(6)(7L)),
      Seq("key"), slack = 0, threshold = 1)
    assert(flat.filter(col("alarm_up") || col("alarm_dn")).count() == 0L)
    // counts (0,0,6): NS+ on day 3 is exactly 12 = N·4 — strict > means
    // threshold 4 stays quiet and threshold 3 fires
    val quiet = DataQuality.cusumFromDaily(dailyOf(Seq(0L, 0L, 6L)),
      Seq("key"), slack = 0, threshold = 4)
    assert(quiet.filter(col("alarm_up")).count() == 0L)
    val fires = DataQuality.cusumFromDaily(dailyOf(Seq(0L, 0L, 6L)),
      Seq("key"), slack = 0, threshold = 3)
    assert(fires.filter(col("alarm_up")).as[(String, java.sql.Date, Long,
      Boolean, Boolean)].collect().map(_._2.toString).toSeq ==
      Seq("2024-01-03"))
  }

  test("cusum: end-to-end rollup groups by day and keys stay independent") {
    val ev = Seq(
      // key a: 2,2,4 events over three days — drifts up with slack 0
      ("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 01:00:00"),
      ("a", "2024-01-02 00:00:00"), ("a", "2024-01-02 01:00:00"),
      ("a", "2024-01-03 00:00:00"), ("a", "2024-01-03 01:00:00"),
      ("a", "2024-01-03 02:00:00"), ("a", "2024-01-03 03:00:00"),
      // key b: constant 1/day — never alarms
      ("b", "2024-01-01 00:00:00"), ("b", "2024-01-02 00:00:00"),
      ("b", "2024-01-03 00:00:00"))
      .toDF("key", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    // key a: N=3, T=8, u = 3x−8 → −2,−2,4; C: −2,−4,0; NS+: 0,0,4 vs
    // N·h = 3 → alarm day 3 (threshold 1)
    val got = DataQuality.cusumChangepoints(ev, Seq("key"), "ts",
      slack = 0, threshold = 1)
    val alarms = got.filter(col("alarm_up"))
      .select(col("key"), col("day").cast("string")).as[(String, String)]
      .collect().toSet
    assert(alarms == Set(("a", "2024-01-03")))
    assert(got.filter(col("key") === "b" && (col("alarm_up") ||
      col("alarm_dn"))).count() == 0L)
  }

  test("kAnonymity flags exactly the under-k classes with their sizes") {
    // class (us, 1): 3 rows — safe at k=3; (us, 2): 2 rows and
    // (de, 1): 1 row — violations
    val rows = Seq(("us", 1L), ("us", 1L), ("us", 1L), ("us", 2L),
      ("us", 2L), ("de", 1L)).toDF("nation", "band")
    val got = DataQuality.kAnonymity(rows, Seq("nation", "band"), k = 3L)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("us", 2L, 2L), ("de", 1L, 1L)))
    intercept[IllegalArgumentException] {
      DataQuality.kAnonymity(rows, Seq.empty, k = 3L)
    }
    intercept[IllegalArgumentException] {
      DataQuality.kAnonymity(rows, Seq("nation"), k = 1L)
    }
  }

  test("lDiversity flags large-but-homogeneous classes kAnonymity passes") {
    // class (us, 1): 3 rows but ONE distinct segment — k=3-anonymous
    // yet 2-diversity fails; (us, 2) has two distinct segments — passes
    val rows = Seq(("us", 1L, "A"), ("us", 1L, "A"), ("us", 1L, "A"),
      ("us", 2L, "A"), ("us", 2L, "B")).toDF("nation", "band", "seg")
    assert(DataQuality.kAnonymity(rows, Seq("nation", "band"), k = 3L)
      .filter(col("nation") === "us" && col("band") === 1L).count() == 0L)
    val got = DataQuality.lDiversity(rows, Seq("nation", "band"), "seg",
      l = 2L).as[(String, Long, Long)].collect().toSet
    assert(got == Set(("us", 1L, 1L)))
    intercept[IllegalArgumentException] {
      DataQuality.lDiversity(rows, Seq("nation"), "seg", l = 1L)
    }
  }

  test("tCloseness: hand TV with the folded absent-value tail; matching class silent") {
    // global: 4×A + 4×B (p = 1/2 each — the classes SUM to the
    // population, so the fixture balances c2/c3 against c1). c1 =
    // 2A+2B matches the population exactly → TV 0, silent. c2 = 2A:
    // present |2·8 − 4·2| = 8, absent-B tail n_c·(n − Σ n_v) =
    // 2·(8−4) = 8 → TV = 16 / (2·2·8) = 0.5 exactly; c3 = 2B mirrors
    val rows = Seq(("c1", "A"), ("c1", "A"), ("c1", "B"), ("c1", "B"),
      ("c2", "A"), ("c2", "A"), ("c3", "B"), ("c3", "B"))
      .toDF("grp", "diag")
    val got = DataQuality.tCloseness(rows, Seq("grp"), "diag", t = 0.4)
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("c2", 2L, 0.5), ("c3", 2L, 0.5)), s"got $got")
    // threshold is strict: t = 0.5 must NOT flag the exact-0.5 class
    assert(DataQuality.tCloseness(rows, Seq("grp"), "diag", t = 0.5)
      .count() == 0L)
    // three-value global, class missing two of them: n=9 (3A+3B+3C),
    // c3 = 3C → present |3·9 − 3·3| = 18, absent tail 3·(9−3) = 18,
    // TV = 36/(2·3·9) = 0.666667 (pround at 6)
    val tri = Seq(("x", "A"), ("x", "B"), ("x", "A"), ("x", "B"),
      ("x", "A"), ("x", "B"), ("c3", "C"), ("c3", "C"), ("c3", "C"))
      .toDF("grp", "diag")
    val t3 = DataQuality.tCloseness(tri, Seq("grp"), "diag", t = 0.6)
      .as[(String, Long, Double)].collect().toSeq
    assert(t3 == Seq(("c3", 3L, 0.666667)), s"got $t3")
  }

  test("tCloseness: NULL sensitive rows excluded everywhere (r11 advice)") {
    // same balanced fixture + null-sensitive litter in every class:
    // the audit must behave as if the null rows were never there —
    // previously n and the absent-value tail kept the null mass while
    // the equi-join dropped it, inflating every class's TV
    val clean = Seq(("c1", "A"), ("c1", "A"), ("c1", "B"), ("c1", "B"),
      ("c2", "A"), ("c2", "A"), ("c3", "B"), ("c3", "B"))
    val littered = clean ++ Seq(("c1", null), ("c2", null), ("c4", null))
    val got = DataQuality.tCloseness(littered.toDF("grp", "diag"),
      Seq("grp"), "diag", t = 0.4).as[(String, Long, Double)].collect().toSet
    val want = DataQuality.tCloseness(clean.toDF("grp", "diag"),
      Seq("grp"), "diag", t = 0.4).as[(String, Long, Double)].collect().toSet
    assert(got == want, s"got $got want $want")
    // c1 still matches the population exactly → silent; c4 (nulls
    // only) has no observed sensitive values → no row, not a crash
    assert(!got.exists(_._1 == "c1") && !got.exists(_._1 == "c4"))
  }

  test("abTest: hand-computed arms, chi-square and Welch t², degenerate NULLs") {
    // md5 last-hex-digit arms for ids 1..8: A = {2,4,6}, B = {1,3,5,7,8}
    def e(u: Long, ty: String, v: Double) = (u, ty, v)
    val rows = Seq(
      e(2, "purchase", 10.0), e(4, "purchase", 20.0), e(4, "purchase", 10.0),
      e(6, "view", 99.0), // non-conversion value never counts
      e(1, "purchase", 10.0), e(3, "view", 0.0), e(5, "click", 0.0),
      e(7, "purchase", 30.0), e(8, "purchase", 20.0))
      .toDF("user_id", "event_type", "value")
    val got = DataQuality.abTest(rows, "user_id", "event_type", "purchase",
        "value")
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // A: n=3 x=2 s=4000¢ q=10e6; B: n=5 x=3 s=6000¢ q=14e6
    val conv = got("conversion")
    assert((conv._2, conv._3, conv._4, conv._5) == ((3L, 5L, 2L, 3L)))
    assert(conv._6.contains(0.666667) && conv._7.contains(0.6))
    // chi2 = (8)·(2·2 − 3·1)² / (3·5·5·3) = 8/225
    assert(conv._8.contains(math.floor(8.0 / 225.0 * 1e6 + 0.5) / 1e6))
    val vpu = got("value_per_user")
    assert((vpu._2, vpu._3, vpu._4, vpu._5) == ((3L, 5L, 4000L, 6000L)))
    assert(vpu._6.contains(13.333333) && vpu._7.contains(12.0))
    // Welch t² from the same exact sums, replayed in-order here
    val ma = 4000.0 / 100.0 / 3.0; val mb = 6000.0 / 100.0 / 5.0
    val va = (10e6 / 100.0 / 100.0 - (4000.0 / 100.0) * (4000.0 / 100.0) / 3.0) / 2.0
    val vb = (14e6 / 100.0 / 100.0 - (6000.0 / 100.0) * (6000.0 / 100.0) / 5.0) / 4.0
    val t2 = (ma - mb) * (ma - mb) / (va / 3.0 + vb / 5.0)
    assert(vpu._8.contains(math.floor(t2 * 1e6 + 0.5) / 1e6))
    // every user converted → chi-square denominator 0 → NULL stat
    val allConv = Seq(e(1, "purchase", 1.0), e(2, "purchase", 1.0))
      .toDF("user_id", "event_type", "value")
    val degen = DataQuality.abTest(allConv, "user_id", "event_type",
        "purchase", "value")
      .filter(col("metric") === "conversion").select("stat")
      .as[Option[Double]].head()
    assert(degen.isEmpty)
    // single-user arms → Welch t² needs n>1 per arm → NULL stat
    val tiny = DataQuality.abTest(allConv, "user_id", "event_type",
        "purchase", "value")
      .filter(col("metric") === "value_per_user").select("stat")
      .as[Option[Double]].head()
    assert(tiny.isEmpty)
  }

  test("outliersMadFromBins: bounded-bin flags == exact flags on integral values; zero-MAD silent") {
    // the estimated medians shift within a bin (6.0 vs exact 5.5) but
    // a 3·MAD flag doesn't care — a lone 500 among 1..9 flags under
    // BOTH spellings; group g2 is constant → MAD 0 → nothing flagged
    val rows = ((1 to 9).map(i => ("g1", i.toLong, i.toDouble)) :+
      (("g1", 99L, 500.0))) ++ (1 to 5).map(i => ("g2", 100L + i, 7.0))
    val df = rows.toDF("event_type", "event_id", "value")
    val bounded = DataQuality.outliersMadFromBins(df, Seq("event_type"),
        "value", k = 3.0, lo = 0.0, hi = 600.0, nBins = 600)
      .select("event_id").as[Long].collect().toSet
    val exact = DataQuality.outliersMad(df, Seq("event_type"),
        "value", k = 3.0, scale = 2)
      .select("event_id").as[Long].collect().toSet
    assert(bounded == Set(99L) && exact == bounded)
  }

  test("seasonal stratum flags a regime anomaly the global key misses") {
    // sensor s: hod=3 readings hug 10, hod=15 readings hug 100 — a 100
    // at hod=3 is wildly anomalous for 3am but unremarkable globally
    // (the global variance is dominated by the regime split itself)
    // 12 baseline readings: a lone spike among n identical-ish points
    // caps at z = sqrt(n) under population variance, so n must exceed
    // k^2 = 9 for the flag to be reachable (sqrt(12) = 3.46 > 3; the
    // original 8-point fixture capped at sqrt(8) = 2.83 and could
    // never fire).
    val rows = (Seq.tabulate(12)(i => ("s", 3, i.toLong, 10.0 + i * 0.01)) ++
      Seq.tabulate(8)(i => ("s", 15, 100L + i, 100.0 + i * 0.01)) :+
      (("s", 3, 999L, 100.0))) // the 3am spike
      .toDF("event_type", "hod", "event_id", "value")
    val seasonal = DataQuality.outliers(
      rows, Seq("event_type", "hod"), "value", k = 3, scale = 2)
      .select("event_id").as[Long].collect().toSet
    assert(seasonal == Set(999L))
    val global = DataQuality.outliers(
      rows, Seq("event_type"), "value", k = 3, scale = 2)
      .select("event_id").as[Long].collect().toSet
    assert(!global.contains(999L)) // regime split hides it globally
  }
}
