package graft

import graft.operators.{Curation, DataQuality, Sessionize}
import org.apache.spark.sql.functions._

/** Round-10 operator specs: growth accounting (C17), streaks (C18),
  * RFM (C19), rolling anomalies (DQ7), readability (H26), temperature
  * sampling (K10) — hand-computed fixtures. */
class GrowthAccountingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    // u1 active Jan 1, 2, 5; u2 active Jan 2 only
    (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 09:00:00"),
    (1L, "2024-01-02 11:00:00"), // same day dedups
    (1L, "2024-01-05 10:00:00"),
    (2L, "2024-01-02 10:00:00"))
    .toDF("user_id", "s").withColumn("ts", col("s").cast("timestamp"))

  test("growthAccounting: new/retained/resurrected/churned per day") {
    val got = Sessionize.growthAccounting(df, "user_id", "ts")
      .select(col("day").cast("string"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got("2024-01-01") == (1L, 0L, 0L, 0L)) // u1 new
    assert(got("2024-01-02") == (1L, 1L, 0L, 0L)) // u2 new, u1 retained
    // Jan 3: u1's run ended (gap) and u2's run ended -> 2 churn-ins
    assert(got("2024-01-03") == (0L, 0L, 0L, 2L))
    assert(got("2024-01-05") == (0L, 0L, 1L, 0L)) // u1 resurrects
    // Jan 4 carried nothing; Jan 6 churn is past the observed calendar
    assert(!got.contains("2024-01-04") && !got.contains("2024-01-06"))
  }

  test("growthAccounting: every active day decomposes exactly") {
    val sf001 = graft.sources.Tables.events(spark, sf)
    val got = Sessionize.growthAccounting(sf001, "user_id", "ts")
    val ledger = sf001.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().groupBy("d").count()
    // per day: n_new + n_retained + n_resurrected == that day's actives
    val mismatches = got.join(ledger, got("day") === ledger("d"), "left")
      .filter(coalesce(col("count"), lit(0L)) =!=
        col("n_new") + col("n_retained") + col("n_resurrected"))
      .count()
    assert(mismatches == 0)
  }
}

class ActiveStreaksSpec extends SparkSpec {
  import spark.implicits._

  test("activeStreaks: longest run, ties to the earliest") {
    val df = Seq(
      // u1: Jan 1-3 (3 days), Jan 5-6 (2) -> 3-day streak
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (1L, "2024-01-05"), (1L, "2024-01-06"),
      // u2: Jan 1-2 and Jan 4-5, both length 2 -> earliest wins
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (2L, "2024-01-04"), (2L, "2024-01-05"))
      .toDF("user_id", "s")
      .withColumn("ts", concat(col("s"), lit(" 12:00:00")).cast("timestamp"))
    val got = Sessionize.activeStreaks(df, "user_id", "ts")
      .select(col("user_id"), col("streak_days"),
        col("streak_start").cast("string"), col("streak_end").cast("string"))
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == (3L, "2024-01-01", "2024-01-03"))
    assert(got(2L) == (2L, "2024-01-01", "2024-01-02"))
  }
}

class RfmSpec extends SparkSpec {
  import spark.implicits._

  test("rfm: deterministic quartiles, 4 = best on every axis") {
    // u1: 1 event, most recent, lowest spend; u4: 4 events, stalest,
    // highest spend — recency and frequency/monetary pull OPPOSITE ways
    val rows =
      Seq((1L, "2024-01-04", 1)) ++
      (1 to 2).map(i => (2L, "2024-01-03", i)) ++
      (1 to 3).map(i => (3L, "2024-01-02", i)) ++
      (1 to 4).map(i => (4L, "2024-01-01", i))
    val df = rows.toDF("user_id", "s", "i")
      .withColumn("ts", concat(col("s"), lit(" 12:00:00")).cast("timestamp"))
      .withColumn("value", col("user_id").cast("double") * 10.0)
    val got = Sessionize.rfm(df, "user_id", "ts", "value")
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("segment"))
      .as[(Long, Int, Long, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(1L) == (0, 1L, 10.0, "411"))
    assert(got(2L) == (1, 2L, 40.0, "322"))
    assert(got(3L) == (2, 3L, 90.0, "233"))
    assert(got(4L) == (3, 4L, 160.0, "144"))
  }
}

class RollingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def daily(rows: Seq[(String, Int, Long)]) =
    rows.toDF("k", "d", "cnt")
      .withColumn("day", to_date(lit("2024-01-01")) + col("d"))
      .select("k", "day", "cnt")

  test("anomaliesFromDaily: zero-variance prior flags any deviation") {
    val d = daily(Seq(("a", 0, 10L), ("a", 1, 10L), ("a", 2, 10L),
      ("a", 3, 10L), ("a", 4, 100L), ("a", 5, 10L)))
    val got = DataQuality.anomaliesFromDaily(d, Seq("k"))
      .select(col("day").cast("string"), col("n_prior"), col("is_anomaly"))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("2024-01-01") == (0L, false)) // no prior evidence
    assert(got("2024-01-03") == (2L, false)) // below minPrior
    assert(got("2024-01-04") == (3L, false)) // x == mu exactly
    assert(got("2024-01-05") == (4L, true))  // sigma 0, x deviates
    // day 6's prior now has variance (10,10,10,100): mu=32.5,
    // sigma^2 = (4*13000-130^2)/16 = 2193.75 -> 3 sigma ~ 140 -> 10 ok
    assert(got("2024-01-06") == (5L, false))
  }

  test("anomaliesFromDaily: boundary is strict (> z sigma, not >=)") {
    // prior 8, 12, 10 -> n=3, S=30, Q=308; x s.t. (3x-30)^2 > 9*(924-900)
    // -> (x-10)^2 > 24 -> x=15 flags (25>24), x=14 doesn't (16<24)
    val d = daily(Seq(("a", 0, 8L), ("a", 1, 12L), ("a", 2, 10L),
      ("a", 3, 15L), ("b", 0, 8L), ("b", 1, 12L), ("b", 2, 10L),
      ("b", 3, 14L)))
    val got = DataQuality.anomaliesFromDaily(d, Seq("k"))
      .filter(col("day") === "2024-01-04")
      .select(col("k"), col("is_anomaly")).as[(String, Boolean)]
      .collect().toMap
    assert(got("a") && !got("b"))
  }
}

class SeasonalBaselineSpec extends SparkSpec {
  import spark.implicits._

  test("seasonalBaseline: same-weekday days share an exact mean; residuals close") {
    val df = Seq(
      // Jan 1 and Jan 8 2024 are both Mondays -> one dow group
      ("a", "2024-01-01 10:00:00", 4.0), ("a", "2024-01-01 11:00:00", 6.0),
      ("a", "2024-01-08 10:00:00", 20.0),
      // Jan 3 is a Wednesday -> its own group
      ("a", "2024-01-03 10:00:00", 7.0))
      .toDF("k", "s", "value").withColumn("ts", col("s").cast("timestamp"))
    val got = graft.operators.TimeAgg.seasonalBaseline(df, "k", "ts", "value")
      .select(col("day").cast("string"), col("value"), col("baseline"),
        col("residual"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // Mondays: daily sums 10 and 20, mean 15
    assert(got("2024-01-01") == (10.0, 15.0, -5.0))
    assert(got("2024-01-08") == (20.0, 15.0, 5.0))
    // lone Wednesday: baseline = itself, residual 0
    assert(got("2024-01-03") == (7.0, 7.0, 0.0))
  }

  test("seasonalBaseline: residuals sum to zero within every (key, dow) group") {
    val ev = graft.sources.Tables.events(spark, sf)
    val got = graft.operators.TimeAgg.seasonalBaseline(
      ev, "event_type", "ts", "value")
    // exact-cross-product residuals: sum over a dow group is 0/n -> 0
    val bad = got.groupBy("event_type", "dow")
      .agg(sum(col("residual")).as("rs"))
      .filter(abs(col("rs")) > 1e-6).count()
    assert(bad == 0)
  }
}

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("fleschScore: hand-computed on a two-sentence doc") {
    val df = Seq((1L, "The cat sat. The dog ran!")).toDF("doc_id", "text")
    val got = df.select(
      graft.functions.TextFunctions.tokenCount(col("text")).as("w"),
      graft.functions.TextFunctions.sentenceCount(col("text")).as("s"),
      graft.functions.TextFunctions.syllableCount(col("text")).as("sy"),
      graft.functions.TextFunctions.fleschScore(col("text")).as("f"))
      .as[(Int, Int, Int, Double)].head()
    // 6 words, 2 sentences, 6 vowel groups:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(got == ((6, 2, 6, 119.19)))
  }

  test("fleschScore: empty and unpunctuated text hit the guards") {
    val df = Seq((1L, ""), (2L, "no terminal punctuation here"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      graft.functions.TextFunctions.fleschScore(col("text")).as("f"))
      .as[(Long, Double)].collect().toMap
    // empty: W=1, S=1, SY=0 -> 206.835 - 1.015 = 205.82
    assert(got(1L) == 205.82)
    // 4 words, S guard 1, 9 vowel groups (no-o, ter-mi-nal has a+i,
    // punc-tu-a-tion u+ua+io, here e+e): verify it's finite and < 206
    assert(got(2L) < 206.0)
  }
}

class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  test("matryoshkaTopK: candidates >= corpus collapses to exact brute force") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val q = emb.filter(col("vec_id") % 100 === 0)
    val got = graft.operators.Similarity.matryoshkaTopK(
      emb, q, "vec_id", "embedding", k = 5, mDims = 16,
      candidates = emb.count().toInt)
    val want = graft.operators.Similarity.bruteForceTopK(
      emb, q, "vec_id", "embedding", 5)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("matryoshkaTopK: a perfect prefix match survives a narrow cascade") {
    // query == corpus row 2 on the prefix AND in full -> rank 1 even
    // with the tightest legal candidate pool
    def vec(seed: Int) = Array.tabulate(8)(i => (seed * 31 + i).toFloat)
    val corpus = Seq((1L, vec(3)), (2L, vec(7)), (3L, vec(11)), (4L, vec(19)))
      .toDF("vec_id", "embedding")
    val q = Seq((99L, vec(7))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.matryoshkaTopK(
        corpus, q, "vec_id", "embedding", k = 1, mDims = 4, candidates = 1)
      .select("nn_id").as[Long].head()
    assert(got == 2L)
  }
}

class SceneCutsSpec extends SparkSpec {
  import spark.implicits._

  test("sceneCuts: identical frames no cut, flipped frame cuts, pairs are consecutive") {
    // payload = 3 frames of 4 bytes: two identical low-byte frames,
    // then one with a very different byte pattern
    val quiet = Array[Byte](10, 10, 10, 10)
    val loud = Array[Byte](120, 1, 1, 1)
    val media = Seq((1L, quiet ++ quiet ++ loud))
      .toDF("media_id", "payload")
    val got = graft.operators.Multimodal.sceneCuts(media,
        frameBytes = 4, everyNth = 1, cutHamming = 1, slots = 4)
      .select(col("frame_idx"), col("hamming"), col("is_cut"))
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)
    assert(got.length == 2)
    assert(got(0) == ((1L, 0, false))) // identical frames: hamming 0
    assert(got(1)._1 == 2L && got(1)._2 > 0 && got(1)._3) // hard cut
  }

  test("sceneCuts: single-frame media emits no pairs") {
    val media = Seq((1L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "payload")
    assert(graft.operators.Multimodal.sceneCuts(media, 4, 1, 1, 4)
      .count() == 0)
  }
}

class KeepFirstSpanSpec extends SparkSpec {
  import spark.implicits._

  test("keepFirst span dedup: canonical first occurrence survives, others drop") {
    // "a b c" appears in docs 1, 2 and twice in 3 — only doc 1's copy
    // (the min (doc, pos) occurrence) survives
    val df = Seq(
      (1L, "a b c x y z"),
      (2L, "q a b c r s"),
      (3L, "a b c t a b c"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.removeRepeatedSpans(
        df, "doc_id", "text", 3, keepFirst = true)
      .select("doc_id", "clean_text").as[(Long, String)]
      .collect().toMap
    assert(got(1L) == "a b c x y z")     // keeper intact
    assert(got(2L) == "q r s")           // copy dropped
    assert(got(3L) == "t")               // both copies dropped
    // default policy removes the keeper too
    val all = graft.operators.Dedup.removeRepeatedSpans(
        df, "doc_id", "text", 3)
      .select("doc_id", "clean_text").as[(Long, String)]
      .collect().toMap
    assert(all(1L) == "x y z")
  }
}

class IntervalLookupSpec extends SparkSpec {
  import spark.implicits._

  test("intervalLookup: half-open bounds, multi-bucket spans match once, overlaps emit each") {
    val facts = Seq((1L, 0.0), (2L, 49.9), (3L, 50.0), (4L, 175.0),
      (5L, 9999.0)).toDF("id", "v")
    val dim = Seq(
      ("low", 0.0, 50.0),
      ("wide", 0.0, 200.0), // spans 5 buckets at width 50 — matches once
      ("mid", 50.0, 200.0))
      .toDF("band", "lo", "hi")
    val got = graft.operators.TemporalJoin.intervalLookup(
        facts, dim, "v", "lo", "hi", bucketWidth = 50.0)
      .select("id", "band").as[(Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
    assert(got(1L) == Seq("low", "wide"))
    assert(got(2L) == Seq("low", "wide"))
    assert(got(3L) == Seq("mid", "wide")) // hi is exclusive: not "low"
    assert(got(4L) == Seq("mid", "wide"))
    assert(!got.contains(5L)) // outside every band: dropped
  }
}

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lineDedup: cross-doc hot lines drop everywhere, order survives, all-dropped is empty") {
    val df = Seq(
      (1L, "NAV\nunique one\nNAV2"),
      (2L, "NAV\nunique two\nNAV2"),
      (3L, "NAV\nunique three\nNAV2"),
      (4L, "NAV\nNAV2")) // nothing unique -> empty
      .toDF("doc_id", "text")
    val got = graft.operators.Curation.lineDedup(df, "doc_id", "text", 3)
      .select("doc_id", "clean_text", "n_kept", "n_dropped")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == (("unique one", 1L, 2L)))
    assert(got(2L) == (("unique two", 1L, 2L)))
    assert(got(4L) == (("", 0L, 2L)))
    // within-doc repeats of a non-hot line are kept at every position
    val rep = Seq((1L, "a\nb\na"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val keep = graft.operators.Curation.lineDedup(rep, "doc_id", "text", 3)
      .filter(col("doc_id") === 1L).select("clean_text").as[String].head()
    assert(keep == "a\nb\na")
  }
}

class InstantRateSpec extends SparkSpec {
  import spark.implicits._

  test("instantRate: last-two delta, reset-aware, single-reading NULLs") {
    val df = Seq(
      // u1: 10 -> 30 over 20s  => idelta 20, irate 1.0
      (1L, "2024-01-01 00:00:00", 1L, 10.0),
      (1L, "2024-01-01 00:00:20", 2L, 30.0),
      // u2: counter reset 50 -> 5 => idelta = post-reset reading 5
      (2L, "2024-01-01 00:00:00", 3L, 50.0),
      (2L, "2024-01-01 00:00:10", 4L, 5.0),
      // u3: one reading => NULLs
      (3L, "2024-01-01 00:00:00", 5L, 7.0))
      .toDF("user_id", "s", "event_id", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val got = graft.operators.TimeAgg.instantRate(
        df, "user_id", "ts", "event_id", "value")
      .select(col("user_id"), col("idelta"), col("irate_per_sec"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == ((Some(20.0), Some(1.0))))
    assert(got(2L) == ((Some(5.0), Some(0.5))))
    assert(got(3L) == ((None, None)))
  }
}

class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("mmrTopK: first pick is the relevance argmax; near-dup second is skipped") {
    // corpus: 2 = near-copy of 1 (both close to the query), 3 = diverse
    // and slightly less relevant. Pure relevance ranks (1, 2, 3);
    // MMR at lambda 0.5 must pick 1 then 3 (2's sim to 1 kills it).
    val qv = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val corpus = Seq(
      (1L, Array(0.99f, 0.10f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.11f, 0.0f, 0.0f)),
      (3L, Array(0.80f, 0.0f, 0.60f, 0.0f)),
      (4L, Array(0.10f, 0.0f, 0.0f, 0.99f)))
      .toDF("vec_id", "embedding")
    val q = Seq((99L, qv)).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.mmrTopK(corpus, q, "vec_id",
        "embedding", k = 3, poolSize = 4)
      .orderBy("rank").select("nn_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 2L) || got == Seq(1L, 3L, 4L),
      s"diversity pick broken: $got")
    // and the pure-relevance order confirms 2 was second before MMR
    val rel = graft.operators.Similarity.bruteForceTopK(
        corpus.withColumn("embedding", col("embedding").cast("array<double>")),
        q.withColumn("embedding", col("embedding").cast("array<double>")),
        "vec_id", "embedding", 2)
      .orderBy("rank").select("nn_id").as[Long].collect().toSeq
    assert(rel == Seq(1L, 2L))
  }
}

class CompletenessSpec extends SparkSpec {
  import spark.implicits._

  test("completeness: per-key span, missing-day arithmetic, complete flag") {
    val df = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-02"), ("a", "2024-01-04"),
      ("b", "2024-02-10"))
      .toDF("k", "s")
      .withColumn("ts", concat(col("s"), lit(" 09:00:00")).cast("timestamp"))
    val got = graft.operators.DataQuality.completeness(df, Seq("k"), "ts")
      .select(col("k"), col("n_expected"), col("n_present"),
        col("n_missing"), col("complete"))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got("a") == (4L, 3L, 1L, false)) // Jan 3 missing
    assert(got("b") == (1L, 1L, 0L, true))  // single-day key complete
  }
}

class TemperatureSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (
    (1 to 9).map(i => (s"a$i", "A")) ++
    (1 to 4).map(i => (s"b$i", "B")) ++
    Seq(("c1", "C")))
    .toDF("doc_id", "source")

  test("temperatureSample: isqrt-proportional allocation, exact total") {
    // counts 9/4/1 -> isqrt 3/2/1, U=6; total 6 -> exactly 3/2/1
    val got = Curation.temperatureSample(corpus, "source", col("doc_id"),
      total = 6L, salt = "|t")
    val bySrc = got.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc == Map("A" -> 3L, "B" -> 2L, "C" -> 1L))
  }

  test("temperatureSample: exhausted strata shorten the total honestly") {
    // total 20 -> raw shares 10/6/3 but B caps at 4 and C at 1
    val got = Curation.temperatureSample(corpus, "source", col("doc_id"),
      total = 20L, salt = "|t")
    val bySrc = got.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc("A") == 9L && bySrc("B") == 4L && bySrc("C") == 1L)
  }

  test("temperatureSample: same salt = same set; new salt reshuffles") {
    val a = Curation.temperatureSample(corpus, "source", col("doc_id"),
      6L, "|t").select("doc_id").as[String].collect().toSet
    val b = Curation.temperatureSample(corpus, "source", col("doc_id"),
      6L, "|t").select("doc_id").as[String].collect().toSet
    assert(a == b)
    val c = Curation.temperatureSample(corpus, "source", col("doc_id"),
      6L, "|other-salt").select("doc_id").as[String].collect().toSet
    assert(c.size == 6) // allocation unchanged even if the draw differs
  }
}
