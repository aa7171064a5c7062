package graft

import graft.operators._
import graft.sources.{MongoJsonSource, Tables}
import graft.functions.{Portable, TextFunctions}
import graft.functions.Portable.{fixedAvg, fixedSum, pround, sqlFixedAvg, sqlFixedSum, sqlPround}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract: one `queries` entry per operator from SURVEY.md §2,
  * with a DuckDB-equivalent `oracleSql` wherever the semantics are
  * ANSI-SQL-expressible. Every computed column is aliased identically on
  * both sides and doubles are rounded to kill float-summation ULP noise.
  */
object SparkEntry {

  /** Flagship: the reference's daily_summary pipeline end-to-end
    * (stage → two rollups → summary join). */
  def entry(spark: SparkSession): DataFrame =
    queries("b4_agg_summary")(spark, "/root/testdata/sf0.001")

  // ---- shared shapes -------------------------------------------------

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)
  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)
  private def embD(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).withColumn("embedding", col("embedding").cast("array<double>"))

  /** L13's directed purchase-sequence graph: within each order, the
    * filtered parts in (l_linenumber, l_partkey) order, consecutive
    * pairs as edges. The l_partkey tie-break is load-bearing — the
    * testdata carries duplicate l_linenumber per order, so lead() over
    * linenumber alone is nondeterministic in BOTH engines. */
  private[graft] def sccEdges(s: SparkSession, d: String,
                              qtyCut: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 7 === 0 && col("l_quantity") <= qtyCut)
      .select("l_orderkey", "l_linenumber", "l_partkey").distinct()
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    f.withColumn("nxt", lead("l_partkey", 1).over(w))
      .filter(col("nxt").isNotNull && col("nxt") =!= col("l_partkey"))
      .select(col("l_partkey").as("src"), col("nxt").as("dst")).distinct()
  }


  // ---- query inventory (SURVEY.md §2) --------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A. raw→stage normalization
    "a1_stage_events" -> ((s, d) => Stage.stageEvents(ev(s, d))),

    "a2_mongo_normalize" -> ((s, d) => {
      val packed = MongoJsonSource.packDocuments(
        ev(s, d), "user_id", "ts", 4 * 3600, Seq("event_id", "event_type", "value"))
      MongoJsonSource.normalize(packed, Seq("user_id"))
    }),

    "a3_stage_users" -> ((s, d) =>
      Stage.stageUsers(Tables.customer(s, d), ev(s, d))
        .withColumn("devices", concat_ws(",", col("devices")))),

    // depth-2 dlt normalization: 4h metric buckets packed inside
    // per-(user, day) documents, flattened back by normalizeRecursive;
    // the returned table is the GRANDCHILD (day doc → bucket → metric),
    // so the md5 id chain across two levels is oracle-checked
    "a4_normalize_nested" -> ((s, d) => {
      val buckets = MongoJsonSource.packDocuments(
        ev(s, d), "user_id", "ts", 4 * 3600, Seq("event_id", "event_type", "value"))
      val dayDocs = buckets
        .groupBy(col("user_id"), TimeAgg.dayKey(col("created_at")).as("day"))
        .agg(array_sort(collect_list(
          struct(col("created_at"), col("doc_id"), col("metrics")))).as("buckets"))
        .withColumn("day_id", md5(concat_ws("|", col("user_id"), col("day"))))
      MongoJsonSource.normalizeRecursive(dayDocs, "days", "day_id")("days__buckets__metrics")
    }),

    // B. periodic aggregation layer
    "b1_agg_daily" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(fixedSum(col("value"), 4).as("value_sum"), count(lit(1)).as("n_events"))),

    // b1 through the salted two-stage shape — the a-priori-hot-key
    // guard; sharing b1's oracle proves the decomposition is value-exact
    "b13_salted_agg_daily" -> ((s, d) =>
      Skew.saltedAgg(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        Seq("user_id", "day"), saltBy = col("event_id"), saltFactor = 8,
        partialAggs = Seq(
          sum(Portable.toFixed(col("value"), 4)).as("__fs"),
          count(lit(1)).as("__n")),
        mergeAggs = Seq(
          (sum(col("__fs")).cast("double") / lit(10000.0)).as("value_sum"),
          sum(col("__n")).as("n_events")))
        .select("user_id", "day", "value_sum", "n_events")),

    "b2_agg_weekly" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id"),
          date_format(TimeAgg.weekBucket(col("ts")), "yyyy-MM-dd").as("week"))
        .agg(fixedAvg(col("value"), 4).as("avg_value"))),

    "b3_agg_monthly" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id"), TimeAgg.monthKey(col("ts")).as("month"))
        .agg(fixedSum(col("value"), 4).as("value_sum"), count(lit(1)).as("n_events"))),

    "b4_agg_summary" -> ((s, d) => {
      // conditional aggregation: ONE scan + ONE shuffle (the two-agg +
      // join spelling costs 4 exchanges and 2 scans of the fact table);
      // null-filtering reproduces the summary join's inner semantics
      val isView = col("event_type") === "view"
      val isClick = col("event_type") === "click"
      ev(s, d).groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(
          (sum(when(isView, Portable.toFixed(col("value"), 4))).cast("double")
            / lit(10000.0) / count(when(isView, lit(1)))).as("avg_view_value"),
          (sum(when(isClick, Portable.toFixed(col("value"), 4))).cast("double")
            / lit(10000.0)).as("click_value_sum"))
        .filter(col("avg_view_value").isNotNull && col("click_value_sum").isNotNull)
        .select("user_id", "day", "avg_view_value", "click_value_sum")
    }),

    "b5_agg_hourly_bucket" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id"),
          TimeAgg.timeBucket(col("ts"), 4 * 3600).cast("string").as("bucket"))
        .agg(count(lit(1)).as("n_events"), fixedSum(col("value"), 4).as("value_sum"))),

    "b6_gapfill_locf" -> ((s, d) => {
      val hourly = ev(s, d)
        .groupBy(col("user_id"), TimeAgg.timeBucket(col("ts"), 3600).as("bucket"))
        .agg(count(lit(1)).as("n_events"), fixedAvg(col("value"), 4).as("avg_value"))
      TimeAgg.gapfillLocf(hourly, "user_id", "bucket", 3600,
          fillZero = Seq("n_events"), locf = Seq("avg_value"))
        .withColumn("bucket", col("bucket").cast("string"))
    }),

    // explicit-range gapfill — the two-argument
    // time_bucket_gapfill(start, finish) form: full [start, finish]
    // spine per entity observed in range, leading nulls, trailing LOCF
    "b11_gapfill_bounded" -> ((s, d) => {
      val hourly = ev(s, d)
        .groupBy(col("user_id"), TimeAgg.timeBucket(col("ts"), 3600).as("bucket"))
        .agg(count(lit(1)).as("n_events"), fixedAvg(col("value"), 4).as("avg_value"))
      TimeAgg.gapfillLocf(hourly, "user_id", "bucket", 3600,
          fillZero = Seq("n_events"), locf = Seq("avg_value"),
          bounds = Some((lit("2024-01-10 00:00:00").cast("timestamp"),
            lit("2024-01-13 00:00:00").cast("timestamp"))))
        .withColumn("bucket", col("bucket").cast("string"))
    }),

    "b7_rollup_totals" -> ((s, d) =>
      ev(s, d).withColumn("month", TimeAgg.monthKey(col("ts")))
        .rollup(col("user_id"), col("month"))
        .agg(fixedSum(col("value"), 4).as("value_sum"), count(lit(1)).as("n_events"),
          grouping(col("user_id")).cast("int").as("grp_user"),
          grouping(col("month")).cast("int").as("grp_month"))
        .select(coalesce(col("user_id"), lit(-1L)).as("user_id"),
          coalesce(col("month"), lit("ALL")).as("month"),
          col("grp_user"), col("grp_month"), col("value_sum"), col("n_events"))),

    // full CUBE over (event_type, month) with grouping flags — the
    // grouping-sets companion to b7's ROLLUP (dbt reporting marts
    // materialize exactly these margin tables)
    "b14_cube_totals" -> ((s, d) =>
      ev(s, d).withColumn("month", TimeAgg.monthKey(col("ts")))
        .cube(col("event_type"), col("month"))
        .agg(fixedSum(col("value"), 4).as("value_sum"),
          count(lit(1)).as("n_events"),
          grouping(col("event_type")).cast("int").as("grp_type"),
          grouping(col("month")).cast("int").as("grp_month"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("month"), lit("ALL")).as("month"),
          col("grp_type"), col("grp_month"), col("value_sum"), col("n_events"))),

    // b15: the reference's wide daily summary (models/agg/
    // daily_summary.sql JOINS one aggregate per metric) re-expressed
    // Spark-first as ONE grouped pass: pivot with an EXPLICIT value
    // list — no distinct-probe job, no per-metric scans, a single
    // shuffle; at N metrics the reference shape pays N scans + N-1
    // joins. Absent (user, day, type) cells are NULL on both engines
    "b15_pivot_daily" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(fixedSum(col("value"), 4))),

    // b16: melt — the inverse surface. The registered spelling round-
    // trips b15's wide matrix back to long form; dropping the NULL
    // cells makes it provably equal the direct 3-key aggregate (the
    // oracle), so one hash check covers both pivot directions
    "b16_unpivot_daily" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      ev(s, d).groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .pivot("event_type", types)
        .agg(fixedSum(col("value"), 4))
        .unpivot(Array(col("user_id"), col("day")),
          types.map(col).toArray, "event_type", "value_sum")
        .filter(col("value_sum").isNotNull)
    }),

    // b17: week-over-week deltas — the time-series analytics layer over
    // B2's weekly rollup (TimescaleDB dashboards' standard follow-up).
    // lag() AFTER aggregation: the window sees one row per (user, week),
    // bounded state per user, never the raw events
    "b17_wow_delta" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wk = ev(s, d).groupBy(col("user_id"),
          date_format(TimeAgg.weekBucket(col("ts")), "yyyy-MM-dd").as("week"))
        .agg(fixedSum(col("value"), 4).as("value_sum"))
      val w = Window.partitionBy("user_id").orderBy("week")
      wk.withColumn("prev_sum", lag(col("value_sum"), 1).over(w))
        .withColumn("wow_delta",
          pround(col("value_sum") - col("prev_sum"), 4))
        .withColumn("wow_pct",
          pround((col("value_sum") - col("prev_sum")) /
            when(col("prev_sum") =!= 0.0, col("prev_sum")), 4))
    }),

    // TimescaleDB counter_agg → delta/num_resets: reset-aware counter
    // increase per (user, day) — one window + one agg, ONE shuffle
    "b18_counter_delta" -> ((s, d) =>
      TimeAgg.counterDelta(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        keys = Seq("user_id", "day"), reading = "value",
        order = Seq("ts", "event_id"), scale = 4)),

    // TimescaleDB counter_agg -> rate(): reset-corrected increase per
    // second over the group's observed span; zero-span groups NULL
    "b29_counter_rate" -> ((s, d) =>
      TimeAgg.counterRate(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        keys = Seq("user_id", "day"), reading = "value", ts = "ts",
        order = Seq("ts", "event_id"), scale = 4)),

    // TimescaleDB time_weighted_average (LOCF weighting): each reading
    // holds until its successor; single-instant groups report NULL
    "b19_time_weighted" -> ((s, d) =>
      TimeAgg.timeWeightedAvg(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        keys = Seq("user_id", "day"), ts = "ts", tieBreak = Seq("event_id"),
        value = "value", scale = 4)),

    // TimescaleDB first()/last(): min_by/max_by over a unique struct
    // key — partial-aggregable, no per-group sort
    "b20_first_last" -> ((s, d) =>
      TimeAgg.firstLast(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        keys = Seq("user_id", "day"), value = "value",
        order = Seq("ts", "event_id"))),

    // dashboard smoothing: 7-row trailing moving average + running
    // total over the daily rollup — the window FRAME surface. Both
    // frames run in fixed-point over the PRE-AGGREGATED series (one
    // row per (user, day)); one sort serves both window specs
    "b21_moving_avg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, d)
        .groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(Portable.toFixed(col("value"), 4)).as("fs"))
      val w7 = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(-6, Window.currentRow)
      val wr = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("user_id"), col("day"),
        (col("fs").cast("double") / lit(1e4)).as("value_sum"),
        pround(sum(col("fs")).over(w7).cast("double") / lit(1e4)
          / count(lit(1)).over(w7), 4).as("mov_avg_7d"),
        (sum(col("fs")).over(wr).cast("double") / lit(1e4)).as("running_total"))
    }),

    // TimescaleDB stats_agg → slope/intercept/corr: per-(user, day)
    // least-squares fit of value against seconds-into-day — five exact
    // long sums, one shuffle; every float op after the sums (incl.
    // sqrt) is IEEE-correctly-rounded, hence oracle-reproducible
    "b22_regression" -> ((s, d) =>
      TimeAgg.regression(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        keys = Seq("user_id", "day"), ts = "ts",
        periodStart = date_trunc("DAY", col("ts")), value = "value",
        scale = 4)),

    // ASAP-style auto-smoothing of the daily series: dyadic window
    // grid, exact-integer roughness argmin, chosen smoothed series out
    "b38_asap_smooth" -> ((s, d) => {
      val daily = ev(s, d)
        .groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(Portable.toFixed(col("value"), 4)).as("fs"))
      TimeAgg.asapSmooth(daily, "user_id", "day", "fs",
        windows = Seq(1, 2, 4, 8), scale = 4)
    }),

    // top-3 longest silences per user — lag window + the native
    // bounded-heap TopKPerKey (partial cap before the exchange)
    "b37_top_gaps" -> ((s, d) =>
      TimeAgg.topGaps(ev(s, d), "user_id", "ts", "event_id", k = 3)
        .select(col("user_id"), col("gap_start"), col("gap_end"),
          col("gap_us"), col("rnk"))),

    // interpolated time-weighted average: the LOCF curve integrated
    // per 6h bucket INCLUDING boundary-crossing hold segments — the
    // cross-bucket TWA b19's per-bucket window drops
    "b36_twa_interpolated" -> ((s, d) =>
      TimeAgg.twaInterpolated(ev(s, d), "user_id", "ts",
        Seq("event_id"), "value", bucketSeconds = 6 * 3600, scale = 4)),

    // span-8 truncated EWMA (α = 1/2 ⇒ power-of-two integer weights)
    // over the b21 daily fixed-point rollup — exact integer numerator/
    // denominator, one division, one entity window
    "b34_ewma" -> ((s, d) => {
      val daily = ev(s, d)
        .groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(Portable.toFixed(col("value"), 4)).as("fs"))
      TimeAgg.ewma(daily, "user_id", "day", "fs", span = 8, scale = 4)
        .select(col("user_id"), col("day"),
          (col("fs").cast("double") / lit(1e4)).as("value_sum"),
          col("ewma"))
    }),

    // lag-1 autocorrelation of each user's daily series — the b22
    // exact-sum corr over (current, previous) pairs from one lag window
    "b35_autocorr" -> ((s, d) => {
      val daily = ev(s, d)
        .groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(Portable.toFixed(col("value"), 4)).as("fs"))
      TimeAgg.autocorr(daily, "user_id", "day", "fs", k = 1)
    }),

    "b8_percentile_summary" -> ((s, d) =>
      ev(s, d).groupBy(col("event_type")).agg(
        Portable.pround(expr("percentile(value, 0.5D)"), 4).as("p50"),
        Portable.pround(expr("percentile(value, 0.95D)"), 4).as("p95"),
        Portable.pround(expr("percentile(value, 0.99D)"), 4).as("p99"),
        count(lit(1)).as("n_events"))),

    // histogram percentiles — the bounded-memory percentile for 100 TB
    // (B8's exact aggregate buffers every value per group); 600 unit
    // bins over the value domain, estimates fully oracle-mirrored
    "b12_percentile_hist" -> ((s, d) =>
      Sketches.histPercentiles(ev(s, d), Seq("event_type"), col("value"),
        Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99)),
        lo = 0.0, hi = 600.0, nBins = 600)),

    // the continuous-aggregate percentile ROLLUP: per-(type, day) bin
    // counts (the persisted finer aggregate) merged to months by plain
    // count addition — exact by associativity — and re-estimated with
    // b12's formula, never re-reading raw data (TimescaleDB
    // percentile_agg -> rollup() -> approx_percentile)
    // rolling(percentile_agg): trailing-7-day p50/p90 per (type, day)
    // off the SAME per-day bins B31 persists — the bins fan out x7
    // in-row (never a range join), so the window estimates re-derive
    // sketch-sized and raw readings are read once
    "b41_rolling_pctl" -> ((s, d) => {
      val bins = Sketches.histBinCounts(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        Seq("event_type", "day"), col("value"),
        lo = 0.0, hi = 600.0, nBins = 600)
      Sketches.histPercentilesFromBins(
        Sketches.histRollingBins(bins, Seq("event_type"), "day", window = 7),
        Seq("event_type", "day"),
        Seq(("p50", 0.5), ("p90", 0.9)),
        lo = 0.0, hi = 600.0, nBins = 600)
    }),

    "b31_percentile_rollup" -> ((s, d) => {
      val bins = Sketches.histBinCounts(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        Seq("event_type", "day"), col("value"),
        lo = 0.0, hi = 600.0, nBins = 600)
      val monthly = Sketches.histMerge(
        bins.withColumn("month", substring(col("day"), 1, 6)),
        Seq("event_type", "month"))
      Sketches.histPercentilesFromBins(monthly, Seq("event_type", "month"),
        Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99)),
        lo = 0.0, hi = 600.0, nBins = 600)
    }),

    // TimescaleDB histogram(value, lo, hi, n): dense per-group bucket
    // counts incl. under/overflow rows, empty buckets explicit zeros
    "b30_histogram" -> ((s, d) =>
      Sketches.histogram(ev(s, d), Seq("event_type"), col("value"),
        lo = 0.0, hi = 500.0, nBuckets = 20)),

    // HLL sketch — engine-specific bits, so rows-only for the driver;
    // the spec asserts <5% relative error against exact countDistinct.
    "b9_approx_distinct" -> ((s, d) =>
      ev(s, d).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("n_users_approx"),
          count(lit(1)).as("n_events"))),

    // Portable HLL (B9's closable successor): same sketch family as
    // TimescaleDB hyperloglog()/rollup() but md5-derived, so registers,
    // rollup AND estimate are oracle-reproducible digit-for-digit —
    // per-(type, day) registers union losslessly to per-type (max is
    // idempotent/associative) and the gated row carries the scaled
    // harmonic sum itself, not just the estimate
    "b9b_hll_portable" -> ((s, d) => {
      val daily = Sketches.hllRegisters(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        Seq("event_type", "day"), col("user_id"), 8)
      Sketches.hllEstimate(Sketches.hllMerge(daily, Seq("event_type")),
        Seq("event_type"), 8)
    }),

    // COUNT DISTINCT rollup — the non-additive aggregate B31's bins
    // cannot cover: per-(type, day) KMV sketches (k smallest distinct
    // user-id hashes) UNION losslessly to months and re-estimate, raw
    // rows never re-read; deterministic hashes keep every step
    // oracle-reproducible (the portable answer to HLL rollups)
    "b32_distinct_rollup" -> ((s, d) => {
      val sk = Sketches.kmvBottomK(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        Seq("event_type", "day"), col("user_id"), 256)
      Sketches.kmvEstimate(
        Sketches.kmvMerge(sk.withColumn("month", substring(col("day"), 1, 6)),
          Seq("event_type", "month"), 256),
        Seq("event_type", "month"), 256)
    }),

    // KMV set algebra (the θ-sketch role): distinct clickers vs
    // viewers — each side's estimate, the union, and the MinHash
    // Jaccard × union intersection estimate, all md5-deterministic
    // so the oracle reproduces every digit (HLL set ops can't be
    // checked; these can)
    "b42_distinct_setops" -> ((s, d) =>
      Sketches.kmvSetOps(
        ev(s, d).filter(col("event_type") === "click"),
        ev(s, d).filter(col("event_type") === "view"),
        col("user_id"), col("user_id"), k = 256)),

    // the inverse estimate off the SAME maintained bins as b31:
    // approx_percentile_rank — fraction of observations ≤ each probe
    // value, linear within the probe's bin; probe bin/frac fold to
    // constants so the whole thing is one conditional agg over
    // sketch-sized input (no window, raw rows never re-read)
    "b33_cdf_rollup" -> ((s, d) => {
      val bins = Sketches.histBinCounts(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        Seq("event_type", "day"), col("value"),
        lo = 0.0, hi = 600.0, nBins = 600)
      val monthly = Sketches.histMerge(
        bins.withColumn("month", substring(col("day"), 1, 6)),
        Seq("event_type", "month"))
      Sketches.histCdfFromBins(monthly, Seq("event_type", "month"),
        Seq(("r_50_5", 50.5), ("r_120_25", 120.25), ("r_420", 420.0)),
        lo = 0.0, hi = 600.0, nBins = 600)
    }),

    "b10_distinct_kmv" -> ((s, d) =>
      Sketches.kmvDistinct(ev(s, d), col("event_id"), 256)),

    // LTTB-style downsampling: ~10 visually-salient points per series,
    // integer-exact triangle areas, argmax through the bounded heap
    "b24_downsample_lttb" -> ((s, d) =>
      TimeAgg.downsampleLttb(
        ev(s, d).select("user_id", "ts", "value", "event_id"),
        "user_id", "ts", "value", "event_id", nBuckets = 10, scale = 2)),

    // gapfill with linear interpolation between observations —
    // Timescale's interpolate() next to b6's locf()
    "b25_gapfill_interp" -> ((s, d) => {
      val hourly = ev(s, d)
        .groupBy(col("user_id"), TimeAgg.timeBucket(col("ts"), 3600).as("bucket"))
        .agg(fixedAvg(col("value"), 4).as("avg_value"))
      TimeAgg.gapfillInterpolate(hourly, "user_id", "bucket", "avg_value",
          3600, scale = 4)
        .withColumn("bucket", col("bucket").cast("string"))
    }),

    // count-min heavy hitters: one pass builds the bounded 4×1024
    // counter matrix (exchange is sketch-sized, not corpus-sized), the
    // sketch broadcasts, and a sampled query-term set reads its min-
    // of-rows estimates; est >= true count by the CMS guarantee
    "b23_heavy_hitters" -> ((s, d) => {
      val terms = docs(s, d).select(
        explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
          t => length(t) > 0)).as("term"))
      val cms = Sketches.countMinTable(terms, "term", 4, 1024)
      Sketches.countMinEstimate(cms, terms.distinct(), "term", 4, 1024)
        .filter(col("est_count") >= 50)
    }),

    // TimescaleDB toolkit state_agg/duration_in analog: event_type as
    // the device's state machine — exact-µs time held in each state per
    // user, one window + one hash agg, single shuffle
    "b26_state_agg" -> ((s, d) =>
      TimeAgg.stateAgg(ev(s, d), entity = "user_id", state = "event_type",
        ts = "ts", tieBreak = "event_id")),

    // TimescaleDB toolkit candlestick_agg analog: daily OHLC of the
    // reading per user — every output an exact input pick (no sums),
    // the whole tuple one partial-aggregable hash agg
    "b27_candlestick" -> ((s, d) =>
      TimeAgg.candlestick(
        ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts"))),
        keys = Seq("user_id", "day"), ts = "ts", tieBreak = "event_id",
        value = "value")),

    // TimescaleDB toolkit heartbeat_agg/uptime analog: each event
    // proves the device live for 30 min; exact-µs liveness union +
    // lapse count per user
    "b28_uptime" -> ((s, d) =>
      TimeAgg.heartbeatUptime(ev(s, d), entity = "user_id", ts = "ts",
        tieBreak = "event_id", gapSeconds = 1800)),

    // C. analytics layer
    "c1_balance_group_metrics" -> ((s, d) => {
      val grp = when(col("c_acctbal") < 0, "negative")
        .when(col("c_acctbal") < 1000, "low")
        .when(col("c_acctbal") < 5000, "mid").otherwise("high")
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(grp.as("balance_group"))
        .agg(fixedAvg(col("o_totalprice"), 4).as("avg_order_price"),
          count(lit(1)).as("n_orders"))
    }),

    "c2_containment_join" -> ((s, d) => {
      val fact = ev(s, d)
        .groupBy(col("event_type"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(fixedSum(col("value"), 4).as("tvs"))
      val dim = ArrayOps.arrayAggDistinct(ev(s, d), Seq("user_id"), "event_type", "devices")
      ArrayOps.containmentJoin(fact, dim, "event_type", "devices", Seq("user_id"))
        .groupBy("user_id", "day")
        .agg(fixedSum(col("tvs"), 4).as("step_count"), count(lit(1)).as("n_device_days"))
    }),

    "c3_latest_day_filter" -> ((s, d) => {
      val st = ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts")))
      Incremental.latestPeriod(st, "day")
        .groupBy("user_id", "day").agg(fixedSum(col("value"), 4).as("value_sum"))
    }),

    "c4_incremental_newer_than" -> ((s, d) => {
      val existing = ev(s, d).filter(TimeAgg.dayKey(col("ts")) <= "20240115")
      Incremental.newerThan(ev(s, d), existing, "ts")
        .select("event_id", "user_id", "ts", "value")
    }),

    "c5_dedup_upsert_latest" -> ((s, d) =>
      Incremental.upsertLatest(ev(s, d), Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), col("event_type").as("last_type"))),

    // SCD2 history — the dbt snapshot (strategy: check) role: one row
    // per (user, event_type state interval), emitted only on change
    // snapshot diff: what changed between two versions of the keyed
    // latest-state table — full-outer on the key, null-safe compare,
    // delta-sized output (the dbt-snapshot pre-write check)
    "c8_snapshot_diff" -> ((s, d) => {
      val e = ev(s, d).select("user_id", "ts", "event_id", "event_type")
      val cutoff = lit("2024-01-08").cast("timestamp")
      val before = Incremental.upsertLatest(e.filter(col("ts") < cutoff),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      val after = Incremental.upsertLatest(e,
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      Incremental.snapshotDiff(
        before.select("user_id", "event_type"),
        after.select("user_id", "event_type"),
        Seq("user_id"), Seq("event_type"))
    }),

    // conversion funnel (windowFunnel role, deterministic earliest-
    // chain semantics): view -> click -> purchase within 1 h of the
    // user's first view; one filtered grouped MIN per step, every
    // join/agg keyed on the entity — a single hash-partition family
    "c9_funnel" -> ((s, d) =>
      operators.Sessionize.funnel(ev(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 3600L)),

    // retention cohorts (funnel's companion): first-active-day cohort
    // x day-offset activity counts — activity collapses to distinct
    // (user, day) map-side first, everything after is cohort-sized
    // funnel velocity: per-step completer counts + exact median/p90
    // seconds from the anchor — C9's time-to-convert companion
    "c16_funnel_times" -> ((s, d) =>
      Sessionize.funnelTimes(ev(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 3600L)),

    "c10_retention" -> ((s, d) =>
      operators.Sessionize.retentionCohorts(ev(s, d), "user_id", "ts")),

    // Markov event-path bigrams: (prev type → type) transition counts
    // along each user's ordered stream — one lag window, one agg
    "c11_transitions" -> ((s, d) =>
      Sessionize.transitions(ev(s, d), "user_id", "ts", "event_id",
        "event_type")),

    // last-touch attribution: each purchase credited to the most recent
    // click/view within a 7-day lookback — one tagged window pass over
    // the single stream (no events-vs-events self-join)
    "c12_attribution" -> ((s, d) =>
      Sessionize.lastTouchAttribution(ev(s, d), "user_id", "ts",
        "event_id", "event_type", Seq("click", "view"), "purchase",
        7L * 24 * 3600)),

    // cohort LTV curve: per-(cohort, offset) exact value cells + the
    // per-cohort cumulative — retention's revenue-weighted sibling
    "c15_cohort_value" -> ((s, d) =>
      Sessionize.cohortValue(ev(s, d), "user_id", "ts", "value")),

    // top session paths: each 30-min session's ordered type sequence
    // (first 5 steps, '(truncated)' beyond), top 20 by count
    "c13_top_paths" -> ((s, d) =>
      Sessionize.topPaths(ev(s, d), "user_id", "ts", "event_id",
        "event_type", gapSeconds = 1800, maxSteps = 5, k = 20)),

    // DAU / trailing-7d WAU / stickiness off the activity ledger —
    // exact sliding distinct via a 7-way ledger explode, never a
    // per-day rescan of raw events
    "c14_stickiness" -> ((s, d) =>
      Sessionize.stickiness(ev(s, d), "user_id", "ts")),

    // growth accounting: per-day new/retained/resurrected/churned user
    // counts — one distinct collapse, ONE entity-keyed window whose
    // class and churn contributions explode out of the same pass
    "c17_growth" -> ((s, d) =>
      Sessionize.growthAccounting(ev(s, d), "user_id", "ts")),

    // longest consecutive-active-day streak per user: gaps-and-islands
    // over the activity ledger, one entity partition family end to end
    "c18_streaks" -> ((s, d) =>
      Sessionize.activeStreaks(ev(s, d), "user_id", "ts")),

    // RFM quartile segmentation: entity rollup + three exact-ntile
    // passes (distributed two-phase global rank — never a
    // single-partition window)
    "c19_rfm" -> ((s, d) =>
      Sessionize.rfm(ev(s, d), "user_id", "ts", "value")),

    "c6_scd2_history" -> ((s, d) =>
      Incremental.scd2(
        ev(s, d).select("user_id", "ts", "event_id", "event_type"),
        Seq("user_id"), col("ts"),
        order = Seq(col("ts"), col("event_id")), attrs = Seq("event_type"))
        .select(col("user_id"), col("event_type"),
          col("valid_from"), col("valid_to"), col("is_current"))),

    // point-in-time lookup over the C6 history: each fact picks the
    // state version valid at its timestamp — disjoint intervals, so
    // the key-equi join + interval predicate matches at most one row
    "c7_pit_join" -> ((s, d) => {
      val e = ev(s, d).select("user_id", "ts", "event_id", "event_type")
      val hist = Incremental.scd2(e, Seq("user_id"), col("ts"),
        order = Seq(col("ts"), col("event_id")), attrs = Seq("event_type"))
        .select(col("user_id"), col("event_type").as("state"),
          col("valid_from"), col("valid_to"))
      Incremental.pitJoin(e.select("event_id", "user_id", "ts"), hist,
        Seq("user_id"), "ts")
        .select(col("event_id"), col("user_id"), col("state"),
          col("valid_from"))
    }),

    // D. DWH join/agg at scale
    "d1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          fixedSum(col("l_quantity"), 4).as("sum_qty"),
          fixedSum(col("l_extendedprice"), 4).as("sum_base_price"),
          fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")), 4).as("sum_charge"),
          fixedAvg(col("l_quantity"), 4).as("avg_qty"),
          fixedAvg(col("l_extendedprice"), 4).as("avg_price"),
          fixedAvg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    "d2_shipping_priority" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")),

    "d3_local_supplier_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
    }),

    "d4_topk_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
    }),

    "d5_sessionize" -> ((s, d) =>
      Sessionize.summarize(ev(s, d), "user_id", "ts", "event_id", "value", 1800)),

    // same semantics as d4 but through the custom TopKPerKey plan
    // (bounded per-key heaps, partial map-side cap, no group sort) —
    // the driver's hash-compare against d4's oracle proves equivalence
    "d8_topk_native" -> ((s, d) =>
      graft.plans.TopKPerKey(
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice")),
        keys = Seq(col("c_mktsegment")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3, rankName = "rnk")),

    // rank()-spelled top-k with REAL ties (coarse price bands): the
    // ties-aware heap mode keeps every row of the k best bands' rank
    // range — deterministic as a row set with no tie-break column, the
    // property row_number can't offer
    "d9_topk_rank_ties" -> ((s, d) =>
      graft.plans.TopKPerKey(
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"),
            floor(col("o_totalprice") / 10000).as("price_band")),
        keys = Seq(col("c_mktsegment")),
        order = Seq(col("price_band").desc),
        k = 10, rankName = "rnk", mode = graft.plans.TopKMode.Ranked)),

    // TPC-H Q4 shape (order-priority checking): quarter-scoped orders
    // that have at least one returned line item — a LEFT SEMI join, so
    // the fact side never duplicates orders however many lines match;
    // the date filter pushes to the orders scan, the returnflag filter
    // to the lineitem scan, and the semi join shuffles only (orderkey)
    "d10_order_priority" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val returned = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q17 shape (small-quantity revenue): the aggregate SELF-JOIN
    // — a fact slice joined against its own per-key aggregate. The
    // brand dimension filter broadcasts as a semi join onto BOTH
    // consumers of lineitem; the per-part average partial-aggregates
    // before its exchange, so the join's build side is one row per part
    "d12_small_qty_revenue" -> ((s, d) => {
      val pk = Tables.part(s, d).filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val scoped = Tables.lineitem(s, d)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
      val avgq = scoped.groupBy(col("l_partkey"))
        .agg(fixedAvg(col("l_quantity"), 4).as("avg_qty"))
      scoped.join(avgq, Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(pround(fixedSum(col("l_extendedprice"), 4) / lit(7.0), 4)
          .as("avg_yearly"))
    }),

    // TPC-H Q22 shape (inactive customers): NOT EXISTS as a LEFT ANTI
    // join — the quarter-scoped order keys are the only shuffled
    // payload; the anti join never duplicates or drops customer rows
    "d11_inactive_customers" -> ((s, d) => {
      val active = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          fixedAvg(col("c_acctbal"), 4).as("avg_acctbal"))
    }),

    // TPC-H Q13 shape (order-count distribution): orders PRE-AGGREGATE
    // to one row per customer BEFORE the outer join — the join carries
    // |customers| + |custkeys-with-orders| rows, never order rows; a
    // zero-order customer surfaces via coalesce, and the distribution
    // agg is vocabulary-sized (distinct counts)
    "d13_order_count_dist" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("__n"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("__n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q15 shape (top supplier): quarter revenue per supplier,
    // keep the max-revenue row(s) — the scalar max broadcasts back as a
    // one-row join (never a single-partition global window); ties all
    // survive, exactly Q15's view semantics
    "d14_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("__mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("__mx"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // TPC-H Q18 shape (large orders): a HAVING-filtered grouped agg
    // joined back to its facts — per-order quantity totals reduce
    // lineitem to one row per order BEFORE any join, the threshold
    // filter prunes further, and only the qualifying (orderkey, sum)
    // rows ride the orders/customer joins
    "d15_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(fixedSum(col("l_quantity"), 4).as("sum_qty"))
        .filter(col("sum_qty") > 200)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    // DOUBLE-correlated EXISTS/NOT-EXISTS (another supplier in the
    // order exists; another FLAGGED supplier does not) rewritten as
    // per-order aggregates — distinct supplier counts computed once per
    // order and joined back, so no per-row correlated re-scan of
    // lineitem ever runs; all three join legs key on l_orderkey (one
    // exchange family), the supplier dim broadcasts
    "d16_supplier_blame" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val rPairs = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val allCnt = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      val rCnt = rPairs.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_r"))
      rPairs
        .join(allCnt, Seq("l_orderkey"))
        .join(rCnt, Seq("l_orderkey"))
        .filter(col("n_supp") >= 2 && col("n_r") === 1)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // TPC-H Q16 shape (supplier variety): NOT IN as a broadcast LEFT
    // ANTI join plus a count-distinct over pre-distincted pairs — the
    // (partkey, suppkey) distinct reduces lineitem map-side before the
    // part join, the excluded-supplier list broadcasts, and the brand
    // exclusion pushes to the part scan
    "d17_supplier_variety" -> ((s, d) => {
      val pairs = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      pairs
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(Tables.part(s, d).filter(col("p_brand") =!= "Brand#45"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q11 shape (value concentration): a grouped value filtered
    // against a GLOBAL scalar threshold (HAVING > scalar subquery) —
    // per-part revenue aggregates exactly as fixed longs in one pass,
    // the corpus total reduces from those SAME per-part rows (no second
    // fact scan), and the one-row total broadcasts back as a nested-
    // loop join; the 1.3×-mean threshold is scale-free because TPC-H
    // holds lines-per-part constant as the corpus grows
    "d18_revenue_concentration" -> ((s, d) => {
      val pr = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(Portable.toFixed(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
          .as("__vf"))
      val tot = pr.agg(sum(col("__vf")).as("__tot"),
        count(lit(1)).as("__n"))
      pr.join(broadcast(tot),
          col("__vf").cast("double") * col("__n") >
            lit(1.3) * col("__tot").cast("double"))
        .select(col("l_partkey"),
          (col("__vf").cast("double") / lit(1e4)).as("part_value"))
    }),

    // TPC-H Q2 shape (cheapest supplier): GROUPWISE ARGMIN — the
    // correlated "= (SELECT min(..) WHERE key matches)" subquery as a
    // per-key min aggregate joined back; ties all survive (Q2 lists
    // every supplier at the min), both legs reduce BEFORE the join
    // (per-(part,supplier) min, then per-part min of those), and the
    // join keys on partkey — never a window over the whole fact table
    "d19_cheapest_supplier" -> ((s, d) => {
      val ps = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(Portable.toFixed(col("l_extendedprice"), 4)).as("__pf"))
      val mn = ps.groupBy(col("l_partkey")).agg(min(col("__pf")).as("__mf"))
      ps.join(mn, Seq("l_partkey"))
        .filter(col("__pf") === col("__mf"))
        .select(col("l_partkey"), col("l_suppkey"),
          (col("__pf").cast("double") / lit(1e4)).as("min_price"))
    }),

    // TPC-H Q19 shape (disjunctive predicate join): OR-of-conjunctions
    // across both join sides — kept a HASH equi-join by hand-factoring
    // the implied brand disjunction onto the part scan (pushed filter)
    // and evaluating the full OR as a post-join filter; without the
    // factoring this degenerates to a nested-loop over the whole fact
    "d20_disjunctive_revenue" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
        .select(col("p_partkey"), col("p_brand"))
      Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30)))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
    }),

    // TPC-H Q7 shape (cross-nation volume): nation dims resolved on
    // BOTH sides of the fact (supplier's nation vs customer's nation)
    // with a disjunctive pair filter — the supplier leg pre-filters to
    // the two nations of interest and broadcasts; the customer leg is
    // left UNHINTED (nation-filtered customers broadcast at test scale,
    // but customer grows with the corpus, so AQE owns that decision);
    // the date filter pushes to the lineitem scan
    "d21_nation_volume" -> ((s, d) => {
      val n = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" &&
                 col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" &&
                 col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
    }),

    // TPC-H Q8 shape (market share): one nation's share of a region's
    // market per year — the num/den CONDITIONAL-RATIO aggregate over a
    // single fact pass (sum of when(..) fixed longs over sum of all),
    // never two scans; region→nation→customer resolves to a broadcast
    // custkey set, the part filter broadcasts, the supplier's nation
    // rides a broadcast dim
    "d22_market_share" -> ((s, d) => {
      val natR = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val custR = Tables.customer(s, d)
        .join(broadcast(natR), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val vf = Portable.toFixed(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custR), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(pround(
          sum(when(col("supp_nation") === "NATION_3", vf).otherwise(lit(0L)))
            .cast("double") /
          sum(vf).cast("double"), 6).as("mkt_share"))
    }),

    // TPC-H Q10 shape (returned-item revenue): global top-N after a
    // join-agg — quarter orders × returned lines × customer, grouped
    // per customer, then the 20 best ride a TakeOrderedAndProject
    // (per-partition top-20 heaps merged on the driver; never a global
    // sort shuffle); c_custkey breaks revenue ties deterministically
    "d23_returned_revenue" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val ret = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      ret.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q14 shape (promo share): single-month fact slice, the
    // promo flag rides the broadcast part dim, and the percentage is
    // the same one-pass conditional-ratio aggregate as d22 — exact
    // fixed-long numerator and denominator, one double division at
    // the end
    "d24_promo_share" -> ((s, d) => {
      val p = Tables.part(s, d)
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("__promo"))
      val vf = Portable.toFixed(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(pround(
          lit(100.0) *
            sum(when(col("__promo"), vf).otherwise(lit(0L))).cast("double") /
            sum(vf).cast("double"), 6).as("promo_share"))
    }),

    // TPC-H Q9 shape (product-type profit): profit per supplier-nation
    // per year with the part's retail price as the unit-cost leg (the
    // testdata has no partsupp table — noted, the shape is Q9's) —
    // both dims pre-filter/pre-project and broadcast, the amount
    // expression folds into the scan projection, and the only exchange
    // is the final (nation, year) agg
    "d25_product_profit" -> ((s, d) => {
      val prt = Tables.part(s, d).filter(col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_retailprice"))
      val supN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables.lineitem(s, d)
        .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(fixedSum(
          col("l_extendedprice") * (lit(1) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity"), 4).as("sum_profit"))
    }),

    // TPC-H Q6 shape (forecast revenue change): THE pushdown benchmark
    // — no join at all, every predicate (date range, discount band,
    // quantity cap) pushed to the parquet scan, one map-side-combined
    // global agg; the scan must read exactly the four touched columns
    // (PlanSpec-asserted)
    "d26_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(fixedSum(col("l_extendedprice") * col("l_discount"), 4)
          .as("revenue"))),

    // TPC-H Q12 shape (shipping-mode priority): the TWO-BRANCH
    // conditional count pair — per group, how many lines belong to
    // high-priority orders and how many don't, in ONE pass (the testdata
    // has no l_shipmode; l_linestatus plays the group role, the shape —
    // join + dual CASE counts — is Q12's)
    "d27_linestatus_priority" -> ((s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
    }),

    // TPC-H Q20 shape (part promotion): the nested SEMI-JOIN CHAIN —
    // suppliers qualify through an aggregate threshold on their own
    // shipments of a name-filtered part slice (no partsupp table: the
    // threshold is "shipped more than 2x the per-(part,supplier)
    // average of the slice"), then the supplier dim reduces through
    // ONE left-semi hop; every leg pre-aggregates before joining
    "d28_promotable_suppliers" -> ((s, d) => {
      val scoped = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
      val perPS = scoped.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(fixedSum(col("l_quantity"), 4).as("qty"))
      val thresh = perPS.groupBy(col("l_partkey"))
        .agg(fixedAvg(col("qty"), 4).as("avg_qty"))
      val qualified = perPS.join(thresh, Seq("l_partkey"))
        .filter(col("qty") > lit(2.0) * col("avg_qty"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    }),

    "d6_asof_join" -> ((s, d) => {
      // latest order per (customer, date) so the as-of pick is deterministic
      val oDedup = Incremental.upsertLatest(Tables.orders(s, d),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
      TemporalJoin.asOf(ev(s, d), oDedup,
          keys = ("user_id", "o_custkey"), times = ("ts", "o_orderdate"),
          payload = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("o_orderkey"), lit(-1L)).as("last_orderkey"),
          coalesce(Portable.pround(col("o_totalprice"), 4), lit(0.0)).as("last_totalprice"))
    }),

    // forward as-of: each event matched to the EARLIEST order at or
    // after it (pandas merge_asof direction='forward') — the mirror
    // one-shuffle tagged-union plan
    "d32_asof_forward" -> ((s, d) => {
      val oDedup = Incremental.upsertLatest(Tables.orders(s, d),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
      TemporalJoin.asOfForward(ev(s, d), oDedup,
          keys = ("user_id", "o_custkey"), times = ("ts", "o_orderdate"),
          payload = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("o_orderkey"), lit(-1L)).as("next_orderkey"),
          coalesce(Portable.pround(col("o_totalprice"), 4), lit(0.0)).as("next_totalprice"))
    }),

    // static-interval band lookup, bucketized: plans a hash equi-join
    // where a bare BETWEEN forces a nested loop; the band table is the
    // deterministic in-query fixture
    "d33_interval_lookup" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("bronze", 0.0, 50.0), ("silver", 50.0, 200.0),
        ("gold", 200.0, 1000.0))
        .toDF("tier", "lo", "hi")
      TemporalJoin.intervalLookup(
          ev(s, d).select("event_id", "user_id", "value"),
          bands, "value", "lo", "hi", bucketWidth = 50.0)
        .select(col("event_id"), col("user_id"),
          Portable.pround(col("value"), 4).as("value"), col("tier"))
    }),

    // d6 with the kdb-style staleness bound: an order older than 7
    // days is too stale to count as the customer's "current" order —
    // same one-shuffle tagged-union plan, the bound is a projection
    "d29_asof_tolerance" -> ((s, d) => {
      val oDedup = Incremental.upsertLatest(Tables.orders(s, d),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
      TemporalJoin.asOf(ev(s, d), oDedup,
          keys = ("user_id", "o_custkey"), times = ("ts", "o_orderdate"),
          payload = Seq("o_orderkey", "o_totalprice"),
          toleranceSeconds = 7 * 86400.0)
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("o_orderkey"), lit(-1L)).as("last_orderkey"),
          coalesce(Portable.pround(col("o_totalprice"), 4), lit(0.0)).as("last_totalprice"))
    }),

    // explicit Bloom semi-join reduction (D30): lineitem probes the
    // urgent-orders KEY SKETCH before the join's shuffle, so exchange
    // bytes track the match count, not the fact table; Bloom false
    // positives are removed by the exact join — the oracle is the
    // PLAIN join, proving result-identity
    "d30_bloom_pruned_join" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      Skew.bloomPrunedJoin(Tables.lineitem(s, d), urgent,
          "l_orderkey", "o_orderkey")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "d7_range_join" -> ((s, d) => {
      val e = ev(s, d)
      TemporalJoin.countPriorWithin(
        e.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        e.filter(col("event_type") === "view").select("user_id", "ts"),
        keys = ("user_id", "user_id"), times = ("ts", "ts"),
        windowSeconds = 1800, countName = "n_prior_views")
    }),

    // E. deduplication
    "e1_dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d), "doc_id", "text")),

    "e2_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(docs(s, d), "doc_id", "text", 3, 0.25, 100)),

    "e3_dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(docs(s, d), "doc_id", "text", 3, 16, 4)),

    // incremental "dedup before append": the incoming batch (1 in 10
    // docs) probed against the ARCHIVE's persisted band index — the
    // archive text is never re-read, only its (doc, band, bucket) rows
    // join bucket-locally; maxBucket drops archive buckets past 100
    // docs before the join (the hot-bucket guard), mirrored in the
    // oracle's bucket-size filter
    "e9_dedup_incremental" -> ((s, d) => {
      val dd = docs(s, d)
      val isNew = col("doc_id") % 10 === 0
      val index = Dedup.minhashBandIndex(dd.filter(!isNew),
        "doc_id", "text", 3, 16, 4)
      Dedup.minhashLshAgainst(index, dd.filter(isNew),
        "doc_id", "text", 3, 16, 4, maxBucket = 100)
    }),

    "e4_dedup_simhash" -> ((s, d) =>
      Dedup.simhashNearDup(docs(s, d), "doc_id", "text", 12)),

    // record linkage / fuzzy join (E10): edit-distance near-dups over a
    // derived short key (title = lowered 24-char prefix) — q-gram
    // bucket candidates, exact integer levenshtein verify, so the
    // ENTIRE operator is oracle-reproducible
    "e10_fuzzy_pairs" -> ((s, d) =>
      Dedup.fuzzyPairs(
        docs(s, d).select(col("doc_id"),
          lower(substring(col("text"), 1, 24)).as("title")),
        "doc_id", "title", maxDist = 2, q = 3, maxBucket = 100)),

    "e5_dedup_embedding_cosine" -> ((s, d) =>
      Dedup.embeddingNearDup(embD(s, d), "vec_id", "embedding", "label", 0.3)),

    "e6_dedup_clusters" -> ((s, d) =>
      Dedup.clusters(
        Dedup.ngramJaccard(docs(s, d), "doc_id", "text", 3, 0.25, 100),
        "doc_a", "doc_b")),

    // SOFT dedup: keep every copy, weight by 1/cluster_size in exact
    // ppm so a sampler sees each duplicated CONTENT with mass ~1
    // (the dedup-as-reweighting regime — hard dedup discards
    // intra-cluster variation that can carry signal)
    "e13_soft_dedup" -> ((s, d) =>
      Dedup.softDedupWeights(docs(s, d), "doc_id",
        Dedup.ngramJaccard(docs(s, d), "doc_id", "text", 3, 0.25, 100),
        "doc_a", "doc_b")),

    // the sampler that CONSUMES those weights: deterministic
    // hash-vs-ppm thinning — replay-stable, thins a soft-dedup-
    // weighted corpus to the deduped distribution in expectation
    "k13_weighted_thin" -> ((s, d) => {
      val w = Dedup.softDedupWeights(docs(s, d), "doc_id",
        Dedup.ngramJaccard(docs(s, d), "doc_id", "text", 3, 0.25, 100),
        "doc_a", "doc_b")
      Curation.weightedThin(
        docs(s, d).select("doc_id", "lang", "source").join(w, "doc_id"),
        col("doc_id"), col("weight_ppm"))
    }),

    // exact repeated-span REMOVAL (the transform h10 only measures):
    // every 3-token span occurring >1 time corpus-wide is deleted and
    // the text rebuilt from surviving tokens (Lee et al. ACL'22)
    "e7_dedup_spans" -> ((s, d) =>
      Dedup.removeRepeatedSpans(docs(s, d), "doc_id", "text", 3)),

    // the Lee et al. exact-substring dedup POLICY: each duplicated
    // span keeps its canonical first occurrence (min (doc, pos)),
    // every other copy drops — dedup, not eradication
    "e11_dedup_spans_keep_first" -> ((s, d) =>
      Dedup.removeRepeatedSpans(docs(s, d), "doc_id", "text", 3,
        keepFirst = true)),

    // F. similarity search
    "f1_ann_bruteforce" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", 5)
    }),

    // k-NN majority-vote labeling: exact top-5 neighbors vote, ties
    // to the smaller label — the weak-labeling baseline
    "f17_knn_classify" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.knnClassify(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", "label", 5)
    }),

    // matryoshka cascade: coarse score on the 16-dim prefix, top-20
    // survivors reranked with the exact full 64-dim cosine
    "f18_ann_matryoshka" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.matryoshkaTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, mDims = 16, candidates = 20)
    }),

    // MMR-diversified top-5 from a 10-candidate pool: greedy
    // (0.5 rel - 0.5 max-sim) picks, unrolled declaratively
    "f19_ann_mmr" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.mmrTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, poolSize = 10)
    }),

    // integer-exact Lloyd clustering: every centroid update and
    // assignment is long arithmetic, so the oracle replays the SAME
    // 2-round training bit-for-bit (unrolled CTE rounds)
    "f20_kmeans" -> ((s, d) =>
      Similarity.kmeansAssign(embD(s, d), "vec_id", "embedding",
        k = 8, iters = 2)),

    // SemDeDup: dedup INSIDE f20's cells with the exact integer
    // cosine gate (dot²·den² vs num²·|a|²·|b|², decimal(38)/HUGEINT)
    // AUTO-k (k = ⌈√n⌉): the gated path IS the scale path — the r12
    // 64× probe read fixed k=8 at 261× (cells grow with the corpus,
    // in-cell pairs quadratically) vs 24× under auto
    "f21_semdedup" -> ((s, d) =>
      Similarity.semDedup(embD(s, d), "vec_id", "embedding",
        k = 0, iters = 2, thresholdNum = 3, thresholdDen = 10)),

    "f2_ann_lsh" -> ((s, d) => {
      val e = embD(s, d)
      // testdata embeddings are 64-dim; passing it skips the probe job
      Similarity.lshTopK(e, e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", 5, 8, 64)
    }),

    "f3_ann_ivf" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", 5, 16, 4, trainIters = 2, cacheCorpus = true)
    }),

    // multi-table LSH: 4 independent 8-bit hyperplane tables, candidates
    // unioned across tables — the recall lever single-table LSH lacks
    "f5_ann_lsh_multi" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.lshTopKMulti(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", 5, 8, 4, 64)
    }),

    // FILTERED vector search: each query's neighbors drawn only from
    // its label block — the metadata-predicate ANN shape; the attribute
    // is the hash-join key, so off-block corpus rows are hash-rejected
    // before any dot product; exact within the block
    "f12_ann_filtered" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.filteredTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", "label", 5)
    }),

    // the dedup APPLY step the e2-e6 reports feed: drop every clustered
    // doc except its canonical keeper — what "deduplicate the corpus"
    // actually ships
    "e8_dedup_apply" -> ((s, d) => {
      val dd = docs(s, d)
      val cl = Dedup.clusters(
        Dedup.ngramJaccard(dd, "doc_id", "text", 3, 0.25, 100),
        "doc_a", "doc_b")
      Dedup.applyClusters(dd, "doc_id", cl, "doc_id", "cluster_id")
        .select("doc_id", "lang", "source")
    }),

    // recall@5 of the approximate searchers (f2 LSH, f3 trained IVF)
    // against the exact baseline (f1) — the per-query index-quality
    // report, oracle-checked end-to-end rather than a spec assertion
    // rank-aware eval of the LSH searcher vs exact truth: recall@5 +
    // MRR + NDCG@5 (binary relevance, ppm literal log2 weights) — the
    // position-sensitive report f4's recall-only row can't give
    "f22_ann_rank_eval" -> ((s, d) => {
      val normed = Similarity.normalized(embD(s, d), "vec_id", "embedding")
        .localCheckpoint()
      val q = normed.filter(col("nn_id") % 100 === 0)
        .select(col("nn_id").as("query_id"), col("cv").as("qv"))
      Similarity.rankEval(
        Similarity.bruteForceTopKNormed(normed, q, 5),
        Similarity.lshTopKNormed(normed, q, 5, 8, 64), 5)
    }),

    "f4_ann_recall" -> ((s, d) => {
      // ONE materialized normalized corpus feeds all four searchers AND
      // the IVF training loop — before this seam each searcher re-planned
      // its own scan+normalize (8 corpus FileScans in one plan, measured
      // r3; at 100 TB the scan+normalize IS the operator cost). The
      // localCheckpoint is the same anchored-materialization trick the
      // shingle family uses, and PlanSpec asserts the scan count stays
      // collapsed.
      val normed = Similarity.normalized(embD(s, d), "vec_id", "embedding")
        .localCheckpoint()
      val q = normed.filter(col("nn_id") % 100 === 0)
        .select(col("nn_id").as("query_id"), col("cv").as("qv"))
      val cents = Similarity.trainCentroidsNormed(normed, 16, 2)
      val bf = Similarity.bruteForceTopKNormed(normed, q, 5)
        .select(col("query_id"), col("nn_id"))
      val lsh = Similarity.lshTopKNormed(normed, q, 5, 8, 64)
        .select(col("query_id"), col("nn_id"), lit(1).as("__l"))
      val ivf = Similarity.ivfTopKNormed(normed, q, 5, 4, cents)
        .select(col("query_id"), col("nn_id"), lit(1).as("__i"))
      val multi = Similarity.lshTopKMultiNormed(normed, q, 5, 8, 4, 64)
        .select(col("query_id"), col("nn_id"), lit(1).as("__m"))
      bf.join(lsh, Seq("query_id", "nn_id"), "left")
        .join(ivf, Seq("query_id", "nn_id"), "left")
        .join(multi, Seq("query_id", "nn_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_true"),
          count(col("__l")).as("n_hit_lsh"),
          count(col("__i")).as("n_hit_ivf"),
          count(col("__m")).as("n_hit_multi"))
        .withColumn("recall_lsh",
          pround(col("n_hit_lsh").cast("double") / col("n_true"), 4))
        .withColumn("recall_ivf",
          pround(col("n_hit_ivf").cast("double") / col("n_true"), 4))
        .withColumn("recall_multi",
          pround(col("n_hit_multi").cast("double") / col("n_true"), 4))
    }),

    // G. multimodal plumbing (decode stubbed — no codecs in container)
    "g1_mm_metadata" -> ((s, d) =>
      Multimodal.metadata(Multimodal.asMediaTable(docs(s, d), "doc_id", "text"))),

    "g2_mm_featurize" -> ((s, d) =>
      // feature dims as scalar columns (checksum is ScalaTest-covered;
      // CRC32 has no oracle counterpart)
      Multimodal.featurize(Multimodal.asMediaTable(docs(s, d), "doc_id", "text"), 16)
        .toDF().select(col("media_id") +: (0 until 16).map(j =>
          pround(col("feature")(j), 4).as(s"f$j")): _*)),

    "g3_mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(
        Multimodal.asMediaTable(docs(s, d), "doc_id", "text"), 64, 2)
        .select(col("media_id"), col("frame_idx"),
          length(col("frame_payload")).as("n_bytes"))),

    // perceptual-hash near-dup over binary payloads: aHash fingerprint
    // (integer block-mean bits on the stub decode's slot sums) through
    // the SAME chunk-bucket hamming machinery as e4 — bucket-local,
    // no media self-join. maxBucket is NOT optional here: byte-mass
    // hashes cluster on homogeneous corpora (every slot hovers near the
    // mean), and an uncapped hot bucket expands quadratically — the 16×
    // ScaleProbe read 35.8× before the valve, 1.9× with it
    "g5_mm_phash_dedup" -> ((s, d) =>
      Multimodal.phashNearDup(
        Multimodal.asMediaTable(docs(s, d), "doc_id", "text"),
        maxHamming = 12, maxBucket = 100)),

    // scene-cut detection: per-frame perceptual hashes, consecutive
    // sampled frames with hamming >= 20 flag a hard cut
    "g7_scene_cuts" -> ((s, d) =>
      Multimodal.sceneCuts(
        Multimodal.asMediaTable(docs(s, d), "doc_id", "text"),
        frameBytes = 64, everyNth = 2, cutHamming = 20)),

    "g4_mm_resize" -> ((s, d) =>
      Multimodal.resize(
        Multimodal.asMediaTable(docs(s, d), "doc_id", "text"), 8, 8)
        .toDF().select(col("media_id"), col("meta.mediaType").as("media_type"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          length(col("payload")).as("n_bytes"))),

    // H. text analysis
    "h1_text_quality" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), col("text"),
          TextFunctions.textProfile(lower(col("text"))).as("p"))
        .select(col("doc_id"),
          col("p.n_tokens").as("n_tokens"),
          col("p.n_punct").as("n_punct"),
          col("p.n_en").as("n_stopwords"),
          TextFunctions.qualityScoreFromProfile(col("text"), col("p")).as("quality_score"))),

    "h2_token_count" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_ws_tokens"),
        TextFunctions.bpeishCount(col("text")).as("n_bpeish"))),

    "h3_lang_id" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), col("lang"),
          TextFunctions.textProfile(lower(col("text"))).as("p"))
        .select(col("doc_id"), col("lang"),
          TextFunctions.langIdFromProfile(col("p")).as("pred_lang"))),

    "h4_doc_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextFunctions.fingerprint(col("text"), 5).as("fingerprint"))),

    "h5_text_clean" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextFunctions.cleanText(col("text")).as("clean_text"),
        length(TextFunctions.cleanText(col("text"))).as("n_chars"))),

    "h6_pii_scrub" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextFunctions.scrubPii(col("text")).as("scrubbed"),
        TextFunctions.emailCount(col("text")).as("n_emails"),
        TextFunctions.longNumCount(col("text")).as("n_long_numbers"))),

    // composite curation pass: exact-dup keepers with language agreement
    // and a minimum quality score — the full pre-training filter chained
    // from e1 + h1 + h3 in one plan
    "h7_curation" -> ((s, d) => {
      // score FIRST, dedup SECOND: quality/lang-id are map-side work on
      // the scan, so the one shuffle (keeper = min doc_id per content
      // hash, via window) carries only (hash, id, lang, two scalars) —
      // never the text column. Scoring soon-to-drop dupes costs spare
      // map CPU; shuffling document bodies costs the network.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__h")).orderBy(col("doc_id"))
      docs(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          TextFunctions.textProfile(lower(col("text"))).as("p"))
        .select(col("doc_id"), col("lang"), md5(col("text")).as("__h"),
          TextFunctions.qualityScoreFromProfile(col("text"), col("p")).as("quality_score"),
          TextFunctions.langIdFromProfile(col("p")).as("pred_lang"))
        // keeper selection must see ALL copies (identical text can carry
        // different lang labels, and the filter depends on lang) — so
        // dedup over the scored rows first, filter after
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("quality_score") >= 0.5 && col("pred_lang") === col("lang"))
        .select("doc_id", "lang", "quality_score", "pred_lang")
    }),

    "h8_contamination" -> ((s, d) =>
      // eval slice = every 20th doc, playing a held-out benchmark set;
      // split form shingles the corpus once
      Curation.contaminationSplit(docs(s, d), "doc_id", "text", 3,
        col("doc_id") % 20 === 0)),

    // the same report via the train-side Bloom sketch (join-free train
    // scan; the 100 TB spelling), auto-sized FROM THE DATA: the KMV
    // vocabulary estimate picks the sketch budget, so the build is
    // data-proportional at every SF instead of a fixed worst-case
    // allocation. 256 bits/item ⇒ FPR ~1e-33 — expected false hits over
    // the eval probes << 1 at any tested scale, so the exact h8 oracle
    // hash-matches
    "h13_contamination_bloom" -> ((s, d) => {
      val dd = docs(s, d)
      val isEval = col("doc_id") % 20 === 0
      Curation.contaminationBloomAuto(dd.filter(!isEval), dd.filter(isEval),
        "doc_id", "text", 3, bitsPerItem = 256)
    }),

    "h9_repetition" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextFunctions.repetitionRatio(col("text"), 3).as("repetition_ratio"))),

    // char-n-gram LM quality score (the CCNet-style perplexity filter
    // in pure rational arithmetic): mean/min corpus transition
    // likelihood per doc — one scan, anchored gram exchange, the model
    // broadcast-able by construction (vocab capped at charset^n)
    "h14_ngram_lm" -> ((s, d) =>
      Curation.ngramLmScore(docs(s, d), "doc_id", "text", 3)),

    // sliding-window chunking: 64-token windows every 48 tokens (16
    // overlap) — narrow (zero shuffles), the context-window prep step
    "h15_chunk_tokens" -> ((s, d) =>
      Curation.chunkTokens(docs(s, d), "doc_id", "text", 64, 16)),

    // per-doc salient terms by log-free tf-idf through the bounded heap
    "h16_tfidf_terms" -> ((s, d) =>
      Curation.topTfidfTerms(docs(s, d), "doc_id", "text", 5)),

    // conjunctive keyword search: docs containing ALL of
    // {spark, window, merge}, ranked by the exact-integer tf-idf
    // surrogate Σ tf·(N − df), top 20 with doc-id tie-break
    "h22_keyword_search" -> ((s, d) =>
      Curation.keywordSearch(docs(s, d), "doc_id", "text",
        Seq("spark", "window", "merge"), 20)),

    // URL canonicalization over deterministically-adversarial URLs
    // (case-shifted schemes/hosts, default ports, tracking params out
    // of order, fragments; one in three has no scheme → passthrough)
    "h24_url_canonical" -> ((s, d) => {
      val url = concat(
        when(col("doc_id") % 3 === 0, lit("HTTPS://Example"))
          .when(col("doc_id") % 3 === 1, lit("http://EXAMPLE"))
          .otherwise(lit("no-scheme-example")),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 3 === 0, lit(".COM:443"))
          .when(col("doc_id") % 3 === 1, lit(".com:80"))
          .otherwise(lit(".com")),
        lit("/Path/"), col("doc_id").cast("string"),
        lit("?utm_source=x&b=2&a=1&fbclid=zz&z="),
        (col("doc_id") % 7).cast("string"), lit("#frag"))
      docs(s, d).select(col("doc_id"), url.as("url"),
        TextFunctions.canonicalizeUrl(url).as("canonical_url"))
    }),

    // line-level boilerplate filter: nav chrome, bare copyright lines
    // and sub-3-token fragments drop; real prose survives
    "h25_line_filter" -> ((s, d) => {
      val lines = concat(
        lit("Home\nAbout Us\nCopyright 2024 Example Corp\n"),
        substring(col("text"), 1, 60), lit("\n"),
        lit("menu\nshort line\n"),
        substring(col("text"), 61, 60))
      docs(s, d)
        .select(col("doc_id"),
          TextFunctions.filterLines(lines, minTokens = 3).as("f"))
        .select(col("doc_id"), col("f.clean_text").as("clean_text"),
          col("f.n_kept").as("n_kept"), col("f.n_dropped").as("n_dropped"))
    }),

    // Unicode NFC canonicalization (native codegen'd expression): the
    // corpus text is ASCII, so the query splices deterministic
    // decomposed sequences (combining acute/ring/diaeresis + the
    // U+212B Angstrom singleton) into each doc — the h20 adversarial-
    // fixture discipline — and must compose them back
    "h23_nfc_normalize" -> ((s, d) => {
      val dirty = concat(
        substring(col("text"), 1, 40),
        lit(" cafe\u0301 A\u030Angstro\u0308m \u212B "),
        substring(col("text"), 41, 20))
      docs(s, d).select(col("doc_id"),
        TextFunctions.nfcNormalize(dirty).as("norm_text"),
        (length(dirty) - length(TextFunctions.nfcNormalize(dirty)))
          .as("n_composed"))
    }),

    // BPE-style adjacent-pair rank table: corpus bigram counts with a
    // support threshold (vocabulary^2-bounded, one map-combined shuffle)
    "h17_bigram_stats" -> ((s, d) =>
      Curation.bigramStats(docs(s, d), "text", minCount = 5)),

    // BPE merge-table training (Sennrich): one distributed word count
    // (the only corpus-sized stage), merges learned on the capped
    // model-sized word table — iterative argmax, so rows-only for the
    // driver; the spec hash is the textbook example hand-computed
    "h18_bpe_train" -> ((s, d) =>
      Curation.bpeTrain(docs(s, d), "text", numMerges = 30,
        topWords = 2000, minPairCount = 2)),

    // corpus tokenization under the trained merges: a zero-shuffle
    // codegen'd projection (native BpeSegment — no distinct-word join);
    // iterative per-word merging, so rows-only for the driver
    // the pieces array is flattened to ONE space-joined string for the
    // dump: the driver's rows-only check loads the parquet into pandas
    // and lexsorts every column, and list cells are unsortable there
    // (the r9 h19 row errored exactly that way). Pieces never contain
    // whitespace (tokens() splits on \s+), so the join is lossless.
    "h19_bpe_encode" -> ((s, d) => {
      val merges = Curation.bpeMerges(
        Curation.bpeTrain(docs(s, d), "text", numMerges = 30,
          topWords = 2000, minPairCount = 2))
      Curation.bpeEncode(docs(s, d), "doc_id", "text", merges)
        .select(col("doc_id"),
          concat_ws(" ", col("pieces")).as("pieces_str"),
          col("n_pieces"))
    }),

    // HTML → text extraction: deterministic HTML wrapping (entity
    // escapes + nav/footer chrome + script/style noise) is built
    // in-query as the adversarial fixture, then htmlToText must drop
    // the script/style PAYLOADS, strip tags, decode entities and
    // collapse whitespace — recovering the wrapped text plus the
    // chrome's visible words, byte-compared against the oracle
    "h20_html_extract" -> ((s, d) => {
      val esc = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
        .foldLeft(col("text")) { case (c, (ch, e)) =>
          replace(c, lit(ch), lit(e)) }
      val html = concat(
        lit("<html><head><title>doc</title>" +
          "<style>p{margin:0} body{color:#222}</style>" +
          "<script type=\"text/javascript\">var tracker = \"do-not-ingest\";" +
          "</script></head><body><!-- chrome --><nav>" +
          "<a href=\"/\">Home</a> &gt; <a href=\"/docs\">Docs</a></nav><p>"),
        esc,
        lit("</p><footer>&copy; stats &amp; figures</footer></body></html>"))
      docs(s, d).select(col("doc_id"),
        TextFunctions.htmlToText(html).as("extracted"))
    }),

    // fasttext-style quality-classifier distillation: train an
    // integer-exact token-evidence model on the rule label (quality
    // >= 0.5) over the even-doc_id half, score EVERY document with the
    // broadcast model — training and scoring both oracle-reproduced
    "h21_quality_classifier" -> ((s, d) => {
      val label = TextFunctions.qualityScoreFromProfile(col("text"),
        TextFunctions.textProfile(lower(col("text")))) >= 0.5
      Curation.evidenceClassify(docs(s, d), "doc_id", "text", label,
        trainFilter = col("doc_id") % 2 === 0, vocab = 256)
    }),

    // corpus-inspection: top-10 3-grams per language by document
    // frequency, through the custom TopKPerKey operator (bounded
    // per-key heaps — no per-language sort of the full n-gram table)
    "h12_top_ngrams" -> ((s, d) => {
      val counts = docs(s, d)
        .select(col("lang"),
          explode(TextFunctions.shingles(lower(col("text")), 3)).as("ngram"))
        .groupBy("lang", "ngram").agg(count(lit(1)).as("n_docs"))
      graft.plans.TopKPerKey(counts,
        keys = Seq(col("lang")),
        order = Seq(col("n_docs").desc, col("ngram").asc),
        k = 10, rankName = "rnk")
    }),

    // deterministic per-label embedding centroids: fixed-point mean
    // pooling (order-independent long sums — a plain double mean drifts
    // in ULPs with partition order), one row per (label, dimension)
    "f6_label_centroids" -> ((s, d) =>
      embD(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(Portable.pround(
            sum(Portable.toFixed(col("x"), 12)).cast("double")
              / lit(1e12) / count(lit(1)), 6).as("mean_x"),
          count(lit(1)).as("n_vecs"))),

    // int8 scalar quantization: per-vector symmetric scale, codes as a
    // portable csv, max reconstruction error — one projection, no shuffle
    "f7_embedding_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(embD(s, d), "vec_id", "embedding")),

    // per-dimension calibration stats (mean/std/min/max): the range
    // table per-dimension int8 PTQ and whitening need — narrow
    // posexplode, ONE map-combined agg keyed on dim (exchange carries
    // <= partitions x dim fixed-point sum rows, never corpus-sized)
    "f13_embedding_stats" -> ((s, d) =>
      Similarity.embeddingStats(embD(s, d), "vec_id", "embedding")),

    // per-dimension int8 encode against f13's calibrated ranges — the
    // PTQ pairing: scales ride as a literal array inside the transform
    // lambda (pure codegen'd projection, no join/shuffle)
    "f14_quantize_per_dim" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.quantizeInt8PerDim(e, "vec_id", "embedding",
        Similarity.perDimScales(
          Similarity.embeddingStats(e, "vec_id", "embedding")))
    }),

    // per-label centroid drift between two corpus slices — the
    // vector-side DQ4: exact-integer L1/max shift over fixed-point dim
    // sums, no cross-dim float summation (order-portable by design)
    "f16_embedding_drift" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.embeddingDrift(
        e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
        "label", "embedding")
    }),

    // f8: search OVER the int8 index — the searcher sees only f7-style
    // codes + per-vector scale, dequantizes on the fly; exact top-k of
    // the quantized space, oracle-mirrored bit-for-bit
    "f8_ann_quantized" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.quantizedTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", 5)
    }),

    // f9: product quantization — trained per-subspace codebooks, m-byte
    // codes as the index, per-query ADC lookup tables, bounded-heap
    // shortlist, exact rerank on the fetched shortlist. At the generous
    // shortlist the rerank provably returns the exact top-k (verified
    // deterministic tri-scale), so f1's exact oracle checks the whole
    // train→encode→ADC→rerank machinery end to end
    "f9_ann_pq" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.pqTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", 5, m = 8, nCodes = 16, iters = 2,
        shortlist = 1536, dim = 64)
    }),

    // f10: the full IVFADC composition — coarse cells + PQ codes +
    // exact rerank. Registered at full probe (every cell) + generous
    // shortlist, where the result provably equals exact brute force
    // (verified deterministic tri-scale): the oracle then hash-checks
    // both quantizer trainings, the (cell, codes) index, the cell-join
    // ADC scan and the rerank end to end; tight-probe pruning behavior
    // is spec-covered
    "f10_ann_ivf_pq" -> ((s, d) => {
      val e = embD(s, d)
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", 5, nCells = 16, nProbe = 16, m = 8,
        nCodes = 16, iters = 2, shortlist = 1536, dim = 64)
    }),

    // DQ. data-quality checks (dbt schema tests)
    "dq1_checks" -> ((s, d) => {
      val e = ev(s, d)
      DataQuality.report(Seq(
        // all column-local checks on events fuse into ONE scan
        DataQuality.columnChecks(e, Seq(
          ("not_null_user_id", col("user_id").isNull),
          ("not_null_ts", col("ts").isNull),
          ("not_null_value", col("value").isNull),
          ("accepted_values_event_type", col("event_type").isNotNull &&
            !col("event_type").isin("view", "click", "signup", "error", "purchase")))),
        DataQuality.unique(e, Seq("event_id")),
        DataQuality.relationships(e, "user_id", Tables.customer(s, d), "c_custkey")))
    }),

    // per-user 3σ anomaly flags in exact fixed-point/decimal arithmetic
    // — the z² test cleared of divisions, bit-identical cross-engine
    "dq2_outliers" -> ((s, d) =>
      DataQuality.outliers(
        ev(s, d).select("user_id", "event_id", "value"),
        Seq("user_id"), "value", k = 3, scale = 2)),

    // robust median/MAD outliers beside dq2's mean/variance — a glitch
    // can inflate a variance enough to hide itself; not a median
    "dq3_mad_outliers" -> ((s, d) =>
      DataQuality.outliersMad(
        ev(s, d).select("user_id", "event_id", "value"),
        Seq("user_id"), "value", k = 3.0, scale = 2)),

    // dq3's UNBOUNDED-cardinality spelling: both medians estimated
    // from B12's fixed-bin histograms — O(nBins) state per group
    // however large the group, where the exact percentile buffers
    // every value (the B8→B12 trade applied to the robust outlier)
    "dq3b_mad_hist" -> ((s, d) =>
      DataQuality.outliersMadFromBins(
        ev(s, d).select("user_id", "event_id", "value"),
        Seq("user_id"), "value", k = 3.0, lo = 0.0, hi = 600.0,
        nBins = 600)),

    // distribution drift between a reference and a current slice — the
    // pre-training check when a new crawl lands: TV distance + worst
    // bin over aligned fixed bins, exact-integer cross products (no
    // float proportion sums), sketch-sized frames after the first pass
    "dq4_drift" -> ((s, d) => {
      val e = ev(s, d)
      val cut = lit("2024-01-16").cast("timestamp")
      DataQuality.distributionDrift(
        e.filter(col("ts") < cut), e.filter(col("ts") >= cut),
        Seq("event_type"), col("value"), lo = 0.0, hi = 500.0,
        nBins = 20, scale = 6)
    }),

    // WebDataset-style shard packing: per-language byte-budget shards
    // in doc-id order; per-item shard id + in-shard byte offset
    "g6_shard_pack" -> ((s, d) =>
      Multimodal.packShards(
        docs(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
        Seq("lang"), "doc_id", col("n_chars"), shardBytes = 4096)
        .select(col("doc_id"), col("lang"), col("shard_id"),
          col("shard_offset"), col("n_bytes"))),

    // dbt-style source freshness: newest record per type vs a literal
    // reference instant, warn/error thresholds
    "dq6_freshness" -> ((s, d) =>
      DataQuality.freshness(ev(s, d), Seq("event_type"), "ts",
        lit("2024-02-01 00:00:00").cast("timestamp"),
        warnAfterSeconds = 3L * 24 * 3600,
        errorAfterSeconds = 10L * 24 * 3600)),

    // column-profile comparison between two lineitem slices: one row
    // per numeric column — counts, nulls, min/max, exact fixed-point
    // means, exact-cross-product mean shift
    "dq5_profile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val cut = lit("1995-07-01").cast("timestamp")
      DataQuality.profileCompare(
        li.filter(col("l_shipdate") < cut),
        li.filter(col("l_shipdate") >= cut),
        Seq(("l_quantity", 4), ("l_extendedprice", 4),
          ("l_discount", 6), ("l_tax", 6)))
    }),

    // rebalance the corpus to a 2:1:1 en:de:fr token... row mix: the
    // binding stratum fixes t, each stratum keeps exactly w·t rows by
    // smallest-md5 order (deterministic uniform within stratum)
    "k9_rebalance" -> ((s, d) =>
      Curation.rebalanceMix(docs(s, d).select(col("doc_id"), col("lang")),
        "lang", Map("en" -> 2L, "de" -> 1L, "fr" -> 1L),
        col("doc_id"), "|mix1")),

    // rolling z-score volume anomalies per event type: trailing-7-row
    // window stats, flag via the all-integer cross-multiplied test
    "dq7_anomalies" -> ((s, d) =>
      DataQuality.rollingAnomalies(ev(s, d), Seq("event_type"), "ts",
        window = 7, minPrior = 3, z = 3)),

    // weekly seasonal baseline + residuals: per (type, day-of-week)
    // exact mean of daily fixed sums, residual from the exact cross
    // product — "is this Sunday low for a Sunday?"
    "b39_seasonal" -> ((s, d) =>
      TimeAgg.seasonalBaseline(ev(s, d), "event_type", "ts", "value")),

    // instantaneous counter delta/rate: the last two readings per user,
    // reset-aware — TimescaleDB idelta_right/irate_right
    "b40_instant_rate" -> ((s, d) =>
      TimeAgg.instantRate(ev(s, d), "user_id", "ts", "event_id", "value")),

    // per-key calendar completeness: expected = own first-to-last span,
    // missing = expected - distinct present days; spine never explodes
    "dq8_completeness" -> ((s, d) =>
      DataQuality.completeness(ev(s, d), Seq("event_type"), "ts")),

    // cross-doc boilerplate-line removal: lines in >= 3 distinct docs
    // drop, survivors reassemble in order — deterministic multi-line
    // wrapping built in-query (the h20/h25 adversarial-fixture
    // discipline: shared chrome + the doc body + a per-doc unique line)
    "h27_line_dedup" -> ((s, d) => {
      val wrapped = docs(s, d).select(col("doc_id"),
        concat_ws("\n", lit("Home | About | Contact"), col("text"),
          concat(lit("ref: "), col("doc_id").cast("string")),
          lit("(c) example corp")).as("text"))
      Curation.lineDedup(wrapped, "doc_id", "text", minDocs = 3)
    }),

    // Flesch reading ease with the vowel-group syllable proxy — the
    // readability gate of corpus curation; zero-shuffle projection
    "h26_readability" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_words"),
        TextFunctions.sentenceCount(col("text")).as("n_sentences"),
        TextFunctions.syllableCount(col("text")).as("n_syllables"),
        TextFunctions.fleschScore(col("text")).as("flesch"))),

    // temperature-flattened source mix (tau = 1/2): allocations
    // proportional to isqrt(count), largest-remainder rounded, keepers
    // by smallest md5 — all-integer, so the SET is deterministic
    "k10_temperature_sample" -> ((s, d) =>
      Curation.temperatureSample(docs(s, d), "source", col("doc_id"),
        total = 200L, salt = "|temp1")),

    // DSIR importance selection: keep the 40 docs most like the
    // src0-3 target slice under the char-trigram likelihood RATIO —
    // rational probabilities end-to-end (no logs), deterministic cut
    "k12_dsir_select" -> ((s, d) =>
      Curation.dsirSelect(docs(s, d), "doc_id", "text",
        col("source").isin("src0", "src1", "src2", "src3"), n = 40)),

    // CUSUM drift changepoints per event type: daily rollup + ONE
    // keys-hash window family (totals + prefix sums + running mins all
    // ride the same exchange); the max-reset recurrence as all-integer
    // N-scaled prefix arithmetic — mu is never formed
    "dq9_cusum" -> ((s, d) =>
      DataQuality.cusumChangepoints(ev(s, d), Seq("event_type"), "ts",
        slack = 0, threshold = 30)),

    // k-anonymity audit over (nation, account-band) quasi-identifiers:
    // equivalence classes under 5 members re-identify — one grouped
    // count, the classes named for suppression/generalization
    "dq10_k_anonymity" -> ((s, d) =>
      DataQuality.kAnonymity(
        Tables.customer(s, d).select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).as("acct_band")),
        Seq("c_nationkey", "acct_band"), k = 5L)),

    // l-diversity audit: classes where the sensitive segment takes
    // fewer than 3 distinct values leak even when k-anonymous
    "dq11_l_diversity" -> ((s, d) =>
      DataQuality.lDiversity(
        Tables.customer(s, d).select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).as("acct_band"),
          col("c_mktsegment")),
        Seq("c_nationkey", "acct_band"), "c_mktsegment", l = 3L)),

    // t-closeness: classes whose sensitive DISTRIBUTION diverges from
    // the table's (TV > t) — leak k-anonymity and l-diversity both
    // miss; exact-integer TV, one rounded division at the end
    "dq17_t_closeness" -> ((s, d) =>
      DataQuality.tCloseness(
        Tables.customer(s, d).select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).as("acct_band"),
          col("c_mktsegment")),
        Seq("c_nationkey", "acct_band"), "c_mktsegment", t = 0.3)),

    // Benford first-digit audit of extended prices per return flag:
    // digit counts vs the canonical log10(1+1/d) expectations — ALL in
    // integer ppm off literal constants (engine log10 differs in the
    // last ulp), 9-digit spine so the TV distance is the true one
    "dq12_benford" -> ((s, d) =>
      DataQuality.benford(
        Tables.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice")),
        Seq("l_returnflag"), "l_extendedprice")),

    // functional-dependency audit: does l_partkey determine l_shipmode?
    // every violating determinant reported with its distinct-dependent
    // count and min/max repair evidence — the dbt-test BETWEEN columns
    "dq13_fd_check" -> ((s, d) =>
      DataQuality.fdViolations(
        Tables.lineitem(s, d).select(col("l_partkey"), col("l_returnflag")),
        Seq("l_partkey"), "l_returnflag")),

    // key-distribution skew report over the event stream's device key:
    // top-20 heavy keys with ppm shares + the HHI concentration index
    // (all integer, decimal(38) cross products) — the pre-join skew
    // DIAGNOSIS whose cure is J1's salting / AQE splits
    "dq14_key_skew" -> ((s, d) =>
      DataQuality.keySkew(ev(s, d).select(col("user_id")), "user_id",
        topN = 20)),

    // A/B readout: md5-parity arms over users, conversion chi-square
    // + per-user-value Welch t² — integer sums up to ONE final double
    // step per statistic, so both engines agree to the bit
    "dq15_ab_test" -> ((s, d) =>
      DataQuality.abTest(ev(s, d), "user_id", "event_type", "purchase",
        "value")),

    // SEASONAL-baseline anomalies: a reading flags against its OWN
    // (event_type, hour-of-day) stratum rather than a global or
    // per-entity distribution — the diurnal-regime flag dq2 misses
    // (a 3am reading that is normal at 3pm). Pure composition: the
    // stratum key is a projected column into dq2's exact z²-cleared-
    // of-divisions test, so the flag stays bit-identical cross-engine
    // and the plan stays the one aggregate-join-back exchange family
    "dq16_seasonal_outliers" -> ((s, d) =>
      DataQuality.outliers(
        ev(s, d).select(col("event_type"), hour(col("ts")).as("hod"),
          col("event_id"), col("value")),
        Seq("event_type", "hod"), "value", k = 3, scale = 2)),

    // link-graph importance (all-integer PageRank, 6 rounds) over the
    // bidirectional customer<->supplier purchase graph — even node ids
    // are customers (2k), odd are suppliers (2k+1); every arithmetic
    // step is integer floor division, so ranks are oracle-exact
    "h28_link_rank" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      Graphs.pageRank(edges, "src", "dst", iters = 6)
    }),

    // personalized PageRank (random walk with restart): seeds = nation-1
    // suppliers, ranks = proximity to them in the purchase graph — the
    // "related items" recommender read of the same iteration
    "l4_personalized_rank" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val seedNodes = Tables.supplier(s, d)
        .filter(col("s_nationkey") === 1)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      Graphs.pageRank(edges, "src", "dst", iters = 6, seeds = Some(seedNodes))
    }),

    // weighted PageRank: edge weight = lineitem multiplicity per
    // (customer, supplier) pair, sources split rank proportionally —
    // floored-share-then-weight keeps every term overflow-safe
    "l5_weighted_rank" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        .withColumn("w", lit(1L))
      Graphs.pageRank(edges, "src", "dst", iters = 6, weight = Some("w"))
    }),

    // item co-occurrence (bipartite projection): for every unordered
    // part pair, the number of distinct orders containing both, kept
    // at support >= 2 — one pinned basket-partitioned frame self-joined
    // co-partitioned, then a pair-keyed count
    "l2_copurchase" -> ((s, d) =>
      Graphs.cooccurrence(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2L)),

    // connected components over the support>=2 co-purchase graph (9
    // components over 1880 part nodes at sf0.01) — the dedup-cluster
    // min-label machinery as a first-class graph surface
    "l1_components" -> ((s, d) =>
      Graphs.connectedComponents(
        Graphs.cooccurrence(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 2L),
        "item_a", "item_b")),

    // synchronous LPA communities over the same co-purchase graph:
    // 4 all-integer rounds (most-frequent neighbor label, ties to the
    // smallest), oracle replays the rounds verbatim
    "l11_communities" -> ((s, d) =>
      Graphs.labelPropagation(
        Graphs.cooccurrence(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 2L),
        "item_a", "item_b", iters = 4)),

    // modularity of those communities — exact integer per-community
    // report (no division anywhere: q_num/q_den columns), closing the
    // did-LPA-find-structure loop; the edge list is pinned so the
    // label rounds and the score read ONE co-purchase collapse
    "l12_modularity" -> ((s, d) => {
      val edges = Graphs.cooccurrence(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2L).localCheckpoint()
      Graphs.modularity(edges, "item_a", "item_b",
        Graphs.labelPropagation(edges, "item_a", "item_b", iters = 4))
    }),

    // per-node triangle counts over the support>=2 co-purchase graph —
    // degree-oriented compact-forward wedges, enumeration order
    // engine-private but the counts exact (the oracle enumerates by
    // id order and must agree). The full support>=1 graph (1.2M edges
    // / 60M wedges at sf0.1) runs the same plan in ~9.6 s — the
    // registered query keeps the bench comparable round-over-round
    "l3_triangles" -> ((s, d) =>
      Graphs.triangles(
        Graphs.cooccurrence(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 2L),
        "item_a", "item_b")),

    // 2-core of the co-purchase graph — iterated peeling to fixpoint
    // (monotone, so the oracle unrolls MORE rounds than convergence
    // needs and the extras are no-ops; measured rounds: 1/4/6 at
    // sf0.001/0.01/0.1, oracle unrolls 12). Survivors with in-core
    // degree: the dense center pendant trees hang off
    "l6_kcore" -> ((s, d) =>
      Graphs.kcore(
        Graphs.cooccurrence(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 2L),
        "item_a", "item_b", k = 2L)),

    // neighborhood Jaccard over the support>=2 co-purchase graph:
    // structurally-similar parts (shared basket-neighborhoods) — the
    // E2 shingle machinery with neighbors as the shingle space
    "l7_neighbor_jaccard" -> ((s, d) =>
      Graphs.neighborJaccard(
        Graphs.cooccurrence(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 2L),
        "item_a", "item_b", threshold = 0.25, maxDegree = 200)),

    // multi-source BFS rings around the part-key seed set on the
    // support>=2 co-purchase graph — hop distance from the "trusted
    // core"; the keep/drop frontier is integer set algebra, so every
    // depth is exact and the unrolled oracle reproduces them
    "l8_bfs_depth" -> ((s, d) =>
      Graphs.bfsDepth(
        Graphs.cooccurrence(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 2L),
        "item_a", "item_b",
        seeds = Tables.part(s, d).filter(col("p_partkey") % 50 === 0)
          .select(col("p_partkey")),
        maxDepth = 6)),

    // item-item cosine over raw (basket, item) rows — L2's counts
    // normalized by the exact integer cross-multiplied threshold
    // (support^2*100 >= n_a*n_b), the collaborative-filtering score
    "l9_item_cosine" -> ((s, d) =>
      Graphs.cooccurrenceCosine(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2L,
        thresholdNum = 1L, thresholdDen = 10L)),

    // HITS hubs & authorities (4 rounds, all-integer with exact SUM
    // renormalization) over the DIRECTED customer->supplier purchase
    // graph: hub = curates well (customer breadth), authority = is
    // bought well (supplier pull) — the two-sided importance PageRank's
    // single score conflates
    "l10_hits" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      Graphs.hits(edges, "src", "dst", iters = 4)
    }),

    // strongly connected components over the DIRECTED purchase-sequence
    // graph (part_i -> part_{i+1} by (linenumber, partkey) within an
    // order, on the partkey%7 / qty<=20 slice — tuned to a mixed SCC
    // census: one dense mutual-sequence core plus small cycles plus a
    // DAG fringe at every SF). FB-coloring + trim in the engine; the
    // oracle verifies the OUTPUT CONTRACT (scc_id = min mutually-
    // reachable id) from first principles via bounded-doubling closure
    // — the result is algorithm-independent, so the oracle never has
    // to replay the rounds. The lead() ordering includes l_partkey as
    // tie-break: the testdata has duplicate l_linenumber per order, and
    // a partial order would make the edge list engine-nondeterministic
    "l13_scc" -> ((s, d) => Graphs.scc(sccEdges(s, d), "src", "dst")),

    // SCC condensation report over the same purchase-sequence graph:
    // each component as one DAG node with its member count and its
    // dependency tier (longest condensed-hop path from a source —
    // measured DAG depth 7/11/25 at the three SFs; the oracle unrolls
    // 30 monotone relaxation rounds, extras no-ops)
    "l14_condense" -> ((s, d) => Graphs.condense(sccEdges(s, d), "src", "dst")),

    // asymmetric shingle containment (Broder): a short doc embedded in
    // a long one scores ~0 on Jaccard but ~1 on containment — the
    // fuzzy-subset complement of E7/E11's exact repeated spans; the
    // prefix fixture is built in-query (the h20 discipline) so real
    // subset pairs exist at every SF
    "e12_dedup_containment" -> ((s, d) => {
      val docsAndPrefixes = docs(s, d).select(col("doc_id"), col("text"))
        .unionByName(docs(s, d).filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            // the first 15 tokens of every 20th doc as a new "doc"
            concat_ws(" ",
              slice(TextFunctions.tokens(col("text")), 1, 15)).as("text")))
      Dedup.containmentPairs(docsAndPrefixes, "doc_id", "text", k = 3,
        threshold = 0.5)
    }),

    // golden record (per-FIELD survivorship): sparse updates built
    // in-query — value nulled on odd event ids, prop_k on even — so
    // each field's latest non-null comes from a DIFFERENT source row
    // than the latest row overall (the h20 in-query-fixture
    // discipline); one grouped max_by aggregation, no window
    "c20_golden_record" -> ((s, d) =>
      Incremental.goldenRecord(
        ev(s, d).select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_id") % 2 === 1, lit(null).cast("double"))
            .otherwise(col("value")).as("value"),
          when(col("event_id") % 2 === 0, lit(null).cast("string"))
            .otherwise(col("event_type")).as("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("prop_k")),
        key = "user_id", ts = "ts", tie = "event_id",
        fields = Seq("value", "event_type", "prop_k"))),

    // CDC MERGE: the event stream read as a change log against the
    // customer snapshot — per-user highest event_id wins, 'error'
    // events are DELETE tombstones, unknown users insert
    "j14_apply_cdc" -> ((s, d) =>
      Incremental.applyCdc(
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")),
        ev(s, d).select(col("user_id").as("c_custkey"), col("event_id"),
          when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
            .as("cdc_op"),
          col("value").as("c_acctbal"),
          col("event_type").as("c_mktsegment")),
        key = Seq("c_custkey"), seq = "event_id", op = "cdc_op",
        fields = Seq("c_acctbal", "c_mktsegment"))),

    // interval union / coverage: each event opens a pseudo-lease of
    // ((event_id*7919) % 500000) seconds — overlapping leases merge,
    // the union extent never double-counts; all µs integer arithmetic
    // multi-touch attribution: linear/first/last/U-shape credit in
    // exact µ¢ over ONE entity-keyed range-window pass (no self-join);
    // every conversion's credit reconciles to round(value·100)·10^6
    // under every model by construction
    "c22_multi_touch" -> ((s, d) =>
      Sessionize.multiTouchAttribution(ev(s, d), "user_id", "ts",
        "event_id", "event_type", Seq("click", "view"), "purchase",
        "value", 7L * 24 * 3600)),

    // Markov removal-effect attribution: per-entity journey chains →
    // transition matrix → 12 all-integer value-iteration rounds per
    // scenario; the oracle unrolls the SAME rounds
    "c23_markov_attribution" -> ((s, d) =>
      Sessionize.markovAttribution(ev(s, d), "user_id", "ts",
        "event_id", "event_type", Seq("click", "view"), "purchase")),

    "c21_interval_union" -> ((s, d) => {
      val st = unix_micros(col("ts"))
      Sessionize.intervalUnion(
        ev(s, d).select(col("user_id"), st.as("ivs"),
          (st + ((col("event_id") * 7919) % 500000) * lit(1000000L))
            .as("ive")),
        Seq("user_id"), col("ivs"), col("ive"))
    }),

    // Z-order layout key over (l_partkey, l_suppkey): per-dim range
    // buckets by integer floor-div off a driver-collected (min, max)
    // pair, then the bit interleave — a zero-shuffle
    // literal-parameterized projection, the lake CLUSTER BY key
    "k11_zorder" -> ((s, d) =>
      Layout.zorderKey(
        Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
        Seq("l_partkey", "l_suppkey"), bits = 8)),

    "h10_interdup" -> ((s, d) =>
      Dedup.sharedShingleRatio(docs(s, d), "doc_id", "text", 3)),

    "h11_source_mix" -> ((s, d) =>
      Curation.sourceMix(
        docs(s, d)
          .select(col("source"), col("lang"), col("text"),
            TextFunctions.textProfile(lower(col("text"))).as("p"))
          .select(col("source"), col("lang"),
            col("p.n_tokens").cast("long").as("n_tok"),
            TextFunctions.qualityScoreFromProfile(col("text"), col("p"))
              .as("q")),
        Seq("source", "lang"), col("n_tok"), col("q"))),

    // K. curation sampling
    "k1_hash_sample" -> ((s, d) =>
      Curation.hashSample(docs(s, d), col("doc_id"), 37)
        .select(col("doc_id"), col("lang"),
          Curation.hashBucket(col("doc_id"), 100).as("bucket"))),

    // deterministic fixed-size per-stratum draw: the 50 smallest
    // md5(id ‖ salt) per language through the bounded-heap TopKPerKey
    "k7_priority_sample" -> ((s, d) =>
      Curation.prioritySample(docs(s, d).select(col("doc_id"), col("lang")),
        Seq("lang"), col("doc_id"), 50, "|s1")),

    // curriculum phases: corpus ranked easy→hard by the h1 quality
    // score (desc, doc-id tie-break), cut into 10 exact-ntile phases —
    // distributed two-phase global rank, no single-partition window
    "k8_curriculum" -> ((s, d) => {
      val scored = docs(s, d)
        .select(col("doc_id"), col("text"),
          TextFunctions.textProfile(lower(col("text"))).as("p"))
        .select(col("doc_id"),
          TextFunctions.qualityScoreFromProfile(col("text"), col("p"))
            .as("quality_score"))
      Curation.curriculumPhases(scored,
        Seq(col("quality_score").desc, col("doc_id").asc), phases = 10)
        .select(col("doc_id"), col("quality_score"), col("rank"),
          col("phase"))
    }),

    "k2_quota_sample" -> ((s, d) =>
      Curation.quotaSample(
        docs(s, d)
          .select(col("doc_id"), col("lang"), col("text"),
            TextFunctions.textProfile(lower(col("text"))).as("p"))
          .select(col("doc_id"), col("lang"),
            TextFunctions.qualityScoreFromProfile(col("text"), col("p"))
              .as("quality_score")),
        Seq("lang"), col("quality_score"), col("doc_id"), 50)),

    // token-budget corpus assembly: greedy quality-desc prefix per lang
    // until the running token total passes the budget
    "k4_token_budget" -> ((s, d) =>
      Curation.tokenBudgetSample(
        docs(s, d)
          .select(col("doc_id"), col("lang"), col("text"),
            TextFunctions.textProfile(lower(col("text"))).as("p"))
          .select(col("doc_id"), col("lang"),
            col("p.n_tokens").cast("long").as("n_tokens"),
            TextFunctions.qualityScoreFromProfile(col("text"), col("p"))
              .as("quality_score")),
        Seq("lang"), col("n_tokens"), col("quality_score"), col("doc_id"),
        budget = 3000L)),

    // leakage-safe split: assignment unit = near-dup cluster, so no
    // near-duplicate pair ever straddles train/test (split-contamination
    // by construction otherwise); singletons split by their own id
    "k5_split_leakage_safe" -> ((s, d) => {
      val dd = docs(s, d)
      val cl = Dedup.clusters(
        Dedup.ngramJaccard(dd, "doc_id", "text", 3, 0.25, 100),
        "doc_a", "doc_b")
      Curation.leakageSafeSplit(dd, "doc_id", cl, "doc_id", "cluster_id", 90, 5)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("split_key")).as("n_groups"))
    }),

    // GPT-style concat-and-split sequence packing: per-language docs
    // laid head-to-tail (size-desc, id tie-break) and cut into
    // 2048-token sequences — one window per stratum, the k4 shape
    "k6_pack_sequences" -> ((s, d) =>
      Curation.packSequences(
        docs(s, d).select(col("doc_id"), col("lang"),
          TextFunctions.tokenCount(col("text")).as("n_tokens")),
        stratum = Seq("lang"), tokens = col("n_tokens"),
        order = col("n_tokens"), tieBreak = col("doc_id"), seqLen = 2048L)),

    // k6b: NO-SPLIT packing — docs assigned whole to harmonic
    // size-class bins (capacity floor(seqLen/n) docs per bin, so no bin
    // overflows and no doc is cut); the parallel stand-in for the
    // sequential first-fit greedy. seqLen 512 so the sf corpus
    // populates several classes
    "k6b_pack_nosplit" -> ((s, d) =>
      Curation.packSequencesNoSplit(
        docs(s, d).select(col("doc_id"), col("lang"),
          TextFunctions.tokenCount(col("text")).as("n_tokens")),
        stratum = Seq("lang"), tokens = col("n_tokens"),
        order = col("n_tokens"), tieBreak = col("doc_id"), seqLen = 512L)),

    // same quota semantics through the custom TopKPerKey physical
    // operator (bounded per-key heaps, no per-stratum sort) — shares
    // k2's oracle, proving plan-level equivalence on a second shape
    "k3_quota_native" -> ((s, d) =>
      graft.plans.TopKPerKey(
        docs(s, d)
          .select(col("doc_id"), col("lang"), col("text"),
            TextFunctions.textProfile(lower(col("text"))).as("p"))
          .select(col("doc_id"), col("lang"),
            TextFunctions.qualityScoreFromProfile(col("text"), col("p"))
              .as("quality_score")),
        keys = Seq(col("lang")),
        order = Seq(col("quality_score").desc, col("doc_id").asc),
        k = 50).drop("rnk")),

    // === SQL-TVF spellings: the graft_* TABLE functions
    // (GraftTableFunctions) reached through spark.sql — hash-checked
    // against the SAME oracles as their Scala originals. The TVF
    // builder calls the identical operator function, so these rows
    // prove the SQL surface (argument decoding, catalog resolution,
    // plan splicing) cannot drift from the operator layer ===
    "c9s_funnel_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_funnel('graft_sql_events', 'user_id',
        'ts', 'event_type', 'view,click,purchase', 3600)""")
    }),

    "c10s_retention_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("SELECT * FROM graft_retention('graft_sql_events', 'user_id', 'ts')")
    }),

    "c22s_multi_touch_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_multi_touch('graft_sql_events',
        'user_id', 'ts', 'event_id', 'event_type', 'click,view',
        'purchase', 'value', 604800)""")
    }),

    "c23s_markov_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_markov_attribution('graft_sql_events',
        'user_id', 'ts', 'event_id', 'event_type', 'click,view',
        'purchase')""")
    }),

    "dq15s_ab_test_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_ab_test('graft_sql_events', 'user_id',
        'event_type', 'purchase', 'value')""")
    }),

    "k12s_dsir_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).createOrReplaceTempView("graft_sql_documents")
      s.sql("""SELECT * FROM graft_dsir('graft_sql_documents', 'doc_id',
        'text', 'source IN (''src0'', ''src1'', ''src2'', ''src3'')',
        40)""")
    }),

    "f20s_kmeans_sql" -> ((s, d) => {
      sqlSurface(s, d)
      embD(s, d).createOrReplaceTempView("graft_sql_emb")
      s.sql("""SELECT * FROM graft_kmeans('graft_sql_emb', 'vec_id',
        'embedding', 8, 2)""")
    }),

    "f21s_semdedup_sql" -> ((s, d) => {
      sqlSurface(s, d)
      embD(s, d).createOrReplaceTempView("graft_sql_emb")
      s.sql("""SELECT * FROM graft_semdedup('graft_sql_emb', 'vec_id',
        'embedding', 0, 2, 3, 10)""")
    }),

    "f22s_rank_eval_sql" -> ((s, d) => {
      // TVFs compose through views: truth + candidate rankings feed
      // the evaluator (the l1s composition discipline)
      sqlSurface(s, d)
      val e = embD(s, d)
      val normed = Similarity.normalized(e, "vec_id", "embedding")
        .localCheckpoint()
      val q = normed.filter(col("nn_id") % 100 === 0)
        .select(col("nn_id").as("query_id"), col("cv").as("qv"))
      Similarity.bruteForceTopKNormed(normed, q, 5)
        .createOrReplaceTempView("graft_sql_truth")
      Similarity.lshTopKNormed(normed, q, 5, 8, 64)
        .createOrReplaceTempView("graft_sql_cand")
      s.sql("""SELECT * FROM graft_rank_eval('graft_sql_truth',
        'graft_sql_cand', 5)""")
    }),

    "b9bs_hll_portable_sql" -> ((s, d) => {
      // one-level TVF spelling of b9b: registers straight to event_type
      // — equal to the merged two-level path by max-associativity, so
      // the SAME oracle gates both (that equality IS the rollup check)
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_hll('graft_sql_events',
        'event_type', 'user_id', 8)""")
    }),

    "b42s_kmv_setops_sql" -> ((s, d) => {
      sqlSurface(s, d)
      ev(s, d).filter(col("event_type") === "click")
        .createOrReplaceTempView("graft_sql_clickers")
      ev(s, d).filter(col("event_type") === "view")
        .createOrReplaceTempView("graft_sql_viewers")
      s.sql("""SELECT * FROM graft_kmv_setops('graft_sql_clickers',
        'graft_sql_viewers', 'user_id', 'user_id', 256)""")
    }),

    "l11s_communities_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .createOrReplaceTempView("graft_sql_li_baskets")
      s.sql("""SELECT * FROM graft_copurchase('graft_sql_li_baskets',
          'l_orderkey', 'l_partkey', 2)""")
        .createOrReplaceTempView("graft_sql_copair_edges")
      s.sql("""SELECT * FROM graft_communities('graft_sql_copair_edges',
        'item_a', 'item_b', 4)""")
    }),

    "e13s_soft_dedup_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).createOrReplaceTempView("graft_sql_docs")
      Dedup.ngramJaccard(docs(s, d), "doc_id", "text", 3, 0.25, 100)
        .createOrReplaceTempView("graft_sql_dup_pairs")
      s.sql("""SELECT * FROM graft_soft_dedup('graft_sql_docs', 'doc_id',
        'graft_sql_dup_pairs', 'doc_a', 'doc_b')""")
    }),

    "k13s_weighted_thin_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).select("doc_id", "lang", "source")
        .join(Dedup.softDedupWeights(docs(s, d), "doc_id",
          Dedup.ngramJaccard(docs(s, d), "doc_id", "text", 3, 0.25, 100),
          "doc_a", "doc_b"), "doc_id")
        .createOrReplaceTempView("graft_sql_weighted_docs")
      s.sql("""SELECT * FROM graft_weighted_thin('graft_sql_weighted_docs',
        'doc_id', 'weight_ppm')""")
    }),

    "l12s_modularity_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .createOrReplaceTempView("graft_sql_li_baskets")
      s.sql("""SELECT * FROM graft_copurchase('graft_sql_li_baskets',
          'l_orderkey', 'l_partkey', 2)""").localCheckpoint()
        .createOrReplaceTempView("graft_sql_mod_edges")
      s.sql("""SELECT * FROM graft_communities('graft_sql_mod_edges',
          'item_a', 'item_b', 4)""")
        .createOrReplaceTempView("graft_sql_mod_labels")
      s.sql("""SELECT * FROM graft_modularity('graft_sql_mod_edges',
        'item_a', 'item_b', 'graft_sql_mod_labels', 'node', 'community')""")
    }),

    "d5s_sessionize_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_sessionize('graft_sql_events',
        'user_id', 'ts', 'event_id', 'value', 1800)""")
    }),

    "d6s_asof_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Incremental.upsertLatest(Tables.orders(s, d),
          Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
        .createOrReplaceTempView("graft_sql_orders_dedup")
      s.sql("""SELECT * FROM graft_asof_join('graft_sql_events',
          'graft_sql_orders_dedup', 'user_id', 'o_custkey', 'ts',
          'o_orderdate', 'o_orderkey,o_totalprice')""")
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("o_orderkey"), lit(-1L)).as("last_orderkey"),
          coalesce(Portable.pround(col("o_totalprice"), 4), lit(0.0))
            .as("last_totalprice"))
    }),

    "d29s_asof_tolerance_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Incremental.upsertLatest(Tables.orders(s, d),
          Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
        .createOrReplaceTempView("graft_sql_orders_dedup")
      s.sql("""SELECT * FROM graft_asof_join('graft_sql_events',
          'graft_sql_orders_dedup', 'user_id', 'o_custkey', 'ts',
          'o_orderdate', 'o_orderkey,o_totalprice', 604800)""")
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("o_orderkey"), lit(-1L)).as("last_orderkey"),
          coalesce(Portable.pround(col("o_totalprice"), 4), lit(0.0))
            .as("last_totalprice"))
    }),

    "b6s_gapfill_sql" -> ((s, d) => {
      sqlSurface(s, d)
      ev(s, d)
        .groupBy(col("user_id"), TimeAgg.timeBucket(col("ts"), 3600).as("bucket"))
        .agg(count(lit(1)).as("n_events"), fixedAvg(col("value"), 4).as("avg_value"))
        .createOrReplaceTempView("graft_sql_hourly")
      s.sql("""SELECT * FROM graft_gapfill_locf('graft_sql_hourly',
          'user_id', 'bucket', 3600, 'n_events', 'avg_value')""")
        .withColumn("bucket", col("bucket").cast("string"))
    }),

    "c5s_dedup_latest_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_dedup_latest('graft_sql_events',
          'user_id', 'ts,event_id')""")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), col("event_type").as("last_type"))
    }),

    "d7s_range_join_sql" -> ((s, d) => {
      sqlSurface(s, d)
      ev(s, d).filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
        .createOrReplaceTempView("graft_sql_clicks")
      ev(s, d).filter(col("event_type") === "view")
        .select("user_id", "ts")
        .createOrReplaceTempView("graft_sql_views")
      s.sql("""SELECT * FROM graft_range_join('graft_sql_clicks',
          'graft_sql_views', 'user_id', 'user_id', 'ts', 'ts', 1800,
          'n_prior_views')""")
    }),

    "b28s_uptime_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_uptime('graft_sql_events', 'user_id',
          'ts', 'event_id', 1800)""")
    }),

    "b27s_candlestick_sql" -> ((s, d) => {
      sqlSurface(s, d)
      ev(s, d).withColumn("day", TimeAgg.dayKey(col("ts")))
        .createOrReplaceTempView("graft_sql_events_day")
      s.sql("""SELECT * FROM graft_candlestick('graft_sql_events_day',
          'user_id,day', 'ts', 'event_id', 'value')""")
    }),

    "d8s_topk_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView("graft_sql_seg_orders")
      s.sql("""SELECT * FROM graft_topk('graft_sql_seg_orders',
          'c_mktsegment', 'o_totalprice desc,o_orderkey asc', 3, 'rnk')""")
    }),

    "dq4s_drift_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val cut = lit("2024-01-16").cast("timestamp")
      ev(s, d).filter(col("ts") < cut)
        .createOrReplaceTempView("graft_sql_ev_ref")
      ev(s, d).filter(col("ts") >= cut)
        .createOrReplaceTempView("graft_sql_ev_cur")
      s.sql("""SELECT * FROM graft_drift('graft_sql_ev_ref',
          'graft_sql_ev_cur', 'event_type', 'value', 0.0, 500.0, 20)""")
    }),

    "f16s_embedding_drift_sql" -> ((s, d) => {
      sqlSurface(s, d)
      embD(s, d).filter(col("vec_id") % 2 === 0)
        .createOrReplaceTempView("graft_sql_emb_ref")
      embD(s, d).filter(col("vec_id") % 2 === 1)
        .createOrReplaceTempView("graft_sql_emb_cur")
      s.sql("""SELECT * FROM graft_embedding_drift('graft_sql_emb_ref',
          'graft_sql_emb_cur', 'label', 'embedding')""")
    }),

    "d30s_bloom_join_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).createOrReplaceTempView("graft_sql_lineitem")
      Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
        .createOrReplaceTempView("graft_sql_urgent_orders")
      s.sql(s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
          ${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
          count(1) AS n_items
        FROM graft_bloom_join('graft_sql_lineitem',
          'graft_sql_urgent_orders', 'l_orderkey', 'o_orderkey')
        GROUP BY date_format(o_orderdate, 'yyyy-MM')""")
    }),

    "h20s_html_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).createOrReplaceTempView("graft_sql_documents")
      s.sql("""SELECT doc_id, html_to_text(concat(
          '<html><head><title>doc</title><style>p{margin:0} body{color:#222}</style><script type="text/javascript">var tracker = "do-not-ingest";</script></head><body><!-- chrome --><nav><a href="/">Home</a> &gt; <a href="/docs">Docs</a></nav><p>',
          replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
          '</p><footer>&copy; stats &amp; figures</footer></body></html>'))
          AS extracted
        FROM graft_sql_documents""")
    }),

    "h21s_evidence_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).createOrReplaceTempView("graft_sql_documents")
      val label = TextFunctions.qualityScoreFromProfile(col("text"),
        TextFunctions.textProfile(lower(col("text")))) >= 0.5
      Curation.trainEvidenceModel(
          docs(s, d).filter(col("doc_id") % 2 === 0), "text", label, 256)
        .createOrReplaceTempView("graft_sql_evidence_model")
      s.sql("""SELECT * FROM graft_evidence_score('graft_sql_documents',
          'doc_id', 'text', 'graft_sql_evidence_model')""")
    }),

    "b34s_ewma_sql" -> ((s, d) => {
      sqlSurface(s, d)
      ev(s, d).groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(Portable.toFixed(col("value"), 4)).as("fs"))
        .createOrReplaceTempView("graft_sql_daily_fs")
      s.sql("""SELECT user_id, day, CAST(fs AS DOUBLE) / 10000.0 AS value_sum,
          ewma
        FROM graft_ewma('graft_sql_daily_fs', 'user_id', 'day', 'fs', 8, 4)""")
    }),

    "b35s_autocorr_sql" -> ((s, d) => {
      sqlSurface(s, d)
      ev(s, d).groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(Portable.toFixed(col("value"), 4)).as("fs"))
        .createOrReplaceTempView("graft_sql_daily_fs2")
      s.sql("""SELECT * FROM graft_autocorr('graft_sql_daily_fs2',
        'user_id', 'day', 'fs', 1)""")
    }),

    "c11s_transitions_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_transitions('graft_sql_events',
        'user_id', 'ts', 'event_id', 'event_type')""")
    }),

    "c12s_attribution_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_attribution('graft_sql_events',
        'user_id', 'ts', 'event_id', 'event_type', 'click,view',
        'purchase', 604800)""")
    }),

    "h22s_keyword_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).createOrReplaceTempView("graft_sql_documents")
      s.sql("""SELECT * FROM graft_keyword_search('graft_sql_documents',
        'doc_id', 'text', 'spark,window,merge', 20)""")
    }),

    "g6s_shard_pack_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
        .createOrReplaceTempView("graft_sql_doc_sizes")
      s.sql("""SELECT doc_id, lang, shard_id, shard_offset, n_bytes
        FROM graft_shard_pack('graft_sql_doc_sizes', 'lang', 'doc_id',
          'n_chars', 4096)""")
    }),

    "dq6s_freshness_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_freshness('graft_sql_events',
        'event_type', 'ts', '2024-02-01 00:00:00', 259200, 864000)""")
    }),

    "d32s_asof_forward_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Incremental.upsertLatest(Tables.orders(s, d),
          Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
        .createOrReplaceTempView("graft_sql_orders_dedup")
      // D-suffixed literals: Spark SQL parses bare 10000.0 as DECIMAL
      // (unlike the DataFrame API's double lit), which would silently
      // retype the rounding to decimal
      s.sql("""SELECT event_id, user_id, ts,
          coalesce(o_orderkey, -1) AS next_orderkey,
          coalesce(floor(o_totalprice * 10000.0D + 0.5D) / 10000.0D, 0.0D)
            AS next_totalprice
        FROM graft_asof_forward('graft_sql_events',
          'graft_sql_orders_dedup', 'user_id', 'o_custkey', 'ts',
          'o_orderdate', 'o_orderkey,o_totalprice')""")
    }),

    "f17s_knn_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val e = embD(s, d)
      e.createOrReplaceTempView("graft_sql_emb_corpus")
      e.filter(col("vec_id") % 100 === 0)
        .createOrReplaceTempView("graft_sql_emb_queries")
      s.sql("""SELECT * FROM graft_knn_classify('graft_sql_emb_corpus',
        'graft_sql_emb_queries', 'vec_id', 'embedding', 'label', 5)""")
    }),

    "c16s_funnel_times_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_funnel_times('graft_sql_events',
        'user_id', 'ts', 'event_type', 'view,click,purchase', 3600)""")
    }),

    "c15s_cohort_value_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_cohort_value('graft_sql_events',
        'user_id', 'ts', 'value')""")
    }),

    "c13s_paths_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_top_paths('graft_sql_events',
        'user_id', 'ts', 'event_id', 'event_type', 1800, 5, 20)""")
    }),

    "c14s_stickiness_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_stickiness('graft_sql_events',
        'user_id', 'ts')""")
    }),

    "c17s_growth_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("SELECT * FROM graft_growth('graft_sql_events', 'user_id', 'ts')")
    }),

    "c18s_streaks_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("SELECT * FROM graft_streaks('graft_sql_events', 'user_id', 'ts')")
    }),

    "c19s_rfm_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_rfm('graft_sql_events', 'user_id',
        'ts', 'value')""")
    }),

    "dq7s_anomalies_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_anomalies('graft_sql_events',
        'event_type', 'ts', 7, 3, 3)""")
    }),

    "dq9s_cusum_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_cusum('graft_sql_events',
        'event_type', 'ts', 0, 30)""")
    }),

    "h28s_link_rank_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        .createOrReplaceTempView("graft_sql_purchase_edges")
      s.sql("""SELECT * FROM graft_pagerank('graft_sql_purchase_edges',
        'src', 'dst', 6)""")
    }),

    "l4s_personalized_rank_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        .createOrReplaceTempView("graft_sql_purchase_edges")
      Tables.supplier(s, d).filter(col("s_nationkey") === 1)
        .select((col("s_suppkey") * 2 + 1).as("node"))
        .createOrReplaceTempView("graft_sql_rank_seeds")
      s.sql("""SELECT * FROM graft_pagerank('graft_sql_purchase_edges',
        'src', 'dst', 6, '', 'graft_sql_rank_seeds')""")
    }),

    "l5s_weighted_rank_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        .withColumn("w", lit(1L))
        .createOrReplaceTempView("graft_sql_weighted_edges")
      s.sql("""SELECT * FROM graft_pagerank('graft_sql_weighted_edges',
        'src', 'dst', 6, 'w', '')""")
    }),

    "l10s_hits_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .createOrReplaceTempView("graft_sql_directed_edges")
      s.sql("""SELECT * FROM graft_hits('graft_sql_directed_edges',
        'src', 'dst', 4)""")
    }),

    "l2s_copurchase_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .createOrReplaceTempView("graft_sql_li_baskets")
      s.sql("""SELECT * FROM graft_copurchase('graft_sql_li_baskets',
        'l_orderkey', 'l_partkey', 2)""")
    }),

    "l1s_components_sql" -> ((s, d) => {
      // TVFs compose through views: l2's pair table feeds l1
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .createOrReplaceTempView("graft_sql_li_baskets")
      s.sql("""SELECT * FROM graft_copurchase('graft_sql_li_baskets',
          'l_orderkey', 'l_partkey', 2)""")
        .createOrReplaceTempView("graft_sql_copair_edges")
      s.sql("""SELECT * FROM graft_components('graft_sql_copair_edges',
        'item_a', 'item_b')""")
    }),

    "l3s_triangles_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .createOrReplaceTempView("graft_sql_li_baskets")
      s.sql("""SELECT * FROM graft_copurchase('graft_sql_li_baskets',
          'l_orderkey', 'l_partkey', 2)""")
        .createOrReplaceTempView("graft_sql_copair_edges")
      s.sql("""SELECT * FROM graft_triangles('graft_sql_copair_edges',
        'item_a', 'item_b')""")
    }),

    "l6s_kcore_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .createOrReplaceTempView("graft_sql_li_baskets")
      s.sql("""SELECT * FROM graft_copurchase('graft_sql_li_baskets',
          'l_orderkey', 'l_partkey', 2)""")
        .createOrReplaceTempView("graft_sql_copair_edges")
      s.sql("""SELECT * FROM graft_kcore('graft_sql_copair_edges',
        'item_a', 'item_b', 2)""")
    }),

    "l13s_scc_sql" -> ((s, d) => {
      sqlSurface(s, d)
      sccEdges(s, d).createOrReplaceTempView("graft_sql_seq_edges")
      s.sql("SELECT * FROM graft_scc('graft_sql_seq_edges', 'src', 'dst')")
    }),

    "l14s_condense_sql" -> ((s, d) => {
      sqlSurface(s, d)
      sccEdges(s, d).createOrReplaceTempView("graft_sql_seq_edges")
      s.sql("SELECT * FROM graft_condense('graft_sql_seq_edges', 'src', 'dst')")
    }),

    "l7s_neighbor_jaccard_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .createOrReplaceTempView("graft_sql_li_baskets")
      s.sql("""SELECT * FROM graft_copurchase('graft_sql_li_baskets',
          'l_orderkey', 'l_partkey', 2)""")
        .createOrReplaceTempView("graft_sql_copair_edges")
      s.sql("""SELECT * FROM graft_neighbor_jaccard('graft_sql_copair_edges',
        'item_a', 'item_b', 0.25, 200)""")
    }),

    "e12s_containment_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).select(col("doc_id"), col("text"))
        .unionByName(docs(s, d).filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat_ws(" ",
              slice(TextFunctions.tokens(col("text")), 1, 15)).as("text")))
        .createOrReplaceTempView("graft_sql_docs_prefixed")
      s.sql("""SELECT * FROM graft_containment('graft_sql_docs_prefixed',
        'doc_id', 'text', 3, 0.5, 100)""")
    }),

    "c20s_golden_record_sql" -> ((s, d) => {
      sqlSurface(s, d)
      ev(s, d).select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_id") % 2 === 1, lit(null).cast("double"))
            .otherwise(col("value")).as("value"),
          when(col("event_id") % 2 === 0, lit(null).cast("string"))
            .otherwise(col("event_type")).as("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
        .createOrReplaceTempView("graft_sql_sparse_events")
      s.sql("""SELECT * FROM graft_golden_record('graft_sql_sparse_events',
        'user_id', 'ts', 'event_id', 'value,event_type,prop_k')""")
    }),

    "dq12s_benford_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice"))
        .createOrReplaceTempView("graft_sql_li_prices")
      s.sql("""SELECT * FROM graft_benford('graft_sql_li_prices',
        'l_returnflag', 'l_extendedprice')""")
    }),

    "dq13s_fd_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_partkey"), col("l_returnflag"))
        .createOrReplaceTempView("graft_sql_li_modes")
      s.sql("""SELECT * FROM graft_fd_check('graft_sql_li_modes',
        'l_partkey', 'l_returnflag')""")
    }),

    "dq14s_key_skew_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_key_skew('graft_sql_events',
        'user_id', 20)""")
    }),

    "dq17s_t_closeness_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.customer(s, d).select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).as("acct_band"),
          col("c_mktsegment"))
        .createOrReplaceTempView("graft_sql_cust_bands")
      s.sql("""SELECT * FROM graft_t_closeness('graft_sql_cust_bands',
        'c_nationkey,acct_band', 'c_mktsegment', 0.3)""")
    }),

    "k11s_zorder_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
        .createOrReplaceTempView("graft_sql_lineitem_zo")
      s.sql("""SELECT * FROM graft_zorder('graft_sql_lineitem_zo',
        'l_partkey,l_suppkey', 8)""")
    }),

    "h26s_readability_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).createOrReplaceTempView("graft_sql_documents")
      s.sql("""SELECT doc_id,
          size(filter(split(trim(text), '\\s+'), x -> length(x) > 0)) AS n_words,
          size(regexp_extract_all(text, '[.!?]+', 0)) AS n_sentences,
          size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS n_syllables,
          flesch_score(text) AS flesch
        FROM graft_sql_documents""")
    }),

    "k10s_temperature_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).createOrReplaceTempView("graft_sql_documents")
      s.sql("""SELECT * FROM graft_temperature_sample(
        'graft_sql_documents', 'source', 'doc_id', 200, '|temp1')""")
    }),

    "b39s_seasonal_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_seasonal('graft_sql_events',
        'event_type', 'ts', 'value')""")
    }),

    "f18s_matryoshka_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val e = embD(s, d)
      e.createOrReplaceTempView("graft_sql_emb")
      e.filter(col("vec_id") % 100 === 0)
        .createOrReplaceTempView("graft_sql_emb_q")
      s.sql("""SELECT * FROM graft_matryoshka('graft_sql_emb',
        'graft_sql_emb_q', 'vec_id', 'embedding', 5, 16, 20)""")
    }),

    "dq8s_completeness_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_completeness('graft_sql_events',
        'event_type', 'ts')""")
    }),

    "g7s_scene_cuts_sql" -> ((s, d) => {
      sqlSurface(s, d)
      Multimodal.asMediaTable(docs(s, d), "doc_id", "text")
        .createOrReplaceTempView("graft_sql_media")
      s.sql("SELECT * FROM graft_scene_cuts('graft_sql_media', 64, 2, 20)")
    }),

    "f19s_mmr_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val e = embD(s, d)
      e.createOrReplaceTempView("graft_sql_emb")
      e.filter(col("vec_id") % 100 === 0)
        .createOrReplaceTempView("graft_sql_emb_q")
      s.sql("""SELECT * FROM graft_mmr('graft_sql_emb',
        'graft_sql_emb_q', 'vec_id', 'embedding', 5, 10)""")
    }),

    "b40s_instant_rate_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_instant_rate('graft_sql_events',
        'user_id', 'ts', 'event_id', 'value')""")
    }),

    "d33s_interval_lookup_sql" -> ((s, d) => {
      sqlSurface(s, d)
      import s.implicits._
      Seq(("bronze", 0.0, 50.0), ("silver", 50.0, 200.0),
        ("gold", 200.0, 1000.0)).toDF("tier", "lo", "hi")
        .createOrReplaceTempView("graft_sql_bands")
      s.sql("""SELECT event_id, user_id, value, tier
        FROM graft_interval_lookup('graft_sql_events', 'graft_sql_bands',
          'value', 'lo', 'hi', 50.0)""")
        .select(col("event_id"), col("user_id"),
          Portable.pround(col("value"), 4).as("value"), col("tier"))
    }),

    "h27s_line_dedup_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).select(col("doc_id"),
          concat_ws("\n", lit("Home | About | Contact"), col("text"),
            concat(lit("ref: "), col("doc_id").cast("string")),
            lit("(c) example corp")).as("text"))
        .createOrReplaceTempView("graft_sql_wrapped_docs")
      s.sql("""SELECT * FROM graft_line_dedup('graft_sql_wrapped_docs',
        'doc_id', 'text', 3)""")
    }),

    "b37s_top_gaps_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT user_id, gap_start, gap_end, gap_us, rnk
        FROM graft_top_gaps('graft_sql_events', 'user_id', 'ts',
          'event_id', 3)""")
    }),

    "b38s_asap_sql" -> ((s, d) => {
      sqlSurface(s, d)
      ev(s, d).groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(Portable.toFixed(col("value"), 4)).as("fs"))
        .createOrReplaceTempView("graft_sql_daily_fs3")
      s.sql("""SELECT * FROM graft_asap('graft_sql_daily_fs3',
        'user_id', 'day', 'fs', '1,2,4,8', 4)""")
    }),

    "b36s_twa_sql" -> ((s, d) => {
      sqlSurface(s, d)
      s.sql("""SELECT * FROM graft_twa('graft_sql_events', 'user_id',
        'ts', 'event_id', 'value', 21600, 4)""")
    }),

    "k9s_rebalance_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d).select(col("doc_id"), col("lang"))
        .createOrReplaceTempView("graft_sql_doc_langs")
      s.sql("""SELECT * FROM graft_rebalance('graft_sql_doc_langs',
        'lang', 'en:2,de:1,fr:1', 'doc_id', '|mix1')""")
    }),

    "dq5s_profile_sql" -> ((s, d) => {
      sqlSurface(s, d)
      val li = Tables.lineitem(s, d)
      val cut = lit("1995-07-01").cast("timestamp")
      li.filter(col("l_shipdate") < cut)
        .createOrReplaceTempView("graft_sql_li_ref")
      li.filter(col("l_shipdate") >= cut)
        .createOrReplaceTempView("graft_sql_li_cur")
      s.sql("""SELECT * FROM graft_profile('graft_sql_li_ref',
        'graft_sql_li_cur',
        'l_quantity:4,l_extendedprice:4,l_discount:6,l_tax:6')""")
    }),

    "k8s_curriculum_sql" -> ((s, d) => {
      sqlSurface(s, d)
      docs(s, d)
        .select(col("doc_id"), col("text"),
          TextFunctions.textProfile(lower(col("text"))).as("p"))
        .select(col("doc_id"),
          TextFunctions.qualityScoreFromProfile(col("text"), col("p"))
            .as("quality_score"))
        .createOrReplaceTempView("graft_sql_scored_docs")
      s.sql("""SELECT doc_id, quality_score, rank, phase
        FROM graft_curriculum('graft_sql_scored_docs',
          'quality_score desc, doc_id asc', 10)""")
    })
  )

  /** SQL-TVF mirror support: install the graft SQL surface (idempotent)
    * and expose the events table to SQL by name. */
  private[graft] def sqlSurface(s: SparkSession, d: String): Unit = {
    GraftExtensions.register(s)
    ev(s, d).createOrReplaceTempView("graft_sql_events")
  }

  // ---- DuckDB oracles -------------------------------------------------

  /** Tokenizer CTE fragment shared by text oracles (mirrors
    * TextFunctions.tokens 1:1). */
  private[graft] def tokCte(src: String, lower: Boolean): String = {
    val t = if (lower) "lower(text)" else "text"
    s"SELECT *, list_filter(string_split_regex(trim($t), '\\s+'), x -> len(x) > 0) AS tok FROM $src"
  }

  private[graft] val shingle3 =
    """CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')]
      |ELSE list_transform(generate_series(1, len(tok) - 2), i -> array_to_string(tok[i:i+2], ' ')) END""".stripMargin

  /** BPE oracles for h18/h19 — the full Sennrich training loop UNROLLED
    * as `numMerges` chained CTE rounds (pair-count agg → argmax with
    * the exact (count desc, left, right) tie-break → a RECURSIVE
    * fixpoint of single-pass boundary-spaced `replace`, which equals
    * the trainer's left-to-right in-place merge: within one round all
    * new adjacencies involve the just-built symbol, so re-selecting the
    * minimum drains the same pair first), then encoding as one
    * recursive CTE applying the LOWEST-rank present merge per step
    * (the BpeSegment apply loop: valid trained ranks guarantee newly
    * created pairs rank higher, so min-rank re-selection matches the
    * round structure exactly). Symbols are space-joined with sentinel
    * boundary spaces — symbols come from whitespace-split tokens, so a
    * space can never appear inside one, making `' l r '` containment
    * and replacement exact. Both validated against the hand-computed
    * Sennrich worked example before wiring. */
  private def bpeRoundsSql(numMerges: Int, topWords: Int,
                           minPair: Int): (String, String) = {
    val rounds = (0 until numMerges).map { k =>
      s"""pr$k AS (
         |  SELECT sp[i] AS l, sp[i+1] AS r, sum(n) AS cnt
         |  FROM (SELECT n, string_split(trim(s), ' ') AS sp FROM seg$k),
         |       unnest(generate_series(1, len(sp) - 1)) AS g(i)
         |  GROUP BY 1, 2),
         |best$k AS MATERIALIZED (
         |  SELECT l, r, cnt FROM pr$k WHERE cnt >= $minPair
         |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |app$k AS (
         |  SELECT w, n, s, 0 AS st FROM seg$k
         |  UNION ALL
         |  SELECT a.w, a.n, replace(a.s, ' ' || b.l || ' ' || b.r || ' ',
         |                           ' ' || b.l || b.r || ' '), a.st + 1
         |  FROM app$k a, best$k b
         |  WHERE contains(a.s, ' ' || b.l || ' ' || b.r || ' ')),
         |seg${k + 1} AS MATERIALIZED (
         |  SELECT w, n, s FROM app$k
         |  QUALIFY row_number() OVER (PARTITION BY w ORDER BY st DESC) = 1)"""
        .stripMargin
    }.mkString(",\n")
    val prefix =
      s"""WITH RECURSIVE t AS (${tokCte("documents", lower = true)}),
         |cap AS (
         |  SELECT w, n FROM (
         |    SELECT word AS w, CAST(count(*) AS BIGINT) AS n,
         |      row_number() OVER (ORDER BY count(*) DESC, word ASC) AS rk
         |    FROM (SELECT unnest(tok) AS word FROM t) GROUP BY word)
         |  WHERE rk <= $topWords),
         |seg0 AS MATERIALIZED (
         |  SELECT w, n,
         |    ' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' </w> ' AS s
         |  FROM cap),
         |$rounds""".stripMargin
    val mergesBody = (0 until numMerges).map(k =>
      s"""SELECT $k AS rank, l AS "left", r AS "right", cnt AS pair_count FROM best$k""")
      .mkString(" UNION ALL ")
    (prefix, mergesBody)
  }

  /** f19's oracle: the MMR greedy UNROLLED as k argmax stages (the
    * h18 unrolled-loop discipline — no recursion, so no DuckDB
    * recursive-CTE quirks): pool top-`poolSize` per query, a
    * MATERIALIZED pairwise-sim table, then per step an anti-join of
    * the picked rows and a max-sim grouped argmax. λ = 0.5: both score
    * multipliers are powers of two over the 6dp cosines, so the IEEE
    * arithmetic matches Spark operand-for-operand. */
  private lazy val f19OracleSql: String = {
    val k = 5; val pool = 10
    val dotQ = sqlPround(
      "list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.v[i]), (x, y) -> x + y)", 6)
    val dotS = sqlPround(
      "list_reduce(list_transform(generate_series(1, len(a.cv)), i -> a.cv[i] * b.cv[i]), (x, y) -> x + y)", 6)
    val steps = (2 to k).map { j =>
      s"""selu${j - 1} AS (${(1 until j).map(i => s"SELECT query_id, nn_id FROM sel$i").mkString(" UNION ALL ")}),
         |rem${j - 1} AS (
         |  SELECT p.* FROM pool p ANTI JOIN selu${j - 1} u
         |    ON p.query_id = u.query_id AND p.nn_id = u.nn_id),
         |sc$j AS (
         |  SELECT r.query_id, r.nn_id, r.cosine,
         |    0.5 * r.cosine - 0.5 * max(s.sim) AS score
         |  FROM rem${j - 1} r
         |  JOIN selu${j - 1} u ON u.query_id = r.query_id
         |  JOIN sims s ON s.query_id = r.query_id AND s.ia = r.nn_id
         |    AND s.ib = u.nn_id
         |  GROUP BY 1, 2, 3),
         |sel$j AS (
         |  SELECT query_id, nn_id, cosine, $j AS rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, nn_id ASC) AS rk FROM sc$j)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |         (a, b) -> a + b)) AS nrm,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM e
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id % 100 = 0
       |), s0 AS (
       |  SELECT query_id, c.vec_id AS nn_id, c.v AS cv,
       |    $dotQ AS cosine
       |  FROM q JOIN n c ON c.vec_id <> q.query_id
       |), pool AS MATERIALIZED (
       |  SELECT query_id, nn_id, cosine, cv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, nn_id ASC) AS pr FROM s0)
       |  WHERE pr <= $pool
       |), sims AS MATERIALIZED (
       |  SELECT a.query_id, a.nn_id AS ia, b.nn_id AS ib,
       |    $dotS AS sim
       |  FROM pool a JOIN pool b
       |    ON a.query_id = b.query_id AND a.nn_id <> b.nn_id
       |), sel1 AS (
       |  SELECT query_id, nn_id, cosine, 1 AS rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, nn_id ASC) AS rk FROM pool)
       |  WHERE rk = 1),
       |$steps
       |SELECT query_id, rank, nn_id, cosine
       |FROM (${(1 to k).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")})"""
      .stripMargin
  }

  /** Shared f20/f21 oracle prefix: the integer Lloyd loop UNROLLED as
    * `iters` CTE rounds (the l6/l8/h18 discipline) — fixed-point(6)
    * vectors, argmin by the `dist·k + cell` integer encode (== the
    * Spark side's (dist, cell) struct min for non-negative dists),
    * floor-division centroid updates via the exact non-negative-residue
    * identity, empty cells carrying the previous centroid. Ends with
    * `af(vec_id, cell)` + `v(vec_id, fv)` in scope. */
  private def kmeansPrefixSql(kSql: String, iters: Int,
                              preCte: String = ""): String = {
    def dist(fv: String, cv: String): String =
      s"list_reduce(list_transform(generate_series(1, len($fv)), " +
        s"i -> ($fv[i] - $cv[i]) * ($fv[i] - $cv[i])), (a, b) -> a + b)"
    def assignCte(name: String, centsCte: String): String =
      s"""$name AS (
         |  SELECT vec_id, CAST(min(dist * ($kSql) + cell) % ($kSql) AS INT) AS cell
         |  FROM (SELECT v.vec_id, c.cell, ${dist("v.fv", "c.cv")} AS dist
         |        FROM v CROSS JOIN $centsCte c)
         |  GROUP BY vec_id)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${assignCte(s"a$r", s"c${r - 1}")},
         |u$r AS (
         |  SELECT a.cell, g.i AS pos, sum(v.fv[g.i]) AS s, count(*) AS n
         |  FROM a$r a JOIN v USING (vec_id),
         |    unnest(generate_series(1, len(v.fv))) AS g(i)
         |  GROUP BY 1, 2),
         |c$r AS MATERIALIZED (
         |  SELECT p.cell, coalesce(w.cv, p.cv) AS cv
         |  FROM c${r - 1} p LEFT JOIN (
         |    SELECT cell, list((s - ((s % n + n) % n)) // n ORDER BY pos) AS cv
         |    FROM u$r GROUP BY 1) w USING (cell))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${preCte}v AS MATERIALIZED (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
       |     for x in embedding] AS fv
       |  FROM embeddings),
       |c0 AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, fv AS cv
       |  FROM (SELECT vec_id, fv FROM v ORDER BY vec_id LIMIT ($kSql))),
       |$rounds,
       |${assignCte("af", s"c$iters")}""".stripMargin
  }

  private lazy val f20OracleSql: String =
    s"""${kmeansPrefixSql("8", 2)}
       |SELECT vec_id, cell FROM af""".stripMargin

  /** f21 runs the AUTO-k regime (k = ⌈√n⌉ — Abbas et al.'s
    * corpus-proportional cluster count, the 100 TB path: the r12 64×
    * probe read fixed k=8 at 261× vs auto at 24×), so the oracle
    * derives the SAME k from its own corpus count. */
  private lazy val f21OracleSql: String =
    s"""${kmeansPrefixSql("SELECT k FROM kk", 2,
         "kk AS MATERIALIZED (SELECT greatest(1, CAST(ceil(sqrt(count(*))) " +
           "AS BIGINT)) AS k FROM embeddings),\n")},
       |w2 AS (
       |  SELECT af.vec_id, af.cell, v.fv,
       |    list_reduce(list_transform(v.fv, x -> x * x), (a, b) -> a + b)
       |      AS n2
       |  FROM af JOIN v USING (vec_id)),
       |p AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib, b.cell AS cell,
       |    list_reduce(list_transform(generate_series(1, len(a.fv)),
       |      i -> a.fv[i] * b.fv[i]), (x, y) -> x + y) AS dot,
       |    a.n2 AS na2, b.n2 AS nb2
       |  FROM w2 a JOIN w2 b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |SELECT ib AS vec_id, min(ia) AS kept_by, min(cell) AS cell
       |FROM p
       |WHERE dot > 0
       |  AND CAST(dot AS HUGEINT) * dot * 100 >= CAST(9 AS HUGEINT) * na2 * nb2
       |GROUP BY 1""".stripMargin

  /** b42's oracle — the same bottom-k/union/overlap algebra in SQL. */
  private lazy val b42OracleSql: String = {
    def hcte(ty: String): String =
      s"""SELECT h FROM (SELECT DISTINCT
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM events WHERE event_type = '$ty') ORDER BY h LIMIT 256"""
        .stripMargin
    def est(kc: String, hc: String): String =
      s"CASE WHEN $kc < 256 THEN CAST($kc AS DOUBLE) " +
        s"ELSE 255.0 * 1152921504606846976.0 / CAST($hc AS DOUBLE) END"
    s"""WITH ha AS (${hcte("click")}),
       |hb AS (${hcte("view")}),
       |hu AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
       |       ORDER BY h LIMIT 256),
       |st AS (SELECT
       |  (SELECT count(*) FROM ha) AS ka, (SELECT max(h) FROM ha) AS h_a,
       |  (SELECT count(*) FROM hb) AS kb, (SELECT max(h) FROM hb) AS h_b,
       |  (SELECT count(*) FROM hu) AS ku, (SELECT max(h) FROM hu) AS h_u,
       |  (SELECT count(*) FROM hu JOIN ha USING (h) JOIN hb USING (h))
       |    AS novl)
       |SELECT ka AS k_used_a, ${sqlPround(est("ka", "h_a"), 2)} AS est_a,
       |  kb AS k_used_b, ${sqlPround(est("kb", "h_b"), 2)} AS est_b,
       |  ku AS k_used_union, ${sqlPround(est("ku", "h_u"), 2)} AS est_union,
       |  novl AS n_overlap,
       |  CASE WHEN ku > 0 THEN ${sqlPround(
      "CAST(novl AS DOUBLE) / CAST(ku AS DOUBLE)", 6)} ELSE 0.0 END
       |    AS jaccard,
       |  CASE WHEN ku > 0 THEN ${sqlPround(
      s"CAST(novl AS DOUBLE) / CAST(ku AS DOUBLE) * (${est("ku", "h_u")})",
      2)} ELSE 0.0 END AS est_intersection
       |FROM st""".stripMargin
  }

  /** f22's oracle — f1 (exact) and f2 (LSH) embedded whole, the same
    * ppm literal log2 weight tables indexed per candidate rank. */
  private lazy val f22OracleSql: String = {
    val w = Similarity.RankEvalW.take(5).mkString("[", ", ", "]")
    val cw = Similarity.RankEvalCumW.take(5).mkString("[", ", ", "]")
    s"""SELECT t.query_id, count(*) AS n_true, count(c.rank) AS n_hit,
       |  ${sqlPround("CAST(count(c.rank) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS recall,
       |  CASE WHEN min(c.rank) IS NOT NULL
       |    THEN ${sqlPround("1.0 / CAST(min(c.rank) AS DOUBLE)", 6)}
       |    ELSE 0.0 END AS mrr,
       |  CASE WHEN count(c.rank) > 0
       |    THEN ${sqlPround(
      s"CAST(sum(($w)[c.rank]) AS DOUBLE) / CAST(($cw)[count(*)] AS DOUBLE)",
      6)}
       |    ELSE 0.0 END AS ndcg
       |FROM ($f1OracleSql) t
       |LEFT JOIN ($f2OracleSql) c
       |  ON c.query_id = t.query_id AND c.nn_id = t.nn_id
       |GROUP BY 1""".stripMargin
  }

  /** c23's oracle — the same journey chain in SQL windows, then the
    * 12 value-iteration rounds UNROLLED per scenario (full + one
    * removal per channel) on the tiny transition matrix; terminals
    * resolve through the same (conv→1e6, else 0) default the driver
    * solve uses. */
  private lazy val c23OracleSql: String = {
    val types = Seq("click", "view")
    val conv = "purchase"
    val iters = 12
    def rounds(tag: String, mcte: String): String = {
      val zero = s"""p_${tag}_0 AS (
         |  SELECT '' AS state, CAST(0 AS BIGINT) AS p WHERE 1 = 0)""".stripMargin
      val rs = (1 to iters).map { r =>
        s"""p_${tag}_$r AS (
           |  SELECT m.src AS state,
           |    CAST(sum(m.c * (CASE WHEN p.state IS NOT NULL THEN p.p
           |      WHEN m.dst = '$conv' THEN 1000000 ELSE 0 END)) AS BIGINT)
           |      // CAST(sum(m.c) AS BIGINT) AS p
           |  FROM $mcte m LEFT JOIN p_${tag}_${r - 1} p ON p.state = m.dst
           |  GROUP BY m.src)""".stripMargin
      }
      (zero +: rs).mkString(",\n")
    }
    val removals = types.map { ch =>
      s"""m_rm_$ch AS MATERIALIZED (
         |  SELECT src, CASE WHEN dst = '$ch' THEN '(null)' ELSE dst END AS dst,
         |    CAST(sum(c) AS BIGINT) AS c
         |  FROM m_full GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val fin = types.map { ch =>
      s"""SELECT '$ch' AS channel,
         |  coalesce((SELECT p FROM p_full_$iters WHERE state = '(start)'), 0) AS pf,
         |  coalesce((SELECT p FROM p_rm${ch}_$iters WHERE state = '(start)'), 0) AS pr"""
        .stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, event_type FROM events
       |  WHERE event_type IN (${(types :+ conv).map("'" + _ + "'").mkString(", ")})),
       |k AS (
       |  SELECT *, coalesce(sum(CASE WHEN event_type = '$conv' THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |  FROM e),
       |k2 AS (SELECT user_id, ts, event_id, event_type FROM k WHERE cb = 0),
       |t0 AS (
       |  SELECT event_type AS curr,
       |    coalesce(lag(event_type) OVER w, '(start)') AS prev,
       |    lead(event_type) OVER w AS nxt
       |  FROM k2 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |trans AS (
       |  SELECT prev AS src, curr AS dst FROM t0
       |  UNION ALL
       |  SELECT curr, '(null)' FROM t0 WHERE nxt IS NULL AND curr <> '$conv'),
       |m_full AS MATERIALIZED (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM trans GROUP BY 1, 2),
       |$removals,
       |${rounds("full", "m_full")},
       |${types.map(ch => rounds(s"rm$ch", s"m_rm_$ch")).mkString(",\n")},
       |fin AS (
       |  $fin),
       |re AS (SELECT channel, pf, pr, greatest(pf - pr, 0) AS re FROM fin),
       |tt AS (SELECT sum(re) AS t FROM re)
       |SELECT channel, pf AS p_full_ppm, pr AS p_removed_ppm,
       |  re AS removal_effect_ppm,
       |  CAST(CASE WHEN t > 0 THEN (re * 1000000) // t
       |    ELSE 0 END AS BIGINT) AS share_ppm
       |FROM re, tt""".stripMargin
  }

  /** c22's oracle — the same one-window multi-touch pairing, with the
    * integral splits spelled through DuckDB's `//` (== Spark's `div`
    * on the non-negative operands the operator contracts). */
  private lazy val c22OracleSql: String = {
    val types = Seq("click", "view")
    val touchIn = types.map("'" + _ + "'").mkString("(", ", ", ")")
    val key = s"CASE WHEN event_type IN $touchIn THEN " +
      "printf('%020d|%020d|%s', t, event_id, event_type) END"
    val cnts = types.zipWithIndex.map { case (ty, i) =>
      s"sum(CASE WHEN event_type = '$ty' THEN 1 ELSE 0 END) OVER win AS c$i"
    }.mkString(",\n    ")
    val per = (types.zipWithIndex.map { case (ty, i) =>
      s"SELECT '$ty' AS ty, c$i AS cnt, u, n, fty, lty FROM c"
    } :+ "SELECT '(unattributed)' AS ty, CAST(0 AS BIGINT) AS cnt, u, n, fty, lty FROM c")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id,
       |    event_type,
       |    CAST(floor(coalesce(value, 0.0) * 100.0 + 0.5) AS BIGINT)
       |      * 1000000 AS u
       |  FROM events
       |  WHERE event_type IN ('click', 'view', 'purchase')),
       |w AS (
       |  SELECT *,
       |    $cnts,
       |    min($key) OVER win AS fk,
       |    max($key) OVER win AS lk
       |  FROM e
       |  WINDOW win AS (PARTITION BY user_id ORDER BY t
       |    RANGE BETWEEN ${7L * 24 * 3600 * 1000000L} PRECEDING AND CURRENT ROW)),
       |c AS (
       |  SELECT u, ${types.indices.map(i => s"c$i").mkString(", ")},
       |    ${types.indices.map(i => s"c$i").mkString(" + ")} AS n,
       |    substr(fk, 43) AS fty, substr(lk, 43) AS lty
       |  FROM w WHERE event_type = 'purchase'),
       |per AS (
       |  $per),
       |k2 AS (
       |  SELECT ty, cnt, u, n, fty, lty,
       |    CASE WHEN n > 0 THEN u // n ELSE 0 END AS linbase,
       |    (u * 2) // 5 AS fsh,
       |    u - ((u * 2) // 5) * 2 AS midtot,
       |    CASE WHEN n > 2 THEN (u - ((u * 2) // 5) * 2) // (n - 2)
       |      ELSE 0 END AS midbase
       |  FROM per),
       |cr AS (
       |  SELECT ty,
       |    CASE WHEN ty = '(unattributed)'
       |        THEN CASE WHEN n = 0 THEN u ELSE 0 END
       |      WHEN n = 0 THEN 0
       |      ELSE cnt * linbase
       |        + CASE WHEN fty = ty THEN u - linbase * n ELSE 0 END
       |    END AS lin,
       |    CASE WHEN ty = '(unattributed)'
       |        THEN CASE WHEN n = 0 THEN u ELSE 0 END
       |      WHEN fty = ty THEN u ELSE 0 END AS fir,
       |    CASE WHEN ty = '(unattributed)'
       |        THEN CASE WHEN n = 0 THEN u ELSE 0 END
       |      WHEN lty = ty THEN u ELSE 0 END AS las,
       |    CASE WHEN ty = '(unattributed)'
       |        THEN CASE WHEN n = 0 THEN u ELSE 0 END
       |      WHEN n = 0 THEN 0
       |      WHEN n = 1 THEN CASE WHEN fty = ty THEN u ELSE 0 END
       |      WHEN n = 2 THEN
       |        (CASE WHEN lty = ty THEN u // 2 ELSE 0 END)
       |        + (CASE WHEN fty = ty THEN u - u // 2 ELSE 0 END)
       |      ELSE
       |        (CASE WHEN fty = ty THEN fsh + (midtot - midbase * (n - 2))
       |          ELSE 0 END)
       |        + (CASE WHEN lty = ty THEN fsh ELSE 0 END)
       |        + (cnt - (CASE WHEN fty = ty THEN 1 ELSE 0 END)
       |           - (CASE WHEN lty = ty THEN 1 ELSE 0 END)) * midbase
       |    END AS pos
       |  FROM k2)
       |SELECT ty AS touch_type,
       |  CAST(sum(lin) AS BIGINT) AS linear_ucents,
       |  CAST(sum(fir) AS BIGINT) AS first_ucents,
       |  CAST(sum(las) AS BIGINT) AS last_ucents,
       |  CAST(sum(pos) AS BIGINT) AS position_ucents
       |FROM cr GROUP BY 1""".stripMargin
  }

  private lazy val h18OracleSql: String = {
    val (prefix, mergesBody) = bpeRoundsSql(30, 2000, 2)
    s"""$prefix
       |SELECT CAST(rank AS INT) AS rank, "left", "right",
       |  CAST(pair_count AS BIGINT) AS pair_count
       |FROM ($mergesBody)""".stripMargin
  }

  /** h19's oracle leans on the standard BPE property that ENCODING a
    * training word reproduces its training-final segmentation (both
    * are "apply merge 0 to exhaustion, then merge 1, ..."; newly
    * created pairs always rank above the merge that built them) — so
    * for a vocabulary inside the training cap, `seg<numMerges>` IS the
    * encode result and no second recursion is needed. The synthetic
    * corpus has 31 distinct words at every SF, far under the 2000-word
    * cap; a capped-out vocabulary would need a real encode recursion,
    * which DuckDB 1.0 mis-plans (column pruning into a recursive CTE
    * with a LATERAL silently stops the recursion — found while wiring
    * this; the Spark side has no such restriction). A cap-miss cannot
    * pass silently: missing words would LEFT-join to empty pieces and
    * the hash compare would fail loudly. */
  private lazy val h19OracleSql: String = {
    val (prefix, _) = bpeRoundsSql(30, 2000, 2)
    s"""$prefix,
       |encf AS (
       |  SELECT w AS word, trim(s) AS ps,
       |    len(string_split(trim(s), ' ')) AS np
       |  FROM seg30),
       |expl AS (
       |  SELECT doc_id, i AS ord, tok[i] AS word
       |  FROM t, unnest(generate_series(1, len(tok))) AS g(i))
       |SELECT t.doc_id,
       |  coalesce(j.pieces_str, '') AS pieces_str,
       |  CAST(coalesce(j.n_pieces, 0) AS INT) AS n_pieces
       |FROM t LEFT JOIN (
       |  SELECT doc_id, string_agg(ps, ' ' ORDER BY ord) AS pieces_str,
       |    CAST(sum(np) AS BIGINT) AS n_pieces
       |  FROM expl JOIN encf USING (word) GROUP BY doc_id) j USING (doc_id)"""
      .stripMargin
  }

  /** e2's oracle — also embedded as the pair source of e6's
    * connected-components oracle. */
  private lazy val e2OracleSql: String =
    s"""WITH t AS (${tokCte("documents", lower = true)}),
       |s AS (SELECT doc_id, $shingle3 AS shs FROM t),
       |e AS (SELECT DISTINCT doc_id AS doc, unnest(shs) AS sh FROM s),
       |sized AS (SELECT doc, count(*) AS n_sh FROM e GROUP BY 1),
       |keep AS (SELECT sh FROM e GROUP BY sh HAVING count(*) <= 100),
       |ek AS (SELECT e.* FROM e JOIN keep USING (sh)),
       |shared AS (
       |  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_shared
       |  FROM ek a JOIN ek b ON a.sh = b.sh AND a.doc < b.doc GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  ${sqlPround("CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)", 4)} AS jaccard
       |FROM shared JOIN sized sa ON sa.doc = doc_a JOIN sized sb ON sb.doc = doc_b
       |WHERE ${sqlPround("CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)", 4)} >= 0.25""".stripMargin

  /** The exact contamination report — shared by h8 (exact join) and h13
    * (Bloom sketch): the sketch never misses a real hit, and at h13's
    * registered bits/item its false positives are ~1e-19-rare, so both
    * spellings must hash-match this oracle. */
  private lazy val contaminationSql: String =
    s"""WITH t AS (${tokCte("documents", lower = true)}),
       |s AS (SELECT doc_id, list_distinct($shingle3) AS shs FROM t),
       |e AS (SELECT doc_id AS doc, unnest(shs) AS sh FROM s),
       |tr AS (SELECT DISTINCT sh AS hit_sh FROM e WHERE doc % 20 != 0),
       |ev AS (SELECT doc, sh FROM e WHERE doc % 20 = 0)
       |SELECT ev.doc AS doc_id, count(*) AS n_sh, count(tr.hit_sh) AS n_hit,
       |  ${sqlPround("CAST(count(tr.hit_sh) AS DOUBLE) / count(*)", 4)} AS contamination
       |FROM ev LEFT JOIN tr ON ev.sh = tr.hit_sh
       |GROUP BY 1""".stripMargin

  def oracleSql: Map[String, String] = baseOracleSql ++ sqlMirrorOracles

  /** Fuzz/oracle-gated AUXILIARY queries, kept OUT of the per-round
    * bench/verify registry: l13d forces the DISTRIBUTED FB-coloring SCC
    * path (`localThreshold = 0`) on graphs the default fast path
    * handles in one task — at the gate SFs its cost is ~14 s of pure
    * per-round stage scheduling (measured, sf0.1), which would be the
    * most expensive row in the whole bench for a physical path the
    * `ld13b_adversarial` fuzz family already hash-gates per draw
    * against the same closure oracle (and the 16×/64× probes measure
    * for scale). Resolved by `graft.Fuzz` alongside [[queries]]. */
  def fuzzQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l13d_scc_dist" -> ((s, d) =>
      Graphs.scc(sccEdges(s, d), "src", "dst", localThreshold = 0L)))

  /** Oracles for [[fuzzQueries]] (same resolution seam in `graft.Fuzz`). */
  def fuzzOracleSql: Map[String, String] = Map(
    "l13d_scc_dist" -> l13OracleSql)

  /** Documented reasons for the (deliberately) oracle-less queries —
    * Verify dumps this beside oracle_sql.json so every future
    * correctness artifact is self-explaining instead of carrying a
    * bare `no_oracle` (r11 verdict next-round #8). A `queries` entry
    * with neither an oracle nor a reason is a registration BUG;
    * Verify fails loudly on it. */
  def noOracleReasons: Map[String, String] = Map(
    "b9_approx_distinct" ->
      ("no_oracle_by_design: HLL sketch registers are engine-private " +
        "(Spark HLL++ vs DuckDB HLL hash differently), so no cross-engine " +
        "hash can exist; bounded instead by ScalaTest — <5% relative " +
        "error vs exact countDistinct, plus the portable twins " +
        "b9b_hll_portable (md5-register HLL, estimate AND rollup) and " +
        "b10_distinct_kmv ARE hash-matched"))

  // l13: the oracle verifies the OUTPUT CONTRACT, not the algorithm —
  // scc_id(v) = min{u : u →* v AND v →* u} is a pure function of the
  // graph, so the oracle computes bounded-doubling transitive closure
  // (8 squaring rounds = 256-hop reach; measured fixpoint at 5/6/7
  // rounds across the three SFs, extras are no-ops) and takes the
  // min over mutual pairs. The closure is O(core²) pairs — fine for
  // the oracle at the gate SF, and exactly the blow-up the ENGINE's
  // FB-coloring avoids (node/edge-keyed labels only). The FIXPOINT
  // CANARY (r14 advice): if the closure is still growing at round 8
  // the ORACLE under-converged — error() loudly AS an oracle problem
  // instead of masquerading as an engine mismatch. Shared by l13
  // (default fast-path sizes), l13d (forced distributed path) and the
  // l13s TVF mirror.
  private lazy val l13OracleSql: String = {
    val rounds = (1 to 8).map { r =>
      s"""r$r AS MATERIALIZED (SELECT DISTINCT x.a, y.b
         |  FROM r${r - 1} x JOIN r${r - 1} y ON x.b = y.a)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey
       |  FROM lineitem WHERE l_partkey % 7 = 0 AND l_quantity <= 20),
       |sq AS (SELECT l_orderkey, l_partkey,
       |    lead(l_partkey) OVER (PARTITION BY l_orderkey
       |      ORDER BY l_linenumber, l_partkey) AS nxt FROM f),
       |e AS (SELECT DISTINCT l_partkey AS src, nxt AS dst FROM sq
       |      WHERE nxt IS NOT NULL AND nxt <> l_partkey),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS MATERIALIZED (SELECT node AS a, node AS b FROM n
       |      UNION SELECT src, dst FROM e),
       |$rounds
       |SELECT fwd.b AS node, MIN(fwd.a)
       |  + CASE WHEN (SELECT count(*) FROM r8) = (SELECT count(*) FROM r7)
       |         THEN 0 ELSE error('l13 ORACLE under-converged: closure still growing at 8 doubling rounds (graph diameter > 256) — raise the oracle rounds; this is an oracle problem, not an engine regression') END
       |  AS scc_id
       |FROM r8 fwd JOIN r8 bwd ON fwd.a = bwd.b AND fwd.b = bwd.a
       |GROUP BY 1""".stripMargin
  }

  private lazy val baseOracleSql: Map[String, String] = Map(

    "a1_stage_events" ->
      """SELECT event_id, user_id, event_type, value, ts,
        |strftime(ts, '%Y%m%d') AS day, strftime(ts, '%Y%m') AS month,
        |CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
        |FROM events""".stripMargin,

    "a2_mongo_normalize" ->
      """WITH b AS (
        |  SELECT user_id, time_bucket(INTERVAL '4 hours', ts) AS created_at,
        |         ts, event_id, event_type, value FROM events
        |), p AS (
        |  SELECT *, md5(concat(user_id, '|', CAST(created_at AS VARCHAR))) AS doc_id,
        |         row_number() OVER (PARTITION BY user_id, created_at ORDER BY ts, event_id) - 1 AS pos
        |  FROM b
        |)
        |SELECT user_id, doc_id, pos, md5(concat(doc_id, '|', pos)) AS row_id,
        |       ts, event_id, event_type, value
        |FROM p""".stripMargin,

    "a4_normalize_nested" ->
      """WITH b AS (
        |  SELECT user_id, time_bucket(INTERVAL '4 hours', ts) AS created_at,
        |         ts, event_id, event_type, value FROM events
        |), p AS (
        |  SELECT *, md5(concat(user_id, '|', CAST(created_at AS VARCHAR))) AS doc_id,
        |         row_number() OVER (PARTITION BY user_id, created_at ORDER BY ts, event_id) - 1 AS mpos
        |  FROM b
        |), d AS (
        |  SELECT *, strftime(created_at, '%Y%m%d') AS day FROM p
        |), dd AS (
        |  SELECT *, md5(concat(user_id, '|', day)) AS day_id,
        |         dense_rank() OVER (PARTITION BY user_id, day ORDER BY created_at) - 1 AS bpos
        |  FROM d
        |), bk AS (
        |  SELECT *, md5(concat(day_id, '|buckets|', bpos)) AS bucket_row_id FROM dd
        |)
        |SELECT bucket_row_id AS _parent_id, mpos AS pos,
        |       md5(concat(bucket_row_id, '|metrics|', mpos)) AS row_id,
        |       ts, event_id, event_type, value
        |FROM bk""".stripMargin,

    "a3_stage_users" ->
      """SELECT e.user_id, c.c_name AS name, c.c_acctbal AS acctbal,
        |       c.c_mktsegment AS mktsegment,
        |       array_to_string(list_sort(list(DISTINCT e.event_type)), ',') AS devices
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY e.user_id, c.c_name, c.c_acctbal, c.c_mktsegment""".stripMargin,

    "b1_agg_daily" -> b1OracleSql,
    // same oracle as b1: the salted two-stage plan must be value-equal
    "b13_salted_agg_daily" -> b1OracleSql,

    "b2_agg_weekly" ->
      s"""SELECT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         |${sqlFixedAvg("value", 4)} AS avg_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "b3_agg_monthly" ->
      s"""SELECT user_id, strftime(ts, '%Y%m') AS month,
         |${sqlFixedSum("value", 4)} AS value_sum, count(*) AS n_events
         |FROM events GROUP BY 1, 2""".stripMargin,

    "b4_agg_summary" ->
      s"""WITH v AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day, ${sqlFixedAvg("value", 4)} AS avg_view_value
         |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |c AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day, ${sqlFixedSum("value", 4)} AS click_value_sum
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT v.user_id, v.day, v.avg_view_value, c.click_value_sum
         |FROM v JOIN c ON v.user_id = c.user_id AND v.day = c.day""".stripMargin,

    "b5_agg_hourly_bucket" ->
      s"""SELECT user_id, CAST(time_bucket(INTERVAL '4 hours', ts) AS VARCHAR) AS bucket,
         |count(*) AS n_events, ${sqlFixedSum("value", 4)} AS value_sum
         |FROM events GROUP BY 1, 2""".stripMargin,

    "b6_gapfill_locf" ->
      s"""WITH r AS (
         |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         |         count(*) AS n_events, ${sqlFixedAvg("value", 4)} AS avg_value
         |  FROM events GROUP BY 1, 2),
         |sp AS (
         |  SELECT user_id, unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
         |  FROM r GROUP BY user_id)
         |SELECT sp.user_id, CAST(sp.bucket AS VARCHAR) AS bucket,
         |  coalesce(r.n_events, 0) AS n_events,
         |  last_value(r.avg_value IGNORE NULLS) OVER (
         |    PARTITION BY sp.user_id ORDER BY sp.bucket ROWS UNBOUNDED PRECEDING) AS avg_value_locf
         |FROM sp LEFT JOIN r ON r.user_id = sp.user_id AND r.bucket = sp.bucket""".stripMargin,

    "b11_gapfill_bounded" ->
      s"""WITH r AS (
         |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         |         count(*) AS n_events, ${sqlFixedAvg("value", 4)} AS avg_value
         |  FROM events GROUP BY 1, 2),
         |rf AS (SELECT * FROM r
         |  WHERE bucket BETWEEN TIMESTAMP '2024-01-10 00:00:00'
         |                   AND TIMESTAMP '2024-01-13 00:00:00'),
         |sp AS (
         |  SELECT user_id, unnest(generate_series(
         |    TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-13 00:00:00',
         |    INTERVAL 1 HOUR)) AS bucket
         |  FROM (SELECT DISTINCT user_id FROM rf))
         |SELECT sp.user_id, CAST(sp.bucket AS VARCHAR) AS bucket,
         |  coalesce(rf.n_events, 0) AS n_events,
         |  last_value(rf.avg_value IGNORE NULLS) OVER (
         |    PARTITION BY sp.user_id ORDER BY sp.bucket ROWS UNBOUNDED PRECEDING) AS avg_value_locf
         |FROM sp LEFT JOIN rf ON rf.user_id = sp.user_id AND rf.bucket = sp.bucket""".stripMargin,

    "b7_rollup_totals" ->
      s"""SELECT coalesce(user_id, -1) AS user_id, coalesce(m, 'ALL') AS month,
         |  CAST(GROUPING(user_id) AS INTEGER) AS grp_user,
         |  CAST(GROUPING(m) AS INTEGER) AS grp_month,
         |  ${sqlFixedSum("value", 4)} AS value_sum, count(*) AS n_events
         |FROM (SELECT user_id, strftime(ts, '%Y%m') AS m, value FROM events)
         |GROUP BY ROLLUP (user_id, m)""".stripMargin,

    "b14_cube_totals" ->
      s"""SELECT coalesce(event_type, 'ALL') AS event_type, coalesce(m, 'ALL') AS month,
         |  CAST(GROUPING(event_type) AS INTEGER) AS grp_type,
         |  CAST(GROUPING(m) AS INTEGER) AS grp_month,
         |  ${sqlFixedSum("value", 4)} AS value_sum, count(*) AS n_events
         |FROM (SELECT event_type, strftime(ts, '%Y%m') AS m, value FROM events)
         |GROUP BY CUBE (event_type, m)""".stripMargin,

    // pivot ≡ conditional aggregation: one fixed-point sum per type,
    // FILTER leaves absent cells NULL exactly as the pivot does
    "b15_pivot_daily" -> {
      def cell(t: String): String =
        s"CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT))" +
          s" FILTER (WHERE event_type = '$t') AS DOUBLE) / 10000.0 AS $t"
      s"""SELECT user_id, strftime(ts, '%Y%m%d') AS day,
         |  ${Seq("click", "error", "purchase", "signup", "view")
              .map(cell).mkString(",\n|  ")}
         |FROM events GROUP BY 1, 2""".stripMargin
    },

    // the pivot→unpivot round trip minus NULL cells ≡ the direct
    // 3-key aggregate
    "b16_unpivot_daily" ->
      s"""SELECT user_id, strftime(ts, '%Y%m%d') AS day, event_type,
         |${sqlFixedSum("value", 4)} AS value_sum
         |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "b17_wow_delta" ->
      s"""WITH wk AS (
         |  SELECT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         |    ${sqlFixedSum("value", 4)} AS value_sum
         |  FROM events GROUP BY 1, 2),
         |l AS (
         |  SELECT *, lag(value_sum) OVER (PARTITION BY user_id ORDER BY week) AS prev_sum
         |  FROM wk)
         |SELECT user_id, week, value_sum, prev_sum,
         |  ${sqlPround("value_sum - prev_sum", 4)} AS wow_delta,
         |  ${sqlPround("(value_sum - prev_sum) / NULLIF(prev_sum, 0.0)", 4)} AS wow_pct
         |FROM l""".stripMargin,

    "b18_counter_delta" ->
      s"""WITH o AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day, value,
         |    lag(value) OVER (PARTITION BY user_id, strftime(ts, '%Y%m%d')
         |                     ORDER BY ts, event_id) AS prev
         |  FROM events),
         |s AS (
         |  SELECT user_id, day,
         |    CASE WHEN prev IS NULL THEN NULL
         |         WHEN value >= prev THEN value - prev
         |         ELSE value END AS step,
         |    CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END AS r
         |  FROM o)
         |SELECT user_id, day,
         |  coalesce(${sqlFixedSum("step", 4)}, 0.0) AS counter_delta,
         |  CAST(sum(r) AS BIGINT) AS n_resets, count(*) AS n_readings
         |FROM s GROUP BY 1, 2""".stripMargin,

    "b29_counter_rate" ->
      s"""WITH o AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day, value,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
         |    lag(value) OVER (PARTITION BY user_id, strftime(ts, '%Y%m%d')
         |                     ORDER BY ts, event_id) AS prev
         |  FROM events),
         |s AS (
         |  SELECT user_id, day, tu,
         |    CASE WHEN prev IS NULL THEN NULL
         |         WHEN value >= prev THEN value - prev
         |         ELSE value END AS step
         |  FROM o)
         |SELECT user_id, day,
         |  CASE WHEN max(tu) > min(tu) THEN
         |    ${sqlPround(s"(${sqlFixedSum("step", 4)}) * 1000000.0 / CAST(max(tu) - min(tu) AS DOUBLE)", 4)}
         |  ELSE NULL END AS rate_per_sec,
         |  count(*) AS n_readings
         |FROM s GROUP BY 1, 2""".stripMargin,

    "b19_time_weighted" ->
      s"""WITH o AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day, value,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
         |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
         |      PARTITION BY user_id, strftime(ts, '%Y%m%d')
         |      ORDER BY ts, event_id) AS nxt
         |  FROM events),
         |s AS (
         |  SELECT user_id, day, nxt - tu AS dur,
         |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) * (nxt - tu) AS num
         |  FROM o)
         |SELECT user_id, day,
         |  CASE WHEN sum(dur) > 0 THEN
         |    ${sqlPround("CAST(sum(num) AS DOUBLE) / 10000.0 / CAST(sum(dur) AS DOUBLE)", 4)}
         |  ELSE NULL END AS tw_avg,
         |  count(*) AS n_readings
         |FROM s GROUP BY 1, 2""".stripMargin,

    "b20_first_last" ->
      """WITH o AS (
        |  SELECT user_id, strftime(ts, '%Y%m%d') AS day, value,
        |    row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y%m%d')
        |                       ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y%m%d')
        |                       ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events)
        |SELECT user_id, day,
        |  max(CASE WHEN rn = 1 THEN value END) AS first_value,
        |  max(CASE WHEN rd = 1 THEN value END) AS last_value,
        |  count(*) AS n_readings
        |FROM o GROUP BY 1, 2""".stripMargin,

    "b21_moving_avg" ->
      s"""WITH dly AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day,
         |    sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS fs
         |  FROM events GROUP BY 1, 2)
         |SELECT user_id, day,
         |  CAST(fs AS DOUBLE) / 10000.0 AS value_sum,
         |  ${sqlPround(
              "CAST(sum(fs) OVER w7 AS DOUBLE) / 10000.0 / count(*) OVER w7", 4)}
         |    AS mov_avg_7d,
         |  CAST(sum(fs) OVER wr AS DOUBLE) / 10000.0 AS running_total
         |FROM dly
         |WINDOW w7 AS (PARTITION BY user_id ORDER BY day
         |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
         |       wr AS (PARTITION BY user_id ORDER BY day
         |              ROWS UNBOUNDED PRECEDING)""".stripMargin,

    "b38_asap_smooth" -> {
      val ws = Seq(1, 2, 4, 8)
      val sumCols = ws.map { w =>
        s"""sum(fs) OVER (PARTITION BY user_id ORDER BY day
           |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS S$w,
           |    count(*) OVER (PARTITION BY user_id ORDER BY day
           |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS c$w"""
          .stripMargin
      }.mkString(",\n    ")
      val unions = ws.map(w =>
        s"SELECT user_id, day, $w AS w, S$w AS S, c$w AS cnt FROM s")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH dly AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day,
         |    sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS fs
         |  FROM events GROUP BY 1, 2),
         |s AS (
         |  SELECT user_id, day,
         |    $sumCols
         |  FROM dly),
         |st AS (
         |  $unions),
         |f AS (SELECT * FROM st WHERE cnt = w),
         |d AS (
         |  SELECT user_id, day, w,
         |    S - lag(S) OVER (PARTITION BY user_id, w ORDER BY day) AS dS
         |  FROM f),
         |g AS (
         |  SELECT user_id, w, sum(dS * dS) AS ssq, count(*) AS n
         |  FROM d WHERE dS IS NOT NULL GROUP BY 1, 2),
         |win AS (
         |  SELECT g.user_id, g.w FROM g WHERE NOT EXISTS (
         |    SELECT 1 FROM g h WHERE h.user_id = g.user_id AND h.w <> g.w
         |      AND (h.ssq * g.w * g.w * g.n < g.ssq * h.w * h.w * h.n
         |        OR (h.ssq * g.w * g.w * g.n = g.ssq * h.w * h.w * h.n
         |            AND h.w < g.w))))
         |SELECT f.user_id, f.day, CAST(f.w AS BIGINT) AS "window",
         |  ${sqlPround("CAST(f.S AS DOUBLE) / f.w / 10000.0", 4)} AS smoothed
         |FROM f JOIN win ON f.user_id = win.user_id AND f.w = win.w""".stripMargin
    },

    "b37_top_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS gap_start,
        |    ts AS gap_end
        |  FROM events),
        |d AS (
        |  SELECT user_id, gap_start, gap_end,
        |    epoch_us(CAST(gap_end AS TIMESTAMP))
        |      - epoch_us(CAST(gap_start AS TIMESTAMP)) AS gap_us
        |  FROM g WHERE gap_start IS NOT NULL)
        |SELECT user_id, gap_start, gap_end, gap_us,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY gap_us DESC, gap_start) AS rnk
        |FROM d QUALIFY rnk <= 3""".stripMargin,

    "b36_twa_interpolated" -> {
      val w = 6L * 3600 * 1000000L
      // bucket origin 2000-01-03 UTC in µs, matching TimeAgg.timeBucket
      // (r13 fix — this oracle floored from the Unix epoch before);
      // ((x) - ((x % w + w) % w)) // w is the exact floor-div-toward-−inf
      // in DuckDB's C-style % for any sign of x
      val o = 946857600000000L
      def fd(x: String) = s"(($x) - ((($x) % $w + $w) % $w)) // $w"
      s"""WITH o AS (
         |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
         |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
         |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
         |  FROM events),
         |seg AS (SELECT * FROM o WHERE nxt IS NOT NULL AND nxt > tu),
         |x AS (
         |  SELECT user_id, v, tu, nxt, u.b AS b
         |  FROM seg, LATERAL unnest(range(${fd(s"tu - $o")}, ${fd(s"nxt - 1 - $o")} + 1)) AS u(b)),
         |c AS (
         |  SELECT user_id, b,
         |    least(nxt, (b + 1) * $w + $o) - greatest(tu, b * $w + $o) AS dur, v
         |  FROM x)
         |SELECT user_id, make_timestamp(b * $w + $o) AS bucket,
         |  ${sqlPround("CAST(sum(v * dur) AS DOUBLE) / 10000.0 / CAST(sum(dur) AS DOUBLE)", 4)} AS tw_avg,
         |  CAST(sum(dur) AS BIGINT) AS covered_us,
         |  count(*) AS n_segments
         |FROM c GROUP BY 1, 2""".stripMargin
    },

    "b34_ewma" -> {
      // weights 2^(7-j) for lag j; term and weight drop together when
      // the lag is absent — mirrored with per-term CASE on both sides
      val lags = (1 to 7).map(j => s"lag(fs, $j) OVER w AS f$j")
        .mkString(",\n         |    ")
      val num = "CASE WHEN fs IS NOT NULL THEN 128 * fs ELSE 0 END" +
        (1 to 7).map(j =>
          s" + CASE WHEN f$j IS NOT NULL THEN ${1L << (7 - j)} * f$j ELSE 0 END").mkString
      val den = "CASE WHEN fs IS NOT NULL THEN 128 ELSE 0 END" +
        (1 to 7).map(j =>
          s" + CASE WHEN f$j IS NOT NULL THEN ${1L << (7 - j)} ELSE 0 END").mkString
      s"""WITH dly AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day,
         |    sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS fs
         |  FROM events GROUP BY 1, 2),
         |l AS (
         |  SELECT user_id, day, fs,
         |    $lags
         |  FROM dly WINDOW w AS (PARTITION BY user_id ORDER BY day))
         |SELECT user_id, day, CAST(fs AS DOUBLE) / 10000.0 AS value_sum,
         |  ${sqlPround(s"CAST($num AS DOUBLE) / CAST($den AS DOUBLE) / 10000.0", 4)} AS ewma
         |FROM l""".stripMargin
    },

    "b35_autocorr" -> {
      val covN = "(CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))"
      val varA = "(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
      val varB = "(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))"
      s"""WITH dly AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day,
         |    sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS fs
         |  FROM events GROUP BY 1, 2),
         |p AS (
         |  SELECT user_id, fs AS a,
         |    lag(fs, 1) OVER (PARTITION BY user_id ORDER BY day) AS b
         |  FROM dly),
         |g AS (
         |  SELECT user_id, count(*) AS n, sum(a) AS sa, sum(b) AS sb,
         |    sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab
         |  FROM p WHERE b IS NOT NULL GROUP BY 1)
         |SELECT user_id,
         |  ${sqlPround(s"CASE WHEN n >= 2 AND $varA > 0 AND $varB > 0 THEN $covN / sqrt($varA * $varB) END", 6)} AS autocorr_1,
         |  n AS n_pairs
         |FROM g""".stripMargin
    },

    "b22_regression" -> {
      val covN = "(CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))"
      val varT = "(CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))"
      val varV = "(CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))"
      s"""WITH r AS (
         |  SELECT user_id, strftime(ts, '%Y%m%d') AS day,
         |    (epoch_us(CAST(ts AS TIMESTAMP))
         |     - epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))) // 1000000 AS t,
         |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
         |  FROM events),
         |g AS (
         |  SELECT user_id, day, count(*) AS n,
         |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(v) AS BIGINT) AS sv,
         |    CAST(sum(t * v) AS BIGINT) AS stv,
         |    CAST(sum(t * t) AS BIGINT) AS stt,
         |    CAST(sum(v * v) AS BIGINT) AS svv
         |  FROM r GROUP BY 1, 2)
         |SELECT user_id, day,
         |  ${sqlPround(s"CASE WHEN $varT > 0 THEN $covN / $varT / 10000.0 END", 6)} AS slope,
         |  ${sqlPround(s"CASE WHEN $varT > 0 THEN (CAST(sv AS DOUBLE) / 10000.0"
            + s" - ($covN / $varT / 10000.0) * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) END", 4)} AS intercept,
         |  ${sqlPround(s"CASE WHEN $varT > 0 AND $varV > 0 THEN $covN / sqrt($varT * $varV) END", 6)} AS corr,
         |  n AS n_readings
         |FROM g""".stripMargin
    },

    "b8_percentile_summary" ->
      s"""SELECT event_type,
         |  ${sqlPround("quantile_cont(value, 0.5)", 4)} AS p50,
         |  ${sqlPround("quantile_cont(value, 0.95)", 4)} AS p95,
         |  ${sqlPround("quantile_cont(value, 0.99)", 4)} AS p99,
         |  count(*) AS n_events
         |FROM events GROUP BY 1""".stripMargin,

    "b12_percentile_hist" -> {
      def pick(name: String, p: Double): String =
        s"min_by(${sqlPround(s"0.0 + (bin + (ceil(n * $p) - (cum - cnt)) / cnt) * 1.0", 4)}, bin) " +
          s"FILTER (WHERE cum >= ceil(n * $p)) AS $name"
      s"""WITH h AS (
         |  SELECT event_type,
         |    CAST(least(greatest(floor((value - 0.0) / 1.0), 0), 599) AS BIGINT) AS bin,
         |    count(*) AS cnt
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |c AS (
         |  SELECT *, sum(cnt) OVER (PARTITION BY event_type) AS n,
         |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM h)
         |SELECT event_type,
         |  ${pick("p50", 0.5)},
         |  ${pick("p95", 0.95)},
         |  ${pick("p99", 0.99)}
         |FROM c GROUP BY event_type""".stripMargin
    },

    // b41: the same day bins, trailing-7-day merge by a date-diff
    // band join (correctness spelling; the engine side fans out x7
    // in-row instead), then b31's percentile pick per (type, day)
    "b41_rolling_pctl" -> {
      def pick(name: String, p: Double): String =
        s"min_by(${sqlPround(s"0.0 + (bin + (ceil(n * $p) - (cum - cnt)) / cnt) * 1.0", 4)}, bin) " +
          s"FILTER (WHERE cum >= ceil(n * $p)) AS $name"
      s"""WITH bins AS MATERIALIZED (
         |  SELECT event_type, strftime(ts, '%Y%m%d') AS day,
         |    CAST(least(greatest(floor((value - 0.0) / 1.0), 0), 599) AS BIGINT) AS bin,
         |    count(*) AS cnt
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
         |a AS (SELECT DISTINCT event_type, day FROM bins),
         |r AS (
         |  SELECT b.event_type, a.day, b.bin, sum(b.cnt) AS cnt
         |  FROM bins b JOIN a ON a.event_type = b.event_type
         |    AND CAST(strptime(a.day, '%Y%m%d') AS DATE)
         |        - CAST(strptime(b.day, '%Y%m%d') AS DATE) BETWEEN 0 AND 6
         |  GROUP BY 1, 2, 3),
         |c AS (
         |  SELECT *, sum(cnt) OVER (PARTITION BY event_type, day) AS n,
         |    sum(cnt) OVER (PARTITION BY event_type, day ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM r)
         |SELECT event_type, day,
         |  ${pick("p50", 0.5)},
         |  ${pick("p90", 0.9)}
         |FROM c GROUP BY event_type, day""".stripMargin
    },

    "b31_percentile_rollup" -> {
      def pick(name: String, p: Double): String =
        s"min_by(${sqlPround(s"0.0 + (bin + (ceil(n * $p) - (cum - cnt)) / cnt) * 1.0", 4)}, bin) " +
          s"FILTER (WHERE cum >= ceil(n * $p)) AS $name"
      s"""WITH bins AS (
         |  SELECT event_type, strftime(ts, '%Y%m%d') AS day,
         |    CAST(least(greatest(floor((value - 0.0) / 1.0), 0), 599) AS BIGINT) AS bin,
         |    count(*) AS cnt
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
         |m AS (
         |  SELECT event_type, substr(day, 1, 6) AS month, bin, sum(cnt) AS cnt
         |  FROM bins GROUP BY 1, 2, 3),
         |c AS (
         |  SELECT *, sum(cnt) OVER (PARTITION BY event_type, month) AS n,
         |    sum(cnt) OVER (PARTITION BY event_type, month ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM m)
         |SELECT event_type, month,
         |  ${pick("p50", 0.5)},
         |  ${pick("p95", 0.95)},
         |  ${pick("p99", 0.99)}
         |FROM c GROUP BY event_type, month""".stripMargin
    },

    "b33_cdf_rollup" -> {
      def rank(name: String, bx: Long, frac: Double): String = sqlPround(
        s"(CAST(coalesce(sum(cnt) FILTER (WHERE bin < $bx), 0) AS DOUBLE)" +
          s" + $frac * CAST(coalesce(sum(cnt) FILTER (WHERE bin = $bx), 0) AS DOUBLE))" +
          s" / CAST(sum(cnt) AS DOUBLE)", 4) + s" AS $name"
      s"""WITH bins AS (
         |  SELECT event_type, strftime(ts, '%Y%m%d') AS day,
         |    CAST(least(greatest(floor((value - 0.0) / 1.0), 0), 599) AS BIGINT) AS bin,
         |    count(*) AS cnt
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
         |m AS (
         |  SELECT event_type, substr(day, 1, 6) AS month, bin, sum(cnt) AS cnt
         |  FROM bins GROUP BY 1, 2, 3)
         |SELECT event_type, month,
         |  ${rank("r_50_5", 50, 0.5)},
         |  ${rank("r_120_25", 120, 0.25)},
         |  ${rank("r_420", 420, 0.0)}
         |FROM m GROUP BY event_type, month""".stripMargin
    },

    "b30_histogram" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CASE WHEN value < 0.0 THEN 0
        |         WHEN value >= 500.0 THEN 21
        |         ELSE CAST(floor((value - 0.0) / 25.0) AS INT) + 1 END AS bucket
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
        |k AS (SELECT DISTINCT event_type FROM events),
        |s AS (SELECT event_type, CAST(u.b AS INT) AS bucket
        |      FROM k, LATERAL unnest(range(0, 22)) AS u(b))
        |SELECT s.event_type, s.bucket, coalesce(c.n, 0) AS n
        |FROM s LEFT JOIN c ON s.event_type = c.event_type AND s.bucket = c.bucket""".stripMargin,

    "b24_downsample_lttb" ->
      """WITH p AS (
        |  SELECT user_id, ts, value, event_id,
        |    epoch_ms(ts) AS x,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y,
        |    min(epoch_ms(ts)) OVER (PARTITION BY user_id) AS mn,
        |    max(epoch_ms(ts)) OVER (PARTITION BY user_id) AS mx
        |  FROM events),
        |pb AS (SELECT *, (x - mn) * 10 // (mx - mn + 1) AS b FROM p),
        |st AS (
        |  SELECT user_id, b, x, y,
        |    row_number() OVER (PARTITION BY user_id, b
        |      ORDER BY x, event_id) AS rf,
        |    row_number() OVER (PARTITION BY user_id, b
        |      ORDER BY x DESC, event_id DESC) AS rl
        |  FROM pb),
        |bounds AS (
        |  SELECT f.user_id, f.b, f.x AS fx, f.y AS fy, l.x AS lx, l.y AS ly
        |  FROM (SELECT * FROM st WHERE rf = 1) f
        |  JOIN (SELECT * FROM st WHERE rl = 1) l USING (user_id, b)),
        |nb AS (
        |  SELECT user_id, b,
        |    lag(lx) OVER w AS pax, lag(ly) OVER w AS pay,
        |    lead(fx) OVER w AS nxx, lead(fy) OVER w AS nxy
        |  FROM bounds WINDOW w AS (PARTITION BY user_id ORDER BY b)),
        |sc AS (
        |  SELECT pb.user_id, pb.b AS bucket, pb.ts, pb.value, pb.event_id,
        |    CASE WHEN pax IS NULL THEN mx - x
        |         WHEN nxx IS NULL THEN x - mn
        |         ELSE abs((x - pax) * (nxy - pay)
        |                - (nxx - pax) * (y - pay)) END AS score
        |  FROM pb JOIN nb ON pb.user_id = nb.user_id AND pb.b = nb.b)
        |SELECT user_id, bucket, ts, value, event_id FROM sc
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id, bucket
        |  ORDER BY score DESC, ts, event_id) = 1""".stripMargin,

    "b25_gapfill_interp" ->
      s"""WITH r AS (
         |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         |         ${sqlFixedAvg("value", 4)} AS avg_value
         |  FROM events GROUP BY 1, 2),
         |p AS (
         |  SELECT *,
         |    lag(bucket) OVER w AS pb, lag(avg_value) OVER w AS pv
         |  FROM r WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
         |sp AS (
         |  SELECT user_id, bucket, avg_value, pb, pv,
         |    unnest(CASE WHEN pb IS NULL THEN [bucket]
         |      ELSE generate_series(pb + INTERVAL 1 HOUR, bucket, INTERVAL 1 HOUR)
         |      END) AS t
         |  FROM p)
         |SELECT user_id, CAST(t AS VARCHAR) AS bucket,
         |  ${sqlPround(
              "CASE WHEN t = bucket THEN avg_value ELSE pv + (avg_value - pv) * " +
              "(CAST(epoch(t) - epoch(pb) AS DOUBLE) / " +
              "CAST(epoch(bucket) - epoch(pb) AS DOUBLE)) END", 4)} AS avg_value
         |FROM sp""".stripMargin,

    "b23_heavy_hitters" ->
      """WITH e AS (
        |  SELECT u.term AS term FROM documents,
        |    LATERAL unnest(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> len(x) > 0)) AS u(term)),
        |cells AS (
        |  SELECT term, i.i AS cms_row,
        |    CAST(concat('0x', substr(md5(concat(term, '|cms', CAST(i.i AS VARCHAR))), 1, 15))
        |      AS BIGINT) % 1024 AS cms_bucket
        |  FROM e, LATERAL unnest([0, 1, 2, 3]) AS i(i)),
        |cms AS (SELECT cms_row, cms_bucket, count(*) AS cnt
        |        FROM cells GROUP BY 1, 2),
        |q AS (SELECT DISTINCT term FROM e),
        |qc AS (
        |  SELECT term, i.i AS cms_row,
        |    CAST(concat('0x', substr(md5(concat(term, '|cms', CAST(i.i AS VARCHAR))), 1, 15))
        |      AS BIGINT) % 1024 AS cms_bucket
        |  FROM q, LATERAL unnest([0, 1, 2, 3]) AS i(i))
        |SELECT term, min(cnt) AS est_count
        |FROM qc JOIN cms USING (cms_row, cms_bucket)
        |GROUP BY 1 HAVING min(cnt) >= 50""".stripMargin,

    "b26_state_agg" ->
      """WITH x AS (
        |  SELECT user_id, event_type,
        |    COALESCE(lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id), epoch_us(ts)) - epoch_us(ts) AS dur
        |  FROM events)
        |SELECT user_id, event_type, CAST(sum(dur) AS BIGINT) AS held_us,
        |  count(*) AS n_entries
        |FROM x GROUP BY 1, 2""".stripMargin,

    "b27_candlestick" ->
      """WITH x AS (
        |  SELECT user_id, strftime(ts, '%Y%m%d') AS day, value,
        |    row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y%m%d')
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y%m%d')
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT user_id, day,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS n_readings
        |FROM x GROUP BY 1, 2""".stripMargin,

    "b28_uptime" ->
      """WITH x AS (
        |  SELECT user_id,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) - epoch_us(ts) AS delta
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(COALESCE(least(delta, 1800000000), 1800000000)) AS BIGINT)
        |    AS live_us,
        |  CAST(sum(CASE WHEN delta > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dead,
        |  count(*) AS n_heartbeats
        |FROM x GROUP BY 1""".stripMargin,

    "b9b_hll_portable" -> {
      // p=8: m=256 registers over the 60-bit md5 hash (q=52 suffix
      // bits); the harmonic sum is the exact integer Σ 2^(53−rho) with
      // absent registers contributing 2^53, so the one float step each
      // side takes is the final division/ln — identical literals,
      // identical op order (Sketches.hllEstimate mirrored 1:1)
      val numer = (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 *
        math.pow(2.0, 53)
      val rawSql = s"$numer / CAST(s_scaled AS DOUBLE)"
      s"""WITH h AS (SELECT event_type,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM events),
         |r AS (SELECT event_type, h >> 52 AS reg,
         |    CASE WHEN (h & 4503599627370495) = 0 THEN 53
         |         ELSE 53 - length(bin(h & 4503599627370495)) END AS rho
         |  FROM h),
         |regs AS (SELECT event_type, reg, max(rho) AS rho FROM r GROUP BY 1, 2),
         |agg AS (SELECT event_type, count(*) AS n_regs_used,
         |    CAST(sum(1::BIGINT << (53 - rho))
         |         + (256 - count(*)) * (1::BIGINT << 53) AS BIGINT) AS s_scaled
         |  FROM regs GROUP BY 1)
         |SELECT event_type, n_regs_used, s_scaled,
         |  ${sqlPround(
              s"CASE WHEN $rawSql <= 640.0 AND 256 - n_regs_used > 0 " +
              s"THEN 256.0 * ln(256.0 / CAST(256 - n_regs_used AS DOUBLE)) " +
              s"ELSE $rawSql END", 2)} AS est_distinct
         |FROM agg""".stripMargin
    },

    "b32_distinct_rollup" ->
      s"""WITH h AS (SELECT DISTINCT event_type, strftime(ts, '%Y%m%d') AS day,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM events),
         |bk AS (SELECT event_type, day, h,
         |    row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS r
         |  FROM h),
         |m AS (SELECT DISTINCT event_type, substr(day, 1, 6) AS month, h
         |  FROM bk WHERE r <= 256),
         |mk AS (SELECT event_type, month, h,
         |    row_number() OVER (PARTITION BY event_type, month ORDER BY h) AS r
         |  FROM m)
         |SELECT event_type, month, count(*) AS k_used, max(h) AS kth_hash,
         |  ${sqlPround(
              "CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE) " +
              "ELSE 255.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE) END", 2)} AS est_distinct
         |FROM mk WHERE r <= 256 GROUP BY event_type, month""".stripMargin,

    "b42_distinct_setops" -> b42OracleSql,

    "b10_distinct_kmv" ->
      s"""WITH h AS (SELECT DISTINCT
         |    CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM events),
         |b AS (SELECT h FROM h ORDER BY h LIMIT 256)
         |SELECT count(*) AS k_used, max(h) AS kth_hash,
         |  ${sqlPround(
               "CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE) " +
               "ELSE 255.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE) END", 2)} AS est_distinct
         |FROM b""".stripMargin,

    "c1_balance_group_metrics" ->
      s"""SELECT CASE WHEN c_acctbal < 0 THEN 'negative' WHEN c_acctbal < 1000 THEN 'low'
         |            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS balance_group,
         |${sqlFixedAvg("o_totalprice", 4)} AS avg_order_price, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1""".stripMargin,

    "c2_containment_join" ->
      s"""WITH f AS (
         |  SELECT event_type, strftime(ts, '%Y%m%d') AS day, ${sqlFixedSum("value", 4)} AS tvs
         |  FROM events GROUP BY 1, 2),
         |d AS (
         |  SELECT user_id, list_sort(list(DISTINCT event_type)) AS devices
         |  FROM events GROUP BY 1)
         |SELECT d.user_id, f.day, ${sqlFixedSum("f.tvs", 4)} AS step_count,
         |       count(*) AS n_device_days
         |FROM f JOIN d ON list_contains(d.devices, f.event_type)
         |GROUP BY 1, 2""".stripMargin,

    "c3_latest_day_filter" ->
      s"""WITH s AS (SELECT user_id, value, strftime(ts, '%Y%m%d') AS day FROM events)
         |SELECT user_id, day, ${sqlFixedSum("value", 4)} AS value_sum FROM s
         |WHERE day = (SELECT max(day) FROM s) GROUP BY 1, 2""".stripMargin,

    "c4_incremental_newer_than" ->
      """SELECT event_id, user_id, ts, value FROM events
        |WHERE ts > (SELECT max(ts) FROM events WHERE strftime(ts, '%Y%m%d') <= '20240115')""".stripMargin,

    "c5_dedup_upsert_latest" ->
      """SELECT user_id, event_id AS last_event_id, ts AS last_ts, event_type AS last_type
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "c8_snapshot_diff" ->
      """WITH b AS (
        |  SELECT user_id, event_type FROM (
        |    SELECT user_id, event_type, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events WHERE ts < TIMESTAMP '2024-01-08') WHERE rk = 1),
        |a AS (
        |  SELECT user_id, event_type FROM (
        |    SELECT user_id, event_type, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1)
        |SELECT coalesce(a.user_id, b.user_id) AS user_id,
        |  CASE WHEN b.user_id IS NULL THEN 'added'
        |       WHEN a.user_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change,
        |  b.event_type AS old_event_type, a.event_type AS new_event_type
        |FROM b FULL OUTER JOIN a ON b.user_id = a.user_id
        |WHERE b.user_id IS NULL OR a.user_id IS NULL
        |   OR b.event_type IS DISTINCT FROM a.event_type""".stripMargin,

    "c9_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, s1.t1, min(e.ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 3600 SECOND GROUP BY 1, 2),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |    AND e.ts <= s2.t1 + INTERVAL 3600 SECOND GROUP BY 1)
        |SELECT CAST(1 AS INT) AS step, 'view' AS step_name,
        |       (SELECT count(*) FROM s1) AS n_entities
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin,

    "c16_funnel_times" -> {
      // seconds via exact BIGINT µs diff then ONE division — epoch()
      // returns ~1.7e9-scale DOUBLE seconds whose sub-µs rounding can
      // nudge an exactly-half-way value across pround's .00005 boundary
      // (found by the r13 c16_window fuzz family); the engine computes
      // (unix_micros - unix_micros) / 1e6, and now so does the oracle
      def agg(src: String, t: String, anchor: String) = {
        val secs = s"CAST(epoch_us($t) - epoch_us($anchor) AS DOUBLE) / 1000000.0"
        s"""SELECT count(*) AS n_entities,
           |  ${sqlPround(s"quantile_cont($secs, 0.5)", 4)} AS median_s,
           |  ${sqlPround(s"quantile_cont($secs, 0.9)", 4)} AS p90_s
           |FROM $src""".stripMargin
      }
      s"""WITH s1 AS (
         |  SELECT user_id, min(ts) AS t1 FROM events
         |  WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (
         |  SELECT e.user_id, s1.t1, min(e.ts) AS t2
         |  FROM events e JOIN s1 USING (user_id)
         |  WHERE e.event_type = 'click' AND e.ts >= s1.t1
         |    AND e.ts <= s1.t1 + INTERVAL 3600 SECOND GROUP BY 1, 2),
         |s3 AS (
         |  SELECT e.user_id, s2.t1, min(e.ts) AS t3
         |  FROM events e JOIN s2 USING (user_id)
         |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
         |    AND e.ts <= s2.t1 + INTERVAL 3600 SECOND GROUP BY 1, 2)
         |SELECT CAST(1 AS INT) AS step, 'view' AS step_name, a.*
         |FROM (${agg("s1", "t1", "t1")}) a
         |UNION ALL SELECT 2, 'click', a.* FROM (${agg("s2", "t2", "t1")}) a
         |UNION ALL SELECT 3, 'purchase', a.* FROM (${agg("s3", "t3", "t1")}) a""".stripMargin
    },

    "c10_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT c.cohort_day,
        |  CAST(date_diff('day', c.cohort_day, a.day) AS INT) AS day_offset,
        |  count(*) AS n_entities
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "c11_transitions" ->
      """WITH p AS (
        |  SELECT user_id, event_type AS curr_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, curr_type, count(*) AS n_transitions,
        |  count(DISTINCT user_id) AS n_entities
        |FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "c12_attribution" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_type,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |        THEN epoch(ts) END IGNORE NULLS) OVER w AS tt,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |        THEN event_type END IGNORE NULLS) OVER w AS tty
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS UNBOUNDED PRECEDING))
        |SELECT CASE WHEN tt IS NOT NULL AND epoch(ts) - tt <= 604800.0
        |         THEN tty ELSE '(unattributed)' END AS touch_type,
        |  count(*) AS n_conversions,
        |  count(DISTINCT user_id) AS n_converters
        |FROM t WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    "c22_multi_touch" -> c22OracleSql,

    "c23_markov_attribution" -> c23OracleSql,

    "c15_cohort_value" ->
      """WITH dly AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS fv
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM dly GROUP BY 1),
        |cells AS (
        |  SELECT c.cohort_day,
        |    CAST(date_diff('day', c.cohort_day, dly.day) AS INT) AS day_offset,
        |    count(DISTINCT dly.user_id) AS n_entities,
        |    CAST(sum(fv) AS BIGINT) AS rev
        |  FROM dly JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, n_entities,
        |  CAST(rev AS DOUBLE) / 10000.0 AS revenue,
        |  CAST(sum(rev) OVER (PARTITION BY cohort_day ORDER BY day_offset
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 10000.0 AS cum_revenue
        |FROM cells""".stripMargin,

    "c17_growth" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |t AS (SELECT user_id, day,
        |        lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
        |        lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next
        |      FROM a),
        |mx AS (SELECT max(day) AS mx FROM a),
        |contrib AS (
        |  SELECT day,
        |    CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS n_new,
        |    CASE WHEN prev = day - 1 THEN 1 ELSE 0 END AS n_retained,
        |    CASE WHEN prev IS NOT NULL AND prev < day - 1 THEN 1 ELSE 0 END AS n_resurrected,
        |    0 AS n_churned
        |  FROM t
        |  UNION ALL
        |  SELECT day + 1, 0, 0, 0,
        |    CASE WHEN next IS NULL OR next > day + 1 THEN 1 ELSE 0 END
        |  FROM t)
        |SELECT day, CAST(sum(n_new) AS BIGINT) AS n_new,
        |  CAST(sum(n_retained) AS BIGINT) AS n_retained,
        |  CAST(sum(n_resurrected) AS BIGINT) AS n_resurrected,
        |  CAST(sum(n_churned) AS BIGINT) AS n_churned
        |FROM contrib, mx WHERE day <= mx.mx
        |GROUP BY day
        |HAVING sum(n_new) + sum(n_retained) + sum(n_resurrected)
        |  + sum(n_churned) > 0""".stripMargin,

    "c18_streaks" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |i AS (SELECT user_id, day,
        |        CAST(day - DATE '1970-01-01' AS BIGINT)
        |          - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM a),
        |s AS (SELECT user_id, grp, count(*) AS streak_days,
        |        min(day) AS streak_start, max(day) AS streak_end
        |      FROM i GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY streak_days DESC, streak_start ASC) AS rn FROM s)
        |SELECT user_id, CAST(streak_days AS BIGINT) AS streak_days,
        |  streak_start, streak_end
        |FROM r WHERE rn = 1""".stripMargin,

    "c19_rfm" ->
      """WITH r AS (
        |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS fv
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(last_day) AS mx FROM r),
        |b AS (SELECT user_id,
        |        CAST(date_diff('day', last_day, mx.mx) AS INT) AS recency_days,
        |        frequency, fv
        |      FROM r, mx),
        |sc AS (SELECT user_id, recency_days, frequency, fv,
        |        CAST(ntile(4) OVER (ORDER BY recency_days DESC, user_id ASC) AS BIGINT) AS r_score,
        |        CAST(ntile(4) OVER (ORDER BY frequency ASC, user_id ASC) AS BIGINT) AS f_score,
        |        CAST(ntile(4) OVER (ORDER BY fv ASC, user_id ASC) AS BIGINT) AS m_score
        |      FROM b)
        |SELECT user_id, recency_days, frequency,
        |  CAST(fv AS DOUBLE) / 10000.0 AS monetary,
        |  r_score, f_score, m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |    || CAST(m_score AS VARCHAR) AS segment
        |FROM sc""".stripMargin,

    "dq7_anomalies" ->
      """WITH dly AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, day, cnt,
        |        count(cnt) OVER w AS n,
        |        sum(CAST(cnt AS HUGEINT)) OVER w AS ss,
        |        sum(CAST(cnt AS HUGEINT) * cnt) OVER w AS q
        |      FROM dly
        |      WINDOW w AS (PARTITION BY event_type ORDER BY day
        |        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(n AS BIGINT) AS n_prior,
        |  coalesce(n >= 3
        |    AND (CAST(n AS HUGEINT) * cnt - ss) * (CAST(n AS HUGEINT) * cnt - ss)
        |      > 9 * (CAST(n AS HUGEINT) * q - ss * ss), FALSE) AS is_anomaly
        |FROM s""".stripMargin,

    // dq9: the same all-integer discipline — the max-reset CUSUM
    // recurrence as N-scaled prefix sums + running mins (HUGEINT),
    // mirroring DataQuality.cusumFromDaily operand for operand
    "dq9_cusum" ->
      """WITH dly AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, day, cnt,
        |        CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) AS nd,
        |        sum(CAST(cnt AS HUGEINT)) OVER (PARTITION BY event_type) AS tt
        |      FROM dly),
        |c AS (SELECT event_type, day, cnt, nd,
        |        sum(nd * cnt - tt) OVER w AS cu,
        |        sum(tt - nd * cnt) OVER w AS cv
        |      FROM t
        |      WINDOW w AS (PARTITION BY event_type ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT *, least(CAST(0 AS HUGEINT), min(cu) OVER w) AS mu,
        |        least(CAST(0 AS HUGEINT), min(cv) OVER w) AS mv
        |      FROM c
        |      WINDOW w AS (PARTITION BY event_type ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
        |  cu - mu > nd * 30 AS alarm_up,
        |  cv - mv > nd * 30 AS alarm_dn
        |FROM m""".stripMargin,

    // dq10/dq11: plain grouped counts — the IEEE divide-then-floor is
    // the same operation in both engines, banded BEFORE grouping
    "dq10_k_anonymity" ->
      """SELECT c_nationkey,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS acct_band,
        |  count(*) AS n
        |FROM customer GROUP BY 1, 2 HAVING count(*) < 5""".stripMargin,

    "dq11_l_diversity" ->
      """SELECT c_nationkey,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS acct_band,
        |  count(DISTINCT c_mktsegment) AS n_distinct
        |FROM customer GROUP BY 1, 2
        |HAVING count(DISTINCT c_mktsegment) < 3""".stripMargin,

    // dq17: the same exact-integer TV algebra — HUGEINT products, the
    // absent-value tail folded closed, ONE rounded double division.
    // NULL-sensitive rows excluded everywhere (class counts, global
    // counts, total) — the engine's documented drop contract
    "dq17_t_closeness" ->
      s"""WITH cv AS (
         |  SELECT c_nationkey,
         |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS acct_band,
         |    c_mktsegment AS v, count(*) AS ncv
         |  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2, 3),
         |gv AS (SELECT c_mktsegment AS v, count(*) AS nv
         |       FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1),
         |tt AS (SELECT count(*) AS n FROM customer
         |       WHERE c_mktsegment IS NOT NULL),
         |e AS (
         |  SELECT cv.*, gv.nv, tt.n,
         |    sum(ncv) OVER (PARTITION BY c_nationkey, acct_band) AS nc,
         |    sum(nv) OVER (PARTITION BY c_nationkey, acct_band) AS sv
         |  FROM cv JOIN gv USING (v), tt),
         |a AS (
         |  SELECT c_nationkey, acct_band,
         |    max(nc) AS n_c, max(sv) AS svv, max(n) AS nn,
         |    sum(abs(CAST(ncv AS HUGEINT) * n - CAST(nv AS HUGEINT) * nc))
         |      AS nump
         |  FROM e GROUP BY 1, 2),
         |r AS (
         |  SELECT c_nationkey, acct_band, CAST(n_c AS BIGINT) AS n_c,
         |    ${sqlPround(
             "CAST(nump + CAST(n_c AS HUGEINT) * (nn - svv) AS DOUBLE) / (2.0 * CAST(n_c AS DOUBLE) * CAST(nn AS DOUBLE))",
             6)} AS tv
         |  FROM a)
         |SELECT * FROM r WHERE tv > 0.3""".stripMargin,

    // dq12: the leading digit via BIGINT→VARCHAR (no scientific
    // notation, unlike DOUBLE→VARCHAR), ppm arithmetic all-integer off
    // the SAME literal Benford constants as the Spark side — engine
    // log10 never runs
    "dq12_benford" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    CAST(substr(CAST(CAST(floor(abs(l_extendedprice)) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem WHERE abs(l_extendedprice) >= 1),
        |c AS (SELECT l_returnflag, digit, count(*) AS n FROM v GROUP BY 1, 2),
        |ks AS (SELECT DISTINCT l_returnflag FROM c),
        |sp AS (SELECT l_returnflag, CAST(d AS INT) AS digit
        |       FROM ks, (SELECT unnest(range(1, 10)) AS d) dd),
        |f AS (SELECT sp.l_returnflag, sp.digit, COALESCE(c.n, 0) AS n
        |      FROM sp LEFT JOIN c
        |        ON c.l_returnflag = sp.l_returnflag AND c.digit = sp.digit),
        |t AS (SELECT *, sum(n) OVER (PARTITION BY l_returnflag) AS total FROM f),
        |e AS (SELECT l_returnflag, digit, n,
        |        (n * 1000000) // total AS obs_ppm,
        |        CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |          WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |          WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |          ELSE 45757 END AS benford_ppm
        |      FROM t)
        |SELECT l_returnflag, digit, CAST(n AS BIGINT) AS n,
        |  CAST(obs_ppm AS BIGINT) AS obs_ppm,
        |  CAST(benford_ppm AS BIGINT) AS benford_ppm,
        |  CAST(sum(abs(obs_ppm - benford_ppm))
        |    OVER (PARTITION BY l_returnflag) // 2 AS BIGINT) AS tv_ppm
        |FROM e""".stripMargin,

    // dq13: grouped count(distinct) with the dbt null convention
    "dq13_fd_check" ->
      """SELECT l_partkey, count(DISTINCT l_returnflag) AS n_dep,
        |  count(*) AS n_rows, min(l_returnflag) AS dep_min,
        |  max(l_returnflag) AS dep_max
        |FROM lineitem WHERE l_returnflag IS NOT NULL
        |GROUP BY 1 HAVING count(DISTINCT l_returnflag) > 1""".stripMargin,

    // dq14: HUGEINT cross products mirror the decimal(38) Spark
    // arithmetic; top-20 ties break by key on both sides
    "dq14_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |s AS (SELECT CAST(sum(cnt) AS HUGEINT) AS total, count(*) AS n_keys,
        |       sum(CAST(cnt AS HUGEINT) * cnt) AS ss FROM c),
        |t AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 20)
        |SELECT t.user_id, t.cnt,
        |  CAST((CAST(t.cnt AS HUGEINT) * 1000000) // s.total AS BIGINT)
        |    AS share_ppm,
        |  s.n_keys AS n_keys, CAST(s.total AS BIGINT) AS total_rows,
        |  CAST((s.ss * 1000000) // (s.total * s.total) AS BIGINT) AS hhi_ppm
        |FROM t, s""".stripMargin,

    // dq15: same per-user → per-arm integer rollup; each statistic is
    // exact integer algebra until one mirrored double expression
    "dq15_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cv,
        |    sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS sv
        |  FROM events GROUP BY 1),
        |pa AS (
        |  SELECT *, CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 32, 1)
        |    IN ('0','2','4','6','8','a','c','e') THEN 'A' ELSE 'B' END AS arm
        |  FROM pu),
        |one AS (
        |  SELECT
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN arm = 'A' THEN cv ELSE 0 END) AS xa,
        |    sum(CASE WHEN arm = 'B' THEN cv ELSE 0 END) AS xb,
        |    sum(CASE WHEN arm = 'A' THEN sv ELSE 0 END) AS sa,
        |    sum(CASE WHEN arm = 'B' THEN sv ELSE 0 END) AS sb,
        |    sum(CASE WHEN arm = 'A' THEN CAST(sv AS HUGEINT) * sv ELSE 0 END) AS qa,
        |    sum(CASE WHEN arm = 'B' THEN CAST(sv AS HUGEINT) * sv ELSE 0 END) AS qb
        |  FROM pa),
        |m AS (
        |  SELECT *,
        |    CAST(sa AS DOUBLE) / 100.0 / CAST(na AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / 100.0 / CAST(nb AS DOUBLE) AS mb,
        |    (CAST(qa AS DOUBLE) / 100.0 / 100.0
        |      - (CAST(sa AS DOUBLE) / 100.0) * (CAST(sa AS DOUBLE) / 100.0)
        |        / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) AS va,
        |    (CAST(qb AS DOUBLE) / 100.0 / 100.0
        |      - (CAST(sb AS DOUBLE) / 100.0) * (CAST(sb AS DOUBLE) / 100.0)
        |        / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) AS vb,
        |    (na + nb) * (xa * (nb - xb) - xb * (na - xa))
        |      * (xa * (nb - xb) - xb * (na - xa)) AS chinum,
        |    na * nb * (xa + xb) * (na + nb - xa - xb) AS chiden
        |  FROM one),
        |m2 AS (
        |  SELECT *, va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE) AS se2
        |  FROM m)
        |SELECT 'conversion' AS metric,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(xa AS BIGINT) AS x_a, CAST(xb AS BIGINT) AS x_b,
        |  CASE WHEN na > 0 THEN floor(CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 END AS mean_a,
        |  CASE WHEN nb > 0 THEN floor(CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 END AS mean_b,
        |  CASE WHEN chiden <> 0 THEN
        |    floor(CAST(chinum AS DOUBLE) / CAST(chiden AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS stat
        |FROM m2
        |UNION ALL
        |SELECT 'value_per_user',
        |  CAST(na AS BIGINT), CAST(nb AS BIGINT),
        |  CAST(sa AS BIGINT), CAST(sb AS BIGINT),
        |  CASE WHEN na > 0 THEN floor(ma * 1000000.0 + 0.5) / 1000000.0 END,
        |  CASE WHEN nb > 0 THEN floor(mb * 1000000.0 + 0.5) / 1000000.0 END,
        |  CASE WHEN na > 1 AND nb > 1 AND se2 > 0.0 THEN
        |    floor((ma - mb) * (ma - mb) / se2 * 1000000.0 + 0.5) / 1000000.0
        |  END
        |FROM m2""".stripMargin,

    // dq16: dq2's exact z² test with the (event_type, hour-of-day)
    // stratum key projected in — flag bit-identical cross-engine
    "dq16_seasonal_outliers" ->
      """WITH v AS (
        |  SELECT event_type, CAST(hour(ts) AS INT) AS hod, event_id, value,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vf
        |  FROM events),
        |st AS (
        |  SELECT event_type, hod, count(*) AS n,
        |    sum(CAST(vf AS HUGEINT)) AS s,
        |    sum(CAST(vf AS HUGEINT) * CAST(vf AS HUGEINT)) AS q
        |  FROM v GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT v.event_type, v.hod, v.event_id, v.value
        |FROM v JOIN st USING (event_type, hod)
        |WHERE (CAST(vf AS HUGEINT) * n - s) * (CAST(vf AS HUGEINT) * n - s)
        |      > 9 * (n * q - s * s)""".stripMargin,

    // c20: arg_max over a HUGEINT (µs·10^10 + event_id) encode of the
    // (ts, tie) struct order — DuckDB's arg_max skips NULL ordering
    // rows, exactly the survivorship rule; the sparse-update fixture
    // (value nulled on odd ids, event_type on even) is built in-query
    // on BOTH sides
    "c20_golden_record" ->
      """WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us, event_id,
        |    CASE WHEN event_id % 2 = 1 THEN NULL ELSE value END AS value,
        |    CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_type END
        |      AS event_type,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
        |  FROM events)
        |SELECT user_id,
        |  arg_max(value, CASE WHEN value IS NOT NULL
        |    THEN CAST(us AS HUGEINT) * 10000000000 + event_id END) AS value,
        |  arg_max(event_type, CASE WHEN event_type IS NOT NULL
        |    THEN CAST(us AS HUGEINT) * 10000000000 + event_id END) AS event_type,
        |  arg_max(prop_k, CASE WHEN prop_k IS NOT NULL
        |    THEN CAST(us AS HUGEINT) * 10000000000 + event_id END) AS prop_k,
        |  max(ts) AS last_seen, count(*) AS n_rows
        |FROM e GROUP BY 1""".stripMargin,

    // l7: neighbor sets from the bidirectional closure of the canonical
    // co-purchase edges; candidate pairs pivot on the shared neighbor
    // (bucket size = its degree, capped like e2's stop shingles),
    // sizes from the full distinct neighbor sets
    "l7_neighbor_jaccard" -> {
      val jac = sqlPround(
        "CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared)", 4)
      s"""WITH s AS MATERIALIZED (${copurchaseOracleSql(2)}),
         |ed AS (SELECT item_a AS x, item_b AS y FROM s
         |       UNION SELECT item_b, item_a FROM s),
         |sz AS (SELECT x, count(*) AS n FROM ed GROUP BY 1),
         |keep AS (SELECT y FROM ed GROUP BY y HAVING count(*) <= 200),
         |shared AS (
         |  SELECT a.x AS node_a, b.x AS node_b, count(*) AS n_shared
         |  FROM ed a JOIN ed b ON a.y = b.y AND a.x < b.x
         |  JOIN keep k ON k.y = a.y
         |  GROUP BY 1, 2)
         |SELECT node_a, node_b, $jac AS jaccard
         |FROM shared JOIN sz sa ON sa.x = node_a
         |  JOIN sz sb ON sb.x = node_b
         |WHERE $jac >= 0.25""".stripMargin
    },

    // l8: 6 BFS rounds unrolled (the h18/l6 discipline) — each round's
    // settled set is the min-depth union of the previous set and the
    // one-hop expansion of its frontier; BFS is monotone, so rounds
    // past reachability are no-ops
    "l8_bfs_depth" -> {
      val rounds = (1 to 6).map { r =>
        s"""v$r AS MATERIALIZED (SELECT node, min(depth) AS depth FROM (
           |    SELECT node, depth FROM v${r - 1}
           |    UNION ALL
           |    SELECT e.dst, ${r} FROM e JOIN v${r - 1} p
           |      ON p.node = e.src AND p.depth = ${r - 1})
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH s0 AS MATERIALIZED (${copurchaseOracleSql(2)}),
         |e AS MATERIALIZED (SELECT item_a AS src, item_b AS dst FROM s0
         |     UNION SELECT item_b, item_a FROM s0),
         |sd AS (SELECT p_partkey AS node FROM part WHERE p_partkey % 50 = 0),
         |v0 AS MATERIALIZED (
         |  SELECT DISTINCT n.node, 0 AS depth
         |  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) n
         |  JOIN sd ON sd.node = n.node),
         |$rounds
         |SELECT node, CAST(depth AS BIGINT) AS depth FROM v6""".stripMargin
    },

    // l9: the same retained-basket set feeds BOTH the pair counts and
    // the degrees (mirroring the operator's internal consistency);
    // keep = HUGEINT cross-multiplication, cosine = one IEEE
    // sqrt/divide over exact integers
    "l9_item_cosine" -> {
      val cos = sqlPround(
        "CAST(support AS DOUBLE) / sqrt(CAST(da.nb AS DOUBLE) * CAST(db.nb AS DOUBLE))", 4)
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
         |bs AS (SELECT bk FROM e GROUP BY bk
         |       HAVING count(*) BETWEEN 2 AND 1000),
         |eb AS MATERIALIZED (SELECT e.* FROM e JOIN bs USING (bk)),
         |deg AS (SELECT it, count(*) AS nb FROM eb GROUP BY 1),
         |sup AS (SELECT a.it AS item_a, b.it AS item_b, count(*) AS support
         |        FROM eb a JOIN eb b ON a.bk = b.bk AND a.it < b.it
         |        GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT item_a, item_b, support, $cos AS cosine
         |FROM sup JOIN deg da ON da.it = item_a
         |  JOIN deg db ON db.it = item_b
         |WHERE CAST(support AS HUGEINT) * support * 100
         |  >= CAST(da.nb AS HUGEINT) * db.nb""".stripMargin
    },

    // l10: the HITS rounds unrolled — each half-round is the edge join
    // + grouped sum + the exact HUGEINT sum-renormalization, term for
    // term the Spark integer arithmetic
    "l10_hits" -> {
      // every round CTE is MATERIALIZED: inlined, each reference
      // re-evaluates its whole upstream chain — exponential over 8
      // half-rounds
      def norm(pre: String, c: String) =
        s"""MATERIALIZED (SELECT node, CAST(CAST($c AS HUGEINT) * 1000000
           |    // (SELECT SUM(CAST($c AS HUGEINT)) FROM $pre)
           |    AS BIGINT) AS $c FROM $pre)""".stripMargin
      val rounds = (1 to 4).map { k =>
        s"""a${k}r AS MATERIALIZED (SELECT n.node, COALESCE(m.mass, 0) AS auth
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS node, SUM(h.hub) AS mass
           |    FROM e JOIN h${k - 1} h ON h.node = e.src
           |    GROUP BY 1) m ON m.node = n.node),
           |a$k AS ${norm(s"a${k}r", "auth")},
           |h${k}r AS MATERIALIZED (SELECT n.node, COALESCE(m.mass, 0) AS hub
           |  FROM n LEFT JOIN (
           |    SELECT e.src AS node, SUM(a.auth) AS mass
           |    FROM e JOIN a$k a ON a.node = e.dst
           |    GROUP BY 1) m ON m.node = n.node),
           |h$k AS ${norm(s"h${k}r", "hub")}""".stripMargin
      }.mkString(",\n")
      s"""WITH p0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s1
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS MATERIALIZED (SELECT c * 2 AS src, s1 * 2 + 1 AS dst FROM p0),
         |n AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub FROM n),
         |$rounds
         |SELECT h4.node, h4.hub, a4.auth
         |FROM h4 JOIN a4 ON a4.node = h4.node""".stripMargin
    },

    // j14: winning change per key by row_number, then the outer-join
    // merge with tombstone filtering — the MERGE INTO semantics
    "j14_apply_cdc" ->
      """WITH w AS (
        |  SELECT user_id AS ck, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value AS bal, event_type AS seg,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn
        |  FROM events),
        |l AS (SELECT * FROM w WHERE rn = 1),
        |m AS (
        |  SELECT COALESCE(l.ck, c.c_custkey) AS c_custkey, l.op,
        |    CASE WHEN l.ck IS NOT NULL THEN l.bal
        |         ELSE c.c_acctbal END AS c_acctbal,
        |    CASE WHEN l.ck IS NOT NULL THEN l.seg
        |         ELSE c.c_mktsegment END AS c_mktsegment
        |  FROM customer c FULL OUTER JOIN l ON l.ck = c.c_custkey)
        |SELECT c_custkey, c_acctbal, c_mktsegment FROM m
        |WHERE op IS NULL OR op <> 'D'""".stripMargin,

    // c21: the same gaps-and-islands windows in DuckDB — running
    // max(end) over preceding rows flags island starts, a running sum
    // numbers them, per-island min/max rolls up; pure integer µs
    "c21_interval_union" ->
      """WITH iv AS (SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      + ((event_id * 7919) % 500000) * 1000000 AS e FROM events),
        |w AS (SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |f AS (SELECT k, s, e,
        |    CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS ni
        |  FROM w),
        |g AS (SELECT k, s, e, sum(ni) OVER (PARTITION BY k ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |pi AS (SELECT k, island, min(s) AS is_s, max(e) AS is_e,
        |    count(*) AS n FROM g GROUP BY 1, 2)
        |SELECT k AS user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
        |  count(*) AS n_islands,
        |  CAST(sum(is_e - is_s) AS BIGINT) AS covered,
        |  CAST(max(is_e - is_s) AS BIGINT) AS max_island
        |FROM pi GROUP BY 1""".stripMargin,

    // e12: e2's oracle skeleton with the in-query prefix fixture
    // (first 15 tokens of every 20th doc as a new doc) and the
    // two-sided containment formulas in place of Jaccard
    "e12_dedup_containment" -> {
      val ca = sqlPround("CAST(n_shared AS DOUBLE) / sa.n_sh", 4)
      val cb = sqlPround("CAST(n_shared AS DOUBLE) / sb.n_sh", 4)
      s"""WITH tp AS (${tokCte("documents", lower = false)}),
         |t0 AS (SELECT doc_id, text FROM documents
         |       UNION ALL
         |       SELECT doc_id + 1000000, array_to_string(tok[1:15], ' ')
         |       FROM tp WHERE doc_id % 20 = 0),
         |t AS (${tokCte("t0", lower = true)}),
         |s AS (SELECT doc_id, $shingle3 AS shs FROM t),
         |e AS (SELECT DISTINCT doc_id AS doc, unnest(shs) AS sh FROM s),
         |sized AS (SELECT doc, count(*) AS n_sh FROM e GROUP BY 1),
         |keep AS (SELECT sh FROM e GROUP BY sh HAVING count(*) <= 100),
         |ek AS (SELECT e.* FROM e JOIN keep USING (sh)),
         |shared AS (
         |  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_shared
         |  FROM ek a JOIN ek b ON a.sh = b.sh AND a.doc < b.doc GROUP BY 1, 2)
         |SELECT doc_a, doc_b, $ca AS containment_a, $cb AS containment_b
         |FROM shared JOIN sized sa ON sa.doc = doc_a
         |  JOIN sized sb ON sb.doc = doc_b
         |WHERE $ca >= 0.5 OR $cb >= 0.5""".stripMargin
    },

    // l6: 12 peeling rounds unrolled (the h18 discipline) — peeling is
    // monotone, so rounds past the fixpoint are no-ops and the unroll
    // only needs to be ≥ the convergence count (measured 1/4/6 at the
    // three SFs)
    "l6_kcore" -> {
      // AS MATERIALIZED: each round references the previous ~3x; an
      // inlining planner would otherwise expand 3^12 scan subtrees
      val rounds = (1 to 12).map { r =>
        s"""d$r AS MATERIALIZED (SELECT n, count(*) AS deg FROM (
           |    SELECT lo AS n FROM e${r - 1} UNION ALL SELECT hi FROM e${r - 1})
           |  GROUP BY 1),
           |k$r AS MATERIALIZED (SELECT n FROM d$r WHERE deg >= 2),
           |e$r AS MATERIALIZED (SELECT e.lo, e.hi FROM e${r - 1} e
           |  JOIN k$r a ON a.n = e.lo JOIN k$r b ON b.n = e.hi)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (SELECT item_a AS lo, item_b AS hi
         |  FROM (${copurchaseOracleSql(2)})),
         |$rounds
         |SELECT n AS node, count(*) AS core_deg FROM (
         |  SELECT lo AS n FROM e12 UNION ALL SELECT hi FROM e12)
         |GROUP BY 1""".stripMargin
    },

    // l13: the oracle verifies the OUTPUT CONTRACT, not the algorithm —
    // scc_id(v) = min{u : u →* v AND v →* u} is a pure function of the
    // graph, so the oracle computes bounded-doubling transitive closure
    // (8 squaring rounds = 256-hop reach; measured fixpoint at 5/6/7
    // rounds across the three SFs, extras are no-ops) and takes the
    // min over mutual pairs. The closure is O(core²) pairs — fine for
    // the oracle at the gate SF, and exactly the blow-up the ENGINE's
    // FB-coloring avoids (node/edge-keyed labels only)
    "l13_scc" -> l13OracleSql,

    // l14: the l13 closure oracle extended — scc map, condensed
    // distinct cross-component edges, then 30 unrolled monotone
    // longest-path relaxation rounds (measured DAG depth 7/11/25 at
    // the three SFs; extras are no-ops, the h18/l8 discipline). BOTH
    // fixpoints carry the r14-advice canary: a closure still growing
    // at round 8 or a level sum still moving at round 30 error()s
    // loudly AS an oracle problem instead of masquerading as an
    // engine mismatch.
    "l14_condense" -> {
      val sqRounds = (1 to 8).map { r =>
        s"""r$r AS MATERIALIZED (SELECT DISTINCT x.a, y.b
           |  FROM r${r - 1} x JOIN r${r - 1} y ON x.b = y.a)""".stripMargin
      }.mkString(",\n")
      val relaxRounds = (1 to 30).map { k =>
        s"""d$k AS MATERIALIZED (
           |  SELECT c.cnode, GREATEST(c.level, COALESCE(m.d, c.level)) AS level
           |  FROM d${k - 1} c LEFT JOIN (
           |    SELECT ce.dst AS cnode, MAX(p.level) + 1 AS d
           |    FROM ce JOIN d${k - 1} p ON p.cnode = ce.src GROUP BY 1) m
           |  USING (cnode))""".stripMargin
      }.mkString(",\n")
      s"""WITH f AS (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey
         |  FROM lineitem WHERE l_partkey % 7 = 0 AND l_quantity <= 20),
         |sq AS (SELECT l_orderkey, l_partkey,
         |    lead(l_partkey) OVER (PARTITION BY l_orderkey
         |      ORDER BY l_linenumber, l_partkey) AS nxt FROM f),
         |e AS (SELECT DISTINCT l_partkey AS src, nxt AS dst FROM sq
         |      WHERE nxt IS NOT NULL AND nxt <> l_partkey),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |r0 AS MATERIALIZED (SELECT node AS a, node AS b FROM n
         |      UNION SELECT src, dst FROM e),
         |$sqRounds,
         |sccm AS MATERIALIZED (SELECT fwd.b AS node, MIN(fwd.a) AS scc_id
         |  FROM r8 fwd JOIN r8 bwd ON fwd.a = bwd.b AND fwd.b = bwd.a
         |  GROUP BY 1),
         |ce AS MATERIALIZED (SELECT DISTINCT sa.scc_id AS src,
         |    sb.scc_id AS dst
         |  FROM e JOIN sccm sa ON e.src = sa.node
         |    JOIN sccm sb ON e.dst = sb.node
         |  WHERE sa.scc_id <> sb.scc_id),
         |cn AS (SELECT DISTINCT scc_id AS cnode FROM sccm),
         |d0 AS (SELECT cnode, CAST(0 AS BIGINT) AS level FROM cn),
         |$relaxRounds,
         |members AS (SELECT scc_id, count(*) AS n_members FROM sccm
         |  GROUP BY 1)
         |SELECT m2.scc_id, m2.n_members, d30.level
         |  + CASE WHEN (SELECT count(*) FROM r8) = (SELECT count(*) FROM r7)
         |         THEN 0 ELSE error('l14 ORACLE under-converged: closure still growing at 8 doubling rounds — raise the oracle rounds; this is an oracle problem, not an engine regression') END
         |  + CASE WHEN (SELECT COALESCE(sum(level), 0) FROM d30)
         |            = (SELECT COALESCE(sum(level), 0) FROM d29)
         |         THEN 0 ELSE error('l14 ORACLE under-converged: longest-path levels still moving at 30 relaxation rounds (DAG depth > 30) — raise the oracle rounds; this is an oracle problem, not an engine regression') END
         |  AS level
         |FROM members m2 JOIN d30 ON d30.cnode = m2.scc_id""".stripMargin
    },

    // h28: the 6 damped-update rounds UNROLLED as chained CTEs (the
    // h18 discipline) — every share is an integer floor division and
    // every sum an integer sum, so the ranks match digit for digit
    // (DuckDB promotes the running products to HUGEINT)
    "h28_link_rank" -> {
      val rounds = (1 to 6).map { k =>
        s"""pr$k AS (SELECT n.node,
           |    150000 + (85 * COALESCE(m.mass, 0)) // 100 AS pr
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS node, SUM(p.pr // d.od) AS mass
           |    FROM e JOIN pr${k - 1} p ON p.node = e.src
           |      JOIN d ON d.src = e.src
           |    GROUP BY e.dst) m ON m.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH p0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s1
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT c * 2 AS src, s1 * 2 + 1 AS dst FROM p0
         |      UNION ALL SELECT s1 * 2 + 1, c * 2 FROM p0),
         |d AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
         |$rounds
         |SELECT node, CAST(pr AS BIGINT) AS rank FROM pr6""".stripMargin
    },

    // l4: the seeded rounds — only seed nodes hold initial mass or
    // receive the restart share; otherwise h28's arithmetic verbatim
    "l4_personalized_rank" -> {
      val rounds = (1 to 6).map { k =>
        s"""pr$k AS (SELECT n.node, n.is_seed,
           |    (CASE WHEN n.is_seed THEN 150000 ELSE 0 END)
           |      + (85 * COALESCE(m.mass, 0)) // 100 AS pr
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS node, SUM(p.pr // d.od) AS mass
           |    FROM e JOIN pr${k - 1} p ON p.node = e.src
           |      JOIN d ON d.src = e.src
           |    GROUP BY e.dst) m ON m.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH p0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s1
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT c * 2 AS src, s1 * 2 + 1 AS dst FROM p0
         |      UNION ALL SELECT s1 * 2 + 1, c * 2 FROM p0),
         |d AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
         |n0 AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |sd AS (SELECT s_suppkey * 2 + 1 AS node FROM supplier
         |       WHERE s_nationkey = 1),
         |n AS (SELECT n0.node, sd.node IS NOT NULL AS is_seed
         |      FROM n0 LEFT JOIN sd ON sd.node = n0.node),
         |pr0 AS (SELECT node, is_seed,
         |        CASE WHEN is_seed THEN CAST(1000000 AS BIGINT)
         |             ELSE CAST(0 AS BIGINT) END AS pr FROM n),
         |$rounds
         |SELECT node, CAST(pr AS BIGINT) AS rank FROM pr6""".stripMargin
    },

    // l5: the weighted rounds — share floors BEFORE the weight
    // multiply, term for term the Spark expression
    "l5_weighted_rank" -> {
      val rounds = (1 to 6).map { k =>
        s"""pr$k AS (SELECT n.node,
           |    150000 + (85 * COALESCE(m.mass, 0)) // 100 AS pr
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS node, SUM((p.pr // d.tw) * e.w) AS mass
           |    FROM e JOIN pr${k - 1} p ON p.node = e.src
           |      JOIN d ON d.src = e.src
           |    GROUP BY e.dst) m ON m.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH pe AS (SELECT o_custkey AS c, l_suppkey AS s1
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT c * 2 AS src, s1 * 2 + 1 AS dst, count(*) AS w
         |      FROM pe GROUP BY 1, 2
         |      UNION ALL
         |      SELECT s1 * 2 + 1, c * 2, count(*) FROM pe GROUP BY 1, 2),
         |d AS (SELECT src, SUM(w) AS tw FROM e GROUP BY 1),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
         |$rounds
         |SELECT node, CAST(pr AS BIGINT) AS rank FROM pr6""".stripMargin
    },

    // l2: the bipartite projection is a plain within-basket self-join
    // — distinct (order, part), pair by shared order with a < b, count
    "l2_copurchase" -> copurchaseOracleSql(2),

    // l1: connected components over l2's edges — DuckDB's recursive
    // min-label closure (the e6 discipline) against the iterative
    // Spark propagation; labels are min reachable ids in both
    "l1_components" ->
      s"""WITH RECURSIVE s AS (${copurchaseOracleSql(2)}),
         |edges AS (SELECT item_a AS x, item_b AS y FROM s
         |          UNION SELECT item_b, item_a FROM s),
         |cc(id, label) AS (
         |  SELECT DISTINCT x, x FROM edges
         |  UNION
         |  SELECT e.x, c.label FROM edges e JOIN cc c ON c.id = e.y)
         |SELECT id AS node, min(label) AS component FROM cc
         |GROUP BY id""".stripMargin,

    // l11: the 4 LPA rounds unrolled; per round the argmax is a
    // row_number pick by (count desc, label asc) — same total order
    // as the engine's (c, -label) struct max
    "l11_communities" -> {
      def round(r: Int): String =
        s"""r$r AS (
           |  SELECT e.a, l.label, count(*) AS c
           |  FROM edges e JOIN l${r - 1} l ON l.node = e.b
           |  GROUP BY 1, 2),
           |l$r AS MATERIALIZED (
           |  SELECT a AS node, label FROM (
           |    SELECT a, label, row_number() OVER (PARTITION BY a
           |      ORDER BY c DESC, label ASC) AS rn FROM r$r)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH s AS (${copurchaseOracleSql(2)}),
         |edges AS (SELECT item_a AS a, item_b AS b FROM s
         |          UNION SELECT item_b, item_a FROM s),
         |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM edges),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT node, label AS community FROM l4""".stripMargin
    },

    // l12: the same unrolled LPA rounds, then the exact modularity
    // algebra — q_num = 4m·L_c − D_c², q_den = 4m², no division
    "l12_modularity" -> {
      def round(r: Int): String =
        s"""r$r AS (
           |  SELECT e.a, l.label, count(*) AS c
           |  FROM edges e JOIN l${r - 1} l ON l.node = e.b
           |  GROUP BY 1, 2),
           |l$r AS MATERIALIZED (
           |  SELECT a AS node, label FROM (
           |    SELECT a, label, row_number() OVER (PARTITION BY a
           |      ORDER BY c DESC, label ASC) AS rn FROM r$r)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH s AS MATERIALIZED (${copurchaseOracleSql(2)}),
         |edges AS (SELECT item_a AS a, item_b AS b FROM s
         |          UNION SELECT item_b, item_a FROM s),
         |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM edges),
         |${(1 to 4).map(round).mkString(",\n")},
         |ce AS (SELECT item_a AS a, item_b AS b FROM s),
         |m AS (SELECT count(*) AS m FROM ce),
         |deg AS (SELECT n, count(*) AS deg FROM (
         |          SELECT a AS n FROM ce UNION ALL SELECT b FROM ce)
         |        GROUP BY 1),
         |dc AS (SELECT l.label AS community, count(*) AS n_nodes,
         |         sum(deg) AS d_c
         |       FROM deg JOIN l4 l ON l.node = deg.n GROUP BY 1),
         |lc AS (SELECT la.label AS community, count(*) AS l_c
         |       FROM ce JOIN l4 la ON la.node = ce.a
         |                JOIN l4 lb ON lb.node = ce.b
         |       WHERE la.label = lb.label GROUP BY 1)
         |SELECT dc.community, n_nodes,
         |  COALESCE(l_c, CAST(0 AS BIGINT)) AS l_c,
         |  CAST(d_c AS BIGINT) AS d_c,
         |  CAST(4 * m.m * COALESCE(l_c, 0) - d_c * d_c AS BIGINT) AS q_num,
         |  CAST(4 * m.m * m.m AS BIGINT) AS q_den
         |FROM dc LEFT JOIN lc USING (community), m""".stripMargin
    },

    // l3: triangle counts by ID-order enumeration (a<b<c appears
    // exactly once as (a,b),(b,c),(a,c) since edges are canonical
    // lo<hi) — Spark enumerates by DEGREE order; the counts agree
    "l3_triangles" ->
      s"""WITH e AS (SELECT item_a AS lo, item_b AS hi
         |           FROM (${copurchaseOracleSql(2)})),
         |t AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
         |      FROM e e1 JOIN e e2 ON e2.lo = e1.hi
         |      JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
         |n AS (SELECT lo AS node FROM e UNION SELECT hi FROM e),
         |pc AS (SELECT node, count(*) AS triangles
         |       FROM (SELECT unnest([a, b, c]) AS node FROM t)
         |       GROUP BY node)
         |SELECT n.node, COALESCE(pc.triangles, CAST(0 AS BIGINT)) AS triangles
         |FROM n LEFT JOIN pc ON pc.node = n.node""".stripMargin,

    // k11: the Z-value is pure integer arithmetic — range buckets by
    // floor division (DuckDB `//`), then the explicit 8-bit interleave
    // (bit b of dim i at position 2b + i), term for term the same sum
    // Layout.zorderValue codegens
    "k11_zorder" -> {
      def terms(c: String, off: Int): String =
        (0 until 8).map(b => s"((($c >> $b) & 1) << ${2 * b + off})")
          .mkString(" + ")
      s"""WITH b AS (
         |  SELECT min(l_partkey) AS p0, max(l_partkey) AS p1,
         |         min(l_suppkey) AS s0, max(l_suppkey) AS s1
         |  FROM lineitem),
         |k AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |        ((CAST(l_partkey AS BIGINT) - p0) * 256) // (p1 - p0 + 1) AS ba,
         |        ((CAST(l_suppkey AS BIGINT) - s0) * 256) // (s1 - s0 + 1) AS bb
         |      FROM lineitem, b)
         |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  CAST(${terms("ba", 0)} + ${terms("bb", 1)} AS BIGINT) AS zval
         |FROM k""".stripMargin
    },

    "b40_instant_rate" ->
      s"""WITH r AS (
         |  SELECT user_id, ts, value,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events),
         |a AS (
         |  SELECT user_id,
         |    max(CASE WHEN rn = 1 THEN ts END) AS last_ts,
         |    max(CASE WHEN rn = 1 THEN CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) END) AS vl,
         |    max(CASE WHEN rn = 2 THEN CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) END) AS vp,
         |    max(CASE WHEN rn = 1 THEN epoch_us(ts) END) AS tl,
         |    max(CASE WHEN rn = 2 THEN epoch_us(ts) END) AS tp
         |  FROM r WHERE rn <= 2 GROUP BY 1)
         |SELECT user_id, last_ts,
         |  CASE WHEN vp IS NOT NULL THEN
         |    CAST(CASE WHEN vl >= vp THEN vl - vp ELSE vl END AS DOUBLE) / 1000000.0
         |  END AS idelta,
         |  CASE WHEN vp IS NOT NULL AND tl > tp THEN
         |    ${sqlPround("(CAST(CASE WHEN vl >= vp THEN vl - vp ELSE vl END AS DOUBLE) / 1000000.0) / (CAST(tl - tp AS DOUBLE) / 1000000.0)", 6)}
         |  END AS irate_per_sec
         |FROM a""".stripMargin,

    "dq8_completeness" ->
      """WITH a AS (
        |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events),
        |g AS (SELECT event_type, min(day) AS first_day, max(day) AS last_day,
        |        count(*) AS n_present
        |      FROM a GROUP BY 1)
        |SELECT event_type, first_day, last_day,
        |  CAST(date_diff('day', first_day, last_day) + 1 AS BIGINT) AS n_expected,
        |  CAST(n_present AS BIGINT) AS n_present,
        |  CAST(date_diff('day', first_day, last_day) + 1 - n_present AS BIGINT) AS n_missing,
        |  date_diff('day', first_day, last_day) + 1 - n_present = 0 AS complete
        |FROM g""".stripMargin,

    "b39_seasonal" ->
      s"""WITH dly AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS fv
         |  FROM events GROUP BY 1, 2),
         |d AS (SELECT *,
         |        CAST(((day - DATE '1970-01-01') % 7 + 7) % 7 AS INT) AS dow
         |      FROM dly),
         |b AS (SELECT event_type, dow, CAST(sum(fv) AS BIGINT) AS s,
         |        count(*) AS n
         |      FROM d GROUP BY 1, 2)
         |SELECT d.event_type, d.day, d.dow,
         |  CAST(fv AS DOUBLE) / 10000.0 AS value,
         |  ${sqlPround("CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0", 4)} AS baseline,
         |  ${sqlPround("CAST(CAST(n AS HUGEINT) * fv - s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0", 4)} AS residual
         |FROM d JOIN b USING (event_type, dow)""".stripMargin,

    "h27_line_dedup" ->
      """WITH d AS (SELECT doc_id,
        |    'Home | About | Contact' || chr(10) || text || chr(10) ||
        |    'ref: ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |    '(c) example corp' AS t
        |  FROM documents),
        |sp AS (SELECT doc_id, string_split(t, chr(10)) AS ls,
        |         len(string_split(t, chr(10))) AS total FROM d),
        |l AS (SELECT doc_id, u.i AS pos, ls[u.i] AS line
        |      FROM sp, unnest(generate_series(1, len(ls))) AS u(i)),
        |hot AS (SELECT line FROM l GROUP BY line
        |        HAVING count(DISTINCT doc_id) >= 3),
        |k AS (SELECT l.* FROM l ANTI JOIN hot USING (line)),
        |r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ct,
        |        count(*) AS nk FROM k GROUP BY 1)
        |SELECT sp.doc_id, coalesce(r.ct, '') AS clean_text,
        |  CAST(coalesce(r.nk, 0) AS BIGINT) AS n_kept,
        |  CAST(sp.total - coalesce(r.nk, 0) AS BIGINT) AS n_dropped
        |FROM sp LEFT JOIN r USING (doc_id)""".stripMargin,

    "h26_readability" -> {
      val w = "CAST(greatest(len(tok), 1) AS DOUBLE)"
      val snt = "CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)"
      val sy = "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)"
      s"""WITH t AS (${tokCte("documents", lower = false)})
         |SELECT doc_id, len(tok) AS n_words,
         |  len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
         |  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables,
         |  ${sqlPround(s"206.835 - 1.015 * ($w / $snt) - 84.6 * ($sy / $w)", 4)} AS flesch
         |FROM t""".stripMargin
    },

    // k12: both char-trigram models rebuilt in SQL (the h14 gram CTE),
    // fixed-point means, one final mirrored ratio + round
    "k12_dsir_select" ->
      """WITH g AS (
        |  SELECT doc_id, source, u.g AS g
        |  FROM documents,
        |    unnest([substring(text, i, 3)
        |            for i in generate_series(1, greatest(length(text) - 2, 0))]) AS u(g)
        |  WHERE doc_id IS NOT NULL),
        |ct AS (SELECT g, count(*) AS c FROM g
        |       WHERE source IN ('src0', 'src1', 'src2', 'src3') GROUP BY 1),
        |pt AS (SELECT ct.g, CAST(ct.c AS DOUBLE) / x.cp AS prob
        |       FROM ct JOIN (SELECT substring(g, 1, 2) AS p, sum(c) AS cp
        |                     FROM ct GROUP BY 1) x
        |         ON substring(ct.g, 1, 2) = x.p),
        |cs AS (SELECT g, count(*) AS c FROM g GROUP BY 1),
        |ps AS (SELECT cs.g, CAST(cs.c AS DOUBLE) / y.cp AS prob
        |       FROM cs JOIN (SELECT substring(g, 1, 2) AS p, sum(c) AS cp
        |                     FROM cs GROUP BY 1) y
        |         ON substring(cs.g, 1, 2) = y.p),
        |sc AS (
        |  SELECT doc_id,
        |    count(pt.prob) AS n_target_grams,
        |    CAST(coalesce(sum(CAST(floor(pt.prob * 1000000.0 + 0.5) AS BIGINT)), 0) AS DOUBLE)
        |      / 1000000.0 / count(*) AS at,
        |    CAST(coalesce(sum(CAST(floor(ps.prob * 1000000.0 + 0.5) AS BIGINT)), 0) AS DOUBLE)
        |      / 1000000.0 / count(*) AS a_s
        |  FROM g LEFT JOIN pt USING (g) LEFT JOIN ps USING (g)
        |  GROUP BY 1)
        |SELECT doc_id, n_target_grams,
        |  floor(at / a_s * 1000000.0 + 0.5) / 1000000.0 AS importance
        |FROM sc
        |ORDER BY importance DESC NULLS LAST, doc_id
        |LIMIT 40""".stripMargin,

    "k10_temperature_sample" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |u AS (SELECT source, n,
        |        CAST(CASE WHEN (f + 1) * (f + 1) <= n THEN f + 1
        |                  WHEN f * f > n THEN f - 1 ELSE f END AS HUGEINT) AS u
        |      FROM (SELECT source, n,
        |              CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS f
        |            FROM c)),
        |tot AS (SELECT sum(u) AS uu FROM u),
        |base AS (SELECT source, n, (200 * u) // uu AS b, (200 * u) % uu AS rem
        |         FROM u, tot),
        |lo AS (SELECT 200 - sum(b) AS l FROM base),
        |bonus AS (SELECT source, n, b,
        |            row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
        |          FROM base),
        |alloc AS (SELECT source,
        |            least(n, b + CASE WHEN rk <= (SELECT l FROM lo)
        |                              THEN 1 ELSE 0 END) AS a
        |          FROM bonus),
        |r AS (SELECT d.*, row_number() OVER (PARTITION BY d.source
        |        ORDER BY md5(CAST(d.doc_id AS VARCHAR) || '|temp1'),
        |                 d.doc_id) AS rn
        |      FROM documents d)
        |SELECT r.source, r.doc_id, r.text, r.lang, r.n_chars
        |FROM r JOIN alloc USING (source) WHERE rn <= a""".stripMargin,

    "c13_top_paths" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800.0
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS prev FROM events)),
        |p AS (
        |  SELECT CASE WHEN count(*) > 5 THEN
        |      string_agg(event_type, '>' ORDER BY ts, event_id)
        |        FILTER (WHERE rn <= 5) || '>(truncated)'
        |    ELSE string_agg(event_type, '>' ORDER BY ts, event_id) END AS path
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
        |          ORDER BY ts, event_id) AS rn FROM s)
        |  GROUP BY user_id, session_id)
        |SELECT path, count(*) AS n_sessions,
        |  row_number() OVER (ORDER BY count(*) DESC, path) AS rnk
        |FROM p GROUP BY path
        |QUALIFY rnk <= 20""".stripMargin,

    "c14_stickiness" ->
      s"""WITH a AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         |dau AS (SELECT day, count(*) AS dau FROM a GROUP BY 1),
         |w AS (
         |  SELECT DISTINCT user_id, day + CAST(u.o AS INTEGER) AS day
         |  FROM a, LATERAL unnest(range(0, 7)) AS u(o)),
         |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1)
         |SELECT day, dau, wau,
         |  ${sqlPround("CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE)", 4)} AS stickiness
         |FROM dau JOIN wau USING (day)""".stripMargin,

    "c6_scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM c""".stripMargin,

    "c7_pit_join" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
        |h AS (
        |  SELECT user_id, event_type AS state, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT e.event_id, e.user_id, h.state, h.valid_from
        |FROM events e JOIN h ON e.user_id = h.user_id
        |  AND e.ts >= h.valid_from
        |  AND (h.valid_to IS NULL OR e.ts < h.valid_to)""".stripMargin,

    "d1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${sqlFixedSum("l_quantity", 4)} AS sum_qty,
         |${sqlFixedSum("l_extendedprice", 4)} AS sum_base_price,
         |${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
         |${sqlFixedSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 4)} AS sum_charge,
         |${sqlFixedAvg("l_quantity", 4)} AS avg_qty,
         |${sqlFixedAvg("l_extendedprice", 4)} AS avg_price,
         |${sqlFixedAvg("l_discount", 4)} AS avg_disc,
         |count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "d2_shipping_priority" ->
      s"""SELECT l_orderkey, ${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue, o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "d3_local_supplier_revenue" ->
      s"""SELECT n_name, ${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1994-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY n_name""".stripMargin,

    "d4_topk_per_group" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |QUALIFY rnk <= 3""".stripMargin,

    "d8_topk_native" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |QUALIFY rnk <= 3""".stripMargin,

    "d9_topk_rank_ties" ->
      """SELECT c_mktsegment, o_orderkey,
        |CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_band,
        |rank() OVER (PARTITION BY c_mktsegment ORDER BY floor(o_totalprice / 10000) DESC) AS rnk
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |QUALIFY rnk <= 10""".stripMargin,

    "d10_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,

    "d11_inactive_customers" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers,
         |  ${sqlFixedAvg("c_acctbal", 4)} AS avg_acctbal
         |FROM customer c
         |WHERE NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c.c_custkey
         |                    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
         |                    AND o.o_orderdate < TIMESTAMP '1996-04-01')
         |GROUP BY 1""".stripMargin,

    "d13_order_count_dist" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)
        |SELECT COALESCE(pc.n, 0) AS c_count, count(*) AS custdist
        |FROM customer c LEFT JOIN pc ON c.c_custkey = pc.o_custkey
        |GROUP BY 1""".stripMargin,

    "d14_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,

    "d15_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${sqlFixedSum("l_quantity", 4)} AS sum_qty
         |  FROM lineitem GROUP BY 1 HAVING ${sqlFixedSum("l_quantity", 4)} > 200)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
         |FROM orders
         |JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "d16_supplier_blame" ->
      """WITH rp AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |  WHERE l_returnflag = 'R'),
        |ac AS (
        |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
        |  FROM lineitem GROUP BY 1),
        |rc AS (SELECT l_orderkey, count(*) AS n_r FROM rp GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM rp
        |JOIN ac USING (l_orderkey)
        |JOIN rc USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE n_supp >= 2 AND n_r = 1
        |GROUP BY 1""".stripMargin,

    "d17_supplier_variety" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |kept AS (
        |  SELECT * FROM pairs
        |  WHERE l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM kept JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |GROUP BY 1, 2""".stripMargin,

    "d18_revenue_concentration" ->
      """WITH pr AS (
        |  SELECT l_partkey,
        |    sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
        |      AS BIGINT)) AS vf
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, CAST(vf AS DOUBLE) / 10000.0 AS part_value
        |FROM pr
        |WHERE CAST(vf AS DOUBLE) * (SELECT count(*) FROM pr)
        |      > 1.3 * CAST((SELECT sum(vf) FROM pr) AS DOUBLE)""".stripMargin,

    "d19_cheapest_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) AS pf
        |  FROM lineitem GROUP BY 1, 2),
        |mn AS (SELECT l_partkey, min(pf) AS mf FROM ps GROUP BY 1)
        |SELECT ps.l_partkey, ps.l_suppkey,
        |  CAST(pf AS DOUBLE) / 10000.0 AS min_price
        |FROM ps JOIN mn ON ps.l_partkey = mn.l_partkey AND ps.pf = mn.mf""".stripMargin,

    "d20_disjunctive_revenue" ->
      s"""SELECT ${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "d21_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  ${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3""".stripMargin,

    "d22_market_share" ->
      s"""WITH v AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
         |      AS BIGINT) AS vf,
         |    n2.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
         |    AND o_orderdate >= TIMESTAMP '1995-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-01-01')
         |SELECT o_year,
         |  ${sqlPround(
             "CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vf ELSE 0 END)" +
             " AS DOUBLE) / CAST(sum(vf) AS DOUBLE)", 6)} AS mkt_share
         |FROM v GROUP BY 1""".stripMargin,

    "d23_returned_revenue" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "d24_promo_share" ->
      s"""SELECT ${sqlPround(
             "100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN" +
             " CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)" +
             " ELSE 0 END) AS DOUBLE)" +
             " / CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)" +
             " AS BIGINT)) AS DOUBLE)", 6)} AS promo_share
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "d25_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  ${sqlFixedSum(
             "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity", 4)}
         |  AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_type = 'LARGE'
         |GROUP BY 1, 2""".stripMargin,

    "d26_forecast_revenue" ->
      s"""SELECT ${sqlFixedSum("l_extendedprice * l_discount", 4)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "d27_linestatus_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "d28_promotable_suppliers" ->
      s"""WITH scoped AS (
         |  SELECT l.* FROM lineitem l
         |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')),
         |ps AS (
         |  SELECT l_partkey, l_suppkey, ${sqlFixedSum("l_quantity", 4)} AS qty
         |  FROM scoped GROUP BY 1, 2),
         |th AS (
         |  SELECT l_partkey, ${sqlFixedAvg("qty", 4)} AS avg_qty
         |  FROM ps GROUP BY 1),
         |q AS (
         |  SELECT DISTINCT l_suppkey FROM ps JOIN th USING (l_partkey)
         |  WHERE qty > 2.0 * avg_qty)
         |SELECT s_suppkey, s_name, s_nationkey
         |FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM q)""".stripMargin,

    "d12_small_qty_revenue" ->
      s"""WITH scoped AS (
         |  SELECT l.* FROM lineitem l
         |  JOIN part p ON p.p_partkey = l.l_partkey
         |  WHERE p.p_brand = 'Brand#23'),
         |a AS (
         |  SELECT l_partkey, ${sqlFixedAvg("l_quantity", 4)} AS avg_qty
         |  FROM scoped GROUP BY 1)
         |SELECT ${sqlPround(s"(${sqlFixedSum("l_extendedprice", 4)}) / 7.0", 4)}
         |  AS avg_yearly
         |FROM scoped l JOIN a USING (l_partkey)
         |WHERE l.l_quantity < 0.2 * a.avg_qty""".stripMargin,

    "d5_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), y AS (
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM x
        |)
        |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events, FIXEDSUM_VALUE AS value_sum
        |FROM y GROUP BY 1, 2""".stripMargin
        .replace("FIXEDSUM_VALUE", sqlFixedSum("value", 4)),

    "d6_asof_join" ->
      s"""WITH od AS (
         |  SELECT * FROM orders
         |  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1)
         |SELECT e.event_id, e.user_id, e.ts,
         |  coalesce(o.o_orderkey, -1) AS last_orderkey,
         |  coalesce(${sqlPround("o.o_totalprice", 4)}, 0.0) AS last_totalprice
         |FROM events e ASOF LEFT JOIN od o
         |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    "d33_interval_lookup" ->
      s"""WITH bands(tier, lo, hi) AS (VALUES
         |  ('bronze', 0.0, 50.0), ('silver', 50.0, 200.0),
         |  ('gold', 200.0, 1000.0))
         |SELECT event_id, user_id,
         |  ${sqlPround("value", 4)} AS value, tier
         |FROM events JOIN bands ON value >= lo AND value < hi"""
        .stripMargin,

    "d32_asof_forward" ->
      s"""WITH od AS (
         |  SELECT * FROM orders
         |  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1)
         |SELECT e.event_id, e.user_id, e.ts,
         |  coalesce(o.o_orderkey, -1) AS next_orderkey,
         |  coalesce(${sqlPround("o.o_totalprice", 4)}, 0.0) AS next_totalprice
         |FROM events e ASOF LEFT JOIN od o
         |  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate""".stripMargin,

    "d30_bloom_pruned_join" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |  ${sqlFixedSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY 1""".stripMargin,

    "d29_asof_tolerance" ->
      s"""WITH od AS (
         |  SELECT * FROM orders
         |  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1)
         |SELECT e.event_id, e.user_id, e.ts,
         |  CASE WHEN o.o_orderdate IS NOT NULL
         |         AND e.ts - o.o_orderdate <= INTERVAL 7 DAY
         |       THEN o.o_orderkey ELSE -1 END AS last_orderkey,
         |  CASE WHEN o.o_orderdate IS NOT NULL
         |         AND e.ts - o.o_orderdate <= INTERVAL 7 DAY
         |       THEN ${sqlPround("o.o_totalprice", 4)} ELSE 0.0 END AS last_totalprice
         |FROM events e ASOF LEFT JOIN od o
         |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    "d7_range_join" ->
      """SELECT c.event_id, c.user_id, c.ts, count(v.ts) AS n_prior_views
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |  ON v.user_id = c.user_id AND v.ts > c.ts - INTERVAL 30 MINUTE AND v.ts <= c.ts
        |GROUP BY 1, 2, 3""".stripMargin,

    "e1_dedup_exact" ->
      "SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies FROM documents GROUP BY 1",

    "e2_dedup_ngram_jaccard" -> e2OracleSql,

    "e6_dedup_clusters" -> e6OracleSql,

    "e8_dedup_apply" ->
      s"""SELECT d.doc_id, d.lang, d.source
         |FROM documents d LEFT JOIN ($e6OracleSql) cc ON cc.doc_id = d.doc_id
         |WHERE cc.cluster_id IS NULL OR cc.cluster_id = d.doc_id""".stripMargin,

    "k13_weighted_thin" ->
      s"""WITH cc AS ($e6OracleSql),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size
         |       FROM cc GROUP BY 1),
         |w AS (
         |  SELECT d.doc_id, d.lang, d.source,
         |    coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
         |    coalesce(sz.cluster_size, CAST(1 AS BIGINT)) AS cluster_size,
         |    CAST(1000000 // coalesce(sz.cluster_size, 1) AS BIGINT)
         |      AS weight_ppm
         |  FROM documents d
         |  LEFT JOIN cc ON cc.doc_id = d.doc_id
         |  LEFT JOIN sz ON sz.cluster_id = cc.cluster_id)
         |SELECT doc_id, lang, source, cluster_id, cluster_size, weight_ppm
         |FROM w
         |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |        AS BIGINT) % 1000000 < weight_ppm""".stripMargin,

    "e13_soft_dedup" ->
      s"""WITH cc AS ($e6OracleSql),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size
         |       FROM cc GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
         |  coalesce(sz.cluster_size, CAST(1 AS BIGINT)) AS cluster_size,
         |  CAST(1000000 // coalesce(sz.cluster_size, 1) AS BIGINT)
         |    AS weight_ppm
         |FROM documents d
         |LEFT JOIN cc ON cc.doc_id = d.doc_id
         |LEFT JOIN sz ON sz.cluster_id = cc.cluster_id""".stripMargin,

    "k5_split_leakage_safe" ->
      s"""WITH a AS (
         |  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS sk
         |  FROM documents d LEFT JOIN ($e6OracleSql) cc ON cc.doc_id = d.doc_id),
         |s AS (
         |  SELECT doc_id, sk,
         |    CAST(concat('0x', substr(md5(CAST(sk AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
         |  FROM a)
         |SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs, count(DISTINCT sk) AS n_groups
         |FROM s GROUP BY 1""".stripMargin,

    "e7_dedup_spans" ->
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |g0 AS (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, greatest(len(tok) - 2, 0)),
         |    i -> {'p': i - 1, 's': array_to_string(tok[i:i+2], ' ')})) AS u
         |  FROM t),
         |g AS (SELECT doc_id, u.p AS p, u.s AS s FROM g0),
         |o AS (SELECT s, count(*) AS occ FROM g GROUP BY 1),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos FROM (
         |    SELECT g.doc_id, unnest(generate_series(g.p, g.p + 2)) AS pos
         |    FROM g JOIN o USING (s) WHERE o.occ > 1)),
         |tk0 AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tok)),
         |    i -> {'pos': i - 1, 'w': tok[i]})) AS u
         |  FROM t),
         |tk AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM tk0),
         |kept AS (
         |  SELECT tk.doc_id, tk.pos, tk.w
         |  FROM tk LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.pos = tk.pos
         |  WHERE cov.pos IS NULL),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(w, ' ' ORDER BY pos) AS clean_text
         |  FROM kept GROUP BY 1)
         |SELECT t.doc_id, len(t.tok) AS n_tokens,
         |  coalesce(agg.n_kept, 0) AS n_kept,
         |  coalesce(agg.clean_text, '') AS clean_text
         |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin,

    "e11_dedup_spans_keep_first" ->
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |g0 AS (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, greatest(len(tok) - 2, 0)),
         |    i -> {'p': i - 1, 's': array_to_string(tok[i:i+2], ' ')})) AS u
         |  FROM t),
         |g AS (SELECT doc_id, u.p AS p, u.s AS s FROM g0),
         |o AS (SELECT s, count(*) AS occ FROM g GROUP BY 1),
         |hot AS (SELECT g.doc_id, g.p, g.s FROM g JOIN o USING (s)
         |        WHERE o.occ > 1),
         |flag AS (
         |  SELECT doc_id, p FROM (
         |    SELECT *, row_number() OVER (PARTITION BY s
         |      ORDER BY doc_id, p) AS rn FROM hot)
         |  WHERE rn > 1),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos FROM (
         |    SELECT doc_id, unnest(generate_series(p, p + 2)) AS pos
         |    FROM flag)),
         |tk0 AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tok)),
         |    i -> {'pos': i - 1, 'w': tok[i]})) AS u
         |  FROM t),
         |tk AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM tk0),
         |kept AS (
         |  SELECT tk.doc_id, tk.pos, tk.w
         |  FROM tk LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.pos = tk.pos
         |  WHERE cov.pos IS NULL),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(w, ' ' ORDER BY pos) AS clean_text
         |  FROM kept GROUP BY 1)
         |SELECT t.doc_id, len(t.tok) AS n_tokens,
         |  coalesce(agg.n_kept, 0) AS n_kept,
         |  coalesce(agg.clean_text, '') AS clean_text
         |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin,

    "e3_dedup_minhash_lsh" -> {
      // K-M family constants come from the SAME Scala definitions the
      // Spark operator uses — the arithmetic cannot drift
      def mh(i: Int): String =
        s"list_min(list_transform(h, x -> (${Dedup.kmA(i)} * CAST(concat('0x', x[1:7]) AS BIGINT)" +
          s" + ${Dedup.kmB(i)} * CAST(concat('0x', x[9:15]) AS BIGINT)" +
          s" + ${Dedup.kmC(i)}) % ${Dedup.KmP}))"
      val sigCols = (0 until 16).map(i => s"  ${mh(i)} AS mh$i").mkString(",\n")
      val bands = (0 until 4).map { b =>
        val cols = (0 until 4).map(j => s"mh${b * 4 + j}").mkString(", ")
        s"  SELECT doc, $b AS band, md5(array_to_string([$cols], '|')) AS bucket FROM sig"
      }.mkString(" UNION ALL\n")
      s"""WITH t AS (${tokCte("documents", lower = true)}),
         |s AS (SELECT doc_id, list_distinct($shingle3) AS shs FROM t),
         |hs AS (SELECT doc_id, list_transform(shs, x -> md5(x)) AS h FROM s),
         |sig AS (SELECT doc_id AS doc,
         |$sigCols
         |  FROM hs),
         |banded AS (
         |$bands)
         |SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_bands
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
         |GROUP BY 1, 2""".stripMargin
    },

    // e3's banding CTEs, split into archive index and incoming probe
    "e9_dedup_incremental" -> {
      def mh(i: Int): String =
        s"list_min(list_transform(h, x -> (${Dedup.kmA(i)} * CAST(concat('0x', x[1:7]) AS BIGINT)" +
          s" + ${Dedup.kmB(i)} * CAST(concat('0x', x[9:15]) AS BIGINT)" +
          s" + ${Dedup.kmC(i)}) % ${Dedup.KmP}))"
      val sigCols = (0 until 16).map(i => s"  ${mh(i)} AS mh$i").mkString(",\n")
      val bands = (0 until 4).map { b =>
        val cols = (0 until 4).map(j => s"mh${b * 4 + j}").mkString(", ")
        s"  SELECT doc, $b AS band, md5(array_to_string([$cols], '|')) AS bucket FROM sig"
      }.mkString(" UNION ALL\n")
      s"""WITH t AS (${tokCte("documents", lower = true)}),
         |s AS (SELECT doc_id, list_distinct($shingle3) AS shs FROM t),
         |hs AS (SELECT doc_id, list_transform(shs, x -> md5(x)) AS h FROM s),
         |sig AS (SELECT doc_id AS doc,
         |$sigCols
         |  FROM hs),
         |banded AS (
         |$bands),
         |-- maxBucket valve: ARCHIVE buckets past 100 docs are dropped
         |-- before the probe join (mirrors minhashProbeBands' cap)
         |bsz AS (SELECT band, bucket, count(*) AS n FROM banded
         |        WHERE doc % 10 <> 0 GROUP BY 1, 2),
         |ok AS (SELECT band, bucket FROM bsz WHERE n <= 100)
         |SELECT n.doc AS doc_id, o.doc AS match_id, count(*) AS n_bands
         |FROM banded n JOIN banded o
         |  ON n.band = o.band AND n.bucket = o.bucket
         |JOIN ok ON n.band = ok.band AND n.bucket = ok.bucket
         |WHERE n.doc % 10 = 0 AND o.doc % 10 <> 0
         |GROUP BY 1, 2""".stripMargin
    },

    "e10_fuzzy_pairs" ->
      s"""WITH t AS (SELECT doc_id, lower(substr(text, 1, 24)) AS k FROM documents),
         |g AS (SELECT doc_id, k,
         |  unnest(CASE WHEN len(k) < 3 THEN [k]
         |    ELSE list_distinct(list_transform(generate_series(1, len(k) - 2),
         |      i -> substr(k, i, 3))) END) AS gr
         |  FROM t),
         |b AS (SELECT gr, list({'doc': doc_id, 'k': k} ORDER BY doc_id) AS ds
         |  FROM g GROUP BY 1 HAVING count(*) BETWEEN 2 AND 100),
         |p AS (SELECT DISTINCT u1.a.doc AS doc_a, u2.bb.doc AS doc_b,
         |    u1.a.k AS ka, u2.bb.k AS kb
         |  FROM b, LATERAL unnest(ds) AS u1(a), LATERAL unnest(ds) AS u2(bb)
         |  WHERE u1.a.doc < u2.bb.doc)
         |SELECT doc_a, doc_b, levenshtein(ka, kb) AS edit_dist
         |FROM p
         |WHERE abs(len(ka) - len(kb)) <= 2 AND levenshtein(ka, kb) <= 2""".stripMargin,

    "e4_dedup_simhash" -> {
      // portable 60-bit simhash: per-token hash = first 15 md5 hex
      // digits as BIGINT (what SimHash60 computes byte-wise); bit j of
      // the signature = majority vote over token occurrences
      val bits = (0 until 60).map(j =>
        s"(CASE WHEN 2 * len(list_filter(hs, h -> ((h >> $j) & 1) = 1)) > len(hs) THEN ${1L << j} ELSE 0 END)")
        .grouped(4).map(_.mkString(" + ")).mkString("\n|    + ")
      s"""WITH t AS (${tokCte("documents", lower = true)}),
         |hs AS (SELECT doc_id, list_transform(tok,
         |  x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)) AS hs FROM t),
         |sig AS (SELECT doc_id AS doc, $bits AS s FROM hs),
         |chunked AS (
         |  SELECT doc, s, c.chunk, (s >> (c.chunk * 15)) & 32767 AS key
         |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS chunk) c)
         |SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
         |  bit_count(xor(a.s, b.s)) AS hamming
         |FROM chunked a JOIN chunked b
         |  ON a.chunk = b.chunk AND a.key = b.key AND a.doc < b.doc
         |WHERE bit_count(xor(a.s, b.s)) <= 12""".stripMargin
    },

    "e5_dedup_embedding_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, b) -> a + b)) AS nrm,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, label, list_transform(v, x -> x / nrm) AS v FROM e
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  PROUND_DOT AS cosine
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE PROUND_DOT >= 0.3""".stripMargin
        .replace("PROUND_DOT", sqlPround(
          "list_reduce(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]), (x, y) -> x + y)", 4)),

    "f1_ann_bruteforce" -> f1OracleSql,

    "f19_ann_mmr" -> f19OracleSql,

    "f20_kmeans" -> f20OracleSql,

    "f21_semdedup" -> f21OracleSql,

    "f22_ann_rank_eval" -> f22OracleSql,

    "f18_ann_matryoshka" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id,
        |    list_transform(v, x -> x / sqrt(list_reduce(list_transform(v, y -> y * y), (a, b) -> a + b))) AS fv,
        |    list_transform(v[1:16], x -> x / sqrt(list_reduce(list_transform(v[1:16], y -> y * y), (a, b) -> a + b))) AS pv
        |  FROM e
        |), q AS (
        |  SELECT vec_id AS query_id, fv AS qv, pv AS pq FROM n WHERE vec_id % 100 = 0
        |), s AS (
        |  SELECT query_id, c.vec_id AS nn_id, qv, c.fv AS cv,
        |    PROUND_PREFIX AS coarse
        |  FROM q JOIN n c ON c.vec_id <> q.query_id
        |), t AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY coarse DESC, nn_id) AS crank
        |  FROM s QUALIFY crank <= 20
        |), r AS (
        |  SELECT query_id, nn_id, PROUND_FULL AS cosine FROM t
        |)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank,
        |  nn_id, cosine
        |FROM r QUALIFY rank <= 5""".stripMargin
        .replace("PROUND_PREFIX", sqlPround(
          "list_reduce(list_transform(generate_series(1, len(pq)), i -> pq[i] * c.pv[i]), (x, y) -> x + y)", 6))
        .replace("PROUND_FULL", sqlPround(
          "list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i]), (x, y) -> x + y)", 6)),

    "f17_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, b) -> a + b)) AS nrm,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, label, list_transform(v, x -> x / nrm) AS v FROM e
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id % 100 = 0
        |), s AS (
        |  SELECT query_id, c.vec_id AS nn_id, c.label AS lbl,
        |    PROUND_DOT AS cosine
        |  FROM q JOIN n c ON c.vec_id <> q.query_id
        |), t AS (
        |  SELECT query_id, lbl,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
        |  FROM s QUALIFY rank <= 5
        |), v AS (
        |  SELECT query_id, lbl AS predicted_label, count(*) AS votes
        |  FROM t GROUP BY 1, 2)
        |SELECT query_id, predicted_label, votes FROM v
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY votes DESC, predicted_label) = 1""".stripMargin
        .replace("PROUND_DOT", sqlPround(
          "list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.v[i]), (x, y) -> x + y)", 6)),

    "f12_ann_filtered" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, b) -> a + b)) AS nrm,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, label, list_transform(v, x -> x / nrm) AS v FROM e
        |), q AS (
        |  SELECT vec_id AS query_id, label AS ql, v AS qv FROM n WHERE vec_id % 100 = 0
        |), s AS (
        |  SELECT query_id, c.vec_id AS nn_id,
        |    PROUND_DOT AS cosine
        |  FROM q JOIN n c ON c.label = q.ql AND c.vec_id <> q.query_id
        |)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank,
        |  nn_id, cosine
        |FROM s QUALIFY rank <= 5""".stripMargin
        .replace("PROUND_DOT", sqlPround(
          "list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.v[i]), (x, y) -> x + y)", 6)),

    "f5_ann_lsh_multi" -> f5OracleSql,

    "f2_ann_lsh" -> f2OracleSql,

    "f3_ann_ivf" -> f3OracleSql,

    // recall@5 of the approximate searchers against the exact baseline:
    // each side is the full f1/f2/f3 oracle embedded as a subquery, so
    // the report is checked end-to-end, not against cached results
    "f4_ann_recall" ->
      s"""SELECT bf.query_id,
         |  count(*) AS n_true,
         |  count(l.nn_id) AS n_hit_lsh,
         |  count(iv.nn_id) AS n_hit_ivf,
         |  count(ml.nn_id) AS n_hit_multi,
         |  ${sqlPround("CAST(count(l.nn_id) AS DOUBLE) / count(*)", 4)} AS recall_lsh,
         |  ${sqlPround("CAST(count(iv.nn_id) AS DOUBLE) / count(*)", 4)} AS recall_ivf,
         |  ${sqlPround("CAST(count(ml.nn_id) AS DOUBLE) / count(*)", 4)} AS recall_multi
         |FROM ($f1OracleSql) bf
         |LEFT JOIN ($f2OracleSql) l
         |  ON l.query_id = bf.query_id AND l.nn_id = bf.nn_id
         |LEFT JOIN ($f3OracleSql) iv
         |  ON iv.query_id = bf.query_id AND iv.nn_id = bf.nn_id
         |LEFT JOIN ($f5OracleSql) ml
         |  ON ml.query_id = bf.query_id AND ml.nn_id = bf.nn_id
         |GROUP BY bf.query_id""".stripMargin,

    "g1_mm_metadata" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, 'image/fake' AS media_type,
        |  CAST(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 512 + 32 AS INTEGER) AS width,
        |  CAST(CAST(concat('0x', substr(md5(concat(text, '|h')), 1, 15)) AS BIGINT) % 512 + 32 AS INTEGER) AS height,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 512 + 32 AS INTEGER)
        |    * CAST(CAST(concat('0x', substr(md5(concat(text, '|h')), 1, 15)) AS BIGINT) % 512 + 32 AS INTEGER) AS n_pixels
        |FROM documents""".stripMargin,

    "g2_mm_featurize" -> {
      // byte-exact mirror of the stub decode: bytes extracted from the
      // payload's hex string, integer-summed per slot, scaled once
      val fcols = (0 until 16).map(j =>
        s"  ${sqlPround(s"COALESCE(SUM(CASE WHEN j = $j THEN sb END), 0) / 255.0", 4)} AS f$j")
        .mkString(",\n")
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
         |  FROM documents),
         |e AS (SELECT doc_id, hx, unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS i FROM b),
         |s AS (
         |  SELECT doc_id, i % 16 AS j,
         |    SUM(CAST(concat('0x', substr(hx, CAST(2 * i + 1 AS INTEGER), 2)) AS BIGINT)) AS sb
         |  FROM e GROUP BY 1, 2),
         |p AS (SELECT doc_id,
         |$fcols
         |  FROM s GROUP BY doc_id)
         |SELECT CAST(d.doc_id AS BIGINT) AS media_id,
         |  ${(0 until 16).map(j => s"COALESCE(p.f$j, 0.0) AS f$j").mkString(", ")}
         |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin
    },

    "g4_mm_resize" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, 'image/fake' AS media_type,
        |  8 AS width, 8 AS height, 64 AS n_bytes
        |FROM documents""".stripMargin,

    // byte-exact aHash mirror (g2's hex-extraction CTE with 60 slots),
    // then e4's chunk-bucket pair/hamming spelling
    "g5_mm_phash_dedup" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents),
        |e AS (SELECT doc_id, hx,
        |        unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS i FROM b),
        |s AS (
        |  SELECT doc_id, CAST(i % 60 AS INTEGER) AS j,
        |    SUM(CAST(concat('0x', substr(hx, CAST(2 * i + 1 AS INTEGER), 2)) AS BIGINT)) AS sb
        |  FROM e GROUP BY 1, 2),
        |t AS (SELECT doc_id, SUM(sb) AS total FROM s GROUP BY 1),
        |h0 AS (
        |  SELECT s.doc_id,
        |    CAST(SUM(CASE WHEN 60 * sb > total
        |                  THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS ph
        |  FROM s JOIN t USING (doc_id) GROUP BY 1),
        |sig AS (SELECT d.doc_id AS doc, CAST(COALESCE(h0.ph, 0) AS BIGINT) AS s
        |        FROM documents d LEFT JOIN h0 USING (doc_id)),
        |chunked AS (
        |  SELECT doc, s, c.chunk, (s >> (c.chunk * 15)) & 32767 AS key
        |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS chunk) c),
        |-- maxBucket valve: buckets beyond 100 docs generate no pairs
        |bsz AS (SELECT chunk, key, count(*) AS n FROM chunked GROUP BY 1, 2),
        |ck AS (SELECT c.* FROM chunked c JOIN bsz USING (chunk, key)
        |       WHERE bsz.n BETWEEN 2 AND 100)
        |SELECT DISTINCT a.doc AS media_a, b.doc AS media_b,
        |  bit_count(xor(a.s, b.s)) AS hamming
        |FROM ck a JOIN ck b
        |  ON a.chunk = b.chunk AND a.key = b.key AND a.doc < b.doc
        |WHERE bit_count(xor(a.s, b.s)) <= 12""".stripMargin,

    "g3_mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(floor(octet_length(encode(text)) / 64) AS BIGINT) AS nf
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  unnest(generate_series(0, nf - 1, 2)) AS frame_idx,
        |  64 AS n_bytes
        |FROM f WHERE nf > 0""".stripMargin,

    "g7_scene_cuts" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents),
        |f AS (SELECT doc_id, hx,
        |        unnest(generate_series(0, CAST(floor(n / 64) AS BIGINT) - 1, 2)) AS fi
        |      FROM b WHERE n >= 64),
        |e AS (SELECT doc_id, fi, hx,
        |        unnest(generate_series(0, 63)) AS i FROM f),
        |s AS (
        |  SELECT doc_id, fi, CAST(i % 60 AS INTEGER) AS j,
        |    SUM(CAST(concat('0x', substr(hx, CAST(2 * (fi * 64 + i) + 1 AS INTEGER), 2)) AS BIGINT)) AS sb
        |  FROM e GROUP BY 1, 2, 3),
        |t AS (SELECT doc_id, fi, SUM(sb) AS total FROM s GROUP BY 1, 2),
        |h AS (
        |  SELECT s.doc_id, s.fi,
        |    CAST(SUM(CASE WHEN 60 * sb > total
        |                  THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS ph
        |  FROM s JOIN t USING (doc_id, fi) GROUP BY 1, 2),
        |p AS (SELECT doc_id, fi, ph,
        |        lag(ph) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
        |      FROM h)
        |SELECT doc_id AS media_id, fi AS frame_idx,
        |  bit_count(xor(ph, prev)) AS hamming,
        |  bit_count(xor(ph, prev)) >= 20 AS is_cut
        |FROM p WHERE prev IS NOT NULL""".stripMargin,

    "h1_text_quality" ->
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |m AS (
         |  SELECT doc_id, text, len(tok) AS n_tokens,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        x -> len(x) > 0 AND list_contains(${TextFunctions.stopwordsEn.map("'" + _ + "'").mkString("[", ",", "]")}, x))) AS n_stopwords,
         |    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
         |  FROM t)
         |SELECT doc_id, n_tokens, n_punct, n_stopwords,
         |  ${sqlPround(
             """0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
               | + 0.3 * (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
               | + 0.3 * least(CAST(n_stopwords AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 5.0, 1.0)"""
               .stripMargin.replace("\n", ""), 4)} AS quality_score
         |FROM m""".stripMargin,

    "h2_token_count" ->
      s"""WITH t AS (${tokCte("documents", lower = false)})
         |SELECT doc_id, len(tok) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish
         |FROM t""".stripMargin,

    "h3_lang_id" -> {
      val lists = TextFunctions.profiles.map { case (l, ws) =>
        l -> ws.map("'" + _ + "'").mkString("[", ",", "]")
      }.toMap
      s"""WITH t AS (${tokCte("documents", lower = true)}),
         |sc AS (
         |  SELECT doc_id, lang,
         |    len(list_filter(tok, x -> list_contains(${lists("en")}, x)))::DOUBLE / greatest(len(tok), 1)::DOUBLE AS s_en,
         |    len(list_filter(tok, x -> list_contains(${lists("de")}, x)))::DOUBLE / greatest(len(tok), 1)::DOUBLE AS s_de,
         |    len(list_filter(tok, x -> list_contains(${lists("fr")}, x)))::DOUBLE / greatest(len(tok), 1)::DOUBLE AS s_fr,
         |    len(list_filter(tok, x -> list_contains(${lists("es")}, x)))::DOUBLE / greatest(len(tok), 1)::DOUBLE AS s_es
         |  FROM t)
         |SELECT doc_id, lang,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) < 0.05 THEN 'und'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS pred_lang
         |FROM sc""".stripMargin
    },

    "h4_doc_fingerprint" ->
      s"""WITH t AS (${tokCte("documents", lower = true)}),
         |s AS (SELECT doc_id, $shingle3 AS shs FROM t),
         |f AS (SELECT doc_id, CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
         |  ELSE list_transform(generate_series(1, len(tok) - 4), i -> array_to_string(tok[i:i+4], ' ')) END AS sh5
         |  FROM t)
         |SELECT doc_id, list_min(list_transform(sh5, x -> md5(x))) AS fingerprint
         |FROM f""".stripMargin,

    "h5_text_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS clean_text,
        |  length(trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))) AS n_chars
        |FROM documents""".stripMargin,

    "h6_pii_scrub" -> {
      // emailRe holds a literal `\.` — inside a DuckDB '...' literal the
      // backslash is verbatim, so the regex arrives identical to Spark's
      val em = TextFunctions.emailRe
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(text, '$em', '<EMAIL>', 'g'), '${TextFunctions.longNumRe}', '<NUM>', 'g') AS scrubbed,
         |  len(regexp_extract_all(text, '$em')) AS n_emails,
         |  len(regexp_extract_all(text, '${TextFunctions.longNumRe}')) AS n_long_numbers
         |FROM documents""".stripMargin
    },

    "h7_curation" -> {
      val stop = TextFunctions.stopwordsEn.map("'" + _ + "'").mkString("[", ",", "]")
      val lists = TextFunctions.profiles.map { case (l, ws) =>
        l -> ws.map("'" + _ + "'").mkString("[", ",", "]")
      }.toMap
      val quality = sqlPround(
        """0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
          | + 0.3 * (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
          | + 0.3 * least(CAST(n_stopwords AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 5.0, 1.0)"""
          .stripMargin.replace("\n", ""), 4)
      s"""WITH k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |t AS (
         |  SELECT d.doc_id, d.lang, d.text,
         |    list_filter(string_split_regex(trim(d.text), '\\s+'), x -> len(x) > 0) AS tok,
         |    list_filter(string_split_regex(trim(lower(d.text)), '\\s+'), x -> len(x) > 0) AS ltok
         |  FROM documents d JOIN k USING (doc_id)),
         |m AS (
         |  SELECT doc_id, lang, text, len(tok) AS n_tokens,
         |    len(list_filter(ltok, x -> list_contains($stop, x))) AS n_stopwords,
         |    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         |    len(list_filter(ltok, x -> list_contains(${lists("en")}, x)))::DOUBLE / greatest(len(ltok), 1)::DOUBLE AS s_en,
         |    len(list_filter(ltok, x -> list_contains(${lists("de")}, x)))::DOUBLE / greatest(len(ltok), 1)::DOUBLE AS s_de,
         |    len(list_filter(ltok, x -> list_contains(${lists("fr")}, x)))::DOUBLE / greatest(len(ltok), 1)::DOUBLE AS s_fr,
         |    len(list_filter(ltok, x -> list_contains(${lists("es")}, x)))::DOUBLE / greatest(len(ltok), 1)::DOUBLE AS s_es
         |  FROM t),
         |scored AS (
         |  SELECT doc_id, lang, $quality AS quality_score,
         |    CASE WHEN greatest(s_en, s_de, s_fr, s_es) < 0.05 THEN 'und'
         |         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |         WHEN s_fr >= s_es THEN 'fr'
         |         ELSE 'es' END AS pred_lang
         |  FROM m)
         |SELECT doc_id, lang, quality_score, pred_lang FROM scored
         |WHERE quality_score >= 0.5 AND pred_lang = lang""".stripMargin
    },

    "h8_contamination" -> contaminationSql,

    // h13 computes the SAME report through the train-side Bloom sketch:
    // no false negatives ever, and at the registered ~250 bits/item the
    // expected false-hit count over the whole eval probe set is << 1 —
    // the exact-join oracle is a valid oracle for the sketch too
    "h13_contamination_bloom" -> contaminationSql,

    "h14_ngram_lm" ->
      s"""WITH g AS (
         |  SELECT doc_id, u.g AS g
         |  FROM documents,
         |    unnest([substring(text, i, 3)
         |            for i in generate_series(1, greatest(length(text) - 2, 0))]) AS u(g)
         |  WHERE doc_id IS NOT NULL),
         |c3 AS (SELECT g, count(*) AS c_full FROM g GROUP BY 1),
         |c2 AS (SELECT substring(g, 1, 2) AS p, sum(c_full) AS c_prefix
         |       FROM c3 GROUP BY 1),
         |m AS (SELECT g, CAST(c_full AS DOUBLE) / c_prefix AS prob
         |      FROM c3 JOIN c2 ON substring(c3.g, 1, 2) = c2.p)
         |SELECT doc_id, count(*) AS n_grams,
         |  ${sqlFixedAvg("prob", 6)} AS avg_prob,
         |  ${sqlPround("min(prob)", 6)} AS min_prob
         |FROM g JOIN m USING (g)
         |GROUP BY 1""".stripMargin,

    "h15_chunk_tokens" ->
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |n AS (SELECT doc_id, tok, len(tok) AS n FROM t WHERE len(tok) > 0)
         |SELECT doc_id, s // 48 AS chunk_id, s AS start_token,
         |  least(64, n - s) AS n_tokens,
         |  array_to_string(tok[s + 1 : s + 64], ' ') AS chunk_text
         |FROM n, LATERAL unnest(range(0, CAST(n AS BIGINT), 48)) AS u(s)""".stripMargin,

    "h22_keyword_search" ->
      """WITH e AS (
        |  SELECT doc_id, u.term AS term
        |  FROM documents,
        |    LATERAL unnest(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> len(x) > 0)) AS u(term)),
        |p AS (
        |  SELECT doc_id, term, count(*) AS tf FROM e
        |  WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
        |d AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
        |s AS (
        |  SELECT doc_id, count(DISTINCT term) AS hits,
        |    CAST(sum(tf * ((SELECT count(*) FROM documents) - df)) AS BIGINT) AS score,
        |    CAST(sum(tf) AS BIGINT) AS total_tf
        |  FROM p JOIN d USING (term) GROUP BY 1)
        |SELECT doc_id, score, total_tf,
        |  row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        |FROM s WHERE hits = 3
        |QUALIFY rnk <= 20""".stripMargin,

    "h16_tfidf_terms" ->
      """WITH e AS (
        |  SELECT doc_id, u.term AS term
        |  FROM documents,
        |    LATERAL unnest(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> len(x) > 0)) AS u(term)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, term, tf, df,
        |    CAST(tf AS DOUBLE) * (SELECT count(*) FROM documents) / df AS rtfidf
        |  FROM tf JOIN dfq USING (term))
        |SELECT doc_id, term, tf, df, rtfidf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY rtfidf DESC, term) AS rnk
        |FROM sc QUALIFY rnk <= 5""".stripMargin,

    "h17_bigram_stats" ->
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |p AS (
         |  SELECT tok[u.i] AS first_tok, tok[u.i + 1] AS second_tok
         |  FROM t, LATERAL unnest(range(1, len(tok))) AS u(i)
         |  WHERE len(tok) >= 2)
         |SELECT first_tok, second_tok, count(*) AS n
         |FROM p GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin,

    "h18_bpe_train" -> h18OracleSql,
    "h19_bpe_encode" -> h19OracleSql,

    "h9_repetition" ->
      s"""WITH t AS (${tokCte("documents", lower = true)})
         |SELECT doc_id, ${sqlPround(
               s"1.0 - CAST(len(list_distinct($shingle3)) AS DOUBLE) / " +
               "(CASE WHEN len(tok) < 3 THEN 1 ELSE len(tok) - 2 END)", 4)} AS repetition_ratio
         |FROM t""".stripMargin,

    "h20_html_extract" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    '<html><head><title>doc</title><style>p{margin:0} body{color:#222}</style><script type="text/javascript">var tracker = "do-not-ingest";</script></head><body><!-- chrome --><nav><a href="/">Home</a> &gt; <a href="/docs">Docs</a></nav><p>'
         |    || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
         |    || '</p><footer>&copy; stats &amp; figures</footer></body></html>' AS html
         |  FROM documents),
         |x AS (
         |  SELECT doc_id, regexp_replace(regexp_replace(html,
         |    '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->',
         |    ' ', 'g'), '<[^>]*>', ' ', 'g') AS s
         |  FROM w),
         |d AS (
         |  SELECT doc_id, replace(replace(replace(replace(replace(replace(s,
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
         |    '&nbsp;', ' '), '&amp;', '&') AS s
         |  FROM x)
         |SELECT doc_id, trim(regexp_replace(s, '\\s+', ' ', 'g')) AS extracted
         |FROM d""".stripMargin,

    "h21_quality_classifier" -> {
      val stop = TextFunctions.stopwordsEn.map("'" + _ + "'")
        .mkString("[", ",", "]")
      val quality = sqlPround(
        """0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
          | + 0.3 * (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
          | + 0.3 * least(CAST(n_stopwords AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 5.0, 1.0)"""
          .stripMargin.replace("\n", ""), 4)
      s"""WITH t AS (${tokCte("documents", lower = true)}),
         |m AS (
         |  SELECT doc_id, text, tok, len(tok) AS n_tokens,
         |    len(list_filter(tok, x -> list_contains($stop, x))) AS n_stopwords,
         |    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
         |  FROM t),
         |lab AS (SELECT doc_id, tok, ($quality >= 0.5) AS y FROM m),
         |occ AS (
         |  SELECT doc_id, y, u.tk FROM lab, LATERAL unnest(tok) AS u(tk)),
         |cnt AS (
         |  SELECT tk, sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
         |    sum(CASE WHEN y THEN 0 ELSE 1 END) AS neg
         |  FROM occ WHERE doc_id % 2 = 0 GROUP BY 1),
         |v AS (SELECT * FROM cnt ORDER BY pos + neg DESC, tk LIMIT 256),
         |tt AS (
         |  SELECT greatest(coalesce(sum(pos), 0), 1) AS pt,
         |    greatest(coalesce(sum(neg), 0), 1) AS nt
         |  FROM v),
         |sc AS (
         |  SELECT occ.doc_id, count(*) AS n_tok,
         |    coalesce(sum(CAST(v.pos AS HUGEINT) * tt.nt
         |      - CAST(v.neg AS HUGEINT) * tt.pt), 0) AS ev
         |  FROM occ LEFT JOIN v ON occ.tk = v.tk CROSS JOIN tt
         |  GROUP BY occ.doc_id)
         |SELECT doc_id, n_tok,
         |  ${sqlPround("CAST(ev AS DOUBLE) / (CAST((SELECT pt FROM tt) AS DOUBLE)" +
             " * CAST((SELECT nt FROM tt) AS DOUBLE) * CAST(n_tok AS DOUBLE))", 6)} AS evidence,
         |  CASE WHEN ev > 0 THEN 1 ELSE 0 END AS predicted
         |FROM sc""".stripMargin
    },

    "h12_top_ngrams" ->
      s"""WITH t AS (${tokCte("documents", lower = true)}),
         |e AS (SELECT lang, unnest(list_distinct($shingle3)) AS ngram FROM t),
         |c AS (SELECT lang, ngram, count(*) AS n_docs FROM e GROUP BY 1, 2)
         |SELECT lang, ngram, n_docs,
         |  row_number() OVER (PARTITION BY lang ORDER BY n_docs DESC, ngram) AS rnk
         |FROM c QUALIFY rnk <= 10""".stripMargin,

    "f6_label_centroids" ->
      s"""WITH e AS (
         |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |x AS (
         |  SELECT label, g.i - 1 AS pos, v[g.i] AS x
         |  FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g)
         |SELECT label, pos,
         |  ${sqlPround(
              "CAST(SUM(CAST(floor(x * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)" +
              " / 1000000000000.0 / COUNT(*)", 6)} AS mean_x,
         |  COUNT(*) AS n_vecs
         |FROM x GROUP BY 1, 2""".stripMargin,

    "f7_embedding_quantize" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS sc FROM e)
         |SELECT vec_id,
         |  ${sqlPround("sc", 6)} AS scale,
         |  array_to_string(list_transform(v, x ->
         |    CAST(CASE WHEN sc = 0 THEN 0 ELSE floor(x / sc * 127 + 0.5) END AS BIGINT)), ',') AS q_csv,
         |  ${sqlPround(
              "list_max(list_transform(v, x -> CASE WHEN sc = 0 THEN 0.0" +
              " ELSE abs(x - floor(x / sc * 127 + 0.5) * sc / 127) END))", 6)} AS max_err
         |FROM s""".stripMargin,

    "f13_embedding_stats" -> {
      val m = "CAST(sx AS DOUBLE) / 100000000.0 / n"
      s"""WITH e AS (
         |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |xs AS (
         |  SELECT CAST(u.d AS INT) AS dim, v[CAST(u.d AS INT) + 1] AS x
         |  FROM e, LATERAL unnest(range(0, len(v))) AS u(d)),
         |a AS (
         |  SELECT dim, count(*) AS n,
         |    sum(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT)) AS sx,
         |    sum(CAST(floor(x * x * 100000000.0 + 0.5) AS BIGINT)) AS sxx,
         |    min(x) AS mn0, max(x) AS mx0
         |  FROM xs GROUP BY dim)
         |SELECT dim,
         |  ${sqlPround(m, 6)} AS mean,
         |  ${sqlPround(s"sqrt(greatest(0.0, CAST(sxx AS DOUBLE) / 100000000.0 / n - ($m) * ($m)))", 6)} AS std,
         |  ${sqlPround("mn0", 6)} AS mn,
         |  ${sqlPround("mx0", 6)} AS mx
         |FROM a""".stripMargin
    },

    "f16_embedding_drift" -> {
      val den = "CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE) * 100000000.0"
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |xs AS (
         |  SELECT vec_id, label, CAST(u.d AS INT) AS dim,
         |    v[CAST(u.d AS INT) + 1] AS x
         |  FROM e, LATERAL unnest(range(0, len(v))) AS u(d)),
         |r AS (SELECT label, dim,
         |        sum(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT)) AS rs,
         |        count(*) AS rn
         |      FROM xs WHERE vec_id % 2 = 0 GROUP BY 1, 2),
         |c AS (SELECT label, dim,
         |        sum(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT)) AS cs,
         |        count(*) AS cn
         |      FROM xs WHERE vec_id % 2 = 1 GROUP BY 1, 2),
         |j AS (SELECT label, dim,
         |        abs(CAST(rs AS HUGEINT) * cn - CAST(cs AS HUGEINT) * rn) AS d,
         |        rn, cn
         |      FROM r JOIN c USING (label, dim)),
         |a AS (SELECT label, CAST(max(rn) AS BIGINT) AS n_ref,
         |        CAST(max(cn) AS BIGINT) AS n_cur,
         |        CAST(count(*) AS BIGINT) AS n_dims,
         |        sum(d) AS l1, max(d) AS mx
         |      FROM j GROUP BY 1)
         |SELECT label, n_ref, n_cur, n_dims,
         |  ${sqlPround(s"CAST(l1 AS DOUBLE) / ($den)", 6)} AS l1_shift,
         |  ${sqlPround(s"CAST(mx AS DOUBLE) / ($den)", 6)} AS max_dim_shift
         |FROM a""".stripMargin
    },

    "f14_quantize_per_dim" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |xs AS (
         |  SELECT vec_id, CAST(u.d AS INT) AS dim, v[CAST(u.d AS INT) + 1] AS x
         |  FROM e, LATERAL unnest(range(0, len(v))) AS u(d)),
         |sc AS (
         |  SELECT dim, greatest(abs(${sqlPround("min(x)", 6)}),
         |                       abs(${sqlPround("max(x)", 6)})) AS s
         |  FROM xs GROUP BY dim),
         |q AS (
         |  SELECT vec_id, dim, x, s,
         |    CASE WHEN s = 0 THEN 0
         |         ELSE CAST(floor(x / s * 127 + 0.5) AS BIGINT) END AS c
         |  FROM xs JOIN sc USING (dim))
         |SELECT vec_id,
         |  array_to_string(list(CAST(c AS VARCHAR) ORDER BY dim), ',') AS q_csv,
         |  ${sqlPround("max(CASE WHEN s = 0 THEN 0.0 ELSE abs(x - c * s / 127) END)", 6)} AS max_err
         |FROM q GROUP BY vec_id""".stripMargin,

    "f8_ann_quantized" ->
      s"""WITH e AS (
         |  SELECT vec_id,
         |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         |         (a, b) -> a + b)) AS nrm,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM e
         |), z AS (
         |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS sc FROM n
         |), dq AS (
         |  SELECT vec_id, list_transform(v, x ->
         |    CAST(CASE WHEN sc = 0 THEN 0 ELSE floor(x / sc * 127 + 0.5) END AS BIGINT)
         |      * ${sqlPround("sc", 6)} / 127) AS cv
         |  FROM z
         |), q AS (
         |  SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id % 100 = 0
         |), s AS (
         |  SELECT query_id, c.vec_id AS nn_id,
         |    PROUND_DOT AS cosine
         |  FROM q JOIN dq c ON c.vec_id <> q.query_id
         |)
         |SELECT query_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank,
         |  nn_id, cosine
         |FROM s QUALIFY rank <= 5""".stripMargin
        .replace("PROUND_DOT", sqlPround(
          "list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.cv[i]), (x, y) -> x + y)", 6)),

    // the PQ searcher's generous-shortlist spelling provably equals
    // exact brute force (deterministic training; verified per-SF), so
    // the exact oracle checks the full PQ machinery
    "f9_ann_pq" -> f1OracleSql,

    // same contract for the IVFADC composition at full probe
    "f10_ann_ivf_pq" -> f1OracleSql,

    "k6_pack_sequences" ->
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |d AS (SELECT doc_id, lang, len(tok) AS n_tokens FROM t),
         |c AS (SELECT *,
         |  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id)
         |    AS BIGINT) - n_tokens AS st FROM d)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(floor(st / 2048.0) AS BIGINT) AS seq_id,
         |  st % 2048 AS seq_offset
         |FROM c""".stripMargin,

    "k6b_pack_nosplit" ->
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |d AS (SELECT doc_id, lang, len(tok) AS n_tokens FROM t),
         |c AS (SELECT *, greatest(CAST(1 AS BIGINT), least(CAST(512 AS BIGINT),
         |  CAST(floor(512.0 / greatest(n_tokens, 1)) AS BIGINT))) AS bin_cap FROM d),
         |r AS (SELECT *, CAST(row_number() OVER (
         |    PARTITION BY lang, bin_cap ORDER BY n_tokens DESC, doc_id)
         |  AS BIGINT) - 1 AS rr FROM c)
         |SELECT doc_id, lang, n_tokens, bin_cap,
         |  bin_cap * 1099511627776 + CAST(floor(rr / CAST(bin_cap AS DOUBLE)) AS BIGINT) AS seq_id,
         |  rr % bin_cap AS bin_pos
         |FROM r""".stripMargin,

    "dq2_outliers" ->
      """WITH v AS (
        |  SELECT user_id, event_id, value,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vf
        |  FROM events),
        |st AS (
        |  SELECT user_id, count(*) AS n,
        |    sum(CAST(vf AS HUGEINT)) AS s,
        |    sum(CAST(vf AS HUGEINT) * CAST(vf AS HUGEINT)) AS q
        |  FROM v GROUP BY 1 HAVING count(*) >= 2)
        |SELECT v.user_id, v.event_id, v.value
        |FROM v JOIN st USING (user_id)
        |WHERE (CAST(vf AS HUGEINT) * n - s) * (CAST(vf AS HUGEINT) * n - s)
        |      > 9 * (n * q - s * s)""".stripMargin,

    "dq3_mad_outliers" ->
      s"""WITH med AS (
         |  SELECT user_id, ${sqlPround("quantile_cont(value, 0.5)", 2)} AS med
         |  FROM events GROUP BY 1),
         |dev AS (
         |  SELECT e.user_id, event_id, value, med, abs(value - med) AS ad
         |  FROM events e JOIN med USING (user_id)),
         |mad AS (
         |  SELECT user_id, ${sqlPround("quantile_cont(ad, 0.5)", 2)} AS mad
         |  FROM dev GROUP BY 1)
         |SELECT d.user_id, event_id, value, med, mad
         |FROM dev d JOIN mad USING (user_id)
         |WHERE mad > 0 AND ad > 3.0 * mad""".stripMargin,

    // dq3b: the same flag algebra with BOTH medians replayed through
    // the b12 fixed-bin pick (lo 0, width 1, 600 bins, clamped edges)
    "dq3b_mad_hist" -> {
      def pick(as: String): String =
        s"min_by(${sqlPround("0.0 + (bin + (ceil(n * 0.5) - (cum - cnt)) / cnt) * 1.0", 4)}, bin) " +
          s"FILTER (WHERE cum >= ceil(n * 0.5)) AS $as"
      s"""WITH h AS (
         |  SELECT user_id,
         |    CAST(least(greatest(floor((value - 0.0) / 1.0), 0), 599) AS BIGINT) AS bin,
         |    count(*) AS cnt
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |c AS (
         |  SELECT *, sum(cnt) OVER (PARTITION BY user_id) AS n,
         |    sum(cnt) OVER (PARTITION BY user_id ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM h),
         |med AS (SELECT user_id, ${pick("med")} FROM c GROUP BY 1),
         |dev AS (
         |  SELECT e.user_id, event_id, value, med, abs(value - med) AS ad
         |  FROM events e JOIN med USING (user_id)
         |  WHERE value IS NOT NULL),
         |h2 AS (
         |  SELECT user_id,
         |    CAST(least(greatest(floor((ad - 0.0) / 1.0), 0), 599) AS BIGINT) AS bin,
         |    count(*) AS cnt
         |  FROM dev GROUP BY 1, 2),
         |c2 AS (
         |  SELECT *, sum(cnt) OVER (PARTITION BY user_id) AS n,
         |    sum(cnt) OVER (PARTITION BY user_id ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM h2),
         |mad AS (SELECT user_id, ${pick("mad")} FROM c2 GROUP BY 1)
         |SELECT d.user_id, event_id, value, med, mad
         |FROM dev d JOIN mad USING (user_id)
         |WHERE mad > 0 AND ad > 3.0 * mad""".stripMargin
    },

    "g6_shard_pack" ->
      """WITH c AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_chars AS BIGINT) AS bfr
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang, n_chars AS n_bytes,
        |    CAST(floor(bfr / 4096) AS BIGINT) AS shard_id, bfr
        |  FROM c)
        |SELECT doc_id, lang, shard_id,
        |  CAST(bfr - min(bfr) OVER (PARTITION BY lang, shard_id) AS BIGINT)
        |    AS shard_offset,
        |  n_bytes
        |FROM s""".stripMargin,

    "dq6_freshness" ->
      """WITH m AS (
        |  SELECT event_type, max(ts) AS max_loaded_at FROM events GROUP BY 1),
        |l AS (
        |  SELECT event_type, max_loaded_at,
        |    (epoch_us(TIMESTAMP '2024-02-01 00:00:00')
        |     - epoch_us(CAST(max_loaded_at AS TIMESTAMP))) // 1000000 AS lag_seconds
        |  FROM m)
        |SELECT event_type, max_loaded_at, lag_seconds,
        |  CASE WHEN lag_seconds > 864000 THEN 'error'
        |       WHEN lag_seconds > 259200 THEN 'warn'
        |       ELSE 'ok' END AS status
        |FROM l""".stripMargin,

    "dq5_profile" -> {
      val cols = Seq(("l_quantity", 4), ("l_extendedprice", 4),
        ("l_discount", 6), ("l_tax", 6))
      def p(sc: Int) = s"${math.pow(10, sc).toLong}.0"
      def prof(tag: String, src: String) = cols.map { case (c, sc) =>
        s"""SELECT '$c' AS col_name, count($c) AS n_$tag,
           |    CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$tag,
           |    min(CAST($c AS DOUBLE)) AS min_$tag,
           |    max(CAST($c AS DOUBLE)) AS max_$tag,
           |    sum(CAST(floor($c * ${p(sc)} + 0.5) AS BIGINT)) AS fs_$tag
           |  FROM $src""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      val scaleRows = cols.map { case (c, sc) => s"('$c', ${p(sc)})" }
        .mkString(", ")
      s"""WITH rsrc AS (SELECT * FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-07-01'),
         |csrc AS (SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-07-01'),
         |r AS (
         |  ${prof("ref", "rsrc")}),
         |c AS (
         |  ${prof("cur", "csrc")}),
         |s(col_name, p) AS (VALUES $scaleRows)
         |SELECT col_name, n_ref, n_cur, nulls_ref, nulls_cur,
         |  min_ref, min_cur, max_ref, max_cur,
         |  CASE WHEN n_ref > 0 THEN ${sqlPround("CAST(fs_ref AS DOUBLE) / p / n_ref", 6)} END AS mean_ref,
         |  CASE WHEN n_cur > 0 THEN ${sqlPround("CAST(fs_cur AS DOUBLE) / p / n_cur", 6)} END AS mean_cur,
         |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN ${sqlPround(
              "CAST(fs_cur * n_ref - fs_ref * n_cur AS DOUBLE) / p / n_ref / n_cur", 6)} END AS mean_shift
         |FROM r JOIN c USING (col_name) JOIN s USING (col_name)""".stripMargin
    },

    "k9_rebalance" ->
      """WITH w(lang, w) AS (VALUES ('en', 2), ('de', 1), ('fr', 1)),
        |cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT min(coalesce(cnt.n, 0) // w.w) AS t
        |      FROM w LEFT JOIN cnt USING (lang)),
        |r AS (
        |  SELECT d.lang, d.doc_id, w.w,
        |    row_number() OVER (PARTITION BY d.lang
        |      ORDER BY md5(concat(CAST(d.doc_id AS VARCHAR), '|mix1')),
        |               d.doc_id) AS rn
        |  FROM documents d JOIN w USING (lang))
        |SELECT lang, doc_id FROM r, t WHERE rn <= w * t.t""".stripMargin,

    "h24_url_canonical" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'HTTPS://Example'
         |      WHEN 1 THEN 'http://EXAMPLE' ELSE 'no-scheme-example' END
         |    || CAST(doc_id % 50 AS VARCHAR)
         |    || CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN '.COM:443'
         |         WHEN 1 THEN '.com:80' ELSE '.com' END
         |    || '/Path/' || CAST(doc_id AS VARCHAR)
         |    || '?utm_source=x&b=2&a=1&fbclid=zz&z='
         |    || CAST(doc_id % 7 AS VARCHAR) || '#frag' AS url
         |  FROM documents),
         |p1 AS (
         |  SELECT doc_id, url, trim(url) AS tu,
         |    lower(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS a
         |  FROM u),
         |p2 AS (
         |  SELECT *, lower(regexp_extract(a, '^([^/?#]*)', 1)) AS hostport,
         |    regexp_replace(a, '^[^/?#]*', '') AS pqf
         |  FROM p1),
         |p3 AS (
         |  SELECT *,
         |    CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
         |           THEN regexp_replace(hostport, ':80$$', '')
         |         WHEN scheme = 'https' AND hostport LIKE '%:443'
         |           THEN regexp_replace(hostport, ':443$$', '')
         |         ELSE hostport END AS host,
         |    regexp_extract(pqf, '^([^?#]*)', 1) AS path,
         |    regexp_extract(pqf, '^[^?#]*\\?([^#]*)', 1) AS query
         |  FROM p2),
         |p4 AS (
         |  SELECT *, array_to_string(list_sort(list_filter(
         |      string_split(query, '&'),
         |      x -> len(x) > 0 AND NOT regexp_matches(x,
         |        '^(utm_[A-Za-z0-9_]*|fbclid|gclid)='))), '&') AS kept
         |  FROM p3)
         |SELECT doc_id, url,
         |  CASE WHEN len(scheme) > 0 THEN scheme || '://' || host || path
         |    || CASE WHEN len(kept) > 0 THEN '?' || kept ELSE '' END
         |  ELSE tu END AS canonical_url
         |FROM p4""".stripMargin,

    "h25_line_filter" -> {
      val nav = TextFunctions.navLineRe
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'Home' || chr(10) || 'About Us' || chr(10)
         |    || 'Copyright 2024 Example Corp' || chr(10)
         |    || substr(text, 1, 60) || chr(10)
         |    || 'menu' || chr(10) || 'short line' || chr(10)
         |    || substr(text, 61, 60) AS t
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    list_filter(string_split(t, chr(10)), l ->
         |      len(list_filter(string_split_regex(trim(l), '\\s+'),
         |          x -> len(x) > 0)) >= 3
         |      AND NOT regexp_matches(lower(trim(l)), '$nav')) AS keep,
         |    len(string_split(t, chr(10))) AS total
         |  FROM u)
         |SELECT doc_id, array_to_string(keep, chr(10)) AS clean_text,
         |  len(keep) AS n_kept, total - len(keep) AS n_dropped
         |FROM f""".stripMargin
    },

    "h23_nfc_normalize" ->
      s"""WITH x AS (
         |  SELECT doc_id,
         |    substr(text, 1, 40) || ' cafe' || chr(769) || ' A' || chr(778)
         |      || 'ngstro' || chr(776) || 'm ' || chr(8491) || ' '
         |      || substr(text, 41, 20) AS dirty
         |  FROM documents)
         |SELECT doc_id, nfc_normalize(dirty) AS norm_text,
         |  length(dirty) - length(nfc_normalize(dirty)) AS n_composed
         |FROM x""".stripMargin,

    "dq4_drift" ->
      s"""WITH b AS (
         |  SELECT event_type, ts,
         |    CASE WHEN value < 0.0 THEN 0
         |         WHEN value >= 500.0 THEN 21
         |         ELSE CAST(floor((value - 0.0) / 25.0) AS INT) + 1 END AS bucket
         |  FROM events WHERE value IS NOT NULL),
         |r AS (SELECT event_type, bucket, count(*) AS nr FROM b
         |      WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1, 2),
         |c AS (SELECT event_type, bucket, count(*) AS nc FROM b
         |      WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1, 2),
         |j AS (SELECT event_type, bucket, coalesce(nr, 0) AS rr,
         |        coalesce(nc, 0) AS cc
         |      FROM r FULL JOIN c USING (event_type, bucket)),
         |t AS (SELECT event_type, rr, cc,
         |        sum(rr) OVER (PARTITION BY event_type) AS tr,
         |        sum(cc) OVER (PARTITION BY event_type) AS tc,
         |        sum(rr) OVER (PARTITION BY event_type ORDER BY bucket
         |          ROWS UNBOUNDED PRECEDING) AS crr,
         |        sum(cc) OVER (PARTITION BY event_type ORDER BY bucket
         |          ROWS UNBOUNDED PRECEDING) AS ccc FROM j),
         |a AS (SELECT event_type,
         |        CAST(max(tr) AS BIGINT) AS n_ref,
         |        CAST(max(tc) AS BIGINT) AS n_cur,
         |        sum(abs(CAST(rr AS HUGEINT) * tc - CAST(cc AS HUGEINT) * tr)) AS s,
         |        max(abs(CAST(rr AS HUGEINT) * tc - CAST(cc AS HUGEINT) * tr)) AS m,
         |        max(abs(CAST(crr AS HUGEINT) * tc - CAST(ccc AS HUGEINT) * tr)) AS ks
         |      FROM t GROUP BY 1)
         |SELECT event_type, n_ref, n_cur,
         |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1.0
         |    ELSE ${sqlPround("CAST(s AS DOUBLE) / (2.0 * CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))", 6)} END AS tv_dist,
         |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1.0
         |    ELSE ${sqlPround("CAST(m AS DOUBLE) / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))", 6)} END AS max_bin_delta,
         |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1.0
         |    ELSE ${sqlPround("CAST(ks AS DOUBLE) / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))", 6)} END AS ks_stat
         |FROM a""".stripMargin,

    "dq1_checks" ->
      """SELECT 'not_null_user_id' AS check_name, count(*) AS n_violations, count(*) = 0 AS passed
        |FROM events WHERE user_id IS NULL
        |UNION ALL
        |SELECT 'not_null_ts', count(*), count(*) = 0 FROM events WHERE ts IS NULL
        |UNION ALL
        |SELECT 'not_null_value', count(*), count(*) = 0 FROM events WHERE value IS NULL
        |UNION ALL
        |SELECT 'accepted_values_event_type', count(*), count(*) = 0 FROM events
        |WHERE event_type IS NOT NULL
        |  AND event_type NOT IN ('view', 'click', 'signup', 'error', 'purchase')
        |UNION ALL
        |SELECT 'unique_event_id', count(*), count(*) = 0
        |FROM (SELECT event_id FROM events WHERE event_id IS NOT NULL
        |      GROUP BY event_id HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'relationships_user_id', count(*), count(*) = 0 FROM events
        |WHERE user_id IS NOT NULL AND user_id NOT IN (SELECT c_custkey FROM customer)""".stripMargin,

    "h10_interdup" ->
      s"""WITH t AS (${tokCte("documents", lower = true)}),
         |s AS (SELECT doc_id, list_distinct($shingle3) AS shs FROM t
         |      WHERE doc_id IS NOT NULL),
         |e AS (SELECT doc_id AS doc, unnest(shs) AS sh FROM s),
         |d AS (SELECT sh, count(*) AS df FROM e GROUP BY 1)
         |SELECT e.doc AS doc_id, count(*) AS n_sh,
         |  count(*) FILTER (WHERE d.df > 1) AS n_shared,
         |  ${sqlPround("CAST(count(*) FILTER (WHERE d.df > 1) AS DOUBLE) / count(*)", 4)} AS shared_ratio
         |FROM e JOIN d USING (sh)
         |GROUP BY e.doc""".stripMargin,

    "h11_source_mix" -> {
      val stop = TextFunctions.stopwordsEn.map("'" + _ + "'").mkString("[", ",", "]")
      val quality = sqlPround(
        """0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
          | + 0.3 * (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
          | + 0.3 * least(CAST(n_stopwords AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 5.0, 1.0)"""
          .stripMargin.replace("\n", ""), 4)
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |m AS (
         |  SELECT source, lang, text, len(tok) AS n_tokens,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        x -> len(x) > 0 AND list_contains($stop, x))) AS n_stopwords,
         |    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
         |  FROM t),
         |q AS (SELECT source, lang, n_tokens, $quality AS q FROM m),
         |g AS (
         |  SELECT source, lang, count(*) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |    ${sqlFixedAvg("q", 4)} AS avg_quality
         |  FROM q GROUP BY 1, 2)
         |SELECT source, lang, n_docs, n_tokens, avg_quality,
         |  ${sqlPround("CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)", 6)} AS token_share
         |FROM g""".stripMargin
    },

    "k4_token_budget" -> {
      val stop = TextFunctions.stopwordsEn.map("'" + _ + "'").mkString("[", ",", "]")
      val quality = sqlPround(
        """0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
          | + 0.3 * (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
          | + 0.3 * least(CAST(n_stopwords AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 5.0, 1.0)"""
          .stripMargin.replace("\n", ""), 4)
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |m AS (
         |  SELECT doc_id, lang, text, len(tok) AS n_tokens,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        x -> len(x) > 0 AND list_contains($stop, x))) AS n_stopwords,
         |    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
         |  FROM t),
         |scored AS (SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  $quality AS quality_score FROM m),
         |r AS (
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang
         |    ORDER BY quality_score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM scored)
         |SELECT doc_id, lang, n_tokens, quality_score, cum_tokens
         |FROM r WHERE cum_tokens <= 3000""".stripMargin
    },

    "k1_hash_sample" ->
      """SELECT doc_id, lang,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        |FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 37""".stripMargin,

    "k2_quota_sample" -> quotaOracleSql,
    "k3_quota_native" -> quotaOracleSql,

    "k7_priority_sample" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY md5(concat(CAST(doc_id AS VARCHAR), '|s1')), doc_id) <= 50""".stripMargin,

    "k8_curriculum" ->
      s"""WITH t AS (${tokCte("documents", lower = false)}),
         |m AS (
         |  SELECT doc_id, text, len(tok) AS n_tokens,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        x -> len(x) > 0 AND list_contains(${TextFunctions.stopwordsEn.map("'" + _ + "'").mkString("[", ",", "]")}, x))) AS n_stopwords,
         |    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
         |  FROM t),
         |s AS (
         |  SELECT doc_id,
         |    ${sqlPround(
              """0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
                | + 0.3 * (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
                | + 0.3 * least(CAST(n_stopwords AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 5.0, 1.0)"""
                .stripMargin.replace("\n", ""), 4)} AS quality_score
         |  FROM m)
         |SELECT doc_id, quality_score,
         |  row_number() OVER (ORDER BY quality_score DESC, doc_id) AS rank,
         |  CAST(ntile(10) OVER (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS phase
         |FROM s""".stripMargin
  )

  /** The SQL-TVF spellings share their Scala originals' oracles — one
    * code path on the Spark side, one oracle on the DuckDB side. Built
    * against the map above, so a renamed original fails loudly here. */
  private lazy val sqlMirrorOracles: Map[String, String] = {
    val base = baseOracleSql
    Map(
      "c9s_funnel_sql" -> "c9_funnel",
      "c10s_retention_sql" -> "c10_retention",
      "d5s_sessionize_sql" -> "d5_sessionize",
      "d6s_asof_sql" -> "d6_asof_join",
      "d29s_asof_tolerance_sql" -> "d29_asof_tolerance",
      "b6s_gapfill_sql" -> "b6_gapfill_locf",
      "c5s_dedup_latest_sql" -> "c5_dedup_upsert_latest",
      "d7s_range_join_sql" -> "d7_range_join",
      "b28s_uptime_sql" -> "b28_uptime",
      "b27s_candlestick_sql" -> "b27_candlestick",
      "d8s_topk_sql" -> "d8_topk_native",
      "dq4s_drift_sql" -> "dq4_drift",
      "f16s_embedding_drift_sql" -> "f16_embedding_drift",
      "d30s_bloom_join_sql" -> "d30_bloom_pruned_join",
      "h20s_html_sql" -> "h20_html_extract",
      "h21s_evidence_sql" -> "h21_quality_classifier",
      "b34s_ewma_sql" -> "b34_ewma",
      "b35s_autocorr_sql" -> "b35_autocorr",
      "c11s_transitions_sql" -> "c11_transitions",
      "c12s_attribution_sql" -> "c12_attribution",
      "h22s_keyword_sql" -> "h22_keyword_search",
      "k8s_curriculum_sql" -> "k8_curriculum",
      "b36s_twa_sql" -> "b36_twa_interpolated",
      "k9s_rebalance_sql" -> "k9_rebalance",
      "dq5s_profile_sql" -> "dq5_profile",
      "c13s_paths_sql" -> "c13_top_paths",
      "c14s_stickiness_sql" -> "c14_stickiness",
      "d32s_asof_forward_sql" -> "d32_asof_forward",
      "g6s_shard_pack_sql" -> "g6_shard_pack",
      "dq6s_freshness_sql" -> "dq6_freshness",
      "b37s_top_gaps_sql" -> "b37_top_gaps",
      "c15s_cohort_value_sql" -> "c15_cohort_value",
      "f17s_knn_sql" -> "f17_knn_classify",
      "c16s_funnel_times_sql" -> "c16_funnel_times",
      "b38s_asap_sql" -> "b38_asap_smooth",
      "c17s_growth_sql" -> "c17_growth",
      "c18s_streaks_sql" -> "c18_streaks",
      "c19s_rfm_sql" -> "c19_rfm",
      "dq7s_anomalies_sql" -> "dq7_anomalies",
      "h26s_readability_sql" -> "h26_readability",
      "k10s_temperature_sql" -> "k10_temperature_sample",
      "b39s_seasonal_sql" -> "b39_seasonal",
      "f18s_matryoshka_sql" -> "f18_ann_matryoshka",
      "dq8s_completeness_sql" -> "dq8_completeness",
      "g7s_scene_cuts_sql" -> "g7_scene_cuts",
      "f19s_mmr_sql" -> "f19_ann_mmr",
      "b40s_instant_rate_sql" -> "b40_instant_rate",
      "h27s_line_dedup_sql" -> "h27_line_dedup",
      "d33s_interval_lookup_sql" -> "d33_interval_lookup",
      "dq9s_cusum_sql" -> "dq9_cusum",
      "k11s_zorder_sql" -> "k11_zorder",
      "h28s_link_rank_sql" -> "h28_link_rank",
      "l1s_components_sql" -> "l1_components",
      "l2s_copurchase_sql" -> "l2_copurchase",
      "l3s_triangles_sql" -> "l3_triangles",
      "l4s_personalized_rank_sql" -> "l4_personalized_rank",
      "l5s_weighted_rank_sql" -> "l5_weighted_rank",
      "l6s_kcore_sql" -> "l6_kcore",
      "l13s_scc_sql" -> "l13_scc",
      "l14s_condense_sql" -> "l14_condense",
      "c20s_golden_record_sql" -> "c20_golden_record",
      "dq12s_benford_sql" -> "dq12_benford",
      "dq13s_fd_sql" -> "dq13_fd_check",
      "dq14s_key_skew_sql" -> "dq14_key_skew",
      "l7s_neighbor_jaccard_sql" -> "l7_neighbor_jaccard",
      "l10s_hits_sql" -> "l10_hits",
      "e12s_containment_sql" -> "e12_dedup_containment",
      "c22s_multi_touch_sql" -> "c22_multi_touch",
      "c23s_markov_sql" -> "c23_markov_attribution",
      "dq15s_ab_test_sql" -> "dq15_ab_test",
      "k12s_dsir_sql" -> "k12_dsir_select",
      "f20s_kmeans_sql" -> "f20_kmeans",
      "f21s_semdedup_sql" -> "f21_semdedup",
      "f22s_rank_eval_sql" -> "f22_ann_rank_eval",
      "b42s_kmv_setops_sql" -> "b42_distinct_setops",
      "b9bs_hll_portable_sql" -> "b9b_hll_portable",
      "l11s_communities_sql" -> "l11_communities",
      "l12s_modularity_sql" -> "l12_modularity",
      "e13s_soft_dedup_sql" -> "e13_soft_dedup",
      "k13s_weighted_thin_sql" -> "k13_weighted_thin",
      "dq17s_t_closeness_sql" -> "dq17_t_closeness"
    ).map { case (mirror, orig) => mirror -> base(orig) }
  }

  /** Shared by k2 (window) and k3 (custom TopKPerKey operator) — one
    * oracle, two physical strategies. */
  private lazy val quotaOracleSql: String = {
      val stop = TextFunctions.stopwordsEn.map("'" + _ + "'").mkString("[", ",", "]")
      val quality = sqlPround(
        """0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
          | + 0.3 * (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
          | + 0.3 * least(CAST(n_stopwords AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) * 5.0, 1.0)"""
          .stripMargin.replace("\n", ""), 4)
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |    list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS tok,
         |    list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS ltok
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang, text, len(tok) AS n_tokens,
         |    len(list_filter(ltok, x -> list_contains($stop, x))) AS n_stopwords,
         |    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
         |  FROM t),
         |scored AS (SELECT doc_id, lang, $quality AS quality_score FROM m),
         |ranked AS (SELECT *, row_number() OVER (
         |    PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS rk
         |  FROM scored)
         |SELECT doc_id, lang, quality_score FROM ranked WHERE rk <= 50""".stripMargin
  }

  /** e6's connected-components oracle, as a val so k5's leakage-safe
    * split can embed it as a subquery. */
  /** l1/l2/l3 oracle base: the distinct (order, part) within-basket
    * self-join, parameterized by the support floor. */
  private def copurchaseOracleSql(minSupport: Int): String =
    s"""SELECT item_a, item_b, support FROM (
       |  SELECT a.it AS item_a, b.it AS item_b, count(*) AS support
       |  FROM (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem) a
       |  JOIN (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem) b
       |    ON a.bk = b.bk AND a.it < b.it
       |  GROUP BY 1, 2)
       |WHERE support >= $minSupport""".stripMargin

  private lazy val e6OracleSql: String =
    s"""WITH RECURSIVE pairs AS ($e2OracleSql),
       |edges AS (
       |  SELECT doc_a AS x, doc_b AS y FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |cc(id, label) AS (
       |  SELECT DISTINCT x, x FROM edges
       |  UNION
       |  SELECT e.x, c.label FROM edges e JOIN cc c ON c.id = e.y)
       |SELECT id AS doc_id, min(label) AS cluster_id FROM cc GROUP BY id""".stripMargin

  private lazy val b1OracleSql: String =
    s"""SELECT user_id, strftime(ts, '%Y%m%d') AS day,
       |${sqlFixedSum("value", 4)} AS value_sum, count(*) AS n_events
       |FROM events GROUP BY 1, 2""".stripMargin

  /** f1/f2/f3 oracle bodies as vals so f4's recall report can embed
    * them end-to-end as subqueries. */
  private lazy val f1OracleSql: String =
      """WITH e AS (
        |  SELECT vec_id,
        |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, b) -> a + b)) AS nrm,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM e
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id % 100 = 0
        |), s AS (
        |  SELECT query_id, c.vec_id AS nn_id,
        |    PROUND_DOT AS cosine
        |  FROM q JOIN n c ON c.vec_id <> q.query_id
        |)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank,
        |  nn_id, cosine
        |FROM s QUALIFY rank <= 5""".stripMargin
        .replace("PROUND_DOT", sqlPround(
          "list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.v[i]), (x, y) -> x + y)", 6))

  private lazy val f2OracleSql: String = {
      // the SAME deterministic hyperplane literals the operator ships to
      // executors, embedded as SQL arrays (Double.toString round-trips
      // exactly, so both engines compare the identical doubles to 0)
      val ps = graft.operators.Similarity.planes(8, 64)
      def planeArr(p: Int): String = ps(p).map(_.toString).mkString("[", ", ", "]")
      val bucket = (0 until 8).map(p =>
        s"(CASE WHEN list_reduce(list_transform(generate_series(1, len(v)), i -> v[i] * ${planeArr(p)}[i]), (x, y) -> x + y) > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString("\n|    + ")
      s"""WITH e AS (
         |  SELECT vec_id,
         |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         |         (a, b) -> a + b)) AS nrm,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM e
         |), b AS (
         |  SELECT vec_id, v, $bucket AS bucket FROM n
         |), q AS (
         |  SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id % 100 = 0
         |), s AS (
         |  SELECT query_id, c.vec_id AS nn_id,
         |    ${sqlPround("list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.v[i]), (x, y) -> x + y)", 6)} AS cosine
         |  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
         |)
         |SELECT query_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank,
         |  nn_id, cosine
         |FROM s QUALIFY rank <= 5""".stripMargin
  }

  private lazy val f5OracleSql: String = {
      // per-table planes come from the SAME deterministic pool the
      // operator ships (pool row p depends only on p, so table t =
      // rows [8t, 8t+8)), embedded as SQL array literals
      val pool = graft.operators.Similarity.planes(32, 64)
      def planeArr(g: Int): String = pool(g).map(_.toString).mkString("[", ", ", "]")
      def bucketFor(t: Int): String = (0 until 8).map(p =>
        s"(CASE WHEN list_reduce(list_transform(generate_series(1, len(v)), i -> v[i] * ${planeArr(t * 8 + p)}[i]), (x, y) -> x + y) > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString("\n|      + ")
      val tables = (0 until 4).map(t =>
        s"  SELECT vec_id, v, $t AS tb, ${bucketFor(t)} AS bucket FROM n")
        .mkString(" UNION ALL\n")
      s"""WITH e AS (
         |  SELECT vec_id,
         |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         |         (a, b) -> a + b)) AS nrm,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM e
         |), b AS (
         |$tables
         |), q AS (
         |  SELECT vec_id AS query_id, v AS qv, tb, bucket FROM b WHERE vec_id % 100 = 0
         |), s AS (
         |  SELECT DISTINCT q.query_id, c.vec_id AS nn_id,
         |    ${sqlPround("list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.v[i]), (x, y) -> x + y)", 6)} AS cosine
         |  FROM q JOIN b c ON c.tb = q.tb AND c.bucket = q.bucket AND c.vec_id <> q.query_id
         |)
         |SELECT query_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank,
         |  nn_id, cosine
         |FROM s QUALIFY rank <= 5""".stripMargin
  }

  private lazy val f3OracleSql: String = {
      // trained IVF, fully mirrored: the fixed-point Lloyd sums make the
      // k-means deterministic (see Similarity.trainCentroids), so two
      // unrolled iterations in SQL reproduce bit-identical centroids —
      // assignment tie-break (dot DESC, cell DESC) and the sequential
      // fold orders match the Scala/VectorDot arithmetic exactly
      val dot = "list_reduce(list_transform(generate_series(1, 64), i -> %s[i] * %s[i]), (x, y) -> x + y)"
      def iter(prev: String, next: String): String =
        s"""a_$next AS (
           |  SELECT vec_id, v, cell FROM (
           |    SELECT n.vec_id, n.v, $prev.cell,
           |      row_number() OVER (PARTITION BY n.vec_id
           |        ORDER BY ${dot.format("n.v", s"$prev.cv")} DESC, $prev.cell DESC) AS rk
           |    FROM n CROSS JOIN $prev) WHERE rk = 1),
           |s_$next AS (
           |  SELECT cell, g.i AS pos,
           |    CAST(SUM(CAST(floor(v[g.i] * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           |      / 1000000000000.0 / COUNT(*) AS m
           |  FROM a_$next CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
           |  GROUP BY cell, g.i),
           |m_$next AS (
           |  SELECT cell, list(m ORDER BY pos) AS ml FROM s_$next GROUP BY cell),
           |n_$next AS (
           |  SELECT cell, ml,
           |    sqrt(list_reduce(list_transform(ml, x -> x * x), (a, b) -> a + b)) AS nrm
           |  FROM m_$next),
           |$next AS (
           |  SELECT $prev.cell,
           |    CASE WHEN n_$next.cell IS NULL OR n_$next.nrm = 0 THEN $prev.cv
           |         ELSE list_transform(n_$next.ml, x -> x / n_$next.nrm) END AS cv
           |  FROM $prev LEFT JOIN n_$next ON $prev.cell = n_$next.cell)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT vec_id,
         |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         |         (a, b) -> a + b)) AS nrm,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM e0),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, v AS cv
         |  FROM n QUALIFY row_number() OVER (ORDER BY vec_id) <= 16),
         |${iter("c0", "c1")},
         |${iter("c1", "c2")},
         |asn AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT n.vec_id, n.v, c2.cell,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${dot.format("n.v", "c2.cv")} DESC, c2.cell DESC) AS rk
         |    FROM n CROSS JOIN c2) WHERE rk = 1),
         |q AS (
         |  SELECT vec_id AS query_id, v AS qv, cell FROM (
         |    SELECT n.vec_id, n.v, c2.cell,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${dot.format("n.v", "c2.cv")} DESC, c2.cell DESC) AS rk
         |    FROM n CROSS JOIN c2 WHERE n.vec_id % 100 = 0) WHERE rk <= 4),
         |s AS (
         |  SELECT q.query_id, a.vec_id AS nn_id,
         |    ${sqlPround("list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * a.v[i]), (x, y) -> x + y)", 6)} AS cosine
         |  FROM q JOIN asn a ON a.cell = q.cell AND a.vec_id <> q.query_id)
         |SELECT query_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank,
         |  nn_id, cosine
         |FROM s QUALIFY rank <= 5""".stripMargin
  }
}
