package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality checks — the dbt schema-test surface (`unique`,
  * `not_null`, `accepted_values`, `relationships`; dbt reserves
  * `tests/` for them in the reference: dags/dbt_project/dbt_project.yml
  * `test-paths`) re-expressed as declarative aggregations that emit one
  * row per check: `(check_name, n_violations, passed)`.
  *
  * Scale shape: every column-local check (`not_null`,
  * `accepted_values`) on the same table is fused into ONE scan — a
  * single conditional-sum aggregate, no shuffle beyond the final
  * single-row reduction. `unique` needs its own grouped pass (count>1
  * per key), and `relationships` is an anti join that broadcasts the
  * parent's key column when the parent is dimension-sized. Violations
  * are COUNTED, never collected: the report is O(#checks) rows
  * regardless of input size.
  */
object DataQuality {

  /** One row per column: rows where the column is null. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    columnChecks(df, cols.map(c => (s"not_null_$c", col(c).isNull)))

  /** One row per (name, violationPredicate) — all predicates evaluated
    * in a single scan. Sums are coalesced to 0 so an EMPTY input reports
    * 0 violations / passed (count-based dbt semantics), not NULL/NULL;
    * aggregate outputs are referenced positionally, never re-resolved by
    * name, so check names containing dots/backticks are fine. */
  def columnChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val sums = checks.zipWithIndex.map { case ((_, bad), i) =>
      coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"__c$i")
    }
    val one = df.agg(sums.head, sums.tail: _*)
    val stacked = explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"), col(s"__c$i").as("n_violations"))
    }: _*))
    one.select(stacked.as("c")).select(col("c.check_name"),
      col("c.n_violations"), (col("c.n_violations") === 0).as("passed"))
  }

  /** Rows whose column value is outside `allowed` (nulls are the
    * not_null test's business, dbt semantics). */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    columnChecks(df,
      Seq((s"accepted_values_$c", col(c).isNotNull && !col(c).isin(allowed: _*))))

  /** dbt `unique`: number of key values that occur more than once.
    * Rows with a null key component are excluded first — dbt's unique
    * test filters `where col is not null` (nulls are the not_null
    * test's business, as with acceptedValues). */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame = {
    val name = s"unique_${keys.mkString("_")}"
    df.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0).as("passed"))
  }

  /** dbt `relationships`: child rows whose key has no parent. The
    * parent side is reduced to its distinct key column before the join
    * — never the full dimension row. `broadcastParent` hints the
    * broadcast for dimension-sized parents (the common case); pass
    * false for a fact-sized parent key set and let AQE/thresholds pick
    * a shuffle anti join instead of force-broadcasting it. */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String,
                    broadcastParent: Boolean = true): DataFrame = {
    val p0 = parent.select(col(parentKey).as("__pk")).distinct()
    val p = if (broadcastParent) broadcast(p0) else p0
    child.filter(col(childKey).isNotNull)
      .join(p, col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"relationships_$childKey").as("check_name"),
        col("n_violations"), (col("n_violations") === 0).as("passed"))
  }

  /** Union a report out of individual checks. */
  /** Per-group z-score OUTLIER detection in EXACT arithmetic — the IoT
    * anomaly flag ("reading more than k·σ from its group's mean")
    * without the float-summation trap: group mean/variance computed
    * from fixed-point integer sums, and the z² > k² test cleared of
    * divisions —
    *
    *   (v·n − s)² > k² · (n·q − s²),  s = Σvᵢ, q = Σvᵢ² (scaled longs)
    *
    * — evaluated in DECIMAL(38,0) (the oracle uses HUGEINT), so the
    * flag is bit-identical in any engine; a libm-stddev spelling would
    * disagree at boundary readings. Groups need n ≥ 2 (variance
    * undefined below) and the products stay within 38 digits for
    * |v|·10^s < 10⁹ and n < 10⁶ per group — size `scale` accordingly.
    *
    * One grouped pass builds (n, s, q); flags come from the join back
    * on the group key (both sides hash-partition on it — the d12/d18
    * aggregate-join-back family). */
  def outliers(df: DataFrame, keys: Seq[String], value: String,
               k: Int, scale: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val v = graft.functions.Portable.toFixed(col(value), scale)
    // sums accumulate in decimal from the start — a long Σv² would
    // silently wrap first on a hot group
    val stats = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(v.cast(dec)).as("__s"),
        sum(v.cast(dec) * v.cast(dec)).as("__q"))
      .filter(col("__n") >= 2)
    df.withColumn("__v", v)
      .join(stats, keys)
      .filter(
        (col("__v").cast(dec) * col("__n") - col("__s")) *
          (col("__v").cast(dec) * col("__n") - col("__s")) >
        lit(k * k).cast(dec) *
          (col("__n").cast(dec) * col("__q") - col("__s").cast(dec) * col("__s")))
      .drop("__v", "__n", "__s", "__q")
  }

  /** ROBUST per-group outlier flags — median/MAD where [[outliers]] is
    * mean/variance: a reading flags when |v − median| > k·MAD. The
    * robust pair is what a dashboard wants on dirty telemetry (one
    * glitched reading inflates a variance enough to hide itself; it
    * cannot move a median). Medians are exact interpolated percentiles
    * (the B8 machinery, hash-proven ≡ `quantile_cont`), `pround`ed at
    * `scale` so the interpolation's last-ULP never disagrees
    * cross-engine; everything downstream of the rounded medians is
    * plain IEEE and deterministic. Zero-MAD groups (≥ half the
    * readings AT the median) flag nothing — the standard MAD
    * degeneracy, by contract.
    *
    * Shape: ONE scan, ONE keys-hash exchange, ZERO joins — both
    * medians are unordered-frame WINDOW aggregates over the same
    * partitioning (median → deviation → MAD → flag is a straight
    * pipeline on the shuffled partition, the second window riding the
    * first's exchange and sort). The earlier aggregate-and-join-back
    * spelling could not reach one scan: the med/MAD branches prune to
    * (keys, value) while the flag branch carries every output column,
    * so the "shared" anchor canonicalizes into two DIFFERENT exchanges
    * and the source is scanned per shape (found by the PlanSpec guard
    * in the r11 full-suite run). Window percentiles buffer a group's
    * values exactly like the aggregate form; at 100 TB-per-group
    * cardinalities use [[outliersMadFromBins]]. */
  def outliersMad(df: DataFrame, keys: Seq[String], value: String,
                  k: Double, scale: Int): DataFrame = {
    val pr = graft.functions.Portable.pround(_: Column, scale)
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("med", pr(percentile(col(value), lit(0.5)).over(w)))
      .withColumn("__ad", abs(col(value) - col("med")))
      .withColumn("mad", pr(percentile(col("__ad"), lit(0.5)).over(w)))
      .filter(col("mad") > 0 && col("__ad") > lit(k) * col("mad"))
      .drop("__ad")
  }

  /** [[outliersMad]] at UNBOUNDED per-group cardinality: both medians
    * come from [[Sketches.histPercentiles]]'s fixed-bin estimate
    * instead of Spark's exact `percentile` (which buffers every value
    * of a group in executor memory — at 100 TB-per-group that is an
    * OOM, the B8→B12 trade restated). State per group is O(nBins)
    * however large the group; the estimate's error is bounded by the
    * bin width, which is the right robust-outlier trade (a flag
    * threshold of k·MAD does not care about a half-bin shift of the
    * median).
    *
    * Scale shape — deliberately DIFFERENT from [[outliersMad]]'s
    * one-shuffle window pipeline: the input is NEVER shuffled at all.
    * Three read passes over the source — two COLUMN-PRUNED sketch
    * passes (the bin counts partial-aggregate map-side and shuffle
    * only groups × bins rows) and one full-width output pass — with
    * the group-count-sized median/MAD tables broadcast back
    * (`broadcastStats = false` for key cardinalities past broadcast
    * range — the joins then shuffle on the keys like any equi-join).
    * At 100 TB two extra pruned parquet passes are far cheaper than
    * one input-sized exchange. The deviation histogram spans
    * [0, hi−lo] — the largest |v − median| possible when values live
    * in [lo, hi). Estimates are `pround`ed inside histPercentiles, so
    * flags are bit-reproducible cross-engine (oracle-checked as
    * dq3b). */
  def outliersMadFromBins(df: DataFrame, keys: Seq[String], value: String,
                          k: Double, lo: Double, hi: Double, nBins: Int,
                          broadcastStats: Boolean = true): DataFrame = {
    def bc(stats: DataFrame): DataFrame =
      if (broadcastStats) broadcast(stats) else stats
    // the median table is GROUP-COUNT-sized — pin it (the model-sized
    // pin discipline) so its sketch pass runs once instead of being
    // re-derived under both the MAD branch and the output branch
    val med = bc(Sketches.histPercentiles(df, keys, col(value),
      Seq(("med", 0.5)), lo, hi, nBins).localCheckpoint())
    val dev = df.join(med, keys)
      .withColumn("__ad", abs(col(value) - col("med")))
    val mad = bc(Sketches.histPercentiles(dev, keys, col("__ad"),
      Seq(("mad", 0.5)), 0.0, hi - lo, nBins))
    dev.join(mad, keys)
      .filter(col("mad") > 0 && col("__ad") > lit(k) * col("mad"))
      .drop("__ad")
  }

  /** Distribution-drift report between a REFERENCE batch and a CURRENT
    * batch — the pre-training check an LLM data pipeline runs when a new
    * crawl/source lands: has the value distribution shifted per key?
    *
    * Metrics per key group (all engine-portable — no libm, so no
    * PSI/KL whose `ln` differs in the last ULP across runtimes):
    *  - `tv_dist`: total-variation distance `0.5·Σ|p_b − q_b|` over the
    *    aligned fixed bins — 0 for identical distributions, 1 for
    *    disjoint ones; the standard L1 drift score.
    *  - `max_bin_delta`: `max_b |p_b − q_b|` — localizes the worst bin.
    *  - `ks_stat`: the (binned) Kolmogorov–Smirnov statistic
    *    `max_b |CDF_p(b) − CDF_q(b)` — sensitive to location shifts TV
    *    smears across bins; the cumulative window orders by bin WITHIN
    *    the same keys exchange, so it costs no extra shuffle.
    *
    * Exactness: proportions are never summed as floats. `|p−q|` is
    * computed as the exact integer `|cnt_r·tot_c − cnt_c·tot_r|`
    * (decimal(38) products — safe past 1e12-row sides), summed exactly,
    * and divided ONCE at the end — so the result is bit-identical in
    * any engine that can do integer arithmetic, and the DuckDB oracle
    * reproduces it hash-exactly.
    *
    * Scale shape: each side reduces to its (keys, bin) counts in one
    * map-combined pass (the b30 histogram discipline — under/overflow
    * land in sentinel bins 0 and nBins+1); the full-outer bin join and
    * the totals window run on SKETCH-SIZED frames (≤ nBins+2 rows per
    * key per side), and the window + final agg share one keys-hash
    * exchange. Keys present in only one side report with the other
    * side's count 0 and tv_dist 1 (a vanished or brand-new key is
    * maximal drift). */
  def distributionDrift(ref: DataFrame, cur: DataFrame, keys: Seq[String],
                        value: Column, lo: Double, hi: Double, nBins: Int,
                        scale: Int = 6): DataFrame = {
    require(nBins > 0 && hi > lo)
    val width = (hi - lo) / nBins
    val bucket = when(value < lit(lo), lit(0))
      .when(value >= lit(hi), lit(nBins + 1))
      .otherwise(floor((value - lit(lo)) / lit(width)).cast("int") + lit(1))
    def counts(df: DataFrame, as: String) =
      df.filter(value.isNotNull)
        .groupBy(keys.map(col) :+ bucket.as("bucket"): _*)
        .agg(count(lit(1)).as(as))
    driftFromBins(counts(ref, "cnt_ref"), counts(cur, "cnt_cur"),
      keys, scale)
  }

  /** The drift computation over pre-built bin-count frames
    * `(keys..., bucket, cnt_ref)` / `(keys..., bucket, cnt_cur)` — the
    * entry point for CONTINUOUSLY MAINTAINED histograms (the I19
    * streaming bins feed this directly; bucketing conventions must
    * match between the two sides, which [[distributionDrift]]
    * guarantees by constructing both). */
  def driftFromBins(refBins: DataFrame, curBins: DataFrame,
                    keys: Seq[String], scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = refBins.join(curBins, keys :+ "bucket", "full_outer")
      .select(keys.map(col) :+ col("bucket") :+
        coalesce(col("cnt_ref"), lit(0L)).as("r") :+
        coalesce(col("cnt_cur"), lit(0L)).as("c"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
    val dec = "decimal(19,0)"
    val wcum = w.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withTot = j
      .withColumn("__tr", sum(col("r")).over(w))
      .withColumn("__tc", sum(col("c")).over(w))
      // exact integer |p−q| numerator over the common denominator tr·tc
      .withColumn("__d", abs(col("r").cast(dec) * col("__tc").cast(dec) -
        col("c").cast(dec) * col("__tr").cast(dec)))
      // exact integer |CDF_p−CDF_q| numerator: the CDF only moves at
      // occupied bins, so cumulating over the joined frame is exact
      .withColumn("__k", abs(
        sum(col("r")).over(wcum).cast(dec) * col("__tc").cast(dec) -
        sum(col("c")).over(wcum).cast(dec) * col("__tr").cast(dec)))
    // a key present in only ONE side (the other total 0) is maximal
    // drift BY DEFINITION (a vanished or brand-new key): the cross
    // products collapse to 0 there, so override rather than divide
    val oneSided = col("n_ref") === 0L || col("n_cur") === 0L
    val tr = greatest(col("n_ref"), lit(1L)).cast("double")
    val tc = greatest(col("n_cur"), lit(1L)).cast("double")
    withTot.groupBy(keys.map(col): _*)
      .agg(max(col("__tr")).as("n_ref"), max(col("__tc")).as("n_cur"),
        sum(col("__d")).as("__sum"), max(col("__d")).as("__max"),
        max(col("__k")).as("__ks"))
      .select(keys.map(col) :+ col("n_ref") :+ col("n_cur") :+
        when(oneSided, lit(1.0)).otherwise(graft.functions.Portable.pround(
          col("__sum").cast("double") / (lit(2.0) * tr * tc), scale))
          .as("tv_dist") :+
        when(oneSided, lit(1.0)).otherwise(graft.functions.Portable.pround(
          col("__max").cast("double") / (tr * tc), scale))
          .as("max_bin_delta") :+
        when(oneSided, lit(1.0)).otherwise(graft.functions.Portable.pround(
          col("__ks").cast("double") / (tr * tc), scale))
          .as("ks_stat"): _*)
  }

  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))

  /** Column-profile comparison between a reference and a current batch
    * (DQ5) — the SCHEMA-level companion to [[distributionDrift]]'s
    * per-key value histograms: one row per numeric column with both
    * sides' row count, null count, min/max, and exact fixed-point mean,
    * plus the signed mean shift. The first thing an ingest gate checks
    * when a new extract lands ("did a column go all-null? did the
    * range explode? did the mean move?") before any per-key drill-down.
    *
    * Engine-portable by the Portable discipline: counts and fixed sums
    * are exact integers; min/max are exact picks of input doubles; the
    * means divide once (`fs / 10^s / n` — mirrored operation-for-
    * operation in the oracle); the mean shift is computed from the
    * EXACT cross product `fs_r·n_c − fs_c·n_r` in decimal(38) (never
    * mean_r − mean_c, whose two roundings can straddle a pround
    * boundary), divided once.
    *
    * Scale shape: ONE single-row global aggregate per side (map-side
    * partial, the exchange carries one row), a stack()-unpivot to
    * #columns rows, and a #columns-row join — input read once per
    * side, everything after is column-count-sized. */
  def profileCompare(ref: DataFrame, cur: DataFrame,
                     numericCols: Seq[(String, Int)],
                     scale: Int = 6): DataFrame = {
    require(numericCols.nonEmpty, "profileCompare needs at least one column")
    def side(df: DataFrame, tag: String): DataFrame = {
      val aggs = numericCols.flatMap { case (c, s) =>
        Seq(count(col(c)).as(s"__n_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
          min(col(c).cast("double")).as(s"__min_$c"),
          max(col(c).cast("double")).as(s"__max_$c"),
          sum(graft.functions.Portable.toFixed(col(c), s)).as(s"__fs_$c"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = numericCols.map { case (c, _) =>
        s"'$c', __n_$c, __nulls_$c, __min_$c, __max_$c, __fs_$c"
      }.mkString(", ")
      one.select(expr(
        s"stack(${numericCols.size}, $stackArgs) AS " +
          s"(col_name, n_$tag, nulls_$tag, min_$tag, max_$tag, __fs_$tag)"))
    }
    val session = ref.sparkSession
    import session.implicits._
    val scales = numericCols.toDF("col_name", "__scale")
    val dec = "decimal(38,0)"
    def mean(tag: String): Column = {
      val p = pow(lit(10.0), col("__scale"))
      graft.functions.Portable.pround(
        col(s"__fs_$tag").cast("double") / p / col(s"n_$tag"), scale)
    }
    side(ref, "ref").join(side(cur, "cur"), Seq("col_name"), "full_outer")
      .join(broadcast(scales), Seq("col_name"))
      .select(col("col_name"),
        col("n_ref"), col("n_cur"), col("nulls_ref"), col("nulls_cur"),
        col("min_ref"), col("min_cur"), col("max_ref"), col("max_cur"),
        when(col("n_ref") > 0, mean("ref")).as("mean_ref"),
        when(col("n_cur") > 0, mean("cur")).as("mean_cur"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          graft.functions.Portable.pround(
            (col("__fs_cur").cast(dec) * col("n_ref").cast(dec) -
              col("__fs_ref").cast(dec) * col("n_cur").cast(dec))
              .cast("double")
              / pow(lit(10.0), col("__scale"))
              / col("n_ref") / col("n_cur"), scale)).as("mean_shift"))
  }
  /** Source FRESHNESS check (DQ6) — dbt's `source freshness` contract
    * (warn_after / error_after on the newest loaded record): per key,
    * the newest timestamp, its lag behind `asOf` (the run's reference
    * instant — a LITERAL, passed in so re-runs and oracles see one
    * instant, never wall-clock), and the resulting status. Exact µs
    * integer lag; one map-combined grouped MAX — the cheapest possible
    * pass over any table size. */
  def freshness(df: DataFrame, keys: Seq[String], ts: String,
                asOf: Column, warnAfterSeconds: Long,
                errorAfterSeconds: Long): DataFrame = {
    require(errorAfterSeconds >= warnAfterSeconds,
      "error_after must be >= warn_after")
    df.groupBy(keys.map(col): _*)
      .agg(max(col(ts)).as("max_loaded_at"))
      .withColumn("lag_seconds",
        ((unix_micros(asOf) - unix_micros(col("max_loaded_at")))
          / lit(1000000L)).cast("long"))
      .withColumn("status",
        when(col("lag_seconds") > errorAfterSeconds, lit("error"))
          .when(col("lag_seconds") > warnAfterSeconds, lit("warn"))
          .otherwise(lit("ok")))
  }

  /** Calendar completeness check per key (DQ8) — the dbt-expectation
    * "no missing days" test DQ1's row checks can't express: for each
    * key, the expected day count is its OWN first-to-last calendar
    * span (per-key, not global — a source onboarded in March isn't
    * "missing" January), present = distinct active days, missing =
    * expected − present. Returns `(keys..., first_day, last_day,
    * n_expected, n_present, n_missing, complete)`.
    *
    * Deliberately NEVER materializes the calendar spine: the count
    * arithmetic (span length vs distinct days) gives the same answer
    * as a generate_series anti-join without the spine explode — the
    * per-key report is one map-combined distinct + one agg. Which days
    * are missing is the gapfill layer's business (B6/B37), composably. */
  def completeness(events: DataFrame, keys: Seq[String],
                   ts: String): DataFrame =
    events
      .select(keys.map(col) :+ to_date(col(ts)).as("__day"): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(min(col("__day")).as("first_day"),
        max(col("__day")).as("last_day"),
        count(lit(1)).as("n_present"))
      .withColumn("n_expected",
        (datediff(col("last_day"), col("first_day")) + 1).cast("long"))
      .withColumn("n_missing", col("n_expected") - col("n_present"))
      .withColumn("complete", col("n_missing") === 0L)
      .select((keys.map(col) :+ col("first_day") :+ col("last_day") :+
        col("n_expected") :+ col("n_present") :+ col("n_missing") :+
        col("complete")): _*)

  /** Rolling z-score anomaly flags over per-key daily volumes (DQ7) —
    * the volume-monitoring check every ingest pipeline wants: a day is
    * anomalous when its count deviates from the mean of the trailing
    * `window` OBSERVED days (rows, not calendar days — zero-event days
    * don't appear; densify through the gapfill layer first if absence
    * itself should count) by more than `z` standard deviations. Exactness: the test
    * `|x − μ| > z·σ` is never evaluated in floats — with prior-window
    * count `n`, sum `S` and sum-of-squares `Q` it cross-multiplies to
    * the all-integer `(n·x − S)² > z²·(n·Q − S²)` (decimal(38)
    * products off decimal(19) operands — the b22/dq4 discipline), so
    * the flag is bit-identical in any integer-capable engine and the
    * DuckDB oracle reproduces it hash-exactly (HUGEINT).
    *
    * Days with fewer than `minPrior` prior points in the window report
    * `is_anomaly = false` (not enough evidence — the honest default).
    * Returns every (keys, day) row: `(keys..., day, cnt, n_prior,
    * is_anomaly)`. */
  def rollingAnomalies(events: DataFrame, keys: Seq[String], ts: String,
                       window: Int = 7, minPrior: Int = 3,
                       z: Int = 3): DataFrame =
    anomaliesFromDaily(
      events.groupBy(keys.map(col) :+ to_date(col(ts)).as("day"): _*)
        .agg(count(lit(1)).as("cnt")),
      keys, window, minPrior, z)

  /** The post-rollup stage of [[rollingAnomalies]], exposed so a
    * MAINTAINED per-(keys, day) count table (a plain update-mode
    * streaming agg — daily counts are additive) feeds an always-current
    * anomaly report without re-reading raw events (the
    * [[driftFromBins]] seam discipline). `daily` must be one row per
    * (keys..., day) carrying `cnt`.
    *
    * Scale shape: the input-sized stage is the daily rollup upstream;
    * here everything is calendar-sized — one keys-hash exchange, one
    * window pass computing all three trailing sums together. */
  def anomaliesFromDaily(daily: DataFrame, keys: Seq[String],
                         window: Int = 7, minPrior: Int = 3,
                         z: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= minPrior && minPrior >= 1,
      s"need window >= minPrior >= 1, got window=$window minPrior=$minPrior")
    val dec = "decimal(19,0)"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("day"))
      .rowsBetween(-window, -1)
    val x = col("cnt").cast(dec)
    val stats = daily
      .withColumn("__n", count(col("cnt")).over(w).cast(dec))
      .withColumn("__s", sum(x).over(w).cast(dec))
      .withColumn("__q", sum(x * x).over(w).cast(dec))
    val lhs = {
      val d = (col("__n") * x - col("__s")).cast(dec)
      d * d
    }
    val rhs = lit(z.toLong * z) * (col("__n") * col("__q") -
      col("__s").cast(dec) * col("__s").cast(dec))
    stats.select(keys.map(col) :+ col("day") :+ col("cnt") :+
      col("__n").cast("long").as("n_prior") :+
      (col("__n") >= minPrior && lhs > rhs).as("is_anomaly"): _*)
  }

  /** CUSUM changepoint / drift detection over per-key daily volumes
    * (DQ9) — the sequential-drift monitor DQ7's rolling z-score is
    * blind to: a slow sustained shift never leaves the trailing
    * window's ±3σ band, while the cumulative sum of small same-sign
    * deviations crosses any threshold eventually (Page 1954). Both
    * one-sided statistics, against the key's OWN mean μ over the
    * window under test (the self-calibrating spelling — the reference
    * re-runs its agg models over a fixed backfill window the same
    * way, `/root/reference/dags/iot_dwh_agg_transform_daily.py`):
    *
    *   S⁺_t = max(0, S⁺_{t−1} + x_t − μ − slack)   (upward drift)
    *   S⁻_t = max(0, S⁻_{t−1} + μ − slack − x_t)   (downward drift)
    *
    * alarm when S > threshold. Exactness: μ = T/N is never formed —
    * every S comparison is scaled by the key's day count N, turning
    * the recurrences into all-integer prefix arithmetic via the
    * classic max-reset identity `S_t = C_t − min(0, min_{j≤t} C_j)`
    * with C_t = Σ_{i≤t}(N·x_i − T − N·slack): one cumulative sum +
    * one running min per side, `N·S_t > N·threshold` the decision —
    * decimal(38) products off decimal(19) operands (the b22/dq7
    * discipline), bit-identical in any integer engine, DuckDB
    * (HUGEINT) reproduces the flags hash-exactly.
    *
    * Returns every (keys, day) row: `(keys..., day, cnt, alarm_up,
    * alarm_dn)`. Single-day keys never alarm (C_1 = −N·slack ≤ 0). */
  def cusumChangepoints(events: DataFrame, keys: Seq[String], ts: String,
                        slack: Int = 0, threshold: Int = 10): DataFrame =
    cusumFromDaily(
      events.groupBy(keys.map(col) :+ to_date(col(ts)).as("day"): _*)
        .agg(count(lit(1)).as("cnt")),
      keys, slack, threshold)

  /** The post-rollup stage of [[cusumChangepoints]], exposed so a
    * MAINTAINED per-(keys, day) count table (daily counts are
    * additive — a plain update-mode streaming agg) feeds an
    * always-current drift report without re-reading raw events (the
    * [[anomaliesFromDaily]] seam discipline). `daily` must be one row
    * per (keys..., day) carrying `cnt`.
    *
    * Scale shape: the input-sized stage is the daily rollup upstream;
    * here everything is calendar-sized — ONE keys-hash exchange
    * shared by the per-key totals (unbounded window) and the ordered
    * prefix sums / running mins (same partitionBy ⇒ no re-shuffle),
    * then a pure projection decides the flags. */
  def cusumFromDaily(daily: DataFrame, keys: Seq[String],
                     slack: Int = 0, threshold: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val dec = "decimal(19,0)"
    val dec38 = "decimal(38,0)"
    val wAll = Window.partitionBy(keys.map(col): _*)
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col("cnt").cast(dec)
    val n = col("__nd").cast(dec)
    // u_t = N·x_t − T − N·slack; C_t = Σu, up-side.  v_t = −u_t − 2·N·slack
    // is the down-side increment; both prefix sums + running mins ride
    // the SAME ordered window pass.
    val stats = daily
      .withColumn("__nd", count(lit(1)).over(wAll))
      .withColumn("__t", sum(x).over(wAll).cast(dec))
      .withColumn("__u", (n * x - col("__t") - n * lit(slack)).cast(dec38))
      .withColumn("__v", (col("__t") - n * lit(slack) - n * x).cast(dec38))
      .withColumn("__cu", sum(col("__u")).over(wOrd))
      .withColumn("__cv", sum(col("__v")).over(wOrd))
      .withColumn("__mu", least(lit(0).cast(dec38), min(col("__cu")).over(wOrd)))
      .withColumn("__mv", least(lit(0).cast(dec38), min(col("__cv")).over(wOrd)))
    val h = n.cast(dec38) * lit(threshold)
    stats.select(keys.map(col) :+ col("day") :+ col("cnt") :+
      (col("__cu") - col("__mu") > h).as("alarm_up") :+
      (col("__cv") - col("__mv") > h).as("alarm_dn"): _*)
  }

  /** k-anonymity audit (DQ10) — the re-identification gate a training
    * corpus needs BEYOND per-field PII scrubbing (H6 masks direct
    * identifiers; a (nation, account-band) combination shared by two
    * rows still singles people out — Sweeney 2002): every equivalence
    * class over the quasi-identifier columns with FEWER than k members
    * is a violation, returned with its size so the caller can suppress
    * or generalize exactly those classes. ONE grouped count (map-side
    * partial) — the same shape as any agg_daily, maintainable by the
    * I32 additive-count discipline. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    kAnonymityFromCounts(
      df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("n")), k)
  }

  /** [[kAnonymity]] off MAINTAINED class counts (`quasi…, n`) — the
    * counts are additive, so a plain update-mode streaming agg keeps
    * them current (the I32/cusumFromDaily seam discipline) and the
    * audit is a class-table-sized filter, never a raw re-read. */
  def kAnonymityFromCounts(counts: DataFrame, k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    counts.filter(col("n") < k)
  }

  /** Benford's-law first-digit audit (DQ12) — the classic
    * fabricated-numbers screen (Benford 1938; Nigrini's forensic
    * accounting use): naturally-occurring magnitudes put digit d first
    * with probability log10(1+1/d), while invented or truncated data
    * doesn't. Per key and digit 1–9: observed count, observed share,
    * the Benford expectation, and the per-key total-variation distance
    * — ALL in integer parts-per-million off the canonical 6-dp Benford
    * constants as literals (no engine log10 — JVM and libm disagree in
    * the last ulp), so the report hash-reproduces anywhere. Rows with
    * |value| < 1 carry no leading digit and are excluded (stated).
    * Missing digits materialize as n=0 rows via a keys×9 spine, so the
    * TV distance is the true one, not a sum over observed digits.
    *
    * Scale: one scan + one (keys, digit)-grouped count (map-side
    * partial); the spine and window ride the keys exchange at ≤ 9 rows
    * per key. Counts are additive → maintainable as an update-mode
    * streaming agg through [[benfordFromCounts]] (the I32 seam). */
  def benford(df: DataFrame, keys: Seq[String], value: String): DataFrame =
    benfordFromCounts(
      df.filter(abs(col(value)) >= 1)
        .select(keys.map(col) :+ substring(floor(abs(col(value)))
          .cast("long").cast("string"), 1, 1).cast("int").as("digit"): _*)
        .groupBy((keys :+ "digit").map(col): _*).agg(count(lit(1)).as("n")),
      keys)

  /** Benford per-million expectations for digits 1..9 — the canonical
    * log10(1+1/d) values at 6 dp, as literals so both engines use the
    * SAME integers. */
  val benfordPpm: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** [[benford]] off MAINTAINED (keys, digit, n) counts — additive, so
    * a plain update-mode streaming agg keeps them current and the
    * report re-derives class-table-sized (the kAnonymityFromCounts
    * discipline). */
  def benfordFromCounts(counts: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    // ONE consumer of the counts subtree: fold each key's digit counts
    // into a map, derive total + TV in-row (≤ 9 elements per key —
    // interpreted HOFs are fine at class-table size), explode the 9-row
    // spine off the map. The join-on-a-spine spelling planned the RAW
    // SCAN twice — the left-outer join's key null-filters make the two
    // count subtrees non-identical, so not even ReusedExchange can save
    // it (the c10 lesson, one step worse). `counts` must be unique per
    // (keys, digit) — any grouped count is; map_from_entries refuses
    // duplicates loudly.
    val bArr = s"array(${benfordPpm.mkString("L, ")}L)"
    counts
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("digit"), col("n"))))).as("__m"))
      .withColumn("__total", expr("aggregate(map_values(__m), 0L, (a, x) -> a + x)"))
      .withColumn("tv_ppm", expr(
        s"""aggregate(transform(sequence(1, 9), d ->
           |  abs((coalesce(element_at(__m, d), 0L) * 1000000L) div __total
           |      - element_at($bArr, d))),
           |  0L, (a, x) -> a + x) div 2""".stripMargin))
      .select(keys.map(col) :+ col("__m") :+ col("__total") :+ col("tv_ppm") :+
        explode(sequence(lit(1), lit(9))).as("digit"): _*)
      .select(keys.map(col) :+ col("digit") :+
        coalesce(element_at(col("__m"), col("digit")), lit(0L)).as("n") :+
        expr("(coalesce(element_at(__m, digit), 0L) * 1000000L) div __total")
          .as("obs_ppm") :+
        element_at(expr(bArr), col("digit")).as("benford_ppm") :+
        col("tv_ppm"): _*)
  }

  /** Functional-dependency audit (DQ13) — does `det → dep` hold? The
    * dbt-test-shaped relationship check BETWEEN columns: every
    * determinant value mapping to MORE than one distinct dependent is
    * a violation, reported with its row count and the min/max
    * dependents as repair evidence. Null dependents are ignored
    * (stated — dbt's null convention). One grouped count(distinct) —
    * the standard two-level expansion, map-side combined. Maintainable
    * from additive (det, dep) pair counts via [[fdFromPairCounts]]. */
  def fdViolations(df: DataFrame, det: Seq[String], dep: String): DataFrame =
    fdFromPairCounts(
      df.filter(col(dep).isNotNull)
        .groupBy((det :+ dep).map(col): _*).agg(count(lit(1)).as("n")),
      det, dep)

  /** [[fdViolations]] off MAINTAINED (det…, dep, n) pair counts — the
    * pair counts are additive (update-mode streaming agg); the audit
    * re-derives pair-table-sized. */
  def fdFromPairCounts(pairCounts: DataFrame, det: Seq[String],
                       dep: String): DataFrame = {
    require(det.nonEmpty, "need at least one determinant column")
    pairCounts.groupBy(det.map(col): _*)
      .agg(count(lit(1)).as("n_dep"), sum(col("n")).as("n_rows"),
        min(col(dep)).as("dep_min"), max(col(dep)).as("dep_max"))
      .filter(col("n_dep") > 1)
  }

  /** Key-distribution skew report (DQ14) — the PRE-join diagnosis whose
    * cure is J1's salting / AQE skew splits: the top-N heaviest keys
    * with their parts-per-million share, plus the key count and the
    * Herfindahl–Hirschman concentration index (Σ share² — the
    * worst-partition predictor: a key at share p pins p of the build
    * side onto one task whatever the parallelism). All integer — HHI
    * in ppm via decimal(38) cross products, never a float sum. Top-N
    * ties break by key for determinism. One grouped count + one
    * sketch-sized sort/limit + one scalar cross join. */
  def keySkew(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      // anchor: consumed by the summary agg AND the top-N sort — the
      // shared exchange keeps the raw scan single (PlanSpec FileScan==1)
      .repartition(col(key))
    val summary = counts.agg(
      sum(col("cnt")).cast("decimal(38,0)").as("__total"),
      count(lit(1)).as("n_keys"),
      sum(col("cnt").cast("decimal(38,0)") * col("cnt")).as("__ss"))
    counts.orderBy(col("cnt").desc, col(key)).limit(topN)
      .crossJoin(broadcast(summary))
      .select(col(key), col("cnt"),
        expr("CAST((CAST(cnt AS DECIMAL(38,0)) * 1000000) div __total AS BIGINT)")
          .as("share_ppm"),
        col("n_keys"),
        col("__total").cast("long").as("total_rows"),
        expr("CAST((__ss * 1000000) div (__total * __total) AS BIGINT)")
          .as("hhi_ppm"))
  }

  /** l-diversity audit (DQ11) — k-anonymity's complement (Machanavajjhala
    * 2007): a class can be large yet still leak when every member
    * shares the SAME sensitive value, so flag classes whose sensitive
    * column takes fewer than l distinct values. One grouped
    * count(distinct) — expands to the standard two-level agg. */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
                 l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(countDistinct(col(sensitive)).as("n_distinct"))
      .filter(col("n_distinct") < l)
  }

  /** t-closeness audit (DQ17) — the third leg of the anonymity
    * trilogy (Li et al., ICDE 2007), beside [[kAnonymity]] and
    * [[lDiversity]]: a class can be k-anonymous AND l-diverse yet
    * still leak when its sensitive DISTRIBUTION diverges from the
    * table's (90% one diagnosis where the population carries 10% —
    * an attacker learns plenty without pinning the exact value).
    * Flags classes whose total-variation distance from the global
    * sensitive distribution exceeds `t`.
    *
    * Exact-integer TV (the DQ4 discipline — proportions are never
    * summed as floats): with class counts n_cv, class size n_c,
    * global counts n_v, total n,
    * `TV = [Σ_{v∈class} |n_cv·n − n_v·n_c| + n_c·(n − Σ_{v∈class} n_v)]
    *       / (2·n_c·n)` —
    * the absent-value tail (p_c(v)=0) folds into one closed term, so
    * the per-class sum runs over the class's OWN values only, never a
    * classes × vocabulary spine. Products in decimal(38,0)/HUGEINT,
    * ONE double division + pround at the end — bit-identical
    * cross-engine.
    *
    * Shape: one scan → (quasi, sensitive) counts (map-side combined,
    * sketch-sized) → broadcast of the sensitive-cardinality global
    * counts + 1-row total → one class-partitioned window + class agg,
    * all sketch-sized after the first aggregate. */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: String,
                 t: Double, scale: Int = 6): DataFrame =
    // the counts table is classes×values-sized — pin it (the
    // model-sized pin discipline) so the global rollup, the total and
    // the class window all read ONE raw scan's collapse
    tClosenessFromCounts(
      df.groupBy(quasi.map(col) :+ col(sensitive): _*)
        .agg(count(lit(1)).as("__ncv")).localCheckpoint(),
      quasi, sensitive, t, scale)

  /** [[tCloseness]] from a maintained `(quasi…, sensitive, __ncv)`
    * COUNTS table — the [[kAnonymityFromCounts]] seam: class-value
    * counts are additive, so a streaming update-mode aggregate keeps
    * them exactly-once and this audit re-derives from the maintained
    * state through the SAME algebra as batch (they cannot drift). The
    * global per-value counts and the total are ROLLUPS of the input —
    * derived here, never a second raw scan.
    *
    * NULL contract: rows with a NULL sensitive value are EXCLUDED from
    * the audit entirely — from the class counts, the global counts AND
    * the total n (the [[kAnonymity]] documented-drop discipline). The
    * r11 advice found the previous shape dropped them only from the
    * equi-join (null != null) while n and the absent-value tail still
    * carried the null mass, silently inflating every class's TV by the
    * global null fraction; the explicit filter makes the distribution
    * under audit "the distribution of OBSERVED sensitive values",
    * stated rather than accidental. */
  def tClosenessFromCounts(cv0: DataFrame, quasi: Seq[String],
                           sensitive: String, t: Double,
                           scale: Int = 6): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0.0 && t < 1.0, s"t must be in (0, 1), got $t")
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val cv = cv0.filter(col(sensitive).isNotNull)
    val gv = cv.groupBy(col(sensitive)).agg(sum(col("__ncv")).as("__nv"))
    val tot = cv.agg(sum(col("__ncv")).as("__n"))
    val w = Window.partitionBy(quasi.map(col): _*)
    val e = cv.join(broadcast(gv), Seq(sensitive))
      .crossJoin(broadcast(tot))
      .withColumn("__nc", sum(col("__ncv")).over(w))
      .withColumn("__sv", sum(col("__nv")).over(w))
    val a = e.groupBy(quasi.map(col): _*)
      .agg(max(col("__nc")).as("n_c"), max(col("__sv")).as("__svv"),
        max(col("__n")).as("__nn"),
        sum(abs(d38(col("__ncv")) * col("__n")
          - d38(col("__nv")) * col("__nc"))).as("__nump"))
    a.select(quasi.map(col) :+ col("n_c") :+
        graft.functions.Portable.pround(
          (col("__nump") + d38(col("n_c")) * (col("__nn") - col("__svv")))
            .cast("double")
            / (lit(2.0) * col("n_c").cast("double")
               * col("__nn").cast("double")), scale).as("tv"): _*)
      .filter(col("tv") > t)
  }

  /** A/B experiment readout (DQ15) — deterministic hash-split arms plus
    * the two standard test statistics, computed so a single-node engine
    * reproduces every bit:
    *
    *  - arm: last hex digit of `md5(entity)` even → 'A', odd → 'B' —
    *    the standard deterministic bucketing (same user always lands in
    *    the same arm, no RNG, engine-portable).
    *  - `conversion` row: per-arm user and converter counts and the
    *    2×2 chi-square statistic, whose numerator and denominator are
    *    EXACT integer products (one final double division + [[
    *    graft.functions.Portable.pround]]).
    *  - `value_per_user` row: per-arm mean/variance of each user's
    *    total converted fixed-point value and Welch's t² (t squared —
    *    sqrt-free, so no libm disagreement), every intermediate a
    *    double derived from exact long sums through one fixed op
    *    order.
    *
    * Shape: one scan → one entity-keyed agg (the only input-sized
    * exchange) → a 2-row arm agg → a 1-row pivot emitting both metric
    * rows. Degenerate splits (zero/all converters, zero variance)
    * yield NULL statistics rather than lying. Exactness: the squared
    * value sums (qa/qb) and the chi-square numerator/denominator
    * accumulate in decimal(38,0) — the [[outliers]] discipline. The
    * SUMS stay exact to ~10^18-scale per-arm counts/values (64-bit
    * longs would silently wrap around 10^4 users per arm at cent
    * scale; the DuckDB oracle's HUGEINT sums match decimal(38,0)
    * range bit-for-bit) — but the chi-square NUMERATOR grows like
    * ~2·n^5 ((na+nb)·delta², delta ~ n²), so its decimal(38,0)
    * headroom is ~4·10^7 users per arm, not 10^18. Past that the
    * product overflows: NULL stat under non-ANSI evaluation, an
    * ARITHMETIC_OVERFLOW error under ANSI (Spark 4's default) —
    * loud either way, never silently wrong. */
  def abTest(events: DataFrame, entity: String, typeCol: String,
             conversionType: String, valueCol: String,
             scale: Int = 2): DataFrame = {
    import graft.functions.Portable
    val isConv = col(typeCol) === conversionType
    val perUser = events.groupBy(col(entity))
      .agg(max(when(isConv, 1L).otherwise(0L)).as("cv"),
        sum(when(isConv, Portable.toFixed(col(valueCol), scale))
          .otherwise(0L)).as("sv"))
      .withColumn("arm",
        when(substring(md5(col(entity).cast("string")), 32, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), "A").otherwise("B"))
    // coalesce: an EMPTY input reports 0-user arms with NULL stats,
    // not a NULL-count row (the columnChecks empty-input hygiene)
    def z(c: Column): Column = coalesce(c, lit(0L))
    val zero38 = lit(0).cast("decimal(38,0)")
    def zd(c: Column): Column = coalesce(c, zero38)
    val svd = col("sv").cast("decimal(38,0)")
    val one = perUser.agg(
      z(sum(when(col("arm") === "A", 1L).otherwise(0L))).as("na"),
      z(sum(when(col("arm") === "B", 1L).otherwise(0L))).as("nb"),
      z(sum(when(col("arm") === "A", col("cv")).otherwise(0L))).as("xa"),
      z(sum(when(col("arm") === "B", col("cv")).otherwise(0L))).as("xb"),
      z(sum(when(col("arm") === "A", col("sv")).otherwise(0L))).as("sa"),
      z(sum(when(col("arm") === "B", col("sv")).otherwise(0L))).as("sb"),
      zd(sum(when(col("arm") === "A", svd * svd).otherwise(zero38)))
        .as("qa"),
      zd(sum(when(col("arm") === "B", svd * svd).otherwise(zero38)))
        .as("qb"))
    // decimal(38,0) algebra — exact where long products wrap (~10^4
    // users/arm); the chi-square delta term is factored once so the
    // two squared copies stay textually identical for the optimizer
    val chiD =
      "(CAST(xa AS DECIMAL(38,0)) * (nb - xb) - CAST(xb AS DECIMAL(38,0)) * (na - xa))"
    val chiNum = expr(s"CAST(na + nb AS DECIMAL(38,0)) * $chiD * $chiD")
    val chiDen =
      expr("CAST(na AS DECIMAL(38,0)) * nb * (xa + xb) * (na + nb - xa - xb)")
    val chi2 = when(chiDen =!= 0L,
      Portable.pround(chiNum.cast("double") / chiDen.cast("double"), 6))
    val p = lit(math.pow(10, scale))
    def mean(s: String, n: String): Column =
      col(s).cast("double") / p / col(n).cast("double")
    def variance(q: String, s: String, n: String): Column =
      (col(q).cast("double") / p / p
        - (col(s).cast("double") / p) * (col(s).cast("double") / p)
          / col(n).cast("double")) / (col(n).cast("double") - lit(1.0))
    val ma = mean("sa", "na"); val mb = mean("sb", "nb")
    val va = variance("qa", "sa", "na"); val vb = variance("qb", "sb", "nb")
    val se2 = va / col("na").cast("double") + vb / col("nb").cast("double")
    val t2 = when(col("na") > 1L && col("nb") > 1L && se2 > lit(0.0),
      Portable.pround((ma - mb) * (ma - mb) / se2, 6))
    val convRow = struct(lit("conversion").as("metric"),
      col("na").as("n_a"), col("nb").as("n_b"),
      col("xa").as("x_a"), col("xb").as("x_b"),
      when(col("na") > 0L, Portable.pround(
        col("xa").cast("double") / col("na").cast("double"), 6)).as("mean_a"),
      when(col("nb") > 0L, Portable.pround(
        col("xb").cast("double") / col("nb").cast("double"), 6)).as("mean_b"),
      chi2.as("stat"))
    val valueRow = struct(lit("value_per_user").as("metric"),
      col("na").as("n_a"), col("nb").as("n_b"),
      col("sa").as("x_a"), col("sb").as("x_b"),
      when(col("na") > 0L, Portable.pround(ma, 6)).as("mean_a"),
      when(col("nb") > 0L, Portable.pround(mb, 6)).as("mean_b"),
      t2.as("stat"))
    one.select(explode(array(convRow, valueRow)).as("__m"))
      .select(col("__m.*"))
  }
}
