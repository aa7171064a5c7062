package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed aggregation layer.
  *
  * Re-expresses the reference's dbt `agg` models (reference:
  * dags/dbt_project/models/agg/{daily,weekly,monthly}_*.sql) and the
  * TimescaleDB `time_bucket()` primitive as declarative grouped
  * aggregations. Each rollup is a single-shuffle grouped agg keyed on
  * (entity, period): partial (map-side) aggregation shrinks the data
  * before the exchange, so the plan scales linearly with input and the
  * shuffle carries only one row per (key, period) per map task.
  */
object TimeAgg {

  /** `YYYYMMDD` day key — reference stage/heart_rates.sql:11. */
  def dayKey(ts: Column): Column = date_format(ts, "yyyyMMdd")

  /** `YYYYMM` month key — reference stage/heart_rates.sql:10. */
  def monthKey(ts: Column): Column = date_format(ts, "yyyyMM")

  /** TimescaleDB `time_bucket('1 week', ts)` equivalent (Monday-based),
    * reference agg/weekly_sleeps.sql:10. */
  def weekBucket(ts: Column): Column = date_trunc("week", ts)

  /** Arbitrary-width `time_bucket(interval, ts)` equivalent: epoch-floor
    * to `widthSeconds` buckets. Mirrors the reference generator's 4h/15m
    * Mongo document bucketing (reference:
    * shared/mongodb/initdb.d/generator.py:12 `bucket_interval = "4h"`). */
  def timeBucket(ts: Column, widthSeconds: Long): Column = {
    // Bucket ORIGIN is 2000-01-03 00:00:00 UTC — TimescaleDB's
    // time_bucket origin (Monday-aligned so week-multiples start
    // Mondays; DuckDB's time_bucket matches). Epoch-origin flooring
    // agrees with it only for widths dividing the 946857600 s offset
    // (1 h, 4 h, 1 day all do) — the r12 oracle FUZZER caught the
    // divergence at a 10-hour width, which eleven rounds of the fixed
    // 4-hour fixture never could. floor() runs on DOUBLE so pre-origin
    // timestamps round toward -inf, not toward zero.
    val origin = 946857600L
    timestamp_seconds(
      floor((unix_timestamp(ts) - origin) / widthSeconds).cast("long")
        * widthSeconds + origin)
  }

  /** Grouped rollup over an entity + period key: the generic form of the
    * reference's daily/weekly/monthly steps/sleeps models. */
  def rollup(df: DataFrame, entity: Column, period: Column,
             periodName: String, aggs: Seq[Column]): DataFrame =
    df.groupBy(entity, period.as(periodName)).agg(aggs.head, aggs.tail: _*)

  /** TimescaleDB `time_bucket_gapfill` + `locf()` equivalent: given an
    * already-bucketed rollup (bucket values aligned to `stepSeconds`
    * multiples, as `timeBucket` produces — the same precondition
    * TimescaleDB has), emit one row per (entity, bucket) over each
    * entity's [min, max] bucket range, zero-filling `fillZero` columns
    * and carrying the last observation forward for `locf` columns
    * (emitted as `<col>_locf`).
    *
    * With `bounds = Some((start, finish))` the spine is the EXPLICIT
    * range `[start, finish]` instead of each entity's [min, max] — the
    * two-argument `time_bucket_gapfill(start, finish)` form: input rows
    * outside the range are dropped, every entity with at least one
    * in-range observation gets the full spine, leading gap rows carry
    * null LOCF (no prior observation — TimescaleDB's default `locf`)
    * and trailing gap rows carry the last observation forward to
    * `finish`. Both bound columns must be literals/aligned to
    * `stepSeconds` multiples, the same precondition as the buckets.
    *
    * Scale shape: each observed row emits itself plus the missing
    * buckets since the entity's previous observation (`lag` + `sequence`
    * + `explode`; with bounds, the first row also emits the leading run
    * from `start` and the last row the trailing run to `finish`, via a
    * `lead` over the SAME window) — no spine branch, no fill join, ONE
    * scan of the rollup. The gap-generation lag window and the LOCF
    * running `last(ignoreNulls)` window share the entity partitioning,
    * so the whole operator adds exactly one exchange (verified in
    * PlanSpec for both forms). Output size is the filled spine either
    * way; this shape just never materializes a second aggregate of the
    * input to find it. */
  def gapfillLocf(rollup: DataFrame, entity: String, bucket: String,
                  stepSeconds: Long, fillZero: Seq[String],
                  locf: Seq[String],
                  bounds: Option[(Column, Column)] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val step = expr(s"INTERVAL $stepSeconds SECOND")
    val base = bounds match {
      case Some((start, finish)) =>
        rollup.filter(col(bucket).between(start, finish))
      case None => rollup
    }
    val others = rollup.columns.filterNot(c => c == entity || c == bucket).toSeq
    val wLag = Window.partitionBy(entity).orderBy(bucket)
    val runFrame = wLag.rowsBetween(Window.unboundedPreceding, 0)
    // ALL window work happens on rollup-sized rows BEFORE the gap
    // explode: the running last-non-null per locf column, then its lag
    // (a gap row's carried value is, by construction, the previous
    // observed row's running LOCF). Windowing after the explode would
    // sort the spine-sized output — 10-100x the rows for fine steps.
    // All Window operators share one partitioning+ordering → one sort.
    val withLocf = locf.foldLeft(base)((d, c) =>
      d.withColumn(s"__locf_$c", last(col(c), ignoreNulls = true).over(runFrame)))
    val pre = locf.foldLeft(
      withLocf.withColumn("__prev", lag(col(bucket), 1).over(wLag)))(
      (d, c) => d.withColumn(s"__plocf_$c", lag(col(s"__locf_$c"), 1).over(wLag)))
    val emitted = bounds match {
      case None =>
        when(col("__prev").isNull, array(col(bucket)))
          .otherwise(sequence(col("__prev") + step, col(bucket), step))
      case Some((start, finish)) =>
        // head run: from the previous observation (or `start` for the
        // entity's first row); tail run: the last row (lead is null)
        // extends the spine to `finish`. Computed from the same lag
        // window family — no extra exchange, no sort change.
        val head = when(col("__prev").isNull, sequence(start, col(bucket), step))
          .otherwise(sequence(col("__prev") + step, col(bucket), step))
        val tail = when(col("__next").isNull && col(bucket) + step <= finish,
          sequence(col(bucket) + step, finish, step))
          .otherwise(typedlit(Seq.empty[java.sql.Timestamp]))
        concat(head, tail)
    }
    val withNext = bounds match {
      case Some(_) => pre.withColumn("__next", lag(col(bucket), -1).over(wLag))
      case None => pre
    }
    val exploded = withNext
      .withColumn("__b", explode(emitted))
      .withColumn("__obs", col("__b") === col(bucket))
    // gap rows: fillZero columns revert to null → 0; locf columns pick
    // the carried value — backward (__plocf) for gaps before the
    // observation, the row's own running LOCF for trailing gaps
    val zeroed = fillZero.foldLeft(exploded)((d, c) =>
      d.withColumn(c, coalesce(when(col("__obs"), col(c)), lit(0L))))
    val filled = locf.foldLeft(zeroed)((d, c) =>
      d.withColumn(s"${c}_locf",
        when(col("__b") >= col(bucket), col(s"__locf_$c"))
          .otherwise(col(s"__plocf_$c"))))
    filled
      .drop("__prev" +: "__next" +: bucket +: locf.flatMap(c =>
        Seq(c, s"__locf_$c", s"__plocf_$c")): _*)
      .withColumnRenamed("__b", bucket)
      .select(col(entity) +: col(bucket) +:
        others.map(c => if (locf.contains(c)) col(s"${c}_locf") else col(c)): _*)
  }

  /** TimescaleDB `counter_agg` → `delta()`/`num_resets()` equivalent:
    * per `keys` group, the reset-aware total increase of a monotonic
    * counter reading. Readings ordered by `order` (must be a unique
    * ordering — include a row id); each step contributes
    * `r_i − r_{i−1}` when the counter advanced and `r_i` when it reset
    * (the counter restarted from ~0, so the new reading IS the
    * increase — TimescaleDB's reset accounting). Groups with a single
    * reading report 0 delta.
    *
    * Shape: one window (partition = `keys`) for the lag, then a grouped
    * agg on the SAME keys — the aggregation reuses the window's
    * exchange, so the whole operator is one shuffle. Per-step deltas
    * are fixed-pointed before summing (order-independent cross-engine
    * sums — [[graft.functions.Portable]]). */
  /** Gapfill with LINEAR INTERPOLATION — TimescaleDB's `interpolate()`
    * companion to [[gapfillLocf]]'s `locf()`: each missing bucket gets
    * the straight-line value between its surrounding observations; no
    * rows are emitted before an entity's first or after its last
    * observation (Timescale's null-outside-range semantics, minus the
    * nulls).
    *
    * Same scale discipline as [[gapfillLocf]]: ALL window work happens
    * on rollup-sized rows BEFORE the gap explode — each observed row
    * carries its predecessor's (bucket, value) via one lag window and
    * emits its gap run with `sequence`; the interpolation itself is a
    * per-row expression on the exploded spine. One window family, one
    * exchange, never a sort of the spine.
    *
    * The lerp `prev + (cur−prev) · (t−t_prev)/(t_cur−t_prev)` is pure
    * IEEE arithmetic on exact inputs (fixed-point values, integer
    * epoch), rounded at `scale` — bit-reproducible in any engine. */
  def gapfillInterpolate(rollup: DataFrame, entity: String, bucket: String,
                         value: String, stepSeconds: Long,
                         scale: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val step = expr(s"INTERVAL $stepSeconds SECOND")
    val w = Window.partitionBy(entity).orderBy(bucket)
    val pre = rollup
      .withColumn("__pb", lag(col(bucket), 1).over(w))
      .withColumn("__pv", lag(col(value), 1).over(w))
    val spine = pre.select(col(entity), col(bucket), col(value),
        col("__pb"), col("__pv"),
        explode(when(col("__pb").isNull, array(col(bucket)))
          .otherwise(sequence(col("__pb") + step, col(bucket), step)))
          .as("__t"))
    val frac = (unix_timestamp(col("__t")) - unix_timestamp(col("__pb")))
      .cast("double") /
      (unix_timestamp(col(bucket)) - unix_timestamp(col("__pb"))).cast("double")
    spine.select(col(entity), col("__t").as(bucket),
      graft.functions.Portable.pround(
        when(col("__t") === col(bucket), col(value))
          .otherwise(col("__pv") + (col(value) - col("__pv")) * frac),
        scale).as(value))
  }

  /** LTTB-style series DOWNSAMPLING (largest-triangle-three-buckets,
    * the TimescaleDB `lttb()` hyperfunction's job): keep ~`nBuckets`
    * visually-salient points per series. This is the PARALLEL variant:
    * canonical LTTB anchors each bucket's triangle on the previously
    * SELECTED point — a sequential recurrence that would serialize each
    * series — so the triangle anchors here are the neighbor buckets'
    * BOUNDARY points (previous bucket's last, next bucket's first),
    * which are actual data points, keeping every area an exact INTEGER
    * expression (epoch-millis × fixed-point value; overflow budget:
    * series span in ms × value·10^s must stay < 2^63) — deterministic
    * and bit-identical cross-engine, where canonical LTTB's
    * floating-point bucket averages are not. First/last buckets keep
    * the series' first/last point (the LTTB endpoint contract).
    *
    * Shape: one window family partitioned by series (bucket assignment
    * from the series' min/max ts, boundary structs, lag/lead), then the
    * per-bucket argmax runs through the bounded-heap
    * [[graft.plans.TopKPerKey]] — never a per-bucket sort. */
  def downsampleLttb(df: DataFrame, series: String, ts: String,
                     value: String, tieBreak: String, nBuckets: Int,
                     scale: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(series)
    val x = unix_millis(col(ts))
    val y = graft.functions.Portable.toFixed(col(value), scale)
    val pts = df.select(col(series), col(ts), col(value), col(tieBreak),
        x.as("__x"), y.as("__y"))
      .withColumn("__mn", min(col("__x")).over(w))
      .withColumn("__mx", max(col("__x")).over(w))
      .withColumn("__b",
        ((col("__x") - col("__mn")) * nBuckets /
          (col("__mx") - col("__mn") + 1)).cast("long"))
    val wb = Window.partitionBy(series).orderBy("__b")
    val stats = pts.groupBy(col(series), col("__b"))
      .agg(min(struct(col("__x"), col(tieBreak), col("__y"))).as("__first"),
        max(struct(col("__x"), col(tieBreak), col("__y"))).as("__last"))
      .withColumn("__pa", lag(col("__last"), 1).over(wb))
      .withColumn("__nb", lead(col("__first"), 1).over(wb))
      .select(col(series), col("__b"), col("__pa"), col("__nb"))
    // area·2 anchored on A=prev bucket's last, B=next bucket's first:
    // |(xP−xA)(yB−yA) − (xB−xA)(yP−yA)| — all longs. Endpoint buckets
    // score by ts so the series' first/last point wins.
    val area = abs(
      (col("__x") - col("__pa")("__x")) * (col("__nb")("__y") - col("__pa")("__y")) -
      (col("__nb")("__x") - col("__pa")("__x")) * (col("__y") - col("__pa")("__y")))
    val score = when(col("__pa").isNull, col("__mx") - col("__x"))
      .when(col("__nb").isNull, col("__x") - col("__mn"))
      .otherwise(area)
    graft.plans.TopKPerKey(
      pts.join(stats, Seq(series, "__b"))
        .select(col(series), col("__b").as("bucket"), col(ts), col(value),
          col(tieBreak), score.as("__score")),
      keys = Seq(col(series), col("bucket")),
      order = Seq(col("__score").desc, col(ts).asc, col(tieBreak).asc),
      k = 1, rankName = "__rk")
      .drop("__rk", "__score")
  }

  def counterDelta(df: DataFrame, keys: Seq[String], reading: String,
                   order: Seq[String], scale: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val prev = lag(col(reading), 1).over(w)
    val step = when(prev.isNull, lit(null).cast("double"))
      .when(col(reading) >= prev, col(reading) - prev)
      .otherwise(col(reading))
    val reset = (prev.isNotNull && col(reading) < prev).cast("int")
    df.withColumn("__step", step).withColumn("__reset", reset)
      .groupBy(keys.map(col): _*)
      .agg(
        coalesce(graft.functions.Portable.fixedSum(col("__step"), scale),
          lit(0.0)).as("counter_delta"),
        sum(col("__reset")).as("n_resets"),
        count(lit(1)).as("n_readings"))
  }

  /** TimescaleDB `counter_agg` → `rate()`: the reset-corrected increase
    * per SECOND over each group's observed span — [[counterDelta]]'s
    * delta divided by `last(ts) − first(ts)`. Groups whose readings
    * span zero time (a single reading, or all at one instant) report
    * NULL — there is no elapsed time to normalize by, Timescale's
    * `rate()` contract.
    *
    * Same ONE-shuffle window→agg shape as [[counterDelta]] (the lag
    * window and the agg share `keys`, so the agg reuses the window's
    * exchange). Elapsed time is exact integer microseconds and the
    * delta an exact fixed-point long sum; one double division at the
    * end, `pround`ed at `scale` — bit-reproducible cross-engine. */
  def counterRate(df: DataFrame, keys: Seq[String], reading: String,
                  ts: String, order: Seq[String], scale: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val prev = lag(col(reading), 1).over(w)
    val step = when(prev.isNull, lit(null).cast("double"))
      .when(col(reading) >= prev, col(reading) - prev)
      .otherwise(col(reading))
    df.withColumn("__step", step)
      .withColumn("__tu", unix_micros(col(ts)))
      .groupBy(keys.map(col): _*)
      .agg(
        graft.functions.Portable.fixedSum(col("__step"), scale).as("__delta"),
        min(col("__tu")).as("__t0"), max(col("__tu")).as("__t1"),
        count(lit(1)).as("n_readings"))
      .select(keys.map(col) :+
        when(col("__t1") > col("__t0"),
          graft.functions.Portable.pround(
            col("__delta") * lit(1000000.0) /
              (col("__t1") - col("__t0")).cast("double"), scale))
          .otherwise(lit(null).cast("double")).as("rate_per_sec") :+
        col("n_readings"): _*)
  }

  /** TimescaleDB `time_weighted_average` (LOCF weighting) equivalent:
    * per `keys` group, `Σ vᵢ·(tᵢ₊₁ − tᵢ) / Σ (tᵢ₊₁ − tᵢ)` — each
    * reading holds until the next one (last-observation-carried-
    * forward), so a reading's weight is the microseconds until its
    * successor; the group's last reading bounds the integral and
    * carries no weight. Groups whose readings span zero time (a single
    * reading, or all at one instant) report NULL. Same one-shuffle
    * window→agg shape as [[counterDelta]]; the numerator is an exact
    * long sum of `fixed(v)·Δµs` (value fixed at `scale`). */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], ts: String,
                      tieBreak: Seq[String], value: String,
                      scale: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
    val tu = unix_micros(col(ts))
    val dur = lead(tu, 1).over(w) - tu
    val p = math.pow(10, scale)
    df.withColumn("__dur", dur)
      .withColumn("__num",
        graft.functions.Portable.toFixed(col(value), scale) * col("__dur"))
      .groupBy(keys.map(col): _*)
      .agg(
        when(sum(col("__dur")) > 0, graft.functions.Portable.pround(
          sum(col("__num")).cast("double") / lit(p)
            / sum(col("__dur")).cast("double"), scale)).as("tw_avg"),
        count(lit(1)).as("n_readings"))
  }

  /** ASAP-style automatic smoothing (B38) — the role of the TimescaleDB
    * toolkit's `asap_smooth` (Rong & Bailis, VLDB'17: pick the moving-
    * average window that makes a dashboard series maximally readable),
    * SIMPLIFIED to its deterministic portable core: candidate windows
    * are a fixed dyadic grid, the chosen window minimizes the mean
    * squared first difference of the smoothed series (the paper's
    * roughness), and the kurtosis-preservation side constraint is
    * dropped (its float moments cannot be compared exactly across
    * engines — the simplification is stated, not hidden).
    *
    * EXACT selection: per candidate W, only FULL windows contribute
    * (trailing sum S over exactly W readings — integer), roughness
    * numerators Σ(ΔS)² accumulate in decimal(38), and candidates
    * compare by CROSS-MULTIPLICATION — W' beats W iff
    * `ssq'·W²·n < ssq·W'²·n'` (metric = Σ(ΔS_W)²/(W²·n_W), cleared of
    * divisions) with ties to the smaller window — so the argmin is
    * bit-reproducible anywhere (the oracle mirrors it via HUGEINT and
    * NOT EXISTS). Entities need ≥ 2 observations (no first difference
    * exists otherwise — such entities are absent, by contract).
    *
    * Shape: ONE entity window pass computes every candidate's trailing
    * sums as columns (all frames share the partition+order, Spark
    * fuses them into one Window operator), a stack() unpivot, one
    * (entity, W) lag window + roughness agg, a 4-rows-per-entity
    * tournament anti-join, and the winner joins back to emit the
    * chosen smoothed series. Every post-stack frame is series- or
    * candidate-sized. */
  def asapSmooth(series: DataFrame, entity: String, order: String,
                 fixed: String, windows: Seq[Int] = Seq(1, 2, 4, 8),
                 scale: Int = 4): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1) &&
      windows.distinct.size == windows.size, "windows must be distinct >= 1")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col(entity)).orderBy(col(order))
    val sumCols = windows.flatMap { W =>
      val f = w.rowsBetween(-(W - 1), 0)
      Seq(sum(col(fixed)).over(f).as(s"__S$W"),
        count(lit(1)).over(f).as(s"__c$W"))
    }
    val sums = series.select(
      Seq(col(entity), col(order)) ++ sumCols: _*)
    val stackArgs = windows
      .map(W => s"${W}L, __S$W, __c$W").mkString(", ")
    val stacked = sums
      .select(col(entity), col(order), expr(
        s"stack(${windows.size}, $stackArgs) AS (__w, __S, __cnt)"))
      .filter(col("__cnt") === col("__w"))
    val w2 = Window.partitionBy(col(entity), col("__w")).orderBy(col(order))
    val diffs = stacked
      .withColumn("__dS", col("__S") - lag(col("__S"), 1).over(w2))
      .filter(col("__dS").isNotNull)
    val g = diffs.groupBy(col(entity), col("__w"))
      .agg(sum((col("__dS").cast(dec) * col("__dS")).cast(dec)).as("__ssq"),
        count(lit(1)).as("__n"))
    // tournament: W loses to any W' with strictly smaller cleared
    // metric, or an equal metric at a smaller window
    val a = g.alias("a"); val b = g.alias("b")
    val ma = col("a.__ssq") * (col("b.__w") * col("b.__w") * col("b.__n")).cast(dec)
    val mb = col("b.__ssq") * (col("a.__w") * col("a.__w") * col("a.__n")).cast(dec)
    val winner = a.join(b,
        col(s"a.$entity") === col(s"b.$entity") &&
          col("a.__w") =!= col("b.__w") &&
          (mb < ma || (mb === ma && col("b.__w") < col("a.__w"))),
        "left_anti")
      .select(col(entity), col("__w").as("window"))
    stacked.join(winner,
        Seq(entity)).filter(col("__w") === col("window"))
      .select(col(entity), col(order), col("window"),
        graft.functions.Portable.pround(
          col("__S").cast("double") / col("window")
            / lit(math.pow(10, scale)), scale).as("smoothed"))
  }

  /** Top silent gaps per entity (B37) — the sensor-diagnostics view
    * behind every "when did this device go dark?" investigation: each
    * entity's k LONGEST intervals between consecutive readings, with
    * exact-µs bounds. One lag window builds the gap stream; the
    * bounded-heap [[graft.plans.TopKPerKey]] picks the k largest per
    * entity — a partial cap BEFORE the exchange, never a per-entity
    * sort of the full gap history. Ties (equal gap lengths) break on
    * the earlier start — deterministic, oracle-mirrorable. */
  def topGaps(df: DataFrame, entity: String, ts: String,
              tieBreak: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tieBreak))
    val gaps = df
      .select(col(entity), col(ts), col(tieBreak))
      .withColumn("gap_start", lag(col(ts), 1).over(w))
      .filter(col("gap_start").isNotNull)
      .select(col(entity), col("gap_start"), col(ts).as("gap_end"),
        (unix_micros(col(ts)) - unix_micros(col("gap_start"))).as("gap_us"))
    graft.plans.TopKPerKey(gaps,
      keys = Seq(col(entity)),
      order = Seq(col("gap_us").desc, col("gap_start").asc),
      k = k, rankName = "rnk")
  }

  /** TimescaleDB `interpolated_average` equivalent (B36) — the
    * CROSS-BUCKET time-weighted average [[timeWeightedAvg]] cannot
    * express: B19 partitions the window per bucket, so a reading that
    * holds across a bucket boundary contributes nothing to either side
    * (its closing segment is dropped) — exactly the hyperfunction gap
    * `interpolated_average(tws, bucket, width, prev, next)` exists to
    * close. Here the LOCF step curve is built ONCE over each entity's
    * full series and integrated bucket-by-bucket: every hold segment
    * `[t_i, t_{i+1})` is clipped to the buckets it crosses, so boundary
    * readings contribute their exact sub-durations to BOTH sides.
    * LOCF weighting (TimescaleDB `time_weight('LOCF')`); the 'Linear'
    * variant integrates a per-segment ramp whose exact value needs a
    * per-segment division — not portable-exact, deliberately out of
    * scope.
    *
    * Exact by construction: clipped durations are integer µs
    * (floor-div bucket indices via `pmod` — exact long arithmetic, no
    * float division near bucket boundaries; µs magnitudes overflow
    * double's 53-bit mantissa, so [[timeBucket]]'s double-floor trick
    * is NOT reused here), v·dur products sum in decimal(38) (the
    * oracle's HUGEINT), one IEEE division at the end. The covered
    * duration (`covered_us`) is reported — interpolated_average
    * divides by the covered span, NOT the bucket width, so sparse
    * buckets stay honest.
    *
    * Bucket ORIGIN is 2000-01-03 UTC like [[timeBucket]] (r13: this
    * path floored from the Unix epoch until the b36 width-fuzz family
    * was built — same disease the r12 fuzzer caught in timeBucket, at
    * the only other bucketing site; the canonical 6 h width divides
    * the 946857600 s offset, so fixtures never saw it). pmod-floorDiv
    * keeps pre-origin instants flooring toward −inf (spec-pinned).
    *
    * Shape: ONE entity-partitioned lead window, a per-segment explode
    * over the buckets it spans (output-spine-sized, the gapfill
    * discipline — a segment emits one row per bucket it touches), one
    * (entity, bucket) hash agg. Two exchanges, one scan, no self-join. */
  def twaInterpolated(df: DataFrame, entity: String, ts: String,
                      tieBreak: Seq[String], value: String,
                      bucketSeconds: Long, scale: Int): DataFrame = {
    require(bucketSeconds > 0, s"bucket width must be positive")
    import org.apache.spark.sql.expressions.Window
    // ordering by (__t, tieBreak) == (ts, tieBreak): unix_micros is
    // strictly monotone in ts, and the projection must keep every
    // window-ordering column alive
    val w = Window.partitionBy(col(entity))
      .orderBy((col("__t") +: tieBreak.map(col)): _*)
    val wUs = bucketSeconds * 1000000L
    val p = math.pow(10, scale)
    val dec = "decimal(38,0)"
    val seg = df
      .select(col(entity) +: tieBreak.map(col) :+
        unix_micros(col(ts)).as("__t") :+
        graft.functions.Portable.toFixed(col(value), scale).as("__v"): _*)
      .withColumn("__n", lead(col("__t"), 1).over(w))
      // zero-length holds (same-µs readings) integrate to nothing and
      // would make the bucket sequence DESCEND — drop them here
      .filter(col("__n").isNotNull && col("__n") > col("__t"))
    // origin-shifted exact floorDiv: (x - pmod(x, w)) / w floors toward
    // −inf for any sign of x (w > 0) in pure long arithmetic
    val originUs = 946857600000000L // 2000-01-03 UTC, timeBucket's origin
    def floorDivW(x: String): String =
      s"(($x) - pmod($x, ${wUs}L)) div ${wUs}L"
    val perBucket = seg
      .select(col(entity), col("__t"), col("__n"), col("__v"),
        explode(sequence(
          expr(floorDivW(s"__t - ${originUs}L")),
          expr(floorDivW(s"__n - 1 - ${originUs}L")))).as("__b"))
      .withColumn("__dur",
        least(col("__n"), (col("__b") + 1) * lit(wUs) + lit(originUs)) -
          greatest(col("__t"), col("__b") * lit(wUs) + lit(originUs)))
    perBucket
      .groupBy(col(entity),
        timestamp_micros(col("__b") * lit(wUs) + lit(originUs)).as("bucket"))
      .agg(
        sum((col("__v").cast(dec) * col("__dur")).cast(dec)).as("__num"),
        sum(col("__dur")).as("covered_us"),
        count(lit(1)).as("n_segments"))
      .select(col(entity), col("bucket"),
        graft.functions.Portable.pround(
          col("__num").cast("double") / lit(p)
            / col("covered_us").cast("double"), scale).as("tw_avg"),
        col("covered_us"), col("n_segments"))
  }

  /** TimescaleDB `stats_agg` → `slope()`/`intercept()`/`corr()`
    * equivalent: per-group least-squares regression of the reading
    * against elapsed seconds since the group's period start. Everything
    * reduces to five exact long sums (n, Σt, Σv, Σtv, Σt², Σv² — all
    * map-side-combinable, one shuffle), the closed forms are evaluated
    * once per group, and every float op afterwards (±,·,/,sqrt) is
    * IEEE-correctly-rounded — so the result is reproducible bit-for-bit
    * by any engine from the same sums, sqrt included. Readings are
    * fixed-pointed at `scale`; `t` must fit a long when squared-and-
    * summed (seconds within a day: Σt² ≤ n·7.5e9 — fine; raw epoch
    * MICROseconds would overflow, so the period start is subtracted
    * FIRST). Groups with < 2 readings or zero time/value variance
    * report NULL slope/corr (the 0/0 cases), like TimescaleDB. */
  def regression(df: DataFrame, keys: Seq[String], ts: String,
                 periodStart: Column, value: String,
                 scale: Int): DataFrame = {
    val p = math.pow(10, scale)
    // whole seconds: Spark's `/` on longs is TRUE division (double) —
    // cast back to long to floor, matching the oracle's `//`
    val t = ((unix_micros(col(ts)) - unix_micros(periodStart))
      / lit(1000000L)).cast("long")
    val v = graft.functions.Portable.toFixed(col(value), scale)
    val g = df.withColumn("__t", t).withColumn("__v", v)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__t")).as("__st"),
        sum(col("__v")).as("__sv"),
        sum(col("__t") * col("__v")).as("__stv"),
        sum(col("__t") * col("__t")).as("__stt"),
        sum(col("__v") * col("__v")).as("__svv"))
    val n = col("__n").cast("double")
    val st = col("__st").cast("double"); val sv = col("__sv").cast("double")
    val stv = col("__stv").cast("double"); val stt = col("__stt").cast("double")
    val svv = col("__svv").cast("double")
    val covN = n * stv - st * sv       // n²·cov — all exact-sum derived
    val varTN = n * stt - st * st      // n²·var(t)
    val varVN = n * svv - sv * sv      // n²·var(v)
    val slope = when(varTN > 0, covN / varTN / lit(p))
    val intercept = when(varTN > 0,
      (sv / lit(p) - (covN / varTN / lit(p)) * st) / n)
    val corr = when(varTN > 0 && varVN > 0, covN / sqrt(varTN * varVN))
    g.select(keys.map(col) ++ Seq(
      graft.functions.Portable.pround(slope, 6).as("slope"),
      graft.functions.Portable.pround(intercept, 4).as("intercept"),
      graft.functions.Portable.pround(corr, 6).as("corr"),
      col("__n").as("n_readings")): _*)
  }

  /** TimescaleDB `first(value, time)` / `last(value, time)` equivalent:
    * per `keys` group, the reading at the earliest and latest `order`
    * position. Spelled as `min_by`/`max_by` over a struct ordering key —
    * a PARTIAL-AGGREGABLE one-shuffle plan (map-side combine carries
    * one candidate per group per task), never a per-group sort; `order`
    * must be unique (include a row id) so ties cannot make the pick
    * nondeterministic. */
  def firstLast(df: DataFrame, keys: Seq[String], value: String,
                order: Seq[String]): DataFrame = {
    val key = struct(order.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(col(value), key).as("first_value"),
        max_by(col(value), key).as("last_value"),
        count(lit(1)).as("n_readings"))
  }

  /** TimescaleDB toolkit `candlestick_agg` equivalent: per group, the
    * OHLC tuple — open/close picked by `min_by`/`max_by` over the
    * unique (ts, tieBreak) ordering key (the B20 first/last machinery),
    * high/low as plain min/max — plus the reading count. Every output
    * is an EXACT pick of an input value (no sums, no rounding needed),
    * and the whole tuple is ONE partial-aggregable hash agg: map-side
    * combine carries one candidate set per group per task, one shuffle,
    * never a per-group sort. */
  def candlestick(df: DataFrame, keys: Seq[String], ts: String,
                  tieBreak: String, value: String): DataFrame = {
    val okey = struct(col(ts), col(tieBreak))
    df.groupBy(keys.map(col): _*)
      .agg(min_by(col(value), okey).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max_by(col(value), okey).as("close"),
        count(lit(1)).as("n_readings"))
  }

  /** TimescaleDB toolkit `heartbeat_agg`/`uptime()` equivalent: each
    * heartbeat proves liveness for `gapSeconds` after it; total live
    * time per entity is Σ min(Δ, gap) over consecutive heartbeats plus
    * a full `gap` for the final one (its liveness window runs to
    * completion unobserved). Exact-µs long arithmetic throughout;
    * `n_dead` counts the gaps where liveness lapsed (Δ > gap). Same
    * one-shuffle window→agg shape as [[stateAgg]]. */
  def heartbeatUptime(df: DataFrame, entity: String, ts: String,
                      tieBreak: String, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tieBreak))
    val gapUs = gapSeconds * 1000000L
    val us = unix_micros(col(ts))
    val delta = lead(us, 1).over(w) - us
    df.select(col(entity),
        coalesce(least(delta, lit(gapUs)), lit(gapUs)).as("__live"),
        when(delta > gapUs, 1L).otherwise(0L).as("__dead"))
      .groupBy(col(entity))
      .agg(sum(col("__live")).as("live_us"),
        sum(col("__dead")).as("n_dead"),
        count(lit(1)).as("n_heartbeats"))
  }

  /** TimescaleDB toolkit `state_agg`/`duration_in()` equivalent: treat
    * `state` as the entity's state machine — each row's state holds
    * from its timestamp until the entity's NEXT event, and the report
    * is total time held in each state per entity, in EXACT microseconds
    * (`unix_micros` longs; no float time arithmetic), plus the entry
    * count. The entity's final event opens an unbounded interval and
    * contributes zero duration but still counts as an entry — the
    * closed-intervals-only contract, stated here because `state_agg`
    * implementations differ on it.
    *
    * Shape: one window family (lead over (ts, tieBreak)) partitioned by
    * the entity, then a hash agg on (entity, state) — a narrow
    * dependency between the two, so ONE shuffle total; never a
    * self-join of the series against itself. `tieBreak` must make the
    * ordering total or simultaneous readings make the hold durations
    * nondeterministic. */
  def stateAgg(df: DataFrame, entity: String, state: String,
               ts: String, tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tieBreak))
    val us = unix_micros(col(ts))
    df.select(col(entity), col(state),
        (coalesce(lead(us, 1).over(w), us) - us).as("__dur"))
      .groupBy(col(entity), col(state))
      .agg(sum(col("__dur")).as("held_us"), count(lit(1)).as("n_entries"))
  }

  /** Exponentially-weighted moving average (α = 1/2, span-bounded) over
    * an already-fixed-point series — the dashboard smoothing curve
    * (pandas `ewm(alpha=.5).mean()`, Influx `exponential_moving_average`)
    * made ENGINE-PORTABLE: the classic recursive EWMA folds the entire
    * history through float multiplies (never reproducible across
    * engines), so this is the TRUNCATED form — the last `span`
    * observations with integer weights 2^(span-1-j) for lag j (α = 1/2
    * makes every weight a power of two). Numerator and present-weight
    * denominator are EXACT integer sums of `span` lag terms; one IEEE
    * division at the end. Truncation error vs the infinite EWMA is
    * ≤ 2^-span of the weight mass — with span 8, under 0.4%, and the
    * semantics are *stated* as span-bounded rather than pretending to
    * the recursive curve.
    *
    * `fixed` must be an exact integer column (a [[graft.functions.Portable.toFixed]]
    * daily sum — the b21 rollup discipline). Rows with fewer than `span`
    * predecessors use exactly the weights of the lags present (the
    * `adjust=True` pandas convention restricted to the window).
    *
    * Shape: `span` lags over ONE entity-partitioned window — one
    * exchange, one sort, all codegen'd; no self-join, no UDF, state per
    * row is `span` longs regardless of series length. */
  def ewma(series: DataFrame, entity: String, order: String,
           fixed: String, span: Int, scale: Int): DataFrame = {
    require(span >= 1 && span <= 62, s"span must be in [1, 62], got $span")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity)).orderBy(col(order))
    val terms = (0 until span).map { j =>
      val wt = 1L << (span - 1 - j)
      val l = lag(col(fixed), j).over(w)
      (when(l.isNotNull, l * lit(wt)).otherwise(lit(0L)),
        when(l.isNotNull, lit(wt)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    series.withColumn("ewma",
      graft.functions.Portable.pround(
        num.cast("double") / den.cast("double") / lit(math.pow(10, scale)), scale))
  }

  /** Lag-k autocorrelation per entity over an ordered series — the
    * seasonality/persistence probe (pandas `Series.autocorr(lag)`,
    * statsmodels `acf`): Pearson correlation of the series against
    * itself shifted by `k` positions. Formed EXACTLY: the (current,
    * k-back) pairs come from one `lag` window, then the b22 five-sum
    * discipline — n, Σa, Σb, Σa², Σb², Σab as decimal(38) (products of
    * two fixed-point dailies can pass 2^63; decimal sums stay exact and
    * order-independent) — and corr = (nΣab − ΣaΣb)/√((nΣa²−(Σa)²)(nΣb²−(Σb)²))
    * with every float op after the exact sums correctly rounded, hence
    * oracle-reproducible. Entities with < k+2 observations or a
    * zero-variance side report NULL (undefined), with the pair count.
    *
    * Shape: one entity-partitioned lag window, then a hash agg on the
    * entity — narrow between the two, ONE shuffle total (the window
    * exchange is reused by the agg), never a self-join of the series. */
  def autocorr(series: DataFrame, entity: String, order: String,
               fixed: String, k: Int): DataFrame = {
    require(k >= 1, s"lag must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity)).orderBy(col(order))
    val dec = "decimal(38,0)"
    val pairs = series
      .select(col(entity), col(fixed).as("__a"),
        lag(col(fixed), k).over(w).as("__b"))
      .filter(col("__b").isNotNull)
    val g = pairs.groupBy(col(entity)).agg(
      count(lit(1)).as("__n"),
      sum(col("__a").cast(dec)).as("__sa"),
      sum(col("__b").cast(dec)).as("__sb"),
      sum((col("__a").cast(dec) * col("__a")).cast(dec)).as("__saa"),
      sum((col("__b").cast(dec) * col("__b")).cast(dec)).as("__sbb"),
      sum((col("__a").cast(dec) * col("__b")).cast(dec)).as("__sab"))
    val n = col("__n").cast("double")
    val sa = col("__sa").cast("double"); val sb = col("__sb").cast("double")
    val saa = col("__saa").cast("double"); val sbb = col("__sbb").cast("double")
    val sab = col("__sab").cast("double")
    val covN = n * sab - sa * sb
    val varA = n * saa - sa * sa
    val varB = n * sbb - sb * sb
    g.select(col(entity),
      graft.functions.Portable.pround(
        when(col("__n") >= 2 && varA > 0 && varB > 0,
          covN / sqrt(varA * varB)), 6).as(s"autocorr_$k"),
      col("__n").as("n_pairs"))
  }

  /** Instantaneous counter delta / rate (B40) — TimescaleDB
    * `counter_agg`'s `idelta_right` / `irate_right` role, the "what is
    * this gauge doing RIGHT NOW" companion to B18/B29's whole-window
    * delta/rate: per key, the change between the LAST two readings
    * (counter-reset-aware: a drop reports the post-reset reading, the
    * B18 contract) and that change divided by the µs-exact elapsed
    * seconds. One `(ts, tie)` window + one conditional agg per key —
    * single hash-partition family; keys with one reading report NULLs
    * (no pair, honestly absent semantics). Returns `(key, last_ts,
    * idelta, irate_per_sec)`. */
  def instantRate(events: DataFrame, key: String, ts: String,
                  tieCol: String, value: String,
                  scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = math.pow(10, scale)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col(tieCol).desc)
    val top2 = events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
    val agg = top2.groupBy(col(key))
      .agg(
        max(when(col("__rn") === 1, col(ts))).as("last_ts"),
        max(when(col("__rn") === 1,
          graft.functions.Portable.toFixed(col(value), scale)))
          .as("__vl"),
        max(when(col("__rn") === 2,
          graft.functions.Portable.toFixed(col(value), scale)))
          .as("__vp"),
        max(when(col("__rn") === 1, unix_micros(col(ts)))).as("__tl"),
        max(when(col("__rn") === 2, unix_micros(col(ts)))).as("__tp"))
    val deltaFx = when(col("__vl") >= col("__vp"),
      col("__vl") - col("__vp")).otherwise(col("__vl"))
    agg.select(col(key), col("last_ts"),
      when(col("__vp").isNotNull,
        deltaFx.cast("double") / lit(p)).as("idelta"),
      when(col("__vp").isNotNull && col("__tl") > col("__tp"),
        graft.functions.Portable.pround(
          (deltaFx.cast("double") / lit(p)) /
            ((col("__tl") - col("__tp")).cast("double") / lit(1000000.0)),
          scale)).as("irate_per_sec"))
  }

  /** Weekly seasonal baseline + residuals (B39) — the
    * seasonal-decomposition first step every volume monitor needs
    * before flagging ("Sunday is always low; is THIS Sunday low for a
    * Sunday?"): per (key, day-of-week), the exact mean of the key's
    * daily fixed-point sums; each day reports its value, its weekday
    * baseline and the residual. Day-of-week is the pure-integer
    * `pmod(days since 1970-01-01, 7)` (0 = Thursday) — no calendar
    * function whose week-start convention could differ across engines.
    * Exactness: the mean divides two exact integers ONCE, and the
    * residual is computed from the exact cross product
    * `(n·v − S) / n` (decimal(38) numerator — never value − mean,
    * whose two roundings can straddle a pround boundary; the DQ5
    * discipline). Returns `(key, day, dow, value, baseline,
    * residual)`.
    *
    * Scale shape: the daily rollup is the only input-sized stage
    * (map-combined); the (key, dow) baseline agg and the join-back are
    * calendar-sized, one (key, dow) hash family. */
  def seasonalBaseline(events: DataFrame, key: String, ts: String,
                       value: String, scale: Int = 4): DataFrame =
    seasonalFromDaily(
      events.groupBy(col(key), to_date(col(ts)).as("day"))
        .agg(sum(graft.functions.Portable.toFixed(col(value), scale))
          .as("__fv")),
      key, scale)

  /** The post-rollup stage of [[seasonalBaseline]], exposed so a
    * MAINTAINED per-(key, day) fixed-sum table (additive — a plain
    * update-mode streaming agg) feeds an always-current seasonal
    * report without re-reading raw events. `daily` must be one row per
    * (key, day) carrying the fixed-point sum `__fv`. */
  def seasonalFromDaily(daily: DataFrame, key: String,
                        scale: Int = 4): DataFrame = {
    val p = math.pow(10, scale)
    val dec = "decimal(19,0)"
    val dow = pmod(
      datediff(col("day"), lit("1970-01-01").cast("date")), lit(7))
    val withDow = daily.withColumn("dow", dow)
    val base = withDow.groupBy(col(key), col("dow"))
      .agg(sum(col("__fv")).as("__s"), count(lit(1)).as("__n"))
    withDow.join(base, Seq(key, "dow"))
      .select(col(key), col("day"), col("dow"),
        (col("__fv").cast("double") / lit(p)).as("value"),
        graft.functions.Portable.pround(
          col("__s").cast("double") / col("__n").cast("double") / lit(p),
          scale).as("baseline"),
        graft.functions.Portable.pround(
          (col("__n").cast(dec) * col("__fv").cast(dec) -
            col("__s").cast(dec)).cast("double")
            / col("__n").cast("double") / lit(p),
          scale).as("residual"))
  }
}
