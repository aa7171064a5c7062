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
  def timeBucket(ts: Column, widthSeconds: Long): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / widthSeconds) * widthSeconds)

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
}
