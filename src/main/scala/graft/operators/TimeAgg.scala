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
    * already-bucketed rollup, emit one row per (entity, bucket) over each
    * entity's [min, max] bucket range, zero-filling `fillZero` columns
    * and carrying the last observation forward for `locf` columns
    * (emitted as `<col>_locf`).
    *
    * Scale shape: the spine is a per-entity `sequence` + `explode` (no
    * driver-side range), the fill join is a shuffle on (entity, bucket)
    * that AQE sizes, and LOCF is one running `last(ignoreNulls)` window
    * per entity — a single sort, no self-join per gap. */
  def gapfillLocf(rollup: DataFrame, entity: String, bucket: String,
                  stepSeconds: Long, fillZero: Seq[String],
                  locf: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spine = rollup.groupBy(col(entity))
      .agg(min(col(bucket)).as("__lo"), max(col(bucket)).as("__hi"))
      .select(col(entity), explode(
        sequence(col("__lo"), col("__hi"),
          expr(s"INTERVAL $stepSeconds SECOND"))).as(bucket))
    val joined = spine.join(rollup, Seq(entity, bucket), "left")
    val zeroed = fillZero.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))))
    val w = Window.partitionBy(entity).orderBy(bucket)
      .rowsBetween(Window.unboundedPreceding, 0)
    locf.foldLeft(zeroed)((d, c) =>
      d.withColumn(s"${c}_locf", last(col(c), ignoreNulls = true).over(w))
        .drop(c))
  }
}
