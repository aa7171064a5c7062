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
    * Scale shape: each observed row emits itself plus the missing
    * buckets since the entity's previous observation (`lag` + `sequence`
    * + `explode`) — no spine branch, no fill join, ONE scan of the
    * rollup. The gap-generation lag window and the LOCF running
    * `last(ignoreNulls)` window share the entity partitioning, so the
    * whole operator adds exactly one exchange (verified in PlanSpec).
    * Output size is the filled spine either way; this shape just never
    * materializes a second aggregate of the input to find it. */
  def gapfillLocf(rollup: DataFrame, entity: String, bucket: String,
                  stepSeconds: Long, fillZero: Seq[String],
                  locf: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val step = expr(s"INTERVAL $stepSeconds SECOND")
    val others = rollup.columns.filterNot(c => c == entity || c == bucket).toSeq
    val wLag = Window.partitionBy(entity).orderBy(bucket)
    val exploded = rollup
      .withColumn("__prev", lag(col(bucket), 1).over(wLag))
      .withColumn("__b", explode(
        when(col("__prev").isNull, array(col(bucket)))
          .otherwise(sequence(col("__prev") + step, col(bucket), step))))
      .withColumn("__obs", col("__b") === col(bucket))
    // gap rows: every non-key column reverts to null (what the fill
    // join produced for spine-only rows), then zero-fill / LOCF apply
    val masked = others.foldLeft(exploded)((d, c) =>
      d.withColumn(c, when(col("__obs"), col(c))))
      .drop("__prev", "__obs", bucket)
      .withColumnRenamed("__b", bucket)
    val zeroed = fillZero.foldLeft(masked)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))))
    val wLocf = Window.partitionBy(entity).orderBy(bucket)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = locf.foldLeft(zeroed)((d, c) =>
      d.withColumn(s"${c}_locf", last(col(c), ignoreNulls = true).over(wLocf))
        .drop(c))
    filled.select(col(entity) +: col(bucket) +:
      others.map(c => if (locf.contains(c)) col(s"${c}_locf") else col(c)): _*)
  }
}
