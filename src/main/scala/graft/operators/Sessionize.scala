package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the batch analog of
  * the reference's per-device time-bucketed grouping (reference:
  * shared/mongodb/initdb.d/generator.py groups metrics into 4h windows;
  * sessionization generalizes that to activity-gap windows).
  *
  * One shuffle (partitionBy entity), two window passes, all codegen'd
  * expressions. At 100 TB the state per entity is bounded by its own
  * event count; skewed entities are handled by AQE (sort-based window).
  */
object Sessionize {

  /** Assign `session_id` per entity: a new session starts when the gap
    * since the previous event exceeds `gapSeconds`. Deterministic
    * tie-break on `tieCol` for equal timestamps. */
  def assign(events: DataFrame, entity: String, ts: String, tieCol: String,
             gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tieCol))
    val prev = lag(col(ts), 1).over(w)
    events
      // cast-to-double keeps sub-second precision (unix_timestamp truncates,
      // which would disagree with the oracle's fractional epoch() on gaps
      // that straddle a whole-second boundary)
      .withColumn("__new", when(
        prev.isNull || (col(ts).cast("double") - prev.cast("double") > gapSeconds.toDouble),
        lit(1)).otherwise(lit(0)))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Per-session rollup: bounds + event count + value sum. */
  def summarize(events: DataFrame, entity: String, ts: String, tieCol: String,
                valueCol: String, gapSeconds: Long): DataFrame =
    assign(events, entity, ts, tieCol, gapSeconds)
      .groupBy(col(entity), col("session_id"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.functions.Portable.fixedSum(col(valueCol), 4).as("value_sum"))
}
