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

  /** Conversion funnel over an event stream (the ClickHouse
    * `windowFunnel` role, with the deterministic EARLIEST-CHAIN
    * semantics every SQL funnel uses): step 1 anchors at the entity's
    * FIRST step-1 event; step i+1 completes at the earliest step-(i+1)
    * event at-or-after step i's completion, provided it still falls
    * within `windowSeconds` of the anchor. Returns one row per step:
    * `(step, step_name, n_entities)` — entities whose chain reached
    * that step (monotonically non-increasing).
    *
    * Scale shape: one filtered grouped MIN per step, every join/agg
    * keyed on the entity — a single hash-partition family (no windows,
    * no per-entity event lists collected); step frames shrink
    * monotonically, and the per-step counts ride map-side partial
    * aggregation. Earliest-chain is deliberately deterministic and
    * plain-SQL-expressible (oracle-mirrorable), unlike any-start
    * backtracking funnels whose result depends on search order. */
  /** Retention cohorts — the funnel's companion event-analytics query:
    * each entity joins the cohort of its FIRST active day; a cohort's
    * day-N retention is how many of its entities were active exactly N
    * days later. Returns `(cohort_day, day_offset, n_entities)` with
    * offset 0 = the cohort size itself.
    *
    * Scale shape: activity collapses to distinct (entity, day) rows
    * map-side FIRST (the only input-sized reduction); cohorts are a
    * grouped MIN over that (not the raw events), the join back is
    * entity-keyed in the same hash-partition family, and the final
    * count is (cohort × offset)-sized — calendar-bounded however many
    * raw events flow in. */
  def retentionCohorts(events: DataFrame, entity: String,
                       ts: String): DataFrame = {
    val active = events
      .select(col(entity), to_date(col(ts)).as("__day")).distinct()
    val cohorts = active.groupBy(col(entity))
      .agg(min(col("__day")).as("cohort_day"))
    active.join(cohorts, Seq(entity))
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_entities"))
  }

  def funnel(events: DataFrame, entity: String, ts: String, typeCol: String,
             steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // each step frame is localCheckpoint-pinned: step i+1 builds on it,
    // and the final count union reads every frame — without the pin the
    // union would re-derive an O(steps²) chain of subtrees
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(entity)).agg(min(col(ts)).as("__t"))
      .withColumn("__anchor", col("__t"))
      .localCheckpoint()
    val frames = scala.collection.mutable.ArrayBuffer((1, steps.head, cur))
    for (i <- 1 until steps.size) {
      val si = events.filter(col(typeCol) === steps(i))
        .select(col(entity), col(ts).as("__ti"))
      cur = cur.join(si, Seq(entity))
        .filter(col("__ti") >= col("__t") &&
          col("__ti").cast("double") - col("__anchor").cast("double") <=
            windowSeconds.toDouble)
        .groupBy(col(entity), col("__anchor"))
        .agg(min(col("__ti")).as("__t"))
        .select(col(entity), col("__t"), col("__anchor"))
        .localCheckpoint()
      frames += ((i + 1, steps(i), cur))
    }
    frames.map { case (step, name, f) =>
      f.agg(count(lit(1)).as("n_entities"))
        .select(lit(step).as("step"), lit(name).as("step_name"),
          col("n_entities"))
    }.reduce(_ unionByName _)
  }
}
