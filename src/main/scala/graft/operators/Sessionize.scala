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
    * raw events flow in.
    *
    * The entity-keyed `repartition` below is load-bearing: without it
    * Catalyst collapses the distinct under the cohort MIN (min is
    * distinct-insensitive), so the two consumers share NO subtree and
    * the raw events are scanned + collapsed TWICE. Anchored, both the
    * cohort MIN and the join-back hang off the SAME entity-keyed
    * exchange over the one distinct collapse — the second consumer is
    * a ReusedExchange (one FileScan, PlanSpec-asserted), and the join
    * needs no further shuffle. */
  def retentionCohorts(events: DataFrame, entity: String,
                       ts: String): DataFrame =
    cohortCounts(
      events.select(col(entity), to_date(col(ts)).as("__day")).distinct(),
      entity)

  /** The post-collapse stage of [[retentionCohorts]], exposed so the
    * streaming maintenance ([[graft.streaming.IotStreamPipeline
    * .retentionCycle]]) re-derives counts from its compact activity
    * ledger through the SAME code path as batch (they cannot drift).
    * `active` must be distinct `(entity, __day)` rows. */
  def cohortCounts(active: DataFrame, entity: String): DataFrame = {
    val anchored = active.repartition(col(entity))
    val cohorts = anchored.groupBy(col(entity))
      .agg(min(col("__day")).as("cohort_day"))
    anchored.join(cohorts, Seq(entity))
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_entities"))
  }

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
    * backtracking funnels whose result depends on search order.
    *
    * Checkpoint contract: each (entity-sized, bounded) step frame is
    * pinned LAZILY — no job runs until the caller's first action —
    * because step i+1 builds on frame i and the final union reads
    * every frame; unpinned, the union would re-derive an O(steps²)
    * chain of subtrees. The default `localCheckpoint` pin truncates
    * lineage onto executor-local storage: on a multi-node cluster a
    * lost executor makes the query fail-and-rerun instead of
    * recomputing (batch re-runs are idempotent, and the frames are
    * cheap). Pass `reliable = true` to pin via `checkpoint()` to the
    * session's fault-tolerant checkpoint dir instead (requires
    * `SparkContext.setCheckpointDir`; survives executor loss at the
    * cost of a DFS round trip per step). */
  def funnel(events: DataFrame, entity: String, ts: String, typeCol: String,
             steps: Seq[String], windowSeconds: Long,
             reliable: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
    var cur = pin(events.filter(col(typeCol) === steps.head)
      .groupBy(col(entity)).agg(min(col(ts)).as("__t"))
      .withColumn("__anchor", col("__t")))
    val frames = scala.collection.mutable.ArrayBuffer((1, steps.head, cur))
    for (i <- 1 until steps.size) {
      val si = events.filter(col(typeCol) === steps(i))
        .select(col(entity), col(ts).as("__ti"))
      cur = pin(cur.join(si, Seq(entity))
        .filter(col("__ti") >= col("__t") &&
          col("__ti").cast("double") - col("__anchor").cast("double") <=
            windowSeconds.toDouble)
        .groupBy(col(entity), col("__anchor"))
        .agg(min(col("__ti")).as("__t"))
        .select(col(entity), col("__t"), col("__anchor")))
      frames += ((i + 1, steps(i), cur))
    }
    frames.map { case (step, name, f) =>
      f.agg(count(lit(1)).as("n_entities"))
        .select(lit(step).as("step"), lit(name).as("step_name"),
          col("n_entities"))
    }.reduce(_ unionByName _)
  }
}
