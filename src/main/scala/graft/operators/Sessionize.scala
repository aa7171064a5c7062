package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Cohort VALUE / LTV curve (C15) — retention's revenue-weighted
    * sibling, the "how much is a cohort worth by day N" curve every
    * growth dashboard carries: entities join the cohort of their first
    * active day (C10's contract), each (cohort, offset) cell sums the
    * cohort's value that day exactly (fixed-point), and a per-cohort
    * cumulative over offsets yields the LTV curve. Returns
    * `(cohort_day, day_offset, n_entities, revenue, cum_revenue)`.
    *
    * Scale shape: ONE input-sized stage (the per-(entity, day) value
    * rollup — map-side combined), the same entity-anchored exchange
    * discipline as [[retentionCohorts]] (cohort MIN and join-back share
    * the exchange; the anchor keeps Catalyst from collapsing the
    * rollup under the MIN and double-scanning), then everything is
    * cohort-calendar-sized — including the cumulative window, which
    * partitions by cohort over the final cells. */
  def cohortValue(events: DataFrame, entity: String, ts: String,
                  value: String, scale: Int = 4): DataFrame =
    cohortValueFromDaily(
      events.groupBy(col(entity), to_date(col(ts)).as("__day"))
        .agg(sum(graft.functions.Portable.toFixed(col(value), scale))
          .as("__fv")),
      entity, scale)

  /** The post-rollup stage of [[cohortValue]], exposed so a MAINTAINED
    * per-(entity, day) fixed-value rollup (a plain update-mode
    * streaming agg — daily sums are additive, Spark's state makes them
    * exactly-once under the checkpoint) feeds an always-current LTV
    * curve without re-reading raw events — the [[cohortCounts]] /
    * [[stickinessFromLedger]] seam discipline. `daily` must be one row
    * per (entity, __day) carrying the fixed-point sum `__fv`. */
  def cohortValueFromDaily(dailyIn: DataFrame, entity: String,
                           scale: Int = 4): DataFrame = {
    val p = math.pow(10, scale)
    val daily = dailyIn.repartition(col(entity))
    val cohorts = daily.groupBy(col(entity))
      .agg(min(col("__day")).as("cohort_day"))
    val cells = daily.join(cohorts, Seq(entity))
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col(entity)).as("n_entities"),
        sum(col("__fv")).as("__rev"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.select(col("cohort_day"), col("day_offset"), col("n_entities"),
      (col("__rev").cast("double") / lit(p)).as("revenue"),
      (sum(col("__rev")).over(w).cast("double") / lit(p)).as("cum_revenue"))
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
             reliable: Boolean = false): DataFrame =
    funnelFrames(events, entity, ts, typeCol, steps, windowSeconds, reliable)
      .map { case (step, name, f) =>
        f.agg(count(lit(1)).as("n_entities"))
          .select(lit(step).as("step"), lit(name).as("step_name"),
            col("n_entities"))
      }.reduce(_ unionByName _)

  /** The per-step completion frames behind [[funnel]] — one
    * `(step, name, frame)` per step, each frame holding
    * `(entity, __t = completion ts, __anchor = step-1 ts)` for the
    * entities whose chain reached that step. Shared by [[funnel]] and
    * [[funnelTimes]] so the chain semantics cannot drift. */
  private def funnelFrames(events: DataFrame, entity: String, ts: String,
                           typeCol: String, steps: Seq[String],
                           windowSeconds: Long,
                           reliable: Boolean): Seq[(Int, String, DataFrame)] = {
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
    frames.toSeq
  }

  /** Funnel VELOCITY (C16) — the time-to-convert readout next to C9's
    * counts: per step, how many entities completed it and the exact
    * interpolated median / p90 seconds from the ANCHOR (the step-1
    * event) to that step's completion — "half the converters purchase
    * within N minutes of first view". Times are µs-exact integer
    * differences unscaled once; the percentiles are the B8 exact
    * machinery (hash-proven ≡ `quantile_cont`), `pround`ed so the
    * interpolation's last ULP cannot disagree cross-engine. Step 1 is
    * the anchor itself (all zeros, kept for the complete readout).
    * Same frames, same per-step grouped-MIN shape as [[funnel]]. */
  def funnelTimes(events: DataFrame, entity: String, ts: String,
                  typeCol: String, steps: Seq[String], windowSeconds: Long,
                  reliable: Boolean = false): DataFrame =
    funnelFrames(events, entity, ts, typeCol, steps, windowSeconds, reliable)
      .map { case (step, name, f) =>
        val secs = (unix_micros(col("__t")) - unix_micros(col("__anchor")))
          .cast("double") / lit(1e6)
        f.select(secs.as("__s"))
          .agg(count(lit(1)).as("n_entities"),
            graft.functions.Portable.pround(
              percentile(col("__s"), lit(0.5)), 4).as("median_s"),
            graft.functions.Portable.pround(
              percentile(col("__s"), lit(0.9)), 4).as("p90_s"))
          .select(lit(step).as("step"), lit(name).as("step_name"),
            col("n_entities"), col("median_s"), col("p90_s"))
      }.reduce(_ unionByName _)

  /** Event-path transition matrix (C11) — per-entity Markov bigrams:
    * for each event, the (previous event type → this event type)
    * transition along the entity's (ts, tieCol)-ordered stream, counted
    * corpus-wide with how many distinct entities exhibited each
    * transition. The product-analytics "user path" view (Amplitude
    * Pathfinder / Mixpanel flows, first hop) and the raw material for
    * Markov-chain attribution.
    *
    * Shape: one `lag` over the entity-partitioned window, then a hash
    * agg on (prev, curr) — the per-entity distinct count rides the same
    * agg as a count-distinct (Spark expands it to a two-phase partial
    * agg keyed on (prev, curr, entity); both exchanges carry transition
    * rows, never the raw stream twice). Each entity's first event has
    * no predecessor and is excluded (a "(start)" pseudo-state would be
    * a one-line `coalesce`, left out to keep the oracle obvious). */
  def transitions(events: DataFrame, entity: String, ts: String,
                  tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tieCol))
    events
      .select(col(entity), col(typeCol).as("curr_type"),
        lag(col(typeCol), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("curr_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col(entity)).as("n_entities"))
  }

  /** Last-touch conversion attribution (C12) — for every conversion
    * event, the most recent touch event (at or before it, same entity)
    * within `lookbackSeconds`, rolled up to per-touch-type attributed
    * conversion counts plus an `(unattributed)` row. The marketing-
    * analytics core loop (GA4 last-click, Adjust last-touch); ties at
    * the same timestamp resolve to the touch with the larger `tieCol`
    * (latest-wins made total).
    *
    * NOT a d6 as-of join: touches and conversions ride ONE stream, so
    * the operator is a single tagged window pass — `last(touch-struct,
    * ignoreNulls)` over the entity-ordered stream carries (touch ts,
    * touch type) onto each conversion row (the struct rides as one
    * column, so the type can never pair with a different row's
    * staleness time), then the lookback test and one small agg. One
    * input-sized exchange (the entity window), one sketch-sized count
    * agg; no self-join of events against events.
    *
    * Ordering contract: at identical (ts, tieCol) the window frame is
    * rows-based, so touch/conversion interleavings at the exact same
    * (ts, tieCol) key would be nondeterministic — `tieCol` must be
    * unique per entity (an event id), the same totality contract as
    * [[assign]]. */
  def lastTouchAttribution(events: DataFrame, entity: String, ts: String,
                           tieCol: String, typeCol: String,
                           touchTypes: Seq[String], conversionType: String,
                           lookbackSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col(typeCol).isin(touchTypes.map(x => x: Any): _*)
    val touch = last(
      when(isTouch, struct(col(ts).as("t"), col(typeCol).as("ty"))),
      ignoreNulls = true).over(w)
    events
      .withColumn("__touch", touch)
      .filter(col(typeCol) === conversionType)
      .withColumn("touch_type",
        when(col("__touch").isNotNull &&
          col(ts).cast("double") - col("__touch.t").cast("double") <=
            lookbackSeconds.toDouble,
          col("__touch.ty")).otherwise(lit("(unattributed)")))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        countDistinct(col(entity)).as("n_converters"))
  }

  /** Multi-touch attribution (C22) — the four standard credit models
    * (linear, first-touch, last-touch, U-shaped 40/20/40) computed
    * TOGETHER over one pass, in exact integer micro-cents so the split
    * is deterministic and mass-conserving (every conversion's credit
    * sums back to exactly `round(value·100)·10^6` µ¢ under every
    * model — float splits can't promise that).
    *
    * Per conversion: its touch set is every `touchTypes` event of the
    * same entity within `[conv_ts - lookback, conv_ts]`. Credit:
    *  - linear: each touch gets `U div n`; the EARLIEST touch also
    *    takes the remainder.
    *  - first / last: the earliest / latest touch takes all of `U`.
    *  - position (U-shape): first gets 40% (`(U·2) div 5`), last 40%,
    *    the `n−2` middles split the remaining ≥20% evenly, remainder
    *    to the first touch; `n==2` → floor-half to last, rest to
    *    first; `n==1` → all to the only touch.
    * Conversions with NO in-window touch credit `(unattributed)`.
    *
    * Shape — the [[lastTouchAttribution]] discipline, not a self-join:
    * touches and conversions ride ONE stream; per-type in-window touch
    * counts are range-window sums and the earliest/latest touch is the
    * min/max of a zero-padded `(ts, tie, type)` key string over the
    * same frame, so the whole pairing costs ONE entity-keyed exchange.
    * The per-model, per-type split is then pure in-row integer
    * arithmetic on those counts, and the output agg is
    * (|touchTypes|+1)-sized. No events×events join, no unbounded
    * collect_list state.
    *
    * Contracts: `tieCol` unique per entity and non-negative numeric
    * (it is zero-padded into the ordering key); `valueCol` non-negative
    * (integral `div` == floor only then — both engines agree), and a
    * NULL `valueCol` on a conversion row counts as 0 value (the row
    * still attributes — a NULL must not null-propagate through every
    * credit expression and silently drop the conversion from all four
    * models, which would break mass conservation without an error);
    * timestamps after 1970 (µs field zero-padded). Scale note: summed
    * credits are µ¢ longs — overflow needs ~4.6e9 conversions of $20,
    * the [[graft.functions.Portable]] pick-your-scale caveat.
    *
    * Reference analog: the examples layer's campaign roll-ups
    * (reference dbt examples join events to outcomes per user); the
    * model set is the GA4/Adjust attribution menu. */
  def multiTouchAttribution(events: DataFrame, entity: String, ts: String,
                            tieCol: String, typeCol: String,
                            touchTypes: Seq[String], conversionType: String,
                            valueCol: String,
                            lookbackSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      "conversionType must not also be a touch type")
    val tUs = unix_micros(col(ts))
    val w = Window.partitionBy(col(entity)).orderBy(tUs)
      .rangeBetween(-lookbackSeconds * 1000000L, 0L)
    val isTouch = col(typeCol).isin(touchTypes.map(x => x: Any): _*)
    val touchKey = when(isTouch, format_string("%020d|%020d|%s",
      tUs, col(tieCol).cast("long"), col(typeCol)))
    val cntCols = touchTypes.zipWithIndex.map { case (ty, i) =>
      s"__c$i" -> sum(when(col(typeCol) === ty, 1L).otherwise(0L)).over(w)
    }
    val base = events
      .filter(col(typeCol).isin((touchTypes :+ conversionType).map(x => x: Any): _*))
    val withWins = cntCols.foldLeft(base) { case (df, (nm, c)) =>
      df.withColumn(nm, c)
    }
      .withColumn("__f", min(touchKey).over(w))
      .withColumn("__l", max(touchKey).over(w))
      .filter(col(typeCol) === conversionType)
    // all integer from here: U µ¢, n touches, per-type counts
    val U = (graft.functions.Portable.toFixed(
        coalesce(col(valueCol), lit(0.0)), 2) * 1000000L)
      .as("__u")
    val n = touchTypes.indices.map(i => col(s"__c$i"))
      .reduce(_ + _).as("__n")
    val fty = substring(col("__f"), 43, 1 << 20) // past "%020d|%020d|"
    val lty = substring(col("__l"), 43, 1 << 20)
    val conv = withWins.select(Seq(col(entity), U, n,
      fty.as("__fty"), lty.as("__lty")) ++
      touchTypes.indices.map(i => col(s"__c$i")): _*)
    val u = col("__u")
    val nn = col("__n")
    def ind(c: Column): Column = when(c, 1L).otherwise(0L)
    val linBase = expr("__u div __n")
    val linRem = u - linBase * nn
    val fsh = expr("(__u * 2) div 5")
    val midTotal = u - fsh * 2L
    val m = nn - 2L
    val midBase = expr(s"(__u - ((__u * 2) div 5) * 2) div (__n - 2)")
    val midRem = midTotal - midBase * m
    val lastHalf = expr("__u div 2")
    val perType = touchTypes.zipWithIndex.map { case (ty, i) =>
      val cnt = col(s"__c$i")
      val isF = col("__fty") === ty
      val isL = col("__lty") === ty
      val lin = cnt * linBase + when(isF, linRem).otherwise(0L)
      val fir = when(isF, u).otherwise(0L)
      val las = when(isL, u).otherwise(0L)
      val midCnt = cnt - ind(isF) - ind(isL)
      val pos = when(nn === 1L, fir)
        .when(nn === 2L,
          when(isL, lastHalf).otherwise(0L) + when(isF, u - lastHalf).otherwise(0L))
        .otherwise(when(isF, fsh + midRem).otherwise(0L)
          + when(isL, fsh).otherwise(0L) + midCnt * midBase)
      struct(lit(ty).as("touch_type"),
        when(nn > 0L, lin).otherwise(0L).as("lin"),
        when(nn > 0L, fir).otherwise(0L).as("fir"),
        when(nn > 0L, las).otherwise(0L).as("las"),
        when(nn > 0L, pos).otherwise(0L).as("pos"))
    }
    val unattr = struct(lit("(unattributed)").as("touch_type"),
      when(nn === 0L, u).otherwise(0L).as("lin"),
      when(nn === 0L, u).otherwise(0L).as("fir"),
      when(nn === 0L, u).otherwise(0L).as("las"),
      when(nn === 0L, u).otherwise(0L).as("pos"))
    conv
      .select(explode(array(perType :+ unattr: _*)).as("__cr"))
      .groupBy(col("__cr.touch_type").as("touch_type"))
      .agg(sum(col("__cr.lin")).as("linear_ucents"),
        sum(col("__cr.fir")).as("first_ucents"),
        sum(col("__cr.las")).as("last_ucents"),
        sum(col("__cr.pos")).as("position_ucents"))
  }

  /** Markov-chain (removal-effect) attribution (C23) — the
    * data-driven attribution model beside C12's last-touch and C22's
    * positional heuristics (Anderl et al. 2016; GA's former
    * "data-driven" model): build the first-order journey chain per
    * entity (START → touches in order → CONV at the first conversion,
    * or NULL when the journey ends unconverted), count the transition
    * matrix, and score each channel by its REMOVAL EFFECT — how much
    * the START→CONV absorption probability drops when every edge into
    * the channel is redirected to NULL.
    *
    * Determinism: the absorption probabilities are computed by `iters`
    * fixed value-iteration rounds in integer ppm with floor division
    * (the L4/L10 all-integer discipline) — the oracle replays the same
    * rounds on the same matrix, so every digit matches. Fixed-point
    * caveat: `iters` bounds journey-length contributions (12 rounds
    * cover chains ≤ 12 hops; longer mass is truncated toward 0 on BOTH
    * sides identically).
    *
    * Shape: one scan, ONE entity-keyed window family (first-conversion
    * cut + lag/lead chain building ride the same exchange), a
    * (states²)-bounded count agg, and a model-sized driver solve over
    * the tiny matrix — the [[Curation.bpeTrain]] collect discipline
    * (the matrix is (|touchTypes|+3)², independent of corpus size). */
  def markovAttribution(events: DataFrame, entity: String, ts: String,
                        tieCol: String, typeCol: String,
                        touchTypes: Seq[String], conversionType: String,
                        iters: Int = 12): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType))
    require(iters >= 1 && iters <= 50)
    val spark = events.sparkSession
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tieCol))
    val isConv = col(typeCol) === conversionType
    val convsBefore = sum(when(isConv, 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val chained = events
      .filter(col(typeCol).isin((touchTypes :+ conversionType).map(x => x: Any): _*))
      .withColumn("__cb", coalesce(convsBefore, lit(0L)))
      .filter(col("__cb") === 0L) // through the FIRST conversion only
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
    val trans = chained.select(
      explode(concat(
        array(struct(coalesce(col("__prev"), lit("(start)")).as("src"),
          col(typeCol).as("dst"))),
        when(col("__next").isNull && !isConv,
          array(struct(col(typeCol).as("src"), lit("(null)").as("dst"))))
          .otherwise(array().cast("array<struct<src:string,dst:string>>"))))
        .as("t"))
      .groupBy(col("t.src").as("src"), col("t.dst").as("dst"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    markovSolve(spark, trans, touchTypes, conversionType, iters)
  }

  /** The states²-bounded removal-effect solve shared by batch C23 and
    * the streaming journey ledger (I53): value-iteration absorption
    * probabilities in integer ppm over an already-collected transition
    * matrix (model-sized by contract — (|touchTypes|+3)², never
    * corpus-sized). One code path, so the two spellings cannot drift. */
  private[graft] def markovSolve(spark: SparkSession,
                                 trans: Map[(String, String), Long],
                                 touchTypes: Seq[String],
                                 conversionType: String,
                                 iters: Int): DataFrame = {
    // absorption probability from START in ppm, `iters` fixed rounds
    def solve(cnt: Map[(String, String), Long]): Long = {
      val srcs = cnt.keys.map(_._1).toSet
      val bySrc = cnt.groupBy(_._1._1)
      var p = Map.empty[String, Long]
        .withDefault(s => if (s == conversionType) 1000000L else 0L)
      for (_ <- 0 until iters) {
        p = srcs.map { s =>
          val row = bySrc(s)
          val tot = row.values.sum
          s -> row.iterator.map { case ((_, d), n) => n * p(d) }.sum / tot
        }.toMap.withDefault(s => if (s == conversionType) 1000000L else 0L)
      }
      p("(start)")
    }
    val pFull = solve(trans)
    val rows = touchTypes.map { ch =>
      val removed = trans.groupBy { case ((s, d), _) =>
        (s, if (d == ch) "(null)" else d)
      }.map { case (k, vs) => k -> vs.values.sum }
      val pRem = solve(removed)
      val re = math.max(pFull - pRem, 0L)
      (ch, pFull, pRem, re)
    }
    val reTot = rows.map(_._4).sum
    import spark.implicits._
    rows.map { case (ch, pf, pr, re) =>
      (ch, pf, pr, re, if (reTot > 0) re * 1000000L / reTot else 0L)
    }.toDF("channel", "p_full_ppm", "p_removed_ppm",
      "removal_effect_ppm", "share_ppm")
  }

  /** Top session paths (C13) — the full-path companion to
    * [[transitions]]' first hop (Amplitude Pathfinder / GA4 path
    * exploration): each session's ordered event-type sequence joined
    * into one path string, counted corpus-wide, top `k` by
    * (count desc, path asc). Paths are truncated to `maxSteps` events
    * (every path tool does — beyond a handful of steps paths are
    * unique and the report is noise); `(truncated)` marks cut paths.
    *
    * Shape: [[assign]]'s one entity window, then ONE (entity, session)
    * agg building the ordered step array via `array_sort` over
    * (ts, tie, type) structs (map-side partial-aggregable — the
    * per-session array is maxSteps-bounded after `slice`), a path-count
    * agg, and a TakeOrdered top-k. No per-session re-sort job, no
    * window over the whole corpus. */
  def topPaths(events: DataFrame, entity: String, ts: String,
               tieCol: String, typeCol: String, gapSeconds: Long,
               maxSteps: Int, k: Int): DataFrame = {
    require(maxSteps >= 1 && k >= 1)
    val sessions = assign(events, entity, ts, tieCol, gapSeconds)
    val perSession = sessions
      .groupBy(col(entity), col("session_id"))
      .agg(array_sort(collect_list(struct(
        col(ts).as("t"), col(tieCol).as("i"), col(typeCol).as("y"))))
        .as("__steps"))
      .select(
        concat_ws(">",
          transform(slice(col("__steps"), 1, maxSteps), s => s.getField("y")))
          .as("path"),
        (size(col("__steps")) > maxSteps).as("__cut"))
      .select(when(col("__cut"), concat(col("path"), lit(">(truncated)")))
        .otherwise(col("path")).as("path"))
    val counted = perSession.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
    counted.withColumn("rnk", row_number().over(
      Window.orderBy(col("n_sessions").desc, col("path").asc)))
  }

  /** Engagement stickiness (C14) — per-day DAU, trailing-7-day WAU and
    * the DAU/WAU ratio (the "how habitual is usage" metric every
    * product dashboard carries): WAU(d) counts entities active on ANY
    * of days [d−6, d]. Exact distinct over a sliding window WITHOUT a
    * per-day distinct re-scan: the activity ledger (distinct (entity,
    * day) — C10's input-sized collapse) explodes each active day to
    * the 7 report days it covers, and a second distinct+count per
    * report day finishes it — linear ×7, never day-count scans of the
    * raw input. Report days with zero DAU (gap days inside the range)
    * simply don't appear — the LOCF/gapfill layer (B6) is the spine's
    * business, composably.
    *
    * Shape: one map-side distinct collapse (the only input-sized
    * stage), a 7-way explode of the LEDGER (ledger-sized), two keyed
    * aggs. The ratio divides two exact counts once. */
  def stickiness(events: DataFrame, entity: String, ts: String,
                 scale: Int = 4): DataFrame =
    stickinessFromLedger(
      events.select(col(entity), to_date(col(ts)).as("__day")).distinct(),
      entity, scale)

  /** The post-collapse stage of [[stickiness]], exposed so the I21
    * maintained activity ledger (`retentionCycle`'s `active_days` —
    * the SAME distinct (entity, __day) shape) feeds an always-current
    * stickiness report without re-reading raw events — the
    * [[cohortCounts]] seam discipline. `ledger` must be distinct
    * `(entity, __day)` rows. */
  def stickinessFromLedger(ledger: DataFrame, entity: String,
                           scale: Int = 4): DataFrame = {
    val dau = ledger.groupBy(col("__day").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = ledger
      .select(col(entity), explode(sequence(col("__day"),
        date_add(col("__day"), 6))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    // inner join: a day with WAU coverage but no DAU row is a gap day
    // (no activity that day) — dau 0 rows are the spine's business
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        graft.functions.Portable.pround(
          col("dau").cast("double") / col("wau").cast("double"), scale)
          .as("stickiness"))
  }

  /** Growth accounting (C17) — the standard user-growth decomposition
    * every product dashboard carries (the "quick ratio" inputs): per
    * day, how many active entities are NEW (first day ever), RETAINED
    * (also active the previous day), RESURRECTED (previously active,
    * but not yesterday), and how many CHURNED into the day (active
    * yesterday, not today). Days with no activity and no churn don't
    * appear (the gapfill layer's business, as with [[stickiness]]);
    * churn attributable past the last observed day is clipped — the
    * observation window can't distinguish churn from not-yet-arrived
    * data. Returns `(day, n_new, n_retained, n_resurrected,
    * n_churned)`. */
  def growthAccounting(events: DataFrame, entity: String,
                       ts: String): DataFrame =
    growthFromLedger(
      events.select(col(entity), to_date(col(ts)).as("__day")).distinct(),
      entity)

  /** The post-collapse stage of [[growthAccounting]], exposed so the
    * I21 maintained activity ledger feeds an always-current growth
    * report without re-reading raw events (the [[cohortCounts]] seam
    * discipline). `ledger` must be distinct `(entity, __day)` rows.
    *
    * Scale shape: ONE entity-keyed exchange over the ledger (the
    * anchor keeps its two consumers — the lag/lead window pipeline and
    * the max-day scalar — on a ReusedExchange instead of re-collapsing
    * the input twice, the c10 lesson), ONE window pass, and the
    * classify-vs-churn rows come out of the SAME pass as a 2-way
    * explode keyed on their report day — no second window, no
    * self-join. Everything after the explode is calendar-sized. */
  def growthFromLedger(ledger: DataFrame, entity: String): DataFrame = {
    val anchored = ledger.repartition(col(entity))
    val w = Window.partitionBy(col(entity)).orderBy(col("__day"))
    val tagged = anchored.select(col(entity), col("__day"),
      lag(col("__day"), 1).over(w).as("__prev"),
      lead(col("__day"), 1).over(w).as("__next"))
    // each active (entity, day) row contributes its class to `day` and,
    // if its activity run ends here, one churn to `day + 1`
    val contrib = tagged.select(explode(array(
      struct(
        col("__day").as("day"),
        when(col("__prev").isNull, 1L).otherwise(0L).as("n_new"),
        when(col("__prev") === date_sub(col("__day"), 1), 1L)
          .otherwise(0L).as("n_retained"),
        when(col("__prev").isNotNull &&
          col("__prev") < date_sub(col("__day"), 1), 1L)
          .otherwise(0L).as("n_resurrected"),
        lit(0L).as("n_churned")),
      struct(
        date_add(col("__day"), 1).as("day"),
        lit(0L).as("n_new"), lit(0L).as("n_retained"),
        lit(0L).as("n_resurrected"),
        when(col("__next").isNull ||
          col("__next") > date_add(col("__day"), 1), 1L)
          .otherwise(0L).as("n_churned"))
    )).as("c")).select(col("c.*"))
    val maxDay = anchored.agg(max(col("__day")).as("__max"))
    contrib
      .groupBy(col("day"))
      .agg(sum(col("n_new")).as("n_new"),
        sum(col("n_retained")).as("n_retained"),
        sum(col("n_resurrected")).as("n_resurrected"),
        sum(col("n_churned")).as("n_churned"))
      // drop pure-churn rows past the calendar and day+1 echo rows that
      // carried nothing (all-zero): the join is calendar-sized
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("__max") &&
        (col("n_new") + col("n_retained") + col("n_resurrected") +
          col("n_churned")) > 0)
      .drop("__max")
  }

  /** Longest active-day streak per entity (C19) — the classic
    * gaps-and-islands consecutive-day run: each entity's longest run of
    * consecutive calendar days with activity, ties broken by the
    * EARLIEST streak. Returns `(entity, streak_days, streak_start,
    * streak_end)` — one row per entity.
    *
    * Scale shape: input collapses to the distinct (entity, day) ledger
    * map-side first; the island key (`day − row_number`) is one
    * entity-keyed window over the ledger, the island rollup and the
    * per-entity argmax stay in the SAME entity hash-partition family —
    * one shuffle end to end. */
  def activeStreaks(events: DataFrame, entity: String,
                    ts: String): DataFrame =
    streaksFromLedger(
      events.select(col(entity), to_date(col(ts)).as("__day")).distinct(),
      entity)

  /** The post-collapse stage of [[activeStreaks]] (the ledger seam).
    * `ledger` must be distinct `(entity, __day)` rows. */
  def streaksFromLedger(ledger: DataFrame, entity: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col("__day"))
    val islands = ledger
      .withColumn("__grp",
        datediff(col("__day"), lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy(col(entity), col("__grp"))
      .agg(count(lit(1)).as("streak_days"),
        min(col("__day")).as("streak_start"),
        max(col("__day")).as("streak_end"))
    val pick = Window.partitionBy(col(entity))
      .orderBy(col("streak_days").desc, col("streak_start").asc)
    islands
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col(entity), col("streak_days"),
        col("streak_start"), col("streak_end"))
  }

  /** RFM segmentation (C18) — the classic customer-value decomposition:
    * per entity, Recency (days since last activity, relative to the
    * dataset's last day), Frequency (event count) and Monetary
    * (fixed-point value sum), each scored into exact quartiles (1–4, 4
    * best) with `ntile` semantics over a TOTAL order (metric, then
    * entity — so the assignment is deterministic and
    * oracle-checkable). Returns `(entity, recency_days, frequency,
    * monetary, r_score, f_score, m_score, segment)`.
    *
    * Scale shape: one input-sized grouped rollup (map-side combined),
    * then three [[Curation.exactNtile]] passes over the ENTITY-sized
    * rollup — each a distributed two-phase global rank (range
    * repartition + per-partition offsets), never a single-partition
    * window. */
  def rfm(events: DataFrame, entity: String, ts: String, value: String,
          scale: Int = 4): DataFrame =
    rfmFromRollup(
      events.groupBy(col(entity))
        .agg(max(to_date(col(ts))).as("__last"),
          count(lit(1)).as("frequency"),
          sum(graft.functions.Portable.toFixed(col(value), scale))
            .as("__fv")),
      entity, scale)

  /** The post-rollup stage of [[rfm]], exposed so a MAINTAINED
    * per-entity rollup (max day / count / fixed sum are ALL additive —
    * a plain update-mode streaming agg maintains them exactly-once)
    * feeds an always-current segmentation without re-reading raw
    * events (the [[cohortCounts]] seam discipline). `rolled` must be
    * one row per entity carrying `__last` (date), `frequency` (long)
    * and `__fv` (fixed-point long). */
  def rfmFromRollup(rolled: DataFrame, entity: String,
                    scale: Int = 4): DataFrame = {
    val p = math.pow(10, scale)
    val maxDay = rolled.agg(max(col("__last")).as("__max"))
    val base = rolled.crossJoin(broadcast(maxDay))
      .select(col(entity),
        datediff(col("__max"), col("__last")).as("recency_days"),
        col("frequency"),
        (col("__fv").cast("double") / lit(p)).as("monetary"),
        col("__fv"))
    // quartile 4 = best: most recent / most frequent / highest value.
    // ntile over (metric DESC worst-first, entity) puts the best in
    // bucket 4; recency is inverted (larger = worse), so it orders ASC
    // worst-last... i.e. DESC on recency puts the STALEST first.
    val r = Curation.exactNtile(base,
      Seq(col("recency_days").desc, col(entity).asc), 4, "r_score")
    val f = Curation.exactNtile(r,
      Seq(col("frequency").asc, col(entity).asc), 4, "f_score")
    val m = Curation.exactNtile(f,
      Seq(col("__fv").asc, col(entity).asc), 4, "m_score")
    m.select(col(entity), col("recency_days"), col("frequency"),
      col("monetary"), col("r_score"), col("f_score"), col("m_score"),
      concat(col("r_score").cast("string"), col("f_score").cast("string"),
        col("m_score").cast("string")).as("segment"))
  }

  /** Interval union / coverage (C21) — the classic "merge overlapping
    * intervals" rollup: given CLOSED intervals `[start, end]` per key,
    * report the interval count, the number of merged islands, the
    * total covered extent (union measure — overlap never double-counts)
    * and the longest island. The "total time actually on call" /
    * machine-uptime-from-overlapping-leases / sensor-coverage question
    * the raw sum of durations answers WRONG whenever intervals overlap.
    *
    * Units-agnostic: `start`/`end` are any numeric columns on a common
    * axis (epoch-µs typical) and all outputs are exact integer
    * arithmetic on them. Touching intervals (`start == prev end`)
    * MERGE — closed-interval semantics, stated; zero-length intervals
    * carry no extent but still bridge islands. `end < start` rows fail
    * loudly in-pass (`raise_error` inside the projection — no extra
    * validation scan of the input).
    *
    * Scale shape: gaps-and-islands in ONE key-hash exchange end to
    * end — the running `max(end)` prefix window and the island-id
    * running sum share one (key)-partitioned sort, and both downstream
    * aggregations ((key, island) then (key)) ride the same hash
    * family, so Spark inserts no further exchange. Per-key state is
    * the sort buffer — AQE's sort-based window handles skewed keys. */
  def intervalUnion(df: DataFrame, key: Seq[String], start: Column,
                    end: Column): DataFrame = {
    val checkedEnd = when(end < start, raise_error(concat(
        lit("intervalUnion: end < start at key="),
        concat_ws(",", key.map(k => col(k).cast("string")): _*))))
      .otherwise(end)
    val iv = df.select(key.map(col) :+ start.as("__s") :+
      checkedEnd.as("__e"): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__s"), col("__e"))
    val pmax = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    // the island-sum window consumes the flag, so it is a second
    // Window op — but same partitioning + ordering, so it rides the
    // already-exchanged, already-sorted partitions (no new exchange)
    val flagged = iv
      .withColumn("__ni",
        (pmax.isNull || col("__s") > pmax).cast("long"))
    val islands = flagged.withColumn("__island",
      sum(col("__ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val perIsland = islands
      .groupBy((key.map(col) :+ col("__island")): _*)
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"),
        count(lit(1)).as("__n"))
    perIsland.groupBy(key.map(col): _*)
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered"),
        max(col("__ie") - col("__is")).as("max_island"))
  }
}
