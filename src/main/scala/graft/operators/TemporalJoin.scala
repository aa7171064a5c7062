package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as built-ins, expressed in shapes that
  * survive 100 TB: no per-row range scans, no cross products.
  *
  * The reference's DWH is TimescaleDB (hypertables keyed on time);
  * as-of and windowed-range lookups are the idiomatic queries of that
  * world (e.g. joining a metric stream to the latest dimension state —
  * reference: the dags/dbt_project/models/examples SQL models join
  * stage tables on day keys).
  */
object TemporalJoin {

  /** As-of join: for every left row, carry the payload of the LATEST
    * right row with `rightTime <= leftTime` and matching key.
    *
    * Implemented as a tagged union sorted per key on (time, side):
    * one shuffle + one sort, payload + matched time carried TOGETHER
    * as one struct by a running `last(ignoreNulls)` window — the
    * classic scalable as-of (vs. the naive per-row range join, which
    * explodes). The single-struct carry keeps the payload and its
    * timestamp from the SAME right row even when payload fields are
    * NULL in the newest right row. Right rows sort before left rows at
    * equal timestamps, so `rightTime == leftTime` matches.
    *
    * `right` must be unique per (key, time) — pre-dedupe (e.g.
    * [[Incremental.upsertLatest]]) for deterministic output.
    *
    * `toleranceSeconds` (the kdb `aj` window / TimescaleDB staleness
    * bound): when ≥ 0, a match older than the bound is TOO STALE to
    * use and the payload reads null, exactly as if no right row had
    * arrived yet — the semantics a sensor-state lookup needs (a
    * reading from last month must not masquerade as current state).
    * Same one-shuffle plan: the matched right time rides the same
    * struct carry and the bound is a post-hoc projection, never a
    * range join. */
  def asOf(left: DataFrame, right: DataFrame, keys: (String, String),
           times: (String, String), payload: Seq[String],
           toleranceSeconds: Double = -1.0): DataFrame = {
    val (lk, rk) = keys; val (lt, rt) = times
    val leftCols = left.columns.toSeq
    val out = Seq("__k", "__t", "__m", "__rt") ++ leftCols ++ payload
    val lTagged = payload.foldLeft(
      left.withColumn("__k", col(lk)).withColumn("__t", col(lt))
        .withColumn("__m", lit(1))
        .withColumn("__rt", lit(null).cast(right.schema(rt).dataType)))((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val rTagged = leftCols.foldLeft(
      right.withColumn("__k", col(rk)).withColumn("__t", col(rt))
        .withColumn("__m", lit(0)).withColumn("__rt", col(rt)))((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lTagged.select(out.map(col): _*)
      .unionByName(rTagged.select(out.map(col): _*))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__m"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // payload + matched time ride the window as ONE struct, non-null
    // exactly on right rows: last(ignoreNulls) then takes the ENTIRE
    // latest right row. Per-column carries would be wrong — a NULL
    // payload field in the newest right row would fall through to an
    // older row's value while __rt (and the tolerance check) reflect
    // the newer row, pairing payloads with the wrong time.
    val packed = ("__rt" +: payload).map(col)
    val carried = unioned
      .withColumn("__c", when(col("__m") === 0, struct(packed: _*)))
      .withColumn("__c", last(col("__c"), ignoreNulls = true).over(w))
      .filter(col("__m") === 1)
      .withColumn("__rt", col("__c").getField("__rt"))
    val carriedP = payload.foldLeft(carried)((d, c) =>
      d.withColumn(c, col("__c").getField(c)))
    val bounded =
      if (toleranceSeconds < 0) carriedP
      else {
        val fresh = col("__rt").isNotNull &&
          col("__t").cast("double") - col("__rt").cast("double") <=
            toleranceSeconds
        payload.foldLeft(carriedP)((d, c) =>
          d.withColumn(c, when(fresh, col(c))))
      }
    bounded.select((leftCols ++ payload).map(col): _*)
  }

  /** FORWARD as-of join (D32) — pandas `merge_asof(direction=
    * 'forward')` / kdb reverse-`aj`: for every left row, the payload of
    * the EARLIEST right row with `rightTime >= leftTime` and matching
    * key — "the next reading after this order", "the first response
    * after this request". The mirror image of [[asOf]] and the same
    * one-shuffle tagged-union plan, with the window reversed: a running
    * `first(ignoreNulls)` over `[current, unboundedFollowing)`, left
    * rows sorted BEFORE right rows at equal timestamps so
    * `rightTime == leftTime` matches.
    *
    * `toleranceSeconds ≥ 0` bounds how far in the FUTURE the match may
    * lie — beyond it the payload reads null (the request-timeout
    * semantics). `right` must be unique per (key, time), as in
    * [[asOf]]. */
  def asOfForward(left: DataFrame, right: DataFrame, keys: (String, String),
                  times: (String, String), payload: Seq[String],
                  toleranceSeconds: Double = -1.0): DataFrame = {
    val (lk, rk) = keys; val (lt, rt) = times
    val leftCols = left.columns.toSeq
    val out = Seq("__k", "__t", "__m", "__rt") ++ leftCols ++ payload
    // left __m=0, right __m=1: at equal __t the left row comes FIRST,
    // so its forward frame still sees the same-instant right row
    val lTagged = payload.foldLeft(
      left.withColumn("__k", col(lk)).withColumn("__t", col(lt))
        .withColumn("__m", lit(0))
        .withColumn("__rt", lit(null).cast(right.schema(rt).dataType)))((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val rTagged = leftCols.foldLeft(
      right.withColumn("__k", col(rk)).withColumn("__t", col(rt))
        .withColumn("__m", lit(1)).withColumn("__rt", col(rt)))((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lTagged.select(out.map(col): _*)
      .unionByName(rTagged.select(out.map(col): _*))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__m"))
      .rowsBetween(0, Window.unboundedFollowing)
    val packed = ("__rt" +: payload).map(col)
    val carried = unioned
      .withColumn("__c", when(col("__m") === 1, struct(packed: _*)))
      .withColumn("__c", first(col("__c"), ignoreNulls = true).over(w))
      .filter(col("__m") === 0)
      .withColumn("__rt", col("__c").getField("__rt"))
    val carriedP = payload.foldLeft(carried)((d, c) =>
      d.withColumn(c, col("__c").getField(c)))
    val bounded =
      if (toleranceSeconds < 0) carriedP
      else {
        val fresh = col("__rt").isNotNull &&
          col("__rt").cast("double") - col("__t").cast("double") <=
            toleranceSeconds
        payload.foldLeft(carriedP)((d, c) =>
          d.withColumn(c, when(fresh, col(c))))
      }
    bounded.select((leftCols ++ payload).map(col): _*)
  }

  /** Windowed range join, bucketed: for every left row, count right rows
    * with matching key and `rightTime ∈ (leftTime - windowSeconds,
    * leftTime]`.
    *
    * Scale shape: both sides bucket time into `windowSeconds`-wide
    * cells; a range of exactly one window width can only land in the
    * row's own cell or the previous one, so the left side explodes to
    * those two candidate cells and the join becomes an EQUI-join on
    * (key, cell) with the exact range predicate as a post-filter —
    * linear in matches, never a per-key cross product.
    */
  def countPriorWithin(left: DataFrame, right: DataFrame,
                       keys: (String, String), times: (String, String),
                       windowSeconds: Long, countName: String): DataFrame = {
    val (lk, rk) = keys; val (lt, rt) = times
    val leftCols = left.columns.toSeq
    val lb = floor(unix_timestamp(col(lt)) / windowSeconds)
    val l = left.withColumn("__cand", explode(array(lb - 1, lb)))
    val r = right.select(col(rk).as("__k"), col(rt).as("__rt"),
      floor(unix_timestamp(col(rt)) / windowSeconds).as("__b"))
    l.join(r,
        col(lk) === col("__k") && col("__cand") === col("__b") &&
          col("__rt") > col(lt) - expr(s"INTERVAL $windowSeconds SECOND") &&
          col("__rt") <= col(lt),
        "left_outer")
      .groupBy(leftCols.map(col): _*)
      .agg(count(col("__rt")).as(countName))
  }

  /** Static-interval dimension lookup (D33) — the "which band does
    * this value fall in" join (IP→geo ranges, price tiers, SLA bands):
    * each fact row picks every dim interval with
    * `lo <= value < hi`. Spelled BUCKETIZED so it plans a hash
    * equi-join, never the BroadcastNestedLoopJoin a bare BETWEEN
    * predicate forces (the NLJ re-scans the whole dim per fact row —
    * at 100 TB the difference between a shuffle and a disaster): dim
    * intervals explode to the fixed-width buckets they span, facts key
    * to their own bucket, the residual range predicate filters
    * in-bucket — a fact meets an interval in exactly ONE bucket (its
    * own), so no dedup pass is needed. `bucketWidth` trades dim
    * fan-out (span/width copies per interval) against per-bucket
    * candidate count; the OUTPUT is width-independent, so the oracle
    * is the plain range join. Overlapping intervals honestly produce
    * one row each; facts outside every interval drop (inner). */
  def intervalLookup(facts: DataFrame, dim: DataFrame, value: String,
                     lo: String, hi: String,
                     bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dimB = dim.withColumn("__b", explode(sequence(
      floor(col(lo) / bucketWidth).cast("long"),
      floor(col(hi) / bucketWidth).cast("long"))))
    facts
      .withColumn("__b", floor(col(value) / bucketWidth).cast("long"))
      .join(dimB, Seq("__b"))
      .filter(col(value) >= col(lo) && col(value) < col(hi))
      .drop("__b", lo, hi)
  }
}
