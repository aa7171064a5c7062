package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-processing primitives.
  *
  * The reference runs every dbt model incrementally: a rendered
  * `WHERE key > max(key)` high-watermark filter (reference:
  * dags/dbt_project/macros/get_max_insert_timestamp.sql,
  * get_max_insert_date_string.sql) and a `unique_key` upsert for
  * dimensions (reference: dags/dbt_project/models/stage/users.sql:4).
  * Spark-first: the watermark is a scalar-subquery-style max computed as
  * an aggregate + cross-joined filter (Catalyst folds it into a
  * broadcast), and the upsert is a window dedup — one shuffle, no driver
  * loop, so both survive 100 TB inputs.
  */
object Incremental {

  /** Rows strictly newer than the current high-watermark `max(key)` of
    * `existing` — the dbt `is_incremental()` filter. */
  def newerThan(incoming: DataFrame, existing: DataFrame, key: String): DataFrame = {
    val wm = existing.agg(max(col(key)).as("__wm"))
    incoming.join(broadcast(wm), incoming(key) > col("__wm"), "inner").drop("__wm")
  }

  /** Rows belonging to the latest period of the table itself — the
    * reference's "last month" cutoff (reference:
    * dags/dbt_project/models/examples/daily_user_steps_for_last_month.sql:24). */
  def latestPeriod(df: DataFrame, periodCol: String): DataFrame = {
    val wm = df.agg(max(col(periodCol)).as("__wm"))
    df.join(broadcast(wm), df(periodCol) === col("__wm"), "inner").drop("__wm")
  }

  /** dbt `unique_key` upsert semantics: keep the latest version per key,
    * ordered by `version` desc with deterministic tie-breaks. */
  def upsertLatest(df: DataFrame, key: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-FIELD survivorship merge (C20) — the golden record of MDM /
    * entity resolution: [[upsertLatest]] keeps the latest ROW per key,
    * but when updates are sparse (each row fills some fields and nulls
    * the rest — the Mongo partial-document shape the reference's dlt
    * extract lands), the latest row loses older non-null facts. Here
    * each field independently keeps its LATEST NON-NULL value
    * (`max_by` over (ts, tie) among that field's non-null rows — rows
    * whose ordering expression is null are skipped by aggregate null
    * semantics, which is exactly the survivorship rule), plus
    * last-seen and row-count lineage columns.
    *
    * ONE grouped aggregation, map-side combined, no window and no
    * per-key sort: state per (key, field) is a single (value, ts, tie)
    * candidate, so the shuffle carries combiner output, not rows —
    * the scale win over the row_number spelling. `tie` must make
    * (ts, tie) unique per key or the pick is nondeterministic. */
  def goldenRecord(df: DataFrame, key: String, ts: String, tie: String,
                   fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one survivorship field")
    val picks = fields.map { f =>
      max_by(col(f), when(col(f).isNotNull,
        struct(col(ts), col(tie)))).as(f)
    }
    df.groupBy(col(key)).agg(picks.head,
      (picks.tail :+ max(col(ts)).as("last_seen") :+
        count(lit(1)).as("n_rows")): _*)
  }

  /** Type-2 slowly-changing-dimension history from a change stream —
    * the dbt SNAPSHOT (`strategy: check`) role the reference stack
    * reserves its snapshots dir for: one row per (key, state interval),
    * emitted only when a tracked attribute actually changed, with
    * `valid_from`/`valid_to` bounds and an `is_current` flag
    * (`valid_to` null on the open interval).
    *
    * Shape: one shuffle on the key; a `lag` window finds state changes
    * (null-safe struct compare, so null attribute values are ordinary
    * states), a `lead` over the surviving change rows closes each
    * interval. Both windows share the (key × order) sort. `order` must
    * make the change sequence deterministic (include a unique
    * tie-break column alongside the timestamp). */
  def scd2(changes: DataFrame, key: Seq[String], ts: Column,
           order: Seq[Column], attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    val state = struct(attrs.map(col): _*)
    changes
      .withColumn("__prev", lag(state, 1).over(w))
      .filter(!(col("__prev") <=> state))
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev")
  }

  /** SNAPSHOT DIFF — what changed between two versions of a keyed
    * table (the check a dbt `snapshot` run performs before writing
    * history, and the audit query behind "what did yesterday's load
    * touch"): FULL OUTER join on the key, null-safe attribute compare,
    * one row per differing key labeled `added` / `removed` / `changed`.
    * Unchanged keys are filtered OUT before anything downstream sees
    * them — the output is delta-sized, not table-sized. Both sides
    * shuffle once on the key (co-partitioned equi-join); at warehouse
    * scale this is the one full-table pass a snapshot audit costs.
    *
    * Output: key columns, `change`, and `old_` / `new_` copies of each
    * compared attribute. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: Seq[String],
                   attrs: Seq[String]): DataFrame = {
    val b = before.as("b")
    val a = after.as("a")
    val cond = key.map(k => col(s"b.$k") === col(s"a.$k")).reduce(_ && _)
    val bKey = col(s"b.${key.head}")
    val aKey = col(s"a.${key.head}")
    val same = attrs.map(c => col(s"b.$c") <=> col(s"a.$c")).reduce(_ && _)
    b.join(a, cond, "full_outer")
      .withColumn("change",
        when(bKey.isNull, lit("added"))
          .when(aKey.isNull, lit("removed"))
          .otherwise(lit("changed")))
      .filter(bKey.isNull || aKey.isNull || !same)
      .select(key.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) ++
        Seq(col("change")) ++
        attrs.flatMap(c => Seq(col(s"b.$c").as(s"old_$c"),
          col(s"a.$c").as(s"new_$c"))): _*)
  }

  /** Point-in-time dimension lookup over an [[scd2]] history — THE
    * query a type-2 dimension exists for: each fact row picks the
    * attribute version whose `[valid_from, valid_to)` interval contains
    * its timestamp (open interval = `valid_to` null). An equi-join on
    * the business key plus the interval predicate: intervals are
    * DISJOINT by [[scd2]] construction, so each fact matches at most
    * one version; the join shuffles on the key and its fan-out is
    * bounded by versions-per-key (the change count), never fact ×
    * history. Facts earlier than the key's first version drop out
    * (inner join), mirroring the dimension's own coverage.
    *
    * Output: every fact column plus the history's non-key columns. */
  def pitJoin(facts: DataFrame, history: DataFrame, key: Seq[String],
              tsCol: String): DataFrame = {
    val f = facts.as("f")
    val h = history.as("h")
    val cond = key.map(k => col(s"f.$k") === col(s"h.$k")).reduce(_ && _) &&
      col(s"f.$tsCol") >= col("h.valid_from") &&
      (col("h.valid_to").isNull || col(s"f.$tsCol") < col("h.valid_to"))
    val hCols = history.columns.filterNot(key.contains)
    f.join(h, cond)
      .select(col("f.*") +: hCols.map(c => col(s"h.$c")): _*)
  }

  /** Winning change per key from a CDC log (the first stage of
    * [[applyCdc]], exposed as a seam): each key's highest-`seq` row
    * with its op and payload. ONE grouped `max_by` — map-side
    * combined, no window, and every aggregate is additive, so a plain
    * update-mode streaming aggregation maintains it exactly (the I45
    * continuous-CDC story). `seq` must be unique per key (a change
    * log's LSN contract) or the pick is nondeterministic. */
  def latestChange(changes: DataFrame, key: Seq[String], seq: String,
                   op: String, fields: Seq[String]): DataFrame = {
    val payload = struct((col(op).as("__op") +: col(seq).cast("long").as("__seq")
      +: fields.map(col)): _*)
    changes.groupBy(key.map(col): _*)
      .agg(max_by(payload, col(seq).cast("long")).as("__w"))
      .select(key.map(col) ++
        Seq(col("__w.__op").as("__op"), col("__w.__seq").as("__seq")) ++
        fields.map(f => col(s"__w.$f").as(f)): _*)
  }

  /** CDC changelog application (J14) — fold an ordered change stream
    * of upserts and DELETE tombstones onto a base snapshot: the MERGE
    * a lakehouse table format runs per commit (Delta/Iceberg/Hudi
    * `MERGE INTO`; Debezium envelope semantics), spelled as ONE
    * keyed outer join. Any change beats the snapshot row; among
    * changes the highest `seq` wins; a winning `op == "D"` removes
    * the key (tombstone), anything else upserts its payload. Keys
    * only in the snapshot pass through; keys only in the change log
    * insert.
    *
    * Scale shape: the change log collapses to one winning row per key
    * BEFORE the join ([[latestChange]] — map-side combined, so the
    * shuffle carries combiner output, not log rows), then one
    * key-partitioned full-outer join against the snapshot. Change-set
    * sized state, snapshot-sized output — the incremental-refresh
    * cost model. */
  def applyCdc(snapshot: DataFrame, changes: DataFrame, key: Seq[String],
               seq: String, op: String, fields: Seq[String]): DataFrame =
    applyCdcFrom(snapshot, latestChange(changes, key, seq, op, fields),
      key, fields)

  /** The merge stage of [[applyCdc]] (the seam a MAINTAINED
    * latest-change table feeds without re-reading the log). `latest`
    * must be one row per key carrying `__op` and the payload
    * fields. */
  def applyCdcFrom(snapshot: DataFrame, latest: DataFrame,
                   key: Seq[String], fields: Seq[String]): DataFrame = {
    val snap = snapshot.select(key.map(col) ++ fields.map(f =>
      col(f).as(s"__snap_$f")): _*)
    val chg = latest.select(key.map(col) ++ (col("__op") +:
      fields.map(f => col(f).as(s"__chg_$f"))): _*)
    snap.join(chg, key, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(key.map(col) ++ fields.map(f =>
        when(col("__op").isNotNull, col(s"__chg_$f"))
          .otherwise(col(s"__snap_$f")).as(f)): _*)
  }
}
