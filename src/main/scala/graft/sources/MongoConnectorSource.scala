package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live-MongoDB extraction adapter — the reference's pymongo
  * incremental collection loader (reference:
  * dags/dlt_sources/mongodb/__init__.py — per-collection resources,
  * primary key `_id`, optional `dlt.sources.incremental` cursor;
  * helpers.py:35-141 — `_filter_op` `$gte`/`$lt` cursor filtering,
  * `_sort_op` row-order matrix, chunked cursor, per-collection limit)
  * re-expressed for the Spark MongoDB connector.
  *
  * Spark-first: there is no driver-side cursor loop at all. The
  * incremental contract compiles to a server-side aggregation pipeline
  * (`$match` + `$sort` + `$limit` + `$project`) handed to the connector via
  * `aggregation.pipeline`, so filtering happens IN MongoDB before any
  * bytes reach an executor, and the connector's partitioner fans the
  * matching documents out across the cluster — the role
  * helpers.py's `CollectionLoaderParallel` plays with skip/limit
  * batches, minus the O(batches) server-side skips.
  *
  * The container ships no MongoDB and no connector jar, so (as with
  * [[JdbcUpsert]]) the seams are testable without either: the option
  * map and pipeline JSON are unit-tested as text, and the SAME
  * incremental predicate is exposed as a Spark [[Column]]
  * ([[matchFilter]]) that a stand-in reader applies to file-shaped
  * collections — proving the cursor semantics (boundary inclusion,
  * watermark advance, end-value windows) against real DataFrames.
  * In production, add the connector jar and the default reader path
  * needs nothing else.
  */
object MongoConnectorSource {

  /** The reference's `last_value_func`: `max` walks the cursor forward
    * (`$gte` last value), `min` backward (`$lte`). */
  sealed trait CursorFunc
  case object MaxFunc extends CursorFunc
  case object MinFunc extends CursorFunc

  /** Incremental-cursor contract (helpers.py:80-103): load documents
    * whose `cursorField` is at-or-past `lastValue`, optionally bounded
    * by `endValue` (a closed-open window under [[MaxFunc]]). The
    * boundary row REPLAYS by design (`$gte`, not `$gt`) — exactly the
    * reference's semantics, which makes the extract safe against
    * equal-timestamp ties at the watermark; downstream
    * [[graft.operators.Incremental.dedupUpsertLatest]] (or an upsert
    * sink keyed on `_id`) absorbs the replayed row idempotently.
    * `rowOrder` (`"asc"`/`"desc"`) requests server-side ordering; the
    * direction matrix matches helpers.py:56-78. */
  final case class Incremental(
      cursorField: String,
      lastValue: Option[Any] = None,
      endValue: Option[Any] = None,
      func: CursorFunc = MaxFunc,
      rowOrder: Option[String] = None) {
    require(rowOrder.forall(Seq("asc", "desc").contains),
      s"rowOrder must be asc|desc, got $rowOrder")
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** BSON datetimes carry MILLISECOND precision, and the relaxed
    * extended-JSON `$date` string is specified at millisecond maximum —
    * a Spark timestamp's micro/nano digits rendered verbatim are, per
    * BSON parser version, either rejected at pipeline parse time or
    * truncated, silently mis-windowing the boundary. Sub-milli digits
    * therefore round toward INCLUDING more rows (`roundUp` picks the
    * direction per bound): the boundary at worst REPLAYS — which the
    * `$gte` cursor contract already absorbs idempotently — and never
    * silently loses rows. */
  private[sources] def toMillis(i: java.time.Instant,
                                roundUp: Boolean): java.time.Instant = {
    val t = i.truncatedTo(java.time.temporal.ChronoUnit.MILLIS)
    if (roundUp && t != i) t.plusMillis(1) else t
  }

  /** The cursor value a bound actually compares against: timestamps
    * snap to the BSON millisecond grid ([[toMillis]]); everything else
    * passes through. Shared by the JSON renderer and [[matchFilter]] so
    * the stand-in reader filters EXACTLY like the server would. */
  private[sources] def boundValue(v: Any, roundUp: Boolean): Any = v match {
    case t: java.sql.Timestamp =>
      java.sql.Timestamp.from(toMillis(t.toInstant, roundUp))
    case i: java.time.Instant => toMillis(i, roundUp)
    case other => other
  }

  /** A value as a BSON extended-JSON literal: timestamps become
    * `{"$date": ...}` (what pymongo's BSON datetime marshals to) at
    * millisecond precision, strings escape, numbers/booleans pass
    * through. */
  private[sources] def bsonLit(v: Any, roundUp: Boolean = false): String =
    boundValue(v, roundUp) match {
      case s: String => "\"" + escape(s) + "\""
      case t: java.sql.Timestamp => s"""{"$$date": "${t.toInstant}"}"""
      case i: java.time.Instant => s"""{"$$date": "$i"}"""
      // a date cursor is a BSON datetime in Mongo — a plain string here
      // would type-bracket against dates and silently match NOTHING
      case d: java.sql.Date => s"""{"$$date": "${d.toLocalDate}T00:00:00Z"}"""
      case d: java.time.LocalDate => s"""{"$$date": "${d}T00:00:00Z"}"""
      case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte) =>
        n.toString
      case b: Boolean => b.toString
      case other => "\"" + escape(other.toString) + "\""
    }

  /** Per-bound sub-millisecond rounding directions: the bound that
    * KEEPS rows in the window rounds outward. Max walks forward
    * (`$gte last` floor / `$lt end` ceil); min walks backward
    * (`$lte last` ceil / `$gt end` floor). */
  private def roundDirs(func: CursorFunc): (Boolean, Boolean) = func match {
    case MaxFunc => (false, true)
    case MinFunc => (true, false)
  }

  /** `$match` body mirroring helpers.py `_filter_op`: none without a
    * last value; `$gte` last (+ `$lt` end) under max; `$lte` last
    * (+ `$gt` end) under min. */
  private[sources] def matchJson(inc: Incremental): Option[String] =
    inc.lastValue.map { last =>
      val f = "\"" + escape(inc.cursorField) + "\""
      val (lo, hi) = inc.func match {
        case MaxFunc => ("$gte", "$lt")
        case MinFunc => ("$lte", "$gt")
      }
      val (lastUp, endUp) = roundDirs(inc.func)
      val bounds = s""""$lo": ${bsonLit(last, lastUp)}""" +
        inc.endValue.map(e => s""", "$hi": ${bsonLit(e, endUp)}""").getOrElse("")
      s"""{"$$match": {$f: {$bounds}}}"""
    }

  /** `$sort` mirroring helpers.py `_sort_op`'s (row_order,
    * last_value_func) matrix: (asc, max) and (desc, min) ascend;
    * (asc, min) and (desc, max) descend; no order requested (or no
    * last value) sorts nothing. */
  private[sources] def sortJson(inc: Incremental): Option[String] =
    for {
      order <- inc.rowOrder
      if inc.lastValue.nonEmpty
    } yield {
      val dir = (order, inc.func) match {
        case ("asc", MaxFunc) | ("desc", MinFunc) => 1
        case _ => -1
      }
      s"""{"$$sort": {"${escape(inc.cursorField)}": $dir}}"""
    }

  /** `$project` stage for SERVER-SIDE field pruning — the role the
    * connector's schema pushdown plays under SQL column pruning, made
    * explicit in the pipeline so the fields a stage model never reads
    * (the document body, nested blobs) don't cross the wire at all.
    * Mongo's include-projection keeps `_id` unless excluded — that
    * semantic is preserved (`_id` is the dlt primary key; it should
    * survive pruning). */
  private[sources] def projectJson(columns: Seq[String]): Option[String] =
    if (columns.isEmpty) None
    else Some(columns.map(c => s""""${escape(c)}": 1""")
      .mkString("""{"$project": {""", ", ", "}}"))

  /** The full `aggregation.pipeline` value: `$match` → `$sort` →
    * `$limit` (helpers.py applies them in cursor order: find(filter),
    * sort, limit) → `$project` (ours; last, so it prunes only what
    * survives the limit and the sort key needn't be re-included). */
  def pipelineJson(inc: Option[Incremental], limit: Option[Long] = None,
                   columns: Seq[String] = Nil): String = {
    val stages = inc.toSeq.flatMap(i => matchJson(i).toSeq ++ sortJson(i).toSeq) ++
      limit.filter(_ != 0).map(l => s"""{"$$limit": ${math.abs(l)}}""") ++
      projectJson(columns)
    stages.mkString("[", ", ", "]")
  }

  /** Option map for `spark.read.format("mongodb")` — connection,
    * namespace, and the server-side pipeline. */
  def options(uri: String, database: String, collection: String,
              inc: Option[Incremental] = None,
              limit: Option[Long] = None,
              columns: Seq[String] = Nil): Map[String, String] = {
    val pipeline = pipelineJson(inc, limit, columns)
    Map(
      "connection.uri" -> uri,
      "database" -> database,
      "collection" -> collection) ++
      (if (pipeline == "[]") Map.empty[String, String]
       else Map("aggregation.pipeline" -> pipeline))
  }

  /** The SAME incremental predicate as a Spark Column — what the
    * `$match` stage computes server-side. Used by the stand-in test
    * reader, and as a belt-and-braces post-scan guard when a connector
    * configuration can't push the pipeline. */
  def matchFilter(inc: Incremental): Column =
    inc.lastValue match {
      case None => lit(true)
      case Some(last0) =>
        val (lastUp, endUp) = roundDirs(inc.func)
        // same millisecond snap as the rendered pipeline — the stand-in
        // must include/exclude exactly the rows the server would
        val last = boundValue(last0, lastUp)
        val end = inc.endValue.map(boundValue(_, endUp))
        val c = col(inc.cursorField)
        inc.func match {
          case MaxFunc =>
            end.foldLeft(c >= lit(last))((p, e) => p && c < lit(e))
          case MinFunc =>
            end.foldLeft(c <= lit(last))((p, e) => p && c > lit(e))
        }
    }

  /** Incremental read through a pluggable reader. The default reader
    * is the real connector (`format("mongodb")` — requires the
    * connector jar on the classpath); tests inject a file-backed
    * stand-in that honors the same option map via [[matchFilter]].
    * `columns` pushes a `$project` so the server prunes fields. */
  def read(spark: SparkSession, uri: String, database: String,
           collection: String, inc: Option[Incremental] = None,
           limit: Option[Long] = None, columns: Seq[String] = Nil)
          (reader: Map[String, String] => DataFrame = opts =>
            spark.read.format("mongodb").options(opts).load()): DataFrame =
    reader(options(uri, database, collection, inc, limit, columns))

  /** The next cursor watermark after loading `batch`: max (or min,
    * per `func`) of the cursor field — a one-scalar aggregate, the
    * same legitimate collect as [[Warehouse]]'s refresh watermark.
    * None on an empty batch (keep the previous watermark). */
  def nextWatermark(batch: DataFrame, cursorField: String,
                    func: CursorFunc = MaxFunc): Option[Any] = {
    val agg = func match {
      case MaxFunc => max(col(cursorField))
      case MinFunc => min(col(cursorField))
    }
    Option(batch.agg(agg).head().get(0))
  }
}
