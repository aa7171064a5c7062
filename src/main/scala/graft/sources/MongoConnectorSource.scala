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
  * (`$match` + `$sort` + `$limit`) handed to the connector via
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

  /** A value as a BSON extended-JSON literal: timestamps become
    * `{"$date": ...}` (what pymongo's BSON datetime marshals to),
    * strings escape, numbers/booleans pass through. */
  private[sources] def bsonLit(v: Any): String = v match {
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
      val bounds = s""""$lo": ${bsonLit(last)}""" +
        inc.endValue.map(e => s""", "$hi": ${bsonLit(e)}""").getOrElse("")
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

  /** The full `aggregation.pipeline` value: `$match` → `$sort` →
    * `$limit` (helpers.py applies them in cursor order: find(filter),
    * sort, limit). */
  def pipelineJson(inc: Option[Incremental], limit: Option[Long] = None): String = {
    val stages = inc.toSeq.flatMap(i => matchJson(i).toSeq ++ sortJson(i).toSeq) ++
      limit.filter(_ != 0).map(l => s"""{"$$limit": ${math.abs(l)}}""")
    stages.mkString("[", ", ", "]")
  }

  /** Option map for `spark.read.format("mongodb")` — connection,
    * namespace, and the server-side pipeline. */
  def options(uri: String, database: String, collection: String,
              inc: Option[Incremental] = None,
              limit: Option[Long] = None): Map[String, String] = {
    val pipeline = pipelineJson(inc, limit)
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
      case Some(last) =>
        val c = col(inc.cursorField)
        inc.func match {
          case MaxFunc =>
            inc.endValue.foldLeft(c >= lit(last))((p, e) => p && c < lit(e))
          case MinFunc =>
            inc.endValue.foldLeft(c <= lit(last))((p, e) => p && c > lit(e))
        }
    }

  /** Incremental read through a pluggable reader. The default reader
    * is the real connector (`format("mongodb")` — requires the
    * connector jar on the classpath); tests inject a file-backed
    * stand-in that honors the same option map via [[matchFilter]]. */
  def read(spark: SparkSession, uri: String, database: String,
           collection: String, inc: Option[Incremental] = None,
           limit: Option[Long] = None)
          (reader: Map[String, String] => DataFrame = opts =>
            spark.read.format("mongodb").options(opts).load()): DataFrame =
    reader(options(uri, database, collection, inc, limit))

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
