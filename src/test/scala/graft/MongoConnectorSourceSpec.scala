package graft

import graft.sources.MongoConnectorSource
import graft.sources.MongoConnectorSource.{Incremental, MaxFunc, MinFunc}
import org.apache.spark.sql.functions._

/** The live-Mongo adapter without a live Mongo (the [[JdbcUpsertSpec]]
  * pattern): pipeline/option text is asserted verbatim against the
  * reference's cursor contract, and the incremental semantics run for
  * real against a file-shaped stand-in collection through the same
  * option map the connector would receive. */
class MongoConnectorSourceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("pipeline mirrors the reference $match/$sort/$limit cursor contract") {
    val inc = Incremental("created_at",
      lastValue = Some(ts("2022-01-01T00:00:00Z")),
      endValue = Some(ts("2022-02-01T00:00:00Z")),
      rowOrder = Some("asc"))
    assert(MongoConnectorSource.pipelineJson(Some(inc), Some(500L)) ==
      """[{"$match": {"created_at": {"$gte": {"$date": "2022-01-01T00:00:00Z"}, """ +
        """"$lt": {"$date": "2022-02-01T00:00:00Z"}}}}, """ +
        """{"$sort": {"created_at": 1}}, {"$limit": 500}]""")
    // min func flips the operators (helpers.py _filter_op)
    val minInc = inc.copy(func = MinFunc)
    assert(MongoConnectorSource.pipelineJson(Some(minInc), None) ==
      """[{"$match": {"created_at": {"$lte": {"$date": "2022-01-01T00:00:00Z"}, """ +
        """"$gt": {"$date": "2022-02-01T00:00:00Z"}}}}, """ +
        """{"$sort": {"created_at": -1}}]""")
    // no last value → full-collection load, no stages at all
    assert(MongoConnectorSource.pipelineJson(
      Some(Incremental("created_at", rowOrder = Some("asc"))), None) == "[]")
  }

  test("sort direction matrix matches helpers.py") {
    def dir(order: String, func: MongoConnectorSource.CursorFunc): Int = {
      val inc = Incremental("c", lastValue = Some(1L), func = func,
        rowOrder = Some(order))
      if (MongoConnectorSource.pipelineJson(Some(inc)).contains("""{"c": 1}""")) 1
      else -1
    }
    assert(dir("asc", MaxFunc) == 1 && dir("desc", MinFunc) == 1)
    assert(dir("asc", MinFunc) == -1 && dir("desc", MaxFunc) == -1)
  }

  test("string cursor values escape into valid JSON") {
    val inc = Incremental("name", lastValue = Some("""he said "hi"\"""))
    assert(MongoConnectorSource.pipelineJson(Some(inc)) ==
      """[{"$match": {"name": {"$gte": "he said \"hi\"\\"}}}]""")
  }

  test("date cursors render as BSON $date, never as type-bracketed strings") {
    // a plain "2022-01-01" string $gte against a BSON date field would
    // match ZERO documents under Mongo type bracketing — silent stall
    val inc = Incremental("created_at",
      lastValue = Some(java.sql.Date.valueOf("2022-01-01")))
    assert(MongoConnectorSource.pipelineJson(Some(inc)) ==
      """[{"$match": {"created_at": {"$gte": {"$date": "2022-01-01T00:00:00Z"}}}}]""")
  }

  test("sub-millisecond cursors snap to the BSON millisecond grid, replaying not losing") {
    // BSON $date is millisecond-max; a micros-bearing watermark must
    // round toward INCLUDING rows: floor on $gte (forward lower bound),
    // ceil on $lt (forward end), and the mirror for the min walk
    val micros = java.sql.Timestamp.from(
      java.time.Instant.parse("2022-01-01T00:00:00.123456Z"))
    val fwd = Incremental("created_at", lastValue = Some(micros),
      endValue = Some(micros))
    assert(MongoConnectorSource.pipelineJson(Some(fwd)) ==
      """[{"$match": {"created_at": {"$gte": {"$date": "2022-01-01T00:00:00.123Z"}, """ +
        """"$lt": {"$date": "2022-01-01T00:00:00.124Z"}}}}]""")
    val back = fwd.copy(func = MinFunc)
    assert(MongoConnectorSource.pipelineJson(Some(back)) ==
      """[{"$match": {"created_at": {"$lte": {"$date": "2022-01-01T00:00:00.124Z"}, """ +
        """"$gt": {"$date": "2022-01-01T00:00:00.123Z"}}}}]""")
    // the stand-in filter snaps identically: a row BETWEEN the floored
    // bound and the raw watermark is replayed (never silently dropped)
    val between = Seq((1L, java.sql.Timestamp.from(
        java.time.Instant.parse("2022-01-01T00:00:00.123400Z"))))
      .toDF("_id", "created_at")
    assert(between.filter(MongoConnectorSource.matchFilter(
      Incremental("created_at", Some(micros)))).count() == 1)
    // millis-exact watermarks are untouched
    val exact = Incremental("created_at",
      lastValue = Some(ts("2022-01-01T00:00:00Z")))
    assert(MongoConnectorSource.pipelineJson(Some(exact)) ==
      """[{"$match": {"created_at": {"$gte": {"$date": "2022-01-01T00:00:00Z"}}}}]""")
  }

  test("$project pushdown prunes fields in the server pipeline") {
    val inc = Incremental("created_at", Some(ts("2022-01-01T00:00:00Z")))
    // stage order: match → sort → limit → project
    assert(MongoConnectorSource.pipelineJson(Some(inc), Some(100L),
      Seq("created_at", "payload")) ==
      """[{"$match": {"created_at": {"$gte": {"$date": "2022-01-01T00:00:00Z"}}}}, """ +
        """{"$limit": 100}, {"$project": {"created_at": 1, "payload": 1}}]""")
    // project alone is still a pushed pipeline
    val opts = MongoConnectorSource.options("u", "db", "coll",
      columns = Seq("created_at"))
    assert(opts("aggregation.pipeline") ==
      """[{"$project": {"created_at": 1}}]""")
    // stand-in read through the option map: the served frame carries
    // ONLY the requested fields (+ _id, which Mongo keeps by default)
    val collection = Seq((1L, ts("2022-01-02T00:00:00Z"), "a", "drop-me"))
      .toDF("_id", "created_at", "payload", "body")
    val requested = Seq("created_at", "payload")
    val got = MongoConnectorSource.read(spark, "mongodb://fake", "iot",
      "events", Some(inc), columns = requested) { o =>
      assert(o("aggregation.pipeline").contains("$project"))
      collection.filter(MongoConnectorSource.matchFilter(inc))
        .select((Seq("_id") ++ requested).map(col): _*)
    }
    assert(got.columns.toSeq == Seq("_id", "created_at", "payload"))
    assert(got.count() == 1)
  }

  test("options carry namespace + pipeline; pipeline omitted when empty") {
    val opts = MongoConnectorSource.options("mongodb://h:27017", "iot", "sleeps",
      Some(Incremental("created_at", Some(ts("2022-01-01T00:00:00Z")))), None)
    assert(opts("connection.uri") == "mongodb://h:27017")
    assert(opts("database") == "iot" && opts("collection") == "sleeps")
    assert(opts("aggregation.pipeline").startsWith("""[{"$match""""))
    val full = MongoConnectorSource.options("u", "db", "coll")
    assert(!full.contains("aggregation.pipeline"))
  }

  test("incremental read against a stand-in collection: boundary replay + watermark advance") {
    val collection = Seq(
      (1L, ts("2022-01-01T00:00:00Z"), "a"),
      (2L, ts("2022-01-02T00:00:00Z"), "b"),
      (3L, ts("2022-01-03T00:00:00Z"), "c"),
      (4L, ts("2022-01-04T00:00:00Z"), "d"))
      .toDF("_id", "created_at", "payload")
    // the stand-in honors the SAME option map the connector would get:
    // it serves the named collection filtered by the adapter's own
    // matchFilter reconstruction of the pipeline's $match
    var lastOpts: Map[String, String] = Map.empty
    def readAt(inc: Incremental) =
      MongoConnectorSource.read(spark, "mongodb://fake", "iot", "events",
        Some(inc)) { opts =>
        lastOpts = opts
        assert(opts("collection") == "events")
        collection.filter(MongoConnectorSource.matchFilter(inc))
      }

    // first load: watermark at doc 2 — $gte REPLAYS the boundary row
    val w1 = ts("2022-01-02T00:00:00Z")
    val batch1 = readAt(Incremental("created_at", Some(w1)))
    assert(batch1.select("_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    assert(lastOpts("aggregation.pipeline").contains("$gte"))

    // cursor helper advances to the batch max; re-read from there
    // replays only the new boundary
    val w2 = MongoConnectorSource.nextWatermark(batch1, "created_at").get
    assert(w2 == ts("2022-01-04T00:00:00Z"))
    val batch2 = readAt(Incremental("created_at",
      Some(w2.asInstanceOf[java.sql.Timestamp])))
    assert(batch2.select("_id").as[Long].collect().toSeq == Seq(4L))

    // closed-open end window loads exactly one interval
    val windowed = readAt(Incremental("created_at", Some(w1),
      endValue = Some(ts("2022-01-04T00:00:00Z"))))
    assert(windowed.select("_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))

    // empty batch → no watermark (caller keeps the previous one)
    assert(MongoConnectorSource.nextWatermark(
      collection.filter(lit(false)), "created_at").isEmpty)
  }
}
