package graft

import graft.operators._
import graft.sources.{MongoJsonSource, Tables}
import org.apache.spark.sql.functions._

class TimeAggSpec extends SparkSpec {
  import spark.implicits._

  test("day/month keys match reference YYYYMMDD/YYYYMM format") {
    val df = Seq("2024-03-07 13:45:12").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val r = df.select(TimeAgg.dayKey($"ts"), TimeAgg.monthKey($"ts")).head()
    assert(r.getString(0) == "20240307" && r.getString(1) == "202403")
  }

  test("weekBucket is Monday-based (TimescaleDB time_bucket('1 week'))") {
    val df = Seq("2024-01-10 05:00:00").toDF("s") // a Wednesday
      .select(col("s").cast("timestamp").as("ts"))
    assert(df.select(date_format(TimeAgg.weekBucket($"ts"), "yyyy-MM-dd EEEE"))
      .head().getString(0) == "2024-01-08 Monday")
  }

  test("timeBucket floors to arbitrary widths") {
    val df = Seq("2024-01-01 05:59:59").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    assert(df.select(TimeAgg.timeBucket($"ts", 4 * 3600).cast("string"))
      .head().getString(0) == "2024-01-01 04:00:00")
  }
}

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("newerThan keeps only rows past the high watermark") {
    val existing = Seq(1, 5, 9).toDF("k")
    val incoming = Seq(8, 9, 10, 12).toDF("k")
    val got = Incremental.newerThan(incoming, existing, "k")
      .as[Int].collect().sorted
    assert(got.toSeq == Seq(10, 12))
  }

  test("upsertLatest keeps one latest row per key with tie-break") {
    val df = Seq((1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (1, 20, "z"))
      .toDF("k", "v", "tag")
    val got = Incremental.upsertLatest(df, Seq("k"), Seq(col("v"), col("tag")))
      .select("k", "tag").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "z", 2 -> "c")) // v desc, then tag desc
  }

  test("latestPeriod filters to max period") {
    val df = Seq((1, "202401"), (2, "202402"), (3, "202402")).toDF("k", "m")
    assert(Incremental.latestPeriod(df, "m").count() == 2)
  }
}

class ArrayOpsSpec extends SparkSpec {
  import spark.implicits._

  test("containmentJoin = x = ANY(arr) with membership (not multiplicity) semantics") {
    val fact = Seq(("d1", 10), ("d2", 20), ("d9", 90)).toDF("dev", "v")
    val dim = Seq((1, Seq("d1", "d2", "d1")), (2, Seq("d2"))).toDF("uid", "devs")
    val got = ArrayOps.containmentJoin(fact, dim, "dev", "devs", Seq("uid"))
      .groupBy("uid").agg(sum("v").as("s"))
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 30L, 2 -> 20L)) // d1 counted once despite dup in array
  }

  test("arrayAggDistinct is sorted and distinct") {
    val df = Seq((1, "b"), (1, "a"), (1, "b")).toDF("k", "v")
    val got = ArrayOps.arrayAggDistinct(df, Seq("k"), "v", "arr")
      .select("arr").as[Seq[String]].head()
    assert(got == Seq("a", "b"))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap > threshold starts a new session") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:10:00", 2L),
      (1L, "2024-01-01 01:00:00", 3L), // 50min gap > 30min
      (2L, "2024-01-01 00:00:00", 4L))
      .toDF("user_id", "s", "event_id")
      .withColumn("ts", col("s").cast("timestamp"))
      .withColumn("value", lit(1.0))
    val got = Sessionize.summarize(df, "user_id", "ts", "event_id", "value", 1800)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}

class MongoJsonSourceSpec extends SparkSpec {

  test("pack → normalize roundtrip preserves every metric row with stable ids") {
    val ev = Tables.events(spark, sf)
    val packed = MongoJsonSource.packDocuments(
      ev, "user_id", "ts", 4 * 3600, Seq("event_id", "event_type", "value"))
    val flat = MongoJsonSource.normalize(packed, Seq("user_id"))
    assert(flat.count() == ev.count())
    // deterministic ids: re-running yields identical doc_id/row_id sets
    val again = MongoJsonSource.normalize(packed, Seq("user_id"))
      .select("row_id")
    assert(flat.select("row_id").except(again).count() == 0)
    // pos is dense per doc starting at 0
    val bad = flat.groupBy("doc_id")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("readDocuments round-trips packed docs through JSON files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mongo-json").toString
    val ev = Tables.events(spark, sf).limit(2000)
    val packed = MongoJsonSource.packDocuments(
      ev, "user_id", "ts", 4 * 3600, Seq("event_id", "event_type", "value"))
    // land as ONE multiline JSON array per file — the mongo-init.js
    // collection dump format readDocuments is built for (Spark's own
    // json writer emits JSONL, which is NOT that format)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "collection.json"),
      packed.toJSON.collect().mkString("[\n", ",\n", "\n]"))
    val docs = MongoJsonSource.readDocuments(spark, dir, packed.schema)
    assert(docs.count() == packed.count())
    // normalized children from the JSON landing match the direct path
    val a = MongoJsonSource.normalize(docs, Seq("user_id"))
    val b = MongoJsonSource.normalize(packed, Seq("user_id"))
    assert(a.select("row_id").exceptAll(b.select("row_id")).count() == 0)
    assert(b.select("row_id").exceptAll(a.select("row_id")).count() == 0)
  }
}
