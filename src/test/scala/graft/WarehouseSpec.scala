package graft

import graft.sources.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("overwritePartitions replaces only the re-run period (idempotent)") {
    val wh = Files.createTempDirectory("graft-wh-part").toString + "/t"
    val day1 = Seq((1L, "20240101", 10.0), (2L, "20240101", 20.0))
    val day2 = Seq((3L, "20240102", 30.0))
    Warehouse.overwritePartitions(
      (day1 ++ day2).toDF("id", "day", "v"), wh, Seq("day"))
    // re-run of day1 only, with corrected values — the Airflow retry
    val rerun = Seq((1L, "20240101", 11.0), (2L, "20240101", 21.0))
      .toDF("id", "day", "v")
    Warehouse.overwritePartitions(rerun, wh, Seq("day"))
    val got = spark.read.parquet(wh)
      .select("id", "day", "v").as[(Long, String, Double)].collect().toSet
    // day1 replaced (not appended), day2 untouched
    assert(got == Set((1L, "20240101", 11.0), (2L, "20240101", 21.0),
      (3L, "20240102", 30.0)))
    // running the identical re-run again converges to the same state
    Warehouse.overwritePartitions(rerun, wh, Seq("day"))
    assert(spark.read.parquet(wh).count() == 3)
  }

  test("mergeUpsert: latest-wins upsert touching only the hot partitions") {
    val wh = Files.createTempDirectory("graft-wh-merge").toString + "/t"
    val load = Seq(
      (1L, "20240101", 1L, 10.0), (2L, "20240101", 1L, 20.0),
      (3L, "20240102", 1L, 30.0), (4L, "20240103", 1L, 40.0))
      .toDF("id", "day", "v_ts", "v")
    Warehouse.mergeUpsert(load, wh, Seq("day"), Seq("id"), "v_ts")
    // update id=1 (newer), stale replay of id=2 (older), insert id=9;
    // day 20240102/03 untouched by this batch
    val batch = Seq(
      (1L, "20240101", 5L, 11.0), (2L, "20240101", 0L, 99.0),
      (9L, "20240101", 2L, 90.0))
      .toDF("id", "day", "v_ts", "v")
    Warehouse.mergeUpsert(batch, wh, Seq("day"), Seq("id"), "v_ts")
    val got = spark.read.parquet(wh)
      .select("id", "v_ts", "v").as[(Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 5L, 11.0),  // updated: newer version wins
      (2L, 1L, 20.0),  // stale replay ignored: existing newer row kept
      (3L, 1L, 30.0), (4L, 1L, 40.0), // untouched partitions intact
      (9L, 2L, 90.0))) // inserted
    // replaying the same batch converges (idempotent)
    Warehouse.mergeUpsert(batch, wh, Seq("day"), Seq("id"), "v_ts")
    assert(spark.read.parquet(wh).count() == 5)
  }
}
