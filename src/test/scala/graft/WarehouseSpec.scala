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
}
