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

  test("refreshAggregate: incremental refresh == full recompute, history untouched") {
    val wh = Files.createTempDirectory("graft-wh-cagg").toString + "/agg"
    // raw rows carry (day from EVENT time, load_ts = monotone INGEST
    // cursor) — late events advance load_ts while landing in old days
    def agg(raw: org.apache.spark.sql.DataFrame) =
      raw.groupBy("user", "day")
        .agg(sum($"v".cast("long")).as("v_sum"), count(lit(1)).as("n"),
          max($"load_ts").as("last_load_ts"))
    def refresh(raw: org.apache.spark.sql.DataFrame): Unit =
      Warehouse.refreshAggregate(raw, wh, Seq("day"),
        rawWatermarkCol = "load_ts", aggWatermarkCol = "last_load_ts",
        aggregate = agg)
    val raw1 = Seq(
      (1L, "20240101", 1L, 10.0), (1L, "20240101", 2L, 5.0),
      (2L, "20240102", 3L, 30.0), (1L, "20240103", 4L, 7.0))
      .toDF("user", "day", "load_ts", "v")
    refresh(raw1) // first load = full build
    val t1 = spark.read.parquet(wh)
    assert(t1.count() == 3 &&
      t1.filter($"user" === 1 && $"day" === "20240101")
        .select("v_sum").as[Long].head() == 15L)
    val day2File = new java.io.File(wh, "day=20240102")
      .listFiles().map(_.getName).toSet
    // increment: new day 20240104 + a LATE row for 20240101 (old day,
    // newer cursor); 20240102/03 are untouched by this increment
    val raw2 = raw1.union(Seq(
      (3L, "20240104", 5L, 50.0), (1L, "20240101", 6L, 100.0))
      .toDF("user", "day", "load_ts", "v"))
    refresh(raw2)
    // partitioned read re-orders columns (partition col last): align
    val cols = Seq("user", "day", "v_sum", "n", "last_load_ts")
    val t2 = spark.read.parquet(wh).select(cols.map(col): _*)
    // incremental result == full recompute from all raw
    val full = agg(raw2).select(cols.map(col): _*)
    assert(t2.exceptAll(full).count() == 0 && full.exceptAll(t2).count() == 0)
    // the late row was FOLDED into day 20240101's aggregate
    assert(t2.filter($"user" === 1 && $"day" === "20240101")
      .select("v_sum").as[Long].head() == 115L)
    // untouched partition's files were not rewritten
    assert(new java.io.File(wh, "day=20240102")
      .listFiles().map(_.getName).toSet == day2File)
    // no new data -> no-op, still converged
    refresh(raw2)
    assert(spark.read.parquet(wh).count() == 4)
  }

  test("compactPartitions: fragmented partitions collapse, data byte-equal, cold partitions untouched") {
    val wh = Files.createTempDirectory("graft-wh-compact").toString + "/t"
    // hot partition: 6 single-row files (6 upsert cycles); cold: 1 file
    (1 to 6).foreach { i =>
      Seq((i.toLong, "20240101", i * 1.0)).toDF("id", "day", "v")
        .coalesce(1).write.mode("append").partitionBy("day").parquet(wh)
    }
    Seq((7L, "20240102", 70.0)).toDF("id", "day", "v")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(wh)
    val before = spark.read.parquet(wh).select("id", "day", "v")
      .localCheckpoint() // pinned pre-compaction
    val coldFiles = new java.io.File(wh, "day=20240102")
      .listFiles().map(_.getName).toSet
    val done = graft.sources.Warehouse.compactPartitions(
      spark, wh, Seq("day"), targetFileBytes = 128L << 20)
    // only the fragmented partition was rewritten, to ONE file
    assert(done.map(d => (d._1, d._3)) == Seq(("day=20240101", 1)))
    assert(new java.io.File(wh, "day=20240101").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")) == 1)
    // cold partition's files byte-untouched
    assert(new java.io.File(wh, "day=20240102")
      .listFiles().map(_.getName).toSet == coldFiles)
    // data identical row-for-row
    val after = spark.read.parquet(wh).select("id", "day", "v")
    assert(after.exceptAll(before).count() == 0 &&
      before.exceptAll(after).count() == 0)
    // a second run is a no-op (already at target)
    assert(graft.sources.Warehouse.compactPartitions(
      spark, wh, Seq("day"), targetFileBytes = 128L << 20).isEmpty)
  }

  test("applyRetention: expired partitions dropped, survivors byte-untouched, re-run no-op") {
    val wh = Files.createTempDirectory("graft-wh-retain").toString + "/t"
    Seq((1L, "20240101", 1.0), (2L, "20240102", 2.0),
        (3L, "20240103", 3.0), (4L, "20240104", 4.0))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(wh)
    val keepFiles = Seq("20240103", "20240104").map { d =>
      d -> new java.io.File(wh, s"day=$d").listFiles().map(_.getName).toSet
    }.toMap
    val dropped = graft.sources.Warehouse.applyRetention(
      spark, wh, "day", keepFrom = "20240103")
    assert(dropped == Seq("20240101", "20240102"))
    assert(!new java.io.File(wh, "day=20240101").exists())
    assert(!new java.io.File(wh, "day=20240102").exists())
    // survivors byte-untouched (no rewrite — a metadata-only drop)
    keepFiles.foreach { case (d, fset) =>
      assert(new java.io.File(wh, s"day=$d").listFiles()
        .map(_.getName).toSet == fset)
    }
    assert(spark.read.parquet(wh).select("id").as[Long].collect().sorted
      .toSeq == Seq(3L, 4L))
    // idempotent: the expired partitions are already gone
    assert(graft.sources.Warehouse.applyRetention(
      spark, wh, "day", keepFrom = "20240103").isEmpty)
  }

  test("deleteKeys: doomed keys erased, cold partitions byte-untouched, emptied partitions dropped, re-run no-op") {
    val wh = Files.createTempDirectory("graft-wh-erase").toString + "/t"
    // day 01: users 1,2 — partial erase; day 02: user 3 only — FULL
    // erase (the dynamic-overwrite silent-retention trap); day 03:
    // cold, must stay byte-identical
    Seq((1L, "20240101", 1.0), (2L, "20240101", 2.0),
        (3L, "20240102", 3.0), (4L, "20240103", 4.0))
      .toDF("user_id", "day", "v")
      .write.partitionBy("day").parquet(wh)
    val coldBefore = new java.io.File(wh, "day=20240103").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    val touched = Warehouse.deleteKeys(
      Seq(1L, 3L, 99L).toDF("user_id"), wh, Seq("day"), Seq("user_id"))
    assert(touched == Seq("day=20240101", "day=20240102"))
    // erased everywhere; survivors intact
    assert(spark.read.parquet(wh).select("user_id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 4L))
    // the all-deleted partition's DIRECTORY is gone, not lingering
    assert(!new java.io.File(wh, "day=20240102").exists())
    // cold partition never opened or replaced
    assert(new java.io.File(wh, "day=20240103").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap == coldBefore)
    // idempotent: nothing left to find, nothing touched
    assert(Warehouse.deleteKeys(
      Seq(1L, 3L).toDF("user_id"), wh, Seq("day"), Seq("user_id")).isEmpty)
    // deleting from a missing table is a loud no-op, not a crash
    assert(Warehouse.deleteKeys(Seq(1L).toDF("user_id"),
      wh + "-absent", Seq("day"), Seq("user_id")).isEmpty)
  }

  test("refreshEnriched: incremental joined view == full re-join; replayed delta converges") {
    val wh = Files.createTempDirectory("graft-wh-enr").toString + "/t"
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("uid", "tier")
    def enrich(f: org.apache.spark.sql.DataFrame,
               d: org.apache.spark.sql.DataFrame) =
      f.join(broadcast(d), Seq("uid"), "left")
        .select(f.columns.map(col) :+ coalesce(col("tier"), lit("none")).as("tier"): _*)
    val facts1 = Seq(
      (10L, 1L, "20240101", 1L, 5.0), (11L, 2L, "20240101", 2L, 6.0),
      (12L, 1L, "20240102", 3L, 7.0))
      .toDF("id", "uid", "day", "ing_ts", "v")
    Warehouse.refreshEnriched(facts1, dim, wh, Seq("day"), Seq("id"),
      "ing_ts", enrich)
    // second arrival: new rows only (append-only fact); one lands in
    // the old day (late) and one in a new day
    val facts2 = facts1.unionByName(Seq(
        (13L, 2L, "20240101", 4L, 8.0), (14L, 3L, "20240103", 5L, 9.0))
      .toDF("id", "uid", "day", "ing_ts", "v"))
    Warehouse.refreshEnriched(facts2, dim, wh, Seq("day"), Seq("id"),
      "ing_ts", enrich)
    val got = spark.read.parquet(wh)
    val want = enrich(facts2, dim)
    assert(got.count() == 5)
    assert(got.select(want.columns.map(col): _*).exceptAll(want).count() == 0
      && want.exceptAll(got.select(want.columns.map(col): _*)).count() == 0)
    // blind re-run with no new fact rows: converges, no duplicates
    Warehouse.refreshEnriched(facts2, dim, wh, Seq("day"), Seq("id"),
      "ing_ts", enrich)
    assert(spark.read.parquet(wh).count() == 5)
  }

  test("z-order layout: a two-dimensional box query touches fewer files than a single-column sort") {
    import org.apache.spark.sql.functions.input_file_name
    val base = Files.createTempDirectory("graft-wh-z").toString
    // uniform 2-D grid: 100 × 100
    val grid = spark.range(10000)
      .select(($"id" % 100).as("x"), ($"id" / 100).cast("long").as("y"))
    val nFiles = 16
    Warehouse.writeZOrdered(grid, s"$base/z", Seq("x", "y"), nFiles)
    grid.repartitionByRange(nFiles, $"x").sortWithinPartitions("x")
      .write.parquet(s"$base/linear")
    // per-file min/max boxes, the stats a reader prunes with
    def filesTouching(path: String, loX: Long, hiX: Long, loY: Long,
                      hiY: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
        .filter($"x1" >= loX && $"x0" <= hiX && $"y1" >= loY && $"y0" <= hiY)
        .count()
    // a y-band query: the x-sorted layout cannot prune AT ALL (every
    // file spans all y); z-order confines it to the overlapping Morton
    // macro-rows
    val zY = filesTouching(s"$base/z", 0, 99, 10, 34)
    val lY = filesTouching(s"$base/linear", 0, 99, 10, 34)
    assert(lY == nFiles.toLong, s"x-sorted layout should span y: $lY")
    assert(zY < lY, s"z-order touched $zY files for the y-band, linear $lY")
    // and an x-band query STILL prunes under z-order — skipping on
    // both dimensions at once is the point of the layout
    val zX = filesTouching(s"$base/z", 10, 34, 0, 99)
    assert(zX < nFiles, s"z-order should prune the x-band too: $zX")
    // the layout loses no rows
    assert(spark.read.parquet(s"$base/z").count() == 10000)
  }

  test("versioned commits: time travel reproduces every snapshot; append references, never rewrites (J15)") {
    import graft.sources.Versioned
    val t = Files.createTempDirectory("graft-vt").toString + "/t"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").as[(Long, Double)].collect().toSet
    val v1 = Versioned.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), t)
    val v2 = Versioned.commit(Seq((3L, 3.0)).toDF("id", "v"), t, append = true)
    val v3 = Versioned.commit(Seq((9L, 9.0)).toDF("id", "v"), t)
    assert((v1, v2, v3) == ((1L, 2L, 3L)))
    assert(Versioned.versions(spark, t) == Seq(1L, 2L, 3L))
    assert(rows(Versioned.readAt(spark, t, 1)) == Set((1L, 1.0), (2L, 2.0)))
    assert(rows(Versioned.readAt(spark, t, 2)) ==
      Set((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    assert(rows(Versioned.readAt(spark, t, 3)) == Set((9L, 9.0)))
    assert(rows(Versioned.readLatest(spark, t)) == Set((9L, 9.0)))
  }

  test("versioned change feed: keyed diff between any two snapshots, reproducible (J15)") {
    import graft.sources.Versioned
    val t = Files.createTempDirectory("graft-vt-cdf").toString + "/t"
    Versioned.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), t)
    Versioned.commit(Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("id", "s"), t)
    def feed() = Versioned.changesBetween(spark, t, 1L, 2L,
        Seq("id"), Seq("s"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(feed() == Set(
      (2L, "changed", Some("b"), Some("B")),
      (3L, "removed", Some("c"), None),
      (5L, "added", None, Some("e"))))
    // later commits cannot change the (1→2) feed — snapshots are
    // immutable file lists, so the changelog replays forever
    Versioned.commit(Seq((9L, "z")).toDF("id", "s"), t)
    assert(feed() == Set(
      (2L, "changed", Some("b"), Some("B")),
      (3L, "removed", Some("c"), None),
      (5L, "added", None, Some("e"))))
    // identical snapshots → empty feed
    assert(Versioned.changesBetween(spark, t, 2L, 2L, Seq("id"), Seq("s"))
      .count() == 0)
  }

  test("versioned rollback is metadata-only and preserves history; orphan data stays invisible") {
    import graft.sources.Versioned
    val t = Files.createTempDirectory("graft-vt-rb").toString + "/t"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSet
    Versioned.commit(Seq(1L, 2L).toDF("id"), t)
    Versioned.commit(Seq(3L).toDF("id"), t)
    // a crashed commit: data files land but no manifest publishes —
    // readers and versions() never see them
    Seq(99L).toDF("id").write.parquet(s"$t/data/commit-v000000099")
    assert(Versioned.versions(spark, t) == Seq(1L, 2L))
    assert(rows(Versioned.readLatest(spark, t)) == Set(3L))
    // rollback to v1: new version, v1's exact files, nothing moved
    val nv = Versioned.rollback(spark, t, 1L)
    assert(nv == 3L && rows(Versioned.readLatest(spark, t)) == Set(1L, 2L))
    // history intact: the rolled-past version still reads
    assert(rows(Versioned.readAt(spark, t, 2L)) == Set(3L))
    // roll FORWARD is another rollback
    Versioned.rollback(spark, t, 2L)
    assert(rows(Versioned.readLatest(spark, t)) == Set(3L))
  }

  test("versioned expiry deletes only files no surviving manifest references") {
    import graft.sources.Versioned
    val t = Files.createTempDirectory("graft-vt-exp").toString + "/t"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSet
    Versioned.commit(Seq(1L).toDF("id"), t)                 // v1
    Versioned.commit(Seq(2L).toDF("id"), t, append = true)  // v2 shares v1's files
    Versioned.commit(Seq(9L).toDF("id"), t)                 // v3 fresh state
    val (droppedM, deletedF) = Versioned.expireVersions(spark, t, keepLast = 2)
    assert(droppedM == 1 && deletedF == 0,
      "v1's files are shared by surviving v2 — nothing may be deleted")
    // v1 gone, v2 still COMPLETE (the shared files survived), v3 intact
    intercept[IllegalArgumentException](Versioned.readAt(spark, t, 1L))
    assert(rows(Versioned.readAt(spark, t, 2L)) == Set(1L, 2L))
    assert(rows(Versioned.readAt(spark, t, 3L)) == Set(9L))
    // now expire down to v3 only: v1/v2's files are unreferenced and go
    val (dm2, df2) = Versioned.expireVersions(spark, t, keepLast = 1)
    assert(dm2 == 1 && df2 > 0)
    assert(rows(Versioned.readLatest(spark, t)) == Set(9L))
    // idempotent re-run touches nothing
    assert(Versioned.expireVersions(spark, t, keepLast = 1) == ((0, 0)))
  }
}
