package graft

import graft.sources.{Versioned, Warehouse}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The CALL-procedure surface ([[graft.sql.GraftCatalog]]): each
  * `CALL graft.*` must drive the SAME Warehouse/Versioned code path as
  * the Scala caller — parity guards on the argument decoding, view
  * resolution, and result-row marshalling, not re-tests of the ops
  * (WarehouseSpec owns those). */
class SqlWriteSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ready: Unit = {
    GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
  }

  test("CALL graft.merge_upsert == Warehouse.mergeUpsert (latest-wins, idempotent)") {
    ready
    val wh = Files.createTempDirectory("graft-sqlw-merge").toString + "/t"
    Seq((1L, "20240101", 1L, 10.0), (2L, "20240101", 1L, 20.0),
      (3L, "20240102", 1L, 30.0))
      .toDF("id", "day", "v_ts", "v").createOrReplaceTempView("load0")
    spark.sql(s"CALL graft.merge_upsert('load0', '$wh', 'day', 'id', 'v_ts')")
    Seq((1L, "20240101", 5L, 11.0), (2L, "20240101", 0L, 99.0),
      (9L, "20240101", 2L, 90.0))
      .toDF("id", "day", "v_ts", "v").createOrReplaceTempView("batch1")
    val st = spark.sql(
      s"CALL graft.merge_upsert('batch1', '$wh', 'day', 'id', 'v_ts')")
    assert(st.collect().map(_.getString(0)).toSeq == Seq("ok"))
    val got = spark.read.parquet(wh)
      .select("id", "v_ts", "v").as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 5L, 11.0), (2L, 1L, 20.0), (3L, 1L, 30.0),
      (9L, 2L, 90.0)))
  }

  test("CALL graft.refresh_aggregate: agg_sql over __raw == full recompute") {
    ready
    val wh = Files.createTempDirectory("graft-sqlw-cagg").toString + "/agg"
    val aggSql = """SELECT day, sum(CAST(floor(v * 100.0 + 0.5) AS BIGINT)) AS fs,
                   |  max(load_ts) AS wm FROM __raw GROUP BY day""".stripMargin
    Seq((1L, "20240101", 1L, 1.0), (2L, "20240101", 2L, 2.0),
      (3L, "20240102", 3L, 3.0))
      .toDF("id", "day", "load_ts", "v").createOrReplaceTempView("raw0")
    spark.sql(s"""CALL graft.refresh_aggregate('raw0', '$wh', 'day',
      'load_ts', 'wm', '${aggSql.replace("'", "''")}')""")
    // second landing: one late row into day1, one new day3 row
    Seq((1L, "20240101", 1L, 1.0), (2L, "20240101", 2L, 2.0),
      (3L, "20240102", 3L, 3.0), (4L, "20240101", 4L, 4.0),
      (5L, "20240103", 5L, 5.0))
      .toDF("id", "day", "load_ts", "v").createOrReplaceTempView("raw1")
    spark.sql(s"""CALL graft.refresh_aggregate('raw1', '$wh', 'day',
      'load_ts', 'wm', '${aggSql.replace("'", "''")}')""")
    val got = spark.read.parquet(wh)
      .select("day", "fs").as[(String, Long)].collect().toSet
    // == the full recompute of the same SQL over raw1
    assert(got == Set(("20240101", 700L), ("20240102", 300L),
      ("20240103", 500L)))
  }

  test("CALL graft.refresh_enriched: enrich_sql over __fact/__dim == full re-join") {
    ready
    val wh = Files.createTempDirectory("graft-sqlw-enr").toString + "/e"
    val enrichSql = """SELECT f.id, f.day, f.w, f.uid, d.uname
                      |FROM __fact f LEFT JOIN __dim d ON f.uid = d.uid""".stripMargin
    Seq((10L, "alice"), (20L, "bob")).toDF("uid", "uname")
      .createOrReplaceTempView("dimu")
    Seq((1L, "20240101", 1L, 10L), (2L, "20240102", 2L, 20L))
      .toDF("id", "day", "w", "uid").createOrReplaceTempView("fact0")
    spark.sql(s"""CALL graft.refresh_enriched('fact0', 'dimu', '$wh', 'day',
      'id', 'w', '${enrichSql.replace("'", "''")}')""")
    Seq((1L, "20240101", 1L, 10L), (2L, "20240102", 2L, 20L),
      (3L, "20240103", 3L, 10L))
      .toDF("id", "day", "w", "uid").createOrReplaceTempView("fact1")
    spark.sql(s"""CALL graft.refresh_enriched('fact1', 'dimu', '$wh', 'day',
      'id', 'w', '${enrichSql.replace("'", "''")}')""")
    val got = spark.read.parquet(wh)
      .select("id", "uname").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alice"), (2L, "bob"), (3L, "alice")))
  }

  test("CALL graft.compact returns the (partition, before, after) report and compacts") {
    ready
    val wh = Files.createTempDirectory("graft-sqlw-cmp").toString + "/t"
    // 4 tiny files in one partition, 1 in the other
    (1 to 4).foreach { i =>
      Seq((i.toLong, "20240101", i.toDouble)).toDF("id", "day", "v")
        .write.mode("append").partitionBy("day").parquet(wh)
    }
    Seq((9L, "20240102", 9.0)).toDF("id", "day", "v")
      .write.mode("append").partitionBy("day").parquet(wh)
    val rep = spark.sql(s"CALL graft.compact('$wh', 'day')")
      .as[(String, Int, Int)].collect().toSet
    assert(rep == Set(("day=20240101", 4, 1)), s"got $rep")
    assert(spark.read.parquet(wh).count() == 5)
  }

  test("CALL graft.retention returns dropped partitions; graft.delete_keys returns touched") {
    ready
    val wh = Files.createTempDirectory("graft-sqlw-ret").toString + "/t"
    Seq((1L, "20240101", 1.0), (2L, "20240102", 2.0), (3L, "20240103", 3.0))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(wh)
    val dropped = spark.sql(
        s"CALL graft.retention('$wh', 'day', '20240102')")
      .as[String].collect().toSet
    assert(dropped == Set("20240101"))
    assert(spark.read.parquet(wh).select("id").as[Long].collect().toSet
      == Set(2L, 3L))
    Seq(3L).toDF("id").createOrReplaceTempView("doomed_ids")
    val touched = spark.sql(
        s"CALL graft.delete_keys('doomed_ids', '$wh', 'day', 'id')")
      .as[String].collect()
    assert(touched.nonEmpty)
    assert(spark.read.parquet(wh).select("id").as[Long].collect().toSet
      == Set(2L))
  }

  test("CALL graft.write_zordered returns the calibration; rows conserved") {
    ready
    val src = (0 until 64).map(i => (i.toLong, (i % 8).toDouble, (i / 8).toDouble))
      .toDF("id", "x", "y")
    src.createOrReplaceTempView("zsrc")
    val out = Files.createTempDirectory("graft-sqlw-z").toString + "/z"
    val calib = spark.sql(
        s"CALL graft.write_zordered('zsrc', '$out', 'x,y', 4)")
      .as[(String, Double, Double)].collect().toSet
    assert(calib == Set(("x", 0.0, 7.0), ("y", 0.0, 7.0)), s"got $calib")
    assert(spark.read.parquet(out).count() == 64)
  }

  test("versioned lifecycle: CALL commit/rollback/expire + read TVFs, one code path") {
    ready
    val t = Files.createTempDirectory("graft-sqlw-v").toString + "/v"
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("snap1")
    Seq((1L, 1.5), (2L, 2.0)).toDF("k", "v").createOrReplaceTempView("snap2")
    assert(spark.sql(s"CALL graft.versioned_commit('snap1', '$t')")
      .as[Long].head() == 1L)
    assert(spark.sql(s"CALL graft.versioned_commit('snap2', '$t')")
      .as[Long].head() == 2L)
    // read TVFs == Scala readers
    assert(spark.sql(s"SELECT * FROM graft_read_at('$t', 1)")
      .as[(Long, Double)].collect().toSet == Set((1L, 1.0)))
    assert(spark.sql(s"SELECT * FROM graft_read_latest('$t')")
      .as[(Long, Double)].collect().toSet == Set((1L, 1.5), (2L, 2.0)))
    assert(spark.sql(s"SELECT * FROM graft_versions('$t')")
      .as[Long].collect().toSet == Set(1L, 2L))
    val feed = spark.sql(
      s"SELECT k, change FROM graft_changes_between('$t', 1, 2, 'k', 'v')")
    val scalaFeed = Versioned.changesBetween(spark, t, 1L, 2L,
      Seq("k"), Seq("v")).select("k", "change")
    assert(feed.collect().toSet == scalaFeed.collect().toSet
      && feed.count() == 2)
    // metadata-only rollback then expire — same semantics as Scala
    assert(spark.sql(s"CALL graft.versioned_rollback('$t', 1)")
      .as[Long].head() == 3L)
    assert(spark.sql(s"SELECT * FROM graft_read_latest('$t')")
      .as[(Long, Double)].collect().toSet == Set((1L, 1.0)))
    val exp = spark.sql(s"CALL graft.versioned_expire('$t', 1)")
      .as[(Int, Int)].head()
    assert(exp._1 == 2) // two manifests dropped (v1, v2)
    assert(spark.sql(s"SELECT * FROM graft_read_latest('$t')")
      .as[(Long, Double)].collect().toSet == Set((1L, 1.0)))
  }

  test("reserved view names fail fast instead of clobbering (r11 advice)") {
    ready
    val wh = Files.createTempDirectory("graft-sqlw-resv").toString + "/agg"
    Seq((1L, "20240101", 1L, 1.0))
      .toDF("id", "day", "load_ts", "v").createOrReplaceTempView("rawr")
    // caller owns a temp view named __raw: the CALL must refuse, and
    // the caller's view must survive untouched
    Seq(42L).toDF("mine").createOrReplaceTempView("__raw")
    val e = intercept[Exception] {
      spark.sql(s"""CALL graft.refresh_aggregate('rawr', '$wh', 'day',
        'load_ts', 'wm', 'SELECT day, max(load_ts) AS wm FROM __raw GROUP BY day')""")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    assert(spark.sql("SELECT mine FROM __raw").as[Long].head() == 42L)
    spark.catalog.dropTempView("__raw")
  }

  test("procedures live at the catalog root only (r11 advice)") {
    ready
    val cat = new graft.sql.GraftCatalog
    cat.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    import org.apache.spark.sql.connector.catalog.Identifier
    assert(cat.listProcedures(Array.empty).nonEmpty)
    // a namespaced listing is EMPTY, not a phantom copy of the root
    assert(cat.listProcedures(Array("anything")).isEmpty)
    // a namespaced load refuses rather than resolving as the root
    val e = intercept[IllegalArgumentException] {
      cat.loadProcedure(Identifier.of(Array("bogus"), "compact"))
    }
    assert(e.getMessage.contains("namespace"), e.getMessage)
    // SQL spelling: CALL through a namespace fails loudly
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.bogus.compact('/tmp/x', 'day')")
    }
    assert(e2.getMessage != null)
  }
}
