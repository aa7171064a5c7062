package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderValue: hand-computed interleaves, 2 and 3 dims") {
    val df = Seq((10L, 6L, 1L)).toDF("a", "b", "c")
    // a=1010, b=0110, bits=4: a bits at even positions → 0b01000100 = 68,
    // b bits at odd positions → 0b00101000 = 40; z = 108
    val z2 = df.select(Layout.zorderValue(Seq(col("a"), col("b")), 4)
      .as("z")).as[Long].head()
    assert(z2 == 108L)
    // 3 dims, 1 bit each: (1,0,1) → pos 0 and pos 2 → 5
    val z3 = df.select(Layout.zorderValue(
      Seq(col("c"), lit(0L), col("c")), 1).as("z")).as[Long].head()
    assert(z3 == 5L)
  }

  test("zorderKey: buckets map min→0 and max→2^bits−1; collected == provided ranges") {
    val df = (0L to 15L).map(v => (v, 15L - v)).toDF("x", "y")
    val keyed = Layout.zorderKey(df, Seq("x", "y"), bits = 2)
    // bits=2 over [0,15]: bucket = (v·4) div 16 = v div 4
    val rows = keyed.orderBy("x")
      .select(col("x"), col("y"), col("zval")).as[(Long, Long, Long)]
      .collect()
    def spread2(v: Long): Long =
      (0 until 2).map(b => ((v >> b) & 1L) << (2 * b)).sum
    rows.foreach { case (x, y, z) =>
      assert(z == (spread2(x / 4) | (spread2(y / 4) << 1)),
        s"x=$x y=$y z=$z")
    }
    val provided = Layout.zorderKey(df, Seq("x", "y"), bits = 2,
      ranges = Some(Seq((0L, 15L), (0L, 15L))))
    assert(provided.orderBy("x").select("zval").as[Long].collect().toSeq ==
      keyed.orderBy("x").select("zval").as[Long].collect().toSeq)
  }

  test("zorder clustering: fixed curve buckets have tight bounding boxes; row order does not") {
    // 32×32 grid, bits=5 → 10-bit zval; zval div 64 = the (x div 8,
    // y div 8) block → every bucket's bbox spans exactly 8 in BOTH dims
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y")
    val keyed = Layout.zorderKey(grid, Seq("x", "y"), bits = 5,
      ranges = Some(Seq((0L, 31L), (0L, 31L))))
    val boxes = keyed.withColumn("bucket", expr("zval div 64"))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .as[(Long, Long, Long)].collect()
    assert(boxes.length == 16)
    assert(boxes.forall { case (_, sx, sy) => sx == 7L && sy == 7L })
    // contrast: 64-row buckets in row-major order span the full x width
    val rowMajor = grid.withColumn("bucket", expr("(x * 32 + y) div 64"))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .as[(Long, Long, Long)].collect()
    assert(rowMajor.exists { case (_, sx, sy) => sy == 31L })
  }

  test("zorderLayout: partitions own non-overlapping zval ranges") {
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y")
    val laid = Layout.zorderLayout(grid, Seq("x", "y"), bits = 5,
      numPartitions = 4, ranges = Some(Seq((0L, 31L), (0L, 31L))))
    val parts = laid.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("zval").as("lo"), max("zval").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    assert(parts.length > 1)
    parts.sliding(2).foreach {
      case Array((_, _, hiPrev), (_, loNext, _)) =>
        assert(loNext > hiPrev, s"overlap: $hiPrev vs $loNext")
      case _ =>
    }
  }

  test("fileStats: the layout report shows z-ordered files own tighter boxes than row-major") {
    // the J13 measurement closing the K11/J12 loop: write the same
    // grid z-ordered and row-major, read the per-file min/max report
    // back — every z-ordered file's y-box must be narrow while the
    // row-major layout has full-height files
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft-fs-z").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft-fs-r").toString
    Layout.zorderLayout(grid, Seq("x", "y"), bits = 5, numPartitions = 4,
      ranges = Some(Seq((0L, 31L), (0L, 31L)))).drop("zval")
      .write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(4, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(rDir)
    def spans(dir: String): Seq[(Long, Long)] =
      Layout.fileStats(spark.read.parquet(dir), Seq("x", "y"))
        .select(col("x_max") - col("x_min"), col("y_max") - col("y_min"))
        .as[(Long, Long)].collect().toSeq
    val z = spans(zDir); val r = spans(rDir)
    assert(z.length == 4 && r.length == 4)
    // every z file: a quadrant-ish box (≤ 16 in y); row-major: x-sorted
    // files span the FULL y axis
    assert(z.forall(_._2 <= 16L), s"z boxes: $z")
    assert(r.forall(_._2 == 31L), s"row-major boxes: $r")
    // row counts conserve
    val n = Layout.fileStats(spark.read.parquet(zDir), Seq("x"))
      .agg(sum("n_rows")).as[Long].head()
    assert(n == 32L * 32L)
  }

  test("zorder guards: <2 dims and bit overflow fail loudly") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Layout.zorderValue(Seq(col("x")), 4)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderValue(Seq(col("x"), col("y")), 32)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderKey(df, Seq("x", "y"), bits = 8,
        ranges = Some(Seq((5L, 1L), (0L, 1L))))
    }
  }
}
