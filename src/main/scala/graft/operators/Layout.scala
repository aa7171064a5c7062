package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data-layout clustering (K11) — the lake
  * OPTIMIZE/CLUSTER BY story at 100 TB: co-locating rows that are
  * close in SEVERAL filter dimensions at once, so min/max file
  * statistics prune multi-predicate scans the way a single-column
  * sort only prunes one. The reference's warehouse relies on
  * TimescaleDB chunk exclusion over time (
  * `/root/reference/dags/dbt_project/models/stage/`); Z-ordering is
  * the same pruning idea generalized to N dimensions for a file lake.
  *
  * The curve value is deterministic integer arithmetic end to end —
  * per-dimension range buckets via integer floor division, then a
  * bit interleave — so unlike sampling-based layout passes the KEY
  * itself is oracle-reproducible (DuckDB mirrors the same `//` and
  * bit ops hash-exactly). Only the final [[zorderLayout]] range
  * repartition uses Spark's sampled RangePartitioner (boundaries are
  * not part of the contract; the per-file NON-OVERLAP of key ranges
  * is, and is spec-asserted).
  */
object Layout {

  /** Pure bit-interleave of pre-bucketed NON-NEGATIVE ints: bit `b`
    * of dimension `i` lands at position `b·n + i` of the Z-value.
    * `bits·n` must fit a long; each input must already be in
    * `[0, 2^bits)` (see [[zorderKey]] for the bucketing front end).
    * Stays a single codegen'd projection — `bits·n` shift/mask terms
    * summed over disjoint bit positions, zero shuffle. */
  def zorderValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 2, s"z-order needs >= 2 dimensions, got $n")
    require(bits >= 1 && bits * n <= 62,
      s"bits * dims must fit a long: got bits=$bits dims=$n")
    val terms = for {
      (c, i) <- buckets.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ + _)
  }

  /** Adds per-dimension range buckets `__zb_i` in `[0, 2^bits)` and
    * the interleaved `zval` for the given integer dimension columns.
    * Bucket = `((v − min) · 2^bits) div (max − min + 1)` — all-integer
    * floor division, monotone in `v`, min ↦ 0 and max ↦ 2^bits − 1
    * (never out of range). The per-dimension (min, max) pair is
    * collected driver-side ONCE (2·n scalars — the model-sized-collect
    * discipline of H14/F9/K10) so the bucketing itself is a
    * zero-shuffle literal-parameterized projection; pass `ranges` to
    * skip the collect when bounds are known (a maintained stats table,
    * a fixed schema contract).
    *
    * Scale shape: one map-combined min/max agg over the input, then
    * ONE scan with a pure projection — no exchange anywhere. */
  def zorderKey(df: DataFrame, dims: Seq[String], bits: Int,
                ranges: Option[Seq[(Long, Long)]] = None): DataFrame = {
    require(dims.size >= 2, s"z-order needs >= 2 dims, got ${dims.size}")
    val bounds: Seq[(Long, Long)] = ranges.getOrElse {
      val aggs = dims.flatMap(d =>
        Seq(min(col(d).cast("long")).as(s"__mn_$d"),
          max(col(d).cast("long")).as(s"__mx_$d")))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      dims.indices.map(i => (r.getLong(2 * i), r.getLong(2 * i + 1)))
    }
    bounds.foreach { case (lo, hi) =>
      require(hi >= lo, s"empty/inverted range ($lo, $hi)")
      require(hi - lo <= (Long.MaxValue >> bits),
        s"range width << bits overflows long: ($lo, $hi) bits=$bits")
    }
    val withBuckets = dims.zip(bounds).zipWithIndex.foldLeft(df) {
      case (acc, ((d, (lo, hi)), i)) =>
        acc.withColumn(s"__zb_$i",
          expr(s"((cast(`$d` as bigint) - ${lo}L) * ${1L << bits}L) " +
            s"div ${hi - lo + 1L}L"))
    }
    withBuckets.withColumn("zval",
      zorderValue(dims.indices.map(i => col(s"__zb_$i")), bits))
      .drop(dims.indices.map(i => s"__zb_$i"): _*)
  }

  /** The layout pass itself: range-repartition on the Z-value and
    * sort within partitions, so each output file owns a contiguous,
    * NON-OVERLAPPING slice of the curve — multi-dimension min/max
    * pruning for every downstream scan. RangePartitioner samples the
    * key (cheap — `zval` is already computed), which is exactly the
    * right tool here: balanced files matter, boundary placement
    * doesn't. */
  def zorderLayout(df: DataFrame, dims: Seq[String], bits: Int,
                   numPartitions: Int,
                   ranges: Option[Seq[(Long, Long)]] = None): DataFrame =
    zorderKey(df, dims, bits, ranges)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))

  /** Per-FILE min/max/count layout report (J13) — the measurement that
    * closes the K11/J12 loop: row-group pruning is only as good as the
    * per-file bounding boxes, and this report IS those boxes (what the
    * lake formats keep in manifest metadata, derived here from the
    * data so any layout can be audited). Read it after a rewrite to
    * see whether clustering actually tightened the boxes a scan prunes
    * on — the J12 spec does exactly that. One map-combined grouped agg
    * over `input_file_name()`; output is file-count-sized. */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }
}
