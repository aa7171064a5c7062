package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-reproducible sketches.
  *
  * Spark's `approx_count_distinct` (HLL++, see B9) is the right sketch
  * at scale but its register layout is engine-private — no independent
  * engine can reproduce the estimate, so it can only be
  * error-bound-tested. KMV (k minimum values) trades that away: the
  * estimate is a pure order statistic of a portable hash, so ANY engine
  * with md5 computes the identical number — the property that matters
  * when two systems must agree on a cardinality (billing, routing,
  * pre-planning) rather than each approximating it privately.
  */
object Sketches {

  /** Portable 60-bit hash of any key (same family the dedup ops use). */
  def portableHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV distinct-count estimate with the k smallest distinct hashes:
    * D ≈ (k-1) · 2^60 / h_(k). Exact when fewer than k distinct values
    * exist (the sketch then holds them all). Rel. std error ≈ 1/√k.
    *
    * Scale shape: the per-partition distinct collapses map-side (partial
    * aggregation), the global sort is over at most the distinct hashes
    * and `limit(k)` caps what the driver-side estimate ever touches; a
    * bottom-k heap per partition (TopKPerKey with no keys) is the
    * refinement when even the distinct set is too large to shuffle. */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 256): DataFrame = {
    val bottom = df.select(portableHash(key).as("h"))
      .distinct().orderBy("h").limit(k)
    bottom.agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        graft.functions.Portable.pround(
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
              col("kth_hash").cast("double")), 2).as("est_distinct"))
  }

  /** Per-group KMV sketch rows `(groups…, h)` — the k smallest distinct
    * hashes per group: the persistable finer aggregate for COUNT
    * DISTINCT rollups (the [[histBinCounts]] story for the one
    * aggregate plain counts cannot give you — distincts are NOT
    * additive, but KMV sketches UNION losslessly: the bottom-k of a
    * union equals the bottom-k of the union of per-part bottom-k sets).
    * Deterministic md5-derived hashes, so unlike HLL the sketch and
    * every merge of it is oracle-reproducible bit-for-bit.
    *
    * Scale shape: the distinct collapses map-side; the bounded-heap
    * [[graft.plans.TopKPerKey]] caps the final exchange at
    * partitions × k rows per group — sketch-sized however many raw
    * rows flow in. */
  def kmvBottomK(df: DataFrame, groupCols: Seq[String], key: Column,
                 k: Int): DataFrame =
    graft.plans.TopKPerKey(
      df.select(groupCols.map(col) :+ portableHash(key).as("h"): _*)
        .distinct(),
      keys = groupCols.map(col), order = Seq(col("h").asc), k = k,
      rankName = "__r").drop("__r")

  /** KMV union: merge sketch rows to a coarser grouping — distinct then
    * bottom-k again, the same machinery over sketch-sized input (the
    * same hash can appear under several finer groups). */
  def kmvMerge(sk: DataFrame, coarseCols: Seq[String], k: Int): DataFrame =
    graft.plans.TopKPerKey(
      sk.select(coarseCols.map(col) :+ col("h"): _*).distinct(),
      keys = coarseCols.map(col), order = Seq(col("h").asc), k = k,
      rankName = "__r").drop("__r")

  /** Per-group estimates off sketch rows — [[kmvDistinct]]'s formula,
    * grouped: exact below k distinct, (k−1)·2^60/h_(k) above. */
  def kmvEstimate(sk: DataFrame, groupCols: Seq[String],
                  k: Int): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(groupCols.map(col) :+ col("k_used") :+ col("kth_hash") :+
        graft.functions.Portable.pround(
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
              col("kth_hash").cast("double")), 2).as("est_distinct"): _*)

  /** KMV set operations (B42) — the θ-sketch role: estimated distinct
    * cardinalities of two key sets, their UNION, and their
    * INTERSECTION, from bottom-k sketches alone. Union is exact KMV
    * algebra (bottom-k of a union == bottom-k of the merged bottom-k
    * sets); intersection is the classic MinHash route — the overlap
    * share inside the union's bottom-k estimates Jaccard, times the
    * union estimate. Deterministic md5 hashing (the [[kmvDistinct]]
    * family), so every estimate is oracle-reproducible bit-for-bit —
    * the engine-private HLL set ops can't be checked, these can.
    *
    * Shape: one scan per input collapsing map-side to a distinct
    * bottom-k (TakeOrdered, k-bounded); sketches are pinned
    * (sketch-sized) and every later stage — merge, overlap join,
    * one-row stats — is k-sized. Error: ~1/√k on each estimate, the
    * intersection compounding union × Jaccard (document k per use). */
  def kmvSetOps(a: DataFrame, b: DataFrame, keyA: Column, keyB: Column,
                k: Int = 256): DataFrame = {
    require(k >= 2)
    def bottom(df: DataFrame, key: Column): DataFrame =
      df.select(portableHash(key).as("h")).distinct()
        .orderBy("h").limit(k).localCheckpoint()
    kmvSetOpsFromSketches(bottom(a, keyA), bottom(b, keyB), k)
  }

  /** The [[kmvSetOps]] algebra off PRE-BUILT single-column `h` sketch
    * frames — the maintained-sketch seam (I49): a streaming job keeps
    * each side's bottom-k current (KMV union is lossless, so
    * incremental maintenance is just re-bottoming the union of old
    * sketch + new arrivals' hashes), and this computes the same report
    * off the maintained tables. */
  def kmvSetOpsFromSketches(sa: DataFrame, sb: DataFrame,
                            k: Int): DataFrame = {
    require(k >= 2)
    import graft.functions.Portable.pround
    val su = sa.union(sb).distinct().orderBy("h").limit(k).localCheckpoint()
    def est(kUsed: Column, kth: Column): Column =
      when(kUsed < k, kUsed.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60))
          / kth.cast("double"))
    val eu = est(col("ku"), col("hu"))
    sa.agg(count(lit(1)).as("ka"), max(col("h")).as("ha"))
      .crossJoin(sb.agg(count(lit(1)).as("kb"), max(col("h")).as("hb")))
      .crossJoin(su.agg(count(lit(1)).as("ku"), max(col("h")).as("hu")))
      .crossJoin(su.join(sa, Seq("h")).join(sb, Seq("h"))
        .agg(count(lit(1)).as("novl")))
      .select(
        col("ka").as("k_used_a"),
        pround(est(col("ka"), col("ha")), 2).as("est_a"),
        col("kb").as("k_used_b"),
        pround(est(col("kb"), col("hb")), 2).as("est_b"),
        col("ku").as("k_used_union"),
        pround(eu, 2).as("est_union"),
        col("novl").as("n_overlap"),
        when(col("ku") > 0L, pround(
          col("novl").cast("double") / col("ku").cast("double"), 6))
          .otherwise(lit(0.0)).as("jaccard"),
        when(col("ku") > 0L, pround(
          col("novl").cast("double") / col("ku").cast("double") * eu, 2))
          .otherwise(lit(0.0)).as("est_intersection"))
  }

  /** Portable HyperLogLog register rows `(groups…, reg, rho)` — the
    * md5-derived answer to Spark's engine-private HLL++ (B9), applying
    * the [[kmvBottomK]] discipline to HLL registers so estimate AND
    * merge are oracle-reproducible digit-for-digit (the TimescaleDB
    * `hyperloglog()`/`rollup()` contract, reference
    * dags/dbt_project/models/agg — its DWH rolls distincts exactly
    * this way).
    *
    * Layout: the top `p` bits of the 60-bit [[portableHash]] pick the
    * register; `rho` = leading-zero count of the remaining `q = 60-p`
    * bits + 1 (Flajolet et al. 2007), computed exactly via integer
    * `bin()` string length — both engines agree on every bit, no
    * float anywhere. Registers max-merge (idempotent, associative,
    * commutative), so sketches UNION losslessly at any grouping.
    *
    * Scale shape: the groupBy max partial-aggregates map-side to at
    * most groups × 2^p rows — sketch-sized however many raw rows flow
    * in; no distinct pass is needed (max is idempotent). */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], key: Column,
                   p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hll p must be in [4,16], got $p")
    val q = 60 - p
    val h = portableHash(key)
    val rest = h.bitwiseAND(lit((1L << q) - 1))
    val rho = when(rest === lit(0L), lit(q + 1))
      .otherwise(lit(q + 1) - length(bin(rest)))
    df.select(groupCols.map(col) :+ shiftright(h, q).as("reg")
        :+ rho.cast("int").as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** HLL union to a coarser grouping: element-wise register max over
    * sketch-sized input — the lossless rollup plain counts cannot give
    * you (merged-estimate == direct-estimate, spec- AND oracle-pinned). */
  def hllMerge(sk: DataFrame, coarseCols: Seq[String]): DataFrame =
    sk.groupBy((coarseCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))

  /** Per-group estimates off [[hllRegisters]] rows. The harmonic sum is
    * kept INTEGER-exact: S = Σ 2^(q+1−M[j]) over present registers plus
    * 2^(q+1) per absent register (M = 0), so the only float steps are
    * one double division by a folded constant and the standard
    * small-range linear-counting branch — both spelled identically in
    * the DuckDB oracle. Emits the scaled sum and used-register count so
    * the sketch content itself is hash-gated, not just the estimate. */
  def hllEstimate(sk: DataFrame, groupCols: Seq[String],
                  p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hll p must be in [4,16], got $p")
    val m = 1 << p
    val q = 60 - p
    val alpha = m match { // Flajolet et al. 2007 bias constants
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val mD = m.toDouble
    // alpha·m²·2^(q+1), folded in Scala so both engines see ONE literal
    val numer = alpha * mD * mD * math.pow(2.0, q + 1)
    val unit = 1L << (q + 1) // an absent register's (M=0) scaled term
    val grouped = sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_regs_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${q + 1} - rho)"))
          .as("__sp"))
      .select(groupCols.map(col) :+ col("n_regs_used") :+
        (col("__sp") + (lit(m.toLong) - col("n_regs_used")) * lit(unit))
          .cast("long").as("s_scaled"): _*)
    val raw = lit(numer) / col("s_scaled").cast("double")
    val zeros = lit(m.toLong) - col("n_regs_used")
    // Portability of the linear-counting `log()` (the dq12 ppm-literal
    // discipline, argued instead of replaced): Spark's java.lang.Math.log
    // and DuckDB's libm ln may differ in the LAST ULP for the same
    // double argument. The branch CONDITION is log-free (raw <= 2.5m and
    // an exact integer zero-count), so both engines always take the SAME
    // branch; inside it the argument m/zeros is a quotient of exact
    // small integers (identical double on both sides), and a 1-ULP
    // disagreement in ln is ~1e-16 relative — the pround(..., 2)
    // two-decimal guard would need the true value within ~1e-14 of a
    // *.xx5 rounding boundary to flip, which the fuzzed p∈[4,12] × key
    // draws and the tri-scale gate make astronomically unlikely and
    // would surface as a loud hash mismatch, never a silent drift.
    grouped.select(groupCols.map(col) :+ col("n_regs_used") :+
      col("s_scaled") :+
      graft.functions.Portable.pround(
        when(raw <= lit(2.5 * mD) && zeros > lit(0L),
          lit(mD) * log(lit(mD) / zeros.cast("double")))
          .otherwise(raw), 2).as("est_distinct"): _*)
  }

  /** One-shot portable HLL distinct estimate per group —
    * [[hllRegisters]] composed with [[hllEstimate]]. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
                  p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, key, p), groupCols, p)

  /** COUNT-MIN sketch over a key column: a `depth × width` counter
    * matrix where row i counts keys by `hash_i(key) mod width`. Like
    * [[kmvDistinct]] (and unlike HLL/t-digest), the layout is fully
    * portable — the hash family is md5-derived, so any engine builds
    * the bit-identical matrix and the estimates oracle-match exactly.
    *
    * Scale shape: ONE pass — per row a `depth`-element literal-array of
    * (row, bucket) cells is `posexplode`d and the groupBy partial-
    * aggregates map-side into at most `depth × width` groups, so the
    * exchange is sketch-sized (bounded) no matter the corpus; the
    * sketch itself is broadcast-sized by construction, which is the
    * whole point — frequency lookups join against it broadcast. */
  def countMinTable(items: DataFrame, term: String,
                    depth: Int = 4, width: Int = 1024): DataFrame =
    items.select(posexplode(cmsCells(col(term), depth, width)))
      .toDF("cms_row", "cms_bucket")
      .groupBy("cms_row", "cms_bucket").agg(count(lit(1)).as("cnt"))

  /** The depth hash cells of one key: cell i = h(key ‖ "|cms" ‖ i) mod
    * width; posexplode position IS the row index. */
  private def cmsCells(term: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i =>
      portableHash(concat(term, lit(s"|cms$i"))) % width): _*)

  /** Point estimates from a [[countMinTable]] sketch: for each distinct
    * query term, est = min over the depth rows of its bucket counters —
    * the CMS upper bound (est ≥ true count, overshoot bounded by
    * e·N/width with prob 1−e^−depth). The sketch side is broadcast
    * (≤ depth × width rows); the inner join is exact for terms the
    * sketch has seen — for never-seen keys left-join and zero-fill. */
  def countMinEstimate(cms: DataFrame, queries: DataFrame, term: String,
                       depth: Int = 4, width: Int = 1024): DataFrame =
    queries.select(col(term),
        posexplode(cmsCells(col(term), depth, width)))
      .toDF(term, "cms_row", "cms_bucket")
      .join(broadcast(cms), Seq("cms_row", "cms_bucket"))
      .groupBy(col(term)).agg(min(col("cnt")).as("est_count"))

  /** Merge two count-min sketches by summing counters cell-wise — CMS
    * is distributive, so a maintained sketch ingests per-batch sketches
    * without ever re-reading history (the same maintenance shape as the
    * band index / continuous aggregates: per-cycle cost scales with the
    * batch). Estimates from the merged sketch == estimates from a
    * sketch built over the concatenated corpus (spec-asserted). */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("cms_row", "cms_bucket").agg(sum("cnt").as("cnt"))

  /** TimescaleDB `histogram(value, lo, hi, nBuckets)` equivalent: per
    * group, the DENSE bucket-count vector — `nBuckets` equal-width
    * buckets over `[lo, hi)` plus the underflow bucket 0 (`v < lo`) and
    * overflow bucket `nBuckets+1` (`v ≥ hi`), one row per
    * (group, bucket) with empty buckets emitted as explicit zeros
    * (Timescale returns the full array; the row spelling is the same
    * content un-nested). Null values are dropped, as in any SQL
    * aggregate.
    *
    * Scale shape: the count agg partial-aggregates map-side to at most
    * groups × (nBuckets+2) rows — sketch-sized, never input-sized — and
    * the dense spine is `distinct(group) × sequence(0..nBuckets+1)`, a
    * narrow explode over the vocabulary-sized key set; the final left
    * join is sketch × sketch. Bucket assignment `floor((v−lo)/width)`
    * is one pure-IEEE expression, bit-identical cross-engine. */
  def histogram(df: DataFrame, groupCols: Seq[String], value: Column,
                lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo)
    val width = (hi - lo) / nBuckets
    val bucket = when(value < lit(lo), lit(0))
      .when(value >= lit(hi), lit(nBuckets + 1))
      .otherwise(floor((value - lit(lo)) / lit(width)).cast("int") + lit(1))
    val counts = df.filter(value.isNotNull)
      .groupBy(groupCols.map(col) :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
    val spine = df.select(groupCols.map(col): _*).distinct()
      .withColumn("bucket", explode(sequence(lit(0), lit(nBuckets + 1))))
      .withColumn("bucket", col("bucket").cast("int"))
    spine.join(counts, groupCols :+ "bucket", "left")
      .select(groupCols.map(col) :+ col("bucket") :+
        coalesce(col("n"), lit(0L)).as("n"): _*)
  }

  /** Fixed-bin histogram percentiles — the SCALE-SAFE spelling of B8's
    * exact `percentile`: Spark's exact aggregate buffers every distinct
    * value per group in executor memory (a per-group value map), which
    * at 100 TB is an OOM, while a fixed histogram is a bounded
    * `nBins`-row state that partial-aggregates map-side like any count.
    * Error is bounded by the bin width; memory is O(nBins) per group
    * regardless of input size.
    *
    * Estimate: per group, bin counts → running totals (a window over
    * ≤ nBins rows per group — never the raw values) → for each
    * percentile p, rank r = ceil(p·n) lands in the first bin whose
    * running count reaches r, and the value interpolates linearly
    * within that bin. Every step is plain integer/double arithmetic on
    * the SAME formula in any engine — the DuckDB oracle reproduces the
    * numbers bit-for-bit (unlike t-digest/HLL-style sketches whose
    * layout is engine-private, the same trade [[kmvDistinct]] makes).
    * Values outside [lo, hi) clamp into the edge bins; null values are
    * dropped (the semantics of every SQL percentile aggregate — left
    * in, they'd form a null bin that inflates ranks). */
  def histPercentiles(df: DataFrame, groupCols: Seq[String], value: Column,
                      ps: Seq[(String, Double)], lo: Double, hi: Double,
                      nBins: Int): DataFrame =
    histPercentilesFromBins(
      histBinCounts(df, groupCols, value, lo, hi, nBins),
      groupCols, ps, lo, hi, nBins)

  /** The PERSISTABLE layer of the percentile story: per-group fixed-bin
    * counts `(groups…, __bin, __cnt)`. Bin counts are DISTRIBUTIVE —
    * they sum — so a finer aggregate (per-day bins, the materialized
    * continuous aggregate) rolls up to any coarser grouping with
    * [[histMerge]] and re-estimates with [[histPercentilesFromBins]]
    * WITHOUT re-reading raw data: TimescaleDB's continuous-aggregate
    * `percentile_agg → rollup() → approx_percentile` contract, with the
    * merge exact by associativity of +. */
  def histBinCounts(df: DataFrame, groupCols: Seq[String], value: Column,
                    lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo)
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((value - lit(lo)) / lit(width)), lit(0L)),
      lit((nBins - 1).toLong))
    df.filter(value.isNotNull)
      .groupBy(groupCols.map(col) :+ bin.as("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Roll a [[histBinCounts]] frame up to a coarser grouping (the
    * coarse keys must already be columns — derive them first, e.g. a
    * month prefix of a day key). One map-combined sum over sketch-sized
    * input. */
  def histMerge(bins: DataFrame, coarseCols: Seq[String]): DataFrame =
    bins.groupBy(coarseCols.map(col) :+ col("__bin"): _*)
      .agg(sum(col("__cnt")).as("__cnt"))

  /** ROLLING-window bin merge (B41): for every (keys, day) present in
    * a per-day [[histBinCounts]] frame, the bins of the trailing
    * `window` days merged — TimescaleDB's
    * `rolling(percentile_agg) OVER (ORDER BY day RANGE '7 days')`
    * accessor pattern, feeding [[histPercentilesFromBins]] for
    * trailing-window percentiles that never re-read raw data (and ride
    * the I19 MAINTAINED bins table unchanged — the streaming story).
    *
    * Spelled as a fixed fan-out, not a range join: each bin row of day
    * d contributes to anchors d..d+window−1 via an in-row calendar
    * explode (×window, sketch-sized), then one grouped sum; anchors
    * with no rows of their own are dropped by a semi-join against the
    * observed (keys, day) set — a range join here would fall to a
    * nested loop, and a window-function spelling would sort raw-sized
    * partitions. `day` is a yyyyMMdd string key (the TimeAgg.dayKey
    * convention). */
  def histRollingBins(bins: DataFrame, keys: Seq[String], day: String,
                      window: Int): DataFrame = {
    require(window >= 1 && window <= 366,
      s"window must be in [1, 366] days, got $window")
    // bins feed TWO consumers (the fan-out and the anchor set) and the
    // semi-join's null filter defeats ReusedExchange — without a pin
    // the whole upstream (raw-sized when bins come fresh from
    // histBinCounts) runs twice, the c10 lesson. The pinned frame is
    // sketch-sized by contract.
    val b = bins.localCheckpoint()
    val anchors = b.select((keys :+ day).map(col): _*).distinct()
    b
      .withColumn("__anchor", explode(transform(
        sequence(lit(0), lit(window - 1)),
        i => date_format(date_add(to_date(col(day), "yyyyMMdd"), i),
          "yyyyMMdd"))))
      .groupBy(keys.map(col) ++ Seq(col("__anchor"), col("__bin")): _*)
      .agg(sum(col("__cnt")).as("__cnt"))
      .join(anchors.withColumnRenamed(day, "__anchor"),
        keys :+ "__anchor", "left_semi")
      .withColumnRenamed("__anchor", day)
  }

  /** The estimate stage of [[histPercentiles]] over an existing bins
    * frame (fresh from [[histBinCounts]] or merged via [[histMerge]]).
    * All window work runs on ≤ nBins rows per group — never raw
    * values. */
  def histPercentilesFromBins(hist: DataFrame, groupCols: Seq[String],
                              ps: Seq[(String, Double)], lo: Double,
                              hi: Double, nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins > 0 && hi > lo && ps.nonEmpty)
    val width = (hi - lo) / nBins
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val wcum = wg.orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__n", sum(col("__cnt")).over(wg))
      .withColumn("__cum", sum(col("__cnt")).over(wcum))
    val aggs = ps.map { case (name, p) =>
      val r = ceil(col("__n") * p)
      val frac = (r - (col("__cum") - col("__cnt"))) / col("__cnt")
      val est = graft.functions.Portable.pround(
        lit(lo) + (col("__bin") + frac) * lit(width), 4)
      // first qualifying bin via struct-min (nulls ignored); .est after
      min(when(col("__cum") >= r,
        struct(col("__bin").as("bin"), est.as("est")))).as(s"__$name")
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) ++
        ps.map { case (name, _) => col(s"__$name")("est").as(name) }: _*)
  }

  /** Percentile RANK (CDF estimate) from a bins frame — the inverse of
    * [[histPercentilesFromBins]] and the `approx_percentile_rank` half
    * of the TimescaleDB percentile-aggregate contract: for each probe
    * value x, the estimated fraction of observations ≤ x, linearly
    * interpolated inside x's bin (the same within-bin-uniform model the
    * percentile estimate uses, so rank(percentile(p)) ≈ p).
    *
    * Probes below `lo` rank 0 inside bin 0; probes at/above `hi` rank
    * 1. The probe's bin index and in-bin fraction are compile-time
    * constants, so the whole estimate is ONE conditional aggregation
    * over the sketch-sized bins frame — no window, no raw-data re-read:
    * it composes with [[histMerge]] rollups and the I19 continuously
    * maintained bins exactly like the percentile estimate does. */
  def histCdfFromBins(hist: DataFrame, groupCols: Seq[String],
                      probes: Seq[(String, Double)], lo: Double, hi: Double,
                      nBins: Int, scale: Int = 4): DataFrame = {
    require(nBins > 0 && hi > lo && probes.nonEmpty)
    val width = (hi - lo) / nBins
    val aggs = probes.map { case (name, x) =>
      val pos = (x - lo) / width
      val bx = math.min(math.max(math.floor(pos), 0.0), (nBins - 1).toDouble)
      val frac = math.min(math.max(pos - bx, 0.0), 1.0)
      graft.functions.Portable.pround(
        (coalesce(sum(when(col("__bin") < lit(bx.toLong), col("__cnt"))),
            lit(0L)).cast("double") +
          lit(frac) * coalesce(sum(when(col("__bin") === lit(bx.toLong),
            col("__cnt"))), lit(0L)).cast("double")) /
          sum(col("__cnt")).cast("double"), scale).as(name)
    }
    hist.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
