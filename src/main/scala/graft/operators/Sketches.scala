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
}
