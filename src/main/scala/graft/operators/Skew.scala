package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for joins whose hot keys are known a
  * priori (device with 100× the events, the one mega-customer).
  *
  * AQE's skew-join split handles skew it DETECTS at runtime; explicit
  * salting is the deterministic-plan alternative when a key is always
  * hot — the fact side spreads each key over `saltFactor` shuffle
  * partitions and the build side is replicated `saltFactor`×, so no
  * single reducer owns a whole hot key.
  */
object Skew {

  /** Salted equi-join: `fact ⋈ build` on `factKey = buildKey`, with the
    * shuffle keyed on (key, salt). `saltBy` must be a deterministic
    * fact-side column (e.g. its primary key) — it only drives
    * distribution, never semantics, so any value works; determinism
    * keeps retried tasks consistent. */
  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: String,
                 buildKey: String, saltBy: Column, saltFactor: Int,
                 how: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(saltFactor.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted(factKey) === replicated(buildKey)
          && salted("__salt") === replicated("__salt"), how)
      .drop("__salt")
  }

  /** Salted TWO-STAGE aggregation for a-priori hot GROUP keys: stage 1
    * aggregates on (keys, salt) so a hot key's rows spread over
    * `saltFactor` reducers; stage 2 merges the per-salt partials on the
    * keys alone — `saltFactor` rows per key, trivial. Spark's own
    * partial aggregation already bounds per-MAPPER state; salting
    * additionally bounds the per-REDUCER row count when one key
    * dominates a whole partition (the 100 TB hot-entity case where even
    * combined rows for one key exceed a single reducer).
    *
    * `partialAggs` run over raw rows grouped by (keys, salt);
    * `mergeAggs` run over the partial columns grouped by keys and
    * carry the final aliases. The decomposition must be algebraic
    * (sum→sum, count→sum, min→min...) — the same contract as any
    * distributed combiner. `saltBy` only drives distribution; being
    * deterministic keeps retried tasks consistent. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBy: Column,
                saltFactor: Int, partialAggs: Seq[Column],
                mergeAggs: Seq[Column]): DataFrame = {
    require(saltFactor >= 1)
    df.withColumn("__salt",
        pmod(xxhash64(saltBy), lit(saltFactor.toLong)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }
}
