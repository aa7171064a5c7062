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

  /** Bloom SEMI-JOIN REDUCTION for a selective shuffle join: when the
    * dim side is too big to broadcast as ROWS but its key SET fits a
    * Bloom sketch, probe the fact side against the sketch BEFORE the
    * join's shuffle — non-matching fact rows (the vast majority under a
    * selective dim filter) never enter the exchange, so shuffle bytes
    * track the MATCH count, not the fact count. False positives only
    * leak extra rows into the shuffle; the exact join removes them, so
    * the result is row-identical to the plain join.
    *
    * This is Spark's own runtime-filter idea made DETERMINISTIC: AQE's
    * `InjectRuntimeFilter` fires only under creation-cost heuristics
    * and caps the sketch at 2^26 bits; here the sketch is built
    * explicitly (torrent-broadcast via [[graft.functions.expressions.BloomProbe]],
    * so it can be arbitrarily large) and the pruning is guaranteed
    * plan-shape, not a heuristic outcome.
    *
    * Only fact-side-discarding join types are legal (pruned fact rows
    * must be rows the join would drop anyway): inner, left_semi,
    * right_outer. Building the sketch runs 1–2 eager dim-sized jobs at
    * CALL time (a count when `expectedItems <= 0`, then the build) —
    * the model-build-then-apply seam, not a lazy query. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                      dimKey: String, expectedItems: Long = -1L,
                      bitsPerItem: Int = 16,
                      how: String = "inner"): DataFrame = {
    require(Set("inner", "leftsemi", "semi", "rightouter", "right")
        .contains(how.toLowerCase.replace("_", "")),
      s"bloom pruning drops fact rows; '$how' would change its result")
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = fact.sparkSession
    val items = math.max(1000L,
      if (expectedItems > 0) expectedItems else dim.count())
    val bits = math.max(1L << 16, items * bitsPerItem.toLong)
    val sketch = Curation.withBloomCaps(spark, items, bits) {
      val bloomAgg = ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          ColumnBridge.catalystExpression(xxhash64(col(dimKey))),
          org.apache.spark.sql.catalyst.expressions.Literal(items),
          org.apache.spark.sql.catalyst.expressions.Literal(bits))
          .toAggregateExpression())
      dim.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    }
    val pruned =
      if (sketch == null) fact.filter(lit(false)) // empty dim: no matches
      else {
        val bc = spark.sparkContext.broadcast(sketch)
        fact.filter(ColumnBridge.column(graft.functions.expressions.BloomProbe(
          bc, ColumnBridge.expression(xxhash64(col(factKey))))))
      }
    pruned.join(dim, pruned(factKey) === dim(dimKey), how)
  }
}
