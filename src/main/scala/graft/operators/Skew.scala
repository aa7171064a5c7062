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
}
