package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory for graft deployments.
  *
  * `GraftSession.builder()` returns a pre-configured
  * `SparkSession.Builder` with the graft SQL surface installed and the
  * engine settings every operator here assumes:
  *
  *  - AQE on with skew-join splitting — detected hot keys re-plan at
  *    runtime (`Skew.saltedJoin` stays for a-priori hot keys);
  *  - partial aggregation + broadcast thresholds left at Spark
  *    defaults (operators choose `broadcast()` explicitly where a side
  *    is known-small);
  *  - UTC session timezone — every day/month key derivation in the
  *    stage layer is calendar-dependent, and a cluster-local timezone
  *    silently shifts bucket boundaries between clusters;
  *  - the graft extensions (`word_shingles`, `simhash64`, `vector_dot`,
  *    `l2_normalize`, and the TopKPerKey planner strategy) registered
  *    via `spark.sql.extensions` so plain SQL users get them too;
  *  - `spark.graft.rewriteTopK` ON: window-spelled top-k-per-group
  *    queries plan the bounded-heap operator (oracle-verified across
  *    the whole suite), opt-out per session.
  *
  * Callers still pick master/app-name/shuffle-partition count — those
  * are cluster-shaped, not engine-shaped. For 1000-executor targets set
  * `spark.sql.shuffle.partitions` to 2-3x total cores and let AQE
  * coalesce down.
  */
object GraftSession {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // row_number/rank window-filter queries plan the bounded-heap
      // TopKPerKey instead of Exchange→full-group-sort→Window. The
      // rewrite is oracle-gated (the whole query suite hash-matches
      // DuckDB with it on — Bench runs it on every round), so a graft
      // deployment gets the heap shape for plain SQL too; set it to
      // false to fall back to Spark's stock window plan
      .config("spark.graft.rewriteTopK", "true")

  /** Local session for tests/examples: `local[n]`, n shuffle
    * partitions. */
  def local(cores: Int): SparkSession =
    builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
