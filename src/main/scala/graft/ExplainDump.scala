package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round plan evidence (r16): dump `.explain("formatted")`
  * for named queries to files, plus the AQE FINAL executed plan after a
  * noop-sink run (the formatted explain shows the initial plan only —
  * `isFinalPlan=false` — while the executed plan is the one whose
  * Exchange/join strategy counts the optimization claims cite).
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * Writes <outDir>/<query>_<suffix>.txt per query (all queries when the
  * list is omitted). Session config mirrors Bench exactly so the plans
  * are the plans the bench times.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <sfDir> <outDir> <suffix> [q1,q2,...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val only = args.lift(3).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.rewriteTopK", "true")
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.write.format("noop").mode("overwrite").save()
        // post-execution tree: AQE final plan (re-planned joins,
        // coalesced stages) — the plan that actually ran
        val executed = df.queryExecution.executedPlan.toString
        val w = new java.io.PrintWriter(new java.io.File(dir, s"${name}_$suffix.txt"))
        try {
          w.println(s"== $name (sf=$sfDir, cpus=$cpus) ==")
          w.println()
          w.println("---- explain(formatted), initial plan ----")
          w.println(formatted)
          w.println("---- executed plan after noop run (AQE final) ----")
          w.println(executed)
        } finally w.close()
        // bench-equivalent hygiene between queries so one query's pins
        // don't shape the next query's plan-time stats
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.err.println(s"[explain] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
