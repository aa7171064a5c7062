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
        // The iterative operators (pageRank, HITS, LPA, clusters,
        // k-core, BFS) materialize their per-round work through
        // localCheckpoint pins DURING query construction — the final
        // frame's plan is a stub over pinned RDDs. Capture EVERY SQL
        // execution the query triggers (the PlanSnap discipline), so
        // per-iteration Exchange/join shapes are in the evidence file.
        val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val listener = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 durationNs: Long): Unit =
            plans.add(qe.executedPlan.toString)
          override def onFailure(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 exception: Exception): Unit = ()
        }
        spark.listenerManager.register(listener)
        val (formatted, executed) = try {
          val df = fn(spark, sfDir)
          val fmt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          df.write.format("noop").mode("overwrite").save()
          org.apache.spark.graft.ListenerBridge
            .waitUntilListenersProcessed(spark.sparkContext)
          (fmt, df.queryExecution.executedPlan.toString)
        } finally spark.listenerManager.unregister(listener)
        val all = scala.jdk.CollectionConverters.CollectionHasAsScala(plans)
          .asScala.toSeq
        val census = all.map(PlanSnap.fingerprint)
          .foldLeft(Map.empty[String, Int]) { (acc, fp) =>
            (acc.keySet ++ fp.keySet).map(k =>
              k -> (acc.getOrElse(k, 0) + fp.getOrElse(k, 0))).toMap
          } + ("executions" -> all.size)
        val w = new java.io.PrintWriter(new java.io.File(dir, s"${name}_$suffix.txt"))
        try {
          w.println(s"== $name (sf=$sfDir, cpus=$cpus) ==")
          w.println()
          w.println("---- lifecycle operator census (summed over all executions) ----")
          w.println(census.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(", "))
          w.println()
          w.println("---- explain(formatted), final frame, initial plan ----")
          w.println(formatted)
          w.println("---- executed plan, final frame, after noop run (AQE final) ----")
          w.println(executed)
          all.zipWithIndex.foreach { case (p, i) =>
            w.println(s"---- execution ${i + 1}/${all.size} (AQE final) ----")
            w.println(p)
          }
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
