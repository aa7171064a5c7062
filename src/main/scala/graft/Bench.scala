package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // run with the full graft surface: SQL functions, the TopKPerKey
      // strategy, and the row_number->TopKPerKey optimizer rule — every
      // window-filter query then exercises the custom operator UNDER
      // the correctness gate
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.rewriteTopK", "true")
      // the app/SQL status stores are live even with the UI disabled
      // (they feed the REST/history surface) and default to retaining
      // 1000 executions / 100k tasks of metrics — across a ~1100-
      // execution suite that is real driver-heap ballast on the 8g
      // fork; a bench keeps only a handful for post-mortem
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per query: one UNTIMED warm-up (codegen/file-index caches — the
    // steady state a long-lived cluster sees) then `runs` timed runs;
    // the reported number is the MEDIAN, with min and spread emitted
    // alongside so a machine-noise outlier (the r2 F-family artifact)
    // is visible instead of silently polluting the headline. noop sink,
    // NOT count(): count() lets the optimizer prune every unconsumed
    // column, so map-only queries would be measured as bare row counts;
    // noop computes each result column and discards it.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt)
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    // local-iteration filter (driver never sets it): run only the named
    // queries, e.g. SPARK_GRAFT_ONLY=e6_dedup_clusters,e2_dedup_ngram_jaccard
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Pinned-state hygiene BETWEEN runs: several operators localCheckpoint
    // or cache bounded intermediates (funnel steps, dedup cluster maps,
    // ANN models) and correctly leave them alive for the caller — but a
    // 196-query suite never reuses them, so over ~800 executions the
    // block manager fills with dead pins and execution memory starves
    // (the r9 driver artifact showed h4 at 19 s full-suite vs 0.26 s
    // isolated). Releasing them makes every run measure the same
    // cold-pin state an isolated run sees.
    // Broadcast blocks (every broadcast join ships one) are only
    // reclaimed when the driver-side Broadcast object is GC'd and the
    // ContextCleaner notices — across ~1100 sequential executions the
    // un-collected blocks sit in the protected storage half of unified
    // memory and starve the sort-heaviest queries (the r10 d6/dq3
    // artifact). A driver GC per query keeps the block manager at the
    // same near-empty state an isolated run sees; SPARK_GRAFT_GC=0
    // opts out (measured overhead is tens of ms per query at an 8g
    // heap — noise next to the queries it un-poisons).
    val gcEvery = sys.env.getOrElse("SPARK_GRAFT_GC", "1") == "1"
    // GC cost floor — default chosen by a 7-run full-suite sweep (r13):
    //   floor    sum-of-medians   suite wall
    //   0        213.3 / 229.7 s  1179 / 1228 s   (two runs)
    //   0.25     212.4 s          1113 s
    //   0.5      202.4 / 203.4 s   986 /  999 s   (two runs)
    //   1.0      193.3 s           917 s
    //   2.0      197.4 s           929 s
    //   inf      186.9 s           888 s          (cadence-only)
    // Run-cost-triggered GC is PURE COST on both axes: medians and
    // wall improve monotonically as the floor rises (run-to-run
    // repeatability ±1% at 0.5, so the trend is real, not ordering),
    // and the r10 starvation signature (d6/dq3 inflation, wide
    // spreads) does NOT reappear at cadence-only — spread outliers
    // actually drop 16 -> 6 vs per-query GC. The every-16-runs cadence
    // alone (~73 GCs per suite) keeps block-manager backlog bounded
    // (the r10 disease needed ~800 GC-free executions), so the
    // default disables the cost trigger entirely; the env knob stays
    // for re-sweeps. Do not change without re-running the sweep
    // (tools/gc_sweep_report.py over per-floor SPARK_GRAFT_QUERIES_OUT
    // maps; numbers above from GCSWEEP_r13.json).
    val gcFloorSec = sys.env.get("SPARK_GRAFT_GC_FLOOR_SEC")
      .map(_.toDouble).getOrElse(Double.PositiveInfinity)
    var runsSinceGc = 0
    def releasePins(lastRunSec: Double): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      runsSinceGc += 1
      if (gcEvery && (lastRunSec > gcFloorSec || runsSinceGc >= 16)) {
        System.gc(); runsSinceGc = 0
      }
    }
    val results = selected.map { case (name, fn) =>
      val times = (0 to runs).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          // a failing query must not masquerade as a fast success
          failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        releasePins(dt)
        dt
      }.drop(1).sorted // drop the warm-up
      name -> times
    }
    def median(ts: Seq[Double]): Double = ts(ts.size / 2)
    val qs = results.map { case (k, ts) => s"\"" + k + "\":" + median(ts) }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, ts) => s"\"" + k + "\":" + ts.min }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, ts) => s"\"" + k + "\":" + (ts.max - ts.min) }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(r => median(r._2)).sum
    val totalMin = results.map(_._2.min).sum
    // FULL per-query diagnostics go to STDERR: the contract is ONE JSON
    // line on stdout, and a second (huge, front-truncating) stdout line
    // both breaks machine parsing of the artifact and invites the r4
    // "spread map read as query times" misread. Local iteration still
    // sees everything on stderr.
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,"queries":$qs,"queries_min":$mins,"queries_spread":$spreads,"total_min":$totalMin,"failed":$errs,"sf":"$sfDir"}"""
    System.err.println(fullJson)
    // ...and to a FILE: the stderr tail the round driver captures
    // front-truncates, which made per-query regression diffing across
    // rounds impossible from committed artifacts alone (r11 verdict
    // lead item). The file is the durable, machine-readable copy.
    // A PARTIAL run (SPARK_GRAFT_ONLY set) defaults to /tmp so local
    // iteration can never silently clobber the committed per-round
    // artifact at the repo root (ADVICE r12); a full run keeps the
    // cwd default so the round driver updates the artifact. Either
    // way the destination is logged prominently.
    val queriesOut = sys.env.getOrElse("SPARK_GRAFT_QUERIES_OUT",
      if (only.isDefined) "/tmp/bench_queries.json" else "bench_queries.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(queriesOut))
      try w.println(fullJson) finally w.close()
      System.err.println(s"[bench] per-query map written to: " +
        new java.io.File(queriesOut).getAbsolutePath)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $queriesOut: ${e.getMessage}")
    }
    // compact HEADLINE line — the one stdout JSON line, valid on its
    // own, carrying the metric/value contract plus the top-5 medians.
    val top5 = results.sortBy(r => -median(r._2)).take(5)
      .map { case (k, ts) => s"\"" + k + "\":" + median(ts) }
      .mkString("{", ",", "}")
    // in-suite inflation visibility (the r10 d6 disease: 19 s median
    // in-suite vs 0.9 s isolated): a query whose suite median is far
    // above its own suite MIN was starved by suite state, not by its
    // plan — surface the worst offenders machine-readably so a one-off
    // artifact number is never mistaken for an operator cost. Floor at
    // 0.25 s so micro-query jitter doesn't register.
    val inflated = results
      .map { case (k, ts) => (k, median(ts), math.max(ts.min, 0.25)) }
      .filter { case (_, med, base) => med > 2.0 * base }
      .sortBy { case (_, med, base) => -(med / base) }
    val inflStr = inflated.take(5)
      .map { case (k, med, base) =>
        s"\"" + k + "\":" + (math.round(med / base * 100.0) / 100.0) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_min":$totalMin,"n_queries":${results.size},"top5_med":$top5,"n_inflated":${inflated.size},"top_inflated_med_over_min":$inflStr,"failed":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
