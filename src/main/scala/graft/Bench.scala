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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // best-of-2 per query: run 1 warms codegen/file-index caches, run 2
    // is steady state — the regime a long-lived cluster actually sees.
    // noop sink, NOT count(): count() lets the optimizer prune every
    // unconsumed column, so map-only queries would be measured as bare
    // row counts; noop computes each result column and discards it.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    // local-iteration filter (driver never sets it): run only the named
    // queries, e.g. SPARK_GRAFT_ONLY=e6_dedup_clusters,e2_dedup_ngram_jaccard
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          // a failing query must not masquerade as a fast success
          failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
