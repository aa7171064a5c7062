package graft

import graft.operators.Similarity
import graft.streaming.AnnIndexStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** I18 — continuous ANN index maintenance under a frozen IVFADC model:
  * stream == batch encode row-for-row across micro-batch splits, the
  * model round-trips through its persisted form for the restart path,
  * replays converge, and a search over the MAINTAINED index equals one
  * over a fresh batch encode. */
class AnnIndexStreamSpec extends SparkSpec {

  test("streaming ANN index == batch encode; restart + replay converge; search equal") {
    val dir = Files.createTempDirectory("graft-ann-stream").toString
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val cut = 250L
    val first = emb.filter(col("vec_id") < cut)
    val second = emb.filter(col("vec_id") >= cut)

    // the frozen model: trained ONCE on the initial corpus slice
    val cents = Similarity.trainCentroids(first, "vec_id", "embedding", 8, 2)
      .zipWithIndex.map { case (cv, i) => (i, cv) }
    val cb = Similarity.trainPQ(
      Similarity.normalized(first, "vec_id", "embedding"), dim, 8, 16, 2)
    Similarity.saveIvfCentroids(spark, s"$dir/model", cents)
    Similarity.savePqIndex(s"$dir/model", cb,
      AnnIndexStream.encodeBatch(first.limit(0), "vec_id", "embedding",
        cents, cb)) // codebooks + an empty codes seed table

    // batch reference: the full corpus through the SAME frozen model
    val want = AnnIndexStream.encodeBatch(emb, "vec_id", "embedding",
      cents, cb).localCheckpoint()

    // stream the two slices as consecutive micro-batches; the SECOND
    // maintainer runs through maintainFrom (model reloaded from its
    // persisted form — the restart path)
    val in = s"$dir/landing"
    val counts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    first.coalesce(1).write.mode("overwrite").parquet(in)
    val q1 = AnnIndexStream.maintain(
      spark.readStream.schema(emb.schema).parquet(in),
      "vec_id", "embedding", s"$dir/index", s"$dir/ckpt", cents, cb,
      onStats = Some((id, n) => counts += ((id, n)))).start()
    try q1.processAllAvailable() finally q1.stop()
    second.coalesce(1).write.mode("append").parquet(in)
    val q2 = AnnIndexStream.maintainFrom(
      spark.readStream.schema(emb.schema).parquet(in),
      "vec_id", "embedding", s"$dir/model", s"$dir/index", s"$dir/ckpt").start()
    try q2.processAllAvailable() finally q2.stop()

    val got = Similarity.loadPqCodes(spark, s"$dir/index")
      .select("nn_id", "cell", "codes").localCheckpoint()
    assert(got.count() == emb.count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(counts.map(_._2).sum == first.count())

    // replay: a fresh-checkpoint query re-delivers every landed file;
    // deterministic encode + latest-wins keyed upsert -> index unchanged
    val q3 = AnnIndexStream.maintain(
      spark.readStream.schema(emb.schema).parquet(in),
      "vec_id", "embedding", s"$dir/index", s"$dir/ckpt2", cents, cb).start()
    try q3.processAllAvailable() finally q3.stop()
    val replayed = Similarity.loadPqCodes(spark, s"$dir/index")
      .select("nn_id", "cell", "codes")
    assert(replayed.exceptAll(got).count() == 0 &&
      got.exceptAll(replayed).count() == 0)

    // the maintained index serves search identically to a fresh encode
    val cN = Similarity.normalized(emb, "vec_id", "embedding").localCheckpoint()
    val qN = Similarity.normalizedQueries(
      emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding")
    def search(codes: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopKWith(cN, codes, qN, cb, k = 5, shortlist = 256, dim = dim)
    val a = search(got.select("nn_id", "codes"))
    val b = search(want.select("nn_id", "codes"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0 &&
      a.count() > 0)
  }

  test("default sink runs no per-batch stats job; a supplied onStats costs exactly one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ann-stats").toString
    val emb = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", 2, 1)
      .zipWithIndex.map { case (cv, i) => (i, cv) }
    val cb = Similarity.trainPQ(
      Similarity.normalized(emb, "vec_id", "embedding"), 2, 2, 2, 1)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // the async listener bus has no public drain hook: poll until the
    // counter has been stable for a beat
    def settled(): Int = {
      var prev = -1; var cur = jobs.get(); var spins = 0
      while (cur != prev && spins < 100) {
        prev = cur; Thread.sleep(200); cur = jobs.get(); spins += 1
      }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val base = settled()
      AnnIndexStream.foreachBatchSink(
        s"$dir/plain", "vec_id", "embedding", cents, cb)(emb, 0L)
      val plainJobs = settled() - base
      AnnIndexStream.foreachBatchSink(s"$dir/stats", "vec_id", "embedding",
        cents, cb, onStats = Some((_, _) => ()))(emb, 0L)
      val statsJobs = settled() - base - plainJobs
      // identical first-load merge either way; the only delta is the
      // gated idx.count() (AQE may split it, so assert strictly-fewer,
      // not exactly-one-fewer: were the count unconditional, the two
      // runs would count EQUAL jobs)
      assert(statsJobs > plainJobs,
        s"default sink must skip the stats job(s), got $plainJobs vs $statsJobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
