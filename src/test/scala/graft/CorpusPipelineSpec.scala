package graft

import graft.operators.Dedup
import graft.pipelines.CorpusPipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def landing() = graft.sources.Tables.documents(spark, sf)
    .select("doc_id", "text", "lang", "source")

  test("corpus cycles: accounting closes, dedup invariant holds, index == rebuild") {
    val dir = Files.createTempDirectory("graft-corpus").toString
    val corpusPath = s"$dir/corpus"
    val indexPath = s"$dir/index"
    val docs = landing()
    val cut = 250L
    // cycle 1: first half of the landing
    val s1 = CorpusPipeline.runCycle(docs.filter($"doc_id" < cut),
      corpusPath, indexPath)
    assert(s1.nAccepted > 0 && s1.corpusSize == s1.nAccepted)
    assert(s1.nNew == s1.nRejectedQuality + s1.nRejectedExact +
      s1.nRejectedNearDup + s1.nAccepted)
    // cycle 2: FULL landing re-delivered (replay of cycle 1 + new docs)
    val s2 = CorpusPipeline.runCycle(docs, corpusPath, indexPath)
    // replayed ACCEPTED docs are skipped at extract; replayed rejected
    // docs re-evaluate (deterministically — no rejected ledger kept)
    assert(s2.nNew == docs.count() - s1.nAccepted)
    assert(s2.nNew == s2.nRejectedQuality + s2.nRejectedExact +
      s2.nRejectedNearDup + s2.nAccepted)
    val corp = CorpusPipeline.corpus(spark, corpusPath, docs)
    assert(corp.count() == s2.corpusSize &&
      s2.corpusSize == s1.nAccepted + s2.nAccepted)

    // dedup invariants over the FINAL corpus:
    // no two accepted docs share text
    assert(corp.groupBy(md5($"text")).count().filter($"count" > 1).count() == 0)
    // no two accepted docs are near-dups at the banding's sensitivity
    val residual = Dedup.minhashLsh(corp, "doc_id", "text", 3, 16, 4)
      .filter($"n_bands" >= 2)
    assert(residual.count() == 0)
    // the maintained band index equals a from-scratch index of the corpus
    val maintained = CorpusPipeline.bandIndex(spark, indexPath)
      .select("doc", "band", "bucket")
    val rebuilt = Dedup.minhashBandIndex(corp, "doc_id", "text", 3, 16, 4)
    assert(maintained.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(maintained).count() == 0)

    // cycle 3: pure replay accepts nothing and leaves the state alone
    // (rejected docs re-evaluate to the same verdicts; accepted docs
    // are skipped at extract)
    val s3 = CorpusPipeline.runCycle(docs, corpusPath, indexPath)
    assert(s3.nAccepted == 0 && s3.corpusSize == s2.corpusSize)

    // every accepted doc came through unmodified
    val cols = Seq("doc_id", "text", "lang", "source")
    assert(corp.select(cols.map(col): _*)
      .exceptAll(docs.join(corp.select("doc_id"), Seq("doc_id"), "left_semi")
        .select(cols.map(col): _*)).count() == 0)
  }

  test("streaming corpus ingest == batch cycles across micro-batch splits; replays converge") {
    val dir = Files.createTempDirectory("graft-corpus-stream").toString
    val in = s"$dir/landing"
    val docs = landing()
    val cut = 250L
    val first = docs.filter($"doc_id" < cut)
    val second = docs.filter($"doc_id" >= cut)

    // batch reference: the SAME splits through the batch cycle
    CorpusPipeline.runCycle(first, s"$dir/b_corpus", s"$dir/b_index")
    CorpusPipeline.runCycle(second, s"$dir/b_corpus", s"$dir/b_index")

    // streaming: land the splits as consecutive micro-batches
    first.coalesce(1).write.mode("overwrite").parquet(in)
    val stats = scala.collection.mutable.ArrayBuffer
      .empty[(Long, CorpusPipeline.CycleStats)]
    val q = CorpusPipeline.ingestStream(
      spark.readStream.schema(docs.schema).parquet(in),
      s"$dir/s_corpus", s"$dir/s_index", s"$dir/ckpt",
      onStats = (id, st) => stats += ((id, st))).start()
    try {
      q.processAllAvailable()
      second.coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()

    // corpus + index row-for-row equal to the batch cycles'
    val sc = spark.read.parquet(s"$dir/s_corpus")
    val bc = spark.read.parquet(s"$dir/b_corpus")
    assert(sc.count() > 0)
    assert(sc.exceptAll(bc).count() == 0 && bc.exceptAll(sc).count() == 0)
    val si = spark.read.parquet(s"$dir/s_index")
      .select("doc", "band", "bucket").localCheckpoint() // pinned pre-replay
    val bi = spark.read.parquet(s"$dir/b_index").select("doc", "band", "bucket")
    assert(si.exceptAll(bi).count() == 0 && bi.exceptAll(si).count() == 0)
    // each micro-batch surfaced a closing accounting row
    assert(stats.size == 2 && stats.forall { case (_, st) =>
      st.nNew == st.nRejectedQuality + st.nRejectedExact +
        st.nRejectedNearDup + st.nAccepted })

    // replay: a fresh-checkpoint query re-delivers EVERY landed file as
    // one micro-batch; accepted docs skip at extract, rejected docs
    // re-reach the same verdicts — state unchanged
    val before = sc.count()
    val q2 = CorpusPipeline.ingestStream(
      spark.readStream.schema(docs.schema).parquet(in),
      s"$dir/s_corpus", s"$dir/s_index", s"$dir/ckpt2").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$dir/s_corpus").count() == before)
    val si2 = spark.read.parquet(s"$dir/s_index").select("doc", "band", "bucket")
    assert(si2.exceptAll(si).count() == 0 && si.exceptAll(si2).count() == 0)
  }
}
