package graft.pipelines

import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LLM-corpus counterpart of [[IotBatchPipeline]]: continuous
  * corpus construction as one incremental, idempotent cycle any
  * scheduler can fire blindly. Where the IoT pipeline maintains a
  * warehouse (stage + agg cadences), this maintains a training CORPUS
  * and its dedup INDEX — the "ingest a crawl batch" loop every
  * training-data pipeline runs.
  *
  * One cycle =
  *  1. EXTRACT: landing docs not already accepted (anti join on
  *     `doc_id` against the corpus — re-delivered docs are skipped, so
  *     crashed or duplicated runs converge).
  *  2. CURATE: quality score + language agreement on the scan (the H7
  *     score-first discipline — map-side work, no text ever shuffles
  *     for docs that fail here).
  *  3. EXACT DEDUP: batch docs whose `md5(text)` already exists in the
  *     corpus are dropped — the corpus STORES `text_hash` at commit, so
  *     this gate reads one pruned column of the archive, never its
  *     text; within the batch the lowest id per hash wins.
  *  4. NEAR-DUP vs ARCHIVE: the batch is signed+banded ONCE (the probe,
  *     the within-batch pair run and the index commit all consume that
  *     one pass) and probed against the PERSISTED band index
  *     ([[Dedup.minhashProbeBands]]) — the archive's text is never
  *     re-read; matches with ≥ `minBands` agreeing bands are rejected.
  *  5. NEAR-DUP within batch: [[Dedup.minhashPairsFromBands]] over the
  *     surviving bands → [[Dedup.clusters]] → keep each cluster's
  *     canonical keeper ([[Dedup.applyClusters]]).
  *  6. COMMIT: survivors merge-upsert into the lang-partitioned corpus;
  *     their band rows merge-upsert into the band-partitioned index —
  *     both keyed writes, so replays are absorbed, and the maintained
  *     index provably equals a from-scratch index of the corpus
  *     (spec-asserted).
  *
  * Decisions are deterministic and the corpus only grows, so a doc
  * re-landing in any later cycle reaches the same verdict — the
  * accounting invariant (every landing doc is accepted, a dup of an
  * accepted doc, or quality-rejected) holds across any cycle split.
  * Near-dup ACCEPTANCE is order-dependent across cycles by design
  * (first accepted member of a dup group becomes the archive's
  * representative; later members reject against it) — same as any
  * streaming dedup; the invariant that matters is that NO two accepted
  * docs are near-dups at the banding's sensitivity.
  *
  * Scale: each cycle's cost is the batch's (scoring, signing, one
  * bucket-local index join, keyed writes into touched partitions) —
  * never a re-scan of corpus text; the only archive-sized input is the
  * band index, which joins bucket-locally and prunes to the batch's
  * buckets.
  */
object CorpusPipeline {

  case class CycleStats(nLanding: Long, nNew: Long, nRejectedQuality: Long,
                        nRejectedExact: Long, nRejectedNearDup: Long,
                        nAccepted: Long, corpusSize: Long)

  private def exists(spark: SparkSession, path: String): Boolean =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** The accepted corpus (empty frame with the landing's schema before
    * the first commit). Landing schema: `doc_id, text, lang, source`. */
  def corpus(spark: SparkSession, corpusPath: String,
             landing: DataFrame): DataFrame =
    if (exists(spark, corpusPath)) spark.read.parquet(corpusPath)
    else landing.limit(0)

  def bandIndex(spark: SparkSession, indexPath: String): DataFrame =
    if (exists(spark, indexPath)) spark.read.parquet(indexPath)
    else {
      import spark.implicits._
      spark.emptyDataset[(Long, Int, String)].toDF("doc", "band", "bucket")
    }

  /** `maxBucket` caps the archive-index bucket size the probe joins
    * against (finite BY DEFAULT here, unlike the cap-free operator
    * defaults): the corpus's no-near-dups invariant limits band-bucket
    * mass but does not bound it (chance collisions, boilerplate-heavy
    * corpora), and at archive scale one hot bucket otherwise expands
    * quadratically in the probe join. Members of a dropped bucket are
    * still guarded by the exact-hash gate and the within-batch pass. */
  def runCycle(landing: DataFrame, corpusPath: String, indexPath: String,
               k: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
               minQuality: Double = 0.5, minBands: Int = 2,
               maxBucket: Int = 1000): CycleStats = {
    val spark = landing.sparkSession
    val corp = corpus(spark, corpusPath, landing)
    val idx = bandIndex(spark, indexPath)

    // 1. extract: skip docs already accepted (replay/crash convergence)
    val fresh = landing
      .join(corp.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint() // several consumers; landing may be expensive
    val nLanding = landing.count()
    val nNew = fresh.count()

    // 2. curate (score-first: map-side, text never shuffles for drops)
    val scored = fresh
      .withColumn("__p", TextFunctions.textProfile(lower(col("text"))))
      .withColumn("__q",
        TextFunctions.qualityScoreFromProfile(col("text"), col("__p")))
      .withColumn("__pl", TextFunctions.langIdFromProfile(col("__p")))
    val curated = scored
      .filter(col("__q") >= minQuality && col("__pl") === col("lang"))
      .drop("__p", "__q", "__pl")
    val nQualityRejected = nNew - curated.count()

    // 3. exact dedup: the corpus stores `text_hash` at commit time, so
    // this gate reads ONE pruned column of the archive — never its text
    // (first cycle: no corpus yet, the hash frame is empty either way)
    val corpHashes =
      if (corp.columns.contains("text_hash"))
        corp.select(col("text_hash").as("__h")).distinct()
      else corp.select(md5(col("text")).as("__h")).distinct()
    val hashed = curated.withColumn("__h", md5(col("text")))
    val wHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col("doc_id"))
    val noExact = hashed
      .join(corpHashes, Seq("__h"), "left_anti")
      .withColumn("__rn", row_number().over(wHash))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumnRenamed("__h", "text_hash")
      .localCheckpoint() // consumed by the banding pass and the commit
    val nExactRejected = nNew - nQualityRejected - noExact.count()

    // sign + band the batch ONCE; the archive probe, the within-batch
    // pair run and the index commit all consume this one pass
    val batchBands = Dedup.minhashBandIndex(noExact, "doc_id", "text",
        k, numHashes, rowsPerBand)
      .localCheckpoint()

    // 4. near-dup vs archive (index probe; archive text untouched)
    val archiveDups = Dedup.minhashProbeBands(idx, batchBands, maxBucket)
      .filter(col("n_bands") >= minBands)
      .select(col("doc_id")).distinct()
    val noArchiveDup = noExact.join(archiveDups, Seq("doc_id"), "left_anti")
    val keptBands = batchBands
      .join(archiveDups.select(col("doc_id").as("doc")), Seq("doc"), "left_anti")

    // 5. near-dup within batch: pairs → clusters → canonical keepers
    val pairs = Dedup.minhashPairsFromBands(keptBands)
      .filter(col("n_bands") >= minBands)
    val clusters = Dedup.clusters(pairs, "doc_a", "doc_b")
    val accepted = Dedup.applyClusters(noArchiveDup, "doc_id",
        clusters, "doc_id", "cluster_id")
      .localCheckpoint() // written twice below (corpus + index)
    val nAccepted = accepted.count()
    val nNearDupRejected = nNew - nQualityRejected - nExactRejected - nAccepted

    // 6. commit: keyed writes absorb replays; the index rows are the
    // accepted docs' slice of the ONE banding pass
    if (nAccepted > 0) {
      Warehouse.mergeUpsert(accepted, corpusPath,
        partitionCols = Seq("lang"), key = Seq("doc_id"),
        versionCol = "doc_id")
      Warehouse.mergeUpsert(
        keptBands.join(accepted.select(col("doc_id").as("doc")),
          Seq("doc"), "left_semi"),
        indexPath, partitionCols = Seq("band"),
        key = Seq("doc", "band"), versionCol = "doc")
    }
    val corpusSize = corpus(spark, corpusPath, landing).count()
    CycleStats(nLanding, nNew, nQualityRejected, nExactRejected,
      nNearDupRejected, nAccepted, corpusSize)
  }

  /** `foreachBatch` body for CONTINUOUS corpus ingestion: each
    * micro-batch of landing docs runs one full [[runCycle]] against the
    * persisted corpus + index. Safe under Structured Streaming's
    * at-least-once foreachBatch contract for the same reason the batch
    * cycle is scheduler-safe: a replayed micro-batch's accepted docs are
    * skipped at extract, its rejected docs re-reach the same
    * deterministic verdicts, and both commits are keyed upserts — so
    * replays converge on identical corpus + index state. `onStats`
    * receives each cycle's accounting row (a production deployment
    * writes it to a metrics sink). */
  def foreachBatchSink(corpusPath: String, indexPath: String,
                       k: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
                       minQuality: Double = 0.5, minBands: Int = 2,
                       maxBucket: Int = 1000,
                       onStats: (Long, CycleStats) => Unit = (_, _) => ())
                      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      onStats(batchId, runCycle(batch, corpusPath, indexPath,
        k, numHashes, rowsPerBand, minQuality, minBands, maxBucket))

  /** The streaming entry point the reference's continuously-scheduled
    * extract DAG implies (reference: dags/iot_mongo_extract_to_dwh.py —
    * a loop that keeps landing new Mongo documents): a streaming frame
    * of landing docs (`doc_id, text, lang, source`) → one corpus cycle
    * per micro-batch. Append output mode — the sink consumes raw
    * arrivals; all state (corpus, index) lives in the persisted paths,
    * so a restarted query resumes from the checkpoint and replayed
    * batches are absorbed (see [[foreachBatchSink]]). */
  def ingestStream(docsStream: DataFrame, corpusPath: String,
                   indexPath: String, checkpoint: String,
                   k: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
                   minQuality: Double = 0.5, minBands: Int = 2,
                   maxBucket: Int = 1000,
                   onStats: (Long, CycleStats) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(foreachBatchSink(corpusPath, indexPath, k, numHashes,
        rowsPerBand, minQuality, minBands, maxBucket, onStats))
}
