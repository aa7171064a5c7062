package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** Continuous ANN index maintenance (I18) — the vector-side counterpart
  * of the corpus ingest stream: the reference's continuously-scheduled
  * extract loop (dags/iot_mongo_extract_to_dwh.py) applied to the
  * embedding store every production vector database maintains.
  *
  * Deployment shape: the IVFADC model (coarse centroids + PQ codebooks)
  * is trained ONCE offline on an initial corpus and FROZEN — exactly the
  * train-once/probe-forever discipline of the I8 contamination sketch
  * and I10 LM scorer — then a stream of new vectors is encoded per
  * micro-batch (pure projection work: both quantizers ride the rows as
  * literals, zero shuffles before the sink) and keyed-upserted into the
  * persisted `(nn_id, cell, codes)` table that
  * [[graft.operators.Similarity.savePqIndex]] lays out: cell-partitioned,
  * so a probe's read prunes to its nProbe cells and the upsert rewrites
  * only touched cells.
  *
  * Replay safety: encoding under a frozen model is deterministic, so an
  * at-least-once `foreachBatch` re-delivery upserts byte-identical rows
  * — latest-wins keyed on `nn_id` with the micro-batch id as the
  * version converges (the J3/J5 idempotence contract). The maintained
  * index is INSERT-plus-SAME-CELL-UPDATE only: the upsert prunes to the
  * touched cells' partitions, so a re-landed `nn_id` whose VECTOR
  * changed enough to move cells would leave its old-cell row behind.
  * Under a frozen model that is the correct trade — cell is a pure
  * function of the vector, so byte-identical replays never move cells —
  * and value-mutating re-encodes belong to the BATCH migration path
  * ([[graft.operators.ModelMigration]]: new model version + full
  * re-encode + atomic swap), not a streaming concern — PQ codebooks
  * are only meaningful against the codebook generation that encoded the
  * index.
  *
  * At 100 TB: the stream's per-batch cost is batch × O(m) encode work
  * plus an upsert bounded by the touched cells' partitions; the index
  * table grows monotonically but each micro-batch never reads more of
  * it than the cells it touches.
  */
object AnnIndexStream {

  /** Encode one micro-batch of raw `(id, vec)` rows under the frozen
    * model — the batch-side body, usable directly for backfills. */
  def encodeBatch(batch: DataFrame, id: String, vec: String,
                  cents: Array[(Int, Seq[Double])],
                  cb: Array[Array[Seq[Double]]]): DataFrame =
    Similarity.encodeIvfPq(Similarity.normalized(batch, id, vec), cents, cb)

  /** `foreachBatch` body: encode + idempotent cell-partitioned upsert
    * into `indexPath/codes` (the [[Similarity.savePqIndex]] layout, so
    * [[Similarity.loadPqCodes]] reads the maintained table unchanged —
    * the extra `batch_id` provenance column rides along and is ignored
    * by the searchers). The micro-batch id is the merge VERSION, so a
    * later batch's row for the same `nn_id` genuinely wins (not just
    * by the updates-side tie-break). `onStats` costs one count job per
    * micro-batch, so it only runs when a callback is supplied. */
  def foreachBatchSink(indexPath: String, id: String, vec: String,
                       cents: Array[(Int, Seq[Double])],
                       cb: Array[Array[Seq[Double]]],
                       onStats: Option[(Long, Long) => Unit] = None)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val idx = encodeBatch(batch, id, vec, cents, cb)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .localCheckpoint()
    graft.sources.Warehouse.mergeUpsert(idx, s"$indexPath/codes",
      partitionCols = Seq("cell"), key = Seq("nn_id"), versionCol = "batch_id")
    onStats.foreach(f => f(batchId, idx.count()))
  }

  /** Maintain the persisted IVFADC index from a stream of new vectors
    * under a frozen model. Append mode — the sink consumes raw
    * arrivals; all state lives in the persisted index, so a restarted
    * query resumes from the checkpoint and replays converge. */
  def maintain(vecStream: DataFrame, id: String, vec: String,
               indexPath: String, checkpoint: String,
               cents: Array[(Int, Seq[Double])],
               cb: Array[Array[Seq[Double]]],
               onStats: Option[(Long, Long) => Unit] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(foreachBatchSink(indexPath, id, vec, cents, cb, onStats))

  /** As [[maintain]] with the frozen model reloaded from
    * [[Similarity.saveIvfCentroids]] + [[Similarity.savePqIndex]]'s
    * persisted form — the restart path: a new driver picks up the model
    * and the checkpoint and continues the same index. */
  def maintainFrom(vecStream: DataFrame, id: String, vec: String,
                   modelPath: String, indexPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val spark = vecStream.sparkSession
    maintain(vecStream, id, vec, indexPath, checkpoint,
      Similarity.loadIvfCentroids(spark, modelPath),
      Similarity.loadPqCodebooks(spark, modelPath))
  }
}
