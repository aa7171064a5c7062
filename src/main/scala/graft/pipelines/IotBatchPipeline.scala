package graft.pipelines

import graft.operators.Stage
import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's MASTER-DAG cadence as one composable call
  * (reference: dags/iot_master_dag.py — every cycle: trigger extract →
  * trigger stage transform, with the agg DAGs chained downstream;
  * dags/iot_mongo_extract_to_dwh.py + iot_dwh_stage_tranform.py +
  * iot_dwh_agg_transform_daily.py). Airflow's contribution is cadence
  * + blind retries; the engine's contribution is that a cycle is
  * INCREMENTAL and IDEMPOTENT, so any scheduler (cron, a while-loop,
  * Airflow itself) can fire [[runCycle]] repeatedly and crashed or
  * duplicated runs converge to the same warehouse state.
  *
  * One cycle =
  *  1. EXTRACT an incremental slice of the raw landing: cursor ≥ the
  *     stage table's high watermark — the boundary row REPLAYS
  *     (`>=`, the dlt/[[graft.sources.MongoConnectorSource]] `$gte`
  *     contract) and the keyed upsert absorbs it, which is what makes
  *     equal-timestamp ties at the watermark safe.
  *  2. STAGE: type + derive period keys ([[Stage.stageEvents]]) and
  *     MERGE-upsert by `event_id` into the day-partitioned stage table
  *     — only touched partitions are read or rewritten.
  *  3. AGG: [[Warehouse.refreshAggregate]] re-aggregates ONLY the
  *     periods the increment touched, from stage, folding late rows
  *     into their true period.
  *
  * Cost per cycle scales with the increment and its touched periods,
  * never with warehouse history — the property that lets a 15-minute
  * cadence survive a 100 TB table. A cycle with no new data reads two
  * watermarks and writes nothing.
  */
object IotBatchPipeline {

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    hPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hPath)
  }

  /** The stage table's extract cursor: max event `ts` landed so far
    * (the role of macros/get_max_insert_timestamp.sql). None before
    * the first load. */
  def stageWatermark(spark: SparkSession, stagePath: String): Option[Any] =
    if (!tableExists(spark, stagePath)) None
    else Option(spark.read.parquet(stagePath).agg(max(col("ts"))).head().get(0))

  /** One extract → stage → agg cycle over a raw `events`-shaped
    * landing frame. Blindly re-runnable: every step is an idempotent
    * upsert or partition replacement. */
  def runCycle(raw: DataFrame, stagePath: String, aggPath: String): Unit = {
    val spark = raw.sparkSession
    // 1. extract: incremental slice, boundary replayed (>=) — the
    //    keyed stage upsert makes the replay harmless
    val incoming = stageWatermark(spark, stagePath) match {
      case Some(wm) => raw.filter(col("ts") >= lit(wm))
      case None => raw
    }
    // 2. stage: typed projection + keyed merge into day partitions
    val staged = Stage.stageEvents(incoming)
    Warehouse.mergeUpsert(staged, stagePath, partitionCols = Seq("day"),
      key = Seq("event_id"), versionCol = "ts")
    // 3. agg: touched-period-only daily rollup refresh from stage
    Warehouse.refreshAggregate(
      spark.read.parquet(stagePath), aggPath, partitionCols = Seq("day"),
      rawWatermarkCol = "ts", aggWatermarkCol = "last_ts",
      aggregate = slice => slice.groupBy(col("user_id"), col("day"))
        .agg(sum(col("value")).as("value_sum"),
          count(lit(1)).as("n_events"),
          max(col("ts")).as("last_ts")))
  }
}
