package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-document ingestion + dlt-style child-table normalization.
  *
  * The reference stores IoT metrics in MongoDB as time-bucketed documents
  * `{device_id, created_at, ended_at, metrics: [{ts, bpm, ...}, ...]}`
  * (reference: shared/mongodb/initdb.d/data/sleeps.json,
  * generator.py:12 — 4h buckets), and dlt normalizes each document into a
  * parent row plus a `<table>__metrics` child table linked by synthetic
  * ids `_dlt_id`/`_dlt_parent_id` (reference:
  * dags/dbt_project/models/stage/heart_rates.sql:16-22).
  *
  * Spark-first: documents are just rows with an array-of-struct column;
  * packing is a grouped `array_sort(collect_list(struct))`, and
  * normalization is `posexplode` — both single-shuffle, codegen'd, and
  * the synthetic ids are deterministic md5s so re-runs are idempotent
  * (no driver-side id sequencing, which would not scale).
  */
object MongoJsonSource {

  /** Read a directory/file of JSON documents shaped like the reference's
    * Mongo collections (multiline JSON arrays, as in mongo-init.js). */
  def readDocuments(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(path)

  /** Pack a flat metric stream into time-bucketed documents: one row per
    * (entity, bucket) with a sorted `metrics` array-of-struct and a
    * deterministic document id. Mirrors generator.py's 4h bucketing. */
  def packDocuments(flat: DataFrame, entity: String, ts: String,
                    bucketSeconds: Long, metricCols: Seq[String]): DataFrame = {
    import graft.operators.TimeAgg
    val bucket = TimeAgg.timeBucket(col(ts), bucketSeconds)
    flat
      .withColumn("__bucket", bucket)
      .groupBy(col(entity), col("__bucket").as("created_at"))
      .agg(array_sort(collect_list(struct((ts +: metricCols).map(col): _*))).as("metrics"))
      .withColumn("doc_id", md5(concat_ws("|", col(entity), col("created_at").cast(StringType))))
  }

  /** dlt-style normalization: explode the nested array into a child table
    * with (parent doc_id, pos, metric fields). Deterministic child ids. */
  def normalize(docs: DataFrame, parentCols: Seq[String]): DataFrame =
    docs
      .select((parentCols.map(col) :+ col("doc_id") :+
        posexplode(col("metrics")).as(Seq("pos", "m"))): _*)
      .withColumn("row_id", md5(concat_ws("|", col("doc_id"), col("pos").cast(StringType))))
      .select((parentCols.map(col) :+ col("doc_id") :+ col("pos") :+
        col("row_id") :+ col("m.*")): _*)
}
