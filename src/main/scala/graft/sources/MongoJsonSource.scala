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
    * Mongo collections (multiline JSON arrays, as in mongo-init.js).
    * Against a LIVE MongoDB, use [[MongoConnectorSource]] instead — it
    * compiles the reference's incremental-cursor contract to a
    * server-side aggregation pipeline for the Spark Mongo connector;
    * everything downstream of either source is identical. */
  def readDocuments(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(path)

  /** dlt-style SCHEMA EVOLUTION on ingest: read successive landing
    * loads whose document shapes may have drifted — dlt infers the
    * schema per load and EVOLVES the destination (new fields appear as
    * new nullable columns on later runs; reference:
    * dags/dlt_sources/mongodb/helpers.py — dlt normalize/schema
    * contract), where [[readDocuments]] pins one fixed StructType.
    *
    * Each load is schema-inferred independently, then merged by COLUMN
    * NAME with missing columns null-padded (`unionByName(
    * allowMissingColumns)`), so a field added in load N reads as null
    * for loads < N and stage projections over the superset schema keep
    * working. Compatible type drift (int → long → double) coerces via
    * Spark's union rules; incompatible drift (int → string) fails
    * loudly rather than corrupting — the dlt variant-column behavior is
    * a policy decision left to the caller. Parquet landings get the
    * same contract natively via `spark.read.option("mergeSchema",
    * true)`. */
  def readDocumentsEvolving(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no loads")
    paths.map(p => spark.read.option("multiLine", true).json(p))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

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

  /** Full dlt-style normalization at ARBITRARY nesting depth: every
    * array-of-struct column, wherever it appears, becomes a child table
    * named `parent__column` (dlt's naming), holding `(_parent_id, pos,
    * row_id, element fields)`; arrays nested inside those elements
    * recurse into grandchild tables, and so on — the contract of dlt's
    * normalize step, which walks nested containers at any depth
    * (reference: dags/dlt_sources/mongodb/helpers.py + dlt normalize;
    * `_dlt_parent_id`/`_dlt_list_idx`/`_dlt_id` become
    * `_parent_id`/`pos`/`row_id`).
    *
    * Ids are deterministic md5s of `(parent id | column | position)` —
    * idempotent re-runs land identical rows, lineage is re-derivable,
    * and no driver-side sequencing caps scale. Each child table is one
    * `posexplode` projection off its parent's frame: the whole tree is
    * linear in total array elements, shuffle-free, and each table's
    * plan prunes to exactly the columns that level needs. */
  def normalizeRecursive(docs: DataFrame, rootName: String,
                         idCol: String): Map[String, DataFrame] = {
    def isNestedArray(f: StructField): Boolean = f.dataType match {
      case ArrayType(_: StructType, _) => true
      case _ => false
    }
    def walk(tbl: DataFrame, name: String, id: String): Map[String, DataFrame] = {
      val (nested, flat) = tbl.schema.fields.partition(isNestedArray)
      val parent = tbl.select(flat.map(f => col(f.name)).toSeq: _*)
      val children = nested.flatMap { f =>
        val elem = f.dataType.asInstanceOf[ArrayType]
          .elementType.asInstanceOf[StructType]
        val child = tbl
          .select(col(id).as("_parent_id"),
            posexplode(col(f.name)).as(Seq("pos", "__m")))
          .withColumn("row_id", md5(concat_ws("|",
            col("_parent_id"), lit(f.name), col("pos").cast(StringType))))
          .select(col("_parent_id") +: col("pos") +: col("row_id") +:
            elem.fields.map(ef => col(s"__m.${ef.name}")).toSeq: _*)
        walk(child, s"${name}__${f.name}", "row_id")
      }
      Map(name -> parent) ++ children
    }
    walk(docs, rootName, idCol)
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
