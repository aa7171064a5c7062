package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the engine's input tables (parquet, one file per table).
  *
  * Mirrors the reference's source layer (MongoDB collections landed as
  * raw tables — see /root/reference/dags/dlt_sources/mongodb/helpers.py)
  * re-expressed as Spark parquet scans so Catalyst gets pushdown/pruning.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Read micros-no-tz parquet timestamps as TIMESTAMP (not NTZ) for
    // EVERY table, set here at the one chokepoint all loaders share:
    // were it set only in events(), the other tables' timestamp
    // columns would load as NTZ or TIMESTAMP depending on whether
    // events loaded first in the session — an order-dependent schema,
    // and NTZ-vs-TIMESTAMP comparisons across tables would break.
    // Lossless under the pinned UTC session timezone.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` arrives either as parquet TIMESTAMP(MICROS) (read
    * natively) or TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; for the latter, read nanos as long and floor-convert to µs
    * (exactly what engines with µs-precision timestamps do on NANOS
    * input). Integer `div` — a double division would lose precision
    * above 2^53. Schema-adaptive so the loader survives upstream
    * precision changes without a code edit. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // [[load]] turns off NTZ inference, so the scan itself produces
    // TimestampType (no post-scan cast sitting between the reader and
    // downstream ts predicates — C3/C4-style incremental filters keep
    // reaching PushedFilters).
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        // TIMESTAMP_NTZ (parquet micros without isAdjustedToUTC): the
        // session timezone is pinned to UTC, so this cast is lossless
        // and keeps every downstream unix_micros/window call typed.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
