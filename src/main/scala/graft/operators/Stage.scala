package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Raw→stage normalization: the reference's dbt `stage` layer
  * (reference: dags/dbt_project/models/stage/heart_rates.sql — epoch →
  * timestamp, derived `YYYYMM`/`YYYYMMDD` keys, typed metric columns)
  * re-expressed as a single declarative projection so column pruning and
  * filter pushdown reach the parquet scan.
  */
object Stage {

  /** Stage transform over the raw `events` stream: derive period keys and
    * extract the typed payload field from the JSON document column —
    * the Spark analog of dlt's schema'd load + dbt stage typing. */
  def stageEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      col("ts"),
      TimeAgg.dayKey(col("ts")).as("day"),
      TimeAgg.monthKey(col("ts")).as("month"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("prop_k"))

  /** Users dimension with an ARRAY_AGG of the entity's devices —
    * reference stage/users.sql. The device set is derived from the event
    * stream (collect_set per user), the dimension attributes from
    * `customer`. The dim side is small relative to facts; Catalyst
    * broadcasts it in downstream joins. */
  def stageUsers(customer: DataFrame, events: DataFrame): DataFrame = {
    val devices = ArrayOps.arrayAggDistinct(events, Seq("user_id"), "event_type", "devices")
    customer.join(devices, customer("c_custkey") === devices("user_id"), "inner")
      .select(col("user_id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment").as("mktsegment"),
        col("devices"))
  }
}
