package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Array-column operators.
  *
  * The reference leans on Postgres array features: `ARRAY_AGG(devices)`
  * (reference: dags/dbt_project/models/stage/users.sql:17) and
  * array-containment joins `fact.device_id = ANY(users.devices)`
  * (reference: dags/dbt_project/models/examples/
  * daily_user_steps_for_last_month.sql:15).
  *
  * Spark-first: containment is NOT an `array_contains` theta-join (that
  * plans as BroadcastNestedLoop — quadratic); the dimension's array is
  * exploded once and the join becomes a hash equi-join on the element.
  * Cost is linear in total array elements and the join shuffles/
  * broadcasts like any equi-join, so it survives 100 TB facts.
  */
object ArrayOps {

  /** Equi-join `fact(factKey) = ANY(dim(arrayCol))`, keeping all fact
    * columns + `dimCols` from the dimension. */
  def containmentJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                      arrayCol: String, dimCols: Seq[String]): DataFrame = {
    val exploded = dim
      .select((dimCols.map(col) :+ explode(col(arrayCol)).as("__elem")): _*)
      .dropDuplicates(dimCols :+ "__elem") // ANY() semantics: membership, not multiplicity
    fact.join(exploded, fact(factKey) === exploded("__elem"), "inner").drop("__elem")
  }

  /** Deterministic ARRAY_AGG: collect distinct values, sorted, per group. */
  def arrayAggDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       as: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_set(col(valueCol))).as(as))
}
