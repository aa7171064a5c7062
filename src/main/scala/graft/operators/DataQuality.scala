package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks — the dbt schema-test surface (`unique`,
  * `not_null`, `accepted_values`, `relationships`; dbt reserves
  * `tests/` for them in the reference: dags/dbt_project/dbt_project.yml
  * `test-paths`) re-expressed as declarative aggregations that emit one
  * row per check: `(check_name, n_violations, passed)`.
  *
  * Scale shape: every column-local check (`not_null`,
  * `accepted_values`) on the same table is fused into ONE scan — a
  * single conditional-sum aggregate, no shuffle beyond the final
  * single-row reduction. `unique` needs its own grouped pass (count>1
  * per key), and `relationships` is an anti join that broadcasts the
  * parent's key column when the parent is dimension-sized. Violations
  * are COUNTED, never collected: the report is O(#checks) rows
  * regardless of input size.
  */
object DataQuality {

  /** One row per column: rows where the column is null. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    columnChecks(df, cols.map(c => (s"not_null_$c", col(c).isNull)))

  /** One row per (name, violationPredicate) — all predicates evaluated
    * in a single scan. */
  def columnChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val sums = checks.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(name)
    }
    val one = df.agg(sums.head, sums.tail: _*)
    val stacked = explode(array(checks.map { case (name, _) =>
      struct(lit(name).as("check_name"), col(name).as("n_violations"))
    }: _*))
    one.select(stacked.as("c")).select(col("c.check_name"),
      col("c.n_violations"), (col("c.n_violations") === 0).as("passed"))
  }

  /** Rows whose column value is outside `allowed` (nulls are the
    * not_null test's business, dbt semantics). */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    columnChecks(df,
      Seq((s"accepted_values_$c", col(c).isNotNull && !col(c).isin(allowed: _*))))

  /** dbt `unique`: number of key values that occur more than once. */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame = {
    val name = s"unique_${keys.mkString("_")}"
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0).as("passed"))
  }

  /** dbt `relationships`: child rows whose key has no parent. The
    * parent side is reduced to its distinct key column before the
    * broadcast — never the full dimension row. */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    child.filter(col(childKey).isNotNull)
      .join(broadcast(p), col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"relationships_$childKey").as("check_name"),
        col("n_violations"), (col("n_violations") === 0).as("passed"))
  }

  /** Union a report out of individual checks. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))
}
