package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ Expression converters so the
  * graft library can plan its custom Catalyst expressions. Lives in the
  * `org.apache.spark.sql` namespace purely for access; no Spark
  * internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to its catalyst expression. Unlike
    * [[expression]] (a lazy `ColumnNodeExpression` wrapper), the result
    * is a plain catalyst tree — pattern-matchable (e.g. on `SortOrder`)
    * and java-serializable into task closures. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Build a DataFrame from a custom LogicalPlan (runs full analysis). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame's analyzed logical plan. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Rebuild a bare [[org.apache.spark.sql.execution.LogicalRDD]] leaf
    * with its Statistics' `sizeInBytes` capped, PRESERVING the origin's
    * `rowCount`/`attributeStats` (r14 advice — the old rebuild dropped
    * them). Returns None when the plan is not a bare LogicalRDD leaf or
    * is already under the cap.
    *
    * INTERNAL-API TOUCHPOINT (verified against Spark 4.1.x): the
    * `LogicalRDD` private constructor's shape —
    * `(output, rdd, outputPartitioning, outputOrdering, isStreaming,
    * stream)(classic.SparkSession, Option[Statistics],
    * Option[ExpressionSet])` — and the `classic.SparkSession` downcast.
    * A signature change on upgrade breaks COMPILE here (the loud
    * canary); a silent semantics change is caught by PinsSpec's
    * digit-explosion regression test. Kept beside the other
    * private[sql] touchpoints so there is ONE file to audit per
    * upgrade. */
  def withCappedLeafStats(df: org.apache.spark.sql.DataFrame,
                          cap: BigInt): Option[org.apache.spark.sql.DataFrame] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if lr.computeStats().sizeInBytes > cap =>
        val st = lr.computeStats()
        val capped = org.apache.spark.sql.execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = cap,
            rowCount = st.rowCount,
            attributeStats = st.attributeStats)),
          Some(lr.constraints))
        Some(ofRows(df.sparkSession, capped))
      case _ => None
    }

  /** Register a function builder on an EXISTING session's registry —
    * the in-session equivalent of `SparkSessionExtensions.injectFunction`
    * (which only applies at session build time via spark.sql.extensions). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")

  /** Register a TABLE-function builder (`Seq[Expression] => LogicalPlan`)
    * on an existing session — the in-session equivalent of
    * `SparkSessionExtensions.injectTableFunction`. */
  def registerTableFunction(
      spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
}
