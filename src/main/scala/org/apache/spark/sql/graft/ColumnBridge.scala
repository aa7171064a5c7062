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

  /** Rebuild a checkpoint's [[org.apache.spark.sql.execution.LogicalRDD]]
    * leaf carrying the ORIGIN's executed output layout (partitioning +
    * per-partition ordering) and capped stats — r16 optimization lead.
    *
    * Why: `Dataset.localCheckpoint` preserves the physical layout of
    * the data (the checkpointed RDD maps the executed plan's partitions
    * 1:1 via `map(_.copy())`), and `LogicalRDD.fromDataset` TRIES to
    * carry the plan-level layout metadata over — but under AQE the
    * executed plan is an `AdaptiveSparkPlanExec`, which does not
    * override `outputPartitioning`/`outputOrdering`, so the leaf lands
    * with `UnknownPartitioning` and every downstream join/aggregation
    * re-exchanges (and re-sorts) data that is already laid out — one
    * full edge-table Exchange per iteration in the iterative graph
    * operators (measured: the l4 per-segment plans re-shuffle the
    * pinned edge frame each pin segment). This unwraps the final AQE
    * plan (`isFinalPlan` is guaranteed — pins are eager, the checkpoint
    * already executed), rewrites the layout expressions onto the new
    * leaf's attributes positionally (exec output and leaf output are
    * the same schema by construction), and rebuilds the leaf. The
    * declared layout is exactly the executed plan's own contract for
    * the RDD it produced — never an assumption.
    *
    * Only attribute references are rewritten; a layout whose
    * expressions reference anything outside the output (should not
    * happen for a root plan) falls back to the undeclared form. Same
    * INTERNAL-API TOUCHPOINT caveat as [[withCappedLeafStats]]. */
  def withPreservedLayout(pinned: org.apache.spark.sql.DataFrame,
                          origin: org.apache.spark.sql.DataFrame,
                          cap: BigInt,
                          sizeOverride: Option[BigInt] = None)
      : Option[org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
    import org.apache.spark.sql.catalyst.plans.physical.{
      HashPartitioning, Partitioning, PartitioningCollection, RangePartitioning}
    val lr = pinned.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
      case _ => return None
    }
    val exec = origin.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
          if a.isFinalPlan => a.executedPlan
      case p => p
    }
    if (exec.output.size != lr.output.size) return None
    val assoc: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Attribute] =
      exec.output.zip(lr.output).map { case (a, b) => a.exprId -> b }.toMap
    def rewritable(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.references.forall(r => assoc.contains(r.exprId))
    def rewrite[E <: org.apache.spark.sql.catalyst.expressions.Expression](e: E): E =
      e.transformUp { case a: Attribute => assoc(a.exprId) }.asInstanceOf[E]
    // keep the partitioning SHAPE (hash / range / collection) and only
    // remap attribute ids; anything else (SinglePartition, Unknown,
    // coalesced AQE reads, datasource partitionings) declares nothing —
    // correctness never depends on this, it only removes exchanges
    def rewritePartitioning(p: Partitioning): Option[Partitioning] = p match {
      case h: HashPartitioning if rewritable(h) => Some(rewrite(h))
      case c: org.apache.spark.sql.catalyst.plans.physical.CoalescedHashPartitioning
          if rewritable(c.from) =>
        // AQE-coalesced repartition(col): contiguous hash buckets were
        // merged — still hash-clustered on the same keys, and the
        // boundary list is what downstream co-partitioning checks use
        Some(c.copy(from = rewrite(c.from)))
      case r: RangePartitioning if r.ordering.forall(rewritable) =>
        Some(RangePartitioning(r.ordering.map(rewrite(_)), r.numPartitions))
      case pc: PartitioningCollection =>
        val kept = pc.partitionings.flatMap(rewritePartitioning)
        if (kept.nonEmpty) Some(if (kept.size == 1) kept.head
                                else PartitioningCollection(kept))
        else None
      case _ => None
    }
    val newPart = rewritePartitioning(exec.outputPartitioning)
    val keepOrdering = !pinned.sparkSession.conf
      .getOption("spark.graft.pins.preserveOrdering").contains("false")
    val newOrder: Seq[SortOrder] =
      if (keepOrdering && exec.outputOrdering.forall(rewritable))
        exec.outputOrdering.map(rewrite(_))
      else Seq.empty
    val st = lr.computeStats()
    // Prefer the MEASURED size of the materialized blocks over the
    // origin plan's estimate: Catalyst's size-only visitor multiplies
    // join children, so a derived frame's estimate inflates per round
    // (the digit-explosion pathology the cap bounds) and a genuinely
    // node-sized rank frame looks too big to broadcast — the static
    // planner then picks SortMergeJoin where a broadcast/hash probe is
    // strictly better, and a zero-exchange plan has no shuffle stages
    // for AQE to re-optimize at runtime. The blocks were just written,
    // the size is the truth.
    val size = sizeOverride.getOrElse(st.sizeInBytes).min(cap)
    if (newPart.isEmpty && newOrder.isEmpty && size == st.sizeInBytes)
      return None // nothing to change
    val rebuilt = org.apache.spark.sql.execution.LogicalRDD(
      lr.output, lr.rdd,
      newPart.getOrElse(lr.outputPartitioning),
      if (newOrder.nonEmpty) newOrder else lr.outputOrdering,
      lr.isStreaming, lr.stream)(
      pinned.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = size,
        rowCount = st.rowCount,
        attributeStats = st.attributeStats)),
      Some(lr.constraints))
    Some(ofRows(pinned.sparkSession, rebuilt))
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
