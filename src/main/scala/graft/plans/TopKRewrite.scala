package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the ubiquitous top-k-per-group idiom
  *
  * {{{ df.withColumn("rk", row_number().over(partitionBy(ks).orderBy(os)))
  *      .filter($"rk" <= k) }}}
  *
  * into the [[TopKPerKey]] operator (bounded per-key heaps, map-side
  * partial cap, no group sort) — so EXISTING window-spelled queries get
  * the better physical shape without being rewritten by hand.
  *
  * Correctness envelope, deliberately narrow:
  *  - the Window node computes exactly ONE expression and it is
  *    `row_number()`, `rank()` or `dense_rank()` — the tied functions
  *    plan the ties-aware [[TopKMode]] (k-capped GROUP trees, all tied
  *    rows kept, exact rank values);
  *  - the filter bounds that rank above by an integer literal
  *    (`<= k`, `< k`, `= k`); the ORIGINAL filter is kept on top of the
  *    replacement, so mixed predicates and the `= k` case stay exact —
  *    TopKPerKey(k) produces a superset (ranks 1..k) and the residual
  *    filter trims it;
  *  - the rank attribute keeps its exprId, so downstream references
  *    resolve unchanged.
  *
  * Gated behind `spark.graft.rewriteTopK` (default off): plan rewrites
  * that silently change executed operators should be an explicit
  * opt-in, and the flag documents intent at the call site.
  */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val FlagKey = "spark.graft.rewriteTopK"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FlagKey, "false").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) =>
        rewrite(cond, w, identity).getOrElse(f)
      case f @ Filter(cond, Project(projList, w: Window))
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(cond, w, tk => Project(projList, tk)).getOrElse(f)
    }

  private def modeOf(wf: Expression): Option[TopKMode] = wf match {
    case RowNumber() => Some(TopKMode.RowNum)
    case _: Rank => Some(TopKMode.Ranked)
    case _: DenseRank => Some(TopKMode.Dense)
    case _ => None
  }

  private def rewrite(cond: Expression, w: Window,
                      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    w match {
      case Window(Seq(a @ Alias(WindowExpression(wf,
          WindowSpecDefinition(_, _, _)), _)), partitionSpec, orderSpec, child, _)
          if modeOf(wf).nonEmpty =>
        val mode = modeOf(wf).get
        val rank = a.toAttribute.asInstanceOf[AttributeReference]
        val bounds = splitConjunctivePredicates(cond).collect {
          case LessThanOrEqual(r: AttributeReference, Literal(v: Int, IntegerType))
              if r.exprId == rank.exprId => v
          case LessThan(r: AttributeReference, Literal(v: Int, IntegerType))
              if r.exprId == rank.exprId => v - 1
          case EqualTo(r: AttributeReference, Literal(v: Int, IntegerType))
              if r.exprId == rank.exprId => v
          case GreaterThanOrEqual(Literal(v: Int, IntegerType), r: AttributeReference)
              if r.exprId == rank.exprId => v
        }
        if (bounds.isEmpty || bounds.min < 1) None
        else {
          // Spark's InferWindowGroupLimit may already have inserted its
          // sort-based partial/final limit below the Window — strip it,
          // TopKPerKey subsumes it (heaps instead of sorts)
          val input = child match {
            case wgl: WindowGroupLimit => wgl.child
            case other => other
          }
          Some(Filter(cond,
            wrap(TopKPerKey(partitionSpec, orderSpec, bounds.min, rank, input, mode))))
        }
      case _ => None
    }

  /** Test/REPL path; `spark.sql.extensions=graft.GraftExtensions` covers
    * cluster deployment. */
  def ensureRegistered(spark: SparkSession): Unit = {
    GraftStrategy.ensureRegistered(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
    }
  }
}
