package org.apache.spark.sql.graft

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Aggregate navigation: an optimizer rule that rewrites an aggregate
  * over a 100 TB base table into the same aggregate over a registered,
  * pre-grouped SUMMARY table whenever the query is answerable from it —
  * the classic materialized-view rewrite (Calcite's materialization
  * matching, BigQuery/Redshift MV navigation), Spark-native.
  *
  * Matches `Aggregate(groupings, aggs, [Project]* [Filter]* BaseScan)`
  * where
  *  - every grouping expression is a plain column contained in the
  *    view's grouping keys (a SUBSET regroups the summary — that is the
  *    point of navigation),
  *  - every aggregate is `sum(col)` / `min(col)` / `max(col)` over a
  *    column the view pre-aggregates, or `count(*)`/`count(1)`
  *    (distinct and FILTER forms are never rewritten: not derivable
  *    from a sum-rollup), and
  *  - any `Filter` between the aggregate and the scan references key
  *    columns only (a key predicate commutes with the pre-grouping; a
  *    non-key predicate cannot be answered post-grouping and blocks the
  *    rewrite).
  *
  * The rewrite re-aggregates the summary: `sum(x) → sum(view.sum_x)`,
  * `count(*) → sum(view.cnt)`, `min/max(x) → min/max(view.min_x /
  * view.max_x)` — sound because sums/counts are associative and min/max
  * are idempotent-mergeable. Output attribute ids of the original
  * aggregate are PRESERVED (each output re-aliased under its old
  * exprId), so parent operators are untouched by the swap.
  *
  * Registration contract: the view must be built from the base table
  * with NO row filtering (it partitions the base exactly), and its
  * maintenance is the registrant's job — pair with
  * `Graft.mergeAggStates` (u9), which is precisely the incremental
  * maintenance loop for such summaries. The registry is processed-wide;
  * `register`/`unregister` scope it. Install the rule on an existing
  * session via `spark.experimental.extraOptimizations :+=
  * MatViewRewrite` (the [[PolyHashRewrite]] seam).
  *
  * Scale rationale: the summary is smaller than the base by the group
  * cardinality ratio — at 100 TB a (flag, status) rollup is a few
  * hundred bytes — so a matched dashboard query goes from a full fact
  * scan to a metadata-sized read, with bit-identical results for the
  * integral/decimal aggregates the rule targets.
  */
object MatViewRewrite extends Rule[LogicalPlan] {

  /** A registered summary over the base table whose scan path contains
    * `basePathMarker`: pre-grouped by `keys`; `sumCols`/`minCols`/
    * `maxCols` map a BASE column name to the VIEW column holding its
    * per-group sum/min/max; `countCol` holds count(*) per group.
    * `view` constructs a fresh resolved logical plan of the summary
    * (fresh, so repeated rewrites never share attribute ids). */
  final case class MatView(
      basePathMarker: String,
      keys: Set[String],
      sumCols: Map[String, String],
      countCol: String,
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty,
      view: () => LogicalPlan)

  private val views = new ConcurrentHashMap[String, MatView]()

  def register(name: String, v: MatView): Unit = views.put(name, v)
  def unregister(name: String): Unit = views.remove(name)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (views.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        views.asScala.values.iterator
          .flatMap(v => tryRewrite(agg, v).iterator)
          .nextOption()
          .getOrElse(agg)
    }
  }

  /** Strip [Project of plain attributes]* / [Filter]* down to the base
    * scan, accumulating filter conditions. */
  private def unwrap(p: LogicalPlan, conds: Seq[Expression],
      marker: String): Option[Seq[Expression]] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.exists(_.toString.contains(marker)) =>
        Some(conds)
      case _ => None
    }
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(child, conds, marker)
    case Filter(cond, child) => unwrap(child, conds :+ cond, marker)
    case _ => None
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def tryRewrite(agg: Aggregate, v: MatView): Option[LogicalPlan] = {
    for {
      conds <- unwrap(agg.child, Nil, v.basePathMarker)
      // groupings: plain columns, all inside the view's keys
      groupAttrs <- sequence(agg.groupingExpressions.map {
        case a: AttributeReference if v.keys.contains(a.name) => Some(a)
        case _ => None
      })
      // filters may touch key columns only
      if conds.forall(_.references.forall(r => v.keys.contains(r.name)))
      viewPlan = v.view()
      vattr = viewPlan.output.map(a => a.name -> a).toMap
      if v.keys.forall(vattr.contains) && vattr.contains(v.countCol)
      newAggExprs <- sequence(agg.aggregateExpressions.map(
        rewriteOutput(_, v, vattr)))
    } yield {
      val newChild =
        if (conds.isEmpty) viewPlan
        else Filter(
          conds.reduce(org.apache.spark.sql.catalyst.expressions.And(_, _))
            .transform { case a: AttributeReference => vattr(a.name) },
          viewPlan)
      Aggregate(groupAttrs.map(a => vattr(a.name)), newAggExprs, newChild)
    }
  }

  /** One output expression of the original aggregate → its view form,
    * preserving the output exprId. */
  private def rewriteOutput(ne: NamedExpression, v: MatView,
      vattr: Map[String, Attribute]): Option[NamedExpression] = ne match {
    case a: AttributeReference if v.keys.contains(a.name) =>
      Some(Alias(vattr(a.name), a.name)(exprId = a.exprId))
    case al @ Alias(ae: AggregateExpression, name)
        if !ae.isDistinct && ae.filter.isEmpty =>
      val fn = ae.aggregateFunction match {
        case Sum(a: AttributeReference, _) if v.sumCols.contains(a.name) =>
          Some(Sum(vattr(v.sumCols(a.name))))
        case Count(children) if children.forall(_.isInstanceOf[Literal]) =>
          // count(*) over an EMPTY ungrouped base is 0 while sum is
          // null — coalesce restores the contract (see below)
          Some(Sum(vattr(v.countCol)))
        case Min(a: AttributeReference) if v.minCols.contains(a.name) =>
          Some(Min(vattr(v.minCols(a.name))))
        case Max(a: AttributeReference) if v.maxCols.contains(a.name) =>
          Some(Max(vattr(v.maxCols(a.name))))
        case _ => None
      }
      fn.map { f =>
        val swapped: Expression = ae.aggregateFunction match {
          case _: Count => org.apache.spark.sql.catalyst.expressions.Coalesce(
            Seq(ae.copy(aggregateFunction = f), Literal(0L)))
          case _ => ae.copy(aggregateFunction = f)
        }
        // schema invariance: re-summing a pre-summed DECIMAL widens
        // precision again (sum(DECIMAL(p,s)) → p+10, so the view form
        // yields p+20) — the optimizer contract requires the output
        // type under the preserved exprId to stay EXACTLY the analyzed
        // type, so cast back whenever the swap changed it
        val rewritten =
          if (swapped.dataType == al.dataType) swapped
          else org.apache.spark.sql.catalyst.expressions.Cast(
            swapped, al.dataType)
        Alias(rewritten, name)(exprId = al.exprId)
      }
    case _ => None
  }
}
