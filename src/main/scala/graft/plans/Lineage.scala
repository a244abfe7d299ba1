package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage from the ANALYZED Catalyst plan — the
  * governance question "which source columns can influence this
  * output column?" answered by walking attribute references from the
  * plan's output down to its scan leaves. This is what a 100 TB
  * platform wires into its catalog: PII tracking (does anything
  * derived from `text` reach an exported table?), impact analysis
  * (which reports break if `l_discount` changes semantics), and
  * audit — all without executing the query, because the analyzed plan
  * IS the dependency graph.
  *
  * Coverage: projections, aggregates, windows, joins, filters,
  * generators (explode), unions (positional merge), and any other
  * node whose outputs pass through by `ExprId`. The result is the
  * REFERENCE closure — a conservative over-approximation (a CASE
  * branch that can never fire still contributes its references),
  * which is the correct polarity for governance: lineage may name an
  * extra source, never miss one.
  */
object Lineage {

  /** One row per (output column, source) pair:
    * `(column, source_table, source_column)`, ordered. Source tables
    * are named by the scan's root path basename (`….../lineitem
    * .parquet` → `lineitem`); in-memory relations report `local`. */
  def columnLineage(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val plan = df.queryExecution.analyzed
    val m = sourcesOf(plan)
    plan.output.flatMap(a => m.getOrElse(a.exprId, Set.empty)
        .map { case (t, c) => (a.name, t, c) })
      .distinct.sortBy(identity)
      .toDF("column", "source_table", "source_column")
  }

  private def tableNameOf(rel: LogicalRelation): String = rel.relation match {
    case fs: HadoopFsRelation =>
      rel.catalogTable.map(_.identifier.table).getOrElse {
        val base = fs.location.rootPaths.headOption
          .map(_.getName).getOrElse("unknown")
        base.replaceAll("\\.(parquet|orc|csv|json)$", "")
      }
    case _ => rel.catalogTable.map(_.identifier.table).getOrElse("relation")
  }

  /** Bottom-up map: every attribute id in scope → the set of
    * (table, column) scan leaves that can influence it. */
  private def sourcesOf(plan: LogicalPlan)
      : Map[ExprId, Set[(String, String)]] = plan match {
    case r: LogicalRelation =>
      val t = tableNameOf(r)
      r.output.map(a => a.exprId -> Set(t -> a.name)).toMap
    case l: LeafNode =>
      l.output.map(a => a.exprId -> Set("local" -> a.name)).toMap
    case u: Union =>
      // positional: output column i derives from every child's column i
      val childMaps = u.children.map(sourcesOf)
      u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId, Set.empty)
        }.toSet
      }.toMap
    case p =>
      val fromChildren =
        p.children.map(sourcesOf).foldLeft(
          Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
      def resolve(ne: NamedExpression): (ExprId, Set[(String, String)]) =
        ne match {
          case a: Attribute => a.exprId -> fromChildren.getOrElse(a.exprId, Set.empty)
          case al: Alias => al.exprId ->
            al.child.references.toSeq.flatMap(r =>
              fromChildren.getOrElse(r.exprId, Set.empty)).toSet
          case other => other.exprId ->
            other.references.toSeq.flatMap(r =>
              fromChildren.getOrElse(r.exprId, Set.empty)).toSet
        }
      val introduced: Map[ExprId, Set[(String, String)]] = p match {
        case Project(list, _) => list.map(resolve).toMap
        case Aggregate(_, aggs, _, _) => aggs.map(resolve).toMap
        case w: Window => w.windowExpressions.map(resolve).toMap
        case g: Generate =>
          val gsrc = g.generator.references.toSeq
            .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty)).toSet
          g.generatorOutput.map(a => a.exprId -> gsrc).toMap
        case _ => Map.empty
      }
      fromChildren ++ introduced
  }
}
