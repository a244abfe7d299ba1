package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, CommandResult, GlobalLimit, Join, LeafNode, LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, Window => LWindow}
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec

/** Scale-killer lint over a query's plans — the checks this library's
  * own PlanSpec runs on every registered query, packaged as an
  * operator so a PIPELINE AUTHOR can gate their ad-hoc queries the
  * same way before they reach a 1000-executor cluster: submit-time
  * `lint(df)` in CI is how "no cartesian products" stops being a code
  * review memory and starts being a failing check.
  *
  * Logical-plan checks are exact (node/expression types); the
  * physical pass is a conservative string scan of the executed plan
  * (AQE may still improve it at runtime — the lint reports what the
  * static plan would do). Severity: `error` = almost certainly wrong
  * at scale; `warn` = legitimate only for bounded data — the burden
  * of proof flips to the author.
  */
object PlanLint {

  /** A plan whose STATIC maximum row count is at most this is treated
    * as bounded — joining or sorting it cannot be the scale variable.
    * Catalyst's own `maxRows` derivation is the prover: an ungrouped
    * aggregate is ≤ 1 row, a `limit n` ≤ n, a literal-backed local
    * relation its size, and the bound propagates through narrow ops. */
  private val BoundedRows = 1000L

  private def bounded(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= BoundedRows)

  /** One row per finding: `(severity, finding, detail)`. Empty =
    * clean. */
  def lint(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    // joins judged POST-optimization (a crossJoin+filter(equi) pair is
    // legitimately re-planned as an equi-join); UDF/window judged on
    // the ANALYZED plan — the author's intent, before constant folding
    // can evaluate a UDF away over literal-backed test frames
    val optimized = df.queryExecution.optimizedPlan
    val analyzed = df.queryExecution.analyzed

    optimized.foreach {
      // a condition-less join is only a scale-killer when BOTH sides
      // scale: the library's own 1-row-broadcast idiom (global-agg
      // totals, a single query vector) is a bounded fan-out, not a
      // cartesian blow-up. Two provers: Catalyst's maxRows (ungrouped
      // agg, limit, literal relation), and an explicit broadcast()
      // hint — the author's attestation that the side fits in one
      // executor's memory, which the broadcast machinery ENFORCES at
      // runtime (spark.sql.autoBroadcastJoinThreshold / 8GB hard cap),
      // so an unbounded side fails loudly rather than scaling O(n·m).
      case j: Join if (j.joinType == Cross || j.condition.isEmpty) &&
          !bounded(j.left) && !bounded(j.right) &&
          !j.hint.leftHint.exists(_.strategy.contains(
            org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) &&
          !j.hint.rightHint.exists(_.strategy.contains(
            org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) =>
        out += (("error", "cross_join",
          "join without a condition multiplies row counts — add keys or broadcast a bounded side"))
      case _ => ()
    }
    analyzed.foreach {
      case w: LWindow if w.partitionSpec.isEmpty =>
        out += (("warn", "single_partition_window",
          "window with no PARTITION BY moves every row to one partition — parallelism 1 at any volume"))
      case _ => ()
    }
    if (analyzed.exists(_.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF]))))
      out += (("warn", "scala_udf",
        "ScalaUDF blocks whole-stage codegen and filter pushdown — prefer built-in functions or a native Expression"))

    // physical pass over the pre-adaptive plan tree (AQE may still
    // improve it at runtime — the lint reports the static plan)
    val phys: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    if (phys.exists(_.toString.startsWith("CartesianProduct")))
      out += (("error", "cartesian_product",
        "physical cartesian product — O(n·m) row pairs"))
    // a global SortExec demands range partitioning of its whole input
    // (AQE inserts the actual exchange lazily, so the node — not the
    // exchange — is what the static plan shows). A scale-killer when
    // it sorts the full input stream; legitimate when an aggregation
    // below already reduced the volume to group cardinality (the
    // ubiquitous report-ordering tail). TakeOrderedAndProject
    // (orderBy + limit) never plans one.
    val fullVolumeSort = phys.collect {
      case e: SortExec if e.global => e
    }.exists(e => !e.child.exists(_.isInstanceOf[BaseAggregateExec]))
    if (fullVolumeSort)
      out += (("warn", "global_sort",
        "global ORDER BY range-shuffles the full unaggregated stream — prefer orderBy+limit, a per-key window, or sort after aggregation"))

    out.distinct.sortBy(identity).toSeq
      .toDF("severity", "finding", "detail")
  }

  /** TRUE when collecting this (optimized) plan would pull an
    * UNBOUNDED relation onto the driver — the anti-pattern the house
    * rules call out hardest, now a lintable predicate: some
    * table-backed leaf is reachable from the root without crossing an
    * aggregate, a limit, or a node Catalyst can statically bound
    * (`maxRows`). Driver-side collects are legitimate exactly when
    * the collected set is MODEL-sized (quantizer codebooks, probe
    * plans, bucket meta) — and model-sized plans all pass through an
    * aggregate or a limit on their way down from a scan, so this
    * check separates them from "someone collected the fact table".
    *
    * Local/command leaves are driver-resident already (collecting
    * them moves nothing), so they are safe regardless of size; any
    * other unbounded leaf (file scan, catalog table, cached relation,
    * big Range) flags. PlanSpec runs this over every collect() the
    * registered suite performs, with a commented exemption list —
    * the self-gate that keeps new driver loops out of the engine. */
  def unboundedCollect(plan: LogicalPlan): Boolean = {
    def safe(p: LogicalPlan): Boolean = p match {
      case _ if bounded(p) => true
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
      case _: LocalRelation | _: OneRowRelation | _: CommandResult => true
      // a CACHED relation hides its lineage behind a leaf; look
      // through to the cached PHYSICAL plan — if that aggregates or
      // limits, the cache holds the same bounded result the logical
      // nodes would prove (the persisted k-row model-frame idiom:
      // train → persist → collect). String scan, not tree traversal:
      // AQE wrappers (AdaptiveSparkPlanExec, QueryStageExec) hold
      // their subtrees outside `children`, the same reason lint()'s
      // physical pass scans strings.
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        val cached = imr.cachedPlan.toString
        cached.contains("Aggregate") || cached.contains("Limit") ||
          cached.contains("TakeOrdered")
      case _: LeafNode => false
      case other => other.children.forall(safe)
    }
    !safe(plan)
  }
}
