package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}

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
      case j: Join if j.joinType == Cross || j.condition.isEmpty =>
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

    val phys = df.queryExecution.executedPlan.toString
    if (phys.contains("CartesianProduct"))
      out += (("error", "cartesian_product",
        "physical cartesian product — O(n·m) row pairs"))
    // a physical range-exchange is a GLOBAL sort of the full stream;
    // TakeOrderedAndProject (orderBy + limit) never plans one
    if (phys.contains("Exchange rangepartitioning"))
      out += (("warn", "global_sort",
        "global ORDER BY range-shuffles the whole dataset — fine for small results, a scale-killer on full volume; prefer orderBy+limit or a per-key window"))

    out.distinct.sortBy(identity).toSeq
      .toDF("severity", "finding", "detail")
  }
}
