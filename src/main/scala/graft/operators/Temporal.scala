package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators Spark lacks as built-ins — the two named in
  * the build brief as candidate custom operators (as-of join, range
  * join) — implemented as compositions of existing operators (the
  * preferred path: no custom SparkPlan needed, the composed plan is
  * already the scalable one).
  *
  * Scale design:
  *  - AS-OF: the naive formulation is a range theta-join (each probe
  *    row matches the max build ts ≤ its ts) which Spark plans as a
  *    BroadcastNestedLoopJoin + per-key max — O(probe × build) work.
  *    The scalable form used here UNIONs both sides tagged, windows by
  *    key ordered by (ts, side), and fill-forwards the build value:
  *    ONE shuffle on the join key, linear work, no nested loop. This is
  *    the pattern a 100 TB tick-data join needs (build rows sort before
  *    probe rows at equal ts, so "at or before" semantics are exact).
  *  - RANGE: events × variable-length windows on ts ∈ [start, end).
  *    The naive plan is again a nested loop. Here every interval
  *    explodes into the fixed-grain cells it covers (6 h), probes join
  *    their single cell by equality, and the residual predicate
  *    refines exact bounds: an equi-join shuffle whose fan-out is
  *    bounded by interval-length/grain — each (event, window) pair
  *    arises from exactly one cell, so no dedup pass is needed.
  */
object Temporal {
  type Q = (SparkSession, String) => DataFrame

  // ---- fixture dimension tables (deterministic, oracle-twinned) ----

  // 2024-01-01T00:00:00Z
  private val BaseEpoch = 1704067200L
  private val EventTypes = Seq("click", "signup", "error", "view", "purchase")

  /** Daily per-type rates over the events month. Rate values are exact
    * binary fractions (quarters + eighths), so double arithmetic is
    * bit-identical across engines. */
  private def rates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    EventTypes.toDF("event_type")
      .select(col("event_type"), explode(expr("sequence(0, 29)")).as("k"))
      .select(col("event_type"),
        expr(s"timestamp_seconds($BaseEpoch + k * 86400)").as("valid_from"),
        (lit(1.0) + (col("k") % 7) * lit(0.25)
          + length(col("event_type")) * lit(0.125)).as("rate"))
  }

  private val duckRatesCte =
    """rates AS (
      |  SELECT event_type,
      |         TIMESTAMP '2024-01-01' + k * INTERVAL 1 DAY AS valid_from,
      |         1.0::DOUBLE + (k % 7)::DOUBLE * 0.25 + length(event_type)::DOUBLE * 0.125 AS rate
      |  FROM (SELECT unnest(['click', 'signup', 'error', 'view', 'purchase']) AS event_type)
      |  CROSS JOIN (SELECT unnest(range(0, 30)) AS k))""".stripMargin

  /** Generic as-of join (LEFT semantics): for every probe row, the
    * build row with the greatest `ts` ≤ the probe's `ts`, per key —
    * via tagged union + per-key window fill-forward (one shuffle, no
    * nested loop). Probe rows with no build row at-or-before keep a
    * null value. `build` must carry (key, ts, value); `probe`
    * (key, ts, rest...).
    *
    * Build values ride in a NON-NULL struct carrier so a genuinely
    * null build value still registers as "a build row happened here"
    * in the ignoreNulls fill-forward (instead of silently falling
    * through to an older value).
    *
    * Duplicate (key, ts) build rows: when the value type is orderable
    * the carrier joins the sort key, so the greatest value wins
    * deterministically; for unorderable value types (maps) the
    * tie-break falls back to a monotonic row id, which makes map-typed
    * values WORK instead of failing with an opaque AnalysisException
    * (ADVICE r3) — but note that id is PARTITION order, so which
    * duplicate wins is stable within a run, not across different
    * partitionings of `build`. Callers needing cross-run determinism
    * for unorderable values should pre-dedup (key, ts) on the build
    * side. Internal working columns are uniquified against both
    * frames' columns, so callers may freely use names like `__side`. */
  def asofJoin(probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val probeCols = probe.columns
    val taken = (probeCols ++ build.columns).toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i").filterNot(taken).next()
    val carrierC = fresh("__graft_asof_carrier")
    val sideC = fresh("__graft_asof_side")
    val seqC = fresh("__graft_asof_seq")
    val filledC = fresh("__graft_asof_filled")
    val vType = build.schema(valueCol).dataType
    val orderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(vType)
    val carrierType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", vType)))
    val p = probe
      .withColumn(carrierC, lit(null).cast(carrierType))
      .withColumn(sideC, lit(1))
      .withColumn(seqC, lit(0L))
    val b = build.select(
      probeCols.map(c =>
        if (c == keyCol || c == tsCol) col(c) else lit(null).cast(probe.schema(c).dataType).as(c))
        :+ struct(col(valueCol).as("v")).as(carrierC) :+ lit(0).as(sideC)
        :+ monotonically_increasing_id().as(seqC): _*)
    val tie = if (orderable) col(carrierC) else col(seqC)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(sideC), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b)
      .withColumn(filledC, last(col(carrierC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .select(probeCols.map(col) :+ col(filledC).getField("v").as(valueCol): _*)
  }

  /** Events enriched with the latest rate at or before each event. */
  private def j6AsofJoin: Q = (s, dir) =>
    asofJoin(
      Tables.events(s, dir).select(col("event_id"), col("event_type"), col("ts")),
      rates(s, dir).withColumnRenamed("valid_from", "ts"),
      "event_type", "ts", "rate")
      .select(col("event_id"), col("event_type"), col("rate"))

  // ASOF LEFT (not inner): asofJoin keeps unmatched probe rows with a
  // null value — the fixture has none (rates start at the events epoch)
  // but the oracle must share the semantics, not rely on the fixture.
  private val j6AsofJoinSql =
    s"""WITH $duckRatesCte
       |SELECT e.event_id, e.event_type, r.rate
       |FROM events e
       |ASOF LEFT JOIN rates r
       |  ON e.event_type = r.event_type AND e.ts >= r.valid_from""".stripMargin

  // ---- range join ----

  private val GrainSec = 21600L // 6 h cells

  /** Variable-length analysis windows (12 h cadence, 6–42 h long, so
    * windows overlap and events match several). */
  private def windows(s: SparkSession, dir: String): DataFrame =
    s.range(60).toDF("window_id")
      .select(col("window_id"),
        expr(s"timestamp_seconds($BaseEpoch + window_id * 43200)").as("ws"),
        expr(s"timestamp_seconds($BaseEpoch + window_id * 43200 + (21600 + (window_id % 4) * 43200))").as("we"))

  private val duckWindowsCte =
    """windows AS (
      |  SELECT k AS window_id,
      |         TIMESTAMP '2024-01-01' + k * INTERVAL 12 HOUR AS ws,
      |         TIMESTAMP '2024-01-01' + k * INTERVAL 12 HOUR
      |           + INTERVAL 6 HOUR + (k % 4) * INTERVAL 12 HOUR AS we
      |  FROM (SELECT unnest(range(0, 60)) AS k))""".stripMargin

  /** Events × windows on ts ∈ [ws, we): intervals explode to 6 h grain
    * cells, events join their single cell by equality, exact bounds
    * refine — the standard scalable range join. */
  private def j7RangeJoin: Q = (s, dir) => {
    val w = windows(s, dir)
      .select(col("window_id"), col("ws"), col("we"),
        explode(expr(
          s"sequence(floor(unix_timestamp(ws) / $GrainSec), floor((unix_timestamp(we) - 1) / $GrainSec))"))
          .as("cell"))
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("ts"),
        expr(s"floor(unix_timestamp(ts) / $GrainSec)").as("cell"))
    e.join(w, "cell")
      .filter(col("ts") >= col("ws") && col("ts") < col("we"))
      .select(col("event_id"), col("window_id"))
  }

  private val j7RangeJoinSql =
    s"""WITH $duckWindowsCte
       |SELECT e.event_id, w.window_id
       |FROM events e JOIN windows w
       |  ON e.ts >= w.ws AND e.ts < w.we""".stripMargin

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "j6_asof_join" -> j6AsofJoin,
    "j7_range_join" -> j7RangeJoin)

  val oracles: Map[String, String] = Map(
    "j6_asof_join" -> j6AsofJoinSql,
    "j7_range_join" -> j7RangeJoinSql)
}
