package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality operators for a production pipeline's ingest gate:
  * one-pass column profiling and declarative expectation checks (the
  * Great-Expectations / dbt-test shape, Spark-native). A 100 TB
  * ingest runs exactly these two queries before anything else touches
  * the data — both are single-scan shapes with tiny outputs.
  *
  * Scale notes: [[profile]] is ONE aggregate job; the exact distinct
  * counts expand the input k-fold for k profiled columns (Spark's
  * multi-distinct Expand), which is the honest price of exact
  * profiles — the approx variant (`approx_count_distinct`, no
  * expand) is the 100 TB default and both are exposed. Expectations
  * are conditional aggregations over one scan per table plus one
  * anti-join for referential integrity — no shuffle except the
  * integrity join's, which AQE plans as broadcast when the key side
  * is small.
  */
object Quality {
  type Q = (SparkSession, String) => DataFrame

  /** One-pass profile of `df`: per column `(column, n_rows, n_nulls,
    * n_distinct, min_repr, max_repr)`. `exact` trades the Expand-based
    * exact distinct for HLL estimates. Representations are string
    * casts so one schema carries any column type. */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    // backtick every name reference: a column like "user.id" (common
    // in flattened/imported schemas) would otherwise parse as a
    // struct-field path — both at the source read and at the
    // generated cnt_/nd_ alias reads below
    def bt(c: String): Column = col(s"`$c`")
    if (exact) return profileExact(df, cols, bt)
    def distinctOf(c: String): Column = approx_count_distinct(bt(c))
    val aggs = cols.flatMap { c =>
      Seq(count(bt(c)).as(s"cnt_$c"), distinctOf(c).as(s"nd_$c"),
        min(bt(c)).cast("string").as(s"mn_$c"),
        max(bt(c)).cast("string").as(s"mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // unpivot the single wide row into one row per column (explode of
    // uniformly-named structs — stack() rejects rows whose struct
    // field names differ)
    wide.select(explode(array(cols.map(c => struct(
        lit(c).as("column"), col("n_rows").as("n_rows"),
        (col("n_rows") - bt(s"cnt_$c")).as("n_nulls"),
        bt(s"nd_$c").as("n_distinct"),
        bt(s"mn_$c").as("min_repr"), bt(s"mx_$c").as("max_repr"))): _*))
        .as("p"))
      .select("p.*")
  }

  /** The exact profile as ONE UNION BRANCH PER COLUMN, each a
    * single-distinct aggregate (r14, guide §2.3): a SINGLE
    * `count_distinct` plans as a plain two-phase aggregate over that
    * column's values, so the k-fold multi-distinct Expand of the old
    * wide form is gone entirely. Scan bytes are unchanged at any scale
    * (each branch's parquet scan prunes to its one column, so the k
    * branches together read exactly the k columns the wide scan read),
    * while the shuffle carries per-column DISTINCT VALUES instead of
    * k+1 copies of every row. Values identical: same counts, same
    * distincts, same string-cast min/max. */
  private def profileExact(df: DataFrame, cols: Seq[String],
      bt: String => Column): DataFrame =
    cols.map { c =>
      df.agg(count(lit(1)).as("n_rows"), count(bt(c)).as("cnt"),
          count_distinct(bt(c)).as("nd"),
          min(bt(c)).cast("string").as("mn"),
          max(bt(c)).cast("string").as("mx"))
        .select(lit(c).as("column"), col("n_rows"),
          (col("n_rows") - col("cnt")).as("n_nulls"),
          col("nd").as("n_distinct"),
          col("mn").as("min_repr"), col("mx").as("max_repr"))
    }.reduce(_ unionByName _)

  /** The profile query: exact per-column stats of `orders` (mixed
    * long/string/double/timestamp columns — the representative
    * dimension-table shape). */
  private def xProfile: Q = (s, dir) => profile(Tables.orders(s, dir))

  private val xProfileSql = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map(c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_repr,
         |  CAST(max($c) AS VARCHAR) AS max_repr
         |FROM orders""".stripMargin).mkString("\nUNION ALL\n")
  }

  /** The approx-profile query — the 100 TB default the class doc
    * names: HLL distinct counts, NO multi-distinct Expand (the plan is
    * PlanSpec-pinned to a single pass). Counts/min/max are exact
    * either way; the HLL estimate is contracted to ±10% of the exact
    * count (floor 8 for tiny cardinalities, where HLL is exact
    * anyway) — the `a8_approx_stats` within-bounds oracle
    * discipline. The exact twin runs here only to judge the bound;
    * production runs `profile(df, exact = false)` alone. */
  private def xProfileApprox: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val ex = profile(o).select(col("column"), col("n_distinct").as("nd_exact"))
    profile(o, exact = false)
      .join(broadcast(ex), "column")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("min_repr"), col("max_repr"),
        (abs(col("n_distinct") - col("nd_exact"))
          <= greatest((col("nd_exact") * lit(0.10)).cast("long"), lit(8L)))
          .as("nd_within_bounds"))
  }

  private val xProfileApproxSql = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map(c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  CAST(min($c) AS VARCHAR) AS min_repr,
         |  CAST(max($c) AS VARCHAR) AS max_repr,
         |  TRUE AS nd_within_bounds
         |FROM orders""".stripMargin).mkString("\nUNION ALL\n")
  }

  /** Declarative expectation report over the orders/lineitem pair:
    * `(rule, n_checked, n_violations, pass)` — not-null, key
    * uniqueness, accepted values, numeric range, and referential
    * integrity. The report is what an ingest gate alerts on; row-level
    * violation extraction is a filter with the same predicate. */
  private def xExpectations: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val ordersChecks = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
      (count(lit(1)) - count_distinct(col("o_orderkey"))).as("dup_keys"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"))
    val lineChecks = l.agg(
      count(lit(1)).as("ln"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L))
        .as("bad_qty"))
    val orphans = l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan"))
    val report = ordersChecks
      .crossJoin(broadcast(lineChecks))
      .crossJoin(broadcast(orphans))
      .select(expr(
        """stack(5,
          |  'orders.o_custkey not_null', n, null_cust,
          |  'orders.o_orderkey unique', n, dup_keys,
          |  'orders.o_orderstatus accepted_values', n, bad_status,
          |  'lineitem.l_quantity in [1,50]', ln, bad_qty,
          |  'lineitem.l_orderkey ref orders', ln, orphan
          |) AS (rule, n_checked, n_violations)""".stripMargin))
    report.withColumn("pass", col("n_violations") === 0L)
      .select(col("rule"), col("n_checked").cast("long").as("n_checked"),
        col("n_violations").cast("long").as("n_violations"), col("pass"))
  }

  /** Declarative expectation report over ARBITRARY rules and an
    * optional slice — the generic, sliceable form of the fixed
    * [[xExpectations]] demo (the sliced-drift discipline applied to
    * data-quality gates): every rule's violation indicator is one
    * conditional sum in ONE narrow aggregate pass over the frame,
    * grouped by `groupCols` (empty = whole-frame), then unpivoted to
    * `(groupCols…, rule, n_checked, n_violations, pass)`. A
    * production gate slices by ingest feed: "which SOURCE broke the
    * contract?" is answered by the same single pass that says
    * whether anything did. NULL predicate results count as
    * violations (the [[quarantine]] convention). Map-side combine
    * does the heavy lifting; output is |slices|·|rules| rows. */
  def expectationsOf(df: DataFrame, rules: Seq[(String, Column)],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty, "expectationsOf: no rules given")
    val aggs = count(lit(1)).as("n_checked") +: rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__v_$name")
    }
    val grouped =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    val wide = grouped.agg(aggs.head, aggs.tail: _*)
    // unpivot via explode(array(struct(...))) — identical field names
    // per element (the stack() differing-names gotcha)
    val entries = rules.map { case (name, _) =>
      s"struct('$name' as rule, __v_$name as n_violations)"
    }.mkString("array(", ", ", ")")
    wide
      .select((groupCols.map(col) :+ col("n_checked")
        :+ explode(expr(entries)).as("e")): _*)
      .select((groupCols.map(col) :+ col("e.rule").as("rule")
        :+ col("n_checked") :+ col("e.n_violations").as("n_violations")): _*)
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** `x_expectations_sliced` — the per-language gate over documents:
    * three named rules × every lang slice from one aggregate pass.
    * `lang_latin` fails exactly on the zh slice — the per-feed
    * contract-breach localization the slice buys. */
  private def xExpectationsSliced: Q = (s, dir) =>
    expectationsOf(Tables.documents(s, dir), Seq(
      "chars_le_400" -> (col("n_chars") <= 400),
      "lang_latin" -> col("lang").isin("en", "de", "fr", "es"),
      "text_min_100" -> (col("n_chars") >= 100)), Seq("lang"))

  private val xExpectationsSlicedSql =
    """WITH g AS (SELECT lang, count(*) AS n,
      |  CAST(sum(CASE WHEN NOT coalesce(n_chars <= 400, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_chars,
      |  CAST(sum(CASE WHEN NOT coalesce(lang IN ('en','de','fr','es'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
      |  CAST(sum(CASE WHEN NOT coalesce(n_chars >= 100, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_min
      |FROM documents GROUP BY lang)
      |SELECT lang, r.rule, CAST(n AS BIGINT) AS n_checked, r.n_violations,
      |       r.n_violations = 0 AS pass
      |FROM g, LATERAL (SELECT * FROM (VALUES
      |  ('chars_le_400', v_chars), ('lang_latin', v_lang),
      |  ('text_min_100', v_min)) AS t(rule, n_violations)) r""".stripMargin

  /** Row-level quality gate with quarantine — the other half of the
    * aggregate [[xExpectations]] report: evaluate named per-row rules
    * in ONE narrow projection and split the frame into (pass,
    * quarantined), quarantined rows carrying `violations` = the array
    * of violated rule names. NULL predicate results count as
    * violations (a rule that cannot be evaluated has not passed — the
    * dbt/GE convention). No shuffle anywhere: at 100 TB this is a
    * map-only pass whose two outputs stream straight to their sinks
    * ([[quarantineTo]]); the bad-rows path is the `badRecordsPath` /
    * DLQ pattern with the REASON attached, so reprocessing after a
    * rule fix is a filter on `violations`, not a re-scan of the
    * source. An input that already carries a `violations` column is
    * rejected — tagging through it would silently overwrite user data
    * and the pass-side drop would then delete the original column. */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    require(!df.columns.contains("violations"),
      "quarantine(): input already has a 'violations' column; rename it " +
        "first — the quarantined output reserves that name for rule tags")
    val tags = array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name)) }: _*)
    val tagged = df.withColumn("violations",
      filter(tags, x => x.isNotNull))
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }

  /** [[quarantine]] + sinks: good rows to `passPath`, bad rows (with
    * `violations`) to `quarantinePath`; returns (nPass, nQuarantined)
    * read back from the written files so the counts are the sinks'
    * truth, not a separate job's. */
  def quarantineTo(df: DataFrame, rules: Seq[(String, Column)],
      passPath: String, quarantinePath: String): (Long, Long) = {
    val (ok, bad) = quarantine(df, rules)
    ok.write.mode("overwrite").parquet(passPath)
    bad.withColumn("violations", array_join(col("violations"), ","))
      .write.mode("overwrite").parquet(quarantinePath)
    val s = df.sparkSession
    (s.read.parquet(passPath).count(), s.read.parquet(quarantinePath).count())
  }

  /** `x_quarantine` — the registered demo of [[quarantine]]: lineitem
    * rows violating any of three named rules, with the violated-rule
    * list attached (CSV-joined — arrays crash the comparator). */
  private def xQuarantine: Q = (s, dir) => {
    val rules = Seq(
      "qty_le_45" -> (col("l_quantity") <= 45),
      "disc_le_05" -> (col("l_discount") <= 0.05),
      "ship_not_null" -> col("l_shipdate").isNotNull)
    val (_, bad) = quarantine(Tables.lineitem(s, dir), rules)
    bad.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      array_join(col("violations"), ",").as("violations"))
  }

  private val xQuarantineSql =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       array_to_string(list_filter([
      |         CASE WHEN NOT coalesce(l_quantity <= 45, FALSE) THEN 'qty_le_45' END,
      |         CASE WHEN NOT coalesce(l_discount <= 0.05, FALSE) THEN 'disc_le_05' END,
      |         CASE WHEN NOT coalesce(l_shipdate IS NOT NULL, FALSE) THEN 'ship_not_null' END
      |       ], x -> x IS NOT NULL), ',') AS violations
      |FROM lineitem
      |WHERE NOT coalesce(l_quantity <= 45, FALSE)
      |   OR NOT coalesce(l_discount <= 0.05, FALSE)
      |   OR NOT coalesce(l_shipdate IS NOT NULL, FALSE)""".stripMargin

  private val xExpectationsSql =
    """WITH oc AS (SELECT count(*) AS n,
       |  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
       |  count(*) - count(DISTINCT o_orderkey) AS dup_keys,
       |  sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bad_status
       |FROM orders),
       |lc AS (SELECT count(*) AS ln,
       |  sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS bad_qty
       |FROM lineitem),
       |oq AS (SELECT count(*) AS orphan FROM lineitem
       |       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
       |SELECT r.rule, r.n_checked, r.n_violations, r.n_violations = 0 AS pass
       |FROM oc, lc, oq, LATERAL (
       |  SELECT * FROM (VALUES
       |    ('orders.o_custkey not_null', CAST(n AS BIGINT), CAST(null_cust AS BIGINT)),
       |    ('orders.o_orderkey unique', CAST(n AS BIGINT), CAST(dup_keys AS BIGINT)),
       |    ('orders.o_orderstatus accepted_values', CAST(n AS BIGINT), CAST(bad_status AS BIGINT)),
       |    ('lineitem.l_quantity in [1,50]', CAST(ln AS BIGINT), CAST(bad_qty AS BIGINT)),
       |    ('lineitem.l_orderkey ref orders', CAST(ln AS BIGINT), CAST(orphan AS BIGINT))
       |  ) AS t(rule, n_checked, n_violations)) r""".stripMargin

  // ----------------------------------------------------------------
  // Distribution drift between dataset versions (PSI)
  // ----------------------------------------------------------------

  private val DriftCutoff = "1998-01-01"
  private val PsiBuckets = 10
  /** The industry-standard PSI alert threshold (≥ 0.2 = significant
    * shift), compared as exact nano-integers. */
  private val PsiAlertNanos = 200000000L

  /** `x_drift_psi` — population-stability-index drift report between
    * two versions of a table (here: orders before/after a date cut,
    * the daily-partition ingest shape): numeric columns bucket
    * equal-width over the BASE extent (outside-range clamps to the
    * edge buckets, so a shifted current version lands visibly in
    * them), categoricals bucket by value, Laplace-smoothed
    * frequencies, PSI = Σ (p−q)·ln(p/q).
    *
    * Determinism discipline: every per-bucket term is computed by the
    * identical op sequence in both engines and summed as floored
    * nano-integers (order-free); the alert flag compares the exact
    * integer sum against 0.2·10⁹, so no float boundary decides it.
    * One scan of each version fans out to the per-column bucket
    * streams map-side; everything past the (column, bucket) count
    * aggregate is bucket-count-sized. */
  /** The reusable PSI core — per column `(column, n_base, n_cur, psi,
    * drifted)` between two versions of a table. Numeric columns
    * bucket equal-width over the BASE extent (one tiny agg per
    * numeric column, broadcast); categoricals bucket by value. See
    * [[xDriftPsi]] for the determinism discipline. */
  def driftPsi(base: DataFrame, cur: DataFrame, numericCols: Seq[String],
      categoricalCols: Seq[String], buckets: Int = PsiBuckets,
      alert: Double = 0.2, groupCols: Seq[String] = Nil): DataFrame = {
    val extents = psiExtents(base, numericCols)
    psiFromCounts(
      psiBucketCounts(base, numericCols, categoricalCols, extents, buckets,
        groupCols),
      psiBucketCounts(cur, numericCols, categoricalCols, extents, buckets,
        groupCols),
      alert, groupCols)
  }

  /** The per-numeric-column BASE extents the bucketing closes over —
    * |numericCols| 1-row aggregates collected to the driver (the
    * kmeans-model convention: model-sized reads are fine; this is what
    * lets a STREAMING monitor fix the baseline once instead of
    * rescanning it per batch). None = empty/all-null base. */
  private[graft] def psiExtents(base: DataFrame,
      numericCols: Seq[String]): Map[String, (Option[Double], Option[Double])] =
    numericCols.map { c =>
      val r = base.agg(min(col(c).cast("double")).as("mn"),
        max(col(c).cast("double")).as("mx")).head()
      c -> ((if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    }.toMap

  /** Per-(column, bucket) occupancy of ONE table version under FIXED
    * extents — (column, bucket, n), the mergeable PSI state: counts
    * are additive, so a running version maintains by
    * [[RelationalExt.mergeAggStates]] instead of recount. One narrow
    * scan fanning the columns out map-side. `groupCols` prepends
    * SLICE keys (source, lang, shard …): every downstream statistic
    * then reports per slice from the same single-scan state — the
    * extents stay whole-column so slices bucket identically and stay
    * comparable. */
  private[graft] def psiBucketCounts(df: DataFrame, numericCols: Seq[String],
      categoricalCols: Seq[String],
      extents: Map[String, (Option[Double], Option[Double])],
      buckets: Int = PsiBuckets, groupCols: Seq[String] = Nil): DataFrame = {
    def litOpt(o: Option[Double]) =
      o.map(lit(_)).getOrElse(lit(null).cast("double"))
    val g = groupCols.map(col)
    val nums = numericCols.map { c =>
      val (mn, mx) = (litOpt(extents(c)._1), litOpt(extents(c)._2))
      // degenerate-extent guard (null-safe): a constant base column
      // (mx = mn) or an EMPTY base (both null) would divide by zero —
      // 0/0 → null buckets, where Spark's null-skipping greatest and
      // DuckDB's null-propagating one diverge. Everything lands in
      // bucket 0 instead, mirrored verbatim in the oracle SQL.
      df.select(g :+ lit(c).as("column") :+
        when(mx <=> mn, lit(0))
          .otherwise(least(lit(buckets - 1), greatest(lit(0),
            floor((col(c) - mn) / (mx - mn)
              * buckets).cast("int")))).cast("string").as("bucket"): _*)
    }
    val cats = categoricalCols.map(c => df.select(g :+ lit(c).as("column") :+
      coalesce(col(c).cast("string"), lit("<null>")).as("bucket"): _*))
    (nums ++ cats).reduce(_ unionByName _)
      .groupBy(g :+ col("column") :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** PSI report from two (column, bucket, n) count frames — per-column
    * totals are the bucket sums (every row lands in exactly one bucket
    * per column, so they equal the version's row count). Everything
    * here is bucket-count-sized. */
  private[graft] def psiFromCounts(baseCounts: DataFrame, curCounts: DataFrame,
      alert: Double = 0.2, groupCols: Seq[String] = Nil): DataFrame = {
    val keys = groupCols :+ "column"
    val g = keys.map(col)
    val k = Window.partitionBy(g: _*)
    val alertNanos = math.round(alert * 1e9)
    baseCounts.select(g :+ col("bucket") :+ col("n").as("cb"): _*)
      .join(curCounts.select(g :+ col("bucket") :+ col("n").as("cc"): _*),
        keys :+ "bucket", "full_outer")
      .select(g :+ col("bucket") :+
        coalesce(col("cb"), lit(0L)).as("cb") :+
        coalesce(col("cc"), lit(0L)).as("cc"): _*)
      .withColumn("kk", count(lit(1)).over(k))
      .withColumn("nb", sum(col("cb")).over(k))
      .withColumn("nc", sum(col("cc")).over(k))
      .select(g :+ col("nb") :+ col("nc") :+
        floor(((col("cb") + lit(1.0)) / (col("nb") + col("kk"))
          - (col("cc") + lit(1.0)) / (col("nc") + col("kk")))
          * expr("ln(((cb + 1.0) / (nb + kk)) / ((cc + 1.0) / (nc + kk)))")
          * lit(1e9)).cast("long").as("nano"): _*)
      .groupBy(g: _*)
      .agg(first(col("nb")).as("n_base"), first(col("nc")).as("n_cur"),
        sum(col("nano")).as("nanos"))
      .select(g :+ col("n_base") :+ col("n_cur") :+
        expr(TextAnalysis.r6("cast(nanos as double) / 1e9")).as("psi") :+
        (col("nanos") > alertNanos).as("drifted"): _*)
      .orderBy(g: _*)
  }

  private def xDriftPsi: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    driftPsi(
      o.filter(col("o_orderdate") < lit(DriftCutoff)),
      o.filter(col("o_orderdate") >= lit(DriftCutoff)),
      numericCols = Seq("o_totalprice"),
      categoricalCols = Seq("o_orderstatus", "o_orderpriority"))
  }

  /** `x_drift_psi_sliced` — the PSI report PER SLICE (here: per
    * o_orderpriority), the production monitor shape: a whole-column
    * drift report smears a shift confined to one source/lang slice
    * below the alert threshold, so monitors slice first and alert per
    * slice. Same single-scan mergeable state — the slice key is just
    * an extra grouping column on [[psiBucketCounts]]; the extents stay
    * whole-column so every slice buckets identically and the reports
    * are comparable across slices. */
  private def xDriftPsiSliced: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    driftPsi(
      o.filter(col("o_orderdate") < lit(DriftCutoff)),
      o.filter(col("o_orderdate") >= lit(DriftCutoff)),
      numericCols = Seq("o_totalprice"),
      categoricalCols = Seq("o_orderstatus"),
      groupCols = Seq("o_orderpriority"))
  }

  private val xDriftPsiSlicedSql =
    s"""WITH base AS (SELECT * FROM orders WHERE o_orderdate < '$DriftCutoff'),
       |cur AS (SELECT * FROM orders WHERE o_orderdate >= '$DriftCutoff'),
       |ext AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM base),
       |bb AS (
       |  SELECT o_orderpriority, 'o_totalprice' AS "column",
       |    CAST(CASE WHEN mx IS NOT DISTINCT FROM mn THEN 0
       |      ELSE least(${PsiBuckets - 1}, greatest(0,
       |        CAST(floor((o_totalprice - mn) / (mx - mn) * $PsiBuckets) AS INT))) END AS VARCHAR) AS bucket
       |  FROM base CROSS JOIN ext
       |  UNION ALL SELECT o_orderpriority, 'o_orderstatus',
       |    coalesce(o_orderstatus, '<null>') FROM base),
       |cb2 AS (
       |  SELECT o_orderpriority, 'o_totalprice' AS "column",
       |    CAST(CASE WHEN mx IS NOT DISTINCT FROM mn THEN 0
       |      ELSE least(${PsiBuckets - 1}, greatest(0,
       |        CAST(floor((o_totalprice - mn) / (mx - mn) * $PsiBuckets) AS INT))) END AS VARCHAR) AS bucket
       |  FROM cur CROSS JOIN ext
       |  UNION ALL SELECT o_orderpriority, 'o_orderstatus',
       |    coalesce(o_orderstatus, '<null>') FROM cur),
       |bcnt AS (SELECT o_orderpriority, "column", bucket, count(*) AS cb
       |         FROM bb GROUP BY 1, 2, 3),
       |ccnt AS (SELECT o_orderpriority, "column", bucket, count(*) AS cc
       |         FROM cb2 GROUP BY 1, 2, 3),
       |j AS (SELECT coalesce(b.o_orderpriority, c.o_orderpriority) AS o_orderpriority,
       |        coalesce(b."column", c."column") AS "column",
       |        coalesce(b.bucket, c.bucket) AS bucket,
       |        coalesce(cb, 0) AS cb, coalesce(cc, 0) AS cc
       |      FROM bcnt b FULL OUTER JOIN ccnt c
       |        ON b.o_orderpriority = c.o_orderpriority
       |       AND b."column" = c."column" AND b.bucket = c.bucket),
       |wk AS (SELECT *,
       |        count(*) OVER (PARTITION BY o_orderpriority, "column") AS kk,
       |        sum(cb) OVER (PARTITION BY o_orderpriority, "column") AS nb,
       |        sum(cc) OVER (PARTITION BY o_orderpriority, "column") AS nc
       |      FROM j),
       |terms AS (SELECT o_orderpriority, "column", nb, nc,
       |    CAST(floor(((cb + 1.0) / (nb + kk) - (cc + 1.0) / (nc + kk))
       |      * ln(((cb + 1.0) / (nb + kk)) / ((cc + 1.0) / (nc + kk)))
       |      * 1e9) AS BIGINT) AS nano
       |  FROM wk)
       |SELECT o_orderpriority, "column",
       |       CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_cur,
       |       floor((CAST(sum(nano) AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS psi,
       |       sum(nano) > $PsiAlertNanos AS drifted
       |FROM terms GROUP BY o_orderpriority, "column", nb, nc
       |ORDER BY o_orderpriority, "column"""".stripMargin

  /** Where the IVM demo splits the current version into two "daily"
    * deltas. */
  private val PsiIvmSplit = "1998-05-01"

  /** `x_drift_psi_ivm` — the SAME report as [[xDriftPsi]], but the
    * current version's bucket counts are maintained INCREMENTALLY:
    * cur arrives as two deltas, each bucketed under the FROZEN base
    * extents, and the per-(column, bucket) counts merged with
    * [[RelationalExt.mergeAggStates]] (bucket counts are additive).
    * The oracle is the full recompute, so the gate proves the
    * maintenance identity
    * psi(base, merge(counts(d1), counts(d2))) == psi(base, d1 ∪ d2)
    * EXACTLY (integer counts — no drift between association orders).
    * This is the identity the streaming monitor
    * ([[graft.streaming.StreamingDriftMonitor]]) relies on: a 100 TB
    * table under continuous ingest keeps its drift report current by
    * bucketing ONLY each day's delta — never rescanning the
    * accumulated version. */
  private def xDriftPsiIvm: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val nums = Seq("o_totalprice")
    val cats = Seq("o_orderstatus", "o_orderpriority")
    val base = o.filter(col("o_orderdate") < lit(DriftCutoff))
    val ext = psiExtents(base, nums)
    val d1 = o.filter(col("o_orderdate") >= lit(DriftCutoff) &&
      col("o_orderdate") < lit(PsiIvmSplit))
    val d2 = o.filter(col("o_orderdate") >= lit(PsiIvmSplit))
    val merged = RelationalExt.mergeAggStates(
      psiBucketCounts(d1, nums, cats, ext),
      psiBucketCounts(d2, nums, cats, ext),
      Seq("column", "bucket"), Seq("n"))
    psiFromCounts(psiBucketCounts(base, nums, cats, ext), merged)
  }

  private val xDriftPsiSql =
    s"""WITH base AS (SELECT * FROM orders WHERE o_orderdate < '$DriftCutoff'),
       |cur AS (SELECT * FROM orders WHERE o_orderdate >= '$DriftCutoff'),
       |ext AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM base),
       |bb AS (
       |  SELECT 'o_totalprice' AS "column",
       |    CAST(CASE WHEN mx IS NOT DISTINCT FROM mn THEN 0
       |      ELSE least(${PsiBuckets - 1}, greatest(0,
       |        CAST(floor((o_totalprice - mn) / (mx - mn) * $PsiBuckets) AS INT))) END AS VARCHAR) AS bucket
       |  FROM base CROSS JOIN ext
       |  UNION ALL SELECT 'o_orderstatus', coalesce(o_orderstatus, '<null>') FROM base
       |  UNION ALL SELECT 'o_orderpriority', coalesce(o_orderpriority, '<null>') FROM base),
       |cb2 AS (
       |  SELECT 'o_totalprice' AS "column",
       |    CAST(CASE WHEN mx IS NOT DISTINCT FROM mn THEN 0
       |      ELSE least(${PsiBuckets - 1}, greatest(0,
       |        CAST(floor((o_totalprice - mn) / (mx - mn) * $PsiBuckets) AS INT))) END AS VARCHAR) AS bucket
       |  FROM cur CROSS JOIN ext
       |  UNION ALL SELECT 'o_orderstatus', coalesce(o_orderstatus, '<null>') FROM cur
       |  UNION ALL SELECT 'o_orderpriority', coalesce(o_orderpriority, '<null>') FROM cur),
       |bcnt AS (SELECT "column", bucket, count(*) AS cb FROM bb GROUP BY "column", bucket),
       |ccnt AS (SELECT "column", bucket, count(*) AS cc FROM cb2 GROUP BY "column", bucket),
       |j AS (SELECT coalesce(b."column", c."column") AS "column",
       |        coalesce(b.bucket, c.bucket) AS bucket,
       |        coalesce(cb, 0) AS cb, coalesce(cc, 0) AS cc
       |      FROM bcnt b FULL OUTER JOIN ccnt c
       |        ON b."column" = c."column" AND b.bucket = c.bucket),
       |tot AS (SELECT (SELECT count(*) FROM base) AS nb, (SELECT count(*) FROM cur) AS nc),
       |wk AS (SELECT *, count(*) OVER (PARTITION BY "column") AS kk FROM j),
       |terms AS (SELECT "column", nb, nc,
       |    CAST(floor(((cb + 1.0) / (nb + kk) - (cc + 1.0) / (nc + kk))
       |      * ln(((cb + 1.0) / (nb + kk)) / ((cc + 1.0) / (nc + kk)))
       |      * 1e9) AS BIGINT) AS nano
       |  FROM wk CROSS JOIN tot)
       |SELECT "column", nb AS n_base, nc AS n_cur,
       |       floor((CAST(sum(nano) AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS psi,
       |       sum(nano) > $PsiAlertNanos AS drifted
       |FROM terms GROUP BY "column", nb, nc ORDER BY "column"""".stripMargin

  // ----------------------------------------------------------------
  // Distribution drift: two-sample Kolmogorov-Smirnov (exact)
  // ----------------------------------------------------------------

  /** KS decision threshold D > 0.1, compared as exact cross-multiplied
    * integers (mdev · 10 > n_base · n_cur) — no float boundary decides
    * the alert, the [[driftPsi]] discipline. */
  private val KsAlertTimes10 = 1L

  /** `x_drift_ks` core — two-sample Kolmogorov-Smirnov statistic per
    * column: D = max over values of |F_base(v) − F_cur(v)|. PSI sees
    * mass moved between fixed buckets; KS sees the worst-case CDF gap
    * at ANY point, catching tail shifts PSI's equal-width buckets
    * smear. The whole computation is EXACT INTEGER until one final
    * division: per distinct value, dev = |cumA·n_cur − cumB·n_base|
    * (cross-multiplied cumulative counts), D = max(dev)/(n_base·n_cur)
    * — both engines agree to the bit, and the alert compares integers.
    *
    * Scale shape: one narrow union scan fans the columns out map-side;
    * the per-(column, value) count aggregate is the only full-volume
    * shuffle; the cumulative window runs over DISTINCT values per
    * column. Use it on discrete/quantized columns (here l_quantity,
    * l_discount: ≤ 50 distinct) — a continuous column should be
    * quantized first or handed to [[driftPsi]], the `a14_winsorize`
    * cardinality argument. */
  def driftKs(base: DataFrame, cur: DataFrame, cols: Seq[String],
      groupCols: Seq[String] = Nil): DataFrame =
    ksFromCounts(valueCounts(base, cols, groupCols),
      valueCounts(cur, cols, groupCols), groupCols)

  /** Per-(column, value) occupancy of ONE table version — the
    * mergeable state of the VALUE-level drift statistics (KS, W1):
    * counts are additive, so a streaming monitor maintains them by
    * merge, the [[psiBucketCounts]] twin for distributions judged at
    * distinct values instead of fixed buckets (discrete/quantized
    * columns — the class-doc cardinality caveat). */
  private[graft] def valueCounts(df: DataFrame, cols: Seq[String],
      groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    cols.map(c => df.filter(col(c).isNotNull)
        .select(g :+ lit(c).as("column") :+ col(c).cast("double").as("v"): _*))
      .reduce(_ unionByName _)
      .groupBy(g :+ col("column") :+ col("v"): _*).agg(count(lit(1)).as("n"))
  }

  /** The merged (column, v, ca, cb) frame both value-level statistics
    * score from. */
  private def mergedValueCounts(baseCounts: DataFrame,
      curCounts: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val keys = groupCols ++ Seq("column", "v")
    val g = keys.map(col)
    baseCounts.select(g :+ col("n").as("ca"): _*)
      .join(curCounts.select(g :+ col("n").as("cb"): _*),
        keys, "full_outer")
      .select(g :+
        coalesce(col("ca"), lit(0L)).as("ca") :+
        coalesce(col("cb"), lit(0L)).as("cb"): _*)
  }

  /** KS report from two (column, v, n) count frames — everything past
    * the counts is distinct-value-sized. The cross-multiplied products
    * (cumA·n_cur, n_base·n_cur) are promoted to DECIMAL(38,0) —
    * BIGINT overflows once n_base·n_cur passes 2⁶³ (~3·10⁹ rows per
    * side), the `bm25fSc` 128-bit discipline — mirrored as HUGEINT in
    * the oracle. */
  private[graft] def ksFromCounts(baseCounts: DataFrame,
      curCounts: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    def big(c: Column): Column = c.cast("decimal(38,0)")
    val keys = groupCols :+ "column"
    val g = keys.map(col)
    val perVal = mergedValueCounts(baseCounts, curCounts, groupCols)
    val totals = perVal.groupBy(g: _*)
      .agg(sum(col("ca")).as("n_base"), sum(col("cb")).as("n_cur"))
    val cum = Window.partitionBy(g: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perVal
      .select(g :+
        sum(col("ca")).over(cum).as("cuma") :+
        sum(col("cb")).over(cum).as("cumb"): _*)
      .join(broadcast(totals), keys)
      .select(g :+ col("n_base") :+ col("n_cur") :+
        abs(big(col("cuma")) * col("n_cur")
          - big(col("cumb")) * col("n_base")).as("dev"): _*)
      .groupBy(g: _*)
      .agg(first(col("n_base")).as("n_base"), first(col("n_cur")).as("n_cur"),
        max(col("dev")).as("mdev"))
      .select(g :+ col("n_base") :+ col("n_cur") :+
        expr(TextAnalysis.r6("cast(mdev as double) / " +
          "cast(cast(n_base as decimal(38,0)) * n_cur as double)")).as("ks") :+
        ((col("mdev") * 10L > big(col("n_base")) * col("n_cur") * KsAlertTimes10)
          .as("drifted")): _*)
      .orderBy(g: _*)
  }

  private def xDriftKs: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    driftKs(
      li.filter(col("l_shipdate") < lit(DriftCutoff)),
      li.filter(col("l_shipdate") >= lit(DriftCutoff)),
      Seq("l_quantity", "l_discount"))
  }

  private val xDriftKsSql =
    s"""WITH base AS (SELECT * FROM lineitem WHERE l_shipdate < '$DriftCutoff'),
       |cur AS (SELECT * FROM lineitem WHERE l_shipdate >= '$DriftCutoff'),
       |t AS (
       |  SELECT 'l_quantity' AS "column", CAST(l_quantity AS DOUBLE) AS v, 1 AS a, 0 AS b
       |    FROM base WHERE l_quantity IS NOT NULL
       |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE), 1, 0
       |    FROM base WHERE l_discount IS NOT NULL
       |  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS DOUBLE), 0, 1
       |    FROM cur WHERE l_quantity IS NOT NULL
       |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE), 0, 1
       |    FROM cur WHERE l_discount IS NOT NULL),
       |pv AS (SELECT "column", v, CAST(sum(a) AS BIGINT) AS ca,
       |              CAST(sum(b) AS BIGINT) AS cb
       |       FROM t GROUP BY "column", v),
       |tot AS (SELECT "column", CAST(sum(ca) AS BIGINT) AS n_base,
       |               CAST(sum(cb) AS BIGINT) AS n_cur
       |        FROM pv GROUP BY "column"),
       |c AS (SELECT "column",
       |        sum(ca) OVER (PARTITION BY "column" ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
       |        sum(cb) OVER (PARTITION BY "column" ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
       |      FROM pv),
       |dev AS (SELECT c."column" AS "column", n_base, n_cur,
       |          abs(CAST(cuma AS HUGEINT) * n_cur
       |            - CAST(cumb AS HUGEINT) * n_base) AS dev
       |        FROM c JOIN tot ON c."column" = tot."column")
       |SELECT "column", n_base, n_cur,
       |       floor((CAST(max(dev) AS DOUBLE) / CAST(CAST(n_base AS HUGEINT) * n_cur AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ks,
       |       max(dev) * 10 > CAST(n_base AS HUGEINT) * n_cur * $KsAlertTimes10 AS drifted
       |FROM dev GROUP BY "column", n_base, n_cur ORDER BY "column"""".stripMargin

  // ----------------------------------------------------------------
  // Distribution drift: normalized Wasserstein-1 (earth mover)
  // ----------------------------------------------------------------

  /** Alert when normalized W1 exceeds 5% of the base extent —
    * compared as exact integers (nanos > 0.05·10⁹). */
  private val W1AlertNanos = 50000000L

  /** `x_drift_w1` core — two-sample Wasserstein-1 (earth-mover)
    * distance per column, NORMALIZED by the base extent so columns on
    * any unit share one alert scale: W1 = Σ over adjacent distinct
    * values of |F_base − F_cur| · gap, i.e. the AREA between the two
    * CDFs — the drift quartet's fourth member: PSI reads total mass
    * moved between fixed buckets, KS the worst-case CDF gap at one
    * point, χ² the variance-normalized bucket discrepancy, W1 *how
    * far* the mass moved (a shift of 1 unit and of 10 units read the
    * same to KS; W1 scales with the distance). Same machinery as
    * [[driftKs]]: per-(column, value) counts are the only full-volume
    * shuffle, cumulative window over DISTINCT values; each term
    * |cumA·n_cur − cumB·n_base| · gap is exact-integer cross-
    * multiplied counts times one double gap, normalized and floored
    * to nanos BEFORE the order-free sum, alert compared as integers —
    * the discrete/quantized-column caveat of KS applies. */
  def driftW1(base: DataFrame, cur: DataFrame, cols: Seq[String],
      groupCols: Seq[String] = Nil): DataFrame =
    w1FromCounts(valueCounts(base, cols, groupCols),
      valueCounts(cur, cols, groupCols), groupCols)

  /** W1 report from two (column, v, n) count frames — the
    * [[ksFromCounts]] twin; one incremental value-count state serves
    * both. */
  private[graft] def w1FromCounts(baseCounts: DataFrame,
      curCounts: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    def big(c: Column): Column = c.cast("decimal(38,0)")
    val keys = groupCols :+ "column"
    val g = keys.map(col)
    val perVal = mergedValueCounts(baseCounts, curCounts, groupCols)
    val totals = perVal.groupBy(g: _*)
      .agg(sum(col("ca")).as("n_base"), sum(col("cb")).as("n_cur"),
        min(when(col("ca") > 0, col("v"))).as("mn"),
        max(when(col("ca") > 0, col("v"))).as("mx"))
    val cum = Window.partitionBy(g: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lead1 = Window.partitionBy(g: _*).orderBy(col("v"))
    perVal
      .select(g :+ col("v") :+
        sum(col("ca")).over(cum).as("cuma") :+
        sum(col("cb")).over(cum).as("cumb"): _*)
      .withColumn("gap", coalesce(lead(col("v"), 1).over(lead1) - col("v"), lit(0.0)))
      .join(broadcast(totals), keys)
      .select(g :+ col("n_base") :+ col("n_cur") :+
        // degenerate base extent (constant/empty) → zero contribution,
        // mirrored in the oracle (the driftPsi guard discipline)
        (when(col("mx") <=> col("mn"), lit(0L))
          .otherwise(floor(
            abs(big(col("cuma")) * col("n_cur")
                - big(col("cumb")) * col("n_base"))
              .cast("double") * col("gap")
              / (big(col("n_base")) * col("n_cur")).cast("double")
              / (col("mx") - col("mn")) * lit(1e9)).cast("long"))
          .as("nano")): _*)
      .groupBy(g: _*)
      .agg(first(col("n_base")).as("n_base"), first(col("n_cur")).as("n_cur"),
        sum(col("nano")).as("nanos"))
      .select(g :+ col("n_base") :+ col("n_cur") :+
        expr(TextAnalysis.r6("cast(nanos as double) / 1e9")).as("w1_norm") :+
        (col("nanos") > W1AlertNanos).as("drifted"): _*)
      .orderBy(g: _*)
  }

  private def xDriftW1: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    driftW1(
      li.filter(col("l_shipdate") < lit(DriftCutoff)),
      li.filter(col("l_shipdate") >= lit(DriftCutoff)),
      Seq("l_quantity", "l_discount"))
  }

  private val xDriftW1Sql =
    s"""WITH base AS (SELECT * FROM lineitem WHERE l_shipdate < '$DriftCutoff'),
       |cur AS (SELECT * FROM lineitem WHERE l_shipdate >= '$DriftCutoff'),
       |t AS (
       |  SELECT 'l_quantity' AS "column", CAST(l_quantity AS DOUBLE) AS v, 1 AS a, 0 AS b
       |    FROM base WHERE l_quantity IS NOT NULL
       |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE), 1, 0
       |    FROM base WHERE l_discount IS NOT NULL
       |  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS DOUBLE), 0, 1
       |    FROM cur WHERE l_quantity IS NOT NULL
       |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE), 0, 1
       |    FROM cur WHERE l_discount IS NOT NULL),
       |pv AS (SELECT "column", v, CAST(sum(a) AS BIGINT) AS ca,
       |              CAST(sum(b) AS BIGINT) AS cb
       |       FROM t GROUP BY "column", v),
       |tot AS (SELECT "column", CAST(sum(ca) AS BIGINT) AS n_base,
       |               CAST(sum(cb) AS BIGINT) AS n_cur,
       |               min(CASE WHEN ca > 0 THEN v END) AS mn,
       |               max(CASE WHEN ca > 0 THEN v END) AS mx
       |        FROM pv GROUP BY "column"),
       |c AS (SELECT "column", v,
       |        sum(ca) OVER (PARTITION BY "column" ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
       |        sum(cb) OVER (PARTITION BY "column" ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
       |        coalesce(lead(v, 1) OVER (PARTITION BY "column" ORDER BY v) - v,
       |          0.0) AS gap
       |      FROM pv),
       |terms AS (SELECT c."column" AS "column", n_base, n_cur,
       |    CASE WHEN mx IS NOT DISTINCT FROM mn THEN 0
       |      ELSE CAST(floor(CAST(abs(CAST(cuma AS HUGEINT) * n_cur
       |          - CAST(cumb AS HUGEINT) * n_base) AS DOUBLE)
       |        * gap / CAST(CAST(n_base AS HUGEINT) * n_cur AS DOUBLE)
       |        / (mx - mn) * 1e9) AS BIGINT)
       |    END AS nano
       |  FROM c JOIN tot ON c."column" = tot."column")
       |SELECT "column", n_base, n_cur,
       |       floor((CAST(sum(nano) AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS w1_norm,
       |       sum(nano) > $W1AlertNanos AS drifted
       |FROM terms GROUP BY "column", n_base, n_cur ORDER BY "column"""".stripMargin

  // ----------------------------------------------------------------
  // Distribution drift: chi-square with an effect-size alert
  // ----------------------------------------------------------------

  /** Alert when φ² = χ²/n_cur exceeds 0.01 — an EFFECT-SIZE
    * threshold, not a p-value: at 100 TB row counts every p-value
    * rejects (any microscopic shift is "significant"), so the alert
    * that means something operationally is "the shift is LARGE",
    * which φ² measures scale-invariantly. Compared as exact integers
    * (χ²-nanos > n_cur · 10⁷ ⇔ χ²/n_cur > 0.01). */
  private val Chi2Phi2AlertNanosPerRow = 10000000L

  /** `x_drift_chi2` core — Pearson chi-square per column between two
    * versions, over the SAME fixed buckets as [[driftPsi]] (numeric:
    * equal-width under the base extent; categorical: by value).
    * χ² = Σ_buckets (o − e)²/e with expected counts from the base
    * distribution smoothed à la PSI (e = (cb+1)·n_cur/(n_base+k), so
    * a bucket the base never saw is defined). Completes the drift
    * triad: PSI reads total mass moved (symmetric, log-weighted), KS
    * the worst-case CDF gap, χ² the variance-normalized discrepancy —
    * the statistic whose per-bucket terms localize WHICH buckets
    * drifted. Each term is floored to nano-integers before the
    * order-free sum (the [[driftPsi]] discipline); the alert is the
    * φ² effect size, exact integer compare. Same scale shape as PSI:
    * one narrow scan per version, bucket-count-sized everything
    * after. */
  def driftChi2(base: DataFrame, cur: DataFrame, numericCols: Seq[String],
      categoricalCols: Seq[String], buckets: Int = PsiBuckets,
      groupCols: Seq[String] = Nil): DataFrame = {
    val extents = psiExtents(base, numericCols)
    chi2FromCounts(
      psiBucketCounts(base, numericCols, categoricalCols, extents, buckets,
        groupCols),
      psiBucketCounts(cur, numericCols, categoricalCols, extents, buckets,
        groupCols),
      groupCols)
  }

  /** Chi-square report from two (column, bucket, n) count frames —
    * the [[psiFromCounts]] twin, so a [[graft.streaming
    * .StreamingDriftMonitor]]-style incremental state serves both. */
  private[graft] def chi2FromCounts(baseCounts: DataFrame,
      curCounts: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val keys = groupCols :+ "column"
    val g = keys.map(col)
    val k = Window.partitionBy(g: _*)
    baseCounts.select(g :+ col("bucket") :+ col("n").as("cb"): _*)
      .join(curCounts.select(g :+ col("bucket") :+ col("n").as("cc"): _*),
        keys :+ "bucket", "full_outer")
      .select(g :+ col("bucket") :+
        coalesce(col("cb"), lit(0L)).as("cb") :+
        coalesce(col("cc"), lit(0L)).as("cc"): _*)
      .withColumn("kk", count(lit(1)).over(k))
      .withColumn("nb", sum(col("cb")).over(k))
      .withColumn("nc", sum(col("cc")).over(k))
      // (cc − e)²/e via explicit d·d — pow() is libm-specific in its
      // last ulp and NOT engine-portable at floor boundaries
      .withColumn("e", (col("cb") + lit(1.0)) * col("nc") / (col("nb") + col("kk")))
      .withColumn("d", col("cc") - col("e"))
      .select(g :+ col("nb") :+ col("nc") :+
        floor(col("d") * col("d") / col("e") * lit(1e9)).cast("long").as("nano"): _*)
      .groupBy(g: _*)
      .agg(first(col("nb")).as("n_base"), first(col("nc")).as("n_cur"),
        sum(col("nano")).as("nanos"))
      .select(g :+ col("n_base") :+ col("n_cur") :+
        expr(TextAnalysis.r6("cast(nanos as double) / 1e9")).as("chi2") :+
        (col("nanos") > col("n_cur") * Chi2Phi2AlertNanosPerRow).as("drifted"): _*)
      .orderBy(g: _*)
  }

  private def xDriftChi2: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    driftChi2(
      o.filter(col("o_orderdate") < lit(DriftCutoff)),
      o.filter(col("o_orderdate") >= lit(DriftCutoff)),
      numericCols = Seq("o_totalprice"),
      categoricalCols = Seq("o_orderstatus", "o_orderpriority"))
  }

  private val xDriftChi2Sql =
    s"""WITH base AS (SELECT * FROM orders WHERE o_orderdate < '$DriftCutoff'),
       |cur AS (SELECT * FROM orders WHERE o_orderdate >= '$DriftCutoff'),
       |ext AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM base),
       |bb AS (
       |  SELECT 'o_totalprice' AS "column",
       |    CAST(CASE WHEN mx IS NOT DISTINCT FROM mn THEN 0
       |      ELSE least(${PsiBuckets - 1}, greatest(0,
       |        CAST(floor((o_totalprice - mn) / (mx - mn) * $PsiBuckets) AS INT))) END AS VARCHAR) AS bucket
       |  FROM base CROSS JOIN ext
       |  UNION ALL SELECT 'o_orderstatus', coalesce(o_orderstatus, '<null>') FROM base
       |  UNION ALL SELECT 'o_orderpriority', coalesce(o_orderpriority, '<null>') FROM base),
       |cb2 AS (
       |  SELECT 'o_totalprice' AS "column",
       |    CAST(CASE WHEN mx IS NOT DISTINCT FROM mn THEN 0
       |      ELSE least(${PsiBuckets - 1}, greatest(0,
       |        CAST(floor((o_totalprice - mn) / (mx - mn) * $PsiBuckets) AS INT))) END AS VARCHAR) AS bucket
       |  FROM cur CROSS JOIN ext
       |  UNION ALL SELECT 'o_orderstatus', coalesce(o_orderstatus, '<null>') FROM cur
       |  UNION ALL SELECT 'o_orderpriority', coalesce(o_orderpriority, '<null>') FROM cur),
       |bcnt AS (SELECT "column", bucket, count(*) AS cb FROM bb GROUP BY "column", bucket),
       |ccnt AS (SELECT "column", bucket, count(*) AS cc FROM cb2 GROUP BY "column", bucket),
       |j AS (SELECT coalesce(b."column", c."column") AS "column",
       |        coalesce(b.bucket, c.bucket) AS bucket,
       |        coalesce(cb, 0) AS cb, coalesce(cc, 0) AS cc
       |      FROM bcnt b FULL OUTER JOIN ccnt c
       |        ON b."column" = c."column" AND b.bucket = c.bucket),
       |wk AS (SELECT *, count(*) OVER (PARTITION BY "column") AS kk,
       |         sum(cb) OVER (PARTITION BY "column") AS nb,
       |         sum(cc) OVER (PARTITION BY "column") AS nc
       |       FROM j),
       |ed AS (SELECT "column", nb, nc, cc,
       |         (cb + 1.0) * nc / (nb + kk) AS e
       |       FROM wk),
       |terms AS (SELECT "column", nb, nc,
       |    CAST(floor((cc - e) * (cc - e) / e * 1e9) AS BIGINT) AS nano
       |  FROM ed)
       |SELECT "column", CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_cur,
       |       floor((CAST(sum(nano) AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS chi2,
       |       sum(nano) > nc * $Chi2Phi2AlertNanosPerRow AS drifted
       |FROM terms GROUP BY "column", nb, nc ORDER BY "column"""".stripMargin

  // ----------------------------------------------------------------
  // Sketch-based corpus overlap (decontamination triage)
  // ----------------------------------------------------------------

  /** lgConfigK for the overlap sketches: 2¹⁵ = 32768 registers →
    * ~0.6% relative standard error in dense mode, exact below the
    * sparse-mode promotion point. 64 KB per sketch — mergeable
    * driver-side state, never a shuffle of the element universe. */
  private val OverlapLgK = 15

  /** Per-side estimate bound: ±2% + 32 absolute (≥ 3σ at lgK 15).
    * The intersection bound is stated against the UNION size (±5% + 64)
    * because inclusion–exclusion subtracts three estimates whose errors
    * each scale with the sets they sketch — the absolute intersection
    * error grows with |A∪B|, NOT with |A∩B|. That asymmetry is the
    * honest contract of sketch overlap: it detects *large* overlap
    * cheaply; a small intersection under a huge union needs the exact
    * join (d_contamination) to quantify. */
  private val OverlapSideTol = 0.02
  private val OverlapInterTol = 0.05

  /** Reusable sketch-overlap core: given two element frames (each a
    * single column of 8-byte keys), estimate |A|, |B|, |A∪B|, |A∩B|
    * from two mergeable HLL sketches — ONE narrow scan per corpus, a
    * 64 KB sketch each, no join anywhere on the production path. */
  def overlapSketch(a: DataFrame, b: DataFrame, keyCol: String,
      lgK: Int = OverlapLgK): DataFrame = {
    val ska = a.agg(hll_sketch_agg(col(keyCol), lgK).as("ska"))
    val skb = b.agg(hll_sketch_agg(col(keyCol), lgK).as("skb"))
    ska.crossJoin(broadcast(skb))
      .select(hll_sketch_estimate(col("ska")).as("est_a"),
        hll_sketch_estimate(col("skb")).as("est_b"),
        hll_sketch_estimate(hll_union(col("ska"), col("skb"))).as("est_union"))
      .withColumn("est_inter",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
  }

  /** `x_overlap_sketch` — the decontamination-triage question "how much
    * does corpus B share with corpus A?" answered WITHOUT a join: the
    * overlap of the two corpora's 5-gram shingle universes (the
    * [[Dedup]] shingle primitive: normalize → 5-gram → portable 8-byte
    * hash, all map-side) estimated by inclusion–exclusion over HLL
    * sketches. At 100 TB each corpus reduces to a 64 KB mergeable
    * sketch in one narrow scan — sketches from different days/sources
    * union associatively, so the estimate maintains incrementally while
    * the exact join would re-shuffle both shingle universes every time.
    *
    * Oracle discipline (the `a8`/`x_profile_approx` within-bounds
    * contract): exact counts come from the distinct-hash twin (run here
    * only to judge the bound; production runs the sketches alone) and
    * the estimates are contracted to the documented tolerances. */
  private def xOverlapSketch: Q = (s, dir) => {
    val sh = Dedup.shingleHashesOf(Tables.documents(s, dir))
    val a = sh.filter(col("doc_id") % 2 === 0).select(col("h"))
    val b = sh.filter(col("doc_id") % 2 === 1).select(col("h"))
    val est = overlapSketch(a, b, "h")
    val ad = a.distinct()
    val bd = b.distinct()
    val exact = ad.agg(count(lit(1)).as("n_a"))
      .crossJoin(broadcast(bd.agg(count(lit(1)).as("n_b"))))
      .crossJoin(broadcast(
        ad.join(bd, "h").agg(count(lit(1)).as("n_inter"))))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
    exact.crossJoin(broadcast(est))
      .select(col("n_a"), col("n_b"), col("n_inter"), col("n_union"),
        // one IEEE division of exact integers, half-up at 6 decimals —
        // the established portable-rounding discipline
        expr("floor((CAST(n_inter AS DOUBLE) / n_union) * 1e6 + 0.5) / 1e6")
          .as("jaccard"),
        (abs(col("est_a") - col("n_a"))
          <= col("n_a") * OverlapSideTol + 32).as("a_within_bounds"),
        (abs(col("est_b") - col("n_b"))
          <= col("n_b") * OverlapSideTol + 32).as("b_within_bounds"),
        (abs(col("est_union") - col("n_union"))
          <= col("n_union") * OverlapSideTol + 32).as("union_within_bounds"),
        (abs(col("est_inter") - col("n_inter"))
          <= col("n_union") * OverlapInterTol + 64).as("inter_within_bounds"))
  }

  private val xOverlapSketchSql = {
    import graft.functions.PortableHash
    val hashWin = PortableHash.duckPolyHash("sh")
    s"""WITH ${Dedup.duckShingleCte},
       |sh AS (SELECT doc_id, $hashWin AS h
       |       FROM (SELECT doc_id, unnest(shingles) AS sh FROM s)),
       |a AS (SELECT DISTINCT h FROM sh WHERE doc_id % 2 = 0),
       |b AS (SELECT DISTINCT h FROM sh WHERE doc_id % 2 = 1),
       |x AS (SELECT (SELECT count(*) FROM a) AS n_a,
       |             (SELECT count(*) FROM b) AS n_b,
       |             (SELECT count(*) FROM a JOIN b USING (h)) AS n_inter)
       |SELECT n_a, n_b, n_inter, n_a + n_b - n_inter AS n_union,
       |  floor((CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter)) * 1e6 + 0.5) / 1e6 AS jaccard,
       |  TRUE AS a_within_bounds, TRUE AS b_within_bounds,
       |  TRUE AS union_within_bounds, TRUE AS inter_within_bounds
       |FROM x""".stripMargin
  }

  /** `x_overlap_matrix` — the GROUPED form of the overlap sketch: ONE
    * scan of the corpus produces one HLL sketch PER SOURCE (the
    * sketch-column-per-partition layout a production lake keeps — a
    * sketch per day/source/shard, merged on demand), and every pairwise
    * source overlap is then inclusion–exclusion over the 20-row sketch
    * frame — no shingle ever crosses the network for the estimates.
    * This is what "which ingest feeds duplicate each other?" costs at
    * 100 TB: per-partition sketches maintained incrementally, a
    * sketch-count-sized self-join to answer ALL pairs.
    *
    * Exact twin (judging only, the a8 discipline): per-source distinct
    * shingles + an h-equality self-join for the true pair
    * intersections; same tolerances as [[xOverlapSketch]], intersection
    * bound against each pair's union. */
  private def xOverlapMatrix: Q = (s, dir) => {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val sh = Tables.documents(s, dir)
      .select(col("source"), explode(expr("graft_shingle_hashes(text)")).as("h"))
    val sk = sh.groupBy(col("source"))
      .agg(hll_sketch_agg(col("h"), OverlapLgK).as("sk"))
    val est = sk.select(col("source").as("src_a"), col("sk").as("ska"))
      .join(sk.select(col("source").as("src_b"), col("sk").as("skb")),
        col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        hll_sketch_estimate(col("ska")).as("est_a"),
        hll_sketch_estimate(col("skb")).as("est_b"),
        hll_sketch_estimate(hll_union(col("ska"), col("skb"))).as("est_union"))
      .withColumn("est_inter",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
    val d = sh.distinct()
    val n = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = d.as("x")
      .join(d.as("y"), col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    est
      .join(broadcast(n.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(n.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("n_union"),
        (abs(col("est_union") - col("n_union"))
          <= col("n_union") * OverlapSideTol + 32).as("union_within_bounds"),
        (abs(col("est_inter") - col("n_inter"))
          <= col("n_union") * OverlapInterTol + 64).as("inter_within_bounds"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val xOverlapMatrixSql = {
    import graft.functions.PortableHash
    val hashWin = PortableHash.duckPolyHash("sh")
    s"""WITH ${Dedup.duckShingleCteBySource},
       |sh AS (SELECT source, $hashWin AS h
       |       FROM (SELECT source, unnest(shingles) AS sh FROM s)),
       |d AS (SELECT DISTINCT source, h FROM sh),
       |n AS (SELECT source, count(*) AS n FROM d GROUP BY source),
       |i AS (SELECT x.source AS sa, y.source AS sb, count(*) AS ni
       |      FROM d x JOIN d y ON x.h = y.h AND x.source < y.source
       |      GROUP BY 1, 2)
       |SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b,
       |       coalesce(i.ni, 0) AS n_inter,
       |       a.n + b.n - coalesce(i.ni, 0) AS n_union,
       |       TRUE AS union_within_bounds, TRUE AS inter_within_bounds
       |FROM n a JOIN n b ON a.source < b.source
       |LEFT JOIN i ON i.sa = a.source AND i.sb = b.source
       |ORDER BY src_a, src_b""".stripMargin
  }

  // ----------------------------------------------------------------
  // Join-key skew diagnostics
  // ----------------------------------------------------------------

  /** Reducers the salt recommendation targets — the session's
    * `spark.sql.shuffle.partitions` at the sandbox scale; a cluster
    * run passes its own. */
  private val SkewPartitions = 32
  private val SkewTopN = 10

  /** Reusable skew-report core: per key of `keyCol`, `(key, cnt,
    * share_ppm, salt_factor, needs_salt)` for the heaviest `topN` keys.
    * `salt_factor` = ceil(cnt · partitions / total) — the number of
    * uniform-reducer shares this key alone would fill, i.e. exactly the
    * per-key split count a salted join (j4's pattern) needs to level
    * it. All integer arithmetic; the heaviest-keys cut is a
    * TakeOrderedAndProject, so the report never global-sorts. */
  def skewReport(df: DataFrame, keyCol: String,
      partitions: Int = SkewPartitions, topN: Int = SkewTopN): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"), col("total"), col("n_keys"),
        expr("CAST(cnt * 1000000 DIV total AS BIGINT)").as("share_ppm"),
        expr(s"CAST((cnt * $partitions + total - 1) DIV total AS BIGINT)")
          .as("salt_factor"))
      .withColumn("needs_salt", col("salt_factor") > 1L)
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
  }

  /** `x_skew_report` — the pre-flight a 100 TB join runs before
    * choosing between a plain shuffle, AQE skew handling, and explicit
    * salting: key-frequency diagnostics over the planned shuffle key.
    * The demo key is `l_returnflag` (3 values — the low-cardinality
    * "state/country column" shape where every key is pathological);
    * the report's `salt_factor` is precisely the `Salt` a j4-style
    * salted join should use per key. ONE map-side-combined groupBy on
    * the key; the output is key-cardinality-bounded and the top-N cut
    * is per-partition top-k + driver merge. */
  private def xSkewReport: Q = (s, dir) =>
    skewReport(Tables.lineitem(s, dir), "l_returnflag")

  private val xSkewReportSql =
    s"""WITH c AS (SELECT CAST(l_returnflag AS VARCHAR) AS key, count(*) AS cnt
       |           FROM lineitem GROUP BY 1),
       |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM c)
       |SELECT key, cnt, total, n_keys,
       |  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
       |  CAST((cnt * $SkewPartitions + total - 1) // total AS BIGINT) AS salt_factor,
       |  CAST((cnt * $SkewPartitions + total - 1) // total AS BIGINT) > 1 AS needs_salt
       |FROM c CROSS JOIN t
       |ORDER BY cnt DESC, key LIMIT $SkewTopN""".stripMargin

  // ----------------------------------------------------------------
  // Column-level lineage (governance over the analyzed plan)
  // ----------------------------------------------------------------

  /** `x_lineage` — [[graft.plans.Lineage.columnLineage]] over a
    * representative join+aggregate: the oracle is the KNOWN dependency
    * set (a VALUES relation — lineage is a property of the PLAN, not
    * the data, so the expected rows are exact and fixed). Pins that
    * the extractor resolves aliases, aggregate expressions, and join
    * pass-throughs to the right scan leaves. */
  private def xLineage: Q = (s, dir) => {
    val q = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderdate"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        countDistinct(col("o_custkey")).as("n_custs"))
    graft.plans.Lineage.columnLineage(q)
  }

  private val xLineageSql =
    """SELECT * FROM (VALUES
      |  ('n_custs', 'orders', 'o_custkey'),
      |  ('o_orderdate', 'orders', 'o_orderdate'),
      |  ('revenue', 'lineitem', 'l_discount'),
      |  ('revenue', 'lineitem', 'l_extendedprice'))
      |  AS t("column", source_table, source_column)
      |ORDER BY "column", source_table, source_column""".stripMargin

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "x_profile" -> xProfile,
    "x_profile_approx" -> xProfileApprox,
    "x_expectations" -> xExpectations,
    "x_expectations_sliced" -> xExpectationsSliced,
    "x_quarantine" -> xQuarantine,
    "x_drift_psi" -> xDriftPsi,
    "x_drift_psi_sliced" -> xDriftPsiSliced,
    "x_drift_psi_ivm" -> xDriftPsiIvm,
    "x_drift_ks" -> xDriftKs,
    "x_drift_chi2" -> xDriftChi2,
    "x_drift_w1" -> xDriftW1,
    "x_overlap_sketch" -> xOverlapSketch,
    "x_overlap_matrix" -> xOverlapMatrix,
    "x_skew_report" -> xSkewReport,
    "x_lineage" -> xLineage)

  val oracles: Map[String, String] = Map(
    "x_profile" -> xProfileSql,
    "x_profile_approx" -> xProfileApproxSql,
    "x_expectations" -> xExpectationsSql,
    "x_expectations_sliced" -> xExpectationsSlicedSql,
    "x_quarantine" -> xQuarantineSql,
    "x_drift_psi" -> xDriftPsiSql,
    "x_drift_psi_sliced" -> xDriftPsiSlicedSql,
    // the IVM variant must equal the full recompute — same oracle text
    "x_drift_psi_ivm" -> xDriftPsiSql,
    "x_drift_ks" -> xDriftKsSql,
    "x_drift_chi2" -> xDriftChi2Sql,
    "x_drift_w1" -> xDriftW1Sql,
    "x_overlap_sketch" -> xOverlapSketchSql,
    "x_overlap_matrix" -> xOverlapMatrixSql,
    "x_skew_report" -> xSkewReportSql,
    "x_lineage" -> xLineageSql)
}
