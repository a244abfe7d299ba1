package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableHash

/** Deterministic sampling operators for pipeline development at scale.
  *
  * `TABLESAMPLE` / `df.sample` draw from a seeded RNG whose stream
  * depends on partitioning — unreproducible across engines and across
  * re-partitioned re-runs. Hash-mod sampling (keep a row iff
  * hash(content) mod M < k) is the form large corpus pipelines use:
  * stable under re-partitioning and re-runs, joinable (the same doc is
  * in or out everywhere), per-stratum tunable, and exactly twinnable in
  * the oracle. Pure narrow projections — the filter runs inside the
  * scan's codegen stage, zero shuffle.
  */
object Sampling {
  type Q = (SparkSession, String) => DataFrame

  /** 10% uniform sample of documents by content-hash mod 100. */
  private def p8HashSample: Q = (s, dir) => {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .filter(expr("pmod(graft_polyhash(text), 100)") < 10)
      .select(col("doc_id"), col("lang"))
  }

  private val p8HashSampleSql =
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${PortableHash.duckPolyHash("text")} % 100 < 10""".stripMargin

  /** Stratified sample: per-language keep-rates (en 20%, de 5%,
    * others 10%) — the rebalancing knob a multilingual corpus needs. */
  private def p9StratifiedSample: Q = (s, dir) => {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val rate = when(col("lang") === "en", 20)
      .when(col("lang") === "de", 5).otherwise(10)
    Tables.documents(s, dir)
      .filter(expr("pmod(graft_polyhash(text), 100)") < rate)
      .select(col("doc_id"), col("lang"))
  }

  private val p9StratifiedSampleSql =
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${PortableHash.duckPolyHash("text")} % 100 <
       |      CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 5 ELSE 10 END""".stripMargin

  private val Quota = 40

  /** EXACT per-stratum quotas — the balanced-training-mix sampler
    * ("exactly N docs per language"): rank each stratum by
    * (content-hash, tiebreak) and keep the first `quota` as column
    * `rk`. Rate-based sampling ([[p9StratifiedSample]]) cannot hit an
    * exact count; the hash order makes the chosen set deterministic,
    * re-run-stable, and engine-portable. One shuffle on the stratum
    * key; the per-group sort is k-bounded in practice (the window
    * truncates early under whole-stage codegen; for huge strata the
    * same contract is available via `graft_topk`). THE one
    * implementation — the harness query and [[graft.Graft.sampling]]
    * both bind it. */
  def quotaPerStratum(df: DataFrame, stratumCol: String, contentCol: String,
      tieCol: String, quota: Int): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(df.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(call_function("graft_polyhash", col(contentCol)), col(tieCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
  }

  private def p10QuotaSample: Q = (s, dir) =>
    quotaPerStratum(Tables.documents(s, dir), "lang", "text", "doc_id", Quota)
      .select(col("doc_id"), col("lang"), col("rk"))

  // keeps ~2/3 of each fixture stratum (strata total 1100–1600 tokens)
  // so the cutoff genuinely fires in the oracle comparison
  private val TokenBudget = 1000L

  /** Token-BUDGET sampling per stratum — the unit training mixtures
    * are actually specified in ("this many code tokens, this many
    * wiki tokens"), where [[quotaPerStratum]] counts documents: rank
    * each stratum by (content-hash, tiebreak) and keep documents
    * while the RUNNING token total stays within the stratum's budget
    * (strict ≤ — the doc that would overshoot is excluded, as is
    * everything after it in hash order). Hash order makes the kept
    * set deterministic, re-run-stable, and engine-portable; the
    * running sum is a rows-unbounded-preceding window inside the
    * stratum — one shuffle on the stratum key, same scale contract
    * (and the same big-stratum caveat) as the quota sampler. THE one
    * implementation — harness query and façade both bind it. */
  def tokenBudgetPerStratum(df: DataFrame, stratumCol: String,
      textCol: String, tieCol: String, budget: Long): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(df.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(call_function("graft_polyhash", col(textCol)), col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // coalesce: size(split(NULL)) is -1 in non-ANSI Spark — a NULL-text
    // row would DECREMENT the running budget and over-admit later docs
    df.withColumn("n_tokens",
        size(split(trim(coalesce(col(textCol), lit(""))), "\\s+")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  private def p12TokenBudget: Q = (s, dir) =>
    tokenBudgetPerStratum(Tables.documents(s, dir), "source", "text",
        "doc_id", TokenBudget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))

  /** Per-stratum mixing accounting: (stratum, n_rows, n_tokens,
    * token_share, uniform_weight) — the resampling factors that would
    * hit a uniform target mixture over `stratumCol`. ONE input scan:
    * the corpus totals come from a whole-frame window over the
    * ALREADY-AGGREGATED strata-sized frame (a separate totals
    * aggregate + join would re-derive the lineage and scan the input
    * twice; the unpartitioned window is harmless because its input is
    * post-agg, strata-sized at any scale). THE one implementation —
    * the harness query (t_mixture_weights) and the façade bind it. */
  def mixtureWeights(df: DataFrame, stratumCol: String, textCol: String): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.select(col(stratumCol).as("stratum"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("toks"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_rows"), sum(col("toks")).as("n_tokens"))
      .withColumn("total_tokens", sum(col("n_tokens")).over(wAll))
      .withColumn("n_strata", count(lit(1)).over(wAll))
      .select(col("stratum"), col("n_rows"), col("n_tokens"),
        round(col("n_tokens") / col("total_tokens"), 6).as("token_share"),
        round((lit(1.0) / col("n_strata")) /
          (col("n_tokens") / col("total_tokens")), 6).as("uniform_weight"))
  }

  private val p10QuotaSampleSql =
    s"""SELECT doc_id, lang, rk FROM (
       |  SELECT doc_id, lang,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY ${PortableHash.duckPolyHash("text")}, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $Quota""".stripMargin

  private val p12TokenBudgetSql =
    s"""SELECT doc_id, source, n_tokens, cum_tokens FROM (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM (SELECT doc_id, source,
       |          len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'))::BIGINT AS n_tokens,
       |          ${PortableHash.duckPolyHash("text")} AS h
       |        FROM documents))
       |WHERE cum_tokens <= $TokenBudget""".stripMargin

  // ----------------------------------------------------------------
  // Deterministic train/validation/test split
  // ----------------------------------------------------------------

  /** Content-hash split bands out of 100: [0,90) train, [90,95)
    * validation, [95,100) test. private[graft]: oracle SQL builders
    * (p11, the release manifest) interpolate them so the bands cannot
    * drift between the pipeline and its oracles. */
  private[graft] val TrainBand = 90
  private[graft] val ValBand = 95

  /** Deterministic 3-way corpus split — the train/val/test assignment
    * a training pipeline makes ONCE and must never revisit: membership
    * is a pure function of the content hash, so it is identical across
    * engines, re-runs, and re-partitionings, and a document can never
    * migrate between train and the held-out splits when the corpus is
    * re-sharded or backfilled (the invariant decontamination audits
    * assume; a seeded `randomSplit` holds it only for one partitioning
    * of one engine). Narrow projection inside the scan's codegen
    * stage — zero shuffle at any corpus size. THE one implementation:
    * the harness query and [[graft.Graft]]'s facade both bind it. */
  def splitByHash(df: DataFrame, contentCol: String): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(df.sparkSession)
    // call_function on the composed Column, not SQL-string
    // interpolation: qualified/aliased/reserved-word column names work
    // (the same rule as Graft.text.fingerprint)
    df.withColumn("split_band",
        pmod(call_function("graft_polyhash", col(contentCol)), lit(100)))
      .withColumn("split", splitFromBand(col("split_band")))
  }

  /** The ONE band→label mapping, shared by [[splitByHash]] and
    * consumers that carry a precomputed `split_band` (CleanCorpus's
    * release manifest) so the thresholds can't drift. */
  private[graft] def splitFromBand(band: Column): Column =
    when(band < TrainBand, "train")
      .when(band < ValBand, "validation")
      .otherwise("test")

  private def p11Split: Q = (s, dir) =>
    splitByHash(Tables.documents(s, dir), "text")
      .select(col("doc_id"), col("lang"), col("split_band"), col("split"))

  private val p11SplitSql =
    s"""SELECT doc_id, lang, split_band,
       |  CASE WHEN split_band < $TrainBand THEN 'train'
       |       WHEN split_band < $ValBand THEN 'validation'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, lang,
       |        ${PortableHash.duckPolyHash("text")} % 100 AS split_band
       |      FROM documents)""".stripMargin

  /** Group-aware split by an arbitrary group column: every row's band
    * comes from the hash of its GROUP id, so a group can never
    * straddle splits. The generalized core of [[p15GroupSplit]]. */
  def splitByGroup(df: DataFrame, groupCol: String): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(df.sparkSession)
    df.withColumn("split_band",
        pmod(call_function("graft_polyhash", col(groupCol).cast("string")), lit(100)))
      .withColumn("split",
        when(col("split_band") < TrainBand, "train")
          .when(col("split_band") < ValBand, "validation")
          .otherwise("test"))
  }

  /** `p15_group_split` — the LEAKAGE-GUARDED train/val/test split: the
    * per-row hash split (`p11`) lets two near-duplicate documents land
    * in different splits, silently leaking training text into the
    * held-out sets — the classic contamination path a 100 TB corpus
    * hits constantly (mirrors, boilerplate families, re-crawls). Here
    * the split key is the document's near-dup CLUSTER id (the
    * connected-component canonical the dedup family already
    * computes), so an entire duplicate family moves as ONE unit:
    * either all train or all held-out. Cost on top of the cluster
    * pass: one narrow projection — and the cluster pass is the dedup
    * work the pipeline runs anyway. */
  private def p15GroupSplit: Q = (s, dir) =>
    splitByGroup(Dedup.clusterVerdicts(s, dir), "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("split_band"), col("split"))

  private val p15GroupSplitSql =
    s"""WITH RECURSIVE ${Dedup.duckClusterCte}
       |SELECT doc_id, cluster_id, split_band,
       |  CASE WHEN split_band < $TrainBand THEN 'train'
       |       WHEN split_band < $ValBand THEN 'validation'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster_id,
       |        ${PortableHash.duckPolyHash("CAST(cluster_id AS VARCHAR)")} % 100 AS split_band
       |      FROM cl)""".stripMargin

  // ---- UniMax-ENFORCED sampling: the budgets drive the sampler ----

  /** p13: UniMax budgets APPLIED — the waterfilled per-language token
    * allocations (`t_unimax`) become the actual budgets of the
    * hash-ordered token-prefix sampler (`p12`'s discipline), closing
    * the loop from budget REPORT to enforced training MIXTURE. Per
    * language the kept set is the deterministic hash-order prefix
    * whose running token sum stays within ⌊allocated⌋; the output is
    * the per-language accounting (docs kept, tokens kept, budget —
    * tokens_kept ≤ budget_tokens by construction). One corpus scan
    * plus one lang-key window; the budget frame is |languages|-sized
    * and broadcast. Token counts use the SAME tokenizer as the
    * allocation (unimax's), so budget and consumption measure one
    * thing. */
  private def p13UnimaxSample: Q = (s, dir) => {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), coalesce(col("text"), lit("")).as("text"))
      .withColumn("ntok",
        size(filter(TextAnalysis.tokens(col("text")), t => t =!= "")).cast("long"))
    val budgets = TextAnalysis.unimaxOf(
        docs.groupBy(col("lang")).agg(sum(col("ntok")).as("c")),
        e = 2L, bNum = 8L, bDen = 5L)
      .select(col("lang"), floor(col("allocated")).cast("long").as("budget_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(call_function("graft_polyhash", col("text")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("cum", sum(col("ntok")).over(w))
      .join(broadcast(budgets), "lang")
      .filter(col("cum") <= col("budget_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("ntok")).as("tokens_kept"),
        first(col("budget_tokens")).as("budget_tokens"))
      .orderBy(col("lang"))
  }

  private val p13UnimaxSampleSql = {
    val toks = TextAnalysis.duckTokens("coalesce(text, '')")
    val alloc = TextAnalysis.r6("CASE WHEN k <= kstar THEN CAST(2 * c AS DOUBLE) " +
      "ELSE CAST(b - 2 * pstar AS DOUBLE) / (n - kstar) END")
    s"""WITH d AS (SELECT doc_id, lang, coalesce(text, '') AS text,
       |             CAST(len(list_filter($toks, t -> t <> ''))
       |               AS BIGINT) AS ntok
       |           FROM documents),
       |c AS (SELECT lang, CAST(sum(ntok) AS BIGINT) AS c FROM d GROUP BY lang),
       |ranked AS (SELECT lang, c,
       |    CAST(row_number() OVER (ORDER BY c, lang) AS BIGINT) AS k,
       |    sum(c) OVER (ORDER BY c, lang ROWS UNBOUNDED PRECEDING) AS p
       |  FROM c),
       |stats AS (SELECT count(*) AS n, (8 * sum(c)) // 5 AS b FROM c),
       |flags AS (SELECT k, p FROM ranked CROSS JOIN stats
       |          WHERE 2 * c * (n - k) <= b - 2 * p),
       |kstar AS (SELECT coalesce(max(k), 0) AS kstar,
       |                 coalesce(max(p), 0) AS pstar FROM flags),
       |alloc AS (SELECT lang, CAST(floor($alloc) AS BIGINT) AS budget_tokens
       |          FROM ranked CROSS JOIN stats CROSS JOIN kstar),
       |cum AS (SELECT doc_id, lang, ntok,
       |          CAST(sum(ntok) OVER (PARTITION BY lang
       |            ORDER BY ${PortableHash.duckPolyHash("text")}, doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |        FROM d)
       |SELECT lang, count(*) AS n_docs_kept,
       |       CAST(sum(ntok) AS BIGINT) AS tokens_kept,
       |       CAST(max(budget_tokens) AS BIGINT) AS budget_tokens
       |FROM cum JOIN alloc USING (lang)
       |WHERE cum <= budget_tokens
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---- Temperature-scaled mixture sampling (τ = 2) ----

  /** Budget = 2/5 of the corpus's total tokens — same envelope as the
    * UniMax demo so the two mixture rules are directly comparable. */
  private val TempBudgetNum = 2L
  private val TempBudgetDen = 5L

  /** p16: TEMPERATURE sampling — the classic multilingual mixture
    * rule (Conneau et al., XLM-R 2020; mT5): per-language sampling
    * mass ∝ c_l^(1/τ). Where UniMax (p13) CAPS head languages and
    * waterfills the remainder, temperature RESHAPES the whole
    * distribution, smoothly boosting tail languages — the two rules a
    * multilingual pretraining run actually chooses between, now both
    * enforced by the same hash-order token-prefix sampler.
    *
    * Portability discipline: τ = 2 makes the weight sqrt(c_l) — IEEE
    * sqrt is correctly rounded in BOTH engines (unlike pow/ln, the
    * p14 lesson) — and each weight is quantized to a nano-integer
    * BEFORE the sum, so the budget split
    * budget_l = B · nano_l div Σnano is exact integer arithmetic end
    * to end (DECIMAL(38,0) / HUGEINT product, overflow-free at any
    * corpus size; no float boundary decides a budget). The kept set
    * is the per-language deterministic hash-order prefix whose
    * running token sum stays within budget (p12/p13 discipline).
    * One corpus scan plus one lang-key window; the budget frame is
    * |languages|-sized and broadcast. */
  private def p16TemperatureSample: Q = (s, dir) => {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), coalesce(col("text"), lit("")).as("text"))
      .withColumn("ntok",
        size(filter(TextAnalysis.tokens(col("text")), t => t =!= "")).cast("long"))
    // totals from a post-agg window over the |languages|-row frame —
    // NOT a re-derived aggregate, which would re-scan the corpus (the
    // t_mixture_weights plan discipline)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val budgets = docs.groupBy(col("lang")).agg(sum(col("ntok")).as("c"))
      .withColumn("nano",
        floor(sqrt(col("c").cast("double")) * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("nanosum", sum(col("nano")).over(wAll))
      .withColumn("ctot", sum(col("c")).over(wAll))
      .select(col("lang"), expr(
        s"""CAST(CAST(ctot * $TempBudgetNum div $TempBudgetDen AS DECIMAL(38,0))
           | * nano div nanosum AS BIGINT)""".stripMargin)
        .as("budget_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(call_function("graft_polyhash", col("text")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("cum", sum(col("ntok")).over(w))
      .join(broadcast(budgets), "lang")
      .filter(col("cum") <= col("budget_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("ntok")).as("tokens_kept"),
        first(col("budget_tokens")).as("budget_tokens"))
      .orderBy(col("lang"))
  }

  private val p16TemperatureSampleSql = {
    val toks = TextAnalysis.duckTokens("coalesce(text, '')")
    s"""WITH d AS (SELECT doc_id, lang, coalesce(text, '') AS text,
       |             CAST(len(list_filter($toks, t -> t <> ''))
       |               AS BIGINT) AS ntok
       |           FROM documents),
       |c AS (SELECT lang, CAST(sum(ntok) AS BIGINT) AS c FROM d GROUP BY lang),
       |wt AS (SELECT lang, c,
       |         CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS nano
       |       FROM c),
       |tot AS (SELECT CAST(sum(nano) AS BIGINT) AS nanosum,
       |               CAST(sum(c) AS BIGINT) AS ctot FROM wt),
       |alloc AS (SELECT lang,
       |    CAST(CAST(ctot * $TempBudgetNum // $TempBudgetDen AS HUGEINT)
       |      * nano // nanosum AS BIGINT) AS budget_tokens
       |  FROM wt CROSS JOIN tot),
       |cum AS (SELECT doc_id, lang, ntok,
       |          CAST(sum(ntok) OVER (PARTITION BY lang
       |            ORDER BY ${PortableHash.duckPolyHash("text")}, doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |        FROM d)
       |SELECT lang, count(*) AS n_docs_kept,
       |       CAST(sum(ntok) AS BIGINT) AS tokens_kept,
       |       CAST(max(budget_tokens) AS BIGINT) AS budget_tokens
       |FROM cum JOIN alloc USING (lang)
       |WHERE cum <= budget_tokens
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  private val PriorityN = 50L
  private val PriorityMod = 1000003L // prime ≫ corpus, so u is near-uniform

  /** P14: WEIGHTED sampling without replacement by PRIORITY SAMPLING
    * (Duffield, Lund & Thorup, JACM 2007): priority = u / w with
    * u ~ U deterministic from the content hash and w the row's
    * weight (here n_chars — longer documents proportionally likelier,
    * the token-budget-aware corpus-mixing draw); keep the n smallest
    * priorities. Chosen over Efraimidis–Spirakis keys u^(1/w): E-S
    * needs `pow`/`ln`, whose last-ulp behavior is libm-specific and
    * NOT engine-portable at floor boundaries — priority sampling's
    * key is ONE IEEE division of exact integers, the established
    * portability discipline, and carries the same
    * inclusion-probability ∝ weight semantics (P[keep] = min(1, w/τ)
    * at threshold τ = the (n+1)-th priority, which also makes
    * max(w, τ) an unbiased subset-sum estimator).
    *
    * Scale shape: the candidate key is a narrow map-side projection;
    * top-n is TakeOrderedAndProject (per-partition partial top-n,
    * driver merge — no global sort); only the n-row result pays the
    * rank window. Deterministic, re-run-stable, joinable — the
    * [[p8HashSample]] arguments with weights. */
  private def p14PrioritySample: Q = (s, dir) => {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val top = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (expr(s"cast(pmod(graft_polyhash(text), $PriorityMod) + 1 as double)")
          / greatest(col("n_chars"), lit(1L)).cast("double")).as("priority"))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(PriorityN.toInt)
    top.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("priority").asc, col("doc_id").asc)).cast("long"))
      .select(col("rk"), col("doc_id"), col("lang"), col("n_chars"),
        expr(TextAnalysis.r6("priority")).as("priority"))
  }

  private val p14PrioritySampleSql =
    s"""WITH d AS (SELECT doc_id, lang, n_chars,
       |    CAST((${PortableHash.duckPolyHash("text")}) % $PriorityMod + 1 AS DOUBLE)
       |      / CAST(greatest(n_chars, 1) AS DOUBLE) AS priority
       |  FROM documents)
       |SELECT rk, doc_id, lang, n_chars,
       |       floor(priority * 1e6 + 0.5) / 1e6 AS priority
       |FROM (SELECT *, CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rk
       |      FROM d)
       |WHERE rk <= $PriorityN""".stripMargin

  val queries: Map[String, Q] = Map(
    "p14_priority_sample" -> p14PrioritySample,
    "p8_hash_sample" -> p8HashSample,
    "p9_stratified_sample" -> p9StratifiedSample,
    "p10_quota_sample" -> p10QuotaSample,
    "p11_split" -> p11Split,
    "p15_group_split" -> p15GroupSplit,
    "p12_token_budget" -> p12TokenBudget,
    "p13_unimax_sample" -> p13UnimaxSample,
    "p16_temperature_sample" -> p16TemperatureSample)

  val oracles: Map[String, String] = Map(
    "p14_priority_sample" -> p14PrioritySampleSql,
    "p8_hash_sample" -> p8HashSampleSql,
    "p9_stratified_sample" -> p9StratifiedSampleSql,
    "p10_quota_sample" -> p10QuotaSampleSql,
    "p11_split" -> p11SplitSql,
    "p15_group_split" -> p15GroupSplitSql,
    "p12_token_budget" -> p12TokenBudgetSql,
    "p13_unimax_sample" -> p13UnimaxSampleSql,
    "p16_temperature_sample" -> p16TemperatureSampleSql)
}
