package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * (content-hash, doc_id) and keep the first `Quota`. Rate-based
    * sampling ([[p9StratifiedSample]]) cannot hit an exact count; the
    * hash order makes the chosen set deterministic, re-run-stable, and
    * engine-portable (ties broken by doc_id). One shuffle on the
    * stratum key; the per-group sort is k-bounded in practice (window
    * rank over lang partitions — languages are few and the window
    * truncates early under whole-stage codegen; for huge strata the
    * same contract is available via `graft_topk`). */
  private def p10QuotaSample: Q = (s, dir) => {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(expr("graft_polyhash(text)"), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Quota)
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
  }

  private val p10QuotaSampleSql =
    s"""SELECT doc_id, lang, rk FROM (
       |  SELECT doc_id, lang,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY ${PortableHash.duckPolyHash("text")}, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $Quota""".stripMargin

  val queries: Map[String, Q] = Map(
    "p8_hash_sample" -> p8HashSample,
    "p9_stratified_sample" -> p9StratifiedSample,
    "p10_quota_sample" -> p10QuotaSample)

  val oracles: Map[String, String] = Map(
    "p8_hash_sample" -> p8HashSampleSql,
    "p9_stratified_sample" -> p9StratifiedSampleSql,
    "p10_quota_sample" -> p10QuotaSampleSql)
}
