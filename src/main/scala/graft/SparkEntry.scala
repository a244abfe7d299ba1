package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Graph, Multimodal, Quality, Relational, RelationalExt, Sampling, Scrape, Similarity, SqlSurface, Temporal, TextAnalysis, TextIndex, TimeSeries}
import graft.pipelines.{CleanCorpus, Flagship}
import graft.sources.CorpusStore
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's named operators; each key has a
  * DuckDB-equivalent oracle in `oracleSql` (same column names, same
  * values) unless the op is genuinely not SQL-expressible.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (RelationalExt.queries, RelationalExt.oracles),
      (SqlSurface.queries, SqlSurface.oracles),
      (Quality.queries, Quality.oracles),
      (Temporal.queries, Temporal.oracles),
      (TimeSeries.queries, TimeSeries.oracles),
      (Sampling.queries, Sampling.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (TextIndex.queries, TextIndex.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (Graph.queries, Graph.oracles),
      (EventStreams.queries, EventStreams.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Scrape.queries, Scrape.oracles),
      (Flagship.queries, Flagship.oracles),
      (CleanCorpus.queries, CleanCorpus.oracles),
      (CorpusStore.queries, CorpusStore.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.policyDb(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each query is
    * wrapped to first register graft's native Catalyst expressions
    * (idempotent, per-session). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _).map { case (name, fn) =>
      name -> { (s: SparkSession, dir: String) =>
        org.apache.spark.sql.graft.GraftFunctions.register(s)
        fn(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
