package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyword → category lexicon for the text classifier (the reference's
  * 21-row keyword→practice matrix, hi-csa-db.Rmd:497-509, re-targeted at
  * the harness `documents` vocabulary). Keywords are case-insensitive
  * regexes matched against TOKENS of punctuation-normalized text —
  * substring semantics ("cover" matches "covering"), exactly the
  * reference's `grepl(kw, token, ignore.case=TRUE)` (Rmd:75-88).
  */
object Lexicon {
  val entries: Seq[(String, String)] = Seq(
    "spark"    -> "Engine",
    "join"     -> "Relational Join",
    "stream"   -> "Streaming",
    "vector"   -> "Vector Search",
    "agg"      -> "Aggregation",
    "window"   -> "Windowing",
    "hash"     -> "Hashing",
    "sort"     -> "Sorting",
    "scan"     -> "Scan",
    "merge"    -> "Merge",
    "filter"   -> "Filter",
    "batch"    -> "Batch Processing")

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("keyword", "practice")
  }

  /** Spark SQL array<struct<k,p>> literal (for higher-order-function use). */
  def sparkArrayLiteral: String =
    entries.map { case (k, p) => s"named_struct('k', '$k', 'p', '$p')" }
      .mkString("array(", ", ", ")")

  /** DuckDB list-of-structs literal computing the same value. */
  def duckListLiteral: String =
    entries.map { case (k, p) => s"{'k': '$k', 'p': '$p'}" }
      .mkString("[", ", ", "]")

  /** DuckDB VALUES clause for the lexicon as a CTE relation. */
  def duckValues: String =
    entries.map { case (k, p) => s"('$k', '$p')" }.mkString(", ")
}
