package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; all table
  * access goes through here so the scan surface stays uniform (parquet,
  * column-pruned + filter-pushed by Catalyst — verify with
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across harness data
    * generations: TIMESTAMP(NANOS) (which Spark 4 only reads as a long,
    * via the legacy conf), TIMESTAMP(MICROS) without timezone (read as
    * TIMESTAMP_NTZ), or a plain instant. Normalize all three to the
    * session-UTC TimestampType every consumer expects; DuckDB reads the
    * same file natively as TIMESTAMP either way, so oracle parity is
    * preserved. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.withColumn("ts", normalizedEventTs(raw.schema("ts").dataType))
  }

  /** The ts-normalizing column for a given physical type — shared with
    * the streaming source so batch and stream agree byte-for-byte.
    *
    * Every branch is SESSION-TIMEZONE-INDEPENDENT: the nanos-long
    * branch is epoch arithmetic, the instant branch is already
    * absolute, and the NTZ branch pins its wall-clock interpretation
    * to UTC explicitly via make_timestamp(..., 'UTC') — a plain
    * `cast(ts as timestamp)` would read the wall clock in whatever
    * spark.sql.session.timeZone the calling session happens to run
    * (the entry points all pin UTC, but correctness must not depend
    * on which session builder ran first). extract(SECOND) carries the
    * fractional micros (DECIMAL(8,6)), so sub-second precision
    * survives. */
  def normalizedEventTs(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    dt match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType => expr(
        "make_timestamp(year(ts), month(ts), day(ts), hour(ts), minute(ts), " +
          "extract(SECOND FROM ts), 'UTC')")
      case _                => col("ts")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Spread a low-parallelism scan across the session's cores before a
    * HEAVY per-row pass (the multimodal codec round-trips: PNG/WAV
    * encode + decode per row). The harness parquet files are
    * single-row-group, so a scan plans ONE task no matter the core
    * count — profiled, the video featurize ran 2.4 s serial at
    * local[30] while 29 cores idled. When the scan plans fewer
    * partitions than `defaultParallelism`, a round-robin repartition
    * (deterministic: Spark sorts before round-robin, SPARK-23207)
    * moves the few narrow rows once and unlocks the cores; any
    * real-scale input already has enough splits, so this is the
    * identity there and no extra exchange is ever paid (guide §2.6
    * stragglers/idle capacity). NOT worth it before cheap per-row
    * passes (measured: it LOST time on the tokenize/shingle scans —
    * task+shuffle overhead exceeds the ~0.4 s serial saving); reserve
    * it for decode-grade work, ~1 ms+/row. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
