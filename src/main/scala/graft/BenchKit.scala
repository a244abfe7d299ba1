package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared measurement plumbing for [[Bench]] and [[ScaleCurve]] — one
  * copy of the methodology so the two stay comparable: thread cap
  * (ncpu − 2, the measured straggler fix from SURVEY §6), session
  * config, JVM/codegen warmup, noop-write forcing (honest full-plan
  * cost — count() lets Catalyst prune projections), and the
  * Locale-safe millisecond formatter. */
object BenchKit {

  /** local[threads] session with `cpus` shuffle partitions; threads
    * leave 2 cores for the launcher + driver dispatcher (measured
    * 146 s → 77 s for the full suite at sf0.1 on 32 vCPUs). Shuffle
    * width stays at the requested cpus — partition SIZING is about
    * data, not the local thread count. */
  def session(cpus: Int): SparkSession = {
    val threads = math.max(1, math.min(cpus, Runtime.getRuntime.availableProcessors() - 2))
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC everywhere: the events loader's TIMESTAMP_NTZ branch casts
      // through the session zone, so a non-UTC host would shift
      // instants relative to the (UTC-pinned) Verify/oracle sessions
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Initialize codegen/parquet machinery so the first timed query
    * isn't charged for JVM startup. */
  def warmup(spark: SparkSession, sfDir: String): Unit = {
    spark.range(100000).selectExpr("sum(id)").collect()
    try { spark.read.parquet(s"$sfDir/region.parquet").count(); () }
    catch { case _: Throwable => () }
  }

  /** Force with a noop WRITE, not count(): count() lets Catalyst prune
    * every projection not needed for row counting; the noop sink
    * evaluates every output column — the honest cost of the
    * materialized plan. Clears the cache after (queries are
    * independent; accumulated cache becomes GC pressure that taxes
    * later queries). Returns (seconds, succeeded). */
  def timeNoop(spark: SparkSession, df: => DataFrame): (Double, Boolean) = {
    val t0 = System.nanoTime()
    val ok = try { df.write.mode("overwrite").format("noop").save(); true }
      catch { case _: Throwable => false }
    val t = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    (t, ok)
  }

  /** Millisecond-precision, Locale.ROOT (a comma-decimal default
    * locale must not corrupt the JSON). */
  def ms(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
}
