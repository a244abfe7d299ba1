package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Quality

/** Continuous PSI drift monitoring over a streamed table — the
  * incremental-maintenance identity `x_drift_psi_ivm` proves, run for
  * real: the baseline (extents + bucket counts) is frozen ONCE, then
  * every micro-batch contributes only its OWN bucket counts
  * (additive), so the monitor's per-batch work is one narrow scan of
  * the batch regardless of how much history has accumulated. A 100 TB
  * table under continuous ingest never rescans the accumulated
  * current version; `report` materializes the PSI table from
  * bucket-count-sized state whenever asked.
  *
  * State discipline: the running counts live on the driver as a
  * (column, bucket) → n map — (numericCols·buckets + categorical
  * cardinality) entries, the k-means-model convention for
  * driver-sized reads. Replay safety is per batch id: a replay of an
  * already-absorbed micro-batch within the session is a no-op, so
  * at-least-once delivery yields exactly-once counts. The state is
  * SESSION-LIFETIME by design (a restarted query's checkpoint marks
  * old batches committed, so they do not replay into a fresh
  * monitor): DURABLE monitoring routes the same mergeable counts
  * through a stored table instead — persist each batch's
  * [[Quality.psiBucketCounts]] delta and refresh with
  * [[graft.Graft.mergeAggStates]], the exact identity
  * `x_drift_psi_ivm` proves; this in-memory monitor is the
  * dashboard-session form.
  */
class DriftMonitor private[streaming] (
    baseCounts: Seq[(String, String, Long)],
    extents: Map[String, (Option[Double], Option[Double])],
    numericCols: Seq[String], categoricalCols: Seq[String],
    buckets: Int, alert: Double) extends Serializable {

  private val cur = mutable.Map.empty[(String, String), Long]
  private val applied = mutable.Set.empty[Long]

  /** Fold one micro-batch's bucket counts into the running
    * current-version state (bucket-count-sized collect; one narrow
    * scan of the batch). Absorbing a batch id twice is a no-op. */
  def absorb(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (applied.add(batchId)) {
      Quality.psiBucketCounts(batch, numericCols, categoricalCols,
          extents, buckets)
        .collect().foreach { r =>
          val k = (r.getString(0), r.getString(1))
          cur(k) = cur.getOrElse(k, 0L) + r.getLong(2)
        }
    }
  }

  /** The PSI report (column, n_base, n_cur, psi, drifted) for
    * everything absorbed so far against the frozen baseline — equals
    * [[Quality.driftPsi]] of the baseline vs the union of absorbed
    * batches EXACTLY (integer bucket counts; the `x_drift_psi_ivm`
    * identity). */
  def report(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    Quality.psiFromCounts(
      baseCounts.toDF("column", "bucket", "n"),
      cur.toSeq.map { case ((c, b), n) => (c, b, n) }
        .toDF("column", "bucket", "n"),
      alert)
  }

  /** The chi-square twin over the SAME incremental state — one
    * absorbed count table serves the whole drift triad's bucketed
    * members (see [[Quality.chi2FromCounts]]). */
  def reportChi2(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    Quality.chi2FromCounts(
      baseCounts.toDF("column", "bucket", "n"),
      cur.toSeq.map { case ((c, b), n) => (c, b, n) }
        .toDF("column", "bucket", "n"))
  }
}

object StreamingDriftMonitor {

  /** Attach a drift monitor to a streaming frame: freezes the
    * baseline's extents and bucket counts (two driver-sized reads of
    * `base`, once), then absorbs every micro-batch into the running
    * counts. Returns the query and the monitor handle (`report` at
    * any time). */
  def monitor(stream: DataFrame, base: DataFrame, numericCols: Seq[String],
      categoricalCols: Seq[String], buckets: Int = 10, alert: Double = 0.2,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0L))
      : (StreamingQuery, DriftMonitor) = {
    val extents = Quality.psiExtents(base, numericCols)
    val bc = Quality.psiBucketCounts(base, numericCols, categoricalCols,
        extents, buckets)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    val m = new DriftMonitor(bc, extents, numericCols, categoricalCols,
      buckets, alert)
    val w0 = stream.writeStream.outputMode("append").trigger(trigger)
    val w = checkpoint.fold(w0)(c => w0.option("checkpointLocation", c))
    val q = w.foreachBatch((b: DataFrame, id: Long) => m.absorb(b, id)).start()
    (q, m)
  }
}
