package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.AnnIndex

/** Continuous ingestion into the persisted ANN index — the streaming
  * twin of [[AnnIndex.upsert]], closing the loop between the two
  * production surfaces: a training-data pipeline lands embeddings on a
  * stream, and the serving index must absorb them without a rebuild.
  *
  * Shape: `foreachBatch` — each micro-batch is exactly one index
  * generation (assign against the FROZEN stored seeds, encode with the
  * FROZEN stored codebooks, append cell-partitioned files, atomic
  * manifest move). This is deliberate: the index's unit of isolation
  * IS the generation, so mapping Spark's unit of streaming isolation
  * (the micro-batch) one-to-one onto it gives readers the strongest
  * guarantee available — a probe sees every batch entirely or not at
  * all, never a half-applied batch.
  *
  * Delivery semantics: `foreachBatch` replays a batch after a crash,
  * and both torn-write cases are inert. Crash BEFORE the manifest
  * move: the half-written generation directory is unreferenced, and
  * the replay overwrites it with identical rows (upsert writes
  * mode-overwrite; assignment and encode are deterministic functions
  * of the frozen quantizers) before publishing. Crash AFTER the
  * move: the batch's `batch:stream-<id>` tag rode the ATOMIC manifest
  * publish, so the replay sees it via `batchApplied` and skips —
  * which matters beyond row duplication: a blind re-upsert would
  * merge the batch's component sums into the running centroid stats
  * a second time, silently drifting probe cell selection from the
  * full-rebuild means. Exactly-once EFFECT from at-least-once
  * delivery, the ledger riding the same atomic move as the data.
  *
  * Scale: per-batch work is `O(|batch| · cells)` for assignment plus
  * one write — independent of index size; probes stay pruned to
  * `nprobe` cells regardless of how many generations streaming has
  * appended. Compact ([[AnnIndex.compact]]) on whatever cadence
  * bounds the generation count, exactly like any LSM store behind a
  * write-ahead stream.
  */
object StreamingAnnIngest {

  /** Attach a streaming `(vec_id, label, embedding)` frame to the
    * index founded at `root`; every micro-batch upserts as one new
    * generation. The index must already be [[AnnIndex.build]]t — a
    * stream cannot found an index because the founding batch FREEZES
    * both quantizers, a decision that needs the founding corpus in
    * hand. */
  def ingest(vectors: DataFrame, root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // an empty batch must not burn a generation (triggers can fire
        // with nothing to do), and a replayed batch whose tag already
        // rode a published manifest must not re-apply (stats would
        // double-merge)
        val tag = s"stream-$id"
        if (!batch.isEmpty &&
            !AnnIndex.batchApplied(batch.sparkSession, root, tag)) {
          AnnIndex.upsert(batch, root, Some(tag)); ()
        }
      }
      .start()
}
