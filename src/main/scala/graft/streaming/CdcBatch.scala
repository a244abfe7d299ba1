package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-micro-batch CDC normalization shared by [[StreamingTextIngest
  * .cdc]] and [[StreamingAnnIngest.cdc]]: reduce the batch to the
  * LATEST event per key BEFORE splitting into deletes/upserts.
  *
  * Why it must happen here: the index upsert contract is one version
  * per key per generation (two "latest" versions of a key cannot be
  * ordered by any latest-wins rule — [[graft.operators.TextIndex
  * .upsert]] enforces it), and the deletes-then-upserts application
  * order means an un-reduced upsert-then-delete of one key would
  * RESURRECT the row (deletes run first). Reducing first makes the two
  * halves key-disjoint, so application order is a non-event.
  *
  * Ordering: when the batch carries `seq` (producer-assigned,
  * monotone per key — a Kafka offset, a CDC LSN), the highest `seq`
  * wins; on an equal-`seq` tie the DELETE wins (the conservative
  * resolution — a tie means the producer broke its own ordering
  * contract, and serving a row whose deletion raced is the worse
  * failure). Without `seq`, events within one micro-batch have no
  * defined order, so the documented convention applies: an upsert
  * beats a delete for the same key (same-batch delete+re-send nets to
  * the re-send), and TWO upserts of one key are rejected loudly —
  * nothing can say which is "latest", and picking one silently is the
  * r10-ADVICE corruption this object exists to close. */
private[streaming] object CdcBatch {

  /** Reduce `batch` to one event per `key`. `seqCol` is used iff the
    * batch schema has it. Returns the reduced frame minus any helper
    * columns (the `seqCol` itself is retained if present — callers
    * drop what they don't select). */
  def latestPerKey(batch: DataFrame, key: String, seqCol: String = "seq"): DataFrame = {
    val hasSeq = batch.columns.contains(seqCol)
    val isUp = when(col("op") === "upsert", 1).otherwise(0)
    val w =
      if (hasSeq)
        Window.partitionBy(col(key)).orderBy(col(seqCol).desc, isUp.asc)
      else
        Window.partitionBy(col(key)).orderBy(isUp.desc)
    val ranked = batch.withColumn("__rn", row_number().over(w))
    if (!hasSeq) {
      // upserts sort first, so a key with two upserts puts one at
      // rank 2 — the only rank-2 row that can be an upsert
      val dup = ranked
        .filter(col("__rn") === 2 && col("op") === "upsert")
        .select(col(key)).limit(1).collect()
      require(dup.isEmpty,
        s"CDC batch has two upserts for $key=${dup.headOption.map(_.get(0))} " +
          "with no 'seq' ordering column — no latest-wins rule can order them; " +
          "add a per-key monotone 'seq' column to the stream")
    }
    ranked.filter(col("__rn") === 1).drop("__rn")
  }
}
