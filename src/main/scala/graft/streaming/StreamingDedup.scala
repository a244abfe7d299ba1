package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Continuous-ingest NEAR-dup detection — the streaming twin of the
  * batch `d_incremental` query: documents arrive on a stream, each is
  * checked against everything seen SO FAR, and near-dups are flagged
  * with their canonical (earliest) match. `dropDuplicatesWithinWatermark`
  * covers the exact-replay case; this covers boilerplate/near-identical
  * content, which exact dedup never catches.
  *
  * Shape: per-row MinHash signature ([[Dedup.rowSigExpr]] — stateless
  * HOFs, NO aggregation, so the stream stays stateless until the bucket
  * state itself) → posexplode to the shared LSH band buckets
  * ([[Dedup.bandBucketExprs]], the same geometry as the batch
  * self-join) → `flatMapGroupsWithState` keyed by (band, bucket): the
  * state is the bucket's first-seen signatures, each arrival compares
  * against them (est. Jaccard = matching signature components / K) and
  * emits a per-band verdict.
  *
  * State discipline: a bucket retains only CANONICAL signatures (docs
  * that matched nothing), earliest-first up to `MaxBucketState` —
  * dedup canonicalizes to the earliest copy, so canonical candidates
  * are exactly what must stay resident, and near-copies must NOT
  * consume slots (a boilerplate family would otherwise flood the cap
  * and evict room for later distinct content); per-bucket memory is
  * capped and the bucket keyspace bounds the total. No
  * watermark timeout by design: corpus dedup state is the corpus index
  * (evicting it would re-admit old boilerplate); bound it by bucket
  * count + cap, or restart from a batch-built index.
  *
  * A doc collides in up to [[Dedup.K]]/4 bands; the consumer ORs the
  * per-band verdicts (any band hit ⇒ near-dup), exactly like the batch
  * candidate generator's distinct-pairs step.
  */
object StreamingDedup {

  case class BandRow(doc_id: Long, band: Int, bucket: Long, sig: Seq[Long])
  case class BucketState(docs: List[BucketDoc])
  case class BucketDoc(doc_id: Long, sig: Seq[Long])
  case class BandVerdict(doc_id: Long, band: Int, bucket: Long,
      dup_of: Option[Long], est_jaccard: Double)

  /** One cap, two engines: the batch band joins truncate buckets at the
    * same occupancy ([[graft.operators.Dedup.MaxBucketOccupancy]]), so
    * batch and streaming share one skew-armor discipline. */
  val MaxBucketState: Int = graft.operators.Dedup.MaxBucketOccupancy
  /** fraction of matching signature components to call a near-dup */
  val NearThreshold = 0.75

  /** Stateless prefix: (doc_id, band, bucket, sig) rows from a
    * (doc_id, text) frame — identical values to the batch
    * signatures+banding path (DedupSpec-asserted). Null-text /
    * null-id rows are dropped up front, matching the batch path's
    * explode-of-null drop: without the guard a single poison row
    * would deserialize a null bucket into the non-nullable BandRow
    * and kill the streaming query unrecoverably. */
  def banded(docs: DataFrame): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(docs.sparkSession)
    docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), expr(Dedup.rowSigExpr).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(expr(Dedup.bandBucketExprs.mkString("array(", ", ", ")")))
          .as(Seq("band", "bucket")))
      .select(col("doc_id"), col("band"), col("bucket"), col("sig"))
  }

  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.size

  /** Per-(doc, band) verdicts on a STREAMING (doc_id, text) frame
    * (works identically on a batch frame — unified API). Within a
    * micro-batch, rows are processed in doc_id order so replaying a
    * batch yields the same verdicts. */
  def nearDupVerdicts(docs: DataFrame): Dataset[BandVerdict] = {
    val s = docs.sparkSession
    import s.implicits._
    banded(docs).as[BandRow]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          var kept = state.getOption.getOrElse(BucketState(Nil)).docs
          val out = List.newBuilder[BandVerdict]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            val hit = kept.iterator
              .map(d => (d, estJaccard(r.sig, d.sig)))
              .find(_._2 >= NearThreshold)
            out += BandVerdict(r.doc_id, r.band, r.bucket,
              hit.map(_._1.doc_id), hit.map(_._2).getOrElse(0.0))
            // only CANONICAL (non-matching) docs enter the state: a
            // boilerplate family must occupy one slot, not flood the
            // cap with near-identical signatures and evict room for
            // later distinct content (that recall hole grows with the
            // duplication rate — review r5)
            if (hit.isEmpty && kept.size < MaxBucketState)
              kept = kept :+ BucketDoc(r.doc_id, r.sig)
          }
          state.update(BucketState(kept))
          out.result().iterator
      }
  }
}
