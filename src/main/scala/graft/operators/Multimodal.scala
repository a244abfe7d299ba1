package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators (north-star — SURVEY.md §7.3 M5,
  * BASELINE.json): image/audio/video payloads as opaque `binary` columns
  * with typed metadata, plus decode / frame-sample / feature-extract
  * plumbing.
  *
  * The container has no media codecs, so the DECODE step is a
  * deterministic stub (documented at each site); everything Spark-side —
  * binary schema, chunked frame iteration, per-partition batch decode,
  * feature schema — is real and tested. Payload bytes are the UTF-8
  * encoding of the document text (ASCII), which lets the DuckDB oracle
  * compute identical values through VARCHAR functions (DuckDB 1.0 has no
  * md5/substring over BLOB).
  *
  * Scale notes: all three queries are narrow per-row projections /
  * generators over the scan — no shuffle, linear in input splits. Frame
  * explosion multiplies rows by payload-size/64 BEFORE any shuffle, so
  * downstream aggs see fixed-size frames, the same shape a video
  * pipeline needs (decode fan-out at the map side).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  private val FrameBytes = 64
  private val SampleEvery = 4

  /** The opaque payload column (stub: UTF-8 bytes of the text). */
  private def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", encode(col("text"), "UTF-8"))

  // ----------------------------------------------------------------
  // Binary column + typed metadata
  // ----------------------------------------------------------------

  /** Deterministic width/height tags — the image-header-parse stub,
    * shared by [[mBinaryMeta]] and the patch-grid generator so the
    * "header" cannot drift between them. */
  private def dims(df: DataFrame): DataFrame = df
    .withColumn("width", (lit(16) + col("doc_id") % 64).cast("long"))
    .withColumn("height", (lit(16) + (col("doc_id") * 7) % 64).cast("long"))

  /** Binary payload with typed metadata: byte length, content digest,
    * magic-bytes prefix, and deterministic width/height/format tags (the
    * stub for image-header parsing). */
  private def mBinaryMeta: Q = (s, dir) =>
    dims(withPayload(Tables.documents(s, dir))).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("digest"),
      hex(substring(col("payload"), 1, 8)).as("magic"),
      col("width"), col("height"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"))

  private val mBinaryMetaSql =
    """SELECT doc_id,
      | octet_length(encode(text)) AS n_bytes,
      | md5(text) AS digest,
      | hex(substring(text, 1, 8)) AS magic,
      | 16 + doc_id % 64 AS width,
      | 16 + (doc_id * 7) % 64 AS height,
      | (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS media_type
      |FROM documents""".stripMargin

  // ----------------------------------------------------------------
  // Frame sampling: chunk the payload, keep every k-th frame
  // ----------------------------------------------------------------

  /** Frame extraction + sampling: split the payload into 64-byte frames
    * (a generator: one row per frame), keep every 4th, digest each. The
    * row-explosion happens map-side before any shuffle — the shape of a
    * video frame-sampling stage. */
  private def mFrameSample: Q = (s, dir) =>
    withPayload(Tables.documents(s, dir))
      .withColumn("n_frames",
        ((length(col("payload")) + FrameBytes - 1) / FrameBytes).cast("int"))
      // Spark's sequence(start, stop) steps -1 when stop < start, so an
      // empty payload (n_frames = 0) would yield [0, -1] — a phantom
      // frame the oracle's range(0, 0) never emits. Zero-frame rows
      // must produce zero output rows.
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % SampleEvery === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(substring(col("payload"), col("frame_idx") * FrameBytes + 1, lit(FrameBytes)))
          .as("frame_digest"))

  private val mFrameSampleSql =
    s"""SELECT doc_id, frame_idx,
       |  md5(substring(text, (frame_idx * $FrameBytes + 1)::BIGINT, $FrameBytes)) AS frame_digest
       |FROM (SELECT doc_id, text,
       |        unnest(range(0, (octet_length(encode(text)) + ${FrameBytes - 1}) // $FrameBytes))
       |          AS frame_idx
       |      FROM documents)
       |WHERE frame_idx % $SampleEvery = 0""".stripMargin

  // ----------------------------------------------------------------
  // Feature extraction (stubbed decode → numeric feature vector)
  // ----------------------------------------------------------------

  /** Stub "decode + featurize": byte-class ratios as the feature vector
    * (a real pipeline would decode pixels/samples here; ratios of exact
    * integer counts divide to bit-identical doubles in both engines).
    * The harness projection emits the vector as named scalar columns:
    * array cells crash the driver comparator's pandas row-sort; the
    * array form stays available via [[decodePartitions]]. */
  private def mFeatures: Q = (s, dir) =>
    withPayload(Tables.documents(s, dir))
      .withColumn("n", length(col("payload")).cast("double"))
      .select(
        col("doc_id"),
        (length(regexp_replace(col("text"), "[^a-zA-Z]", "")) / col("n")).as("f_alpha"),
        (length(regexp_replace(col("text"), "[^0-9]", "")) / col("n")).as("f_digit"),
        (length(regexp_replace(col("text"), "[^ ]", "")) / col("n")).as("f_space"),
        (col("n") / 1000.0).as("f_kb"))

  private val mFeaturesSql =
    """SELECT doc_id,
      | length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / n AS f_alpha,
      | length(regexp_replace(text, '[^0-9]', '', 'g')) / n AS f_digit,
      | length(regexp_replace(text, '[^ ]', '', 'g')) / n AS f_space,
      | n / 1000.0 AS f_kb
      |FROM (SELECT doc_id, text, octet_length(encode(text))::DOUBLE AS n FROM documents)""".stripMargin

  // ----------------------------------------------------------------
  // Patch-grid generator (ViT-style image tiling)
  // ----------------------------------------------------------------

  private val PatchSize = 16

  /** ViT patch-grid generation — the tiling pass between decode and an
    * image encoder: each image (width × height from the stub header)
    * explodes into its 16×16 patch grid with per-patch geometry
    * (grid position, pixel offsets, clipped extent at the right/bottom
    * edges, full-patch flag). A real pipeline would slice the decoded
    * pixel buffer by exactly these offsets (the codec stays stubbed,
    * the plumbing is real — same contract as the other multimodal
    * ops). Pure map-side generator: patch count derives
    * arithmetically from the header, rows explode before any shuffle,
    * linear in input splits at any corpus size. */
  private def mPatches: Q = (s, dir) =>
    dims(Tables.documents(s, dir))
      .withColumn("p_cols", ((col("width") + PatchSize - 1) / PatchSize).cast("long"))
      .withColumn("p_rows", ((col("height") + PatchSize - 1) / PatchSize).cast("long"))
      .select(col("doc_id"), col("width"), col("height"), col("p_cols"),
        explode(sequence(lit(0L), col("p_rows") * col("p_cols") - 1)).as("patch_idx"))
      .withColumn("p_row", expr("patch_idx DIV p_cols"))
      .withColumn("p_col", expr("patch_idx % p_cols"))
      .withColumn("x0", col("p_col") * PatchSize)
      .withColumn("y0", col("p_row") * PatchSize)
      .withColumn("pw", least(lit(PatchSize.toLong), col("width") - col("x0")))
      .withColumn("ph", least(lit(PatchSize.toLong), col("height") - col("y0")))
      .select(col("doc_id"), col("patch_idx"), col("p_row"), col("p_col"),
        col("x0"), col("y0"), col("pw"), col("ph"),
        (col("pw") === PatchSize && col("ph") === PatchSize).as("is_full"))

  private val mPatchesSql =
    s"""SELECT doc_id, patch_idx,
       |  patch_idx // p_cols AS p_row,
       |  patch_idx % p_cols AS p_col,
       |  (patch_idx % p_cols) * $PatchSize AS x0,
       |  (patch_idx // p_cols) * $PatchSize AS y0,
       |  least($PatchSize, width - (patch_idx % p_cols) * $PatchSize) AS pw,
       |  least($PatchSize, height - (patch_idx // p_cols) * $PatchSize) AS ph,
       |  least($PatchSize, width - (patch_idx % p_cols) * $PatchSize) = $PatchSize
       |    AND least($PatchSize, height - (patch_idx // p_cols) * $PatchSize) = $PatchSize
       |    AS is_full
       |FROM (
       |  SELECT doc_id, width, height, p_cols,
       |         unnest(range(0, p_rows * p_cols)) AS patch_idx
       |  FROM (SELECT doc_id,
       |          16 + doc_id % 64 AS width,
       |          16 + (doc_id * 7) % 64 AS height,
       |          (16 + doc_id % 64 + ${PatchSize - 1}) // $PatchSize AS p_cols,
       |          (16 + (doc_id * 7) % 64 + ${PatchSize - 1}) // $PatchSize AS p_rows
       |        FROM documents))""".stripMargin

  // ----------------------------------------------------------------
  // Per-partition batch decode plumbing (Dataset + mapPartitions)
  // ----------------------------------------------------------------

  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      mean_byte: Double, frames: Int)

  /** The Scala analogue of a Pandas-UDF/mapInPandas decode stage:
    * per-partition iteration so a real decoder could amortize model/codec
    * init across the batch (the Spark-side plumbing the SURVEY asks to
    * keep real while stubbing the codec itself). */
  def decodePartitions(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // STUB: a real implementation would initialize the codec once here.
      it.map { r =>
        val bytes = r.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong,
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
          (bytes.length + FrameBytes - 1) / FrameBytes)
      }
    }
  }

  /** Typed media table for [[decodePartitions]]. */
  def mediaRecords(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"))
      .as[MediaRecord]
  }

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "m_binary_meta" -> mBinaryMeta,
    "m_frame_sample" -> mFrameSample,
    "m_features" -> mFeatures,
    "m_patches" -> mPatches)

  val oracles: Map[String, String] = Map(
    "m_binary_meta" -> mBinaryMetaSql,
    "m_frame_sample" -> mFrameSampleSql,
    "m_features" -> mFeaturesSql,
    "m_patches" -> mPatchesSql)
}
