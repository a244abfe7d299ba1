package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators (north-star — SURVEY.md §7.3 M5,
  * BASELINE.json): image/audio/video payloads as opaque `binary` columns
  * with typed metadata, plus decode / frame-sample / feature-extract
  * plumbing.
  *
  * The IMAGE decode is REAL: payloads are genuine PNGs (encoded with
  * `javax.imageio`, which ships in every JDK) and [[mFeatures]] /
  * [[decodePartitions]] run `ImageIO.read` on the bytes and compute
  * stats from the decoded raster. Oracle strategy: the synthetic image's
  * pixels are a closed-form function of (x, y, doc_id), so DuckDB
  * verifies the DECODED stats arithmetically without needing a codec —
  * a wrong decode (stride, band order, bit depth) breaks parity. The
  * AUDIO decode is REAL too: payloads are genuine WAVs (RIFF + 16-bit
  * PCM via `javax.sound.sampled`, also in every JDK) and features come
  * from decoded frames, oracle-checked the same closed-form way. VIDEO
  * is real demux + real per-frame decode: the JDK ships no video
  * codec, so the container is Motion-PNG ([[synthMpng]] — the MJPEG
  * shape with PNG as the frame codec), every frame `ImageIO.read`,
  * stats oracle-checked per pixel per frame. Nothing in this module is
  * a stub anymore. Frame/meta queries keep UTF-8 text payloads
  * so their digests stay VARCHAR-computable in DuckDB 1.0 (no md5 over
  * BLOB).
  *
  * Scale notes: all queries are narrow per-row projections / generators
  * over the scan — no shuffle, linear in input splits. Frame explosion
  * multiplies rows by payload-size/64 BEFORE any shuffle, so downstream
  * aggs see fixed-size frames, the same shape a video pipeline needs
  * (decode fan-out at the map side).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  private val FrameBytes = 64
  private val SampleEvery = 4

  // ----------------------------------------------------------------
  // Real PNG codec path (javax.imageio — in every JDK)
  // ----------------------------------------------------------------

  /** Deterministic grayscale test-card pixel: the closed form both the
    * Spark encoder and the DuckDB oracle share. */
  private def pixel(x: Int, y: Int, docId: Long): Int =
    ((x * 7L + y * 13L + docId * 31L) % 256L).toInt

  /** A real PNG of the (w × h) deterministic test card. */
  private[graft] def synthPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y, docId)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[graft] case class PixelStats(width: Int, height: Int,
      channels: Int, sum: Long, min: Int, max: Int) {
    def mean: Double = sum.toDouble / (width.toLong * height)
  }

  /** REAL image decode: `ImageIO.read` over the payload bytes, stats
    * from the decoded raster (band 0). Integer sum / exact division, so
    * a correct decode reproduces the oracle's closed-form mean
    * bit-identically. */
  private[graft] def decodeStats(png: Array[Byte]): PixelStats = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null, "payload is not a decodable image")
    val r = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = r.getSample(x, y, 0)
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        x += 1
      }
      y += 1
    }
    PixelStats(w, h, r.getNumBands, sum, mn, mx)
  }

  /** The opaque payload column (stub: UTF-8 bytes of the text). */
  private def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", encode(col("text"), "UTF-8"))

  // ----------------------------------------------------------------
  // Real video path: Motion-PNG container (demux + per-frame ImageIO)
  // ----------------------------------------------------------------

  /** Motion-PNG ("MPNG") container — the same shape as MJPEG (a
    * length-prefixed sequence of independently-decodable still frames)
    * with PNG as the per-frame codec, because PNG is the codec the JDK
    * actually ships. The JDK has no video CODEC, but a video PIPELINE
    * is container demux + per-frame decode, and both halves are real
    * here: [[demuxMpng]] parses magic/count/length-prefixed records,
    * and every frame goes through `ImageIO.read`.
    *
    * Layout: `"MPNG"` magic, int32-BE frame count, then per frame an
    * int32-BE byte length followed by a complete PNG. */
  private val MpngMagic = Array[Byte]('M', 'P', 'N', 'G')
  private val VideoFps = 4

  /** Frames per video: 2..5 so durations differ. */
  private def framesOf(docId: Long): Int = (2 + docId % 4).toInt

  /** Per-frame pixel seed: frames of one video differ deterministically
    * (the closed form both the encoder and the DuckDB oracle share). */
  private def frameSeed(docId: Long, f: Int): Long = docId + 1000003L * f

  /** A real MPNG container of `nFrames` deterministic test cards. */
  private[graft] def synthMpng(docId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(MpngMagic)
    out.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val png = synthPng(frameSeed(docId, f), w, h)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  private[graft] case class VideoStats(frames: Long, width: Long, height: Long,
      sumPixel: Long, min: Long, max: Long)

  /** REAL video decode: demux the MPNG container (magic check, frame
    * count, length-prefixed records), `ImageIO.read` EVERY frame, fold
    * pixel stats across all frames' rasters. Geometry must agree
    * across frames (one video, one size). Integer sums, so a correct
    * demux + decode reproduces the oracle's closed form exactly; a
    * bad frame offset, a swapped length, or a decode bug breaks
    * parity. */
  private[graft] def demuxMpng(bytes: Array[Byte]): VideoStats = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, MpngMagic), "not an MPNG container")
    val nFrames = in.readInt()
    var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
    var w = -1L; var h = -1L
    var f = 0
    while (f < nFrames) {
      val len = in.readInt()
      val png = new Array[Byte](len)
      in.readFully(png)
      val st = decodeStats(png)
      require(w < 0 || (w == st.width && h == st.height),
        "frame geometry changed mid-video")
      w = st.width; h = st.height
      sum += st.sum
      if (st.min < mn) mn = st.min
      if (st.max > mx) mx = st.max
      f += 1
    }
    VideoStats(nFrames.toLong, w, h, sum, mn, mx)
  }

  // ----------------------------------------------------------------
  // Real WAV/PCM codec path (javax.sound.sampled — in every JDK)
  // ----------------------------------------------------------------

  private val AudioRate = 8000

  /** Deterministic 16-bit PCM test-tone sample: the closed form both
    * the Spark encoder and the DuckDB oracle share (multipliers are
    * primes so consecutive samples sweep the full signed-16 range —
    * a decode that drops sign, byte order, or bit depth cannot
    * reproduce the stats). */
  private def ampAt(i: Int, docId: Long): Int =
    ((i.toLong * 7919 + docId * 104729) % 65536).toInt - 32768

  /** Per-doc sample count: 256..767 so WAVs differ in duration. */
  private def samplesOf(docId: Long): Int = (256 + docId % 512).toInt

  /** A REAL WAV file (RIFF container, 16-bit signed little-endian
    * mono PCM at 8 kHz) of the deterministic test tone. The container
    * is written directly from the public RIFF/WAVE layout (the
    * standard 44-byte PCM header) rather than through
    * `AudioSystem.write`: the AudioSystem entry points take a global
    * provider-registry lock PER CALL, which measured as the scale
    * bottleneck of the whole audio path (30 threads delivered only
    * ~2x one thread's throughput). The spec still pins this writer to
    * the REAL codec — [[decodeWavStats]] decodes with the JDK's
    * WaveFileReader, so a malformed header here breaks the round-trip
    * law and the oracle row. */
  private[graft] def synthWav(docId: Long, nSamples: Int): Array[Byte] =
    synthWavOf(Array.tabulate(nSamples)(i => ampAt(i, docId)))

  /** The same RIFF writer over an EXPLICIT sample array — the re-encode
    * half of the audio near-dup fixtures (gain-shift → re-contain →
    * re-decode, all through the real codec path). */
  private[graft] def synthWavOf(samples: Array[Int]): Array[Byte] = {
    val nSamples = samples.length
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def w32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, t: String): Unit = {
      var i = 0
      while (i < 4) { out(off + i) = t.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); w32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16)
    w16(20, 1) // PCM
    w16(22, 1) // mono
    w32(24, AudioRate) // sample rate
    w32(28, AudioRate * 2) // byte rate
    w16(32, 2) // block align
    w16(34, 16) // bits per sample
    tag(36, "data"); w32(40, dataLen)
    var i = 0
    while (i < nSamples) {
      val s = samples(i)
      out(44 + 2 * i) = (s & 0xff).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** The JDK's WAV codec, resolved through the `AudioFileReader` SPI
    * ONCE per JVM: `AudioSystem.getAudioInputStream` re-scans the
    * provider registry under a global lock on every call, which
    * serializes a 30-thread decode stage (measured ~2x one thread's
    * throughput). The cached reader instance is the same
    * `WaveFileReader` AudioSystem would dispatch to — stateless, so
    * sharing it across tasks is safe. */
  private lazy val wavReader: Array[Byte] => javax.sound.sampled.AudioInputStream = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val probe = synthWavProbe
    var found: Option[javax.sound.sampled.spi.AudioFileReader] = None
    while (found.isEmpty && it.hasNext) {
      val r = it.next()
      try {
        r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close()
        found = Some(r)
      } catch { case _: Exception => () }
    }
    found match {
      case Some(r) =>
        bytes => r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      case None => // no WAV provider on this JVM: AudioSystem fallback
        bytes => javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
    }
  }

  private def synthWavProbe: Array[Byte] = synthWav(0L, 4)

  private[graft] case class AudioStats(nSamples: Long, sampleRate: Long,
      channels: Long, min: Long, max: Long, sum: Long, sumSquare: Long) {
    def mean: Double = sum.toDouble / nSamples
    def meanSquare: Double = sumSquare.toDouble / nSamples
  }

  /** REAL audio decode: `AudioSystem.getAudioInputStream` parses the
    * RIFF/fmt headers (rate, channels, bit depth, endianness come from
    * the DECODED format, not assumptions), then amplitude stats are
    * folded over the decoded PCM frames. Integer sums with exact
    * double division at the end, so a correct decode reproduces the
    * oracle's closed-form stats bit-identically; a stride/sign/byte-
    * order bug breaks parity. Handles both endiannesses so it decodes
    * any 16-bit PCM WAV, not just [[synthWav]]'s output. */
  private[graft] def decodeWavStats(wav: Array[Byte]): AudioStats = {
    val ais = wavReader(wav)
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16, s"not 16-bit PCM: $fmt")
    val bytes = ais.readAllBytes()
    ais.close()
    val big = fmt.isBigEndian
    val n = bytes.length / 2
    var sum = 0L; var sumSq = 0L
    var mn = Long.MaxValue; var mx = Long.MinValue
    var i = 0
    while (i < n) {
      val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
      val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
      val s = (hi << 8) | lo
      sum += s; sumSq += s.toLong * s
      if (s < mn) mn = s
      if (s > mx) mx = s
      i += 1
    }
    val frames = n / fmt.getChannels
    AudioStats(frames.toLong, fmt.getSampleRate.toLong, fmt.getChannels.toLong,
      mn, mx, sum, sumSq)
  }

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

  /** Decode + featurize with a REAL codec: every document's image is a
    * genuine PNG ([[synthPng]] — `javax.imageio` encode), and the
    * features are computed from pixels DECODED back out of it with
    * `ImageIO.read` inside a mapPartitions batch (codec init amortized
    * per partition, the Pandas-UDF shape). The oracle knows the test
    * card's closed-form pixel function, so it verifies the decoded
    * width/height/band-count/mean/min/max arithmetically — a stride,
    * band-order, or bit-depth bug in the decode path breaks parity.
    * Map-side only, no shuffle; linear in input splits. */
  private def mFeatures: Q = (s, dir) => {
    import s.implicits._
    // spread: serial PNG encode+decode otherwise (see mVideoFeatures)
    Tables.spread(dims(Tables.documents(s, dir))
        .select(col("doc_id"), col("width").cast("int"), col("height").cast("int")))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        // ImageIO reader-SPI lookup and temp-cache config happen once
        // per partition, not per record
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, w, h) =>
          val st = decodeStats(synthPng(id, w, h))
          (id, st.width.toLong, st.height.toLong, st.channels.toLong,
            st.mean, st.min.toLong, st.max.toLong)
        }
      }
      .toDF("doc_id", "width", "height", "channels",
        "mean_pixel", "min_pixel", "max_pixel")
  }

  private val mFeaturesSql =
    """WITH d AS (SELECT doc_id,
      |             16 + doc_id % 64 AS w, 16 + (doc_id * 7) % 64 AS h
      |           FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
      |SELECT doc_id, w AS width, h AS height, CAST(1 AS BIGINT) AS channels,
      |       CAST(sum((x * 7 + y * 13 + doc_id * 31) % 256) AS DOUBLE) / (w * h) AS mean_pixel,
      |       CAST(min((x * 7 + y * 13 + doc_id * 31) % 256) AS BIGINT) AS min_pixel,
      |       CAST(max((x * 7 + y * 13 + doc_id * 31) % 256) AS BIGINT) AS max_pixel
      |FROM px GROUP BY doc_id, w, h""".stripMargin

  /** Audio decode + featurize with a REAL codec: every document's
    * audio is a genuine WAV ([[synthWav]] — standard RIFF container
    * + 16-bit LE PCM) and the features come from frames DECODED back
    * out of it by the JDK's WaveFileReader inside a mapPartitions
    * batch.
    * Format facts (sample_rate, channels) are read from the DECODED
    * headers; amplitude stats fold over the decoded samples. The
    * oracle knows the test tone's closed-form sample function, so
    * DuckDB verifies the decoded duration/min/max/mean/mean-square
    * arithmetically without needing a codec — a sign, byte-order, or
    * bit-depth bug in the decode path breaks parity. The amplitude
    * moments ship as exact integer SUMS (sum_amp, sum_square =
    * un-normalized mean and power) rather than rounded ratios: a
    * sample count like 568 makes mean-square land exactly on a
    * 6-decimal half-point, where the two engines' round() tie-break on
    * the nearest DOUBLE diverges — integers cannot tie-break.
    * duration_ms stays a ratio because n·1000/8000 = n·0.125 is exact
    * binary for any n. Map-side only, no shuffle; linear in input
    * splits. */
  private def mAudioFeatures: Q = (s, dir) => {
    import s.implicits._
    // spread: serial WAV encode+decode otherwise (see mVideoFeatures)
    Tables.spread(Tables.documents(s, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val st = decodeWavStats(synthWav(id, samplesOf(id)))
          (id, st.nSamples, st.sampleRate, st.channels,
            st.nSamples * 1000.0 / st.sampleRate,
            st.min, st.max, st.sum, st.sumSquare)
        }
      }
      .toDF("doc_id", "n_samples", "sample_rate", "channels",
        "duration_ms", "min_amp", "max_amp", "sum_amp", "sum_square")
  }

  private val mAudioFeaturesSql =
    """WITH d AS (SELECT doc_id, 256 + doc_id % 512 AS n FROM documents),
      |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
      |v AS (SELECT doc_id, n,
      |        ((i * 7919 + doc_id * 104729) % 65536) - 32768 AS amp
      |      FROM s)
      |SELECT doc_id, n AS n_samples,
      |       CAST(8000 AS BIGINT) AS sample_rate,
      |       CAST(1 AS BIGINT) AS channels,
      |       n * 1000.0 / 8000 AS duration_ms,
      |       CAST(min(amp) AS BIGINT) AS min_amp,
      |       CAST(max(amp) AS BIGINT) AS max_amp,
      |       CAST(sum(amp) AS BIGINT) AS sum_amp,
      |       CAST(sum(amp * amp) AS BIGINT) AS sum_square
      |FROM v GROUP BY doc_id, n""".stripMargin

  /** Video demux + per-frame decode + featurize, all REAL: every
    * document's video is an MPNG container ([[synthMpng]]) whose
    * frames are genuine PNGs, and the feature pass demuxes the
    * container and `ImageIO.read`s every frame inside a mapPartitions
    * batch. The oracle knows the per-frame test card's closed-form
    * pixel function, so DuckDB verifies the demuxed-and-decoded stats
    * arithmetically — a frame-offset, length-prefix, or decode bug
    * breaks parity. Pixel moments ship as exact integer sums (the
    * [[mAudioFeatures]] tie-break lesson); duration is exact because
    * frames·1000/4 fps = frames·250. Map-side only, no shuffle. */
  private def mVideoFeatures: Q = (s, dir) => {
    import s.implicits._
    // spread: ~2.4 s of serial PNG encode+decode per pass otherwise
    // (single-row-group scan = one task; only doc_ids move)
    Tables.spread(Tables.documents(s, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val w = (16 + id % 32).toInt
          val h = (16 + (id * 3) % 32).toInt
          val st = demuxMpng(synthMpng(id, w, h, framesOf(id)))
          (id, st.frames, st.width, st.height,
            st.frames * 1000.0 / VideoFps, st.sumPixel, st.min, st.max)
        }
      }
      .toDF("doc_id", "n_frames", "width", "height",
        "duration_ms", "sum_pixel", "min_pixel", "max_pixel")
  }

  private val mVideoFeaturesSql =
    """WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS nf,
      |             16 + doc_id % 32 AS w, 16 + (doc_id * 3) % 32 AS h
      |           FROM documents),
      |fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS f FROM d),
      |xs AS (SELECT doc_id, nf, w, h, f, unnest(range(0, w)) AS x FROM fr),
      |ys AS (SELECT doc_id, nf, w, h, f, x, unnest(range(0, h)) AS y FROM xs),
      |px AS (SELECT doc_id, nf, w, h,
      |         (x * 7 + y * 13 + (doc_id + 1000003 * f) * 31) % 256 AS p
      |       FROM ys)
      |SELECT doc_id, nf AS n_frames, w AS width, h AS height,
      |       nf * 1000.0 / 4 AS duration_ms,
      |       CAST(sum(p) AS BIGINT) AS sum_pixel,
      |       CAST(min(p) AS BIGINT) AS min_pixel,
      |       CAST(max(p) AS BIGINT) AS max_pixel
      |FROM px GROUP BY doc_id, nf, w, h""".stripMargin

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
  // Decode → featurize → retrieve (the multimodal-RAG composite)
  // ----------------------------------------------------------------

  private val HistBuckets = 8
  private val EmbedQueryDoc = 0L

  /** Per-image intensity-histogram embedding from a REAL decode:
    * every image round-trips through `ImageIO` (encode the test card,
    * decode it back) and the 8-bucket pixel histogram comes from the
    * DECODED raster — exact integer counts, so the embedding (and
    * every dot product over it) is bit-reproducible and the oracle
    * can recompute it from the closed-form pixel function. The input
    * frame is filtered BEFORE this stage, so a 1-image query branch
    * decodes 1 image. */
  private def histograms(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    // spread: serial PNG encode+decode otherwise (see mVideoFeatures)
    Tables.spread(dims(df)
        .select(col("doc_id"), col("width").cast("int"), col("height").cast("int")))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, w, h) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(synthPng(id, w, h)))
          val r = img.getRaster
          // float counts: ≤ 6400 pixels/image, exactly representable,
          // and array<float> is what the native graft_dot fold takes
          val counts = new Array[Float](HistBuckets)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              counts(r.getSample(x, y, 0) * HistBuckets / 256) += 1f
              x += 1
            }
            y += 1
          }
          (id, counts)
        }
      }
      .toDF("doc_id", "hist")
  }

  /** The image-retrieval composite — decode → embed → top-k, the
    * multimodal half of a RAG pipeline wired into the similarity
    * family: histogram embeddings from real decodes, cosine via the
    * native `graft_dot` fold (all dot products are exact integers in
    * double, so ordering is engine-identical), query side broadcast.
    * At corpus scale the embedding pass is one map-side decode scan
    * and the ranking is a broadcast join + TakeOrderedAndProject —
    * the brute-force baseline whose scale path is the ANN index
    * family ([[Similarity]]; feed these embeddings to
    * [[AnnIndex.build]] for the bucketed serving form). */
  private def mImageEmbedTopk: Q = (s, dir) => {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
    val q = histograms(docs.filter(col("doc_id") === EmbedQueryDoc))
      .select(col("hist").as("qh"),
        expr(s"sqrt(${Similarity.foldDot("hist", "hist")})").as("qn"))
    histograms(docs.filter(col("doc_id") =!= EmbedQueryDoc))
      .crossJoin(broadcast(q))
      .select(col("doc_id"),
        (expr(Similarity.foldDot("hist", "qh")) /
          (expr(s"sqrt(${Similarity.foldDot("hist", "hist")})") * col("qn")))
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc)
      .limit(10)
      .select(col("doc_id"),
        expr(graft.operators.TextAnalysis.r6("cos")).as("cosine"))
  }

  private val mImageEmbedTopkSql =
    s"""WITH d AS (SELECT doc_id, 16 + doc_id % 64 AS w,
       |                  16 + (doc_id * 7) % 64 AS h FROM documents),
       |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
       |px AS (SELECT doc_id, x, w, h, unnest(range(0, h)) AS y FROM xs),
       |pv AS (SELECT doc_id,
       |         ((x * 7 + y * 13 + doc_id * 31) % 256) * $HistBuckets // 256 AS b
       |       FROM px),
       |hist AS (SELECT doc_id, b, count(*) AS c FROM pv GROUP BY doc_id, b),
       |vec AS (SELECT d.doc_id, bs.b, coalesce(h.c, 0) AS c
       |        FROM d CROSS JOIN (SELECT unnest(range(0, $HistBuckets)) AS b) bs
       |        LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.b = bs.b),
       |q AS (SELECT b, c AS qc FROM vec WHERE doc_id = $EmbedQueryDoc),
       |dots AS (SELECT v.doc_id,
       |           sum(CAST(v.c AS DOUBLE) * qc) AS dq,
       |           sum(CAST(v.c AS DOUBLE) * v.c) AS dd
       |         FROM vec v JOIN q USING (b)
       |         WHERE v.doc_id <> $EmbedQueryDoc GROUP BY v.doc_id),
       |qn AS (SELECT sum(CAST(qc AS DOUBLE) * qc) AS qq FROM q),
       |sc AS (SELECT doc_id, dq / (sqrt(dd) * sqrt(qq)) AS cos
       |       FROM dots CROSS JOIN qn)
       |SELECT doc_id, floor(cos * 1e6 + 0.5) / 1e6 AS cosine
       |FROM sc ORDER BY cos DESC, doc_id LIMIT 10""".stripMargin

  // ----------------------------------------------------------------
  // Perceptual-hash image dedup (aHash + dHash, Hamming-band LSH)
  // ----------------------------------------------------------------

  private[graft] val PhashBandBits = 16
  private[graft] val PhashBands = 4
  /** Hamming ≤ 3 over 4 × 16-bit bands pigeonholes EXACTLY: 3 flipped
    * bits dirty at most 3 bands, so near-dups at the threshold always
    * share ≥ 1 band bucket — the [[Dedup.SimBands]] recall discipline
    * applied to the 64-bit image hash. */
  private[graft] val PhashMaxHamming = 3

  /** aHash + dHash from a REAL decoded raster: the image goes through
    * `ImageIO.read`, then an 8×8 POINT-SAMPLED grid (nearest-neighbor
    * resize — exact integers, no float pooling, so the oracle can
    * recompute both hashes from the closed-form pixel function, the
    * `m_image_embed_topk` discipline). aHash bit(i,j) = 64·p(i,j) >
    * Σ grid (integer cross-multiplied mean compare); dHash bit(i,j) =
    * p(i,j) > p(i+1,j) on a 9-column gradient grid. Bit k of the
    * packed long is grid cell (j, i) with k = 8j + i. */
  private[graft] def phashOf(png: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null, "payload is not a decodable image")
    val r = img.getRaster
    val w = img.getWidth; val h = img.getHeight
    val ga = Array.tabulate(8, 8)((j, i) => r.getSample(i * w / 8, j * h / 8, 0))
    var sum = 0L
    var j = 0
    while (j < 8) { var i = 0; while (i < 8) { sum += ga(j)(i); i += 1 }; j += 1 }
    var a = 0L; var d = 0L
    j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (ga(j)(i) * 64L > sum) a |= 1L << (j * 8 + i)
        if (r.getSample(i * w / 9, j * h / 8, 0) >
            r.getSample((i + 1) * w / 9, j * h / 8, 0)) d |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    (a, d)
  }

  /** Per-document perceptual hashes over the corpus images — one
    * map-side decode scan, the [[mFeatures]] batching discipline. */
  private def phashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread: serial PNG encode+decode otherwise (see mVideoFeatures);
    // persist: the pair join consumes the hash frame on BOTH sides
    // (probe + capped representatives), which would re-run the decode
    Tables.spread(dims(Tables.documents(s, dir))
        .select(col("doc_id"), col("width").cast("int"), col("height").cast("int")))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, w, h) =>
          val (a, d) = phashOf(synthPng(id, w, h))
          (id, a, d)
        }
      }
      .toDF("doc_id", "ahash", "dhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Near-dup image pairs from a precomputed `(doc_id, ahash, dhash)`
    * frame: candidates from the aHash's four 16-bit Hamming bands
    * (exact recall at the ≤ 3 threshold by pigeonhole), the
    * [[Dedup.MaxBucketOccupancy]] representative cap bounding the
    * per-bucket pair space on hash-collapsing corpora, confirm on
    * `bit_count(xor)` — the [[Dedup]] SimHash machinery fed by image
    * hashes instead of text fingerprints. Output: (a_id, b_id,
    * hamming_a, hamming_d); pair space O(n·cap·bands), never
    * all-pairs. */
  private def phashBanded(hashes: DataFrame): DataFrame = {
    val bandArr = (0 until PhashBands)
      .map(b => s"shiftright(ahash, ${b * PhashBandBits}) & ${(1 << PhashBandBits) - 1}")
      .mkString("array(", ", ", ")")
    hashes.select(col("doc_id"), col("ahash"), col("dhash"),
      posexplode(expr(bandArr)).as(Seq("band", "bucket")))
  }

  /** Band-bucket occupancy audit for [[phashPairsOf]] — the
    * `d_lsh_bucket_stats` discipline: a capped candidate generator
    * ships with the query that reports what the cap truncated. Per
    * band: bucket count, max occupancy, docs kept vs
    * representative-mediated under the cap. Image corpora COLLAPSE
    * hash classes (boilerplate frames, test cards, letterboxing), so
    * this is the dial that says when the pair space went
    * representative-mediated. */
  def phashBucketStats(hashes: DataFrame,
      cap: Int = Dedup.MaxBucketOccupancy): DataFrame =
    phashBanded(hashes)
      .groupBy(col("band").cast("long").as("band"), col("bucket"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("occ")).as("max_occupancy"),
        sum(least(col("occ"), lit(cap.toLong))).as("docs_kept"),
        sum(greatest(col("occ") - cap, lit(0L))).as("docs_truncated"))

  def phashPairsOf(hashes: DataFrame, maxHamming: Int = PhashMaxHamming): DataFrame = {
    val banded = phashBanded(hashes)
    val kept = Dedup.keptBandedOf(banded, Dedup.MaxBucketOccupancy)
    kept.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        expr("bit_count(x.ahash ^ y.ahash)").cast("long").as("hamming_a"),
        expr("bit_count(x.dhash ^ y.dhash)").cast("long").as("hamming_d"))
      .filter(col("hamming_a") <= maxHamming)
      .distinct()
  }

  private def mPhashDedup: Q = (s, dir) => phashPairsOf(phashes(s, dir))

  private def mPhashBucketStats: Q = (s, dir) =>
    phashBucketStats(phashes(s, dir))

  /** The oracle recomputes both hashes arithmetically from the
    * closed-form pixel function (no codec in DuckDB — a decode bug on
    * the Spark side breaks parity). Bit 63 is packed by adding the
    * signed minimum (1<<63 overflows DuckDB's left shift); `>> k &
    * mask` band extraction agrees across the engines' logical vs
    * arithmetic shift because the mask discards the sign fill. */
  /** Shared oracle CTEs through `banded` — the closed-form hash
    * recomputation both phash queries judge against. */
  private val phashBandedCte = {
    val bit63 = "(-9223372036854775807 - 1)"
    def packed(bitCond: String) =
      s"""CAST(sum(CASE WHEN $bitCond AND NOT (s.j = 7 AND s.i = 7)
         |  THEN 1::BIGINT << (s.j * 8 + s.i)::INT ELSE 0 END) AS BIGINT)
         |  + CASE WHEN max(CASE WHEN s.j = 7 AND s.i = 7 AND $bitCond THEN 1 ELSE 0 END) = 1
         |         THEN $bit63 ELSE 0 END""".stripMargin
    val bandList = (0 until PhashBands)
      .map(b => s"(ahash >> ${b * PhashBandBits}) & ${(1 << PhashBandBits) - 1}")
      .mkString("[", ", ", "]")
    s"""d AS (SELECT doc_id, 16 + doc_id % 64 AS w,
       |                  16 + (doc_id * 7) % 64 AS h FROM documents),
       |ij AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS j FROM d),
       |cell AS (SELECT doc_id, w, h, j, unnest(range(0, 8)) AS i FROM ij),
       |samp AS (SELECT doc_id, j, i,
       |           (((i * w // 8) * 7 + (j * h // 8) * 13 + doc_id * 31) % 256) AS pa,
       |           (((i * w // 9) * 7 + (j * h // 8) * 13 + doc_id * 31) % 256) AS pd1,
       |           ((((i + 1) * w // 9) * 7 + (j * h // 8) * 13 + doc_id * 31) % 256) AS pd2
       |         FROM cell),
       |tot AS (SELECT doc_id, sum(pa) AS s64 FROM samp GROUP BY doc_id),
       |hs AS (SELECT s.doc_id,
       |         ${packed("s.pa * 64 > t.s64")} AS ahash,
       |         ${packed("s.pd1 > s.pd2")} AS dhash
       |       FROM samp s JOIN tot t ON s.doc_id = t.doc_id GROUP BY s.doc_id),
       |banded AS (SELECT doc_id, ahash, dhash, unnest(range(0, $PhashBands)) AS band,
       |                  unnest($bandList) AS bucket
       |           FROM hs)""".stripMargin
  }

  private val mPhashDedupSql =
    s"""WITH $phashBandedCte,
       |kept AS (SELECT doc_id, ahash, dhash, band, bucket FROM (
       |           SELECT *, row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) rn
       |           FROM banded) WHERE rn <= ${Dedup.MaxBucketOccupancy})
       |SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
       |       bit_count(xor(x.ahash, y.ahash))::BIGINT AS hamming_a,
       |       bit_count(xor(x.dhash, y.dhash))::BIGINT AS hamming_d
       |FROM kept x JOIN banded y
       |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.ahash, y.ahash)) <= $PhashMaxHamming""".stripMargin

  private val mPhashBucketStatsSql =
    s"""WITH $phashBandedCte,
       |occ AS (SELECT band, bucket, count(*) AS occ FROM banded GROUP BY band, bucket)
       |SELECT band, count(*)::BIGINT AS n_buckets,
       |       CAST(max(occ) AS BIGINT) AS max_occupancy,
       |       CAST(sum(least(occ, ${Dedup.MaxBucketOccupancy})) AS BIGINT) AS docs_kept,
       |       CAST(sum(greatest(occ - ${Dedup.MaxBucketOccupancy}, 0)) AS BIGINT) AS docs_truncated
       |FROM occ GROUP BY band""".stripMargin

  // ----------------------------------------------------------------
  // Audio perceptual dedup (band-energy fingerprint, Hamming-band LSH)
  // ----------------------------------------------------------------

  private[graft] val AudioFpWindows = 64
  /** Hamming ≤ 3 over 4 × 16-bit bands — the [[PhashMaxHamming]]
    * pigeonhole recall argument verbatim, on the audio fingerprint. */
  private[graft] val AudioMaxHamming = 3
  private[graft] val AudioReplicaMod = 50L
  private[graft] val AudioReplicaOffset = 1000000L

  /** Decoded signed 16-bit samples of a WAV — the [[decodeWavStats]]
    * byte walk returning the stream instead of its moments (same SPI
    * reader, both endiannesses). */
  private[graft] def decodeWavSamples(wav: Array[Byte]): Array[Int] = {
    val ais = wavReader(wav)
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16, s"not 16-bit PCM: $fmt")
    val bytes = ais.readAllBytes()
    ais.close()
    val big = fmt.isBigEndian
    Array.tabulate(bytes.length / 2) { i =>
      val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
      val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
      (hi << 8) | lo
    }
  }

  /** Band-energy audio fingerprint (the aHash discipline on the time
    * axis): the decoded stream splits into 64 time windows (sample i →
    * window ⌊i·64/n⌋), window energies are EXACT integer sums of
    * squared amplitudes, and bit k compares window k's energy against
    * the track mean by integer cross-multiplication (64·e_k > Σe —
    * no division, so DuckDB recomputes the hash arithmetically from
    * the closed-form tone). Gain changes scale every window together,
    * so a gain-shifted re-encode keeps (almost) the same bit pattern —
    * the perceptual property the near-dup fixtures exercise. */
  private[graft] def audioFpOf(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= AudioFpWindows,
      s"audio fingerprint needs ≥ $AudioFpWindows samples, got $n")
    val e = new Array[Long](AudioFpWindows)
    var total = 0L
    var i = 0
    while (i < n) {
      val k = (i.toLong * AudioFpWindows / n).toInt
      val s = samples(i).toLong
      e(k) += s * s
      i += 1
    }
    var k = 0
    while (k < AudioFpWindows) { total += e(k); k += 1 }
    var fp = 0L
    k = 0
    while (k < AudioFpWindows) {
      if (e(k) * AudioFpWindows > total) fp |= 1L << k
      k += 1
    }
    fp
  }

  /** Corpus audio fingerprints PLUS planted near-dups: every
    * `AudioReplicaMod`-th track is gain-shifted (every sample halved,
    * trunc toward zero), RE-ENCODED as a real WAV and RE-DECODED —
    * fingerprints come from the genuine codec round-trip on both
    * sides, the [[phashes]] discipline. One map-side decode scan. */
  private def audioFingerprints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread: serial WAV round-trips otherwise (see mVideoFeatures)
    Tables.spread(Tables.documents(s, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val base = decodeWavSamples(synthWav(id, samplesOf(id)))
          val orig = (id, audioFpOf(base))
          if (id % AudioReplicaMod == 0) {
            val rep = decodeWavSamples(synthWavOf(base.map(_ / 2)))
            Iterator(orig, (id + AudioReplicaOffset, audioFpOf(rep)))
          } else Iterator(orig)
        }
      }
      .toDF("doc_id", "afp")
  }

  /** 4 × 16-bit Hamming bands over the fingerprint — the
    * [[phashBanded]] machinery on the audio hash. */
  private def audioFpBanded(fps: DataFrame): DataFrame = {
    val bandArr = (0 until PhashBands)
      .map(b => s"shiftright(afp, ${b * PhashBandBits}) & ${(1 << PhashBandBits) - 1}")
      .mkString("array(", ", ", ")")
    fps.select(col("doc_id"), col("afp"),
      posexplode(expr(bandArr)).as(Seq("band", "bucket")))
  }

  /** Near-dup audio pairs: banded candidates (exact pigeonhole recall
    * at Hamming ≤ 3), occupancy-capped representatives, bit_count
    * confirm — never all-pairs. Output (a_id, b_id, hamming). */
  def audioFpPairsOf(fps: DataFrame,
      maxHamming: Int = AudioMaxHamming): DataFrame = {
    val banded = audioFpBanded(fps)
    val kept = Dedup.keptBandedOf(banded, Dedup.MaxBucketOccupancy)
    kept.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        expr("bit_count(x.afp ^ y.afp)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Band-bucket occupancy audit — the `*_bucket_stats` twin every
    * capped candidate generator ships with. */
  def audioFpBucketStats(fps: DataFrame,
      cap: Int = Dedup.MaxBucketOccupancy): DataFrame =
    audioFpBanded(fps)
      .groupBy(col("band").cast("long").as("band"), col("bucket"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("occ")).as("max_occupancy"),
        sum(least(col("occ"), lit(cap.toLong))).as("docs_kept"),
        sum(greatest(col("occ") - cap, lit(0L))).as("docs_truncated"))

  private def mAudioFpDedup: Q = (s, dir) => audioFpPairsOf(audioFingerprints(s, dir))

  private def mAudioFpBucketStats: Q = (s, dir) =>
    audioFpBucketStats(audioFingerprints(s, dir))

  /** Shared oracle CTEs through `banded`: the closed-form tone (and
    * its trunc-halved replica) → integer window energies → the packed
    * 64-bit fingerprint (bit 63 via the signed-minimum add, the
    * [[phashBandedCte]] trick) → 16-bit bands. No codec in DuckDB — a
    * decode/re-encode bug on the Spark side breaks parity. */
  private val audioFpBandedCte = {
    val bit63 = "(-9223372036854775807 - 1)"
    val bandList = (0 until PhashBands)
      .map(b => s"(afp >> ${b * PhashBandBits}) & ${(1 << PhashBandBits) - 1}")
      .mkString("[", ", ", "]")
    s"""d AS (SELECT doc_id, 256 + doc_id % 512 AS n FROM documents),
       |base AS (SELECT doc_id AS src_id, doc_id, n, 0 AS g FROM d
       |         UNION ALL
       |         SELECT doc_id, doc_id + $AudioReplicaOffset, n, 1
       |         FROM d WHERE doc_id % $AudioReplicaMod = 0),
       |smp AS (SELECT src_id, doc_id, n, g, unnest(range(0, n)) AS i FROM base),
       |amps AS (SELECT doc_id, n, i,
       |           CASE WHEN g = 1
       |             THEN CAST(trunc(((((i * 7919 + src_id * 104729) % 65536) - 32768) / 2.0)) AS BIGINT)
       |             ELSE ((i * 7919 + src_id * 104729) % 65536) - 32768 END AS amp
       |         FROM smp),
       |we AS (SELECT doc_id, (i * $AudioFpWindows) // n AS k, sum(amp * amp) AS e
       |       FROM amps GROUP BY doc_id, (i * $AudioFpWindows) // n),
       |tot AS (SELECT doc_id, sum(e) AS te FROM we GROUP BY doc_id),
       |fp AS (SELECT we.doc_id,
       |         CAST(sum(CASE WHEN e * $AudioFpWindows > te AND k < 63
       |           THEN 1::BIGINT << k::INT ELSE 0 END) AS BIGINT)
       |         + CASE WHEN max(CASE WHEN k = 63 AND e * $AudioFpWindows > te
       |                         THEN 1 ELSE 0 END) = 1
       |                THEN $bit63 ELSE 0 END AS afp
       |       FROM we JOIN tot ON we.doc_id = tot.doc_id GROUP BY we.doc_id),
       |banded AS (SELECT doc_id, afp, unnest(range(0, $PhashBands)) AS band,
       |                  unnest($bandList) AS bucket
       |           FROM fp)""".stripMargin
  }

  private val mAudioFpDedupSql =
    s"""WITH $audioFpBandedCte,
       |kept AS (SELECT doc_id, afp, band, bucket FROM (
       |           SELECT *, row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) rn
       |           FROM banded) WHERE rn <= ${Dedup.MaxBucketOccupancy})
       |SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
       |       bit_count(xor(x.afp, y.afp))::BIGINT AS hamming
       |FROM kept x JOIN banded y
       |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.afp, y.afp)) <= $AudioMaxHamming""".stripMargin

  private val mAudioFpBucketStatsSql =
    s"""WITH $audioFpBandedCte,
       |occ AS (SELECT band, bucket, count(*) AS occ FROM banded GROUP BY band, bucket)
       |SELECT band, count(*)::BIGINT AS n_buckets,
       |       CAST(max(occ) AS BIGINT) AS max_occupancy,
       |       CAST(sum(least(occ, ${Dedup.MaxBucketOccupancy})) AS BIGINT) AS docs_kept,
       |       CAST(sum(greatest(occ - ${Dedup.MaxBucketOccupancy}, 0)) AS BIGINT) AS docs_truncated
       |FROM occ GROUP BY band""".stripMargin

  // ----------------------------------------------------------------
  // Per-partition batch decode plumbing (Dataset + mapPartitions)
  // ----------------------------------------------------------------

  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)
  /** width/height/channels are decoded image geometry; -1 for the
    * non-image media types (whose decode is stubbed). */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      mean_byte: Double, frames: Int, width: Long, height: Long, channels: Long)

  /** The Scala analogue of a Pandas-UDF/mapInPandas decode stage:
    * per-partition iteration so decoder init amortizes across the
    * batch. IMAGE records get a REAL `javax.imageio` decode (payloads
    * are genuine PNGs — mean_byte is the decoded mean pixel, geometry
    * from the raster). AUDIO records get a REAL `javax.sound.sampled`
    * decode (payloads are genuine WAVs — mean_byte is the decoded
    * mean amplitude, frames is the decoded frame count, channels from
    * the format header). VIDEO records get a REAL MPNG demux with a
    * REAL `ImageIO` decode of every frame (mean_byte is the decoded
    * mean pixel over all frames, geometry from the rasters). */
  def decodePartitions(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition codec init: reader-SPI lookup + cache config once
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = r.payload
        r.media_type match {
          case "image" =>
            val st = decodeStats(bytes)
            MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong,
              st.mean, 1, st.width.toLong, st.height.toLong, st.channels.toLong)
          case "audio" =>
            val st = decodeWavStats(bytes)
            MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong,
              st.mean, st.nSamples.toInt, -1L, -1L, st.channels)
          case _ =>
            // video: REAL MPNG demux + per-frame ImageIO decode
            val st = demuxMpng(bytes)
            MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong,
              st.sumPixel.toDouble / (st.frames * st.width * st.height),
              st.frames.toInt, st.width, st.height, 1L)
        }
      }
    }
  }

  /** Typed media table for [[decodePartitions]]: image docs carry a
    * REAL PNG payload (the deterministic test card), audio docs a REAL
    * WAV (the deterministic test tone), video docs a REAL MPNG
    * container of PNG frames. Encoding happens map-side per
    * partition — the write half of the codec plumbing. */
  def mediaRecords(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    dims(Tables.documents(s, dir))
      .select(col("doc_id"),
        col("width").cast("int").as("w"), col("height").cast("int").as("h"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"))
      .as[(Long, Int, Int, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, w, h, mt) =>
          MediaRecord(id,
            mt match {
              case "image" => synthPng(id, w, h)
              case "audio" => synthWav(id, samplesOf(id))
              case _ => synthMpng(id, w, h, framesOf(id))
            }, mt)
        }
      }
  }

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "m_binary_meta" -> mBinaryMeta,
    "m_frame_sample" -> mFrameSample,
    "m_features" -> mFeatures,
    "m_audio_features" -> mAudioFeatures,
    "m_video_features" -> mVideoFeatures,
    "m_patches" -> mPatches,
    "m_image_embed_topk" -> mImageEmbedTopk,
    "m_phash_dedup" -> mPhashDedup,
    "m_phash_bucket_stats" -> mPhashBucketStats,
    "m_audiofp_dedup" -> mAudioFpDedup,
    "m_audiofp_bucket_stats" -> mAudioFpBucketStats)

  val oracles: Map[String, String] = Map(
    "m_binary_meta" -> mBinaryMetaSql,
    "m_frame_sample" -> mFrameSampleSql,
    "m_features" -> mFeaturesSql,
    "m_audio_features" -> mAudioFeaturesSql,
    "m_video_features" -> mVideoFeaturesSql,
    "m_patches" -> mPatchesSql,
    "m_image_embed_topk" -> mImageEmbedTopkSql,
    "m_phash_dedup" -> mPhashDedupSql,
    "m_phash_bucket_stats" -> mPhashBucketStatsSql,
    "m_audiofp_dedup" -> mAudioFpDedupSql,
    "m_audiofp_bucket_stats" -> mAudioFpBucketStatsSql)
}
