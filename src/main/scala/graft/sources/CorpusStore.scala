package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Pins, PublishLock, Similarity}

/** Manifest-versioned document lake — the [[graft.operators.TextIndex]]
  * snapshot discipline applied to the CORPUS itself, so a training run
  * can pin not just the index state it probed but the exact document
  * set those probes served (reference: the idempotent cached-artifact
  * pattern of `hi-csa-db.Rmd:105-131`, where every derived table is a
  * versioned file the pipeline republishes rather than mutates).
  *
  * Layout at `root`:
  *  - `seg-<n>/` — immutable parquet segment dirs; a corpus VERSION is
  *    the set of segments its manifest lists, so two versions share
  *    every segment neither touched (the Iceberg/Delta file-reuse
  *    shape: an append adds ONE segment line, an erasure rewrites ONLY
  *    the segments holding matched docs).
  *  - `_GRAFT_CORPUS_MANIFEST` — the live version: one `seg-<n>` line
  *    per member segment, published by atomic rename.
  *  - `_GRAFT_CORPUS_MANIFEST.v<V>` — immutable snapshot copy per
  *    publish (V monotone), the [[asOf]]/[[snapshotDiff]]/[[rollbackTo]]
  *    substrate.
  *
  * Scale shape: [[read]] is a plain multi-dir parquet scan (predicate
  * pushdown, partition pruning, column pruning all intact — the store
  * adds zero per-row indirection over `spark.read.parquet`). [[forget]]
  * first runs a segment-pruning semi-join (which segments contain any
  * requested id — broadcast, request-sized) and rewrites only those;
  * at 100 TB with date/shard-aligned segments an erasure touches a
  * handful of segments, not the lake. [[snapshotDiff]] reads only the
  * SYMMETRIC DIFFERENCE of the two manifests' segment sets — versions
  * sharing 99 % of their segments diff in time proportional to what
  * changed. All manifest IO goes through the Hadoop FS layer (HDFS/
  * object-store roots work like local), writers serialize on the
  * root's [[PublishLock]], and readers resolve through the manifest so
  * a half-written segment is never visible.
  *
  * Contract: `doc_id` is unique corpus-wide (appends carry new ids, a
  * re-send is an erase + append); each version holds a doc in exactly
  * one segment. [[snapshotDiff]]'s correctness rests on that.
  */
object CorpusStore {

  private val ManifestName = "_GRAFT_CORPUS_MANIFEST"

  private def versionName(v: Long) = s"$ManifestName.v$v"

  private def fsOf(s: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p, p.getFileSystem(s.sparkContext.hadoopConfiguration))
  }

  private def readLines(s: SparkSession, p: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): Seq[String] = {
    val in = fs.open(p)
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      finally in.close()
    new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Live manifest lines; empty when the store doesn't exist yet.
    * Unknown prefixes are ignored by readers — forward-extensible,
    * the TextIndex/AnnIndex manifest convention. */
  private def manifestLines(s: SparkSession, root: String): Seq[String] = {
    val (rootPath, fs) = fsOf(s, root)
    val p = new org.apache.hadoop.fs.Path(rootPath, ManifestName)
    if (!fs.isFile(p)) Seq.empty else readLines(s, p, fs)
  }

  private def liveSegs(s: SparkSession, root: String): Seq[String] =
    manifestLines(s, root).filter(_.startsWith("seg-"))

  private def segsAsOf(s: SparkSession, root: String, v: Long): Seq[String] = {
    val (rootPath, fs) = fsOf(s, root)
    val p = new org.apache.hadoop.fs.Path(rootPath, versionName(v))
    require(fs.isFile(p),
      s"no retained corpus snapshot v$v at $root — it never existed, or it was " +
        "swept/rolled back")
    readLines(s, p, fs).filter(_.startsWith("seg-"))
  }

  /** Retained snapshot versions at `root`, ascending. */
  def snapshots(s: SparkSession, root: String): Seq[Long] = {
    val (rootPath, fs) = fsOf(s, root)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .filter(_.matches(java.util.regex.Pattern.quote(ManifestName) + "\\.v\\d+"))
      .map(_.substring(ManifestName.length + 2).toLong).sorted
  }

  /** The live corpus version (highest snapshot). */
  def currentVersion(s: SparkSession, root: String): Long = {
    val vs = snapshots(s, root)
    require(vs.nonEmpty, s"no corpus store at $root")
    vs.max
  }

  /** Atomic publish: live manifest moved into place, then the
    * immutable `.v<V>` snapshot copy (V = previous max + 1). Written
    * live-first so a crash between the two costs only the snapshot —
    * the TextIndex publish ordering. Returns the new version. */
  private def publish(s: SparkSession, root: String,
      lines: Seq[String]): Long = {
    val (rootPath, fs) = fsOf(s, root)
    fs.mkdirs(rootPath)
    val v = snapshots(s, root).lastOption.getOrElse(0L) + 1
    val tmp = new org.apache.hadoop.fs.Path(rootPath, s".manifest-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      rootPath.toUri, s.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(rootPath, ManifestName),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    val snap = fs.create(new org.apache.hadoop.fs.Path(rootPath, versionName(v)), true)
    try snap.write(lines.mkString("\n").getBytes("UTF-8"))
    finally snap.close()
    val seen = manifestLines(s, root)
    if (seen != lines)
      throw new IllegalStateException(
        s"concurrent corpus publish detected at $root — serialize writers (one per root)")
    v
  }

  private def nextSegOf(lines: Seq[String]): Long =
    lines.filter(_.startsWith("seg-"))
      .map(_.stripPrefix("seg-").toLong).maxOption.fold(0L)(_ + 1)

  /** Found a store at `root` from `docs` (segment 0, version 1). */
  def create(docs: DataFrame, root: String): Long = {
    val s = docs.sparkSession
    PublishLock.withLock(s, root) {
      require(manifestLines(s, root).isEmpty,
        s"corpus store already exists at $root — use append/forget")
      docs.write.mode("overwrite").parquet(s"$root/seg-0")
      writeSegStats(s, root, "seg-0")
      publish(s, root, Seq("seg-0"))
    }
  }

  /** Append a batch as one new immutable segment; every existing
    * segment is carried by reference (zero rewrite). Returns the new
    * version. `tag` (streaming ingest) rides the same atomic publish
    * as the segment, forming the replay-idempotence ledger — the
    * [[graft.operators.TextIndex]] `batch:` discipline on the corpus
    * manifest (readers ignore unknown prefixes). */
  def append(docs: DataFrame, root: String, tag: Option[String] = None): Long = {
    val s = docs.sparkSession
    PublishLock.withLock(s, root) {
      val lines = manifestLines(s, root)
      require(lines.nonEmpty, s"no corpus store at $root — create() first")
      val seg = s"seg-${nextSegOf(lines)}"
      docs.write.mode("overwrite").parquet(s"$root/$seg")
      writeSegStats(s, root, seg)
      publish(s, root, (lines :+ seg) ++ tag.map(t => s"batch:$t"))
    }
  }

  /** Has a streamed batch's tag already ridden a published corpus
    * manifest? The exactly-once check for foreachBatch replays. */
  private[graft] def batchApplied(s: SparkSession, root: String,
      tag: String): Boolean =
    manifestLines(s, root).contains(s"batch:$tag")

  private def readSegs(s: SparkSession, root: String,
      segs: Seq[String]): DataFrame = {
    require(segs.nonEmpty, s"corpus at $root has no segments")
    s.read.parquet(segs.map(g => s"$root/$g"): _*)
  }

  /** The live corpus — a plain parquet scan over the manifest's
    * segments (all pushdown intact). */
  def read(s: SparkSession, root: String): DataFrame =
    readSegs(s, root, liveSegs(s, root))

  /** The live corpus restricted to `doc_id ∈ [lo, hi]` with
    * MANIFEST-LEVEL data skipping (the Iceberg metadata-pruning shape,
    * r12's path-pruned ANN scan applied to the lake): the per-segment
    * `_ranges/` sidecars (cached min/max doc_id, written beside every
    * segment) are consulted in ONE metadata-sized job and only
    * intersecting segments are handed to Spark at all — a ranged read
    * of a date/shard-aligned 100 TB lake lists a handful of segment
    * dirs instead of paying partition discovery over the whole root
    * (>~32 dirs triggers the distributed-listing job; see the ANN
    * probe fix). Segments without a sidecar (pre-sidecar stores) are
    * read conservatively; the row-level `BETWEEN` stays on top, so
    * skipping is a pure pruning optimization, never a semantics
    * change. */
  def readRanged(s: SparkSession, root: String, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"empty doc_id range [$lo, $hi]")
    val (_, fs) = fsOf(s, root)
    val segs = liveSegs(s, root)
    require(segs.nonEmpty, s"corpus at $root has no segments")
    val (cached, blind) = segs.partition(g =>
      fs.exists(new org.apache.hadoop.fs.Path(rangesPath(root, g))))
    // one job over all sidecars (tiny single-row parquets), never one
    // per segment — the forget() pruning lesson
    val hit =
      if (cached.isEmpty) Set.empty[String]
      else s.read.schema(RangesSchema)
        .parquet(cached.map(rangesPath(root, _)): _*)
        .select(input_file_name().as("__f"), col("min_id"), col("max_id"))
        .filter(col("min_id") <= hi && col("max_id") >= lo)
        .select(element_at(split(col("__f"), "/"), -2).as("seg"))
        .distinct().collect().map(_.getString(0)).toSet
    val kept = segs.filter(g => hit(g) || blind.contains(g))
    // every segment skipped: serve the empty result off one segment's
    // schema rather than an unprunable full-root plan
    val use = if (kept.isEmpty) segs.take(1) else kept
    readSegs(s, root, use).filter(col("doc_id").between(lo, hi))
  }

  /** The corpus exactly as retained snapshot `v` read it — the
    * training-run pin. */
  def asOf(s: SparkSession, root: String, v: Long): DataFrame =
    readSegs(s, root, segsAsOf(s, root, v))

  /** Doc-level audit of what changed between two retained snapshots:
    * `(doc_id, change)` with change ∈ added|removed. Reads ONLY the
    * segments in the manifests' symmetric difference — shared segments
    * (untouched by any write between the versions) are never opened,
    * so the diff costs what changed, not what exists. */
  def snapshotDiff(s: SparkSession, root: String, v1: Long, v2: Long): DataFrame = {
    val a = segsAsOf(s, root, v1).toSet
    val b = segsAsOf(s, root, v2).toSet
    val onlyA = (a -- b).toSeq.sorted
    val onlyB = (b -- a).toSeq.sorted
    def ids(segs: Seq[String]): DataFrame =
      if (segs.isEmpty)
        s.range(0).select(col("id").as("doc_id"))
      else readSegs(s, root, segs).select(col("doc_id"))
    val ia = ids(onlyA)
    val ib = ids(onlyB)
    ib.join(ia, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("added").as("change"))
      .unionByName(
        ia.join(ib, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), lit("removed").as("change")))
  }

  /** Erase `ids` (column `doc_id`) from the corpus, copy-on-write:
    * segments holding NO matched doc are carried by reference;
    * each touched segment's survivors rewrite into a fresh segment.
    * Publishes a new version and returns the erasure certificate
    * `(v_before, v_after, n_segments, n_touched, n_deleted)` — the
    * version pair is what makes the certificate auditable: "v_after
    * no longer serves these ids" is a replayable claim via [[asOf]].
    * A request matching nothing publishes nothing (no-op, v_after =
    * v_before) — UNLESS a `tag` is supplied: a tagged no-op publishes a
    * tag-only manifest update (same segments, one `batch:` line), so a
    * streamed delete-only batch whose victims matched nothing still
    * lands in the idempotence ledger and its crash replay SKIPS instead
    * of re-running the pruning scan (the ledger's exactly-once
    * invariant holds by record, not by accidental rescan-idempotence). */
  def forget(s: SparkSession, root: String, ids: DataFrame,
      tag: Option[String] = None): DataFrame = {
    import s.implicits._
    PublishLock.withLock(s, root) {
      val lines = manifestLines(s, root)
      val segs = lines.filter(_.startsWith("seg-"))
      val vBefore = snapshots(s, root).max
      val idsB = broadcast(ids.select(col("doc_id")).distinct()).persist()
      try {
        // segment pruning in ONE job: every segment's doc_id column in
        // one multi-dir scan, semi-joined to the broadcast ids, touched
        // segment names recovered from the file paths — per-batch
        // latency is one Spark action regardless of segment count (the
        // r12 shape ran one driver-blocking job PER segment, so a
        // streaming ingest's forget grew linearly with manifest length)
        val touched = {
          val hit = readSegs(s, root, segs)
            .select(col("doc_id"), input_file_name().as("__f"))
            .join(idsB, Seq("doc_id"), "left_semi")
            .select(element_at(split(col("__f"), "/"), -2).as("seg"))
            .distinct()
            .collect().map(_.getString(0)).toSet // request-sized
          segs.filter(hit)
        }
        if (touched.isEmpty) {
          val vAfter = tag match {
            case Some(t) => publish(s, root, lines :+ s"batch:$t")
            case None => vBefore
          }
          Seq((vBefore, vAfter, segs.size.toLong, 0L, 0L))
            .toDF("v_before", "v_after", "n_segments", "n_touched", "n_deleted")
        } else {
          var next = nextSegOf(lines)
          var deleted = 0L
          val rewritten = touched.map { g =>
            val old = readSegs(s, root, Seq(g))
            val nOld = old.count()
            val fresh = s"seg-$next"; next += 1
            old.join(idsB, Seq("doc_id"), "left_anti")
              .write.mode("overwrite").parquet(s"$root/$fresh")
            writeSegStats(s, root, fresh)
            deleted += nOld - s.read.parquet(s"$root/$fresh").count()
            fresh
          }
          val kept = lines.filterNot(touched.contains)
          val vAfter = publish(s, root, kept ++ rewritten ++ tag.map(t => s"batch:$t"))
          Seq((vBefore, vAfter, segs.size.toLong, touched.size.toLong, deleted))
            .toDF("v_before", "v_after", "n_segments", "n_touched", "n_deleted")
        }
      } finally { idsB.unpersist(); () }
    }
  }

  /** RESTORE the live corpus to retained snapshot `v`: its manifest
    * becomes live again, snapshots after `v` are dropped, and segment
    * dirs only the dropped suffix referenced are deleted IMMEDIATELY
    * (the next append reuses those segment numbers — a stale survivor
    * dir would corrupt later time travel; the TextIndex.rollbackTo
    * rationale). History at and before `v` stays readable via
    * [[asOf]]. */
  def rollbackTo(s: SparkSession, root: String, v: Long): Unit =
    PublishLock.withLock(s, root) {
      // a rollback may not silently destroy a registered training
      // run's replay — the pin registry must release the suffix first
      Pins.requireUnpinned(s, root, snapshots(s, root).filter(_ > v))
      // restore the FULL snapshot lines — the batch: idempotence
      // ledger as of v must survive the restore (the TextIndex
      // rollback rationale: a post-rollback crash replay of a batch
      // applied before v must still skip)
      require(segsAsOf(s, root, v).nonEmpty, s"snapshot v$v at $root is empty")
      val (rp0, fs0) = fsOf(s, root)
      val lines = readLines(s,
        new org.apache.hadoop.fs.Path(rp0, versionName(v)), fs0)
      val (rootPath, fs) = fsOf(s, root)
      // restore makes snapshot v ITSELF the live state — the live
      // manifest is written directly, no new .v copy is minted
      val tmp = new org.apache.hadoop.fs.Path(rootPath, s".manifest-${System.nanoTime()}")
      val out = fs.create(tmp, true)
      try out.write(lines.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        rootPath.toUri, s.sparkContext.hadoopConfiguration)
      fc.rename(tmp, new org.apache.hadoop.fs.Path(rootPath, ManifestName),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      snapshots(s, root).filter(_ > v).foreach { x =>
        fs.delete(new org.apache.hadoop.fs.Path(rootPath, versionName(x)), false); ()
      }
      val keep = (lines ++ snapshots(s, root).flatMap(x => segsAsOf(s, root, x))).toSet
      fs.listStatus(rootPath).toSeq.foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.matches("seg-\\d+") && !keep(n)) {
          // sidecars die with their segment (the sweepUnreferenced
          // discipline): the next append REUSES this segment number,
          // and if its frame lacks the stats columns writeSegStats
          // skips — a surviving stale sidecar would then serve the
          // DELETED segment's stats under the new segment's name
          deleteSegMeta(fs, root, n)
          fs.delete(st.getPath, true); ()
        }
      }
    }

  // ----------------------------------------------------------------
  // Registered oracle query
  // ----------------------------------------------------------------

  private type Q = (SparkSession, String) => DataFrame

  /** `v_corpus_diff` — a four-version store built from `documents`
    * (v1: docs with id % 3 ≠ 0; v2: append the id % 3 = 0 batch;
    * v3: forget ids with id % 97 = 0; v4: compact), then the doc-level
    * [[snapshotDiff]] v1 → v3. Set semantics make the oracle exact
    * and layout-independent: added = in v3 ∧ ∉ v1 = (%97≠0 ∧ %3=0),
    * removed = in v1 ∧ ∉ v3 = (%3≠0 ∧ %97=0) — and because v4 only
    * re-bins, the SAME oracle judges the pre-compaction diff read
    * against post-compaction storage. The store is built once per
    * source fingerprint through the shared [[Similarity.cachedIndex]]
    * memo (the persisted-index discipline). */
  private[graft] def demoStore(s: SparkSession, dir: String): String =
    Similarity.cachedIndex(s, dir, "corpusver", 3, // v3: compaction + _ranges sidecars
        "documents.parquet") { path =>
      val docs = Tables.documents(s, dir)
      create(docs.filter(col("doc_id") % 3 =!= 0), path)
      append(docs.filter(col("doc_id") % 3 === 0), path)
      forget(s, path,
        docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))).collect()
      compact(s, path).collect()
      // cachedIndex's sweep completion marker
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), true).close()
    }

  private def vCorpusDiff: Q = (s, dir) =>
    snapshotDiff(s, demoStore(s, dir), 1L, 3L)

  /** `v_corpus_compact` — the compaction-transparency law as an oracle
    * row set: over the [[demoStore]] fixture's compaction boundary
    * (v3 → v4), the per-language stats of the COMPACTED version carry
    * an `n_diff` column = |[[snapshotDiff]](v3, v4)|. The oracle
    * recomputes v3's stats from the closed-form membership with a
    * literal 0 — a hash match proves compaction re-binned every doc
    * and invented/lost none, at doc granularity. */
  private def vCorpusCompact: Q = (s, dir) => {
    val root = demoStore(s, dir)
    val vPost = currentVersion(s, root)
    val nDiff = snapshotDiff(s, root, vPost - 1, vPost)
      .agg(count(lit(1)).cast("long").as("n_diff"))
    statsAsOf(s, root, vPost).crossJoin(broadcast(nDiff))
  }

  private val vCorpusCompactSql =
    """SELECT lang, count(*)::BIGINT AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(0 AS BIGINT) AS n_diff
      |FROM documents WHERE doc_id % 97 <> 0 GROUP BY lang""".stripMargin

  /** Range-partitioned demo store for [[readRanged]] — three appends
    * with disjoint doc_id thirds, the date/shard-aligned segment shape
    * a real ingest produces (and the one manifest-level skipping pays
    * off on). */
  private[graft] def rangedDemoStore(s: SparkSession, dir: String): String =
    Similarity.cachedIndex(s, dir, "corpusrng", 1, "documents.parquet") { path =>
      val docs = Tables.documents(s, dir)
      create(docs.filter(col("doc_id") < 200), path)
      append(docs.filter(col("doc_id") >= 200 && col("doc_id") < 400), path)
      append(docs.filter(col("doc_id") >= 400), path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), true).close()
    }

  /** `v_corpus_ranged` — a ranged read whose answer the oracle
    * recomputes as a plain BETWEEN over the source table; the
    * manifest-level skipping itself (only the middle segment listed)
    * is PlanSpec-pinned via `inputFiles`. */
  private def vCorpusRanged: Q = (s, dir) =>
    readRanged(s, rangedDemoStore(s, dir), 250L, 370L)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  private val vCorpusRangedSql =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE doc_id BETWEEN 250 AND 370""".stripMargin

  /** GC for the corpus root — the [[graft.operators.TextIndex
    * .sweepUnreferenced]] discipline: expire retained snapshots past
    * the grace window (the Delta-VACUUM retention knob; the CURRENT
    * version is always kept, so version numbering stays monotone and
    * a fresh pin is never invalidated by a concurrent sweep), then
    * delete segment dirs referenced by neither the live manifest nor
    * any surviving snapshot, plus stale temp manifests. Erasure
    * rewrites ([[forget]]) orphan their superseded segments into
    * exactly this path — without the sweep a churning lake's storage
    * grows with its history, not its size. Returns deleted names. */
  def sweepUnreferenced(s: SparkSession, root: String,
      graceMs: Long = 30L * 60 * 1000): Seq[String] = {
    val now = System.currentTimeMillis()
    val (rootPath, fs) = fsOf(s, root)
    if (!fs.exists(rootPath)) return Seq.empty
    val current = snapshots(s, root).lastOption
    // PINNED versions never expire, whatever the grace window: a
    // registered training run's (corpus v, index v) replay outlives
    // retention until its pin is released ([[pin]]/[[unpin]]). Their
    // segments survive via pass 2's retained-snapshot keep set.
    val pinned = Pins.pinnedVersions(s, root).map(versionName(_))
    val snapPattern = java.util.regex.Pattern.quote(ManifestName) + "\\.v\\d+"
    val expired = fs.listStatus(rootPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.matches(snapPattern) &&
        !current.map(versionName).contains(st.getPath.getName) &&
        !pinned(st.getPath.getName) &&
        now - st.getModificationTime > graceMs)
      .map { st => fs.delete(st.getPath, false); st.getPath.getName }
    val keep = (liveSegs(s, root) ++ snapshots(s, root)
      .flatMap(v => segsAsOf(s, root, v))).toSet
    expired ++ fs.listStatus(rootPath).toSeq
      .filter { st =>
        val n = st.getPath.getName
        val stale = now - st.getModificationTime > graceMs
        (st.isDirectory && n.matches("seg-\\d+") && !keep(n) && stale) ||
          (st.isFile && n.startsWith(".manifest-") && stale)
      }
      .map { st =>
        val n = st.getPath.getName
        if (n.matches("seg-\\d+")) deleteSegMeta(fs, root, n)
        fs.delete(st.getPath, true); n
      }
  }

  // ----------------------------------------------------------------
  // Segment compaction (streaming ingest writes one segment per
  // micro-batch — without this, manifest length, read fan-out, and
  // forget's pruning scan grow with HISTORY instead of corpus size)
  // ----------------------------------------------------------------

  /** Bin-pack small segments into ONE rewritten segment, published as
    * a new version — the [[graft.operators.TextIndex.compact]]
    * discipline on the lake: `batch:` ledger lines ride the republish
    * untouched (a crash replay of a streamed batch must still skip
    * after an in-cadence compaction), earlier snapshots keep their old
    * manifests, so a pin taken BEFORE compaction replays byte-identical
    * reads from the superseded segments until retention (or a pin
    * release) lets [[sweepUnreferenced]] reclaim them. Docs are only
    * re-binned, never changed: `snapshotDiff(v_pre, v_post)` is empty
    * by construction (oracle-pinned via `v_corpus_compact`).
    *
    * Victims are the live segments under `smallSegBytes` on disk; at
    * least two must qualify or the call is a no-op (folding one
    * segment into itself buys nothing). Scale shape: one read+write of
    * the victim bytes; big settled segments are carried by reference
    * and never rewritten — compaction cost tracks the STREAMED TAIL,
    * not the lake. Returns `(v_before, v_after, segs_folded, n_docs)`. */
  def compact(s: SparkSession, root: String,
      smallSegBytes: Long = 64L * 1024 * 1024): DataFrame = {
    import s.implicits._
    PublishLock.withLock(s, root) {
      val lines = manifestLines(s, root)
      val segs = lines.filter(_.startsWith("seg-"))
      require(segs.nonEmpty, s"no corpus store at $root — create() first")
      val vBefore = snapshots(s, root).max
      val (rootPath, fs) = fsOf(s, root)
      val victims = segs.filter { g =>
        fs.getContentSummary(new org.apache.hadoop.fs.Path(rootPath, g))
          .getLength < smallSegBytes
      }
      if (victims.length < 2)
        Seq((vBefore, vBefore, 0L, 0L))
          .toDF("v_before", "v_after", "segs_folded", "n_docs")
      else {
        val fresh = s"seg-${nextSegOf(lines)}"
        readSegs(s, root, victims)
          .write.mode("overwrite").parquet(s"$root/$fresh")
        writeSegStats(s, root, fresh)
        val n = s.read.parquet(s"$root/$fresh").count()
        // filterNot keeps every non-victim line — surviving big
        // segments AND the batch: ledger — in original order
        val vAfter = publish(s, root, lines.filterNot(victims.contains) :+ fresh)
        Seq((vBefore, vAfter, victims.length.toLong, n))
          .toDF("v_before", "v_after", "segs_folded", "n_docs")
      }
    }
  }

  /** [[compact]] made a POLICY (the [[graft.operators.TextIndex
    * .compactIfBloated]] loop for the lake): fold iff more than
    * `maxSmallSegments` live segments sit under the size threshold —
    * what a streaming ingest runs every N batches so segment count
    * tracks corpus size, not batch history. Returns Some(accounting)
    * when it compacted, None within budget. */
  def compactIfFragmented(s: SparkSession, root: String,
      maxSmallSegments: Int = 16,
      smallSegBytes: Long = 64L * 1024 * 1024): Option[DataFrame] = {
    val (rootPath, fs) = fsOf(s, root)
    val small = liveSegs(s, root).count { g =>
      fs.getContentSummary(new org.apache.hadoop.fs.Path(rootPath, g))
        .getLength < smallSegBytes
    }
    if (small > maxSmallSegments) Some(compact(s, root, smallSegBytes)) else None
  }

  // ----------------------------------------------------------------
  // Training-run pin registry (shared Pins discipline — see
  // graft.operators.Pins)
  // ----------------------------------------------------------------

  /** Pin retained version `v` under `tag`: [[sweepUnreferenced]] will
    * never expire it (nor GC its segments) until [[unpin]], however
    * long the training run outlives the grace window. */
  def pin(s: SparkSession, root: String, tag: String, v: Long): Unit =
    Pins.pin(s, root, tag, v, x => snapshots(s, root).contains(x))

  /** Release `tag`'s pin; the next sweep past grace may reclaim. */
  def unpin(s: SparkSession, root: String, tag: String): Unit =
    Pins.unpin(s, root, tag)

  /** The live pin registry at `root`: tag → version. */
  def pins(s: SparkSession, root: String): Map[String, Long] =
    Pins.pins(s, root)

  // ----------------------------------------------------------------
  // Incremental corpus statistics (manifest-diff maintenance)
  // ----------------------------------------------------------------

  private val StatsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sum_chars", org.apache.spark.sql.types.LongType)))

  private def statsPath(root: String, seg: String) = s"$root/_stats/$seg"

  // per-segment doc_id min/max sidecar — the [[readRanged]] skipping
  // substrate. Unlike the (lang, n_chars) stats, doc_id is the store's
  // CONTRACT column, so every segment gets one.
  private val RangesSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("min_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("max_id", org.apache.spark.sql.types.LongType)))

  private def rangesPath(root: String, seg: String) = s"$root/_ranges/$seg"

  private def deleteSegMeta(fs: org.apache.hadoop.fs.FileSystem,
      root: String, seg: String): Unit = {
    fs.delete(new org.apache.hadoop.fs.Path(statsPath(root, seg)), true)
    fs.delete(new org.apache.hadoop.fs.Path(rangesPath(root, seg)), true)
    ()
  }

  /** Per-segment stats of ONE segment, computed from its rows — the
    * writer-side function whose output the `_stats/` sidecar caches. */
  private def computeSegStats(s: SparkSession, root: String,
      seg: String): DataFrame =
    readSegs(s, root, Seq(seg)).groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(col("n_chars")), lit(0L)).cast("long").as("sum_chars"))

  /** Materialize a fresh segment's stats sidecar. Called by every
    * segment writer BEFORE its publish, so any PUBLISHED segment has
    * its stats beside it (a crash in between leaves an unpublished
    * segment whose replay overwrites both); readers still fall back to
    * computing for sidecar-less segments (pre-sidecar stores). The
    * store itself is schema-generic — a corpus without the documents
    * shape (lang, n_chars) simply carries no sidecar, and the stats
    * surface (which needs those columns) is not meaningful for it. */
  private def writeSegStats(s: SparkSession, root: String, seg: String): Unit = {
    val df = readSegs(s, root, Seq(seg))
    if (Seq("lang", "n_chars").forall(df.columns.contains))
      computeSegStats(s, root, seg)
        .write.mode("overwrite").parquet(statsPath(root, seg))
    // the ranges sidecar rides the same writer slot: a 1-row (min, max)
    // over the contract column, a fraction of the segment write it
    // follows. An empty segment writes (null, null) — readRanged skips
    // it (no row can match any range).
    df.agg(min(col("doc_id")).cast("long").as("min_id"),
        max(col("doc_id")).cast("long").as("max_id"))
      .write.mode("overwrite").parquet(rangesPath(root, seg))
  }

  /** Signed per-language statistics over a set of segments. Segments
    * are IMMUTABLE, so a segment's stats row set is a pure function of
    * the segment, cached in the `_stats/` sidecar at WRITE time (the
    * Iceberg manifest-stats shape): a VERSION's stats are the
    * monoid-sum over metadata-sized sidecar rows — no segment data
    * read at all (read-path preference spec-pinned; segments from
    * pre-sidecar stores fall back to a compute). */
  private def statsOfSegs(s: SparkSession, root: String,
      segs: Seq[String], sign: Int): DataFrame = {
    val (_, fs) = fsOf(s, root)
    val (cached, missing) = segs.partition(g =>
      fs.exists(new org.apache.hadoop.fs.Path(statsPath(root, g))))
    val frames =
      (if (cached.nonEmpty)
        Seq(s.read.schema(StatsSchema).parquet(cached.map(statsPath(root, _)): _*))
       else Seq.empty) ++ missing.map(g => computeSegStats(s, root, g))
    frames.reduce(_ unionByName _)
      .select(col("lang"), (col("n_docs") * sign).cast("long").as("n_docs"),
        (col("sum_chars") * sign).cast("long").as("sum_chars"))
  }

  /** Per-language corpus statistics of retained version `v` — a
    * monoid-sum over its member segments' sidecar rows (metadata-sized
    * when every member carries one). */
  def statsAsOf(s: SparkSession, root: String, v: Long): DataFrame =
    statsOfSegs(s, root, segsAsOf(s, root, v), 1)
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_chars")).cast("long").as("sum_chars"))

  /** Stats of `v2` MAINTAINED from `v1`'s: base stats ⊕ segments only
    * in v2 ⊖ segments only in v1 — the manifest-diff IVM identity.
    * Only the symmetric difference is scanned beyond the (cacheable)
    * base, so maintaining stats across an append or an erasure costs
    * what changed, not what exists — at a 100 TB lake with per-segment
    * stats cached, a version's stats are a metadata-sized signed sum,
    * no segment read at all. Equals [[statsAsOf]]`(v2)` exactly
    * (oracle-pinned). */
  def statsIncremental(s: SparkSession, root: String,
      v1: Long, v2: Long): DataFrame = {
    val a = segsAsOf(s, root, v1).toSet
    val b = segsAsOf(s, root, v2).toSet
    val parts = Seq((a.toSeq.sorted, 1), ((b -- a).toSeq.sorted, 1),
        ((a -- b).toSeq.sorted, -1))
      .filter(_._1.nonEmpty)
      .map { case (segs, sign) => statsOfSegs(s, root, segs, sign) }
    parts.reduce(_ unionByName _)
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_chars")).cast("long").as("sum_chars"))
      .filter(col("n_docs") > 0)
  }

  /** `v_corpus_stats_ivm` — the incremental stats of v3 maintained
    * from v1's over the [[demoStore]] fixture; the oracle recomputes
    * v3's stats directly from the closed-form membership (v3 = all
    * docs except id % 97 = 0), so a hash match proves the signed
    * manifest-diff merge identity, not just plausibility. */
  private def vCorpusStatsIvm: Q = (s, dir) =>
    statsIncremental(s, demoStore(s, dir), 1L, 3L)

  private val vCorpusStatsIvmSql =
    """SELECT lang, count(*)::BIGINT AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE doc_id % 97 <> 0 GROUP BY lang""".stripMargin

  private val vCorpusDiffSql =
    """SELECT doc_id, 'added' AS change FROM documents
      |WHERE doc_id % 97 <> 0 AND doc_id % 3 = 0
      |UNION ALL
      |SELECT doc_id, 'removed' FROM documents
      |WHERE doc_id % 3 <> 0 AND doc_id % 97 = 0""".stripMargin

  def queries: Map[String, Q] = Map(
    "v_corpus_diff" -> vCorpusDiff,
    "v_corpus_stats_ivm" -> vCorpusStatsIvm,
    "v_corpus_compact" -> vCorpusCompact,
    "v_corpus_ranged" -> vCorpusRanged)
  def oracles: Map[String, String] = Map(
    "v_corpus_diff" -> vCorpusDiffSql,
    "v_corpus_stats_ivm" -> vCorpusStatsIvmSql,
    "v_corpus_compact" -> vCorpusCompactSql,
    "v_corpus_ranged" -> vCorpusRangedSql)
}
