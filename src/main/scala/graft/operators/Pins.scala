package graft.operators

import org.apache.spark.sql.SparkSession

/** Named snapshot pins shared by all three versioned stores
  * ([[graft.sources.CorpusStore]], [[TextIndex]], [[AnnIndex]]) — the
  * training-run registry that makes snapshot retention a CONTRACT
  * instead of a race against the grace window: retention on every
  * surface was grace-only, so a training run longer than the window
  * silently lost its pinned (corpus v, index v) replay — the exact
  * guarantee the versioned stores exist to give.
  *
  * A pin is a `pin:<tag>=<version>` line in the root's `_GRAFT_PINS`
  * file (atomic temp-file + rename publish, the manifest discipline;
  * writers serialize on the root's [[PublishLock]]). Each store's
  * `sweepUnreferenced` reads the registry FIRST and never expires a
  * pinned version's snapshot manifest — and because generation/segment
  * GC keys off the RETAINED snapshots, a pinned version's data dirs
  * survive with it, no per-store special-casing. `rollbackTo` refuses
  * to discard a pinned version (unpin first — losing a registered
  * training run's replay should be a two-step, named decision).
  *
  * Scale shape: the registry is one metadata file read per sweep, and
  * pins are model-sized by construction (one line per live training
  * run). Reference lineage: the same republish-don't-mutate artifact
  * pattern as the manifests themselves (`hi-csa-db.Rmd:105-131`).
  */
private[graft] object Pins {

  private val PinsName = "_GRAFT_PINS"

  private def pinsPath(root: String) = new org.apache.hadoop.fs.Path(root, PinsName)

  private def fsOf(s: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p, p.getFileSystem(s.sparkContext.hadoopConfiguration))
  }

  /** The registry at `root`: tag → pinned version. Empty when no pin
    * was ever taken. */
  def pins(s: SparkSession, root: String): Map[String, Long] = {
    val (_, fs) = fsOf(s, root)
    val p = pinsPath(root)
    if (!fs.isFile(p)) Map.empty
    else {
      val in = fs.open(p)
      val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        finally in.close()
      new String(bytes, "UTF-8").split("\n").toSeq.filter(_.startsWith("pin:"))
        .map { line =>
          val kv = line.stripPrefix("pin:").split("=", 2)
          kv(0) -> kv(1).toLong
        }.toMap
    }
  }

  /** Pinned version numbers at `root` — what a sweep must retain. */
  def pinnedVersions(s: SparkSession, root: String): Set[Long] =
    pins(s, root).values.toSet

  private def write(s: SparkSession, root: String, m: Map[String, Long]): Unit = {
    val (rootPath, fs) = fsOf(s, root)
    fs.mkdirs(rootPath)
    if (m.isEmpty) { fs.delete(pinsPath(root), false); () }
    else {
      val tmp = new org.apache.hadoop.fs.Path(rootPath, s".pins-${System.nanoTime()}")
      val out = fs.create(tmp, true)
      try out.write(m.toSeq.sortBy(_._1)
        .map { case (t, v) => s"pin:$t=$v" }.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        rootPath.toUri, s.sparkContext.hadoopConfiguration)
      fc.rename(tmp, pinsPath(root), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Register `tag` against retained version `v`. `exists` is the
    * store's own version-retained check (pinning an already-swept
    * version would register an unreplayable pin — fail loudly now,
    * not at replay time). Re-pinning an existing tag moves it. */
  def pin(s: SparkSession, root: String, tag: String, v: Long,
      exists: Long => Boolean): Unit = {
    require(tag.nonEmpty && !tag.contains("=") && !tag.contains("\n"),
      s"pin tag must be a single line without '=': '$tag'")
    require(exists(v),
      s"cannot pin version $v at $root — not a retained snapshot (it never " +
        "existed, or the retention sweep already dropped it)")
    PublishLock.withLock(s, root) {
      write(s, root, pins(s, root) + (tag -> v))
    }
  }

  /** Drop `tag`'s pin; the next sweep past the grace window may then
    * reclaim the version. Unpinning an unknown tag is a no-op. */
  def unpin(s: SparkSession, root: String, tag: String): Unit =
    PublishLock.withLock(s, root) {
      write(s, root, pins(s, root) - tag)
    }

  /** Guard for the stores' `rollbackTo`: refuse to discard snapshots a
    * pin still references. */
  def requireUnpinned(s: SparkSession, root: String,
      dropping: Seq[Long]): Unit = {
    val hit = pins(s, root).filter { case (_, v) => dropping.contains(v) }
    require(hit.isEmpty,
      s"rollback at $root would discard pinned version(s) " +
        hit.map { case (t, v) => s"v$v (pin '$t')" }.mkString(", ") +
        " — unpin first if losing those replays is intended")
  }
}
