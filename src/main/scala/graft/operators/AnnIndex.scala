package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained IVF index — the production twin of the
  * fingerprint-cached [[Similarity.ivfIndex]] for a corpus that GROWS
  * (a daily-append training pipeline cannot re-publish the whole index
  * per batch, [[Dedup]]'s `d_incremental` argument applied to ANN).
  *
  * Layout under one `root`:
  *  - `seeds/`        the frozen coarse quantizer: the `cells`
  *                    lowest-id vectors of the FOUNDING build
  *                    `(cell, se, sn)`. Upserts assign against these
  *                    STORED seeds — cell membership of a vector never
  *                    changes after it is written, which is what makes
  *                    append-only cell partitions possible. Production
  *                    retrains by rebuilding at a new root (quantizer
  *                    drift is a rebuild, not an upsert).
  *  - `codebooks/`    the frozen fine quantizer: per-subspace PQ
  *                    codebooks `(mm, code, ce, cn)` trained once on
  *                    the deterministic founding sample
  *                    (`vec_id < PqTrainN`). Same freeze rationale as
  *                    the seeds: a batch encoded today must mean the
  *                    same thing as a batch encoded last month.
  *  - `data-<gen>/`   vectors `(vec_id, label, embedding, nrm, gen)`
  *                    partitioned by `cell`; gen 0 is the base build,
  *                    each upsert appends the next generation. Files
  *                    are never rewritten — an upsert only ADDS a
  *                    directory.
  *  - `codes-<gen>/`  per-vector PQ codes `(vec_id, codes, gen)`
  *                    partitioned by `cell`, one per data generation —
  *                    the ADC serving side: [[probeAdc]] scans ONLY
  *                    these (M small ints per vector) plus the
  *                    shortlist's full vectors.
  *  - `tombs-<gen>/`  tombstones `(vec_id, gen)` partitioned by
  *                    `cell` — a [[delete]] appends one; probes treat
  *                    data rows and tombstones as one event stream
  *                    per vec_id where the LATEST generation wins, so
  *                    a tombstone hides every earlier row and a later
  *                    re-upsert revives the id. Files, again, are
  *                    never rewritten.
  *  - `stats-<gen>/`  per-(cell, dim) running `(sm, cnt)` — double
  *                    sums of float32 components are EXACT at this
  *                    scale (the [[Similarity]] centroid discipline),
  *                    so `sm/cnt` after N upserts is bit-identical to
  *                    the mean a full rebuild would compute. Probes
  *                    derive centroids from the LATEST stats, so cell
  *                    selection matches a rebuilt index exactly
  *                    (spec-pinned).
  *  - `_GRAFT_IVF_MANIFEST`  `gen` + the ordered data-dir list,
  *                    published with an ATOMIC temp-file move (the
  *                    [[Similarity.cachedIndex]] discipline): readers
  *                    resolve the index through it and never observe a
  *                    half-written generation. Concurrent upserters
  *                    race at the manifest (last move wins whole);
  *                    serialize upserts externally.
  *
  * Centroid exactness holds under pure APPENDS (all-new vec_ids — the
  * spec-pinned case). A re-sent vec_id is still served correctly
  * (latest generation wins at probe time) but its superseded row keeps
  * contributing to the running stats until a rebuild — centroids drift
  * from the rebuild means by the overwritten mass, the standard
  * LSM-index tradeoff.
  *
  * Probe cost is independent of upsert count in the variable term: the
  * scan prunes every data generation to the `nprobe` probed cells
  * (PartitionFilters), and the latest-generation-wins dedup (a true
  * UPSERT: a re-sent vec_id shadows its older row) is a window over
  * probed-cell rows only. The fixed term grows with generations (one
  * directory listing each) — compact by rebuilding when deltas
  * accumulate, exactly like any LSM-shaped store. */
object AnnIndex {

  private val ManifestName = "_GRAFT_IVF_MANIFEST"

  private def dot(a: String, b: String): String = Similarity.foldDot(a, b)

  // PQ geometry (matches the in-query [[Similarity]] PQ shape): M
  // subspaces of SubDim dims, K codes per subspace, codebooks trained
  // once at build time on the deterministic founding sample and FROZEN
  // (the seeds discipline applied to the fine quantizer — production
  // retrains by rebuilding at a new root).
  private val PqM = 4
  private val PqSubDim = 16
  private val PqK = 8
  /** Codebooks train on the vectors with `vec_id < PqTrainN` — a
    * deterministic sample that any founding corpus contains, so a
    * full rebuild over base+batches trains the IDENTICAL codebooks
    * (what makes probeAdc(upserted) == probeAdc(rebuilt) exact,
    * spec-pinned). */
  private val PqTrainN = 64

  private def pqSubs(colName: String): String = (0 until PqM)
    .map(m => s"struct($m as m, slice($colName, ${m * PqSubDim + 1}, $PqSubDim) as sv)")
    .mkString("array(", ", ", ")")

  private def dataDirsOf(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith("data-"))
  private def tombDirsOf(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith("tombs-"))

  /** `(gen, ordered data/tombstone dir names)` through the manifest;
    * None when the root holds no published index. */
  private def readManifest(root: String): Option[(Long, Seq[String])] = {
    val f = new java.io.File(root, ManifestName)
    if (!f.isFile) None
    else {
      val lines = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .split("\n").toSeq.filter(_.nonEmpty)
      lines.headOption.flatMap(h => scala.util.Try(h.toLong).toOption)
        .map(gen => (gen, lines.drop(1)))
    }
  }

  private def writeManifest(root: String, gen: Long, dataDirs: Seq[String]): Unit = {
    val rootDir = new java.io.File(root)
    rootDir.mkdirs()
    val tmp = new java.io.File(rootDir, s".manifest-${System.nanoTime()}")
    java.nio.file.Files.write(tmp.toPath,
      (gen.toString +: dataDirs).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(rootDir, ManifestName).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** `(vec_id, label, embedding)` → `(vec_id, label, embedding, nrm)`
    * with the shared norm fold. */
  private def withNorm(v: DataFrame): DataFrame =
    v.withColumn("nrm", expr(s"sqrt(${dot("embedding", "embedding")})"))

  /** Assign every vector to its nearest stored seed — the one
    * deterministic step both build and upsert share (argmin of
    * ‖s‖² − 2·x·s, ties → lowest cell). */
  private def assign(v: DataFrame, seeds: DataFrame): DataFrame =
    v.crossJoin(broadcast(seeds))
      .withColumn("score", col("sn") - lit(2.0) * expr(dot("embedding", "se")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("score"), col("cell"))).as("best"),
        first(col("label")).as("label"),
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("label"), col("embedding"), col("nrm"),
        col("best.cell").as("cell"))

  /** Per-(cell, dim) running sums feeding the exact incremental
    * centroid: `(cell, pos, sm, cnt)`. */
  private def statsOf(assigned: DataFrame): DataFrame =
    assigned.select(col("cell").cast("long").as("cell"),
        posexplode(col("embedding")).as(Seq("pos", "cv")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("cv").cast("double")).as("sm"), count(lit(1)).as("cnt"))

  /** Train the frozen per-subspace PQ codebooks from the
    * deterministic founding sample (`vec_id < PqTrainN`): init
    * centroids are the `PqK` lowest-id sample vectors' subvectors,
    * refined by one Lloyd round over the sample (double-sum means —
    * exact, so retraining on the same sample is bit-identical).
    * Returns `(mm, code, ce, cn)`. */
  private def trainCodebooks(v: DataFrame): DataFrame = {
    val sample = v.filter(col("vec_id") < PqTrainN)
      .select(col("vec_id"), explode(expr(pqSubs("embedding"))).as("p"))
      .select(col("vec_id"), col("p.m").as("m"), col("p.sv").as("sv"))
    val init = sample.filter(col("vec_id") < PqK)
      .select(col("m").as("mm"), col("vec_id").as("code"), col("sv").as("ce"))
    val assignedSample = sample
      .join(broadcast(init), col("m") === col("mm"))
      .withColumn("score", expr(s"${dot("ce", "ce")} - 2.0 * ${dot("sv", "ce")}"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("score"), col("code"))).as("best"),
        first(col("sv")).as("sv"))
      .select(col("m"), col("best.code").as("code"),
        posexplode(col("sv")).as(Seq("pos", "cv")))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg((sum(col("cv").cast("double")) / count(lit(1))).as("mv"))
      .groupBy(col("m"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, mv))), x -> cast(x.mv as float))")
        .as("ce"))
    // a code with no sample members keeps its init centroid
    init.select(col("mm"), col("code"), col("ce").as("ice"))
      .join(assignedSample.withColumnsRenamed(Map("m" -> "mm")),
        Seq("mm", "code"), "left")
      .select(col("mm"), col("code"), coalesce(col("ce"), col("ice")).as("ce"))
      .withColumn("cn", expr(dot("ce", "ce")))
  }

  /** Encode assigned vectors against the stored codebooks: per-row
    * argmin over the M·K broadcast codebook union (ties → lowest
    * code) → `(vec_id, cell, codes array<int>)`. Deterministic given
    * the codebooks, so incrementally-encoded batches match what a
    * full rebuild with the same (frozen-sample) codebooks writes. */
  private def encode(assigned: DataFrame, books: DataFrame): DataFrame =
    assigned
      .select(col("vec_id"), col("cell"),
        explode(expr(pqSubs("embedding"))).as("p"))
      .select(col("vec_id"), col("cell"), col("p.m").as("m"), col("p.sv").as("sv"))
      .join(broadcast(books), col("m") === col("mm"))
      .withColumn("score", col("cn") - lit(2.0) * expr(dot("sv", "ce")))
      .groupBy(col("vec_id"), col("m"))
      .agg(first(col("cell")).as("cell"),
        min(struct(col("score"), col("code"))).as("best"))
      .select(col("vec_id"), col("cell"), col("m"), col("best.code").as("code"))
      .groupBy(col("vec_id"))
      .agg(first(col("cell")).as("cell"),
        expr("transform(array_sort(collect_list(struct(m, code))), x -> cast(x.code as int))")
          .as("codes"))

  /** Found the index: freeze the coarse quantizer (the `cells`
    * lowest-id vectors as seeds) AND the fine quantizer (PQ codebooks
    * from the founding sample), write generation 0 of the data and of
    * the PQ codes cell-partitioned, the running centroid stats, and
    * publish the manifest. `vectors` must be non-empty and contain
    * the seed ids `0 until cells`. */
  def build(vectors: DataFrame, root: String, cells: Int = 8): Unit = {
    org.apache.spark.sql.graft.GraftFunctions.register(vectors.sparkSession)
    val v = withNorm(vectors.select(col("vec_id").cast("long").as("vec_id"),
      col("label"), col("embedding")))
    val seeds = v.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("se"))
      .withColumn("sn", expr(dot("se", "se")))
    seeds.write.mode("overwrite").parquet(s"$root/seeds")
    trainCodebooks(v).write.mode("overwrite").parquet(s"$root/codebooks")
    val s = vectors.sparkSession
    val storedSeeds = s.read.parquet(s"$root/seeds")
    val a = assign(v, storedSeeds)
      .withColumn("gen", lit(0L))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      a.write.mode("overwrite").partitionBy("cell").parquet(s"$root/data-0")
      encode(a, s.read.parquet(s"$root/codebooks"))
        .withColumn("gen", lit(0L))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$root/codes-0")
      statsOf(a).write.mode("overwrite").parquet(s"$root/stats-0")
    } finally a.unpersist()
    writeManifest(root, 0L, Seq("data-0"))
  }

  /** Append a batch: assign against the STORED seeds, write the next
    * data generation (cell partitions — files of older generations are
    * untouched), merge the batch's component sums into the running
    * stats (exact, see class doc), and atomically publish the new
    * manifest. Returns the per-cell accounting row the caller audits —
    * `(cell, n_before, n_added, n_after)` — the
    * `d_lsh_bucket_stats` discipline for index growth. */
  def upsert(batch: DataFrame, root: String): DataFrame = {
    val s = batch.sparkSession
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val (gen, dataDirs) = readManifest(root).getOrElse(
      throw new IllegalStateException(s"no ANN index published at $root — build() first"))
    val newGen = gen + 1
    val seeds = s.read.parquet(s"$root/seeds")
    val b = assign(withNorm(batch.select(col("vec_id").cast("long").as("vec_id"),
        col("label"), col("embedding"))), seeds)
      .withColumn("gen", lit(newGen))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      b.write.mode("overwrite").partitionBy("cell").parquet(s"$root/data-$newGen")
      // encode the batch against the FROZEN founding codebooks — the
      // ADC side of the index stays append-only too
      encode(b, s.read.parquet(s"$root/codebooks"))
        .withColumn("gen", lit(newGen))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$root/codes-$newGen")
      val old = s.read.parquet(s"$root/stats-$gen")
      statsOf(b).unionByName(old)
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("sm")).as("sm"), sum(col("cnt")).as("cnt"))
        .write.mode("overwrite").parquet(s"$root/stats-$newGen")
      writeManifest(root, newGen, dataDirs :+ s"data-$newGen")
      // accounting from the dim-0 stats rows (one per cell): vector
      // counts before/added/after — collected AFTER publish so the
      // numbers describe the live index
      val before = old.filter(col("pos") === 0)
        .select(col("cell"), col("cnt").as("n_before"))
      val added = s.read.parquet(s"$root/stats-$newGen").filter(col("pos") === 0)
        .select(col("cell"), col("cnt").as("n_after"))
      added.join(before, Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          (col("n_after") - coalesce(col("n_before"), lit(0L))).as("n_added"),
          col("n_after"))
        .orderBy(col("cell"))
    } finally b.unpersist()
  }

  /** Latest-event-wins resolution over generation dirs plus
    * tombstones, optionally restricted to `cells` (the probed-cell
    * prune — pushed through the union into every generation's
    * PartitionFilters). Data rows and tombstones form ONE event
    * stream per vec_id ordered by generation: the newest event wins,
    * and a winning tombstone removes the id (a later re-upsert
    * revives it). `payload` names the value columns of `dirs`' rows;
    * tombstones contribute nulls there and never survive the
    * filter. */
  private def liveIn(s: SparkSession, root: String, dirs: Seq[String],
      tombDirs: Seq[String], cells: Option[Array[Long]],
      payload: Seq[String]): DataFrame = {
    val rows = dirs.map(d => s.read.parquet(s"$root/$d")
        .select(col("vec_id") +: col("gen") +: col("cell") +:
          lit(false).as("is_tomb") +: payload.map(col): _*))
      .reduce(_ unionByName _)
    val events = tombDirs
      .map(d => s.read.parquet(s"$root/$d")
        .select(col("vec_id"), col("gen"), col("cell"), lit(true).as("is_tomb")))
      .foldLeft(rows)((acc, t) => acc.unionByName(t, allowMissingColumns = true))
    // partition-column discovery types `cell` as INT when re-reading a
    // dir written partitionBy("cell") — normalize so every consumer
    // (stats rebuild, accounting, getLong collects) sees LONG
    val typed = events.withColumn("cell", col("cell").cast("long"))
    val pruned = cells match {
      case Some(cs) => typed.filter(col("cell").isin(cs.map(Long.box): _*))
      case None => typed
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("gen").desc)
    pruned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && !col("is_tomb"))
      .drop("rn", "is_tomb")
  }

  /** Top-`k` cosine probe: centroids derive from the LATEST running
    * stats (bit-identical to a full rebuild's means), the data scan
    * reads every generation pruned to the `nprobe` probed cells, and a
    * latest-generation-wins window (probed rows only) makes re-sent
    * vec_ids true upserts. An unbuilt root yields an empty frame. */
  def probe(s: SparkSession, root: String, queryVec: Array[Float],
      nprobe: Int = 2, k: Int = 10): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val empty = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType))))
    readManifest(root) match {
      case None => empty
      case Some((gen, dataDirs)) =>
        // driver-side left fold — the same index-order accumulation as
        // graft_dot, so qnrm matches an engine-computed norm bit-for-bit
        val qnrm = math.sqrt(
          queryVec.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
        val cent = s.read.parquet(s"$root/stats-$gen")
          .select(col("cell"), col("pos"), (col("sm") / col("cnt")).as("m"))
          .groupBy(col("cell"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> cast(x.m as float))")
            .as("ce"))
        val probeCells = cent.withColumn("qe", typedLit(queryVec))
          .withColumn("pscore", expr(s"${dot("ce", "ce")} - 2 * ${dot("qe", "ce")}"))
          .orderBy(col("pscore").asc, col("cell").asc)
          .limit(nprobe)
          .select(col("cell")).collect().map(_.getLong(0))
        if (probeCells.isEmpty) empty
        else {
          // one read per generation (each dir is its own partitioned
          // table), unioned — Catalyst pushes the cell filter through
          // the union into every generation's PartitionFilters
          liveIn(s, root, dataDirsOf(dataDirs), tombDirsOf(dataDirs),
              Some(probeCells), Seq("label", "embedding", "nrm"))
            .withColumn("qe", typedLit(queryVec))
            .select(col("vec_id"), col("label"), col("cell").cast("long").as("cell"),
              (expr(dot("embedding", "qe")) / (col("nrm") * lit(qnrm))).as("cos"))
            .orderBy(col("cos").desc, col("vec_id").asc)
            .limit(k)
            .select(col("vec_id"), col("label"), col("cell"),
              round(col("cos"), 6).as("cosine"))
        }
    }
  }

  /** IVF-PQ serving probe over the incrementally-maintained index —
    * the two-stage shape of [[Similarity]]'s `s_ivfpq_indexed` on top
    * of the LSM generation layout: nearest `nprobe` cells from the
    * LATEST running-stats centroids, the query's M×K ADC table from
    * the FROZEN stored codebooks, then the ADC stage scans ONLY the
    * stored codes of the probed cells across every generation (raw
    * embeddings never read here; latest-generation-wins makes re-sent
    * ids true upserts), and the `rerankPool` shortlist alone pays a
    * full-dimension exact cosine from the data generations (same
    * cell-pruned scan). ADC partial sums go through the
    * round-to-9dp-decimal discipline so the sum is association-order
    * independent, which makes probeAdc(upserted) == probeAdc(rebuilt)
    * exact under pure appends (spec-pinned — the codebooks train on
    * the deterministic founding sample both paths share). */
  def probeAdc(s: SparkSession, root: String, queryVec: Array[Float],
      nprobe: Int = 2, k: Int = 10, rerankPool: Int = 30): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    val empty = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType))))
    readManifest(root) match {
      case None => empty
      case Some((gen, dataDirs)) =>
        val qnrm = math.sqrt(
          queryVec.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
        val cent = s.read.parquet(s"$root/stats-$gen")
          .select(col("cell"), col("pos"), (col("sm") / col("cnt")).as("m"))
          .groupBy(col("cell"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> cast(x.m as float))")
            .as("ce"))
        val probeCells = cent.withColumn("qe", typedLit(queryVec))
          .withColumn("pscore", expr(s"${dot("ce", "ce")} - 2 * ${dot("qe", "ce")}"))
          .orderBy(col("pscore").asc, col("cell").asc)
          .limit(nprobe)
          .select(col("cell")).collect().map(_.getLong(0))
        if (probeCells.isEmpty) empty
        else {
          val books = s.read.parquet(s"$root/codebooks")
          // query-side ADC table: M×K subspace distances, one tiny frame
          val dt = s.range(1).select(typedLit(queryVec).as("qe"))
            .select(explode(expr(pqSubs("qe"))).as("p"))
            .select(col("p.m").as("dm"), col("p.sv").as("qsv"))
            .join(broadcast(books), col("dm") === col("mm"))
            .select(col("dm"), col("code").as("dcode"),
              (col("cn") - lit(2.0) * expr(dot("qsv", "ce"))).as("dscore"))
          val codeDirs = dataDirsOf(dataDirs).map(_.replaceFirst("^data-", "codes-"))
          val shortlist = liveIn(s, root, codeDirs, tombDirsOf(dataDirs),
              Some(probeCells), Seq("codes"))
            .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
            .join(broadcast(dt), col("m") === col("dm") && col("code") === col("dcode"))
            .groupBy(col("vec_id"))
            .agg(sum(round(col("dscore"), 9).cast("decimal(28,9)")).as("adc"))
            .orderBy(col("adc").asc, col("vec_id").asc)
            .limit(rerankPool)
            .select(col("vec_id"))
          liveIn(s, root, dataDirsOf(dataDirs), tombDirsOf(dataDirs),
              Some(probeCells), Seq("label", "embedding", "nrm"))
            .join(broadcast(shortlist), "vec_id")
            .withColumn("qe", typedLit(queryVec))
            .select(col("vec_id"), col("label"), col("cell").cast("long").as("cell"),
              (expr(dot("embedding", "qe")) / (col("nrm") * lit(qnrm))).as("cos"))
            .orderBy(col("cos").desc, col("vec_id").asc)
            .limit(k)
            .select(col("vec_id"), col("label"), col("cell"),
              round(col("cos"), 6).as("cosine"))
        }
    }
  }

  /** Delete ids from the live index by appending a TOMBSTONE
    * generation — no published file is touched (the GDPR-delete shape
    * for an LSM store). Each id's tombstone lands in the id's CURRENT
    * cell so cell-pruned probes see it; ids not live in the index
    * (absent, or already deleted) produce no tombstone, making
    * deletes idempotent. The physical bytes of deleted vectors remain
    * until [[compact]] — which is the half of a real deletion
    * pipeline that rewrites files. Running stats intentionally keep
    * the deleted mass until compaction (same drift contract as
    * re-sent upserts). Returns per-cell accounting
    * `(cell, n_deleted)`. */
  def delete(ids: DataFrame, root: String): DataFrame = {
    val s = ids.sparkSession
    val (gen, lines) = readManifest(root).getOrElse(
      throw new IllegalStateException(s"no ANN index published at $root — build() first"))
    val newGen = gen + 1
    val del = ids.select(col("vec_id").cast("long").as("vec_id")).distinct()
    val tombs = liveIn(s, root, dataDirsOf(lines), tombDirsOf(lines),
        None, Seq("label"))
      .join(broadcast(del), "vec_id")
      .select(col("vec_id"), col("cell"))
      .withColumn("gen", lit(newGen))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (tombs.isEmpty) {
        // nothing live matched: a no-op delete publishes nothing (an
        // empty partitioned parquet dir would not even re-read)
        tombs.select(col("cell"), lit(0L).as("n_deleted")).limit(0)
      } else {
        // stats carry over unchanged (the documented drift): republish
        // the previous generation's stats under the new gen so probes
        // keep resolving stats-<gen>. Everything lands BEFORE the
        // manifest move — the manifest is the only publish point.
        s.read.parquet(s"$root/stats-$gen").write.mode("overwrite").parquet(s"$root/stats-$newGen")
        tombs.write.mode("overwrite").partitionBy("cell").parquet(s"$root/tombs-$newGen")
        writeManifest(root, newGen, lines :+ s"tombs-$newGen")
        tombs.groupBy(col("cell")).agg(count(lit(1)).as("n_deleted"))
          .orderBy(col("cell"))
      }
    } finally tombs.unpersist()
  }

  /** Fold every generation into ONE: resolve the live rows (latest
    * event wins, tombstones applied), rewrite them as the single new
    * data+codes generation, REBUILD the running stats from the
    * survivors (this is where re-sent-upsert and tombstone drift gets
    * purged — post-compact centroids equal a fresh rebuild of the
    * live corpus), and publish a manifest referencing only the new
    * generation. Old dirs become unreferenced (readers resolve
    * through the manifest); deleting their bytes is the caller's GC
    * decision since a concurrent reader may still hold the old
    * manifest. Returns per-cell `(cell, n_live, gens_folded)`. */
  def compact(s: SparkSession, root: String): DataFrame = {
    val (gen, lines) = readManifest(root).getOrElse(
      throw new IllegalStateException(s"no ANN index published at $root — build() first"))
    val newGen = gen + 1
    val dataDirs = dataDirsOf(lines)
    val tombDirs = tombDirsOf(lines)
    val codeDirs = dataDirs.map(_.replaceFirst("^data-", "codes-"))
    val live = liveIn(s, root, dataDirs, tombDirs, None,
        Seq("label", "embedding", "nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      live.withColumn("gen", lit(newGen))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$root/data-$newGen")
      // codes are per-vector constants (frozen codebooks): carry the
      // surviving rows, no re-encode
      liveIn(s, root, codeDirs, tombDirs, None, Seq("codes"))
        .withColumn("gen", lit(newGen))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$root/codes-$newGen")
      statsOf(live).write.mode("overwrite").parquet(s"$root/stats-$newGen")
      writeManifest(root, newGen, Seq(s"data-$newGen"))
      live.groupBy(col("cell")).agg(count(lit(1)).as("n_live"))
        .withColumn("gens_folded", lit(dataDirs.length.toLong + tombDirs.length))
        .orderBy(col("cell"))
    } finally live.unpersist()
  }
}
