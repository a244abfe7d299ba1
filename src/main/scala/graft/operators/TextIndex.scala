package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableHash

/** Persisted BM25 inverted index — the serving twin of the in-query
  * [[TextAnalysis.bm25ScoredOf]], the same build-once/probe-many
  * discipline the ANN stack applies to embeddings
  * ([[Similarity.annIndex]] / [[Similarity.ivfIndex]]).
  *
  * The in-query form scans the corpus per query (fine for one batch
  * job; wrong for a retrieval service answering many queries). The
  * index trades one corpus scan at build time for probes whose cost is
  * proportional to the QUERY's postings, not the corpus:
  *
  *  - `postings/` — `(term, doc_id, tf, dl)` partitioned by
  *    `bucket = pmod(polyhash(term), 64)`. A probe computes its terms'
  *    buckets DRIVER-side (the portable hash has an exact JVM twin, so
  *    no job runs) and scans `bucket IN (…)` — PartitionFilters prune
  *    the read to ≤|terms| of 64 partitions regardless of corpus size.
  *    The per-doc length `dl` is DENORMALIZED onto every posting so
  *    scoring needs no join back to a lengths table: BM25's per-term
  *    score depends only on (tf, df, dl, N, S), all of which the probe
  *    has after this one pruned scan.
  *  - `df/` — `(term, df)`, bucket-partitioned the same way (vocab-
  *    sized; the probe reads only the query buckets and broadcasts).
  *  - `stats/` — one row `(n_docs, s_dl)`; broadcast into the scoring
  *    expression.
  *
  * Build/publish/rebuild semantics are [[Similarity.cachedIndex]]'s:
  * fingerprint memo over the source files + format version, built
  * under the JVM tmpdir, atomically published, stale builds swept. A
  * production deployment points the same layout at a durable root and
  * rebuilds on corpus change — or extends it with the
  * [[AnnIndex]]-style append generations; the probe path is identical
  * either way.
  */
object TextIndex {
  type Q = (SparkSession, String) => DataFrame

  /** 64 term buckets: enough that a probe's `IN` prunes hard, few
    * enough that tiny corpora don't scatter into empty files. At
    * 100 TB the knob scales with vocabulary, not corpus rows —
    * postings VOLUME per bucket is what grows, and parquet splits
    * handle that within a partition. */
  val Buckets = 64

  private val TextIndexVersion = 1

  /** Exact JVM twin of `graft_polyhash` ([[PortableHash.polyHash]]):
    * fold (acc·31 + codePOINT) mod P — code points, not UTF-16 units,
    * because the native expression iterates codePointAt (a
    * supplementary-plane character is ONE fold step there; folding its
    * surrogate pair as two would route the term to the wrong bucket
    * and silently drop its postings from every probe). Lets the probe
    * compute its terms' partitions without running a job. Equivalence
    * is spec-pinned including non-BMP input (PropertySpec). */
  def polyHashJvm(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % PortableHash.P
      i += Character.charCount(cp)
    }
    acc
  }

  private def bucketOf(term: String): Int = (polyHashJvm(term) % Buckets).toInt

  /** Build-or-reuse the index for `dir`'s documents table; returns the
    * live index root. */
  private[graft] def textIndex(s: SparkSession, dir: String): String =
    Similarity.cachedIndex(s, dir, "text", TextIndexVersion, "documents.parquet") { path =>
      writeGen(Tables.documents(s, dir), path)
      // one _SUCCESS at the top of the build dir — the cachedIndex
      // sweep's completion signal (Spark wrote one per sub-dir only)
      java.nio.file.Files.createFile(
        new java.io.File(path, "_SUCCESS").toPath)
      ()
    }

  /** Per-(doc, query-term) BM25 partials served FROM THE INDEX —
    * same values as [[TextAnalysis.bm25ScoredOf]] (single exact
    * integer-ratio division), different cost: the postings/df scans
    * prune to the query terms' buckets, the corpus is never touched. */
  private[graft] def bm25ScoredIndexed(s: SparkSession, dir: String,
      terms: Seq[String], exactInt: Boolean = false): DataFrame = {
    val root = textIndex(s, dir)
    val buckets = terms.map(bucketOf).distinct
    // pinned schemas: an index over an empty corpus has no part files
    // and inference would throw; and the literal bucket type matches
    // the partition column (INT by partition-value inference — the
    // skill-noted partitionBy gotcha) so PartitionFilters prune
    val post = s.read.schema(PostingsSchema).parquet(s"$root/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val dfT = s.read.schema(DfSchema).parquet(s"$root/df")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .select(col("term"), col("df"))
    val stats = s.read.schema(StatsSchema).parquet(s"$root/stats")
    val sc = if (exactInt) TextAnalysis.bm25Sc("tf", "df", "dl", "n_docs", "s_dl")
             else TextAnalysis.bm25ScDouble("tf", "df", "dl", "n_docs", "s_dl")
    post.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term").as("token"), expr(sc).as("sc"))
  }

  /** Façade form: arbitrary-term top-k from the persisted index. */
  def bm25TopkIndexed(s: SparkSession, dir: String, terms: Seq[String],
      k: Int): DataFrame =
    TextAnalysis.bm25TopkCut(bm25ScoredIndexed(s, dir, terms), k)

  // ----------------------------------------------------------------
  // Incrementally-maintained index at an explicit root (the AnnIndex
  // generation discipline applied to text)
  // ----------------------------------------------------------------

  private val ManifestName = "_GRAFT_TEXT_MANIFEST"

  // Explicit read schemas: an empty generation (e.g. an empty upsert
  // batch, or a bucket no query term hashes to) writes no part files,
  // and schema INFERENCE over a file-less dir throws — pinned schemas
  // make every generation readable regardless of its row count, and
  // skip the inference listing besides.
  private val PostingsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tf", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dl", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.IntegerType)))
  private val DfSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("df", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.IntegerType)))
  private val StatsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("s_dl", org.apache.spark.sql.types.LongType)))

  /** Write one generation dir (postings/df/stats for `docs` alone)
    * under `root/gen-<n>/`. Everything BM25 needs is integer-ADDITIVE
    * across generations — tf and dl are per-doc, df per-gen counts sum
    * to the corpus df, (n_docs, s_dl) sum — so a probe over merged
    * generations equals a full rebuild EXACTLY (spec-pinned; stronger
    * than the ANN side, whose running-stats centroids are exact only
    * under pure appends). Assumes append-only doc_ids: a re-sent
    * doc_id would double-count its postings — deletes/re-sends go
    * through a rebuild (or an AnnIndex-style tombstone extension).
    *
    * Writes are mode-overwrite: a crash between writing this dir and
    * the manifest move leaves an UNREFERENCED dir, and the replay
    * (streaming foreachBatch, or a retried build/upsert) must be able
    * to overwrite it deterministically rather than die on
    * path-already-exists — the [[AnnIndex]] generation discipline.
    * tf/dl persist across the three writes so the batch is tokenized
    * and aggregated once, not three times. */
  private def writeGen(docs: DataFrame, genDir: String): Unit = {
    val dl = docs.select(col("doc_id"),
      size(filter(TextAnalysis.tokens(col("text")), t => t =!= ""))
        .cast("long").as("dl"))
      .persist()
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    try {
      tf.join(dl, "doc_id")
        .withColumn("bucket", pmod(PortableHash.polyHash(col("term")), lit(Buckets.toLong)))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$genDir/postings")
      tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("bucket", pmod(PortableHash.polyHash(col("term")), lit(Buckets.toLong)))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$genDir/df")
      dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_dl"))
        .write.mode("overwrite").parquet(s"$genDir/stats")
    } finally {
      tf.unpersist(); dl.unpersist(); ()
    }
  }

  // Manifest lines by prefix: `gen-N` directories (ordered) and
  // `batch:<tag>` idempotence-ledger entries for streaming ingest.
  // Unknown prefixes are ignored — forward-extensible, like the
  // AnnIndex manifest.
  private def manifestLines(root: String): Seq[String] = {
    val p = java.nio.file.Paths.get(root, ManifestName)
    if (!java.nio.file.Files.isRegularFile(p)) Seq.empty
    else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  private def readManifest(root: String): Seq[String] =
    manifestLines(root).filter(_.startsWith("gen-"))

  /** Has a streaming batch with this tag already ridden a published
    * manifest? The ledger rides the SAME atomic move as the data, so
    * a replayed batch can never re-apply (its postings would count
    * twice). */
  private[graft] def batchApplied(root: String, tag: String): Boolean =
    manifestLines(root).contains(s"batch:$tag")

  /** Publish `gens` with an atomic temp-file move — readers resolve
    * through the manifest and never see a half-written generation
    * (the [[Similarity.cachedIndex]] marker discipline; on an object
    * store without atomic rename, front this with a publish lock). */
  private def publish(root: String, gens: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(root, s".manifest-${System.nanoTime()}")
    java.nio.file.Files.write(tmp, gens.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(root, ManifestName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Found a new index at `root` from `docs` (generation 0). */
  def build(docs: DataFrame, root: String): Unit = {
    new java.io.File(root).mkdirs()
    writeGen(docs, s"$root/gen-0")
    publish(root, Seq("gen-0"))
  }

  /** Append a batch of NEW documents as the next generation — work is
    * proportional to the batch, nothing existing is rewritten. `tag`
    * (streaming ingest) rides the same atomic manifest publish as the
    * generation, forming the replay-idempotence ledger.
    *
    * Concurrency: the manifest read-modify-write is last-publish-wins
    * — two CONCURRENT upserts would pick the same generation number
    * and the later publish would drop the earlier's manifest line.
    * Serialize upserts externally (one writer per root), exactly the
    * [[AnnIndex]] manifest contract; streaming ingest satisfies this
    * by construction (one foreachBatch at a time). */
  def upsert(batch: DataFrame, root: String, tag: Option[String] = None): Unit = {
    val lines = manifestLines(root)
    val gens = lines.filter(_.startsWith("gen-"))
    require(gens.nonEmpty, s"no text index at $root — build() first")
    val next = s"gen-${gens.map(_.stripPrefix("gen-").toLong).max + 1}"
    writeGen(batch, s"$root/$next")
    publish(root, lines ++ (next +: tag.map(t => s"batch:$t").toSeq))
  }

  /** BM25 partials over every published generation: postings union
    * bucket-pruned per gen, per-gen dfs SUMMED per term, stats summed
    * — all exact integer merges, so scores equal a from-scratch index
    * bit for bit. */
  private def scoredAtRoot(s: SparkSession, root: String,
      terms: Seq[String]): DataFrame = {
    val gens = readManifest(root)
    require(gens.nonEmpty, s"no text index at $root — build() first")
    val buckets = terms.map(bucketOf).distinct
    def pruned(sub: String, schema: org.apache.spark.sql.types.StructType) =
      gens.map(g =>
        s.read.schema(schema).parquet(s"$root/$g/$sub")
          .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*)))
      .reduce(_ unionByName _)
    val post = pruned("postings", PostingsSchema)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val dfT = pruned("df", DfSchema).groupBy(col("term")).agg(sum(col("df")).as("df"))
    val stats = gens.map(g => s.read.schema(StatsSchema).parquet(s"$root/$g/stats"))
      .reduce(_ unionByName _)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("s_dl")).as("s_dl"))
    post.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term").as("token"),
        expr(TextAnalysis.bm25ScDouble("tf", "df", "dl", "n_docs", "s_dl")).as("sc"))
  }

  /** Arbitrary-term top-k from an explicit-root incremental index. */
  def bm25TopkAtRoot(s: SparkSession, root: String, terms: Seq[String],
      k: Int): DataFrame =
    TextAnalysis.bm25TopkCut(scoredAtRoot(s, root, terms), k)

  /** The oracle query: identical output contract to `t_bm25` (same
    * fixed terms, same pivot, same rounding), served from the index —
    * so it shares `t_bm25`'s DuckDB oracle verbatim, which IS the
    * spec that index-serving loses nothing. */
  private def tBm25Indexed: Q = (s, dir) =>
    TextAnalysis.bm25FixedPivot(
      bm25ScoredIndexed(s, dir, TextAnalysis.Bm25Terms, exactInt = true))

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "t_bm25_indexed" -> tBm25Indexed)

  val oracles: Map[String, String] = Map(
    "t_bm25_indexed" -> TextAnalysis.oracles("t_bm25"))
}
