package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableHash
import graft.operators.Dedup

/** The composite LLM-training-corpus cleaning pipeline — the M5 pieces
  * chained the way a production data pipeline chains them:
  *
  *   1. quality gate — drop documents failing ≥2 of the 4 heuristics
  *      (word count, stopword ratio, alpha ratio, mean word length);
  *   2. exact dedup — keep the lowest doc_id per content fingerprint;
  *   3. near-dup prune — MinHash+LSH candidate pairs (Dedup's shared
  *      generator) with estimated Jaccard ≥ 0.75 drop the later doc of
  *      each pair when both sides passed the gates;
  *   4. emit the surviving corpus with its token statistics.
  *
  * Shapes at 100 TB: stage 1 is narrow (scan-fused); stage 2 shuffles
  * 8-byte fingerprints; stage 3's pair space is bounded by LSH banding;
  * the final anti-join shuffles only (id, id) pairs. Nothing touches
  * full text after the first pass.
  */
object CleanCorpus {
  type Q = (SparkSession, String) => DataFrame

  private val EstJaccardDrop = 0.75
  private val MinQuality = 0.75

  def clean(s: SparkSession, dir: String): DataFrame =
    cleanWide(s, dir).select(col("doc_id"), col("lang"), col("n_chars"),
      col("n_words"), col("quality"))

  /** [[clean]] plus the columns its downstream composites used to
    * re-derive by RE-JOINING and RE-TOKENIZING `documents` (r14, guide
    * §1.2 — don't compute things twice): the exact-dedup fingerprint,
    * the token count (= n_words, the same tokenizer), and the
    * content-hash split band all ride the quality gate's ONE text
    * pass. Values are identical per row — same exprs over the same
    * text — so clean/shards/manifest outputs are unchanged; the text
    * column is scanned once here instead of 2-3 times per composite. */
  private def cleanWide(s: SparkSession, dir: String): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(s)

    // stage 1 — quality gate: the SHARED heuristic definition
    // (TextAnalysis.withQualityHeuristics), so t_quality_score and
    // this gate can never drift apart. `toks` is the same tokenizer as
    // Dedup.toksExpr (both the reference's normalize+split), so the
    // fingerprint's normalized form and the token count reuse it.
    val scored = graft.operators.TextAnalysis.withQualityHeuristics(Tables.documents(s, dir))
    val quality = scored.filter(col("quality") >= MinQuality)
      .withColumn("norm", concat_ws(" ", col("toks")))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("n_words").cast("long").as("n_words"), round(col("quality"), 2).as("quality"),
        expr(PortableHash.polyHashSql("norm")).as("fp"),
        col("n_words").cast("long").as("n_tokens"),
        pmod(call_function("graft_polyhash", col("text")), lit(100)).as("split_band"))

    // stage 2 — exact dedup among survivors (keep lowest doc_id per fp)
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val exact = quality
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("fp", "rn")

    // stage 3 — near-dup prune: drop the later doc of each candidate
    // pair when both sides survived stages 1-2
    val survivors = exact.select(col("doc_id"))
    val dropIds = Dedup.minhashCandidates(s, dir)
      .filter(col("est_jaccard") >= EstJaccardDrop)
      .join(survivors.withColumnRenamed("doc_id", "a_id"), "a_id")
      .join(survivors.withColumnRenamed("doc_id", "b_id"), "b_id")
      .select(col("b_id").as("doc_id")).distinct()
    exact.join(dropIds, Seq("doc_id"), "left_anti")
  }

  /** Shared CTE chain ending in `kept(doc_id, lang, n_chars, n_words,
    * quality)` — the oracle twin of [[clean]], reused verbatim by the
    * training-shards oracle so the two stay in lockstep. */
  private val cleanCteSql = {
    import graft.operators.TextAnalysis.{duckQualityCaseSql, duckQualityMetricsSub}
    s"""WITH ${Dedup.duckMinhashCandCte},
       |scored AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(n_words AS BIGINT) AS n_words,
       |    round($duckQualityCaseSql, 2) AS quality
       |  FROM ($duckQualityMetricsSub)),
       |quality AS (SELECT * FROM scored WHERE quality >= $MinQuality),
       |fp AS (SELECT doc_id,
       |         ${PortableHash.duckPolyHash(s"array_to_string(${Dedup.duckToks}, ' ')")} AS fp
       |       FROM documents),
       |exact AS (
       |  SELECT doc_id, lang, n_chars, n_words, quality
       |  FROM (SELECT q.*, fp.fp,
       |          row_number() OVER (PARTITION BY fp.fp ORDER BY q.doc_id) AS rn
       |        FROM quality q JOIN fp ON q.doc_id = fp.doc_id)
       |  WHERE rn = 1),
       |drops AS (
       |  SELECT DISTINCT mh.b_id AS doc_id
       |  FROM mh
       |  JOIN exact ea ON mh.a_id = ea.doc_id
       |  JOIN exact eb ON mh.b_id = eb.doc_id
       |  WHERE mh.est_jaccard >= $EstJaccardDrop),
       |kept AS (
       |  SELECT e.doc_id, e.lang, e.n_chars, e.n_words, e.quality
       |  FROM exact e
       |  WHERE NOT EXISTS (SELECT 1 FROM drops d WHERE d.doc_id = e.doc_id))""".stripMargin
  }

  private val cleanSql =
    s"""$cleanCteSql
       |SELECT doc_id, lang, n_chars, n_words, quality FROM kept""".stripMargin

  /** The capstone composite — the engine's end product as one query:
    * the cleaned corpus ([[clean]]: quality gate → exact dedup →
    * near-dup prune) is PII-redacted and packed into token-budget
    * training shards per language, via the SHARED packing helper
    * ([[graft.operators.TextAnalysis.withPackId]] — one packing rule,
    * no drift from t_pack_sequences) over the SURVIVORS. At 100 TB:
    * every stage before the final projection moves ids and counts; the
    * full text is touched exactly twice (once to score, once to redact
    * at emit). */
  def trainingShards(s: SparkSession, dir: String): DataFrame = {
    // n_tokens rides cleanWide's first pass; the docs join is for the
    // raw text the redaction needs (the one remaining text touch)
    val kept = cleanWide(s, dir).select(col("doc_id"), col("lang"), col("n_tokens"))
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    graft.operators.TextAnalysis.withPackId(kept.join(docs, "doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("pack_id"),
        graft.operators.TextAnalysis.redactPii(col("text")).as("redacted"))
  }

  private val trainingShardsSql =
    s"""$cleanCteSql,
       |shard AS (
       |  SELECT k.doc_id, k.lang, d.text,
       |         CAST(len(${Dedup.duckToks}) AS BIGINT) AS n_tokens
       |  FROM kept k JOIN documents d ON k.doc_id = d.doc_id)
       |SELECT doc_id, lang, n_tokens,
       |  ${graft.operators.TextAnalysis.duckPackIdExpr} AS pack_id,
       |  ${graft.operators.TextAnalysis.duckRedact("text")} AS redacted
       |FROM shard""".stripMargin

  /** The dataset-card composite — the release-manifest numbers a
    * corpus publisher ships: the cleaned corpus ([[clean]]) gets its
    * deterministic train/val/test assignment (the SHARED
    * [[graft.operators.Sampling.splitByHash]] — the same split a later
    * decontamination audit will recompute) and rolls up to per-(split,
    * language) document/token counts with each language's token share
    * of its split. Stats are split×lang-sized after one pass over the
    * kept docs' text; the share window runs on that tiny aggregate. */
  def releaseManifest(s: SparkSession, dir: String): DataFrame = {
    // split_band and n_tokens ride cleanWide's first pass — no
    // documents re-join at all (the old path re-joined text solely to
    // re-hash and re-tokenize it)
    val split = cleanWide(s, dir)
      .withColumn("split", graft.operators.Sampling.splitFromBand(col("split_band")))
    val stats = split.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val w = Window.partitionBy(col("split"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    stats.withColumn("split_tokens", sum(col("n_tokens")).over(w))
      .select(col("split"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("split_tokens"), 6).as("lang_share"))
  }

  private val releaseManifestSql =
    s"""$cleanCteSql,
       |assigned AS (
       |  SELECT k.lang,
       |    CASE WHEN band < ${graft.operators.Sampling.TrainBand} THEN 'train'
       |         WHEN band < ${graft.operators.Sampling.ValBand} THEN 'validation'
       |         ELSE 'test' END AS split,
       |    CAST(len(${Dedup.duckToks}) AS BIGINT) AS n_tokens
       |  FROM kept k JOIN (
       |    SELECT doc_id, text,
       |      ${PortableHash.duckPolyHash("text")} % 100 AS band
       |    FROM documents) d ON k.doc_id = d.doc_id),
       |stats AS (
       |  SELECT split, lang, count(*) AS n_docs,
       |         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |  FROM assigned GROUP BY split, lang)
       |SELECT split, lang, n_docs, n_tokens,
       |  round(n_tokens / CAST(sum(n_tokens) OVER (PARTITION BY split) AS DOUBLE), 6)
       |    AS lang_share
       |FROM stats""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_clean_corpus" -> ((s, d) => clean(s, d)),
    "pipeline_training_shards" -> ((s, d) => trainingShards(s, d)),
    "pipeline_release_manifest" -> ((s, d) => releaseManifest(s, d)))
  val oracles: Map[String, String] = Map(
    "pipeline_clean_corpus" -> cleanSql,
    "pipeline_training_shards" -> trainingShardsSql,
    "pipeline_release_manifest" -> releaseManifestSql)
}
