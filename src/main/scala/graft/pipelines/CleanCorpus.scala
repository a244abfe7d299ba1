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

  def clean(s: SparkSession, dir: String): DataFrame = {
    org.apache.spark.sql.graft.GraftFunctions.register(s)

    // stage 1 — quality gate (same heuristics as t_quality_score)
    val stopwordArray = Seq("the", "a", "of", "is", "and", "to", "in")
      .map(w => s"'$w'").mkString("array(", ", ", ")")
    val scored = Tables.documents(s, dir)
      .withColumn("toks", expr(Dedup.toksExpr))
      .withColumn("n_words", size(col("toks")).cast("double"))
      .withColumn("stop_ratio",
        size(filter(col("toks"), t => array_contains(expr(stopwordArray), t))) / col("n_words"))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") / col("n_chars"))
      .withColumn("mean_word_len",
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).cast("double") / col("n_words"))
      .withColumn("quality",
        when(col("n_words") >= 20, lit(0.25)).otherwise(lit(0.0))
          + when(col("stop_ratio").between(0.01, 0.6), lit(0.25)).otherwise(lit(0.0))
          + when(col("alpha_ratio") >= 0.7, lit(0.25)).otherwise(lit(0.0))
          + when(col("mean_word_len").between(3.0, 10.0), lit(0.25)).otherwise(lit(0.0)))
    val quality = scored.filter(col("quality") >= MinQuality)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("n_words").cast("long").as("n_words"), round(col("quality"), 2).as("quality"))

    // stage 2 — exact dedup among survivors (keep lowest doc_id per fp)
    val fp = Tables.documents(s, dir)
      .withColumn("norm", concat_ws(" ", expr(Dedup.toksExpr)))
      .select(col("doc_id"), expr(PortableHash.polyHashSql("norm")).as("fp"))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val exact = quality.join(fp, "doc_id")
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
    val stopList = Seq("the", "a", "of", "is", "and", "to", "in")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH ${Dedup.duckMinhashCandCte},
       |scored AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(n_words AS BIGINT) AS n_words,
       |    round((CASE WHEN n_words >= 20 THEN 0.25 ELSE 0.0 END)
       |      + (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END)
       |      + (CASE WHEN alpha_ratio >= 0.7 THEN 0.25 ELSE 0.0 END)
       |      + (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 0.25 ELSE 0.0 END), 2) AS quality
       |  FROM (
       |    SELECT doc_id, lang, n_chars,
       |      len(toks)::DOUBLE AS n_words,
       |      len(list_filter(toks, tk -> list_contains($stopList, tk))) / len(toks)::DOUBLE AS stop_ratio,
       |      length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / n_chars AS alpha_ratio,
       |      list_reduce(list_prepend(0::BIGINT, list_transform(toks, tk -> length(tk)::BIGINT)),
       |                  (acc, x) -> acc + x)::DOUBLE / len(toks) AS mean_word_len
       |    FROM (SELECT doc_id, lang, text, n_chars, ${Dedup.duckToks} AS toks FROM documents))),
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
    val kept = clean(s, dir).select(col("doc_id"), col("lang"))
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    graft.operators.TextAnalysis.withPackId(
        kept.join(docs, "doc_id")
          .withColumn("n_tokens", size(expr(Dedup.toksExpr)).cast("long")))
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

  val queries: Map[String, Q] = Map(
    "pipeline_clean_corpus" -> ((s, d) => clean(s, d)),
    "pipeline_training_shards" -> ((s, d) => trainingShards(s, d)))
  val oracles: Map[String, String] = Map(
    "pipeline_clean_corpus" -> cleanSql,
    "pipeline_training_shards" -> trainingShardsSql)
}
