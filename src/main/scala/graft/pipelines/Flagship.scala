package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Lexicon

/** Flagship end-to-end pipeline — the reference's merge-policy flow
  * (hi-csa-db.Rmd:488-546, SURVEY §3.3/§7.2) re-targeted at the harness
  * `documents` table:
  *
  *   scan → F1 keyword classification (higher-order functions)
  *        → X2 explode_outer (NULL row when no practice matched)
  *        → J1 broadcast left join to the practice→mitigation dimension
  *        → F6 description synthesis with NA-coercion semantics
  *        → P6 constant Type tag
  *        → U2 union with a second tagged stream ("Support")
  *        → P2 null filter → W2 ordered limit.
  *
  * Every step is a narrow op or a broadcast join — the whole pipeline
  * is ONE Spark stage until the final TakeOrderedAndProject; at 100 TB
  * it scales linearly with input splits, no shuffle.
  */
object Flagship {

  /** practice → mitigation category dimension (broadcast side). */
  val mitigationDim: Seq[(String, String)] = Seq(
    "Engine" -> "Compute", "Aggregation" -> "Compute",
    "Hashing" -> "Compute", "Sorting" -> "Compute",
    "Relational Join" -> "Relational", "Filter" -> "Relational",
    "Scan" -> "Relational", "Merge" -> "Relational",
    "Streaming" -> "Realtime", "Windowing" -> "Realtime",
    "Batch Processing" -> "Realtime", "Vector Search" -> "Search")

  def policyDb(s: SparkSession, dir: String): DataFrame = {
    val dim = s.createDataFrame(mitigationDim).toDF("practice", "mitigation")
    val docs = Tables.documents(s, dir)

    val classified = docs
      .withColumn("tokens",
        split(regexp_replace(col("text"), "[\\p{Punct} ]+", " "), " "))
      .withColumn("practices", expr(
        s"""transform(
           |  filter(${Lexicon.sparkArrayLiteral},
           |         kv -> exists(tokens, t -> t rlike concat('(?i)', kv.k))),
           |  kv -> kv.p)""".stripMargin))
      .select(col("doc_id"), col("lang"), col("source"),
        substring(col("text"), 1, 30).as("snippet"),
        explode_outer(col("practices")).as("practice"))

    val policy = classified
      .join(broadcast(dim), Seq("practice"), "left")
      .select(
        lit("Policy").as("rec_type"),
        col("doc_id"), col("practice"), col("mitigation"),
        concat(
          coalesce(col("practice"), lit("NA")), lit(": "), col("snippet"),
          lit(" See "), col("source"), lit(".")).as("description"))

    val support = Tables.documents(s, dir)
      .filter(col("n_chars") >= 300)
      .select(
        lit("Support").as("rec_type"),
        col("doc_id"),
        lit(null).cast("string").as("practice"),
        lit("Support").as("mitigation"),
        substring(col("text"), 1, 40).as("description"))

    policy.unionByName(support)
      .filter(col("description").isNotNull)
      .orderBy(col("rec_type"), col("doc_id"), col("practice").asc_nulls_first)
      .limit(200)
  }

  val policyDbSql: String = {
    val dimValues = mitigationDim
      .map { case (p, m) => s"('$p', '$m')" }.mkString(", ")
    s"""WITH dim(practice, mitigation) AS (VALUES $dimValues),
       |cls AS (
       |  SELECT doc_id, lang, source, substr(text, 1, 30) AS snippet,
       |    unnest(CASE WHEN len(practices) = 0 THEN [NULL] ELSE practices END) AS practice
       |  FROM (
       |    SELECT doc_id, lang, source, text,
       |      list_transform(
       |        list_filter(${Lexicon.duckListLiteral},
       |          kv -> len(list_filter(
       |                  string_split(regexp_replace(text, '[[:punct:] ]+', ' ', 'g'), ' '),
       |                  t -> regexp_matches(t, '(?i)' || kv.k))) > 0),
       |        kv -> kv.p) AS practices
       |    FROM documents)),
       |policy AS (
       |  SELECT 'Policy' AS rec_type, doc_id, cls.practice, dim.mitigation,
       |    coalesce(cls.practice, 'NA') || ': ' || snippet || ' See ' || source || '.' AS description
       |  FROM cls LEFT JOIN dim ON cls.practice = dim.practice),
       |support AS (
       |  SELECT 'Support' AS rec_type, doc_id, CAST(NULL AS VARCHAR) AS practice,
       |    'Support' AS mitigation, substr(text, 1, 40) AS description
       |  FROM documents WHERE n_chars >= 300)
       |SELECT * FROM (SELECT * FROM policy UNION ALL SELECT * FROM support)
       |WHERE description IS NOT NULL
       |ORDER BY rec_type, doc_id, practice NULLS FIRST
       |LIMIT 200""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("flagship_policy_db" -> ((s, dir) => policyDb(s, dir)))

  val oracles: Map[String, String] =
    Map("flagship_policy_db" -> policyDbSql)
}
