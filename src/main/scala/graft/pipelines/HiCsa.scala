package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SchemaUnion

/** Full replication of the reference pipeline (hi-csa-db.Rmd §3.1
  * stages 3–8): scraped elements → technical DB; policy sheet →
  * classified rows; support sheet → tagged rows; repair → union →
  * final 5-column table (Type, Mitigation, Practice, Description,
  * Resource). Golden-parity behaviors (SURVEY §7.5) are deliberate:
  *
  *  - R's NA→"NA" string coercion in the synthesized Description
  *    (`coalesce(c, 'NA')`, producing the literal "NA: NA See NA." row
  *    the golden output contains — Rmd:518-521);
  *  - keep-FIRST dedup of the practice→mitigation lookup in document
  *    order (Rmd:511) via row_number, not dropDuplicates;
  *  - the positional 5-row repair (Rmd:575-580) as rank-join;
  *  - db_merge's alphabetical column order (Rmd:65,70);
  *  - unmatched policy practices keep a NULL mitigation after the
  *    lookup join (the golden output's junk-join artifact).
  *
  * Every step is a narrow op, a broadcast join, or a per-document
  * window; the only wide ops are the keep-first dedup window and the
  * final orderBy preview.
  */
object HiCsa {

  /** Scraped rows (W1+X1 output, canonically renamed — Rmd:283) →
    * technical DB with absolutized resource URLs (P7, Rmd:275-279). */
  def technicalDb(scraped: DataFrame, urlPrefix: String): DataFrame =
    scraped.select(
      col("Mitigation"), col("Practice"), col("Description"),
      when(!col("Resource").contains("http"), concat(lit(urlPrefix), col("Resource")))
        .otherwise(col("Resource")).as("Resource"),
      col("doc_pos"))

  /** Keep-first practice→mitigation lookup table (U4, Rmd:511):
    * first occurrence in document order wins. */
  def practiceLookup(technical: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("Practice")).orderBy(col("doc_pos"))
    technical
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("Practice"), col("Mitigation"))
  }

  /** R `paste0` semantics: NA string-coerces to "NA" (F6, Rmd:518-521). */
  private def rPaste(cols: Column*): Column =
    concat(cols.map(c => coalesce(c, lit("NA"))): _*)

  /** detect.csa (F1, Rmd:75-88): punctuation-normalized tokens matched
    * case-insensitively against each lexicon keyword REGEX; all matched
    * practices in lexicon order, else empty. Pure Column-API HOFs (no
    * SQL-string interpolation of the input column, so qualified or
    * aliased columns compose). */
  private def detectCsa(goals: Column, lexiconArray: Column): Column =
    transform(
      filter(lexiconArray, kv =>
        exists(split(regexp_replace(goals, "[\\p{Punct} ]+", " "), " "),
          t => regexp_like(t, concat(lit("(?i)"), kv.getField("k"))))),
      kv => kv.getField("p"))

  /** Policy sheet → classified, exploded, looked-up rows (Rmd:488-546).
    * lexicon: Seq of (keyword regex, practice). */
  def policyDb(policy: DataFrame, lexicon: Seq[(String, String)], pracMiti: DataFrame): DataFrame = {
    val lexArray = array(lexicon.map { case (k, p) =>
      struct(lit(k).as("k"), lit(p).as("p")) }: _*)
    policy
      .withColumn("Description",
        rPaste(col("GuidingPolicy"), lit(": "), col("PolicyDescription"),
          lit(" See "), col("Verbiage"), lit(".")))
      .withColumn("Practice", explode_outer(detectCsa(col("CsaGoals"), lexArray)))
      .join(broadcast(pracMiti), Seq("Practice"), "left")
      .select(lit("Policy").as("Type"), col("Mitigation"), col("Practice"),
        col("Description"), col("Resource"))
  }

  /** Support sheet → tagged rows (Rmd:552-564): null-description rows
    * dropped (P2), canonical rename, constant tag. */
  def supportDb(support: DataFrame): DataFrame =
    support
      .filter(col("Description").isNotNull)
      .select(lit("Support").as("Type"), col("Mitigation"), col("Practice"),
        col("Description"), col("Resource"))

  /** W3 positional repair (Rmd:575-585): the N rows matching
    * `targetMitigation` get Practice overwritten BY POSITION from
    * `replacements` (document order); then rows with a null Practice
    * get practice := description fills (Rmd:582-583). */
  def repairTechnical(technical: DataFrame, targetMitigation: String,
      replacements: Seq[String]): DataFrame = {
    val spark = technical.sparkSession
    import spark.implicits._
    val repair = replacements.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toDF("rpos", "replacement")
    val w = Window.partitionBy(col("Mitigation") === targetMitigation).orderBy(col("doc_pos"))
    technical
      .withColumn("mpos", row_number().over(w))
      .join(broadcast(repair),
        col("Mitigation") === targetMitigation && col("mpos") === col("rpos"), "left")
      .select(
        col("Mitigation"),
        coalesce(col("replacement"),
          coalesce(col("Practice"), col("Description"))).as("Practice"),
        col("Description"), col("Resource"), col("doc_pos"))
  }

  /** Final union + tag + null filter + canonical column order
    * (Rmd:587-593). `dbMerge` (U1) reconciles any schema drift the same
    * way the reference does — union of columns, alphabetical order. */
  def finalDb(technical: DataFrame, policy: DataFrame, support: DataFrame): DataFrame = {
    val tech = technical
      .select(lit("Technical").as("Type"), col("Mitigation"), col("Practice"),
        col("Description"), lit(null).cast("string").as("Resource"))
    val merged = SchemaUnion.dbMergeAll(Seq(tech, policy, support))
    merged
      .filter(col("Mitigation").isNotNull)
      .select(col("Type"), col("Mitigation"), col("Practice"),
        col("Description"), col("Resource"))
  }

  /** K2/W2 preview: top-n by Mitigation, ties stabilized (Rmd:601-605). */
  def preview(db: DataFrame, n: Int): DataFrame =
    db.orderBy(col("Mitigation"), col("Type"), col("Practice").asc_nulls_first,
      col("Description")).limit(n)
}
