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

  /** The reference's 21-row keyword → practice classifier matrix
    * (hi-csa-db.Rmd:497-509) — public reference data, reproduced for
    * golden parity. Keywords are case-insensitive regexes matched
    * against tokens (substring semantics). */
  val referenceLexicon: Seq[(String, String)] = Seq(
    "Pollinators" -> "Support Pollinators",
    "Cover" -> "Conservation Cover",
    "Rotation" -> "Conservation Crop Rotation",
    "Crop" -> "Cover Crop",
    "Filter" -> "Filter Strips",
    "Mulching" -> "Mulching",
    "Nutrient" -> "Nutrient Management",
    "Digester" -> "Anaerobic Digester",
    "Critical" -> "Critical Area Planting",
    "Windbreak" -> "Windbreak and Shelterbelt Establishment and Renovation",
    "Silvopasture" -> "Silvopasture",
    "Buffer" -> "Riparian Forest Buffer",
    "Establishment" -> "Tree and Shrub Establishment",
    "Forest" -> "Forest Stand Improvement",
    "Pipeline" -> "Irrigation Pipeline",
    "Microirrigation" -> "Irrigation System, Microirrigation",
    "Sprinkler" -> "Sprinkler System",
    "Pumping" -> "Pumping Plant",
    "Lighting" -> "Energy Efficient Lighting System",
    "Wetland" -> "Wetland Restoration",
    "Irrigation" -> "Irrigation Water Management")

  /** The faithful element walk (W1 + X1, Rmd:174-270) over an ordered
    * DOM-element table `(doc_pos, tag ∈ h3|h4|p, text, links:
    * array<struct<text,href>>)`: fill-forward the active h3 AND h4 —
    * deliberately WITHOUT an h3-resets-h4 rule, because the reference's
    * loop never clears `current_h4` on a new h3 (Rmd:185-192); a
    * section with no h4 of its own inherits the previous section's
    * last h4 (the "Energy mis-matched info" bug the stop-gap repairs
    * fix, Rmd:572-580). Paragraphs before the first h3 are discarded
    * (`else if (!is.null(current_h3))`, Rmd:207), paragraphs without
    * links are dropped by the INNER link explode (Rmd:228-241), and a
    * multi-link paragraph emits one row per link in link order.
    *
    * Output doc_pos = element position × 1024 + link index: a total
    * document order for keep-first dedup (U4) and the positional
    * repair (W3). This is the single-document parity operator — the
    * generalized, per-document-partitioned form is
    * [[graft.operators.Scrape]].
    *
    * SCALE BOUNDARY — read before reusing this at volume: the window
    * below is deliberately GLOBAL (`Window.orderBy` without
    * partitionBy ⇒ one partition), because its input is ONE document's
    * elements (308 rows in the reference parity fixture) and parity
    * demands a single total order. Spark will print a "No Partition
    * Defined for Window" warning here — expected and benign at this
    * size. A corpus-scale caller must NOT feed many documents through
    * this operator; use the [[graft.operators.Scrape]] variants
    * (`w1_scrape_fill`, `x1_nested_links`), which run the same
    * fill-forward semantics under `Window.partitionBy(doc_id)` so each
    * document orders independently and the work distributes. */
  def scrapeElements(elements: DataFrame): DataFrame = {
    val w = Window.orderBy(col("doc_pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    elements
      .withColumn("h3", last(when(col("tag") === "h3", col("text")), ignoreNulls = true).over(w))
      .withColumn("h4", last(when(col("tag") === "h4", col("text")), ignoreNulls = true).over(w))
      .filter(col("tag") === "p" && col("h3").isNotNull)
      .select(col("h3"), col("h4"), col("text"), col("doc_pos"),
        posexplode(col("links")).as(Seq("lpos", "link")))
      .select(
        col("h3").as("Mitigation"), col("h4").as("Practice"),
        col("text").as("Description"), col("link.href").as("Resource"),
        (col("doc_pos") * 1024 + col("lpos")).as("doc_pos"))
  }

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
    * lexicon: Seq of (keyword regex, practice).
    *
    * The lookup join is NULL-SAFE on Practice (`<=>`): R's `match`
    * treats NA as equal to NA (Rmd:541-543), so a no-match policy row
    * (Practice = NA after the outer explode) picks up the Mitigation of
    * the practice table's NA row — in the golden output that is the
    * junk scraped heading, and it is exactly how the 18 null-Practice
    * Policy rows survive the final non-null-Mitigation filter. A plain
    * equi-join would leave their Mitigation null and silently drop
    * them. */
  def policyDb(policy: DataFrame, lexicon: Seq[(String, String)], pracMiti: DataFrame): DataFrame = {
    val lexArray = array(lexicon.map { case (k, p) =>
      struct(lit(k).as("k"), lit(p).as("p")) }: _*)
    val pm = pracMiti.select(col("Practice").as("__pm_practice"), col("Mitigation"))
    policy
      .withColumn("Description",
        rPaste(col("GuidingPolicy"), lit(": "), col("PolicyDescription"),
          lit(" See "), col("Verbiage"), lit(".")))
      .withColumn("Practice", explode_outer(detectCsa(col("CsaGoals"), lexArray)))
      .join(broadcast(pm), col("Practice") <=> col("__pm_practice"), "left")
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

  /** W3 positional repair (Rmd:575-580): the N rows matching
    * `targetMitigation` get Practice overwritten BY POSITION from
    * `replacements` (document order). */
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
        coalesce(col("replacement"), col("Practice")).as("Practice"),
        col("Description"), col("Resource"), col("doc_pos"))
  }

  /** Null-Practice repair (Rmd:582-583): rows whose Practice is null
    * get BOTH constants — Mitigation := naMitigation, Practice :=
    * naPractice. Both assignments key off the ORIGINAL null Practice
    * (the reference runs the Mitigation line first, which does not
    * change Practice). */
  def repairNaPractice(df: DataFrame, naMitigation: String, naPractice: String): DataFrame =
    df.select(
      when(col("Practice").isNull, lit(naMitigation)).otherwise(col("Mitigation")).as("Mitigation"),
      coalesce(col("Practice"), lit(naPractice)).as("Practice"),
      col("Description"), col("Resource"), col("doc_pos"))

  /** Targeted practice rewrite (Rmd:585): every row of `mitigation`
    * gets Practice := `practice`. (In the golden run the target
    * "Wetlands" matches no row — the repair is a faithful no-op.) */
  def repairPracticeWhere(df: DataFrame, mitigation: String, practice: String): DataFrame =
    df.withColumn("Practice",
      when(col("Mitigation") === mitigation, lit(practice)).otherwise(col("Practice")))

  /** The reference's stop-gap repair block (Rmd:572-585), composed in
    * notebook order: Energy positional fix → null-Practice constant
    * fills → Wetlands practice rewrite. */
  def stopGapRepairs(technical: DataFrame): DataFrame =
    repairPracticeWhere(
      repairNaPractice(
        repairTechnical(technical,
          "Energy, Combustion, and Electricity Efficiency",
          Seq("Irrigation Pipeline", "Irrigation System, Microirrigation",
            "Sprinkler System", "Pumping Plant", "Energy Efficient Lighting System")),
        "Conservation Efforts", "Support Pollinators"),
      "Wetlands", "Wetland Restoration")

  /** Final union + tag + null filter + canonical column order
    * (Rmd:587-593). Technical rows KEEP their scraped Resource
    * (hicsa.db carries all four nrcs.db columns into the rbind).
    * `dbMerge` (U1) reconciles any schema drift the same way the
    * reference does — union of columns, alphabetical order. */
  def finalDb(technical: DataFrame, policy: DataFrame, support: DataFrame): DataFrame = {
    val tech = technical
      .select(lit("Technical").as("Type"), col("Mitigation"), col("Practice"),
        col("Description"), col("Resource"))
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
