package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.HiCsa

/** THE golden end-to-end parity test (SURVEY §5.2, FIXTURES.md §B): the
  * reference's only correctness artifact is its shipped output
  * `data/hi-csa-db.rds` (a 308×5 table, hi-csa-db.Rmd:593). The
  * fixtures under src/test/resources/hicsa/ were reconstructed from
  * that artifact (tools/make_golden_fixtures.py — elements table,
  * policy/support sheet snapshots), and this spec runs the COMPOSED
  * pipeline over them:
  *
  *   elements → faithful walk (W1+X1, stale-h4 carry) → technicalDb
  *   (P7 absolutize) → practiceLookup (U4 keep-first, PRE-repair) →
  *   policyDb (F1/F6/X2/J1, NULL-SAFE lookup) ∥ supportDb (P2) →
  *   stop-gap repairs (W3) → finalDb (U2/P2) == golden, row for row.
  *
  * The replicated reference quirks this pins (SURVEY §7.5):
  *  - R `match` NA-matches-NA: 18 no-match Policy rows inherit the
  *    junk scraped heading as Mitigation and survive the final filter;
  *  - R paste0 NA→"NA" coercion: the literal "NA: NA See NA." row;
  *  - the walk never resets current_h4 on a new h3, so the Energy and
  *    Additional-Resources sections carry a stale h4 (then repaired
  *    positionally / left as scraped);
  *  - link-less paragraphs dropped by the inner explode;
  *  - keep-first practice→mitigation dedup BEFORE the repairs run.
  */
class GoldenParitySpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/hicsa/$name.parquet").getPath

  private lazy val db: DataFrame = {
    val elements = spark.read.parquet(res("elements"))
    val policy = spark.read.parquet(res("policy"))
    val support = spark.read.parquet(res("support"))
    val tech = HiCsa.technicalDb(
      HiCsa.scrapeElements(elements), "https://www.nrcs.usda.gov")
    // keep-first lookup is built BEFORE the stop-gap repairs (the
    // merge-policy chunk precedes nrcs-save in the notebook) — this is
    // what routes the junk heading into the Policy rows
    val pracMiti = HiCsa.practiceLookup(tech)
    val polDb = HiCsa.policyDb(policy, HiCsa.referenceLexicon, pracMiti)
    val suppDb = HiCsa.supportDb(support)
    HiCsa.finalDb(HiCsa.stopGapRepairs(tech), polDb, suppDb).cache()
  }

  private lazy val golden: DataFrame = spark.read.parquet(res("golden"))

  test("composed pipeline reproduces the golden 308x5 table exactly") {
    assert(db.columns.toSeq ==
      Seq("Type", "Mitigation", "Practice", "Description", "Resource"))
    assert(db.count() == 308)
    // full multiset equality, nulls included
    assert(db.exceptAll(golden).isEmpty, "rows produced but not golden")
    assert(golden.exceptAll(db).isEmpty, "golden rows not produced")
  }

  test("golden shape invariants: Type counts, null counts, artifacts") {
    val byType = db.groupBy("Type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("Technical" -> 44L, "Policy" -> 40L, "Support" -> 224L))
    assert(db.filter(col("Practice").isNull).count() == 18)
    assert(db.filter(col("Resource").isNull).count() == 2)
    assert(db.filter(col("Mitigation").isNull).count() == 0)
    // R paste0 NA-coercion artifact (Rmd:518-521)
    assert(db.filter(col("Description") === "NA: NA See NA.").count() == 1)
    // the junk scraped heading: carried into ALL null-Practice rows by
    // the NA-matching lookup, and scrubbed from no Technical row
    val junk = "2025 NCSS National Conference"
    val nullPractice = db.filter(col("Practice").isNull)
    assert(nullPractice.filter(col("Mitigation").startsWith(junk)).count() == 18)
    assert(db.filter(col("Type") === "Technical")
      .filter(col("Mitigation").startsWith(junk)).count() == 0)
  }

  test("Graft.hicsa.buildDatabase (the one-call facade) equals the staged composition") {
    val api = Graft.hicsa.buildDatabase(
      spark.read.parquet(res("elements")),
      spark.read.parquet(res("policy")),
      spark.read.parquet(res("support")),
      "https://www.nrcs.usda.gov")
    assert(api.exceptAll(db).isEmpty && db.exceptAll(api).isEmpty)
  }

  test("referenceLexicon matches the generated B8 fixture (no Scala/Python drift)") {
    // the fixture generator re-synthesizes CSA Goals from ITS lexicon
    // copy; this pins the library's copy to the same 21 rows in order
    val fixture = spark.read.parquet(res("lexicon"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(HiCsa.referenceLexicon.size == 21)
    assert(fixture.sorted == HiCsa.referenceLexicon.sorted)
  }

  test("preview (K2/W2) heads the Mitigation sort with the junk heading rows") {
    val head = HiCsa.preview(db, 6).select("Mitigation").collect().map(_.getString(0))
    assert(head.length == 6 && head.forall(_.startsWith("2025 NCSS")))
  }
}
