package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {

  test("d_exact: every doc keeps a canonical id <= its own id") {
    val df = Dedup.queries("d_exact")(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
  }

  test("exact substring spans: planted passage found at exact boundaries; sub-W repeats stay silent; every exact span is shingle-covered (law vs the hashed twin)") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens = ExactW
    val docs = Seq(
      (1L, s"unique one two three $passage tail1 only here"),
      (2L, s"different prefix words $passage closing words vary"),
      // a 7-token shared run sits BELOW the threshold — no span
      (3L, "start p q r s t u v endone"),
      (4L, "finish p q r s t u v endtwo")).toDF("doc_id", "text")
    val spans = operators.Dedup.exactSubstringSpansOf(docs, w = 8).collect()
    val byDoc = spans.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(spans.length == 2, spans.mkString(","))
    // exact token boundaries: doc1 has 4 tokens before the passage,
    // doc2 has 3 — match extension stops exactly where sharing stops
    assert(byDoc(1L)._1 == 4L && byDoc(1L)._2 == 12L && byDoc(1L)._3 == 8L)
    assert(byDoc(2L)._1 == 3L && byDoc(2L)._2 == 11L && byDoc(2L)._3 == 8L)
    // the digests witness the SAME content on both sides
    assert(byDoc(1L)._4 == byDoc(2L)._4)

    // chaining: lengthen the shared run to 10 tokens → ONE maximal
    // span of 10, not two overlapping 8s
    val longer = Seq(
      (1L, s"unique one two three $passage iota kappa tail"),
      (2L, s"x $passage iota kappa y")).toDF("doc_id", "text")
    val sp2 = operators.Dedup.exactSubstringSpansOf(longer, w = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(sp2(1L) == ((4L, 10L)) && sp2(2L) == ((1L, 10L)), sp2.toString)

    // LAW vs the hashed-shingle twin on the harness corpus: exact
    // spans are a SUBSET of the W=5 shingle coverage (an 8-window
    // repeat makes every inner 5-window repeat at the same partner),
    // so per doc the exact covered mass never exceeds the twin's
    val exact = Dedup.queries("d_exact_substring")(spark, sf)
      .groupBy("doc_id").agg(sum("n_tokens").as("exact_tokens"))
    val twin = Dedup.queries("d_passage_coverage")(spark, sf)
      .select(col("doc_id"), col("n_covered"))
    assert(exact.join(twin, Seq("doc_id"), "left_anti").count() == 0)
    assert(exact.join(twin, "doc_id")
      .filter(col("exact_tokens") > col("n_covered")).count() == 0)
    assert(exact.count() > 0) // the fixture actually exercises it
  }

  test("d_ngram_jaccard: pairs are ordered, jaccard in (0,1]") {
    val df = Dedup.queries("d_ngram_jaccard")(spark, sf)
    assert(df.filter(col("a_id") >= col("b_id")).count() == 0)
    assert(df.filter(col("jaccard") > 1.0 || col("jaccard") <= 0.0).count() == 0)
  }

  test("row-level signature expression equals the aggregated batch signatures") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val rowSigs = docs.select(col("doc_id"), expr(Dedup.rowSigExpr).as("sig"))
    val aggSigs = Dedup.signaturesOf(docs,
      org.apache.spark.storage.StorageLevel.NONE)
    assert(rowSigs.orderBy("doc_id").collect().toSeq ==
      aggSigs.orderBy("doc_id").collect().toSeq)
    // and the streaming banded prefix matches batch banding end-to-end
    val streamBanded = streaming.StreamingDedup.banded(docs)
      .select("doc_id", "band", "bucket")
    val batchBanded = Dedup.bandedOf(aggSigs)
    assert(streamBanded.orderBy("doc_id", "band").collect().toSeq ==
      batchBanded.orderBy("doc_id", "band").collect().toSeq)
  }

  test("minhash LSH candidates recover the high-jaccard pairs") {
    val exact = Dedup.queries("d_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.queries("d_minhash_lsh")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH with r=4 bands recalls ~all J>=0.9 pairs on this data
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert((exact -- lsh).isEmpty, s"LSH missed pairs: ${exact -- lsh}")
  }

  test("d_simhash emits one 48-bit fingerprint per doc") {
    val df = Dedup.queries("d_simhash")(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("simhash") < 0 || col("simhash") >= (1L << Dedup.SimBits)).count() == 0)
  }

  test("simhash pairs all satisfy the hamming bound") {
    val df = Dedup.queries("d_simhash_pairs")(spark, sf)
    assert(df.filter(col("hamming") > 3).count() == 0)
  }

  test("d_incremental: one verdict per batch doc; exact verdicts recompute; keeps have no corpus twin") {
    val out = Dedup.queries("d_incremental")(spark, sf)
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    assert(out.count() == batch.count())
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // recompute exact membership independently via the normalized text
    val norm = docs.select(col("doc_id"),
      concat_ws(" ", split(regexp_replace(lower(col("text")), "[\\p{Punct} ]+", " "), " ")).as("norm"))
    val exactRecomputed = norm.filter(col("doc_id") % 5 === 0).as("b")
      .join(norm.filter(col("doc_id") % 5 =!= 0).as("c"), col("b.norm") === col("c.norm"), "left_semi")
      .select(col("doc_id"))
    val claimed = out.filter(col("verdict") === "exact_dup").select("doc_id")
    assert(claimed.exceptAll(exactRecomputed).count() == 0)
    assert(exactRecomputed.exceptAll(claimed).count() == 0)
  }

  test("d_embedding_near_dup: one nearest neighbour per bucketed vector, cosine in [-1,1]") {
    val df = Dedup.queries("d_embedding_near_dup")(spark, sf)
    assert(df.groupBy("a_id").count().filter(col("count") > 1).count() == 0)
    assert(df.filter(abs(col("cosine")) > 1.000001).count() == 0)
  }

  test("t_token_count: bpe tokens >= ws tokens") {
    val df = TextAnalysis.queries("t_token_count")(spark, sf)
    assert(df.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0)
  }

  test("t_quality_score: quality bounded in [0,1], ratios in [0,1]") {
    val df = TextAnalysis.queries("t_quality_score")(spark, sf)
    assert(df.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    assert(df.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
  }

  test("t_lang_id: predicted lang is the argmax score") {
    val df = TextAnalysis.queries("t_lang_id")(spark, sf)
    val bad = df.filter(
      (col("pred_lang") === "english" && (col("score_english") < col("score_dbish") || col("score_english") < col("score_computish")))
        || (col("pred_lang") === "dbish" && col("score_dbish") < col("score_computish")))
    assert(bad.count() == 0)
  }

  test("t_fingerprint is deterministic across runs") {
    val a = TextAnalysis.queries("t_fingerprint")(spark, sf).orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.queries("t_fingerprint")(spark, sf).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("d_contamination is sound and complete against the raw shingle index") {
    val flagged = Dedup.queries("d_contamination")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute ground truth from the shared shingle primitive
    val sh = Dedup.shingleHashes(spark, sf)
    val holdout = sh.filter(col("doc_id") % 7 === 0).select("h").distinct()
    val truth = sh.filter(col("doc_id") % 7 =!= 0)
      .join(holdout, "h")
      .groupBy("doc_id").agg(countDistinct(col("h")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged == truth)
    // no holdout doc is ever flagged
    assert(flagged.keys.forall(_ % 7 != 0))
  }

  test("t_chunk_overlap: chunks tile each doc with the declared overlap") {
    val chunks = TextAnalysis.queries("t_chunk_overlap")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val j = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_start").as("last_start"),
        min("chunk_start").as("first_start"))
      .join(docs, "doc_id")
    // chunk count is the arithmetic formula; first chunk starts at 1;
    // the last chunk's window still reaches into the text
    assert(j.filter(col("n_chunks") =!= floor((col("len") - 1) / 150) + 1).count() == 0)
    assert(j.filter(col("first_start") =!= 1).count() == 0)
    assert(j.filter(col("last_start") > col("len")).count() == 0)
    // every inner chunk is full-width; only the final one may be short
    val short = chunks.join(docs, "doc_id")
      .filter(col("chunk_len") < 200)
      .filter(col("chunk_start") + 200 - 1 <= col("len"))
    assert(short.count() == 0)
    chunks.unpersist()
  }

  test("graft_shingle_hashes_pos: positional index agrees with the distinct form") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val d = Tables.documents(spark, sf)
      .withColumn("nt", size(split(regexp_replace(lower(col("text")), "[\\p{Punct} ]+", " "), " ")).cast("long"))
      .withColumn("pos_h", expr("graft_shingle_hashes_pos(text)"))
      .withColumn("dist_h", expr("graft_shingle_hashes(text)"))
    // one entry per window, document order
    assert(d.filter(size(col("pos_h")) =!= greatest(col("nt") - 4, lit(1L)).cast("int")).count() == 0)
    // same distinct hash SET as the dedup'd form
    assert(d.filter(array_sort(array_distinct(col("pos_h"))) =!=
      array_sort(array_distinct(col("dist_h")))).count() == 0)
  }

  test("d_passage_coverage: planted cross-doc passage covers exactly its tokens") {
    import spark.implicits._
    // docs 1 and 2 share one 5-token passage (tokens 0..4), then diverge;
    // doc 3 is entirely unique
    val docs = Seq(
      (1L, "c1 c2 c3 c4 c5 u1 u2 u3 u4 u5"),
      (2L, "c1 c2 c3 c4 c5 v1 v2 v3 v4 v5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    val cov = Dedup.passageCoverageOf(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_covered"), r.getAs[Double]("coverage")))).toMap
    assert(cov.keySet == Set(1L, 2L), s"flagged: ${cov.keySet}")
    assert(cov(1L) == ((10L, 5L, 0.5)), s"doc 1: ${cov(1L)}")
    assert(cov(2L) == ((10L, 5L, 0.5)), s"doc 2: ${cov(2L)}")
  }

  test("stripRepeatedSpansOf removes exactly the cross-doc-repeated spans") {
    import spark.implicits._
    val docs = Seq(
      (1L, "c1 c2 c3 c4 c5 u1 u2 u3 u4 u5"),
      (2L, "c1 c2 c3 c4 c5 v1 v2 v3 v4 v5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = Dedup.stripRepeatedSpansOf(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_digest")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "one row per doc, including clean docs")
    assert(out(1L) == ((10L, 5L, md5hex("u1 u2 u3 u4 u5"))), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((10L, 5L, md5hex("v1 v2 v3 v4 v5"))), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((10L, 0L, md5hex("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))))
  }

  test("d_strip_spans invariants on the fixture: one row per doc, removal bounded") {
    val df = Dedup.queries("d_strip_spans")(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("n_removed") < 0 || col("n_removed") > col("n_tokens")).count() == 0)
    df.unpersist()
  }

  test("confirm-stage bounded levenshtein reports -1 above the cap") {
    import spark.implicits._
    // same lowercase tokens => identical signatures => guaranteed LSH
    // candidate at est_jaccard 1.0; case-sensitive levenshtein still
    // sees 10 UPPER<->lower char edits, above a cap of 4.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, s"ALPHABETIC $base"), (2L, s"alphabetic $base"))
      .toDF("doc_id", "text")
    val sig = Dedup.signaturesOf(docs, org.apache.spark.storage.StorageLevel.NONE)
    val capped = Dedup.editdistVerifyFromSig(sig, docs, 0.9, maxEditDistance = 4)
      .collect()
    assert(capped.nonEmpty, "identical-signature pair must be a candidate")
    assert(capped.forall(_.getAs[Long]("edit_distance") == -1L))
    val uncapped = Dedup.editdistVerifyFromSig(sig, docs, 0.9, maxEditDistance = 128)
      .collect()
    assert(uncapped.forall(_.getAs[Long]("edit_distance") == 10L))
  }

  test("d_passage_coverage invariants on the fixture: bounds and flagged-only rows") {
    val df = Dedup.queries("d_passage_coverage")(spark, sf).cache()
    assert(df.count() > 0, "fixture's planted dups should share passages")
    assert(df.filter(col("n_covered") < 1 || col("n_covered") > col("n_tokens")).count() == 0)
    assert(df.filter(col("coverage") <= 0.0 || col("coverage") > 1.0).count() == 0)
    df.unpersist()
  }

  test("t_repetition: planted repeated text scores high, unique text scores 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(20)("alpha beta gamma delta eps").mkString(" ")), // one 5-shingle repeated
      (2L, (1 to 100).map(i => s"tok$i").mkString(" ")))              // all shingles unique
      .toDF("doc_id", "text")
    // bind the harness op shape onto the tiny frame via the same expressions
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val rep = docs
      .withColumn("n_toks", size(split(regexp_replace(lower(col("text")), "[\\p{Punct} ]+", " "), " ")).cast("long"))
      .withColumn("total", greatest(col("n_toks") - 4, lit(1L)))
      .withColumn("distinct_sh", size(expr("graft_shingle_hashes(text)")).cast("long"))
      .withColumn("rep_ratio", lit(1.0) - col("distinct_sh") / col("total").cast("double"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rep_ratio")).toMap
    assert(rep(1L) > 0.9, s"repeated doc scored ${rep(1L)}")
    assert(rep(2L) == 0.0, s"unique doc scored ${rep(2L)}")
  }

  test("d_containment: directions bounded by 1, and every Jaccard-qualified pair qualifies on containment") {
    val cont = Dedup.queries("d_containment")(spark, sf)
    assert(cont.count() > 0)
    assert(cont.filter(col("c_ab") > 1.0 || col("c_ba") > 1.0
      || col("c_ab") <= 0 || col("c_ba") <= 0).count() == 0)
    // containment >= jaccard pointwise, so the J >= 0.5 pair set is a
    // subset of the max-containment >= 0.5 pair set
    val jac = Dedup.queries("d_ngram_jaccard")(spark, sf)
    assert(jac.join(cont, Seq("a_id", "b_id"), "left_anti").count() == 0)
    val joined = jac.join(cont, Seq("a_id", "b_id"))
    assert(joined.filter(greatest(col("c_ab"), col("c_ba")) < col("jaccard")).count() == 0)
  }

  test("t_line_dedup: one row per doc, removal counts bounded, segment count arithmetic") {
    val out = TextAnalysis.queries("t_line_dedup")(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(out.count() == docs.count())
    assert(out.filter(col("n_removed") < 0 || col("n_removed") > col("n_segments")).count() == 0)
    // n_segments = ceil(tokens / 10) with the reference tokenizer
    val expect = docs.select(col("doc_id"),
      expr("CAST((size(split(regexp_replace(lower(text), '[\\\\p{Punct} ]+', ' '), ' ')) + 9) DIV 10 AS LONG)")
        .as("expect_segs"))
    assert(out.join(expect, "doc_id")
      .filter(col("n_segments") =!= col("expect_segs")).count() == 0)
    // boilerplate is struck from EVERY doc, so identical docs clean identically:
    // group by full-text hash and check digest agreement
    val byText = docs.select(col("doc_id"), md5(col("text")).as("th"))
      .join(out, "doc_id")
      .groupBy("th").agg(countDistinct("clean_digest").as("k"))
    assert(byText.filter(col("k") =!= 1).count() == 0)
  }


  test("d_dataset_diff: class counts match the deterministic v2 derivation") {
    val out = Dedup.queries("d_dataset_diff")(spark, sf)
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val removed = ids.count(_ % 17 == 0)
    val added = ids.count(_ % 19 == 0)
    val changed = ids.count(i => i % 13 == 0 && i % 17 != 0)
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("removed", 0L) == removed)
    assert(byStatus.getOrElse("added", 0L) == added)
    assert(byStatus.getOrElse("changed", 0L) == changed)
    assert(byStatus.values.sum == ids.length + added)
  }


  test("bpeMerges: greedy merges on a pinned vocabulary, lexicographic tie-break") {
    import spark.implicits._
    // "aaab" x3: round 0 merges (a,a) [count 6]; round 1 ties (a,b) vs
    // (aa,a) at 3 and lexicographic order picks (a,b); round 2 merges
    // the two survivors (aa, ab)
    val docs = Seq("aaab aaab", "aaab").toDF("text")
    val out = graft.Graft.text.bpeMerges(docs, "text").orderBy("merge_round")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, "a", "a", 6L), (1L, "a", "b", 3L), (2L, "aa", "ab", 3L)))
    // empty corpus: no merges, no throw
    assert(graft.Graft.text.bpeMerges(Seq.empty[String].toDF("text"), "text").count() == 0)
  }

  test("bpeMerges holds its vocab-sized per-round cost at 50 rounds") {
    // rounds=3 in the harness is a toy depth; production BPE runs
    // hundreds of rounds. The scale claim is that each round's cost is
    // VOCAB-sized (pair-count over the word table + one merge fold),
    // independent of the round index — so 5x the rounds should cost
    // ~5x, not blow up. Measured (and recorded in SURVEY §6): the
    // per-round cost curve is flat.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    def timed(rounds: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.Graft.text.bpeMerges(docs, "text", rounds).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    timed(3) // warmup: JIT + codegen caches
    val (n10, t10) = timed(10)
    val (n50, t50) = timed(50)
    assert(n10 == 10 && n50 == 50, "fixture vocab must support 50 merge rounds")
    val merges = graft.Graft.text.bpeMerges(docs, "text", 50).collect()
    assert(merges.map(_.getLong(0)).toSeq == (0L until 50L))
    assert(merges.forall(_.getLong(3) >= 1L))
    // flat per-round cost: 5x rounds should stay within ~3x of linear
    // (generous for CI noise; a per-round cost GROWING with depth
    // would put this far above 15x)
    info(f"bpe rounds=10: $t10%.2fs (${t10 / 10}%.3fs/round); rounds=50: $t50%.2fs (${t50 / 50}%.3fs/round)")
    assert(t50 <= t10 * 15.0,
      f"per-round cost grew with depth: 10 rounds $t10%.2fs vs 50 rounds $t50%.2fs")
  }

  test("widened minhash geometry: 24 perms / 6 bands recalls the default's pairs") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val none = org.apache.spark.storage.StorageLevel.NONE
    val sig24 = Graft.dedup.signatures(docs, "doc_id", "text", none, numPerms = 24)
    assert(sig24.select(size(col("sig"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(24))
    val wide = Graft.dedup.minhashCandidatesFor(sig24, bands = 6, rowsPerBand = 4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dflt = Dedup.minhashCandidatesFromSig(
        Dedup.signaturesOf(docs, none))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bands 1-3 of the wide geometry ARE the default geometry (same
    // perm family, same band hash), so every default candidate pair
    // must re-collide under the wider net — candidate RECALL can only
    // grow with extra bands
    assert(dflt.nonEmpty)
    assert((dflt -- wide).isEmpty, s"wide geometry lost pairs: ${dflt -- wide}")
  }

  test("bucket cap bounds the band-join pair space on an all-identical corpus") {
    import spark.implicits._
    // the 100 TB failure mode in miniature: every doc identical, so all
    // n land in ONE band bucket — uncapped pairs would be C(n,2)
    val n = 200; val cap = 8
    val docs = (0L until n).map(i =>
        (i, "the same boilerplate text repeated verbatim on every single page of the site"))
      .toDF("doc_id", "text")
    val sig = Dedup.signaturesOf(docs, org.apache.spark.storage.StorageLevel.NONE)
    val pairs = Dedup.minhashCandidatesFromSig(sig, cap)
    // pairs = C(cap,2) among the kept representatives + (n-cap)·cap
    // probe-vs-representative — O(n·cap), never O(n²)
    assert(pairs.count() == cap * (cap - 1) / 2 + (n - cap) * cap)
    assert(pairs.count() < n.toLong * (n - 1) / 2)
    // connectivity survives truncation: every doc but the cluster head
    // still appears as b_id, so CC closure reaches the whole cluster
    assert(pairs.select("b_id").distinct().count() == n - 1)
    // all-identical docs: every pair is a full-signature match
    assert(pairs.filter(col("est_jaccard") =!= 1.0).count() == 0)
    // truncation accounting: one hot bucket per band, n-cap truncated
    val stats = Dedup.bucketOccupancyStats(sig, cap).collect()
    assert(stats.length == 3)
    stats.foreach { r =>
      assert(r.getAs[Long]("max_occupancy") == n)
      assert(r.getAs[Long]("docs_kept") == cap)
      assert(r.getAs[Long]("docs_truncated") == n - cap)
    }
  }

  test("bucket cap is a no-op when occupancy stays under it") {
    val sig = Dedup.signaturesOf(
      Tables.documents(spark, sf).select("doc_id", "text"),
      org.apache.spark.storage.StorageLevel.NONE)
    val capped = Dedup.minhashCandidatesFromSig(sig)
      .orderBy("a_id", "b_id").collect().toSeq
    val uncapped = Dedup.minhashCandidatesFromSig(sig, Int.MaxValue)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(capped == uncapped)
  }

  test("confirm-stage cap bounds levenshtein pairs per doc") {
    import spark.implicits._
    val n = 50; val m = 3
    val docs = (0L until n).map(i =>
        (i, "identical dup cluster text for the confirm stage budget test case"))
      .toDF("doc_id", "text")
    val sig = Dedup.signaturesOf(docs, org.apache.spark.storage.StorageLevel.NONE)
    val out = Dedup.editdistVerifyFromSig(sig, docs, 0.9, m)
    // unbounded confirm would be C(50,2)=1225 levenshteins; capped is ≤ n·m
    assert(out.count() <= n.toLong * m)
    assert(out.groupBy("a_id").count().filter(col("count") > m).count() == 0)
    assert(out.filter(col("edit_distance") =!= 0).count() == 0)
  }

  test("semDeDup drops planted near-dups, keeps originals and distinct vectors") {
    import spark.implicits._
    // production regime: τ=0.99. ids 0,1 seed the two cells; 2 and 4
    // are near-copies of 0, 3 shares 1's cell but is NOT a near-dup
    val pts = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.999f, 0.001f, 0.0f)),
      (3L, Array(0.3f, 0.7f, 0.0f)),
      (4L, Array(0.998f, 0.002f, 0.0f)))
      .toDF("vec_id", "embedding")
    val m = Dedup.semDeDupOf(pts, k = 2, rounds = 2, threshold = 0.99)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Boolean]("kept"), r.getAs[Long]("dup_of")))).toMap
    assert(m(0L) == ((true, -1L)), s"got ${m(0L)}")  // first of its cell
    assert(m(1L)._1)                                 // first of its cell
    assert(!m(2L)._1 && m(2L)._2 == 0L)
    assert(m(3L)._1 && m(3L)._2 == -1L)              // cos(3,1) ≈ 0.92 < τ
    assert(!m(4L)._1 && Set(0L, 2L)(m(4L)._2))
  }

  test("semDeDup cell cap bounds the candidate panel, every vector still judged") {
    import spark.implicits._
    // all-identical vectors: one cell swallows the corpus (the other
    // seed ties away and drops empty) — uncapped pairs would be C(n,2)
    val n = 100; val cap = 4
    val pts = (0L until n).map(i => (i, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDeDupOf(pts, k = 2, rounds = 2, threshold = 0.99,
      cellCap = cap)
    assert(out.count() == n)                         // a verdict per vector
    val byId = out.collect().map(r => r.getAs[Long]("vec_id") ->
      ((r.getAs[Boolean]("kept"), r.getAs[Long]("dup_of")))).toMap
    assert(byId(0L) == ((true, -1L)))                // cluster head survives
    assert((1L until n).forall(i => !byId(i)._1))    // everyone else dropped
    // cos ties → lowest rep id: every dup resolves against vec 0, and
    // no candidate outside the cap panel was ever consulted
    assert((1L until n).forall(i => byId(i)._2 == 0L))
  }

  test("gopher rules: each planted violation trips its own rule") {
    import spark.implicits._
    // the fixture's single-line texts never exercise the line-shape /
    // symbol rules — planted docs pin each rule's firing condition
    val good = ("the quick brown fox jumps over a lazy dog and runs " +
      "to the hills of green in silence ") * 4
    val bullets = (1 to 10).map(i =>
      s"- bullet item number $i in the endless list").mkString("\n")
    val dots = (1 to 10).map(i =>
      if (i <= 4) s"a trailing thought number $i..."
      else s"a plain line number $i").mkString("\n")
    val hashy = "tag " + ("# " * 30).trim
    val numeric = (1 to 60).map(_.toString).mkString(" ")
    val out = graft.Graft.text.gopherRules(
        Seq((0L, good), (1L, bullets), (2L, dots), (3L, hashy), (4L, numeric))
          .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("passes"))
    assert(out(1L).getAs[Double]("frac_bullet_lines") == 1.0
      && !out(1L).getAs[Boolean]("passes"))
    assert(out(2L).getAs[Double]("frac_ellipsis_lines") == 0.4
      && !out(2L).getAs[Boolean]("passes"))
    assert(out(3L).getAs[Double]("symbol_ratio") > 0.1
      && !out(3L).getAs[Boolean]("passes"))
    assert(out(4L).getAs[Double]("frac_alpha_words") < 0.8
      && !out(4L).getAs[Boolean]("passes"))
    // word-count lower bound: the good text cut to its first sentence
    val short = graft.Graft.text.gopherRules(
      Seq((9L, "the quick brown fox jumps over a lazy dog"))
        .toDF("doc_id", "text"), "doc_id", "text").head()
    assert(short.getAs[Long]("n_words") < 50 && !short.getAs[Boolean]("passes"))
  }

  test("bpeEncode: hand-derived merges segment the training corpus exactly") {
    import spark.implicits._
    // freq: low=4, lower=2, lowest=1 → merges (l,o), (lo,w), (low,e);
    // encode: low=[low], lower=[lowe,r], lowest=[lowe,s,t]
    val docs = Seq((0L, "low lower lowest low low"), (1L, "low lower"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncodeOf(docs, rounds = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_symbols")))).toMap
    assert(out(0L) == ((5L, 8L)), s"got ${out(0L)}")  // 1+2+3+1+1
    assert(out(1L) == ((2L, 3L)))                     // 1+2
    // deterministic end to end: re-encoding yields identical digests
    val d1 = TextAnalysis.bpeEncodeOf(docs, rounds = 3)
      .orderBy("doc_id").collect().map(_.getAs[String]("enc_digest")).toSeq
    val d2 = graft.Graft.text.bpeEncode(docs, "doc_id", "text", rounds = 3)
      .orderBy("doc_id").collect().map(_.getAs[String]("enc_digest")).toSeq
    assert(d1 == d2)
  }

  test("null/empty text keeps its one-row-per-doc row in the r7 per-doc ops") {
    import spark.implicits._
    val docs = Seq((0L, Option("real text here for the survivors group")),
      (1L, Option.empty[String]), (2L, Some("")))
      .toDF("doc_id", "text")
    assert(Dedup.stripRepeatedSpansOf(docs).count() == 3)
    val enc = TextAnalysis.bpeEncodeOf(docs, rounds = 1)
    assert(enc.count() == 3)
    val emptyRow = enc.filter(col("doc_id") === 1L).head()
    assert(emptyRow.getAs[Long]("n_symbols") == 0L)
    val rules = graft.Graft.text.gopherRules(
      docs.withColumnRenamed("text", "body"), "doc_id", "body")
    assert(rules.count() == 3)
    assert(!rules.filter(col("doc_id") === 1L).head().getAs[Boolean]("passes"))
  }

  test("cdc chunks: prefix insertion only ADDS boundaries; counts and sums are consistent") {
    // restrict to docs with >= W tokens: a shorter doc's only boundary
    // is the whole-string-hash fallback, which legitimately VANISHES
    // once the 3-token prefix pushes it past W and the single window
    // hash differs — the monotonicity law below holds for real windows
    val docs = Tables.documents(spark, sf)
      .filter(expr(s"size(filter(${Dedup.toksExpr}, t -> t <> ''))") >= 5)
      .limit(50)
    val base = Dedup.cdcChunksOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val prefixed = Dedup.cdcChunksOf(
      docs.select(col("doc_id"), concat(lit("zq1 zq2 zq3 "), col("text")).as("text")))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(base.keySet == prefixed.keySet)
    base.foreach { case (id, (nt, nb, nc, bsum)) =>
      val (nt2, nb2, nc2, bsum2) = prefixed(id)
      // 3 new tokens; every ORIGINAL window survives a prefix insertion,
      // so its boundaries (content-local) all persist — the CDC property
      // fixed-size chunking lacks
      assert(nt2 == nt + 3, s"doc $id token count")
      assert(nb2 >= nb && bsum2 >= bsum, s"doc $id lost a boundary: $nb->$nb2")
      assert(nc == nb + 1 && nc2 == nb2 + 1)
    }
    // at divisor 16 the corpus must actually chunk (avg ~16 tokens/chunk)
    assert(base.values.map(_._2).sum > 0)
  }

  test("lm score: hand-computed micro corpus, add-k arithmetic exact") {
    import spark.implicits._
    // one doc "a b a b": c2(a,b)=2, c2(b,a)=1, c1(a)=2, c1(b)=1, V=2
    // p(a,b) = 2.5/3, p(b,a) = 1.5/2 → mean = (2·(2.5/3) + 0.75)/3
    val out = TextAnalysis.lmScoreOf(Seq((0L, "a b a b")).toDF("doc_id", "text"))
      .head()
    assert(out.getAs[Long]("n_bigrams") == 3L)
    assert(out.getAs[Double]("mean_token_prob") == 0.805556)
  }

  test("domain affinity: target-typical docs score high, difference and log forms agree on ranking") {
    import spark.implicits._
    // target domain talks about cats; raw background is cooking text.
    // doc 4 is cat-like but NOT in-target — affinity must recognize it.
    val docs = Seq(
      (0L, "cat whiskers purr cat", true),
      (1L, "cat purr cat cat whiskers", true),
      (2L, "flour oven knead bake flour", false),
      (3L, "oven bake simmer flour salt", false),
      (4L, "cat purr whiskers purr", false)).toDF("doc_id", "text", "tgt")
    val aff = TextAnalysis.domainAffinityOf(docs, col("tgt")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("affinity")).toMap
    assert(aff(4L) > aff(2L) && aff(4L) > aff(3L),
      "out-of-target cat doc should outscore cooking docs")
    assert(Seq(0L, 1L).map(aff).min > Seq(2L, 3L).map(aff).max)
    val logw = TextAnalysis.domainAffinityLogOf(docs, col("tgt")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    // the two estimators need not be affine but must rank identically
    // on a fixture with distinct scores
    def ranking(m: Map[Long, Double]) = m.toSeq.sortBy { case (id, v) => (-v, id) }.map(_._1)
    assert(ranking(aff) == ranking(logw))
  }

  test("lsh recall: exact duplicates are always captured (recall 1), report counts add up") {
    import spark.implicits._
    // two exact-dup clusters (identical text ⇒ identical signatures ⇒
    // every band collides ⇒ candidates MUST include all true pairs)
    // plus unrelated filler
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven"
    val docs = (Seq((0L, a), (1L, a), (2L, a), (3L, b), (4L, b)) ++
      (5L to 14L).map(i => (i, s"filler text number $i with unique words w${i}a w${i}b w${i}c")))
      .toDF("id", "body")
    val r = Graft.dedup.lshRecall(docs, "id", "body").head()
    // true pairs: C(3,2) + C(2,2) = 4, all captured
    assert(r.getAs[Long]("n_true") == 4L)
    assert(r.getAs[Long]("n_captured") == 4L)
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Long]("n_candidates") >= 4L)
  }

  test("ccnet buckets: per-language tertiles, fluent text lands in head, soup in tail") {
    import spark.implicits._
    // 6 English docs: 2 fluent (repeat corpus phrases), 2 middling, 2
    // token soup; plus a 3-doc second language to prove the window
    // partitions per lang (its tertiles are its own).
    val docs = Seq(
      (0L, "the cat sat on the mat and the cat sat on the mat", "en"),
      (1L, "the cat sat on the mat again and again and again", "en"),
      (2L, "the dog stood on the mat sometimes", "en"),
      (3L, "a dog sat near the cat quietly", "en"),
      (4L, "zyx qwv jkl pqr stu vwx", "en"),
      (5L, "qqq www eee rrr ttt yyy", "en"),
      (10L, "uno dos tres uno dos tres", "es"),
      (11L, "uno dos tres cuatro", "es"),
      (12L, "xxo ppl mmn bbv", "es")).toDF("id", "body", "language")
    val out = Graft.text.ccnetBuckets(docs, "id", "body", "language").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[String]("bucket")))).toMap
    val en = out.filter(_._2._1 == "en").view.mapValues(_._2).toMap
    assert(en.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map("head" -> 2, "middle" -> 2, "tail" -> 2))
    assert(Set(en(4L), en(5L)) == Set("tail"), "token soup must land in tail")
    val es = out.filter(_._2._1 == "es").view.mapValues(_._2).toMap
    assert(es.values.toSet == Set("head", "middle", "tail"),
      "3-doc language must spread one per tertile")
  }

  test("lm score ranks corpus-typical text above token soup; ppl view inverts") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat and the cat sat on the mat again"),
      (1L, "the cat sat on the mat"),
      (2L, "zyx qwv jkl pqr stu vwx")).toDF("doc_id", "text")
    val score = TextAnalysis.lmScoreOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_token_prob")).toMap
    assert(score(0L) > score(2L) && score(1L) > score(2L))
    assert(score.values.forall(p => p > 0.0 && p <= 1.0))
    val ppl = graft.Graft.text.lmPerplexity(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    // same model, log view: the soup doc is the most perplexing
    assert(ppl(2L) > ppl(0L) && ppl(2L) > ppl(1L))
    assert(ppl.values.forall(_ >= 1.0))
  }

}
