package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {

  test("d_exact: every doc keeps a canonical id <= its own id") {
    val df = Dedup.queries("d_exact")(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
  }

  test("d_ngram_jaccard: pairs are ordered, jaccard in (0,1]") {
    val df = Dedup.queries("d_ngram_jaccard")(spark, sf)
    assert(df.filter(col("a_id") >= col("b_id")).count() == 0)
    assert(df.filter(col("jaccard") > 1.0 || col("jaccard") <= 0.0).count() == 0)
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
}
