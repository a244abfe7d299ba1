package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior of the library façade: every operator must
  * return an EMPTY result (not throw) on an empty input frame — the
  * harness oracle only ever sees populated fixtures, so this class of
  * bug (a .head on no rows, a window over nothing, a driver collect of
  * an empty probe) would otherwise ship unexercised. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("body", StringType))))

  test("dedup family on an empty corpus: empty results, no exceptions") {
    assert(Graft.dedup.exact(emptyDocs, "id", "body").count() == 0)
    assert(Graft.dedup.minhashCandidates(emptyDocs, "id", "body").count() == 0)
    assert(Graft.dedup.nearDupIds(emptyDocs, "id", "body", 0.9).count() == 0)
    assert(Graft.dedup.passageCoverage(emptyDocs, "id", "body").count() == 0)
    assert(Graft.dedup.stripRepeatedSpans(emptyDocs, "id", "body").count() == 0)
    assert(Graft.dedup.editDistanceVerified(emptyDocs, "id", "body", 0.9).count() == 0)
    val sig = Graft.dedup.signatures(emptyDocs, "id", "body",
      org.apache.spark.storage.StorageLevel.NONE)
    assert(Graft.dedup.clusterIdsFor(sig, 0.5).count() == 0)
    assert(Graft.dedup.contaminatedIds(emptyDocs, emptyDocs, "id", "body").count() == 0)
    assert(Graft.dedup.containmentPairs(emptyDocs, "id", "body", 0.5).count() == 0)
    assert(Graft.dedup.bucketStats(sig).count() == 0)
    val emptyVecs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vid", LongType),
        StructField("vec", ArrayType(FloatType)))))
    assert(Graft.similarity.nearestInBucket(emptyVecs, "vid", "vec").count() == 0)
  }

  test("r10 ops on empty inputs: batch probe, rrf fuse, drift-psi vs an empty version") {
    import spark.implicits._
    val emptyQ = Seq.empty[(Long, String)].toDF("query_id", "term")
    assert(Graft.text.bm25TopkBatch(spark, sf, emptyQ, 5).count() == 0)
    val emptyRank = Seq.empty[(Long, Long)].toDF("doc", "rank")
    assert(Graft.similarity.rrfFuse(Seq(emptyRank), "doc", "rank").count() == 0)
    // drift against an EMPTY current version must report, not crash
    val base = Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "x", "c")
    val out = Graft.quality.driftPsi(base, base.limit(0), Seq("x"), Seq("c")).collect()
    assert(out.length == 2 && out.forall(_.getLong(2) == 0L), out.mkString(","))
  }

  test("bm25 on an empty corpus: empty top-k, no exceptions") {
    assert(Graft.text.bm25Topk(emptyDocs, "id", "body", Seq("a", "b"), 5).count() == 0)
  }

  test("cdc chunks on an empty corpus: empty stats, no exceptions") {
    assert(Graft.dedup.cdcChunks(emptyDocs, "id", "body").count() == 0)
  }

  test("profile on an empty frame: one row per column, zero counts, null reprs") {
    Seq(true, false).foreach { exact =>
      val rows = Graft.quality.profile(emptyDocs, exact).collect()
      assert(rows.length == 2)
      rows.foreach { r =>
        assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
        assert(r.isNullAt(4) && r.isNullAt(5))
      }
    }
  }

  test("similarity on an empty vector table: empty top-k") {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vid", LongType),
        StructField("emb", ArrayType(FloatType)))))
    assert(Graft.similarity.topK(empty, "vid", "emb", Array(1.0f, 0.0f), 5).count() == 0)
    assert(Graft.similarity.kmeans(empty, "vid", "emb", 4, 2).count() == 0)
    assert(Graft.similarity.semDeDup(empty, "vid", "emb", 4, 2, 0.9).count() == 0)
    assert(Graft.similarity.topKPerGroup(
      Seq.empty[(Long, Long, Double)].toDF("g", "item", "s"), "g", "item", "s", 3).count() == 0)
    val emptyLab = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vid", LongType),
        StructField("emb", ArrayType(FloatType)), StructField("lab", IntegerType))))
    assert(Graft.similarity.hardNegatives(emptyLab, emptyLab, "vid", "emb", "lab").count() == 0)
  }

  test("graphs on empty edge lists: empty labelings, BFS returns only seeds") {
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graft.graphs.connectedComponents(noEdges).count() == 0)
    assert(Graft.graphs.connectedComponentsStar(noEdges).count() == 0)
    val seeds = Seq(7L).toDF("node")
    val bfs = Graft.graphs.bfs(noEdges, seeds, maxDepth = 3).collect()
    assert(bfs.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((7L, 0)))
    assert(Graft.graphs.pageRank(noEdges, Seq.empty[Long].toDF("node")).count() == 0)
    assert(Graft.graphs.hits(noEdges, Seq.empty[Long].toDF("node")).count() == 0)
    // edgeless graph with nodes: all-zero scores must normalize to 0,
    // not raise ANSI DIVIDE_BY_ZERO
    val hn = Graft.graphs.hitsNormalized(noEdges, Seq(1L, 2L).toDF("node")).collect()
    assert(hn.length == 2 &&
      hn.forall(r => r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0))
    assert(Graft.graphs.kcore(noEdges, 2).count() == 0)
  }

  test("timeseries / temporal / relational ops on empty frames") {
    val ev = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
      .toDF("eid", "at", "uid", "v")
    assert(Graft.timeseries.sessionize(ev, "uid", "at", "eid", "v").count() == 0)
    assert(Graft.timeseries.rolling(ev, "uid", "at", "eid", "v", 3600L).count() == 0)
    assert(Graft.timeseries.resampleHourly(ev, "uid", "at", "v").count() == 0)
    val build = Seq.empty[(String, java.sql.Timestamp, Double)].toDF("k", "ts", "value")
    val probe = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("k", "ts")
    // empty build side: probe rows survive with a null value (LEFT semantics)
    val asof = Graft.temporal.asofJoin(probe, build, "k", "ts", "value").collect()
    assert(asof.length == 1 && asof(0).isNullAt(asof(0).fieldIndex("value")))
    assert(Graft.upsertByKey(ev, ev.limit(0), Seq("eid")).count() == 0)
    assert(operators.RelationalExt.scd2History(build, "k", "ts", "value").count() == 0)
    assert(Graft.dbMerge(emptyDocs, emptyDocs).count() == 0)
    assert(Graft.mergeAggStates(
      Seq.empty[(Long, Long)].toDF("k", "n"),
      Seq.empty[(Long, Long)].toDF("k", "n"), Seq("k"), Seq("n")).count() == 0)
    assert(Graft.text.removeBoilerplate(emptyDocs, "id", "body").count() == 0)
    // null text must not silently drop the doc from the per-doc output
    val nullDoc = Seq((1L, Option.empty[String]), (2L, Some("real text here")))
      .toDF("id", "body")
    val cleaned = Graft.text.removeBoilerplate(nullDoc, "id", "body")
    assert(cleaned.count() == 2)
    assert(Graft.sampling.splitByHash(emptyDocs, "body").count() == 0)
    assert(Graft.sampling.tokenBudgetPerStratum(
      emptyDocs.withColumn("src", lit("s")), "src", "body", "id", 100L).count() == 0)
    assert(Graft.text.gopherRules(emptyDocs, "id", "body").count() == 0)
    assert(Graft.text.lmScore(emptyDocs, "id", "body").count() == 0)
    assert(Graft.text.lmPerplexity(emptyDocs, "id", "body").count() == 0)
    assert(Graft.text.domainAffinity(emptyDocs, "id", "body", lit(true)).count() == 0)
    assert(Graft.text.ccnetBuckets(
      emptyDocs.withColumn("lg", lit("en")), "id", "body", "lg").count() == 0)
    // the recall report on an empty corpus is the 1-row zero report
    val rep = Graft.dedup.lshRecall(emptyDocs, "id", "body").head()
    assert(rep.getAs[Long]("n_true") == 0L && rep.getAs[Double]("recall") == 0.0)
  }

  test("hicsa pipeline on empty inputs: empty database, canonical schema") {
    val elements = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_pos", LongType), StructField("tag", StringType),
        StructField("text", StringType),
        StructField("links", ArrayType(StructType(Seq(
          StructField("text", StringType), StructField("href", StringType))))))))
    val policy = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq("GuidingPolicy", "PolicyDescription", "Verbiage", "CsaGoals", "Resource")
        .map(StructField(_, StringType))))
    val support = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq("Mitigation", "Practice", "Description", "Resource")
        .map(StructField(_, StringType))))
    val db = Graft.hicsa.buildDatabase(elements, policy, support, "https://x.example")
    assert(db.columns.toSeq ==
      Seq("Type", "Mitigation", "Practice", "Description", "Resource"))
    assert(db.count() == 0)
  }
}
