package graft

import org.apache.spark.sql.functions._

/** The library façade on USER schemas (arbitrary column names) must
  * agree with the harness-bound operators on the same data. */
class GraftApiSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.documents(spark, sf)
    .select(col("doc_id").as("my_id"), col("text").as("body"))

  test("dedup.exact matches the harness d_exact canonical mapping") {
    val api = Graft.dedup.exact(corpus, "my_id", "body")
    val harness = SparkEntry.queries("d_exact")(spark, sf)
      .select("doc_id", "canonical_id")
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("dedup.minhashCandidates matches d_minhash_lsh") {
    val api = Graft.dedup.minhashCandidates(corpus, "my_id", "body")
    val harness = SparkEntry.queries("d_minhash_lsh")(spark, sf)
    assert(api.orderBy("a_id", "b_id").collect().toSeq ==
      harness.orderBy("a_id", "b_id").collect().toSeq)
  }

  test("dedup.nearDupIds drops one side of every planted near-dup pair") {
    val c = corpus
    val drops = Graft.dedup.nearDupIds(c, "my_id", "body", 0.9)
    val pairs = SparkEntry.queries("d_minhash_lsh")(spark, sf)
      .filter(col("est_jaccard") >= 0.9)
    assert(drops.count() == pairs.select("b_id").distinct().count())
    val cleaned = c.join(drops, col("my_id") === col("dup_id"), "left_anti")
    assert(cleaned.count() == c.count() - drops.count())
  }

  test("dedup façade cache lifecycle: one-shot calls leave nothing cached; signatures unpersists cleanly") {
    // diff against a snapshot, not isEmpty: other suites in the shared
    // session leave localCheckpoint RDD blocks that clearCache doesn't
    // touch (they drain via the ContextCleaner), and suite order is
    // not guaranteed
    spark.catalog.clearCache()
    def storedIds = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    val before = storedIds
    // one-shot convenience: no NEW persisted blocks survive the action
    Graft.dedup.minhashCandidates(corpus, "my_id", "body").count()
    assert((storedIds -- before).isEmpty,
      "one-shot minhashCandidates leaked a cached frame")
    // two-step form: the caller-held signature frame is the ONLY new
    // cache, and unpersisting it releases everything it added
    val sig = Graft.dedup.signatures(corpus, "my_id", "body")
    assert(sig.storageLevel.useMemory || sig.storageLevel.useDisk)
    Graft.dedup.minhashCandidatesFor(sig).count()
    assert((storedIds -- before).nonEmpty)
    sig.unpersist(blocking = true)
    assert(sig.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert((storedIds -- before).isEmpty,
      "signatures.unpersist left cached blocks behind")
  }

  test("dedup.clusterIdsFor closes near-dup chains transitively (matches harness d_cluster_canonical)") {
    val sig = Graft.dedup.signatures(corpus, "my_id", "body",
      org.apache.spark.storage.StorageLevel.NONE)
    val api = Graft.dedup.clusterIdsFor(sig, 0.5)
    val harness = SparkEntry.queries("d_cluster_canonical")(spark, sf)
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
    // exactly one survivor (is_dup = false with its own id) per cluster
    val perCluster = api.groupBy("cluster_id")
      .agg(sum(when(!col("is_dup"), 1).otherwise(0)).as("survivors"))
    assert(perCluster.filter(col("survivors") =!= 1).count() == 0)
  }

  test("dedup.passageCoverage equals the harness d_passage_coverage on a renamed schema") {
    val api = Graft.dedup.passageCoverage(corpus, "my_id", "body")
    val harness = SparkEntry.queries("d_passage_coverage")(spark, sf)
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("dedup.stripRepeatedSpans equals the harness d_strip_spans on a renamed schema") {
    val api = Graft.dedup.stripRepeatedSpans(corpus, "my_id", "body")
    val harness = SparkEntry.queries("d_strip_spans")(spark, sf)
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("dedup.editDistanceVerified equals the harness d_editdist_verify") {
    val api = Graft.dedup.editDistanceVerified(corpus, "my_id", "body", 0.9)
    val harness = SparkEntry.queries("d_editdist_verify")(spark, sf)
    assert(api.orderBy("a_id", "b_id").collect().toSeq ==
      harness.orderBy("a_id", "b_id").collect().toSeq)
  }

  test("text.redactPii scrubs emails, phones, and IPs but leaves prose alone") {
    val df = Seq(
      ("reach me at jane.doe+spam@mail.example.org or +44-555-0199",
        "reach me at <EMAIL> or <PHONE>"),
      ("server 192.168.001.1 answered", "server <IP> answered"),
      ("no pii here, just 3.14 and v2.0", "no pii here, just 3.14 and v2.0"))
      .toDF("raw", "expect")
    assert(df.filter(Graft.text.redactPii(col("raw")) =!= col("expect")).count() == 0)
  }

  test("similarity.topK agrees with the harness brute-force query") {
    val queryVec = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val vectors = Tables.embeddings(spark, sf)
      .filter(col("vec_id") =!= 0L)
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val api = Graft.similarity.topK(vectors, "vid", "emb", queryVec, 10)
      .select(col("id"), round(col("cosine"), 6).as("cosine"))
    val harness = SparkEntry.queries("s_cosine_topk")(spark, sf)
      .select(col("vec_id").as("id"), col("cosine"))
    assert(api.collect().toSeq == harness.collect().toSeq)
  }

  test("similarity.semDeDup equals the harness d_semdedup on a renamed schema") {
    val vectors = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val api = Graft.similarity.semDeDup(vectors, "vid", "emb", 8, 3, 0.35)
    val harness = SparkEntry.queries("d_semdedup")(spark, sf)
    assert(api.orderBy("vec_id").collect().toSeq ==
      harness.orderBy("vec_id").collect().toSeq)
  }

  test("similarity.semDeDup façade cache lifecycle: one-shot call leaves nothing cached") {
    spark.catalog.clearCache()
    def storedIds = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    val before = storedIds
    val vectors = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    Graft.similarity.semDeDup(vectors, "vid", "emb", 8, 3, 0.35).count()
    assert((storedIds -- before).isEmpty,
      "one-shot semDeDup leaked a cached frame")
  }

  test("similarity.kmeans equals the harness s_kmeans on a renamed schema") {
    val vectors = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val api = Graft.similarity.kmeans(vectors, "vid", "emb", 8, 3)
    val harness = SparkEntry.queries("s_kmeans")(spark, sf)
    assert(api.orderBy("cell", "dim").collect().toSeq ==
      harness.orderBy("cell", "dim").collect().toSeq)
  }

  test("similarity.hardNegatives equals the harness s_hard_negatives on a renamed schema") {
    val vectors = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("vid"), col("embedding").as("emb"),
        col("label").as("lab"))
    val api = Graft.similarity.hardNegatives(
      vectors, vectors.filter(col("vid") < 5), "vid", "emb", "lab")
    val harness = SparkEntry.queries("s_hard_negatives")(spark, sf)
    assert(api.orderBy("anchor_id", "rank").collect().toSeq ==
      harness.orderBy("anchor_id", "rank").collect().toSeq)
  }

  test("similarity.topKPerGroup returns k best per group in order") {
    val scored = Seq((1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.95),
      (2L, 20L, 0.1), (2L, 21L, 0.2)).toDF("g", "item", "s")
    val top = Graft.similarity.topKPerGroup(scored, "g", "item", "s", 2)
      .orderBy("group", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(top == Seq((1L, 10L, 0.9), (1L, 12L, 0.95), (2L, 20L, 0.1), (2L, 21L, 0.2)))
  }

  test("temporal.asofJoin works on qualified user schemas and matches the harness j6") {
    val probe = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type").as("kind"), col("ts"))
    val build = Tables.events(spark, sf)
      .groupBy(col("event_type").as("kind"))
      .agg(min("ts").as("ts"))
      .withColumn("tag", concat(lit("first-"), col("kind")))
    val out = Graft.temporal.asofJoin(probe, build, "kind", "ts", "tag")
    // every event is at or after its type's first event → every row tagged
    assert(out.count() == probe.count())
    assert(out.filter(col("tag").isNull).count() == 0)
    assert(out.filter(col("tag") =!= concat(lit("first-"), col("kind"))).count() == 0)
  }

  test("sampling.byHash equals the harness p8 selection on a renamed schema") {
    val api = Graft.sampling.byHash(corpus, "body", 10).select(col("my_id").as("doc_id"))
    val harness = SparkEntry.queries("p8_hash_sample")(spark, sf).select("doc_id")
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("graphs.connectedComponents labels a user edge list") {
    val e = Seq(("x1", "x2"), ("x2", "x3"), ("y1", "y2")).toDF("src", "dst")
    val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val labels = Graft.graphs.connectedComponents(und).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels("x3") == "x1" && labels("x2") == "x1")
    assert(labels("y2") == "y1")
  }

  test("text.fingerprint equals the oracle-checked t_fingerprint column") {
    Graft.register(spark)
    val api = Tables.documents(spark, sf)
      .select(col("doc_id"), Graft.text.fingerprint(col("text")).as("fingerprint"))
    val harness = SparkEntry.queries("t_fingerprint")(spark, sf)
      .select("doc_id", "fingerprint")
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("timeseries façade equals the harness ts_* queries on a renamed schema") {
    val ev = Tables.events(spark, sf).select(
      col("event_id").as("eid"), col("ts").as("at"),
      col("user_id").as("uid"), col("value").as("v"))
    val sess = Graft.timeseries.sessionize(ev, "uid", "at", "eid", "v")
      .withColumnRenamed("uid", "user_id")
    assert(sess.orderBy("user_id", "session_id").collect().toSeq ==
      SparkEntry.queries("ts_sessionize")(spark, sf)
        .orderBy("user_id", "session_id").collect().toSeq)
    val roll = Graft.timeseries.rolling(ev, "uid", "at", "eid", "v", 3600L)
      .select(col("eid").as("event_id"), col("n_roll"), col("avg_roll"))
    assert(roll.orderBy("event_id").collect().toSeq ==
      SparkEntry.queries("ts_rolling")(spark, sf)
        .select(col("event_id"), col("n_1h"), col("avg_1h"))
        .orderBy("event_id").collect().toSeq)
    val rs = Graft.timeseries.resampleHourly(ev, "uid", "at", "v")
      .withColumnRenamed("uid", "user_id")
    assert(rs.orderBy("user_id", "hour").collect().toSeq ==
      SparkEntry.queries("ts_resample")(spark, sf)
        .orderBy("user_id", "hour").collect().toSeq)
  }

  test("dedup.contaminatedIds equals the harness d_contamination on the same split") {
    val train = corpus.filter(col("my_id") % 7 =!= 0)
    val holdout = corpus.filter(col("my_id") % 7 === 0)
    val api = Graft.dedup.contaminatedIds(train, holdout, "my_id", "body")
    val harness = SparkEntry.queries("d_contamination")(spark, sf)
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("sampling.quotaPerStratum / mixtureWeights equal the harness p10 / t_mixture_weights") {
    val c = Tables.documents(spark, sf)
      .select(col("doc_id").as("my_id"), col("text").as("body"), col("lang").as("tongue"))
    val quota = Graft.sampling.quotaPerStratum(c, "tongue", "body", "my_id", 40)
      .select(col("my_id").as("doc_id"), col("tongue").as("lang"))
    val harness = SparkEntry.queries("p10_quota_sample")(spark, sf).select("doc_id", "lang")
    assert(quota.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
    val mix = Graft.sampling.mixtureWeights(c, "tongue", "body")
      .withColumnRenamed("stratum", "lang").withColumnRenamed("n_rows", "n_docs")
    val mixHarness = SparkEntry.queries("t_mixture_weights")(spark, sf)
    assert(mix.orderBy("lang").collect().toSeq ==
      mixHarness.orderBy("lang").collect().toSeq)
  }

  test("temporal.scd2History: intervals chain per key and exactly one current row") {
    val log = Seq(
      ("k1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      ("k1", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 2L),
      ("k1", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 3L),
      ("k2", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), 4L))
      .toDF("k", "ts", "id")
    val hist = Graft.temporal.scd2History(log, "k", "ts", "id")
    assert(hist.count() == 4)
    assert(hist.filter(col("is_current")).count() == 2) // one open row per key
    val k1 = hist.filter(col("k") === "k1").orderBy("valid_from").collect()
    // each version closes exactly where the next opens
    k1.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getTimestamp(a.fieldIndex("valid_to")) ==
          b.getTimestamp(b.fieldIndex("valid_from")))
      case _ =>
    }
    assert(k1.last.isNullAt(k1.last.fieldIndex("valid_to")))
  }

  test("timeseries.funnel on a renamed schema matches the harness ts_funnel timestamps") {
    val ev = Tables.events(spark, sf).select(
      col("user_id").as("who"), col("ts").as("at"), col("event_type").as("kind"))
    val api = Graft.timeseries.funnel(ev, "who", "at", "kind",
      Seq("view", "click", "purchase"))
      .select(col("who").as("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
    val harness = SparkEntry.queries("ts_funnel")(spark, sf)
      .select("user_id", "t_view", "t_click", "t_purchase")
    assert(api.orderBy("user_id").collect().toSeq ==
      harness.orderBy("user_id").collect().toSeq)
  }

  test("graphs.pageRank: base rank for sinks' sources, conservation on a simple cycle") {
    // 2-cycle a<->b with damping: pr converges toward 1 for both; with
    // pr0 = 1 every iteration keeps pr(a) = pr(b) = 1 exactly
    val links = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val nodes = Seq("a", "b").toDF("node")
    val pr = Graft.graphs.pageRank(links, nodes).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr("a") - 1.0) < 1e-12 && math.abs(pr("b") - 1.0) < 1e-12)
    // a node with no in-links sits at the base (1 - damping)
    val chain = Seq(("r", "s")).toDF("src", "dst")
    val prChain = Graft.graphs.pageRank(chain, Seq("r", "s").toDF("node"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(prChain("r") - 0.15) < 1e-12)
  }

  test("text.domainAffinity equals the harness t_domain_affinity on a renamed schema") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").as("body"), col("source"))
    val api = Graft.text.domainAffinity(docs, "id", "body",
      col("source").isin("src1", "src2", "src3"))
    val harness = SparkEntry.queries("t_domain_affinity")(spark, sf)
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("graphs.hits: known hub/authority counts on a star, normalized view rescales") {
    // hub h points at authorities x, y, z; one back-edge x -> h.
    // Round 1: auth = in-degree (x,y,z = 1 from h; h = 1 from x),
    // hub(h) = 3, hub(x) = 1. Round 2: auth(x|y|z) = hub(h) = 3,
    // auth(h) = hub(x) = 1; hub(h) = 3 + 3 + 3 = 9, hub(x) = auth(h) = 1.
    val links = Seq(("h", "x"), ("h", "y"), ("h", "z"), ("x", "h")).toDF("src", "dst")
    val nodes = Seq("h", "x", "y", "z").toDF("node")
    val out = Graft.graphs.hits(links, nodes).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("h") == ((1L, 9L)))
    assert(out("x") == ((3L, 1L)))
    assert(out("y") == ((3L, 0L)))
    assert(out("z") == ((3L, 0L)))
    val norm = Graft.graphs.hitsNormalized(links, nodes).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(norm("h") == ((0.333333, 1.0)))   // 1/3, 9/9 — rounded 6dp
    assert(norm("x") == ((1.0, 0.111111)))   // 3/3, 1/9
  }

  test("graphs.hitsConverged: fixpoint at depth >=20, unit-max, stable under more iterations") {
    // star + back-edge (same fixture as the exact-integer test) plus a
    // chain tail — converges fast, exercises the normalized loop
    val links = Seq(("h", "x"), ("h", "y"), ("h", "z"), ("x", "h"),
      ("z", "t"), ("t", "u")).toDF("src", "dst")
    val nodes = Seq("h", "x", "y", "z", "t", "u").toDF("node")
    val out = Graft.graphs.hitsConverged(links, nodes, maxIters = 50)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.size == 6)
    // unit max on both scores, everything in [0, 1]
    assert(math.abs(out.values.map(_._1).max - 1.0) < 1e-12)
    assert(math.abs(out.values.map(_._2).max - 1.0) < 1e-12)
    assert(out.values.forall { case (a, h) => a >= 0 && a <= 1 && h >= 0 && h <= 1 })
    // the hub that points at three authorities dominates the hub axis
    assert(out("h")._2 == 1.0)
    // a fixpoint is a fixpoint: doubling the iteration budget changes nothing
    val more = Graft.graphs.hitsConverged(links, nodes, maxIters = 100)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(more == out)
    // edgeless graph: all-zero scores, no division error, still converges
    val lonely = Graft.graphs.hitsConverged(
      Seq.empty[(String, String)].toDF("src", "dst"), nodes, maxIters = 5)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(lonely.length == 6 && lonely.forall(_ == ((0.0, 0.0))))
  }

  test("graphs hits family cache lifecycle: one-shot calls leave nothing cached") {
    spark.catalog.clearCache()
    def storedIds = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    val before = storedIds
    val links = Seq(("h", "x"), ("h", "y"), ("x", "h")).toDF("src", "dst")
    val nodes = Seq("h", "x", "y").toDF("node")
    Graft.graphs.hits(links, nodes).count()
    Graft.graphs.hitsNormalized(links, nodes).count()
    // (hitsConverged is excluded: like the other iterative fixpoint
    // ops it lineage-cuts via localCheckpoint, whose blocks drain
    // through the ContextCleaner rather than clearCache)
    assert((storedIds -- before).isEmpty,
      "a one-shot hits-family call leaked a cached frame")
  }

  test("dedup.containmentPairs matches d_containment on a renamed schema") {
    val api = Graft.dedup.containmentPairs(corpus, "my_id", "body", 0.5)
    val harness = SparkEntry.queries("d_containment")(spark, sf)
    assert(api.orderBy("a_id", "b_id").collect().toSeq ==
      harness.orderBy("a_id", "b_id").collect().toSeq)
  }

  test("text.removeBoilerplate matches t_line_dedup digests on a renamed schema") {
    val api = Graft.text.removeBoilerplate(corpus, "my_id", "body")
      .select(col("doc_id"), col("n_segments"), col("n_removed"),
        md5(col("clean_text")).as("clean_digest"))
    val harness = SparkEntry.queries("t_line_dedup")(spark, sf)
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("sampling.splitByHash matches p11_split on a renamed schema") {
    val api = Graft.sampling.splitByHash(
        Tables.documents(spark, sf).select(col("doc_id"), col("text").as("body")), "body")
      .select(col("doc_id"), col("split_band"), col("split"))
    val harness = SparkEntry.queries("p11_split")(spark, sf)
      .select(col("doc_id"), col("split_band"), col("split"))
    assert(api.orderBy("doc_id").collect().toSeq ==
      harness.orderBy("doc_id").collect().toSeq)
  }

  test("mergeAggStates facade merges multi-key additive states") {
    val base = Seq(("a", 1L, 2L)).toDF("k1", "k2", "n")
    val delta = Seq(("a", 1L, 5L), ("b", 2L, 1L)).toDF("k1", "k2", "n")
    val out = Graft.mergeAggStates(base, delta, Seq("k1", "k2"), Seq("n"))
      .orderBy("k1").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 1L, 7L), ("b", 2L, 1L)))
  }

  test("graphs.kcore facade: pendant nodes peel, the clique survives") {
    import spark.implicits._
    val e = Seq(("1", "2"), ("2", "3"), ("1", "3"), ("3", "4")).toDF("src", "dst")
    val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val core = Graft.graphs.kcore(und, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(core == Set(("1", 2L), ("2", 2L), ("3", 2L)))
  }

  test("quality.profile handles dotted column names") {
    import spark.implicits._
    // "user.id" must profile as a COLUMN, not parse as a struct path
    val df = Seq((1L, "a"), (2L, null)).toDF("user.id", "body")
    Seq(true, false).foreach { exact =>
      val p = Graft.quality.profile(df, exact).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(p.keySet == Set("user.id", "body"))
      assert(p("user.id").getLong(2) == 0L && p("user.id").getLong(3) == 2L)
      assert(p("body").getLong(2) == 1L && p("body").getLong(3) == 1L)
    }
  }

  test("driftPsi: identical versions read zero; planted numeric+categorical shifts trip the alert") {
    import spark.implicits._
    val base = (0 until 1000).map(i =>
      (i.toLong, (i % 4).toDouble, if (i % 2 == 0) "a" else "b")).toDF("id", "x", "c")
    val out0 = Graft.quality.driftPsi(base, base, Seq("x"), Seq("c")).collect()
    assert(out0.length == 2)
    assert(out0.forall(r => !r.getBoolean(4) && r.getDouble(3) == 0.0),
      out0.mkString(","))
    // shifted version: x moves up past the base extent (clamps into the
    // top bucket), c collapses from 50/50 to 90/10
    val shifted = (0 until 1000).map(i =>
      (i.toLong, (i % 4).toDouble + 2.5, if (i % 10 == 0) "b" else "a"))
      .toDF("id", "x", "c")
    val out1 = Graft.quality.driftPsi(base, shifted, Seq("x"), Seq("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out1("x").getBoolean(4) && out1("x").getDouble(3) > 0.2)
    assert(out1("c").getBoolean(4) && out1("c").getDouble(3) > 0.2)
  }

  test("driftChi2: identical versions read ~zero below the alert; planted shifts trip the φ² alert") {
    import spark.implicits._
    val base = (0 until 1000).map(i =>
      (i.toLong, (i % 4).toDouble, if (i % 2 == 0) "a" else "b")).toDF("id", "x", "c")
    val out0 = Graft.quality.driftChi2(base, base, Seq("x"), Seq("c")).collect()
    assert(out0.length == 2)
    // smoothing makes identical-version chi2 tiny but not exactly 0;
    // the φ² alert must stay untripped
    assert(out0.forall(r => !r.getBoolean(4) && r.getDouble(3) < 0.01),
      out0.mkString(","))
    val shifted = (0 until 1000).map(i =>
      (i.toLong, (i % 4).toDouble + 2.5, if (i % 10 == 0) "b" else "a"))
      .toDF("id", "x", "c")
    val out1 = Graft.quality.driftChi2(base, shifted, Seq("x"), Seq("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out1("x").getBoolean(4) && out1("x").getDouble(3) / 1000 > 0.01)
    assert(out1("c").getBoolean(4) && out1("c").getDouble(3) / 1000 > 0.01)
  }

  test("driftW1: equals the brute-force CDF-area; identical reads zero; shift distance scales the statistic") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val bVals = (0 until 400).map(_ => rnd.nextInt(20).toDouble)
    def w1Brute(a: Seq[Double], b: Seq[Double]): Double = {
      val vs = (a ++ b).distinct.sorted
      val ext = a.max - a.min
      vs.zip(vs.tail).map { case (v, nx) =>
        val fa = a.count(_ <= v).toDouble / a.size
        val fb = b.count(_ <= v).toDouble / b.size
        math.abs(fa - fb) * (nx - v)
      }.sum / ext
    }
    def run(c: Seq[Double]): (Double, Boolean) = {
      val base = bVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
      val cur = c.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
      val r = Graft.quality.driftW1(base, cur, Seq("x")).collect()(0)
      (r.getDouble(3), r.getBoolean(4))
    }
    val (zero, zAlert) = run(bVals)
    assert(zero == 0.0 && !zAlert)
    val shift1 = bVals.map(_ + 1.0)
    val shift5 = bVals.map(_ + 5.0)
    val (w1a, aAlert) = run(shift1)
    val (w1b, bAlert) = run(shift5)
    assert(math.abs(w1a - w1Brute(bVals, shift1)) < 2e-6, s"$w1a")
    assert(math.abs(w1b - w1Brute(bVals, shift5)) < 2e-6, s"$w1b")
    // W1 reads the DISTANCE of the shift (KS saturates; W1 scales)
    assert(w1b > 3 * w1a && bAlert)
  }

  test("driftKs: equals the brute-force max-CDF-gap; identical reads zero; a planted median shift trips the alert") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val bVals = (0 until 400).map(_ => rnd.nextInt(20).toDouble)
    val cVals = (0 until 300).map(_ => rnd.nextInt(20).toDouble + 4.0)
    val base = bVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val cur = cVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    // brute force over every candidate point (the pooled values)
    val na = bVals.size.toLong; val nc = cVals.size.toLong
    val mdev = (bVals ++ cVals).distinct.map { v =>
      math.abs(bVals.count(_ <= v) * nc - cVals.count(_ <= v) * na)
    }.max
    val expectKs = math.floor(mdev.toDouble / (na * nc).toDouble * 1e6 + 0.5) / 1e6
    val out = Graft.quality.driftKs(base, cur, Seq("x")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == na && out(0).getLong(2) == nc)
    assert(out(0).getDouble(3) == expectKs, s"${out(0)} vs $expectKs")
    assert(out(0).getBoolean(4) == (mdev * 10 > na * nc))
    // +4 shift on a 0..19 support is a big CDF gap — must alert
    assert(out(0).getBoolean(4))
    val same = Graft.quality.driftKs(base, base, Seq("x")).collect()
    assert(same(0).getDouble(3) == 0.0 && !same(0).getBoolean(4))
  }

  test("expectations: sliced report equals per-slice recompute; whole-frame equals the slice sum; null predicates violate") {
    import spark.implicits._
    val df = Seq(
      ("a", 10, Option(1.0)), ("a", 60, Option(2.0)), ("a", 20, None),
      ("b", 5, Option(0.5)), ("b", 70, Option(3.0))).toDF("src", "n", "v")
    val rules = Seq(
      "n_le_50" -> (col("n") <= 50),
      "v_not_null" -> col("v").isNotNull)
    val sliced = Graft.quality.expectations(df, rules, Seq("src"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // per-slice equals the filtered recompute (the sliced-drift law)
    for (s0 <- Seq("a", "b")) {
      val solo = Graft.quality.expectations(df.filter(col("src") === s0), rules)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      rules.foreach { case (name, _) =>
        assert(sliced((s0, name)) == solo(name), s"$s0/$name") }
    }
    // whole-frame counts = slice sums; a NULL predicate result violates
    val whole = Graft.quality.expectations(df, rules)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(whole("n_le_50") == 2L && whole("v_not_null") == 1L)
    assert(sliced(("a", "v_not_null"))._2 == 1L && sliced(("b", "v_not_null"))._2 == 0L)
    assert(!sliced(("a", "v_not_null"))._3 && sliced(("b", "v_not_null"))._3)
  }

  test("quarantine: pass+bad partition the input; null rules violate; sinks round-trip with reasons") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(99.0), "ok"),     // fails range
      (3L, None, "ok"),           // null predicate -> violation
      (4L, Some(20.0), "BAD"),    // fails status
      (5L, Some(99.0), "BAD")     // fails both
    ).toDF("id", "v", "st")
    val rules = Seq(
      "v_in_range" -> (col("v") <= 50.0),
      "st_ok" -> (col("st") === "ok"))
    val (ok, bad) = Graft.quality.quarantine(df, rules)
    assert(ok.count() + bad.count() == df.count())
    assert(ok.select("id").as[Long].collect().sorted.toSeq == Seq(1L))
    val reasons = bad.select(col("id"), array_join(col("violations"), ",").as("r"))
      .as[(Long, String)].collect().toMap
    assert(reasons == Map(2L -> "v_in_range", 3L -> "v_in_range",
      4L -> "st_ok", 5L -> "v_in_range,st_ok"))
    // sink path: both outputs written, counts are the files' truth
    val dir = java.nio.file.Files.createTempDirectory("graft-quar").toString
    val (nOk, nBad) = Graft.quality.quarantineTo(df, rules, s"$dir/ok", s"$dir/bad")
    assert(nOk == 1L && nBad == 4L)
    assert(spark.read.parquet(s"$dir/bad")
      .filter(col("violations") === "v_in_range,st_ok").count() == 1L)
  }

  test("rrfFuse: hand-computed fusion of three ranked lists; both-list docs beat single-list ones") {
    import spark.implicits._
    val text = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc", "rank")
    val vec = Seq((12L, 1L), (10L, 2L), (13L, 3L)).toDF("doc", "rank")
    val img = Seq((10L, 1L), (13L, 2L)).toDF("doc", "rank")
    val out = Graft.similarity.rrfFuse(Seq(text, vec, img), "doc", "rank", k = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // doc 10: ranks 1,2,1 → floor(1e9/61)+floor(1e9/62)+floor(1e9/61)
    val s10 = (1e9 / 61).toLong * 2 + (1e9 / 62).toLong
    assert(out.head == ((10L, s10 / 1e9, 3L)), out.mkString(","))
    // every doc present, ordered by fused score desc then id
    assert(out.map(_._1).toSeq == Seq(10L, 12L, 13L, 11L))
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
  }

}
