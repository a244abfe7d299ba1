package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, TimeSeries}

class TimeSeriesSpec extends SparkSpec {

  test("events ts normalization is session-timezone independent (NTZ, nanos-long, and the live table)") {
    import spark.implicits._
    def norm(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = df
      .withColumn("ts", Tables.normalizedEventTs(df.schema("ts").dataType))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime))
      .sortBy(_._1).toSeq
    // synthetic frames of the two reinterpreted physical types
    val ntz = spark.sql(
      "SELECT CAST(1 AS BIGINT) AS event_id, TIMESTAMP_NTZ'2024-03-10 07:30:15.123456' AS ts")
    val nanos = Seq((2L, 1710055815123456789L)).toDF("event_id", "ts")
    val utcNtz = norm(ntz); val utcNanos = norm(nanos)
    // the NTZ wall clock must read as a UTC instant
    assert(utcNtz == Seq((1L, java.time.Instant.parse("2024-03-10T07:30:15.123Z").toEpochMilli)))
    val utcTable = norm(Tables.events(spark, sf).select(col("event_id"), col("ts")))
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      // a session on a US-eastern host (DST boundary date, the worst
      // case for wall-clock reinterpretation) must see the SAME instants
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(norm(ntz) == utcNtz)
      assert(norm(nanos) == utcNanos)
      assert(norm(Tables.events(spark, sf).select(col("event_id"), col("ts"))) == utcTable)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("ts_sessionize: sessions partition each user's events; adjacent sessions gap > 30 min") {
    val sess = TimeSeries.queries("ts_sessionize")(spark, sf).cache()
    val events = Tables.events(spark, sf)
    // every event lands in exactly one session: per-user n_events sums match
    val perUser = sess.groupBy("user_id").agg(sum("n_events").as("n"))
    val raw = events.groupBy("user_id").agg(count(lit(1)).as("n_raw"))
    assert(perUser.join(raw, "user_id").filter(col("n") =!= col("n_raw")).count() == 0)
    // sessions are well-formed and strictly ordered: start <= end, and the
    // next session starts more than 30 min after the previous one ends
    assert(sess.filter(col("session_start") > col("session_end")).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start")
    val gaps = sess
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull)
      .filter(unix_micros(col("session_start")) - unix_micros(col("prev_end"))
        <= 30L * 60 * 1000000L)
    assert(gaps.count() == 0)
    sess.unpersist()
  }

  test("ts_rolling: every frame contains its own row; brute-force check on one user") {
    val roll = TimeSeries.queries("ts_rolling")(spark, sf).cache()
    assert(roll.filter(col("n_1h") < 1).count() == 0)
    // brute force the trailing-hour count for the busiest user
    val uid = roll.groupBy("user_id").count().orderBy(col("count").desc)
      .collect()(0).getAs[Long]("user_id")
    val rows = Tables.events(spark, sf).filter(col("user_id") === uid)
      .select(col("event_id"), unix_micros(col("ts")).as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = rows.map { case (id, t) =>
      id -> rows.count { case (_, t2) => t2 <= t && t2 >= t - 3600L * 1000000L }.toLong
    }.toMap
    val got = roll.filter(col("user_id") === uid).select("event_id", "n_1h").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    roll.unpersist()
  }

  test("ts_resample: hour grid is gapless per user and fill leaves no nulls") {
    val rs = TimeSeries.queries("ts_resample")(spark, sf).cache()
    assert(rs.filter(col("filled_avg").isNull).count() == 0)
    // contiguous grid: row count per user == (max hour - min hour)/1h + 1
    val spans = rs.groupBy("user_id").agg(
      count(lit(1)).as("rows"),
      ((unix_micros(max(col("hour"))) - unix_micros(min(col("hour"))))
        / (3600L * 1000000L) + 1L).as("expect"))
    assert(spans.filter(col("rows") =!= col("expect")).count() == 0)
    // gap hours carry 0 events but a carried-forward average
    assert(rs.filter(col("n_events") === 0).count() > 0)
    rs.unpersist()
  }

  test("resample grid cap: a pathological-gap key emits only the last maxCells hours, accounting audits it") {
    import spark.implicits._
    // key "sparse": two observations three years apart — uncapped this
    // is a ~26k-row grid from 3 events; key "dense": a normal short key
    val rows = Seq(
      ("sparse", "2020-01-01 00:30:00", 1.0),
      ("sparse", "2023-01-01 10:30:00", 5.0),
      ("dense", "2023-01-01 08:15:00", 2.0),
      ("dense", "2023-01-01 10:45:00", 4.0))
      .toDF("k", "tss", "value")
      .select(col("k"), col("tss").cast("timestamp").as("ts"), col("value"))
    val out = Graft.timeseries.resampleHourly(rows, "k", "ts", "value", maxCells = 5)
      .cache()
    // capped key: exactly 5 grid hours, ending at its last observed hour
    val sparse = out.filter(col("k") === "sparse").orderBy("hour").collect()
    assert(sparse.length == 5, s"expected 5 capped rows, got ${sparse.length}")
    assert(sparse.last.getAs[java.sql.Timestamp]("hour").toString.startsWith("2023-01-01 10"))
    // leading truncated hours are UNKNOWN (null), not a 2020 carry-over;
    // the hour with the surviving observation fills normally
    assert(sparse.init.forall(_.isNullAt(3)))
    assert(sparse.last.getDouble(3) == 5.0)
    // uncapped key unaffected: 3 contiguous hours, no nulls
    val dense = out.filter(col("k") === "dense").collect()
    assert(dense.length == 3 && dense.forall(!_.isNullAt(3)))
    out.unpersist()
    val stats = Graft.timeseries.resampleStats(rows, "k", "ts", maxCells = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(stats("sparse")._3 && stats("sparse")._2 == 5L)
    assert(!stats("dense")._3 && stats("dense") == ((3L, 3L, false)))
  }

  test("interpolateHourly: observed hours exact, gap hours linear, truncated leading hours null") {
    import spark.implicits._
    // one key with a 4-hour interior gap: 10:00 avg 2.0, 14:00 avg 10.0
    // → 11:00/12:00/13:00 must read 4.0/6.0/8.0 (pure linearity)
    val rows = Seq(
      ("k1", "2023-01-01 10:10:00", 1.0), ("k1", "2023-01-01 10:50:00", 3.0),
      ("k1", "2023-01-01 14:30:00", 10.0),
      ("sparse", "2020-01-01 00:30:00", 1.0), ("sparse", "2023-01-01 10:30:00", 5.0))
      .toDF("k", "tss", "value")
      .select(col("k"), col("tss").cast("timestamp").as("ts"), col("value"))
    val out = Graft.timeseries.interpolateHourly(rows, "k", "ts", "value", maxCells = 5)
      .cache()
    val k1 = out.filter(col("k") === "k1").orderBy("hour").collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour").toString.take(13) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(k1("2023-01-01 10") == 2.0 && k1("2023-01-01 14") == 10.0,
      s"observed hours must keep their own mean: $k1")
    assert(k1("2023-01-01 11") == 4.0 && k1("2023-01-01 12") == 6.0
      && k1("2023-01-01 13") == 8.0, s"gap hours must be linear: $k1")
    // cap-truncated key: leading grid hours (no surviving observation
    // before them) stay null; the surviving observed hour is exact
    val sp = out.filter(col("k") === "sparse").orderBy("hour").collect()
    assert(sp.length == 5 && sp.init.forall(_.isNullAt(3)) && sp.last.getDouble(3) == 5.0)
    out.unpersist()
  }

  test("ts_funnel: stage timestamps strictly ordered, stage label consistent") {
    val f = operators.TimeSeries.queries("ts_funnel")(spark, sf).cache()
    // one row per user who ever viewed
    assert(f.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    // strict ordering wherever later stages exist
    assert(f.filter(col("t_click").isNotNull && col("t_click") <= col("t_view")).count() == 0)
    assert(f.filter(col("t_purchase").isNotNull && col("t_purchase") <= col("t_click")).count() == 0)
    // stage label agrees with null pattern, and all three stages occur
    assert(f.filter(col("stage") === "purchased" && col("t_purchase").isNull).count() == 0)
    assert(f.filter(col("stage") === "clicked" &&
      (col("t_click").isNull || col("t_purchase").isNotNull)).count() == 0)
    // label domain (the dense sf0.001 fixture converts every viewer,
    // so not all three labels need appear)
    assert(f.filter(!col("stage").isin("viewed", "clicked", "purchased")).count() == 0)
    assert(f.filter(col("stage") === "purchased").count() > 0)
    f.unpersist()
  }

  test("g_pagerank: one rank per page, every rank >= the base 0.15") {
    val pr = Graph.queries("g_pagerank")(spark, sf).cache()
    assert(pr.count() == Tables.documents(spark, sf).count())
    assert(pr.filter(col("pagerank") < 0.15).count() == 0)
    // pages nothing links to sit exactly at the base rank
    assert(pr.filter(col("pagerank") === 0.15).count() > 0)
    pr.unpersist()
  }

  test("g_ppr frontier law: chain decays monotonically from the seed; unreachable pages score exactly 0") {
    import spark.implicits._
    // chain 0 -> 1 -> 2 -> 3, a side page 4 the seed also links to,
    // and 8 -> 9 in a component unreachable from the seed
    val links = Seq((0L, 1L), (0L, 4L), (1L, 2L), (2L, 3L), (8L, 9L))
      .toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L).toDF("node")
      .withColumn("seed", when(col("node") === 0L, 1.0).otherwise(0.0))
    // enough rounds to pass the transient pulse: near-stationary scores
    val pr = Graft.graphs.personalizedPageRank(links, nodes, iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // frontier ordering: one hop from the seed outranks two, two
    // outrank three — the crawl scheduler's priority signal
    assert(pr(1L) > pr(2L) && pr(2L) > pr(3L) && pr(3L) > 0.0, s"$pr")
    // seed's two children split its mass equally
    assert(pr(1L) == pr(4L), s"$pr")
    // teleport mass never reaches the other component: EXACT zeros
    // (uniform PageRank gives every page >= 0.15 — this is the
    // difference that makes PPR a frontier prioritizer)
    assert(pr(8L) == 0.0 && pr(9L) == 0.0, s"$pr")
  }

  test("g_ppr oracle query: seed page present, scores nonnegative, unlinked pages zero") {
    val pr = Graph.queries("g_ppr")(spark, sf).cache()
    assert(pr.count() == Tables.documents(spark, sf).count())
    assert(pr.filter(col("ppr") < 0.0).count() == 0)
    // unlike g_pagerank's uniform 0.15 floor, most pages sit at 0
    assert(pr.filter(col("ppr") === 0.0).count() > 0)
    assert(pr.filter(col("page_id") === 0L && col("ppr") >= 0.15).count() == 1)
    pr.unpersist()
  }

  test("ts_retention: week-0 cell retains the whole cohort; retained never exceeds cohort size") {
    val out = operators.TimeSeries.queries("ts_retention")(spark, sf)
    // every user is active in their own first week
    assert(out.filter(col("week_k") === 0 && col("retained") =!= col("cohort_users")).count() == 0)
    assert(out.filter(col("retained") > col("cohort_users") || col("retained") < 1).count() == 0)
    assert(out.filter(col("week_k") < 0).count() == 0)
    // cohort sizes sum to the distinct-user count
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.filter(col("week_k") === 0)
      .agg(sum("cohort_users")).collect()(0).getLong(0) == users)
  }

}
