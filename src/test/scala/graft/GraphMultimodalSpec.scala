package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Multimodal}

class GraphMultimodalSpec extends SparkSpec {

  test("g_degrees: total in-degree equals edge count; region roots have in-degree 0") {
    val e = Graph.edges(spark, sf)
    val deg = Graph.queries("g_degrees")(spark, sf)
    assert(deg.agg(sum("in_degree")).collect()(0).getLong(0) == e.count())
    assert(deg.filter(col("node").startsWith("R") && col("in_degree") =!= 0).count() == 0)
  }

  test("g_bfs: depths are layered (region=0, nation=1, leaves=2)") {
    val bfs = Graph.queries("g_bfs")(spark, sf)
    assert(bfs.filter(col("node") === "R0").collect()(0).getAs[Long]("depth") == 0)
    assert(bfs.filter(col("node").startsWith("N") && col("depth") =!= 1).count() == 0)
    assert(bfs.filter((col("node").startsWith("C") || col("node").startsWith("S"))
      && col("depth") =!= 2).count() == 0)
  }

  test("g_cc_labelprop: one label per component root region") {
    val labels = Graph.queries("g_cc_labelprop")(spark, sf)
    // every node in R0's component carries the same label after convergence
    val bfsNodes = Graph.queries("g_bfs")(spark, sf).select("node")
    val comp = labels.join(bfsNodes, "node").select("label").distinct()
    assert(comp.count() == 1)
  }

  test("decodePartitions: per-partition stub decode produces sane features") {
    val out = Multimodal.decodePartitions(Multimodal.mediaRecords(spark, sf))
    val df = out.toDF()
    assert(df.count() == Tables.documents(spark, sf).count())
    // ASCII payloads: mean byte in (0, 127]; frames consistent with size
    assert(df.filter(col("mean_byte") <= 0 || col("mean_byte") > 127).count() == 0)
    assert(df.filter(col("frames") =!= ((col("n_bytes") + 63) / 64).cast("int")).count() == 0)
  }

  test("m_frame_sample only emits every 4th frame") {
    val df = Multimodal.queries("m_frame_sample")(spark, sf)
    assert(df.filter(col("frame_idx") % 4 =!= 0).count() == 0)
    assert(df.count() > 0)
  }
}
