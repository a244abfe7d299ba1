package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the optimized logical plan of EVERY driver collect a
  * query's BUILDER performs (quantizer seeds/rounds, probe plans,
  * manifest pruning) — the plans [[Explain]] can't show because they
  * execute during construction and never appear in the returned frame.
  * Usage: java ... graft.ExplainCollects <queryName> [sfDir] [outFile]
  */
object ExplainCollects {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    var i = 0
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "collect") {
          i += 1
          sb.append(s"== builder collect #$i (optimized logical plan) ==\n")
          sb.append(qe.optimizedPlan.toString).append("\n")
          sb.append(s"-- physical --\n").append(qe.executedPlan.toString).append("\n\n")
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    SparkEntry.queries(name)(spark, sfDir)
    // drain the async listener bus so every collect is recorded
    val bus = spark.sparkContext.getClass.getMethod("listenerBus")
      .invoke(spark.sparkContext)
    bus.getClass.getMethods
      .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
      .foreach(_.invoke(bus))
    spark.listenerManager.unregister(listener)
    outFile match {
      case Some(f) =>
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(f).toAbsolutePath.getParent)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(f), sb.toString)
        println(s"[explain-collects] wrote $f ($i collects)")
      case None => println(sb.toString)
    }
    spark.stop()
  }
}
