package graft.tools
import org.apache.spark.sql.SparkSession

/** Per-node `numOutputRows` dump of a query's AQE-final executed plan —
  * the quickest way to see which join/aggregate actually carries the
  * rows (used to prove the r12 simhash regression was mechanical: the
  * candidate counts were identical in the fast and slow plans).
  * Usage: runMain graft.tools.MetricsProbe <query> [sfDir] */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.01"))
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, d); return
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, d); return
        case _ =>
      }
      val rows = p.metrics.get("numOutputRows")
        .map(_.value.toString).getOrElse("-")
      println(("  " * d) + p.nodeName + " rows=" + rows)
      p.children.foreach(walk(_, d + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
