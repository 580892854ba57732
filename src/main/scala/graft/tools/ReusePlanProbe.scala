package graft.tools
import org.apache.spark.sql.SparkSession
object ReusePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.01"))
    df.collect()
    // AQE final plan: walk and count distinct scans that actually ran vs reused
    val ep = df.queryExecution.executedPlan
    var scans = 0; var reused = 0; var gens = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => reused += 1; return
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan); return
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan); return
        case _: org.apache.spark.sql.execution.FileSourceScanExec => scans += 1
        case _: org.apache.spark.sql.execution.GenerateExec => gens += 1
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(ep)
    println(s"LIVE_SCANS=$scans REUSED=$reused GENERATES=$gens")
    spark.stop()
  }
}
