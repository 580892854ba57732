package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage wall/task-time decomposition of one prepared-path run —
  * the stage-grain complement of MetricsProbe's row counts: which
  * STAGE of a query carries the seconds (r21: used to pin the sampled-
  * jaccard explode/aggregate stage and pagerank's per-iteration
  * floor). Session config mirrors Bench; the probe warms the query
  * (fresh build + one run), then times ONE more run with a stage
  * listener attached.
  * Usage: runMain graft.tools.StageTimeProbe <sfDir> <query> [query..]
  */
object StageTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
        graft.Tables.scratchDir("graft_shuffle_").toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      df.count() // warm (also fills fit-once scratch tables)
      df.count()
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val listener = new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val wall = (for {
            a <- i.completionTime; b <- i.submissionTime
          } yield (a - b) / 1000.0).getOrElse(-1.0)
          val exec = i.taskMetrics.executorRunTime / 1000.0
          stages.add(f"  stage ${i.stageId}%3d tasks=${i.numTasks}%3d " +
            f"wall=$wall%6.3f exec_cpu_sum=$exec%7.3f  ${i.name.take(90)}")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      df.count()
      val el = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      org.apache.spark.GraftSparkHooks.drainListenerBus(spark.sparkContext)
      println(f"STAGES $name total=$el%.3f s")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
