package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Flags queries whose AQE-final executed plan scans the SAME parquet
  * file more than once — the duplicated-lineage pattern fixed in
  * llm_pmi_bigrams (r6), llm_tfidf and llm_simhash_neardup (r12).
  * Multi-TABLE scans are normal; multi-scan of one file means a shared
  * frame forked below an exchange. Streaming queries are skipped (no
  * batch executedPlan). Usage: runMain graft.tools.MultiScanSweep [sfDir] */
object MultiScanSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.collect()
        val files = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
          p match {
            case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => return
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan); return
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan); return
            case s: FileSourceScanExec =>
              // key on the full root-path set: a basename conflates
              // distinct tables whose directories share a final
              // component and ignores extra roots
              val loc = s.relation.location.rootPaths.map(_.toString)
                .sorted.mkString(",")
              files(loc) += 1
            case _ =>
          }
          p.children.foreach(walk)
        }
        walk(df.queryExecution.executedPlan)
        val dups = files.filter(_._2 > 1)
        if (dups.nonEmpty)
          println(s"MULTISCAN $name ${dups.map { case (f, n) => s"$f:$n" }.mkString(" ")}")
      } catch { case e: Exception => println(s"SKIP $name ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
