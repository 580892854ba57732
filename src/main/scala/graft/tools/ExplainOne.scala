package graft.tools
import org.apache.spark.sql.SparkSession

/** Print the EXECUTED plan of any declared query on any corpus dir —
  * the post-AQE tree, after one real run, which is what actually
  * priced the ×100 crossover findings (the analyzed plan hides
  * AQE's join/partition decisions).
  * Usage: runMain graft.tools.ExplainOne <dir> <query> [query ...] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.count()
      println(s"==== $name @ $dir")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
