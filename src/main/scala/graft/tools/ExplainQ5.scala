package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val df = graft.SparkEntry.queries(args(1))(spark, dir)
    df.count()
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
