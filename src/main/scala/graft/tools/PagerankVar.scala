package graft.tools
import org.apache.spark.sql.SparkSession

/** Variance probe for the r18-verdict-#5 question: is a query that
  * draws slow in a ZERO-steal bench window hiding a real variance bug
  * (GC, codegen churn) behind the steal attribution? Runs one query
  * N times in one bench-config JVM and prints per-run wall time next
  * to the same run's GC-time delta and whole-VM steal delta, so a
  * slow draw can be charged to a cause instead of a correlation.
  * Usage: runMain graft.tools.PagerankVar [dir] [query] [n]
  */
object PagerankVar {
  def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }
  def steal(): Long = {
    val s = scala.io.Source.fromFile("/proc/stat")
    try s.getLines().next().trim.split("\\s+")(8).toLong finally s.close()
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.drop(1).headOption.getOrElse("graph_pagerank")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries.getOrElse(name, sys.error(
      s"unknown query '$name'; known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    for (i <- 1 to n) {
      val g0 = gcMillis(); val s0 = steal(); val t0 = System.nanoTime()
      q(spark, dir).count(): Unit
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"run $i%2d: $dt%.3f s  gc +${gcMillis() - g0}%d ms  steal +${steal() - s0}%d")
    }
    spark.stop()
  }
}
