package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Local profiling aid: warm-then-timed loop over the named queries
  * (args after sfDir), N repeats, optional physical plan dump with
  * SPARK_GRAFT_EXPLAIN=1. Mirrors Bench's session config exactly. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"$name warm failed: $e") }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
