package graft.tools
import org.apache.spark.sql.SparkSession

/** Reproduces the in-sweep slowdown of a target query (r10 verdict:
  * graph_pagerank reads 2.4–2.8 s inside full sweeps vs 1.3–1.6 s
  * isolated, steal-quiet both ways). Protocol: warm+time the target,
  * run every OTHER query once (the accumulated-state debt of a full
  * sweep — evicted codegen cache entries, broadcast blocks, shuffle
  * registrations, GC pressure), then re-time the target. A large
  * after/before ratio pins the interference on sweep-accumulated
  * state rather than concurrent load.
  */
object InterferenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val target = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // Test knob: GRAFT_CODEGEN_CACHE sizes the generated-class cache
      // (static conf, default 100) to hold a full 167-query sweep.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("GRAFT_CODEGEN_CACHE", "100"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(target)
    def time(n: Int): Seq[Double] = (1 to n).map { _ =>
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    fn(spark, sfDir).count()
    val before = time(3)
    println(f"BEFORE $target ${before.map(t => f"$t%.3f").mkString(" ")}")
    for ((name, q) <- graft.SparkEntry.queries.toSeq if name != target)
      try q(spark, sfDir).count() catch { case _: Throwable => () }
    val after = time(3)
    println(f"AFTER  $target ${after.map(t => f"$t%.3f").mkString(" ")}")
    spark.stop()
  }
}
