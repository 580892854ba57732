package graft.tools
import org.apache.spark.sql.SparkSession

/** Prices AQE's partition-coalescing floor on the six shapes that sit
  * above 2x of the DuckDB baseline (ProfileSplit r12: exec wall ~=
  * summed task CPU, i.e. near-serial). At sf0.1 the post-shuffle data
  * is a few MB, so `spark.sql.adaptive.coalescePartitions.
  * minPartitionSize` (default 1m) coalesces every exchange to <=6
  * partitions and 32 cores idle; the floor is a RUNTIME conf, so one
  * session can sweep it. At production partition sizes (total/cores >>
  * 1m) the floor never binds - lowering it only affects small
  * interactive queries. min-of-3 warm, Bench's session shape.
  *
  * Usage: runMain graft.tools.CoalesceFloorProbe <sfDir> [floor ...]
  */
object CoalesceFloorProbe {
  private val Shapes = Seq("join_5way_q5", "topk_limit", "fn_json",
    "ev_session", "ev_tumbling", "llm_exact_dedup")
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val floors = if (args.length > 1) args.drop(1).toSeq
                 else Seq("1m", "256kb", "64kb", "16kb")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    for (floor <- floors) {
      spark.conf.set(key, floor)
      for (name <- Shapes) {
        val fn = graft.SparkEntry.queries(name)
        fn(spark, sfDir).count() // warm this (query, floor) pair
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"FLOOR $floor%-6s $name%-16s $best%.3f s")
      }
    }
    spark.stop()
  }
}
