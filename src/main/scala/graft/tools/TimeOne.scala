package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // A/B knobs (probe-only): shuffle scratch tier + writer choice.
    val b0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b1 = b0.config("spark.local.dir",
      sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
        graft.Tables.scratchDir("graft_shuffle_").toString))
    val b2 = sys.env.get("SPARK_GRAFT_BYPASS_THRESH")
      .fold(b1)(v => b1.config("spark.shuffle.sort.bypassMergeThreshold", v))
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count()
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $name ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
