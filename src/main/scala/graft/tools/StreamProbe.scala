package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe: where the streaming trio's time goes at sf0.1, and
  * how it responds to the state/shuffle partition count. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // Warm the streaming machinery once.
    time("warm tumbling")(graft.streaming.StreamDemo.tumblingStream(spark, sf).count())
    for (parts <- Seq(32, 8, 4); rep <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      time(s"parts=$parts rep=$rep session")(
        graft.streaming.StreamDemo.sessionStream(spark, sf).count())
      time(s"parts=$parts rep=$rep append")(
        graft.streaming.StreamDemo.appendStream(spark, sf).count())
      time(s"parts=$parts rep=$rep tumbling")(
        graft.streaming.StreamDemo.tumblingStream(spark, sf).count())
    }
    spark.stop()
  }
}
