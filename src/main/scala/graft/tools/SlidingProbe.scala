package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the r14-verdict question: does the integer-µs discipline
  * that bought 35% on ev_tumbling also pay on the 4-window sliding
  * explode? Arm A is the shipped `window(ts2, '1 hour', '15 minutes')`
  * struct path (Expand → hash-agg on a struct-of-timestamps key); arm
  * B keeps the hot loop in primitive longs — explode k∈0..3 over
  * `slideFloor(ts_us) − k·slide` (window length = exactly 4 slides, so
  * every event is in exactly 4 windows) and aggregates on a LONG key,
  * converting to timestamp once per OUTPUT row. Both arms read the
  * same events table; equality of results is asserted before timing.
  *
  * Decision rule (the bypassMergeThreshold precedent): keep B only if
  * it wins at BOTH sf0.1 and ×10; otherwise record the rejection.
  */
object SlidingProbe {
  private val SlideUs = 900000000L // 15 min
  def armA(spark: SparkSession, sf: String): DataFrame =
    graft.Tables.events(spark, sf)
      .groupBy(window(col("ts2"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(graft.Tables.ntz(col("window.start")).as("w_start"), col("cnt"))
      .orderBy("w_start")

  def armB(spark: SparkSession, sf: String): DataFrame =
    graft.Tables.events(spark, sf)
      .select(expr(s"(ts div 1000) div $SlideUs * $SlideUs").as("slide_us"))
      .select(explode(sequence(lit(0), lit(3))).as("k"), col("slide_us"))
      .select((col("slide_us") - col("k") * lit(SlideUs)).as("w_us"))
      .groupBy("w_us").agg(count(lit(1)).as("cnt"))
      .select(graft.Tables.ntz(timestamp_micros(col("w_us"))).as("w_start"),
        col("cnt"))
      .orderBy("w_start")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val x10 = sys.env.getOrElse("SPARK_GRAFT_X_DIR", "target/crossover/x10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.local.dir", graft.Tables.scratchDir("graft_shuffle_").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq(base, x10)) {
      val a = armA(spark, dir); val b = armB(spark, dir)
      // equality gate before any timing
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      require(diff == 0, s"arms disagree on $dir: $diff rows")
      def time(df: DataFrame): Double = {
        df.count() // warm
        (1 to 5).map { _ =>
          val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
        }.min
      }
      // interleave to share any load burst
      val (ta, tb) = (time(a), time(b))
      val (ta2, tb2) = (time(a), time(b))
      println(f"$dir: armA=${math.min(ta, ta2)}%.3f s  armB=${math.min(tb, tb2)}%.3f s")
    }
    spark.stop()
  }
}
