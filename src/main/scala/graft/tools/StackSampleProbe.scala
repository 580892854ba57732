package graft.tools
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** In-JVM poor-man's profiler: samples executor-worker stacks every
  * 20 ms while looping a query and prints the hottest 5-frame
  * signatures. External jstack cannot attach in this sandbox; this is
  * how the r12 simhash regression was attributed to shuffle-file
  * machinery (BypassMergeSortShuffleWriter open/mmap/unmap) rather
  * than candidate compute.
  * Usage: runMain graft.tools.StackSampleProbe <query> [sfDir] [iters] */
object StackSampleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(args(0))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(2).map(_.toInt).getOrElse(12)
    fn(spark, dir).count() // warm
    val counts = mutable.Map[String, Int]().withDefaultValue(0)
    @volatile var go = true
    val sampler = new Thread(() => {
      while (go) {
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("Executor task launch worker") &&
              st.nonEmpty) {
            val sig = st.take(5)
              .map(f => f.getClassName + "." + f.getMethodName)
              .mkString(" <- ")
            counts.synchronized { counts(sig) += 1 }
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true); sampler.start()
    (1 to iters).foreach(_ => fn(spark, dir).count())
    go = false; sampler.join(5000)
    counts.synchronized { counts.toSeq }.sortBy(-_._2).take(20)
      .foreach { case (sig, n) =>
      println(f"SAMPLE $n%5d  $sig")
    }
    spark.stop()
  }
}
