package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Does memoizing the BUILT DataFrame (the prepared-statement shape)
  * actually remove the per-invocation fixed cost ProfileSplit measured
  * — and does the memoized re-count still run the full job (no shuffle
  * -stage reuse silently skipping the work)? For each shape, min-of-5:
  * FRESH = `queries(name)(spark, sf).count()` (today's bench path,
  * pays builder + eager per-Dataset analysis + optimize + plan);
  * MEMO = `.count()` on a once-built df (fresh QueryExecution each
  * call → fresh RDDs/shuffle ids, so execution is genuinely re-run —
  * the task counter proves it). Session config mirrors Bench. */
object PreparedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "join_5way_q5", "topk_limit", "fn_json", "ev_session",
      "ev_tumbling", "llm_exact_dedup", "agg_q1_pricing",
      "win_rank_dense", "llm_knn_cosine")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    object L extends SparkListener {
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
      def reset(): Unit = tasks.set(0)
    }
    spark.sparkContext.addSparkListener(L)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count().collect()

    println(f"${"query"}%-18s ${"fresh_s"}%8s ${"memo_s"}%8s ${"saved"}%7s ${"tasks_f"}%8s ${"tasks_m"}%8s")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"$name warm failed: $e") }
      val memo = fn(spark, sfDir)
      memo.count() // warm the memoized path too
      var tasksF = 0; var tasksM = 0
      def run(body: => Unit): (Double, Int) = {
        Thread.sleep(100); L.reset()
        val t0 = System.nanoTime(); body
        val el = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // listener bus drain
        (el, L.tasks.get)
      }
      val fresh = (1 to 5).map { _ =>
        val (t, k) = run(fn(spark, sfDir).count()); tasksF = k; t }
      val memod = (1 to 5).map { _ =>
        val (t, k) = run(memo.count()); tasksM = k; t }
      println(f"$name%-18s ${fresh.min}%8.3f ${memod.min}%8.3f ${(fresh.min - memod.min) / fresh.min * 100}%6.1f%% $tasksF%8d $tasksM%8d")
    }
    spark.stop()
  }
}
