package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Where a sub-second query's wall time actually goes (r12): split
  * each named query into PLAN (analysis + optimization + physical
  * planning, timed by forcing `executedPlan`) and EXECUTE (wall time
  * of materializing that same plan via `toRdd.count()`), and set the
  * execute wall against the listener's summed task time. A query whose
  * summed task time is a few CPU-milliseconds while its wall is
  * hundreds of milliseconds is scheduling/fixed-cost-bound — no plan
  * change can close that gap, and the honest move is a NOTES row, not
  * an optimization. Session config mirrors Bench exactly. */
object ProfileSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "join_5way_q5", "topk_limit", "fn_json", "ev_session",
      "ev_tumbling", "llm_exact_dedup")
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
      val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        taskMs.addAndGet(e.taskInfo.duration); tasks.incrementAndGet(); ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        { jobs.incrementAndGet(); () }
      def reset(): Unit = { taskMs.set(0); tasks.set(0); stages.set(0); jobs.set(0) }
    }
    spark.sparkContext.addSparkListener(L)

    // Whole-session warmup (same shape as Bench's).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count().collect()

    println(f"${"query"}%-18s ${"plan_s"}%8s ${"exec_s"}%8s ${"task_cpu_s"}%11s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // Warm pass (codegen, JIT, broadcast build) — untimed.
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"$name warm failed: $e") }
      // min-of-3 on each component, interleaved like Bench.
      val planTs = Array.fill(3)(0.0); val execTs = Array.fill(3)(0.0)
      var best = (0L, 0, 0, 0) // taskMs, jobs, stages, tasks at best exec
      for (i <- 0 until 3) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan
        planTs(i) = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150); L.reset()
        val t1 = System.nanoTime()
        df.queryExecution.toRdd.count()
        execTs(i) = (System.nanoTime() - t1) / 1e9
        Thread.sleep(300) // let the listener bus drain
        if (i == 0 || execTs(i) == execTs.take(i + 1).min)
          best = (L.taskMs.get, L.jobs.get, L.stages.get, L.tasks.get)
      }
      println(f"$name%-18s ${planTs.min}%8.3f ${execTs.min}%8.3f ${best._1 / 1000.0}%11.3f ${best._2}%5d ${best._3}%7d ${best._4}%6d")
    }
    spark.stop()
  }
}
