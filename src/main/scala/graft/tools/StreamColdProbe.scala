package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cold-checkpoint streaming throughput probe (r12). Checkpoint reuse
  * (r11) made the TIMED bench measure the AvailableNow RESTART path
  * for the eight file-sink streaming queries — full-backlog processing
  * is paid once in the untimed warm pass and never again. That is the
  * production restart shape, but it means a real backlog-throughput
  * regression would be invisible to the bench. This probe times
  * exactly the removed number: each query on a FRESH checkpoint
  * ([[graft.streaming.StreamDemo.rootEpoch]] bump) in a warm engine,
  * at sf0.1 and at events ×10 (disjoint per-replica key/time spaces,
  * the ScaleProbe discipline, so sessions/windows never straddle
  * replicas and output cardinality scales honestly). A restart sample
  * is timed alongside each cold pair for the contrast the bench
  * scores. Rows land in NOTES next to the restart history.
  */
object StreamColdProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // events ×10 (+ customer ×10 for the enrichment dim), same shift
    // scheme as ScaleProbe's ×100 corpus: ids/users/timestamps move to
    // disjoint per-replica spaces; customer keys move WITH user_id so
    // the stream-static join scales instead of going empty.
    val scaled = graft.Tables.scratchDir("graft_coldx10_").toString
    val reps = (0 until 10).toDF("rep")
    graft.Tables.events(spark, base).crossJoin(reps)
      .select((col("event_id") + col("rep") * 1000000000L).as("event_id"),
        (col("ts") + col("rep").cast("long") * 16000000000000000L).as("ts"),
        (col("user_id") + col("rep") * 10000000L).as("user_id"),
        col("event_type"), col("value"))
      .repartition(1).write.parquet(s"$scaled/events_dir")
    val part = new java.io.File(s"$scaled/events_dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$scaled/events.parquet"))
    graft.Tables.customer(spark, base).crossJoin(reps)
      .select((col("c_custkey") + col("rep") * 10000000L).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_mktsegment"))
      .write.parquet(s"$scaled/customer.parquet")

    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "ev_tumbling_stream" -> graft.streaming.StreamDemo.tumblingStream _,
      "ev_append_stream" -> graft.streaming.StreamDemo.appendStream _,
      "ev_session_stream" -> graft.streaming.StreamDemo.sessionStream _,
      "ev_custom_session_stream" ->
        (graft.streaming.StreamDemo.customSessionStream _),
      "ev_join_stream" -> graft.streaming.StreamDemo.joinStream _,
      "ev_dedup_stream" -> graft.streaming.StreamDemo.dedupStream _,
      "ev_enrich_stream" -> graft.streaming.StreamDemo.enrichStream _,
      "ev_upsert_stream" -> graft.streaming.StreamDemo.upsertStream _)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def cold(fn: (SparkSession, String) => DataFrame, d: String): Double = {
      graft.streaming.StreamDemo.rootEpoch.incrementAndGet()
      time(fn(spark, d).queryExecution.toRdd.count())
    }
    def restart(fn: (SparkSession, String) => DataFrame, d: String): Double =
      time(fn(spark, d).queryExecution.toRdd.count())

    // Warm the engine (JIT, codegen, microbatch planner, state store)
    // with one untimed cold pass over every query at sf0.1.
    for ((_, fn) <- queries) cold(fn, base)

    println(f"${"query"}%-26s ${"cold_sf0.1"}%12s ${"restart"}%10s ${"cold_x10"}%12s ${"restart_x10"}%12s")
    for ((name, fn) <- queries) {
      val c1 = math.min(cold(fn, base), cold(fn, base))
      val r1 = restart(fn, base)
      val c10 = math.min(cold(fn, scaled), cold(fn, scaled))
      val r10 = restart(fn, scaled)
      println(f"$name%-26s $c1%10.2f s $r1%8.2f s $c10%10.2f s $r10%10.2f s")
    }
    spark.stop()
  }
}
