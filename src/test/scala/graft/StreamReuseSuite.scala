package graft

/** Checkpoint-reuse idempotence (r11). Each file-sink streaming query
  * keeps ONE durable scratch root (checkpoint + sink) per (session,
  * sf): the first invocation streams the whole backlog; every later
  * invocation restarts from the committed checkpoint, processes zero
  * new files, and must read back EXACTLY the same rows — the restart
  * semantics of a production AvailableNow job. A bug here (offsets
  * lost, sink double-append past the `_spark_metadata` log, the
  * upsert generation counter resetting) shows up as row drift between
  * the two invocations.
  */
class StreamReuseSuite extends SparkTestBase {

  private val reused = Seq("ev_append_stream", "ev_session_stream",
    "ev_custom_session_stream", "ev_join_stream", "ev_dedup_stream",
    "ev_enrich_stream", "ev_upsert_stream",
    // r13: the tumbling query moved off the memory sink onto a
    // foreachBatch parquet overwrite and joined this family — a
    // zero-data restart must serve the first run's overwrite, and a
    // replayed batch must leave the overwrite unchanged.
    "ev_tumbling_stream")

  test("file-sink streaming queries are idempotent across invocations of a reused checkpoint") {
    reused.foreach { name =>
      val fn = SparkEntry.queries(name)
      val first = fn(spark, sf).collect()
      val second = fn(spark, sf).collect()
      assert(first.length == second.length && first.length > 0,
        s"$name: row count drifted across invocations " +
          s"(${first.length} -> ${second.length})")
      assert(first.sameElements(second),
        s"$name: rows drifted across invocations of the reused checkpoint")
    }
  }

  /** The upsert state write is not atomic with the checkpoint commit:
    * a crash mid-write leaves a torn state{g+1} with no _SUCCESS
    * marker. Resume must skip it (adopting it as the merge base would
    * corrupt every later generation) and keep returning the committed
    * state. This plants exactly that wreckage and re-invokes. */
  test("upsert resume skips a torn (uncommitted) state generation") {
    val fn = SparkEntry.queries("ev_upsert_stream")
    val first = fn(spark, sf).collect()
    val root = streaming.StreamDemo.streamRoot(spark, sf, "ev_upsert")
    val gens = root.toFile.listFiles()
      .filter(_.getName.startsWith("state"))
      .map(_.getName.stripPrefix("state").toInt)
    assert(gens.nonEmpty, "upsert left no state generation on disk")
    val torn = root.resolve(s"state${gens.max + 1}")
    java.nio.file.Files.createDirectories(torn)
    // Garbage part file, deliberately NO _SUCCESS — a mid-write crash.
    java.nio.file.Files.write(torn.resolve("part-00000.parquet"),
      Array[Byte](0x50, 0x41, 0x52, 0x31))
    try {
      val second = fn(spark, sf).collect()
      assert(first.length == second.length && first.sameElements(second),
        "torn state generation was adopted as the resume base")
    } finally {
      java.nio.file.Files.deleteIfExists(torn.resolve("part-00000.parquet"))
      java.nio.file.Files.deleteIfExists(torn)
      ()
    }
  }
}
