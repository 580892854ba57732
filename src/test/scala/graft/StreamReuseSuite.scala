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
    "ev_enrich_stream", "ev_upsert_stream")

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
}
