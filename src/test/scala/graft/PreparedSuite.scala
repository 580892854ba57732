package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Contract of the prepared-statement surface (api/Prepared): pure
  * builders memoize per (session, sf, query); side-effecting builders
  * never do; and — the honesty invariant the bench rests on — an
  * action on the memoized DataFrame still RUNS the query (fresh
  * QueryExecution, fresh shuffle ids), it only skips builder+analysis.
  */
class PreparedSuite extends SparkTestBase {

  test("pure queries return the same DataFrame object on repeat calls") {
    val a = api.Prepared.df(spark, sf, "agg_q1_pricing")
    val b = api.Prepared.df(spark, sf, "agg_q1_pricing")
    assert(a eq b, "prepared lookup rebuilt a pure query")
    // distinct sf → distinct prepared plan
    val c = api.Prepared.df(spark, sf01, "agg_q1_pricing")
    assert(!(a eq c), "prepared cache conflated scale factors")
  }

  test("side-effecting builders are never memoized") {
    // scan_csv_roundtrip writes a fresh scratch copy per call — the
    // write IS the query; memoizing it would time a no-op.
    val a = api.Prepared.df(spark, sf, "scan_csv_roundtrip")
    val b = api.Prepared.df(spark, sf, "scan_csv_roundtrip")
    assert(!(a eq b), "side-effecting builder was memoized")
    assert(api.Prepared.sideEffecting("ev_tumbling_stream") &&
      api.Prepared.sideEffecting("scan_compact"),
      "exclusion set lost a side-effecting query")
    assert(api.Prepared.sideEffecting.forall(SparkEntry.queries.contains),
      "exclusion set names a query that no longer exists")
  }

  test("memoized re-count matches a fresh build and actually runs jobs") {
    val name = "join_5way_q5"
    val fresh = SparkEntry.queries(name)(spark, sf).count()
    val memo = api.Prepared.df(spark, sf, name)
    memo.count() // first action on the memoized object
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val again = memo.count()
      Thread.sleep(500) // listener bus drain (no public waitUntilEmpty)
      assert(again == fresh, "memoized result diverged from fresh build")
      // The anti-pattern this guards: re-using a cached QueryExecution
      // would let the scheduler skip completed shuffle map stages and
      // "time" only the result stage. A fresh count() on the memoized
      // Dataset must schedule real tasks every call.
      assert(tasks.get() > 0,
        "re-count on the memoized DataFrame scheduled zero tasks — " +
          "the timed path is no longer executing the query")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
