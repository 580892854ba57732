package graft

/** Spill-correctness: at 100 TB, operator buffers routinely exceed
  * memory and spill to disk — results must be IDENTICAL either way.
  * Spark exposes per-operator force-spill thresholds (rows buffered
  * before spilling: window frames, sort-merge-join right groups,
  * session-window merges, cartesian blocks); this suite re-runs
  * buffer-heavy queries with those thresholds dropped to a handful of
  * rows, so every window partition / join group actually takes the
  * spill path, and asserts bit-identical results against the
  * default-config run. The thresholds are runtime SQLConfs on the
  * shared session; always restored in finally.
  */
class SpillSuite extends SparkTestBase {

  // each buffer has TWO knobs: rows kept in a plain in-memory array
  // (in.memory.threshold, default 4096) and rows in the spillable
  // sorter before a forced spill (spill.threshold). Without lowering
  // the first, small test groups never reach the spillable path at
  // all and the suite is vacuous.
  private val thresholds = Seq(
    "spark.sql.windowExec.buffer.in.memory.threshold",
    "spark.sql.windowExec.buffer.spill.threshold",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold",
    "spark.sql.sessionWindow.buffer.in.memory.threshold",
    "spark.sql.sessionWindow.buffer.spill.threshold",
    "spark.sql.cartesianProductExec.buffer.in.memory.threshold",
    "spark.sql.cartesianProductExec.buffer.spill.threshold")

  private def withForcedSpills[A](f: => A): A = {
    val prior = thresholds.map(k => k -> spark.conf.getOption(k))
    // disable broadcasts too, so joins actually take the SMJ path
    // whose buffers the thresholds govern
    val bc = "spark.sql.autoBroadcastJoinThreshold"
    val priorBc = spark.conf.getOption(bc)
    try {
      thresholds.foreach(k => spark.conf.set(k, "16"))
      spark.conf.set(bc, "-1")
      f
    } finally {
      prior.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      priorBc.fold(spark.conf.unset(bc))(spark.conf.set(bc, _))
    }
  }

  // buffer-heavy shapes: window frames (running/topk), session-window
  // merge, sort-merge joins, window-based dedup, the simhash SMJ
  // self-join, and the cartesian demo
  private val names = Seq("win_running_frame", "win_topk_per_group",
    "win_ewma", "ev_session", "ev_dedup", "join_inner_2way",
    "join_asof", "llm_simhash_neardup", "join_cross", "agg_collect")

  test("forced operator spills leave every result bit-identical") {
    for (n <- names) {
      val default = SparkEntry.queries(n)(spark, sf).collect()
        .map(_.toString).toSeq
      val spilled = withForcedSpills {
        SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
      }
      assert(spilled == default,
        s"$n diverged under forced spills (" +
          s"${default.length} vs ${spilled.length} rows)")
      assert(default.nonEmpty, s"$n returned no rows — vacuous check")
    }
  }

  test("the forced-spill config actually exercises spilling machinery") {
    // guard against the thresholds becoming no-ops in a Spark upgrade
    // corpus queries at sf0.001 have small per-key groups that can sit
    // under even the lowered threshold, so probe with a synthetic
    // 3-key/1000-row frame whose groups MUST overflow it, and read the
    // Window node's own spillSize SQL metric
    val spillSize = withForcedSpills {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.{Window => W}
      val df = spark.range(1000)
        .select((col("id") % 3).as("k"), col("id"))
        .withColumn("s", sum("id").over(W.partitionBy("k").orderBy("id")
          .rowsBetween(W.unboundedPreceding, 0)))
      df.collect()
      def findSpill(p: org.apache.spark.sql.execution.SparkPlan): Long = {
        val own = p.metrics.get("spillSize").map(_.value).getOrElse(0L)
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            findSpill(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            findSpill(q.plan)
          case _ => p.children.map(findSpill).sum
        }
        own + kids
      }
      findSpill(df.queryExecution.executedPlan)
    }
    assert(spillSize > 0,
      "16-row thresholds must actually spill; if this fails the conf " +
        "names rotted and the suite is vacuous")
  }
}
