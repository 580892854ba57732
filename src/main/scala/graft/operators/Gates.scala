package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Measured-row-count broadcast gates, shared by every query that
  * hints a broadcast of a side whose size SCALES with the corpus
  * (q3's filtered orders⨝customer dim, q5's orders⨝customer dim and
  * supplier, PageRank's rank vector via its own footer-count
  * specialization in [[Graph]]).
  *
  * Two disciplines, both learned the hard way:
  *
  *  - An UNCONDITIONAL `broadcast()` hint on an SF-scaling side is a
  *    driver-OOM cliff: the hint overrides Catalyst's size check, so
  *    at some SF the driver dies trying to collect the build side.
  *    The hint must be applied only below a measured row cap; past it
  *    the query degrades to the shuffle join AQE would pick (measured
  *    in ScaleProbe at ×100 orders: same scaling exponent, flat ~2.3×
  *    constant — degradation, not a cliff).
  *
  *  - The gate's row count must never be a per-query-construction
  *    aggregation job (the r7 PageRank lesson: an eager `count()` at
  *    DataFrame-build time re-paid roughly one iteration's cost on
  *    every invocation). Counts are memoized per (session, sf, tag).
  */
object Gates {

  /** Broadcast an SF-scaling side only below this row count: 10 M
    * rows of a pruned 2-column frame (~16 bytes each) is ~160 MB —
    * inside executor memory and far under the 8 GB broadcast hard
    * cap. Shared by every gated hint so the whole library degrades at
    * one documented size. */
  private[graft] val BroadcastRowCap = 10000000L

  /** Row counts feeding the gate decisions, computed ONCE per
    * (session, sf, tag) and memoized. */
  private val rowCountCache =
    new graft.FitOnce[(String, String, String), Long]

  private[graft] def cachedCount(spark: SparkSession, sf: String,
      tag: String)(df: => DataFrame): Long =
    rowCountCache((spark.sparkContext.applicationId, sf, tag))(df.count())

  /** Apply the broadcast hint only below a measured row cap. */
  private[graft] def gatedBroadcast(spark: SparkSession, sf: String,
      tag: String, cap: Long)(df: DataFrame): DataFrame =
    if (cachedCount(spark, sf, tag)(df) <= cap) broadcast(df) else df
}
