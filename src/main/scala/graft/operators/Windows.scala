package graft.operators

import graft.Tables
import graft.Tables.dec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.5): ranking, lag/lead, running
  * frames.
  *
  * Window evaluation shuffles once on the partition key and sorts
  * within partitions — the per-key state is bounded, so the same specs
  * run at fact-table scale. Every rank/ntile order key is made unique
  * with the primary key (D3) so results are engine-independent.
  */
object Windows {

  /** Top-3 orders per customer by price, ties broken by key (D3). */
  def winTopkPerGroup(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** The same per-customer top-3 answered through the CUSTOM
    * [[graft.plans.TopKPerKey]] operator (logical node + strategy +
    * heap exec): one streaming pass, no per-partition sort — the
    * whole-operator extension tier of the build rules. The oracle is
    * the identical window SQL as win_topk_per_group, holding the
    * custom exec to exact window semantics. */
  def winTopkNative(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.topKPerKey(
      Tables.orders(spark, sf)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
      .orderBy("o_custkey", "rn")

  /** rank / dense_rank (deterministic under ties) + ntile over a
    * unique order key. */
  def winRankDense(spark: SparkSession, sf: String): DataFrame = {
    val wTies = Window.partitionBy("p_brand").orderBy(asc("p_size"))
    val wUniq = Window.partitionBy("p_brand").orderBy(asc("p_size"), asc("p_partkey"))
    Tables.part(spark, sf)
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        rank().over(wTies).cast("long").as("rnk"),
        dense_rank().over(wTies).cast("long").as("drnk"),
        ntile(4).over(wUniq).cast("long").as("nt"))
      .orderBy("p_brand", "p_size", "p_partkey")
  }

  /** Inter-event gap per user via lag/lead — the building block of
    * sessionization. */
  def winLagLead(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts2"), asc("event_id"))
    // unix_micros() rejects NTZ input; the raw ns column gives the same
    // µs value via exact integer division.
    Tables.events(spark, sf)
      .withColumn("us", expr("ts div 1000"))
      .select(col("user_id"), col("event_id"), col("ts2"),
        lag("ts2", 1).over(w).as("prev_ts"),
        (col("us") - lag("us", 1).over(w)).as("gap_us"),
        lead("event_id", 1).over(w).as("next_id"))
      .orderBy("user_id", "ts2", "event_id")
  }

  /** Running sums with explicit ROWS and RANGE frames over exact
    * decimals — every prefix sum is exact, so cross-engine stable. */
  def winRunningFrame(spark: SparkSession, sf: String): DataFrame = {
    val rows = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val range = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(rows)
          .cast("double").as("run_sum"),
        sum(dec(col("o_totalprice"))).over(range)
          .cast("double").as("rng_sum"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** percent_rank / cume_dist over a UNIQUE order key: both are exact
    * small-integer ratios ((rank-1)/(n-1), peers/n) whose two-operand
    * double divisions are IEEE-identical across engines — safe doubles,
    * unlike accumulated float sums. */
  def winDistribution(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(asc("c_acctbal"), asc("c_custkey"))
    Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
  }

  /** ntile quartiles per segment over a UNIQUE order key (both engines
    * give earlier buckets the extra rows; Spark's int → long, D10). */
  def winNtile(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(asc("c_acctbal"), asc("c_custkey"))
    Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** first/last/nth value per customer order history — the navigation
    * trio with an EXPLICIT full-partition frame. last_value and
    * nth_value under the default frame (unbounded preceding → current
    * row) are the classic window footgun: they'd return the running
    * last/nth, not the partition's. The explicit frame is also the
    * performant shape — an unbounded frame is computed once per
    * partition, not per row. Order key made unique with the primary
    * key (D3); nth_value(2) is NULL for single-order customers. */
  def winFirstLast(spark: SparkSession, sf: String): DataFrame = {
    val full = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        first(col("o_orderdate")).over(full).as("first_dt"),
        last(col("o_orderdate")).over(full).as("last_dt"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    * user (streak detection — retention/engagement analysis, and the
    * canonical rn-difference window trick: day − row_number is
    * constant exactly within a consecutive run). One partitioned
    * window + one keyed aggregate; at scale both operate per user
    * key, so islands parallelize with user cardinality. */
  def winIslands(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.islands(
      Tables.events(spark, sf)
        .select(col("user_id"), to_date(col("ts2")).as("day")),
      "user_id", "day")

  /** RANGE-frame time window: per user, the rolling count/sum of
    * event value over the trailing hour AT EACH EVENT — the
    * continuous sliding aggregate (vs ev_sliding's discrete window
    * grid). RANGE over epoch seconds (ns div 10^9: integer, exact,
    * identical frame membership on both engines; RANGE includes
    * peers, so same-second events agree by construction). Value sums
    * in exact decimal (D2). One partitioned window — per-user
    * parallel, frame bounded by the hour horizon. */
  def winTimeRange(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("epoch_s")
      .rangeBetween(-3600L, 0L)
    Tables.events(spark, sf)
      .withColumn("epoch_s", expr("ts div 1000000000"))
      .select(col("event_id"), col("user_id"), col("epoch_s"),
        count(lit(1)).over(w).as("cnt_1h"),
        sum(Tables.dec(col("value"))).over(w).cast("double").as("sum_1h"))
      .orderBy("event_id")
  }

  /** Truncated exponentially-weighted moving average per user — the
    * online-smoothing shape of metric/telemetry pipelines. Dyadic
    * weights (128·v₀ + 64·v₋₁ + … + 1·v₋₇ over the trailing 8 events,
    * i.e. EWMA α=1/2 truncated where the weight underflows the cent)
    * keep the arithmetic INTEGER: value is exact cents (D2), so the
    * weighted sum in 1/128-cent units is a plain BIGINT on both
    * engines — no float accumulation order to disagree on. One
    * partitioned window with 7 bounded lags and a unique tiebreak
    * (D3) — per-user parallel at any scale, state is 8 rows/key.
    * Thin binding of [[graft.api.GraftOps.ewma]]. */
  def winEwma(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.ewma(
      Tables.events(spark, sf)
        .select(col("event_id"), col("user_id"), col("ts"),
          // floor(v+0.5) ≡ round for the exactly-2-dp corpus values —
          // avoids the per-row BigDecimal round (see Events.evTumbling).
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc")),
      "user_id", Seq("ts", "event_id"), "vc", depth = 8)
      .select(col("event_id"), col("user_id"), col("vc"),
        col("ewma").as("ewma_c128"))
      .orderBy("event_id")

  /** Orders-count gate for the RFM quartile plan, decided once per
    * (session, corpus) from a metadata-only parquet count (the same
    * cheap signal a planner reads). Below the cap the per-customer
    * aggregate is small enough that the exact global ntile sort is
    * the right plan; above it the same labels come from percentile
    * boundaries with no global sort. 2 M orders ≈ 200 k customers
    * (~5 MB of aggregate) — comfortably single-node; the scored SFs
    * (≤150 k orders) all sit below, so their results stay
    * bit-identical to the pre-gate plan. Enacted like the IVF k ∝ n
    * discipline: the at-scale behavior is IN the operator, not a
    * doc footnote. */
  private[graft] val RfmNtileMaxOrders = 2L * 1000 * 1000

  /** Accuracy of the above-cap tier's percentile sketch: boundary
    * displacement is bounded by 1/RfmPercentileAccuracy of the
    * quantile range — the documented "≤1/10,000" contract in README
    * §Design and the X100 gate's exclusion note. Suite-pinned. */
  private[graft] val RfmPercentileAccuracy = 10000
  private val rfmBigGate = new graft.FitOnce[(String, String), Boolean]

  /** RFM customer segmentation: recency (days since last order,
    * relative to the corpus max date), frequency (order count) and
    * monetary value (exact cents), each cut into global quartiles,
    * concatenated to the classic 3-digit segment label. The quartiles
    * run on the per-customer AGGREGATE frame — three orders of
    * magnitude smaller than the fact table. Below
    * [[RfmNtileMaxOrders]] they are exact ntile(4) with the custkey
    * tiebreak (D3) — a single-partition sort of a small frame. Above
    * it the global sort is gone: quartile boundaries come from ONE
    * `approx_percentile` row (a mergeable bounded-memory sketch —
    * exact `percentile`'s value-counts map would grow with m_cents'
    * distinct count), broadcast, and each customer is labeled by
    * comparison — ≤1/10 000-quantile boundary displacement, no
    * single-partition stage anywhere (the presentation orderBy is a
    * range-partitioned sort). Max date is a 1-row broadcast (no
    * driver round-trip). */
  def winRfmSegment(spark: SparkSession, sf: String): DataFrame = {
    val big = rfmBigGate((spark.sparkContext.applicationId, sf)) {
      Tables.orders(spark, sf).count() > RfmNtileMaxOrders
    }
    winRfmSegmentAt(spark, sf, big)
  }

  /** [[winRfmSegment]] with the plan tier pinned — so the suite can
    * exercise the above-cap percentile plan on the small corpus. */
  private[graft] def winRfmSegmentAt(spark: SparkSession, sf: String,
      big: Boolean): DataFrame = {
    val o = Tables.orders(spark, sf)
    val per = o.groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("f"),
        sum(expr("CAST(round(o_totalprice * 100) AS DECIMAL(18,0))"))
          .cast("long").as("m_cents"))
    val mx = o.agg(max(to_date(col("o_orderdate"))).as("mx"))
    val withR = per.crossJoin(broadcast(mx))
      .withColumn("r_days", datediff(col("mx"), col("last_day")).cast("long"))
    val labeled =
      if (!big)
        withR
          .withColumn("r_q", ntile(4).over(
            Window.orderBy(asc("r_days"), asc("o_custkey"))).cast("long"))
          .withColumn("f_q", ntile(4).over(
            Window.orderBy(desc("f"), asc("o_custkey"))).cast("long"))
          .withColumn("m_q", ntile(4).over(
            Window.orderBy(desc("m_cents"), asc("o_custkey"))).cast("long"))
      else {
        val qs = array(lit(0.25), lit(0.5), lit(0.75))
        val acc = lit(RfmPercentileAccuracy)
        val b = withR.agg(
          percentile_approx(col("r_days"), qs, acc).as("rb"),
          percentile_approx(col("f"), qs, acc).as("fb"),
          percentile_approx(col("m_cents"), qs, acc).as("mb"))
        // asc: quartile 1 = smallest (recency); desc: quartile 1 =
        // largest (frequency / monetary) — mirroring the ntile orders.
        def asc3(v: org.apache.spark.sql.Column, bs: org.apache.spark.sql.Column) =
          (lit(1) + (v > bs.getItem(0)).cast("int") +
            (v > bs.getItem(1)).cast("int") +
            (v > bs.getItem(2)).cast("int")).cast("long")
        def desc3(v: org.apache.spark.sql.Column, bs: org.apache.spark.sql.Column) =
          (lit(4) - (v > bs.getItem(0)).cast("int") -
            (v > bs.getItem(1)).cast("int") -
            (v > bs.getItem(2)).cast("int")).cast("long")
        withR.crossJoin(broadcast(b))
          .withColumn("r_q", asc3(col("r_days"), col("rb")))
          .withColumn("f_q", desc3(col("f"), col("fb")))
          .withColumn("m_q", desc3(col("m_cents"), col("mb")))
      }
    labeled
      .select(col("o_custkey"), col("r_days"), col("f"), col("m_cents"),
        concat(col("r_q").cast("string"), col("f_q").cast("string"),
          col("m_q").cast("string")).as("rfm"))
      .orderBy("o_custkey")
  }

  /** Running DISTINCT count per key — the window Spark (and SQL) have
    * no native frame for (COUNT(DISTINCT) OVER is unsupported),
    * decomposed into two ordinary windows: a first-seen flag
    * (row_number() = 1 over (key, value)) then a running sum of flags
    * over (key, time). Both windows shuffle on the same user key, so
    * the decomposition costs ONE extra in-partition sort, never a new
    * shuffle — the standard scalable form of "how many distinct
    * event types has this user produced so far". */
  def winRunningDistinct(spark: SparkSession, sf: String): DataFrame = {
    val seen = Window.partitionBy("user_id", "event_type")
      .orderBy(asc("ts_us"), asc("event_id"))
    val run = Window.partitionBy("user_id")
      .orderBy(asc("ts_us"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"))
      .withColumn("first_seen",
        (row_number().over(seen) === 1).cast("long"))
      .withColumn("n_distinct_types", sum(col("first_seen")).over(run))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), col("n_distinct_types"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_running_distinct" -> winRunningDistinct,
    "win_rfm_segment" -> winRfmSegment,
    "win_ewma" -> winEwma,
    "win_time_range" -> winTimeRange,
    "win_islands" -> winIslands,
    "win_topk_per_group" -> winTopkPerGroup,
    "win_topk_native" -> winTopkNative,
    "win_rank_dense" -> winRankDense,
    "win_lag_lead" -> winLagLead,
    "win_running_frame" -> winRunningFrame,
    "win_distribution" -> winDistribution,
    "win_ntile" -> winNtile,
    "win_first_last" -> winFirstLast
  )

  val oracle: Map[String, String] = Map(
    "win_running_distinct" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "event_type FROM events), " +
        "f AS (SELECT user_id, event_id, ts_us, event_type, " +
        "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type " +
        "ORDER BY ts_us, event_id) = 1 THEN 1 ELSE 0 END AS first_seen FROM e) " +
        "SELECT user_id, event_id, ts_us, event_type, " +
        "CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS n_distinct_types FROM f ORDER BY event_id"),
    "win_rfm_segment" ->
      ("WITH per AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_day, " +
        "COUNT(*) AS f, " +
        "CAST(SUM(CAST(round(o_totalprice * 100) AS DECIMAL(18,0))) AS BIGINT) AS m_cents " +
        "FROM orders GROUP BY o_custkey), " +
        "mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders), " +
        "r AS (SELECT o_custkey, CAST(mx - last_day AS BIGINT) AS r_days, " +
        "f, m_cents FROM per, mx), " +
        "q AS (SELECT o_custkey, r_days, f, m_cents, " +
        "ntile(4) OVER (ORDER BY r_days ASC, o_custkey ASC) AS r_q, " +
        "ntile(4) OVER (ORDER BY f DESC, o_custkey ASC) AS f_q, " +
        "ntile(4) OVER (ORDER BY m_cents DESC, o_custkey ASC) AS m_q FROM r) " +
        "SELECT o_custkey, r_days, f, m_cents, " +
        "CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR) AS rfm " +
        "FROM q ORDER BY o_custkey"),
    "win_ewma" ->
      ("WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS tsn, " +
        "CAST(round(value * 100) AS BIGINT) AS vc FROM events) " +
        "SELECT event_id, user_id, vc, " +
        "vc * 128 + coalesce(lag(vc, 1) OVER w, 0) * 64 " +
        "+ coalesce(lag(vc, 2) OVER w, 0) * 32 " +
        "+ coalesce(lag(vc, 3) OVER w, 0) * 16 " +
        "+ coalesce(lag(vc, 4) OVER w, 0) * 8 " +
        "+ coalesce(lag(vc, 5) OVER w, 0) * 4 " +
        "+ coalesce(lag(vc, 6) OVER w, 0) * 2 " +
        "+ coalesce(lag(vc, 7) OVER w, 0) AS ewma_c128 " +
        "FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id) " +
        "ORDER BY event_id"),
    "win_time_range" ->
      ("WITH e AS (SELECT event_id, user_id, value, " +
        "epoch_ns(ts) // 1000000000 AS epoch_s FROM events) " +
        "SELECT event_id, user_id, epoch_s, " +
        "COUNT(*) OVER w AS cnt_1h, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h " +
        "FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s " +
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    "win_islands" ->
      ("WITH d AS (SELECT DISTINCT user_id, " +
        "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events), " +
        "r AS (SELECT user_id, day, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d) " +
        "SELECT user_id, MIN(day) AS island_start, MAX(day) AS island_end, " +
        "COUNT(*) AS n_days " +
        "FROM r GROUP BY user_id, day - CAST(rn AS INTEGER) " +
        "ORDER BY user_id, island_start"),
    "win_topk_native" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn " +
        "FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "win_topk_per_group" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
        "FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "win_rank_dense" ->
      ("SELECT p_brand, p_partkey, p_size, " +
        "rank() OVER (PARTITION BY p_brand ORDER BY p_size ASC) AS rnk, " +
        "dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size ASC) AS drnk, " +
        "ntile(4) OVER (PARTITION BY p_brand ORDER BY p_size ASC, p_partkey ASC) AS nt " +
        "FROM part ORDER BY p_brand, p_size, p_partkey"),
    "win_lag_lead" ->
      ("SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts2, " +
        "lag(CAST(ts AS TIMESTAMP), 1) OVER w AS prev_ts, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER w) AS gap_us, " +
        "lead(event_id, 1) OVER w AS next_id " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) " +
        "ORDER BY user_id, ts2, event_id"),
    "win_running_frame" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS rng_sum " +
        "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"),
    "win_distribution" ->
      ("SELECT c_mktsegment, c_custkey, c_acctbal, " +
        "percent_rank() OVER w AS pr, cume_dist() OVER w AS cd " +
        "FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) " +
        "ORDER BY c_mktsegment, c_acctbal, c_custkey"),
    "win_ntile" ->
      ("SELECT c_mktsegment, c_custkey, " +
        "ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile " +
        "FROM customer ORDER BY c_mktsegment, c_custkey"),
    "win_first_last" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
        "first_value(o_orderdate) OVER w AS first_dt, " +
        "last_value(o_orderdate) OVER w AS last_dt, " +
        "nth_value(o_orderkey, 2) OVER w AS second_key " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey")
  )
}
