package graft.streaming

import graft.Tables
import graft.Tables.{dec, ntz}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time suite (SURVEY.md §2.9), expressed with the
  * batch-compatible event-time functions (`window`, `session_window`)
  * so results stay oracle-checkable. The same transformations run
  * unchanged under `spark.readStream` + watermark (Structured
  * Streaming shares the incremental execution of these operators);
  * the driver contract requires batch DataFrames, so batch is the
  * scored surface.
  *
  * Scale: all grouping is on (window, key) — state per group is
  * bounded and shuffle-partitioned by key, the standard streaming
  * aggregation shape.
  */
object Events {

  /** 1 h tumbling window: count + exact-decimal sum per event type.
    * Window struct is projected to a flat start column (D5). */
  def evTumbling(spark: SparkSession, sf: String): DataFrame = {
    // Tumble in INTEGER µs space, not timestamp space: the contract
    // only needs the window start, and both window() (a two-field
    // struct per row) and date_trunc (zone logic via Instant.atZone
    // per row — 18% of the agg-stage stack samples on the ×10
    // crossover corpus) pay per-ROW for what is representable as two
    // long ops; the 3.6k GROUP keys are converted to timestamps after
    // the aggregate. Exact: hour-truncation of an epoch-µs long ≡
    // date_trunc('hour') for the corpus's epoch-positive timestamps
    // (the div-truncation caveat already global in Tables.tsUsExpr).
    // The streaming twin keeps window() — watermark semantics need it.
    // The money sum runs in exact integer CENTS (D2's intent, cheaper
    // per row than Decimal updates): value is exactly 2-dp corpus-wide
    // (the same measurement that justifies dec()'s DECIMAL(12,2)), so
    // round(value*100) is an exact integer, the long sum is exact
    // (≪ 2^53), and the single final /100.0 rounds the same exact
    // rational DuckDB's decimal-sum→double cast rounds — bit-identical
    // (oracle hash re-verified). Same per-row trade as the integer-µs
    // tumble above: keep the hot loop in primitive long ops.
    Tables.events(spark, sf)
      .groupBy(expr("(ts div 1000) div 3600000000 * 3600000000")
        .as("hour_us"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        // r22 (guide step 4): `round(double)` code-generates a
        // per-row java.math.BigDecimal.valueOf(...).setScale(...) round
        // trip — the one allocating call left in this loop (the r16
        // round(x,6) lesson, applied to the money path). For the
        // exactly-2-dp values the cents contract already requires,
        // value*100 sits within ~1e-9 of its integer, so
        // floor(v*100 + 0.5) selects the SAME integer as HALF_UP for
        // every sign — pure primitive codegen, zero allocation.
        (sum(expr("cast(floor(value * 100 + 0.5) as bigint)")).cast("double")
          / lit(100.0)).as("sum_val"))
      .select(ntz(timestamp_micros(col("hour_us"))).as("hour_start"),
        col("event_type"), col("cnt"), col("sum_val"))
      .orderBy("hour_start", "event_type")
  }

  /** 1 h window sliding every 15 min — each event lands in exactly 4
    * windows (the length is exactly 4 slides, so the containing window
    * starts are slideFloor(t) − k·slide for k∈0..3, always 4 of them).
    * Kept in primitive integer µs end-to-end — explode a 0..3 sequence
    * and aggregate on a LONG window-start key, converting to timestamp
    * once per OUTPUT row — rather than `window(ts2, …)`'s Expand over a
    * struct-of-timestamps key (the ev_tumbling per-row-conversion
    * discipline, r14; SlidingProbe A/B: 0.187→0.152 s at sf0.1,
    * 0.196→0.168 s at ×10, arms asserted row-identical on both corpora
    * before timing). `div` floor semantics are exact here: corpus
    * timestamps are post-epoch. */
  def evSliding(spark: SparkSession, sf: String): DataFrame = {
    val slideUs = 900000000L // 15 min
    Tables.events(spark, sf)
      .select(expr(s"(ts div 1000) div $slideUs * $slideUs").as("slide_us"))
      .select(explode(sequence(lit(0), lit(3))).as("k"), col("slide_us"))
      .select((col("slide_us") - col("k") * lit(slideUs)).as("w_us"))
      .groupBy("w_us").agg(count(lit(1)).as("cnt"))
      .select(ntz(timestamp_micros(col("w_us"))).as("w_start"), col("cnt"))
      .orderBy("w_start")
  }

  /** 30-minute-gap sessionization per user. session_window.end is
    * last-event + gap, matching the lag/cumsum CTE oracle. */
  def evSession(spark: SparkSession, sf: String): DataFrame =
    Tables.events(spark, sf)
      .groupBy(session_window(col("ts2"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), ntz(col("session_window.start")).as("s_start"),
        ntz(col("session_window.end")).as("s_end"), col("cnt"))
      .orderBy("user_id", "s_start")

  /** Keep-first dedup by (user_id, event_type) — the deterministic
    * row_number form, not dropDuplicates (whose row choice is
    * partition-order-dependent). */
  def evDedup(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(asc("ts2"), asc("event_id"))
    Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts2")
      .orderBy("user_id", "event_type")
  }

  /** Watermark-equivalent late-data filter in batch form: keep events
    * within 7 days of the corpus max event time (the streaming
    * counterpart is withWatermark, a no-op in batch mode). The max is
    * a 1-row broadcast, not a driver-side collect. */
  def evLateWatermark(spark: SparkSession, sf: String): DataFrame = {
    val ev = Tables.events(spark, sf)
    val mx = ev.agg(max(col("ts2")).as("mx"))
    ev.crossJoin(broadcast(mx))
      .filter(col("ts2") >= col("mx") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        min(col("ts2")).as("first_ts"),
        max(col("ts2")).as("last_ts"))
      .orderBy("event_type")
  }

  /** Gap-filled dense hourly series: every (hour, event_type) cell in
    * the corpus' time range, zero where no events landed — the
    * time-series completion step dashboards and downstream ML joins
    * need (a missing row and a zero row are different answers).
    * The hour spine is generated from the 1-row min/max aggregate
    * (`sequence` + explode — no driver collect), the type dimension is
    * broadcast, and the left join back to the hourly aggregate is a
    * keyed shuffle. Spine size = hours × types: tiny relative to the
    * events themselves at any scale. */
  def evGapFill(spark: SparkSession, sf: String): DataFrame = {
    val ev = Tables.events(spark, sf)
    val hourly = ev
      .groupBy(ntz(date_trunc("hour", col("ts2"))).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val hours = ev
      .agg(ntz(date_trunc("hour", min(col("ts2")))).as("mn"),
        ntz(date_trunc("hour", max(col("ts2")))).as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("h"))
      .select(ntz(col("h")).as("h"))
    val types = ev.select(col("event_type")).distinct()
    hours.crossJoin(broadcast(types))
      .join(hourly, Seq("h", "event_type"), "left_outer")
      .select(col("h"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("h", "event_type")
  }

  /** Per-key rate limiting: keep the first 3 events per (user, hour)
    * — the throttling/contribution-cap shape of ingest pipelines (cap
    * what any one source adds to a training window). One partitioned
    * row_number window with a unique tiebreak; the filter drops rows
    * before anything downstream, so the cap also bounds every later
    * stage's input. */
  def evThrottle(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.rateLimit(
      Tables.events(spark, sf)
        .withColumn("hour", ntz(date_trunc("hour", col("ts2")))),
      Seq("user_id", "hour"), Seq("ts2", "event_id"), 3, "rn")
      .select(col("event_id"), col("user_id"), col("hour"), col("rn"))
      .orderBy("event_id")

  /** Cohort retention: users grouped by first-active day (their
    * cohort), counted by day offset since it — the engagement matrix
    * behind every retention curve. Two keyed aggregates (per-user
    * first day via min; distinct users per (cohort, offset)) — both
    * compact-partial shuffles; the matrix is |days|² at most,
    * independent of event volume. */
  def evRetentionCohort(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.retentionMatrix(
      Tables.events(spark, sf)
        .select(col("user_id"), to_date(col("ts2")).as("day")),
      "user_id", "day")

  /** Ordered funnel: per user, the view → click → purchase progression
    * where each step must STRICTLY follow the previous one in event
    * time (min-ts recurrence: step k = earliest event of type k after
    * step k-1). Three keyed aggregate+join rounds, one per step — the
    * funnel state per user is three timestamps, never an event list,
    * and each round shuffles only (user, ts) pairs. */
  def evFunnel(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.funnel(Tables.events(spark, sf),
      "user_id", "event_type", "ts2", Seq("view", "click", "purchase"))

  /** Per-type 3-sigma outlier profile — the anomaly-detection gate of
    * a metrics/quality pipeline. Pass 1 is one keyed aggregate over
    * exact integer cents (n, Σv, Σv² per type — map-side partials,
    * tiny result); pass 2 broadcasts those stats back onto the linear
    * scan and counts events with (n·v − Σv)² > 9·(n·Σv² − (Σv)²) —
    * the population |z| > 3 test cleared of division and sqrt, so
    * membership is integer-exact on both engines (the squares live in
    * DECIMAL(38,0) here / HUGEINT in the oracle: ~10²⁶ at corpus
    * sf 1000, well under 10³⁸). Two shuffles total at any scale, and
    * the second is the same keyed agg shape as the first. Thin
    * binding of [[graft.api.GraftOps.zscoreOutliers]]. */
  def evZscoreOutlier(spark: SparkSession, sf: String): DataFrame =
    graft.api.GraftOps.zscoreOutliers(
      Tables.events(spark, sf)
        .select(col("event_type"),
          // floor(v+0.5) ≡ round for the exactly-2-dp corpus values —
          // avoids the per-row BigDecimal round (see evTumbling).
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc")),
      "event_type", "vc")
      .withColumnRenamed("max_out", "max_out_cents")

  /** Adjacency pattern detection (MATCH_RECOGNIZE-lite): a view
    * IMMEDIATELY followed by a purchase within 30 minutes, per user —
    * the sequence-mining primitive under conversion attribution, and
    * the strictly-adjacent complement of ev_funnel's eventually-
    * ordered steps. One partitioned lead() window with a unique
    * tiebreak; per-row state is the single next event, so the match
    * scan is one shuffle at any volume. Time math lives at µs on both
    * engines (the corpus ns column truncates to µs in DuckDB). */
  def evNextPattern(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts_us"), asc("event_id"))
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"),
        lead(col("event_type"), 1).over(w).as("nt"),
        lead(col("event_id"), 1).over(w).as("nid"),
        lead(col("ts_us"), 1).over(w).as("nts"))
      .filter(col("event_type") === "view" && col("nt") === "purchase" &&
        col("nts") - col("ts_us") <= 1800000000L)
      .select(col("user_id"), col("event_id").as("v_id"),
        col("nid").as("p_id"), (col("nts") - col("ts_us")).as("gap_us"))
      .orderBy("v_id")
  }

  /** SCD2 dimension build from a change log — the slowly-changing-
    * dimension type-2 shape every warehouse ETL ships: collapse each
    * user's event stream to its VALUE-CHANGE rows (event_type as the
    * tracked attribute), then seam validity intervals with lead():
    * [valid_from, valid_to) per attribute version, open interval
    * (NULL valid_to) = current row. Two partitioned windows over the
    * same (user, time) ordering — one shuffle at any scale, no
    * self-join; the change-row filter drops ~1/5 of rows before the
    * second window. µs-integer keys end-to-end (D7). */
  def evScd2(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_type").as("attr"),
        col("ts_us").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  /** Markov transition matrix over per-user event sequences: count of
    * each (prev_type → next_type) adjacency plus the row-normalized
    * transition probability — the building block of behavioral
    * sequence models and next-event prediction baselines. One
    * partitioned lead() window (single shuffle over the fact table),
    * then a keyed count whose output is |types|² at most, independent
    * of event volume; the probability divides two exact counts inside
    * the tiny matrix. */
  def evMarkovTransition(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts_us"), asc("event_id"))
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("p", col("cnt").cast("double") /
        sum(col("cnt")).over(Window.partitionBy("prev_type")).cast("double"))
      .orderBy("prev_type", "next_type")
  }

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent PRECEDING non-purchase event (the marketing-analytics
    * staple). One partitioned window with a rows-preceding frame and
    * ignore-nulls last() over a case-filtered column — the attributed
    * row never leaves its partition, so the whole credit assignment is
    * a single shuffle at any event volume. Purchases with no prior
    * touch keep NULL credit (left semantics). */
  def evAttribution(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts_us"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"))
      .withColumn("attr_type", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(w))
      .withColumn("attr_id", last(
        when(col("event_type") =!= "purchase", col("event_id")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("attr_type"), col("attr_id"))
      .orderBy("purchase_id")
  }

  /** Rolling 7-day active users (WAU) per event day, decomposed to an
    * equi-join: the range predicate `day BETWEEN d-6 AND d` becomes an
    * explode of each (user, day) activity row to the ≤ 7 target days
    * it contributes to, then a keyed distinct count — candidate volume
    * is 7× the DISTINCT activity grain (users × days, not events),
    * never a theta join. The oracle states the range join directly. */
  def evRollingWau(spark: SparkSession, sf: String): DataFrame = {
    val act = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts2")).as("day")).distinct()
    val days = act.select(col("day").as("d")).distinct()
    act.withColumn("d", explode(expr("sequence(day, date_add(day, 6))")))
      .join(days, Seq("d"), "left_semi")
      .groupBy("d").agg(countDistinct(col("user_id")).as("wau"))
      .orderBy("d")
  }

  /** Peak concurrent sessions per day — the capacity-planning metric —
    * via the classic SWEEP LINE: sessions (30-min-gap windows, [start,
    * end) semantics) clip to the days they span, each clipped interval
    * emits a +1/−1 delta at its endpoints, and the peak is the max
    * running sum per day ordered by (time, delta, user) — ends process
    * before starts at the same instant, so touching intervals do not
    * overlap. Degenerate clips (sessions ending exactly at midnight)
    * are dropped before the sweep. Scale: the sweep partitions by DAY
    * (days are independent after clipping), so state per partition is
    * that day's delta count — never a global ordering; timestamps stay
    * at exact µs on both engines throughout. */
  def evPeakConcurrency(spark: SparkSession, sf: String): DataFrame = {
    val sess = Tables.events(spark, sf)
      .groupBy(session_window(col("ts2"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), ntz(col("session_window.start")).as("s"),
        ntz(col("session_window.end")).as("e"))
    val clipped = sess
      .withColumn("day", explode(expr(
        "sequence(to_date(s), to_date(e - INTERVAL 1 MICROSECOND))")))
      .withColumn("cs", greatest(col("s"), col("day").cast("timestamp_ntz")))
      .withColumn("ce", least(col("e"),
        expr("cast(day + INTERVAL 1 DAY as timestamp_ntz)")))
      .filter(col("cs") < col("ce"))
    // Both endpoint deltas from ONE pass: the previous unionAll of two
    // projections duplicated the whole upstream — two events scans,
    // two session-window aggregates, two clip explodes (plan-read;
    // runtime exchange reuse only saves the scan-side shuffle write).
    // Exploding a 2-struct array emits the same (day, pt, delta,
    // user_id) bag from a single subtree.
    val deltas = clipped.select(col("day"), col("user_id"),
        explode(expr("array(struct(cs as pt, cast(1 as bigint) as delta), " +
          "struct(ce as pt, cast(-1 as bigint) as delta))")).as("_graft_d"))
      .select(col("day"), col("_graft_d.pt"), col("_graft_d.delta"),
        col("user_id"))
    val w = Window.partitionBy("day")
      .orderBy(asc("pt"), asc("delta"), asc("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("load", sum(col("delta")).over(w))
      .groupBy("day").agg(max(col("load")).as("peak"))
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_peak_concurrency" -> evPeakConcurrency,
    "ev_markov_transition" -> evMarkovTransition,
    "ev_attribution" -> evAttribution,
    "ev_rolling_wau" -> evRollingWau,
    "ev_scd2" -> evScd2,
    "ev_next_pattern" -> evNextPattern,
    "ev_zscore_outlier" -> evZscoreOutlier,
    "ev_retention_cohort" -> evRetentionCohort,
    "ev_funnel" -> evFunnel,
    "ev_throttle" -> evThrottle,
    "ev_tumbling" -> evTumbling,
    "ev_sliding" -> evSliding,
    "ev_session" -> evSession,
    "ev_dedup" -> evDedup,
    "ev_late_watermark" -> evLateWatermark,
    "ev_gap_fill" -> evGapFill
  )

  val oracle: Map[String, String] = Map(
    // Same session CTE as ev_session, then the identical clip + sweep.
    "ev_peak_concurrency" ->
      ("WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events), " +
        "l AS (SELECT user_id, t, CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL " +
        "OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM e), " +
        "g AS (SELECT user_id, t, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM l), " +
        "sess AS (SELECT user_id, MIN(t) AS s, MAX(t) + INTERVAL 30 MINUTE AS e FROM g GROUP BY user_id, sid), " +
        "dd AS (SELECT user_id, s, e, CAST(u.d AS DATE) AS day FROM sess, " +
        "LATERAL (SELECT unnest(generate_series(CAST(CAST(s AS DATE) AS TIMESTAMP), " +
        "CAST(CAST(e - INTERVAL 1 MICROSECOND AS DATE) AS TIMESTAMP), INTERVAL 1 DAY)) AS d) u), " +
        "c AS (SELECT user_id, day, greatest(s, CAST(day AS TIMESTAMP)) AS cs, " +
        "least(e, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY) AS ce FROM dd), " +
        "f AS (SELECT * FROM c WHERE cs < ce), " +
        "del AS (SELECT day, cs AS pt, 1 AS delta, user_id FROM f " +
        "UNION ALL SELECT day, ce, -1, user_id FROM f), " +
        "sw AS (SELECT day, SUM(delta) OVER (PARTITION BY day " +
        "ORDER BY pt, delta, user_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS load FROM del) " +
        "SELECT day, CAST(MAX(load) AS BIGINT) AS peak FROM sw " +
        "GROUP BY day ORDER BY day"),
    "ev_markov_transition" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "event_type FROM events), " +
        "l AS (SELECT event_type AS prev_type, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) " +
        "AS next_type FROM e), " +
        "c AS (SELECT prev_type, next_type, COUNT(*) AS cnt FROM l " +
        "WHERE next_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT prev_type, next_type, cnt, " +
        "CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY prev_type) AS DOUBLE) AS p " +
        "FROM c ORDER BY prev_type, next_type"),
    "ev_attribution" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "event_type FROM events), " +
        "a AS (SELECT user_id, event_id, event_type, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END " +
        "IGNORE NULLS) OVER w AS attr_type, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN event_id END " +
        "IGNORE NULLS) OVER w AS attr_id FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
        "SELECT user_id, event_id AS purchase_id, attr_type, attr_id " +
        "FROM a WHERE event_type = 'purchase' ORDER BY purchase_id"),
    "ev_rolling_wau" ->
      ("WITH a AS (SELECT DISTINCT user_id, " +
        "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events), " +
        "d AS (SELECT DISTINCT day AS d FROM a) " +
        "SELECT d.d, COUNT(DISTINCT a.user_id) AS wau FROM d " +
        "JOIN a ON a.day BETWEEN d.d - 6 AND d.d " +
        "GROUP BY d.d ORDER BY d.d"),
    "ev_scd2" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "event_type FROM events), " +
        "c AS (SELECT user_id, event_id, ts_us, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) " +
        "AS prev FROM e), " +
        "f AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type) " +
        "SELECT user_id, event_type AS attr, ts_us AS valid_from, " +
        "lead(ts_us) OVER w AS valid_to, " +
        "lead(ts_us) OVER w IS NULL AS is_current FROM f " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id) " +
        "ORDER BY user_id, valid_from"),
    "ev_next_pattern" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, " +
        "epoch_us(ts) AS ts_us FROM events), " +
        "l AS (SELECT user_id, event_id, event_type, ts_us, " +
        "lead(event_type) OVER w AS nt, lead(event_id) OVER w AS nid, " +
        "lead(ts_us) OVER w AS nts FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)) " +
        "SELECT user_id, event_id AS v_id, nid AS p_id, " +
        "nts - ts_us AS gap_us FROM l " +
        "WHERE event_type = 'view' AND nt = 'purchase' " +
        "AND nts - ts_us <= 1800000000 ORDER BY v_id"),
    "ev_zscore_outlier" ->
      ("WITH c AS (SELECT event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS vc FROM events), " +
        "s AS (SELECT event_type, COUNT(*) AS n, " +
        "SUM(CAST(vc AS HUGEINT)) AS sv, " +
        "SUM(CAST(vc AS HUGEINT) * CAST(vc AS HUGEINT)) AS sxx " +
        "FROM c GROUP BY event_type) " +
        "SELECT c.event_type, CAST(MIN(n) AS BIGINT) AS n, " +
        "COUNT(*) FILTER ((CAST(n AS HUGEINT) * vc - sv) * (CAST(n AS HUGEINT) * vc - sv) " +
        "> 9 * (CAST(n AS HUGEINT) * sxx - sv * sv)) AS n_out, " +
        "MAX(vc) FILTER ((CAST(n AS HUGEINT) * vc - sv) * (CAST(n AS HUGEINT) * vc - sv) " +
        "> 9 * (CAST(n AS HUGEINT) * sxx - sv * sv)) AS max_out_cents " +
        "FROM c JOIN s USING (event_type) " +
        "GROUP BY c.event_type ORDER BY c.event_type"),
    "ev_retention_cohort" ->
      ("WITH d AS (SELECT DISTINCT user_id, " +
        "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events), " +
        "c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id) " +
        "SELECT cohort_day, CAST(day - cohort_day AS BIGINT) AS offset_d, " +
        "COUNT(DISTINCT d.user_id) AS n_users " +
        "FROM d JOIN c ON d.user_id = c.user_id " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "ev_funnel" ->
      ("WITH s1 AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' " +
        "THEN CAST(ts AS TIMESTAMP) END) AS t1 FROM events GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id, s1.t1, MIN(CASE WHEN event_type = 'click' " +
        "AND CAST(ts AS TIMESTAMP) > s1.t1 THEN CAST(ts AS TIMESTAMP) END) AS t2 " +
        "FROM events e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id, s1.t1), " +
        "s3 AS (SELECT e.user_id, s2.t1, s2.t2, MIN(CASE WHEN event_type = 'purchase' " +
        "AND CAST(ts AS TIMESTAMP) > s2.t2 THEN CAST(ts AS TIMESTAMP) END) AS t3 " +
        "FROM events e JOIN s2 ON e.user_id = s2.user_id GROUP BY e.user_id, s2.t1, s2.t2) " +
        "SELECT COUNT(*) AS n_users, COUNT(t1) AS reached_view, " +
        "COUNT(t2) AS reached_click, COUNT(t3) AS reached_purchase FROM s3"),
    "ev_throttle" ->
      ("SELECT event_id, user_id, hour, rn FROM (" +
        "SELECT event_id, user_id, " +
        "CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour, " +
        "CAST(row_number() OVER (PARTITION BY user_id, " +
        "date_trunc('hour', CAST(ts AS TIMESTAMP)) " +
        "ORDER BY CAST(ts AS TIMESTAMP), event_id) AS BIGINT) AS rn " +
        "FROM events) t WHERE rn <= 3 ORDER BY event_id"),
    "ev_tumbling" ->
      ("SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start, event_type, " +
        "COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_val " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "ev_sliding" ->
      ("WITH s AS (SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS tb FROM events), " +
        "u AS (SELECT tb AS ws FROM s UNION ALL SELECT tb - INTERVAL 15 MINUTE FROM s " +
        "UNION ALL SELECT tb - INTERVAL 30 MINUTE FROM s UNION ALL SELECT tb - INTERVAL 45 MINUTE FROM s) " +
        "SELECT CAST(ws AS TIMESTAMP) AS w_start, COUNT(*) AS cnt FROM u GROUP BY 1 ORDER BY 1"),
    "ev_session" ->
      ("WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events), " +
        "l AS (SELECT user_id, t, CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL " +
        "OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM e), " +
        "g AS (SELECT user_id, t, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM l) " +
        "SELECT user_id, MIN(t) AS s_start, MAX(t) + INTERVAL 30 MINUTE AS s_end, COUNT(*) AS cnt " +
        "FROM g GROUP BY user_id, sid ORDER BY user_id, s_start"),
    "ev_dedup" ->
      ("SELECT user_id, event_type, event_id, ts2 FROM (" +
        "SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts2, " +
        "row_number() OVER (PARTITION BY user_id, event_type ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS rn " +
        "FROM events) t WHERE rn = 1 ORDER BY user_id, event_type"),
    "ev_late_watermark" ->
      ("SELECT event_type, COUNT(*) AS cnt, MIN(t) AS first_ts, MAX(t) AS last_ts FROM " +
        "(SELECT event_type, CAST(ts AS TIMESTAMP) AS t FROM events) e " +
        "WHERE t >= (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 7 DAY " +
        "GROUP BY event_type ORDER BY event_type"),
    "ev_gap_fill" ->
      ("WITH b AS (SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS mn, " +
        "date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS mx FROM events), " +
        "h AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS TIMESTAMP) AS h FROM b), " +
        "ty AS (SELECT DISTINCT event_type FROM events), " +
        "agg AS (SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h, event_type, COUNT(*) AS cnt " +
        "FROM events GROUP BY 1, 2) " +
        "SELECT h.h, ty.event_type, CAST(COALESCE(agg.cnt, 0) AS BIGINT) AS cnt " +
        "FROM h CROSS JOIN ty LEFT JOIN agg ON agg.h = h.h AND agg.event_type = ty.event_type " +
        "ORDER BY h.h, ty.event_type")
  )
}
