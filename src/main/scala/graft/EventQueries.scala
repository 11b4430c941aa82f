package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics over `events` — the funnel / cohort /
  * anomaly queries a reference user runs on the scraped activity feed
  * (events.ts is the landed crawl clock; user_id the entity key).
  *
  * Scale notes (100 TB): every query here reduces the fact table to a
  * per-entity (or per-day) aggregate FIRST — one hash shuffle on the
  * entity key — and every join after that reduction is dimension-sized
  * (≤ one row per user/day), so AQE broadcasts it. The raw event stream
  * is never joined to itself and never shuffles twice on the same key.
  */
object EventQueries {
  import Tables._

  // ---- sequential funnel ---------------------------------------------------

  /** `funnel_steps`: view → click → purchase, ORDER ENFORCED — a user counts
    * for step N only with an event strictly after their step-N−1 time.
    * Three keyed min-aggregates on the SAME key (user_id): the fact shuffles
    * once per step but each join input above the first agg is ≤ one row per
    * user (broadcast), never fact×fact. The strictly-after semantics is the
    * standard product-funnel definition (no same-timestamp credit). */
  private def funnelSteps(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select("user_id", "event_type", "ts")
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val row = (df: DataFrame, no: Int, nm: String) =>
      df.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(no).as("step_no"), lit(nm).as("step"), col("n_users"))
    row(s1, 1, "view").unionAll(row(s2, 2, "click")).unionAll(row(s3, 3, "purchase"))
      .orderBy("step_no")
  }

  private val funnelStepsSql =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |     s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |            JOIN s1 ON e.user_id = s1.user_id
      |            WHERE e.event_type = 'click' AND e.ts > s1.t1
      |            GROUP BY e.user_id),
      |     s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |            JOIN s2 ON e.user_id = s2.user_id
      |            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |            GROUP BY e.user_id)
      |SELECT 1 AS step_no, 'view' AS step, count(*) AS n_users FROM s1
      |UNION ALL SELECT 2, 'click', count(*) FROM s2
      |UNION ALL SELECT 3, 'purchase', count(*) FROM s3
      |ORDER BY step_no""".stripMargin

  /** `funnel_windowed`: the conversion-window funnel — step N counts only
    * within 24 h of the user's step-N−1 time (strictly after it, same
    * order rule as `funnel_steps`; the unbounded variant is the contrast).
    * Product analytics' standard "converted within a day". Same plan
    * geometry as funnel_steps — three keyed min-aggs, each join input above
    * the first agg ≤ one row per user — with the window test in exact
    * integer microseconds. */
  private def funnelWindowed(s: SparkSession, d: String): DataFrame =
    funnelWindowedOf(events(s, d))

  private[graft] def funnelWindowedOf(ev: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val e = ev.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("us") > col("t1") && col("us") <= col("t1") + dayUs)
      .groupBy("user_id").agg(min("us").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("us") > col("t2") && col("us") <= col("t2") + dayUs)
      .groupBy("user_id").agg(min("us").as("t3"))
    val row = (df: DataFrame, no: Int, nm: String) =>
      df.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(no).as("step_no"), lit(nm).as("step"), col("n_users"))
    row(s1, 1, "view").unionAll(row(s2, 2, "click")).unionAll(row(s3, 3, "purchase"))
      .orderBy("step_no")
  }

  private val funnelWindowedSql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT user_id, min(us) AS t1 FROM e
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click'
      |         AND e.us > s1.t1 AND e.us <= s1.t1 + 86400000000
      |       GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase'
      |         AND e.us > s2.t2 AND e.us <= s2.t2 + 86400000000
      |       GROUP BY e.user_id)
      |SELECT 1 AS step_no, 'view' AS step, count(*) AS n_users FROM s1
      |UNION ALL SELECT 2, 'click', count(*) FROM s2
      |UNION ALL SELECT 3, 'purchase', count(*) FROM s3
      |ORDER BY step_no""".stripMargin

  // ---- cohort retention ----------------------------------------------------

  /** `cohort_retention`: users grouped by first-seen day; for each cohort ×
    * day-offset, how many came back. First-seen is ONE keyed agg; the
    * cohort map (≤ one row per user) broadcasts back onto the fact, so the
    * retention matrix costs one fact shuffle total. Days truncate
    * identically on both engines; compared as DATE (tz-free). */
  private def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"),
      date_trunc("day", col("ts")).cast("date").as("day"))
    val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("int").as("day_offset"))
      .agg(countDistinct("user_id").cast("long").as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  private val cohortRetentionSql =
    """WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |           FROM events),
      |     cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
      |SELECT c.cohort_day,
      |       CAST(date_diff('day', c.cohort_day, e.day) AS INTEGER) AS day_offset,
      |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM e JOIN cohort c ON e.user_id = c.user_id
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---- z-score anomaly flag ------------------------------------------------

  /** `anomaly_zscore`: days whose per-type total is > 2σ from that type's
    * daily mean. The usual stddev formulation is float-order-dependent, so
    * the 2σ test is CROSS-MULTIPLIED into exact decimals:
    *   (x − μ)² > 4σ²  ⇔  (n·x − Σ)² > 4·(n·Σx² − Σ²)
    * with x the 2-dp daily total — every term is an exact DECIMAL on both
    * engines, so the flag (and the hash) is engine-independent. Two keyed
    * aggs (type,day → type); the per-type stats row broadcasts back. */
  private def anomalyZscore(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(col("value").cast("decimal(12,2)")).as("day_total"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("day_total")).as("s1"),
      sum(col("day_total") * col("day_total")).as("s2"))
    daily.join(stats, "event_type")
      .filter {
        val dx = col("n") * col("day_total") - col("s1")
        dx * dx > (col("n") * col("s2") - col("s1") * col("s1")) * 4
      }
      .select(col("event_type"), col("day"), col("day_total").cast("double"))
      .orderBy("event_type", "day")
  }

  private val anomalyZscoreSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         SUM(CAST(value AS DECIMAL(12,2))) AS day_total
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, count(*) AS n, SUM(day_total) AS s1,
      |         SUM(day_total * day_total) AS s2
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, d.day, CAST(d.day_total AS DOUBLE) AS day_total
      |FROM daily d JOIN stats s ON d.event_type = s.event_type
      |WHERE (s.n * d.day_total - s.s1) * (s.n * d.day_total - s.s1)
      |      > (s.n * s.s2 - s.s1 * s.s1) * 4
      |ORDER BY d.event_type, d.day""".stripMargin

  // ---- exponential moving average ------------------------------------------

  /** `ts_ewma`: per-user exponentially-weighted average of event values —
    * the decay-feature op of feature engineering (recent activity counts
    * more). The recurrence s ← 0.8·s + 0.2·x is inherently ordered, so it
    * runs as a LEFT FOLD over the user's (ts, event_id)-sorted values,
    * seeded with the first element — exactly DuckDB's seedless
    * `list_reduce`, making the doubles bit-identical before the final
    * 6-dp round. One keyed shuffle; per-user state is the bounded event
    * list (the streaming twin would carry s in mapGroupsWithState with
    * O(1) state). Decay constants enter both engines as independent
    * decimal literals. */
  private def tsEwma(s: SparkSession, d: String): DataFrame = {
    val vals = transform(
      sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))),
      e => e.getField("value").cast("double"))
    events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), vals.as("vals"))
      .select(col("user_id"), col("n_events"),
        round(aggregate(
          slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
          element_at(col("vals"), 1),
          (acc, x) => lit(0.8) * acc + lit(0.2) * x), 6).as("ewma"))
      .orderBy("user_id")
  }

  private val tsEwmaSql =
    """WITH seq AS (
      |  SELECT user_id, count(*) AS n_events,
      |         list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events,
      |       round(list_reduce(vals,
      |         (s, x) -> CAST(0.8 AS DOUBLE) * s + CAST(0.2 AS DOUBLE) * x), 6)
      |         AS ewma
      |FROM seq ORDER BY user_id""".stripMargin

  /** `event_transitions`: the first-order Markov transition matrix of user
    * behavior — counts of consecutive (prev → next) event-type pairs per
    * user timeline, with transition probabilities as exact integer ratios
    * (n/row_total, identical IEEE doubles cross-engine). One window over
    * the user key (per-user lag is frame-free streaming work), one
    * aggregate on the tiny (type × type) key space. The "what do users do
    * after X" product question, and the input to any session-path model. */
  private def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    pairs.groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_next",
        col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy("prev")).cast("double"))
      .orderBy("prev", "next")
  }

  private val eventTransitionsSql =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev
      |  FROM events),
      |pairs AS (SELECT prev, event_type AS next FROM seq WHERE prev IS NOT NULL),
      |counts AS (SELECT prev, next, count(*) AS n FROM pairs GROUP BY prev, next)
      |SELECT prev, next, n,
      |       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE) AS p_next
      |FROM counts ORDER BY prev, next""".stripMargin

  /** `anomaly_mad`: the robust-statistics twin of anomaly_zscore — median /
    * median-absolute-deviation outlier detection (|x − med| > 3·MAD), the
    * rule that doesn't let one huge day inflate its own threshold the way
    * σ does. Medians come from the proven percentile ≡ quantile_cont
    * interpolation (identical doubles cross-engine, agg_percentiles
    * precedent); inputs are exact 2-dp decimals cast to double, so every
    * comparison runs the same IEEE ops in both engines. Three keyed aggs
    * on the same (type) key; each stats row broadcasts back. */
  private def anomalyMad(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("day_total"))
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(day_total, 0.5)").as("med"))
    val dev = daily.join(med, "event_type")
      .withColumn("adev", abs(col("day_total") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(mad, "event_type")
      .filter(col("adev") > col("mad") * 3)
      .select(col("event_type"), col("day"), col("day_total"))
      .orderBy("event_type", "day")
  }

  private val anomalyMadSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS day_total
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, quantile_cont(day_total, 0.5) AS med
      |  FROM daily GROUP BY 1),
      |dev AS (
      |  SELECT d.event_type, d.day, d.day_total,
      |         abs(d.day_total - m.med) AS adev
      |  FROM daily d JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT v.event_type, v.day, v.day_total
      |FROM dev v JOIN mad m USING (event_type)
      |WHERE v.adev > m.mad * 3
      |ORDER BY v.event_type, v.day""".stripMargin

  // ---- batch sessionization ------------------------------------------------

  /** `sessionize_events`: gap-based sessionization in batch — a new session
    * starts at any event > 30 min after the user's previous one; per
    * (user, session): event count, exact start/end micros, decimal-exact
    * value sum. The behavioral-sequence builder of a training pipeline (and
    * the batch twin of `stream_session_window`'s native session windows —
    * same 30-min gap rule, so the two formulations cross-check). Gap test
    * and bounds are exact integer microseconds; the boundary-flag running
    * sum is the classic lag+cumsum shape — one keyed shuffle, per-user sort,
    * no self-join. Ties can't bend the RANGE frame: (ts, event_id) is
    * unique per user. */
  private def sessionizeEvents(s: SparkSession, d: String): DataFrame =
    sessionizeEventsOf(events(s, d))

  private[graft] def sessionizeEventsOf(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > lit(1800000000L), 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("new_s")).over(w))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("t_start_us"),
        max(unix_micros(col("ts"))).as("t_end_us"),
        Det.dsum(col("value")).as("session_value"))
      .orderBy("user_id", "session_no")
  }

  private val sessionizeEventsSql =
    s"""WITH o AS (
       |  SELECT user_id, event_id, ts, value,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS prev_us
       |  FROM events),
       |f AS (SELECT *, CASE WHEN prev_us IS NULL
       |        OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
       |      FROM o),
       |ss AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
       |         ORDER BY ts, event_id) AS BIGINT) AS session_no
       |       FROM f)
       |SELECT user_id, session_no, count(*) AS n_events,
       |  CAST(min(epoch_us(ts)) AS BIGINT) AS t_start_us,
       |  CAST(max(epoch_us(ts)) AS BIGINT) AS t_end_us,
       |  ${Det.sqlDsum("value")} AS session_value
       |FROM ss GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- windowed distribution drift -----------------------------------------

  /** `ts_dist_drift`: per 6-hour window, PSI of the event-type distribution
    * against the PREVIOUS window — the streaming monitor that pages before
    * a data drop poisons a training mixture (the batch-window twin of
    * `drift_psi`'s snapshot form; on a live feed the same aggregate runs
    * per trigger and the lag becomes keyed state). Windows are exact
    * integer-microsecond buckets (`unix_micros div 6h`). The (window, type)
    * grid is DENSIFIED (distinct windows × distinct types, absent counts
    * = 0) so `lag(share)` means "previous window" even when a type skips a
    * window — without the grid the lag silently reaches further back and
    * the drift is wrong. Shares are exact-long IEEE divisions; ln rounds
    * 6 dp before the multiply (the drift_psi recipe); a zero-mass side or
    * the first window yields NULL.
    * Scale: one keyed (window,type) count agg; the grid and lag run on
    * aggregate-sized data (windows × types), never on the fact stream. */
  private def tsDistDrift(s: SparkSession, d: String): DataFrame =
    tsDistDriftOf(events(s, d))

  private[graft] def tsDistDriftOf(ev: DataFrame): DataFrame = {
    val counts = ev
      .select(expr("unix_micros(ts) div 21600000000").as("win"),
        col("event_type"))
      .groupBy("win", "event_type").agg(count(lit(1)).as("n"))
    val grid = counts.select("win").distinct()
      .crossJoin(counts.select("event_type").distinct())
    val dense = grid.join(counts, Seq("win", "event_type"), "left_outer")
      .select(col("win"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
    val tot = dense.groupBy("win").agg(sum(col("n")).as("t"))
    val shared = dense.join(tot, Seq("win"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("win")
    val p = col("n").cast("double") / col("t")
    val withPrev = shared
      .withColumn("n_prev", lag(col("n"), 1).over(w))
      .withColumn("t_prev", lag(col("t"), 1).over(w))
    val q = col("n_prev").cast("double") / col("t_prev")
    withPrev
      .select(col("win"), col("event_type"), col("n"),
        when(col("n") > 0 && col("n_prev") > 0,
          round((p - q) * round(log(p / q), 6), 6)).as("psi_term"))
      .orderBy("win", "event_type")
  }

  private val tsDistDriftSql =
    """WITH counts AS (
      |  SELECT epoch_us(ts) // 21600000000 AS win, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT w.win, t.event_type
      |  FROM (SELECT DISTINCT win FROM counts) w
      |  CROSS JOIN (SELECT DISTINCT event_type FROM counts) t),
      |dense AS (
      |  SELECT g.win, g.event_type,
      |         CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |  FROM grid g LEFT JOIN counts c
      |    ON g.win = c.win AND g.event_type = c.event_type),
      |tot AS (SELECT win, CAST(sum(n) AS BIGINT) AS t FROM dense GROUP BY 1),
      |prev AS (
      |  SELECT d.win, d.event_type, d.n, t.t,
      |    lag(d.n) OVER (PARTITION BY d.event_type ORDER BY d.win) AS n_prev,
      |    lag(t.t) OVER (PARTITION BY d.event_type ORDER BY d.win) AS t_prev
      |  FROM dense d JOIN tot t USING (win))
      |SELECT win, event_type, n,
      |  CASE WHEN n > 0 AND n_prev > 0 THEN
      |    round((CAST(n AS DOUBLE) / t - CAST(n_prev AS DOUBLE) / t_prev)
      |      * round(ln((CAST(n AS DOUBLE) / t)
      |                 / (CAST(n_prev AS DOUBLE) / t_prev)), 6), 6)
      |  END AS psi_term
      |FROM prev ORDER BY win, event_type""".stripMargin

  // ---- sketch_theta_overlap: mergeable audience set algebra ----------------

  /** Audience overlap through DataSketches THETA sketches — the mergeable
    * sketch family that supports set INTERSECTION and DIFFERENCE under
    * merge, which HLL (A4c) fundamentally cannot: an HLL union is lossless
    * but "users who did A and B" needs inclusion–exclusion with compounding
    * error, while theta sketches keep a uniform hash sample so A∩B and A∖B
    * are first-class. Both audiences build in ONE fact scan (conditional
    * sketch inputs — nulls are skipped by the aggregate), reduce to one
    * 1×1 row, and the set algebra runs on the two sketches as scalars.
    *
    * Oracle note: at the default lgK=12 a theta sketch is EXACT below 4096
    * retained keys, and the driver's SFs top out at 1 500 users — so the
    * estimates equal the exact distinct counts and the DuckDB oracle
    * hash-matches. At 100 TB the SAME plan degrades gracefully to ±1.6%
    * (95%) estimates; OpProps pins the estimate-mode error on 200k
    * synthetic ids. The 100 TB pattern this models: per-partition sketch
    * rows materialized once, audience algebra served from sketches without
    * re-scanning the fact (the A4c rollup story plus intersection). */
  private def sketchThetaOverlap(s: SparkSession, d: String): DataFrame =
    sketchThetaOverlapOf(events(s, d))

  /** r11 bound form: the r10 query emitted the five theta ESTIMATES and the
    * oracle asserted equality with exact set algebra — true only while both
    * input sketches stay under the nominal 4096 entries (exact mode). The
    * sf1 rehearsal pushed buyers to ~7.3k and every estimate drifted 0.2-3%
    * off exact, failing the hash. Now the EXACT counts (SQL-reproducible,
    * computed in the same pass) are the hashed payload and the sketch
    * estimates are asserted within 3σ: rse ≈ 1/√k = 1.56% at lgK 12, so
    * 0.05 of the estimate's support — the set itself for a/b/union, the
    * UNION for intersection/difference (theta set-op error scales with the
    * union, not the result). Deterministic: theta sketches have no RNG. */
  private[graft] def sketchThetaOverlapOf(ev: DataFrame): DataFrame = {
    val buyer = col("event_type") === "purchase" && col("value") > 150
    val viewer = col("event_type") === "view" && col("value") > 180
    def ok(est: Column, exact: Column, support: Column): Column =
      abs(est - exact.cast("double")) <= lit(0.05) * support.cast("double")
    ev
      .agg(
        theta_sketch_agg(when(buyer, col("user_id"))).as("a"),
        theta_sketch_agg(when(viewer, col("user_id"))).as("b"),
        countDistinct(when(buyer, col("user_id"))).as("exact_buyers"),
        countDistinct(when(viewer, col("user_id"))).as("exact_viewers"),
        countDistinct(when(buyer || viewer, col("user_id"))).as("exact_union"))
      .select(
        col("exact_buyers"), col("exact_viewers"), col("exact_union"),
        (col("exact_buyers") + col("exact_viewers") - col("exact_union"))
          .as("exact_overlap"),
        (col("exact_union") - col("exact_viewers")).as("exact_buyers_only"),
        ok(theta_sketch_estimate(col("a")), col("exact_buyers"),
          col("exact_buyers")).as("ok_buyers"),
        ok(theta_sketch_estimate(col("b")), col("exact_viewers"),
          col("exact_viewers")).as("ok_viewers"),
        ok(theta_sketch_estimate(theta_union(col("a"), col("b"))),
          col("exact_union"), col("exact_union")).as("ok_union"),
        ok(theta_sketch_estimate(theta_intersection(col("a"), col("b"))),
          col("exact_buyers") + col("exact_viewers") - col("exact_union"),
          col("exact_union")).as("ok_overlap"),
        ok(theta_sketch_estimate(theta_difference(col("a"), col("b"))),
          col("exact_union") - col("exact_viewers"),
          col("exact_union")).as("ok_buyers_only"))
  }

  private val sketchThetaOverlapSql =
    """WITH a AS (SELECT DISTINCT user_id FROM events
      |           WHERE event_type = 'purchase' AND value > 150),
      |b AS (SELECT DISTINCT user_id FROM events
      |      WHERE event_type = 'view' AND value > 180)
      |SELECT (SELECT count(*) FROM a) AS exact_buyers,
      |       (SELECT count(*) FROM b) AS exact_viewers,
      |       (SELECT count(*) FROM (SELECT user_id FROM a
      |                              UNION SELECT user_id FROM b)) AS exact_union,
      |       (SELECT count(*) FROM (SELECT user_id FROM a
      |                              INTERSECT SELECT user_id FROM b)) AS exact_overlap,
      |       (SELECT count(*) FROM (SELECT user_id FROM a
      |                              EXCEPT SELECT user_id FROM b)) AS exact_buyers_only,
      |       TRUE AS ok_buyers, TRUE AS ok_viewers, TRUE AS ok_union,
      |       TRUE AS ok_overlap, TRUE AS ok_buyers_only""".stripMargin

  // ---- N35h ts_rolling_median: robust rolling smoothing --------------------

  /** `ts_rolling_median`: exact 5-point rolling median of `value` per
    * event_type — the robust (outlier-immune) counterpart of
    * `window_moving_avg`/`ts_ewma`. The frame is pinned to exactly 5 rows
    * (partial leading frames filtered by row_number), so the median is a
    * pure ELEMENT PICK — `sort_array(frame)[2]` — with zero arithmetic:
    * bit-identical cross-engine on raw doubles, no decimal detour needed.
    * Scale shape: one window shuffle on event_type; parallelism there is
    * bounded by the type cardinality — at 100 TB this runs through the
    * (type, time-bucket)+carry sub-partitioning proven by
    * `window_range_frame_bucketed` (only a 4-row carry per boundary). */
  private def tsRollingMedian(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("ts", "event_id")
    events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("roll_med",
        element_at(sort_array(collect_list("value").over(w.rowsBetween(-4, 0))), 3))
      .filter(col("rn") >= 5)
      .select("event_id", "roll_med")
      .orderBy("event_id")
  }

  private val tsRollingMedianSql =
    """WITH r AS (
      |  SELECT event_id,
      |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
      |    list_sort(list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))[3] AS roll_med
      |  FROM events)
      |SELECT event_id, roll_med FROM r WHERE rn >= 5 ORDER BY event_id""".stripMargin

  // ---- N35i ts_autocorr: lag-1 autocorrelation of the daily series ---------

  /** `ts_autocorr`: lag-1 Pearson autocorrelation of the daily event-count
    * series per event_type — the "is this metric trending or mean-reverting"
    * screen run after `ts_ewma`/`anomaly_zscore`. The series is the daily
    * COUNT (exact integers), consecutive days paired via `lead` over the
    * per-type date order, and the Pearson moments (Σx, Σy, Σxy, Σx², Σy²)
    * are LONG sums — exact, order-independent — so the only float math is
    * the final covariance/variance division, identical on both engines and
    * rounded to 6 dp. Scale: the fact reduces to ≤ one row per (type, day)
    * in one shuffle; the window + moment agg run on that tiny aggregate. */
  private def tsAutocorr(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    daily
      .withColumn("y", lead("x", 1).over(w))
      .filter(col("y").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n_pairs"),
        round((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
          .as("autocorr"))
      .orderBy("event_type")
  }

  private val tsAutocorrSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT event_type, x,
      |         lead(x) OVER (PARTITION BY event_type ORDER BY day) AS y
      |  FROM daily),
      |m AS (
      |  SELECT event_type, count(*) AS n_pairs,
      |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
      |         sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM pairs WHERE y IS NOT NULL GROUP BY event_type)
      |SELECT event_type, n_pairs,
      |       round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
      |             (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
      |              sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))), 6) AS autocorr
      |FROM m ORDER BY event_type""".stripMargin

  // ---- N35j event_pattern_match: sequence-pattern detection ----------------

  /** `event_pattern_match`: MATCH_RECOGNIZE-style sequence detection — count
    * per day the CONSECUTIVE per-user event triples view → click → purchase
    * whose total span is ≤ 24 hours (the "clean conversion burst"
    * pattern). Unlike `event_transitions` (bigram counts) this matches a
    * multi-step ordered pattern with a time predicate, the core of
    * clickstream pattern mining. One window shuffle on user_id (total order
    * ts, event_id within user), two `lead`s, then a date rollup — the fact
    * never self-joins, so the plan is a single sort-shuffle at any scale.
    * The 24 h span bound keeps ~60% of raw triples at sf0.01 (median
    * inter-event gap in the synthetic feed is hours, not minutes). */
  private def eventPatternMatch(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .withColumn("ts3", lead("ts", 2).over(w))
      .filter(col("event_type") === "view" && col("t2") === "click" &&
        col("t3") === "purchase" &&
        col("ts3") <= col("ts") + expr("INTERVAL 24 HOURS"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_bursts"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("day")
  }

  private val eventPatternMatchSql =
    """WITH seq AS (
      |  SELECT user_id, ts, event_type,
      |         lead(event_type, 1) OVER w AS t2,
      |         lead(event_type, 2) OVER w AS t3,
      |         lead(ts, 2) OVER w AS ts3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT CAST(ts AS DATE) AS day, count(*) AS n_bursts,
      |       count(DISTINCT user_id) AS n_users
      |FROM seq
      |WHERE event_type = 'view' AND t2 = 'click' AND t3 = 'purchase'
      |  AND ts3 <= ts + INTERVAL 24 HOUR
      |GROUP BY 1 ORDER BY day""".stripMargin

  // ---- N28c ts_theil_sen: robust trend slope -------------------------------

  /** `ts_theil_sen`: Theil–Sen robust trend — the median of all pairwise
    * slopes of the per-type daily-count series (outlier days can't drag it
    * the way one bad day drags OLS). Day pairs come from a self-join of the
    * DAILY AGGREGATE (≤ one row per (type, day) — C(days,2) pairs per type,
    * never fact²); each slope is one exact-integer-difference division, and
    * the median is a pure ELEMENT PICK (lower middle) from the sorted slope
    * list — zero arithmetic, bit-stable cross-engine (the ts_rolling_median
    * recipe). Day index is an exact integer via datediff from the epoch. */
  private def tsTheilSen(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("t"))
      .agg(count(lit(1)).as("y"))
    val a = daily.select(col("event_type"), col("t").as("t1"), col("y").as("y1"))
    val b = daily.select(col("event_type"), col("t").as("t2"), col("y").as("y2"))
    a.join(b, Seq("event_type")).filter(col("t1") < col("t2"))
      .select(col("event_type"),
        ((col("y2") - col("y1")).cast("double") / (col("t2") - col("t1")))
          .as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sort_array(collect_list("slope")).as("slopes"))
      .select(col("event_type"), col("n_pairs"),
        element_at(col("slopes"),
          ((col("n_pairs") + 1) / 2).cast("int")).as("theil_sen_slope"))
      .orderBy("event_type")
  }

  /** N28g `ts_ols_trend`: per-type ordinary-least-squares daily trend —
    * the parametric complement of [[tsTheilSen]]'s robust slope (OLS gives
    * the intercept and reacts to every point; Theil–Sen shrugs off
    * outliers — a monitoring stack wants both, plus their disagreement as
    * an outlier signal). Both regressors are INTEGER sums (x = epoch day,
    * y = daily count), so the five sufficient statistics are exact longs
    * and slope/intercept are each ONE IEEE division of exactly-represented
    * integers (closed forms: (n·Sxy − Sx·Sy)/(n·Sxx − Sx²) and
    * (Sy·Sxx − Sx·Sxy)/(n·Sxx − Sx²)), rounded to 6 dp — engine-identical,
    * the corr_pearson discipline. Scale: daily rollup is one keyed agg with
    * map-side combine; the per-type regression runs on |types| × |days|
    * rows — never corpus-sized. A 100 TB corpus changes the rollup's input,
    * not the regression's. */
  private def tsOlsTrend(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("t"))
      .agg(count(lit(1)).as("y"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("t")).as("sx"), sum(col("y")).as("sy"),
        sum(col("t") * col("y")).as("sxy"),
        sum(col("t") * col("t")).as("sxx"))
      .select(col("event_type"), col("n").as("n_days"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("intercept"))
      .orderBy("event_type")
  }

  private val tsOlsTrendSql =
    """WITH daily AS (
      |  SELECT event_type,
      |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
      |         count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(t) AS BIGINT) AS sx,
      |         CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(t * y) AS BIGINT) AS sxy,
      |         CAST(sum(t * t) AS BIGINT) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT event_type, n AS n_days,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |        / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
      |  round(CAST(sy * sxx - sx * sxy AS DOUBLE)
      |        / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept
      |FROM s ORDER BY event_type""".stripMargin

  private val tsTheilSenSql =
    """WITH daily AS (
      |  SELECT event_type,
      |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
      |         count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |slopes AS (
      |  SELECT a.event_type,
      |         CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) AS slope
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.t < b.t),
      |m AS (
      |  SELECT event_type, count(*) AS n_pairs,
      |         list_sort(list(slope)) AS sl
      |  FROM slopes GROUP BY event_type)
      |SELECT event_type, n_pairs,
      |       sl[CAST((n_pairs + 1) // 2 AS INTEGER)] AS theil_sen_slope
      |FROM m ORDER BY event_type""".stripMargin

  // ---- N28d ts_seasonal_profile: day-of-week seasonality -------------------

  /** `ts_seasonal_profile`: the weekly seasonality fingerprint — mean daily
    * event count per (event_type, ISO weekday), the profile subtracted
    * before any anomaly screen on a weekly-patterned stream. Integer daily
    * counts sum exactly; the mean is one exact-long division rounded 6 dp.
    * Spark's `weekday` (0 = Monday) + 1 ≡ DuckDB's `isodow` — pinned here
    * because the engines' default `dayofweek` anchors differ (Sunday 1 vs
    * Sunday 0), a silent cross-engine off-by-one. Fact → (type, day)
    * aggregate in one shuffle; the profile is 7 rows per type. */
  private def tsSeasonalProfile(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .groupBy(col("event_type"), (weekday(col("day")) + 1).as("isodow"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6).as("mean_count"))
      .orderBy("event_type", "isodow")

  private val tsSeasonalProfileSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(isodow(day) AS INTEGER) AS isodow,
      |       count(*) AS n_days,
      |       round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS mean_count
      |FROM daily GROUP BY 1, 2 ORDER BY event_type, isodow""".stripMargin

  // ---- N28e anomaly_seasonal: seasonality-adjusted outliers ----------------

  /** `anomaly_seasonal`: the N28 z-score screen made seasonality-aware —
    * a day is anomalous only against ITS OWN weekday's distribution
    * (Mondays vs Mondays), which is what stops the weekly pattern itself
    * from tripping the alarm. Same exact-integer cross-multiplied test
    * as anomaly_zscore but at a √2σ threshold — (n·y − Σ)² > 2·(n·Σy² − Σ²)
    * — grouped by (event_type, isodow): the per-weekday groups hold only a
    * handful of samples (4-5 days per weekday in a month), so a 2σ bar on
    * n≈5 has near-zero power; √2σ is the operating point that actually
    * separates on short seasonal windows. Daily counts are integers so
    * every term is an exact long. Two keyed aggs on tiny frames; the per-group stats row
    * broadcasts back onto ≤ one row per (type, day). */
  private def anomalySeasonal(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("dow", weekday(col("day")) + 1)
    val stats = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"),
        sum(col("y") * col("y")).as("syy"))
    daily.join(stats, Seq("event_type", "dow"))
      .filter(col("n") >= 3 &&
        (col("n") * col("y") - col("sy")) * (col("n") * col("y") - col("sy")) >
          lit(2) * (col("n") * col("syy") - col("sy") * col("sy")))
      .select(col("event_type"), col("day"), col("dow"), col("y"))
      .orderBy("event_type", "day")
  }

  private val anomalySeasonalSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |dd AS (SELECT event_type, day, y,
      |              CAST(isodow(day) AS INTEGER) AS dow FROM daily),
      |stats AS (
      |  SELECT event_type, dow, count(*) AS n, sum(y) AS sy, sum(y * y) AS syy
      |  FROM dd GROUP BY 1, 2)
      |SELECT d.event_type, d.day, d.dow, d.y
      |FROM dd d JOIN stats s ON d.event_type = s.event_type AND d.dow = s.dow
      |WHERE s.n >= 3
      |  AND (s.n * d.y - s.sy) * (s.n * d.y - s.sy)
      |      > 2 * (s.n * s.syy - s.sy * s.sy)
      |ORDER BY d.event_type, d.day""".stripMargin

  // ---- N27b growth_cumulative_users: distinct-growth curve -----------------

  /** `growth_cumulative_users`: the product growth curve — per day, how many
    * users appeared for the FIRST time and the running distinct-user total.
    * A naive per-day COUNT(DISTINCT ... WHERE ts <= day) rescans the fact
    * per day; this is the linear form: one keyed min-agg (first-seen day
    * per user), one per-day count, one prefix sum over the DAY AXIS — a
    * window over ≤ one row per day, thousands of rows at any corpus scale,
    * irrelevant to shuffle cost. All integers. */
  private def growthCumulativeUsers(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events(s, d)
      .groupBy("user_id").agg(to_date(min(col("ts"))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .orderBy("day")
  }

  private val growthCumulativeUsersSql =
    """WITH first_seen AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS day FROM events GROUP BY 1),
      |per_day AS (SELECT day, count(*) AS n_new FROM first_seen GROUP BY 1)
      |SELECT day, n_new,
      |       CAST(sum(n_new) OVER (ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cum_users
      |FROM per_day ORDER BY day""".stripMargin

  // ---- N26d window_streaks: consecutive-day engagement streaks -------------

  /** `window_streaks`: longest consecutive-DAY activity streak per user,
    * reported as the streak-length histogram — the engagement/retention
    * cut that sessionize (time-gap islands) doesn't answer. Classic
    * gaps-and-islands on the calendar: distinct (user, day) → island id =
    * epoch_day − row_number (constant within a consecutive run — pure
    * integer arithmetic), then three keyed aggs that all reuse the
    * user_id shuffle (streak length → per-user max → histogram). The fact
    * reduces to ≤ one row per (user, day) in the first agg. */
  private def windowStreaks(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ed")
    val days = events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("ed"))
      .distinct()
    days
      .withColumn("grp", col("ed") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max("len").as("best"))
      .groupBy("best").agg(count(lit(1)).as("n_users"))
      .orderBy("best")
  }

  private val windowStreaksSql =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
      |  FROM events),
      |isl AS (
      |  SELECT user_id,
      |         ed - row_number() OVER (PARTITION BY user_id ORDER BY ed) AS grp
      |  FROM days),
      |runs AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2),
      |best AS (SELECT user_id, max(len) AS best FROM runs GROUP BY 1)
      |SELECT best, count(*) AS n_users FROM best
      |GROUP BY best ORDER BY best""".stripMargin

  // ---- N27c rolling_active_users: DAU / WAU / MAU --------------------------

  /** `rolling_active_users`: the DAU/WAU/MAU panel — per day, distinct
    * users active that day, in the trailing 7 days, and in the trailing
    * 28 days. The naive per-day windowed COUNT(DISTINCT) rescans activity
    * per day; the scale form used here maps each (user, day) activity row
    * to the ≤ 7 (≤ 28) window-end days it contributes to — a MAP-SIDE
    * explode, ×7/×28 linear amplification of the per-user-day AGGREGATE
    * (already ≤ one row per user-day) — then one keyed distinct count per
    * window length. No day×activity join, no quadratic rescan. */
  private def rollingActiveUsers(s: SparkSession, d: String): DataFrame = {
    val act = events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val dau = act.groupBy("day").agg(countDistinct("user_id").as("dau"))
    def rolled(n: Int, name: String) = act
      .select(explode(sequence(col("day"), date_add(col("day"), n - 1)))
        .as("day"), col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as(name))
    dau.join(rolled(7, "wau"), "day").join(rolled(28, "mau"), "day")
      .orderBy("day")
  }

  private val rollingActiveUsersSql =
    """WITH act AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM act GROUP BY 1),
      |w AS (
      |  SELECT CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
      |           INTERVAL 1 DAY)) AS DATE) AS day, user_id FROM act),
      |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM w GROUP BY 1),
      |m AS (
      |  SELECT CAST(unnest(generate_series(day, day + INTERVAL 27 DAY,
      |           INTERVAL 1 DAY)) AS DATE) AS day, user_id FROM act),
      |mau AS (SELECT day, count(DISTINCT user_id) AS mau FROM m GROUP BY 1)
      |SELECT dau.day, dau.dau, wau.wau, mau.mau
      |FROM dau JOIN wau USING (day) JOIN mau USING (day)
      |ORDER BY day""".stripMargin

  // ---- N26e attribution_linear: multi-touch attribution --------------------

  /** `attribution_linear`: linear multi-touch attribution — each purchase's
    * value splits equally across the user's clicks in the trailing 7 days,
    * rolled up to credited revenue per CLICK day (the marketing question
    * "which day's engagement earned the money"). The purchase×click join
    * is the watermark-bounded interval shape (stream_interval_join's batch
    * twin — never unbounded fact×fact); the per-purchase touch count rides
    * a window over the purchase id (the join's own key — no new shuffle).
    * credit = round(exact-cents value / n, 6) summed in DECIMAL(18,6):
    * order-independent, one IEEE division per pair. */
  private def attributionLinear(s: SparkSession, d: String): DataFrame = {
    val p = events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value"))
    val c = events(s, d).filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val wk = expr("INTERVAL 7 DAYS")
    val wn = Window.partitionBy("p_id")
    p.join(c, Seq("user_id"))
      .filter(col("c_ts") < col("p_ts") && col("c_ts") >= col("p_ts") - wk)
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("credit",
        round(Det.dec(col("value")).cast("double") / col("n"), 6)
          .cast("decimal(18,6)"))
      .groupBy(to_date(col("c_ts")).as("day"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit")).cast("double").as("credited"))
      .orderBy("day")
  }

  private val attributionLinearSql =
    """WITH p AS (
      |  SELECT user_id, event_id AS p_id, ts AS p_ts, value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.p_id, p.value, c.c_ts,
      |         count(*) OVER (PARTITION BY p.p_id) AS n
      |  FROM p JOIN c ON p.user_id = c.user_id
      |   AND c.c_ts < p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 7 DAY)
      |SELECT CAST(c_ts AS DATE) AS day, count(*) AS n_touches,
      |  CAST(sum(CAST(round(CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) / n, 6)
      |       AS DECIMAL(18,6))) AS DOUBLE) AS credited
      |FROM j GROUP BY 1 ORDER BY day""".stripMargin

  /** `attribution_time_decay`: time-decay multi-touch attribution — the
    * complement of [[attributionLinear]]'s equal split: each purchase's
    * value splits across the user's trailing-7-day clicks in proportion to
    * 2^(−Δt/12h) (a 12-hour half-life; the touch just before the purchase
    * earns ~2× the touch 12 hours earlier). Identical scale shape to the
    * linear form: the purchase×click pairing is the watermark-bounded
    * interval join, and the per-purchase weight normalization rides a
    * window over the join's own key (no new shuffle). Determinism: Δt is
    * an exact epoch-second difference; the one libm pow() rounds 6 dp
    * BEFORE use (the idf discipline), weights sum exactly in
    * DECIMAL(18,6), each pair's credit is a fixed double sequence rounded
    * 6 dp, and the day rollup sums DECIMAL. */
  private[graft] def attributionTimeDecayOf(ev: DataFrame): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val wk = expr("INTERVAL 7 DAYS")
    val wn = Window.partitionBy("p_id")
    val dtHours = (unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
      .cast("double") / lit(3600000000.0d)
    p.join(c, Seq("user_id"))
      .filter(col("c_ts") < col("p_ts") && col("c_ts") >= col("p_ts") - wk)
      .withColumn("w",
        Det.detRound(pow(lit(0.5d), dtHours / lit(12.0d)), 6)
          .cast("decimal(18,6)"))
      .withColumn("wsum", sum(col("w")).over(wn))
      .withColumn("credit",
        Det.detRound(Det.dec(col("value")).cast("double") *
          (col("w").cast("double") / col("wsum").cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy(to_date(col("c_ts")).as("day"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit")).cast("double").as("credited"))
      .orderBy("day")
  }

  private def attributionTimeDecay(s: SparkSession, d: String): DataFrame =
    attributionTimeDecayOf(events(s, d))

  private val attributionTimeDecaySql =
    s"""WITH p AS (
      |  SELECT user_id, event_id AS p_id, ts AS p_ts, value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.p_id, p.value, c.c_ts,
      |    CAST(${Det.sqlDetRound("pow(0.5, CAST(epoch_us(p.p_ts) - epoch_us(c.c_ts) AS DOUBLE) / 3600000000.0 / 12.0)", 6)}
      |      AS DECIMAL(18,6)) AS w
      |  FROM p JOIN c ON p.user_id = c.user_id
      |   AND c.c_ts < p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 7 DAY),
      |n AS (
      |  SELECT p_id, value, c_ts, w,
      |         sum(w) OVER (PARTITION BY p_id) AS wsum
      |  FROM j)
      |SELECT CAST(c_ts AS DATE) AS day, count(*) AS n_touches,
      |  CAST(sum(CAST((round((CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE)
      |        * (CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE))) * 1000000.0)
      |        / 1000000.0 + 0.0)
      |      AS DECIMAL(18,6))) AS DOUBLE) AS credited
      |FROM n GROUP BY 1 ORDER BY day""".stripMargin

  /** `funnel_latency_percentiles`: time-to-convert distribution — exact
    * p50/p90/p99 of the click→purchase delay (each purchase's gap to the
    * user's MOST RECENT click in the trailing 7 days; the as-of shape).
    * The percentiles are EXACT ⌈q·n⌉-th order statistics picked by rank —
    * no interpolation, no t-digest estimate — because an SLO/latency
    * report that feeds an alert threshold should not carry sketch error
    * silently (the sketch path exists separately: `sketch_percentiles`).
    * Scale: the delay table is purchase-proportional; ranking rides
    * [[graft.ops.OrderedOps.globalRank]] (range-partition ranks +
    * broadcast offsets — NO single-task Window), the same machinery the
    * ntile/rfm scale twins are hash-proven on; the three rank picks are
    * integer equality filters. Delays are exact integer micros floored to
    * seconds; both engines elect identical rows. */
  private[graft] def funnelLatencyPercentilesOf(ev: DataFrame): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val wk = expr("INTERVAL 7 DAYS")
    val delays = p.join(c, Seq("user_id"))
      .filter(col("c_ts") < col("p_ts") && col("c_ts") >= col("p_ts") - wk)
      .groupBy("p_id")
      .agg(min(unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
        .as("min_us"))
      .select(col("p_id"),
        floor(col("min_us") / lit(1000000L)).as("delay_s"))
    val ranked = graft.ops.OrderedOps.globalRank(delays,
      Seq(col("delay_s"), col("p_id")))
    val n = delays.count()
    val picks = Seq(0.5, 0.9, 0.99)
      .map(q => (q, math.min(math.ceil(q * n).toLong, n)))
    picks.map { case (q, k) =>
      ranked.filter(col("g_rank") === k)
        .select(lit(q).as("pctl"), lit(n).as("n_delays"), col("delay_s"))
    }.reduce(_ unionAll _).orderBy("pctl")
  }

  private def funnelLatencyPercentiles(s: SparkSession, d: String): DataFrame =
    funnelLatencyPercentilesOf(events(s, d))

  private val funnelLatencyPercentilesSql =
    """WITH p AS (
      |  SELECT user_id, event_id AS p_id, ts AS p_ts
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
      |d AS (
      |  SELECT p_id,
      |    CAST(FLOOR(min(epoch_us(p.p_ts) - epoch_us(c.c_ts)) / 1000000)
      |      AS BIGINT) AS delay_s
      |  FROM p JOIN c ON p.user_id = c.user_id
      |   AND c.c_ts < p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 7 DAY
      |  GROUP BY 1),
      |r AS (SELECT delay_s,
      |        row_number() OVER (ORDER BY delay_s, p_id) AS rn FROM d),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      |q AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS pctl)
      |SELECT pctl, nn.n AS n_delays, r.delay_s
      |FROM q CROSS JOIN nn CROSS JOIN r
      |WHERE r.rn = least(CAST(ceil(pctl * nn.n) AS BIGINT), nn.n)
      |ORDER BY pctl""".stripMargin

  // ---- N26f event_paths_topk: top user journeys ----------------------------

  /** `event_paths_topk`: the top-10 opening user journeys — each user's
    * first three events as a path string, counted corpus-wide. One window
    * shuffle on user_id with the rank bounded to 3 (WindowGroupLimit
    * prunes map-side), the path assembled from a 3-element sorted slice
    * (bounded per user, never a whole-history collect), one keyed count,
    * total (count desc, path) order. */
  private def eventPathsTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(10)
  }

  private val eventPathsTopkSql =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS rn
      |  FROM events),
      |paths AS (
      |  SELECT user_id,
      |         array_to_string(list(event_type ORDER BY rn), '>') AS path
      |  FROM r WHERE rn <= 3 GROUP BY user_id)
      |SELECT path, count(*) AS n_users FROM paths
      |GROUP BY path ORDER BY n_users DESC, path LIMIT 10""".stripMargin

  // ---- N28f ts_changepoint: CUSUM change-point detection -------------------

  /** `ts_changepoint`: CUSUM change-point detection — per event_type, the
    * day where the cumulative deviation from the series mean peaks (the
    * classic "when did the level shift" estimator, distinct from per-day
    * anomaly FLAGS). Cross-multiplied into pure integers: with S = Σy over
    * n days, cusum_i = n·prefix_i − i·S is exact LONG arithmetic (the
    * anomaly_zscore trick applied to the prefix series), so the argmax
    * (|cusum| desc, day asc) is engine-exact with no float anywhere.
    * Day-axis window over ≤ one row per (type, day); per-type totals
    * broadcast back. */
  private def tsChangepoint(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("prefix",
        sum("y").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"))
    val wPick = Window.partitionBy("event_type")
      .orderBy(abs(col("cusum")).desc, col("day"))
    daily.join(tot, "event_type")
      .withColumn("cusum", col("n") * col("prefix") - col("i") * col("s"))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("cusum").as("cusum_peak"), col("n").as("n_days"))
      .orderBy("event_type")
  }

  private val tsChangepointSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |pre AS (
      |  SELECT event_type, day, y,
      |    CAST(row_number() OVER w AS BIGINT) AS i,
      |    sum(y) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |tot AS (SELECT event_type, count(*) AS n, sum(y) AS s
      |        FROM daily GROUP BY 1),
      |cs AS (
      |  SELECT p.event_type, p.day,
      |         t.n * p.prefix - p.i * t.s AS cusum, t.n
      |  FROM pre p JOIN tot t USING (event_type)),
      |pick AS (
      |  SELECT event_type, day, cusum, n,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY abs(cusum) DESC, day) AS rk
      |  FROM cs)
      |SELECT event_type, day AS cp_day, CAST(cusum AS BIGINT) AS cusum_peak,
      |       CAST(n AS BIGINT) AS n_days
      |FROM pick WHERE rk = 1 ORDER BY event_type""".stripMargin

  // ---- N35n ts_hampel_filter: robust rolling outlier filter ----------------

  /** `ts_hampel_filter`: the Hampel identifier — flag a point when it sits
    * more than 3 scaled MADs from its rolling median (the robust
    * alternative to rolling z-scores: one spike can't drag its own
    * threshold). Frame = the same pinned 5-row window as ts_rolling_median;
    * median AND the MAD's inner median are pure ELEMENT PICKS from sorted
    * arrays (zero arithmetic), the deviations are single IEEE subtractions
    * of raw doubles, and the comparison |x−med| > 3·1.4826·mad rounds both
    * sides to 6 dp first so the flag is cross-engine stable. One window
    * shuffle on event_type; the (type, bucket)+carry rewrite is the proven
    * 100 TB path for this family. */
  private def tsHampelFilter(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    val frame = collect_list("value").over(w.rowsBetween(-4, 0))
    events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("med", element_at(sort_array(frame), 3))
      .withColumn("mad", element_at(sort_array(transform(frame,
        x => abs(x - col("med")))), 3))
      .filter(col("rn") >= 5)
      .filter(round(abs(col("value") - col("med")), 6) >
        round(lit(3.0d) * lit(1.4826d) * col("mad"), 6))
      .select(col("event_id"), col("value"), col("med"),
        round(col("mad"), 6).as("mad"))
      .orderBy("event_id")
  }

  private val tsHampelFilterSql =
    """WITH f AS (
      |  SELECT event_id, value,
      |    row_number() OVER w AS rn,
      |    list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS frame
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
      |m AS (
      |  SELECT event_id, value, rn,
      |    list_sort(frame)[3] AS med, frame
      |  FROM f),
      |h AS (
      |  SELECT event_id, value, rn, med,
      |    list_sort(list_transform(frame, x -> abs(x - med)))[3] AS mad
      |  FROM m)
      |SELECT event_id, value, med, round(mad, 6) AS mad
      |FROM h
      |WHERE rn >= 5
      |  AND round(abs(value - med), 6) > round(3.0 * 1.4826 * mad, 6)
      |ORDER BY event_id""".stripMargin

  // ---- (type, bucket)+carry rewrite of the 5-row rolling frame -------------

  /** Exact ROWS(-4,0) frames over the events fact via (type, 6h-bucket)
    * sub-partitioning — the SCALE rewrite for [[tsRollingMedian]] /
    * [[tsHampelFilter]], whose `Window.partitionBy(event_type)` caps
    * parallelism at the type cardinality (5 — still 5 at 100 TB). A ROWS
    * frame is harder to bucket than the RANGE frame of
    * `window_range_frame_bucketed`: a row's previous-4 can reach across
    * ANY number of sparse/empty buckets, so a fixed "carry the tail of the
    * previous bucket" is lossy in general. The lossless construction:
    *
    *  1. TAILS — the last ≤4 rows of each (type, bucket). Any row that is
    *     among the last 4 of a bucket-prefix has ≤3 rows after it in that
    *     prefix, hence ≤3 after it in its OWN bucket — so the exact
    *     carry set of every bucket boundary lives inside the tails.
    *  2. SERVE RANGES — on the tails frame (≤ 4·buckets rows, bucket-count-
    *     sized, NOT fact-sized), order per type by (ts, event_id). Bucket
    *     ids are monotone along that order, so tail row r is among the
    *     last 4 rows before bucket b exactly when fewer than 4 tail rows
    *     after r precede b — i.e. b ≤ bucket(lead(r, 4)) (unbounded when
    *     fewer than 4 tails follow). The 5-partition window here touches
    *     only the tiny tails frame; the fact never sees it.
    *  3. CARRY — join tails to the distinct (type, bucket) targets they
    *     serve (both sides bucket-count-sized; targets broadcast), tag
    *     carry = true, union under the fact, and window per (type, bucket)
    *     ordered by (ts, event_id): every non-carry row now sees exactly
    *     its 4 global predecessors, so `size(frame) = 5` reproduces the
    *     naive form's `rn >= 5` partial-frame filter verbatim.
    *
    * Fact-sized work — the base scan, the tail row_number, the final
    * frame window — all partitions on (type, bucket): parallelism grows
    * with the time span instead of freezing at 5. Carry duplication is
    * ≤ 4 rows per (type, bucket). Same oracles as the naive twins: hash
    * equality IS the rewrite proof (the `window_range_frame_bucketed`
    * recipe). */
  private[graft] def rows5FrameBucketedOf(ev: DataFrame): DataFrame = {
    val bucketW = 6L * 3600L * 1000000L // 6 h of microseconds
    val base = ev
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"), col("value"))
      .withColumn("bucket", expr(s"tsu div ${bucketW}L"))
    val wTail = Window.partitionBy("event_type", "bucket")
      .orderBy(col("tsu").desc, col("event_id").desc)
    // bucket-count-sized from here down to `carries`
    val tails = base.withColumn("rnd", row_number().over(wTail))
      .filter(col("rnd") <= 4).drop("rnd")
      .localCheckpoint(false)
    val wType = Window.partitionBy("event_type").orderBy("tsu", "event_id")
    val served = tails.withColumn("serve_hi", lead("bucket", 4).over(wType))
    val targets = base
      .select(col("event_type").as("t_type"), col("bucket").as("t_bucket"))
      .distinct()
    val carries = served
      .join(broadcast(targets),
        col("event_type") === col("t_type") &&
          col("t_bucket") > col("bucket") &&
          (col("serve_hi").isNull || col("t_bucket") <= col("serve_hi")))
      .select(col("event_id"), col("event_type"), col("tsu"), col("value"),
        col("t_bucket").as("bucket"), lit(true).as("carry"))
    val wFrame = Window.partitionBy("event_type", "bucket")
      .orderBy("tsu", "event_id")
    base.withColumn("carry", lit(false)).unionByName(carries)
      .withColumn("frame",
        collect_list("value").over(wFrame.rowsBetween(-4, 0)))
      .filter(!col("carry") && size(col("frame")) === 5)
      .select("event_id", "value", "frame")
  }

  /** `ts_rolling_median_scaled`: [[tsRollingMedian]]'s result from the
    * (type, bucket)+carry frames of [[rows5FrameBucketedOf]] — identical
    * element-pick median, same oracle, parallelism types × buckets. */
  private def tsRollingMedianScaled(s: SparkSession, d: String): DataFrame =
    rows5FrameBucketedOf(
      events(s, d).select("event_id", "event_type", "ts", "value"))
      .select(col("event_id"),
        element_at(sort_array(col("frame")), 3).as("roll_med"))
      .orderBy("event_id")

  /** `ts_hampel_filter_scaled`: [[tsHampelFilter]]'s result from the same
    * bucketed frames — identical element-pick median/MAD and 6-dp-rounded
    * comparison, same oracle, parallelism types × buckets. */
  private def tsHampelFilterScaled(s: SparkSession, d: String): DataFrame =
    rows5FrameBucketedOf(
      events(s, d).select("event_id", "event_type", "ts", "value"))
      .withColumn("med", element_at(sort_array(col("frame")), 3))
      .withColumn("mad", element_at(sort_array(transform(col("frame"),
        x => abs(x - col("med")))), 3))
      .filter(round(abs(col("value") - col("med")), 6) >
        round(lit(3.0d) * lit(1.4826d) * col("mad"), 6))
      .select(col("event_id"), col("value"), col("med"),
        round(col("mad"), 6).as("mad"))
      .orderBy("event_id")

  /** N28h `ab_welch_ttest`: the A/B experiment readout — Welch's unequal-
    * variance t statistic and Welch–Satterthwaite degrees of freedom for
    * the purchase-value metric between a deterministic user split
    * (user_id parity — the hash-split every experiment platform uses,
    * no rand()). ENTIRELY libm-free: six sufficient statistics (n, Σx,
    * Σx² per arm) accumulate in exact DECIMAL inside ONE map-side-combine
    * scalar agg (6 numbers per partition at any scale), and t, dof fall
    * out as fixed sequences of +,−,×,÷,sqrt — all correctly-rounded IEEE
    * ops, bit-identical on any engine, rounded 6 dp at output only. */
  private[graft] def abWelchTtestOf(ev: DataFrame): DataFrame = {
    val xd = col("value").cast("decimal(12,2)")
    val arm = (col("user_id") % 2 === 0).cast("long")
    val stats = ev.filter(col("event_type") === "purchase")
      .select(arm.as("a"), xd.as("xd"),
        (xd * xd).cast("decimal(30,4)").as("xx"))
      .agg(
        sum(col("a")).as("n1"),
        sum(when(col("a") === 1, col("xd"))).as("s1"),
        sum(when(col("a") === 1, col("xx"))).as("ss1"),
        sum(lit(1L) - col("a")).as("n2"),
        sum(when(col("a") === 0, col("xd"))).as("s2"),
        sum(when(col("a") === 0, col("xx"))).as("ss2"))
    def m(sx: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) = sx.cast("double") / n.cast("double")
    def v(sx: org.apache.spark.sql.Column, ssx: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      (ssx.cast("double") - sx.cast("double") * sx.cast("double") /
        n.cast("double")) / (n.cast("double") - lit(1.0d))
    val se1 = v(col("s1"), col("ss1"), col("n1")) / col("n1").cast("double")
    val se2 = v(col("s2"), col("ss2"), col("n2")) / col("n2").cast("double")
    stats.select(
      col("n1").as("n_a"), col("n2").as("n_b"),
      round(m(col("s1"), col("n1")), 6).as("mean_a"),
      round(m(col("s2"), col("n2")), 6).as("mean_b"),
      round((m(col("s1"), col("n1")) - m(col("s2"), col("n2"))) /
        sqrt(se1 + se2), 6).as("t_stat"),
      round((se1 + se2) * (se1 + se2) /
        (se1 * se1 / (col("n1").cast("double") - lit(1.0d)) +
          se2 * se2 / (col("n2").cast("double") - lit(1.0d))), 6).as("dof"))
  }

  private def abWelchTtest(s: SparkSession, d: String): DataFrame =
    abWelchTtestOf(events(s, d))

  // ---- eval_subsample_ci: deterministic subsample (batch-means) CI ---------

  /** `eval_subsample_ci`: a deterministic disjoint-subsample (batch-means /
    * m-out-of-n-bootstrap-without-replacement) 95% CI for the mean purchase
    * value — the uncertainty estimate a pipeline metric owes before any
    * quality gate thresholds on it. Every row lands in one of B=32
    * replicates by CONTENT hash (no rand(), no partition-index dependence —
    * reproducible on any cluster layout); each replicate mean rides an
    * exact DECIMAL sum and rounds 6 dp into DECIMAL(18,6), so the
    * second-moment accumulation (squares, sums) stays exact and
    * order-independent; sd(replicate means)/√B estimates the SE of the
    * grand mean under equal hash splits. Scale shape: ONE fact scan into a
    * 32-key map-side-combine aggregate, then a 32-row exact reduction —
    * the driver-side stage is 32 rows at ANY corpus size (the Poisson
    * bootstrap plays the same trick with weighted replicates; the disjoint
    * split keeps it hash-provable). Final sqrt/± is a fixed IEEE sequence
    * rounded 6 dp. */
  private[graft] def evalSubsampleCiOf(ev: DataFrame): DataFrame = {
    val rep = (conv(substring(md5(col("event_id").cast("string")), 1, 8),
      16, 10).cast("long") % 32).as("rep")
    val reps = ev.filter(col("event_type") === "purchase")
      .select(rep, Det.dec(col("value")).as("xd"))
      .groupBy("rep")
      .agg(round(sum(col("xd")).cast("double") / count(lit(1)), 6)
        .cast("decimal(18,6)").as("mean_r"))
    val st = reps.agg(
      count(lit(1)).as("b"),
      sum(col("mean_r")).as("sm"),
      sum((col("mean_r") * col("mean_r")).cast("decimal(38,12)")).as("smm"))
    val bd = col("b").cast("double")
    val mbar = col("sm").cast("double") / bd
    val varMeans = (col("smm").cast("double") - bd * mbar * mbar) /
      (bd - lit(1.0d))
    val se = sqrt(varMeans / bd)
    st.select(
      col("b"),
      round(mbar, 6).as("mean_value"),
      round(se, 6).as("se"),
      round(mbar - lit(1.96d) * se, 6).as("ci_lo"),
      round(mbar + lit(1.96d) * se, 6).as("ci_hi"))
  }

  private def evalSubsampleCi(s: SparkSession, d: String): DataFrame =
    evalSubsampleCiOf(events(s, d))

  private val evalSubsampleCiSql =
    """WITH f AS (
      |  SELECT CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
      |           AS BIGINT) % 32 AS rep,
      |         CAST(value AS DECIMAL(12,2)) AS xd
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT rep,
      |    CAST(round(CAST(sum(xd) AS DOUBLE) / count(*), 6)
      |      AS DECIMAL(18,6)) AS mean_r
      |  FROM f GROUP BY 1),
      |st AS (
      |  SELECT CAST(count(*) AS BIGINT) AS b,
      |         sum(mean_r) AS sm,
      |         sum(CAST(mean_r * mean_r AS DECIMAL(38,12))) AS smm
      |  FROM r)
      |SELECT b,
      |  round(CAST(sm AS DOUBLE) / CAST(b AS DOUBLE), 6) AS mean_value,
      |  round(sqrt(((CAST(smm AS DOUBLE)
      |      - CAST(b AS DOUBLE) * (CAST(sm AS DOUBLE) / CAST(b AS DOUBLE))
      |        * (CAST(sm AS DOUBLE) / CAST(b AS DOUBLE)))
      |      / (CAST(b AS DOUBLE) - 1.0)) / CAST(b AS DOUBLE)), 6) AS se,
      |  round(CAST(sm AS DOUBLE) / CAST(b AS DOUBLE)
      |    - 1.96 * sqrt(((CAST(smm AS DOUBLE)
      |      - CAST(b AS DOUBLE) * (CAST(sm AS DOUBLE) / CAST(b AS DOUBLE))
      |        * (CAST(sm AS DOUBLE) / CAST(b AS DOUBLE)))
      |      / (CAST(b AS DOUBLE) - 1.0)) / CAST(b AS DOUBLE)), 6) AS ci_lo,
      |  round(CAST(sm AS DOUBLE) / CAST(b AS DOUBLE)
      |    + 1.96 * sqrt(((CAST(smm AS DOUBLE)
      |      - CAST(b AS DOUBLE) * (CAST(sm AS DOUBLE) / CAST(b AS DOUBLE))
      |        * (CAST(sm AS DOUBLE) / CAST(b AS DOUBLE)))
      |      / (CAST(b AS DOUBLE) - 1.0)) / CAST(b AS DOUBLE)), 6) AS ci_hi
      |FROM st""".stripMargin

  private val abWelchTtestSql =
    """WITH f AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a,
      |         CAST(value AS DECIMAL(12,2)) AS xd,
      |         CAST(CAST(value AS DECIMAL(12,2))
      |              * CAST(value AS DECIMAL(12,2)) AS DECIMAL(30,4)) AS xx
      |  FROM events WHERE event_type = 'purchase'),
      |st AS (
      |  SELECT CAST(sum(a) AS BIGINT) AS n1,
      |         sum(CASE WHEN a = 1 THEN xd END) AS s1,
      |         sum(CASE WHEN a = 1 THEN xx END) AS ss1,
      |         CAST(sum(1 - a) AS BIGINT) AS n2,
      |         sum(CASE WHEN a = 0 THEN xd END) AS s2,
      |         sum(CASE WHEN a = 0 THEN xx END) AS ss2
      |  FROM f),
      |d AS (
      |  SELECT n1, n2,
      |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
      |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
      |    ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |        / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))
      |      / CAST(n1 AS DOUBLE) AS se1,
      |    ((CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
      |        / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0))
      |      / CAST(n2 AS DOUBLE) AS se2
      |  FROM st)
      |SELECT n1 AS n_a, n2 AS n_b,
      |  round(m1, 6) AS mean_a, round(m2, 6) AS mean_b,
      |  round((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
      |  round((se1 + se2) * (se1 + se2)
      |        / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
      |           + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)), 6) AS dof
      |FROM d""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "ab_welch_ttest" -> Q(abWelchTtest, Some(abWelchTtestSql)),
    "eval_subsample_ci" -> Q(evalSubsampleCi, Some(evalSubsampleCiSql)),
    "attribution_time_decay" ->
      Q(attributionTimeDecay, Some(attributionTimeDecaySql)),
    "funnel_latency_percentiles" ->
      Q(funnelLatencyPercentiles, Some(funnelLatencyPercentilesSql)),
    "rolling_active_users" -> Q(rollingActiveUsers, Some(rollingActiveUsersSql)),
    "attribution_linear" -> Q(attributionLinear, Some(attributionLinearSql)),
    "event_paths_topk" -> Q(eventPathsTopk, Some(eventPathsTopkSql)),
    "ts_autocorr" -> Q(tsAutocorr, Some(tsAutocorrSql)),
    "ts_theil_sen" -> Q(tsTheilSen, Some(tsTheilSenSql)),
    "ts_ols_trend" -> Q(tsOlsTrend, Some(tsOlsTrendSql)),
    "ts_seasonal_profile" -> Q(tsSeasonalProfile, Some(tsSeasonalProfileSql)),
    "anomaly_seasonal" -> Q(anomalySeasonal, Some(anomalySeasonalSql)),
    "growth_cumulative_users" -> Q(growthCumulativeUsers, Some(growthCumulativeUsersSql)),
    "window_streaks" -> Q(windowStreaks, Some(windowStreaksSql)),
    "event_pattern_match" -> Q(eventPatternMatch, Some(eventPatternMatchSql)),
    "ts_rolling_median" -> Q(tsRollingMedian, Some(tsRollingMedianSql)),
    "ts_rolling_median_scaled" ->
      Q(tsRollingMedianScaled, Some(tsRollingMedianSql)),
    "ts_hampel_filter" -> Q(tsHampelFilter, Some(tsHampelFilterSql)),
    "ts_hampel_filter_scaled" ->
      Q(tsHampelFilterScaled, Some(tsHampelFilterSql)),
    "ts_changepoint" -> Q(tsChangepoint, Some(tsChangepointSql)),
    "funnel_steps" -> Q(funnelSteps, Some(funnelStepsSql)),
    "sketch_theta_overlap" -> Q(sketchThetaOverlap, Some(sketchThetaOverlapSql)),
    "cohort_retention" -> Q(cohortRetention, Some(cohortRetentionSql)),
    "anomaly_zscore" -> Q(anomalyZscore, Some(anomalyZscoreSql)),
    "ts_ewma" -> Q(tsEwma, Some(tsEwmaSql)),
    "anomaly_mad" -> Q(anomalyMad, Some(anomalyMadSql)),
    "event_transitions" -> Q(eventTransitions, Some(eventTransitionsSql)),
    "ts_dist_drift" -> Q(tsDistDrift, Some(tsDistDriftSql)),
    "sessionize_events" -> Q(sessionizeEvents, Some(sessionizeEventsSql)),
    "funnel_windowed" -> Q(funnelWindowed, Some(funnelWindowedSql)))
}
