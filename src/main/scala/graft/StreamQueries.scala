package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Det._

/** SURVEY.md §2.9: the reference is a timer-triggered micro-batch pipeline
  * (function.json:6) with DB-constraint dedup (database.py:71,87). These are
  * the BATCH-EQUIVALENT forms over `events` so the DuckDB oracle applies; the
  * true `readStream` variants live in [[graft.streaming.StreamOps]] and are
  * asserted equivalent in StreamOpsSpec via MemoryStream.
  *
  * Window-start columns are emitted as epoch SECONDS (bigint) — unambiguous
  * across engines, no tz-aware/naive drift.
  */
object StreamQueries {
  import Tables._

  // ---- T2 stream_tumbling_count --------------------------------------------

  /** Tumbling 1-day window per event_type — Spark's window() operator; the
    * oracle reproduces its epoch-aligned bucketing with date_trunc. */
  private def tumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total_value"))
      .select(unix_timestamp(col("w.start")).as("day_epoch"),
        col("event_type"), col("cnt"), col("total_value"))
      .orderBy("day_epoch", "event_type")

  private val tumblingSql =
    s"""SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
       |       event_type, count(*) AS cnt, ${sqlDsum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY day_epoch, event_type""".stripMargin

  // ---- T3 stream_sliding_avg -----------------------------------------------

  /** Sliding 1-hour window every 15 minutes: each event lands in 4 windows.
    * The oracle expands the same 4 epoch-aligned starts per event. */
  private def sliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), davg(col("value")).as("avg_value"))
      .select(unix_timestamp(col("w.start")).as("win_epoch"), col("cnt"),
        col("avg_value"))
      .orderBy("win_epoch")

  private val slidingSql =
    """WITH offs(o) AS (VALUES (0), (1), (2), (3)),
      |win AS (
      |  SELECT 900 * CAST(floor(epoch(ts) / 900) AS BIGINT) - o * 900 AS win_epoch,
      |         value
      |  FROM events, offs)
      |SELECT win_epoch, count(*) AS cnt,
      |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(value) AS avg_value
      |FROM win GROUP BY win_epoch ORDER BY win_epoch""".stripMargin

  // ---- T4 stream_session_window --------------------------------------------

  /** 30-minute-gap session windows per user (session_window operator); the
    * oracle is the classic gaps-and-islands rewrite. A new session starts
    * when the gap is >= the timeout (Spark's window is [ts, ts+gap)). */
  private def session(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  private val sessionSql =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
      |       count(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---- T6 stream_dedup -----------------------------------------------------

  /** Streaming keep-first dedup (DB unique constraints, database.py:71,87)
    * batchwise: first event id per (user, type) — deterministic, unlike
    * dropDuplicates' arbitrary survivor. */
  private def dedup(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id", "event_type")
      .agg(min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("n_seen"))
      .orderBy("user_id", "event_type")

  private val dedupSql =
    """SELECT user_id, event_type, min(event_id) AS first_event_id,
      |       count(*) AS n_seen
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  // ---- T9 stream_interval_join ---------------------------------------------

  /** Batch twin of [[graft.streaming.StreamOps.purchasesWithRecentClicks]]
    * (stream-stream interval join, watermark-bounded state): each purchase
    * paired with the same user's clicks in the preceding hour. The
    * streaming form is asserted row-equal over MemoryStream in
    * StreamOpsSpec; this registry form pins the SEMANTICS against DuckDB.
    * Scale: one shuffle on user_id each side; the time band bounds the
    * per-key pairing exactly like the watermark bounds streaming state. */
  private def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(clicks, "user_id")
      .filter(col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_secs"))
      .orderBy("user_id", "purchase_id", "click_id")
  }

  private val intervalJoinSql =
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
      |       CAST(floor(epoch(p.ts)) AS BIGINT)
      |         - CAST(floor(epoch(c.ts)) AS BIGINT) AS lag_secs
      |FROM events p JOIN events c ON p.user_id = c.user_id
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY 1, 2, 3""".stripMargin

  // ---- T9b stream_interval_join_outer --------------------------------------

  /** Batch twin of [[graft.streaming.StreamOps.purchasesWithRecentClicksOuter]]
    * — the LEFT OUTER interval join: EVERY purchase emits, clickless ones
    * with null click_id/lag (attribution dashboards need the unconverted
    * denominator, not just the matches). Null click_ids order first on
    * both engines (explicit NULLS FIRST — Spark's asc default, pinned in
    * the oracle). Same single user_id shuffle per side as the inner form. */
  private def intervalJoinOuter(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"),
      "left_outer")
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_secs"))
      .orderBy(col("user_id"), col("purchase_id"), col("click_id").asc_nulls_first)
  }

  private val intervalJoinOuterSql =
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
      |       CAST(floor(epoch(p.ts)) AS BIGINT)
      |         - CAST(floor(epoch(c.ts)) AS BIGINT) AS lag_secs
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY 1, 2, 3 NULLS FIRST""".stripMargin

  // ---- T9c stream_interval_join_semi ---------------------------------------

  /** Batch twin of [[graft.streaming.StreamOps.purchasesWithRecentClicksSemi]]
    * — the LEFT SEMI interval join: purchases with ≥1 click in the
    * preceding hour, each emitted ONCE (the conversion-detection shape;
    * semi semantics keep the click fan-out out of the result, so no
    * downstream dropDuplicates pass and no duplicate state). Completes the
    * inner/left-outer/left-semi interval-join matrix. Scale: identical
    * join geometry to T9 — one user_id shuffle per side, time band bounds
    * per-key pairing — but the probe side short-circuits on first match. */
  private def intervalJoinSemi(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"),
      "left_semi")
      .select(col("user_id"), col("purchase_id"))
      .orderBy("user_id", "purchase_id")
  }

  private val intervalJoinSemiSql =
    """SELECT p.user_id, p.event_id AS purchase_id
      |FROM events p
      |WHERE p.event_type = 'purchase'
      |  AND EXISTS (SELECT 1 FROM events c
      |              WHERE c.event_type = 'click' AND c.user_id = p.user_id
      |                AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
      |ORDER BY 1, 2""".stripMargin

  // ---- T10 stream_topk_trend -----------------------------------------------

  /** Batch twin of [[graft.streaming.StreamOps.trendingTopK]] — the
    * "trending now" dashboard: top-3 event types per tumbling day by count
    * (ties broken by event_type, so the answer is deterministic). The
    * streaming form keeps ONLY the watermarked windowed count as stateful
    * work and ranks per trigger in foreachBatch over the delta'd windows;
    * StreamOpsSpec asserts the streamed store row-equals this query.
    * Scale: ranking input is (windows × types) — aggregate-sized, never
    * event-sized, so the per-window sort is over a handful of rows. */
  private def topkTrend(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = events(s, d)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("day_epoch"),
        col("event_type"), col("cnt"))
    counts
      .withColumn("rank", row_number().over(Window.partitionBy("day_epoch")
        .orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rank") <= 3)
      .orderBy("day_epoch", "rank")
  }

  private val topkTrendSql =
    """WITH counts AS (
      |  SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
      |         event_type, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT day_epoch, event_type, cnt,
      |         CAST(row_number() OVER (PARTITION BY day_epoch
      |           ORDER BY cnt DESC, event_type) AS INTEGER) AS rank
      |  FROM counts)
      |SELECT day_epoch, event_type, cnt, rank FROM ranked
      |WHERE rank <= 3 ORDER BY day_epoch, rank""".stripMargin

  // ---- registry ------------------------------------------------------------

  // ---- stream_distinct_sketch: per-window approx-distinct state ------------

  /** Per-day distinct users through the THETA sketch in streaming state
    * ([[graft.streaming.StreamOps.distinctUsersDaily]] — the sketch is the
    * agg buffer, merged losslessly across micro-batches; KBs of state per
    * window instead of O(users)). This batch form shares the transform
    * (watermark eliminates in batch); oracle-exact because the sketch is
    * exact below 4096 retained keys — the driver SFs top out at 1 500. */
  /** r11 bound form: the r10 oracle asserted the theta estimate EQUALS the
    * exact per-day distinct — true only in the sketch's exact mode
    * (< 4096 nominal entries). The sf1 rehearsal has ~13k users/day and
    * the estimate drifted by a few counts, failing the hash. The hashed
    * payload is now the exact per-day distinct (recomputed batch-side in
    * the same plan — the STREAMING side keeps sketch state, which is the
    * operator's whole point) plus a boolean |est − exact| ≤ 0.05·exact
    * (3σ at lgK 12, rse ≈ 1.56%). StreamOpsSpec still proves stream ≡
    * batch on the sketch itself. */
  private def distinctSketch(s: SparkSession, d: String): DataFrame = {
    val est = graft.streaming.StreamOps.distinctUsersDaily(events(s, d))
      .select(unix_timestamp(col("day_start")).as("day_epoch"),
        col("n_users").as("n_users_est"), col("n_events"))
    val exact = events(s, d)
      .groupBy(window(col("ts"), "1 day"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"))
      .select(unix_timestamp(col("window.start")).as("day_epoch"),
        col("n_users_exact"))
    est.join(exact, Seq("day_epoch"))
      .select(col("day_epoch"), col("n_events"), col("n_users_exact"),
        (abs(col("n_users_est").cast("double") -
          col("n_users_exact").cast("double")) <=
          lit(0.05) * col("n_users_exact").cast("double")).as("sketch_ok"))
      .orderBy("day_epoch")
  }

  private val distinctSketchSql =
    """SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
      |       count(*) AS n_events,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
      |       TRUE AS sketch_ok
      |FROM events GROUP BY 1 ORDER BY day_epoch""".stripMargin

  // ---- T11 stream_static_join ----------------------------------------------

  /** Batch twin of [[graft.streaming.StreamOps.staticEnrich]] — events
    * enriched with the nation dim (user_id-keyed lookup) and rolled into
    * per-day per-nation counts and exact-decimal value totals. The oracle
    * replays the identical join + epoch-aligned bucketing; StreamOpsSpec
    * asserts the MemoryStream form row-equals this one. */
  private def staticJoin(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamOps.staticEnrich(events(s, d), nation(s, d))
      .select(unix_timestamp(col("day_start")).as("day_epoch"),
        col("n_name"), col("cnt"), col("total_value"))
      .orderBy("day_epoch", "n_name")

  private val staticJoinSql =
    s"""SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
       |       n_name, count(*) AS cnt, ${sqlDsum("value")} AS total_value
       |FROM events JOIN nation ON user_id % 25 = n_nationkey
       |GROUP BY 1, 2 ORDER BY day_epoch, n_name""".stripMargin

  // ---- T12 stream_decontam_bloom -------------------------------------------

  /** Batch-equivalent form of [[graft.streaming.StreamOps.decontamStreamBloom]]
    * (stream ≡ batch asserted in StreamOpsSpec): eval-set Bloom built once
    * distributed, corpus grams gated by the literal filter, exact-verify
    * broadcast join, per-doc aggregation of the emitted pairs. Same oracle
    * as decontam_overlap/decontam_bloom — the streaming plumbing must not
    * change the answer. */
  private def streamDecontamBloom(s: SparkSession, d: String): DataFrame = {
    val docs = fanOut(documents(s, d))
    val bench = docs.filter(col("doc_id") % 53 === 0)
      .select(explode(array_distinct(
        graft.TrainDataQueries.gramsOf(col("text"), 5))).as("gram"))
      .distinct().localCheckpoint(false)
    val bloom = graft.ops.BloomOps.build(bench, col("gram"), 1L << 16, 0.01)
    graft.streaming.StreamOps.decontamStreamBloom(
        docs.filter(col("doc_id") % 53 =!= 0), bloom, bench)
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  // ---- T5 stream_watermark_sim ---------------------------------------------

  /** T5 batch twin: Structured Streaming's watermark late-data semantics,
    * simulated at BATCH GRANULARITY exactly as Spark applies them — the
    * watermark for micro-batch k is max(event time seen in batches < k)
    * minus the delay, advanced only at batch boundaries, and an event is
    * late-dropped iff its time is below its batch's watermark. The replay
    * log's arrival order is event_id with a deterministic straggler
    * perturbation (every 19th event arrives ~7 micro-batches late — hours
    * of lateness against a 1 h watermark, so stragglers drop while
    * in-order events never do). This is the oracle-checked analog of the
    * MemoryStream watermark spec (StreamOpsSpec): the SPEC proves Spark's
    * streaming runtime drops these rows; THIS query proves our batch
    * statement of the rule agrees with an independent engine on every
    * event. 100 TB shape: per-batch maxima (state-cardinality rows), a
    * batch-domain running max — never a per-event global window — and a
    * broadcast join back to the fact; the fact crosses the cluster once. */
  private def watermarkSim(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val delay = 3600L
    val ev = events(s, d).select(
      col("event_type"),
      unix_timestamp(col("ts")).as("tse"),
      floor((col("event_id") +
        when(col("event_id") % 19 === 0, 700L).otherwise(0L)) / 100)
        .cast("long").as("batch"))
    val batchMax = ev.groupBy("batch").agg(max(col("tse")).as("bmax"))
    // batch-domain running max (rows = micro-batch count, not events)
    val wm = batchMax.withColumn("wm",
      max(col("bmax")).over(Window.orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, -1)) - delay)
      .select("batch", "wm")
    ev.join(broadcast(wm), Seq("batch"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("wm").isNotNull && col("tse") < col("wm"), 1L)
          .otherwise(0L)).as("n_dropped"))
      .orderBy("event_type")
  }

  private val watermarkSimSql =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS tse,
      |    CAST(floor((event_id + CASE WHEN event_id % 19 = 0
      |      THEN 700 ELSE 0 END) / 100) AS BIGINT) AS batch
      |  FROM events),
      |bm AS (SELECT batch, max(tse) AS bmax FROM ev GROUP BY 1),
      |wm AS (SELECT batch, max(bmax) OVER (ORDER BY batch
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 3600 AS wm
      |  FROM bm)
      |SELECT event_type, count(*) AS n_total,
      |  CAST(sum(CASE WHEN wm IS NOT NULL AND tse < wm THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_dropped
      |FROM ev JOIN wm USING (batch)
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "stream_watermark_sim" -> Q(watermarkSim, Some(watermarkSimSql)),
    "stream_tumbling_count" -> Q(tumbling, Some(tumblingSql)),
    "stream_decontam_bloom" ->
      Q(streamDecontamBloom, Some(graft.TrainDataQueries.decontamOverlapSql)),
    "stream_static_join" -> Q(staticJoin, Some(staticJoinSql)),
    "stream_distinct_sketch" -> Q(distinctSketch, Some(distinctSketchSql)),
    "stream_sliding_avg" -> Q(sliding, Some(slidingSql)),
    "stream_session_window" -> Q(session, Some(sessionSql)),
    "stream_dedup" -> Q(dedup, Some(dedupSql)),
    "stream_interval_join" -> Q(intervalJoin, Some(intervalJoinSql)),
    "stream_interval_join_outer" -> Q(intervalJoinOuter, Some(intervalJoinOuterSql)),
    "stream_interval_join_semi" -> Q(intervalJoinSemi, Some(intervalJoinSemiSql)),
    "stream_topk_trend" -> Q(topkTrend, Some(topkTrendSql)),
  )
}
