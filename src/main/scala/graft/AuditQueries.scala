package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Operational data-integrity queries: the replication-validation and
  * CDC-regression checks a production pipeline runs around every load
  * (the reference's SELECT-before-INSERT guard, database.py:116-123, grown
  * into set-wise auditing).
  *
  * Scale notes (100 TB): the checksum is a single scan + one scalar
  * aggregate (order-independent by construction — commutative sum of
  * per-row hashes — so it parallelizes and merges freely across partitions
  * and even across incremental runs); the snapshot diff is ONE full-outer
  * equi join on the key — with both snapshots bucketed on the key it plans
  * shuffle-free.
  */
object AuditQueries {
  import Tables._

  /** `audit_checksum`: order-independent content fingerprint of lineitem —
    * row count plus the sum of each row's md5-prefix hash, over a
    * cross-engine-stable serialization (integers, strings, and doubles via
    * DECIMAL(12,2), joined with '|'). Any row added, dropped, or mutated
    * moves the sum; partition order and merge order cannot. Spark parses
    * the 8-hex prefix with conv(); DuckDB casts '0x'-prefixed hex — same
    * 32-bit value, summed in BIGINT (no overflow below 2^31 rows). */
  private[graft] def auditChecksumOf(li: DataFrame): DataFrame =
    li.select(conv(substring(md5(concat_ws("|",
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity").cast("decimal(12,2)"))), 1, 8), 16, 10)
        .cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))

  private def auditChecksum(s: SparkSession, d: String): DataFrame =
    auditChecksumOf(lineitem(s, d))

  private val auditChecksumSql =
    """SELECT count(*) AS n_rows,
      |       CAST(SUM(CAST('0x' || substring(md5(
      |         l_orderkey || '|' || l_linenumber || '|' || l_returnflag || '|'
      |           || CAST(l_quantity AS DECIMAL(12,2))), 1, 8) AS BIGINT))
      |         AS BIGINT) AS checksum
      |FROM lineitem""".stripMargin

  /** `table_diff`: CDC-style snapshot diff — two deterministic "versions"
    * of orders (keys % 97 = 0 exist only in the new snapshot, % 101 = 0
    * only in the old, % 53 = 0 get a price mutation) full-outer-joined on
    * the key and bucketed into added / removed / changed / same, with a
    * per-status key sum so the partition itself is verified, not just its
    * size. The data-regression check every pipeline migration runs. */
  /** `cdc_apply`: apply a change-data-capture log (upserts + deletes) onto
    * a keyed snapshot — the MERGE primitive every lakehouse table
    * maintenance job runs (Delta/Iceberg MERGE INTO; the reference's
    * SQL-side upsert, database.py:116-123, generalized to include
    * deletes). The changelog here is derived deterministically from the
    * snapshot (keys ≡0 mod 97 → DELETE; mod 13 → UPDATE price ×1.10 in
    * exact DECIMAL), so the oracle can replay the identical merge. Plan:
    * ONE full-outer-shaped pass — snapshot LEFT joins the changelog on the
    * key (the changelog is fact-proportional at scale, so this is a keyed
    * shuffle join, NOT a broadcast; inserts would ride the same join's
    * right-outer leg), deletes drop, updates coalesce, and the result
    * reduces to an auditable summary (row counts by disposition + the
    * exact post-merge price mass). At 100 TB both sides bucket on the key
    * and the join plans shuffle-free (the J9 layout). */
  private[graft] def cdcApplyOf(o: DataFrame): DataFrame = {
    val snap = o.select(col("o_orderkey").as("k"),
      Det.dec(col("o_totalprice")).as("price"))
    val log = snap
      .filter(col("k") % 97 === 0 || col("k") % 13 === 0)
      .select(col("k").as("ck"),
        when(col("k") % 97 === 0, "D").otherwise("U").as("op"),
        (col("price") * lit(new java.math.BigDecimal("1.10"))
          .cast("decimal(12,2)")).as("new_price"))
    snap.join(log, col("k") === col("ck"), "left_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k"),
        when(col("op") === "U", lit(1L)).otherwise(lit(0L)).as("updated"),
        when(col("op") === "U", col("new_price").cast("decimal(16,4)"))
          .otherwise(col("price").cast("decimal(16,4)")).as("eff_price"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("updated")).as("n_updated"),
        sum(col("eff_price")).cast("double").as("total_price_after"))
  }

  private def cdcApply(s: SparkSession, d: String): DataFrame =
    cdcApplyOf(orders(s, d))

  private val cdcApplySql =
    """WITH snap AS (
      |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS price
      |  FROM orders),
      |log AS (
      |  SELECT k AS ck,
      |    CASE WHEN k % 97 = 0 THEN 'D' ELSE 'U' END AS op,
      |    price * CAST(1.10 AS DECIMAL(12,2)) AS new_price
      |  FROM snap WHERE k % 97 = 0 OR k % 13 = 0)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_updated,
      |  CAST(sum(CASE WHEN op = 'U' THEN CAST(new_price AS DECIMAL(16,4))
      |    ELSE CAST(price AS DECIMAL(16,4)) END) AS DOUBLE)
      |    AS total_price_after
      |FROM snap LEFT JOIN log ON k = ck
      |WHERE op IS NULL OR op <> 'D'""".stripMargin

  private[graft] def tableDiffOf(o: DataFrame): DataFrame = {
    val oldT = o.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("old_price"))
    val newT = o.filter(col("o_orderkey") % 101 =!= 0)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 53 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")).as("new_price"))
    oldT.join(newT, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("old_price").isNull, "added")
          .when(col("new_price").isNull, "removed")
          .when(col("old_price") =!= col("new_price"), "changed")
          .otherwise("same").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"))
      .orderBy("status")
  }

  private def tableDiff(s: SparkSession, d: String): DataFrame =
    tableDiffOf(orders(s, d))

  private val tableDiffSql =
    """WITH old_t AS (
      |  SELECT o_orderkey AS k, o_totalprice AS old_price
      |  FROM orders WHERE o_orderkey % 97 <> 0),
      |new_t AS (
      |  SELECT o_orderkey AS k,
      |         CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice + 1
      |              ELSE o_totalprice END AS new_price
      |  FROM orders WHERE o_orderkey % 101 <> 0),
      |diff AS (
      |  SELECT coalesce(o.k, n.k) AS k,
      |         CASE WHEN o.k IS NULL THEN 'added'
      |              WHEN n.k IS NULL THEN 'removed'
      |              WHEN o.old_price <> n.new_price THEN 'changed'
      |              ELSE 'same' END AS status
      |  FROM old_t o FULL OUTER JOIN new_t n ON o.k = n.k)
      |SELECT status, count(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
      |FROM diff GROUP BY status ORDER BY status""".stripMargin

  /** `profile_table`: the data-profiling scan a pipeline runs on every new
    * source — per-column null counts, bounds, distinct cardinalities, and a
    * row count — unpivoted with `stack` into one labeled row per column so
    * any cross-engine divergence pinpoints the exact (column, measure) cell
    * (the r06 single-wide-row form failed the driver hash with no way to
    * tell WHICH of 9 cells differed). Bounds are reported as strings —
    * bigint/date/decimal all render identically on both engines — and the
    * double is profiled through its exact DECIMAL(12,2) view. The `_rows`
    * row carries the table row count in n_distinct.
    *
    * Plan shape: the exact count-distincts go in their OWN scalar aggregate,
    * cross-joined (1 row × 1 row) with the non-distinct measures. Fusing
    * them puts every min/max/sum through the 5× Expand rows Spark plans for
    * a 4-way multi-distinct — measured 3× slower than the two-scan split at
    * sf0.1. At 100 TB the answer is not the split but
    * `profile_table_approx`: approx_count_distinct needs no Expand, so ALL
    * measures fuse back into one single-pass scalar aggregate — the
    * declared scale path. */
  private def profileAgg(s: SparkSession, d: String, approx: Boolean) = {
    def nd(c: org.apache.spark.sql.Column) =
      if (approx) approx_count_distinct(c) else countDistinct(c)
    val nds = Seq(
      nd(col("o_custkey")).as("ck_nd"),
      nd(col("o_orderdate")).as("dt_nd"),
      nd(col("o_orderpriority")).as("pr_nd"),
      nd(col("o_totalprice").cast("decimal(12,2)")).as("tp_nd"))
    val rest = Seq(
      count(lit(1)).as("n_rows"),
      sum(col("o_custkey").isNull.cast("long")).as("ck_nulls"),
      min(col("o_custkey")).cast("string").as("ck_lo"),
      max(col("o_custkey")).cast("string").as("ck_hi"),
      sum(col("o_orderdate").isNull.cast("long")).as("dt_nulls"),
      min(col("o_orderdate")).cast("date").cast("string").as("dt_lo"),
      max(col("o_orderdate")).cast("date").cast("string").as("dt_hi"),
      sum(col("o_orderpriority").isNull.cast("long")).as("pr_nulls"),
      min(col("o_orderpriority")).as("pr_lo"),
      max(col("o_orderpriority")).as("pr_hi"),
      sum(col("o_totalprice").isNull.cast("long")).as("tp_nulls"),
      min(col("o_totalprice").cast("decimal(12,2)")).cast("string").as("tp_lo"),
      max(col("o_totalprice").cast("decimal(12,2)")).cast("string").as("tp_hi"))
    val o = orders(s, d)
    if (approx) o.agg((nds ++ rest).head, (nds ++ rest).tail: _*)
    else o.agg(rest.head, rest.tail: _*)
      .crossJoin(o.agg(nds.head, nds.tail: _*))
  }

  private val profileStack =
    """stack(5,
      |  '_rows',           0L,       n_rows, CAST(NULL AS STRING), CAST(NULL AS STRING),
      |  'o_custkey',       ck_nulls, ck_nd,  ck_lo, ck_hi,
      |  'o_orderdate',     dt_nulls, dt_nd,  dt_lo, dt_hi,
      |  'o_orderpriority', pr_nulls, pr_nd,  pr_lo, pr_hi,
      |  'o_totalprice',    tp_nulls, tp_nd,  tp_lo, tp_hi
      |) AS (col_name, n_nulls, n_distinct, lo, hi)""".stripMargin

  private def profileTable(s: SparkSession, d: String): DataFrame =
    profileAgg(s, d, approx = false)
      .selectExpr(profileStack).orderBy("col_name")

  /** `profile_table_approx`: same scan, count(DISTINCT) swapped for the
    * mergeable HLL sketch — the shape that survives 100 TB (no per-group
    * exact-distinct expansion). No DuckDB oracle (estimator internals
    * differ by engine); OpProps bounds its error against the exact profile. */
  private def profileTableApprox(s: SparkSession, d: String): DataFrame =
    profileAgg(s, d, approx = true)
      .selectExpr(profileStack).orderBy("col_name")

  /** `dq_freshness`: per-stream staleness audit — the operational check a
    * pipeline owes its consumers before anyone trains on or dashboards a
    * feed: for every event type, how many events, when did the LAST one
    * land, how far behind the freshest stream is it (lag), and a stale
    * bit at the 24 h SLA. The reference clock is the corpus-wide max
    * timestamp (self-relative — the audit is reproducible with no wall
    * clock in the plan, the determinism rule every query here obeys).
    * All integer arithmetic on epoch micros with exact `div` lag
    * bucketing — no float time math. Scale: ONE scan into a type-keyed
    * (count, max) agg with map-side combine; the reference clock is a
    * one-row broadcast back onto the type-sized table. */
  private[graft] def dqFreshnessOf(ev: DataFrame): DataFrame = {
    val base = ev.select(col("event_type"), unix_micros(col("ts")).as("us"))
    val per = base.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max(col("us")).as("last_us"))
    per.crossJoin(broadcast(base.agg(max(col("us")).as("ref_us"))))
      .select(col("event_type"), col("n_events"),
        expr("last_us div 1000000").as("last_epoch_s"),
        expr("(ref_us - last_us) div 3600000000").as("lag_hours"),
        (expr("(ref_us - last_us) div 3600000000") >= 24L).as("stale"))
      .orderBy("event_type")
  }

  private def dqFreshness(s: SparkSession, d: String): DataFrame =
    dqFreshnessOf(events(s, d))

  private val dqFreshnessSql =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
      |per AS (
      |  SELECT event_type, count(*) AS n_events,
      |         CAST(max(us) AS BIGINT) AS last_us
      |  FROM e GROUP BY 1),
      |ref AS (SELECT CAST(max(us) AS BIGINT) AS ref_us FROM e)
      |SELECT event_type, n_events,
      |  last_us // 1000000 AS last_epoch_s,
      |  (ref_us - last_us) // 3600000000 AS lag_hours,
      |  (ref_us - last_us) // 3600000000 >= 24 AS stale
      |FROM per, ref ORDER BY event_type""".stripMargin

  /** `dq_key_discovery`: candidate-key profiling — which column (sets)
    * uniquely identify a row: the audit run before declaring a MERGE/upsert
    * business key (the reference hard-codes its unique constraints,
    * database.py:80-88; this DISCOVERS them). Per candidate: row count,
    * exact distinct count, is-key bit, uniqueness ratio. Exact distincts
    * here (each one keyed-agg shaped, map-side combined); at 100 TB the
    * cheap first pass is approx_count_distinct over ALL candidates in one
    * scan (the profile_table_approx shape) with the exact confirm run only
    * on candidates the sketch puts near 1.0. */
  private def dqKeyDiscovery(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    def cand(name: String, cols: Seq[String]): DataFrame =
      o.agg(count(lit(1)).as("n_rows"),
          countDistinct(cols.head, cols.tail: _*).as("n_distinct"))
        .select(lit(name).as("candidate"), col("n_rows"), col("n_distinct"),
          (col("n_distinct") === col("n_rows")).as("is_key"),
          round(col("n_distinct").cast("double") /
            col("n_rows").cast("double"), 6).as("uniqueness"))
    cand("o_orderkey", Seq("o_orderkey"))
      .unionAll(cand("o_custkey", Seq("o_custkey")))
      .unionAll(cand("o_custkey,o_orderdate", Seq("o_custkey", "o_orderdate")))
      .orderBy("candidate")
  }

  private val dqKeyDiscoverySql =
    """WITH t AS (SELECT * FROM orders)
      |SELECT * FROM (
      |  SELECT 'o_orderkey' AS candidate, count(*) AS n_rows,
      |    count(DISTINCT o_orderkey) AS n_distinct,
      |    count(DISTINCT o_orderkey) = count(*) AS is_key,
      |    round(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
      |          / CAST(count(*) AS DOUBLE), 6) AS uniqueness
      |  FROM t
      |  UNION ALL
      |  SELECT 'o_custkey', count(*),
      |    count(DISTINCT o_custkey),
      |    count(DISTINCT o_custkey) = count(*),
      |    round(CAST(count(DISTINCT o_custkey) AS DOUBLE)
      |          / CAST(count(*) AS DOUBLE), 6)
      |  FROM t
      |  UNION ALL
      |  SELECT 'o_custkey,o_orderdate', count(*),
      |    count(DISTINCT (o_custkey, o_orderdate)),
      |    count(DISTINCT (o_custkey, o_orderdate)) = count(*),
      |    round(CAST(count(DISTINCT (o_custkey, o_orderdate)) AS DOUBLE)
      |          / CAST(count(*) AS DOUBLE), 6)
      |  FROM t)
      |ORDER BY candidate""".stripMargin

  /** `dq_skew_report`: join-key skew diagnostics — the query an engineer
    * runs BEFORE choosing a salting/AQE strategy (the operational
    * companion of join_skew_salted): per candidate key column, total rows,
    * distinct keys, the hottest key's count, the p99 per-key count, the
    * skew ratio (max / mean — the replication factor a salted join must
    * absorb), and the top-3 hot keys themselves. Scale shape: ONE keyed
    * count per column (the only fact-scale pass), then scalar aggs over
    * the key-sized count table; top-3 via TakeOrdered (k-bounded), never
    * a global sort. All stats are integer-exact except p99 (the proven
    * percentile/quantile_cont pair, rounded 4 dp) and the ratio (one
    * exact-int multiply + one IEEE division, rounded 6 dp). */
  private def dqSkewReport(s: SparkSession, d: String): DataFrame = {
    def report(df: DataFrame, keyCol: String): DataFrame = {
      val counts = df.groupBy(col(keyCol).cast("long").as("k"))
        .agg(count(lit(1)).as("c")).localCheckpoint(false)
      val stats = counts.agg(sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"), max(col("c")).as("max_cnt"),
        round(expr("percentile(c, 0.99)"), 4).as("p99_cnt"))
      val top = counts.orderBy(col("c").desc, col("k")).limit(3)
        .agg(array_join(transform(
          sort_array(collect_list(struct((-col("c")).as("nc"), col("k")))),
          x => concat(x.getField("k").cast("string"), lit(":"),
            (-x.getField("nc")).cast("string"))), ",").as("top_keys"))
      stats.crossJoin(top).select(lit(keyCol).as("key_col"),
        col("n_rows"), col("n_keys"), col("max_cnt"), col("p99_cnt"),
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"),
          6).as("skew_ratio"),
        col("top_keys"))
    }
    report(orders(s, d), "o_custkey")
      .unionByName(report(lineitem(s, d), "l_partkey"))
      .orderBy("key_col")
  }

  private val dqSkewReportSql = {
    def one(table: String, key: String) =
      s"""SELECT '$key' AS key_col,
         |  CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
         |  CAST(max(c) AS BIGINT) AS max_cnt,
         |  round(quantile_cont(c, 0.99), 4) AS p99_cnt,
         |  round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 6) AS skew_ratio,
         |  (SELECT string_agg(CAST(k AS VARCHAR) || ':' || CAST(c AS VARCHAR),
         |                     ',' ORDER BY c DESC, k)
         |   FROM (SELECT k, c FROM (SELECT $key AS k, count(*) AS c
         |                           FROM $table GROUP BY 1)
         |         ORDER BY c DESC, k LIMIT 3)) AS top_keys
         |FROM (SELECT $key AS k, count(*) AS c FROM $table GROUP BY 1)"""
        .stripMargin
    s"""${one("orders", "o_custkey")}
       |UNION ALL
       |${one("lineitem", "l_partkey")}
       |ORDER BY key_col""".stripMargin
  }

  /** `profile_table_approx_bound`: the approx profile's only approximated
    * stats are the four HLL distinct counts — per column, emit the exact
    * distinct plus a boolean |approx − exact| ≤ 3·rsd·exact (default rsd
    * 0.05, 3σ; deterministic for fixed data). One scan computes both
    * flavors; DuckDB reproduces the exact half and asserts TRUE. */
  private def profileTableApproxBound(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    def pair(c: org.apache.spark.sql.Column, tag: String) = Seq(
      countDistinct(c).as(s"${tag}_x"), approx_count_distinct(c).as(s"${tag}_a"))
    val aggs = pair(col("o_custkey"), "ck") ++
      pair(col("o_orderdate"), "dt") ++
      pair(col("o_orderpriority"), "pr") ++
      pair(col("o_totalprice").cast("decimal(12,2)"), "tp")
    o.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        """stack(4,
          |  'o_custkey',       ck_x, abs(ck_a - ck_x) <= 0.15 * ck_x,
          |  'o_orderdate',     dt_x, abs(dt_a - dt_x) <= 0.15 * dt_x,
          |  'o_orderpriority', pr_x, abs(pr_a - pr_x) <= 0.15 * pr_x,
          |  'o_totalprice',    tp_x, abs(tp_a - tp_x) <= 0.15 * tp_x
          |) AS (col_name, exact_nd, nd_ok)""".stripMargin)
      .orderBy("col_name")
  }

  private val profileTableApproxBoundSql =
    """WITH a AS (SELECT
      |  count(DISTINCT o_custkey) AS ck,
      |  count(DISTINCT o_orderdate) AS dt,
      |  count(DISTINCT o_orderpriority) AS pr,
      |  count(DISTINCT CAST(o_totalprice AS DECIMAL(12,2))) AS tp
      |FROM orders)
      |SELECT u.col_name, u.exact_nd, TRUE AS nd_ok
      |FROM a, (SELECT unnest(['o_custkey', 'o_orderdate',
      |                        'o_orderpriority', 'o_totalprice'])
      |           AS col_name,
      |         unnest([(SELECT ck FROM a), (SELECT dt FROM a),
      |                 (SELECT pr FROM a), (SELECT tp FROM a)]) AS exact_nd) u
      |ORDER BY col_name""".stripMargin

  private val profileTableSql =
    """WITH a AS (SELECT
      |  count(*) AS n_rows,
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ck_nulls,
      |  count(DISTINCT o_custkey) AS ck_nd,
      |  CAST(min(o_custkey) AS VARCHAR) AS ck_lo,
      |  CAST(max(o_custkey) AS VARCHAR) AS ck_hi,
      |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS dt_nulls,
      |  count(DISTINCT o_orderdate) AS dt_nd,
      |  CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS dt_lo,
      |  CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS dt_hi,
      |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS pr_nulls,
      |  count(DISTINCT o_orderpriority) AS pr_nd,
      |  min(o_orderpriority) AS pr_lo,
      |  max(o_orderpriority) AS pr_hi,
      |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp_nulls,
      |  count(DISTINCT CAST(o_totalprice AS DECIMAL(12,2))) AS tp_nd,
      |  CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS tp_lo,
      |  CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS tp_hi
      |FROM orders)
      |SELECT '_rows' AS col_name, CAST(0 AS BIGINT) AS n_nulls,
      |       n_rows AS n_distinct, CAST(NULL AS VARCHAR) AS lo,
      |       CAST(NULL AS VARCHAR) AS hi FROM a
      |UNION ALL SELECT 'o_custkey', ck_nulls, ck_nd, ck_lo, ck_hi FROM a
      |UNION ALL SELECT 'o_orderdate', dt_nulls, dt_nd, dt_lo, dt_hi FROM a
      |UNION ALL SELECT 'o_orderpriority', pr_nulls, pr_nd, pr_lo, pr_hi FROM a
      |UNION ALL SELECT 'o_totalprice', tp_nulls, tp_nd, tp_lo, tp_hi FROM a
      |ORDER BY col_name""".stripMargin

  /** `agg_histogram`: 20-bucket equi-width histogram of order value — the
    * numeric-distribution half of profiling (length_histogram covers the
    * log2 flavor). Bounds come from one scalar-agg pass broadcast onto the
    * scan. The bucket index is PURE INTEGER arithmetic on the exact
    * cent-scaled price (`xc = DECIMAL(12,2)·100` as BIGINT):
    * `least(19, ((xc−lo)·20) div (hi−lo))` — integer division of
    * non-negative operands is floor, so this IS floor((x−lo)/w) but with
    * zero float ops. The r06 IEEE form (`floor((x−lo)/((hi−lo)/20))`) moved
    * an edge row between buckets on a one-ulp engine divergence; integers
    * cannot. Per-bucket bounds verify edge assignment exactly, not just the
    * counts; they compute in DECIMAL and only the FINAL projection casts to
    * DOUBLE (both engines convert the same exact decimal → same nearest
    * double) so the driver's pyarrow/pandas readers see one type. */
  private[graft] def aggHistogramOf(ordersDf: DataFrame): DataFrame = {
    val o = ordersDf.select(
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("xc"),
      col("o_totalprice"))
    val mm = o.agg(min(col("xc")).as("lo_c"), max(col("xc")).as("hi_c"))
    o.crossJoin(broadcast(mm))
      .select(least(lit(19L),
          expr("((xc - lo_c) * 20) div greatest(hi_c - lo_c, 1)"))
          .cast("int").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("b_lo"),
        max(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("b_hi"))
      .orderBy("bucket")
  }

  private def aggHistogram(s: SparkSession, d: String): DataFrame =
    aggHistogramOf(orders(s, d))

  private val aggHistogramSql =
    """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc,
      |                  o_totalprice
      |           FROM orders),
      |mm AS (SELECT min(xc) AS lo_c, max(xc) AS hi_c FROM c)
      |SELECT CAST(LEAST(19, ((xc - lo_c) * 20) // GREATEST(hi_c - lo_c, 1))
      |         AS INTEGER) AS bucket,
      |       count(*) AS n,
      |       CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS b_lo,
      |       CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS b_hi
      |FROM c, mm GROUP BY 1 ORDER BY bucket""".stripMargin

  /** `drift_psi`: population-stability-index between two table snapshots —
    * the distribution-drift check a training pipeline runs on every feature
    * column before trusting a new data drop (the monitoring complement of
    * `table_diff`'s row-level CDC view; same deterministic snapshot pair).
    * Both snapshots bucket through `agg_histogram`'s pure-integer bucket
    * arithmetic on SHARED bounds (cent-scaled min/max over the union), then
    * per bucket PSI_i = (p_i − q_i)·ln(p_i/q_i) with p/q the old/new share.
    * Determinism: shares are correctly-rounded IEEE divisions of exact
    * longs (identical cross-engine), the one libm call (ln) is rounded to
    * 6 dp before the multiply (the lm_bigram_score recipe), and the term
    * rounds to 6 dp. A side with zero mass yields NULL (real pipelines
    * epsilon-smooth; NULL keeps the oracle exact). Every non-null term is
    * ≥ 0 by construction — (p−q) and ln(p/q) always share a sign.
    * Scale: one scan (each row explodes to its ≤2 snapshot memberships),
    * one scalar-agg bounds pass broadcast back, one 20-key aggregate. */
  private def driftPsi(s: SparkSession, d: String): DataFrame =
    driftPsiOf(orders(s, d))

  private[graft] def driftPsiOf(o: DataFrame): DataFrame = {
    val rows = o.select(explode(array_compact(array(
        when(col("o_orderkey") % 97 =!= 0,
          struct(lit("old").as("side"), col("o_totalprice").as("x"))),
        when(col("o_orderkey") % 101 =!= 0,
          struct(lit("new").as("side"),
            when(col("o_orderkey") % 53 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")).as("x")))))).as("r"))
      .select(col("r.side").as("side"),
        (col("r.x").cast("decimal(12,2)") * 100).cast("long").as("xc"))
    val mm = rows.agg(min(col("xc")).as("lo_c"), max(col("xc")).as("hi_c"))
    val counts = rows.crossJoin(broadcast(mm))
      .select(col("side"), least(lit(19L),
          expr("((xc - lo_c) * 20) div greatest(hi_c - lo_c, 1)"))
          .cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("side") === "old", 1L).otherwise(0L)).as("n_old"),
        sum(when(col("side") === "new", 1L).otherwise(0L)).as("n_new"))
    val tot = counts.agg(sum(col("n_old")).as("t_old"),
      sum(col("n_new")).as("t_new"))
    val p = col("n_old").cast("double") / col("t_old")
    val q = col("n_new").cast("double") / col("t_new")
    counts.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_old"), col("n_new"),
        when(col("n_old") > 0 && col("n_new") > 0,
          round((p - q) * round(log(p / q), 6), 6)).as("psi_term"))
      .orderBy("bucket")
  }

  private val driftPsiSql =
    """WITH src AS (
      |  SELECT 'old' AS side, o_totalprice AS x
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT 'new', CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice + 1
      |                     ELSE o_totalprice END
      |  FROM orders WHERE o_orderkey % 101 <> 0),
      |c AS (SELECT side, CAST(CAST(x AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc
      |      FROM src),
      |mm AS (SELECT min(xc) AS lo_c, max(xc) AS hi_c FROM c),
      |counts AS (
      |  SELECT CAST(LEAST(19, ((xc - lo_c) * 20) // GREATEST(hi_c - lo_c, 1))
      |           AS INTEGER) AS bucket,
      |         CAST(count(*) FILTER (WHERE side = 'old') AS BIGINT) AS n_old,
      |         CAST(count(*) FILTER (WHERE side = 'new') AS BIGINT) AS n_new
      |  FROM c, mm GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
      |               CAST(sum(n_new) AS BIGINT) AS t_new FROM counts)
      |SELECT bucket, n_old, n_new,
      |  CASE WHEN n_old > 0 AND n_new > 0 THEN
      |    round((CAST(n_old AS DOUBLE) / t_old - CAST(n_new AS DOUBLE) / t_new)
      |      * round(ln((CAST(n_old AS DOUBLE) / t_old)
      |                 / (CAST(n_new AS DOUBLE) / t_new)), 6), 6)
      |  END AS psi_term
      |FROM counts, tot ORDER BY bucket""".stripMargin

  /** `drift_ks`: exact Kolmogorov–Smirnov statistic between the same two
    * snapshots drift_psi buckets — D = max |F_old(x) − F_new(x)| over the
    * observed value domain (the CDF is constant between observed points, so
    * the max over them IS the exact KS). PSI needs bucketing choices and a
    * log; KS needs neither — counts, two prefix sums, exact IEEE divisions
    * of longs, one max. Ties on D resolve to the smallest value (min_by with
    * a cross-engine total order). The ordered prefix-sum window runs over
    * the DISTINCT-VALUE aggregate (bounded by the DECIMAL(12,2) domain,
    * ~150k points here — never the corpus); at 100 TB the same two-pass
    * range-partitioned prefix sum as `global_rownum` replaces the single
    * global window. */
  private def driftKs(s: SparkSession, d: String): DataFrame =
    driftKsOf(orders(s, d))

  private[graft] def driftKsOf(o: DataFrame): DataFrame = {
    val rows = o.select(explode(array_compact(array(
        when(col("o_orderkey") % 97 =!= 0,
          struct(lit("old").as("side"), col("o_totalprice").as("x"))),
        when(col("o_orderkey") % 101 =!= 0,
          struct(lit("new").as("side"),
            when(col("o_orderkey") % 53 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")).as("x")))))).as("r"))
      .select(col("r.side").as("side"),
        (col("r.x").cast("decimal(12,2)") * 100).cast("long").as("xc"))
    val counts = rows.groupBy("xc")
      .agg(sum(when(col("side") === "old", 1L).otherwise(0L)).as("n_old"),
        sum(when(col("side") === "new", 1L).otherwise(0L)).as("n_new"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("xc")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = counts.agg(sum(col("n_old")).as("t_old"),
      sum(col("n_new")).as("t_new"))
    counts
      // one projection → one Window node for both running sums
      .select(col("xc"), sum(col("n_old")).over(w).as("c_old"),
        sum(col("n_new")).over(w).as("c_new"))
      .crossJoin(broadcast(tot))
      .select(col("xc"),
        abs(col("c_old").cast("double") / col("t_old") -
          col("c_new").cast("double") / col("t_new")).as("diff"))
      .agg(round(max(col("diff")), 6).as("ks_stat"),
        min_by(col("xc"), struct((-col("diff")).as("d"), col("xc"))).as("at_cents"))
  }

  /** `drift_ks_scaled`: the same exact KS statistic through
    * [[graft.ops.OrderedOps.cumSumsByKey]] — BOTH cumulative counts in one
    * two-pass prefix sum over the distinct-value aggregate, no
    * single-partition window. Same oracle as `drift_ks`: hash-proof of the
    * rewrite, second member of the distinct-domain family to swap its
    * window out (after `corr_spearman_scaled`). */
  private def driftKsScaled(s: SparkSession, d: String): DataFrame =
    driftKsScaledOf(orders(s, d))

  private[graft] def driftKsScaledOf(o: DataFrame): DataFrame = {
    val rows = o.select(explode(array_compact(array(
        when(col("o_orderkey") % 97 =!= 0,
          struct(lit("old").as("side"), col("o_totalprice").as("x"))),
        when(col("o_orderkey") % 101 =!= 0,
          struct(lit("new").as("side"),
            when(col("o_orderkey") % 53 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")).as("x")))))).as("r"))
      .select(col("r.side").as("side"),
        (col("r.x").cast("decimal(12,2)") * 100).cast("long").as("xc"))
    val counts = rows.groupBy("xc")
      .agg(sum(when(col("side") === "old", 1L).otherwise(0L)).as("n_old"),
        sum(when(col("side") === "new", 1L).otherwise(0L)).as("n_new"))
    val cum = graft.ops.OrderedOps.cumSumsByKey(counts, "xc", Seq("n_old", "n_new"))
    val tot = counts.agg(sum(col("n_old")).as("t_old"),
      sum(col("n_new")).as("t_new"))
    cum.crossJoin(broadcast(tot))
      .select(col("xc"),
        abs(col("cum_n_old").cast("double") / col("t_old") -
          col("cum_n_new").cast("double") / col("t_new")).as("diff"))
      .agg(round(max(col("diff")), 6).as("ks_stat"),
        min_by(col("xc"), struct((-col("diff")).as("d"), col("xc"))).as("at_cents"))
  }

  private val driftKsSql =
    """WITH src AS (
      |  SELECT 'old' AS side, o_totalprice AS x
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT 'new', CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice + 1
      |                     ELSE o_totalprice END
      |  FROM orders WHERE o_orderkey % 101 <> 0),
      |c AS (SELECT side, CAST(CAST(x AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc
      |      FROM src),
      |counts AS (
      |  SELECT xc,
      |    CAST(count(*) FILTER (WHERE side = 'old') AS BIGINT) AS n_old,
      |    CAST(count(*) FILTER (WHERE side = 'new') AS BIGINT) AS n_new
      |  FROM c GROUP BY 1),
      |cum AS (
      |  SELECT xc,
      |    sum(n_old) OVER (ORDER BY xc) AS c_old,
      |    sum(n_new) OVER (ORDER BY xc) AS c_new
      |  FROM counts),
      |tot AS (SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
      |               CAST(sum(n_new) AS BIGINT) AS t_new FROM counts),
      |diffs AS (
      |  SELECT xc, abs(CAST(c_old AS DOUBLE) / t_old
      |              - CAST(c_new AS DOUBLE) / t_new) AS diff
      |  FROM cum, tot)
      |SELECT round(max(diff), 6) AS ks_stat,
      |       (SELECT xc FROM diffs
      |        ORDER BY diff DESC, xc ASC LIMIT 1) AS at_cents
      |FROM diffs""".stripMargin

  /** `corr_pearson`: exact-input Pearson correlation between quantity and
    * extended price — the column-pair association scan of data profiling
    * (is this feature redundant / is this metric drifting with that one).
    * All six sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in
    * DECIMAL — exact and order-independent, so partial aggregation and AQE
    * cannot move the result — and only then collapse to double for the
    * closed-form corr, a fixed sequence of correctly-rounded IEEE ops
    * (+,−,×,÷,sqrt only; no libm) that is bit-identical on any engine.
    * Scale: one scan, one scalar agg with map-side combine — the ideal
    * 100 TB shape (bytes crossing the cluster: 6 numbers per partition). */
  private[graft] def corrPearsonOf(li: DataFrame): DataFrame = {
    val xd = col("l_quantity").cast("decimal(12,2)")
    val yd = col("l_extendedprice").cast("decimal(12,2)")
    li.select(xd.as("xd"), yd.as("yd"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("xd")).as("sx"), sum(col("yd")).as("sy"),
        sum((col("xd") * col("yd")).cast("decimal(30,4)")).as("sxy"),
        sum((col("xd") * col("xd")).cast("decimal(30,4)")).as("sxx"),
        sum((col("yd") * col("yd")).cast("decimal(30,4)")).as("syy"))
      .select(col("n").as("n_rows"),
        round(
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("corr"))
  }

  private def corrPearson(s: SparkSession, d: String): DataFrame =
    corrPearsonOf(lineitem(s, d))

  /** N37e `eval_cohen_kappa`: inter-annotator agreement (Cohen's κ) between
    * two binary document judges — the standard eval-pipeline check that two
    * labeling passes (two quality rules, a rule vs a model, two model
    * versions) agree beyond chance before either is trusted as training
    * signal. The "annotators" here are two deterministic quality rules
    * (char-length ≥ 400 vs token-count ≥ 80 — correlated but not
    * identical, κ ≈ 0.79 at test sf). All four sufficient counts (n, a⁺,
    * b⁺, agreements) ride ONE scalar aggregate with map-side combine —
    * the corr_pearson shape: bytes crossing the cluster = 4 longs per
    * partition at any corpus size. p_o, p_e and κ are then fixed sequences
    * of IEEE ops on exactly-representable integers (no libm), identical
    * float64 on both engines, rounded 6 dp at output only. */
  private[graft] def evalCohenKappaOf(docs: DataFrame): DataFrame = {
    val a = (col("n_chars") >= 400).cast("long")
    val b = (size(split(col("text"), " ")) >= 80).cast("long")
    val po = col("agree").cast("double") / col("n").cast("double")
    val pe = (col("na") * col("nb") + (col("n") - col("na")) *
        (col("n") - col("nb"))).cast("double") /
      (col("n") * col("n")).cast("double")
    docs.select(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("n"), sum(col("a")).as("na"),
        sum(col("b")).as("nb"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
      .select(col("n").as("n_docs"),
        col("na").as("n_pos_a"), col("nb").as("n_pos_b"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        round((po - pe) / (lit(1.0d) - pe), 6).as("kappa"))
  }

  private def evalCohenKappa(s: SparkSession, d: String): DataFrame =
    evalCohenKappaOf(documents(s, d))

  /** N37f `eval_calibration`: reliability table + expected calibration
    * error for a per-document score against a binary outcome — the eval
    * every score-thresholding curation step should run before its scores
    * gate data (an overconfident scorer silently reshapes the corpus).
    * Prediction = the composite quality score (the `quality_score` rule,
    * 6 dp — identical float64 on both engines); outcome = the char-length
    * judge. Per decile bin: size, mean confidence (exact DECIMAL sum of
    * 6-dp scores → one division), observed rate (exact ints → one
    * division), |conf − acc| rounded 6 dp; the summary row (bin = −1)
    * carries ECE = Σ n_b·gap_b / N with the 6-dp gaps weighted in exact
    * DECIMAL so the 10-term sum cannot reorder. One fact scan, a 10-key
    * agg with map-side combine, a 10-row rollup — nothing fact-sized
    * moves. */
  private[graft] def evalCalibrationOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    val score = round(uniq * 0.4 + lenScore * 0.6, 6)
    val base = docs.select(score.as("score"),
      (col("n_chars") >= 400).cast("long").as("y"))
    val bins = base
      .groupBy(least(floor(col("score") * 10).cast("int"), lit(9)).as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score").cast("decimal(8,6)")).as("ssum"),
        sum(col("y")).as("pos"))
      .select(col("bin"), col("n_docs"),
        round(col("ssum").cast("double") / col("n_docs"), 6).as("conf"),
        round(col("pos").cast("double") / col("n_docs"), 6).as("acc"),
        round(abs(col("ssum").cast("double") / col("n_docs") -
          col("pos").cast("double") / col("n_docs")), 6).as("gap"))
    val ece = bins.agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("gap").cast("decimal(8,6)") * col("n_docs")).as("wg"))
      .select(lit(-1).as("bin"), col("n_docs"),
        lit(null).cast("double").as("conf"), lit(null).cast("double").as("acc"),
        round(col("wg").cast("double") / col("n_docs"), 6).as("gap"))
    bins.unionByName(ece).orderBy("bin")
  }

  private def evalCalibration(s: SparkSession, d: String): DataFrame =
    evalCalibrationOf(documents(s, d))

  /** N37g `eval_confusion`: the confusion matrix and precision/recall/F1 of
    * a score-threshold classifier (quality score ≥ 0.6) against the
    * char-length judge — the first table anyone asks for when a filter
    * rule is proposed. TP/FP/FN/TN are four conditional counts in ONE
    * map-side-combine scalar agg; precision, recall and F1 are IEEE
    * sequences over those exact integers (F1 via 2·tp/(2·tp+fp+fn) — one
    * division, no compounding), rounded 6 dp at output. */
  private[graft] def evalConfusionOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    val score = round(uniq * 0.4 + lenScore * 0.6, 6)
    val p = (score >= 0.6).cast("long")
    val y = (col("n_chars") >= 400).cast("long")
    docs.select(p.as("p"), y.as("y"))
      .agg(
        sum(when(col("p") === 1 && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("p") === 1 && col("y") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("p") === 0 && col("y") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("p") === 0 && col("y") === 0, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("precision"),
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
          .as("recall"),
        round((lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")), 6).as("f1"))
  }

  private def evalConfusion(s: SparkSession, d: String): DataFrame =
    evalConfusionOf(documents(s, d))

  /** `eval_conformal_coverage`: split conformal calibration (Vovk et al.;
    * Angelopoulos & Bates 2023 tutorial form) for the quality score — the
    * distribution-free guarantee a score-thresholding curation step can
    * actually hold: on a deterministic hash-half calibration set, take the
    * ⌈(n+1)(1−α)⌉-th smallest nonconformity a = 1 − score among
    * true-quality docs (α = 0.1); on the OTHER half, the fraction of
    * true-quality docs with a ≤ q̂ must then be ≥ 1−α in expectation —
    * reported as the coverage check. The order statistic is an EXACT rank
    * pick (row_number over (a, doc_id)), not an interpolated quantile, so
    * both engines elect the identical q̂; scores and a round 6 dp. Scale:
    * the rank window here is calibration-set-bounded; at corpus scale the
    * same pick runs on OrderedOps.globalRank (the window_ntile_scaled
    * machinery) — one range-partition rank, no single-task sort. */
  private[graft] def evalConformalCoverageOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    val score = round(uniq * 0.4 + lenScore * 0.6, 6)
    val half = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % 2
    val scored = docs
      .filter(col("n_chars") >= 400)
      .select(col("doc_id"), round(lit(1.0) - score, 6).as("a"),
        half.as("half"))
    val cal = scored.filter(col("half") === 0)
    val calN = cal.agg(count(lit(1)).as("n_cal"),
      ceil((count(lit(1)) + lit(1L)).cast("double") * lit(0.9d))
        .cast("long").as("k"))
    val w = Window.orderBy(col("a"), col("doc_id"))
    val qhat = cal.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(calN))
      .filter(col("rn") === least(col("k"), col("n_cal")))
      .select(col("n_cal"), col("a").as("qhat"))
    scored.filter(col("half") === 1)
      .crossJoin(broadcast(qhat))
      .agg(
        first(col("n_cal")).as("n_cal"),
        first(col("qhat")).as("qhat"),
        count(lit(1)).as("n_test"),
        sum(when(col("a") <= col("qhat"), 1L).otherwise(0L)).as("n_covered"))
      .select(col("n_cal"), col("qhat"), col("n_test"), col("n_covered"),
        round(col("n_covered").cast("double") / col("n_test"), 6)
          .as("coverage"))
  }

  private def evalConformalCoverage(s: SparkSession, d: String): DataFrame =
    evalConformalCoverageOf(documents(s, d))

  private val evalConformalCoverageSql =
    """WITH scored AS (
      |  SELECT doc_id,
      |    round(1.0 - round(
      |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |        / len(string_split(text, ' ')) * 0.4
      |      + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80.0,
      |              1.0) * 0.6, 6), 6) AS a,
      |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 2 AS half
      |  FROM documents WHERE n_chars >= 400),
      |cal AS (SELECT * FROM scored WHERE half = 0),
      |caln AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cal,
      |    CAST(ceil(CAST(count(*) + 1 AS DOUBLE) * 0.9) AS BIGINT) AS k
      |  FROM cal),
      |ranked AS (
      |  SELECT a, row_number() OVER (ORDER BY a, doc_id) AS rn FROM cal),
      |qhat AS (
      |  SELECT n_cal, a AS qhat FROM ranked, caln
      |  WHERE rn = least(k, n_cal))
      |SELECT q.n_cal, q.qhat,
      |  CAST(count(*) AS BIGINT) AS n_test,
      |  CAST(sum(CASE WHEN t.a <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_covered,
      |  round(CAST(sum(CASE WHEN t.a <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS coverage
      |FROM scored t, qhat q
      |WHERE t.half = 1
      |GROUP BY 1, 2""".stripMargin

  private val evalConfusionSql =
    """WITH f AS (
      |  SELECT CASE WHEN round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |            / len(string_split(text, ' ')) * 0.4
      |          + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80.0,
      |                  1.0) * 0.6, 6) >= 0.6 THEN 1 ELSE 0 END AS p,
      |         CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |m AS (
      |  SELECT CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |         CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |         CAST(sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |         CAST(sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM f)
      |SELECT tp, fp, fn, tn,
      |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
      |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
      |  round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1
      |FROM m""".stripMargin

  /** N37h `eval_auc`: exact tie-averaged ROC-AUC (Mann–Whitney form) of
    * the quality score against the char-length judge — the threshold-free
    * complement of `eval_confusion`: does the score RANK kept docs above
    * dropped ones at all operating points. The corr_spearman discipline:
    * ranks live on the DISTINCT-SCORE DOMAIN (per-score count + positive
    * count, then a domain-sized prefix sum), never on the corpus, and the
    * .5-average-rank halves are killed by the 2×-rank integer trick —
    * AUC = (Σ pos_s·R2_s − nP·(nP+1)) / (2·nP·nN) with R2_s =
    * 2·cum_before + cnt + 1, every term an exact integer, ONE IEEE
    * division at the end. Scale: the fact reduces map-side to the score
    * domain; the prefix-sum window rides domain rows (the
    * corr_spearman_scaled rewrite applies verbatim if the domain ever
    * outgrows one task). */
  private[graft] def evalAucOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    val score = round(uniq * 0.4 + lenScore * 0.6, 6)
    val y = (col("n_chars") >= 400).cast("long")
    val dom = docs.select(score.as("s"), y.as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = dom
      .withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .select(col("pos"), col("cnt"),
        (lit(2L) * col("cum") + col("cnt") + lit(1L)).as("r2"))
    ranked.agg(
        sum(col("cnt")).as("n_docs"),
        sum(col("pos")).as("np"),
        sum(col("cnt") - col("pos")).as("nn"),
        sum(col("pos") * col("r2")).as("pr2"))
      .select(col("n_docs"), col("np").as("n_pos"),
        round((col("pr2") - col("np") * (col("np") + lit(1L))).cast("double") /
          (lit(2L) * col("np") * col("nn")).cast("double"), 6).as("auc"))
  }

  private def evalAuc(s: SparkSession, d: String): DataFrame =
    evalAucOf(documents(s, d))

  /** `eval_auc_scaled`: eval_auc's 100 TB form — the distinct-score-domain
    * prefix sum runs through [[graft.ops.OrderedOps.cumSumsByKey]]
    * (range-partitioned per-partition sums + broadcast offsets — no
    * single-task Window even when the score domain is huge). Scores are
    * micro-unit longs via the exact DECIMAL(8,6) cent-scaling trick, so
    * the key is unique-integer as cumSumsByKey requires. SAME ORACLE as
    * eval_auc: hash equality proves the rewrite, the corr_spearman_scaled
    * pattern. */
  private[graft] def evalAucScaledOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    val score = round(uniq * 0.4 + lenScore * 0.6, 6)
    val y = (col("n_chars") >= 400).cast("long")
    val dom = docs.select(
        (score.cast("decimal(8,6)") * 1000000).cast("long").as("sc"),
        y.as("y"))
      .groupBy("sc")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val ranked = graft.ops.OrderedOps.cumSumsByKey(dom, "sc", Seq("cnt", "pos"))
      .select(col("pos"), col("cnt"),
        (lit(2L) * (col("cum_cnt") - col("cnt")) + col("cnt") + lit(1L))
          .as("r2"))
    ranked.agg(
        sum(col("cnt")).as("n_docs"),
        sum(col("pos")).as("np"),
        sum(col("cnt") - col("pos")).as("nn"),
        sum(col("pos") * col("r2")).as("pr2"))
      .select(col("n_docs"), col("np").as("n_pos"),
        round((col("pr2") - col("np") * (col("np") + lit(1L))).cast("double") /
          (lit(2L) * col("np") * col("nn")).cast("double"), 6).as("auc"))
  }

  private def evalAucScaled(s: SparkSession, d: String): DataFrame =
    evalAucScaledOf(documents(s, d))

  private val evalAucSql =
    """WITH f AS (
      |  SELECT round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |            / len(string_split(text, ' ')) * 0.4
      |          + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80.0,
      |                  1.0) * 0.6, 6) AS s,
      |         CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |dom AS (
      |  SELECT s, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos
      |  FROM f GROUP BY 1),
      |ranked AS (
      |  SELECT pos, cnt,
      |    2 * coalesce(sum(cnt) OVER (ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + cnt + 1 AS r2
      |  FROM dom)
      |SELECT CAST(sum(cnt) AS BIGINT) AS n_docs,
      |  CAST(sum(pos) AS BIGINT) AS n_pos,
      |  round(CAST(sum(pos * r2) - sum(pos) * (sum(pos) + 1) AS DOUBLE)
      |        / CAST(2 * sum(pos) * sum(cnt - pos) AS DOUBLE), 6) AS auc
      |FROM ranked""".stripMargin

  /** N37i `eval_pr_auc`: exact average precision (the PR-curve area) of the
    * same heuristic scorer [[evalAucOf]] grades by ROC — the metric that
    * actually matters when positives are rare (ROC-AUC stays rosy under
    * class imbalance; AP collapses with precision). Tie handling is pinned
    * by grouping to the DISTINCT score domain first: descending through
    * score groups g, AP = (1/P) Σ_g pos_g · (cumpos_g / cumcnt_g) — the
    * block-end-precision convention, equal to classic
    * (1/P) Σ_{positives} P@k when scores are unique. Each group term is one
    * IEEE multiply+divide of exact integers rounded to 6 dp and summed in
    * DECIMAL (the rounded-term discipline). Scale: the cumulative counts
    * run through [[graft.ops.OrderedOps.cumSumsByKey]] on the NEGATED
    * micro-unit score key (range-partitioned prefix sums + broadcast
    * offsets — descending order with no single-task Window), the
    * eval_auc_scaled / corr_spearman_scaled machinery. */
  private[graft] def evalPrAucOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    val score = round(uniq * 0.4 + lenScore * 0.6, 6)
    val y = (col("n_chars") >= 400).cast("long")
    val dom = docs.select(
        (-(score.cast("decimal(8,6)") * 1000000).cast("long")).as("nsc"),
        y.as("y"))
      .groupBy("nsc")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    graft.ops.OrderedOps.cumSumsByKey(dom, "nsc", Seq("cnt", "pos"))
      .select(col("pos"),
        round(col("pos").cast("double") * col("cum_pos") / col("cum_cnt"), 6)
          .cast(DecimalType(18, 6)).as("term"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("term")).as("tsum"))
      .select(col("n_pos"),
        round(col("tsum").cast("double") / col("n_pos").cast("double"), 6)
          .as("ap"))
  }

  private def evalPrAuc(s: SparkSession, d: String): DataFrame =
    evalPrAucOf(documents(s, d))

  private val evalPrAucSql =
    """WITH f AS (
      |  SELECT round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |            / len(string_split(text, ' ')) * 0.4
      |          + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80.0,
      |                  1.0) * 0.6, 6) AS s,
      |         CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |dom AS (
      |  SELECT s, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos
      |  FROM f GROUP BY 1),
      |c AS (
      |  SELECT pos,
      |    sum(cnt) OVER (ORDER BY s DESC) AS cum_cnt,
      |    sum(pos) OVER (ORDER BY s DESC) AS cum_pos
      |  FROM dom),
      |t AS (
      |  SELECT pos,
      |    CAST(round(CAST(pos AS DOUBLE) * cum_pos / cum_cnt, 6)
      |      AS DECIMAL(18,6)) AS term
      |  FROM c)
      |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
      |  round(CAST(sum(term) AS DOUBLE) / CAST(sum(pos) AS DOUBLE), 6) AS ap
      |FROM t""".stripMargin

  /** N37l `eval_gains_table`: the cumulative-gains / lift table — rank the
    * corpus by the model score, cut into score deciles, and report per
    * decile how much of the positive class the top-k% captures and its
    * lift over random triage. THE operational readout for "review the top
    * 10% first" decisions, which AUC/AP (global ranking quality) and
    * calibration (probability honesty) don't answer. Deciles come from
    * [[graft.ops.OrderedOps.globalRank]] + arithmetic
    * [[graft.ops.OrderedOps.ntileFromRank]] over (score desc, doc_id) —
    * the zero-one-task-Window ntile (window_ntile_scaled machinery; the
    * only Window left runs on the TEN-row decile table). capture =
    * cum_pos/P and lift = pos·N/(n·P) are single IEEE divisions of exact
    * integers, rounded 6 dp. */
  private[graft] def evalGainsTableOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    val score = round(uniq * 0.4 + lenScore * 0.6, 6)
    val y = (col("n_chars") >= 400).cast("long")
    val base = docs.select(col("doc_id"), score.as("s"), y.as("y"))
    val ranked = graft.ops.OrderedOps.globalRank(
      base, Seq(col("s").desc, col("doc_id").asc))
    val tot = base.agg(count(lit(1)).as("n_total"),
      sum(col("y")).as("p_total"))
    val dec = ranked.crossJoin(broadcast(tot))
      .withColumn("decile", graft.ops.OrderedOps.ntileFromRank(
        col("g_rank"), col("n_total"), 10))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"),
        max(col("n_total")).as("nt"), max(col("p_total")).as("pt"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .select(col("decile"), col("n_docs"), col("n_pos"),
        round(col("cum_pos").cast("double") / col("pt").cast("double"), 6)
          .as("capture_rate"),
        round((col("n_pos") * col("nt")).cast("double") /
          (col("n_docs") * col("pt")).cast("double"), 6).as("lift"))
      .orderBy("decile")
  }

  private def evalGainsTable(s: SparkSession, d: String): DataFrame =
    evalGainsTableOf(documents(s, d))

  private val evalGainsTableSql =
    """WITH f AS (
      |  SELECT doc_id,
      |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |            / len(string_split(text, ' ')) * 0.4
      |          + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80.0,
      |                  1.0) * 0.6, 6) AS s,
      |    CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |r AS (SELECT y, ntile(10) OVER (ORDER BY s DESC, doc_id) AS decile
      |      FROM f),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt,
      |               CAST(sum(y) AS BIGINT) AS pt FROM f),
      |dec AS (
      |  SELECT decile, count(*) AS n_docs, CAST(sum(y) AS BIGINT) AS n_pos
      |  FROM r GROUP BY 1)
      |SELECT CAST(decile AS INTEGER) AS decile, n_docs, n_pos,
      |  round(CAST(sum(n_pos) OVER (ORDER BY decile) AS DOUBLE)
      |        / CAST(pt AS DOUBLE), 6) AS capture_rate,
      |  round(CAST(n_pos * nt AS DOUBLE)
      |        / CAST(n_docs * pt AS DOUBLE), 6) AS lift
      |FROM dec, tot ORDER BY decile""".stripMargin

  private val evalCalibrationSql =
    """WITH scored AS (
      |  SELECT round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |            / len(string_split(text, ' ')) * 0.4
      |          + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80.0,
      |                  1.0) * 0.6, 6) AS score,
      |         CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |bins AS (
      |  SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bin,
      |         count(*) AS n_docs,
      |         sum(CAST(score AS DECIMAL(8,6))) AS ssum,
      |         CAST(sum(y) AS BIGINT) AS pos
      |  FROM scored GROUP BY 1),
      |tab AS (
      |  SELECT bin, n_docs,
      |    round(CAST(ssum AS DOUBLE) / n_docs, 6) AS conf,
      |    round(CAST(pos AS DOUBLE) / n_docs, 6) AS acc,
      |    round(abs(CAST(ssum AS DOUBLE) / n_docs
      |              - CAST(pos AS DOUBLE) / n_docs), 6) AS gap
      |  FROM bins)
      |SELECT bin, n_docs, conf, acc, gap FROM tab
      |UNION ALL
      |SELECT -1 AS bin, CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |  CAST(NULL AS DOUBLE) AS conf, CAST(NULL AS DOUBLE) AS acc,
      |  round(CAST(sum(CAST(gap AS DECIMAL(8,6)) * n_docs) AS DOUBLE)
      |        / sum(n_docs), 6) AS gap
      |FROM tab
      |ORDER BY bin""".stripMargin

  private val evalCohenKappaSql =
    """WITH f AS (
      |  SELECT CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS a,
      |         CASE WHEN len(string_split(text, ' ')) >= 80
      |              THEN 1 ELSE 0 END AS b
      |  FROM documents),
      |agg AS (
      |  SELECT count(*) AS n, CAST(sum(a) AS BIGINT) AS na,
      |         CAST(sum(b) AS BIGINT) AS nb,
      |         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
      |  FROM f)
      |SELECT n AS n_docs, na AS n_pos_a, nb AS n_pos_b,
      |  round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
      |  round(CAST(na*nb + (n-na)*(n-nb) AS DOUBLE)
      |        / CAST(n*n AS DOUBLE), 6) AS pe,
      |  round((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
      |         - CAST(na*nb + (n-na)*(n-nb) AS DOUBLE) / CAST(n*n AS DOUBLE))
      |        / (1.0 - CAST(na*nb + (n-na)*(n-nb) AS DOUBLE)
      |                 / CAST(n*n AS DOUBLE)), 6) AS kappa
      |FROM agg""".stripMargin

  /** N37d `dq_chi_square`: chi-square independence screen between two
    * categorical columns (order status × priority) — the DQ check that
    * catches a broken upstream join or skewed backfill as a dependence
    * shift between fields that should be (or stay) independent. The dense
    * r×c grid (distinct × distinct, zero-observed cells included — absent
    * combos still contribute their expected mass) joins integer row/col/
    * grand totals; each cell's term is ((obs·n − row·col)/ (√: none))² via
    * d·d with d = (obs·n − row·col) cast to double (exact < 2^53) over
    * row·col·n — one IEEE multiply + divide per cell, rounded to 6 dp and
    * summed in DECIMAL (the rounded-term-before-exact-sum discipline that
    * keeps a float sum's order-dependence out of the hash). Output: cell
    * count, degrees of freedom, χ². Scale: three keyed aggs with map-side
    * combine ride one fact scan; the grid is |statuses|×|priorities|. */
  private[graft] def dqChiSquareOf(o: DataFrame): DataFrame = {
    val base = o.select(col("o_orderstatus").as("s"),
      col("o_orderpriority").as("p"))
    val obs = base.groupBy("s", "p").agg(count(lit(1)).as("n_sp"))
    val rowT = base.groupBy("s").agg(count(lit(1)).as("n_s"))
    val colT = base.groupBy("p").agg(count(lit(1)).as("n_p"))
    val tot = base.agg(count(lit(1)).as("n"))
    val grid = rowT.crossJoin(colT)
      .join(obs, Seq("s", "p"), "left_outer")
      .withColumn("o", coalesce(col("n_sp"), lit(0L)))
      .crossJoin(broadcast(tot))
    val d = (col("o") * col("n") - col("n_s") * col("n_p")).cast("double")
    grid
      .select(col("s"), col("p"), col("n"),
        round(d * d / (col("n_s") * col("n_p") * col("n")).cast("double"), 6)
          .as("term"))
      .agg(max(col("n")).as("n_rows"),
        ((countDistinct(col("s")) - 1) * (countDistinct(col("p")) - 1))
          .as("dof"),
        sum(col("term").cast("decimal(30,6)")).cast("double").as("chi2"))
  }

  private def dqChiSquare(s: SparkSession, d: String): DataFrame =
    dqChiSquareOf(orders(s, d))

  private val dqChiSquareSql =
    """WITH base AS (SELECT o_orderstatus AS s, o_orderpriority AS p FROM orders),
      |obs AS (SELECT s, p, count(*) AS n_sp FROM base GROUP BY 1, 2),
      |rt AS (SELECT s, CAST(count(*) AS BIGINT) AS n_s FROM base GROUP BY 1),
      |ct AS (SELECT p, CAST(count(*) AS BIGINT) AS n_p FROM base GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
      |grid AS (
      |  SELECT rt.s, ct.p, rt.n_s, ct.n_p, tot.n,
      |         COALESCE(obs.n_sp, 0) AS o
      |  FROM rt CROSS JOIN ct CROSS JOIN tot
      |  LEFT JOIN obs ON obs.s = rt.s AND obs.p = ct.p),
      |terms AS (
      |  SELECT s, p, n,
      |    round(CAST(o * n - n_s * n_p AS DOUBLE)
      |            * CAST(o * n - n_s * n_p AS DOUBLE)
      |          / CAST(n_s * n_p * n AS DOUBLE), 6) AS term
      |  FROM grid)
      |SELECT max(n) AS n_rows,
      |       CAST((count(DISTINCT s) - 1) * (count(DISTINCT p) - 1) AS BIGINT)
      |         AS dof,
      |       CAST(sum(CAST(term AS DECIMAL(30,6))) AS DOUBLE) AS chi2
      |FROM terms""".stripMargin

  private val corrPearsonSql =
    """WITH s AS (SELECT
      |  count(*) AS n,
      |  sum(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
      |  sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
      |  sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
      |        * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS sxy,
      |  sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
      |        * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS sxx,
      |  sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |        * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS syy
      |FROM lineitem)
      |SELECT n AS n_rows,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |        / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |           * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
      |FROM s""".stripMargin

  /** `corr_spearman`: rank correlation between the same pair — the
    * monotone-association complement (robust to the price tail). Ties take
    * AVERAGE ranks, held exact as 2×rank integers: for a distinct value v,
    * 2·avgrank(v) = 2·|{x < v}| + |{x = v}| + 1, computed from per-value
    * counts + one prefix sum over the DISTINCT-VALUE aggregate (bounded by
    * the value domain, never corpus-sized — the drift_ks recipe; at 100 TB
    * the range-partitioned two-pass prefix sum replaces the single window).
    * Spearman ρ is then Pearson over the 2×ranks — scale-invariant, so the
    * doubling cancels — with sufficient statistics summed in DECIMAL(38,0)
    * (exact at any corpus size; BIGINT Σ(2r)² overflows past ~2e9 rows). */
  private[graft] def corrSpearmanOf(li: DataFrame): DataFrame = {
    val rows = li.select(
      (col("l_quantity").cast("decimal(12,2)") * 100).cast("long").as("xc"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("yc"))
    def ranks2(c: String) = {
      val w = Window.orderBy(c)
      rows.groupBy(c).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(w))
        .select(col(c), (lit(2) * (col("cum") - col("cnt")) + col("cnt") + 1)
          .as(s"r2_$c"))
    }
    rows.join(ranks2("xc"), Seq("xc")).join(ranks2("yc"), Seq("yc"))
      .select(col("r2_xc").as("rx"), col("r2_yc").as("ry"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("rx").cast("decimal(38,0)")).as("sx"),
        sum(col("ry").cast("decimal(38,0)")).as("sy"),
        sum((col("rx") * col("ry")).cast("decimal(38,0)")).as("sxy"),
        sum((col("rx") * col("rx")).cast("decimal(38,0)")).as("sxx"),
        sum((col("ry") * col("ry")).cast("decimal(38,0)")).as("syy"))
      .select(col("n").as("n_rows"),
        round(
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("rho"))
  }

  private def corrSpearman(s: SparkSession, d: String): DataFrame =
    corrSpearmanOf(lineitem(s, d))

  /** `corr_spearman_scaled`: the same ρ through the 100 TB prefix-sum path
    * — [[graft.ops.OrderedOps.cumSumsByKey]] (range-partition, pinned
    * layout, driver-broadcast offsets, one local pass) replaces each
    * single-partition `sum().over(Window.orderBy)` on the distinct-value
    * aggregate. Ranks are exact integers either way, so the SAME oracle as
    * `corr_spearman` hash-proves the rewrite — the claim the whole
    * distinct-domain window family (drift_ks, winsorize, equi-depth) makes
    * in its Scaladoc, demonstrated executable. */
  private[graft] def corrSpearmanScaledOf(li: DataFrame): DataFrame = {
    val rows = li.select(
      (col("l_quantity").cast("decimal(12,2)") * 100).cast("long").as("xc"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("yc"))
    def ranks2(c: String) = {
      val counts = rows.groupBy(c).agg(count(lit(1)).as("cnt"))
      graft.ops.OrderedOps.cumSumsByKey(counts, c, Seq("cnt"))
        .select(col(c), (lit(2) * (col("cum_cnt") - col("cnt")) + col("cnt") + 1)
          .as(s"r2_$c"))
    }
    rows.join(ranks2("xc"), Seq("xc")).join(ranks2("yc"), Seq("yc"))
      .select(col("r2_xc").as("rx"), col("r2_yc").as("ry"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("rx").cast("decimal(38,0)")).as("sx"),
        sum(col("ry").cast("decimal(38,0)")).as("sy"),
        sum((col("rx") * col("ry")).cast("decimal(38,0)")).as("sxy"),
        sum((col("rx") * col("rx")).cast("decimal(38,0)")).as("sxx"),
        sum((col("ry") * col("ry")).cast("decimal(38,0)")).as("syy"))
      .select(col("n").as("n_rows"),
        round(
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("rho"))
  }

  private def corrSpearmanScaled(s: SparkSession, d: String): DataFrame =
    corrSpearmanScaledOf(lineitem(s, d))

  private val corrSpearmanSql =
    """WITH rows_c AS (
      |  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS yc
      |  FROM lineitem),
      |rx AS (SELECT xc, 2 * (sum(cnt) OVER (ORDER BY xc) - cnt) + cnt + 1 AS r2x
      |       FROM (SELECT xc, count(*) AS cnt FROM rows_c GROUP BY 1)),
      |ry AS (SELECT yc, 2 * (sum(cnt) OVER (ORDER BY yc) - cnt) + cnt + 1 AS r2y
      |       FROM (SELECT yc, count(*) AS cnt FROM rows_c GROUP BY 1)),
      |j AS (SELECT r2x AS rx, r2y AS ry
      |      FROM rows_c JOIN rx USING (xc) JOIN ry USING (yc)),
      |s AS (SELECT count(*) AS n,
      |  sum(CAST(rx AS DECIMAL(38,0))) AS sx,
      |  sum(CAST(ry AS DECIMAL(38,0))) AS sy,
      |  sum(CAST(rx * ry AS DECIMAL(38,0))) AS sxy,
      |  sum(CAST(rx * rx AS DECIMAL(38,0))) AS sxx,
      |  sum(CAST(ry * ry AS DECIMAL(38,0))) AS syy FROM j)
      |SELECT n AS n_rows,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |        / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |           * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
      |FROM s""".stripMargin

  /** Exact discrete percentile thresholds over the cent-scaled price domain:
    * p = smallest value whose cumulative count reaches ceil(q·n), with the
    * ceiling in PURE INTEGER arithmetic ((q100·n + 99) div 100) — the
    * percentile_disc definition, no interpolation, no float. The prefix sum
    * runs over the distinct-value aggregate (domain-bounded, ~150k cents
    * values — never the corpus). */
  private def discThresholds(xc: DataFrame, qLo: Int, qHi: Int): DataFrame = {
    val w = Window.orderBy("xc")
    xc.groupBy("xc").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(xc.agg(count(lit(1)).as("n"))))
      .agg(
        min(when(col("cum") >= expr(s"($qLo * n + 99) div 100"),
          col("xc"))).as("lo_c"),
        min(when(col("cum") >= expr(s"($qHi * n + 99) div 100"),
          col("xc"))).as("hi_c"))
  }

  /** `winsorize_stats`: tail-clipping audit — exact p05/p95 order statistics
    * of order value, the row counts each tail clips, and the winsorized
    * mean. The outlier-robust location estimate a feature pipeline reports
    * next to the raw mean (and the guard before z-scoring a heavy-tailed
    * metric). Mean is exact: clamped cents sum in BIGINT (≤ 2^53 ⇒ the
    * double divide is the only float op, identical on both engines).
    * Scale: one distinct-value prefix sum for the thresholds (broadcast
    * back as two scalars), one clamping scan with a scalar agg. */
  private[graft] def winsorizeStatsOf(ordersDf: DataFrame): DataFrame = {
    val xc = ordersDf.select(
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("xc"))
    val th = discThresholds(xc, 5, 95)
    xc.crossJoin(broadcast(th))
      .select(col("xc"), col("lo_c"), col("hi_c"),
        greatest(col("lo_c"), least(col("hi_c"), col("xc"))).as("wc"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("lo_c")).as("p05_cents"),
        min(col("hi_c")).as("p95_cents"),
        sum((col("xc") < col("lo_c")).cast("long")).as("n_clipped_lo"),
        sum((col("xc") > col("hi_c")).cast("long")).as("n_clipped_hi"),
        round(sum(col("wc")).cast("double") /
          (count(lit(1)) * 100).cast("double"), 6).as("mean_winsorized"))
  }

  private def winsorizeStats(s: SparkSession, d: String): DataFrame =
    winsorizeStatsOf(orders(s, d))

  private val winsorizeStatsSql =
    """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc
      |           FROM orders),
      |cum AS (SELECT xc, cnt, sum(cnt) OVER (ORDER BY xc) AS cum
      |        FROM (SELECT xc, count(*) AS cnt FROM c GROUP BY 1)),
      |tot AS (SELECT count(*) AS n FROM c),
      |th AS (SELECT
      |  min(CASE WHEN cum >= (5 * n + 99) // 100 THEN xc END) AS lo_c,
      |  min(CASE WHEN cum >= (95 * n + 99) // 100 THEN xc END) AS hi_c
      |FROM cum, tot)
      |SELECT count(*) AS n_rows,
      |  min(lo_c) AS p05_cents,
      |  min(hi_c) AS p95_cents,
      |  CAST(count(*) FILTER (WHERE xc < lo_c) AS BIGINT) AS n_clipped_lo,
      |  CAST(count(*) FILTER (WHERE xc > hi_c) AS BIGINT) AS n_clipped_hi,
      |  round(CAST(sum(greatest(lo_c, least(hi_c, xc))) AS DOUBLE)
      |        / CAST(count(*) * 100 AS DOUBLE), 6) AS mean_winsorized
      |FROM c, th""".stripMargin

  /** `agg_histogram_eqdepth`: 10-bucket equi-DEPTH histogram of order value
    * — the quantile-bin complement of `agg_histogram`'s equi-width view
    * (equi-width shows shape, equi-depth shows quantile boundaries; a data
    * profile wants both). Bucket of a distinct value v is pure integer
    * arithmetic on the prefix sum: (count_below(v)·10) div n, capped at 9 —
    * every row of a tied value lands in ONE bucket (no ntile row-splitting
    * ambiguity), buckets are equal-count up to tie granularity. Prefix sum
    * over the distinct-value aggregate; rows then join their value's bucket
    * by the same keyed lookup — never a corpus-wide row-ordered window. */
  private[graft] def aggHistogramEqdepthOf(ordersDf: DataFrame): DataFrame = {
    val xc = ordersDf.select(
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("xc"))
    val w = Window.orderBy("xc")
    xc.groupBy("xc").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(xc.agg(count(lit(1)).as("n"))))
      .select(col("xc"), col("cnt"),
        expr("least(9L, ((cum - cnt) * 10) div n)").cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(sum(col("cnt")).as("n"),
        min(col("xc")).as("b_lo_cents"),
        max(col("xc")).as("b_hi_cents"))
      .orderBy("bucket")
  }

  private def aggHistogramEqdepth(s: SparkSession, d: String): DataFrame =
    aggHistogramEqdepthOf(orders(s, d))

  private val aggHistogramEqdepthSql =
    """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc
      |           FROM orders),
      |cum AS (SELECT xc, cnt, sum(cnt) OVER (ORDER BY xc) AS cum
      |        FROM (SELECT xc, count(*) AS cnt FROM c GROUP BY 1)),
      |tot AS (SELECT count(*) AS n FROM c)
      |SELECT CAST(least(9, ((cum - cnt) * 10) // n) AS INTEGER) AS bucket,
      |       CAST(sum(cnt) AS BIGINT) AS n,
      |       min(xc) AS b_lo_cents,
      |       max(xc) AS b_hi_cents
      |FROM cum, tot GROUP BY 1 ORDER BY bucket""".stripMargin

  /** `dq_expectations`: the declarative expectation suite a pipeline runs
    * on every load (null / range / set-membership / cross-field rules, each
    * with a violation count and rate) — ONE conditional-aggregate scan,
    * unpivoted to a labeled row per rule so a failing load names its rule
    * directly. All rules compare integers or exact decimals (no float
    * thresholds to disagree over); rates are correctly-rounded IEEE
    * divisions of exact longs, rounded to 6 dp. The per-doc keep/drop twin
    * is `quality_gate`; this is the table-level contract check. 100 TB:
    * conditional sums ride the scan with map-side combine — adding a rule
    * adds a column, never a pass. */
  private[graft] def dqExpectationsOf(o: DataFrame): DataFrame = {
    val checks = Seq(
      ("custkey_not_null", col("o_custkey").isNull),
      ("totalprice_range", col("o_totalprice").isNull ||
        Det.dec(col("o_totalprice")) <= java.math.BigDecimal.ZERO ||
        Det.dec(col("o_totalprice")) > new java.math.BigDecimal("600000.00")),
      ("orderdate_era", col("o_orderdate").isNull ||
        col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
        col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
      ("priority_domain", !col("o_orderpriority").isin(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      ("status_domain", !col("o_orderstatus").isin("O", "F", "P")))
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map { case (n, pred) => sum(pred.cast("long")).as(s"v_$n") }
    val wide = o.agg(aggs.head, aggs.tail: _*)
    val stack = checks.map { case (n, _) => s"'$n', v_$n" }
      .mkString(s"stack(${checks.size}, ", ", ", ") AS (rule, n_violations)")
    wide.selectExpr("n_rows", stack)
      .select(col("rule"), col("n_rows").as("n_checked"), col("n_violations"),
        round(col("n_violations").cast("double") /
          col("n_rows").cast("double"), 6).as("violation_rate"))
      .orderBy("rule")
  }

  private def dqExpectations(s: SparkSession, d: String): DataFrame =
    dqExpectationsOf(orders(s, d))

  private val dqExpectationsSql =
    """WITH a AS (SELECT
      |  count(*) AS n_rows,
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS v_custkey_not_null,
      |  CAST(sum(CASE WHEN o_totalprice IS NULL
      |                  OR CAST(o_totalprice AS DECIMAL(12,2)) <= 0
      |                  OR CAST(o_totalprice AS DECIMAL(12,2)) > 600000.00
      |                THEN 1 ELSE 0 END) AS BIGINT) AS v_totalprice_range,
      |  CAST(sum(CASE WHEN o_orderdate IS NULL
      |                  OR o_orderdate < TIMESTAMP '1992-01-01'
      |                  OR o_orderdate >= TIMESTAMP '2000-01-01'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS v_orderdate_era,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN
      |                  ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS v_priority_domain,
      |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS v_status_domain
      |FROM orders)
      |SELECT rule, n_rows AS n_checked, n_violations,
      |       round(CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
      |         AS violation_rate
      |FROM (
      |  SELECT n_rows, 'custkey_not_null' AS rule, v_custkey_not_null AS n_violations FROM a
      |  UNION ALL SELECT n_rows, 'totalprice_range', v_totalprice_range FROM a
      |  UNION ALL SELECT n_rows, 'orderdate_era', v_orderdate_era FROM a
      |  UNION ALL SELECT n_rows, 'priority_domain', v_priority_domain FROM a
      |  UNION ALL SELECT n_rows, 'status_domain', v_status_domain FROM a)
      |ORDER BY rule""".stripMargin

  // ---- N35l dq_benford: first-digit law screen -----------------------------

  /** `dq_benford`: first-significant-digit distribution of order totals vs
    * Benford's law — the classic fabricated-data screen an audit layer runs
    * on any money column. The digit comes from the INTEGER cents value via
    * string head (both engines print a BIGINT identically — no float
    * formatting in the comparison path); observed share is one exact-long
    * division; the Benford expectation log10(1+1/d) is the only libm call,
    * rounded to 6 dp where all nine constants sit far from a rounding
    * boundary. Single scan + 9-row aggregate; trivially partition-parallel. */
  private def dqBenford(s: SparkSession, d: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(12,2)") * 100)
      .cast("decimal(12,0)").cast("long")
    val total = orders(s, d).agg(count(lit(1)).as("n_total"))
    orders(s, d)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("n_total"), 6).as("share"),
        round(log10(lit(1.0d) + lit(1.0d) / col("digit")), 6).as("benford"))
      .orderBy("digit")
  }

  private val dqBenfordSql =
    """WITH c AS (
      |  SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |              AS DECIMAL(12,0)) AS BIGINT) AS cents
      |  FROM orders),
      |d AS (
      |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
      |         count(*) AS n
      |  FROM c GROUP BY 1)
      |SELECT digit, n,
      |       round(CAST(n AS DOUBLE) / (SELECT sum(n) FROM d), 6) AS share,
      |       round(log10(1.0 + 1.0 / digit), 6) AS benford
      |FROM d ORDER BY digit""".stripMargin

  // ---- N35m dq_referential: cross-table integrity audit --------------------

  /** `dq_referential`: the FK-integrity audit a load pipeline runs across
    * the star schema — orphan counts for every declared relationship
    * (lineitem→orders, lineitem→part, lineitem→supplier, orders→customer)
    * plus each parent key's duplicate count, as one labeled report. Each
    * orphan check is ONE left-anti join on the key (the child shuffles
    * once; the parent key set is dim-sized or shares the child's
    * partitioning); each uniqueness check is one keyed count on the
    * parent. Labeled single-row results union into the report — the same
    * audit-report shape as dq_expectations, extended across tables. */
  private[graft] def fkOrphans(name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
      child.select(col(fk)).join(parent.select(col(pk)),
          col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_bad"))
        .select(lit(name).as("chk"), col("n_bad"))

  private[graft] def pkDups(name: String, parent: DataFrame, pk: String): DataFrame =
      parent.groupBy(col(pk)).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_bad"))
        .select(lit(name).as("chk"), col("n_bad"))

  /** `dq_k_anonymity`: the k-anonymity / l-diversity privacy audit
    * (Sweeney 2002; Machanavajjhala et al. 2007) a pipeline owes before
    * releasing or training on joined user data — can any quasi-identifier
    * combination single out fewer than k individuals, and do those groups
    * carry diverse sensitive values? Quasi-identifiers here: (nation,
    * market segment); sensitive attribute: the account-balance band
    * (1000-unit buckets, floored). ONE customer scan into a
    * (nation, segment)-keyed agg computing the group size and the distinct
    * sensitive-band count (map-side combine; the distinct is bounded by
    * the band domain), then a group-cardinality-sized rollup into one
    * summary row: total groups, groups below k=5, rows in those groups
    * (re-identification exposure), the exposure rate, and the minimum
    * l across groups (l < 2 = a homogeneous group leaks its sensitive
    * value even at size ≥ k). All integers except the one rounded rate. */
  private[graft] def dqKAnonymityOf(c: DataFrame): DataFrame = {
    val band = floor(col("c_acctbal") / 1000.0d).cast("long")
    val groups = c
      .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("grp_n"),
        countDistinct(col("band")).as("l_div"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("grp_n") < 5, 1L).otherwise(0L)).as("groups_below_k"),
      sum(when(col("grp_n") < 5, col("grp_n")).otherwise(0L))
        .as("rows_at_risk"),
      round(sum(when(col("grp_n") < 5, col("grp_n")).otherwise(0L))
        .cast("double") / sum(col("grp_n")).cast("double"), 6)
        .as("risk_rate"),
      min(col("l_div")).as("min_l"))
  }

  private def dqKAnonymity(s: SparkSession, d: String): DataFrame =
    dqKAnonymityOf(customer(s, d))

  private val dqKAnonymitySql =
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS grp_n,
      |    count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l_div
      |  FROM customer
      |  GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS groups_below_k,
      |  CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  round(CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(grp_n) AS DOUBLE), 6) AS risk_rate,
      |  CAST(min(l_div) AS BIGINT) AS min_l
      |FROM g""".stripMargin

  private def dqReferential(s: SparkSession, d: String): DataFrame = {
    def orphans(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String) = fkOrphans(name, child, fk, parent, pk)
    def dups(name: String, parent: DataFrame, pk: String) = pkDups(name, parent, pk)
    orphans("lineitem_orders_fk", lineitem(s, d), "l_orderkey",
        orders(s, d), "o_orderkey")
      .unionAll(orphans("lineitem_part_fk", lineitem(s, d), "l_partkey",
        part(s, d), "p_partkey"))
      .unionAll(orphans("lineitem_supplier_fk", lineitem(s, d), "l_suppkey",
        supplier(s, d), "s_suppkey"))
      .unionAll(orphans("orders_customer_fk", orders(s, d), "o_custkey",
        customer(s, d), "c_custkey"))
      .unionAll(dups("orders_pk_unique", orders(s, d), "o_orderkey"))
      .unionAll(dups("customer_pk_unique", customer(s, d), "c_custkey"))
      .orderBy("chk")
  }

  private val dqReferentialSql =
    """SELECT chk, CAST(n_bad AS BIGINT) AS n_bad FROM (
      |SELECT 'lineitem_orders_fk' AS chk, count(*) AS n_bad FROM lineitem
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |UNION ALL
      |SELECT 'lineitem_part_fk', count(*) FROM lineitem
      |WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
      |UNION ALL
      |SELECT 'lineitem_supplier_fk', count(*) FROM lineitem
      |WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
      |UNION ALL
      |SELECT 'orders_customer_fk', count(*) FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |UNION ALL
      |SELECT 'orders_pk_unique', coalesce(sum(c - 1), 0) FROM
      |  (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1 HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'customer_pk_unique', coalesce(sum(c - 1), 0) FROM
      |  (SELECT c_custkey, count(*) AS c FROM customer GROUP BY 1 HAVING count(*) > 1))
      |ORDER BY chk""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "dq_referential" -> Q(dqReferential, Some(dqReferentialSql)),
    "dq_k_anonymity" -> Q(dqKAnonymity, Some(dqKAnonymitySql)),
    "dq_benford" -> Q(dqBenford, Some(dqBenfordSql)),
    "audit_checksum" -> Q(auditChecksum, Some(auditChecksumSql)),
    "dq_expectations" -> Q(dqExpectations, Some(dqExpectationsSql)),
    "table_diff" -> Q(tableDiff, Some(tableDiffSql)),
    "cdc_apply" -> Q(cdcApply, Some(cdcApplySql)),
    "profile_table" -> Q(profileTable, Some(profileTableSql)),
    "dq_skew_report" -> Q(dqSkewReport, Some(dqSkewReportSql)),
    "dq_freshness" -> Q(dqFreshness, Some(dqFreshnessSql)),
    "dq_key_discovery" -> Q(dqKeyDiscovery, Some(dqKeyDiscoverySql)),
    "profile_table_approx" -> Q(profileTableApprox, None),
    "profile_table_approx_bound" ->
      Q(profileTableApproxBound, Some(profileTableApproxBoundSql)),
    "agg_histogram" -> Q(aggHistogram, Some(aggHistogramSql)),
    "agg_histogram_eqdepth" -> Q(aggHistogramEqdepth, Some(aggHistogramEqdepthSql)),
    "drift_psi" -> Q(driftPsi, Some(driftPsiSql)),
    "drift_ks" -> Q(driftKs, Some(driftKsSql)),
    "drift_ks_scaled" -> Q(driftKsScaled, Some(driftKsSql)),
    "corr_pearson" -> Q(corrPearson, Some(corrPearsonSql)),
    "eval_cohen_kappa" -> Q(evalCohenKappa, Some(evalCohenKappaSql)),
    "eval_calibration" -> Q(evalCalibration, Some(evalCalibrationSql)),
    "eval_confusion" -> Q(evalConfusion, Some(evalConfusionSql)),
    "eval_conformal_coverage" ->
      Q(evalConformalCoverage, Some(evalConformalCoverageSql)),
    "eval_auc" -> Q(evalAuc, Some(evalAucSql)),
    "eval_auc_scaled" -> Q(evalAucScaled, Some(evalAucSql)),
    "eval_pr_auc" -> Q(evalPrAuc, Some(evalPrAucSql)),
    "eval_gains_table" -> Q(evalGainsTable, Some(evalGainsTableSql)),
    "dq_chi_square" -> Q(dqChiSquare, Some(dqChiSquareSql)),
    "corr_spearman" -> Q(corrSpearman, Some(corrSpearmanSql)),
    "corr_spearman_scaled" -> Q(corrSpearmanScaled, Some(corrSpearmanSql)),
    "winsorize_stats" -> Q(winsorizeStats, Some(winsorizeStatsSql)))
}
