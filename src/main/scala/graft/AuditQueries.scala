package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  private def auditChecksum(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(conv(substring(md5(concat_ws("|",
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity").cast("decimal(12,2)"))), 1, 8), 16, 10)
        .cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))

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
  private def tableDiff(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
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
    * row count, all in ONE pass (one scan, one scalar aggregate; the
    * count-distincts expand to Spark's single-pass multi-distinct plan).
    * Doubles are profiled via DECIMAL bounds so the comparison is exact.
    * At 100 TB the same query swaps count(DISTINCT) for approx_count_
    * distinct (the agg_approx_distinct path) — the scan shape is identical. */
  private def profileTable(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("custkey_nulls"),
        countDistinct(col("o_custkey")).as("custkey_distinct"),
        min(col("o_orderdate")).cast("date").as("date_lo"),
        max(col("o_orderdate")).cast("date").as("date_hi"),
        countDistinct(col("o_orderpriority")).as("priority_distinct"),
        min(col("o_totalprice").cast("decimal(12,2)")).as("price_lo"),
        max(col("o_totalprice").cast("decimal(12,2)")).as("price_hi"),
        sum(col("o_totalprice").isNull.cast("long")).as("price_nulls"))

  private val profileTableSql =
    """SELECT count(*) AS n_rows,
      |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_nulls,
      |       count(DISTINCT o_custkey) AS custkey_distinct,
      |       CAST(min(o_orderdate) AS DATE) AS date_lo,
      |       CAST(max(o_orderdate) AS DATE) AS date_hi,
      |       count(DISTINCT o_orderpriority) AS priority_distinct,
      |       min(CAST(o_totalprice AS DECIMAL(12,2))) AS price_lo,
      |       max(CAST(o_totalprice AS DECIMAL(12,2))) AS price_hi,
      |       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS price_nulls
      |FROM orders""".stripMargin

  /** `agg_histogram`: 20-bucket equi-width histogram of order value — the
    * numeric-distribution half of profiling (length_histogram covers the
    * log2 flavor). Bounds come from one scalar-agg pass broadcast onto the
    * scan; bucket = floor((x-lo)/w) clamped to the top bucket, computed
    * with the same IEEE ops in both engines (DuckDB has no width_bucket —
    * the explicit arithmetic IS the portable form). Per-bucket DECIMAL
    * bounds verify edge assignment exactly, not just the counts. */
  private def aggHistogram(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val mm = o.agg(min(col("o_totalprice")).as("lo"),
      max(col("o_totalprice")).as("hi"))
    o.crossJoin(broadcast(mm))
      .select(least(lit(19), floor((col("o_totalprice") - col("lo")) /
          ((col("hi") - col("lo")) / 20)).cast("int")).as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice").cast("decimal(12,2)")).as("b_lo"),
        max(col("o_totalprice").cast("decimal(12,2)")).as("b_hi"))
      .orderBy("bucket")
  }

  private val aggHistogramSql =
    """WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |            FROM orders)
      |SELECT LEAST(19, CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20))
      |         AS INTEGER)) AS bucket,
      |       count(*) AS n,
      |       min(CAST(o_totalprice AS DECIMAL(12,2))) AS b_lo,
      |       max(CAST(o_totalprice AS DECIMAL(12,2))) AS b_hi
      |FROM orders, mm GROUP BY 1 ORDER BY bucket""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "audit_checksum" -> Q(auditChecksum, Some(auditChecksumSql)),
    "table_diff" -> Q(tableDiff, Some(tableDiffSql)),
    "profile_table" -> Q(profileTable, Some(profileTableSql)),
    "agg_histogram" -> Q(aggHistogram, Some(aggHistogramSql)))
}
