package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery surface: EXISTS / NOT EXISTS / IN / scalar / correlated-scalar /
  * lateral — the relational shapes (TPC-H Q4/Q17/Q18/Q22) a reference user
  * writes as nested SQL rather than explicit joins. The engine's job is to
  * DECORRELATE them into the join/agg plans we register elsewhere; each query
  * here goes through `spark.sql` on purpose so Catalyst's
  * RewritePredicateSubquery / decorrelation rules are what's under test, and
  * PlanAuditSpec asserts the rewrite landed (semi/anti join, one aggregate
  * under the join, a once-executed ScalarSubquery).
  *
  * The SQL text is shared verbatim between the Spark side and the DuckDB
  * oracle via a table-name template, so the two can never drift.
  *
  * Scale notes (100 TB): EXISTS/IN become LEFT SEMI joins shuffling on the
  * fact's join key exactly once (AQE broadcasts when the filtered build side
  * is small); NOT EXISTS becomes a LEFT ANTI join, never a per-row probe;
  * correlated scalar aggregates decorrelate into ONE partial-agg'd groupBy +
  * join rather than an O(n) re-scan per outer row; uncorrelated scalars
  * execute once and ship to every task as a literal. All threshold
  * comparisons are cross-multiplied decimal-exact (no AVG division), so the
  * oracle hash is engine-independent.
  */
object SubqueryQueries {
  import Tables._

  /** Registers temp views (one fixed prefix per table) and returns the SQL
    * with `{t}` placeholders bound to them; `oracleOf` binds the same
    * template to the driver's DuckDB table names. */
  private def bind(tpl: String, prefix: String): String =
    Tables.names.foldLeft(tpl)((t, n) => t.replace(s"{$n}", prefix + n))

  private def run(s: SparkSession, d: String, tpl: String): DataFrame = {
    Seq("orders", "lineitem", "customer", "nation")
      .foreach(n => table(s, d, n).createOrReplaceTempView("v_sq_" + n))
    s.sql(bind(tpl, "v_sq_"))
  }

  private def oracleOf(tpl: String): String = bind(tpl, "")

  // ---- EXISTS (TPC-H Q4 shape) --------------------------------------------

  /** `subquery_exists`: orders-per-priority where SOME line is a bulk line.
    * Decorrelates to a LEFT SEMI join on l_orderkey; the lineitem side is
    * filtered BEFORE the semi join (pushdown under the subquery). */
  private val existsTpl =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM {orders} o
      |WHERE EXISTS (SELECT 1 FROM {lineitem} l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---- NOT EXISTS (TPC-H Q22 shape) ---------------------------------------

  /** `subquery_not_exists`: customers with no high-value order, per segment —
    * the anti-join form of the reference's "new entities only" insert guard.
    * The subquery's own predicate filters BEFORE the anti join builds. */
  private val notExistsTpl =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM {customer} c
      |WHERE NOT EXISTS (SELECT 1 FROM {orders} o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 250000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---- IN + HAVING (TPC-H Q18 shape) --------------------------------------

  /** `subquery_in`: orders whose total line quantity clears a threshold —
    * IN over a grouped HAVING subquery; plans as ONE aggregate then a semi
    * join, not a per-row membership probe. Decimal-exact sum. */
  private val inTpl =
    """SELECT o_orderkey, o_totalprice
      |FROM {orders}
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM {lineitem}
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180)
      |ORDER BY o_orderkey""".stripMargin

  // ---- uncorrelated scalar -------------------------------------------------

  /** `subquery_scalar`: rows above 1.5× the global mean price, counted per
    * priority. The two scalar subqueries run ONCE (one job), then ship as
    * literals — cross-multiplied (2·price·n > 3·sum) so no division touches
    * the comparison. */
  private val scalarTpl =
    """SELECT o_orderpriority, count(*) AS n_pricey
      |FROM {orders}
      |WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (SELECT count(*) FROM {orders}) * 2
      |      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) FROM {orders}) * 3
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---- correlated scalar (TPC-H Q17 shape) ---------------------------------

  /** `subquery_correlated`: orders more than 2× their OWN customer's mean —
    * two correlated scalar aggregates over the same group. Catalyst
    * decorrelates to one groupBy(o_custkey) aggregate joined back; the
    * oracle proves the decorrelation is value-exact. */
  private val correlatedTpl =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM {orders} o
      |WHERE CAST(o.o_totalprice AS DECIMAL(12,2)) *
      |        (SELECT count(*) FROM {orders} i WHERE i.o_custkey = o.o_custkey)
      |      > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(12,2)))
      |         FROM {orders} i WHERE i.o_custkey = o.o_custkey) * 2
      |ORDER BY o.o_orderkey""".stripMargin

  // ---- lateral join --------------------------------------------------------

  /** `subquery_lateral`: per-nation top customer by balance via a correlated
    * LATERAL derived table (ORDER BY … LIMIT 1 inside). The per-group-top-1
    * a reference user writes naturally in SQL; the engine turns it into a
    * bounded per-key window, never a per-nation re-scan. */
  private val lateralTpl =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM {nation} n,
      |LATERAL (SELECT c_name, c_acctbal FROM {customer} c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 1) t
      |ORDER BY n_name""".stripMargin

  // ---- WITH RECURSIVE (hierarchy walk) ------------------------------------

  /** `sql_recursive_chain`: a referral-forest rollup through Spark 4's
    * recursive CTE (UnionLoop) — the hierarchy/BOM-walk SQL shape. Parent of
    * customer k is FLOOR(k/10): a derived forest rooted at keys < 10, walked
    * breadth-first by the recursion; per (root, level) the cohort size and a
    * decimal-exact balance sum verify every BFS frontier row-for-row against
    * DuckDB's recursion over the identical template. Spark's recursive CTE
    * supports UNION ALL only (cyclic closures like the CC oracle's would not
    * terminate) — acyclic finite-depth walks are exactly its domain. The
    * template is dialect-neutral: CAST(FLOOR(x/10) AS BIGINT) is the shared
    * integer division, and depth is cast to BIGINT so both engines emit
    * int64. Scale: each recursion level is one equi join of the (pruned)
    * customer scan against the previous frontier — level count is the key's
    * digit depth (log10 n), and every join shuffles frontier-sized rows,
    * never the full table per level. */
  private val recursiveChainTpl =
    """WITH RECURSIVE chain AS (
      |  SELECT c_custkey AS custkey, c_custkey AS root, 0 AS depth,
      |         c_acctbal AS bal
      |  FROM {customer} WHERE c_custkey < 10
      |  UNION ALL
      |  SELECT c.c_custkey, ch.root, ch.depth + 1, c.c_acctbal
      |  FROM {customer} c JOIN chain ch
      |    ON CAST(FLOOR(c.c_custkey / 10) AS BIGINT) = ch.custkey
      |  WHERE c.c_custkey >= 10)
      |SELECT root, CAST(depth AS BIGINT) AS lvl, count(*) AS members,
      |       CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS bal_sum
      |FROM chain GROUP BY root, depth ORDER BY root, lvl""".stripMargin

  private val tpls: Seq[(String, String)] = Seq(
    "subquery_exists" -> existsTpl,
    "subquery_not_exists" -> notExistsTpl,
    "subquery_in" -> inTpl,
    "subquery_scalar" -> scalarTpl,
    "subquery_correlated" -> correlatedTpl,
    "subquery_lateral" -> lateralTpl,
    "sql_recursive_chain" -> recursiveChainTpl)

  def all: Seq[(String, Q)] = tpls.map { case (k, tpl) =>
    k -> Q((s, d) => run(s, d, tpl), Some(oracleOf(tpl)))
  }
}
