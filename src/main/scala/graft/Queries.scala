package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A registered engine query: the Spark build plus (when DuckDB-expressible)
  * the equivalent oracle SQL the driver hash-compares against (SURVEY.md §2's
  * "Key"/"Oracle" columns). Column names and the total ordering MUST agree
  * between the two — the driver sorts columns by name then hashes values.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared oracle-determinism helpers.
  *
  * Money/quantity columns in the testdata are logically 2-decimal doubles, so
  * `CAST(x AS DECIMAL(12,2))` is EXACT on both Spark and DuckDB; summing the
  * decimals and casting the final result to double yields bit-identical
  * float64 on both engines regardless of aggregation order — unlike
  * `SUM(double)`, which is order-dependent. All compared aggregates use this.
  */
object Det {
  /** Exact 2-dp decimal view of a logically-2-dp double column. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Order-independent exact sum of a 2-dp double, back as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
  /** Deterministic average: exact decimal sum / count, in double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** Cross-engine-deterministic k-dp round of a double. `round(x, k)` is
    * NOT deterministic across engines at exact k-dp ties: Spark rounds x's
    * shortest decimal repr (BigDecimal.valueOf) HALF_UP, DuckDB rounds
    * x·10^k computed in floating point ties-away — and a quotient of exact
    * decimals (avg of 6-dp logps over small n) lands on exact ties at a
    * measurable rate (3 of 50k docs at the sf1 rehearsal, FIXTURES.md C4).
    * This form makes BOTH engines round the SAME double (x·10^k) with the
    * SAME ties-away rule; the residual divergence window is the shortest-
    * repr gap (~1e-11 per value). `+ 0.0` normalizes -0.0 (the r09 rule). */
  def detRound(c: Column, k: Int): Column = {
    val s = math.pow(10, k)
    (round(c * lit(s)) / lit(s)) + lit(0.0)
  }

  /** Same helpers, oracle-SQL side. */
  def sqlDsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(12,2))) AS DOUBLE)"
  def sqlDavg(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(12,2))) AS DOUBLE) / COUNT($x)"

  /** Oracle-SQL twin of [[detRound]]. */
  def sqlDetRound(x: String, k: Int): String = {
    val s = "1" + ("0" * k) + ".0"
    s"(round(($x) * $s) / $s + 0.0)"
  }
}

/** The full registry. Sections mirror SURVEY.md §2. */
object Queries {
  def all: Seq[(String, Q)] =
    RelationalQueries.all ++ ParseQueries.all ++ SkillQueries.all ++
      StreamQueries.all ++ NorthStarQueries.all ++ TrainDataQueries.all ++
      CorpusQueries.all ++ SubqueryQueries.all ++ EventQueries.all ++
      ClusterQueries.all ++ GraphQueries.all ++ EntityQueries.all ++
      AuditQueries.all ++ SearchQueries.all

  lazy val byName: Map[String, Q] = all.toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.build }.toMap

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }.toMap
}
