package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoinOps

/** Merge semantics of the custom as-of join operator (graft.plans.AsOfJoin):
  * the single-pass per-partition merge must implement "latest right row with
  * key match and time <= left time, inner" across every boundary shape —
  * candidate carry within a key, reset across keys, inclusive equality,
  * unmatched left rows dropped, and correctness under multi-partition
  * shuffles (keys co-hash, merge is per partition). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def join(l: DataFrame, r: DataFrame): Seq[(Long, Long, Long, String)] =
    AsOfJoinOps.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("t"), col("rt"), col("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq.sorted

  private def leftDf(rows: (Long, Long)*) = rows.toDF("k", "t")
  private def rightDf(rows: (Long, Long, String)*) = rows.toDF("rk", "rt", "v")

  test("latest-at-or-before semantics: carry, inclusive equality, unmatched dropped") {
    val l = leftDf((1L, 5L), (1L, 10L), (1L, 20L), (2L, 3L))
    val r = rightDf((1L, 4L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (2L, 7L, "z"))
    // k=1,t=5 -> a (4<=5); t=10 -> b (equality inclusive); t=20 -> c (carry
    // past 15); k=2,t=3 -> no click at/before 3 -> dropped (inner)
    assert(join(l, r) == Seq((1L, 5L, 4L, "a"), (1L, 10L, 10L, "b"), (1L, 20L, 15L, "c")))
  }

  test("candidate resets across key boundaries") {
    val l = leftDf((2L, 100L))
    val r = rightDf((1L, 1L, "other-key"), (3L, 1L, "later-key"))
    // right rows exist on both sides of key 2 in sort order; neither matches
    assert(join(l, r) == Seq())
  }

  test("right side empty / left side empty") {
    assert(join(leftDf((1L, 1L)), rightDf()) == Seq())
    assert(join(leftDf(), rightDf((1L, 1L, "x"))) == Seq())
  }

  test("tolerance: a stale candidate counts as no match (inner drops, outer nulls)") {
    val l = leftDf((1L, 10L), (1L, 100L))
    val r = rightDf((1L, 8L, "fresh-for-10"))
    // t=10: candidate age 2 <= 5 -> match; t=100: age 92 > 5 -> stale
    val inner = AsOfJoinOps
      .asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt", tolerance = Some(5L))
      .select(col("t"), col("v")).collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(inner == Seq((10L, "fresh-for-10")))
    val outer = AsOfJoinOps
      .asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
        leftOuter = true, tolerance = Some(5L))
      .select(col("t"), col("v")).collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) null else x.getString(1))).toSeq.sortBy(_._1)
    assert(outer == Seq((10L, "fresh-for-10"), (100L, null)))
  }

  test("multi-column keys: both components must match") {
    val l = Seq((1L, 7L, 50L)).toDF("k", "k2", "t")
    val r = Seq((1L, 7L, 40L, "both-match"), (1L, 8L, 45L, "k2-differs"))
      .toDF("rk", "rk2", "rt", "v")
    val got = AsOfJoinOps
      .asofJoin(l, r, Seq("k", "k2"), Seq("rk", "rk2"), "t", "rt")
      .select(col("v")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("both-match"))
  }

  test("left outer: unmatched left rows survive with nulls on the right") {
    val l = leftDf((1L, 5L), (2L, 3L))
    val r = rightDf((1L, 4L, "a"))
    val got = AsOfJoinOps
      .asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt", leftOuter = true)
      .select(col("k"), col("t"), col("rt"), col("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2),
        if (x.isNullAt(3)) null else x.getString(3))).toSeq.sortBy(_._1)
    assert(got == Seq((1L, 5L, 4L, "a"), (2L, 3L, -1L, null)))
  }

  test("agrees with the compositional union+window form on random-ish data") {
    // 40 keys x irregular times, derived deterministically
    val l = (1 to 400).map(i => ((i % 40).toLong, (i * 7 % 97).toLong)).distinct
    val r = (1 to 300).map(i => ((i % 40).toLong, (i * 11 % 89).toLong))
      .distinct.map { case (k, t) => (k, t, s"v$k-$t") }
    val native = join(leftDf(l: _*), rightDf(r: _*))
    // oracle: for each left row, max right rt <= t within key, via a plain join
    val expected = for {
      (k, t) <- l
      cands = r.filter { case (rk, rt, _) => rk == k && rt <= t }
      if cands.nonEmpty
    } yield {
      val (rk, rt, v) = cands.maxBy(_._2)
      (k, t, rt, v)
    }
    assert(native == expected.sorted)
  }

  test("physical plan: AsOfJoinExec with co-hash exchanges and (key,time) sorts") {
    val l = leftDf((1L, 5L)); val r = rightDf((1L, 4L, "a"))
    val df = AsOfJoinOps.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("AsOfJoin \\[k".r.findFirstIn(p).isDefined,
      s"custom operator must plan (exec node prints as 'AsOfJoin [keys]'):\n$p")
    assert("Exchange hashpartitioning\\(k".r.findFirstIn(p).isDefined &&
      "Exchange hashpartitioning\\(rk".r.findFirstIn(p).isDefined,
      s"both sides must co-hash on the key:\n$p")
    assert("Sort \\[k".r.findFirstIn(p).isDefined,
      s"EnsureRequirements must insert (key,time) sorts:\n$p")
  }

  test("column pruning rule: a narrow projection on top prunes both scans") {
    // events has 6 columns; the join uses (user_id, ts) and the projection
    // one value column per side — the parquet ReadSchema must shrink
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    val clicks = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .toDF(Tables.events(spark, sfDir).columns.map("c_" + _): _*)
    val joined = AsOfJoinOps.asofJoin(
        purchases, clicks, Seq("user_id"), Seq("c_user_id"), "ts", "c_ts")
      .select(col("event_id"), col("c_value"))
    joined.collect()
    val formatted = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // neither side's scan may read props (never referenced anywhere)
    assert(!formatted.contains("props"),
      s"unreferenced columns must be pruned from both scans:\n$formatted")
  }

  test("optimizer rule pushes left-only filters below the join (to the scan)") {
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = AsOfJoinOps.asofJoin(
        purchases, clicks, Seq("user_id"), Seq("c_user"), "ts", "c_ts")
      .filter(col("event_id") < 100)   // left-only predicate ON TOP of the join
    val optimized = joined.queryExecution.optimizedPlan.toString
    // after PushFilterThroughAsOfJoin the top-level operator is the join,
    // not the filter — the predicate has descended into the left subtree
    assert(optimized.trim.startsWith("AsOfJoin"),
      s"left-only filter must commute below the as-of join:\n$optimized")
    assert(joined.queryExecution.executedPlan.toString.contains("event_id"),
      "pushed predicate must survive to the physical left side")
    assert(joined.filter(col("event_id") < 100).count() ==
      joined.count(), "pushdown must not change results")
  }

  test("SQL marker route: asof_match rewrites to the same operator and rows") {
    leftDf((1L, 5L), (1L, 10L), (1L, 20L), (2L, 3L))
      .createOrReplaceTempView("v_asof_l")
    rightDf((1L, 4L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (2L, 7L, "z"))
      .createOrReplaceTempView("v_asof_r")
    val viaSql = spark.sql(
      """SELECT k, t, rt, v FROM v_asof_l l JOIN v_asof_r r
        |  ON l.k = r.rk AND asof_match(l.t, r.rt)""".stripMargin)
    assert(viaSql.collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq.sorted ==
      Seq((1L, 5L, 4L, "a"), (1L, 10L, 10L, "b"), (1L, 20L, 15L, "c")))
    val p = viaSql.queryExecution.executedPlan.toString
    assert("AsOfJoin \\[k".r.findFirstIn(p).isDefined,
      s"SQL route must plan the custom exec, not a fallback:\n$p")
    // reversed marker orientation (key = key, asof_match(right, left)) also
    // rewrites when the equi-key flips — LEFT JOIN maps to the outer flavor
    val outer = spark.sql(
      """SELECT k, t, v FROM v_asof_l l LEFT JOIN v_asof_r r
        |  ON r.rk = l.k AND asof_match(l.t, r.rt)""".stripMargin)
    assert(outer.collect().map(x =>
        (x.getLong(0), x.getLong(1), if (x.isNullAt(2)) null else x.getString(2)))
        .toSeq.sortBy(x => (x._1, x._2)) ==
      Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"), (2L, 3L, null)))
  }

  test("SQL marker route fails loudly when the shape is not rewritable") {
    leftDf((1L, 5L)).createOrReplaceTempView("v_asof_l2")
    rightDf((1L, 4L, "a")).createOrReplaceTempView("v_asof_r2")
    // marker under OR cannot be split into marker + equi conjuncts: the rule
    // leaves the Join untouched and the Unevaluable marker must error, never
    // silently degrade to "all earlier rows"
    val bad = spark.sql(
      """SELECT * FROM v_asof_l2 l JOIN v_asof_r2 r
        |  ON l.k = r.rk OR asof_match(l.t, r.rt)""".stripMargin)
    assert(intercept[Exception](bad.collect()) != null)
  }

  test("keyless marker join fails loudly, not with an internal planner error") {
    leftDf((1L, 5L)).createOrReplaceTempView("v_asof_l3")
    rightDf((1L, 4L, "a")).createOrReplaceTempView("v_asof_r3")
    // no equi conjunct at all: the rule must leave the join untouched (the
    // Unevaluable marker errors) rather than build AsOfJoin(keys = Nil) and
    // die inside ClusteredDistribution (r10 review)
    val bad = spark.sql(
      """SELECT * FROM v_asof_l3 l JOIN v_asof_r3 r
        |  ON asof_match(l.t, r.rt)""".stripMargin)
    val ex = intercept[Exception](bad.collect())
    assert(!ex.getMessage.contains("ClusteredDistribution"), ex.getMessage)
  }

  test("NULL time semantics: null never matches (SQL rt <= lt contract)") {
    // nullable time columns on both sides
    val l = Seq((1L, Some(5L)), (1L, None), (2L, Some(3L)))
      .toDF("k", "t")
    val r = Seq((1L, None: Option[Long], "n"), (1L, Some(4L), "a"),
      (2L, None: Option[Long], "m")).toDF("rk", "rt", "v")
    // inner: (1, 5) -> "a" (the null-time right row must NOT win even
    // though it sorts first); (1, null) -> dropped; (2, 3) -> dropped (its
    // only right row has a null time)
    val inner = AsOfJoinOps.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq.sorted
    assert(inner == Seq((1L, 5L, "a")))
    // outer: the null-time left row and the null-time-only key null-extend
    val outer = AsOfJoinOps.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
        leftOuter = true)
      .select("k", "t", "v").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1),
        if (x.isNullAt(2)) null else x.getString(2))).toSeq
      .sortBy(p => (p._1, p._2))
    assert(outer == Seq((1L, -1L, null), (1L, 5L, "a"), (2L, 3L, null)))
    // tolerance mode must not throw on the null rows either
    val tol = AsOfJoinOps.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
        tolerance = Some(10L))
      .select("k", "t", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq.sorted
    assert(tol == Seq((1L, 5L, "a")))
  }

  test("cross-side type mismatch fails loudly instead of matching garbage") {
    val l = Seq((1, 5)).toDF("k", "t") // INT key and time
    val r = Seq((1L, 4L, "a")).toDF("rk", "rt", "v") // BIGINT key and time
    val ex = intercept[IllegalArgumentException] {
      AsOfJoinOps.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(ex.getMessage.contains("type mismatch"), ex.getMessage)
  }

  test("SQL marker rewrite preserves standard = null-key semantics") {
    Seq((Some(1L), 5L), (None: Option[Long], 6L))
      .toDF("k", "t").createOrReplaceTempView("v_asof_l4")
    Seq((Some(1L), 4L, "a"), (None: Option[Long], 3L, "n"))
      .toDF("rk", "rt", "v").createOrReplaceTempView("v_asof_r4")
    // plain SQL `=` never matches NULL keys: the null-key left row must not
    // pair with the null-key right row after the AsOfJoin rewrite (r10 —
    // the rewrite conjoins IsNotNull filters to keep the written semantics)
    val inner = spark.sql(
      """SELECT l.k, l.t, r.v FROM v_asof_l4 l JOIN v_asof_r4 r
        |  ON l.k = r.rk AND asof_match(l.t, r.rt)""".stripMargin).collect()
    assert(inner.length == 1 && inner.head.getLong(0) == 1L &&
      inner.head.getString(2) == "a")
    val outer = spark.sql(
      """SELECT l.k, l.t, r.v FROM v_asof_l4 l LEFT JOIN v_asof_r4 r
        |  ON l.k = r.rk AND asof_match(l.t, r.rt)""".stripMargin).collect()
      .map(x => (if (x.isNullAt(0)) -1L else x.getLong(0),
        if (x.isNullAt(2)) null else x.getString(2))).toSeq.sortBy(_._1)
    assert(outer == Seq((-1L, null), (1L, "a")))
  }

  test("case-insensitive column resolution in the Scala API") {
    val l = leftDf((1L, 5L))
    val r = rightDf((1L, 4L, "a"))
    val got = AsOfJoinOps.asofJoin(l, r, Seq("K"), Seq("RK"), "T", "RT")
      .select("k", "v").collect()
    assert(got.length == 1 && got.head.getString(1) == "a")
  }
}
