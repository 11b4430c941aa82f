package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A whole-operator Catalyst extension (SURVEY.md §2.10 ladder rung (c)):
  * custom LogicalPlan + optimizer Rule + SparkStrategy + SparkPlan,
  * registered through SparkSessionExtensions / experimental methods — for
  * the one relational operator the reference's "latest status per key"
  * pattern (database.py:69-70) really wants and Spark genuinely lacks: the
  * AS-OF JOIN.
  *
  * Semantics (DuckDB `ASOF JOIN` compatible): each left row pairs with the
  * single right row sharing its key that has the greatest
  * `rightTime <= leftTime`; left rows with no such right row are dropped
  * (inner, the default) or emitted with nulls on the right
  * (`leftOuter = true`, DuckDB `ASOF LEFT JOIN`). An optional `tolerance`
  * (pandas merge_asof-style max lookback, in the time column's native
  * units) additionally requires `leftTime - rightTime <= tolerance`; a
  * candidate that exists but is too stale counts as no match. Tolerance
  * requires a numeric/timestamp time column (long-valued internally).
  * Right rows are expected unique per (key, time) — the caller
  * pre-aggregates ties (otherwise which tie wins is partition-order
  * dependent). SQL null-key semantics are NOT emulated: null keys match
  * like values (pre-filter nulls where that matters).
  *
  * 100 TB shape: both sides hash-partition on the key and sort within
  * partitions — exactly a sort-merge join's movement, but the merge keeps
  * ONE candidate row instead of buffering a match group, so execution is
  * O(n+m) streaming with O(1) state per partition. The compositional
  * alternative (union + window or range-join + dedup) costs an extra
  * window sort or an exploded inequality join at scale.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    leftOuter: Boolean = false,
    tolerance: Option[Long] = None)
  extends BinaryNode {

  // keyless as-of would reach the exec as ClusteredDistribution(Nil) — an
  // internal planner error in Spark 4; fail here with the real reason
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join requires at least one equi-join key (aligned left/right)")
  // cross-side type agreement, checked once resolved: the exec builds its
  // key/time orderings from the LEFT types and applies them to rows
  // projected with the RIGHT schema — a width mismatch (int vs bigint)
  // would read truncated UnsafeRow fields and match silently wrong
  if ((leftKeys ++ rightKeys :+ leftTime :+ rightTime).forall(_.resolved)) {
    leftKeys.zip(rightKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of key type mismatch: ${l.sql}: ${l.dataType.catalogString} vs " +
          s"${r.sql}: ${r.dataType.catalogString} — cast one side first")
    }
    require(leftTime.dataType == rightTime.dataType,
      s"as-of time type mismatch: ${leftTime.dataType.catalogString} vs " +
        s"${rightTime.dataType.catalogString} — cast one side first")
  }

  /** Left-outer emits unmatched left rows with nulls on the right, so the
    * right attributes turn nullable (mirrors Join's outer-side widening). */
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Left-side predicate pushdown through [[AsOfJoin]]: a filter that only
  * references left columns commutes with the join (each left row's match is
  * a function of that row alone), so it may descend to the scan and become a
  * Parquet pushed filter. RIGHT-side filters do NOT commute — removing a
  * right row can promote an earlier row into "latest" — and are left alone.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, j: AsOfJoin)
        if cond.deterministic && cond.references.subsetOf(j.left.outputSet) =>
      j.copy(left = Filter(cond, j.left))
  }
}

/** Column pruning through [[AsOfJoin]]: Spark's built-in ColumnPruning
  * cannot see through a custom node, so without this a narrow projection on
  * top of the join would still read every column at both scans. Keeps each
  * child's columns to those the projection uses plus the join's own
  * keys/times; converges because it only fires when a child's output
  * strictly shrinks. */
object PruneColumnsThroughAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoin) =>
      val needed = p.references ++
        (j.leftKeys ++ j.rightKeys :+ j.leftTime :+ j.rightTime)
          .map(_.references).reduce(_ ++ _)
      def prune(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(needed.contains)
        if (keep.length < child.output.length) Project(keep, child) else child
      }
      val nl = prune(j.left)
      val nr = prune(j.right)
      if (nl.eq(j.left) && nr.eq(j.right)) p
      else p.copy(child = j.copy(left = nl, right = nr))
  }
}

/** Plans the logical [[AsOfJoin]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, outer, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, outer, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned on the keys, co-sorted on
  * (keys, time) — Spark's EnsureRequirements inserts the exchanges/sorts —
  * then a single-pass per-partition merge that carries the latest right
  * candidate for the current key. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    leftOuter: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lk, leftOut)
      val rKeyProj = UnsafeProjection.create(rk, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // bind against nullability-widened right attrs: under leftOuter the
      // joined row carries an all-null right side, and a BoundReference
      // built non-nullable would skip the null check and read garbage
      val outProj = UnsafeProjection.create(output,
        if (leftOuter) leftOut ++ rightOut.map(_.withNullability(true))
        else leftOut ++ rightOut)
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightOut.length)
      val rBuf = rIt.buffered

      // long view of a time value, for the tolerance check (timestamps are
      // micros-longs internally; dates/ints widen)
      def timeAsLong(v: Any): Long = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"as-of tolerance needs a long-valued time column, got $other")
      }

      new Iterator[InternalRow] {
        // latest right row (with its key and time) consumed so far — copies,
        // because projections and iterators reuse buffers
        private var matchKey: UnsafeRow = _
        private var matchRow: UnsafeRow = _
        private var matchTime: Long = _
        private var out: InternalRow = _

        private def computeNext(): Unit = {
          out = null
          while (out == null && lIt.hasNext) {
            val lRow = lIt.next()
            val k = lKeyProj(lRow)
            val t = lTimeProj(lRow).get(0, timeType)
            // NULL time semantics (SQL: `rt <= lt` is never true with a
            // null on either side — r10; a boxed null would otherwise unbox
            // to 0 and match as the epoch): a null LEFT time matches
            // nothing; a null RIGHT time is consumed (it sorts first
            // within its key group) but never becomes the candidate.
            val tIsNull = t == null
            // consume right rows up to and including (key == k, time <= t);
            // rows with a smaller key invalidate any carried candidate
            var advance = true
            while (advance && rBuf.hasNext) {
              val peekKey = rKeyProj(rBuf.head)
              val c = keyOrd.compare(peekKey, k)
              if (c < 0) {
                rBuf.next()
                matchKey = null; matchRow = null
              } else if (c == 0) {
                val rt = rTimeProj(rBuf.head).get(0, timeType)
                if (rt == null) {
                  rBuf.next() // nulls-first within the key group; skip
                } else if (!tIsNull && timeOrd.lteq(rt, t)) {
                  val rRow = rBuf.next()
                  matchKey = rKeyProj(rRow).copy()
                  if (tolerance.isDefined) matchTime = timeAsLong(rt)
                  matchRow = rRow.asInstanceOf[UnsafeRow].copy()
                } else advance = false
              } else advance = false
            }
            def withinTolerance: Boolean = tolerance.forall(tol =>
              timeAsLong(t) - matchTime <= tol)
            if (!tIsNull && matchRow != null && matchKey != null &&
                keyOrd.compare(matchKey, k) == 0 && withinTolerance) {
              numMatchedRows += 1; numOutputRows += 1
              out = outProj(joined(lRow, matchRow))
            } else if (leftOuter) {
              numOutputRows += 1
              out = outProj(joined(lRow, nullRight))
            }
          }
        }

        override def hasNext: Boolean = { if (out == null) computeNext(); out != null }
        override def next(): InternalRow = {
          if (out == null) computeNext()
          val r = out; out = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the custom operator. */
object AsOfJoinOps {
  /** `left ASOF JOIN right ON leftKeys = rightKeys AND rightTime <= leftTime`
    * keeping the latest right row per left row (inner). Column sets of the
    * two sides must be disjoint (project/rename first — fresh attributes
    * also keep self-joins unambiguous). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      leftOuter: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val overlap = lp.output.map(_.exprId).toSet intersect rp.output.map(_.exprId).toSet
    require(overlap.isEmpty,
      s"asofJoin sides share attributes ($overlap) — project/rename one side first")
    // session-conf-aware resolution (spark.sql.caseSensitive) with an
    // ambiguity check — find(_.name == n) was case-sensitive where every
    // other Spark API isn't, and silently bound the FIRST of two
    // same-named columns (r10 review)
    val resolver = left.sparkSession.sessionState.analyzer.resolver
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.filter(a => resolver(a.name, n)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: matches ${many.map(_.name)} — rename first")
      }
    require(leftKeys.length == rightKeys.length, "key lists must align")
    GraftSqlShim.ofRows(left.sparkSession,
      AsOfJoin(lp, rp, leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
        attr(lp, leftTime), attr(rp, rightTime), leftOuter, tolerance))
  }
}
