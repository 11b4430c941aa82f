package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, BinaryExpression, EqualTo, Expression, ExpressionInfo, IsNotNull, Predicate, Unevaluable}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL frontend for the [[AsOfJoin]] whole-operator extension.
  *
  * Spark's SQL grammar has no ASOF JOIN production and its function registry
  * cannot register table-valued operators, so the idiomatic Catalyst route is
  * a MARKER-FUNCTION REWRITE: users write a plain join whose ON clause calls
  * `asof_match(left_ts, right_ts)`,
  *
  * {{{
  *   SELECT ... FROM purchases p JOIN clicks c
  *     ON p.user_id = c.c_user AND asof_match(p.ts, c.c_ts)
  * }}}
  *
  * and [[RewriteAsOfMarkerJoin]] rewrites the logical Join into the custom
  * [[AsOfJoin]] node ("latest right row with right_ts <= left_ts per left
  * row"), which then plans through AsOfJoinStrategy exactly like the Scala
  * DSL route. `JOIN` maps to the inner as-of; `LEFT JOIN` to the outer one
  * (DuckDB `ASOF JOIN` / `ASOF LEFT JOIN` semantics, join_asof_native's
  * oracle).
  *
  * Fail-loud by construction: [[AsOfMatch]] is Unevaluable, so if a query
  * uses the marker in a position the rule cannot rewrite (wrong side
  * orientation, OR-ed conditions, non-equi residuals) the query errors at
  * planning/runtime instead of silently degrading to "all earlier rows".
  */
case class AsOfMatch(left: Expression, right: Expression)
  extends BinaryExpression with Predicate with Unevaluable {
  override def prettyName: String = "asof_match"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfMatch =
    copy(left = newLeft, right = newRight)
}

object AsOfMatch {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[AsOfMatch].getCanonicalName, "asof_match")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2,
      s"asof_match(left_time, right_time) takes 2 arguments, got ${args.length}")
    AsOfMatch(args(0), args(1))
  }
}

/** Rewrites `Join(..., cond ∋ asof_match(lt, rt))` into [[AsOfJoin]].
  *
  * The condition must be a conjunction of exactly one marker plus equi-key
  * conjuncts, each orientable as left-attr = right-attr; the marker's first
  * argument must come from the left (probe) side and the second from the
  * right. Anything else — including a KEYLESS marker join — is left
  * untouched; the Unevaluable marker then fails the query loudly. The
  * rewrite conjoins IsNotNull filters on the key columns (right side
  * always; left side under Inner) so the standard SQL `=` null semantics
  * the user wrote are preserved — AsOfJoin itself compares null keys as
  * equal (its documented contract for the Scala API).
  */
object RewriteAsOfMarkerJoin extends Rule[LogicalPlan] {
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, joinType, Some(cond), _)
        if (joinType == Inner || joinType == LeftOuter) &&
          cond.exists(_.isInstanceOf[AsOfMatch]) =>
      val parts = conjuncts(cond)
      val (markers, rest) = parts.partition(_.isInstanceOf[AsOfMatch])
      val oriented = rest.map {
        case EqualTo(a, b)
            if a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet) => Some((a, b))
        case EqualTo(a, b)
            if b.references.subsetOf(left.outputSet) &&
              a.references.subsetOf(right.outputSet) => Some((b, a))
        case _ => None
      }
      markers match {
        // oriented.nonEmpty: a keyless marker join would reach the planner
        // as ClusteredDistribution(Nil) — leaving it untouched fails loudly
        // through the Unevaluable marker instead (r10 review)
        case Seq(AsOfMatch(lt, rt))
            if oriented.nonEmpty && oriented.forall(_.isDefined) &&
              lt.references.subsetOf(left.outputSet) &&
              rt.references.subsetOf(right.outputSet) =>
          val lKeys = oriented.flatten.map(_._1)
          val rKeys = oriented.flatten.map(_._2)
          // restore standard SQL `=` null semantics (r10 review): AsOfJoin
          // compares null keys as EQUAL, so without this a null-keyed row
          // pair would match where the written EqualTo never does. An
          // IsNotNull filter on the RIGHT side alone is sufficient for
          // both join types (a null left key then finds no partner; under
          // LEFT OUTER it still null-extends, exactly SQL); the left-side
          // filter is added for Inner only, as a row-pruning optimization.
          def notNullFilter(p: LogicalPlan, keys: Seq[Expression]): LogicalPlan = {
            val conds = keys.filter(_.nullable).map(IsNotNull)
            if (conds.isEmpty) p
            else org.apache.spark.sql.catalyst.plans.logical
              .Filter(conds.reduce(And), p)
          }
          val newRight = notNullFilter(right, rKeys)
          val newLeft =
            if (joinType == Inner) notNullFilter(left, lKeys) else left
          AsOfJoin(newLeft, newRight,
            leftKeys = lKeys, rightKeys = rKeys,
            leftTime = lt, rightTime = rt,
            leftOuter = joinType == LeftOuter)
        case _ => j
      }
  }
}
