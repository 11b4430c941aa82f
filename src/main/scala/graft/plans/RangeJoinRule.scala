package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure inequality (band) inner join
  * `L JOIN R ON x >= lo AND x < hi` — which Spark can only plan as a
  * nested-loop — into the binned equi form [[graft.ops.RangeJoinOps]]
  * hand-writes: R explodes each interval to the bins it covers, L maps to
  * one bin, the join keys on the bin id, and the original predicate
  * re-checks exactly. O(|L| + |R|·len/w) through one hash shuffle instead
  * of |L|×|R| probes; results are identical because binning only ever
  * ADDS candidate pairs that the re-check removes.
  *
  * Scope guards (conservative by design):
  *   - fires only when `spark.graft.rangeJoin.binWidth` is set > 0 (the
  *     width is data-dependent; there is no cost model here);
  *   - `x` must reference only the left side, `lo`/`hi` only the right,
  *     all DoubleType (the testdata's money columns);
  *   - joins carrying an explicit broadcast hint are left alone — a
  *     broadcast nested loop over a tiny dim IS the right plan
  *     (`join_range_bands`), and the hint says the user knows;
  *   - the rewritten join gains an equi conjunct, so the pattern can
  *     never re-fire (safe under the fixed-point batch).
  */
object RewriteBinnedRangeJoin extends Rule[LogicalPlan] {

  /** Most bins one right-side interval may explode to (≈8 MB of longs). */
  private val MaxBinsPerRow = 1000000L

  private def binWidth: Long =
    scala.util.Try(
      SQLConf.get.getConfString("spark.graft.rangeJoin.binWidth", "0").toLong)
      .getOrElse(0L)

  private def hasBroadcastHint(hint: JoinHint): Boolean =
    Seq(hint.leftHint, hint.rightHint).flatten
      .exists(_.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST))

  /** Splits `cond` into (x, lo, hi) when it is exactly the band shape. */
  private def bandShape(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def sideOk(x: Expression, lo: Expression, hi: Expression): Boolean =
      x.references.subsetOf(left.outputSet) &&
        (lo.references ++ hi.references).subsetOf(right.outputSet) &&
        Seq(x, lo, hi).forall(_.dataType == DoubleType)
    cond match {
      case And(a, b) =>
        val pair = (a, b) match {
          case (GreaterThanOrEqual(x1, lo), LessThan(x2, hi)) if x1.semanticEquals(x2) =>
            Some((x1, lo, hi))
          case (LessThan(x2, hi), GreaterThanOrEqual(x1, lo)) if x1.semanticEquals(x2) =>
            Some((x1, lo, hi))
          case _ => None
        }
        pair.filter { case (x, lo, hi) => sideOk(x, lo, hi) }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !hasBroadcastHint(hint) && j.resolved =>
        bandShape(cond, left, right) match {
          case Some((x, lo, hi)) =>
            val width = Literal(w.toDouble)
            val binL = Alias(Cast(Floor(Divide(x, width)), LongType), "__bin_l")()
            val leftP = Project(left.output :+ binL, left)
            // Sequence is TimeZoneAwareExpression: it is only `resolved`
            // with a timezone bound, even for numeric sequences
            val start = Cast(Floor(Divide(lo, width)), LongType)
            val stop = Subtract(Cast(Ceil(Divide(hi, width)), LongType), Literal(1L))
            // Degenerate/inverted intervals (hi <= lo, e.g. lo == hi on a
            // bin boundary) make start > stop, and Sequence with step=1
            // throws at runtime instead of yielding no rows. Null bounds
            // route here too (condition is null), matching the original
            // join, which emits nothing for them.
            val seqType =
              org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
            // Per-row bin cap (r10): a very wide or ±infinite interval
            // (Floor/Ceil saturate to Long extremes) would ask Sequence for
            // billions of elements — an opaque "too long sequence" crash or
            // an unannounced memory cliff where the original nested loop
            // merely ran slow. Raise an ACTIONABLE error instead; the
            // saturation window ±2⁶¹ keeps the stop−start arithmetic from
            // wrapping before the cap check. (The rule is opt-in via the
            // binWidth conf, so "raise the width or unset the conf" is a
            // real remediation.)
            val sane = And(
              GreaterThanOrEqual(start, Literal(Long.MinValue / 4)),
              LessThanOrEqual(stop, Literal(Long.MaxValue / 4)))
            val withinCap = And(sane,
              LessThanOrEqual(Subtract(stop, start), Literal(MaxBinsPerRow)))
            val overflow = Cast(new RaiseError(Literal(
              s"binned range join: an interval covers more than $MaxBinsPerRow " +
                s"bins at width $w — raise spark.graft.rangeJoin.binWidth or " +
                "unset it to keep the nested-loop plan (infinite/huge bounds " +
                "cannot be binned)")), seqType)
            val seq = If(LessThanOrEqual(start, stop),
              If(withinCap,
                Sequence(start, stop, Some(Literal(1L)),
                  Some(SQLConf.get.sessionLocalTimeZone)),
                overflow),
              Literal.create(Seq.empty[Long], seqType))
            val binR = AttributeReference("__bin_r", LongType, nullable = false)()
            val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(binR), child = right)
            val joined = Join(leftP, gen, Inner,
              Some(And(EqualTo(binL.toAttribute, binR), cond)), hint)
            Project(left.output ++ right.output, joined)
          case None => j
        }
    }
  }
}
