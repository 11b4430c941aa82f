package graft.ops

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k per key as a typed Aggregator — the scale-correct
  * alternative to `row_number().over(Window.partitionBy(key))` + filter.
  *
  * The window form ships EVERY row of every group through the shuffle and
  * then sorts each group in full just to keep k rows. The aggregator keeps
  * a k-bounded buffer instead; because reduce/merge are associative-
  * commutative, Spark runs it map-side first (partial aggregation), so at
  * most k rows per key per INPUT partition cross the wire and no group is
  * ever materialized or fully sorted. At 100 TB with k=3 that's the
  * difference between shuffling the fact table and shuffling ~nothing.
  *
  * Ordering: value descending, id ascending on ties — identical to
  * `orderBy(col(v).desc, col(id))`, so it is window-rank interchangeable.
  */
object TopKOps {

  class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] =
      Ordering.by { case (v, id) => (-v, id) }
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sorted(ord).take(k)
    def zero: Seq[(Double, Long)] = Seq.empty
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ a)
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b)
    def bufferEncoder = ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder = ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Column form: `topK(3, col("revenue"), col("id"))` → array of (value,
    * id) structs, best first. */
  /** Misra–Gries heavy-hitter summary: a bounded map of ≤ k counters with
    * the classic decrement-all step. Mergeable (counter-wise add + MG trim
    * — Agarwal et al.'s mergeable-summaries result), so Spark combines
    * partials map-side like any agg. GUARANTEE: any item with true
    * frequency > n/(k+1) survives; counts are under-estimates. The
    * summary is CANDIDATE GENERATION — an exact re-count of the ≤ k
    * candidates (one broadcast semi join) makes the final answer exact,
    * which is the production two-pass heavy-hitter pattern and what the
    * oracle checks. */
  class MisraGriesAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String,
        Map[String, Long], Seq[String]] {
    private def trim(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // decrement all by the (size-k)-th smallest count; drop zeros.
        // The reduce path always lands here with exactly k+1 entries, where
        // the cut is simply the min — O(k), the classic MG amortized step
        // (the O(k log k) sort is reserved for merge, which can see 2k).
        val cut =
          if (m.size == k + 1) m.values.min
          else m.values.toSeq.sorted.apply(m.size - k - 1)
        m.flatMap { case (key, c) =>
          if (c > cut) Some(key -> (c - cut)) else None }
      }
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      trim(b.updated(a, b.getOrElse(a, 0L) + 1L))
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      trim(y.foldLeft(x) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c) })
    def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    def bufferEncoder = ExpressionEncoder[Map[String, Long]]()
    def outputEncoder = ExpressionEncoder[Seq[String]]()
  }

  def misraGries(k: Int, value: Column): Column =
    org.apache.spark.sql.functions.udaf(new MisraGriesAgg(k),
      ExpressionEncoder[String]()).apply(value)

  def topK(k: Int, value: Column, id: Column): Column =
    udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(value, id)
}
