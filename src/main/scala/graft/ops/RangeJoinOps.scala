package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range (interval) join — the scale path when BOTH sides of a
  * `fact.x BETWEEN interval.lo AND interval.hi` join are large, where the
  * broadcast-nested-loop answer (right for a 3-row band dim,
  * `join_range_bands`) becomes |fact|×|intervals| probes.
  *
  * Technique (the Databricks "range join optimization" / spatial binning
  * shape): pick a bin width w; each interval EXPLODES to the bins it
  * covers (⌈len/w⌉ rows), each fact row maps to ONE bin; equi-join on the
  * bin id, then re-check the exact predicate to discard same-bin
  * non-overlaps. Cost O(|F| + |I|·len/w) rows through ONE hash shuffle on
  * the bin key — no nested loop anywhere. Bin width tunes the explode
  * factor against bin selectivity exactly like LSH band width tunes
  * candidate volume.
  */
object RangeJoinOps {

  /** Equi-join `fact` to `intervals` on bin(`x`) with the exact
    * `lo <= x < hi` re-check applied above the join. `x`, `lo`, `hi` are
    * numeric columns; `hi` is exclusive. */
  def binnedRangeJoin(fact: DataFrame, x: Column, intervals: DataFrame,
      lo: Column, hi: Column, binWidth: Long): DataFrame = {
    val fb = fact.withColumn("__bin", floor(x / binWidth).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast("long"),
        ceil(hi / binWidth).cast("long") - 1L)))
    fb.join(ib, "__bin")
      .filter(x >= lo && x < hi)
      .drop("__bin")
  }
}
