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

  /** Interval × interval OVERLAP join (`a.lo < b.hi AND b.lo < a.hi`,
    * half-open intervals on an integer axis) — both sides large, so both
    * sides bin. A pair sharing k bins would surface k times; instead of a
    * (pair-volume-sized!) distinct shuffle, the join keeps a pair only in
    * its CANONICAL bin — the bin of `greatest(a.lo, b.lo)`, i.e. where the
    * overlap STARTS, which every overlapping pair has exactly one of. Cost
    * is one hash shuffle on the bin key and zero dedup; the emit-once
    * invariant is algebraic, not a post-pass.
    *
    * Left/right columns must be pre-aliased disjoint; `aLo/aHi/bLo/bHi`
    * are integer (e.g. epoch-day) columns, `hi` exclusive. */
  def binnedIntervalOverlapJoin(a: DataFrame, aLo: Column, aHi: Column,
      b: DataFrame, bLo: Column, bHi: Column, binWidth: Long): DataFrame = {
    val ab = a.withColumn("__bin",
      explode(sequence(floor(aLo / binWidth).cast("long"),
        ceil(aHi / binWidth).cast("long") - 1L)))
    val bb = b.withColumn("__bin",
      explode(sequence(floor(bLo / binWidth).cast("long"),
        ceil(bHi / binWidth).cast("long") - 1L)))
    ab.join(bb, "__bin")
      .filter(aLo < bHi && bLo < aHi &&
        col("__bin") === floor(greatest(aLo, bLo) / binWidth).cast("long"))
      .drop("__bin")
  }
}
