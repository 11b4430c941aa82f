package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the runtime-filter pattern Spark's own
  * `InjectRuntimeFilter` applies to shuffle joins, exposed as an explicit
  * operator so a pipeline can place it deliberately (prefilter a 100 TB fact
  * scan by a dim key set, cut a decontamination corpus scan down to candidate
  * docs) instead of hoping the optimizer's size thresholds fire.
  *
  * Mechanics: the filter is BUILT distributed — `BloomFilterAggregate` is a
  * `TypedImperativeAggregate` whose partial states are themselves Bloom
  * filters OR-merged at the exchange, so the build side never collects raw
  * keys anywhere. Only the finished filter (a few hundred KB at fpp=1% for
  * a million keys, 8 bits/key flat) comes back to the driver, and it ships
  * to probe-side tasks as a binary literal inside
  * [[BloomFilterMightContain]] — exactly how Spark ships its own runtime
  * filters (as a subquery result embedded in the probe plan). Both sides
  * hash through [[XxHash64]], so any key type the hash accepts works and
  * build/probe agree by construction.
  *
  * Correctness contract: `mightContain` has false POSITIVES only (never
  * false negatives — property-proven in BloomOpsSpec), so a prefilter is
  * safe exactly when a downstream exact join/verify re-checks survivors.
  * Every query built on this follows that prefilter→exact-verify shape and
  * therefore stays oracle-exact.
  */
object BloomOps {

  /** Build a Bloom filter over `key` rows of `df` distributed; returns the
    * serialized filter. `expectedItems` sizes the filter via the standard
    * optimal-bits formula at `fpp` — overshooting the estimate only costs
    * false-positive rate, never correctness. */
  def build(df: DataFrame, key: Column, expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(expectedItems, 1L)
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
    val agg = new BloomFilterAggregate(
      GraftSqlShim.expression(xxhash64(key)),
      Literal(n), Literal(numBits)).toAggregateExpression()
    // One aggregate-sized value crosses to the driver: the filter itself.
    df.select(GraftSqlShim.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Probe-side predicate: true when `key` MIGHT be in the build set
    * (false positives possible, false negatives impossible). Codegen'd
    * in plain projections; inside higher-order-function lambdas it runs
    * through the interpreted eval path, which shares the same lazily
    * deserialized filter per task. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftSqlShim.expression(key)))))

  /** One-execution form: the filter builds as a SCALAR SUBQUERY inside the
    * consuming query — `InjectRuntimeFilter`'s exact shape — so there is no
    * separate build job and no driver round trip; the subquery runs once
    * and its result ships to probe tasks. Prefer this when the probe query
    * is one-shot; prefer [[build]]+[[mightContain]] when the same filter
    * serves several queries (build once, literal everywhere). */
  def mightContainSubquery(buildDf: DataFrame, buildKey: Column, probeKey: Column,
      expectedItems: Long, fpp: Double = 0.01): Column = {
    val n = math.max(expectedItems, 1L)
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
    val agg = new BloomFilterAggregate(
      GraftSqlShim.expression(xxhash64(buildKey)),
      Literal(n), Literal(numBits)).toAggregateExpression()
    val bloomScalar = buildDf.select(GraftSqlShim.column(agg).as("bf")).scalar()
    GraftSqlShim.column(BloomFilterMightContain(
      GraftSqlShim.expression(bloomScalar),
      new XxHash64(Seq(GraftSqlShim.expression(probeKey)))))
  }
}
