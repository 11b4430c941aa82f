package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{FloatVectorCosine, FloatVectorDot, LongVectorDot, MinhashSig}

/** SparkSessionExtensions entry point: makes the engine's native functions
  * available to any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (SURVEY.md §7.3). Sessions
  * created without the conf get the same functions at runtime via
  * [[Tables.tune]]'s registry call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"), FloatVectorDot.info, FloatVectorDot.builder))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"), FloatVectorCosine.info, FloatVectorCosine.builder))
    ext.injectFunction((
      FunctionIdentifier("vec_qdot"), LongVectorDot.info, LongVectorDot.builder))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"), MinhashSig.info, MinhashSig.builder))
    // whole-operator extension: as-of join (logical node + pushdown rule +
    // planning strategy, graft.plans.AsOfJoin)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneColumnsThroughAsOfJoin)
  }
}
