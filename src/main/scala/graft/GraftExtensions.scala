package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{FloatVectorCosine, FloatVectorDot, LongVectorDot, MinhashSig, VecNearestCid}

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
    ext.injectFunction((
      FunctionIdentifier("vec_nearest_cid"), VecNearestCid.info,
      VecNearestCid.builder))
    ext.injectFunction((
      FunctionIdentifier("word_grams"), graft.functions.WordGrams.info,
      graft.functions.WordGrams.builder))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"), graft.functions.JaroWinkler.info,
      graft.functions.JaroWinkler.builder))
    ext.injectFunction((
      FunctionIdentifier("bpe_stats"), graft.functions.BpeStats.info,
      graft.functions.BpeStats.builder))
    ext.injectFunction((
      FunctionIdentifier("asof_match"), graft.plans.AsOfMatch.info,
      graft.plans.AsOfMatch.builder))
    // dictionary matching over the built-in skill taxonomy: generator
    // (one row per found term) and scalar (array<string>) forms
    ext.injectFunction((
      FunctionIdentifier("term_match"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.TermMatchGenerator].getCanonicalName, "term_match"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.TermMatchGenerator(args.head,
          graft.ops.SkillOps.taxonomyRows.map(_._1).distinct)))
    ext.injectFunction((
      FunctionIdentifier("term_match_array"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.TermMatchArray].getCanonicalName, "term_match_array"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.TermMatchArray(args.head,
          graft.ops.SkillOps.taxonomyRows.map(_._1).distinct)))
    // whole-operator extension: as-of join (logical node + SQL marker
    // rewrite + pushdown/pruning rules + planning strategy,
    // graft.plans.AsOfJoin / graft.plans.SqlAsOf)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteAsOfMarkerJoin)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneColumnsThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.RewriteBinnedRangeJoin)
  }
}
