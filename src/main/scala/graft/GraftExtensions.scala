package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: makes the engine's native functions
  * available to any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (SURVEY.md §7.3). Sessions
  * created without the conf get the same functions at runtime via
  * [[Tables.tune]]'s registry call — BOTH paths consume the single
  * [[GraftFunctions.all]] list, so they cannot drift (r10: two
  * hand-maintained lists had; extension sessions lacked winnow_mins /
  * poly_grams / cdc_chunks / blocklist_match).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(entry => ext.injectFunction(entry))
    // whole-operator extension: as-of join (logical node + SQL marker
    // rewrite + pushdown/pruning rules + planning strategy,
    // graft.plans.AsOfJoin / graft.plans.SqlAsOf) and the binned
    // range-join rewrite
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteAsOfMarkerJoin)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneColumnsThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.RewriteBinnedRangeJoin)
  }
}
