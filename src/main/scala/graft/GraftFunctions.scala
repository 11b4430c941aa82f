package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** THE single list of the engine's native SQL functions, consumed by BOTH
  * registration paths — [[GraftExtensions]] (spark.sql.extensions sessions)
  * and [[Tables.tune]] (runtime registration for sessions built without the
  * conf). The two paths used to hand-maintain separate lists and drifted:
  * extension sessions silently lacked winnow_mins / poly_grams /
  * cdc_chunks / blocklist_match (r10 review). A function added here is
  * available in every session kind by construction. */
object GraftFunctions {

  type Entry = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  def all: Seq[Entry] = Seq(
    (FunctionIdentifier("vec_dot"),
      functions.FloatVectorDot.info, functions.FloatVectorDot.builder),
    (FunctionIdentifier("vec_cosine"),
      functions.FloatVectorCosine.info, functions.FloatVectorCosine.builder),
    (FunctionIdentifier("vec_qdot"),
      functions.LongVectorDot.info, functions.LongVectorDot.builder),
    (FunctionIdentifier("minhash_sig"),
      functions.MinhashSig.info, functions.MinhashSig.builder),
    (FunctionIdentifier("vec_nearest_cid"),
      functions.VecNearestCid.info, functions.VecNearestCid.builder),
    (FunctionIdentifier("word_grams"),
      functions.WordGrams.info, functions.WordGrams.builder),
    (FunctionIdentifier("winnow_mins"),
      functions.WinnowMins.info, functions.WinnowMins.builder),
    (FunctionIdentifier("poly_grams"),
      functions.PolyGrams.info, functions.PolyGrams.builder),
    (FunctionIdentifier("cdc_chunks"),
      functions.CdcChunks.info, functions.CdcChunks.builder),
    (FunctionIdentifier("bpe_stats"),
      functions.BpeStats.info, functions.BpeStats.builder),
    (FunctionIdentifier("jaro_winkler"),
      functions.JaroWinkler.info, functions.JaroWinkler.builder),
    (FunctionIdentifier("suffix_hamming_lb"),
      functions.SuffixHammingLb.info, functions.SuffixHammingLb.builder),
    // dictionary matching over the built-in skill taxonomy: generator
    // (one row per found term) and scalar (array<string>) forms
    (FunctionIdentifier("term_match"),
      new ExpressionInfo(
        classOf[functions.TermMatchGenerator].getCanonicalName, "term_match"),
      (args: Seq[Expression]) => functions.TermMatchGenerator(args.head,
        ops.SkillOps.taxonomyRows.map(_._1).distinct)),
    (FunctionIdentifier("term_match_array"),
      new ExpressionInfo(
        classOf[functions.TermMatchArray].getCanonicalName, "term_match_array"),
      (args: Seq[Expression]) => functions.TermMatchArray(args.head,
        ops.SkillOps.taxonomyRows.map(_._1).distinct)),
    // the same one-pass matcher bound to the SAFETY blocklist instead of
    // the skill taxonomy (text_blocklist_filter)
    (FunctionIdentifier("blocklist_match"),
      new ExpressionInfo(
        classOf[functions.TermMatchArray].getCanonicalName, "blocklist_match"),
      (args: Seq[Expression]) => functions.TermMatchArray(args.head,
        Tables.BlocklistTerms)),
    // asof_match: SQL marker predicate for the as-of join (rewritten to the
    // AsOfJoin node by RewriteAsOfMarkerJoin; Unevaluable if left in place)
    (FunctionIdentifier("asof_match"),
      plans.AsOfMatch.info, plans.AsOfMatch.builder))
}
