package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row dictionary matcher: single-word terms by token-set
  * membership over first occurrence in text order, multi-word terms by the
  * character-level [[AhoCorasick]] automaton in dictionary order — exactly
  * the output contract of the `array_union(token filter, regex bank)`
  * column formulation it replaces (the two term classes are disjoint, so
  * concatenation IS the union). One object per deserialized expression;
  * construction is microseconds. */
final class TermMatcher(terms: Seq[String]) extends Serializable {
  @transient private lazy val singles: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]
    terms.iterator.filterNot(_.contains(" ")).foreach(s.add)
    s
  }
  @transient private lazy val ac: AhoCorasick =
    new AhoCorasick(terms.filter(_.contains(" ")).toArray)

  // Java-regex \s set — what split("\\s+") separated on; scanning manually
  // avoids the per-ROW Pattern.compile + String[] allocation that
  // String.split pays for multi-char regexes (r10 review: the exact
  // interpreted-per-row overhead these natives exist to remove)
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** All matched terms in the output contract's order: single-word terms by
    * first occurrence in text order (deduped), then multi-word terms in
    * dictionary order — the two classes are disjoint, so concatenation IS
    * the union. ONE implementation feeds both the scalar array form and
    * the Generator (r10 — they were hand-maintained twins). */
  def matchedTerms(text: UTF8String): Seq[String] = {
    val lowered = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!singles.isEmpty) {
      val seen = new java.util.HashSet[String]
      val len = lowered.length
      var i = 0
      while (i < len) {
        while (i < len && isWs(lowered.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(lowered.charAt(i))) i += 1
        if (i > start) {
          val tok = lowered.substring(start, i)
          if (singles.contains(tok) && seen.add(tok)) out += tok
        }
      }
    }
    if (ac.patterns.nonEmpty) out ++= ac.matchedPatterns(lowered)
    out.toSeq
  }

  def matchArray(text: UTF8String): ArrayData =
    new GenericArrayData(
      matchedTerms(text).map(UTF8String.fromString).toArray[Any])
}

/** SURVEY §2.4 F6 v2, scalar form: the per-row `array<string>` of dictionary
  * terms found in a text column — the expression the reference's 3-tier
  * skills cascade needs inside its `when` short-circuit chain
  * (pracuj_scraper.py:153-197), where a join can't short-circuit per row.
  * One text pass per row via [[TermMatcher]]; replaces the per-multi-term
  * word-boundary regex bank with identical output (order and all). Codegen
  * ships the matcher as a reference object — the call stays inside
  * whole-stage codegen with no fallback row boxing.
  */
case class TermMatchArray(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_match_array expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "term_match_array"

  @transient private lazy val matcher = new TermMatcher(terms)

  override protected def nullSafeEval(t: Any): Any =
    matcher.matchArray(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val m = ctx.addReferenceObj("termMatcher", matcher,
        classOf[TermMatcher].getName)
      s"${ev.value} = $m.matchArray($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): TermMatchArray =
    copy(child = newChild)
}
