package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY.md §2.10 X3 stretch (+ §2.4 F6 "v2 perf" path): a custom Catalyst
  * `Generator` that emits every dictionary term found in a document in ONE
  * pass — the reference's 348-compiled-regexes-per-document loop
  * (pracuj_scraper.py:183-197) and the engine's v1 broadcast-join-per-term
  * formulation both do O(terms) work per document; this does O(chars).
  *
  * Matching semantics equal the v1 [[graft.ops.SkillOps.matchesWith]]
  * semantics exactly: single-word terms hit when a whitespace token equals
  * the term; multi-word terms hit when the lowered text contains a
  * `\b`-bounded literal occurrence — reproduced by the character-level
  * [[AhoCorasick]] automaton instead of a per-term regex bank (r07; until
  * then multi-word matching was token-adjacency, a slightly LOOSER relation
  * than the regexes the v1 path and the oracles use). Matches are emitted
  * as a distinct set per document (the reference's per-listing `set()`).
  */
case class TermMatchGenerator(child: Expression, terms: Seq[String])
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("term", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_match expects a string column, got ${child.dataType.catalogString}")

  // Matching delegates to the SAME TermMatcher the scalar form uses (r10 —
  // the generator used to carry a hand-maintained twin of the two-tier
  // logic). Lazy keeps construction off the driver's plan-copy path;
  // rebuild per task is microseconds against any real task.
  @transient private lazy val matcher = new TermMatcher(terms)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) return Iterator.empty
    matcher.matchedTerms(text.asInstanceOf[UTF8String]).iterator
      .map(t => InternalRow(UTF8String.fromString(t)))
  }

  override protected def withNewChildInternal(newChild: Expression): TermMatchGenerator =
    copy(child = newChild)
}
