package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY.md §2.10 X3 stretch (+ §2.4 F6 "v2 perf" path): a custom Catalyst
  * `Generator` that emits every dictionary term found in a document in ONE
  * pass over its tokens — the reference's 348-compiled-regexes-per-document
  * loop (pracuj_scraper.py:183-197) and the engine's v1
  * broadcast-join-per-term formulation both do O(terms) work per document;
  * this does O(tokens).
  *
  * Matching semantics equal the v1 word-boundary semantics on
  * whitespace-tokenized text: single-word terms hit when the token equals
  * the term; multi-word terms hit when their tokens appear adjacently.
  * Matches are emitted as a distinct set per document (the reference's
  * per-listing `set()`).
  */
case class TermMatchGenerator(child: Expression, terms: Seq[String])
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("term", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_match expects a string column, got ${child.dataType.catalogString}")

  // Matching state built once per executor (case-class field would serialize
  // fine too, but lazy keeps construction off the driver's plan-copy path).
  @transient private lazy val singleTerms: Set[String] =
    terms.filterNot(_.contains(" ")).toSet
  @transient private lazy val multiTerms: Seq[Array[String]] =
    terms.filter(_.contains(" ")).map(_.split(" "))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) return Iterator.empty
    val tokens = text.asInstanceOf[UTF8String].toString
      .toLowerCase.split("\\s+")
    val found = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i < tokens.length) {
      if (singleTerms.contains(tokens(i))) found += tokens(i)
      i += 1
    }
    // multi-word adjacency (few terms; tokens scanned once per term length)
    for (mt <- multiTerms) {
      var j = 0
      var hit = false
      while (!hit && j + mt.length <= tokens.length) {
        var k = 0
        while (k < mt.length && tokens(j + k) == mt(k)) k += 1
        if (k == mt.length) hit = true
        j += 1
      }
      if (hit) found += mt.mkString(" ")
    }
    found.iterator.map(t => InternalRow(UTF8String.fromString(t)))
  }

  override protected def withNewChildInternal(newChild: Expression): TermMatchGenerator =
    copy(child = newChild)
}
