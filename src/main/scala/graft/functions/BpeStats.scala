package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE corpus encode: `bpe_stats(lower(text), array(merges...))`
  * returns `struct<n_chars bigint, n_tokens bigint>` for the whole document
  * — byte-for-byte the HOF formulation it replaces in
  * [[graft.CorpusQueries]]'s `bpe_encode` (whitespace split + length≥1
  * filter, per-word code-point char-split, padded double-replace per merge
  * in training order, token count by single-space split), with the same
  * DuckDB oracle.
  *
  * Why native: the HOF form paid interpreted lambda dispatch per WORD —
  * `aggregate(ws, ...)` folding a `transform(sequence(...))` char-split plus
  * 6 chained `replace`s per element, none of which codegens (HOF lambdas are
  * CodegenFallback) — the r09 driver bench's single largest wall-time.
  * Here the whole document is one tight loop inside whole-stage codegen;
  * the merge list (a per-query trained literal, the broadcast-dictionary
  * shape) ships as a reference object in the generated class. The exact
  * `cdc_chunks` recipe (r08: 10.9× → 1.4× at the 20× probe) applied to the
  * same interpreted-HOF disease.
  *
  * Semantics pinned by `BpeStatsSpec` (native ≡ HOF differential, including
  * adversarial Unicode) and by the unchanged `bpe_encode` oracle hash:
  *  - words: maximal runs between Java-regex `\s` whitespace
  *    (space/tab/LF/VT/FF/CR — ASCII-only, exactly Spark's `split(s,"\\s+")`
  *    with the `length(w) >= 1` filter absorbing edge empties);
  *  - n_chars: Σ code-point counts (Spark `length`);
  *  - per-word encode: " c1 c2 .. cn " padding, then for each merge pair
  *    "a b" the literal replace " a b " → " ab " applied TWICE (Spark's
  *    `replace` = non-overlapping left-to-right; the second pass catches
  *    the alternating-overlap chains one pass misses), then tokens =
  *    spaces(s) − 1 (padding is invariant under the space-delimited
  *    replaces, so the final split-on-" " count is the space count of the
  *    trimmed form plus one).
  */
case class BpeStats(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_stats expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  override def prettyName: String = "bpe_stats"

  @transient private lazy val encoder = new BpeEncoder(merges)

  override protected def nullSafeEval(input: Any): Any =
    encoder.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val enc = ctx.addReferenceObj("bpeEncoder", encoder,
        classOf[BpeEncoder].getName)
      s"${ev.value} = $enc.stats($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeStats =
    copy(child = newChild)
}

/** One object per deserialized expression; holds the precomputed
  * pattern/replacement strings so the per-word loop allocates nothing but
  * the padded char-split. */
final class BpeEncoder(merges: Seq[String]) extends Serializable {
  // " a b " → " ab " literal pairs, in training order
  @transient private lazy val pats: Array[String] =
    merges.map(" " + _ + " ").toArray
  @transient private lazy val reps: Array[String] =
    merges.map(" " + _.replace(" ", "") + " ").toArray

  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    var nChars = 0L
    var nTokens = 0L
    val len = s.length
    var i = 0
    while (i < len) {
      // skip Java-regex \s whitespace (the split separators)
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val cp = s.codePointCount(start, i)
        nChars += cp
        nTokens += encodeTokens(s, start, i, cp)
      }
    }
    InternalRow(nChars, nTokens)
  }

  /** Token count for one word: padded code-point char-split, double
    * literal replace per merge, spaces − 1. */
  private def encodeTokens(s: String, start: Int, end: Int, cp: Int): Long = {
    val sb = new java.lang.StringBuilder(2 * cp + 2)
    sb.append(' ')
    var j = start
    while (j < end) {
      val c = s.codePointAt(j)
      sb.appendCodePoint(c)
      sb.append(' ')
      j += Character.charCount(c)
    }
    var w = sb.toString
    var m = 0
    while (m < pats.length) {
      w = w.replace(pats(m), reps(m))
      w = w.replace(pats(m), reps(m))
      m += 1
    }
    var spaces = 0L
    var k = 0
    val n = w.length
    while (k < n) { if (w.charAt(k) == ' ') spaces += 1; k += 1 }
    spaces - 1L
  }

  // Java regex \s without UNICODE_CHARACTER_CLASS: [ \t\n\x0B\f\r] —
  // exactly what Spark's split(s, "\\s+") separates on
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

object BpeStats {
  def apply(text: org.apache.spark.sql.Column,
      merges: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // cast: array() of zero merges types as array<void> otherwise
    call_function("bpe_stats", text,
      array(merges.map(lit): _*).cast("array<string>"))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BpeStats].getName, "bpe_stats")

  /** Registry builder: the merge list arrives as a foldable array literal
    * (the plan-embedded broadcast-dictionary shape) and is evaluated once
    * at analysis time. */
  val builder: Seq[Expression] => Expression = {
    case Seq(t, m) if m.foldable && (m.dataType match {
        case ArrayType(StringType, _) => true; case _ => false }) =>
      val evaled = m.eval()
      // typed errors instead of a bare NPE at analysis time (r10 review)
      if (evaled == null) throw new IllegalArgumentException(
        "bpe_stats: merges array must not be null")
      val arr = evaled.asInstanceOf[ArrayData]
        .toArray[UTF8String](StringType).toSeq
      if (arr.contains(null)) throw new IllegalArgumentException(
        "bpe_stats: merges array must not contain null elements")
      BpeStats(t, arr.map(_.toString))
    case other => throw new IllegalArgumentException(
      "bpe_stats expects (string, foldable array<string>), got " +
        other.map(_.dataType.catalogString).mkString(", "))
  }
}
