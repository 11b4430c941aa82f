package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Standalone kernel so generated code makes ONE static-shaped call per row
  * instead of inlining the two-phase loop as Java source. Semantics mirror
  * the textbook Jaro-Winkler exactly as DuckDB implements it (the oracle
  * cross-checks the two independent implementations to 6 dp):
  * match window = max(|s|,|t|)/2 - 1; transpositions = out-of-order matched
  * pairs / 2; Winkler boost p=0.1 over the ≤4-char common prefix, applied
  * only when jaro > 0.7; any empty input → 0.0 (DuckDB's convention, also
  * for two empties).
  */
object JaroWinklerKernel {
  def similarity(lu: UTF8String, ru: UTF8String): Double = {
    val s = lu.toString
    val t = ru.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var outOfOrder = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) outOfOrder += 1
        k += 1
      }
      i += 1
    }
    val md = matches.toDouble
    // transpositions = out-of-order matched pairs halved with INTEGER
    // division — the Winkler/commons/DuckDB convention. Odd counts occur on
    // unequal-length pairs; /2.0 here diverges from the oracle (caught by
    // the 462-row cross-check at the 0.85 cut).
    val jaro = (md / n + md / m + (md - outOfOrder / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(n, m))
    while (prefix < maxPrefix && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + 0.1 * prefix * (1.0 - jaro)
  }
}

/** `jaro_winkler(l, r)` — the ER-standard typo-tolerant name similarity, as
  * a native expression so the blocked pairwise verify stays inside
  * whole-stage codegen (the same role the banded `levenshtein` plays in
  * record_linkage, for score-ranked rather than thresholded matching).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerKernel.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def apply(l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("jaro_winkler", l, r)

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JaroWinkler].getName, "jaro_winkler")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => JaroWinkler(a, b)
    case other => throw new IllegalArgumentException(
      s"jaro_winkler expects 2 arguments, got ${other.size}")
  }
}
