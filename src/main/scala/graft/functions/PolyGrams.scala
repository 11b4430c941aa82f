package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native k-gram polynomial hashes over a long array:
  * `poly_grams(h, k)[i] = Horner_×31(h[i], …, h[i+k-1])` for
  * i = 0 … size−k (empty when the array is shorter than k) — exactly the
  * HOF formulation `transform(sequence(1, size(h)-k+1), i ->
  * aggregate(slice(h, i, k), 0L, (a, x) -> a*31 + x))` that
  * dedup_substring_spans and doc_winnowing's gram stages used.
  *
  * Why native: the HOF pays interpreted lambda dispatch per GRAM plus a
  * slice allocation each (O(T·k) interpreted); this is one O(T·k) tight
  * primitive loop under whole-stage codegen with zero allocation beyond
  * the output. No modulus — callers pick token-hash magnitudes that keep
  * Horner-×31 within 2^63 so DuckDB's non-wrapping BIGINT reproduces it
  * (37·len+ascii token hashes with k ≤ 8 stay < 2^47).
  */
case class PolyGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"poly_grams expects (array<bigint>, int literal), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "poly_grams"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PolyGrams.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PolyGrams$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyGrams =
    copy(left = newLeft, right = newRight)
}

object PolyGrams {
  def compute(h: ArrayData, k: Int): ArrayData = {
    // k <= 0 would emit max(n-k+1, 0) phantom zero-hash "grams" — silent
    // wrong data feeding dedup (r10 review); fail loudly like MinhashSig
    if (k <= 0) throw new IllegalArgumentException(
      s"poly_grams: gram width must be positive, got $k")
    val n = h.numElements()
    // Guard before the hot loop: getLong on a null slot silently reads 0 —
    // internal callers never produce null elements, but the function is
    // SQL-registered, so user input must fail loudly, not hash wrong.
    var c = 0
    while (c < n) {
      if (h.isNullAt(c)) throw new IllegalArgumentException(
        s"poly_grams: null array element at index $c (null-bearing arrays " +
          "are not supported)")
      c += 1
    }
    val m = math.max(n - k + 1, 0)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = acc * 31L + h.getLong(i + j); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(h: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("poly_grams", h,
      org.apache.spark.sql.functions.lit(k))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PolyGrams].getName, "poly_grams")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => PolyGrams(a, b)
    case other => throw new IllegalArgumentException(
      s"poly_grams expects 2 arguments, got ${other.size}")
  }
}
