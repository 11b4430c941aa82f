package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native winnowing selection: `winnow_mins(g, w)` = the DISTINCT sliding
  * w-window minima of a long array in first-occurrence order — exactly
  * `array_distinct(transform(sequence(1, size(g)-w+1), j ->
  * array_min(slice(g, j, w))))` when `size(g) >= w`, and
  * `array_distinct(g)` below the window width (the doc_winnowing
  * fallback), byte-for-byte.
  *
  * Why native: the HOF pays an interpreted lambda + a w-slice allocation
  * per WINDOW; this is the classic O(T) monotone-deque sliding minimum in
  * one codegen'd pass (the window scan is where winnowing's density
  * guarantee comes from, so it dominates the operator at long docs). */
case class WinnowMins(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"winnow_mins expects (array<bigint>, int literal), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_mins"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    WinnowMins.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.WinnowMins$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowMins =
    copy(left = newLeft, right = newRight)
}

object WinnowMins {
  def compute(g: ArrayData, w: Int): ArrayData = {
    // w <= 0 would walk the monotone deque out of bounds (r10 review:
    // winnow_mins(array(1L), 0) evicted the only slot and read deque(1))
    if (w <= 0) throw new IllegalArgumentException(
      s"winnow_mins: window width must be positive, got $w")
    val n = g.numElements()
    // Guard before the hot loop: getLong on a null slot silently reads 0 —
    // internal callers never produce null elements, but the function is
    // SQL-registered, so user input must fail loudly, not hash wrong.
    var c = 0
    while (c < n) {
      if (g.isNullAt(c)) throw new IllegalArgumentException(
        s"winnow_mins: null array element at index $c (null-bearing arrays " +
          "are not supported)")
      c += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n < w) {
      var i = 0
      while (i < n) { seen.add(g.getLong(i)); i += 1 }
    } else {
      // monotone deque of indices, front = current window minimum
      val deque = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      var i = 0
      while (i < n) {
        val v = g.getLong(i)
        while (tail > head && g.getLong(deque(tail - 1)) >= v) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) seen.add(g.getLong(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def apply(g: org.apache.spark.sql.Column, w: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("winnow_mins", g,
      org.apache.spark.sql.functions.lit(w))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WinnowMins].getName, "winnow_mins")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => WinnowMins(a, b)
    case other => throw new IllegalArgumentException(
      s"winnow_mins expects 2 arguments, got ${other.size}")
  }
}
