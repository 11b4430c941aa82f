package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-grams over a token array: `word_grams(tokens, n)` returns
  * the space-joined n-grams ["t1 t2 … tn", …], or an empty array when the
  * doc is shorter than n — exactly the higher-order-function formulation
  * `transform(sequence(1, size(t)-n+1), i -> array_join(slice(t, i, n), ' '))`
  * that gramsOf built, byte-for-byte.
  *
  * Why native: that HOF runs interpreted (no codegen for lambda
  * expressions), paying per-ELEMENT lambda dispatch plus a slice allocation
  * per gram — the gram construction dominated every gate/decontam-shaped
  * scan (measured ~4 s of a 5 s corpus pass at sf0.1). Here the inner loop
  * is a tight concat over the array's UTF8Strings under whole-stage
  * codegen.
  */
case class WordGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"word_grams expects (array<string>, int literal), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_grams"

  private lazy val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val t = a.asInstanceOf[ArrayData]
    val k = b.asInstanceOf[Int]
    // n <= 0 would allocate a negative-size parts array deep inside a task
    // (raw NegativeArraySizeException with no hint of the cause — r10)
    if (k <= 0) throw new IllegalArgumentException(
      s"word_grams: gram width must be positive, got $k")
    val n = t.numElements()
    val m = math.max(n - k + 1, 0)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = t.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val u = classOf[UTF8String].getName
      s"""
         |if ($b <= 0) throw new IllegalArgumentException(
         |  "word_grams: gram width must be positive, got " + $b);
         |int $n = $a.numElements();
         |int $m = java.lang.Math.max($n - $b + 1, 0);
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $u[] $parts = new $u[$b];
         |  for (int $j = 0; $j < $b; $j++) {
         |    $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $u.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordGrams =
    copy(left = newLeft, right = newRight)
}

object WordGrams {
  def apply(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("word_grams", tokens,
      org.apache.spark.sql.functions.lit(n))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordGrams].getName, "word_grams")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => WordGrams(a, b)
    case other => throw new IllegalArgumentException(
      s"word_grams expects 2 arguments, got ${other.size}")
  }
}
