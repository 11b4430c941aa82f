package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity — the hot inner loop of every similarity query
  * as ONE codegen'd expression. The composed form
  * `vec_dot(a,b) / (sqrt(vec_dot(a,a)) * sqrt(vec_dot(b,b)))` deserializes
  * each array argument twice and dispatches three expression evaluations per
  * row; this computes the dot product and both norms in a single pass over
  * each array.
  *
  * Accumulation order and null semantics EXACTLY mirror the composed form
  * (dot over min(|a|,|b|) skipping pairs with a null side; each norm over
  * its own full array skipping its own nulls), so results are bit-identical
  * to the [[FloatVectorDot]]-based formulation and to DuckDB's list_reduce
  * left fold — the oracle contract. */
case class FloatVectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine expects (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    var n1 = 0.0
    i = 0
    while (i < na) {
      if (!x.isNullAt(i)) { val v = x.getFloat(i).toDouble; n1 += v * v }
      i += 1
    }
    var n2 = 0.0
    i = 0
    while (i < nb) {
      if (!y.isNullAt(i)) { val v = y.getFloat(i).toDouble; n2 += v * v }
      i += 1
    }
    dot / (math.sqrt(n1) * math.sqrt(n2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val v = ctx.freshName("v")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = java.lang.Math.min($na, $nb);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |double $n1 = 0.0;
         |for (int $i = 0; $i < $na; $i++) {
         |  if (!$a.isNullAt($i)) { double $v = (double) $a.getFloat($i); $n1 += $v * $v; }
         |}
         |double $n2 = 0.0;
         |for (int $i = 0; $i < $nb; $i++) {
         |  if (!$b.isNullAt($i)) { double $v = (double) $b.getFloat($i); $n2 += $v * $v; }
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($n1) * java.lang.Math.sqrt($n2));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorCosine =
    copy(left = newLeft, right = newRight)
}

object FloatVectorCosine {
  def apply(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("vec_cosine", a, b)

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FloatVectorCosine].getCanonicalName, "vec_cosine")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "vec_cosine expects exactly 2 arguments")
    FloatVectorCosine(args(0), args(1))
  }
}
