package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product over quantized (int8-coded, stored long) vectors —
  * the inner loop of the quantized-scan kNN ([[graft.ops.VectorOps.qdot]]),
  * as a whole-stage-codegen expression: a tight long-multiply-accumulate
  * with no per-element lambda dispatch and no floating point at all.
  * Exact by construction (|code| ≤ 127, so the sum cannot overflow below
  * ~2^49 dimensions); bit-identical to the aggregate(zip_with(...)) fold
  * it replaces. Null elements are treated as 0.
  */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_qdot expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "vec_qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        sum += x.getLong(i) * y.getLong(i)
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

object LongVectorDot {
  /** Column-API entry point — resolves through the session function registry
    * (registered by Tables.tune / GraftExtensions). */
  def apply(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("vec_qdot", a, b)

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LongVectorDot].getCanonicalName, "vec_qdot")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "vec_qdot expects exactly 2 arguments")
    LongVectorDot(args(0), args(1))
  }
}
