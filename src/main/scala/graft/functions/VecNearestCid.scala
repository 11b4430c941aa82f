package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native k-means assignment: nearest-centroid id (argmin of the exact
  * Σ(x−c)² index-order fold, ties → lower id) over a centroid matrix that
  * rides the plan as an `array<array<double>>` literal.
  *
  * Replaces the higher-order-function formulation
  * (`array_min(transform(centroids, aggregate(zip_with(...))))`) in the hot
  * loop of [[graft.ops.VectorOps.kmeansLloyd]]: HOFs evaluate through
  * per-element lambda dispatch with no codegen, which dominates the
  * assignment scan at corpus scale (ScaleProbe measured the Lloyd round
  * ~10× slower through HOFs). Arithmetic is THE SAME left fold in the same
  * order — `0.0 + t₀² + t₁² + …` per centroid, first-strictly-smaller wins —
  * so results (and the scripted DuckDB oracle hash) are bit-identical.
  */
case class VecNearestCid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_nearest_cid expects (array<float>, array<array<double>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = IntegerType

  // Registered as a general SQL function, so malformed input must degrade
  // to null, not NPE: an empty centroid matrix (or one whose inner arrays
  // are all null) has no nearest centroid → result is null. Internal
  // callers (assignExact) always pass a non-empty null-free literal.
  override def nullable: Boolean = true

  override def prettyName: String = "vec_nearest_cid"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    val k = cents.numElements()
    while (c < k) {
      if (!cents.isNullAt(c)) {
        val cv = cents.getArray(c)
        val n = math.min(x.numElements(), cv.numElements())
        var d = 0.0
        var i = 0
        while (i < n) {
          val t = x.getFloat(i).toDouble - cv.getDouble(i)
          d += t * t
          i += 1
        }
        if (best < 0 || d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $best = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |int $k = $b.numElements();
         |for (int $c = 0; $c < $k; $c++) {
         |  if ($b.isNullAt($c)) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $b.getArray($c);
         |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $t = (double) $a.getFloat($i) - $cv.getDouble($i);
         |    $d += $t * $t;
         |  }
         |  if ($best < 0 || $d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecNearestCid =
    copy(left = newLeft, right = newRight)
}

object VecNearestCid {
  def apply(emb: org.apache.spark.sql.Column,
      cents: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("vec_nearest_cid", emb, cents)

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VecNearestCid].getName, "vec_nearest_cid")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecNearestCid(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_nearest_cid expects 2 arguments, got ${other.size}")
  }
}
