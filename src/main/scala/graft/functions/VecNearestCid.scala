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

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecNearestCid.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
         |java.lang.Integer $res =
         |  graft.functions.VecNearestCid$$.MODULE$$.compute($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecNearestCid =
    copy(left = newLeft, right = newRight)
}

object VecNearestCid {
  /** One implementation for BOTH the interpreted and codegen paths (r10 —
    * they used to be hand-maintained twins). NULL ELEMENTS inside the
    * query vector or a centroid row fail LOUDLY: the primitive getters
    * silently read 0 for null slots, which would return a confident but
    * wrong assignment (the HOF formulation this function claims
    * bit-identity with null-propagates instead — neither silently
    * substitutes zero). A null centroid ROW is skipped (degrade-to-null
    * when nothing remains), matching the documented contract. */
  def compute(x: ArrayData, cents: ArrayData): java.lang.Integer = {
    val xn = x.numElements()
    var g = 0
    while (g < xn) {
      if (x.isNullAt(g)) throw new IllegalArgumentException(
        s"vec_nearest_cid: null element at index $g of the query vector " +
          "(null-bearing vectors are not supported)")
      g += 1
    }
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    val k = cents.numElements()
    while (c < k) {
      if (!cents.isNullAt(c)) {
        val cv = cents.getArray(c)
        val n = math.min(xn, cv.numElements())
        var d = 0.0
        var i = 0
        while (i < n) {
          if (cv.isNullAt(i)) throw new IllegalArgumentException(
            s"vec_nearest_cid: null element at index $i of centroid $c " +
              "(null-bearing vectors are not supported)")
          val t = x.getFloat(i).toDouble - cv.getDouble(i)
          d += t * t
          i += 1
        }
        if (best < 0 || d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }

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
