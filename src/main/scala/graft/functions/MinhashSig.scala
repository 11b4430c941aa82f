package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen form of the MinHash signature fold — the hot inner loop of
  * corpus-scale near-dup detection (SURVEY.md §2.11 N1). Semantically
  * IDENTICAL to DedupOps' higher-order-function formulation
  * (`aggregate(hashes, [P]*h, (acc,x) -> zip_with(acc, params, min(...)))`):
  * for each shingle hash x (array order) and each hash function i < h,
  *
  *   sig[i] = min(sig[i], (x * (1000003(i+1) + 12345) + 7919(i+1)) mod P)
  *
  * with P = 1000000007 and sig initialized to P. Inputs are pmod'ed to
  * [0, P) upstream, so x*a+b ≤ 1e9 * 3.3e7 ≈ 3e16 never overflows a long
  * for any practical h (≤ 2000) and plain Java arithmetic equals Spark's
  * ANSI-checked column math.
  *
  * Why native: the HOF tree evaluates h lambda dispatches per element and
  * re-materializes the h-wide accumulator array per step; this is a two-level
  * primitive loop writing one long[] — the difference between a codegen'd
  * tight loop and interpreter-shaped work in the hottest path of web-scale
  * dedup. Result is built with UnsafeArrayData.fromPrimitiveArray (no
  * boxing).
  */
case class MinhashSig(child: Expression, h: Int) extends UnaryExpression {

  private val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if h > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"minhash_sig needs h > 0, got $h")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(h)(P)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val x = arr.getLong(j)
        var i = 0
        while (i < h) {
          val a = 1000003L * (i + 1) + 12345L
          val b = 7919L * (i + 1)
          val v = (x * a + b) % P
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$h];
         |java.util.Arrays.fill($sig, ${P}L);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $x = $a.getLong($j);
         |    for (int $i = 0; $i < $h; $i++) {
         |      long $v = ($x * (1000003L * ($i + 1) + 12345L)
         |                 + 7919L * ($i + 1)) % ${P}L;
         |      if ($v < $sig[$i]) $sig[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** Column-API entry point — resolves through the session function registry
    * (registered by Tables.tune / GraftExtensions). */
  def apply(hashes: org.apache.spark.sql.Column, h: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("minhash_sig",
      hashes, org.apache.spark.sql.functions.lit(h))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinhashSig].getCanonicalName, "minhash_sig")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "minhash_sig expects (array<bigint>, h)")
    val h = args(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sig's h must be an integer literal, got $other")
    }
    MinhashSig(args(0), h)
  }
}
