package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen form of the MinHash signature fold — the hot inner loop of
  * corpus-scale near-dup detection (SURVEY.md §2.11 N1). Semantically
  * IDENTICAL to DedupOps.minhashSignatureRef (the plain-Scala executable
  * spec, property-tested in ParseProps): for each shingle hash x (array
  * order) and each hash function i < h,
  *
  *   sig[i] = min(sig[i], splitmix64(x + GOLDEN · (i+1)))
  *
  * with GOLDEN = 0x9E3779B97F4A7C15 (the splitmix64 stream increment),
  * splitmix64 the standard xor-shift/multiply finalizer, and sig
  * initialized to Long.MaxValue. Signed-long comparison is fine: the mixer
  * output is uniform over all 64 bits, and BOTH docs order candidates by
  * the same comparison, so agreement semantics only need a total order.
  *
  * Why splitmix64 per function (r11): the previous family was affine over
  * one base hash ((a_i·x + b_i) mod p). Affine transforms of a SHARED x
  * make the h min-agreement events positively correlated, inflating the
  * agreement-estimate variance far past binomial — at the sf1 rehearsal
  * 18% of est ≥ 0.5 emissions had true Jaccard < 0.15. splitmix64 is a
  * bijective strong mixer, so h_i behave as independent permutations and
  * the estimate is binomial as the bound oracles assume. Also faster: the
  * old inner loop paid a 64-bit modulo (hardware division); this is
  * xor/shift/multiply only.
  *
  * Why native: the HOF tree evaluates h lambda dispatches per element and
  * re-materializes the h-wide accumulator array per step; this is a two-level
  * primitive loop writing one long[] — the difference between a codegen'd
  * tight loop and interpreter-shaped work in the hottest path of web-scale
  * dedup. Result is built with UnsafeArrayData.fromPrimitiveArray (no
  * boxing). Wrapping multiplies are deliberate (Java semantics; this is a
  * hash, not arithmetic — ANSI overflow checks do not apply inside a
  * native expression).
  */
case class MinhashSig(child: Expression, h: Int) extends UnaryExpression {

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
    val sig = Array.fill(h)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val x = arr.getLong(j)
        var i = 0
        while (i < h) {
          var z = x + 0x9E3779B97F4A7C15L * (i + 1)
          z = (z ^ (z >>> 33)) * 0xFF51AFD7ED558CCDL
          z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
          z ^= (z >>> 33)
          if (z < sig(i)) sig(i) = z
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
      val z = ctx.freshName("z")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$h];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $x = $a.getLong($j);
         |    for (int $i = 0; $i < $h; $i++) {
         |      long $z = $x + 0x9E3779B97F4A7C15L * ($i + 1);
         |      $z = ($z ^ ($z >>> 33)) * 0xFF51AFD7ED558CCDL;
         |      $z = ($z ^ ($z >>> 33)) * 0xC4CEB9FE1A85EC53L;
         |      $z ^= ($z >>> 33);
         |      if ($z < $sig[$i]) $sig[$i] = $z;
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
