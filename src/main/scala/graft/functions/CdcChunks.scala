package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking: `cdc_chunks(text)` returns the array of
  * (fp, len) chunk structs — byte-for-byte the HOF formulation in
  * [[graft.CorpusQueries]]'s `chunk_cdc` (code points via
  * `ascii(substring(text, i, 1))`, 8-char rolling window hash
  * Horner-×31, boundary at hash ≡ 0 (mod 32), chunk identity folded
  * mod 1e9+7), with the same DuckDB oracle.
  *
  * Why native: the HOF form pays interpreted lambda dispatch per CHARACTER
  * (transform to code points, filter over window hashes, a nested aggregate
  * per chunk — none of it codegens), and its ScaleProbe ratio was the
  * weakest of the r08 additions (10.9× at 20×). Here the whole pass is one
  * tight O(n·w) loop over a code-point array inside whole-stage codegen —
  * the generated code calls a single static method, so the expression never
  * breaks the codegen span around it.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("len", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunks$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  private final val Window = 8
  private final val BoundaryMod = 32L
  private final val FpMod = 1000000007L

  /** One pass over the code points: boundary positions (1-based, window
    * hash ≡ 0 mod 32, plus the final position), then per chunk the
    * mod-1e9+7 Horner fold and length. Exactly the HOF semantics,
    * including the n < 8 single-chunk case. */
  def compute(text: UTF8String): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    // ends: every boundary position plus n (dedup when n is a boundary)
    val ends = new java.util.ArrayList[Integer]()
    if (n >= Window) {
      var i = Window
      while (i <= n) {
        var h = 0L
        var j = i - Window
        while (j < i) { h = h * 31L + cps(j); j += 1 }
        if (h % BoundaryMod == 0L) ends.add(i)
        i += 1
      }
    }
    if (ends.isEmpty || ends.get(ends.size - 1) != n) ends.add(n)
    val out = new Array[Any](ends.size)
    var k = 0
    var start = 1
    while (k < ends.size) {
      val end = ends.get(k)
      var fp = 0L
      var j = start - 1
      while (j < end) { fp = (fp * 31L + cps(j)) % FpMod; j += 1 }
      out(k) = InternalRow(fp, (end - start + 1).toLong)
      start = end + 1
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("cdc_chunks", text)

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CdcChunks].getName, "cdc_chunks")

  val builder: Seq[Expression] => Expression = {
    case Seq(a) => CdcChunks(a)
    case other => throw new IllegalArgumentException(
      s"cdc_chunks expects 1 argument, got ${other.size}")
  }
}
