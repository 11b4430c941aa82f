package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PPJoin+ SUFFIX FILTER primitive (Xiao, Wang, Lin, Yu — "Efficient
  * Similarity Joins for Near Duplicate Detection", WWW'08 §4):
  * `suffix_hamming_lb(ks_a, ks_b, ra, rb)` = a LOWER BOUND on the set
  * Hamming distance |A Δ B| between the two docs' token SUFFIXES
  * A = ks_a[ra..], B = ks_b[rb..] (1-based ranks: ra/rb are the positions
  * of the pair's first shared token in the canonical order, so the
  * suffixes are everything strictly after it).
  *
  * Inputs: each `ks` array is the doc's full token set encoded as
  * canonical-order keys (lpad(df) + \\u0001 + tok — binary string order ==
  * the (df asc, tok asc) order every candidate cut ranks by), sorted
  * ascending, elements distinct. The caller turns the bound into an
  * overlap ceiling via |A∩B| = (|A| + |B| − |AΔB|) / 2: a pair whose
  * required overlap exceeds 1 + (|A|+|B|−lb)/2 cannot qualify, so the cut
  * is LOSSLESS whenever lb ≤ |AΔB|.
  *
  * The bound: partition the ordered token universe at the probe w =
  * B's middle element into (<w), (=w), (>w). Sorted distinct arrays split
  * exactly at w (one binary search in A), and symmetric difference
  * decomposes across disjoint strata:
  *
  *   |A Δ B| = |A₍<w₎ Δ B₍<w₎| + |A₍>w₎ Δ B₍>w₎| + (1 if w ∉ A else 0)
  *
  * Each stratum's distance is ≥ abs(|·|−|·|) (sizes alone), and recursing
  * MAXDEPTH times tightens the bound with ≤ 2^d−1 further probes — the
  * depth-limited form of the paper's SuffixFilter (their hmax early-exit
  * and probing-window restriction are constant-factor savings on the same
  * bound; this form keeps the full decomposition, whose losslessness is
  * the two-line stratum argument above, property-tested against the
  * brute-force symmetric difference in OpProps).
  *
  * MAXDEPTH = 6, chosen by measurement on the Heaps-vocabulary zipf
  * fixture (r14; the paper's depth 2 was tuned for multi-thousand-token
  * web documents): surviving containment candidates at zipf sf10 were
  * 111,605 / 75,894 / 35,034 / 7,950 / 4,534 at depth 2/3/4/5/6 against
  * an emitted floor of 4,532 — each level costs at most 2× the probes and
  * the whole filter stays O(min(2^d, |suffix|) · log |doc|) UTF8String
  * comparisons per pair, no allocation: on this fixture's ≤ 100-token docs
  * the recursion bottoms out on empty windows long before depth 6 (the
  * bound goes near-exact at sorted-merge-like cost), while at web-scale
  * doc sizes the 2^d cap is what keeps the probe sublinear in the doc —
  * vs the candidates × |doc| verify join rows each false candidate costs
  * downstream either way.
  *
  * Why native: this runs once per candidate PAIR (the n^1.7 growth path
  * of `dedup_containment` — SF1.md §6), inside the join's codegen stage;
  * index-windowed recursion over the two ArrayData avoids materializing
  * per-pair suffix slices a HOF/UDF form would allocate.
  */
case class SuffixHammingLb(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _),
          IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "suffix_hamming_lb expects (array<string>, array<string>, int, int), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString}, " +
          s"${d.catalogString})")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "suffix_hamming_lb"

  override def nullSafeEval(a: Any, b: Any, ra: Any, rb: Any): Any =
    SuffixHammingLb.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      ra.asInstanceOf[Int], rb.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, ra, rb) =>
      s"graft.functions.SuffixHammingLb$$.MODULE$$.compute($a, $b, $ra, $rb)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SuffixHammingLb =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object SuffixHammingLb {
  /** Measured on the zipf fixture (see class doc): the cut saturates at
    * the emitted floor by depth 6 on realistic vocabularies while the
    * worst-case probe count (2^d − 1 = 63 binary searches) stays far under
    * one verify-join row's cost. */
  val MaxDepth = 6

  def compute(a: ArrayData, b: ArrayData, ra: Int, rb: Int): Int = {
    val na = a.numElements(); val nb = b.numElements()
    // 1-based first-shared ranks: suffix of a = indices ra..na-1
    if (ra < 1 || ra > na || rb < 1 || rb > nb)
      throw new IllegalArgumentException(
        s"suffix_hamming_lb: rank out of range (ra=$ra of $na, rb=$rb of $nb)")
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"suffix_hamming_lb: null array element at index $i")
      i += 1
    }
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) throw new IllegalArgumentException(
        s"suffix_hamming_lb: null array element at index $j")
      j += 1
    }
    lb(a, ra, na, b, rb, nb, 0)
  }

  /** Lower bound on |a[xl..xr) Δ b[yl..yr)| (half-open index windows over
    * sorted distinct arrays), recursing to MaxDepth. */
  private def lb(a: ArrayData, xl: Int, xr: Int,
      b: ArrayData, yl: Int, yr: Int, d: Int): Int = {
    val nx = xr - xl; val ny = yr - yl
    if (nx == 0) return ny
    if (ny == 0) return nx
    if (d >= MaxDepth) return math.abs(nx - ny)
    val mid = yl + ny / 2
    val w = b.getUTF8String(mid)
    // lower_bound of w in a[xl..xr): first index with a(i) >= w
    var lo = xl; var hi = xr
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (a.getUTF8String(m).compareTo(w) < 0) lo = m + 1 else hi = m
    }
    val found = lo < xr && a.getUTF8String(lo).compareTo(w) == 0
    val diff = if (found) 0 else 1
    lb(a, xl, lo, b, yl, mid, d + 1) +
      lb(a, if (found) lo + 1 else lo, xr, b, mid + 1, yr, d + 1) + diff
  }

  /** Plain-Scala reference on string seqs — the executable spec OpProps
    * property-tests the bound against (lb ≤ true |AΔB| on every input). */
  def computeRef(a: Seq[String], b: Seq[String], ra: Int, rb: Int): Int = {
    val ad = ArrayData.toArrayData(a.map(UTF8String.fromString).toArray)
    val bd = ArrayData.toArrayData(b.map(UTF8String.fromString).toArray)
    compute(ad, bd, ra, rb)
  }

  /** Column-API entry point — resolves through the session function registry
    * (registered by Tables.tune / GraftExtensions). */
  def apply(ksA: org.apache.spark.sql.Column, ksB: org.apache.spark.sql.Column,
      ra: org.apache.spark.sql.Column, rb: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("suffix_hamming_lb",
      ksA, ksB, ra, rb)

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SuffixHammingLb].getCanonicalName, "suffix_hamming_lb")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b, c, d) => SuffixHammingLb(a, b, c, d)
    case other => throw new IllegalArgumentException(
      s"suffix_hamming_lb expects 4 arguments, got ${other.size}")
  }
}
