package graft

/** The r09 verdict's scale hole: the Borůvka component merge used to collect
  * the pick pairs AND every component label to the driver — O(|V|) in round
  * 1 of a real MST, where every vertex is its own component. This spec
  * drives the rewritten in-plan merge at 10⁵ round-1 components (a path
  * graph, the worst single-linkage shape) and checks it against the
  * driver-side replay. */
class BoruvkaMergeSpec extends SparkSpec {
  import spark.implicits._

  test("10^5-component forest: in-plan merge, no O(components) collect") {
    val n = 100000
    // path graph with alternating weights 1,2: round-1 picks are exactly
    // the weight-1 edges (2k, 2k+1) — n/2 two-node stars (pick-forest
    // diameter 1, so the in-plan fixpoint converges in 2 label rounds)
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1, 1L + i % 2))
    val und = edges.flatMap { case (s, d, w) => Seq((s, d, w), (d, s, w)) }
      .toDF("src", "dst", "w")
    val got = GraphQueries.boruvkaRounds(und, 1).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    assert(got.size == n / 2, s"round-1 picks: ${got.size}")
    assert(got.forall(_._5 == n / 2), "round-1 component count")
    assert(got.forall(p => p._3 == p._2 + 1 && p._4 == 1L && p._2 % 2 == 0),
      "round-1 picks must be the weight-1 edges")
    assert(got == BoruvkaReference.rounds(edges, 1),
      "round-1 output must match the driver replay")
  }

  test("pathological pick-forest diameter throws loudly instead of " +
      "silently under-merging") {
    // round 2 of the alternating path: every supernode picks its LOWER
    // neighbor (w ties break on the smaller component label), so the pick
    // graph is a PATH of n/2 supernodes — min-label needs n/2 synchronous
    // rounds, far past the 48-round cap. The r09 driver-side merge would
    // have collected its way through this; the r10 contract is a loud
    // IllegalStateException pointing at the large/small-star operator.
    val n = 4000
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1, 1L + i % 2))
    val und = edges.flatMap { case (s, d, w) => Seq((s, d, w), (d, s, w)) }
      .toDF("src", "dst", "w")
    val ex = intercept[IllegalStateException] {
      // mergeCap = 0 forces the in-plan path (n/2 = 2000 pick pairs would
      // otherwise take the driver replay, which throws identically)
      GraphQueries.boruvkaRounds(und, 2, mergeCap = 0).collect()
    }
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
    // and the driver replay path throws the same way
    val ex2 = intercept[IllegalStateException] {
      GraphQueries.boruvkaRounds(und, 2, mergeCap = 1000000).collect()
    }
    assert(ex2.getMessage.contains("did not converge"), ex2.getMessage)
  }

  test("guard boundary: driver replay ≡ in-plan merge on the SAME graph") {
    // a weighted graph big enough that the merge does real work, run once
    // with the cap forcing the driver path (mergeCap = 1e6) and once
    // forcing the in-plan path (mergeCap = 0) — byte-identical output pins
    // the dispatch as a pure perf choice, never a semantic one
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong,
        1L + rnd.nextInt(9)) }.filter(e => e._1 != e._2)
    val und = edges.flatMap { case (s, d, w) => Seq((s, d, w), (d, s, w)) }
      .groupBy(e => (e._1, e._2))
      .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
      .toDF("src", "dst", "w")
    def run(cap: Int) =
      GraphQueries.boruvkaRounds(und, 2, mergeCap = cap).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq.sorted
    val driverPath = run(1000000)
    val inPlanPath = run(0)
    assert(driverPath.nonEmpty)
    assert(driverPath == inPlanPath,
      "the two merge paths must compute the identical function")
  }
}
