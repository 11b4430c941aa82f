package graft

/** The GramAgg typed-Aggregator query path must be bit-identical to the
  * HOF-explode formulation it replaced — same scaled-long per-pair
  * rounding, same (i, j) labeling, same final IEEE arithmetic. The HOF
  * form IS the executable spec (the assignExact/assignExactHof pattern).
  */
class GramMatrixSpec extends SparkSpec {

  test("GramAgg query path == HOF explode spec, cell for cell") {
    val e = Tables.embeddings(spark, sfDir)
    val fast = ClusterQueries.embeddingGramMatrixOf(e).collect()
    val spec = ClusterQueries.embeddingGramMatrixHofOf(e).collect()
    assert(fast.length == spec.length,
      s"row counts differ: agg=${fast.length} hof=${spec.length}")
    fast.zip(spec).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(0) && a.getInt(1) == b.getInt(1),
        s"cell order diverged: $a vs $b")
      assert(a.getLong(2) == b.getLong(2), s"n differs at $a vs $b")
      assert(a.getDouble(3) == b.getDouble(3), s"exy differs at $a vs $b")
      assert(a.getDouble(4) == b.getDouble(4), s"cov differs at $a vs $b")
    }
  }
}
