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

  test("GramAgg == HOF on adversarial random vectors (negatives, zeros, tiny/large)") {
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.tabulate(64) { i =>
      rnd.nextInt(5) match {
        case 0 => 0.0f
        case 1 => -0.0f
        case 2 => (rnd.nextFloat() - 0.5f) * 1e-5f   // rounds to ±0 after 6dp
        case 3 => (rnd.nextFloat() - 0.5f) * 100f
        case _ => rnd.nextFloat() - 0.5f
      }
    }
    import spark.implicits._
    val df = Seq.fill(40)(vec()).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val fast = ClusterQueries.embeddingGramMatrixOf(df).collect()
    val spec = ClusterQueries.embeddingGramMatrixHofOf(df).collect()
    assert(fast.length == spec.length)
    fast.zip(spec).foreach { case (a, b) =>
      assert(a == b, s"cells diverged on random input: $a vs $b")
    }
  }
}
