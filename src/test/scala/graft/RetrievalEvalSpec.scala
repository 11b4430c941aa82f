package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the r09-continuation additions (the oracle gate
  * proves hash equality; these prove the MEANING): RRF fusion membership and
  * score bounds, matryoshka recall domain, subsample-CI coverage of the true
  * mean, time-decay attribution conserving exactly the credit mass the
  * linear form assigns, and clustering coefficients agreeing with the raw
  * triangle counts. */
class RetrievalEvalSpec extends SparkSpec {

  test("search_rrf_fusion: fused docs come from a source list, scores bounded by 2/61") {
    val rows = Queries.byName("search_rrf_fusion").build(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val lex = Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Int])
      val sem = Option(r.getAs[Any]("sem_rank")).map(_.asInstanceOf[Int])
      assert(lex.isDefined || sem.isDefined, "fused doc in neither ranking")
      (lex ++ sem).foreach(rk => assert(rk >= 1 && rk <= 50))
      val score = r.getAs[Double]("rrf_score")
      assert(score > 0 && score <= 2.0 / 61 + 1e-9)
    }
    // scores non-increasing in the returned order
    val scores = rows.map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("knn_matryoshka_recall: one row per query, recall in [0,1] on the k-grid") {
    val rows = Queries.byName("knn_matryoshka_recall").build(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0 && n <= 5)
      assert(math.abs(r.getAs[Double]("recall_at_5") - n / 5.0) < 1e-9)
    }
  }

  test("eval_subsample_ci: b=32, lo <= mean <= hi, and the CI covers the true mean") {
    val r = Queries.byName("eval_subsample_ci").build(spark, sfDir).collect().head
    assert(r.getAs[Long]("b") == 32L)
    val (m, lo, hi) = (r.getAs[Double]("mean_value"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo <= m && m <= hi && r.getAs[Double]("se") > 0)
    val truth = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(Det.davg(col("value"))).collect().head.getDouble(0)
    assert(truth >= lo && truth <= hi,
      s"true mean $truth outside [$lo, $hi]")
  }

  test("attribution_time_decay conserves the same credit mass as the linear form") {
    def total(name: String): Double =
      Queries.byName(name).build(spark, sfDir)
        .agg(sum(col("credited"))).collect().head.getDouble(0)
    val (lin, dec) = (total("attribution_linear"), total("attribution_time_decay"))
    // both normalize each purchase's value across the same touch set, so the
    // corpus-wide credited totals agree up to per-pair 6-dp rounding
    assert(math.abs(lin - dec) < 1.0, s"linear=$lin decay=$dec")
  }

  test("graph_clustering_coeff agrees with graph_triangles and stays in [0,1]") {
    val tri = Queries.byName("graph_triangles").build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Queries.byName("graph_clustering_coeff").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (name, deg, n, c) = (r.getString(0), r.getAs[Long]("deg"),
        r.getAs[Long]("n_triangles"), r.getAs[Double]("coeff"))
      assert(c >= 0.0 && c <= 1.0)
      assert(tri.getOrElse(name, 0L) == n, s"$name triangle count mismatch")
      if (deg < 2) assert(c == 0.0)
    }
  }
}
