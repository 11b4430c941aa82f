package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** N2 similarity search: exactness of the brute-force path, recall of the
  * LSH path, centroid UDAF correctness. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot/cosine match hand-computed values") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.cosine(col("a"), col("a")).as("self")).collect().head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("knn: self excluded, k respected, ranks ordered by cosine desc") {
    val e = Tables.embeddings(spark, sfDir)
    val out = VectorOps.knnCosine(e.filter(col("vec_id") < 5), e, 5).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("native vec_qdot equals the higher-order-function fold") {
    val qz = VectorOps.quantize(Tables.embeddings(spark, sfDir).limit(100))
      .select(col("vec_id"), col("q_vec"))
    val pairs = qz.join(
      qz.select(col("vec_id").as("b_id"), col("q_vec").as("b_vec")),
      col("vec_id") < col("b_id"))
    val mismatches = pairs.select(
      VectorOps.qdot(col("q_vec"), col("b_vec")).as("native"),
      aggregate(zip_with(col("q_vec"), col("b_vec"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // SQL surface too
    val one = qz.limit(1).select(col("q_vec").as("v"))
    assert(one.selectExpr("vec_qdot(v, v) AS d").collect().head.getLong(0) ==
      one.select(VectorOps.qdot(col("v"), col("v"))).collect().head.getLong(0))
  }

  test("int8 quantization: codes bounded by 127, per-element error within scale/2") {
    val e = VectorOps.quantize(Tables.embeddings(spark, sfDir).limit(50))
    val checked = e.select(
      aggregate(col("q_vec"), lit(0L), (m, x) => greatest(m, abs(x))).as("max_code"),
      aggregate(zip_with(col("embedding"), col("q_vec"),
        (v, q) => abs(v.cast("double") - q * col("q_scale"))),
        lit(0.0), (m, x) => greatest(m, x)).as("max_err"),
      col("q_scale")).collect()
    checked.foreach { r =>
      assert(r.getLong(0) <= 127L)
      assert(r.getDouble(1) <= r.getDouble(2) / 2 + 1e-12,
        s"reconstruction error ${r.getDouble(1)} exceeds half-scale ${r.getDouble(2) / 2}")
    }
  }

  test("quantized rescore knn: high agreement with exact brute force top-5") {
    val e = Tables.embeddings(spark, sfDir)
    val brute = VectorOps.knnCosine(e.filter(col("vec_id") < 20), e, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qz = VectorOps.quantize(e)
    val q8 = VectorOps.knnQuantized(qz.filter(col("vec_id") < 20), qz, 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(q8).size.toDouble / brute.size
    assert(recall >= 0.9,
      s"int8 scan + exact rescore should rarely lose a true neighbor: recall=$recall")
  }

  test("lsh ann: recall@3 vs brute force is useful (> 0.3) and buckets shrink work") {
    val e = Tables.embeddings(spark, sfDir)
    val brute = VectorOps.knnCosine(e.filter(col("vec_id") < 20), e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Queries.byName("knn_ann_lsh").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ann).size.toDouble / brute.size
    assert(recall > 0.3, s"recall $recall")
    // bucketing is deterministic
    val b1 = VectorOps.lshTables(e, 4, 4).select("vec_id", "table_id", "bucket").collect().map(_.toString).sorted
    val b2 = VectorOps.lshTables(e, 4, 4).select("vec_id", "table_id", "bucket").collect().map(_.toString).sorted
    assert(b1.sameElements(b2))
  }

  test("ivf ann: recall@3 beats random scanning and kmeans is deterministic") {
    val e = Tables.embeddings(spark, sfDir)
    val c1 = VectorOps.kmeansCentroids(e, 16, 3)
    val c2 = VectorOps.kmeansCentroids(e, 16, 3)
    assert(c1 == c2, "k-means must be deterministic (no RNG)")
    val brute = VectorOps.knnCosine(e.filter(col("vec_id") < 20), e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Queries.byName("knn_ann_ivf").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // 4 of 16 lists probed = 25% of the corpus scanned; random 25% would
    // give recall ~0.25 - IVF must do better than that
    assert(recall > 0.3, s"recall $recall")
  }

  test("pq ann: recall@3 vs brute force, deterministic codebooks, bounded codes") {
    val e = Tables.embeddings(spark, sfDir)
    val b1 = VectorOps.pqCodebooks(e, m = 8, k = 16, iters = 3)
    val b2 = VectorOps.pqCodebooks(e, m = 8, k = 16, iters = 3)
    assert(b1 == b2, "PQ training must be deterministic (no RNG)")
    assert(b1.m == 8 && b1.dsub == 8 && b1.books.forall(_.size == 16))
    // codes: one index per subspace, each within [0, k)
    val codes = e.select(VectorOps.pqEncode(col("embedding"), b1).as("c"))
      .collect().map(_.getAs[scala.collection.Seq[Int]](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // ADC candidates + exact rescore recover most true neighbors: 16^8
    // reconstruction cells give a far finer partition than IVF's 16 lists
    val brute = VectorOps.knnCosine(e.filter(col("vec_id") < 20), e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Queries.byName("knn_ann_pq").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall > 0.5, s"recall $recall")
    // rescored scores are exact: every returned (q,n,cos) matches brute's
    // cosine for that pair when the pair is in both
    val bruteCos = VectorOps.knnCosine(e.filter(col("vec_id") < 20), e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    Queries.byName("knn_ann_pq").build(spark, sfDir).collect().foreach { r =>
      bruteCos.get((r.getLong(0), r.getLong(1))).foreach { bc =>
        // pqKnn rounds to 6dp (the ivfKnn convention) — bound is the
        // quantization step, anything larger would betray an ADC score
        assert(math.abs(bc - r.getDouble(3)) <= 6e-7,
          "rescore must be exact cosine, not the ADC approximation")
      }
    }
  }

  test("embedding LSH near-dup: subset of the exact pairs, useful recall") {
    val exact = Queries.byName("dedup_embedding").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Queries.byName("dedup_embedding_lsh").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(exact), "exact-cosine verification means precision 1.0")
    val recall = lsh.size.toDouble / exact.size
    assert(recall > 0.2, s"recall $recall vs exact all-pairs")
  }

  test("native vec_nearest_cid assignment is bit-identical to the HOF argmin fold") {
    val e = Tables.embeddings(spark, sfDir)
    val cents = VectorOps.kmeansLloyd(e, 8, 1)
    val diff = e.select(
      VectorOps.assignExact(col("embedding"), cents).as("native"),
      VectorOps.assignExactHof(col("embedding"), cents).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"$diff rows disagree between native and HOF assignment")
  }

  test("vec_nearest_cid SQL surface degrades to null on malformed centroid matrices") {
    Tables.tune(spark)
    val r = spark.sql(
      """SELECT
        |  vec_nearest_cid(array(CAST(1.0 AS FLOAT)),
        |    array(CAST(NULL AS ARRAY<DOUBLE>), array(CAST(1.5 AS DOUBLE)))) AS skip_null,
        |  vec_nearest_cid(array(CAST(1.0 AS FLOAT)),
        |    CAST(array() AS ARRAY<ARRAY<DOUBLE>>)) AS empty_m,
        |  vec_nearest_cid(array(CAST(1.0 AS FLOAT)),
        |    array(CAST(NULL AS ARRAY<DOUBLE>))) AS all_null
        |""".stripMargin).collect().head
    assert(r.getInt(0) == 1, "null inner array must be skipped, not NPE")
    assert(r.isNullAt(1), "empty centroid matrix must yield null, not cid 0")
    assert(r.isNullAt(2), "all-null centroid matrix must yield null")
  }

  test("centroid UDAF equals manual element-wise average") {
    val df = Seq((0, Seq(1f, 3f)), (0, Seq(3f, 5f)), (1, Seq(10f, 20f)))
      .toDF("label", "embedding")
    val got = df.groupBy("label").agg(VectorOps.centroidUdaf(2).as("c"))
      .collect().map(r => r.getInt(0) -> r.getAs[scala.collection.Seq[Double]](1).toSeq).toMap
    assert(got(0) == Seq(2.0, 4.0))
    assert(got(1) == Seq(10.0, 20.0))
  }
}
