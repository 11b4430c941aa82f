package graft

import org.apache.spark.sql.functions._

import graft.functions.FloatVectorDot
import graft.ops.VectorOps

/** X1 stretch: the native codegen expression — eval correctness, codegen vs
  * interpreted parity, SQL registration, and fold-order parity with the
  * higher-order-function formulation. */
class FloatVectorDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot computes the double left-fold dot product") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    assert(df.select(FloatVectorDot(col("a"), col("b"))).collect().head.getDouble(0) == 32.0)
  }

  test("null array yields null; mismatched lengths use the shorter") {
    val df = Seq((Some(Seq(1f, 2f)), None: Option[Seq[Float]]),
      (Some(Seq(1f, 2f, 100f)), Some(Seq(3f, 4f)))).toDF("a", "b")
    val got = df.select(FloatVectorDot(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 11.0)
  }

  test("codegen and interpreted paths agree on real embeddings") {
    val e = Tables.embeddings(spark, sfDir).limit(100)
    val viaExpr = e.select(col("vec_id"), VectorOps.sqNorm(col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // interpreted reference: the old higher-order-function fold
    val viaFold = e.select(col("vec_id"),
      aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaExpr == viaFold, "codegen fold must be bitwise-identical to HOF fold")
  }

  test("fused vec_cosine is bit-identical to the composed vec_dot form") {
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 5)
    val fused = pairs.select(col("ia"), col("ib"),
      graft.functions.FloatVectorCosine(col("ea"), col("eb")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val composed = pairs.select(col("ia"), col("ib"),
      (FloatVectorDot(col("ea"), col("eb")) /
        (sqrt(FloatVectorDot(col("ea"), col("ea"))) *
          sqrt(FloatVectorDot(col("eb"), col("eb"))))).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fused == composed, "fusion must not change a single bit")
  }

  test("vec_cosine handles mismatched lengths and self-similarity") {
    Tables.tune(spark)
    val r = spark.sql(
      "SELECT vec_cosine(array(1.0F, 2.0F), array(1.0F, 2.0F)) AS self, " +
        "vec_cosine(array(3.0F, 4.0F, 99.0F), array(3.0F, 4.0F)) AS trunc")
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    // dot over min length, norms over FULL arrays — same as composed form
    val expect = 25.0 / (math.sqrt(9 + 16 + 99.0 * 99) * 5.0)
    assert(r.getDouble(1) == expect)
  }

  test("vec_dot is callable from SQL after registration") {
    Tables.tune(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }
}
