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

  test("vec_dot is callable from SQL after registration") {
    Tables.tune(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }
}
