package graft

import org.apache.spark.sql.functions._

import graft.ops.LayoutOps

/** Physical-layout operators: the Z-order interleave itself, the file-level
  * data-skipping effect of a z-ordered layout, and small-file compaction. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue: hand-computed Morton interleaves") {
    val got = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (2L, 2L))
      .toDF("x", "y")
      .select(LayoutOps.zvalue(Seq(col("x"), col("y")), 4))
      .collect().map(_.getLong(0)).toSeq
    // x0y0x1y1...: (3,1)->1+2+4=7; (1,0)->1; (0,1)->2; (2,2)->4+8=12
    assert(got == Seq(7L, 0L, 1L, 2L, 12L), s"$got")
    // three columns interleave too: (1,1,1) -> bits 0,1,2 set
    val g3 = Seq((1L, 1L, 1L)).toDF("x", "y", "w")
      .select(LayoutOps.zvalue(Seq(col("x"), col("y"), col("w")), 2))
      .collect()(0).getLong(0)
    assert(g3 == 7L)
    // SQL form agrees with the expression form on real keys
    val li = Tables.lineitem(spark, sfDir)
    li.createOrReplaceTempView("v_zli")
    val viaExpr = li.select(LayoutOps.zvalue(
        Seq(col("l_partkey"), col("l_suppkey")), 16).as("z"))
      .agg(sum("z")).collect()(0).getLong(0)
    val viaSql = spark.sql(
      s"SELECT sum(${LayoutOps.zvalueSql(Seq("l_partkey", "l_suppkey"), 16)}) " +
        "FROM v_zli").collect()(0).getLong(0)
    assert(viaExpr == viaSql)
  }

  test("z-ordered layout touches fewer files than a hash layout for a 2-D box") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val hashDir = "/tmp/graft-layout-hash"
    val zDir = "/tmp/graft-layout-z"
    li.repartition(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(hashDir)
    LayoutOps.zorderWrite(li, Seq("l_partkey", "l_suppkey"), 16, 16, zDir)

    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("l_partkey").between(20, 60) &&
          col("l_suppkey").between(2, 5))
        .select(input_file_name().as("f")).distinct().count()

    val (h, z) = (filesTouched(hashDir), filesTouched(zDir))
    // hash scatters the box across ~every file; the curve confines it
    assert(z < h, s"z-order must confine the box: hash=$h files, z=$z files")
    assert(z <= 4, s"box rows should live on a short curve segment, got $z files")
    // layout never changes results
    assert(spark.read.parquet(zDir).count() == li.count())
  }

  test("compact: small-files directory shrinks, content identical") {
    val dir = "/tmp/graft-layout-compact"
    val df = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    df.repartition(32).write.mode("overwrite").parquet(dir)
    // decimal sum: double sums are order-dependent and compaction reorders
    def decSum(): java.math.BigDecimal = spark.read.parquet(dir)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .collect()(0).getDecimal(0)
    val sumBefore = decSum()
    val (before, after) = LayoutOps.compact(spark, dir, 8L * 1024 * 1024)
    assert(before == 32 && after < before,
      s"compaction must shrink the file count: $before -> $after")
    val sumAfter = decSum()
    assert(sumBefore == sumAfter && spark.read.parquet(dir).count() == df.count())
  }
}
