package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query timed at the given scale
  * factor; one JSON line on stdout. A small untimed warmup first so JVM/
  * codegen/datasource initialization isn't attributed to whichever query
  * happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    // warmup: JVM + codegen + parquet reader/footer init for EVERY table
    // (untimed) — otherwise whichever query alphabetically touches a table
    // first is charged its cold-read cost and per-query numbers aren't
    // comparable across rounds
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Tables.names.foreach(n => Tables.table(spark, sfDir, n).count())
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
