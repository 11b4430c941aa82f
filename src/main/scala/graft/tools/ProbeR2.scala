package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{Queries, Tables}
object ProbeR2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    val d = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.region(spark, d).count()
    for (name <- args) {
      val t0 = System.nanoTime()
      Queries.byName(name).build(spark, d).count()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
