package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{Queries, Tables}

/** Diagnostic: print a query's post-AQE executed plan. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    for (name <- args) {
      val df = Queries.byName(name).build(spark, "/root/testdata/sf0.001")
      df.collect()
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
