package graft
import org.apache.spark.sql.SparkSession
object EventsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[4]").appName("chk")
      .config("spark.sql.shuffle.partitions", 4).getOrCreate()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.selectExpr("min(ts)", "max(ts)", "count(*)").show(false)
    spark.stop()
  }
}
