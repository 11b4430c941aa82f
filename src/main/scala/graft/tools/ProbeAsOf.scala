package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Diagnostic: native AsOfJoinExec vs the compositional union+window
  * as-of (the form users build without the operator) on the same
  * purchases-vs-clicks shape at sf0.1. */
object ProbeAsOf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    val d = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, d).localCheckpoint()
    def purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    def clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(graft.Det.dsum(col("value")).as("click_value"))
    def native(): Long = graft.plans.AsOfJoinOps.asofJoin(
      purchases, clicks, Seq("user_id"), Seq("c_user"), "ts", "c_ts").count()
    def windowed(): Long = {
      val cu = clicks.select(col("c_user").as("user_id"), col("c_ts").as("ts"),
        col("click_value"), lit(null).cast("long").as("event_id"), lit(1).as("is_click"))
      val pu = purchases.select(col("user_id"), col("ts"),
        lit(null).cast("double").as("click_value"), col("event_id"), lit(0).as("is_click"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_click").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cu.unionByName(pu)
        .withColumn("last_click", last(col("click_value"), ignoreNulls = true).over(w))
        .filter(col("is_click") === 0 && col("last_click").isNotNull)
        .count()
    }
    for (r <- 1 to 3) {
      var t0 = System.nanoTime(); val n1 = native()
      val tn = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); val n2 = windowed()
      val tw = (System.nanoTime() - t0) / 1e9
      println(f"[probeasof] r$r native $tn%6.2f s (n=$n1)   union+window $tw%6.2f s (n=$n2)")
    }
    spark.stop()
  }
}
