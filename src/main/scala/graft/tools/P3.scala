package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables}
import graft.ops.{ReferenceTaxonomy, SkillOps}
object P3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    println("[p3] doc partitions: " + docs.rdd.getNumPartitions)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p3] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    val singles = ReferenceTaxonomy.allTerms.filterNot(_.contains(" "))
    time("singles only")(SkillOps.matchesWith(spark, docs, singles).count())
    time("full dict")(SkillOps.matchesWith(spark, docs, ReferenceTaxonomy.allTerms).count())
    time("full dict again")(SkillOps.matchesWith(spark, docs, ReferenceTaxonomy.allTerms).count())
    spark.stop()
  }
}
