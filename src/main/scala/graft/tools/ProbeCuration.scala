package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** One-off diagnostic: time the curation_e2e sub-pipelines separately. */
object ProbeCuration {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"[curation] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, d)
    val nt = graft.ops.DedupOps.normalizedText(col("text"))
    time("staged gate only") {
      graft.TrainDataQueries.gateKeepStaged(Tables.fanOut(docs)).count()
    }
    time("staged gate + nt") {
      graft.TrainDataQueries.gateKeepStaged(Tables.fanOut(docs))
        .withColumn("nt", nt).select(col("nt")).count()
    }
    time("staged gate + nt + minby") {
      graft.TrainDataQueries.gateKeepStaged(Tables.fanOut(docs))
        .withColumn("nt", nt)
        .groupBy("nt")
        .agg(min_by(struct(col("doc_id"), col("lang"), col("text")),
          col("doc_id")).as("k"))
        .count()
    }
    spark.stop()
  }
}
