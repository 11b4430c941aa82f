package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.DedupOps

/** Dev probe: stage timings for dedup_minhash at a given sf. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val sh = docs.select(col("doc_id"), DedupOps.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles")(sh.count())
    val hx = sh.select(col("doc_id"), DedupOps.shingleHashes(col("sh")).as("hx"))
    time("hashes")(hx.agg(sum(size(col("hx")))).collect())
    val sigs = hx.select(col("doc_id"), DedupOps.minhashSignature(col("hx"), 16).as("sig"))
    time("signatures")(sigs.agg(sum(size(col("sig")))).collect())
    val keyed = sigs.select(col("doc_id"), col("sig"),
      explode(DedupOps.bandKeys(col("sig"), 4, 4)).as("bk"))
    time("banded")(keyed.count())
    time("full pairs")(DedupOps.minhashPairs(docs, 16, 4).count())
    spark.stop()
  }
}
