package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, ops}

/** Diagnostic: signature-stage cost, native minhash_sig at h=16/64/128.
  * (The HOF-fold contrast arm was removed with the r11 mixer change — the
  * fold cannot express splitmix64's wrapping multiplies under ANSI; its
  * 10x-slower measurement is recorded in the minhashSignature scaladoc.) */
object ProbeSig {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    val d = "/root/testdata/sf0.1"
    val docs = Tables.fanOut(Tables.documents(spark, d)).localCheckpoint()
    println(s"[probesig] docs=${docs.count()}")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probesig] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s (n=$n)")
    }
    val hashes = ops.DedupOps.shingleHashes(
      ops.DedupOps.shingles(col("text"), 3))
    for (round <- 1 to 2; h <- Seq(16, 64, 128)) {
      time(s"r$round native h=$h") {
        docs.select(ops.DedupOps.minhashSignature(hashes, h).as("s"))
          .selectExpr("sum(s[0])").collect(); docs.count()
      }
      time(s"r$round hashonly") {
        docs.select(hashes.as("hs")).selectExpr("sum(hs[0])").collect(); docs.count()
      }
    }
    spark.stop()
  }
}
