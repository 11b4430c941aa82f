package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, ops}

/** Diagnostic: per-phase timing of the dedup_pipeline chain at sf0.1. */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    val d = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probecc] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    for (_ <- 1 to 2) {
      val dupDocs = Tables.fanOut(Tables.documents(spark, d)
        .filter(regexp_like(col("text"), lit("\\bdup\\b"))))
      val cand = time("minhashPairs") {
        val c = ops.DedupOps.minhashPairs(dupDocs, h = 16, bands = 8, shingleK = 1)
          .select("doc_a", "doc_b").localCheckpoint()
        println(s"[probecc]   candidates=${c.count()}")
        c
      }
      val verified = time("jaccardVerify") {
        val v = ops.DedupOps
          .jaccardVerify(ops.DedupOps.tokenSets(dupDocs), cand, 0.8)
          .select("doc_a", "doc_b").localCheckpoint()
        println(s"[probecc]   verified=${v.count()}")
        v
      }
      time("connectedComponents") {
        println(s"[probecc]   cc_rows=${ops.DedupOps.connectedComponents(verified).count()}")
      }
    }
    spark.stop()
  }
}
