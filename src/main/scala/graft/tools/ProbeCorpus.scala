package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.DedupOps

/** Dev probe: the dedup family's CANDIDATE ECONOMICS on a given corpus —
  * family size, token types, candidate counts per algorithm, emitted pairs,
  * and warm timings. Exists for the r11-verdict #1 measurement: SF1.md §3
  * attributed the document family's sf1 tail (containment 62x, prefix 41x,
  * ngram 16x for 10x data) to the 30-word synthetic vocabulary making every
  * token a stopword; this probe measures candidates/pairs on BOTH the
  * synthetic and the Zipf/Heaps fixture (tools/gen_testdata.py --zipf-docs)
  * so the claim is numbers, not narrative.
  *
  * Usage: runMain graft.tools.ProbeCorpus [--cuts-only] <sfDir> [sfDir ...]
  *
  * --cuts-only skips the df-unguarded n-gram legs (candidates = naive
  * family² BY CONSTRUCTION — at zipf sf10 that is ~288M pairs and exists
  * only as the measured contrast; the cut legs are the production story).
  */
object ProbeCorpus {
  def main(rawArgs: Array[String]): Unit = {
    val cutsOnly = rawArgs.contains("--cuts-only")
    val args = rawArgs.filterNot(_ == "--cuts-only")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { d =>
      val docs = Tables.documents(spark, d)
      val fam = Tables.fanOut(
        docs.filter(regexp_like(col("text"), lit("\\bdup\\b"))))
      val nDocs = docs.count()
      val nFam = fam.count()
      val toks = DedupOps.tokenSets(fam).localCheckpoint()
      val nToks = toks.count()
      val nTypes = toks.select("tok").distinct().count()
      println(f"[corpus] $d  docs=$nDocs%,d family=$nFam%,d " +
        f"family_tokens=$nToks%,d family_types=$nTypes%,d " +
        f"family_pairs_naive=${nFam * (nFam - 1) / 2}%,d")

      def report(name: String, cand: => Long, emit: => Long): Unit = {
        // warm once (codegen), then time — same reasoning as ProbeQ
        val (c, _) = timed(cand)
        val (_, tc) = timed(cand)
        val (e, _) = timed(emit)
        val (_, te) = timed(emit)
        println(f"[corpus]   $name%-22s candidates=$c%,12d (${tc}%6.2f s)  " +
          f"emitted=$e%,10d (${te}%6.2f s full)")
      }

      if (!cutsOnly) {
        report("ngram_jaccard(df=inf)",
          DedupOps.jaccardCandidates(toks, Long.MaxValue).count(),
          DedupOps.jaccardPairs(fam, Long.MaxValue, 0.8).count())
      }
      // the PRODUCTION form of the df guard: disabled in the registry query
      // because on the 30-word synthetic pool every token exceeds any
      // useful cut (10% leg skipped under --cuts-only: it is the weaker
      // guard kept for the guard-strength contrast)
      val guards = if (cutsOnly) Seq(nFam / 100) else Seq(nFam / 10, nFam / 100)
      guards.map(math.max(2L, _)).distinct.foreach { g =>
        report(s"ngram_jaccard(df=$g)",
          DedupOps.jaccardCandidates(toks, g).count(),
          DedupOps.jaccardPairs(fam, g, 0.8).count())
      }
      report("prefix_jaccard(0.8)",
        DedupOps.prefixCandidates(toks).count(),
        DedupOps.prefixJaccardPairs(fam, 0.8).count())
      report("containment(0.9)",
        DedupOps.containmentCandidates(toks).count(),
        DedupOps.containmentPairs(fam, 0.9).count())
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
