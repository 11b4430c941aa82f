package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch end-to-end corpus curation — the composed pipeline a training-data
  * user actually runs, chained from the same building blocks the registry
  * exposes: quality gate → verbatim decontamination → chunk-dedup rewrite.
  * Asserts the global invariants the stages must jointly preserve:
  * no failing doc survives the gate, no eval needle survives decontam,
  * no cross-document duplicate chunk survives the rewrite, and text only
  * ever shrinks. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val chunk = 8 // small chunks so the tiny fixture exercises dedup

  private def tokens(c: org.apache.spark.sql.Column) = split(lower(c), "\\s+")

  test("gate -> decontam -> chunk rewrite: invariants hold jointly") {
    val boiler = (1 to chunk).map(i => s"boiler$i")  // shared chunk
    val evalNeedle = "eval one two three four"
    def uniq(p: String) = (1 to 24).map(i => s"${p}tok$i")  // 6-8 chars: clears the word-length rule
    val docs = Seq(
      1L -> (uniq("a") ++ boiler).mkString(" "),         // clean, shares boiler
      2L -> (boiler ++ uniq("b")).mkString(" "),         // clean, shares boiler
      3L -> (uniq("c").mkString(" ") + " " + evalNeedle + " " + uniq("d").mkString(" ")), // contaminated
      4L -> "too short",                                  // fails gate
      5L -> uniq("e").mkString(" ")                       // clean and unique
    ).toDF("doc_id", "text")

    // stage 1: quality gate (registered rule expression)
    val gated = docs.filter(TrainDataQueries.qualityReasonsOf(col("text")) === "")
    // stage 2: verbatim decontamination against a broadcast needle set
    val evals = Seq(evalNeedle).toDF("needle")
    val decontaminated = gated.join(broadcast(evals),
      expr("contains(lower(text), needle)"), "left_anti")
    // stage 3: chunk-dedup rewrite (drop cross-doc duplicate chunks)
    val t = tokens(col("text"))
    val nChunks = ceil(size(t) / lit(chunk.toDouble)).cast("long")
    val chunkArr = transform(sequence(lit(0L), nChunks - 1),
      i => array_join(slice(t, (i * chunk).cast("int") + 1, lit(chunk)), " "))
    val ch = decontaminated
      .select(col("doc_id"), posexplode(chunkArr).as(Seq("pos", "c")))
    val occ = ch.groupBy("c").agg(countDistinct(col("doc_id")).as("nd"))
    val cleaned = ch.join(occ, "c").groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(
        when(col("nd") === 1, struct(col("pos"), col("c"))))),
        s => s.getField("c")), " ").as("clean_text"))

    val out = cleaned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // gate: doc 4 gone; decontam: doc 3 gone
    assert(out.keySet == Set(1L, 2L, 5L), s"${out.keySet}")
    // no eval needle anywhere downstream
    assert(out.values.forall(!_.contains("eval one")), "needle must not survive")
    // no cross-doc duplicate chunk survives: boiler chunk removed from BOTH
    assert(out.values.forall(!_.contains("boiler1")), s"shared chunk must go: $out")
    // unique content preserved verbatim, in order
    assert(out(1L) == (1 to 24).map(i => s"atok$i").mkString(" "))
    assert(out(2L) == (1 to 24).map(i => s"btok$i").mkString(" "))
    assert(out(5L) == (1 to 24).map(i => s"etok$i").mkString(" "))
    // monotone shrink: every surviving doc's token count <= original
    val before = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ").length).toMap
    out.foreach { case (id, txt) =>
      assert(txt.split(" ").length <= before(id), s"doc $id grew")
    }
  }
}
