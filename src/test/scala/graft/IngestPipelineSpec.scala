package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.JdbcShapedSink

/** End-to-end streaming ingest: the shape a production training-data
  * pipeline runs per crawl batch — quality gate (integer-exact rules) +
  * eval-set decontamination, both as stateless per-row expressions, into
  * the exactly-once keyed sink. Asserts the composition: only clean,
  * uncontaminated docs land; a full source replay on a fresh checkpoint
  * changes nothing. */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("gate + decontam + exactly-once sink compose; replay is a no-op") {
    val longClean = (1 to 30).map(i => "tok" + i).mkString(" ")   // passes gate
    val contaminated = "one two three four five " + longClean     // shares bench gram
    val tooShort = "just a few words"
    val rows = Seq(
      (1L, 10L, longClean),
      (2L, 10L, contaminated),
      (3L, 10L, tooShort),
      (1L, 10L, longClean))                                       // source dup
    val benchGrams = Seq("one two three four five")

    val dir = Files.createTempDirectory("graft-ingest").toString
    val sink = new JdbcShapedSink(dir, Seq("doc_id"), "ver")

    def clean(df: DataFrame): DataFrame = df
      .filter(TrainDataQueries.qualityReasonsOf(col("text")) === "")
      .filter(size(array_intersect(
        array_distinct(TrainDataQueries.gramsOf(col("text"), 5)),
        array(benchGrams.map(lit): _*))) === 0)

    def runOnce(): Unit = {
      val mem = MemoryStream[(Long, Long, String)](spark)
      mem.addData(rows: _*)
      val q = clean(mem.toDF().toDF("doc_id", "ver", "text"))
        .writeStream.foreachBatch(sink.writeBatch _)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }

    runOnce()
    val first = sink.table(spark).get.select("doc_id").as[Long].collect().sorted
    // doc 2 is contaminated, doc 3 fails the gate, doc 1's dup is merged
    assert(first.toSeq == Seq(1L))

    runOnce() // fresh checkpoint replays everything; sink must not change
    val second = sink.table(spark).get.select("doc_id").as[Long].collect().sorted
    assert(second.toSeq == first.toSeq)
  }
}
