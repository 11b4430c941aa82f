package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IndexDeltaSink

/** Streaming inverted-index maintenance: micro-batch deltas merged
  * additively through the transactional sink must converge to exactly the
  * one-shot batch index (incremental ≡ rebuild), stay put under same-id
  * replay (ledger) AND under new-id redelivery of already-indexed docs
  * (doc-level guard) — the additive analog of JdbcShapedSinkSpec. */
class IndexDeltaSinkSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join spark"),
    (2L, "join stream"),
    (3L, "spark stream stream table"),
    (4L, "table"),
    (5L, "join table spark"))

  private def mkSink(): IndexDeltaSink =
    new IndexDeltaSink(Files.createTempDirectory("graft-index-sink").toString)

  private def state(sink: IndexDeltaSink): Map[String, (Long, Long, Seq[Long])] =
    sink.table(spark).map(_.collect().map { r =>
      r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("cf"),
          r.getAs[scala.collection.Seq[Long]]("postings").toSeq))
    }.toMap).getOrElse(Map.empty)

  private def rebuilt: Map[String, (Long, Long, Seq[Long])] =
    SearchQueries.indexFull(docs.toDF("doc_id", "text")).collect().map { r =>
      r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("cf"),
          r.getAs[scala.collection.Seq[Long]]("postings").toSeq))
    }.toMap

  test("micro-batch deltas converge to the batch rebuild; replays add nothing") {
    val sink = mkSink()
    val b0 = docs.take(3).toDF("doc_id", "text")
    val b1 = docs.drop(3).toDF("doc_id", "text")

    sink.writeBatch(b0, 0L)
    sink.writeBatch(b1, 1L)
    val streamed = state(sink)
    assert(streamed == rebuilt, "incremental index != batch rebuild")

    // same-id replay: ledger skips before any write
    sink.writeBatch(b1, 1L)
    assert(state(sink) == streamed)

    // checkpoint loss: the SAME docs re-delivered under a NEW id — the
    // doc-level guard must drop them before the additive merge double-counts
    sink.writeBatch(b0.union(b1), 2L)
    assert(state(sink) == streamed, "new-id redelivery double-counted")

    // a genuinely new doc under yet another id extends the index
    sink.writeBatch(Seq((6L, "stream spark")).toDF("doc_id", "text"), 3L)
    val after = state(sink)
    assert(after("spark")._3.contains(6L) && after("stream")._3.contains(6L))
    assert(after("spark")._1 == streamed("spark")._1 + 1)
  }

  test("attached to a real stream: fresh-checkpoint source replay converges") {
    val sink = mkSink()
    def runOnce(): Unit = {
      val mem = MemoryStream[(Long, String)](spark)
      mem.addData(docs: _*)
      val q = mem.toDF().toDF("doc_id", "text")
        .writeStream.foreachBatch(sink.writeBatch _)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    val first = state(sink)
    assert(first == rebuilt)
    runOnce() // whole source replays under new batch ids
    assert(state(sink) == first)
  }
}
