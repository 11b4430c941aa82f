package graft

import org.apache.spark.sql.functions._

/** Invariants of the retrieval pack (SearchQueries): index consistency,
  * BM25 ranking sanity, and — the property the operators exist for —
  * layout independence: the same result from any partitioning of the
  * input, because nothing depends on rand() or partition indexes. */
class SearchQueriesSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("index_postings: df/cf consistent, postings head sorted and bounded") {
    val idx = SearchQueries.indexPostingsOf(docs).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val df = r.getAs[Long]("df")
      val cf = r.getAs[Long]("cf")
      val head = r.getAs[scala.collection.Seq[Long]]("postings_head").toSeq
      assert(cf >= df, s"cf < df for term ${r.getAs[String]("term")}")
      assert(head.size == math.min(df, 10L))
      assert(head == head.sorted, "postings head not ascending")
    }
    // df of a term == number of distinct docs containing it (spot-check one)
    val term = idx.head.getAs[String]("term")
    val expected = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") === term).select("doc_id").distinct().count()
    assert(idx.head.getAs[Long]("df") == expected)
  }

  test("search_bm25: scores weakly decreasing, hits bounded by query size") {
    val hits = SearchQueries.searchBm25Of(docs).collect()
    assert(hits.size <= 10 && hits.nonEmpty)
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not weakly decreasing")
    assert(hits.forall(r => (1L to 3L).contains(r.getAs[Long]("n_terms_hit"))))
  }

  test("search_bm25: identical result under a different input layout") {
    val a = SearchQueries.searchBm25Of(docs).collect().toSeq
    val b = SearchQueries.searchBm25Of(docs.repartition(7)).collect().toSeq
    assert(a == b, "BM25 result depends on input partitioning")
  }

  test("dataset_shuffle_shard: shards partition the corpus; layout-independent") {
    val sh = SearchQueries.datasetShuffleShardOf(docs)
    val rows = sh.collect()
    assert(rows.map(_.getAs[Int]("shard")).toSeq == rows.map(_.getAs[Int]("shard")).toSeq.sorted)
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    val idSum = rows.map(_.getAs[Long]("id_sum")).sum
    assert(nTotal == docs.count())
    assert(idSum == docs.agg(sum("doc_id")).head.getLong(0))
    // permutation order is a pure function of doc_id — any layout, same epoch
    val again = SearchQueries.datasetShuffleShardOf(docs.repartition(5)).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
