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
      val head = r.getAs[String]("postings_head") match {
        case "" => Seq.empty[Long]
        case s  => s.split(",").toSeq.map(_.toLong)
      }
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

  test("index_merge_delta: incremental merge equals the full rebuild") {
    val merged = SearchQueries.indexMergeDeltaOf(docs).collect().map(_.toSeq).toSeq
    val rebuilt = SearchQueries.indexPostingsOf(docs).collect().map(_.toSeq).toSeq
    assert(merged == rebuilt, "merged base+delta index diverges from full rebuild")
  }

  test("search_phrase: reported docs really contain the adjacent phrase") {
    val hits = SearchQueries.searchPhraseOf(docs).collect()
    assert(hits.nonEmpty)
    assert(hits.forall(_.getAs[Long]("n_occurrences") > 0))
    val ids = hits.map(_.getAs[Long]("doc_id")).toSet
    val withPhrase = docs
      .filter(lower(col("text")).contains("spark join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == withPhrase, "positional-join hit set != substring hit set")
  }

  test("search_bm25_batch: per-query top-3, ranks dense, scores decreasing") {
    val rows = SearchQueries.searchBm25BatchOf(docs).collect()
    val byQ = rows.groupBy(_.getAs[String]("query_id"))
    assert(byQ.keySet == Set("q1", "q2", "q3"))
    byQ.values.foreach { qs =>
      val sorted = qs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to sorted.size))
      val sc = sorted.map(_.getAs[Double]("score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
  }

  test("search_snippet: window is clamped, contains the term, ≤7 tokens") {
    val snips = SearchQueries.searchSnippetOf(docs).collect()
    assert(snips.nonEmpty)
    snips.foreach { r =>
      val toks = r.getAs[String]("snippet").split(" ")
      assert(toks.length <= 7, s"window too wide: ${toks.length}")
      assert(toks.contains("spark"), "snippet must contain the hit term")
    }
  }

  test("search_cooccur: shares bounded by 1; seed term excluded") {
    val rows = SearchQueries.searchCooccurOf(docs).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getAs[String]("term") != "spark"))
    assert(rows.forall { r =>
      val s = r.getAs[Double]("share"); s > 0.0 && s <= 1.0
    })
  }

  test("search_autocomplete: every completion extends its prefix; ranks dense per prefix") {
    val rows = SearchQueries.searchAutocompleteOf(docs).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[String]("term").startsWith(r.getAs[String]("prefix"))))
    rows.groupBy(_.getAs[String]("prefix")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to g.size))
    }
  }

  test("edge cases: empty corpus and degenerate docs neither crash nor corrupt") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SearchQueries.indexPostingsOf(empty).count() == 0)
    assert(SearchQueries.searchBm25Of(empty).count() == 0)
    assert(SearchQueries.searchPhraseOf(empty).count() == 0)
    assert(SearchQueries.datasetShuffleShardOf(empty).count() == 0)

    // one doc, one repeated token: df=1, cf=n, phrase of distinct terms absent
    val mono = Seq((7L, "spark spark spark")).toDF("doc_id", "text")
    val idx = SearchQueries.indexPostingsOf(mono).collect()
    assert(idx.length == 1 &&
      idx.head.getAs[Long]("df") == 1 && idx.head.getAs[Long]("cf") == 3)
    assert(SearchQueries.searchPhraseOf(mono).count() == 0)
    // bm25 still scores the single doc on its one matching term
    val hit = SearchQueries.searchBm25Of(mono).collect()
    assert(hit.length == 1 && hit.head.getAs[Long]("n_terms_hit") == 1)
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
