package graft

import org.apache.spark.sql.functions._

/** Edge behavior of the training-data operators (TrainDataQueries): the
  * oracle gate covers the happy path at sf0.01; these pin the boundary
  * cases a web corpus actually contains. */
class TrainDataSpec extends SparkSpec {
  import spark.implicits._

  test("decontam: docs shorter than the gram width produce no grams, no rows, no errors") {
    val corpus = Seq((1L, "too short"), (2L, "a b c d"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val bench = Seq((99L, "one two three four five")).toDF("doc_id", "text")
    val got = TrainDataQueries.decontamOverlapOf(corpus, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 3 shares the 5-gram "one two three four five"; 1 and 2 are
    // sub-width and must simply vanish, not throw on sequence(1, <=0)
    assert(got == Map(3L -> 1L))
  }

  test("decontam: empty eval set contaminates nothing") {
    val corpus = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val bench = corpus.filter(lit(false))
    assert(TrainDataQueries.decontamOverlapOf(corpus, bench).count() == 0)
  }

  test("tfidf: a term in every doc gets idf ln(1)=0 and never outranks rarer terms") {
    val docs = Seq(
      (1L, "common rare1 common filler1"),
      (2L, "common rare2 common filler2"),
      (3L, "common rare3 common filler3")).toDF("doc_id", "text")
    val top = TrainDataQueries.tfidfTopkOf(docs)
      .filter(col("rk") === 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "common" has tf=2 but df=3 of 3 → score 0; the per-doc unique terms
    // (tf=1, idf ln 3) must win rank 1
    assert(top == Map(1L -> "filler1", 2L -> "filler2", 3L -> "filler3"),
      s"ubiquitous term must not rank first: $top")
  }

  test("pack_sequences: bins fill contiguously and token totals are conserved") {
    // 6 docs x 2000 tokens in one stream; a doc joins the bin its running
    // prefix STARTS in, so bin 0 takes docs starting at 0/2000/4000 (the
    // third straddles the 4096 boundary), bin 1 at 6000/8000, bin 2 at 10000
    val text = Seq.fill(2000)("tok").mkString(" ")
    val docs = (1L to 6L).map(i => (i, "en", text)).toDF("doc_id", "lang", "text")
    val bins = TrainDataQueries.packSequencesOf(docs)
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getLong(3)))).toMap
    assert(bins == Map(0L -> ((3L, 6000L)), 1L -> ((2L, 4000L)), 2L -> ((1L, 2000L))))
    assert(bins.values.map(_._2).sum == 12000L, "token totals conserved")
  }
}
