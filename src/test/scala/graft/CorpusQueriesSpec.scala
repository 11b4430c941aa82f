package graft

import org.apache.spark.sql.functions._

/** Edge behavior of the round-4 corpus operators (CorpusQueries): the
  * oracle gate covers the happy path at sf0.01/sf0.1; these pin boundary
  * semantics a web corpus actually contains. */
class CorpusQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, toks: Seq[String]) = (id, toks.mkString(" "))

  test("chunk_dedup: a chunk shared across docs is a dup; a chunk repeated only within one doc is not") {
    val shared = (1 to 32).map(i => s"s$i")   // one full shared chunk
    val uniqueA = (1 to 32).map(i => s"a$i")
    val uniqueB = (1 to 32).map(i => s"b$i")
    val rep = (1 to 32).map(i => s"r$i")
    val docs = Seq(
      doc(1L, shared ++ uniqueA),
      doc(2L, shared ++ uniqueB),
      doc(3L, rep ++ rep) // same chunk twice WITHIN one doc only
    ).toDF("doc_id", "text")
    val got = CorpusQueries.chunkDedupOf(docs, 32)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1/2: 2 chunks each, exactly the shared one is a dup; doc 3's
    // within-doc repeat spans one distinct doc → NOT a cross-doc dup
    assert(got == Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 0L))), s"$got")
  }

  test("chunk_dedup: trailing partial chunk participates like any other") {
    val docs = Seq(
      doc(1L, (1 to 40).map(i => s"t$i")),   // chunk2 = t33..t40 (8 toks)
      doc(2L, (33 to 40).map(i => s"t$i"))   // exactly that partial chunk
    ).toDF("doc_id", "text")
    val got = CorpusQueries.chunkDedupOf(docs, 32)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L), s"partial tail chunk must dedup: $got")
  }

  test("chunk_dedup_rewrite semantics: drop shared chunks, keep order, report counts") {
    val shared = (1 to 32).map(i => s"s$i")
    val a1 = (1 to 32).map(i => s"a$i"); val a2 = (1 to 32).map(i => s"b$i")
    val docs = Seq(
      doc(1L, a1 ++ shared ++ a2),   // middle chunk shared -> a1 + a2 survive in order
      doc(2L, shared)                // entirely shared -> clean_text empty
    ).toDF("doc_id", "text")
    // reuse the registered query's logic through a temp view is overkill;
    // assert through the registered query builder on a temp dir is not
    // possible here, so mirror the op inline via the public query at the
    // registry level (engine behavior already oracle-checked); this test
    // pins ORDER preservation using the library expression directly
    docs.createOrReplaceTempView("chunk_rw_in")
    val t = split(lower(col("text")), "\\s+")
    val chunkArr = transform(sequence(lit(0L), ceil(size(t) / 32.0).cast("long") - 1),
      i => array_join(slice(t, (i * 32).cast("int") + 1, lit(32)), " "))
    val ch = docs.select(col("doc_id"), posexplode(chunkArr).as(Seq("pos", "chunk")))
    val occ = ch.groupBy("chunk").agg(countDistinct(col("doc_id")).as("nd"))
    val out = ch.join(occ, "chunk").groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(
        when(col("nd") === 1, struct(col("pos"), col("chunk"))))),
        s => s.getField("chunk")), " ").as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == (a1 ++ a2).mkString(" "), s"order must be preserved: ${out(1L)}")
    assert(out(2L) == "", "fully-duplicated doc rewrites to empty")
  }

  test("lm_bigram_score: hand-computed conditional probabilities") {
    // c("a b")=1, c("a c")=1, c1("a")=2 → P(b|a)=P(c|a)=0.5
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = CorpusQueries.lmBigramScoreOf(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(1L -> ((1L, expected)), 2L -> ((1L, expected))), s"$got")
  }

  test("lm_bigram_score: single-token docs vanish instead of erroring") {
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val ids = CorpusQueries.lmBigramScoreOf(docs).collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }

  test("canonicalUrl: host case, default ports, fragments, tracking params, trailing slashes") {
    val cases = Seq(
      "HTTPS://WWW.Ex.COM:443/Jobs/5?utm_source=x&id=7#frag" ->
        "https://www.ex.com/Jobs/5?id=7",
      "http://Ex.com:80/a/b/" -> "http://ex.com/a/b",
      "https://ex.com:8443/x?ref=1&utm_a=2" -> "https://ex.com:8443/x",
      "https://ex.com/" -> "https://ex.com/",
      "https://ex.com" -> "https://ex.com/",
      "https://ex.com/p?fbclid=abc&q=1&utm_" -> "https://ex.com/p?q=1&utm_")
    val got = cases.map(_._1).toDF("url")
      .select(CorpusQueries.canonicalUrl(col("url"))).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonical($in) = $g, want $want")
    }
  }

  test("sample_temperature weights: flatter than shares, normalized, order-preserving") {
    val out = Queries.byName("sample_temperature").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    val wsum = out.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights must normalize: $wsum")
    // temperature flattening: every minority source (share < mean share)
    // gains weight share; majority sources lose
    val meanShare = 1.0 / out.length
    out.foreach { case (src, share, w) =>
      if (share < meanShare * 0.9)
        assert(w > share, s"$src: minority source must be upweighted ($share -> $w)")
      if (share > meanShare * 1.1)
        assert(w < share, s"$src: majority source must be downweighted ($share -> $w)")
    }
  }

  test("bpe_merge_topk: pair counts weight by word frequency; 1-char words contribute nothing") {
    // corpus: "ab ab ab cd x" -> vocab {ab:3, cd:1, x:1}
    // pairs: "ab"×3, "cd"×1; "x" has no adjacent pair
    val docs = Seq((1L, "ab ab ab cd x")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("bpe_in")
    val words = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val pairs = when(length(col("w")) >= 2,
      transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    val got = words.select(col("freq"), explode(pairs).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 3L, "cd" -> 1L), s"$got")
  }

  test("bpe_train_n merge rewrite: padded double replace = greedy left-to-right") {
    // one replace pass misses every other occurrence when consecutive pairs
    // share a delimiter space; the second pass catches the isolated rest
    def merge(s: String, pr: String): String = {
      val m = " " + pr.replace(" ", "") + " "
      (" " + s + " ").replace(" " + pr + " ", m).replace(" " + pr + " ", m).trim
    }
    assert(merge("a b a b", "a b") == "ab ab")       // shared-boundary chain
    assert(merge("a b a b a b", "a b") == "ab ab ab")
    assert(merge("a a a", "a a") == "aa a")          // greedy, non-overlapping
    assert(merge("a a a a", "a a") == "aa aa")
    assert(merge("x a b y", "a b") == "x ab y")      // interior occurrence
    assert(merge("xa b", "a b") == "xa b")           // no partial-symbol match
    assert(merge("ab", "a b") == "ab")               // already merged: no-op
  }

  test("bpe_train_n: three rounds, counts non-increasing, later pairs reuse merges") {
    val out = Queries.byName("bpe_train_n").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // a later round can never beat an earlier round's count: the earlier
    // argmax was the global max and merging only removes pair occurrences
    assert(out.sliding(2).forall { case Array(a, b) => b._3 <= a._3 },
      s"counts must be non-increasing across rounds: $out")
    out.foreach { case (_, pr, _) =>
      assert(pr.split(" ").length == 2, s"pair must be two symbols: '$pr'") }
  }

  test("length_histogram buckets are exact at power-of-two boundaries") {
    val got = Seq(31, 32, 33).map { n =>
      spark.range(1).select(length(bin(lit(n.toLong)))).as[Int].collect().head
    }
    assert(got == Seq(5, 6, 6), s"floor(log2)+1 via bin length: $got")
  }

  test("lm_bigram_score: empty corpus yields empty result, no error") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusQueries.lmBigramScoreOf(docs).count() == 0)
  }

  test("chunk_dedup: empty corpus and chunk width larger than every doc") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusQueries.chunkDedupOf(empty, 32).count() == 0)
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    // whole doc = one partial chunk; identical docs still dedup
    val got = CorpusQueries.chunkDedupOf(tiny, 32)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L), s"$got")
  }

  test("canonicalUrl: non-matching garbage stays harmless (no crash, stable output)") {
    val got = Seq("not a url", "ftp://weird:99x/", "").toDF("url")
      .select(CorpusQueries.canonicalUrl(col("url"))).as[String].collect()
    assert(got.length == 3) // canonicalization of garbage is defined, never throws
  }

  test("embedding_norms: zero vector yields l2=0, not NaN") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("label", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, 0, Seq.fill(4)(0.0f))),
      schema)
    df.createOrReplaceTempView("zero_vec")
    val l2 = df.select(
      round(sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))), 6)).collect().head.getDouble(0)
    assert(l2 == 0.0)
  }
}
