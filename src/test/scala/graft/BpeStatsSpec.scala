package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The native bpe_stats expression must reproduce the HOF formulation it
  * replaced (filter/aggregate fold of char-split + padded double-replace
  * per word) exactly — the oracle hash pins the corpus behavior; this pins
  * edge cases, adversarial Unicode, and the eval path directly (the same
  * discipline as CdcChunksSpec for cdc_chunks). */
class BpeStatsSpec extends SparkSpec {
  import spark.implicits._

  /** The HOF semantic reference — CorpusQueries' own definition with the
    * spec's fixed merge list (shared, not copied, so spec and reference
    * cannot drift). */
  private def hofStats(df: DataFrame, merges: Seq[String]): DataFrame =
    CorpusQueries.bpeHofStatsOf(df, merges)

  private def nativeStats(df: DataFrame, merges: Seq[String]): DataFrame =
    df.select(col("doc_id"),
        graft.functions.BpeStats(lower(col("text")), merges).as("st"))
      .select(col("doc_id"), col("st.n_chars").as("n_chars"),
        col("st.n_tokens").as("n_tokens"))

  private def compare(texts: Seq[String], merges: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val n = nativeStats(df, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val h = hofStats(df, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    texts.indices.foreach { i =>
      assert(n(i.toLong) == h(i.toLong),
        s"divergence on text #$i '${texts(i).take(30)}': " +
          s"native=${n(i.toLong)} hof=${h(i.toLong)}")
    }
  }

  test("native ≡ HOF on varied texts and merge shapes") {
    val merges = Seq("t h", "th e", "a n") // chained merge (th+e) included
    compare(Seq(
      "the theme thesis anthem than",
      "a",                                   // single char
      "  leading and   trailing whitespace  ",
      "tabs\tand\nnewlinesmixed\fhere\rok",
      "hhhh thththth e",                     // alternating overlap chains
      "ananan anananan",                     // odd/even overlap repeats
      "UPPER Case MiXeD",                    // lower() upstream
      "punct,uation! and 1234 numbers",
      ("x" * 300) + " " + ("th" * 50)),      // long words
      merges)
  }

  test("adversarial Unicode: surrogate pairs, combining marks, CJK") {
    // the risk surface is code-point iteration (n_chars = Spark length();
    // char-split must not halve surrogate pairs) and multi-byte merge
    // patterns surviving the literal replace
    val merges = Seq("é s", "世 界", "😀 😀")
    compare(Seq(
      "emoji 😀😀😀 inside a sentence",
      "😀" * 7,
      "café résumé naïve és és",
      "世界こんにちは世界 世界",
      "mixed é世😀á ascii tail",
      "ÅÅÅ ring marks é combining"),
      merges)
  }

  test("degenerate inputs: empty/whitespace-only text, no merges") {
    compare(Seq("", "   ", "\t\n", "word"), Seq.empty)
    // empty text → (0, 0) on the native path (HOF agrees: empty ws array)
    val df = Seq((0L, "")).toDF("doc_id", "text")
    val r = nativeStats(df, Seq("a b")).collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("randomized fuzz: native ≡ HOF over 60 random corpora and merge lists") {
    // deterministic seed — reproducible failures; alphabet skews small so
    // merges actually fire, with unicode mixed in
    val rnd = new scala.util.Random(42)
    val alphabet = "aab bccd  e\tf😀世é'"
    def randWord(): String =
      (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 60).foreach { round =>
      val texts = (1 to (1 + rnd.nextInt(4)))
        .map(_ => (1 to (1 + rnd.nextInt(12))).map(_ => randWord()).mkString(" "))
      val merges = (1 to rnd.nextInt(4)).map { _ =>
        val a = alphabet(rnd.nextInt(alphabet.length))
        val b = alphabet(rnd.nextInt(alphabet.length))
        s"$a $b"
      }.filterNot(m => m.contains("  ") || m.startsWith(" ") || m.endsWith(" "))
      compare(texts, merges)
    }
  }

  test("full bpe_encode query: native registry entry ≡ HOF twin on sf0.001") {
    val docs = Tables.documents(spark, sfDir)
    val native = CorpusQueries.bpeEncodeOf(docs).collect()
    val hof = CorpusQueries.bpeEncodeHofOf(docs).collect()
    assert(native.length == hof.length && native.length > 0)
    native.zip(hof).foreach { case (a, b) =>
      assert(a == b, s"row divergence: native=$a hof=$b")
    }
  }
}
