package graft

import org.apache.spark.sql.functions._

/** The native cdc_chunks expression must reproduce the HOF formulation it
  * replaced (transform/filter/nested-aggregate over code points) exactly —
  * the oracle hash already pins the corpus behavior; this pins edge cases
  * and the eval path directly. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  /** The original r08a higher-order-function formulation, kept here as the
    * semantic reference for the native expression. */
  private def hofChunks = {
    val c = col("c")
    val n = size(c)
    val bounds = array_distinct(concat(
      when(n >= 8,
        filter(sequence(lit(8), n), i =>
          aggregate(slice(c, i - 7, lit(8)), lit(0L),
            (acc, x) => acc * 31L + x) % 32L === 0L))
        .otherwise(array().cast("array<int>")),
      array(n)))
    (bounds, (b: org.apache.spark.sql.Column) =>
      transform(sequence(lit(1), size(b)), j => {
        val start = when(j === 1, lit(1)).otherwise(element_at(b, j - 1) + 1)
        val end = element_at(b, j)
        struct(
          aggregate(slice(c, start, end - start + 1), lit(0L),
            (acc, x) => (acc * 31L + x) % 1000000007L).as("fp"),
          (end - start + 1).cast("long").as("len"))
      }))
  }

  test("native expression ≡ the HOF formulation on varied texts") {
    // "" is tested separately below: the HOF reference itself had a latent
    // empty-string quirk (sequence(1, 0) DESCENDS, fabricating two phantom
    // code points) that the query's length>0 filter always masked — the
    // native form follows the oracle semantics (one (0, 0) chunk) instead.
    val texts = Seq(
      "a", "short", "exactly8",             // below/at the window width
      "the quick brown fox jumps over the lazy dog",
      ("x" * 200),                          // uniform — many equal windows
      (0 until 60).map(i => s"w$i").mkString(" "),
      "tabs\tand\nnewlines mixed in 1234567890 !@#")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
        graft.functions.CdcChunks(col("text")).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toSeq).toMap
    val (bounds, mk) = hofChunks
    val hof = df
      .select(col("doc_id"), expr(
        "transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))")
        .as("c"))
      .select(col("doc_id"), col("c"), bounds.as("b"))
      .select(col("doc_id"), mk(col("b")).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toSeq).toMap
    texts.indices.foreach { i =>
      assert(native(i.toLong).toString == hof(i.toLong).toString,
        s"divergence on text #$i: native=${native(i.toLong)} hof=${hof(i.toLong)}")
    }
    // empty string: one empty chunk, matching the oracle's range() semantics
    val empty = Seq((0L, "")).toDF("doc_id", "text")
      .select(graft.functions.CdcChunks(col("text")).as("ch"))
      .collect().head.getSeq[Any](0)
    assert(empty.toString == "ArraySeq([0,0])", s"empty-string chunks: $empty")
  }

  test("adversarial Unicode: surrogate pairs, combining marks, CJK — " +
      "native ≡ HOF code-point for code-point") {
    // the risk surface is code-point iteration: a UTF-16-code-unit walk
    // would split every surrogate pair (emoji) in two and shift every
    // boundary after it; both paths must agree on non-BMP content
    val texts = Seq(
      "emoji 😀😁 inside a sentence with enough text",
      "😀" * 12,                       // surrogate pairs only
      "café résumé naïve", // combining acute + precomposed
      "世界こんにちは世界" * 3, // CJK
      "mixed é世😀á ascii tail 1234567890",
      "ÅÅÅ ring marks", // A + combining ring
      ("🍕 pizza " * 8).trim)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
        graft.functions.CdcChunks(col("text")).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toSeq).toMap
    val (bounds, mk) = hofChunks
    val hof = df
      .select(col("doc_id"), expr(
        "transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))")
        .as("c"))
      .select(col("doc_id"), col("c"), bounds.as("b"))
      .select(col("doc_id"), mk(col("b")).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toSeq).toMap
    texts.indices.foreach { i =>
      assert(native(i.toLong).toString == hof(i.toLong).toString,
        s"unicode divergence on text #$i '${texts(i).take(20)}': " +
          s"native=${native(i.toLong)} hof=${hof(i.toLong)}")
    }
    // chunk lengths must still tile the CODE-POINT count (not the UTF-16
    // or UTF-8 length) — pins the unit the expression iterates in
    texts.indices.foreach { i =>
      val cp = texts(i).codePointCount(0, texts(i).length).toLong
      val total = native(i.toLong)
        .map(_.asInstanceOf[org.apache.spark.sql.Row].getLong(1)).sum
      assert(total == cp,
        s"text #$i: chunk lengths sum $total != code-point count $cp")
    }
  }

  test("chunk lengths tile the text and fingerprints are order-sensitive") {
    val rows = Seq((1L, "abcdefgh" * 10), (2L, "hgfedcba" * 10))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(graft.functions.CdcChunks(col("text"))).as("ch"))
      .select(col("doc_id"), col("ch.fp"), col("ch.len"))
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sum == 80, "chunk lengths must tile the text")
      assert(rs.forall(_.getLong(1) >= 0))
    }
    // reversed content must not produce the same fingerprint multiset
    assert(byDoc(1L).map(_.getLong(1)).sorted.toSeq !=
      byDoc(2L).map(_.getLong(1)).sorted.toSeq)
  }
}
