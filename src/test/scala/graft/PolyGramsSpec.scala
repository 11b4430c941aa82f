package graft

import org.apache.spark.sql.functions._

/** poly_grams must equal the HOF formulation it replaced in
  * dedup_substring_spans (k=8) and doc_winnowing (k=3). */
class PolyGramsSpec extends SparkSpec {
  import spark.implicits._

  test("native poly_grams ≡ the HOF transform/aggregate/slice form") {
    val docs = Seq(
      (1L, Seq.empty[Long]),
      (2L, Seq(5L)),
      (3L, (1L to 7L).toSeq),          // below k=8
      (4L, (1L to 8L).toSeq),          // exactly k
      (5L, (1L to 40L).map(i => i * 37 + 100).toSeq),
      (6L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    ).toDF("doc_id", "h")
    for (k <- Seq(3, 8)) {
      val hof = docs.select(col("doc_id"),
        when(size(col("h")) >= k,
          transform(sequence(lit(1), size(col("h")) - (k - 1)),
            i => aggregate(slice(col("h"), i, lit(k)), lit(0L),
              (acc, x) => acc * 31L + x)))
          .otherwise(array().cast("array<bigint>")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      val native = docs.select(col("doc_id"),
        graft.functions.PolyGrams(col("h"), k).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      (1L to 6L).foreach { id =>
        assert(native(id) == hof(id),
          s"k=$k doc $id: native=${native(id)} hof=${hof(id)}")
      }
    }
  }

  test("extreme magnitudes: Horner wraps with java long semantics on " +
      "Long.Min/Max (the ANSI HOF would THROW here — callers keep " +
      "magnitudes < 2^47 so neither path overflows in queries)") {
    val rng = new scala.util.Random(42)
    def ref(h: Seq[Long], k: Int): Seq[Long] =
      if (h.size < k) Seq.empty
      else (0 to h.size - k).map(i =>
        h.slice(i, i + k).foldLeft(0L)((a, x) => a * 31L + x))
    val docs = (1L to 20L).map { id =>
      val n = rng.nextInt(30)
      (id, Seq.fill(n)(rng.nextLong()) ++
        (if (n > 2) Seq(Long.MinValue, Long.MaxValue) else Nil))
    }
    val native = docs.toDF("doc_id", "h").select(col("doc_id"),
      graft.functions.PolyGrams(col("h"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    docs.foreach { case (id, h) =>
      assert(native(id) == ref(h, 3), s"doc $id")
    }
  }

  test("null array element fails loudly (never a silent 0-hash)") {
    val df = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L))).toDF("h")
    val t = scala.util.Try(
      df.select(graft.functions.PolyGrams(col("h"), 2)).collect())
    assert(t.isFailure)
    var c: Throwable = t.failed.get
    while (c.getCause != null && !c.getMessage.contains("poly_grams"))
      c = c.getCause
    assert(c.getMessage.contains("null array element"), s"got: $c")
  }

  test("SQL registration: poly_grams callable from spark.sql") {
    val r = spark.sql(
      "SELECT poly_grams(array(1L, 2L, 3L, 4L), 3) AS g").collect().head
    assert(r.getSeq[Long](0) == Seq((1 * 31 + 2) * 31 + 3,
      (2 * 31 + 3) * 31 + 4).map(_.toLong))
  }
}
