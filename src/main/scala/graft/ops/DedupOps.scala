package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document dedup family for training-data pipelines (SURVEY.md §2.11 N1):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard. Designed so nothing is ever
  * O(n²) in the corpus: candidate generation is always a hash/bucket join,
  * and only candidates pay the verification cost.
  */
object DedupOps {

  /** Normalized text for exact dedup: the generator plants near-dups by
    * appending `dup` tokens — strip them and collapse whitespace, the analog
    * of the reference's pre-insert key normalization (database.py:116-123).
    */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "\\bdup\\b", " "), "\\s+", " "))

  /** Distinct token-array of a document (order-preserving split). */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** Word k-shingles as strings: tokens joined with ''. */
  def shingles(c: Column, k: Int): Column = {
    val toks = tokens(c)
    // slide over indices 0 .. size-k
    filter(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => array_join(slice(toks, i + 1, lit(k)), "_")),
      s => s.isNotNull)
  }

  /** MinHash signature: for each of `h` hash functions, min over shingle
    * hashes of ((a_i * x + b_i) mod p). xxhash64 is the base row hash —
    * stable across executors and runs (SURVEY.md §7.4.3). */
  def minhashSignature(shingleArr: Column, h: Int): Column = {
    // Modulus small enough that (hash mod p) * a + b stays in a long under
    // ANSI overflow checks (Spark 4 default).
    val p = lit(1000000007L)
    val hashes = transform(shingleArr, s => pmod(xxhash64(s), p))
    val sig = (0 until h).map { i =>
      val a = lit(1000003L * (i + 1) + 12345L)
      val b = lit(7919L * (i + 1))
      array_min(transform(hashes, x => pmod(x * a + b, p)))
    }
    array(sig: _*)
  }

  /** LSH band keys: signature split into `bands` bands of `rows` each,
    * hashed; docs sharing any band key are candidates. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(array_join(
        transform(slice(sig, b * rows + 1, rows), _.cast("string")), ",")).as("bkey"))
    }: _*)

  /** 64-bit SimHash over tokens: sum ±1 per bit weighted by token hash. */
  def simhash(tokenArr: Column): Column = {
    val hashed = transform(tokenArr, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val votes = aggregate(hashed, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Exact-duplicate groups on normalized text: group key + members.
    * One shuffle on the (hashed) normalized text. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", normalizedText(col("text")))
      .groupBy("norm")
      .agg(min(col("doc_id")).as("group_id"),
        count(lit(1)).as("n_members"),
        sort_array(collect_list(col("doc_id"))).as("members"))
      .filter(col("n_members") > 1)

  /** MinHash near-dup candidate pairs with Jaccard estimate from signature
    * agreement. explode(bandKeys) → shuffle on band key → per-bucket pairs.
    */
  def minhashPairs(docs: DataFrame, h: Int, bands: Int): DataFrame = {
    val rows = h / bands
    val sigs = docs
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSignature(col("sh"), h).as("sig"))
    val keyed = sigs.select(col("doc_id"), col("sig"),
      explode(bandKeys(col("sig"), bands, rows)).as("bk"))
    val a = keyed.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("bk"))
    val b = keyed.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("bk"))
    a.join(b, Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / h)
      .select("doc_a", "doc_b", "est_jaccard")
  }
}
