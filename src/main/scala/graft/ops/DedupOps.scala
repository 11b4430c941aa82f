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

  /** Word k-shingles as strings joined with '_'. Built from k shifted
    * copies of the token array zipped together - O(n) per document. (The
    * obvious per-position slice+join is O(n*k) array copies and measured 5x
    * slower than the rest of the MinHash pipeline combined.) */
  def shingles(c: Column, k: Int): Column = {
    val toks = tokens(c)
    val joined = (1 until k).foldLeft(toks) { (acc, off) =>
      val shifted = slice(toks, lit(off + 1), greatest(size(toks) - off, lit(0)))
      zip_with(acc, shifted, (a, b) =>
        when(a.isNotNull && b.isNotNull, concat(a, lit("_"), b)))
    }
    filter(joined, s => s.isNotNull)
  }

  // Modulus small enough that (hash mod p) * a + b stays in a long under
  // ANSI overflow checks (Spark 4 default).
  private val P = 1000000007L

  /** Base hashes of an array of shingles: pmod(xxhash64(s), p) — xxhash64 is
    * stable across executors and runs (SURVEY.md §7.4.3). */
  def shingleHashes(shingleArr: Column): Column =
    transform(shingleArr, s => pmod(xxhash64(s), lit(P)))

  /** MinHash signature: for each of `h` hash functions, min over shingle
    * hashes of ((a_i * x + b_i) mod p). ONE fold over the hash array keeps
    * the whole signature a single pass (h separate array_min(transform(...))
    * expressions would re-evaluate the hash array h times after Catalyst's
    * projection collapse — 10× slower, measured). */
  def minhashSignature(hashArr: Column, h: Int): Column = {
    val params = array((0 until h).map { i =>
      struct(lit(1000003L * (i + 1) + 12345L).as("a"),
        lit(7919L * (i + 1)).as("b"))
    }: _*)
    aggregate(hashArr, array_repeat(lit(P), h),
      (acc, x) => zip_with(acc, params,
        (m, pr) => least(m, pmod(x * pr.getField("a") + pr.getField("b"), lit(P)))))
  }

  /** LSH band keys: signature split into `bands` bands of `rows` each,
    * hashed; docs sharing any band key are candidates. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(array_join(
        transform(slice(sig, b * rows + 1, rows), _.cast("string")), ",")).as("bkey"))
    }: _*)

  /** 64-bit SimHash over tokens: per-bit ±1 votes weighted by token hash.
    * Single fold with a 64-wide vote vector (64 independent aggregates would
    * re-tokenize and re-hash 64 times after projection collapse). */
  def simhash(tokenArr: Column): Column = {
    val masks = array((0 until 64).map(j => lit(1L << j)): _*)
    val hashed = transform(tokenArr, t => xxhash64(t))
    val votes = aggregate(hashed, array_repeat(lit(0), 64),
      (acc, x) => zip_with(acc, masks,
        (v, m) => v + when(x.bitwiseAND(m) =!= 0L, 1).otherwise(-1)))
    aggregate(zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Exact-duplicate groups on normalized text: group key + members.
    * One shuffle on the (hashed) normalized text. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", normalizedText(col("text")))
      .groupBy("norm")
      .agg(min(col("doc_id")).as("group_id"),
        count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("members"))
      .filter(col("n_members") > 1)

  /** Connected components over an undirected pair list (doc_a, doc_b) —
    * groups near-dup PAIRS into dedup CLUSTERS (the step that picks one
    * canonical doc per duplicate family). Min-label propagation: every node
    * starts as its own label; each round adopts the minimum label among
    * neighbors; iterate to fixpoint. Rounds needed = graph diameter —
    * near-dup clusters are dense and shallow, so `maxIter` ~10 is plenty;
    * each round is one shuffle on the node id. Deterministic (min is
    * order-independent). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("node"))
        .groupBy(col("src").as("node2"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels
        .join(neighborMin, col("node") === col("node2"), "left_outer")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      i += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** MinHash near-dup candidate pairs with Jaccard estimate from signature
    * agreement. explode(bandKeys) → shuffle on band key → per-bucket pairs.
    */
  def minhashPairs(docs: DataFrame, h: Int, bands: Int): DataFrame = {
    val rows = h / bands
    // localCheckpoint: the band self-join is a diamond DAG — without it both
    // join sides re-execute the whole shingle+hash+signature subtree.
    val sigs = docs
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSignature(shingleHashes(col("sh")), h).as("sig"))
      .localCheckpoint()
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
