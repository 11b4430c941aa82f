package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, VectorOps}

/** SURVEY.md §2.11 + the training-data-pipeline pack: dedup (exact, MinHash,
  * SimHash, n-gram Jaccard, embedding cosine), similarity search (brute +
  * LSH), text analysis (token stats, language id, quality score,
  * fingerprint), multimodal binary plumbing.
  *
  * Oracle policy: algorithm-specific hashes (MinHash/SimHash/LSH) are NOT
  * DuckDB-reproducible → rows-only checks + property tests (SURVEY.md
  * §7.4.5); everything else has an exact oracle.
  */
object NorthStarQueries {
  import Tables._
  import Det._

  // ---- N1 dedup: exact -----------------------------------------------------

  private def dedupExact(s: SparkSession, d: String): DataFrame =
    DedupOps.exactGroups(documents(s, d))
      .select("group_id", "n_members", "members")
      .orderBy("group_id")

  private val dedupExactSql =
    """SELECT min(doc_id) AS group_id, count(*) AS n_members,
      |       array_to_string(list_sort(list(doc_id)), ',') AS members
      |FROM documents
      |GROUP BY trim(regexp_replace(regexp_replace(text, '\bdup\b', ' ', 'g'), '\s+', ' ', 'g'))
      |HAVING count(*) > 1
      |ORDER BY group_id""".stripMargin

  // ---- N1 dedup: MinHash + LSH (rows-only; property-tested) ---------------

  /** h=32/bands=8 (rows=4): with the independent splitmix64 family (r11)
    * the est is binomial (σ = √(J(1−J)/32) ≈ 0.09), so est ≥ 0.5 on a
    * true-J ≤ 0.15 pair is a ≥ 4σ event (P ≈ 1e-6) — negligible even
    * against the ~1e6 mid-J candidate pairs the sf1 corpus produces.
    * h=16 could not make that separation (P(Binom(16,.125) ≥ 8) ≈ 3e-4
    * → dozens of weak emissions at sf1), independent family or not. */
  private def dedupMinhash(s: SparkSession, d: String): DataFrame =
    DedupOps.minhashPairs(fanOut(documents(s, d)), h = 32, bands = 8)
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")

  // ---- N1 dedup: SimHash (rows-only; property-tested) ----------------------

  /** 64-bit SimHash; candidates share one of four 16-bit chunks (hamming ≤ 3
    * per pigeonhole when distance ≤ 3 overall); verified by bit_count(xor). */
  private def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint: the chunk self-join would otherwise recompute the
    // 64-bit vote fold for both sides
    val sigs = fanOut(documents(s, d))
      .select(col("doc_id"), DedupOps.simhash(DedupOps.tokens(col("text"))).as("sig"))
      .localCheckpoint(false)
    val chunked = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("sig"), i * 16).bitwiseAND(0xFFFF).as("ckey"))): _*)).as("ck"))
    val a = chunked.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("ck"))
    val b = chunked.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("ck"))
    a.join(b, Seq("ck"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 12)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** `dedup_simhash_scaled`: the corpus-scale form of [[dedupSimhash]] —
    * Manku block-combination candidate tables ([[DedupOps.simhashComboKeys]]:
    * C(6,3) = 20 tables keyed on ~32-bit 3-block concatenations) instead of
    * 4 frozen 16-bit chunks. Both are lossless for Hamming ≤ 3; the chunk
    * scheme's bucket space is FROZEN at 2^16 per band so its candidates
    * grow n²/2^16 (measured structurally quadratic at zipf sf10, 14.8× for
    * 10× data — SF1.md), while the combination keys push the collision
    * denominator to 2^32. Contract difference from the display form: this
    * emits the h ≤ 3 near-dup pairs (the regime the tables are lossless
    * for) rather than the chunk-lucky h ≤ 12 list — the Manku semantics. */
  private def dedupSimhashScaled(s: SparkSession, d: String): DataFrame = {
    val sigs = fanOut(documents(s, d))
      .select(col("doc_id"),
        DedupOps.simhash(DedupOps.tokens(col("text"))).as("sig"))
      .localCheckpoint(false)
    val keyed = sigs.select(col("doc_id"), col("sig"),
      explode(DedupOps.simhashComboKeys(col("sig"))).as("ck"))
    val a = keyed.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("ck"))
    val b = keyed.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("ck"))
    a.join(b, Seq("ck"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** `dedup_simhash_auto`: the PRODUCTION simhash near-dup entry —
    * [[DedupOps.simhashNearDupPairs]] dispatches chunk tables vs Manku
    * combination tables on the observed corpus size (r12 verdict #3; the
    * `dedup_simhash` / `dedup_simhash_scaled` keys stay as the measured
    * contrast pair). Output is the h ≤ 3 pair set — identical on both
    * dispatch paths, spec-proven across the threshold. */
  private def dedupSimhashAuto(s: SparkSession, d: String): DataFrame =
    DedupOps.simhashNearDupPairs(fanOut(documents(s, d)))
      .orderBy("doc_a", "doc_b")

  /** Pigeonhole bound for the auto form: same exhaustive-family recipe as
    * [[dedupSimhashScaledBound]], against whichever candidate scheme the
    * size dispatch picks at the gate's scale. */
  private def dedupSimhashAutoBound(s: SparkSession, d: String): DataFrame = {
    val famSigs = fanOut(documents(s, d)
      .filter(regexp_like(col("text"), lit("\\bdup\\b"))))
      .select(col("doc_id"),
        DedupOps.simhash(DedupOps.tokens(col("text"))).as("sig"))
      .localCheckpoint(false)
    val close = famSigs.as("a")
      .join(famSigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .localCheckpoint(false)
    val emitted = dedupSimhashAuto(s, d).select("doc_a", "doc_b")
    val nFam = famSigs.agg(count(lit(1)).as("n_family_docs"))
    val nClose = close.agg(count(lit(1)).as("n_close"))
    val missed = close.select("doc_a", "doc_b")
      .join(emitted, Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    nFam.crossJoin(nClose).crossJoin(missed)
      .select(col("n_family_docs"), (col("n_close") > 0).as("has_close_pairs"),
        (col("n_missed") === 0).as("pigeonhole_ok"))
  }

  /** Pigeonhole bound for the scaled form: over the bounded planted
    * family, every h ≤ 3 pair (exhaustive family² reference) must appear
    * in the combination-table emission — the same recipe as
    * [[dedupSimhashBound]], against the 20-table candidate generator. */
  private def dedupSimhashScaledBound(s: SparkSession, d: String): DataFrame = {
    val famSigs = fanOut(documents(s, d)
      .filter(regexp_like(col("text"), lit("\\bdup\\b"))))
      .select(col("doc_id"),
        DedupOps.simhash(DedupOps.tokens(col("text"))).as("sig"))
      .localCheckpoint(false)
    val close = famSigs.as("a")
      .join(famSigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .localCheckpoint(false)
    val emitted = dedupSimhashScaled(s, d).select("doc_a", "doc_b")
    val nFam = famSigs.agg(count(lit(1)).as("n_family_docs"))
    val nClose = close.agg(count(lit(1)).as("n_close"))
    val missed = close.select("doc_a", "doc_b")
      .join(emitted, Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    nFam.crossJoin(nClose).crossJoin(missed)
      .select(col("n_family_docs"), (col("n_close") > 0).as("has_close_pairs"),
        (col("n_missed") === 0).as("pigeonhole_ok"))
  }

  private val dedupSimhashScaledBoundSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_family_docs,
      |       TRUE AS has_close_pairs, TRUE AS pigeonhole_ok
      |FROM documents WHERE regexp_matches(text, '\bdup\b')""".stripMargin

  // ---- N1 dedup: exact n-gram (token-set) Jaccard --------------------------

  /** Sketch-dedup bound oracles (`dedup_minhash_bound`,
    * `dedup_simhash_bound`): the signatures are engine-specific, but the
    * guarantees they exist for are not, and DuckDB can assert those as
    * booleans beside SQL-reproducible counts (the r08 bound-oracle recipe
    * that closed the ANN/sketch blind spot):
    *
    *  - minhash RECALL: every planted-family pair with exact 3-gram
    *    Jaccard ≥ 0.9 must surface in `dedup_minhash`'s emitted pairs
    *    (banding at 32 hashes/8 bands of 4 rows has collision prob
    *    1−(1−t⁴)⁸ ≈ 1−2e-4 at t = 0.9, and the est filter at 0.5 sits
    *    > 4σ below 0.9 at σ = √(t(1−t)/32) ≈ 0.09); and PRECISION floor:
    *    every emitted pair's TRUE 3-gram Jaccard ≥ 0.15 (needs ≥ 16/32
    *    agreements — a ≥ 4σ, P ≈ 1e-6 event at t ≤ 0.15, negligible
    *    against the ~1e6 mid-J candidates the sf1 corpus produces).
    *    Both floors require the r11 INDEPENDENT splitmix64 hash family:
    *    the old affine-of-one-base-hash family had correlated agreement
    *    events whose est variance let J ≈ 0.01 pairs reach est 0.5 (18%
    *    of sf1 emissions were below the precision floor).
    *  - simhash PIGEONHOLE: a 64-bit pair within hamming ≤ 3 differs in
    *    at most 3 of 4 16-bit chunks, so the chunk join CANNOT miss it —
    *    checked exhaustively over the bounded planted family, plus the
    *    non-vacuity witness (the family's planted exact dups hash to
    *    identical signatures, so close pairs exist).
    *
    * Exact references compute in-plan over the BOUNDED family (all-pairs
    * there is family², never corpus²); the corpus-scale candidates come
    * from the banded/chunked operators under test. */
  private def dedupMinhashBound(s: SparkSession, d: String): DataFrame = {
    val fam = documents(s, d)
      .filter(regexp_like(col("text"), lit("\\bdup\\b")))
    val g = fam.select(col("doc_id"),
      array_distinct(graft.TrainDataQueries.gramsOf(col("text"), 3)).as("gs"))
      .localCheckpoint(false)
    val exact = g.as("a")
      .join(g.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.gs"), col("b.gs"))).cast("long").as("i"),
        (size(col("a.gs")) + size(col("b.gs"))).cast("long").as("ab"))
      // cross-multiplied exact threshold (i/(ab−i) ≥ 0.9 ⟺ 10·i ≥
      // 9·(ab−i)) — integer-exact, matching the oracle's form (r10)
      .filter(col("i") * 10 >= (col("ab") - col("i")) * 9)
      .select("doc_a", "doc_b")
      .localCheckpoint(false)
    val emitted = DedupOps
      .minhashPairs(fanOut(documents(s, d)), h = 32, bands = 8)
      .filter(col("est_jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .localCheckpoint(false)
    val gAll = documents(s, d).select(col("doc_id"),
      array_distinct(graft.TrainDataQueries.gramsOf(col("text"), 3)).as("gs"))
    val emittedTrueJ = emitted
      .join(gAll.select(col("doc_id").as("doc_a"), col("gs").as("ga")), "doc_a")
      .join(gAll.select(col("doc_id").as("doc_b"), col("gs").as("gb")), "doc_b")
      .select((size(array_intersect(col("ga"), col("gb"))).cast("double") /
        (size(col("ga")) + size(col("gb")) -
          size(array_intersect(col("ga"), col("gb"))))).as("j"))
    val nFam = fam.agg(count(lit(1)).as("n_family_docs"))
    val nExact = exact.agg(count(lit(1)).as("n_exact_pairs"))
    val missed = exact.join(emitted, Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    val weak = emittedTrueJ.agg(
      count(when(col("j") < 0.15, lit(1))).as("n_weak"))
    nFam.crossJoin(nExact).crossJoin(missed).crossJoin(weak)
      .select(col("n_family_docs"), col("n_exact_pairs"),
        (col("n_missed") === 0).as("recall_ok"),
        (col("n_weak") === 0).as("precision_ok"))
  }

  private val dedupMinhashBoundSql =
    """WITH fam AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE regexp_matches(text, '\bdup\b')),
      |t AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM fam),
      |g AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> array_to_string(t[i:i+2], ' '))) AS gs
      |  FROM t),
      |exact AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.gs, b.gs)) * 10
      |        >= (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) * 9)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM fam) AS n_family_docs,
      |       CAST(count(*) AS BIGINT) AS n_exact_pairs,
      |       TRUE AS recall_ok, TRUE AS precision_ok
      |FROM exact""".stripMargin

  private def dedupSimhashBound(s: SparkSession, d: String): DataFrame = {
    val famSigs = fanOut(documents(s, d)
      .filter(regexp_like(col("text"), lit("\\bdup\\b"))))
      .select(col("doc_id"),
        DedupOps.simhash(DedupOps.tokens(col("text"))).as("sig"))
      .localCheckpoint(false)
    val close = famSigs.as("a")
      .join(famSigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .localCheckpoint(false)
    val emitted = dedupSimhash(s, d).select("doc_a", "doc_b")
    val nFam = famSigs.agg(count(lit(1)).as("n_family_docs"))
    val nClose = close.agg(count(lit(1)).as("n_close"))
    val missed = close.select("doc_a", "doc_b")
      .join(emitted, Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    nFam.crossJoin(nClose).crossJoin(missed)
      .select(col("n_family_docs"), (col("n_close") > 0).as("has_close_pairs"),
        (col("n_missed") === 0).as("pigeonhole_ok"))
  }

  private val dedupSimhashBoundSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_family_docs,
      |       TRUE AS has_close_pairs, TRUE AS pigeonhole_ok
      |FROM documents WHERE regexp_matches(text, '\bdup\b')""".stripMargin

  /** Exact Jaccard over distinct token sets, restricted to the planted
    * near-dup family (docs containing `dup`) so candidates stay bounded;
    * the general-scale path is dedup_minhash. The 25-doc family shares its
    * whole 31-token vocabulary by construction, so the df cut is set above
    * the family size (a cut would have to drop every token); the hot-token
    * guard itself is exercised in DedupOpsSpec on a realistic corpus. */
  private def dedupJaccard(s: SparkSession, d: String): DataFrame =
    DedupOps.jaccardPairs(
      fanOut(documents(s, d).filter(regexp_like(col("text"), lit("\\bdup\\b")))),
      maxDf = Long.MaxValue, minJaccard = 0.8)
      .orderBy("doc_a", "doc_b")

  /** `dedup_prefix_jaccard`: the PPJoin prefix-filter candidate cut
    * ([[DedupOps.prefixJaccardPairs]]) — same output contract as the full
    * inverted-index join (the cut is provably lossless at t = 0.8, unlike
    * the df-cut heuristic), posting lists shrunk to each doc's rare fifth.
    * The oracle replays prefix selection + verify; OpProps additionally
    * asserts row-equality with [[dedupJaccard]]'s full-index form. */
  private def dedupPrefixJaccard(s: SparkSession, d: String): DataFrame =
    DedupOps.prefixJaccardPairs(
      fanOut(documents(s, d).filter(regexp_like(col("text"), lit("\\bdup\\b")))), 0.8)
      .orderBy("doc_a", "doc_b")

  private val dedupPrefixJaccardSql =
    """WITH dup_docs AS (
      |  SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |ranked AS (
      |  SELECT t.doc_id, t.tok,
      |         row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS r,
      |         s.sz
      |  FROM toks t JOIN dfreq d USING (tok) JOIN sizes s USING (doc_id)),
      |prefix AS (SELECT doc_id, tok FROM ranked
      |           WHERE r <= sz - (sz * 4 + 4) // 5 + 1),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM prefix x JOIN prefix y ON x.tok = y.tok AND x.doc_id < y.doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n
      |  FROM cand c
      |  JOIN toks a ON a.doc_id = c.doc_a
      |  JOIN toks b ON b.doc_id = c.doc_b AND b.tok = a.tok
      |  GROUP BY 1, 2)
      |SELECT i.doc_a, i.doc_b,
      |       round(CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n), 6) AS jaccard
      |FROM inter i
      |JOIN sizes sa ON sa.doc_id = i.doc_a
      |JOIN sizes sb ON sb.doc_id = i.doc_b
      |WHERE i.n * 5 >= (sa.sz + sb.sz - i.n) * 4
      |ORDER BY doc_a, doc_b""".stripMargin

  /** `dedup_containment`: directed containment C(src→dst) = |src∩dst|/|src|
    * over the same planted near-dup family ([[DedupOps.containmentPairs]]) —
    * the asymmetric complement of dedup_ngram_jaccard that flags a short doc
    * subsumed by a longer one even when the size gap kills the Jaccard. */
  private def dedupContainment(s: SparkSession, d: String): DataFrame =
    DedupOps.containmentPairs(
      fanOut(documents(s, d).filter(regexp_like(col("text"), lit("\\bdup\\b")))),
      minContainment = 0.9)
      .orderBy("src_doc", "dst_doc")

  private val dedupContainmentSql =
    """WITH dup_docs AS (
      |  SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |inter AS (
      |  SELECT x.doc_id AS src_doc, y.doc_id AS dst_doc, count(*) AS inter
      |  FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id <> y.doc_id
      |  GROUP BY 1, 2)
      |SELECT i.src_doc, i.dst_doc,
      |       round(CAST(i.inter AS DOUBLE) / s.sz, 6) AS containment
      |FROM inter i JOIN sizes s ON s.doc_id = i.src_doc
      |WHERE i.inter * 10 >= s.sz * 9
      |ORDER BY src_doc, dst_doc""".stripMargin

  /** The daily-run shape: dedup TODAY'S batch (every 4th doc stands in for
    * the new crawl) against the EXISTING corpus without ever self-joining
    * either side ([[DedupOps.crossJaccardPairs]]) — the incremental form of
    * dedup_ngram_jaccard a production pipeline runs per ingest. */
  private def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val fam = fanOut(documents(s, d)
      .filter(regexp_like(col("text"), lit("\\bdup\\b"))))
    DedupOps.crossJaccardPairs(
      existing = fam.filter(col("doc_id") % 4 =!= 0),
      batch = fam.filter(col("doc_id") % 4 === 0),
      minJaccard = 0.8)
      .select(col("doc_a").as("batch_id"), col("doc_b").as("existing_id"),
        col("jaccard"))
      .orderBy("batch_id", "existing_id")
  }

  private val dedupIncrementalSql =
    """WITH dup_docs AS (
      |  SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS existing_id
      |  FROM toks x JOIN toks y ON x.tok = y.tok
      |  WHERE x.doc_id % 4 = 0 AND y.doc_id % 4 <> 0),
      |inter AS (
      |  SELECT p.batch_id, p.existing_id, count(*) AS inter
      |  FROM pairs p
      |  JOIN toks a ON a.doc_id = p.batch_id
      |  JOIN toks b ON b.doc_id = p.existing_id AND b.tok = a.tok
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT batch_id, existing_id,
      |    round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
      |  FROM inter JOIN sizes sa ON sa.doc_id = batch_id
      |             JOIN sizes sb ON sb.doc_id = existing_id
      |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4)
      |SELECT batch_id, existing_id, jaccard FROM j
      |ORDER BY batch_id, existing_id""".stripMargin

  /** `dedup_incremental_prefix`: the SCALE PATH for the daily-batch dedup —
    * same output as [[dedupIncremental]] (the PPJoin prefix cut is lossless
    * at t = 0.8) but candidates are prefix×prefix postings under one global
    * union-df token order instead of every shared token
    * ([[DedupOps.crossPrefixJaccardPairs]]). Measured on the Zipf/Heaps
    * fixture: unguarded 12x for 10x data at sf1 vs 1.8x for this form —
    * candidates scale with near-dup density, not batch×corpus. The oracle
    * replays the prefix selection, so the cut logic itself is
    * cross-engine-verified. */
  private def dedupIncrementalPrefix(s: SparkSession, d: String): DataFrame = {
    val fam = fanOut(documents(s, d)
      .filter(regexp_like(col("text"), lit("\\bdup\\b"))))
    DedupOps.crossPrefixJaccardPairs(
      existing = fam.filter(col("doc_id") % 4 =!= 0),
      batch = fam.filter(col("doc_id") % 4 === 0),
      minJaccard = 0.8)
      .select(col("doc_a").as("batch_id"), col("doc_b").as("existing_id"),
        col("jaccard"))
      .orderBy("batch_id", "existing_id")
  }

  private val dedupIncrementalPrefixSql =
    """WITH dup_docs AS (
      |  SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |ranked AS (
      |  SELECT t.doc_id, t.tok,
      |         row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS r,
      |         s.sz
      |  FROM toks t JOIN dfreq d USING (tok) JOIN sizes s USING (doc_id)),
      |prefix AS (SELECT doc_id, tok FROM ranked
      |           WHERE r <= sz - (sz * 4 + 4) // 5 + 1),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS existing_id
      |  FROM prefix x JOIN prefix y ON x.tok = y.tok
      |  WHERE x.doc_id % 4 = 0 AND y.doc_id % 4 <> 0),
      |inter AS (
      |  SELECT p.batch_id, p.existing_id, count(*) AS inter
      |  FROM pairs p
      |  JOIN toks a ON a.doc_id = p.batch_id
      |  JOIN toks b ON b.doc_id = p.existing_id AND b.tok = a.tok
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT batch_id, existing_id,
      |    round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
      |  FROM inter JOIN sizes sa ON sa.doc_id = batch_id
      |             JOIN sizes sb ON sb.doc_id = existing_id
      |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4)
      |SELECT batch_id, existing_id, jaccard FROM j
      |ORDER BY batch_id, existing_id""".stripMargin

  private val dedupJaccardSql =
    """WITH dup_docs AS (
      |  SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |pairs AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
      |  FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
      |FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
      |           JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- N2 similarity search ------------------------------------------------

  /** Brute-force exact cosine top-5 for a bounded query set (vec_id < 20).
    * Query side broadcasts; corpus streams — the pattern that scales to a
    * 100 TB corpus as long as |queries| is bounded. */
  private def knnCosine(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    VectorOps.knnCosine(e.filter(col("vec_id") < 20), e, 5)
      .withColumn("cos", round(col("cos"), 6))
      .orderBy("query_id", "rnk")
  }

  private val knnCosineSql =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_reduce(list_transform(q.embedding,
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
      |      (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(q.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(c.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos
      |  FROM q, embeddings c WHERE q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY cos DESC, neighbor_id) AS rnk,
      |         round(cos, 6) AS cos
      |  FROM scored)
      |SELECT query_id, neighbor_id, rnk, cos FROM ranked
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** N2h `mine_hard_negatives`: hard-negative mining for contrastive
    * training — per query vector, the top-3 most-similar corpus vectors
    * with a DIFFERENT label (similar-but-wrong examples are the negatives
    * that actually teach a bi-encoder; random negatives are too easy —
    * the DPR/ANCE data-prep step). Identical scale shape to the exact kNN:
    * bounded query set broadcasts WITH its labels, corpus streams, the
    * label-mismatch predicate prunes inside the join (no post-filter
    * re-rank), ranking on the raw fold double + id tie-break (the proven
    * cross-engine knn recipe). At 100 TB the same query swaps its
    * candidate source from the full scan to the IVF/LSH bucket join. */
  private def mineHardNegatives(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("q_label"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col("label").as("neg_label"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id") &&
        col("q_label") =!= col("neg_label"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        col("rnk"), round(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rnk")
  }

  private val mineHardNegativesSql =
    """WITH q AS (SELECT vec_id, embedding, label FROM embeddings
      |           WHERE vec_id < 20),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    c.label AS neg_label,
      |    list_reduce(list_transform(q.embedding,
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
      |      (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(q.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(c.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos
      |  FROM q, embeddings c
      |  WHERE q.vec_id <> c.vec_id AND q.label <> c.label),
      |ranked AS (
      |  SELECT query_id, neighbor_id, neg_label,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY cos DESC, neighbor_id) AS rnk,
      |         round(cos, 6) AS cos
      |  FROM scored)
      |SELECT query_id, neighbor_id, neg_label, rnk, cos FROM ranked
      |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  /** `knn_matryoshka_recall`: Matryoshka-truncation retrieval audit
    * (Kusupati et al. 2022) — MRL-style embeddings promise that a PREFIX of
    * the vector preserves ranking; before a pipeline ships 16-of-64-dim
    * vectors to cut ANN scan bytes 4×, it owes this measurement: per query,
    * recall@5 of the 16-dim-prefix cosine top-5 against the full-64-dim
    * top-5. One broadcast-query pass computes BOTH scores per candidate
    * (the prefix slice is free — same row, no second scan), two rank
    * windows share the single query_id shuffle, and the overlap count is a
    * (query, neighbor) self-equijoin of two ≤5-row-per-query lists.
    * Ranking on raw fold doubles with id tie-breaks (the knn recipe);
    * recall is an exact small-integer ratio. */
  private[graft] def knnMatryoshkaRecallOf(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"))
    val wFull = Window.partitionBy("query_id")
      .orderBy(col("cos_full").desc, col("neighbor_id"))
    val wPre = Window.partitionBy("query_id")
      .orderBy(col("cos_pre").desc, col("neighbor_id"))
    val both = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_full", VectorOps.cosine(col("qv"), col("cv")))
      .withColumn("cos_pre",
        VectorOps.cosine(slice(col("qv"), 1, 16), slice(col("cv"), 1, 16)))
      .withColumn("rnk_full", row_number().over(wFull))
      .withColumn("rnk_pre", row_number().over(wPre))
    val overlap = both
      .filter(col("rnk_full") <= 5 && col("rnk_pre") <= 5)
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    q.select("query_id")
      .join(overlap, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)).cast("double") / lit(5.0),
          6).as("recall_at_5"))
      .orderBy("query_id")
  }

  private def knnMatryoshkaRecall(s: SparkSession, d: String): DataFrame =
    knnMatryoshkaRecallOf(embeddings(s, d))

  private val knnMatryoshkaRecallSql =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_reduce(list_transform(q.embedding,
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
      |      (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(q.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(c.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos_full,
      |    list_reduce(list_transform(q.embedding[1:16],
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
      |      (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(q.embedding[1:16],
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(c.embedding[1:16],
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos_pre
      |  FROM q, embeddings c WHERE q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos_full DESC, neighbor_id) AS rnk_full,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos_pre DESC, neighbor_id) AS rnk_pre
      |  FROM scored),
      |overlap AS (
      |  SELECT query_id, count(*) AS n_overlap
      |  FROM ranked WHERE rnk_full <= 5 AND rnk_pre <= 5
      |  GROUP BY 1)
      |SELECT q.vec_id AS query_id,
      |  COALESCE(n_overlap, 0) AS n_overlap,
      |  round(CAST(COALESCE(n_overlap, 0) AS DOUBLE) / 5.0, 6) AS recall_at_5
      |FROM q LEFT JOIN overlap ON q.vec_id = overlap.query_id
      |ORDER BY query_id""".stripMargin

  /** `knn_join_blocked`: the kNN JOIN — top-3 cosine neighbors for EVERY
    * vector (not a bounded query set), blocked by the label column so the
    * pair space is Σ|block|², never |corpus|². This is the scale shape of a
    * full-corpus kNN graph build: shuffle both sides once on the block key
    * (in production the block is an IVF/LSH cell; here the given label),
    * score all pairs within a block, keep k per query via a bounded window.
    * Ranking compares the RAW fold doubles (bit-identical cross-engine,
    * the proven knn recipe) with an id tie-break; cos rounds to 6 dp only
    * for display. */
  private def knnJoinBlocked(s: SparkSession, d: String): DataFrame = {
    val e = fanOut(embeddings(s, d))
    val a = e.select(col("label"), col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val b = e.select(col("label"), col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    a.join(b, Seq("label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw", VectorOps.cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos_raw"), 6).as("cos"))
      .orderBy("query_id", "rnk")
  }

  private val knnJoinBlockedSql =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_reduce(list_transform(q.embedding,
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
      |      (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(q.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(c.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos
      |  FROM embeddings q JOIN embeddings c
      |    ON q.label = c.label AND q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY cos DESC, neighbor_id) AS rnk,
      |         round(cos, 6) AS cos
      |  FROM scored)
      |SELECT query_id, neighbor_id, rnk, cos FROM ranked
      |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  /** int8-quantized scan + exact rescore (VectorOps.quantize/knnQuantized):
    * the corpus is scored through its quantized codes (≈1/4 the scan bytes,
    * integer dot), only 2k candidates per query pay exact float cosine.
    * Fully oracle-checked — quantization uses exact IEEE arithmetic only
    * (max/divide/round, no libm), so DuckDB reproduces the codes, the
    * approximate ranking, and the rescored result bit-for-bit. */
  private def knnQ8(s: SparkSession, d: String): DataFrame = {
    val e = VectorOps.quantize(embeddings(s, d))
    VectorOps.knnQuantized(e.filter(col("vec_id") < 20), e, 5, 2)
      .withColumn("cos", round(col("cos"), 6))
      .orderBy("query_id", "rnk")
  }

  private val knnQ8Sql =
    """WITH qz AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
      |  FROM embeddings),
      |qv AS (
      |  SELECT vec_id, embedding, s,
      |    CASE WHEN s = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
      |         ELSE list_transform(embedding,
      |                x -> CAST(round(CAST(x AS DOUBLE) / s) AS BIGINT)) END AS q
      |  FROM qz),
      |approx AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    a.embedding AS qe, b.embedding AS ce,
      |    CAST(list_reduce(list_transform(a.q, (x, i) -> x * b.q[i]),
      |                     (u, v) -> u + v) AS DOUBLE) * a.s * b.s AS ascore
      |  FROM qv a, qv b WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id),
      |cand AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY ascore DESC, neighbor_id) AS arnk FROM approx),
      |rescored AS (
      |  SELECT query_id, neighbor_id,
      |    list_reduce(list_transform(qe,
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(ce[i] AS DOUBLE)), (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(qe,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(ce,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos
      |  FROM cand WHERE arnk <= 10),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS rnk,
      |    round(cos, 6) AS cos
      |  FROM rescored)
      |SELECT query_id, neighbor_id, rnk, cos FROM ranked
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** ANN via sign-bit LSH buckets (rows-only; recall asserted in tests
    * against the brute-force result). */
  private def knnAnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = VectorOps.lshTables(embeddings(s, d), planes = 4, tables = 4)
      .localCheckpoint(false)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("table_id"), col("bucket"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      col("table_id"), col("bucket"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("table_id", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", round(VectorOps.cosine(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("query_id", "neighbor_id", "rnk", "cos")
      .orderBy("query_id", "rnk")
  }

  /** Dedup clustering: exact-Jaccard near-dup pairs grouped into clusters by
    * connected components (min-label propagation). Output: one row per
    * clustered doc with its cluster id + cluster size. The oracle computes
    * the same transitive closure with a recursive CTE. */
  private def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = dedupJaccard(s, d).select("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs)
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .select("doc_id", "cluster_id", "cluster_size")
      .orderBy("doc_id")
  }

  private val dedupClustersSql =
    """WITH RECURSIVE pairs AS (
      |  WITH dup_docs AS (
      |    SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |  toks AS (
      |    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |  sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |  cand AS (
      |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
      |    FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
      |    GROUP BY 1, 2)
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(node, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
      |cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node)
      |SELECT cc.doc_id, cc.cluster_id, s.cluster_size
      |FROM cc JOIN (SELECT cluster_id, count(*) AS cluster_size
      |              FROM cc GROUP BY cluster_id) s USING (cluster_id)
      |ORDER BY doc_id""".stripMargin

  /** The end-to-end fuzzy-dedup pipeline a training-data build runs daily:
    * MinHash-banded candidates (bucketed, never all-pairs) → exact-Jaccard
    * verification over FULL token sets, restricted to candidates → connected
    * components → canonical-doc pick (cluster min; `keep` marks it).
    * Banding is widened to 8 bands × 2 rows (s-curve threshold ≈ 0.35) so a
    * true ≥ 0.8 pair cannot realistically slip past candidate generation;
    * the exact verify discards the extra low-J candidates that loose banding
    * admits. The oracle recomputes the same clusters from scratch with exact
    * Jaccard + a recursive CTE — candidate generation must therefore be
    * lossless on this corpus, which IS the check. */
  private def dedupPipeline(s: SparkSession, d: String): DataFrame = {
    val dupDocs = fanOut(documents(s, d)
      .filter(regexp_like(col("text"), lit("\\bdup\\b"))))
    // bands=16 (rows=2) at h=32: miss prob for a true token-J ≥ 0.8 pair
    // is (1−0.64)¹⁶ ≈ 9e-8 — candidate generation is lossless in practice
    // at any sf (the oracle recomputes clusters exactly, so it must be).
    // Random family pairs on this 30-word-vocab corpus sit at token-J
    // ~0.6, so candidates ≈ all family pairs either way; the exact verify
    // is the filter that matters and the family bound keeps it quadratic
    // in FAMILY size only, never corpus.
    val cand = DedupOps.minhashPairs(dupDocs, h = 32, bands = 16, shingleK = 1)
      .select("doc_a", "doc_b")
    val verified = DedupOps.jaccardVerify(DedupOps.tokenSets(dupDocs), cand, 0.8)
    val cc = DedupOps.connectedComponents(verified.select("doc_a", "doc_b"))
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id").as("canonical_id"),
        col("cluster_size"),
        (col("doc_id") === col("cluster_id")).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  private val dedupPipelineSql =
    """WITH RECURSIVE pairs AS (
      |  WITH dup_docs AS (
      |    SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |  toks AS (
      |    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |  sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |  cand AS (
      |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
      |    FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
      |    GROUP BY 1, 2)
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(node, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
      |cc AS (SELECT node AS doc_id, min(label) AS canonical_id FROM reach GROUP BY node)
      |SELECT cc.doc_id, cc.canonical_id, s.cluster_size,
      |       CAST(cc.doc_id = cc.canonical_id AS INTEGER) AS keep
      |FROM cc JOIN (SELECT canonical_id, count(*) AS cluster_size
      |              FROM cc GROUP BY canonical_id) s USING (canonical_id)
      |ORDER BY doc_id""".stripMargin

  /** Embedding-cosine near-duplicate pairs over a bounded audit subset —
    * all-pairs is fine at |subset|² (here 200²/2); the corpus-scale path is
    * LSH-bucketed candidates (knn_ann_lsh). Threshold rather than top-k so
    * float ties can't reorder the compared output. */
  private def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorOps.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.3)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  private val dedupEmbeddingSql =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
      |pairs AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_reduce(list_transform(a.embedding,
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
      |      (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(a.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(b.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, round(cos, 6) AS cos
      |FROM pairs WHERE cos >= 0.3
      |ORDER BY vec_a, vec_b""".stripMargin

  /** Embedding near-dup at corpus scale — the LSH-bucketed path that
    * replaces dedup_embedding's all-pairs audit once |corpus|² is off the
    * table: multi-table sign-bit buckets in ONE corpus scan, candidates from
    * bucket collisions only, then exact-cosine verification. Rows-only (the
    * hash planes aren't DuckDB-expressible); VectorOpsSpec asserts every
    * emitted pair is in the exact result (precision 1.0 by construction)
    * and recall against dedup_embedding is useful. */
  private def dedupEmbeddingLsh(s: SparkSession, d: String): DataFrame = {
    val e = VectorOps.lshTables(
      embeddings(s, d).filter(col("vec_id") < 200), planes = 4, tables = 4)
      .localCheckpoint(false)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("table_id"), col("bucket"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("table_id"), col("bucket"))
    a.join(b, Seq("table_id", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
      .withColumn("cos", round(VectorOps.cosine(col("ea"), col("eb")), 6))
      .filter(col("cos") >= 0.3)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** `dedup_embedding_lsh_bound`: the bucketed path's PRECISION is exact by
    * construction (every candidate is cosine-verified), so the bound worth
    * hashing is RECALL vs the exact all-pairs audit — recomputed in-plan
    * over the same bounded vec_id < 200 slice (the all-pairs reference is
    * affordable exactly because the slice is bounded; the LSH operator
    * under test is the one that scales). Oracle reproduces the exact pair
    * count and asserts the recall floor TRUE. Floor 0.6 = worst measured
    * minus margin (ProbeRecall, r11: 0.818 at sf0.01, 0.720 at sf0.1 and
    * sf1 — deterministic, so the readings are exact repeats). */
  private def dedupEmbeddingLshBound(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding")).localCheckpoint(false)
    val exact = e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= 0.3)
      .select("vec_a", "vec_b")
      .localCheckpoint(false)
    val emitted = dedupEmbeddingLsh(s, d).select("vec_a", "vec_b")
    val nExact = exact.agg(count(lit(1)).as("n_exact_pairs"))
    val found = exact.join(emitted, Seq("vec_a", "vec_b"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
    nExact.crossJoin(found)
      .select(col("n_exact_pairs"),
        (col("n_found").cast("double") >=
          lit(0.6) * col("n_exact_pairs")).as("recall_ok"))
  }

  private val dedupEmbeddingLshBoundSql =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
      |pairs AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_reduce(list_transform(a.embedding,
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
      |      (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(a.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(b.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok
      |FROM pairs WHERE cos >= 0.3""".stripMargin

  /** IVF ANN (rows-only; recall asserted in VectorOpsSpec): deterministic
    * k-means coarse quantizer, 16 lists, 4 probed per query — each query
    * scans ~1/4 of the corpus instead of all of it; the ratio is the
    * recall/cost dial at 100 TB. */
  private def knnAnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val centroids = VectorOps.kmeansCentroids(e, k = 16, iters = 3)
    VectorOps.ivfKnn(e, e.filter(col("vec_id") < 20), centroids, k = 3, nProbe = 4)
      .orderBy("query_id", "rnk")
  }

  /** N2 PQ flavor: product-quantized ADC candidate scan + exact rescore —
    * the memory-compression ANN path (8 nibble codes per 64-float vector).
    * Rows-only by design like the other ANN variants (codebook training is
    * engine-specific); recall vs the exact brute force is property-tested
    * in VectorOpsSpec. */
  private def knnAnnPq(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val books = VectorOps.pqCodebooks(e, m = 8, k = 16, iters = 3)
    // rescoreFactor widens the ADC candidate beam before the exact rescore —
    // the PQ recall/cost dial. The beam must GROW with the corpus: a fixed
    // 8×k=24-candidate beam measured recall@3 0.617 at 500 vectors but
    // 0.333 at 20k (sf1 rehearsal) — near-uniform embeddings pile ever more
    // near-ties on the quantized distance, so a constant beam captures an
    // ever-smaller slice of the confusion set. beamFactor = n/(32k), so the
    // exact rescore touches k·beamFactor = n/32 ≈ 3% of the corpus per
    // query (the standard IVF-PQ practice of scaling nprobe/beam with
    // collection size); the max(8, ·) floor preserves the small-sf behavior
    // the driver gate hashes. e.count() here is one metadata-cheap build
    // job, amortized over the 20-query batch the registry runs.
    val beamFactor = math.max(8L, e.count() / (32L * 3)).toInt
    VectorOps.pqKnn(e, e.filter(col("vec_id") < 20), books, k = 3,
      rescoreFactor = beamFactor)
      .orderBy("query_id", "rnk")
  }

  /** ANN bound oracle (`knn_ann_{lsh,ivf,pq}_bound`): the rows-only ANN
    * variants gain a hash row by checking the property they exist for —
    * RECALL@k against the exact brute-force top-k (`knn_cosine_topk`'s
    * answer, recomputed in-plan). The ANN candidate set is engine-specific;
    * "finds ≥ thresh·k·|Q| of the true neighbors" is not, and DuckDB
    * asserts it as a TRUE boolean next to the SQL-reproducible query count.
    * One aggregate row — deterministic for fixed data (no RNG anywhere in
    * the LSH planes / k-means / PQ codebooks, all seeded). Everything stays
    * in-plan: the semi join scores hits, two scalar aggs cross-join. */
  private def annRecallBound(s: SparkSession, d: String, ann: DataFrame,
      k: Int, thresh: Double): DataFrame = {
    val e = embeddings(s, d)
    val exact = VectorOps.knnCosine(e.filter(col("vec_id") < 20), e, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = ann.select("query_id", "neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    exact.agg(countDistinct(col("query_id")).as("n_queries"))
      .crossJoin(hits)
      .select(col("n_queries"), lit(k).as("k"),
        (col("n_hits").cast("double") >=
          lit(thresh) * col("n_queries") * k).as("recall_ok"))
  }

  private val annRecallBoundSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_queries, 3 AS k,
      |       TRUE AS recall_ok
      |FROM embeddings WHERE vec_id < 20""".stripMargin

  // Floors at measured-minus-margin (r10 verdict #5 — the r08 0.3/0.5
  // slack let a real recall regression hide). Measured recall@3 by scale
  // (graft.tools.ProbeRecall, r11, on the driver sf0.01/sf0.1 data and the
  // fresh-sample sf1 rehearsal corpus; every structure is deterministic so
  // the readings are exact repeats): LSH 0.733 (sf0.01) / 0.733 (sf0.1) /
  // 0.817 (sf1); IVF 0.900 / 0.883 / 0.917; PQ — with the r11
  // corpus-scaled beam — 0.617 / 0.700 / 0.833. Each floor sits ~0.1
  // under the WORST measured scale — the twins assert at sf0.01 (driver
  // gate) and sf1 (SF1.md gate), and a floor tuned to one scale's best
  // reading would false-alarm at another. PQ stays 0.5 (measured−0.12 at
  // its sf0.01 worst; the pre-beam-fix constant-24-candidate form measured
  // 0.333 at sf1 — the floor caught a REAL scale regression, see
  // knnAnnPq's beam note).
  private def knnAnnLshBound(s: SparkSession, d: String): DataFrame =
    annRecallBound(s, d, knnAnnLsh(s, d), 3, 0.6)

  private def knnAnnIvfBound(s: SparkSession, d: String): DataFrame =
    annRecallBound(s, d, knnAnnIvf(s, d), 3, 0.55)

  private def knnAnnPqBound(s: SparkSession, d: String): DataFrame =
    annRecallBound(s, d, knnAnnPq(s, d), 3, 0.5)

  // ---- A7/X2 udaf_vector_centroid ------------------------------------------

  /** Custom typed Aggregator: per-label centroid, exploded to (label, dim).
    * The 4-dp display round is the C4 detRound form on BOTH sides (r12):
    * the centroid is an exact scaled-long rational, so raw round(x, 4) can
    * land on an exact 4-dp tie AND on a ±0 whose sign the engines disagree
    * about — it passed at sf0.01 and sf1 by luck of the data and failed at
    * sf0.1 (329/640 rows shifted by one -0.0 in the repr-sort; the
    * embedding_gram_matrix r09 class, caught by the r12 zipf-corpus full
    * gate which was the first sf0.1-scale compare of this query). */
  private def vectorCentroid(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .groupBy("label")
      .agg(VectorOps.centroidUdaf(64).as("centroid"))
      .select(col("label"), posexplode(col("centroid")))
      .select(col("label"), (col("pos") + 1).as("dim"),
        Det.detRound(col("col"), 4).as("c"))
      .orderBy("label", "dim")

  private val vectorCentroidSql =
    s"""SELECT label, i AS dim,
       |  ${Det.sqlDetRound(
            "CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)" +
            " AS BIGINT)) AS DOUBLE) / (count(*) * 1000000.0)", 4)} AS c
       |FROM embeddings, range(1, 65) t(i)
       |GROUP BY label, i ORDER BY label, dim""".stripMargin

  // ---- N3 text analysis ----------------------------------------------------

  private def tokenStats(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    documents(s, d)
      .select(col("lang"), col("doc_id"), size(toks).as("n_toks"),
        size(array_distinct(toks)).as("n_uniq"),
        // BPE-ish subword count: letter runs / digit runs / single symbols
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .as("n_bpeish"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("n_uniq")).as("total_uniq"),
        sum(col("n_bpeish")).as("total_bpeish"),
        (sum(col("n_toks")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")

  }

  private val tokenStatsSql =
    """SELECT lang, count(*) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |       CAST(sum(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS total_uniq,
      |       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_bpeish,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) * 1.0
      |         / count(*) AS avg_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Language-id heuristic: stopword-hit ratio (the n-gram-free analog that
    * the token corpus supports); compared against the labeled lang column. */
  private def langId(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val hits = size(filter(toks, t => t === "the" || t === "a"))
    val ratio = hits.cast("double") / size(toks)
    documents(s, d)
      .select(col("lang"), when(ratio >= 0.06, lit("en_like"))
        .otherwise(lit("other")).as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "predicted")
  }

  private val langIdSql =
    """SELECT lang,
      |  CASE WHEN CAST(len(list_filter(string_split(text, ' '),
      |                    t -> t IN ('the', 'a'))) AS DOUBLE)
      |            / len(string_split(text, ' ')) >= 0.06
      |       THEN 'en_like' ELSE 'other' END AS predicted,
      |  count(*) AS cnt
      |FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin

  /** Per-document quality score: length band + uniqueness ratio, the
    * stopword/length heuristics of pretraining-data filtering. */
  private def qualityScore(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    documents(s, d)
      .select(col("doc_id"),
        when(n < 40, "short").when(n <= 80, "mid").otherwise("long").as("len_band"),
        round(uniq * 0.4 + lenScore * 0.6, 6).as("score"))
      .orderBy("doc_id")
  }

  private val qualityScoreSql =
    """SELECT doc_id,
      |  CASE WHEN len(string_split(text, ' ')) < 40 THEN 'short'
      |       WHEN len(string_split(text, ' ')) <= 80 THEN 'mid'
      |       ELSE 'long' END AS len_band,
      |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |          / len(string_split(text, ' ')) * 0.4
      |        + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80.0, 1.0) * 0.6,
      |        6) AS score
      |FROM documents ORDER BY doc_id""".stripMargin

  /** `score_standardize_by_source`: per-source z-normalization of the
    * quality score — the recalibration a multi-source corpus owes before
    * any GLOBAL score threshold: sources have different score baselines
    * (boilerplate-heavy crawls score low on uniqueness, short-form high),
    * so a raw global cut silently over-prunes some sources; z within
    * source makes "bottom 10% of ITS source" comparable across sources.
    * One scan computes the 6-dp score; per-source mean/std ride exact
    * DECIMAL sufficient statistics (sum, sum-of-squares — the Welch
    * recipe) in a source-keyed map-side-combine agg; stats broadcast back
    * (source-cardinality rows) and z is one fixed IEEE sequence rounded
    * 6 dp. No window, no second scan. */
  private[graft] def scoreStandardizeBySourceOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val n = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / n
    val lenScore = least(n.cast("double") / 80.0, lit(1.0))
    val scored = docs.select(col("doc_id"), col("source"),
      round(uniq * 0.4 + lenScore * 0.6, 6).as("sc"))
    val stats = scored
      .select(col("source"), col("sc").cast("decimal(18,6)").as("xd"))
      .withColumn("xx", (col("xd") * col("xd")).cast("decimal(38,12)"))
      .groupBy("source")
      .agg(count(lit(1)).as("ns"), sum(col("xd")).as("sm"),
        sum(col("xx")).as("smm"))
    val nsd = col("ns").cast("double")
    val mean = col("sm").cast("double") / nsd
    val std = sqrt((col("smm").cast("double") - nsd * mean * mean) /
      (nsd - lit(1.0d)))
    scored.join(broadcast(stats), Seq("source"))
      .select(col("doc_id"), col("source"), col("sc").as("score"),
        round((col("sc") - mean) / std, 6).as("z_src"))
      .orderBy("doc_id")
  }

  private def scoreStandardizeBySource(s: SparkSession, d: String): DataFrame =
    scoreStandardizeBySourceOf(documents(s, d))

  private val scoreStandardizeBySourceSql =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |            / len(string_split(text, ' ')) * 0.4
      |          + least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 80.0,
      |                  1.0) * 0.6, 6) AS sc
      |  FROM documents),
      |st AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS ns,
      |    sum(CAST(sc AS DECIMAL(18,6))) AS sm,
      |    sum(CAST(CAST(sc AS DECIMAL(18,6)) * CAST(sc AS DECIMAL(18,6))
      |        AS DECIMAL(38,12))) AS smm
      |  FROM scored GROUP BY 1)
      |SELECT doc_id, scored.source, sc AS score,
      |  round((sc - CAST(sm AS DOUBLE) / CAST(ns AS DOUBLE))
      |    / sqrt((CAST(smm AS DOUBLE)
      |        - CAST(ns AS DOUBLE) * (CAST(sm AS DOUBLE) / CAST(ns AS DOUBLE))
      |          * (CAST(sm AS DOUBLE) / CAST(ns AS DOUBLE)))
      |      / (CAST(ns AS DOUBLE) - 1.0)), 6) AS z_src
      |FROM scored JOIN st ON scored.source = st.source
      |ORDER BY doc_id""".stripMargin

  /** Deterministic position-weighted token fingerprint (rolling-hash style,
    * pure integer math so any engine reproduces it). */
  private def docFingerprint(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val terms = zip_with(toks, sequence(lit(1), size(toks)),
      (t, i) => i.cast("long") * (length(t).cast("long") * 37L + ascii(t)))
    documents(s, d)
      .select(col("doc_id"),
        (aggregate(terms, lit(0L), (acc, x) => acc + x) % 1000000007L).as("fp"))
      .orderBy("doc_id")
  }

  private val docFingerprintSql =
    """SELECT doc_id,
      |  CAST(list_sum(list_transform(string_split(text, ' '),
      |    (t, i) -> i * (37 * length(t) + ascii(t)))) % 1000000007 AS BIGINT) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** `doc_winnowing`: winnowing fingerprint selection (the MOSS
    * plagiarism-detection algorithm, Schleimer et al. 2003) — hash every
    * 3-token gram, slide a 4-gram window, keep each window's MINIMUM hash:
    * the selected set is position-robust (guaranteed to share fingerprints
    * with any copy that overlaps by a window) and ~1/4 the gram count.
    * The gram hash is the portable integer polynomial of doc_fingerprint
    * (37·len+ascii per token, Horner ×31 over the gram) — no engine hash
    * functions, so DuckDB replays it exactly. Pure per-row array math, no
    * shuffle; output = per-doc fingerprint count + checksum (the set's
    * identity, not just its size). */
  private def docWinnowing(s: SparkSession, d: String): DataFrame =
    docWinnowingOf(fanOut(documents(s, d)))

  private[graft] def docWinnowingOf(docs: DataFrame): DataFrame = {
    val tk = split(col("text"), "\\s+")
    // The token-hash array materializes in its OWN projection: the gram
    // expression referenced it 3× in the r07 HOF form, and building grams
    // directly off the transform(split(...)) expr re-inlined the whole
    // hash pass per reference — O(T²) per doc (r07 plan audit). The gram
    // stage itself is now the native poly_grams expression (Horner ×31
    // over 3 tokens — identical values, codegen'd single pass).
    val hc = transform(tk, t => length(t).cast("long") * 37L + ascii(t))
    docs
      .select(col("doc_id"), hc.as("h"))
      .select(col("doc_id"), graft.functions.PolyGrams(col("h"), 3).as("g"))
      // native monotone-deque sliding minimum (the HOF form paid an
      // interpreted lambda + a 4-slice allocation per window)
      .select(col("doc_id"),
        graft.functions.WinnowMins(col("g"), 4).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fp"),
        aggregate(col("fp"), lit(0L), (acc, x) => acc + x).as("fp_sum"))
      .orderBy("doc_id")
  }

  private val docWinnowingSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |h AS (SELECT doc_id,
      |        list_transform(tk, x -> 37 * length(x) + ascii(x)) AS h FROM t),
      |g AS (SELECT doc_id,
      |        list_transform(range(1, len(h) - 1), i ->
      |          (h[CAST(i AS INTEGER)] * 31 + h[CAST(i AS INTEGER) + 1]) * 31
      |           + h[CAST(i AS INTEGER) + 2]) AS g
      |      FROM h),
      |w AS (SELECT doc_id,
      |        CASE WHEN len(g) >= 4 THEN
      |          list_distinct(list_transform(range(1, len(g) - 2), j ->
      |            list_min(g[CAST(j AS INTEGER):CAST(j AS INTEGER) + 3])))
      |        ELSE list_distinct(g) END AS fp
      |      FROM g)
      |SELECT doc_id, CAST(len(fp) AS INTEGER) AS n_fp,
      |       CAST(list_sum(fp) AS BIGINT) AS fp_sum
      |FROM w ORDER BY doc_id""".stripMargin

  /** N1h `dedup_substring_spans`: ExactSubstr-style duplicated-span
    * detection (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" — the suffix-array method's query analog at
    * fixed gram granularity): hash every 8-token gram with the portable
    * integer polynomial (doc_fingerprint's recipe — bounded: max token
    * hash ~3e3, Horner ×31 over 8 terms < 2^63, so DuckDB's non-wrapping
    * BIGINT survives); grams held by ≥ 2 docs are "duplicated"; per doc,
    * overlapping/adjacent duplicated gram positions merge into MAXIMAL
    * spans (suffix-array maximality recovered by island merging), and the
    * doc reports span count, covered tokens, and the duplicated-token
    * ratio — the removal decision ExactSubstr feeds.
    *
    * Scale: the gram table is O(total tokens) rows keyed by the hash —
    * one keyed agg finds shared grams, one hash join back, one per-doc
    * window for the island merge; never pairwise in docs. This is the
    * published verbatim-dedup alternative to MinHash (which targets
    * NEAR-duplication) at 100 TB. The token-hash array materializes in
    * its own projection (the doc_winnowing O(T²) lesson). */
  private[graft] def dedupSubstringSpansOf(docs: DataFrame): DataFrame = {
    val L = 8
    val tk = split(col("text"), "\\s+")
    val hc = transform(tk, t => length(t).cast("long") * 37L + ascii(t))
    val withH = docs.select(col("doc_id"), hc.as("h"))
    // gram hashes via the native poly_grams expression (one codegen'd
    // O(T·L) pass; the HOF transform/aggregate/slice form ran interpreted
    // per gram)
    val g = withH
      .select(col("doc_id"), size(col("h")).cast("long").as("n_tokens"),
        posexplode(graft.functions.PolyGrams(col("h"), L)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "gh")
    val shared = g.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("gh")
    val w = Window.partitionBy("doc_id").orderBy("p")
    g.join(shared, Seq("gh")).select("doc_id", "n_tokens", "p")
      .withColumn("island", col("p") - row_number().over(w))
      .groupBy("doc_id", "island")
      .agg(min(col("n_tokens")).as("n_tokens"),
        (max(col("p")) - min(col("p")) + L).as("covered"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("covered")).as("dup_tokens"),
        min(col("n_tokens")).as("n_tokens"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"),
        col("n_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_ratio"))
      .orderBy("doc_id")
  }

  private def dedupSubstringSpans(s: SparkSession, d: String): DataFrame =
    dedupSubstringSpansOf(fanOut(documents(s, d)))

  private val dedupSubstringSpansSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |h AS (SELECT doc_id, len(tk) AS n,
      |        list_transform(tk, x -> 37 * length(x) + ascii(x)) AS h FROM t),
      |pos AS (SELECT doc_id, n, h, unnest(range(1, n - 6)) AS p FROM h),
      |g AS (SELECT doc_id, n, p,
      |        list_reduce(h[CAST(p AS INTEGER):CAST(p AS INTEGER) + 7],
      |          (a, b) -> a * 31 + b) AS gh
      |      FROM pos),
      |shared AS (SELECT gh FROM g GROUP BY gh
      |           HAVING count(DISTINCT doc_id) >= 2),
      |dup AS (SELECT doc_id, n, p FROM g JOIN shared USING (gh)),
      |isl AS (SELECT doc_id, n, p,
      |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
      |            AS island
      |        FROM dup),
      |spans AS (SELECT doc_id, min(n) AS n, min(p) AS lo, max(p) AS hi
      |          FROM isl GROUP BY doc_id, island)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |       CAST(sum(hi - lo + 8) AS BIGINT) AS dup_tokens,
      |       CAST(min(n) AS BIGINT) AS n_tokens,
      |       round(CAST(sum(hi - lo + 8) AS DOUBLE) / min(n), 6) AS dup_ratio
      |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** N4f `multimodal_audio_vad`: voice-activity segmentation over the
    * sliding audio chunks — chunks whose energy clears the threshold
    * (scaled-mean-byte, [[graft.ops.MultimodalOps.chunkEnergies]]; the
    * DETERMINISTIC FAKE for RMS, honest as ever) group into voiced
    * SEGMENTS via gaps-and-islands on the chunk index (island id =
    * chunk_idx − row_number over voiced — pure integers). The ASR-prep
    * shape: payload reduces to one long per chunk MAP-SIDE, one doc_id
    * window shuffle drives both the island id and the segment aggregate
    * (reused partitioning, no second exchange). */
  private def multimodalAudioVad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("doc_id").orderBy("chunk_idx")
    val media = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        lit("audio/fake").as("mime")).as[graft.ops.MultimodalOps.MediaRow]
    graft.ops.MultimodalOps.chunkEnergies(
      graft.ops.MultimodalOps.chunkAudio(media, 64, 48)).toDF()
      .filter(col("energy") > 94500)
      .withColumn("island", col("chunk_idx") - row_number().over(w))
      .groupBy("doc_id", "island")
      .agg(min("start_ms").as("start_ms"), count(lit(1)).as("n_chunks"))
      .withColumn("seg_idx", row_number().over(
        Window.partitionBy("doc_id").orderBy("start_ms")).cast("long"))
      .select("doc_id", "seg_idx", "start_ms", "n_chunks")
      .orderBy("doc_id", "seg_idx")
  }

  private val multimodalAudioVadSql =
    """WITH media AS (
      |  SELECT doc_id, text, CAST(strlen(text) // 2 AS BIGINT) AS n_samples
      |  FROM documents),
      |idx AS (
      |  SELECT doc_id, text, n_samples,
      |         unnest(range(0, CAST((n_samples + 47) // 48 AS BIGINT))) AS ci
      |  FROM media),
      |wnd AS (
      |  SELECT doc_id, ci,
      |         substring(text, CAST(ci * 96 + 1 AS INTEGER),
      |                   CAST(LEAST(64, n_samples - ci * 48) * 2 AS INTEGER))
      |           AS payload
      |  FROM idx),
      |chars AS (
      |  SELECT doc_id, ci, payload,
      |         unnest(range(CAST(strlen(payload) AS BIGINT))) AS k
      |  FROM wnd),
      |en AS (
      |  SELECT doc_id, ci,
      |    (SUM(ord(substring(payload, CAST(k + 1 AS INTEGER), 1))) * 1000)
      |      // count(*) AS energy
      |  FROM chars GROUP BY 1, 2),
      |voiced AS (
      |  SELECT doc_id, ci,
      |         ci - row_number() OVER (PARTITION BY doc_id ORDER BY ci) AS island
      |  FROM en WHERE energy > 94500),
      |seg AS (
      |  SELECT doc_id, island, CAST(min(ci) * 3 AS BIGINT) AS start_ms,
      |         count(*) AS n_chunks
      |  FROM voiced GROUP BY 1, 2)
      |SELECT doc_id,
      |       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_ms)
      |            AS BIGINT) AS seg_idx,
      |       start_ms, n_chunks
      |FROM seg ORDER BY doc_id, seg_idx""".stripMargin

  /** N4e `multimodal_frame_dedup`: cross-video frame dedup — the repeated
    * intro/credits/watermark detector. Every frame reduces to its integer
    * fingerprint map-side ([[graft.ops.MultimodalOps.frameFingerprints]] —
    * fake codec, real pipeline), then ONE keyed agg on fp finds fingerprints
    * shared by ≥ 2 videos; the representative is the packed min
    * (doc_id·10⁶ + frame_idx) — a pure integer min, no argmin tie
    * ambiguity. Payload bytes never shuffle: 256 bytes → one long before
    * the exchange, the same contract as scene segmentation. */
  private def multimodalFrameDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        lit("video/fake").as("mime")).as[graft.ops.MultimodalOps.MediaRow]
    graft.ops.MultimodalOps.frameFingerprints(
      graft.ops.MultimodalOps.sampleFrames(media, 1)).toDF()
      .groupBy("fp")
      .agg(count(lit(1)).as("n_frames"),
        countDistinct("doc_id").as("n_docs"),
        min(col("doc_id") * 1000000L + col("frame_idx")).as("rep"))
      .filter(col("n_docs") >= 2)
      .orderBy("fp")
  }

  private val multimodalFrameDedupSql =
    """WITH media AS (
      |  SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n FROM documents),
      |idx AS (
      |  SELECT doc_id, text, unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS fi
      |  FROM media),
      |frames AS (
      |  SELECT doc_id, fi,
      |         substring(text, CAST(fi * 256 + 1 AS INTEGER), 256) AS payload
      |  FROM idx),
      |chars AS (
      |  SELECT doc_id, fi, payload,
      |         unnest(range(CAST(strlen(payload) AS BIGINT))) AS ci
      |  FROM frames),
      |fps AS (
      |  SELECT doc_id, fi,
      |         CAST((SUM(ord(substring(payload, CAST(ci + 1 AS INTEGER), 1)))
      |               * 1000) // count(*) AS BIGINT) AS fp
      |  FROM chars GROUP BY 1, 2)
      |SELECT fp, CAST(count(*) AS BIGINT) AS n_frames,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(min(doc_id * 1000000 + fi) AS BIGINT) AS rep
      |FROM fps GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY fp""".stripMargin

  /** N39 `text_novelty`: temporal novelty scoring — the share of a doc's
    * distinct 3-grams whose FIRST corpus occurrence (min doc_id over
    * holders) is the doc itself. Low novelty = the doc re-hashes earlier
    * content; the memorization/recency screen a curriculum builder runs
    * when doc_id order is ingest order. Two keyed aggs on the gram key
    * (first-holder, then join back — the gram never carries text, only its
    * string key) + one per-doc count; share is a single exact-long
    * division rounded 6 dp. */
  private def textNovelty(s: SparkSession, d: String): DataFrame = {
    val grams = fanOut(documents(s, d))
      .select(col("doc_id"),
        explode(array_distinct(TrainDataQueries.gramsOf(col("text"), 3))).as("g"))
    val first = grams.groupBy("g").agg(min("doc_id").as("first_doc"))
    grams.join(first, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
      .orderBy("doc_id")
  }

  private val textNoveltySql =
    """WITH toksrc AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(t) - 1),
      |      i -> array_to_string(t[i:i+2], ' '))) AS g
      |  FROM toksrc),
      |first AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
      |SELECT gr.doc_id, count(*) AS n_grams,
      |  round(CAST(sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
      |        AS DOUBLE) / count(*), 6) AS novelty
      |FROM grams gr JOIN first f USING (g)
      |GROUP BY gr.doc_id ORDER BY doc_id""".stripMargin

  /** N41 `heavy_hitters_exact`: two-pass heavy hitters — a Misra–Gries
    * bounded summary ([[graft.ops.TopKOps.MisraGriesAgg]], k = 40 counters,
    * mergeable so Spark combines partials map-side) generates ≤ k
    * CANDIDATES in one pass with the guarantee that every token of true
    * frequency > n/(k+1) survives; an exact re-count of just the
    * candidates (broadcast semi join — bounded work) then yields the EXACT
    * frequent-item set. This is the production pattern when "top items"
    * must be exact but the domain is too wide for a full groupBy sort:
    * pass 1 never shuffles item keys (the summary is one bounded map),
    * pass 2 shuffles only candidate rows. Oracle = the plain exact
    * threshold count (the MG stage provably cannot change the answer). */
  private def heavyHittersExact(s: SparkSession, d: String): DataFrame = {
    val k = 40
    val toks = fanOut(documents(s, d))
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
    val cands = toks
      .agg(graft.ops.TopKOps.misraGries(k, col("tok")).as("cands"))
      .select(explode(col("cands")).as("tok"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(broadcast(cands), Seq("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * (k + 1) > col("n_total"))
      .select(col("tok"), col("freq"))
      .orderBy("tok")
  }

  private val heavyHittersExactSql =
    """WITH toks AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
      |freqs AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n_total FROM freqs)
      |SELECT tok, freq FROM freqs, tot
      |WHERE freq * 41 > n_total ORDER BY tok""".stripMargin

  /** N42 `text_blocklist_filter`: the safety/content filter — docs flagged
    * by a term blocklist through the SAME one-pass Aho-Corasick matcher
    * that powers the skill taxonomy ([[graft.functions.TermMatchArray]]
    * bound to [[Tables.BlocklistTerms]]: single tokens via set membership,
    * phrases via the character automaton with word-boundary semantics) —
    * O(text) per row regardless of blocklist size, the property that makes
    * a 10⁵-term blocklist free at 100 TB where a regex bank is the
    * dominant CPU cost. Output compares the SORTED hit array (the match
    * contract orders singles by text position — sorting makes the oracle
    * order-free). */
  private def textBlocklistFilter(s: SparkSession, d: String): DataFrame =
    fanOut(documents(s, d))
      .selectExpr("doc_id", "blocklist_match(text) AS hits")
      .filter(size(col("hits")) > 0)
      .select(col("doc_id"),
        array_join(sort_array(col("hits")), ",").as("hits"),
        size(col("hits")).as("n_hits"))
      .orderBy("doc_id")

  private val textBlocklistFilterSql =
    """WITH singles AS (
      |  SELECT doc_id, list_sort(list_distinct(list_intersect(
      |    string_split(lower(text), ' '), ['slow', 'broken']))) AS st
      |  FROM documents),
      |phr AS (
      |  SELECT d.doc_id,
      |    CASE WHEN regexp_matches(lower(d.text), '\bslow merge\b')
      |         THEN ['slow merge'] ELSE [] END AS ph
      |  FROM documents d),
      |hits AS (
      |  SELECT s.doc_id, list_sort(s.st || p.ph) AS hits
      |  FROM singles s JOIN phr p USING (doc_id))
      |SELECT doc_id, array_to_string(hits, ',') AS hits,
      |       CAST(len(hits) AS INTEGER) AS n_hits
      |FROM hits WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin

  // ---- training-pipeline text ops ------------------------------------------

  /** LLM-style document chunking: token windows of 32 with stride 24
    * (overlap 8). Emits (doc_id, chunk_id, n_tokens); the chunk text itself
    * stays an array op — no shuffle until the final ordering. */
  private def textChunking(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val nChunks = greatest(
      ceil((size(toks) - lit(32)).cast("double") / 24.0).cast("int") + 1, lit(1))
    documents(s, d)
      .select(col("doc_id"), toks.as("toks"), nChunks.as("nc"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => size(slice(col("toks"), i * 24 + 1, lit(32))))))
      .select(col("doc_id"), col("pos").as("chunk_id"), col("col").as("n_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  private val textChunkingSql =
    """WITH base AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
      |chunks AS (
      |  SELECT doc_id, n,
      |         greatest(CAST(ceil((n - 32) / 24.0) AS INTEGER) + 1, 1) AS nc
      |  FROM base)
      |SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
      |       CAST(least(32, n - i * 24) AS INTEGER) AS n_tokens
      |FROM chunks, range(0, 1000) t(i)
      |WHERE i < nc
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** PII-style redaction: synthetic emails built from customer names, then
    * masked with the real regex pipeline (the redaction op a pretraining
    * pipeline runs; input synthesized since testdata has no PII). */
  private def textRedact(s: SparkSession, d: String): DataFrame = {
    val email = concat(lower(regexp_replace(col("c_name"), "#", "")),
      lit("@example.com"))
    val doc = concat(lit("contact "), email, lit(" balance "),
      col("c_acctbal").cast("string"))
    customer(s, d)
      .select(col("c_custkey"), doc.as("raw"))
      .select(col("c_custkey"),
        regexp_replace(col("raw"),
          "[a-z0-9._]+@[a-z0-9.-]+", "<EMAIL>").as("redacted"))
      .orderBy("c_custkey")
  }

  private val textRedactSql =
    """SELECT c_custkey,
      |       'contact <EMAIL> balance ' || CAST(c_acctbal AS VARCHAR) AS redacted
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** The deterministic split rule shared by `dataset_split` and
    * `dedup_split_leak`: first md5 hex digit of the doc id — 12/16 train,
    * 2/16 val, 2/16 test, reproducible on any engine (unlike rand(seed)). */
  private def splitOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = substring(md5(docId.cast("string")), 1, 1)
    when(h < "c", "train").when(h < "e", "val").otherwise("test")
  }

  /** Deterministic train/val/test split on a stable content hash (md5 —
    * reproducible on any engine, unlike rand(seed)); the sampling op every
    * dataset build needs. */
  private def datasetSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), splitOf(col("doc_id")).as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "split")

  /** `dataset_split_atomic`: the FIX `dedup_split_leak` mandates —
    * family-atomic train/val/test assignment. Near-dup clusters (the same
    * pair machinery + connected components as dedup_clusters) hash by
    * their CLUSTER id (min member), singletons by their own id, so a whole
    * dup family lands in ONE split and cross-split leakage is structurally
    * impossible (every pair's endpoints share a cluster, hence a split).
    * Output is dataset_split's (lang, split) census under the atomic rule —
    * the drift between the two censuses is the price of leak-proofing.
    * Scale: the CC runs on the PAIR graph only (family-sized); the corpus
    * just left-joins the cluster map and hashes. */
  private def datasetSplitAtomic(s: SparkSession, d: String): DataFrame =
    datasetSplitAtomicOf(fanOut(documents(s, d)))

  private[graft] def datasetSplitAtomicOf(docs: DataFrame): DataFrame = {
    val fam = docs.filter(regexp_like(col("text"), lit("\\bdup\\b")))
    // same lossless prefix-filtered candidate generation as dedup_split_leak
    val pairs = DedupOps.prefixJaccardPairs(fam, minJaccard = 0.8)
      .select("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs)
    docs.join(cc, Seq("doc_id"), "left_outer")
      .select(col("lang"),
        splitOf(coalesce(col("cluster_id"), col("doc_id"))).as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "split")
  }

  private val datasetSplitAtomicSql =
    """WITH RECURSIVE pairs AS (
      |  WITH dup_docs AS (
      |    SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |  toks AS (
      |    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |  sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |  cand AS (
      |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
      |    FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
      |    GROUP BY 1, 2)
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(node, label) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
      |cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
      |lab AS (
      |  SELECT d.lang,
      |    CASE WHEN substring(md5(CAST(coalesce(cc.cluster_id, d.doc_id) AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |         WHEN substring(md5(CAST(coalesce(cc.cluster_id, d.doc_id) AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id)
      |SELECT lang, split, count(*) AS cnt FROM lab
      |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** `dedup_split_leak`: near-dup LEAKAGE across train/val/test — the audit
    * that catches eval contamination the split itself creates: a hash split
    * scatters near-duplicate families across splits by construction, so a
    * model "generalizes" to test docs it effectively trained on. Candidate
    * pairs come from the PPJoin prefix-filtered index (lossless at t = 0.8,
    * r09) verified with exact Jaccard; pairs whose splits DIFFER aggregate per ordered
    * split pair (count + key checksum, so membership is verified, not just
    * counted). The fix a pipeline applies downstream is family-atomic
    * splitting (hash the dedup-cluster id, not the doc id); this op is the
    * detector that says you must. Scale: candidate generation is the
    * banded/bucketed story (MinHash at corpus scale), the split map is a
    * per-doc expression — no extra shuffle beyond the pair join. */
  private def dedupSplitLeak(s: SparkSession, d: String): DataFrame =
    dedupSplitLeakOf(fanOut(documents(s, d)))

  private[graft] def dedupSplitLeakOf(docs: DataFrame): DataFrame = {
    val fam = docs.filter(regexp_like(col("text"), lit("\\bdup\\b")))
    // prefix-filtered candidates (r09): lossless at t = 0.8, so the leak
    // census is exact while the pair join reads each doc's rare fifth
    // instead of its full posting list (the r08 20× probe's 15.8× ratio
    // was candidate-pair volume, and this is its largest lever)
    val pairs = DedupOps.prefixJaccardPairs(fam, minJaccard = 0.8)
    pairs
      .withColumn("split_a", splitOf(col("doc_a")))
      .withColumn("split_b", splitOf(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("doc_a") + col("doc_b")).as("key_sum"))
      .orderBy("split_a", "split_b")
  }

  private val dedupSplitLeakSql =
    """WITH dup_docs AS (
      |  SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n
      |  FROM cand c
      |  JOIN toks a ON a.doc_id = c.doc_a
      |  JOIN toks b ON b.doc_id = c.doc_b AND b.tok = a.tok
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT i.doc_a, i.doc_b
      |  FROM inter i
      |  JOIN sizes sa ON sa.doc_id = i.doc_a
      |  JOIN sizes sb ON sb.doc_id = i.doc_b
      |  WHERE i.n * 5 >= (sa.sz + sb.sz - i.n) * 4),
      |labeled AS (
      |  SELECT doc_a, doc_b,
      |    CASE WHEN substring(md5(CAST(doc_a AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |         WHEN substring(md5(CAST(doc_a AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split_a,
      |    CASE WHEN substring(md5(CAST(doc_b AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |         WHEN substring(md5(CAST(doc_b AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split_b
      |  FROM pairs)
      |SELECT split_a, split_b, count(*) AS n_pairs,
      |       CAST(sum(doc_a + doc_b) AS BIGINT) AS key_sum
      |FROM labeled WHERE split_a <> split_b
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val datasetSplitSql =
    """SELECT lang,
      |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |       ELSE 'test' END AS split,
      |  count(*) AS cnt
      |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** Vocabulary build: top-N token frequencies with rank and cumulative
    * coverage share (denominator = the FULL corpus token count) — the
    * tokenizer-training precursor. Bounded by construction: the candidate
    * set is cut to N via orderBy+limit (plans as TakeOrderedAndProject — a
    * per-partition heap + driver merge, never a global sort), so the rank
    * window only ever sees ≤ N rows. A web-scale vocabulary is hundreds of
    * millions of tokens; an unbounded global rank would single-partition it. */
  private def vocabTopk(s: SparkSession, d: String): DataFrame = {
    val n = 10000
    val counts = documents(s, d)
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum(col("freq")).as("total"))
    val top = counts.orderBy(col("freq").desc, col("token")).limit(n)
    // window input is capped at n rows by the limit above — bounded, not a
    // whole-vocabulary sort
    val wRank = Window.orderBy(col("freq").desc, col("token"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(wRank))
      .withColumn("cum_share",
        round(sum(col("freq")).over(
          wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("total"), 6))
      .drop("total")
      .orderBy("rank")
  }

  private val vocabTopkSql =
    """WITH counts AS (
      |  SELECT token, count(*) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY token),
      |ranked AS (
      |  SELECT token, freq,
      |    row_number() OVER (ORDER BY freq DESC, token) AS rank,
      |    round(CAST(sum(freq) OVER (ORDER BY freq DESC, token
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |          / CAST(sum(freq) OVER () AS DOUBLE), 6) AS cum_share
      |  FROM counts)
      |SELECT token, freq, rank, cum_share FROM ranked
      |WHERE rank <= 10000 ORDER BY rank""".stripMargin

  /** Fuzzy string similarity: edit distance of each near-dup candidate's
    * prefix against its pair partner — the verification step fuzzy-dedup
    * pipelines run after candidate generation. */
  private def textLevenshtein(s: SparkSession, d: String): DataFrame = {
    val pairs = dedupJaccard(s, d).select("doc_a", "doc_b")
    val docs = documents(s, d).select(col("doc_id"), substring(col("text"), 1, 60).as("prefix"))
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("prefix").as("pa")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("prefix").as("pb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb")).as("edit_dist"))
      .orderBy("doc_a", "doc_b")
  }

  private val textLevenshteinSql =
    """WITH dup_docs AS (
      |  SELECT doc_id, text FROM documents WHERE regexp_matches(text, '\bdup\b')),
      |toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM dup_docs),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |cand AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
      |  FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4)
      |SELECT doc_a, doc_b,
      |       CAST(levenshtein(da.prefix, db.prefix) AS INTEGER) AS edit_dist
      |FROM pairs
      |JOIN (SELECT doc_id, substring(text, 1, 60) AS prefix FROM documents) da
      |  ON da.doc_id = doc_a
      |JOIN (SELECT doc_id, substring(text, 1, 60) AS prefix FROM documents) db
      |  ON db.doc_id = doc_b
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- N4 multimodal binary plumbing ---------------------------------------

  /** Media columns as opaque binary + derived metadata — the compared part is
    * pure byte arithmetic; the decode stub itself lives in
    * [[graft.ops.MultimodalOps]] (spec-tested, not oracle-compared). */
  private def multimodalMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .select(col("doc_id"),
        length(col("media")).as("n_bytes"),
        upper(hex(expr("substring(media, 1, 8)"))).as("head_hex"),
        (lit(64) + length(col("media")) % 512).as("fake_width"),
        (lit(64) + (length(col("media")) * 7) % 512).as("fake_height"))
      .orderBy("doc_id")

  private val multimodalMetaSql =
    """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
      |       upper(hex(substring(text, 1, 8))) AS head_hex,
      |       CAST(64 + strlen(text) % 512 AS INTEGER) AS fake_width,
      |       CAST(64 + (strlen(text) * 7) % 512 AS INTEGER) AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** N4b `multimodal_frames`: the frame-sampling fan-out — every 3rd fixed
    * 256-byte "frame" per document payload (deterministic fake demux,
    * [[graft.ops.MultimodalOps.sampleFrames]]); the oracle replays the
    * slicing arithmetic over the same bytes, so the distributed flatMap's
    * row fan-out (indices, pts, tail-frame length) is compared exactly.
    * Scale: frames explode 1→n map-side with no shuffle at all — the frame
    * rows land partition-local, ready for a downstream batch featurizer. */
  private def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        lit("video/fake").as("mime")).as[graft.ops.MultimodalOps.MediaRow]
    graft.ops.MultimodalOps.sampleFrames(media, 3)
      .select(col("doc_id"), col("frame_idx"), col("pts_ms"), col("frame_len"))
      .orderBy("doc_id", "frame_idx")
  }

  private val multimodalFramesSql =
    """WITH media AS (
      |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents),
      |idx AS (
      |  SELECT doc_id, n_bytes,
      |         unnest(range(0, CAST(ceil(n_bytes / 256.0) AS BIGINT), 3)) AS frame_idx
      |  FROM media)
      |SELECT doc_id, frame_idx, frame_idx * 40 AS pts_ms,
      |       CAST(LEAST(256, n_bytes - frame_idx * 256) AS INTEGER) AS frame_len
      |FROM idx ORDER BY doc_id, frame_idx""".stripMargin

  /** N4c `multimodal_audio_chunks`: the sliding-window audio featurization
    * shape — payload read as fake 16-bit/16 kHz PCM, OVERLAPPING windows of
    * 64 samples every 48 ([[graft.ops.MultimodalOps.chunkAudio]]; hop < win
    * is what distinguishes ASR featurization from the video demux's
    * disjoint frames). The oracle replays the framing arithmetic (window
    * count, truncated tails, exact 3 ms hop starts) over the same byte
    * lengths. Scale: identical contract to N4b — lazy partition-local 1→n
    * fan-out, zero shuffle. */
  private def multimodalAudioChunks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        lit("audio/fake").as("mime")).as[graft.ops.MultimodalOps.MediaRow]
    graft.ops.MultimodalOps.chunkAudio(media, 64, 48)
      .select(col("doc_id"), col("chunk_idx"), col("start_ms"), col("win_samples"))
      .orderBy("doc_id", "chunk_idx")
  }

  private val multimodalAudioChunksSql =
    """WITH media AS (
      |  SELECT doc_id, CAST(strlen(text) // 2 AS BIGINT) AS n_samples
      |  FROM documents),
      |idx AS (
      |  SELECT doc_id, n_samples,
      |         unnest(range(0, CAST((n_samples + 47) // 48 AS BIGINT), 1))
      |           AS chunk_idx
      |  FROM media)
      |SELECT doc_id, chunk_idx, chunk_idx * 3 AS start_ms,
      |       CAST(LEAST(64, n_samples - chunk_idx * 48) AS INTEGER) AS win_samples
      |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin

  /** N4d `multimodal_video_scenes`: scene-cut segmentation over the frame
    * fan-out — per-frame content fingerprint ([[graft.ops.MultimodalOps
    * .frameFingerprints]]: integer scaled-mean-byte, the luminance-mean
    * analog; DETERMINISTIC FAKE for the codec step, real everywhere else),
    * a cut wherever the fingerprint jumps > 4000 vs the previous frame
    * (≈ the p92 frame-to-frame delta on this corpus), scenes as the
    * boundary-flag cumsum (gaps-and-islands), one segment row per scene.
    * Scale: the fan-out is partition-local (zero shuffle); ONE keyed
    * shuffle on doc_id feeds both the lag window and the scene aggregate
    * (grouping on (doc_id, scene_idx) reuses the doc_id partitioning —
    * no second exchange); frames never leave their executor with payloads
    * — the fingerprint reduces 256 bytes to one long before the shuffle. */
  private def multimodalScenes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    val media = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        lit("video/fake").as("mime")).as[graft.ops.MultimodalOps.MediaRow]
    val fps = graft.ops.MultimodalOps.frameFingerprints(
      graft.ops.MultimodalOps.sampleFrames(media, 1))
    fps.toDF()
      .withColumn("prev", lag("fp", 1).over(w))
      .withColumn("is_cut",
        when(col("prev").isNull || abs(col("fp") - col("prev")) > 4000, 1)
          .otherwise(0))
      .withColumn("scene_idx",
        sum("is_cut").over(w.rowsBetween(Long.MinValue, 0)) - 1)
      .groupBy("doc_id", "scene_idx")
      .agg(count(lit(1)).as("n_frames"),
        (min("frame_idx") * 40).as("start_ms"))
      .orderBy("doc_id", "scene_idx")
  }

  private val multimodalScenesSql =
    """WITH media AS (
      |  SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n FROM documents),
      |idx AS (
      |  SELECT doc_id, text, unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS fi
      |  FROM media),
      |frames AS (
      |  SELECT doc_id, fi,
      |         substring(text, CAST(fi * 256 + 1 AS INTEGER), 256) AS payload
      |  FROM idx),
      |chars AS (
      |  SELECT doc_id, fi, payload,
      |         unnest(range(CAST(strlen(payload) AS BIGINT))) AS ci
      |  FROM frames),
      |fps AS (
      |  SELECT doc_id, fi,
      |         (SUM(ord(substring(payload, CAST(ci + 1 AS INTEGER), 1))) * 1000)
      |           // count(*) AS fp
      |  FROM chars GROUP BY 1, 2),
      |cuts AS (
      |  SELECT doc_id, fi,
      |         CASE WHEN lag(fp) OVER w IS NULL
      |               OR abs(fp - lag(fp) OVER w) > 4000 THEN 1 ELSE 0 END AS is_cut
      |  FROM fps WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
      |scenes AS (
      |  SELECT doc_id, fi,
      |         SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY fi
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS scene_idx
      |  FROM cuts)
      |SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
      |       count(*) AS n_frames, CAST(min(fi) * 40 AS BIGINT) AS start_ms
      |FROM scenes GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- registry ------------------------------------------------------------

  def all: Seq[(String, Q)] = Seq(
    "multimodal_video_scenes" -> Q(multimodalScenes, Some(multimodalScenesSql)),
    "multimodal_frame_dedup" -> Q(multimodalFrameDedup, Some(multimodalFrameDedupSql)),
    "multimodal_audio_vad" -> Q(multimodalAudioVad, Some(multimodalAudioVadSql)),
    "text_novelty" -> Q(textNovelty, Some(textNoveltySql)),
    "multimodal_audio_chunks" -> Q(multimodalAudioChunks, Some(multimodalAudioChunksSql)),
    "dedup_exact" -> Q(dedupExact, Some(dedupExactSql)),
    "dedup_substring_spans" ->
      Q(dedupSubstringSpans, Some(dedupSubstringSpansSql)),
    "dedup_minhash" -> Q(dedupMinhash, None),
    "dedup_minhash_bound" -> Q(dedupMinhashBound, Some(dedupMinhashBoundSql)),
    "dedup_simhash" -> Q(dedupSimhash, None),
    "dedup_simhash_bound" -> Q(dedupSimhashBound, Some(dedupSimhashBoundSql)),
    "dedup_simhash_scaled" -> Q(dedupSimhashScaled, None),
    "dedup_simhash_scaled_bound" ->
      Q(dedupSimhashScaledBound, Some(dedupSimhashScaledBoundSql)),
    "dedup_simhash_auto" -> Q(dedupSimhashAuto, None),
    "dedup_simhash_auto_bound" ->
      Q(dedupSimhashAutoBound, Some(dedupSimhashScaledBoundSql)),
    "dedup_ngram_jaccard" -> Q(dedupJaccard, Some(dedupJaccardSql)),
    "dedup_containment" -> Q(dedupContainment, Some(dedupContainmentSql)),
    "dedup_prefix_jaccard" -> Q(dedupPrefixJaccard, Some(dedupPrefixJaccardSql)),
    "dedup_incremental" -> Q(dedupIncremental, Some(dedupIncrementalSql)),
    "dedup_incremental_prefix" ->
      Q(dedupIncrementalPrefix, Some(dedupIncrementalPrefixSql)),
    "dedup_clusters" -> Q(dedupClusters, Some(dedupClustersSql)),
    "dedup_pipeline" -> Q(dedupPipeline, Some(dedupPipelineSql)),
    "text_levenshtein" -> Q(textLevenshtein, Some(textLevenshteinSql)),
    "knn_cosine_topk" -> Q(knnCosine, Some(knnCosineSql)),
    "knn_matryoshka_recall" ->
      Q(knnMatryoshkaRecall, Some(knnMatryoshkaRecallSql)),
    "knn_join_blocked" -> Q(knnJoinBlocked, Some(knnJoinBlockedSql)),
    "knn_q8_rescore" -> Q(knnQ8, Some(knnQ8Sql)),
    "mine_hard_negatives" ->
      Q(mineHardNegatives, Some(mineHardNegativesSql)),
    "knn_ann_lsh" -> Q(knnAnnLsh, None),
    "knn_ann_lsh_bound" -> Q(knnAnnLshBound, Some(annRecallBoundSql)),
    "knn_ann_ivf" -> Q(knnAnnIvf, None),
    "knn_ann_ivf_bound" -> Q(knnAnnIvfBound, Some(annRecallBoundSql)),
    "knn_ann_pq" -> Q(knnAnnPq, None),
    "knn_ann_pq_bound" -> Q(knnAnnPqBound, Some(annRecallBoundSql)),
    "dedup_embedding" -> Q(dedupEmbedding, Some(dedupEmbeddingSql)),
    "dedup_embedding_lsh" -> Q(dedupEmbeddingLsh, None),
    "dedup_embedding_lsh_bound" ->
      Q(dedupEmbeddingLshBound, Some(dedupEmbeddingLshBoundSql)),
    "udaf_vector_centroid" -> Q(vectorCentroid, Some(vectorCentroidSql)),
    "text_token_stats" -> Q(tokenStats, Some(tokenStatsSql)),
    "lang_id" -> Q(langId, Some(langIdSql)),
    "quality_score" -> Q(qualityScore, Some(qualityScoreSql)),
    "score_standardize_by_source" ->
      Q(scoreStandardizeBySource, Some(scoreStandardizeBySourceSql)),
    "doc_fingerprint" -> Q(docFingerprint, Some(docFingerprintSql)),
    "doc_winnowing" -> Q(docWinnowing, Some(docWinnowingSql)),
    "heavy_hitters_exact" -> Q(heavyHittersExact, Some(heavyHittersExactSql)),
    "text_blocklist_filter" -> Q(textBlocklistFilter, Some(textBlocklistFilterSql)),
    "multimodal_meta" -> Q(multimodalMeta, Some(multimodalMetaSql)),
    "multimodal_frames" -> Q(multimodalFrames, Some(multimodalFramesSql)),
    "text_chunking" -> Q(textChunking, Some(textChunkingSql)),
    "text_redact" -> Q(textRedact, Some(textRedactSql)),
    "dataset_split" -> Q(datasetSplit, Some(datasetSplitSql)),
    "dedup_split_leak" -> Q(dedupSplitLeak, Some(dedupSplitLeakSql)),
    "dataset_split_atomic" -> Q(datasetSplitAtomic, Some(datasetSplitAtomicSql)),
    "vocab_topk" -> Q(vocabTopk, Some(vocabTopkSql)),
  )
}
