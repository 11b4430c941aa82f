package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators beyond the dedup/similarity family
  * (SURVEY.md §2.11 N5–N10): benchmark decontamination, deterministic
  * stratified sampling, sequence packing, intra-document repetition scoring
  * (Gopher-style quality rule), TF-IDF term ranking, and per-domain caps.
  * All run over the `documents` table; every query is DuckDB-oracle-checked.
  *
  * Scale notes are per-query; the common rule: anything per-document is
  * scan-shaped (no shuffle), anything per-key (domain, language, term)
  * shuffles once on that key, and nothing ever windows over the whole
  * corpus unpartitioned.
  */
object TrainDataQueries {
  import Tables._

  private def toks: Column = split(lower(col("text")), "\\s+")

  /** Word n-grams of a text column as strings ("tok1 tok2 ... tokN"),
    * empty when the doc is shorter than n. Pure per-row array math — no
    * shuffle. Shared with the streaming form (StreamOps.decontamStream).
    * Since r06 the gram build is the native codegen expression
    * [[graft.functions.WordGrams]] — byte-identical output to the old
    * `transform(sequence, array_join(slice))` HOF, without its interpreted
    * per-element lambda dispatch (the gram build dominated every
    * gate/decontam-shaped corpus pass). */
  private[graft] def gramsOf(text: Column, n: Int): Column =
    graft.functions.WordGrams(split(lower(text), "\\s+"), n)

  private def grams(n: Int): Column = gramsOf(col("text"), n)

  /** Shared oracle fragment: per-doc token list + n-gram list.
    * DuckDB list slicing is 1-based inclusive, range() end-exclusive. */
  private def gramsCte(n: Int): String =
    s"""toksrc AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
       |gramsrc AS (
       |  SELECT doc_id,
       |         list_transform(range(1, len(t) - ${n - 2}),
       |                        i -> array_to_string(t[i:i+${n - 1}], ' ')) AS grams
       |  FROM toksrc)""".stripMargin

  // ---- N5 decontam_overlap: benchmark decontamination ----------------------

  /** Eval-set decontamination: which training docs share any 5-gram with
    * the benchmark set (here: every 53rd doc stands in for the eval set)?
    * Emits contaminated doc → count of distinct shared 5-grams.
    *
    * 100 TB shape: the benchmark side is an eval set — tiny by definition —
    * so its distinct-gram set BROADCASTs; corpus grams are filtered
    * map-side by the broadcast hash join before the only shuffle (the
    * per-doc count). The corpus never self-joins and never shuffles its
    * n-grams on the gram key. */
  /** Parametrized form: corpus and eval set as separate frames (ScaleProbe
    * grows the corpus while pinning the eval set — the real shape: the
    * benchmark side is fixed-size no matter how big the corpus gets). */
  private[graft] def decontamOverlapOf(corpus: DataFrame, benchDocs: DataFrame): DataFrame = {
    val g = corpus
      .select(col("doc_id"), explode(array_distinct(grams(5))).as("gram"))
    val bench = benchDocs
      .select(explode(array_distinct(grams(5))).as("gram")).distinct()
    g.join(broadcast(bench), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  private def decontamOverlap(s: SparkSession, d: String): DataFrame = {
    val docs = fanOut(documents(s, d))
    decontamOverlapOf(
      docs.filter(col("doc_id") % 53 =!= 0),
      docs.filter(col("doc_id") % 53 === 0)).orderBy("doc_id")
  }

  private[graft] val decontamOverlapSql =
    s"""WITH ${gramsCte(5)},
       |grams AS (
       |  SELECT DISTINCT doc_id, unnest(grams) AS gram FROM gramsrc),
       |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 53 = 0)
       |SELECT g.doc_id, count(*) AS n_shared
       |FROM grams g JOIN bench b USING (gram)
       |WHERE g.doc_id % 53 <> 0
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---- N5b decontam_bloom: Bloom-prefiltered exact decontamination ---------

  /** `decontam_overlap`'s answer through the industrial-scale plan: the
    * eval set's distinct 5-grams fold into a distributed Bloom filter
    * ([[graft.ops.BloomOps]], ~8 bits/gram, sized for a 64k-gram eval set
    * — bounded by definition; overshoot only raises fpp), and corpus grams
    * are gated by the codegen'd `might_contain` INSIDE the same
    * whole-stage-codegen span as the explode — non-candidate grams (the
    * overwhelming case on a clean corpus) die before any join probe or
    * shuffle. Candidates then exact-verify against the real gram set
    * (broadcast), so Bloom false positives die there and the result is
    * oracle-identical to `decontam_overlap` (spec-asserted).
    *
    * (An earlier form gated whole docs with a `filter()` HOF lambda over
    * the gram array; ArrayFilter is CodegenFallback, and the interpreted
    * per-gram probe cost 2.3× the plain broadcast join at sf0.1 — the
    * codegen'd post-explode gate is the fast form.)
    *
    * 100 TB shape vs N5: N5's broadcast of the raw gram STRINGS caps the
    * eval-set size; the Bloom probe carries the same selectivity in KBs,
    * so when the eval set outgrows broadcast and the verify join goes
    * shuffle, only the ~contaminated sliver of corpus grams crosses it. */
  private[graft] def decontamBloomOf(corpus: DataFrame, benchDocs: DataFrame): DataFrame = {
    // The eval gram set feeds BOTH the Bloom build and the exact-verify
    // broadcast; pin it (aggregate-sized — it IS the eval set) so the
    // source scan behind it runs once, not once per consumer.
    val bench = benchDocs
      .select(explode(array_distinct(grams(5))).as("gram")).distinct()
      .localCheckpoint(false)
    // filter builds as a scalar subquery INSIDE this query (one execution,
    // no driver round trip) — InjectRuntimeFilter's shape, placed by hand
    val gate = graft.ops.BloomOps.mightContainSubquery(
      bench, col("gram"), col("gram"), expectedItems = 1L << 16, fpp = 0.01)
    corpus
      .select(col("doc_id"), explode(array_distinct(grams(5))).as("gram"))
      .filter(gate)
      .join(broadcast(bench), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  private def decontamBloom(s: SparkSession, d: String): DataFrame = {
    val docs = fanOut(documents(s, d))
    decontamBloomOf(
      docs.filter(col("doc_id") % 53 =!= 0),
      docs.filter(col("doc_id") % 53 === 0)).orderBy("doc_id")
  }

  // ---- N6 sample_stratified: deterministic per-stratum sampling ------------

  /** Language-stratified downsampling with an engine-portable decision:
    * keep a doc when the md5-hex prefix of its id clears the stratum's
    * threshold (en ≈ 50%, others ≈ 25%) — the mixture-rebalancing step of
    * a pretraining pipeline. Content-hash gating means any engine (and any
    * retry) keeps exactly the same rows; one scan computes kept and total
    * per stratum. Scan + one keyed agg — nothing else. */
  private def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    val thresh = when(col("lang") === "en", lit("8")).otherwise(lit("4"))
    documents(s, d)
      .select(col("lang"), (h < thresh).as("keep"))
      .groupBy("lang")
      .agg(count(when(col("keep"), lit(1))).as("kept"),
        count(lit(1)).as("total"))
      .orderBy("lang")
  }

  private val sampleStratifiedSql =
    """SELECT lang,
      |  count(*) FILTER (WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |    < CASE WHEN lang = 'en' THEN '8' ELSE '4' END) AS kept,
      |  count(*) AS total
      |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin

  // ---- N6b sample_weighted: deterministic weighted reservoir ----------------

  /** Distributed weighted sampling (Efraimidis–Spirakis A-Res): top-5 docs
    * per language by key u^(1/w), w = n_chars — longer docs proportionally
    * likelier, yet every engine/retry picks the SAME sample. u comes from a
    * pure-integer Knuth multiplicative hash of doc_id (exact in any
    * engine); the only libm op (pow) is rounded to 6 dp BEFORE ranking
    * (the tfidf round-before-rank rule) with doc_id as the tiebreak. One
    * scan + one per-stratum top-k window — the W1-bounded shape, never a
    * global sort. */
  private def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = ((col("doc_id") * lit(2654435761L)) % lit(2147483647L))
      .cast("double") / lit(2147483647.0)
    val key = round(pow(u, lit(1.0) / col("n_chars")), 6)
    val w = Window.partitionBy("lang").orderBy(col("key").desc, col("doc_id"))
    documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"), key.as("key"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .orderBy("lang", "rn")
  }

  private val sampleWeightedSql =
    """WITH k AS (
      |  SELECT lang, doc_id, n_chars,
      |         round(pow(((doc_id * 2654435761) % 2147483647)
      |                     / CAST(2147483647 AS DOUBLE),
      |                   CAST(1 AS DOUBLE) / n_chars), 6) AS key
      |  FROM documents)
      |SELECT lang, doc_id, n_chars, key, rn FROM (
      |  SELECT k.*, row_number() OVER (PARTITION BY lang
      |                                 ORDER BY key DESC, doc_id) AS rn
      |  FROM k)
      |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin

  // ---- N6c sample_reservoir: deterministic bottom-k uniform sample ---------

  /** Fixed-size uniform corpus sample via bottom-k hashing: the 64 docs
    * with the smallest md5(doc_id) — equivalent to a uniform reservoir
    * sample but fully deterministic and MERGEABLE (the bottom-k of a union
    * is the bottom-k of the per-shard bottom-ks), which is what makes it a
    * one-pass distributed primitive: each partition keeps ≤ 64 rows, one
    * reducer merges (TakeOrdered — the corpus never shuffles). The same
    * sketch doubles as the KMV cardinality estimator and, re-run after any
    * pipeline stage, as a stable eyeball-diff panel (the sample only
    * changes where the corpus did). */
  private def sampleReservoir(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col("doc_id").cast("string"))
    val top = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), h.as("h"))
      .orderBy("h", "doc_id").limit(64)
    top.withColumn("rank",
      row_number().over(Window.orderBy("h", "doc_id")))
  }

  private val sampleReservoirSql =
    """SELECT doc_id, lang, source, h,
      |       CAST(row_number() OVER (ORDER BY h, doc_id) AS INTEGER) AS rank
      |FROM (SELECT doc_id, lang, source,
      |             md5(CAST(doc_id AS VARCHAR)) AS h
      |      FROM documents
      |      ORDER BY h, doc_id LIMIT 64)
      |ORDER BY rank""".stripMargin

  // ---- N3b text_entropy: per-doc token Shannon entropy ---------------------

  /** Unigram Shannon entropy per document (bits) — the vocabulary-diversity
    * quality signal (low entropy ⇒ repetitive/boilerplate, the cheap
    * complement of `repetition_ratio`; high ⇒ diverse text). Computed as
    * H = log2(n) − (Σ c·log2(c))/n over the doc's token counts c.
    * Determinism: the one libm call (log2) rounds to 6 dp per DISTINCT
    * count value, the term c·log2(c) is then an exact decimal×integer
    * product (NO round after the multiply — the −p·log2 p formulation
    * rounded each p·r product, whose small-denominator decimal expansions
    * sit exactly on .0000005 boundaries where Spark's string-based round
    * and DuckDB's binary round disagree; 3/500 docs hit it), the per-doc
    * sum runs in exact DECIMAL, and only the final quotient rounds (4 dp,
    * the lm_bigram precedent).
    *
    * 100 TB shape: one explode to (doc, token) pairs, one keyed agg on
    * (doc_id, w) with map-side combine, then a re-key to doc_id shared by
    * the totals agg and the join (both sides hash-partition on doc_id, so
    * the join itself adds no third Exchange). Text crosses the cluster as
    * tokens once; nothing is corpus-global. */
  private[graft] def textEntropyOf(docs: DataFrame): DataFrame = {
    val occ = docs.select(col("doc_id"), explode(toks).as("w"))
    val counts = occ.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("doc_id")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    counts
      .select(col("doc_id"),
        (col("c") * round(log2(col("c").cast("double")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("term"))
      .groupBy("doc_id")
      .agg(sum(col("term")).as("s"))
      .join(totals, Seq("doc_id"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
        round(round(log2(col("n").cast("double")), 6) -
          col("s").cast("double") / col("n"), 4).as("entropy_bits"))
  }

  private def textEntropy(s: SparkSession, d: String): DataFrame =
    textEntropyOf(documents(s, d)).orderBy("doc_id")

  private val textEntropySql =
    """WITH toksrc AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |occ AS (SELECT doc_id, unnest(t) AS w FROM toksrc),
      |counts AS (SELECT doc_id, w, count(*) AS c FROM occ GROUP BY 1, 2),
      |totals AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |                  count(*) AS n_distinct
      |           FROM counts GROUP BY 1),
      |sums AS (
      |  SELECT doc_id,
      |    sum(c * CAST(round(log2(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6))) AS s
      |  FROM counts GROUP BY 1)
      |SELECT doc_id, n AS n_tokens, n_distinct,
      |       round(round(log2(CAST(n AS DOUBLE)), 6)
      |             - CAST(s AS DOUBLE) / n, 4) AS entropy_bits
      |FROM sums JOIN totals USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---- N7 pack_sequences: token-budget packing -----------------------------

  /** Contiguous sequence packing: per language stream, docs in id order
    * fill 4096-token bins; a doc belongs to the bin its running prefix
    * starts in. Emits per-bin doc count and token totals — the "how many
    * training sequences does this corpus make" query.
    *
    *  Packing is inherently sequential WITHIN a stream, so the window is
    *  partitioned by the stream key (language here; shard id at 100 TB) —
    *  the corpus-wide unpartitioned-window trap does not apply. */
  /** Parametrized form (ScaleProbe amplifies `docs` AND the stream-key
    * cardinality — at real scale the partition key is a shard id, so the
    * probe must scale the key space with the data). */
  private[graft] def packSequencesOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
    docs
      .select(col("lang"), col("doc_id"), size(toks).as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("bin_id",
        floor((col("cum") - col("n_toks")) / 4096.0).cast("long"))
      .groupBy("lang", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"))
  }

  private def packSequences(s: SparkSession, d: String): DataFrame =
    packSequencesOf(documents(s, d)).orderBy("lang", "bin_id")

  private val packSequencesSql =
    """WITH base AS (
      |  SELECT lang, doc_id, len(string_split(lower(text), ' ')) AS n_toks
      |  FROM documents),
      |cum AS (
      |  SELECT lang, n_toks,
      |         sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
      |  FROM base)
      |SELECT lang, CAST(floor((cum - n_toks) / 4096.0) AS BIGINT) AS bin_id,
      |       count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS total_tokens
      |FROM cum GROUP BY 1, 2 ORDER BY lang, bin_id""".stripMargin

  // ---- N8 repetition_ratio: Gopher-style intra-doc repetition --------------

  /** Duplicate-3-gram fraction per document — the "repetitious text" rule
    * of quality filtering (Gopher rule family): 1 − distinct/total 3-grams.
    * Pure per-row array math; exact rational arithmetic in double, so any
    * engine reproduces it bit-for-bit. Scan-shaped, no shuffle. */
  private def repetitionRatio(s: SparkSession, d: String): DataFrame = {
    val g = grams(3)
    documents(s, d)
      .select(col("doc_id"), size(g).as("n_grams"),
        size(array_distinct(g)).as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
      .orderBy("doc_id")
  }

  private val repetitionRatioSql =
    s"""WITH ${gramsCte(3)}
       |SELECT doc_id,
       |  CAST(len(grams) AS INTEGER) AS n_grams,
       |  CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
       |  round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
       |    AS rep_ratio
       |FROM gramsrc ORDER BY doc_id""".stripMargin

  // ---- N9b text_rake_keywords: phrase-level keyword extraction -------------

  /** `text_rake_keywords`: RAKE (Rose et al. 2010) over the corpus — the
    * PHRASE-level keyword extractor beside [[tfidfTopkOf]]'s single-term
    * ranking (multi-word content phrases are what a topic/tag pipeline
    * actually wants; tf-idf fragments them). Candidate phrases are the
    * maximal stopword-free token runs: stopwords map to a delimiter
    * in-array (one transform — no regex backtracking over the document),
    * the array re-joins and splits on it, empties filtered. Word score =
    * deg(w)/freq(w) with deg summing the LENGTH of every phrase occurrence
    * containing w (RAKE's co-occurrence degree, self included); phrase
    * score = Σ word scores, each word score rounded to 6 dp and
    * DECIMAL-summed (the rounded-term discipline — one IEEE division per
    * word, engine-identical). Output: top-20 phrases by (score, phrase).
    * Scale: two vocabulary-bounded keyed aggs (word stats broadcast back
    * onto the phrase dictionary), phrase dictionary bounded by distinct
    * phrase strings, top-k via TakeOrdered — never a global sort. */
  private[graft] def textRakeKeywordsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val stop = Seq("the", "a")
    val tokens = split(lower(col("text")), "\\s+")
    val marked = transform(tokens,
      t => when(t.isInCollection(stop), lit("|")).otherwise(t))
    val phrases = filter(
      transform(split(array_join(marked, " "), "\\|"), p => trim(p)),
      p => p =!= "")
    val occ = docs.select(explode(phrases).as("phrase")).localCheckpoint(false)
    val wordOcc = occ.select(col("phrase"),
        explode(split(col("phrase"), " ")).as("w"),
        size(split(col("phrase"), " ")).as("plen"))
    val wstats = wordOcc.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("w"),
        round(col("deg").cast("double") / col("freq").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("wscore"))
    val dict = occ.groupBy("phrase").agg(count(lit(1)).as("n_occurrences"))
    val pscore = dict.select(col("phrase"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(broadcast(wstats), "w")
      .groupBy("phrase").agg(sum(col("wscore")).as("sc"))
    dict.join(pscore, "phrase")
      .select(col("phrase"), col("n_occurrences"),
        col("sc").cast("double").as("rake_score"))
      .orderBy(col("rake_score").desc, col("phrase"))
      .limit(20)
  }

  private def textRakeKeywords(s: SparkSession, d: String): DataFrame =
    textRakeKeywordsOf(documents(s, d))

  private val textRakeKeywordsSql =
    """WITH occ AS (
      |  SELECT trim(p) AS phrase FROM (
      |    SELECT unnest(string_split(array_to_string(
      |      list_transform(string_split(lower(text), ' '),
      |        t -> CASE WHEN t IN ('the', 'a') THEN '|' ELSE t END),
      |      ' '), '|')) AS p
      |    FROM documents)
      |  WHERE trim(p) <> ''),
      |wordocc AS (
      |  SELECT phrase, unnest(string_split(phrase, ' ')) AS w,
      |         len(string_split(phrase, ' ')) AS plen
      |  FROM occ),
      |wstats AS (
      |  SELECT w, CAST(round(CAST(SUM(plen) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS wscore
      |  FROM wordocc GROUP BY w),
      |dict AS (SELECT phrase, count(*) AS n_occurrences FROM occ GROUP BY 1),
      |pw AS (
      |  SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM dict),
      |ps AS (
      |  SELECT pw.phrase, SUM(ws.wscore) AS sc
      |  FROM pw JOIN wstats ws ON pw.w = ws.w GROUP BY 1)
      |SELECT d.phrase, d.n_occurrences, CAST(ps.sc AS DOUBLE) AS rake_score
      |FROM dict d JOIN ps ON d.phrase = ps.phrase
      |ORDER BY rake_score DESC, d.phrase LIMIT 20""".stripMargin

  // ---- N9 tfidf_topk: per-document term ranking ----------------------------

  /** Top-3 TF-IDF terms per document: tf from one (doc, term) aggregation,
    * df from re-aggregating that same result (the shuffle on (doc, term) is
    * planned once and reused), idf = ln(N/df) with the score rounded to 4
    * decimals BEFORE ranking so float last-ulp differences can never flip
    * an order across engines (ties break on the term itself).
    *
    * 100 TB shape: both aggs are keyed map-side-combine shuffles; the
    * tf⋈df join shuffles on the term key; the ranking window partitions by
    * doc_id (bounded per-doc term count) — no global window, no broadcast
    * of anything unbounded. */
  /** Parametrized form (ScaleProbe amplifies `docs`). */
  private[graft] def tfidfTopkOf(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df_, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("score"), col("rk"))
  }

  private def tfidfTopk(s: SparkSession, d: String): DataFrame =
    tfidfTopkOf(fanOut(documents(s, d))).orderBy("doc_id", "rk")

  private val tfidfTopkSql =
    """WITH tfc AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tfc GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT t.doc_id, t.term, t.tf,
      |         round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 4) AS score
      |  FROM tf t JOIN df d USING (term), n),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY score DESC, term) AS rk
      |  FROM scored)
      |SELECT doc_id, term, tf, score, CAST(rk AS INTEGER) AS rk
      |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // ---- N10 domain_cap: per-source document caps ----------------------------

  /** Per-domain contribution cap: keep at most 15 docs per source (best
    * first: longest, then id for determinism) — the anti-domination rule
    * that stops one crawl domain from flooding the mixture. The window
    * partitions by source (per-domain cardinality), so the heaviest domain
    * bounds a single partition's sort, never the corpus. At real scale the
    * same shape runs per (source, shard) with a second capped pass when a
    * domain overflows one shard. */
  private def domainCap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    documents(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 15)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
      .orderBy("source")
  }

  private val domainCapSql =
    """WITH ranked AS (
      |  SELECT source, n_chars,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
      |FROM ranked WHERE rk <= 15
      |GROUP BY 1 ORDER BY source""".stripMargin

  // ---- N11 quality_gate: composite Gopher-style document filter ------------

  /** The multi-rule keep/drop decision a pretraining filter actually makes,
    * with per-document failure reasons: too short (<20 tokens), repetitive
    * (dup 3-grams > 20%), low type-token diversity (<0.4), and mean word
    * length outside [3, 10]. Every rule compares INTEGERS (cross-multiplied
    * thresholds), so any engine reproduces the decision exactly — no float
    * thresholds to disagree over. Scan-shaped: per-row array math only. */
  /** The gate's failure-reasons expression over a text column — shared
    * with the streaming ingest pipeline (empty string = keep). */
  private[graft] def qualityReasonsOf(text: Column): Column = {
    val t = split(lower(text), "\\s+")
    val g = gramsOf(text, 3)
    val n = size(t)
    val nd = size(array_distinct(t))
    val ngr = size(g)
    val ngd = size(array_distinct(g))
    val sumlen = aggregate(t, lit(0L), (acc, x) => acc + length(x))
    concat_ws(",",
      when(nd * 5 < n * 2, lit("low_diversity")),
      when((ngr - ngd) * 5 > ngr, lit("too_repetitive")),
      when(n < 20, lit("too_short")),
      when(sumlen < n * 3L || sumlen > n * 10L, lit("word_length")))
  }

  private def qualityGate(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), qualityReasonsOf(col("text")).as("reasons"))
      .select(col("doc_id"), (col("reasons") === "").as("keep"), col("reasons"))
      .orderBy("doc_id")

  private val qualityGateSql =
    s"""WITH ${gramsCte(3)},
       |m AS (
       |  SELECT g.doc_id,
       |    len(t.t) AS n, len(list_distinct(t.t)) AS nd,
       |    CAST(list_sum(list_transform(t.t, x -> length(x))) AS BIGINT) AS sumlen,
       |    len(g.grams) AS ngr, len(list_distinct(g.grams)) AS ngd
       |  FROM gramsrc g JOIN toksrc t USING (doc_id)),
       |r AS (
       |  SELECT doc_id,
       |    concat_ws(',',
       |      CASE WHEN nd * 5 < n * 2 THEN 'low_diversity' END,
       |      CASE WHEN (ngr - ngd) * 5 > ngr THEN 'too_repetitive' END,
       |      CASE WHEN n < 20 THEN 'too_short' END,
       |      CASE WHEN sumlen < n * 3 OR sumlen > n * 10 THEN 'word_length' END)
       |      AS reasons
       |  FROM m)
       |SELECT doc_id, reasons = '' AS keep, reasons FROM r
       |ORDER BY doc_id""".stripMargin

  // ---- N11b curation_e2e: the whole curation pipeline, one oracle ----------

  /** `curation_e2e`: gate → exact-dedup → stratified-sample as ONE query
    * with ONE DuckDB oracle — the "a user can run the whole pipeline and
    * get engine-identical output" statement (each stage is also proven
    * standalone: quality_gate, dedup_exact, sample_stratified).
    *
    * 100 TB shape: the gate is scan-shaped (per-row expressions only, no
    * shuffle); dedup costs one hash shuffle on the normalized-text key
    * with the surviving ids rejoined as a broadcast semi join (bare longs,
    * tiny next to text); the sample is a map-side hash gate; the report is
    * one keyed agg. Net: ONE corpus-sized shuffle end to end. */
  /** The gate as a STAGED filter. [[qualityReasonsOf]] is one expression
    * tree whose subtrees re-tokenize the doc ~12× per evaluation —
    * higher-order functions run interpreted, where there is NO common-
    * subexpression elimination (measured 1.2 ms/doc: the whole sf0.1 gate
    * pass was 6.1 s). Staging tokens → grams → rule stats as materialized
    * columns makes each run once; the nondeterministic `__b` columns are
    * deliberate pushdown barriers — predicate pushdown SUBSTITUTES aliases
    * while pushing through any deterministic Project, which would inline
    * the staging right back into one big per-row expression. Results are
    * identical to `qualityReasonsOf === ""` (spec-asserted). */
  private[graft] def gateKeepStaged(df: DataFrame): DataFrame = {
    val t = split(lower(col("text")), "\\s+")
    val g = graft.functions.WordGrams(col("__t"), 3)
    df.select(col("*"), t.as("__t"), monotonically_increasing_id().as("__b1"))
      .select(col("*"), g.as("__g"),
        size(col("__t")).as("__n"),
        size(array_distinct(col("__t"))).as("__nd"),
        aggregate(col("__t"), lit(0L), (acc, x) => acc + length(x)).as("__sumlen"),
        monotonically_increasing_id().as("__b2"))
      .select(col("*"), size(col("__g")).as("__ngr"),
        size(array_distinct(col("__g"))).as("__ngd"),
        monotonically_increasing_id().as("__b3"))
      .filter(!(col("__nd") * 5 < col("__n") * 2) &&
        !((col("__ngr") - col("__ngd")) * 5 > col("__ngr")) &&
        !(col("__n") < 20) &&
        !(col("__sumlen") < col("__n") * 3 || col("__sumlen") > col("__n") * 10))
      .drop("__t", "__g", "__n", "__nd", "__ngr", "__ngd", "__sumlen",
        "__b1", "__b2", "__b3")
  }

  private def curationE2e(s: SparkSession, d: String): DataFrame = {
    val gated = gateKeepStaged(fanOut(documents(s, d)))
      .withColumn("nt", graft.ops.DedupOps.normalizedText(col("text")))
    // keep-lowest per normalized text as a single-pass argmin aggregate:
    // a min-ids + semi-join-back formulation would re-evaluate the whole
    // gate stage for the second branch (plans are trees, not DAGs)
    val kept = gated.groupBy("nt")
      .agg(min_by(struct(col("doc_id"), col("lang"), col("text")),
        col("doc_id")).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.lang").as("lang"),
        col("k.text").as("text"))
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    val thresh = when(col("lang") === "en", lit("8")).otherwise(lit("4"))
    kept.filter(h < thresh)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), "\\s+"))).cast("long").as("n_tokens"))
      .orderBy("lang")
  }

  private val curationE2eSql =
    s"""WITH ${gramsCte(3)},
       |m AS (
       |  SELECT g.doc_id,
       |    len(t.t) AS n, len(list_distinct(t.t)) AS nd,
       |    CAST(list_sum(list_transform(t.t, x -> length(x))) AS BIGINT) AS sumlen,
       |    len(g.grams) AS ngr, len(list_distinct(g.grams)) AS ngd
       |  FROM gramsrc g JOIN toksrc t USING (doc_id)),
       |gated AS (
       |  SELECT doc_id FROM m
       |  WHERE NOT (nd * 5 < n * 2) AND NOT ((ngr - ngd) * 5 > ngr)
       |    AND NOT (n < 20) AND NOT (sumlen < n * 3 OR sumlen > n * 10)),
       |norm AS (
       |  SELECT d.doc_id, d.lang, d.text,
       |    trim(regexp_replace(regexp_replace(d.text, '\\bdup\\b', ' ', 'g'),
       |                        '\\s+', ' ', 'g')) AS nt
       |  FROM documents d JOIN gated g USING (doc_id)),
       |keep AS (SELECT nt, min(doc_id) AS doc_id FROM norm GROUP BY 1),
       |sampled AS (
       |  SELECT n.lang, n.text FROM norm n JOIN keep k ON n.doc_id = k.doc_id
       |  WHERE substring(md5(CAST(n.doc_id AS VARCHAR)), 1, 1)
       |        < CASE WHEN n.lang = 'en' THEN '8' ELSE '4' END)
       |SELECT lang, count(*) AS n_docs,
       |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |FROM sampled GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- N13 corpus_report: the single-scan mixture dashboard ----------------

  /** The "what does my training mix look like" report: per language, doc
    * and token counts plus how many docs clear each quality rule — ALL
    * computed in one scan with conditional aggregation (no per-metric
    * passes, no joins). The rules are the same integer-exact comparisons as
    * quality_gate, so the report and the gate can never disagree. */
  private def corpusReport(s: SparkSession, d: String): DataFrame = {
    val t = toks
    val g = grams(3)
    val n = size(t)
    val nd = size(array_distinct(t))
    val ngr = size(g)
    val ngd = size(array_distinct(g))
    val sumlen = aggregate(t, lit(0L), (acc, x) => acc + length(x))
    val pass = !(nd * 5 < n * 2) && !((ngr - ngd) * 5 > ngr) &&
      !(n < 20) && !(sumlen < n * 3L || sumlen > n * 10L)
    documents(s, d)
      .select(col("lang"), n.as("n"), pass.as("pass"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n").cast("long")).as("n_tokens"),
        count(when(col("pass"), lit(1))).as("n_quality_pass"),
        count(when(col("n") < 20, lit(1))).as("n_short"))
      .orderBy("lang")
  }

  private val corpusReportSql =
    s"""WITH ${gramsCte(3)},
       |m AS (
       |  SELECT t.doc_id, dd.lang,
       |    len(t.t) AS n, len(list_distinct(t.t)) AS nd,
       |    CAST(list_sum(list_transform(t.t, x -> length(x))) AS BIGINT) AS sumlen,
       |    len(g.grams) AS ngr, len(list_distinct(g.grams)) AS ngd
       |  FROM toksrc t JOIN gramsrc g USING (doc_id)
       |  JOIN documents dd USING (doc_id))
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n) AS BIGINT) AS n_tokens,
       |  count(*) FILTER (WHERE NOT (nd * 5 < n * 2)
       |    AND NOT ((ngr - ngd) * 5 > ngr) AND NOT (n < 20)
       |    AND NOT (sumlen < n * 3 OR sumlen > n * 10)) AS n_quality_pass,
       |  count(*) FILTER (WHERE n < 20) AS n_short
       |FROM m GROUP BY 1 ORDER BY lang""".stripMargin

  // ---- N14 text_normalize: accent folding + punctuation/whitespace cleanup -

  /** The canonical text-cleanup chain of a pretraining pipeline: lowercase,
    * fold accents (explicit translate table — the SAME table on both
    * engines, so no locale/ICU dependence), strip punctuation, collapse
    * whitespace. Dirty input is synthesized ON the part names (accents
    * injected + trailing punctuation) so the round trip is provable:
    * norm must equal the original clean name. Scan-shaped. */
  private def textNormalize(s: SparkSession, d: String): DataFrame = {
    val dirty = concat(translate(col("p_name"), "aeo", "áéö"), lit("!!"))
    val norm = trim(regexp_replace(regexp_replace(
      translate(lower(dirty), "áéö", "aeo"), "[!,.;:]", ""), "\\s+", " "))
    part(s, d)
      .select(col("p_partkey"), dirty.as("raw"), norm.as("norm"),
        (norm === col("p_name")).as("roundtrip"))
      .orderBy("p_partkey")
  }

  private val textNormalizeSql =
    """SELECT p_partkey,
      |  translate(p_name, 'aeo', 'áéö') || '!!' AS raw,
      |  trim(regexp_replace(regexp_replace(
      |    translate(lower(translate(p_name, 'aeo', 'áéö') || '!!'),
      |              'áéö', 'aeo'),
      |    '[!,.;:]', '', 'g'), '\s+', ' ', 'g')) AS norm,
      |  trim(regexp_replace(regexp_replace(
      |    translate(lower(translate(p_name, 'aeo', 'áéö') || '!!'),
      |              'áéö', 'aeo'),
      |    '[!,.;:]', '', 'g'), '\s+', ' ', 'g')) = p_name AS roundtrip
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---- N14b text_pii_redact: PII masking (emails/phones) -------------------

  /** `text_pii_redact`: the privacy scrub every pretraining corpus runs
    * before release — emails and phone numbers replaced with typed mask
    * tokens, with per-doc match counts and a residual-PII audit bit. The
    * synthetic corpus is PII-free, so PII is INJECTED deterministically
    * in-query (doc_id%3 docs get an email derived from doc_id, doc_id%5
    * docs a NANP-style phone; both ride the same expression on both
    * engines) — the redaction provably fires and the `clean` audit column
    * proves it removed everything it counted. Regexes stay in the
    * Java∩RE2 common dialect (char classes + bounded quantifiers, no
    * backrefs/lookaround) so Spark and DuckDB match identically.
    * Scan-shaped: pure per-row expressions, no shuffle except the
    * determinism sort; at 100 TB this is a map-only pass that pipelines
    * into the scan (codegen regexps), the shape a redaction sweep must
    * keep — never a UDF, never a collect. */
  private val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val piiPhoneRe = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"

  private def textPiiRedact(s: SparkSession, d: String): DataFrame = {
    val withPii = concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call +1 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    val redacted = regexp_replace(
      regexp_replace(withPii, piiEmailRe, "[EMAIL]"), piiPhoneRe, "[PHONE]")
    documents(s, d)
      .select(col("doc_id"),
        regexp_count(withPii, lit(piiEmailRe)).cast("long").as("n_emails"),
        regexp_count(withPii, lit(piiPhoneRe)).cast("long").as("n_phones"),
        redacted.as("redacted"),
        (!(redacted.rlike(piiEmailRe) || redacted.rlike(piiPhoneRe))).as("clean"))
      .orderBy("doc_id")
  }

  private val textPiiRedactSql =
    s"""WITH pii AS (
      |  SELECT doc_id,
      |    text
      |      || CASE WHEN doc_id % 3 = 0
      |           THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END
      |      || CASE WHEN doc_id % 5 = 0
      |           THEN ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |           ELSE '' END AS t
      |  FROM documents),
      |red AS (
      |  SELECT doc_id, t,
      |    regexp_replace(regexp_replace(t,
      |      '$piiEmailRe', '[EMAIL]', 'g'), '$piiPhoneRe', '[PHONE]', 'g') AS redacted
      |  FROM pii)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '$piiEmailRe')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '$piiPhoneRe')) AS BIGINT) AS n_phones,
      |  redacted,
      |  NOT (regexp_matches(redacted, '$piiEmailRe')
      |       OR regexp_matches(redacted, '$piiPhoneRe')) AS clean
      |FROM red ORDER BY doc_id""".stripMargin

  // ---- N10b dataset_interleave: deterministic mixture scheduling -----------

  /** `dataset_interleave`: the training-mix INTERLEAVE — given per-source
    * mixture weights, emit the global deterministic feed order a trainer
    * would read (torchdata/Pile-style source mixing, without RNG). Each
    * source's i-th document (1-based, doc_id order) gets virtual time
    * v = (i − 0.5) / w_s — sources with weight 2 appear twice as often,
    * uniformly spread, and the schedule is reproducible run-to-run. With
    * w ∈ {1, 2} the virtual times are exact IEEE halves/quarters, so
    * cross-engine ordering is bit-identical; ties (equal v across sources)
    * break on (source, doc_id). Scale: per-source row_number partitions on
    * source (one shuffle); the global position is a total-order sort —
    * at 100 TB it runs as a range-partitioned sort plus the per-partition
    * offset technique proven by `global_rownum`, never a single partition.
    * The sorted-by-position output is exactly what a sharded writer
    * consumes (`dataset_shuffle_shard` is the downstream twin). */
  private def datasetInterleave(s: SparkSession, d: String): DataFrame = {
    val wSrc = Window.partitionBy("source").orderBy("doc_id")
    val weighted = documents(s, d)
      .select(col("doc_id"), col("source"))
      // weight rule: even-numbered sources are oversampled 2x (stand-in for
      // a real mixture table; the schedule math is weight-agnostic)
      .withColumn("w",
        when(regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 2 === 0, 2.0d)
          .otherwise(1.0d))
      .withColumn("i", row_number().over(wSrc))
      .withColumn("v", (col("i") - lit(0.5d)) / col("w"))
    weighted
      .withColumn("global_pos",
        row_number().over(Window.orderBy(col("v"), col("source"), col("doc_id")))
          .cast("long"))
      .select(col("global_pos"), col("doc_id"), col("source"), col("v"))
      .orderBy("global_pos")
  }

  private val datasetInterleaveSql =
    """WITH weighted AS (
      |  SELECT doc_id, source,
      |    CASE WHEN TRY_CAST(regexp_extract(source, '(\d+)', 1) AS INTEGER) % 2 = 0
      |         THEN CAST(2.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS w,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i
      |  FROM documents),
      |v AS (SELECT doc_id, source, (i - CAST(0.5 AS DOUBLE)) / w AS v FROM weighted)
      |SELECT row_number() OVER (ORDER BY v, source, doc_id) AS global_pos,
      |       doc_id, source, v
      |FROM v ORDER BY global_pos""".stripMargin

  // --------------------------------------------------------------------------

  // ---- N8b sample_balanced: class-balanced downsample ----------------------

  /** `sample_balanced`: equalize class sizes by deterministically keeping
    * the first min-class-count rows of every label (vec_id order) — the
    * no-RNG form of balanced downsampling a classifier-data prep runs.
    * One keyed count agg finds the floor (broadcast scalar), one
    * label-partitioned row_number applies it — a single shuffle on label.
    * Output is the per-label audit row (kept count + id checksum), not the
    * corpus (the kept rows are the operator's real output at scale; the
    * checksum pins WHICH rows were kept, not just how many). */
  private def sampleBalanced(s: SparkSession, d: String): DataFrame = {
    val floor_ = embeddings(s, d).groupBy("label")
      .agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("n_floor"))
    embeddings(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("label").orderBy("vec_id")))
      .crossJoin(broadcast(floor_))
      .filter(col("rn") <= col("n_floor"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_kept"), sum(col("vec_id")).as("id_sum"))
      .orderBy("label")
  }

  private val sampleBalancedSql =
    """WITH floor_ AS (
      |  SELECT min(n) AS n_floor FROM
      |    (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)),
      |ranked AS (
      |  SELECT label, vec_id,
      |         row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
      |  FROM embeddings)
      |SELECT label, count(*) AS n_kept, CAST(sum(vec_id) AS BIGINT) AS id_sum
      |FROM ranked, floor_ WHERE rn <= n_floor
      |GROUP BY label ORDER BY label""".stripMargin

  // ---- N10c dataset_token_budget: budgeted greedy selection ----------------

  /** `dataset_token_budget`: greedy selection under a token budget — rank
    * docs longest-first (n_tokens desc, doc_id — a total order) and keep
    * while the RUNNING token total stays within budget B = total/4, the
    * "best docs until the budget runs out" cut every fixed-size training
    * mix makes. The budget is scale-proportional (an exact integer
    * comparison 4·cum ≤ total — no division), so the query is meaningful
    * at any SF. The prefix sum runs over the per-doc AGGREGATE in one
    * global sort (range-partitioned at scale + the global_rownum offset
    * technique); output is the per-source audit of what survived. */
  private def datasetTokenBudget(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("n_tok").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_tok"))
    val total = per.agg(sum("n_tok").as("total_tok"))
    per.crossJoin(broadcast(total))
      .withColumn("cum", sum("n_tok").over(w))
      .filter(col("cum") * 4 <= col("total_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_tok").as("tokens_kept"))
      .orderBy("source")
  }

  private val datasetTokenBudgetSql =
    """WITH per AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |tot AS (SELECT sum(n_tok) AS total_tok FROM per),
      |ranked AS (
      |  SELECT doc_id, source, n_tok,
      |         sum(n_tok) OVER (ORDER BY n_tok DESC, doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM per)
      |SELECT source, count(*) AS n_kept,
      |       CAST(sum(n_tok) AS BIGINT) AS tokens_kept
      |FROM ranked, tot WHERE cum * 4 <= total_tok
      |GROUP BY source ORDER BY source""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "dataset_interleave" -> Q(datasetInterleave, Some(datasetInterleaveSql)),
    "sample_balanced" -> Q(sampleBalanced, Some(sampleBalancedSql)),
    "dataset_token_budget" -> Q(datasetTokenBudget, Some(datasetTokenBudgetSql)),
    "decontam_overlap" -> Q(decontamOverlap, Some(decontamOverlapSql)),
    "decontam_bloom" -> Q(decontamBloom, Some(decontamOverlapSql)),
    "sample_stratified" -> Q(sampleStratified, Some(sampleStratifiedSql)),
    "sample_weighted" -> Q(sampleWeighted, Some(sampleWeightedSql)),
    "sample_reservoir" -> Q(sampleReservoir, Some(sampleReservoirSql)),
    "text_entropy" -> Q(textEntropy, Some(textEntropySql)),
    "curation_e2e" -> Q(curationE2e, Some(curationE2eSql)),
    "pack_sequences" -> Q(packSequences, Some(packSequencesSql)),
    "repetition_ratio" -> Q(repetitionRatio, Some(repetitionRatioSql)),
    "tfidf_topk" -> Q(tfidfTopk, Some(tfidfTopkSql)),
    "text_rake_keywords" -> Q(textRakeKeywords, Some(textRakeKeywordsSql)),
    "domain_cap" -> Q(domainCap, Some(domainCapSql)),
    "quality_gate" -> Q(qualityGate, Some(qualityGateSql)),
    "corpus_report" -> Q(corpusReport, Some(corpusReportSql)),
    "text_normalize" -> Q(textNormalize, Some(textNormalizeSql)),
    "text_pii_redact" -> Q(textPiiRedact, Some(textPiiRedactSql)))
}
