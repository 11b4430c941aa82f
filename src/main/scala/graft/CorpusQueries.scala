package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 training-data operators (SURVEY.md §2.11 N15–N20): chunk-level
  * cross-document dedup (the CCNet paragraph-dedup shape), self-trained
  * bigram-LM quality scoring (the KenLM-filter shape), temperature-based
  * mixture reweighting, embedding norms, sequence-length histograms, and
  * URL canonicalization. All DuckDB-oracle-checked.
  *
  * Scale rules as elsewhere: per-row array math is scan-shaped; per-key
  * work shuffles once on that key with map-side combine; model/total
  * frames that are small by construction broadcast; nothing windows over
  * the corpus unpartitioned and nothing self-joins all-pairs.
  */
object CorpusQueries {
  import Tables._

  // ---- N15 chunk_dedup: cross-document chunk dedup (CCNet paragraph shape)

  /** Per-document duplicated-chunk fraction: docs split into contiguous
    * 32-token chunks, a chunk is "duplicated" when the SAME chunk text
    * occurs in more than one document. This is paragraph-level dedup
    * (CCNet) re-expressed over whitespace corpora — the dedup that removes
    * boilerplate headers/footers exact-doc dedup can't see.
    *
    * 100 TB shape: explode is linear in corpus tokens; occurrence counting
    * is ONE keyed agg on the chunk hash (map-side combine); the join back
    * re-uses the agg's hash partitioning (ReusedExchange — same idiom as
    * tfidf_topk's tf⋈df); the per-doc rollup is one agg on doc_id. The
    * chunk TEXT never shuffles — only its md5. No self-join, no all-pairs. */
  private[graft] def chunkDedupOf(docs: DataFrame, chunkToks: Int): DataFrame = {
    val t = split(lower(col("text")), "\\s+")
    val nChunks = ceil(size(t) / lit(chunkToks.toDouble)).cast("long")
    val chunks = transform(sequence(lit(0L), nChunks - 1),
      i => md5(array_join(slice(t, (i * chunkToks).cast("int") + 1, lit(chunkToks)), " ")))
    val ch = docs
      .filter(size(t) > 0)
      .select(col("doc_id"), explode(chunks).as("h"))
    val occ = ch.groupBy("h").agg(countDistinct(col("doc_id")).as("ndocs"))
    ch.join(occ, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("ndocs") > 1, lit(1))).as("dup_chunks"))
      .withColumn("dup_frac",
        round(col("dup_chunks").cast("double") / col("n_chunks"), 6))
  }

  private def chunkDedup(s: SparkSession, d: String): DataFrame =
    chunkDedupOf(fanOut(documents(s, d)), 32).orderBy("doc_id")

  // ---- N15b chunk_cdc: content-defined chunking ----------------------------

  /** `chunk_cdc`: content-defined chunking (the Rabin/FastCDC family —
    * LBFS, Muthitacharoen et al. 2001) vs [[chunkDedupOf]]'s FIXED-width
    * chunks: a boundary falls wherever the rolling 8-char window hash is
    * ≡ 0 (mod 32) (~32-char average chunks), so chunk boundaries RESYNC
    * after an insertion/deletion — the property that lets a storage/dedup
    * layer find unchanged content in edited documents, where fixed-width
    * chunking loses every chunk after the first edit. All math is the
    * bounded integer polynomial (window hash < 2^63 raw; chunk identity
    * folds mod 1e9+7 per step, so arbitrary-length chunks never overflow
    * DuckDB's non-wrapping BIGINT). Output: every chunk repeated across
    * ≥ 2 docs, with its occurrence/doc counts and packed min
    * representative — the multimodal_frame_dedup contract, content-defined
    * instead of frame-aligned. The whole per-doc pass is ONE native
    * codegen expression ([[graft.functions.CdcChunks]]) + ONE keyed agg. */
  private[graft] def chunkCdcOf(docs: DataFrame): DataFrame = {
    // the whole per-doc pass (code points → window-hash boundaries → chunk
    // folds) is ONE native codegen expression ([[graft.functions.CdcChunks]];
    // the r08a HOF formulation — transform/filter/nested-aggregate — ran
    // interpreted per character: 1.6× slower at sf0.1, 10.9× at the 20×
    // probe)
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(graft.functions.CdcChunks(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("idx"),
        col("col.fp").as("fp"), col("col.len").as("len"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("len")).as("len"),
        min(col("doc_id") * 100000L + col("idx")).as("rep"))
      .filter(col("n_docs") >= 2)
      .orderBy("fp")
  }

  private def chunkCdc(s: SparkSession, d: String): DataFrame =
    chunkCdcOf(fanOut(documents(s, d)))

  private val chunkCdcSql =
    """WITH t AS (
      |  SELECT doc_id, text, length(text) AS n FROM documents
      |  WHERE length(text) > 0),
      |cod AS (
      |  SELECT doc_id, n,
      |    list_transform(range(1, n + 1),
      |      i -> CAST(ascii(substring(text, CAST(i AS INTEGER), 1)) AS BIGINT))
      |      AS c
      |  FROM t),
      |bnd AS (
      |  SELECT doc_id, c,
      |    list_sort(list_distinct(
      |      list_filter(range(8, n + 1), i ->
      |        list_reduce(c[CAST(i AS INTEGER) - 7:CAST(i AS INTEGER)],
      |          (a, b) -> a * 31 + b) % 32 = 0) || [n])) AS b
      |  FROM cod),
      |ch AS (
      |  SELECT doc_id, c, b, unnest(range(1, len(b) + 1)) AS j FROM bnd),
      |fp AS (
      |  SELECT doc_id, j - 1 AS idx,
      |    list_reduce(
      |      c[CASE WHEN j = 1 THEN 1
      |             ELSE CAST(b[CAST(j AS INTEGER) - 1] AS INTEGER) + 1 END
      |        :CAST(b[CAST(j AS INTEGER)] AS INTEGER)],
      |      (a, x) -> (a * 31 + x) % 1000000007) AS fp,
      |    CAST(b[CAST(j AS INTEGER)]
      |         - CASE WHEN j = 1 THEN 0
      |                ELSE b[CAST(j AS INTEGER) - 1] END AS BIGINT) AS len
      |  FROM ch)
      |SELECT fp, CAST(count(*) AS BIGINT) AS n_occ,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(min(len) AS BIGINT) AS len,
      |       CAST(min(doc_id * 100000 + idx) AS BIGINT) AS rep
      |FROM fp GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY fp""".stripMargin

  private val chunkDedupSql =
    """WITH toksrc AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |chunks AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT)),
      |      i -> md5(array_to_string(t[i*32+1:i*32+32], ' ')))) AS h
      |  FROM toksrc WHERE len(t) > 0),
      |occ AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY 1)
      |SELECT c.doc_id, count(*) AS n_chunks,
      |  count(*) FILTER (WHERE o.ndocs > 1) AS dup_chunks,
      |  round(CAST(count(*) FILTER (WHERE o.ndocs > 1) AS DOUBLE) / count(*), 6)
      |    AS dup_frac
      |FROM chunks c JOIN occ o USING (h)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---- N15b chunk_dedup_rewrite: the CCNet REWRITE pass --------------------

  /** The destructive half of chunk-level dedup: drop every chunk that
    * occurs in more than one document and REASSEMBLE the cleaned text in
    * original chunk order (CCNet's paragraph-removal, not just the audit
    * fraction). Emits docs that lost at least one chunk, with before/after
    * token counts and the rewritten text.
    *
    * Determinism note: collect_list order is partition-dependent, so the
    * kept chunks carry their position and are array_sort'ed by it before
    * joining — same total (pos) order as the oracle's ORDER BY pos.
    *
    * 100 TB shape: identical movement to chunk_dedup (hash-keyed agg +
    * join-back) plus one agg on doc_id carrying (pos, chunk) structs —
    * text crosses the shuffle once, as chunk-sized pieces of the docs
    * being rewritten. */
  private def chunkDedupRewrite(s: SparkSession, d: String): DataFrame = {
    val chunkToks = 32
    val t = split(lower(col("text")), "\\s+")
    val nChunks = ceil(size(t) / lit(chunkToks.toDouble)).cast("long")
    val chunkArr = transform(sequence(lit(0L), nChunks - 1),
      i => array_join(slice(t, (i * chunkToks).cast("int") + 1, lit(chunkToks)), " "))
    val ch = fanOut(documents(s, d))
      .filter(size(t) > 0)
      .select(col("doc_id"), posexplode(chunkArr).as(Seq("pos", "chunk")))
      .withColumn("h", md5(col("chunk")))
    val occ = ch.groupBy("h").agg(countDistinct(col("doc_id")).as("ndocs"))
    val kept = ch.join(occ, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("ndocs") > 1, lit(1))).as("dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("ndocs") === 1,
              struct(col("pos"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("clean_text"))
    kept.filter(col("dropped") > 0)
      .select(col("doc_id"), col("n_chunks"), col("dropped"), col("clean_text"))
      .orderBy("doc_id")
  }

  private val chunkDedupRewriteSql =
    """WITH toksrc AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |chunkarr AS (
      |  SELECT doc_id,
      |    list_transform(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT)),
      |      i -> array_to_string(t[i*32+1:i*32+32], ' ')) AS chunks
      |  FROM toksrc WHERE len(t) > 0),
      |ch AS (
      |  SELECT doc_id, unnest(chunks) AS chunk,
      |         generate_subscripts(chunks, 1) AS pos
      |  FROM chunkarr),
      |occ AS (SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS ndocs
      |        FROM ch GROUP BY 1),
      |j AS (SELECT c.doc_id, c.chunk, c.pos, o.ndocs
      |      FROM ch c JOIN occ o ON md5(c.chunk) = o.h)
      |SELECT doc_id, count(*) AS n_chunks,
      |  count(*) FILTER (WHERE ndocs > 1) AS dropped,
      |  coalesce(string_agg(chunk, ' ' ORDER BY pos)
      |             FILTER (WHERE ndocs = 1), '') AS clean_text
      |FROM j GROUP BY 1
      |HAVING count(*) FILTER (WHERE ndocs > 1) > 0
      |ORDER BY doc_id""".stripMargin

  // ---- N16 lm_bigram_score: self-trained bigram-LM quality scoring ---------

  /** Mean bigram log-likelihood per document under a bigram model trained
    * on the corpus itself — the KenLM-style "does this read like the rest
    * of the corpus" quality signal (low scorers are gibberish/outliers).
    * P(w2|w1) = c(w1 w2)/c(w1), score = mean over the doc's bigram
    * OCCURRENCES of ln P.
    *
    * Determinism: each ln is rounded to 6 dp, the per-doc sum runs in
    * exact DECIMAL(18,6) (order-independent), and only the final 4-dp
    * rounded mean is compared — no float-summation order anywhere.
    *
    * 100 TB shape: the model is two keyed aggs (bigram, unigram) with
    * map-side combine — vocabulary-sized, NOT broadcast; scoring joins doc
    * bigram occurrences to the model by shuffling both sides on the bigram
    * key, then one agg on doc_id. Corpus text crosses the cluster as
    * hashed gram keys, never as documents. */
  private[graft] def lmBigramScoreOf(docs: DataFrame): DataFrame = {
    val occ = docs
      .select(col("doc_id"), explode(TrainDataQueries.gramsOf(col("text"), 2)).as("bg"))
    val c2 = occ.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val model = c2
      .withColumn("w", element_at(split(col("bg"), " "), 1))
      .join(c1, Seq("w"))
      .select(col("bg"),
        round(log(col("c2").cast("double") / col("c1")), 6)
          .cast(DecimalType(18, 6)).as("logp"))
    occ.join(model, Seq("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        Det.detRound(col("slp").cast("double") / col("n_bigrams"), 4)
          .as("avg_logp"))
  }

  private def lmBigramScore(s: SparkSession, d: String): DataFrame =
    lmBigramScoreOf(fanOut(documents(s, d))).orderBy("doc_id")

  private val lmBigramScoreSql =
    s"""WITH toksrc AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |occ AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(t)),
      |      i -> array_to_string(t[i:i+1], ' '))) AS bg
      |  FROM toksrc),
      |c2 AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY 1),
      |c1 AS (SELECT w, count(*) AS c1
      |       FROM (SELECT unnest(t) AS w FROM toksrc) GROUP BY 1),
      |model AS (
      |  SELECT bg,
      |    CAST(round(ln(CAST(c2.c2 AS DOUBLE) / c1.c1), 6) AS DECIMAL(18,6))
      |      AS logp
      |  FROM c2 JOIN c1 ON string_split(bg, ' ')[1] = c1.w)
      |SELECT o.doc_id, count(*) AS n_bigrams,
      |  ${Det.sqlDetRound("CAST(sum(m.logp) AS DOUBLE) / count(*)", 4)}
      |    AS avg_logp
      |FROM occ o JOIN model m USING (bg)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---- N14b text_hashing_vectorizer: feature-hashing trick -----------------

  /** The hashing-trick vectorizer (Weinberger et al. 2009; fastText's
    * input layer): each token hashes into one of D=32 buckets, per-doc
    * bucket tf counts become the sparse feature vector — the stateless,
    * vocabulary-free featurization a fast quality classifier trains on
    * (no vocab build pass, no dictionary to ship, collisions accepted by
    * design). Map-side: tokenize → md5-bucket → (doc, bucket) count with
    * combine; output serializes the sparse vector as "idx:tf" CSV (the
    * array-output-hashability rule). ONE scan, one keyed agg — at 100 TB
    * this is word-count geometry with a D-bounded second key. */
  private[graft] def textHashingVectorizerOf(docs: DataFrame): DataFrame = {
    val bucket = conv(substring(md5(col("w")), 1, 8), 16, 10)
      .cast("long") % 32
    docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), bucket.as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_buckets"),
        array_join(transform(
          array_sort(collect_list(struct(col("b"), col("tf")))),
          x => concat(x.getField("b"), lit(":"), x.getField("tf"))), ",")
          .as("features"))
      .orderBy("doc_id")
  }

  private def textHashingVectorizer(s: SparkSession, d: String): DataFrame =
    textHashingVectorizerOf(documents(s, d))

  private val textHashingVectorizerSql =
    """WITH tf AS (
      |  SELECT doc_id,
      |    CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % 32 AS b,
      |    count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2)
      |SELECT doc_id, count(*) AS n_buckets,
      |  array_to_string(list(b || ':' || tf ORDER BY b), ',') AS features
      |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- N14c score_logistic_infer: batch classifier inference ---------------

  /** Batch inference of a fixed linear (logistic) quality classifier over
    * hashed text features — the fastText/CCNet-style "run the published
    * quality model over the whole corpus" pass that sits between
    * [[textHashingVectorizerOf]] (its input layer) and `quality_gate` (its
    * consumer). The model is shipped as CLOSED-FORM weights on the same
    * D=32 hash buckets the vectorizer uses (`w_b = ((37b+11) mod 21 − 10)
    * / 10`, bias 0.3 — a stand-in for trained weights with the exact same
    * execution shape: weights enter the plan as expressions, no join), so
    * scoring is ONE token-level map (`tokenize → bucket → weight`) into
    * ONE doc-keyed agg — word-count geometry, trivially map-side combined.
    * Determinism discipline: the logit is an integer weight-sum divided
    * once (IEEE-exact), rounded 6 dp; the single libm `exp` runs on that
    * already-rounded logit and the probability rounds to 4 dp (the
    * perplexity recipe); the keep decision compares the rounded logit to
    * zero — no float boundary can flip between engines. At 100 TB this is
    * the cheapest possible model-scoring plan: no shuffle beyond the
    * doc-key agg the tokenization already implies, and a real trained
    * weight vector would broadcast instead of inlining with zero plan
    * change. */
  private[graft] def scoreLogisticInferOf(docs: DataFrame): DataFrame = {
    val bucket = conv(substring(md5(col("w")), 1, 8), 16, 10)
      .cast("long") % 32
    val wnumX10 = (col("b") * 37 + 11) % 21 - 10
    docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), bucket.as("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(wnumX10).as("wsum_x10"))
      .withColumn("logit",
        // detRound: the exact rational 0.3 + wsum/(10n) lands on 6-dp ties
        // at a measurable rate (4 of 50k docs at sf1 — FIXTURES.md C4)
        Det.detRound(lit(0.3) + col("wsum_x10").cast("double") /
          (col("n_tokens") * 10L).cast("double"), 6))
      .select(col("doc_id"), col("n_tokens"), col("logit"),
        Det.detRound(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4).as("p_keep"),
        (col("logit") > 0.0).as("keep"))
      .orderBy("doc_id")
  }

  private def scoreLogisticInfer(s: SparkSession, d: String): DataFrame =
    scoreLogisticInferOf(documents(s, d))

  private val scoreLogisticInferSql =
    s"""WITH agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum((CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % 32
      |              * 37 + 11) % 21 - 10) AS BIGINT) AS wsum_x10
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)
      |  GROUP BY doc_id),
      |sc AS (
      |  SELECT doc_id, n_tokens,
      |    ${Det.sqlDetRound("CAST(0.3 AS DOUBLE) + CAST(wsum_x10 AS DOUBLE) / CAST(n_tokens * 10 AS DOUBLE)", 6)} AS logit
      |  FROM agg)
      |SELECT doc_id, n_tokens, logit,
      |  ${Det.sqlDetRound("1.0 / (1.0 + exp(-logit))", 4)}
      |    AS p_keep,
      |  logit > 0.0 AS keep
      |FROM sc ORDER BY doc_id""".stripMargin

  // ---- N15c source_overlap_matrix: cross-source contamination forensics ----

  /** Cross-source 8-gram overlap matrix — which sources share verbatim
    * content with which (mirror detection, syndication forensics, the
    * source-level view the doc-level dedup family feeds on). A gram that
    * appears in both source A and source B contributes once to cell
    * (A, B): grams dedupe to DISTINCT (gram, source) pairs FIRST (so a
    * boilerplate gram repeated within one source can't inflate the cell),
    * then self-join on the gram key with A < B. 100 TB: the gram table is
    * O(total tokens) and the join shuffles on the gram hash; per-gram
    * fan-out is |sources-containing-gram|² — df-capped by dropping grams
    * in more than 10 sources (stopword-grams carry no forensic signal;
    * the same df-cut the PPJoin index uses). The gram key is a PORTABLE
    * 60-bit hash (15 md5 hex chars — the audit_checksum conv recipe) that
    * the oracle replays verbatim, so both engines compute the SAME
    * function: a collision merges identically on both sides instead of
    * silently diverging from a raw-string oracle join (r09 advice; text
    * still never shuffles — the 8-byte key does). */
  private[graft] def sourceOverlapMatrixOf(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("source"),
        explode(TrainDataQueries.gramsOf(col("text"), 8)).as("g"))
      .select(col("source"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gh"))
      .distinct()
    val df_ = grams.groupBy("gh").agg(count(lit(1)).as("nsrc"))
      .filter(col("nsrc") <= 10)
    val kept = grams.join(df_, Seq("gh"))
    val a = kept.select(col("gh"), col("source").as("src_a"))
    val b = kept.select(col("gh"), col("source").as("src_b"))
    a.join(b, Seq("gh"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= 2)
      .orderBy(col("shared_grams").desc, col("src_a"), col("src_b"))
  }

  private def sourceOverlapMatrix(s: SparkSession, d: String): DataFrame =
    sourceOverlapMatrixOf(documents(s, d))

  private val sourceOverlapMatrixSql =
    """WITH toksrc AS (
      |  SELECT source, string_split(lower(text), ' ') AS t FROM documents),
      |gramsrc AS (
      |  SELECT source,
      |         list_transform(range(1, len(t) - 6),
      |                        i -> array_to_string(t[i:i+7], ' ')) AS grams
      |  FROM toksrc),
      |grams AS (
      |  SELECT DISTINCT source,
      |    CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS gh
      |  FROM (SELECT source, unnest(grams) AS g FROM gramsrc)),
      |kept AS (
      |  SELECT source, gh FROM grams
      |  WHERE gh IN (SELECT gh FROM grams GROUP BY gh
      |               HAVING count(*) <= 10))
      |SELECT a.source AS src_a, b.source AS src_b,
      |  count(*) AS shared_grams
      |FROM kept a JOIN kept b ON a.gh = b.gh AND a.source < b.source
      |GROUP BY 1, 2
      |HAVING count(*) >= 2
      |ORDER BY shared_grams DESC, src_a, src_b""".stripMargin

  // ---- N16c dsir_importance_select: DSIR data selection --------------------

  /** Importance-resampling data selection (DSIR, Xie et al. 2023): score
    * every raw-corpus document by how target-domain-like it reads —
    * mean over token occurrences of ln(p_target(w)/p_raw(w)) under two
    * add-one-smoothed unigram LMs (target = the `src0` slice standing in
    * for "high-quality domain"; raw = the rest) — and keep the top-20.
    * This is the standard cheap alternative to classifier-based selection
    * when curating a pretraining mixture toward a reference corpus.
    *
    * 100 TB shape: identical geometry to [[lmBigramScoreOf]] — the two
    * LMs are vocabulary-sized keyed aggs with map-side combine (never
    * broadcast), scoring shuffles occurrences and model on the WORD key,
    * and the doc rollup is one keyed agg; text crosses the cluster as
    * tokens, the final top-20 is a TakeOrdered. Determinism: per-token
    * log-ratios round 6 dp before the exact DECIMAL per-doc sum; the
    * joint-vocabulary size V closes the smoothing denominators. */
  private[graft] def dsirImportanceSelectOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(lower(col("text")), "\\s+")).as("w"))
    val isT = col("source") === "src0"
    val counts = toks
      .groupBy("w")
      .agg(sum(when(isT, 1L).otherwise(0L)).as("ct"),
        sum(when(isT, 0L).otherwise(1L)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
      count(lit(1)).as("v"))
    val model = counts.crossJoin(broadcast(totals))
      .select(col("w"), round(log(
        ((col("ct") + lit(1L)).cast("double") /
          (col("nt") + col("v")).cast("double")) /
        ((col("cr") + lit(1L)).cast("double") /
          (col("nr") + col("v")).cast("double"))), 6)
        .cast(DecimalType(18, 6)).as("logratio"))
    toks.filter(!isT)
      .join(model, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("logratio")).as("slr"))
      .select(col("doc_id"), col("n_toks"),
        round(col("slr").cast("double") / col("n_toks"), 4).as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(20)
  }

  private def dsirImportanceSelect(s: SparkSession, d: String): DataFrame =
    dsirImportanceSelectOf(documents(s, d))

  private val dsirImportanceSelectSql =
    """WITH toks AS (
      |  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |counts AS (
      |  SELECT w,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS BIGINT) AS cr
      |  FROM toks GROUP BY 1),
      |totals AS (
      |  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr,
      |         CAST(count(*) AS BIGINT) AS v
      |  FROM counts),
      |model AS (
      |  SELECT w,
      |    CAST(round(ln(
      |      (CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE))
      |      / (CAST(cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE))), 6)
      |      AS DECIMAL(18,6)) AS logratio
      |  FROM counts, totals)
      |SELECT doc_id, count(*) AS n_toks,
      |  round(CAST(sum(logratio) AS DOUBLE) / count(*), 4) AS dsir_score
      |FROM toks JOIN model USING (w)
      |WHERE source <> 'src0'
      |GROUP BY 1
      |ORDER BY dsir_score DESC, doc_id
      |LIMIT 20""".stripMargin

  // ---- N16d lm_heldout_perplexity: leakage-free LM evaluation --------------

  /** Held-out bigram perplexity — [[lmBigramScoreOf]] trains and scores on
    * the same corpus, which is fine for outlier SCREENING but overstates
    * model quality; this is the leakage-free form every LM-based filter
    * owes its threshold calibration: train an add-one-smoothed bigram LM
    * on a deterministic 90% hash split, score only the held-out 10%.
    * Unseen bigrams get P = (0+1)/(c1+V) (and unseen contexts P = 1/V) —
    * smoothing, not silent drops, so gibberish can't hide. Per-doc mean
    * log-prob and its perplexity exp(−mean) (one libm exp on an
    * already-6-dp-rounded mean, rounded 4 dp at output — the idf
    * discipline applied to exp).
    *
    * 100 TB shape: the split predicate is a map-side hash; the model is
    * two vocabulary-sized keyed aggs; scoring LEFT-joins held-out bigram
    * occurrences to the model on the bigram key (absent rows are the
    * unseen-mass path, no second scan); one doc rollup. */
  private[graft] def lmHeldoutPerplexityOf(docs: DataFrame): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % 10
    val train = docs.filter(bucket < 9)
    val test = docs.filter(bucket === 9)
    val c2 = train
      .select(explode(TrainDataQueries.gramsOf(col("text"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = train
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    val occ = test
      .select(col("doc_id"), explode(TrainDataQueries.gramsOf(col("text"), 2)).as("bg"))
      .withColumn("w", element_at(split(col("bg"), " "), 1))
    occ
      .join(c2, Seq("bg"), "left_outer")
      .join(c1, Seq("w"), "left_outer")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), round(log(
        (coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")), 6)
        .cast(DecimalType(18, 6)).as("logp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        Det.detRound(col("slp").cast("double") / col("n_bigrams"), 6)
          .as("avg_logp"),
        Det.detRound(exp(-Det.detRound(
          col("slp").cast("double") / col("n_bigrams"), 6)), 4).as("ppl"))
      .orderBy("doc_id")
  }

  private def lmHeldoutPerplexity(s: SparkSession, d: String): DataFrame =
    lmHeldoutPerplexityOf(documents(s, d))

  private val lmHeldoutPerplexitySql =
    """WITH split AS (
      |  SELECT doc_id, text,
      |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 10 AS bucket
      |  FROM documents),
      |trainsrc AS (SELECT string_split(lower(text), ' ') AS t
      |             FROM split WHERE bucket < 9),
      |c2 AS (
      |  SELECT bg, count(*) AS c2 FROM (
      |    SELECT unnest(list_transform(range(1, len(t)),
      |      i -> array_to_string(t[i:i+1], ' '))) AS bg
      |    FROM trainsrc)
      |  GROUP BY 1),
      |c1 AS (SELECT w, count(*) AS c1
      |       FROM (SELECT unnest(t) AS w FROM trainsrc) GROUP BY 1),
      |vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c1),
      |occ AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(t)),
      |      i -> array_to_string(t[i:i+1], ' '))) AS bg
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
      |        FROM split WHERE bucket = 9)),
      |scored AS (
      |  SELECT o.doc_id,
      |    CAST(round(ln(
      |      CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
      |      / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS logp
      |  FROM occ o
      |  LEFT JOIN c2 USING (bg)
      |  LEFT JOIN c1 ON string_split(o.bg, ' ')[1] = c1.w, vocab v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  (round((CAST(sum(logp) AS DOUBLE) / count(*)) * 1000000.0)
      |    / 1000000.0 + 0.0) AS avg_logp,
      |  (round(exp(-(round((CAST(sum(logp) AS DOUBLE) / count(*)) * 1000000.0)
      |    / 1000000.0 + 0.0)) * 10000.0) / 10000.0 + 0.0) AS ppl
      |FROM scored
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---- N17 sample_temperature: mixture reweighting -------------------------

  /** Temperature-based source reweighting (the multilingual/domain mixture
    * rule: w_s ∝ share_s^α): per-source document share and normalized
    * sampling weight at α = 0.5. α = 0.5 uses sqrt, which IEEE requires
    * correctly rounded — both engines produce the identical double, and
    * the weight normalization sums exact decimals, so the whole query is
    * engine-deterministic with no tolerance. (Arbitrary α needs pow():
    * round before normalizing.)
    *
    * 100 TB shape: one keyed agg on source; everything after operates on
    * a frame with one row per SOURCE (thousands at web scale, not
    * corpus-sized) — the totals broadcast. */
  private def sampleTemperature(s: SparkSession, d: String): DataFrame = {
    val per = documents(s, d).groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = per.agg(sum(col("n_docs")).as("n_total"))
    val w = per.crossJoin(broadcast(tot))
      .withColumn("share", col("n_docs").cast("double") / col("n_total"))
      .withColumn("wraw", sqrt(col("share")).cast(DecimalType(20, 8)))
    val sumw = w.agg(sum(col("wraw")).as("sw"))
    w.crossJoin(broadcast(sumw))
      .select(col("source"), col("n_docs"), round(col("share"), 6).as("share"),
        round(col("wraw").cast("double") / col("sw").cast("double"), 6).as("weight"))
      .orderBy("source")
  }

  private val sampleTemperatureSql =
    """WITH per AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM per),
      |w AS (
      |  SELECT source, n_docs,
      |    CAST(n_docs AS DOUBLE) / n_total AS share,
      |    CAST(sqrt(CAST(n_docs AS DOUBLE) / n_total) AS DECIMAL(20,8)) AS wraw
      |  FROM per, tot),
      |sw AS (SELECT sum(wraw) AS sw FROM w)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  round(share, 6) AS share,
      |  round(CAST(wraw AS DOUBLE) / CAST(sw.sw AS DOUBLE), 6) AS weight
      |FROM w, sw ORDER BY source""".stripMargin

  // ---- N18 embedding_norms: vector hygiene scan ----------------------------

  /** Per-vector L2 norm and mean component — the embedding-table hygiene
    * pass (catches zero/denormal vectors before any cosine math assumes
    * unit-ish norms). The fold runs left-to-right in list order on both
    * engines (same idiom as the proven knn cosine fold), so the doubles are
    * bit-identical before rounding. Scan-shaped: no shuffle at any scale. */
  private def embeddingNorms(s: SparkSession, d: String): DataFrame = {
    val sq = aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val sm = aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double"))
    embeddings(s, d)
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        round(sqrt(sq), 6).as("l2"),
        round(sm / size(col("embedding")), 6).as("mu"))
      .orderBy("vec_id")
  }

  private val embeddingNormsSql =
    """SELECT vec_id, label,
      |  CAST(len(embedding) AS INTEGER) AS dim,
      |  round(sqrt(list_reduce(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)), 6)
      |    AS l2,
      |  round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |      (u, v) -> u + v) / len(embedding), 6) AS mu
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---- N18b embedding_quant_calib: int8 calibration sweep ------------------

  /** `embedding_quant_calib`: per-dimension int8 quantization calibration —
    * the sweep a serving/compression pipeline runs before fixing scales:
    * for every dimension, the max|x|, the p99 |x| clip point (percentile
    * clipping beats max-abs when a dim has outliers: one bad value
    * otherwise wastes the whole int8 range), the resulting scale
    * (p99/127), and the saturation rate that clip choice costs. Cross-row
    * determinism: only order-independent aggregates (max, count, exact
    * sort-based percentile) — no float sums across rows; the clip
    * threshold rounds to 4 dp BEFORE the saturation count so both engines
    * compare against the identical double. Scale: one explode to
    * (dim, |x|) keyed on ≤ dim values, one agg, then the dim-sized
    * calibration table broadcasts back for the clipped re-count — two
    * scans of the exploded column, zero pairwise work. */
  private def embeddingQuantCalib(s: SparkSession, d: String): DataFrame = {
    val ex = embeddings(s, d)
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).as("dim"), abs(col("col").cast("double")).as("ax"))
    val calib = ex.groupBy("dim")
      .agg(round(max(col("ax")), 6).as("max_abs"),
        round(expr("percentile(ax, 0.99)"), 4).as("p99_abs"),
        count(lit(1)).as("n"))
    ex.join(broadcast(calib), "dim")
      .groupBy("dim")
      .agg(min(col("max_abs")).as("max_abs"), min(col("p99_abs")).as("p99_abs"),
        min(col("n")).as("n"),
        sum(when(col("ax") > col("p99_abs"), 1L).otherwise(0L)).as("n_clipped"))
      .select(col("dim"), col("max_abs"), col("p99_abs"),
        round(col("p99_abs") / 127.0, 6).as("scale"), col("n"),
        col("n_clipped"),
        round(col("n_clipped").cast("double") / col("n"), 6).as("clip_rate"))
      .orderBy("dim")
  }

  private val embeddingQuantCalibSql =
    """WITH ex AS (
      |  SELECT unnest(list_transform(embedding,
      |    (x, i) -> {'d': i, 'ax': abs(CAST(x AS DOUBLE))})) AS u
      |  FROM embeddings),
      |e2 AS (SELECT CAST(u.d AS INTEGER) AS dim, u.ax AS ax FROM ex),
      |calib AS (
      |  SELECT dim, round(max(ax), 6) AS max_abs,
      |         round(quantile_cont(ax, 0.99), 4) AS p99_abs,
      |         count(*) AS n
      |  FROM e2 GROUP BY dim)
      |SELECT dim, min(max_abs) AS max_abs, min(p99_abs) AS p99_abs,
      |       round(min(p99_abs) / 127.0, 6) AS scale,
      |       CAST(min(n) AS BIGINT) AS n,
      |       CAST(count(*) FILTER (WHERE ax > p99_abs) AS BIGINT)
      |         AS n_clipped,
      |       round(CAST(count(*) FILTER (WHERE ax > p99_abs) AS DOUBLE)
      |             / min(n), 6) AS clip_rate
      |FROM e2 JOIN calib USING (dim) GROUP BY dim ORDER BY dim""".stripMargin

  // ---- N19 length_histogram: sequence-length distribution ------------------

  /** Log2-bucketed token-length histogram — the "what context length does
    * this corpus need" planning query. The bucket is length(bin(n)) =
    * floor(log2 n)+1, computed on INTEGERS via the binary-string length
    * (log2() in floats disagrees at exact powers of two; bin() cannot).
    * One scan + one agg on a ≤64-value key. */
  private def lengthHistogram(s: SparkSession, d: String): DataFrame = {
    val n = size(split(lower(col("text")), "\\s+"))
    documents(s, d)
      .select(length(bin(n.cast("long"))).as("bucket"), n.as("n_toks"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks").cast("long")).as("total_tokens"),
        min(col("n_toks")).as("min_toks"), max(col("n_toks")).as("max_toks"))
      .orderBy("bucket")
  }

  private val lengthHistogramSql =
    """WITH base AS (
      |  SELECT CAST(length(bin(CAST(len(string_split(lower(text), ' ')) AS BIGINT)))
      |           AS INTEGER) AS bucket,
      |         CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_toks
      |  FROM documents)
      |SELECT bucket, count(*) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
      |  min(n_toks) AS min_toks, max(n_toks) AS max_toks
      |FROM base GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---- N20 url_canonicalize: crawl-frontier URL dedup ----------------------

  private val urlRe = "^([a-zA-Z]+)://([^/:?#]+)(?::([0-9]+))?([^?#]*)"
  private val trackRe = "^(utm_[^=]*|ref|fbclid)="

  /** Canonical form of a messy URL: lowercase scheme+host, default ports
    * dropped, trailing path slashes trimmed, fragment dropped, tracking
    * params (utm_*, ref, fbclid) removed. Pure per-row string math. */
  private[graft] def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, urlRe, 1))
    val host = lower(regexp_extract(url, urlRe, 2))
    val port = regexp_extract(url, urlRe, 3)
    val path0 = regexp_replace(regexp_extract(url, urlRe, 4), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val portPart = when(port.isin("", "80", "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val qraw = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(qraw, "&"),
      p => p =!= "" && !p.rlike(trackRe))
    val qPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart, path, qPart)
  }

  /** Crawl-frontier URL dedup: four messy variants of the same logical
    * pages (mixed-case hosts, default ports, tracking params, fragments,
    * trailing slashes) collapse onto canonical URLs, counted per canonical
    * form — the frontier/visited-set key of the reference's scraper world
    * (base_scraper.py builds page URLs; pracuj_scraper.py:294 filters by
    * URL shape). One scan + one keyed agg on the canonical string. */
  private def urlCanonicalize(s: SparkSession, d: String): DataFrame = {
    val id = (col("doc_id") % 100).cast("string")
    val url = when(col("doc_id") % 4 === 0,
        concat(lit("HTTPS://WWW.Example.COM:443/jobs/"), id,
          lit("?utm_source=feed&id=7#frag")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("https://www.example.com/jobs/"), id, lit("?id=7&ref=x")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("http://Example.com:80/jobs/"), id, lit("/")))
      .otherwise(lit("https://example.com/about/#team"))
    documents(s, d)
      .select(col("doc_id"), canonicalUrl(url).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("first_doc"))
      .orderBy("canonical_url")
  }

  private val urlCanonicalizeSql =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/jobs/' ||
      |        CAST(doc_id % 100 AS VARCHAR) || '?utm_source=feed&id=7#frag'
      |      WHEN 1 THEN 'https://www.example.com/jobs/' ||
      |        CAST(doc_id % 100 AS VARCHAR) || '?id=7&ref=x'
      |      WHEN 2 THEN 'http://Example.com:80/jobs/' ||
      |        CAST(doc_id % 100 AS VARCHAR) || '/'
      |      ELSE 'https://example.com/about/#team' END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url, '^([a-zA-Z]+)://([^/:?#]+)(?::([0-9]+))?([^?#]*)', 1)) AS scheme,
      |    lower(regexp_extract(url, '^([a-zA-Z]+)://([^/:?#]+)(?::([0-9]+))?([^?#]*)', 2)) AS host,
      |    regexp_extract(url, '^([a-zA-Z]+)://([^/:?#]+)(?::([0-9]+))?([^?#]*)', 3) AS port,
      |    regexp_replace(regexp_extract(url, '^([a-zA-Z]+)://([^/:?#]+)(?::([0-9]+))?([^?#]*)', 4), '/+$', '') AS path0,
      |    list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref|fbclid)=')) AS params
      |  FROM raw),
      |canon AS (
      |  SELECT doc_id,
      |    scheme || '://' || host ||
      |    CASE WHEN port IN ('', '80', '443') THEN '' ELSE ':' || port END ||
      |    CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
      |    CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
      |         ELSE '' END AS canonical_url
      |  FROM parts)
      |SELECT canonical_url, count(*) AS n_urls, min(doc_id) AS first_doc
      |FROM canon GROUP BY 1 ORDER BY canonical_url""".stripMargin

  // ---- N23 decontam_verbatim: exact-substring eval-set contamination -------

  /** The strict decontamination pass run alongside n-gram overlap: which
    * training docs contain an eval-set string VERBATIM as a substring?
    * The standin eval set is one doc per exact-dup family (the group
    * minimum) — modeling exactly how contamination happens in practice:
    * the eval set's text IS in the crawl, carried by the family's other
    * members. Needle = the eval doc's first 8 tokens; emits contaminated
    * doc → number of eval needles found.
    *
    * 100 TB shape: the eval set is tiny by definition and BROADCASTS; the
    * expensive part is the |corpus| × |evals| contains() nested loop, so a
    * gram-anchored candidate cut runs FIRST: a needle contained verbatim
    * in lower(text) has its inner tokens space-bounded inside the match,
    * so needle tokens 2..3 must appear as a complete adjacent token bigram
    * of the doc — semi-joining the corpus' bigrams against the needles'
    * anchor bigrams is therefore an exact superset of true matches. Only
    * candidates pay the verify; cost grows linearly in the corpus and the
    * per-row verify is per-candidate, not per-corpus-row. Needles too
    * short to anchor (< 4 tokens) fall back to the nested loop — that
    * branch is empty for 8-token needles and costs one pass over a
    * zero-row broadcast. */
  private def decontamVerbatim(s: SparkSession, d: String): DataFrame = {
    val docs = fanOut(documents(s, d))
    val gmins = docs
      .withColumn("nt", graft.ops.DedupOps.normalizedText(col("text")))
      .groupBy("nt")
      .agg(min(col("doc_id")).as("gmin"), count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select("gmin")
    val evals = docs
      .join(broadcast(gmins), col("doc_id") === col("gmin"))
      .select(array_join(slice(split(lower(col("text")), "\\s+"), 1, 8), " ")
        .as("needle"))
      .distinct()
    val nonEval = docs
      .join(broadcast(gmins), col("doc_id") === col("gmin"), "left_anti")
      .select("doc_id", "text")
    decontamVerbatimOf(nonEval, evals)
  }

  /** Core of `decontam_verbatim`, parameterized for the scale probe:
    * `nonEval` = (doc_id, text) corpus, `evals` = (needle) strings. */
  private[graft] def decontamVerbatimOf(
      nonEval: DataFrame, evals: DataFrame): DataFrame = {
    // Anchor = needle tokens 2..3 (complete tokens inside any verbatim match).
    val ntoks = size(split(col("needle"), " "))
    val anchors = evals.filter(ntoks >= 4)
      .select(array_join(slice(split(col("needle"), " "), 2, 2), " ").as("anchor"))
      .distinct()
    val shortNeedles = evals.filter(ntoks < 4)
    val candidateIds = nonEval
      .select(col("doc_id"),
        explode(TrainDataQueries.gramsOf(col("text"), 2)).as("anchor"))
      .join(broadcast(anchors), Seq("anchor"), "left_semi")
      .select("doc_id").distinct()
    // Rejoin the candidate ids to their text as a broadcast SEMI join: the
    // ids are bare longs (tiny next to the text column), so the corpus side
    // never shuffles — the 100 TB invariant this query exists to keep. If a
    // pathological eval set ever made the candidate-id set unbroadcastable,
    // the fallback is a doc_id-keyed shuffle join (keyed, never all-pairs).
    val candidates = nonEval.join(broadcast(candidateIds), Seq("doc_id"), "left_semi")
    val pairs = candidates
      .join(broadcast(evals.filter(ntoks >= 4)), expr("contains(lower(text), needle)"))
      .select("doc_id", "needle")
      .union(nonEval
        .join(broadcast(shortNeedles), expr("contains(lower(text), needle)"))
        .select("doc_id", "needle"))
    pairs
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_hits"))
      .orderBy("doc_id")
  }

  private val decontamVerbatimSql =
    """WITH norm AS (
      |  SELECT doc_id, text,
      |    trim(regexp_replace(regexp_replace(text, '\bdup\b', ' ', 'g'),
      |                        '\s+', ' ', 'g')) AS nt
      |  FROM documents),
      |grp AS (SELECT nt, min(doc_id) AS gmin FROM norm
      |        GROUP BY 1 HAVING count(*) > 1),
      |evals AS (
      |  SELECT DISTINCT array_to_string(
      |      (string_split(lower(n.text), ' '))[1:8], ' ') AS needle
      |  FROM norm n JOIN grp g ON n.doc_id = g.gmin)
      |SELECT d.doc_id, count(*) AS n_eval_hits
      |FROM norm d JOIN evals e ON position(e.needle IN lower(d.text)) > 0
      |WHERE d.doc_id NOT IN (SELECT gmin FROM grp)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---- N22 dedup_canonical_pick: keep-best within duplicate groups ---------

  /** The selection step AFTER duplicate detection: within each exact-dup
    * group (normalized text), keep the best copy — quality-gate-clean
    * first, then longest, then lowest id (total order, engine-portable).
    * Emits one row per multi-member group: the kept doc, group size, and
    * whether the winner is gate-clean.
    *
    * 100 TB shape: the window partitions by the group key (bounded group
    * sizes — duplicate families, not the corpus); one shuffle on the
    * normalized-text hash, same as dedup_exact.
    *
    * The heavy quality expression (tokenize + 3-grams + 4 rule aggregates
    * per row) is evaluated ONLY on rows that belong to a multi-member dup
    * family: group sizes are aggregated first, families with n_members > 1
    * join back (inner), and `clean` is computed above that join — at
    * web-scale dup rates (a few %) this skips the expression for ~all of
    * the corpus. Plan-audited in PlanAuditSpec ("canonical pick prunes"). */
  private def dedupCanonicalPick(s: SparkSession, d: String): DataFrame =
    dedupCanonicalPickOf(fanOut(documents(s, d)))

  /** Core of `dedup_canonical_pick`, parameterized for the scale probe:
    * `docsIn` = (doc_id, text, n_chars, ...) corpus. */
  private[graft] def dedupCanonicalPickOf(docsIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = graft.ops.DedupOps.normalizedText(col("text"))
    val docs = docsIn.withColumn("grp", md5(norm))
    val fams = docs.groupBy("grp")
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)
    val w = Window.partitionBy("grp")
      .orderBy(col("clean").desc, col("n_chars").desc, col("doc_id"))
    docs
      .join(fams, Seq("grp")) // prunes to dup-family rows BEFORE the quality expr
      .withColumn("clean",
        (TrainDataQueries.qualityReasonsOf(col("text")) === "").cast("int"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id").as("kept_doc"), col("n_members"),
        col("clean").as("kept_clean"))
      .orderBy("kept_doc")
  }

  private val dedupCanonicalPickSql =
    """WITH toksrc AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |gramsrc AS (
      |  SELECT doc_id,
      |         list_transform(range(1, len(t) - 1),
      |                        i -> array_to_string(t[i:i+2], ' ')) AS grams
      |  FROM toksrc),
      |m AS (
      |  SELECT g.doc_id,
      |    len(t.t) AS n, len(list_distinct(t.t)) AS nd,
      |    CAST(list_sum(list_transform(t.t, x -> length(x))) AS BIGINT) AS sumlen,
      |    len(g.grams) AS ngr, len(list_distinct(g.grams)) AS ngd
      |  FROM gramsrc g JOIN toksrc t USING (doc_id)),
      |cleanf AS (
      |  SELECT doc_id,
      |    CASE WHEN nd * 5 >= n * 2 AND (ngr - ngd) * 5 <= ngr AND n >= 20
      |              AND sumlen >= n * 3 AND sumlen <= n * 10
      |         THEN 1 ELSE 0 END AS clean
      |  FROM m),
      |ranked AS (
      |  SELECT d.doc_id, c.clean,
      |    md5(trim(regexp_replace(regexp_replace(d.text, '\bdup\b', ' ', 'g'),
      |                            '\s+', ' ', 'g'))) AS grp,
      |    row_number() OVER (PARTITION BY md5(trim(regexp_replace(
      |        regexp_replace(d.text, '\bdup\b', ' ', 'g'), '\s+', ' ', 'g')))
      |      ORDER BY c.clean DESC, d.n_chars DESC, d.doc_id) AS rk,
      |    count(*) OVER (PARTITION BY md5(trim(regexp_replace(
      |        regexp_replace(d.text, '\bdup\b', ' ', 'g'), '\s+', ' ', 'g'))))
      |      AS n_members
      |  FROM documents d JOIN cleanf c USING (doc_id))
      |SELECT doc_id AS kept_doc, n_members, clean AS kept_clean
      |FROM ranked WHERE n_members > 1 AND rk = 1
      |ORDER BY kept_doc""".stripMargin

  // ---- N21 bpe_merge_topk: one distributed BPE merge step ------------------

  /** The inner step of byte-pair-encoding tokenizer training, distributed:
    * adjacent character-pair counts over the word vocabulary, weighted by
    * word frequency, top-20 merge candidates. Real BPE iterates this; one
    * step is the operator (the loop is a driver-side `while` over it, the
    * same shape as kmeansCentroids' iteration).
    *
    * 100 TB shape: pair counting runs over the VOCABULARY (words × their
    * length), not the corpus — the word-frequency agg collapses the corpus
    * first (map-side combine), so a web-scale corpus costs one keyed agg
    * plus vocabulary-sized pair math; the top-20 plans as
    * TakeOrderedAndProject (per-partition heap, no global sort). */
  private def bpeMergeTopk(s: SparkSession, d: String): DataFrame = {
    val words = documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val pairs = when(length(col("w")) >= 2,
      transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    words
      .select(col("freq"), explode(pairs).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  private val bpeMergeTopkSql =
    """WITH words AS (
      |  SELECT w, count(*) AS freq
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents) GROUP BY 1),
      |pairs AS (
      |  SELECT freq,
      |    unnest(list_transform(range(1, length(w)),
      |      i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
      |  FROM words WHERE length(w) >= 2)
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
      |FROM pairs GROUP BY 1
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  // ---- N25 bpe_train_n: iterated BPE tokenizer training ---------------------

  /** Three full rounds of byte-pair-encoding training: the driver `while`
    * over the `bpe_merge_topk` step. Words become space-delimited symbol
    * sequences (initially characters); each round counts adjacent symbol
    * pairs weighted by word frequency, picks the argmax (cnt DESC, pair ASC
    * — a total order, engine-portable), and rewrites every vocabulary entry
    * by merging that pair. Emits (round, pair, cnt).
    *
    * The merge rewrite is a PADDED DOUBLE string replace — `' a b '` →
    * `' ab '` run twice over the space-padded sequence. One replace pass is
    * left-to-right non-overlapping, so consecutive pair occurrences that
    * share a delimiter space (`a b a b`) leave every other occurrence
    * unmerged; the second pass catches those stragglers, which by then are
    * isolated. This reproduces greedy left-to-right BPE merging, and — run
    * identically in Spark and DuckDB — makes the oracle structurally exact.
    *
    * 100 TB shape: the corpus collapses to the word vocabulary ONCE
    * (map-side-combined agg); every round after that is vocabulary-sized —
    * a keyed agg plus one single-row `collect()` (the argmax, the same
    * bounded driver step as kmeansCentroids' update). `localCheckpoint`
    * truncates lineage per round (the dedup_clusters pattern) so round N
    * doesn't replan rounds 1..N-1. */
  private def bpeTrainN(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rounds = 3
    var vocab = documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), " ").as("s"), col("freq"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    for (r <- 1 to rounds) {
      val t = split(col("s"), " ")
      val prs = when(size(t) >= 2,
          transform(sequence(lit(1), size(t) - 1),
            i => concat(element_at(t, i), lit(" "), element_at(t, i + lit(1)))))
        .otherwise(array().cast("array<string>"))
      val top = vocab.select(col("freq"), explode(prs).as("pr"))
        .groupBy("pr").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pr")).limit(1).collect()(0)
      val (pr, cnt) = (top.getString(0), top.getLong(1))
      merges += ((r.toLong, pr, cnt))
      val merged = pr.replace(" ", "")
      def rep(c: Column): Column =
        replace(c, lit(" " + pr + " "), lit(" " + merged + " "))
      vocab = vocab
        .withColumn("s", trim(rep(rep(concat(lit(" "), col("s"), lit(" "))))))
        .localCheckpoint(false)
    }
    merges.toSeq.toDF("round", "pair", "cnt").orderBy("round")
  }

  /** One BPE round in DuckDB terms (pair count → argmax → padded double
    * replace), unrolled three times — the scripted-iteration oracle. */
  private val bpeTrainNSql = {
    def pairsOf(v: String, p: String): String =
      s"""$p AS (
         |  SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(t)),
         |      i -> t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1])) AS pr
         |    FROM (SELECT string_split(s, ' ') AS t, freq FROM $v))
         |  GROUP BY 1)""".stripMargin
    def topOf(p: String, t: String): String =
      s"$t AS (SELECT pr, cnt FROM $p ORDER BY cnt DESC, pr LIMIT 1)"
    def mergeOf(v: String, t: String, vNext: String): String =
      s"""$vNext AS (
         |  SELECT trim(replace(replace(' ' || s || ' ',
         |      ' ' || (SELECT pr FROM $t) || ' ',
         |      ' ' || (SELECT replace(pr, ' ', '') FROM $t) || ' '),
         |      ' ' || (SELECT pr FROM $t) || ' ',
         |      ' ' || (SELECT replace(pr, ' ', '') FROM $t) || ' ')) AS s, freq
         |  FROM $v)""".stripMargin
    s"""WITH words AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  WHERE length(w) >= 1 GROUP BY 1),
       |v0 AS (
       |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> substring(w, CAST(i AS INTEGER), 1)), ' ') AS s, freq
       |  FROM words),
       |${pairsOf("v0", "p1")},
       |${topOf("p1", "t1")},
       |${mergeOf("v0", "t1", "v1")},
       |${pairsOf("v1", "p2")},
       |${topOf("p2", "t2")},
       |${mergeOf("v1", "t2", "v2")},
       |${pairsOf("v2", "p3")},
       |${topOf("p3", "t3")}
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS round, pr AS pair, cnt FROM t1
       |  UNION ALL SELECT CAST(2 AS BIGINT), pr, cnt FROM t2
       |  UNION ALL SELECT CAST(3 AS BIGINT), pr, cnt FROM t3)
       |ORDER BY round""".stripMargin
  }

  // ---- N25b bpe_encode: tokenize the corpus with the trained merges --------

  /** `bpe_encode`: the APPLY half of the BPE story — the 3 merges
    * bpe_train_n learns (vocabulary-sized training, driver-collected merge
    * list) are broadcast as literals and applied per word across the whole
    * corpus: char-split, the same padded-double-replace chain as training
    * (pad once, all merges, trim once — padding is invariant under the
    * space-delimited replaces), then per-doc char and token totals — the
    * "token count under the real tokenizer" every mixture/packing stage
    * needs. The oracle re-trains AND re-encodes in one unrolled CTE chain.
    * Scale: training cost is vocabulary-sized; encoding is one map-side
    * pass over the corpus (merge list ships as literals in the plan — the
    * broadcast-dictionary shape), one keyed agg per doc. */
  private def bpeEncode(s: SparkSession, d: String): DataFrame =
    bpeEncodeOf(documents(s, d))

  /** The 3-round training half: vocabulary-sized aggs, one single-row
    * argmax collect per round — returns the learned merges in order. */
  private[graft] def bpeTrainedMerges(docs: DataFrame): Seq[String] = {
    val rounds = 3
    var vocab = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), " ").as("s"), col("freq"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    for (_ <- 1 to rounds) {
      val t = split(col("s"), " ")
      val prs = when(size(t) >= 2,
          transform(sequence(lit(1), size(t) - 1),
            i => concat(element_at(t, i), lit(" "), element_at(t, i + lit(1)))))
        .otherwise(array().cast("array<string>"))
      val pr = vocab.select(col("freq"), explode(prs).as("pr"))
        .groupBy("pr").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pr")).limit(1).collect()(0).getString(0)
      merges += pr
      def rep(c: Column): Column =
        replace(c, lit(" " + pr + " "), lit(" " + pr.replace(" ", "") + " "))
      vocab = vocab
        .withColumn("s", trim(rep(rep(concat(lit(" "), col("s"), lit(" "))))))
        .localCheckpoint(false)
    }
    merges.toSeq
  }

  private[graft] def bpeEncodeOf(docs: DataFrame): DataFrame = {
    val merges = bpeTrainedMerges(docs)
    // encode: one native codegen call per document (functions/BpeStats.scala)
    // — the merge list ships as an array literal in the plan, the
    // broadcast-dictionary shape; replaced the interpreted HOF fold that was
    // the r09 driver bench's largest wall-time (18.3 s med → ~1 s).
    docs
      .select(col("doc_id"),
        graft.functions.BpeStats(lower(col("text")), merges).as("st"))
      .select(col("doc_id"), col("st.n_chars").as("n_chars"),
        col("st.n_tokens").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** The original interpreted-HOF formulation, kept as the semantic
    * reference for BpeStatsSpec's native ≡ HOF differential (the same
    * native-expression discipline as cdc_chunks / CdcChunksSpec). */
  private[graft] def bpeEncodeHofOf(docs: DataFrame): DataFrame =
    bpeHofStatsOf(docs, bpeTrainedMerges(docs)).orderBy("doc_id")

  /** The HOF encode half with an explicit merge list — THE single
    * definition of the reference semantics; BpeStatsSpec differentials run
    * against this (not a copy) so spec and reference cannot drift. */
  private[graft] def bpeHofStatsOf(docs: DataFrame,
      merges: Seq[String]): DataFrame = {
    val encodeWord: Column => Column = { w =>
      val charSplit = array_join(
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))), " ")
      val padded = concat(lit(" "), charSplit, lit(" "))
      val applied = merges.foldLeft(padded) { (c, pr) =>
        def rep(x: Column): Column =
          replace(x, lit(" " + pr + " "), lit(" " + pr.replace(" ", "") + " "))
        rep(rep(c))
      }
      size(split(trim(applied), " "))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "\\s+"), w => length(w) >= 1).as("ws"))
      .select(col("doc_id"),
        aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w)).as("n_chars"),
        aggregate(col("ws"), lit(0L),
          (acc, w) => acc + encodeWord(w).cast("long")).as("n_tokens"))
  }

  /** Re-train (v0..t3, the bpe_train_n chain) then re-encode every word —
    * one unrolled scripted oracle. */
  private val bpeEncodeSql = {
    def pairsOf(v: String, p: String): String =
      s"""$p AS (
         |  SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(t)),
         |      i -> t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1])) AS pr
         |    FROM (SELECT string_split(s, ' ') AS t, freq FROM $v))
         |  GROUP BY 1)""".stripMargin
    def topOf(p: String, t: String): String =
      s"$t AS (SELECT pr, cnt FROM $p ORDER BY cnt DESC, pr LIMIT 1)"
    def mergeOf(v: String, t: String, vNext: String): String =
      s"""$vNext AS (
         |  SELECT trim(replace(replace(' ' || s || ' ',
         |      ' ' || (SELECT pr FROM $t) || ' ',
         |      ' ' || (SELECT replace(pr, ' ', '') FROM $t) || ' '),
         |      ' ' || (SELECT pr FROM $t) || ' ',
         |      ' ' || (SELECT replace(pr, ' ', '') FROM $t) || ' ')) AS s, freq
         |  FROM $v)""".stripMargin
    def repOf(x: String, t: String): String =
      s"""replace(replace($x,
         |      ' ' || (SELECT pr FROM $t) || ' ',
         |      ' ' || (SELECT replace(pr, ' ', '') FROM $t) || ' '),
         |      ' ' || (SELECT pr FROM $t) || ' ',
         |      ' ' || (SELECT replace(pr, ' ', '') FROM $t) || ' ')""".stripMargin
    val enc = repOf(repOf(repOf(
      "' ' || array_to_string(list_transform(range(1, length(w) + 1), " +
        "i -> substring(w, CAST(i AS INTEGER), 1)), ' ') || ' '",
      "t1"), "t2"), "t3")
    s"""WITH words AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  WHERE length(w) >= 1 GROUP BY 1),
       |v0 AS (
       |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> substring(w, CAST(i AS INTEGER), 1)), ' ') AS s, freq
       |  FROM words),
       |${pairsOf("v0", "p1")},
       |${topOf("p1", "t1")},
       |${mergeOf("v0", "t1", "v1")},
       |${pairsOf("v1", "p2")},
       |${topOf("p2", "t2")},
       |${mergeOf("v1", "t2", "v2")},
       |${pairsOf("v2", "p3")},
       |${topOf("p3", "t3")},
       |docw AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents),
       |encw AS (
       |  SELECT doc_id, length(w) AS nch,
       |         len(string_split(trim($enc), ' ')) AS ntok
       |  FROM docw WHERE length(w) >= 1)
       |SELECT doc_id, CAST(sum(nch) AS BIGINT) AS n_chars,
       |       CAST(sum(ntok) AS BIGINT) AS n_tokens
       |FROM encw GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- N16b text_collocations: PMI collocation mining ----------------------

  /** `text_collocations`: top-30 bigram collocations by pointwise mutual
    * information — the phrase-mining pass that finds "new york"-style units
    * before tokenizer/vocab training. PMI's log is MONOTONE, so ranking by
    * the raw ratio N·c(ab) / (c(a)·c(b)) needs no libm at all: both
    * products are exact longs (≪ 2⁵³ at any tested SF), the score is one
    * IEEE division rounded 6 dp, and the rank orders on the ROUNDED value
    * with the bigram string as total tie-break. Support floor c(ab) ≥ 5
    * kills the hapax-pair noise PMI is notorious for. Two keyed aggs
    * (bigram, unigram) + broadcast of the scalar total; never doc² work. */
  private def textCollocations(s: SparkSession, d: String): DataFrame = {
    val docs = fanOut(documents(s, d))
    val occ = docs.select(
      explode(TrainDataQueries.gramsOf(col("text"), 2)).as("bg"))
    val c2 = occ.groupBy("bg").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= 5)
    val uni = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
    val c1 = uni.groupBy("w").agg(count(lit(1)).as("c1"))
    val n = uni.agg(count(lit(1)).as("n_tok"))
    c2.withColumn("w1", element_at(split(col("bg"), " "), 1))
      .withColumn("w2", element_at(split(col("bg"), " "), 2))
      .join(c1.select(col("w").as("w1"), col("c1").as("c1a")), "w1")
      .join(c1.select(col("w").as("w2"), col("c1").as("c1b")), "w2")
      .crossJoin(broadcast(n))
      .select(col("bg"), col("c2"),
        round((col("n_tok") * col("c2")).cast("double") /
          (col("c1a") * col("c1b")), 6).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("bg"))
      .limit(30)
  }

  private val textCollocationsSql =
    """WITH toksrc AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |occ AS (
      |  SELECT unnest(list_transform(range(1, len(t)),
      |    i -> array_to_string(t[i:i+1], ' '))) AS bg
      |  FROM toksrc),
      |c2 AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY 1 HAVING count(*) >= 5),
      |uni AS (SELECT unnest(t) AS w FROM toksrc),
      |c1 AS (SELECT w, count(*) AS c1 FROM uni GROUP BY 1),
      |n AS (SELECT count(*) AS n_tok FROM uni)
      |SELECT bg, c2,
      |  round(CAST(n.n_tok * c2.c2 AS DOUBLE) / (a.c1 * b.c1), 6) AS pmi_ratio
      |FROM c2
      |JOIN c1 a ON a.w = string_split(bg, ' ')[1]
      |JOIN c1 b ON b.w = string_split(bg, ' ')[2], n
      |ORDER BY pmi_ratio DESC, bg LIMIT 30""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "text_collocations" -> Q(textCollocations, Some(textCollocationsSql)),
    "chunk_dedup" -> Q(chunkDedup, Some(chunkDedupSql)),
    "chunk_cdc" -> Q(chunkCdc, Some(chunkCdcSql)),
    "lm_bigram_score" -> Q(lmBigramScore, Some(lmBigramScoreSql)),
    "dsir_importance_select" ->
      Q(dsirImportanceSelect, Some(dsirImportanceSelectSql)),
    "text_hashing_vectorizer" ->
      Q(textHashingVectorizer, Some(textHashingVectorizerSql)),
    "score_logistic_infer" ->
      Q(scoreLogisticInfer, Some(scoreLogisticInferSql)),
    "source_overlap_matrix" ->
      Q(sourceOverlapMatrix, Some(sourceOverlapMatrixSql)),
    "lm_heldout_perplexity" ->
      Q(lmHeldoutPerplexity, Some(lmHeldoutPerplexitySql)),
    "sample_temperature" -> Q(sampleTemperature, Some(sampleTemperatureSql)),
    "embedding_norms" -> Q(embeddingNorms, Some(embeddingNormsSql)),
    "embedding_quant_calib" ->
      Q(embeddingQuantCalib, Some(embeddingQuantCalibSql)),
    "length_histogram" -> Q(lengthHistogram, Some(lengthHistogramSql)),
    "url_canonicalize" -> Q(urlCanonicalize, Some(urlCanonicalizeSql)),
    "bpe_merge_topk" -> Q(bpeMergeTopk, Some(bpeMergeTopkSql)),
    "bpe_train_n" -> Q(bpeTrainN, Some(bpeTrainNSql)),
    "bpe_encode" -> Q(bpeEncode, Some(bpeEncodeSql)),
    "dedup_canonical_pick" -> Q(dedupCanonicalPick, Some(dedupCanonicalPickSql)),
    "decontam_verbatim" -> Q(decontamVerbatim, Some(decontamVerbatimSql)),
    "chunk_dedup_rewrite" -> Q(chunkDedupRewrite, Some(chunkDedupRewriteSql)),
  )
}
