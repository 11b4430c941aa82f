package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the documents corpus: the index-build and
  * query-scoring half of a search system (the reference IS a job-search
  * pipeline — its scraped postings feed a search index; pracuj_scraper.py
  * lowers + tokenizes text for exactly this, JobScraper/scrapers/
  * pracuj_scraper.py:183-197), plus the deterministic shuffle-shard layout a
  * training pipeline writes before epoch streaming.
  *
  * Scale notes (100 TB): the inverted index is two keyed map-side-combine
  * aggregations — (doc,term) then (term) — i.e. the word-count shape Spark
  * is built around; posting lists stay distributed (capped array heads here
  * only because the REGISTRY result must be bounded; the real write is the
  * partitioned-write path keyed by term). BM25 reuses the same (doc,term)
  * aggregate, keeps only query-term rows (a broadcast-sized semi filter
  * BEFORE any shuffle), and ranks a per-doc aggregate — no global window,
  * no corpus-wide sort. The shuffle-shard is one scan + one 8-key aggregate:
  * the md5-based permutation is embarrassingly parallel and reproducible on
  * any cluster layout (no rand(), no partition-index dependence).
  */
object SearchQueries {
  import Tables._

  private def toks: Column = split(lower(col("text")), "\\s+")

  /** Fixed query-term set for the retrieval queries: present across the
    * corpus at different document frequencies, so idf actually
    * discriminates. */
  private val queryTerms = Seq("spark", "join", "stream")

  // ---- index_postings: inverted-index build --------------------------------

  /** `index_postings`: the inverted index over documents — per term its
    * document frequency, collection frequency, and the head of its postings
    * (first 10 doc_ids ascending; the full list is the distributed value,
    * capped here only to keep the registry result bounded). Two keyed
    * aggregations, both with map-side combine; nothing corpus-sized ever
    * sits on one node. */
  private[graft] def indexPostingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        array_join(transform(
            slice(sort_array(collect_list(col("doc_id"))), 1, 10),
            _.cast("string")), ",").as("postings_head"))
      .orderBy("term")

  private def indexPostings(s: SparkSession, d: String): DataFrame =
    indexPostingsOf(documents(s, d))

  private val indexPostingsSql =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2)
      |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
      |       array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',')
      |         AS postings_head
      |FROM tf GROUP BY term ORDER BY term""".stripMargin

  // ---- search_bm25: query scoring over the index ---------------------------

  /** `search_bm25`: Okapi BM25 top-10 for a fixed 3-term query
    * (k1 = 1.2, b = 0.75, the standard parameters). Determinism across
    * engines, piece by piece: idf = round(ln((N − df + 0.5)/(df + 0.5) + 1), 6)
    * — the one libm call, rounded before use (the lm_bigram_score recipe);
    * the length ratio dl·N / total_tokens divides exact longs (one
    * correctly-rounded IEEE op) and rounds to 6 dp; the tf normalization is
    * then a fixed sequence of +,×,÷ on those pinned values — identical
    * float64 on any engine — rounded per term to 6 dp; per-doc summation
    * happens in DECIMAL(18,6) (exact, order-independent) with the rank
    * ordered on the decimal, never the float. Docs containing no query term
    * drop out via the inner join — the index does the candidate cut, the
    * scorer never scans non-matching docs. */
  /** Shared BM25 scorer: every query-term-matching doc with its exact
    * DECIMAL(18,6) score (candidate-bounded — non-matching docs never leave
    * the tf join). Consumed by `search_bm25` (global top-10) and
    * `search_diversify` (per-source capped top-10). */
  private def bm25ScoredOf(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .filter(col("term").isin(queryTerms: _*))
    val dl = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
    val stats = docs.select(size(toks).cast("long").as("n_toks"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = round(log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6).as("idf")
    val r = round((col("dl") * col("n_docs")).cast("double") /
      col("total_tokens").cast("double"), 6).as("r")
    val denom = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * col("r"))
    val termScore = round(col("idf") *
      ((col("tf").cast("double") * lit(2.2)) / denom), 6)
    tf.join(broadcast(df_), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), idf, r)
      .select(col("doc_id"),
        termScore.cast("decimal(18,6)").as("term_score"))
      .groupBy("doc_id")
      .agg(sum(col("term_score")).as("score_d"), count(lit(1)).as("n_terms_hit"))
  }

  private[graft] def searchBm25Of(docs: DataFrame): DataFrame =
    bm25ScoredOf(docs)
      .orderBy(col("score_d").desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), col("n_terms_hit"),
        col("score_d").cast("double").as("score"))

  /** `search_diversify`: result diversification — the global BM25 top-10
    * with AT MOST 2 results per source domain, the standard fix for one
    * domain monopolizing a result page. Candidate-bounded windows only:
    * the per-source row_number partitions the MATCHING docs (index cut),
    * never the corpus, and the final top-10 is a TakeOrdered over the
    * capped survivors — no global sort materializes. Rank arithmetic stays
    * on the exact DECIMAL score with doc_id tiebreaks, so both engines
    * elect identical rows. */
  private[graft] def searchDiversifyOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("score_d").desc, col("doc_id"))
    bm25ScoredOf(docs)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .withColumn("src_rank", row_number().over(w))
      .filter(col("src_rank") <= 2)
      .orderBy(col("score_d").desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), col("source"), col("src_rank"),
        col("score_d").cast("double").as("score"))
  }

  private def searchBm25(s: SparkSession, d: String): DataFrame =
    searchBm25Of(documents(s, d))

  private val searchBm25Sql =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  WHERE term IN ('spark', 'join', 'stream')
      |  GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      |       FROM documents),
      |stats AS (SELECT count(*) AS n_docs,
      |                 CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
      |                   AS total_tokens
      |          FROM documents),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id,
      |    round(round(ln((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
      |                   / (CAST(f.df AS DOUBLE) + 0.5) + 1.0), 6)
      |      * ((CAST(t.tf AS DOUBLE) * 2.2)
      |         / (CAST(t.tf AS DOUBLE)
      |            + 1.2 * (0.25 + 0.75 * round(CAST(l.dl * s.n_docs AS DOUBLE)
      |                                         / CAST(s.total_tokens AS DOUBLE), 6)))),
      |      6) AS term_score
      |  FROM tf t JOIN df f USING (term) JOIN dl l USING (doc_id), stats s)
      |SELECT doc_id, count(*) AS n_terms_hit,
      |       CAST(sum(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE) AS score
      |FROM scored
      |GROUP BY doc_id
      |ORDER BY sum(CAST(term_score AS DECIMAL(18,6))) DESC, doc_id
      |LIMIT 10""".stripMargin

  private def searchDiversify(s: SparkSession, d: String): DataFrame =
    searchDiversifyOf(documents(s, d))

  private val searchDiversifySql =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  WHERE term IN ('spark', 'join', 'stream')
      |  GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      |       FROM documents),
      |stats AS (SELECT count(*) AS n_docs,
      |                 CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
      |                   AS total_tokens
      |          FROM documents),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id,
      |    round(round(ln((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
      |                   / (CAST(f.df AS DOUBLE) + 0.5) + 1.0), 6)
      |      * ((CAST(t.tf AS DOUBLE) * 2.2)
      |         / (CAST(t.tf AS DOUBLE)
      |            + 1.2 * (0.25 + 0.75 * round(CAST(l.dl * s.n_docs AS DOUBLE)
      |                                         / CAST(s.total_tokens AS DOUBLE), 6)))),
      |      6) AS term_score
      |  FROM tf t JOIN df f USING (term) JOIN dl l USING (doc_id), stats s),
      |agg AS (
      |  SELECT doc_id, sum(CAST(term_score AS DECIMAL(18,6))) AS score_d
      |  FROM scored GROUP BY doc_id),
      |ranked AS (
      |  SELECT a.doc_id, d.source, a.score_d,
      |    CAST(row_number() OVER (PARTITION BY d.source
      |      ORDER BY a.score_d DESC, a.doc_id) AS INTEGER) AS src_rank
      |  FROM agg a JOIN documents d USING (doc_id))
      |SELECT doc_id, source, src_rank, CAST(score_d AS DOUBLE) AS score
      |FROM ranked WHERE src_rank <= 2
      |ORDER BY score_d DESC, doc_id
      |LIMIT 10""".stripMargin

  /** N38k `search_ndcg`: nDCG@10 of the BM25 ranking against a binary
    * relevance judgment (doc contains ALL query terms) — the ranking-eval
    * every retrieval stack owes before its order is trusted. Discount
    * weights 1/log2(i+1) are the one libm surface: each is rounded to
    * 6 dp BEFORE use (the lm_bigram_score discipline), DCG/IDCG then
    * accumulate rel·w in exact DECIMAL so the 10-term sums cannot
    * reorder, and nDCG is one IEEE division rounded at output. IDCG
    * counts ALL relevant docs (a relevant doc BM25 missed still raises
    * the bar — recall failures lower the metric, as they should). Scale:
    * the ranked page is 10 rows, the relevance flags ride the same corpus
    * scan as the scorer, and the weight table is a 10-row literal range —
    * nothing here grows with the corpus except the one candidate-bounded
    * BM25 pass. */
  private[graft] def searchNdcgOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rel = queryTerms.map(t => array_contains(toks, t))
      .reduce(_ && _).cast("long")
    val relFlags = docs.select(col("doc_id"), rel.as("rel"))
    val top = bm25ScoredOf(docs)
      .orderBy(col("score_d").desc, col("doc_id"))
      .limit(10)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_d").desc, col("doc_id"))))
    val w = round(lit(1.0d) / log2(col("rank") + lit(1.0d)), 6)
    val dcg = top.join(relFlags, Seq("doc_id"))
      .select((col("rel") * w.cast("decimal(8,6)")).as("t"))
      .agg(coalesce(sum(col("t")), lit(0).cast("decimal(18,6)")).as("dcg"))
    val nRel = relFlags.agg(sum(col("rel")).as("n_rel"))
    val ideal = nRel.crossJoin(
        dcg.sparkSession.range(1, 11).select(col("id").as("rank")))
      .filter(col("rank") <= col("n_rel"))
      .select(col("n_rel"),
        round(lit(1.0d) / log2(col("rank") + lit(1.0d)), 6)
          .cast("decimal(8,6)").as("t"))
      .groupBy("n_rel")
      .agg(sum(col("t")).as("idcg"))
    dcg.crossJoin(ideal)
      .select(col("n_rel"),
        col("dcg").cast("double").as("dcg"),
        col("idcg").cast("double").as("idcg"),
        round(col("dcg").cast("double") / col("idcg").cast("double"), 6)
          .as("ndcg"))
  }

  private def searchNdcg(s: SparkSession, d: String): DataFrame =
    searchNdcgOf(documents(s, d))

  private val searchNdcgSql =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  WHERE term IN ('spark', 'join', 'stream')
      |  GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      |       FROM documents),
      |stats AS (SELECT count(*) AS n_docs,
      |                 CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
      |                   AS total_tokens
      |          FROM documents),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id,
      |    round(round(ln((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
      |                   / (CAST(f.df AS DOUBLE) + 0.5) + 1.0), 6)
      |      * ((CAST(t.tf AS DOUBLE) * 2.2)
      |         / (CAST(t.tf AS DOUBLE)
      |            + 1.2 * (0.25 + 0.75 * round(CAST(l.dl * s.n_docs AS DOUBLE)
      |                                         / CAST(s.total_tokens AS DOUBLE), 6)))),
      |      6) AS term_score
      |  FROM tf t JOIN df f USING (term) JOIN dl l USING (doc_id), stats s),
      |agg AS (
      |  SELECT doc_id, sum(CAST(term_score AS DECIMAL(18,6))) AS score_d
      |  FROM scored GROUP BY doc_id),
      |top AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY score_d DESC, doc_id) AS rank
      |  FROM agg ORDER BY score_d DESC, doc_id LIMIT 10),
      |rel AS (
      |  SELECT doc_id, CASE WHEN list_contains(string_split(lower(text), ' '), 'spark')
      |    AND list_contains(string_split(lower(text), ' '), 'join')
      |    AND list_contains(string_split(lower(text), ' '), 'stream')
      |    THEN 1 ELSE 0 END AS rel
      |  FROM documents),
      |dcg AS (
      |  SELECT coalesce(sum(CAST(rel AS DECIMAL(8,6))
      |    * CAST(round(1.0 / log2(rank + 1.0), 6) AS DECIMAL(8,6))), 0)
      |    AS dcg
      |  FROM top JOIN rel USING (doc_id)),
      |nrel AS (SELECT CAST(sum(rel) AS BIGINT) AS n_rel FROM rel),
      |idcg AS (
      |  SELECT n_rel, sum(CAST(round(1.0 / log2(i + 1.0), 6)
      |    AS DECIMAL(8,6))) AS idcg
      |  FROM nrel, range(1, 11) r(i) WHERE i <= n_rel GROUP BY n_rel)
      |SELECT n_rel, CAST(dcg AS DOUBLE) AS dcg, CAST(idcg AS DOUBLE) AS idcg,
      |  round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg
      |FROM dcg, idcg""".stripMargin

  // ---- dataset_shuffle_shard: deterministic epoch shuffle ------------------

  /** `dataset_shuffle_shard`: the reproducible global shuffle a training
    * pipeline applies before sharding an epoch — permutation key =
    * md5(doc_id) prefix (the audit_checksum hex recipe: conv() here, '0x'
    * cast in DuckDB — identical 32-bit value), shard = key mod 8, within-
    * shard order = (key, doc_id). Per shard: size, an id checksum, and the
    * first 5 doc_ids of the permuted order (proving the ORDER, not just the
    * membership, is reproduced). No rand() and no partition-index
    * dependence, so any cluster layout — or two runs months apart — emits
    * the identical epoch; at 100 TB this is one scan + an 8-key aggregate
    * (the real write streams each shard out partitionBy(shard) sorted by
    * the same key; heads here keep the registry result bounded). */
  private[graft] def datasetShuffleShardOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .select(col("doc_id"), col("h"), (col("h") % 8).cast("int").as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        array_join(transform(
          slice(sort_array(collect_list(struct(col("h"), col("doc_id")))), 1, 5),
          x => x.getField("doc_id").cast("string")), ",").as("head_ids"))
      .orderBy("shard")

  private def datasetShuffleShard(s: SparkSession, d: String): DataFrame =
    datasetShuffleShardOf(documents(s, d))

  // ---- shard_rendezvous: HRW (rendezvous) shard assignment -----------------

  /** `shard_rendezvous`: highest-random-weight (rendezvous) hashing
    * (Thaler & Ravishankar 1998) — each doc goes to the shard whose
    * md5(doc_id#shard) key is the maximum. The property that justifies it
    * over `dataset_shuffle_shard`'s mod-hash: removing a shard moves ONLY
    * that shard's docs (the winner among the surviving keys is unchanged
    * for everyone else), where mod-N reassigns ~(N−1)/N of the corpus.
    * The result PROVES it: per shard, the count of docs whose assignment
    * changes when shard 7 is dropped — exactly 0 for shards 0-6 and
    * n_docs for shard 7, hash-checked (a full-value oracle, not a bound:
    * every key is portable md5 string order). Map-only — one scan, one
    * 8-key agg; nothing shuffles but the 8-row aggregate. */
  private def shardRendezvous(s: SparkSession, d: String): DataFrame = {
    val ks = (0 until 8).map(i =>
      md5(concat(col("doc_id").cast("string"), lit("#" + i))))
    val arr8 = array(ks: _*)
    val arr7 = array(ks.take(7): _*)
    val shard8 = (array_position(arr8, array_max(arr8)) - 1).cast("int")
    val shard7 = (array_position(arr7, array_max(arr7)) - 1).cast("int")
    documents(s, d)
      .select(col("doc_id"), shard8.as("shard"), shard7.as("shard_drop7"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        count(when(col("shard") =!= col("shard_drop7"), lit(1)))
          .as("n_moved_on_drop7"))
      .orderBy("shard")
  }

  private val shardRendezvousSql =
    """WITH k AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 8),
      |      s -> md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)))
      |      AS ks
      |  FROM documents),
      |a AS (
      |  SELECT doc_id,
      |    CAST(list_position(ks, list_max(ks)) - 1 AS INTEGER) AS shard,
      |    CAST(list_position(ks[1:7], list_max(ks[1:7])) - 1 AS INTEGER)
      |      AS shard_drop7
      |  FROM k)
      |SELECT shard, count(*) AS n_docs,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |       CAST(count(*) FILTER (WHERE shard <> shard_drop7) AS BIGINT)
      |         AS n_moved_on_drop7
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  private val datasetShuffleShardSql =
    """WITH keyed AS (
      |  SELECT doc_id,
      |         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |              AS BIGINT) AS h
      |  FROM documents)
      |SELECT CAST(h % 8 AS INTEGER) AS shard,
      |       count(*) AS n_docs,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |       array_to_string((list(doc_id ORDER BY h, doc_id))[1:5], ',')
      |         AS head_ids
      |FROM keyed GROUP BY 1 ORDER BY shard""".stripMargin

  // ---- search_phrase: positional-index phrase query ------------------------

  /** `search_phrase`: exact-phrase retrieval ("spark join") through a
    * POSITIONAL index — posexplode emits (doc, pos, term), the phrase's
    * terms filter BEFORE any shuffle (same candidate cut as BM25), and
    * adjacency is a self-equi-join on (doc_id, pos+1): occurrences =
    * positions i where term_i = 'spark' ∧ term_{i+1} = 'join'. The join is
    * keyed (doc_id, pos) — co-partitioned, never a cross product; at 100 TB
    * both sides are the query-term postings only, a vanishing fraction of
    * the corpus. Oracle computes the same count per doc with a per-row
    * list_filter over token indexes — two formulations, one semantic. */
  private[graft] def searchPhraseOf(docs: DataFrame): DataFrame = {
    val pos = docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "term")))
      .filter(col("term").isin("spark", "join"))
    val a = pos.filter(col("term") === "spark").select(col("doc_id"), col("pos"))
    val b = pos.filter(col("term") === "join")
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .orderBy("doc_id")
  }

  private def searchPhrase(s: SparkSession, d: String): DataFrame =
    searchPhraseOf(documents(s, d))

  private val searchPhraseSql =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t
      |           FROM documents),
      |occ AS (
      |  SELECT doc_id,
      |         len(list_filter(range(1, len(t)),
      |             i -> t[CAST(i AS INTEGER)] = 'spark'
      |                  AND t[CAST(i AS INTEGER) + 1] = 'join')) AS n_occurrences
      |  FROM t)
      |SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences
      |FROM occ WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin

  // ---- search_bm25_batch: one scan, many queries ---------------------------

  /** Inline query batch: (query_id, term) — broadcast-sized always. */
  private val batchQueries = Seq(
    ("q1", "spark"), ("q1", "join"),
    ("q2", "stream"), ("q2", "batch"),
    ("q3", "hash"), ("q3", "table"))

  /** `search_bm25_batch`: BM25 for a BATCH of queries in one corpus pass —
    * the serving shape when queries arrive in micro-batches. The query
    * table (query_id, term) broadcasts onto the (doc,term) aggregate (the
    * per-term semi filter now comes from the join itself); scores fold per
    * (query_id, doc); ranking is a window per query_id — partition count =
    * number of queries, each partition holding that query's candidates
    * only, never the corpus. Same pinned arithmetic as `search_bm25`. */
  private[graft] def searchBm25BatchOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val qs = batchQueries.toDF("query_id", "term")
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(broadcast(qs), Seq("term"))
    val dl = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
    val stats = docs.select(size(toks).cast("long").as("n_toks"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"))
    val df_ = tf.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = round(log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6).as("idf")
    val r = round((col("dl") * col("n_docs")).cast("double") /
      col("total_tokens").cast("double"), 6).as("r")
    val denom = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * col("r"))
    val termScore = round(col("idf") *
      ((col("tf").cast("double") * lit(2.2)) / denom), 6)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("score_d").desc, col("doc_id"))
    tf.join(broadcast(df_), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("tf"), idf, r)
      .select(col("query_id"), col("doc_id"),
        termScore.cast("decimal(18,6)").as("term_score"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("term_score")).as("score_d"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk"), col("doc_id"),
        col("score_d").cast("double").as("score"))
      .orderBy("query_id", "rk")
  }

  private def searchBm25Batch(s: SparkSession, d: String): DataFrame =
    searchBm25BatchOf(documents(s, d))

  private val searchBm25BatchSql =
    """WITH queries(query_id, term) AS (VALUES
      |  ('q1', 'spark'), ('q1', 'join'),
      |  ('q2', 'stream'), ('q2', 'batch'),
      |  ('q3', 'hash'), ('q3', 'table')),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  WHERE term IN (SELECT term FROM queries)
      |  GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      |       FROM documents),
      |stats AS (SELECT count(*) AS n_docs,
      |                 CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
      |                   AS total_tokens
      |          FROM documents),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT q.query_id, t.doc_id,
      |    round(round(ln((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
      |                   / (CAST(f.df AS DOUBLE) + 0.5) + 1.0), 6)
      |      * ((CAST(t.tf AS DOUBLE) * 2.2)
      |         / (CAST(t.tf AS DOUBLE)
      |            + 1.2 * (0.25 + 0.75 * round(CAST(l.dl * s.n_docs AS DOUBLE)
      |                                         / CAST(s.total_tokens AS DOUBLE), 6)))),
      |      6) AS term_score
      |  FROM tf t JOIN queries q USING (term) JOIN df f USING (term)
      |       JOIN dl l USING (doc_id), stats s),
      |folded AS (
      |  SELECT query_id, doc_id,
      |         sum(CAST(term_score AS DECIMAL(18,6))) AS score_d
      |  FROM scored GROUP BY 1, 2),
      |ranked AS (
      |  SELECT query_id, doc_id, score_d,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY score_d DESC, doc_id) AS rk
      |  FROM folded)
      |SELECT query_id, CAST(rk AS INTEGER) AS rk, doc_id,
      |       CAST(score_d AS DOUBLE) AS score
      |FROM ranked WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin

  // ---- index_merge_delta: incremental index maintenance --------------------

  /** Term-level index with FULL postings (internal form for the merge;
    * also the batch-rebuild reference the streaming IndexDeltaSink spec
    * compares against). */
  private[graft] def indexFull(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        sort_array(collect_list(col("doc_id"))).as("postings"))

  /** `index_merge_delta`: incremental index maintenance — index the base
    * corpus (doc_id % 10 ≠ 0) and a delta batch (doc_id % 10 = 0)
    * SEPARATELY, then merge per term: df/cf add, postings concat+sort (the
    * sides are disjoint by construction, as an ingest batch is vs the
    * standing corpus). The oracle rebuilds the index from the FULL corpus
    * in one shot — hash equality IS the incremental ≡ rebuild proof, the
    * invariant that lets a 100 TB index absorb a daily batch without
    * touching the other 99.9%. The merge is one term-keyed full-outer join
    * — per-term work, map-side after the shuffle; real systems segment hot
    * terms' lists (docs here cap the registry output at 10). */
  private[graft] def indexMergeDeltaOf(docs: DataFrame): DataFrame = {
    // Each side's doc filter pushes below its explode (plan-audited), so the
    // two builds together explode the corpus exactly once — a disjoint
    // split, not a double scan of the token volume.
    val base = indexFull(docs.filter(col("doc_id") % 10 =!= 0))
    val delta = indexFull(docs.filter(col("doc_id") % 10 === 0))
      .withColumnRenamed("df", "d_df").withColumnRenamed("cf", "d_cf")
      .withColumnRenamed("postings", "d_postings")
    base.join(delta, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("d_df"), lit(0L))).as("df"),
        (coalesce(col("cf"), lit(0L)) + coalesce(col("d_cf"), lit(0L))).as("cf"),
        array_join(transform(
          slice(sort_array(concat(
            coalesce(col("postings"), array().cast("array<long>")),
            coalesce(col("d_postings"), array().cast("array<long>")))), 1, 10),
          _.cast("string")), ",").as("postings_head"))
      .orderBy("term")
  }

  private def indexMergeDelta(s: SparkSession, d: String): DataFrame =
    indexMergeDeltaOf(documents(s, d))

  // ---- search_autocomplete: prefix completions from the vocabulary --------

  /** `search_autocomplete`: type-ahead completions — for each of a fixed
    * prefix set, the top-5 vocabulary terms by collection frequency (ties
    * to the lexicographically smaller term). Runs off the term-level
    * aggregate (vocabulary-sized — the index, never the corpus); the
    * per-prefix ranking window partitions on the prefix, each partition
    * holding that prefix's completions only. At 100 TB the vocabulary is
    * still bounded (Heaps' law) and this stays a dictionary-sized query. */
  private val prefixes = Seq("s", "st", "j", "c")

  private[graft] def searchAutocompleteOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val vocab = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cf"))
    val pre = prefixes.toDF("prefix")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("prefix")
      .orderBy(col("cf").desc, col("term"))
    vocab.join(broadcast(pre), col("term").startsWith(col("prefix")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("prefix"), col("rk"), col("term"), col("cf"))
      .orderBy("prefix", "rk")
  }

  private def searchAutocomplete(s: SparkSession, d: String): DataFrame =
    searchAutocompleteOf(documents(s, d))

  private val searchAutocompleteSql =
    """WITH vocab AS (
      |  SELECT term, count(*) AS cf
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1),
      |pre(prefix) AS (VALUES ('s'), ('st'), ('j'), ('c')),
      |ranked AS (
      |  SELECT p.prefix, v.term, v.cf,
      |         row_number() OVER (PARTITION BY p.prefix
      |                            ORDER BY v.cf DESC, v.term) AS rk
      |  FROM vocab v JOIN pre p ON v.term LIKE p.prefix || '%')
      |SELECT prefix, CAST(rk AS INTEGER) AS rk, term, cf
      |FROM ranked WHERE rk <= 5 ORDER BY prefix, rk""".stripMargin

  // ---- search_snippet: result-rendering context window ---------------------

  /** `search_snippet`: the ±3-token context window around the FIRST
    * occurrence of the query term per matching doc — what a results page
    * renders under each hit. Pure per-row array math (array_position +
    * slice + join) — no shuffle at all beyond the final presentation sort;
    * at 100 TB snippet extraction rides the scan that scored the hit.
    * Oracle recomputes with DuckDB list primitives — two engines, one
    * windowing rule (clamped to the doc's bounds). */
  private[graft] def searchSnippetOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), toks.as("t"))
      .withColumn("pos", array_position(col("t"), "spark"))
      .filter(col("pos") > 0)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        concat_ws(" ", slice(col("t"),
          greatest(lit(1), col("pos") - 3).cast("int"),
          (col("pos") + 3 -
            greatest(lit(1), col("pos") - 3) + 1).cast("int"))).as("snippet"))
      .orderBy("doc_id")

  private def searchSnippet(s: SparkSession, d: String): DataFrame =
    searchSnippetOf(documents(s, d))

  private val searchSnippetSql =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t
      |           FROM documents),
      |hit AS (SELECT doc_id, t, list_position(t, 'spark') AS pos FROM t
      |        WHERE list_position(t, 'spark') IS NOT NULL
      |          AND list_position(t, 'spark') > 0)
      |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |       array_to_string(t[CAST(greatest(1, pos - 3) AS INTEGER)
      |                         :CAST(pos + 3 AS INTEGER)], ' ') AS snippet
      |FROM hit ORDER BY doc_id""".stripMargin

  // ---- search_cooccur: co-occurrence query expansion -----------------------

  /** `search_cooccur`: query-expansion candidates — terms ranked by how
    * many docs they share with the seed term ('spark'), with the doc-share
    * ratio exact (IEEE division of longs). The classic related-terms
    * signal. Geometry: the seed's posting docs are a SEMI filter on the
    * (doc,term) aggregate (never a pair explosion); the count is one keyed
    * agg over the seed's documents only — at 100 TB cost tracks the seed's
    * df, not the corpus. */
  private[graft] def searchCooccurOf(docs: DataFrame): DataFrame = {
    val dt = docs.select(col("doc_id"), explode(toks).as("term")).distinct()
    val seedDocs = dt.filter(col("term") === "spark").select("doc_id")
    val nSeed = seedDocs.agg(count(lit(1)).as("n_seed"))
    dt.join(seedDocs, Seq("doc_id"), "left_semi")
      .filter(col("term") =!= "spark")
      .groupBy("term").agg(count(lit(1)).as("n_shared"))
      .crossJoin(broadcast(nSeed))
      .select(col("term"), col("n_shared"),
        round(col("n_shared").cast("double") /
          col("n_seed").cast("double"), 6).as("share"))
      .orderBy(col("n_shared").desc, col("term"))
      .limit(10)
  }

  private def searchCooccur(s: SparkSession, d: String): DataFrame =
    searchCooccurOf(documents(s, d))

  private val searchCooccurSql =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, term
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)),
      |seed AS (SELECT doc_id FROM dt WHERE term = 'spark'),
      |n AS (SELECT count(*) AS n_seed FROM seed)
      |SELECT term, count(*) AS n_shared,
      |       round(CAST(count(*) AS DOUBLE) / CAST(n.n_seed AS DOUBLE), 6)
      |         AS share
      |FROM dt JOIN seed USING (doc_id), n
      |WHERE term <> 'spark'
      |GROUP BY term, n.n_seed
      |ORDER BY n_shared DESC, term LIMIT 10""".stripMargin

  // ---- search_more_like_this: doc-to-doc retrieval -------------------------

  /** `search_more_like_this`: Lucene's MLT shape — given a SEED document,
    * rank the corpus by term-frequency HISTOGRAM INTERSECTION with the
    * seed: score = Σ_t min(tf_seed(t), tf_doc(t)). Exact-integer scoring
    * with doc_id tie-break — no float at all (on a realistic corpus the
    * per-term contribution would be idf-discounted like search_bm25; the
    * candidate-cut plan is identical). The seed's tf profile BROADCASTS,
    * the (doc,term) aggregate joins it — posting-list work only for the
    * seed's terms — and one keyed sum ranks. At 100 TB this serves
    * "related documents" for any probe doc without touching non-matching
    * postings. */
  private def searchMoreLikeThis(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d).select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val seed = tf.filter(col("doc_id") === 0)
      .select(col("term"), col("tf").as("tf_seed"))
    tf.filter(col("doc_id") =!= 0)
      .join(broadcast(seed), Seq("term"))
      .groupBy("doc_id")
      .agg(sum(least(col("tf"), col("tf_seed"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  private val searchMoreLikeThisSql =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2),
      |seed AS (SELECT term, tf AS tf_seed FROM tf WHERE doc_id = 0)
      |SELECT t.doc_id, CAST(sum(least(t.tf, s.tf_seed)) AS BIGINT) AS score
      |FROM tf t JOIN seed s USING (term)
      |WHERE t.doc_id <> 0
      |GROUP BY t.doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  // ---- search_prf_expand: pseudo-relevance feedback ------------------------

  /** `search_prf_expand`: Rocchio-style pseudo-relevance feedback — run the
    * fixed query through BM25, take the top-10 docs AS IF relevant, and
    * rank the terms those docs add (query terms excluded) as expansion
    * candidates. Expansion ranking is exact-integer (feedback-set df, then
    * collection tf, then term) — the libm-sensitive part is confined to the
    * already-proven BM25 stage. Plan: the top-10 doc list BROADCASTS back
    * onto the (doc,term) aggregate, so expansion costs one semi join + one
    * keyed count over ten documents' terms — independent of corpus size. */
  private def searchPrfExpand(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val top = searchBm25Of(docs).select("doc_id")
    docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(broadcast(top), Seq("doc_id"))
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy("term")
      .agg(count(lit(1)).as("df_top"), sum("tf").as("cf_top"))
      .orderBy(col("df_top").desc, col("cf_top").desc, col("term"))
      .limit(10)
  }

  private val searchPrfExpandSql =
    s"""WITH topdocs AS (
       |  SELECT doc_id FROM ($searchBm25Sql)),
       |tf_all AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
       |        FROM documents)
       |  GROUP BY 1, 2)
       |SELECT term, count(*) AS df_top, CAST(sum(tf) AS BIGINT) AS cf_top
       |FROM tf_all JOIN topdocs USING (doc_id)
       |WHERE term NOT IN ('spark', 'join', 'stream')
       |GROUP BY term
       |ORDER BY df_top DESC, cf_top DESC, term LIMIT 10""".stripMargin

  // ---- search_rerank_twostage: candidate retrieval + rerank ----------------

  /** `search_rerank_twostage`: the production retrieval shape — a cheap
    * recall stage (BM25 top-10 over the index) feeds an expensive
    * precision stage that runs ONLY on the bounded candidate set. The
    * reranker here is a DETERMINISTIC FAKE cross-encoder (the
    * audit-checksum md5-hex recipe over query‖doc, honest about the stub —
    * no model weights in this sandbox); what ships either way is the
    * two-stage plumbing: candidates bounded ⇒ rerank cost O(k) regardless
    * of corpus size, final = 0.5·bm25 + 0.5·fake, rank on the rounded
    * blend with doc_id tie-break. */
  private def searchRerankTwostage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cands = searchBm25Of(documents(s, d))
    // blend in EXACT decimals: 0.5·(6-dp score) lands on .xxxxxx5 values a
    // binary double cannot hold, and the two engines' round() split there
    val fakeDec = (conv(substring(md5(concat(lit("q1|"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 1000)
      .cast(DecimalType(10, 0)) * lit(BigDecimal("0.001")).cast(DecimalType(4, 3))
    val w = Window.orderBy(col("final_dec").desc, col("doc_id"))
    cands
      .withColumn("final_dec",
        (col("score").cast(DecimalType(18, 6)) + fakeDec) *
          lit(BigDecimal("0.5")).cast(DecimalType(2, 1)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("final_dec").cast("double").as("final"), col("rnk"))
      .orderBy("rnk")
  }

  private val searchRerankTwostageSql =
    s"""WITH cands AS ($searchBm25Sql),
       |blended AS (
       |  SELECT doc_id,
       |    (CAST(score AS DECIMAL(18,6))
       |     + CAST(CAST('0x' || substring(md5('q1|' || doc_id), 1, 8) AS BIGINT)
       |            % 1000 AS DECIMAL(10,0)) * CAST(0.001 AS DECIMAL(4,3)))
       |    * CAST(0.5 AS DECIMAL(2,1)) AS final_dec
       |  FROM cands),
       |ranked AS (
       |  SELECT doc_id, final_dec,
       |         row_number() OVER (ORDER BY final_dec DESC, doc_id) AS rnk
       |  FROM blended)
       |SELECT doc_id, CAST(final_dec AS DOUBLE) AS final, CAST(rnk AS INTEGER) AS rnk
       |FROM ranked WHERE rnk <= 5 ORDER BY rnk""".stripMargin

  // ---- search_rrf_fusion: hybrid lexical + semantic retrieval --------------

  /** `search_rrf_fusion`: reciprocal-rank fusion (Cormack/Clarke/Büttcher
    * 2009) of the lexical BM25 ranking and a semantic embedding ranking —
    * the standard hybrid-retrieval merge (score-free, so the two systems'
    * incomparable score scales never touch): rrf(d) = Σ 1/(60 + rank_i(d))
    * over the rankings that retrieved d. The semantic query is document 7's
    * embedding (`doc_id` = `vec_id` in the synthetic grid), the lexical
    * query the fixed 3-term set. Scale shape: BOTH candidate lists are
    * top-50 TakeOrdereds (lexical is already index-cut to matching docs;
    * semantic is a map-only broadcast-query cosine scan — the IVF/LSH
    * bucket path swaps in at corpus scale), so the rank windows and the
    * full-outer fusion join run on ≤ 50-row lists, never the corpus. Rank
    * reciprocals are rounded 6 dp before the fixed-sequence sum; ranking
    * on raw-double cosine with id tie-breaks is the proven cross-engine
    * kNN recipe. */
  private[graft] def searchRrfFusionOf(docs: DataFrame, e: DataFrame): DataFrame = {
    import graft.ops.VectorOps
    val lexW = Window.orderBy(col("score_d").desc, col("doc_id"))
    val lex = bm25ScoredOf(docs)
      .orderBy(col("score_d").desc, col("doc_id")).limit(50)
      .withColumn("lex_rank", row_number().over(lexW))
      .select(col("doc_id"), col("lex_rank"))
    val q = e.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val semW = Window.orderBy(col("cos").desc, col("doc_id"))
    val sem = e.filter(col("vec_id") =!= 7)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        VectorOps.cosine(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(50)
      .withColumn("sem_rank", row_number().over(semW))
      .select(col("doc_id"), col("sem_rank"))
    val rrf = round(
      coalesce(round(lit(1.0) / (lit(60) + col("lex_rank")), 6), lit(0.0)) +
        coalesce(round(lit(1.0) / (lit(60) + col("sem_rank")), 6), lit(0.0)),
      6)
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", rrf)
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf_score"))
  }

  private def searchRrfFusion(s: SparkSession, d: String): DataFrame =
    searchRrfFusionOf(documents(s, d), embeddings(s, d))

  private val searchRrfFusionSql =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  WHERE term IN ('spark', 'join', 'stream')
      |  GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      |       FROM documents),
      |stats AS (SELECT count(*) AS n_docs,
      |                 CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
      |                   AS total_tokens
      |          FROM documents),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id,
      |    round(round(ln((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
      |                   / (CAST(f.df AS DOUBLE) + 0.5) + 1.0), 6)
      |      * ((CAST(t.tf AS DOUBLE) * 2.2)
      |         / (CAST(t.tf AS DOUBLE)
      |            + 1.2 * (0.25 + 0.75 * round(CAST(l.dl * s.n_docs AS DOUBLE)
      |                                         / CAST(s.total_tokens AS DOUBLE), 6)))),
      |      6) AS term_score
      |  FROM tf t JOIN df f USING (term) JOIN dl l USING (doc_id), stats s),
      |lex_top AS (
      |  SELECT doc_id, sum(CAST(term_score AS DECIMAL(18,6))) AS score_d
      |  FROM scored GROUP BY doc_id
      |  ORDER BY score_d DESC, doc_id LIMIT 50),
      |lex AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY score_d DESC, doc_id) AS lex_rank
      |  FROM lex_top),
      |q AS (SELECT embedding FROM embeddings WHERE vec_id = 7),
      |sem0 AS (
      |  SELECT c.vec_id AS doc_id,
      |    list_reduce(list_transform(q.embedding,
      |        (x, i) -> CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
      |      (u, v) -> u + v)
      |    / (sqrt(list_reduce(list_transform(q.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v))
      |     * sqrt(list_reduce(list_transform(c.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (u, v) -> u + v)))
      |    AS cos
      |  FROM q, embeddings c WHERE c.vec_id <> 7),
      |sem_top AS (SELECT * FROM sem0 ORDER BY cos DESC, doc_id LIMIT 50),
      |sem AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
      |  FROM sem_top)
      |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
      |  CAST(lex_rank AS INTEGER) AS lex_rank,
      |  CAST(sem_rank AS INTEGER) AS sem_rank,
      |  round(COALESCE(round(1.0 / (60 + lex_rank), 6), 0.0)
      |      + COALESCE(round(1.0 / (60 + sem_rank), 6), 0.0), 6) AS rrf_score
      |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
      |ORDER BY rrf_score DESC, COALESCE(lex.doc_id, sem.doc_id)
      |LIMIT 10""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "search_rrf_fusion" -> Q(searchRrfFusion, Some(searchRrfFusionSql)),
    "search_more_like_this" -> Q(searchMoreLikeThis, Some(searchMoreLikeThisSql)),
    "search_prf_expand" -> Q(searchPrfExpand, Some(searchPrfExpandSql)),
    "search_rerank_twostage" -> Q(searchRerankTwostage, Some(searchRerankTwostageSql)),
    "index_postings" -> Q(indexPostings, Some(indexPostingsSql)),
    "search_autocomplete" -> Q(searchAutocomplete, Some(searchAutocompleteSql)),
    "search_snippet" -> Q(searchSnippet, Some(searchSnippetSql)),
    "search_cooccur" -> Q(searchCooccur, Some(searchCooccurSql)),
    "search_bm25" -> Q(searchBm25, Some(searchBm25Sql)),
    "search_diversify" -> Q(searchDiversify, Some(searchDiversifySql)),
    "search_ndcg" -> Q(searchNdcg, Some(searchNdcgSql)),
    "search_bm25_batch" -> Q(searchBm25Batch, Some(searchBm25BatchSql)),
    "search_phrase" -> Q(searchPhrase, Some(searchPhraseSql)),
    "index_merge_delta" -> Q(indexMergeDelta, Some(indexPostingsSql)),
    "dataset_shuffle_shard" -> Q(datasetShuffleShard, Some(datasetShuffleShardSql)),
    "shard_rendezvous" -> Q(shardRendezvous, Some(shardRendezvousSql)))
}
