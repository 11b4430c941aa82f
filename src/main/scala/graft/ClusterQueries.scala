package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Embedding-space clustering + SemDeDup-style semantic dedup — the
  * curation stage that groups a corpus by meaning and prunes redundant
  * near-identical content inside each group (Abbas et al., "SemDeDup",
  * 2023 — the published recipe for pruning web-scale training sets).
  *
  * Scale notes (100 TB): Lloyd iterations are the [[VectorOps.kmeansLloyd]]
  * loop — per round one map-only assignment scan (centroids travel INSIDE
  * the plan as a k×dim literal; the corpus is never joined or amplified)
  * plus one (cid,dim)-keyed partial-agg'd shuffle; only k·dim rows ever
  * reach the driver. The semantic prune then pairs vectors ONLY within a
  * cluster — O(Σ s_c²) vs the O(n²) corpus self-join, with cluster count
  * the knob that bounds s_c. Every distance is an index-order IEEE fold,
  * every centroid mean is an order-independent DECIMAL sum rounded to 4 dp
  * in exact arithmetic (partitioning can never move a result — the r06
  * lesson), so DuckDB replays the whole computation bit-for-bit
  * (scripted-iteration oracle, the `bpe_train_n` pattern).
  */
object ClusterQueries {
  import Tables._

  private val K = 8
  private val Iters = 2
  private val Dim = 64
  /** Within-cluster cosine at/above this is a semantic duplicate (the
    * synthetic embeddings are near-orthogonal — max within-cluster cosine
    * ~0.47 — so the audit threshold matches dedup_embedding's 0.3). */
  private val Tau = 0.30

  // ---- shared oracle scaffolding (scripted Lloyd iterations) ---------------

  /** Assignment CTE: nearest centroid of `cen` for every vector of `e`,
    * exact Σ(x−c)² fold, ties to the lower cid. */
  private def assignCte(out: String, cen: String): String =
    s"""$out AS (SELECT vec_id, v, cid FROM (
       |  SELECT e.vec_id, e.v, $cen.cid,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           list_reduce(list_transform(e.v,
       |             (x, i) -> (x - $cen.c[i]) * (x - $cen.c[i])),
       |             (u, w) -> u + w), $cen.cid) AS rn
       |  FROM e CROSS JOIN $cen) WHERE rn = 1)""".stripMargin

  /** Update CTE pair: per-(cid,dim) 4-dp-rounded mean over the assignment,
    * reassembled into centroid arrays; empty clusters keep `prev`'s row.
    *
    * Replays [[graft.ops.VectorOps.kmeansLloyd]]'s order-independent mean
    * exactly: elements quantize to DECIMAL(18,7) (exact integer sum `si` at
    * scale 1e7), and the 4-dp half-away-from-zero mean is pure integer
    * arithmetic — m·1e4 = round(si/(1000·n)) = sign·((2·|si| + d) // (2·d))
    * with d = 1000·n (`//` truncates; operands are kept non-negative so
    * truncation IS floor, and floor((2a+b)/2b) IS round-half-up(a/b)).
    * The only float op left is the final /10000.0 — one correctly-rounded
    * IEEE division on both engines. */
  private def updateCte(outU: String, outC: String, assign: String,
      prev: String): String =
    s"""$outU AS (SELECT cid, dim,
       |          CAST((CASE WHEN si < 0 THEN -1 ELSE 1 END)
       |               * ((2 * abs(si) + n * 1000) // (2 * n * 1000))
       |               AS DOUBLE) / 10000.0 AS m
       |        FROM (SELECT cid, CAST(dim AS INTEGER) AS dim,
       |                CAST(SUM(CAST(v[CAST(dim AS INTEGER)] AS DECIMAL(18,7)))
       |                     * 10000000 AS BIGINT) AS si,
       |                COUNT(*) AS n
       |              FROM $assign, range(1, ${Dim + 1}) t(dim) GROUP BY 1, 2)),
       |$outC AS (SELECT p.cid, coalesce(u.c, p.c) AS c
       |        FROM $prev p LEFT JOIN (SELECT cid, list(m ORDER BY dim) AS c
       |                                FROM $outU GROUP BY cid) u
       |          ON u.cid = p.cid)""".stripMargin

  /** The WITH prologue shared by both oracles: cast-to-double corpus, first-k
    * init, then `Iters` scripted assign/update rounds ending in a final
    * assignment `af` against the final centroids `c$Iters`. */
  private def lloydCtes: String = {
    val rounds = (1 to Iters).map { i =>
      assignCte(s"a$i", s"c${i - 1}") + ",\n" +
        updateCte(s"u$i", s"c$i", s"a$i", s"c${i - 1}")
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id,
       |            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |          FROM embeddings),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
       |              v AS c
       |       FROM e ORDER BY vec_id LIMIT $K),
       |$rounds,
       |${assignCte("af", s"c$Iters")}""".stripMargin
  }

  // ---- kmeans_assign -------------------------------------------------------

  /** `kmeans_assign`: final centroids (per-dimension) + cluster sizes after
    * `Iters` distributed Lloyd rounds. */
  private def kmeansAssign(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val cents = VectorOps.kmeansLloyd(e, K, Iters)
    val counts = e
      .withColumn("cid", VectorOps.assignExact(col("embedding"), cents))
      .groupBy("cid").agg(count(lit(1)).as("n_members"))
    import s.implicits._
    val centRows = cents.flatMap { case (cid, v) =>
      v.zipWithIndex.map { case (c, i) => (cid, i + 1, c) }
    }.toDF("cid", "dim", "c")
    centRows.join(counts, Seq("cid"), "left")
      .select(col("cid"), col("dim"), col("c"),
        coalesce(col("n_members"), lit(0L)).as("n_members"))
      .orderBy("cid", "dim")
  }

  private def kmeansAssignSql: String =
    s"""$lloydCtes,
       |n AS (SELECT cid, count(*) AS n_members FROM af GROUP BY cid)
       |SELECT c$Iters.cid, CAST(t.dim AS INTEGER) AS dim,
       |       c$Iters.c[CAST(t.dim AS INTEGER)] AS c,
       |       coalesce(n.n_members, 0) AS n_members
       |FROM c$Iters CROSS JOIN range(1, ${Dim + 1}) t(dim)
       |LEFT JOIN n ON n.cid = c$Iters.cid
       |ORDER BY 1, 2""".stripMargin

  // ---- dedup_semantic ------------------------------------------------------

  /** `dedup_semantic`: SemDeDup prune list — a vector is dropped when a
    * LOWER-id member of its own cluster is cosine-≥ Tau close (keep-lowest
    * representative, pairs bounded by the cluster). Reports each dropped
    * vector with its keeper (lowest such anchor) and how many anchors
    * matched. */
  private def dedupSemantic(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val cents = VectorOps.kmeansLloyd(e, K, Iters)
    val assigned = e
      .withColumn("cid", VectorOps.assignExact(col("embedding"), cents))
      .select(col("cid"), col("vec_id"), col("embedding"))
    val a = assigned.toDF("cid", "vec_a", "ea")
    val b = assigned.toDF("cid", "vec_b", "eb")
    a.join(b, "cid").filter(col("vec_a") < col("vec_b"))
      .filter(VectorOps.cosine(col("ea"), col("eb")) >= Tau)
      .groupBy(col("cid"), col("vec_b").as("vec_id"))
      .agg(min("vec_a").as("anchor_id"), count(lit(1)).as("n_anchors"))
      .orderBy("cid", "vec_id")
  }

  private def dedupSemanticSql: String =
    s"""$lloydCtes,
       |m AS (SELECT a.cid, a.vec_id AS vec_a, b.vec_id AS vec_b
       |      FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |      WHERE list_reduce(list_transform(a.v, (x, i) -> x * b.v[i]),
       |              (u, w) -> u + w)
       |            / (sqrt(list_reduce(list_transform(a.v, x -> x * x),
       |                 (u, w) -> u + w))
       |             * sqrt(list_reduce(list_transform(b.v, x -> x * x),
       |                 (u, w) -> u + w))) >= $Tau)
       |SELECT cid, vec_b AS vec_id, min(vec_a) AS anchor_id,
       |       count(*) AS n_anchors
       |FROM m GROUP BY cid, vec_b
       |ORDER BY cid, vec_id""".stripMargin

  // ---- N29b embedding_pca_power: top principal direction -------------------

  /** `embedding_pca_power`: the corpus's top principal direction by POWER
    * ITERATION — two rounds of x ← normalize(Gx) — without ever
    * materializing the d×d gramian: G·x = Σ_v v·(vᵀx), so each round is
    * one map-side dot per vector plus ONE keyed agg over (dimension) — the
    * classic distributed PCA step (embedding-drift monitoring, whitening,
    * projection pruning all start here). Determinism recipe: the per-row
    * dot is the proven left fold; each contribution lands as an exact
    * 6-dp-scaled long (floor(x·1e6+0.5), the CentroidAgg idiom) so the
    * per-dimension sums are order-independent; normalization divides the
    * exact sums by sqrt(ΣL²) held in DECIMAL (long² overflows). Only k·1
    * vectors (the 64 loadings) reach the driver between rounds — the
    * kmeansLloyd sync contract. Oracle = scripted two-round CTE chain
    * replaying the identical arithmetic. Sign is pinned by the positive
    * start vector (x₀ = 1/8 on every axis). */
  private def embeddingPcaPower(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.DecimalType
    val e = fanOut(embeddings(s, d))
      .select(col("vec_id"), col("embedding")).localCheckpoint(false)
    def contribs(xs: Seq[Double]): DataFrame = {
      val xCol = array(xs.map(lit): _*)
      val sCol = aggregate(
        zip_with(col("embedding"), xCol, (a: Column, b: Column) =>
          a.cast("double") * b),
        lit(0.0d), (acc: Column, v: Column) => acc + v)
      e.withColumn("s", sCol)
        .select(posexplode(transform(col("embedding"), (a: Column) =>
          floor(a.cast("double") * col("s") * lit(1000000.0d) + lit(0.5d))
            .cast("long"))))
        .select((col("pos") + 1).as("i"), col("col").as("l"))
        .groupBy("i").agg(sum("l").as("L"))
    }
    def roundHalfUp6(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // round 1: driver sync of the 64 loadings (aggregate-sized, like
    // kmeansLloyd's centroids) — arithmetic identical to the oracle's CTE
    val d1 = contribs(Seq.fill(Dim)(0.125)).collect()
      .map(r => r.getAs[Any]("i").toString.toInt -> r.getLong(1)).sortBy(_._1)
    val nn1 = d1.map { case (_, l) => BigInt(l) * BigInt(l) }.sum
    val x1 = d1.map { case (_, l) =>
      roundHalfUp6(l.toDouble / math.sqrt(nn1.toDouble)) }
    // round 2: final normalize stays in-plan
    val perDim2 = contribs(x1.toSeq)
    val norm2 = perDim2.agg(
      sum((col("L").cast(DecimalType(38, 0)) * col("L")).cast(DecimalType(38, 0)))
        .as("nn"))
    perDim2.crossJoin(broadcast(norm2))
      .select(col("i").cast("int").as("dim"),
        round(col("L").cast("double") / sqrt(col("nn").cast("double")), 6)
          .as("loading"))
      .orderBy("dim")
  }

  private val embeddingPcaPowerSql =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |s1 AS (
      |  SELECT vec_id, embedding,
      |    list_reduce(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * 0.125), (u, w) -> u + w) AS s
      |  FROM e),
      |c1 AS (
      |  SELECT unnest(list_transform(embedding, (x, i) -> {'i': i,
      |    'l': CAST(floor(CAST(x AS DOUBLE) * s * 1000000 + 0.5) AS BIGINT)}))
      |    AS u
      |  FROM s1),
      |d1 AS (SELECT u.i AS i, SUM(u.l) AS L FROM c1 GROUP BY 1),
      |n1 AS (SELECT SUM(CAST(L AS HUGEINT) * L) AS nn FROM d1),
      |x1 AS (SELECT i, round(CAST(L AS DOUBLE) / sqrt(CAST(nn AS DOUBLE)), 6)
      |         AS x FROM d1, n1),
      |xl AS (SELECT list(x ORDER BY i) AS xs FROM x1),
      |s2 AS (
      |  SELECT vec_id, embedding,
      |    list_reduce(list_transform(embedding,
      |      (x, i) -> CAST(x AS DOUBLE) * xs[CAST(i AS INTEGER)]),
      |      (u, w) -> u + w) AS s
      |  FROM e, xl),
      |c2 AS (
      |  SELECT unnest(list_transform(embedding, (x, i) -> {'i': i,
      |    'l': CAST(floor(CAST(x AS DOUBLE) * s * 1000000 + 0.5) AS BIGINT)}))
      |    AS u
      |  FROM s2),
      |d2 AS (SELECT u.i AS i, SUM(u.l) AS L FROM c2 GROUP BY 1),
      |n2 AS (SELECT SUM(CAST(L AS HUGEINT) * L) AS nn FROM d2)
      |SELECT CAST(i AS INTEGER) AS dim,
      |       round(CAST(L AS DOUBLE) / sqrt(CAST(nn AS DOUBLE)), 6) AS loading
      |FROM d2, n2 ORDER BY dim""".stripMargin

  // ---- N29e sample_kcenter: greedy k-center coreset -------------------------

  /** `sample_kcenter`: Gonzalez greedy k-center (1985) over the embedding
    * corpus — the 2-approximation diversity/coreset selector (pick the
    * point FARTHEST from everything chosen so far, k times) that
    * complements the density-driven samplers: stratified/weighted keep
    * mass, k-center keeps COVERAGE (every point ends within
    * coverage_radius of a pick — the facility-location guarantee a
    * diverse eval set or annotation batch wants). Deterministic pin: seed
    * = lowest vec_id; each round ranks on the raw exact-fold Σ(x−c)²
    * double with vec_id tie-break (the embedding_outliers discipline —
    * both engines produce the identical fold), distances to the chosen
    * set as a `least(...)` over broadcast center literals (map-only, the
    * kmeansLloyd idiom: no join, ONE row returns to the driver per round
    * — k driver syncs total). Output: the k picks with their
    * distance-at-selection and the final coverage radius. 100 TB: each
    * round is one scan + TakeOrdered(1); k scans total — at huge k you'd
    * switch to k-means|| style oversampling, same sync contract. */
  private def sampleKcenter(s: SparkSession, d: String): DataFrame = {
    val KC = 5
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      .localCheckpoint(false)
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toSeq
    val seed = e.orderBy("vec_id").limit(1).collect()(0)
    var picks = Seq((1L, seed.getAs[Long]("vec_id"), 0.0d))
    var centers = Seq(vecOf(seed))
    for (r <- 2 to KC) {
      val mind = centers.map(c => VectorOps.exactDist2(col("embedding"), c))
        .reduce(least(_, _))
      val pick = e.withColumn("md", mind)
        .orderBy(col("md").desc, col("vec_id")).limit(1).collect()(0)
      picks = picks :+ ((r.toLong, pick.getAs[Long]("vec_id"),
        pick.getAs[Double]("md")))
      centers = centers :+ vecOf(pick)
    }
    val mindAll = centers.map(c => VectorOps.exactDist2(col("embedding"), c))
      .reduce(least(_, _))
    val radius = e.withColumn("md", mindAll)
      .agg(max(col("md")).as("r")).collect()(0).getDouble(0)
    import s.implicits._
    picks.toDF("sel_round", "vec_id", "raw_d")
      .select(col("sel_round"), col("vec_id"),
        round(col("raw_d"), 6).as("dist_at_pick"),
        round(lit(radius), 6).as("coverage_radius"))
      .orderBy("sel_round")
  }

  private val sampleKcenterSql = {
    def dist(v: String, c: String) =
      s"""list_reduce(list_transform($v, (x, i) -> (x - $c[i]) * (x - $c[i])),
         |      (u, w) -> u + w)""".stripMargin
    val rounds = (2 to 5).map { r =>
      s"""s$r AS (SELECT vec_id, v, md FROM m${r - 1}
         |        ORDER BY md DESC, vec_id LIMIT 1),
         |m$r AS (SELECT m.vec_id, m.v,
         |          least(m.md, ${dist("m.v", s"s$r.v")}) AS md
         |        FROM m${r - 1} m, s$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id,
       |            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |          FROM embeddings),
       |s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       |m1 AS (SELECT e.vec_id, e.v, ${dist("e.v", "s1.v")} AS md
       |       FROM e, s1),
       |$rounds,
       |rad AS (SELECT max(md) AS r FROM m5),
       |picks AS (
       |  SELECT CAST(1 AS BIGINT) AS sel_round, vec_id,
       |         CAST(0.0 AS DOUBLE) AS d FROM s1
       |  ${(2 to 5).map(r =>
            s"UNION ALL SELECT CAST($r AS BIGINT), vec_id, md FROM s$r")
            .mkString("\n  ")})
       |SELECT sel_round, vec_id, round(d, 6) AS dist_at_pick,
       |       round(rad.r, 6) AS coverage_radius
       |FROM picks, rad ORDER BY sel_round""".stripMargin
  }

  // ---- N29d embedding_gram_matrix: distributed covariance ------------------

  /** `embedding_gram_matrix`: the exact d×d second-moment (gram) and
    * covariance matrix of the embedding corpus — the primitive PCA-beyond-
    * top-1, ZCA whitening, and Mahalanobis OOD scoring all start from
    * (power iteration [[embeddingPcaPower]] deliberately AVOIDS
    * materializing it; this op is for when you need the matrix itself).
    * Shape: each row emits its upper-triangle pair products MAP-SIDE via
    * nested array HOFs (no self-join, no per-row shuffle amplification);
    * each product lands as the exact 6-dp-scaled long
    * `floor(x·y·1e6 + 0.5)` (the CentroidAgg idiom — order-independent
    * integer sums, no float accumulation), then ONE keyed agg onto the
    * d(d+1)/2 = 2080 pair keys with map-side combine, so the shuffle
    * carries ≤ 2080 rows per task whatever the corpus size. Means ride a
    * second d-keyed agg (broadcast back onto the pair grid);
    * cov = E[xy] − E[x]E[y] in IEEE doubles derived from the exact longs.
    * At 100 TB the plan is unchanged: d²-bounded shuffle, k·d² driver
    * output — this is RowMatrix.computeGramianMatrix as a declarative
    * plan. */
  /** The one-row aggregate the gram matrix reduces to — exposed for the
    * plan audit (the registry query unpacks it driver-side, hiding the agg
    * behind a local scan): ObjectHashAggregate with a partial_ stage, no
    * Generate, no join — ONE ~17 KB buffer per task reaches the shuffle. */
  private[graft] def gramAggRow(emb: DataFrame): DataFrame =
    emb.agg(VectorOps.gramUdaf(Dim).as("g"))

  /** Query path: [[VectorOps.GramAgg]] — a single typed-Aggregator pass
    * (tight primitive loop, zero per-pair allocation) replacing the HOF
    * explode below, which materializes n·d(d+1)/2 struct rows through a
    * Generate node for the same exact-long sums (~10× the per-row work;
    * kept as the executable spec, equality asserted in GramMatrixSpec).
    * Driver sync is d² longs — the kmeansLloyd contract. */
  private[graft] def embeddingGramMatrixOf(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val row = gramAggRow(emb).select(col("g.*")).head()
    val pairs = row.getAs[scala.collection.Seq[Long]](0)
    val dims = row.getAs[scala.collection.Seq[Long]](1)
    val n = row.getLong(2)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long, Long)]
    var k = 0
    for (i <- 1 to Dim; j <- i to Dim) {
      buf += ((i, j, pairs(k), dims(i - 1), dims(j - 1))); k += 1
    }
    buf.toSeq.toDF("i", "j", "pl", "mi", "mj")
      .select(col("i"), col("j"), lit(n).as("n"),
        // + 0.0 folds IEEE negative zero to +0.0 — Spark's round() and
        // DuckDB's disagree on the SIGN of a zero from a tiny negative,
        // and the driver's repr-sort treats -0.0 and 0.0 as different rows
        (round(col("pl").cast("double") /
          (col("n").cast("double") * 1000000.0d), 6) + lit(0.0d)).as("exy"),
        (round(col("pl").cast("double") / (col("n").cast("double") * 1000000.0d)
          - (col("mi").cast("double") / (col("n").cast("double") * 1000000.0d))
          * (col("mj").cast("double") / (col("n").cast("double") * 1000000.0d)),
          6) + lit(0.0d)).as("cov"))
      .orderBy("i", "j")
  }

  /** The HOF-explode formulation — the executable spec of [[GramAgg]]'s
    * semantics (same scaled-long per-pair rounding, same (i,j) labeling). */
  private[graft] def embeddingGramMatrixHofOf(emb: DataFrame): DataFrame = {
    val pairs = expr(
      """flatten(transform(embedding, (x, i) ->
        |  transform(slice(embedding, i + 1, size(embedding) - i), (y, j) ->
        |    struct(i + 1 AS i, i + j + 1 AS j,
        |      CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000.0D
        |        + 0.5D) AS BIGINT) AS l))))""".stripMargin)
    val grid = emb
      .select(explode(pairs).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"), col("p.l").as("l"))
      .groupBy("i", "j")
      .agg(sum(col("l")).as("pl"), count(lit(1)).as("n"))
    val means = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select((col("pos") + 1).as("k"),
        floor(col("x").cast("double") * lit(1000000.0d) + lit(0.5d))
          .cast("long").as("ml"))
      .groupBy("k").agg(sum(col("ml")).as("mlsum"))
    val mi = means.select(col("k").as("i"), col("mlsum").as("mi"))
    val mj = means.select(col("k").as("j"), col("mlsum").as("mj"))
    grid
      .join(broadcast(mi), "i").join(broadcast(mj), "j")
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        col("n"),
        // + 0.0 folds IEEE negative zero to +0.0 — Spark's round() and
        // DuckDB's disagree on the SIGN of a zero from a tiny negative,
        // and the driver's repr-sort treats -0.0 and 0.0 as different rows
        (round(col("pl").cast("double") /
          (col("n").cast("double") * 1000000.0d), 6) + lit(0.0d)).as("exy"),
        (round(col("pl").cast("double") / (col("n").cast("double") * 1000000.0d)
          - (col("mi").cast("double") / (col("n").cast("double") * 1000000.0d))
          * (col("mj").cast("double") / (col("n").cast("double") * 1000000.0d)),
          6) + lit(0.0d)).as("cov"))
      .orderBy("i", "j")
  }

  private def embeddingGramMatrix(s: SparkSession, d: String): DataFrame =
    embeddingGramMatrixOf(fanOut(embeddings(s, d)))

  private val embeddingGramMatrixSql =
    """WITH pr AS (
      |  SELECT unnest(flatten(list_transform(embedding, (x, i) ->
      |    list_transform(embedding[i:], (y, j) ->
      |      {'i': i, 'j': i + j - 1,
      |       'l': CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000
      |              + 0.5) AS BIGINT)})))) AS u
      |  FROM embeddings),
      |grid AS (
      |  SELECT u.i AS i, u.j AS j, CAST(SUM(u.l) AS BIGINT) AS pl,
      |         count(*) AS n
      |  FROM pr GROUP BY 1, 2),
      |mv AS (
      |  SELECT u.i AS k, CAST(SUM(u.l) AS BIGINT) AS mlsum FROM (
      |    SELECT unnest(list_transform(embedding, (x, i) -> {'i': i,
      |      'l': CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)}))
      |      AS u
      |    FROM embeddings) GROUP BY 1)
      |SELECT CAST(g.i AS INTEGER) AS i, CAST(g.j AS INTEGER) AS j,
      |  g.n,
      |  round(CAST(g.pl AS DOUBLE) / (CAST(g.n AS DOUBLE) * 1000000), 6)
      |    + 0.0 AS exy,
      |  round(CAST(g.pl AS DOUBLE) / (CAST(g.n AS DOUBLE) * 1000000)
      |    - (CAST(a.mlsum AS DOUBLE) / (CAST(g.n AS DOUBLE) * 1000000))
      |    * (CAST(b.mlsum AS DOUBLE) / (CAST(g.n AS DOUBLE) * 1000000)), 6)
      |    + 0.0 AS cov
      |FROM grid g JOIN mv a ON g.i = a.k JOIN mv b ON g.j = b.k
      |ORDER BY i, j""".stripMargin

  // ---- N29c embedding_outliers: OOD pruning --------------------------------

  /** `embedding_outliers`: the out-of-distribution prune — the top 1% of
    * vectors by distance to their NEAREST Lloyd centroid (the curation
    * screen that drops mislabeled/garbage embeddings before dedup or
    * search indexing). Distances are the proven index-order IEEE folds
    * against the k×dim centroid literals (map-only — the corpus never
    * joins anything); the 1% cut is the pure-integer comparison
    * rank·100 ≤ n (no float percentile); ranking orders on the raw fold
    * double with vec_id tie-break, exactly reproducible by the scripted
    * Lloyd oracle. The rank window is corpus-wide here (bounded output);
    * at 100 TB the same cut runs as a per-partition top-1% pre-prune +
    * global TakeOrdered — the topk_limit contract. */
  private def embeddingOutliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Column
    val e = fanOut(embeddings(s, d))
    val cents = VectorOps.kmeansLloyd(embeddings(s, d), K, Iters)
    val cands = cents.map { case (cid, c) =>
      val cArr = array(c.map(lit): _*)
      struct(
        aggregate(
          zip_with(col("embedding"), cArr, (a: Column, b: Column) =>
            (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0d), (acc: Column, v: Column) => acc + v).as("d2"),
        lit(cid).as("cid"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("d2").desc, col("vec_id"))
    val n = e.count()
    e.withColumn("best", element_at(array_sort(array(cands: _*)), 1))
      .select(col("vec_id"), col("best.cid").as("cid"), col("best.d2").as("d2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") * 100 <= lit(n))
      .select(col("vec_id"), col("cid"), round(col("d2"), 6).as("d2"), col("rnk"))
      .orderBy("rnk")
  }

  private def embeddingOutliersSql: String =
    s"""$lloydCtes,
       |dist AS (
       |  SELECT af.vec_id, af.cid,
       |    list_reduce(list_transform(af.v,
       |      (x, i) -> (x - cf.c[i]) * (x - cf.c[i])), (u, w) -> u + w) AS d2
       |  FROM af JOIN c$Iters cf ON af.cid = cf.cid),
       |ranked AS (
       |  SELECT vec_id, cid, d2,
       |         row_number() OVER (ORDER BY d2 DESC, vec_id) AS rnk,
       |         count(*) OVER () AS n
       |  FROM dist)
       |SELECT vec_id, CAST(cid AS INTEGER) AS cid, round(d2, 6) AS d2,
       |       CAST(rnk AS INTEGER) AS rnk
       |FROM ranked WHERE rnk * 100 <= n ORDER BY rnk""".stripMargin

  def all: Seq[(String, Q)] = Seq(
    "kmeans_assign" -> Q(kmeansAssign, Some(kmeansAssignSql)),
    "embedding_outliers" -> Q(embeddingOutliers, Some(embeddingOutliersSql)),
    "embedding_pca_power" -> Q(embeddingPcaPower, Some(embeddingPcaPowerSql)),
    "embedding_gram_matrix" ->
      Q(embeddingGramMatrix, Some(embeddingGramMatrixSql)),
    "sample_kcenter" -> Q(sampleKcenter, Some(sampleKcenterSql)),
    "dedup_semantic" -> Q(dedupSemantic, Some(dedupSemanticSql)))
}
