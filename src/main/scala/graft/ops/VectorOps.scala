package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Vector/similarity primitives over `embeddings.embedding: array<float>`
  * (SURVEY.md §2.11 N2, BASELINE.json north star).
  *
  * All arithmetic is double, via sequential left folds (`aggregate`) so the
  * result is reproducible — and bit-identical to DuckDB's `list_reduce` left
  * fold, which the oracles rely on.
  */
object VectorOps {

  /** Left-fold dot product of two float-array columns, in double — a native
    * codegen expression ([[graft.functions.FloatVectorDot]]); same fold
    * order (and therefore bitwise-same result) as the higher-order-function
    * formulation, minus the per-element lambda dispatch. */
  def dot(a: Column, b: Column): Column =
    graft.functions.FloatVectorDot(a, b)

  /** Left-fold squared L2 norm. */
  def sqNorm(a: Column): Column = dot(a, a)

  /** Cosine similarity in double — the fused native expression
    * ([[graft.functions.FloatVectorCosine]]): one pass per array instead of
    * three vec_dot evaluations, bit-identical accumulation. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.FloatVectorCosine(a, b)

  /** Brute-force exact top-k cosine neighbors for a bounded query set.
    * The scale path: the query side is small (broadcast), the corpus streams
    * — one pass, no shuffle until the per-query top-k (rank window over
    * query_id partitions). For corpus×corpus problems use [[lshTables]].
    */
  def knnCosine(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "cos")
  }

  /** Symmetric int8 quantization: per-vector scale = max|x|/127, elements
    * rounded to [-127, 127]. The 100 TB lever: a quantized corpus scans at
    * ~1/4 the bytes of float32 and scores in integer arithmetic; the exact
    * vectors are only touched for the rescoring candidates. Everything is
    * exact IEEE arithmetic (max, divide, round — no libm), so any engine
    * reproduces the quantized codes bit-for-bit. */
  def quantize(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val maxAbs = aggregate(col(vecCol), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    df.withColumn("q_scale", maxAbs / 127.0)
      .withColumn("q_vec",
        when(col("q_scale") === 0.0,
          transform(col(vecCol), _ => lit(0L)))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") / col("q_scale")).cast("long"))))
  }

  /** Integer dot product of two quantized vectors — exact (no float
    * accumulation at all); a native codegen expression
    * ([[graft.functions.LongVectorDot]]): a tight long multiply-accumulate
    * loop instead of per-element lambda dispatch. */
  def qdot(a: Column, b: Column): Column =
    graft.functions.LongVectorDot(a, b)

  /** Quantized-scan + exact-rescore top-k: score every corpus vector with
    * the int8 dot (rescaled by the two scales), keep `rescoreFactor`×k
    * candidates per query, then rescore ONLY those with exact float cosine
    * and take the final k. The production ANN shape: the full corpus is
    * touched only through its quantized codes; exact math runs on a
    * bounded candidate set. Same join geometry as [[knnCosine]] (query
    * side broadcasts, corpus streams, per-query windows). */
  def knnQuantized(queries: DataFrame, corpus: DataFrame, k: Int,
      rescoreFactor: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), col("q_vec").as("qq"), col("q_scale").as("qs"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col("q_vec").as("cq"), col("q_scale").as("cs"))
    val approx = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ascore",
        qdot(col("qq"), col("cq")).cast("double") * col("qs") * col("cs"))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("ascore").desc, col("neighbor_id"))
    val candidates = approx
      .withColumn("arnk", row_number().over(wA))
      .filter(col("arnk") <= k * rescoreFactor)
    val wE = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "cos")
  }

  /** Multi-table LSH: `tables` independent bucketings, exploded to
    * (table_id, bucket) rows in ONE scan (a union of per-table scans would
    * read and project the corpus `tables` times). More tables ⇒ higher
    * recall at linear candidate cost — the standard ANN recall/cost dial. */
  def lshTables(df: DataFrame, planes: Int, tables: Int): DataFrame = {
    def weight(t: Int, j: Int, i: Column): Column =
      ((i * lit(2654435761L) + lit((t * planes + j) * 40503L + 12345L)) % 1000003L)
        .cast("double") / 1000003.0 - 0.5
    def bucket(t: Int): Column = (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => x.cast("double") * weight(t, j, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col("*"),
        posexplode(array((0 until tables).map(bucket): _*)).as(Seq("table_id", "bucket")))
  }

  /** Deterministic k-means for IVF coarse quantization, trained DRIVER-side
    * on a bounded sample — the standard IVF build (train on a sample, assign
    * at scale): a coarse quantizer needs only a representative sample, so
    * training costs ONE bounded collect instead of 2 cluster jobs per Lloyd
    * iteration, and only the map-only assignment ever touches the full
    * corpus. Deterministic end to end: sample = lowest `sampleSize` vec_ids,
    * init = first k of those, no RNG anywhere; ties go to the lower cid. */
  def kmeansCentroids(df: DataFrame, k: Int, iters: Int,
      sampleSize: Int = 4096): Seq[(Int, Seq[Double])] = {
    val sample = collectSample(df, sampleSize)
    require(sample.length >= k, s"need >= $k vectors to train $k centroids")
    lloyd(sample, k, iters).zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
  }

  // ---- distributed k-means (Lloyd at corpus scale) -------------------------

  /** Exact squared distance to a centroid literal: per-element (x − c)²
    * folded in INDEX order from 0.0 — bit-identical to DuckDB's
    * `list_reduce(list_transform(...))` left fold, which the kmeans oracle
    * replays step for step. (Deliberately NOT the ‖c‖²−2⟨e,c⟩ shortcut used
    * for ANN assignment: a different operation order rounds differently,
    * and here the oracle must reproduce every bit.) */
  def exactDist2(emb: Column, cvec: Seq[Double]): Column =
    aggregate(
      zip_with(emb, typedLit(cvec),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0d), (acc, t) => acc + t)

  /** Map-only nearest-centroid under the exact fold distance (ties → lower
    * cid): the corpus streams through one native codegen argmin
    * ([[graft.functions.VecNearestCid]] — the centroid matrix rides the
    * plan as an array<array<double>> literal), no join, no shuffle, no row
    * amplification. Requires cids to be exactly 0..k−1 (the literal's
    * index IS the id), which [[kmeansLloyd]] guarantees. Bit-identical to
    * [[assignExactHof]] (spec-asserted) — same fold, same tie rule. */
  def assignExact(emb: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val ordered = cents.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices, "cids must be 0..k-1")
    graft.functions.VecNearestCid(emb, typedLit(ordered.map(_._2)))
  }

  /** The higher-order-function formulation of [[assignExact]] — kept as the
    * executable spec of the native expression's semantics (per-element
    * lambda dispatch makes it ~10× slower on the assignment scan, so the
    * query path uses the codegen form). */
  def assignExactHof(emb: Column, cents: Seq[(Int, Seq[Double])]): Column =
    array_min(array(cents.map { case (cid, v) =>
      struct(exactDist2(emb, v).as("d"), lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** Distributed Lloyd — the corpus-scale training loop (vs the bounded
    * sample-trained [[kmeansCentroids]] used for ANN quantizers): per
    * iteration ONE corpus scan (map-only assign) + ONE keyed (cid,dim)
    * aggregate, and only k·dim summed rows return to the driver to become
    * the next broadcast literal — the MLlib-style sync point. Deterministic
    * across engines AND across partitionings: each element is quantized to
    * DECIMAL(18,7) (exact, order-independent integer sum — the Det.dsum
    * pattern; a 4-dp IEEE round of an order-dependent double `avg` flipped
    * a .00005 boundary under the driver's partitioning, the r06
    * `kmeans_assign` hash fail), the per-dimension mean is then rounded
    * half-up to 4 dp in exact BigDecimal arithmetic on the driver, and only
    * that 4-dp value becomes a double. Empty clusters keep their previous
    * centroid. */
  def kmeansLloyd(e: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    var cents: Seq[(Int, Seq[Double])] =
      e.orderBy("vec_id").limit(k).select("embedding").collect()
        .map(_.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toSeq)
        .zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    require(cents.length == k, s"need >= $k vectors to seed $k clusters")
    for (_ <- 0 until iters) {
      val upd = e.withColumn("cid", assignExact(col("embedding"), cents))
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x").cast("decimal(18,7)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map { r =>
            r.getDecimal(2)
              .divide(java.math.BigDecimal.valueOf(r.getLong(3)), 4,
                java.math.RoundingMode.HALF_UP)
              .doubleValue()
          }.toSeq
        }
      cents = cents.map { case (cid, old) => (cid, upd.getOrElse(cid, old)) }
    }
    cents
  }

  /** Bounded deterministic sample: the lowest `sampleSize` vec_ids. */
  private def collectSample(df: DataFrame, sampleSize: Int): Array[Array[Double]] =
    df.orderBy("vec_id").limit(sampleSize)
      .select(col("embedding")).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray)

  /** Driver-side Lloyd iterations (deterministic: init = first k sample rows,
    * ties to the lower centroid index) — shared by the IVF coarse quantizer
    * and the per-subspace PQ codebook training. */
  private def lloyd(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    var centroids: Array[Array[Double]] = sample.take(k).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      for (v <- sample) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c) else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  /** The centroid set as one array-of-structs literal (cid, cvec,
    * precomputed ||c||²) — ships to every task inside the serialized plan,
    * the moral equivalent of a broadcast variable but consumable by a single
    * expression. k×dim floats: tiny. */
  private def centroidArray(centroids: Seq[(Int, Seq[Double])]): Column =
    array(centroids.map { case (cid, v) =>
      val fv = v.map(_.toFloat)
      val n2 = fv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      struct(lit(cid).as("cid"), typedLit(fv).as("cvec"), lit(n2).as("cn2"))
    }: _*)

  /** Per-row nearest-centroid as struct(d, cid): one `array_min` fold over
    * the centroid literal — each dot computed exactly once, no join, no
    * shuffle. `d = ||c||² − 2⟨e,c⟩` (the row-constant ||e||² term can't
    * change the argmin); struct ordering ties break on the lower cid, same
    * as the old window's `orderBy(dist2, cid)`. */
  def nearestCentroid(emb: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array_min(transform(centroidArray(centroids), c =>
      struct((c.getField("cn2") - lit(2.0) * dot(emb, c.getField("cvec"))).as("d"),
        c.getField("cid").as("cid"))))

  /** Nearest-centroid assignment — map-only: the corpus streams through a
    * per-row fold, never shuffled or row-amplified. (The obvious
    * crossJoin(centroids) + window-argmin shuffles k× the corpus — at 100 TB
    * with k=16 that is a 16× shuffle for a per-row reduction.) */
  def assignToNearest(df: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame =
    df.withColumn("cid",
      nearestCentroid(col("embedding"), centroids).getField("cid"))

  /** IVF top-k: corpus pre-assigned to centroid lists; each query searches
    * only its `nProbe` nearest centroid lists — the classic recall/cost dial
    * that turns a corpus scan into a probe of ~nProbe/k of the data.
    * Both assignment and probe selection are per-row folds over the centroid
    * literal; the only shuffles left are the broadcast candidate join and
    * the final per-query rank. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Seq[Double])], k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lists = assignToNearest(corpus, centroids)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("cid"))
    // nProbe nearest centroids per query: sort the (d, cid) structs, slice.
    val probeCids = transform(
      slice(array_sort(transform(centroidArray(centroids), c =>
        struct((c.getField("cn2") - lit(2.0) * dot(col("embedding"), c.getField("cvec"))).as("d"),
          c.getField("cid").as("cid")))), 1, nProbe),
      s => s.getField("cid"))
    val probes = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), explode(probeCids).as("cid"))
    val wRank = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    lists.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "cos")
  }

  // ---- product quantization (PQ / ADC) -------------------------------------

  /** Trained PQ codebooks: the vector is split into `m` contiguous `dsub`-dim
    * sub-vectors; each subspace has `books(s)` = k codewords. */
  case class PqBooks(m: Int, dsub: Int, books: Seq[Seq[Seq[Double]]])

  /** Train PQ codebooks on the same bounded driver-side sample as the IVF
    * coarse quantizer (one collect, no RNG): per subspace, Lloyd over the
    * sample's sub-vectors. m=8 × k=16 over dim-64 floats turns a 256-byte
    * vector into 8 nibble codes — the ~64× memory/scan-byte compression
    * that lets a 100 TB embedding corpus live in a few TB of codes. */
  def pqCodebooks(df: DataFrame, m: Int, k: Int, iters: Int,
      sampleSize: Int = 4096): PqBooks = {
    val sample = collectSample(df, sampleSize)
    require(sample.length >= k, s"need >= $k vectors to train $k codewords")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val books = (0 until m).map { s =>
      val sub = sample.map(v => v.slice(s * dsub, (s + 1) * dsub))
      lloyd(sub, k, iters).map(_.toSeq).toSeq
    }
    PqBooks(m, dsub, books)
  }

  /** Subspace `s`'s codewords as an array-of-structs literal in codeword
    * order (cvec as float, precomputed ||c||²) — same ship-in-the-plan trick
    * as [[centroidArray]]. */
  private def pqSubBook(books: PqBooks, s: Int): Column =
    array(books.books(s).map { cw =>
      val fv = cw.map(_.toFloat)
      val n2 = fv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      struct(typedLit(fv).as("cvec"), lit(n2).as("cn2"))
    }: _*)

  /** Per-subspace squared-distance term `||c||² − 2⟨x_s, c⟩` (the
    * row-constant ||x_s||² can't change a per-row argmin or a per-query
    * ranking, so it is dropped everywhere consistently). */
  private def pqDistTerm(emb: Column, books: PqBooks, s: Int): Column => Column =
    c => c.getField("cn2") -
      lit(2.0) * dot(slice(emb, s * books.dsub + 1, books.dsub), c.getField("cvec"))

  /** Encode a vector as its `m` nearest-codeword indices — a per-row fold
    * over the codebook literals, map-only (the IVF assignment argument:
    * no join, no shuffle, no row amplification). */
  def pqEncode(emb: Column, books: PqBooks): Column =
    array((0 until books.m).map { s =>
      val term = pqDistTerm(emb, books, s)
      array_min(zip_with(pqSubBook(books, s),
        sequence(lit(0), lit(books.books(s).length - 1)),
        (c, i) => struct(term(c).as("d"), i.as("cid")))).getField("cid")
    }: _*)

  /** Per-query ADC lookup tables: for each subspace, the distance term to
    * every codeword — computed ONCE per query row (m×k sub-dots); the
    * per-candidate cost after this is m array lookups + m adds, not a
    * vector dot. Tables are in codeword order, so `tab[code]` is the term. */
  def pqQueryTables(emb: Column, books: PqBooks): Column =
    array((0 until books.m).map { s =>
      transform(pqSubBook(books, s), pqDistTerm(emb, books, s))
    }: _*)

  /** PQ top-k with asymmetric-distance candidate scan + exact rescore.
    *
    * 100 TB shape: the corpus is touched twice, both times without
    * shuffling — once streaming CODES (nibbles, not floats) against
    * broadcast per-query ADC tables, once streaming float vectors against
    * the broadcast candidate-id set for the exact rescore (the
    * decontam-verbatim rejoin invariant). Approximate ranking is by
    * reconstructed squared L2; the final k is exact cosine, directly
    * comparable to [[knnCosine]] for recall. */
  def pqKnn(corpus: DataFrame, queries: DataFrame, books: PqBooks, k: Int,
      rescoreFactor: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = corpus.select(col("vec_id").as("neighbor_id"),
      pqEncode(col("embedding"), books).as("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
      pqQueryTables(col("embedding"), books).as("qtabs"))
    val approx = codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", aggregate(
        zip_with(col("qtabs"), col("codes"),
          (tab, c) => element_at(tab, c.cast("int") + 1)),
        lit(0.0), (acc, x) => acc + x))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id"))
    val cands = approx
      .withColumn("arnk", row_number().over(wA))
      .filter(col("arnk") <= k * rescoreFactor)
      .select("query_id", "neighbor_id")
    val wE = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))), Seq("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "cos")
  }

  /** A7/X2 custom typed Aggregator: element-wise centroid of embeddings.
    * Buffer = (sum vector, count); merge is associative/commutative so Spark
    * can combine partials map-side — the UDAF scale contract.
    *
    * Components accumulate as EXACT 6-dp-scaled longs (floor(x·1e6 + 0.5) —
    * the explicit half-up both engines floor identically), not IEEE double
    * sums: a double accumulator's value depends on shuffle order, and the
    * downstream 4-dp round flips at .00005 boundaries exactly the way the
    * r06 driver caught `kmeans_assign` (same fix — exact partial sums, one
    * deterministic division at the end). Overflow headroom: |x| ≤ ~1e3 →
    * ~9e12 rows per group per dimension. */
  class CentroidAgg(dim: Int)
      extends Aggregator[Seq[Float], (Array[Long], Long), Seq[Double]] {
    def zero: (Array[Long], Long) = (Array.fill(dim)(0L), 0L)
    def reduce(b: (Array[Long], Long), a: Seq[Float]): (Array[Long], Long) = {
      // fixed-dim contract, checked loudly (same hazard as GramAgg, r09
      // advice): a silent pad/truncate would drag the centroid toward 0 in
      // the missing dimensions while still counting the row
      require(a.length == dim,
        s"CentroidAgg: embedding length ${a.length} != configured dim $dim")
      var i = 0
      while (i < dim) {
        b._1(i) += math.floor(a(i).toDouble * 1e6 + 0.5).toLong
        i += 1
      }
      (b._1, b._2 + 1)
    }
    def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    def finish(b: (Array[Long], Long)): Seq[Double] =
      if (b._2 == 0) Seq.empty
      else b._1.map(s => s.toDouble / (b._2.toDouble * 1e6)).toSeq
    def bufferEncoder = Encoders.tuple(
      Encoders.kryo[Array[Long]], Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  def centroidUdaf(dim: Int): Column =
    udaf(new CentroidAgg(dim), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
      .apply(col("embedding"))

  /** Second-moment companion of [[CentroidAgg]]: one pass accumulates the
    * upper-triangle pair-product sums (d(d+1)/2 slots, row-major i ≤ j),
    * the per-dimension first-moment sums, and the count — each product as
    * the exact 6-dp-scaled long floor(x_i·x_j·1e6 + 0.5) (order-independent
    * integer sums, the CentroidAgg discipline). The buffer is ~17 KB at
    * d = 64; merge is element-wise long addition, so Spark combines
    * partials map-side and the shuffle carries ONE buffer per task — the
    * explode-and-groupBy formulation of the same math materializes
    * n·d(d+1)/2 rows through a Generate node instead (kept as the
    * executable spec; this is the query path, ~10× less per-row work). */
  class GramAgg(dim: Int)
      extends Aggregator[Seq[Float], (Array[Long], Array[Long], Long),
        (Seq[Long], Seq[Long], Long)] {
    private val nPairs = dim * (dim + 1) / 2
    def zero: (Array[Long], Array[Long], Long) =
      (Array.fill(nPairs)(0L), Array.fill(dim)(0L), 0L)
    def reduce(b: (Array[Long], Array[Long], Long), a: Seq[Float])
        : (Array[Long], Array[Long], Long) = {
      // fixed-dim contract, checked loudly: the HOF spec formulation uses
      // the ACTUAL array length, so a silent pad/truncate here would let a
      // malformed row diverge agg-vs-spec without failing (r09 advice)
      require(a.length == dim,
        s"GramAgg: embedding length ${a.length} != configured dim $dim")
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) { v(i) = a(i).toDouble; i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        b._2(i) += math.floor(v(i) * 1e6 + 0.5).toLong
        var j = i
        while (j < dim) {
          b._1(k) += math.floor(v(i) * v(j) * 1e6 + 0.5).toLong
          k += 1; j += 1
        }
        i += 1
      }
      (b._1, b._2, b._3 + 1)
    }
    def merge(x: (Array[Long], Array[Long], Long),
        y: (Array[Long], Array[Long], Long))
        : (Array[Long], Array[Long], Long) = {
      var k = 0
      while (k < nPairs) { x._1(k) += y._1(k); k += 1 }
      var i = 0
      while (i < dim) { x._2(i) += y._2(i); i += 1 }
      (x._1, x._2, x._3 + y._3)
    }
    def finish(b: (Array[Long], Array[Long], Long))
        : (Seq[Long], Seq[Long], Long) =
      (b._1.toSeq, b._2.toSeq, b._3)
    def bufferEncoder = Encoders.tuple(
      Encoders.kryo[Array[Long]], Encoders.kryo[Array[Long]],
      Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Seq[Long], Seq[Long], Long)]()
  }

  def gramUdaf(dim: Int): Column =
    udaf(new GramAgg(dim), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
      .apply(col("embedding"))
}
