package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** FIXTURES.md §B4 + SURVEY.md §5.2.3: dedup semantics and MinHash/SimHash
  * properties (these are the non-oracle operators — property tests are their
  * correctness gate). */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exact groups: planted near-dups collapse after normalization") {
    val groups = DedupOps.exactGroups(Tables.documents(spark, sfDir))
    val rows = groups.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong).toSeq
      assert(members.size == r.getAs[Long]("n_members"))
      assert(members.min == r.getAs[Long]("group_id"))
    }
  }

  test("dedup idempotence: dropDuplicates twice equals once") {
    val df = Seq((1L, "s", "x"), (1L, "s", "x"), (2L, "s", "y"))
      .toDF("job_id", "source", "skill")
    val once = df.dropDuplicates("job_id", "source", "skill")
    val twice = once.dropDuplicates("job_id", "source", "skill")
    assert(once.count() == 2 && twice.count() == 2)
  }

  test("minhash: identical docs agree on the full signature") {
    val t = "spark query scan table row column window sort merge"
    val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(df, h = 16, bands = 4).collect()
    assert(pairs.length == 1 && pairs.head.getDouble(2) == 1.0)
  }

  test("minhash: estimate tracks true jaccard on planted near-dups") {
    val pairs = DedupOps.minhashPairs(Tables.documents(spark, sfDir), 16, 4)
      .filter(col("est_jaccard") >= 0.5).collect()
    assert(pairs.nonEmpty, "planted near-dup family must surface")
    // every surfaced pair must genuinely share most tokens
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    pairs.foreach { r =>
      val (a, b) = (docs(r.getLong(0)).split(" ").toSet, docs(r.getLong(1)).split(" ").toSet)
      val truth = a.intersect(b).size.toDouble / a.union(b).size
      assert(truth > 0.5, s"pair (${r.getLong(0)},${r.getLong(1)}) true jaccard $truth")
    }
  }

  test("minhash determinism: same input, same signatures across runs") {
    val df = Tables.documents(spark, sfDir).limit(50)
    val s1 = DedupOps.minhashPairs(df, 16, 4).collect().map(_.toString).sorted
    val s2 = DedupOps.minhashPairs(df, 16, 4).collect().map(_.toString).sorted
    assert(s1.sameElements(s2))
  }

  test("simhash: identical token arrays give identical hashes; disjoint differ") {
    val df = Seq(
      (1L, "spark query scan window"),
      (2L, "spark query scan window"),
      (3L, "completely different words here entirely")).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      DedupOps.simhash(DedupOps.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("connected components: transitive chains collapse to one cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
  }

  test("connected components: long path converges within maxIter") {
    // path 0-1-2-...-8: diameter 8, needs several rounds
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs, maxIter = 10, smallGraphCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(0L), s"all nodes must reach label 0: $cc")
  }

  test("connected components: 50-node chain (diameter >> rounds) clusters in O(log n)") {
    // min-label propagation would need 49 rounds here; large/small-star
    // squares path lengths each round, so even maxIter=10 suffices
    val pairs = (0L until 49L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs, maxIter = 10, smallGraphCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 50 && cc.values.toSet == Set(0L),
      s"all 50 chain nodes must reach label 0: $cc")
  }

  test("connected components: non-convergence raises instead of returning wrong labels") {
    val pairs = (0L until 49L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      DedupOps.connectedComponents(pairs, maxIter = 1, smallGraphCap = 0)
    }
  }

  test("connected components: small-graph union-find matches the distributed loop") {
    // seeded random graph with chains, merges, and singleton pairs — the
    // two paths must produce the IDENTICAL label map (min of component)
    val rnd = new scala.util.Random(12)
    val pairs = Seq.fill(200)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }.toDF("doc_a", "doc_b")
    val viaUf = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = DedupOps.connectedComponents(pairs, smallGraphCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUf == viaStar, s"uf=$viaUf star=$viaStar")
  }

  test("connected components: empty pair list yields empty labels, no error") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupOps.connectedComponents(pairs).count() == 0)
  }

  test("simhash dispatch: chunk and Manku paths emit the IDENTICAL h<=3 pairs") {
    // planted families: exact dups (hamming 0) + one-token tweaks (small
    // hamming) + unrelated docs; the dispatcher must emit the same pair set
    // whichever side of the cutover the corpus lands on
    val vocab = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val docs = (0 until 30).flatMap { i =>
      Seq((i * 3L, s"$vocab fam$i"), (i * 3L + 1, s"$vocab fam$i"),
        (i * 3L + 2, s"$vocab tweak$i fam$i"))
    }.toDF("doc_id", "text")
    def pairs(cutover: Long) =
      DedupOps.simhashNearDupPairs(docs, comboCutover = cutover)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
        .toSet
    val viaChunk = pairs(Long.MaxValue) // 90 docs <= cutover → chunk tables
    val viaCombo = pairs(0L)            // forces the Manku combination path
    assert(viaChunk.nonEmpty, "fixture must produce close pairs")
    assert(viaChunk.exists(_._3 == 0L), "exact dups must appear at hamming 0")
    assert(viaChunk == viaCombo,
      s"dispatch paths diverge: chunkOnly=${viaChunk.diff(viaCombo)} comboOnly=${viaCombo.diff(viaChunk)}")
    assert(pairs(1L << 17) == viaChunk) // the default cutover picks chunk here
  }

  test("connected components: STRING ids stay type-generic (no long round-trip)") {
    // the driver union-find casts ids through long — non-integral id types
    // must dispatch to the distributed loop and keep exact labels (r12
    // ADVICE: a string/decimal id would NPE or lossily merge under cast)
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y"))
      .toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("df-cut guard: a stopword-grade token no longer produces quadratic candidates") {
    // every doc shares 'common'/'filler'; the rest of each doc is unique.
    // Without the guard the inverted-index self-join forms all 60*59/2
    // pairs off the two hot posting lists; with maxDf=30 both hot tokens
    // are cut from candidate generation and nothing pairs up.
    val docs = (1L to 60L)
      .map(i => (i, s"common filler uniq$i alpha$i beta$i gamma$i"))
      .toDF("doc_id", "text")
    assert(DedupOps.jaccardPairs(docs, maxDf = 1000, minJaccard = 0.0).count() == 60L * 59 / 2)
    assert(DedupOps.jaccardPairs(docs, maxDf = 30, minJaccard = 0.0).count() == 0)
  }

  test("df-cut keeps verification exact: hot tokens still count toward jaccard") {
    // docs 1,2 share hot 'common' AND rare 'shared': candidate via 'shared',
    // but jaccard must count 'common' too: |{common,shared}|/|{common,shared,x1,x2}|
    val docs = Seq(
      (1L, "common shared x1"), (2L, "common shared x2"),
      (3L, "common y1 y2"), (4L, "common z1 z2")).toDF("doc_id", "text")
    val got = DedupOps.jaccardPairs(docs, maxDf = 2, minJaccard = 0.0).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1L && got.head.getLong(1) == 2L)
    assert(got.head.getDouble(2) == 0.5)
  }

  test("shingles slide over tokens in order") {
    val got = Seq("a b c d").toDF("t")
      .select(DedupOps.shingles(col("t"), 3).as("s"))
      .collect().head.getAs[scala.collection.Seq[String]](0)
    assert(got.toSeq == Seq("a_b_c", "b_c_d"))
  }

  test("simhash combination keys: any pair within hamming <= 3 shares a key " +
      "(pigeonhole over 6 blocks); a 4-block flip can miss") {
    // seeded random signatures with 0..3 random bit flips: the C(6,3)
    // tables must catch EVERY such pair (lossless); with 4 flips placed in
    // 4 DISTINCT blocks the pair must NOT share a key in the table whose
    // blocks are all dirty — sanity that the keys actually discriminate
    val rnd = new scala.util.Random(7)
    val sigs = (0 until 200).map { i =>
      val base = rnd.nextLong()
      val flips = rnd.nextInt(4) // 0..3
      val flipped = (0 until flips).foldLeft(base) { (s, _) =>
        s ^ (1L << rnd.nextInt(64))
      }
      (i.toLong * 2, base, i.toLong * 2 + 1, flipped)
    }
    val df = sigs.flatMap { case (ia, a, ib, b) => Seq((ia, a), (ib, b)) }
      .toDF("doc_id", "sig")
    val keyed = df.select(col("doc_id"),
      explode(DedupOps.simhashComboKeys(col("sig"))).as("ck"))
    val pairs = keyed.as("x").join(keyed.as("y"),
        col("x.ck") === col("y.ck") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sigs.foreach { case (ia, a, ib, b) =>
      val h = java.lang.Long.bitCount(a ^ b)
      if (h <= 3)
        assert(pairs.contains((ia, ib)),
          s"h=$h pair ($ia,$ib) must share a combination key")
    }
    // converse witness: bits 0, 11, 22, 33 dirty exactly blocks 0,1,2,3,
    // leaving only TWO clean blocks {4,5} — every 3-subset of blocks must
    // include a dirty one, so no combination key can match. If this pair
    // DID share a key, the keys wouldn't be discriminating on block
    // content at all (e.g. a masking bug).
    val base = 0L
    val dirty4 = base ^ (1L << 0) ^ (1L << 11) ^ (1L << 22) ^ (1L << 33)
    val two = Seq((100L, base), (101L, dirty4)).toDF("doc_id", "sig")
    val k2 = two.select(col("doc_id"),
      explode(DedupOps.simhashComboKeys(col("sig"))).as("ck"))
    val shared = k2.as("x").join(k2.as("y"),
        col("x.ck") === col("y.ck") && col("x.doc_id") < col("y.doc_id"))
      .count()
    assert(shared == 0,
      "a 4-distinct-block flip must not share any combination key")
  }

  test("suffix_hamming_lb: SQL form matches the Scala reference; strata math on known cases") {
    // A = [a, b, c, d], B = [a, c, e]; suffixes after ra=1/rb=1:
    // SA = {b,c,d}, SB = {c,e}, |Δ| = 3 (b,d,e) — at MaxDepth 2 the bound
    // recovers it exactly (probe c found, probe e missing)
    val got = spark.sql(
      """SELECT suffix_hamming_lb(array('a','b','c','d'), array('a','c','e'),
        |       1, 1) AS lb""".stripMargin).head().getInt(0)
    assert(got == graft.functions.SuffixHammingLb.computeRef(
      Seq("a", "b", "c", "d"), Seq("a", "c", "e"), 1, 1))
    assert(got >= 1 && got <= 3, s"bound $got outside [1, |delta|=3]")
    // empty suffixes: ra = |A| -> |Δ| = |SB| exactly
    assert(spark.sql(
      "SELECT suffix_hamming_lb(array('a','b'), array('a','x','y'), 2, 1)")
      .head().getInt(0) == 2)
    // rank out of range must fail loudly, not misbound
    val err = intercept[Exception] {
      spark.sql("SELECT suffix_hamming_lb(array('a'), array('a'), 2, 1)")
        .collect()
    }
    assert(err.getMessage.contains("rank out of range") ||
      Option(err.getCause).exists(_.getMessage.contains("rank out of range")))
  }

  test("containment suffix cut: the planted decoy dies on the suffix probe, the true pair survives") {
    // Docs 1/2 share their two RAREST-SORTING tokens (a1, a2 — everything
    // here has df = 2, so tok order decides the prefix) but have disjoint
    // suffixes: the pair survives the prefix cut (a1 matches), pigeonhole
    // (equal sizes), and the positional bound (first shared token at rank 1
    // of both ⇒ 1 + min(9, 9) = 10 ≥ ⌈9·10/10⌉) — only the suffix probe,
    // which looks at WHERE the suffixes differ, can kill it before the
    // verify join. Docs 3/4 exist to keep m*/n* at df = 2 (df = 1 tokens
    // would sort before a1/a2 and evict them from the prefix); docs 5/6
    // are the true containment pair that must survive every cut.
    val docs = Seq(
      1L -> "a1 a2 m1 m2 m3 m4 m5 m6 m7 m8",
      2L -> "a1 a2 n1 n2 n3 n4 n5 n6 n7 n8",
      3L -> "m1 m2 m3 m4 m5 m6 m7 m8 f1 f2",
      4L -> "n1 n2 n3 n4 n5 n6 n7 n8 g1 g2",
      5L -> "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10",
      6L -> "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 q1 q2"
    ).toDF("doc_id", "text")
    val toks = DedupOps.tokenSets(docs).localCheckpoint()
    val before = DedupOps.containmentCandidates(toks, suffixFilter = false)
      .select("src_doc", "dst_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = DedupOps.containmentCandidates(toks, suffixFilter = true)
      .select("src_doc", "dst_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.contains((1L, 2L)),
      "decoy must survive the r13 cuts (else this fixture tests nothing)")
    assert(!after.contains((1L, 2L)), "decoy must die on the suffix probe")
    assert(after.subsetOf(before))
    assert(after.contains((5L, 6L)), "the true containment pair must survive")
    val emitted = DedupOps.containmentPairs(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted == Set((5L, 6L)))
  }

  test("suffix-filter dispatch: measured containment bracket, extrapolated prefix point") {
    // containment: loses at 24k family docs, wins 1.8x at 243k (SF1.md s7)
    // — the cutover must separate the measured bracket
    assert(!DedupOps.containmentSuffixByDefault(24119))
    assert(DedupOps.containmentSuffixByDefault(243483))
    assert(DedupOps.ContainmentSuffixCutoverDocs == (1L << 17))
    // prefix: no measured win through 243k docs — every measured corpus
    // must dispatch to the no-suffix form
    assert(!DedupOps.prefixSuffixByDefault(243483))
    assert(DedupOps.prefixSuffixByDefault(1L << 21))
  }
}
