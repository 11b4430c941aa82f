package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.{RangeJoinOps, VectorOps}

/** Property suite for the round-6 operators: each distributed form must
  * agree with a trivially-correct driver-side reference on arbitrary random
  * inputs.
  */
object OpProps extends Properties("graft.ops6") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val pointGen = Gen.choose(0.0, 100.0).map(x => math.rint(x * 100) / 100)
  private val intervalGen = for {
    lo <- Gen.choose(0.0, 90.0).map(x => math.rint(x * 100) / 100)
    len <- Gen.choose(0.5, 25.0).map(x => math.rint(x * 100) / 100)
  } yield (lo, lo + len)

  property("binnedRangeJoin equals the brute-force inequality join") =
    forAll(Gen.listOfN(30, pointGen), Gen.listOfN(12, intervalGen)) { (xs, ivs) =>
      val fact = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("fid", "x")
      val intervals = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = RangeJoinOps.binnedRangeJoin(fact, col("x"), intervals,
          col("lo"), col("hi"), binWidth = 7L)
        .select("fid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (x, i) <- xs.zipWithIndex
        ((lo, hi), j) <- ivs.zipWithIndex if x >= lo && x < hi
      } yield (i.toLong, j.toLong)).toSet
      got == expected
    }

  // Integer half-open intervals, lengths 0-3 bins, including degenerate
  // (empty, len 0) and bin-boundary-straddling shapes.
  private val intIntervalGen = for {
    lo <- Gen.choose(0L, 60L)
    len <- Gen.choose(0L, 20L)
  } yield (lo, lo + len)

  property("binnedIntervalOverlapJoin emits each overlapping pair exactly once (vs brute force)") =
    forAll(Gen.listOfN(14, intIntervalGen), Gen.listOfN(14, intIntervalGen)) { (as, bs) =>
      val a = as.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("a_key", "a_lo", "a_hi")
      val b = bs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("b_key", "b_lo", "b_hi")
      val got = RangeJoinOps.binnedIntervalOverlapJoin(a, col("a_lo"), col("a_hi"),
          b, col("b_lo"), col("b_hi"), binWidth = 7L)
        .select("a_key", "b_key").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      val expected = (for {
        ((alo, ahi), i) <- as.zipWithIndex
        ((blo, bhi), j) <- bs.zipWithIndex if alo < bhi && blo < ahi
      } yield (i.toLong, j.toLong)).toList
      // exactly once: compare as multisets, not sets — a duplicate emit is a bug
      got.sorted == expected.sorted
    }

  private val vecGen = Gen.listOfN(8, Gen.choose(-4.0, 4.0).map(_.toFloat))

  property("vec_nearest_cid equals the driver-side exact argmin") =
    forAll(Gen.listOfN(12, vecGen), Gen.chooseNum(2, 5)) { (vecs, k0) =>
      val k = math.min(k0, vecs.size)
      val cents: Seq[(Int, Seq[Double])] = vecs.take(k)
        .map(v => v.map(_.toDouble).toSeq).zipWithIndex.map(_.swap)
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = df.select(col("vec_id"),
          VectorOps.assignExact(col("embedding"), cents).as("cid"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expected = vecs.zipWithIndex.map { case (v, i) =>
        val ds = cents.map { case (cid, c) =>
          val d = v.zip(c).foldLeft(0.0) { case (acc, (x, cc)) =>
            acc + (x.toDouble - cc) * (x.toDouble - cc)
          }
          (d, cid)
        }
        i.toLong -> ds.min._2
      }.toMap
      got == expected
    }

  property("ts_ewma fold equals the driver-side recurrence") =
    forAll(Gen.listOfN(9, Gen.choose(0.0, 50.0).map(x => math.rint(x * 100) / 100))) { vals =>
      val df = vals.zipWithIndex.map { case (v, i) =>
        (1L, new java.sql.Timestamp(1704067200000L + i * 60000L), i.toLong, v)
      }.toDF("user_id", "ts", "event_id", "value")
      df.createOrReplaceTempView("v_ewma_prop")
      val got = spark.sql(
        """SELECT round(aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)),
          |  element_at(vals, 1), (s, x) -> 0.8D * s + 0.2D * x), 6) AS e FROM (
          |  SELECT transform(sort_array(collect_list(struct(ts, event_id, value))),
          |                   e -> CAST(e.value AS DOUBLE)) AS vals
          |  FROM v_ewma_prop GROUP BY user_id)""".stripMargin)
        .collect().head.getDouble(0)
      val expected = BigDecimal(vals.tail.foldLeft(vals.head)((s, x) => 0.8 * s + 0.2 * x))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      got == expected
    }

  // random near-dup corpora: a handful of base vocabularies with per-doc
  // token drops, so some pairs land above the 0.8 Jaccard bar and some below
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nBase <- Gen.chooseNum(2, 4)
    bases <- Gen.listOfN(nBase, Gen.listOfN(12,
      Gen.oneOf("alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi".split(" ").toSeq)))
    // drop up to 6 tokens: sizes spread ~5..12, so the r13 LENGTH filter
    // (5·min ≥ 4·max) and the POSITIONAL first-match bound both genuinely
    // trip on sub-threshold pairs — at drop ≤ 2 every pair passed them
    // vacuously and the lossless-equivalence property tested only the
    // prefix cut
    docs <- Gen.listOfN(8, for {
      b <- Gen.oneOf(bases)
      drop <- Gen.chooseNum(0, 6)
    } yield b.distinct.drop(drop).mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.filter(_._2.nonEmpty)

  property("prefix-filter similarity join equals the full inverted-index join " +
      "(with and without the suffix cut)") =
    forAll(corpusGen) { docs =>
      docs.isEmpty || {
        val df = docs.toDF("doc_id", "text")
        val full = graft.ops.DedupOps.jaccardPairs(df, Long.MaxValue, 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        Seq(true, false).forall { suffix =>
          graft.ops.DedupOps.prefixJaccardPairs(df, 0.8, suffixFilter = Some(suffix))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == full
        }
      }
    }

  property("cross prefix-filtered incremental dedup equals the unguarded " +
      "shared-token form (lossless under the union-df order)") =
    forAll(corpusGen) { docs =>
      docs.size < 2 || {
        val df = docs.toDF("doc_id", "text")
        val batch = df.filter(col("doc_id") % 3 === 0)
        val existing = df.filter(col("doc_id") % 3 =!= 0)
        def key(d: org.apache.spark.sql.DataFrame) = d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        key(graft.ops.DedupOps.crossPrefixJaccardPairs(existing, batch, 0.8)) ==
          key(graft.ops.DedupOps.crossJaccardPairs(existing, batch, 0.8))
      }
    }

  property("globalRank + ntileFromRank equals ntile().over(Window.orderBy) " +
      "on random data, asc and desc") =
    forAll(for {
      n <- Gen.chooseNum(1, 60)
      vals <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
      buckets <- Gen.oneOf(2, 3, 4, 7, 10)
      desc <- Gen.oneOf(true, false)
    } yield (vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }, buckets, desc)) {
      case (rows, buckets, desc) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{broadcast, count, lit, ntile}
        val df = rows.toDF("id", "v")
        val ord = if (desc) Seq(col("v").desc, col("id").asc)
          else Seq(col("v").asc, col("id").asc)
        val win = df.withColumn("b", ntile(buckets).over(Window.orderBy(ord: _*)))
          .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
        val scaled = graft.ops.OrderedOps.globalRank(df, ord, partitions = 5)
          .crossJoin(broadcast(df.agg(count(lit(1)).as("n_total"))))
          .withColumn("b", graft.ops.OrderedOps.ntileFromRank(
            col("g_rank"), col("n_total"), buckets))
          .collect().map(r => r.getLong(0) -> r.getInt(r.length - 1)).toMap
        scaled == win
    }

  private val multisetGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))

  property("intersectAll/exceptAll match the min/surplus multiset formulas") =
    forAll(multisetGen, multisetGen) { (as, bs) =>
      val a = as.toDF("v"); val b = bs.toDF("v")
      val ca = as.groupBy(identity).view.mapValues(_.size).toMap
      val cb = bs.groupBy(identity).view.mapValues(_.size).toMap
      val gotI = a.intersectAll(b).groupBy("v").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expI = (ca.keySet ++ cb.keySet).flatMap { k =>
        val m = math.min(ca.getOrElse(k, 0), cb.getOrElse(k, 0))
        if (m > 0) Some(k -> m.toLong) else None
      }.toMap
      val gotE = a.exceptAll(b).groupBy("v").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expE = ca.flatMap { case (k, n) =>
        val m = n - cb.getOrElse(k, 0)
        if (m > 0) Some(k -> m.toLong) else None
      }
      gotI == expI && gotE == expE
    }

  property("pivot (explicit values) then unpivot is the identity on complete grids") =
    forAll(Gen.listOfN(6, Gen.choose(0L, 200L)), Gen.const(Seq("m1", "m2", "m3"))) {
      (vals, metrics) =>
        // one row per (key, metric) with a deterministic value — a complete
        // grid, so no pivot nulls and the round trip is exact
        val keys = Seq("k1", "k2")
        val long = for { (k, ki) <- keys.zipWithIndex; (m, mi) <- metrics.zipWithIndex }
          yield (k, m, vals((ki * metrics.size + mi) % vals.size))
        val df = long.toDF("k", "metric", "value")
        val wide = df.groupBy("k").pivot("metric", metrics).agg(first("value"))
        val back = wide.unpivot(Array(col("k")),
            metrics.map(col).toArray, "metric", "value")
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
        vals.isEmpty || back == long.toSet
    }

  // AUC rank formula vs the Mann-Whitney pair-count definition: the
  // numerators (Σ pos·R2 − nP(nP+1) vs 2·concordant + ties) must agree as
  // EXACT INTEGERS on any tie structure — the strongest check tie-averaged
  // rank math can get.
  private val labeledGen = Gen.listOf(for {
    s <- Gen.choose(0, 9)
    y <- Gen.oneOf(0L, 1L)
  } yield (s.toLong, y))

  property("AUC 2x-rank numerator equals the pair-count numerator on arbitrary ties") =
    forAll(labeledGen) { xs =>
      val nP = xs.count(_._2 == 1L).toLong
      val nN = xs.size - nP
      nP == 0 || nN == 0 || {
        // rank-formula numerator, computed with the same domain machinery
        val dom = xs.toDF("s", "y").groupBy("s")
          .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        var cum = 0L
        var pr2 = 0L
        dom.foreach { case (_, cnt, pos) =>
          pr2 += pos * (2 * cum + cnt + 1); cum += cnt
        }
        val rankNum = pr2 - nP * (nP + 1)
        // O(n^2) Mann-Whitney: 2 per concordant pair, 1 per tie
        val pairNum = (for {
          (sp, yp) <- xs if yp == 1L
          (sn, yn) <- xs if yn == 0L
        } yield if (sp > sn) 2L else if (sp == sn) 1L else 0L).sum
        rankNum == pairNum
      }
    }

  property("containment src-prefix cut is lossless vs the full directed join") =
    forAll(corpusGen) { docs =>
      docs.isEmpty || {
        val df = docs.toDF("doc_id", "text")
        // brute-force reference: every directed pair, exact containment
        val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSet }
        val full = (for {
          (a, ta) <- toks; (b, tb) <- toks if a != b
          c = BigDecimal(ta.intersect(tb).size.toDouble / ta.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if c >= 0.9
        } yield (a, b, c)).toSet
        Seq(true, false).forall { suffix =>
          graft.ops.DedupOps.containmentPairs(df, 0.9, suffixFilter = Some(suffix))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == full
        }
      }
    }

  // sorted-distinct key arrays + suffix start ranks for the r14 suffix
  // filter primitive: random draws from a vocabulary large enough that
  // prefix-of-another tokens ("w1" vs "w12") and disjoint/nested/staggered
  // suffixes all occur
  private val suffixCaseGen: Gen[(List[String], List[String], Int, Int)] = {
    val vocabGen = Gen.chooseNum(1, 30).map(i => s"w$i")
    for {
      a <- Gen.listOfN(14, vocabGen).map(_.distinct.sorted)
        .suchThat(_.nonEmpty)
      b <- Gen.listOfN(14, vocabGen).map(_.distinct.sorted)
        .suchThat(_.nonEmpty)
      ra <- Gen.chooseNum(1, a.size)
      rb <- Gen.chooseNum(1, b.size)
    } yield (a, b, ra, rb)
  }

  property("suffix_hamming_lb never exceeds the true suffix symmetric difference") =
    forAll(suffixCaseGen) { case (a, b, ra, rb) =>
      // ra/rb are 1-based first-shared ranks: suffixes are strictly after
      val sa = a.drop(ra).toSet
      val sb = b.drop(rb).toSet
      val trueDelta = (sa.diff(sb).size + sb.diff(sa).size)
      val lb = graft.functions.SuffixHammingLb.computeRef(a, b, ra, rb)
      lb >= 0 && lb <= trueDelta
    }

  property("containment suffix cut only ever removes candidates (subset of the positional form)") =
    forAll(corpusGen) { docs =>
      docs.isEmpty || {
        val df = docs.toDF("doc_id", "text")
        val toks = graft.ops.DedupOps.tokenSets(df).localCheckpoint()
        def pairsOf(suffix: Boolean) =
          graft.ops.DedupOps.containmentCandidates(toks, suffixFilter = suffix)
            .select("src_doc", "dst_doc").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        pairsOf(true).subsetOf(pairsOf(false))
      }
    }
}
