package graft

/** Smoke net: every registered query executes at sf0.001; the driver
  * contract invariants hold (oracle keys ⊆ query keys, entry non-empty). */
class QueriesSpec extends SparkSpec {

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry has no duplicate keys") {
    val keys = Queries.all.map(_._1)
    assert(keys.distinct.size == keys.size)
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct lands within its error bound of the exact count") {
    val approx = Queries.byName("agg_approx_distinct").build(spark, sfDir)
      .collect().head.getLong(0)
    val exact = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("profile_table_approx n_distinct lands within HLL error of the exact profile") {
    def byCol(name: String) =
      Queries.byName(name).build(spark, sfDir).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = byCol("profile_table")
    val approx = byCol("profile_table_approx")
    assert(exact.keySet == approx.keySet)
    for ((c, e) <- exact if c != "_rows") {
      val a = approx(c)
      // default rsd = 5%; allow 3 sigma
      assert(math.abs(a - e).toDouble / math.max(e, 1L) < 0.15,
        s"$c: approx=$a exact=$e")
    }
  }

  test("dataset_split_atomic: leak detector fires on the hash split, never on the atomic one") {
    // the per-doc hash split demonstrably leaks on this corpus...
    val leaked = Queries.byName("dedup_split_leak").build(spark, sfDir).collect()
    assert(leaked.nonEmpty, "planted family should leak under the per-doc split")
    // ...and the atomic census still covers every document exactly once
    val n = Queries.byName("dataset_split_atomic").build(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect().head.getLong(0)
    val total = Tables.documents(spark, sfDir).count()
    assert(n == total, s"atomic census covers $n of $total docs")
  }

  test("drift_psi: 20 buckets, non-null terms are >= 0, null only when a side is empty") {
    val rows = Queries.byName("drift_psi").build(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      val (nOld, nNew) = (r.getLong(1), r.getLong(2))
      if (nOld > 0 && nNew > 0) {
        // (p-q) and ln(p/q) always share a sign, so every PSI term is >= 0
        assert(!r.isNullAt(3) && r.getDouble(3) >= 0.0, s"bad term: $r")
      } else assert(r.isNullAt(3), s"zero-mass bucket must yield null: $r")
    }
  }

  test("theta sketches: exact at driver SFs, estimate-mode error bounded at 200k ids") {
    import org.apache.spark.sql.functions._
    // bound form (r11): exact counts satisfy inclusion-exclusion by
    // construction; every sketch-vs-exact bound boolean must hold
    val row = Queries.byName("sketch_theta_overlap").build(spark, sfDir).collect().head
    // the query derives exact_overlap/exact_buyers_only FROM
    // buyers/viewers/union via inclusion-exclusion, so asserting the
    // identity on the row alone is tautological (r11 ADVICE) — recompute
    // both from an INDEPENDENT countDistinct over the raw events instead
    val ev = graft.Tables.events(spark, sfDir)
    val buyer = col("event_type") === "purchase" && col("value") > 150
    val viewer = col("event_type") === "view" && col("value") > 180
    val ind = ev.groupBy("user_id")
      .agg(max(when(buyer, 1).otherwise(0)).as("isb"),
        max(when(viewer, 1).otherwise(0)).as("isv"))
      .agg(
        sum(when(col("isb") === 1 && col("isv") === 1, 1L).otherwise(0L))
          .as("i_overlap"),
        sum(when(col("isb") === 1 && col("isv") === 0, 1L).otherwise(0L))
          .as("i_buyers_only"))
      .collect().head
    assert(row.getAs[Long]("exact_overlap") == ind.getAs[Long]("i_overlap"),
      s"independent overlap recompute must agree: $row vs $ind")
    assert(row.getAs[Long]("exact_buyers_only") ==
      ind.getAs[Long]("i_buyers_only"),
      s"independent buyers_only recompute must agree: $row vs $ind")
    Seq("ok_buyers", "ok_viewers", "ok_union", "ok_overlap", "ok_buyers_only")
      .foreach(c => assert(row.getAs[Boolean](c), s"$c must hold: $row"))
    // estimate regime (the 100 TB behavior): 200k ids >> 4096 retained
    val est = spark.range(0, 200000).agg(
        theta_sketch_agg(when(col("id") < 150000, col("id"))).as("a"),
        theta_sketch_agg(when(col("id") >= 100000, col("id"))).as("b"))
      .select(
        theta_sketch_estimate(theta_union(col("a"), col("b"))).as("u"),
        theta_sketch_estimate(theta_intersection(col("a"), col("b"))).as("i"))
      .collect().head
    assert(math.abs(est.getLong(0) - 200000L) / 200000.0 < 0.05,
      s"union estimate off: ${est.getLong(0)}")
    assert(math.abs(est.getLong(1) - 50000L) / 50000.0 < 0.10,
      s"intersection estimate off: ${est.getLong(1)}")
  }

  test("ts_dist_drift: dense (window x type) grid, first window null, terms >= 0") {
    val rows = Queries.byName("ts_dist_drift").build(spark, sfDir).collect()
    val wins = rows.map(_.getLong(0)).distinct.sorted
    val types = rows.map(_.getString(1)).distinct
    assert(rows.length == wins.length * types.length, "grid must be dense")
    val firstWin = wins.head
    rows.foreach { r =>
      if (r.getLong(0) == firstWin) assert(r.isNullAt(3), s"first window must be null: $r")
      else if (!r.isNullAt(3)) assert(r.getDouble(3) >= 0.0, s"negative PSI term: $r")
    }
  }

  test("graph_pagerank conserves probability mass (no dangling leakage)") {
    val total = Queries.byName("graph_pagerank").build(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("rank")).collect().head.getDouble(0)
    // every nation has out-edges, so after 3 damped rounds the rank vector
    // still sums to ~1 (up to the 6-dp per-round rounding of N entries)
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass drifted: $total")
  }

  test("corr_pearson matches Spark's built-in corr on the same pair") {
    val got = Queries.byName("corr_pearson").build(spark, sfDir)
      .collect().head.getDouble(1)
    val builtin = Tables.lineitem(spark, sfDir)
      .agg(org.apache.spark.sql.functions.corr("l_quantity", "l_extendedprice"))
      .collect().head.getDouble(0)
    assert(math.abs(got - builtin) < 1e-5, s"got=$got builtin=$builtin")
  }

  test("corr_spearman is exactly 1 on a perfectly monotone pair, and in [-1,1] on data") {
    import spark.implicits._
    val mono = Seq.tabulate(50)(i => (i + 1.0, (i + 1) * 7.5))
      .toDF("l_quantity", "l_extendedprice")
    val rho1 = AuditQueries.corrSpearmanOf(mono).collect().head.getDouble(1)
    assert(rho1 == 1.0, s"monotone pair must give rho=1, got $rho1")
    // quantity and price are independent in the synthetic testdata, so the
    // data assertion is only the range invariant (near 0 is the truth here)
    val rho = Queries.byName("corr_spearman").build(spark, sfDir)
      .collect().head.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0, s"rho out of range: $rho")
  }

  test("winsorize_stats: thresholds ordered, each tail clips < 5%, mean inside clip range") {
    val r = Queries.byName("winsorize_stats").build(spark, sfDir).collect().head
    val (n, p05, p95) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (nLo, nHi, mean) = (r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(p05 <= p95)
    // < ceil(5% of n) rows strictly below the p05 order statistic (disc defn)
    assert(nLo < (5 * n + 99) / 100, s"lo tail $nLo of $n")
    assert(nHi <= n - (95 * n + 99) / 100, s"hi tail $nHi of $n")
    assert(mean >= p05 / 100.0 && mean <= p95 / 100.0, s"mean $mean outside clip range")
  }

  test("agg_histogram_eqdepth: partitions all rows into ordered non-overlapping buckets") {
    val rows = Queries.byName("agg_histogram_eqdepth").build(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total, "bucket counts must cover the table")
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).sorted.toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) < b.getLong(2),
          s"bucket ranges overlap: ${a.getLong(3)} vs ${b.getLong(2)}")
      case _ =>
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
  }

  test("text_entropy: 0 bits for a one-token doc, exactly log2(k) for k uniform tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a a a a"),                 // 1 distinct -> H = 0
      (2L, "a b c d a b c d"),                 // 4 uniform  -> H = 2
      (3L, "a b c d e f g h")                  // 8 uniform  -> H = 3
    ).toDF("doc_id", "text")
    val got = TrainDataQueries.textEntropyOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 0.0 && got(2L) == 2.0 && got(3L) == 3.0, got.toString)
  }

  test("sample_reservoir: bottom-k hashing is mergeable (bottom-k of shard bottom-ks)") {
    import org.apache.spark.sql.functions._
    val hashed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
    val full = hashed.orderBy("h", "doc_id").limit(64)
      .collect().map(_.getLong(0)).toSeq
    val merged = (hashed.filter(col("doc_id") % 2 === 0).orderBy("h", "doc_id").limit(64)
        .unionAll(hashed.filter(col("doc_id") % 2 =!= 0).orderBy("h", "doc_id").limit(64)))
      .orderBy("h", "doc_id").limit(64)
      .collect().map(_.getLong(0)).toSeq
    assert(full == merged, "bottom-k must merge losslessly across shards")
  }

  test("assoc_rules: confidence in (0,1], lift symmetric across rule direction") {
    val rows = Queries.byName("assoc_rules").build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, c, n, conf, lift) =>
      assert(n > 0 && conf > 0.0 && conf <= 1.0, s"$a->$c conf=$conf")
      assert(lift > 0.0, s"$a->$c lift=$lift")
    }
    // lift is direction-independent: N·n_ab/(n_a·n_b) — both rules carry it
    val byPair = rows.map { case (a, c, _, _, l) => (a, c) -> l }.toMap
    byPair.foreach { case ((a, c), l) =>
      assert(byPair((c, a)) == l, s"lift asymmetry on ($a,$c)")
    }
  }

  test("ts_rolling_median equals a driver-side sliding-median reference") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
    val expected = events.groupBy(_._1).flatMap { case (_, rs) =>
      rs.sortBy(r => (r._2, r._3)).sliding(5)
        .filter(_.size == 5)
        .map(w => w.last._3 -> w.map(_._4).sorted.apply(2))
    }.toMap
    val got = Queries.byName("ts_rolling_median").build(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("ts_autocorr: |r| <= 1 and exactly 1 on a perfectly persistent series") {
    val rows = Queries.byName("ts_autocorr").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ac = r.getDouble(2)
      assert(ac >= -1.0 && ac <= 1.0, s"${r.getString(0)} autocorr=$ac")
    }
  }

  test("agg_mode: the reported mode really is each group's max count") {
    import org.apache.spark.sql.functions._
    val counts = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val maxByGroup = counts.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._3).max }
    val got = Queries.byName("agg_mode").build(spark, sfDir).collect()
    got.foreach { r =>
      assert(r.getLong(2) == maxByGroup(r.getString(0)),
        s"mode count mismatch for ${r.getString(0)}")
    }
  }

  test("dedup_containment: containment >= jaccard on every shared pair") {
    val jac = Queries.byName("dedup_ngram_jaccard").build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val con = Queries.byName("dedup_containment").build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(con.nonEmpty)
    // C(a→b) = |∩|/|a| ≥ |∩|/|∪| = J(a,b); tolerance for the 6-dp rounds
    jac.foreach { case ((a, b), j) =>
      con.get((a, b)).foreach(c => assert(c + 1e-6 >= j, s"($a,$b): c=$c < j=$j"))
    }
  }

  test("knn_join_blocked: every vector gets exactly k neighbors, all same-label") {
    import org.apache.spark.sql.functions._
    val labels = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = Queries.byName("knn_join_blocked").build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val perQuery = rows.groupBy(_._1)
    assert(perQuery.size == labels.size, "every vector must appear as a query")
    perQuery.foreach { case (q, ns) =>
      assert(ns.map(_._3).sorted.toSeq == Seq(1, 2, 3), s"ranks off for $q")
      ns.foreach { case (_, nb, _) =>
        assert(labels(nb) == labels(q), s"cross-label neighbor $nb for $q")
      }
    }
  }

  test("dataset_interleave: positions are a permutation and sources spread by weight") {
    val rows = Queries.byName("dataset_interleave").build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq, "global_pos gaps")
    assert(rows.map(_._2).distinct.length == rows.length, "doc emitted twice")
    // a weight-2 source's docs must interleave ~2x as densely as weight-1:
    // in any prefix of length n, count(src0 docs) >= count(src1 docs)
    val prefix = rows.take(rows.length / 2)
    val n0 = prefix.count(_._3 == "src0")
    val n1 = prefix.count(_._3 == "src1")
    assert(n0 >= n1, s"weight-2 source src0 ($n0) behind weight-1 src1 ($n1)")
  }

  test("graph_common_neighbors: scored pairs are non-edges with jaccard in (0,1]") {
    val rows = Queries.byName("graph_common_neighbors").build(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonicalized")
      assert(r.getLong(2) > 0, "zero common neighbors emitted")
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
  }

  test("ts_theil_sen: slope is the median of a driver-side pairwise reference") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, rs) =>
      val pts = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1)).sorted
      t -> slopes((slopes.length - 1) / 2)
    }
    val got = Queries.byName("ts_theil_sen").build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == expected)
  }

  test("rfm_segments: quartiles cover all customers, segment codes in 1..4") {
    val rows = Queries.byName("rfm_segments").build(spark, sfDir).collect()
    val nCustomers = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCustomers, "segments must partition customers")
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(b =>
        assert(b >= 1 && b <= 4, s"bucket $b out of range"))
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("agg_skewness: matches a driver-side two-pass reference within 1e-6") {
    val vals = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val expected = vals.groupBy(_._1).map { case (g, rs) =>
      val xs = rs.map(_._2)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      g -> m3 / math.pow(m2, 1.5)
    }
    val got = Queries.byName("agg_skewness").build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    expected.foreach { case (g, e) =>
      assert(math.abs(got(g) - e) < 1e-6, s"$g: got ${got(g)} want $e")
    }
  }

  test("join_asof_nearest: the pick really is the nearest click, ties backward") {
    import org.apache.spark.sql.functions._
    val byUser = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = byUser.values.flatMap { rs =>
      val clicks = rs.filter(_._3 == "click").map(_._4).sorted
      rs.filter(_._3 == "purchase").map { p =>
        val prev = clicks.filter(_ <= p._4).lastOption
        val next = clicks.find(_ > p._4)
        val nearest = (prev, next) match {
          case (Some(b), Some(f)) => Some(if (p._4 - b <= f - p._4) b else f)
          case (b, f) => b.orElse(f)
        }
        p._2 -> nearest
      }
    }.toMap
    val got = Queries.byName("join_asof_nearest").build(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("dq_benford: shares sum to 1 and digits cover 1..9") {
    val rows = Queries.byName("dq_benford").build(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 9))
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    rows.foreach(r => assert(r.getDouble(3) > 0 && r.getDouble(3) < 0.5))
  }

  test("sample_balanced: every class kept at exactly the min class size") {
    import org.apache.spark.sql.functions._
    val minN = Tables.embeddings(spark, sfDir)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .agg(min("n")).collect()(0).getLong(0)
    val rows = Queries.byName("sample_balanced").build(spark, sfDir).collect()
    rows.foreach(r => assert(r.getLong(1) == minN))
  }

  test("text_collocations: every reported bigram clears the support floor") {
    val rows = Queries.byName("text_collocations").build(spark, sfDir).collect()
    assert(rows.length > 0 && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getLong(1) >= 5, s"${r.getString(0)} below support floor")
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("search_more_like_this: scores bounded by the seed's own token count") {
    import org.apache.spark.sql.functions._
    val seedLen = Tables.documents(spark, sfDir).filter(col("doc_id") === 0)
      .select(size(split(lower(col("text")), "\\s+"))).collect()(0).getInt(0)
    val rows = Queries.byName("search_more_like_this").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= seedLen))
    val scores = rows.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse, "not rank-ordered")
  }

  test("anomaly_seasonal: every flagged day clears the sqrt(2)-sigma test in its weekday group") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val flagged = Queries.byName("anomaly_seasonal").build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate)).toSet
    val byGroup = daily.groupBy(r => (r._1, r._2.getDayOfWeek.getValue))
    var anyFlag = false
    byGroup.foreach { case ((t, _), rs) if rs.length >= 3 =>
      val n = rs.length
      val sy = rs.map(_._3).sum
      val syy = rs.map(r => r._3 * r._3).sum
      rs.foreach { r =>
        val lhs = (n * r._3 - sy) * (n * r._3 - sy)
        val isOut = lhs > 2 * (n * syy - sy * sy)
        if (isOut) anyFlag = true
        assert(flagged.contains((t, r._2)) == isOut,
          s"flag mismatch for ($t, ${r._2})")
      }
    case _ =>
    }
    assert(anyFlag, "screen should flag at least one day on this corpus")
  }

  test("growth_cumulative_users: final cumulative equals total distinct users") {
    val rows = Queries.byName("growth_cumulative_users").build(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.last.getLong(2) == total)
    assert(rows.map(_.getLong(1)).sum == total, "daily new-user counts must sum to total")
    val cums = rows.map(_.getLong(2)).toSeq
    assert(cums == cums.sorted, "cumulative must be monotone")
  }

  test("graph_assortativity: r in [-1, 1] on the strong-tie graph") {
    val rows = Queries.byName("graph_assortativity").build(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows(0).getDouble(1)
    assert(r >= -1.0 && r <= 1.0, s"assortativity $r out of range")
  }

  test("search_prf_expand: expansion terms exclude the query and come from top docs") {
    val terms = Queries.byName("search_prf_expand").build(spark, sfDir).collect()
      .map(_.getString(0))
    assert(terms.nonEmpty && terms.length <= 10)
    Seq("spark", "join", "stream").foreach(q =>
      assert(!terms.contains(q), s"query term $q leaked into expansion"))
  }

  test("doc_winnowing: fingerprint sets shrink the gram count and copies share them") {
    import spark.implicits._
    // identical docs -> identical fingerprints; a shifted copy still overlaps
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((100L, text), (200L, text), (300L, "pre1 pre2 " + text))
      .toDF("doc_id", "text")
    val fp = NorthStarQueries.docWinnowingOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(fp(100L) == fp(200L), "identical docs must fingerprint identically")
    assert(fp(100L)._1 > 0)
  }

  test("agg_gini: 0 on equal values, 1-1/n shape on total concentration") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def gini(xs: Seq[Long]): Double = {
      val sorted = xs.sorted
      val n = sorted.length.toLong
      val sx = sorted.sum
      val six = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (2.0 * six - (n + 1) * sx) / (n.toDouble * sx)
    }
    val rows = Queries.byName("agg_gini").build(spark, sfDir).collect()
    val g = rows(0).getDouble(1)
    assert(g >= 0.0 && g < 1.0, s"gini $g out of range")
    // driver-side reference on the same data
    val spends = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long").as("x"))
      .collect().map(_.getLong(1)).toSeq
    assert(math.abs(g - gini(spends)) < 1e-5)
  }

  test("dataset_token_budget: kept tokens stay within a quarter of the corpus") {
    import org.apache.spark.sql.functions._
    val rows = Queries.byName("dataset_token_budget").build(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir)
      .select(size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val kept = rows.map(_.getLong(2)).sum
    assert(kept * 4 <= total, s"budget exceeded: $kept of $total")
    assert(kept > 0)
  }

  test("text_novelty: shares in [0,1]; the corpus-min doc is fully novel") {
    val rows = Queries.byName("text_novelty").build(spark, sfDir).collect()
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    val firstDoc = rows.map(_.getLong(0)).min
    val firstNovelty = rows.find(_.getLong(0) == firstDoc).get.getDouble(2)
    assert(firstNovelty == 1.0, s"earliest doc must be 100% novel, got $firstNovelty")
  }

  test("multimodal_frame_dedup: families really span 2+ docs") {
    val rows = Queries.byName("multimodal_frame_dedup").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 2, "single-doc fingerprint leaked")
      assert(r.getLong(1) >= r.getLong(2), "frame count below doc count")
    }
  }

  test("dq_referential: clean on the star schema, fires on planted violations") {
    import spark.implicits._
    val rows = Queries.byName("dq_referential").build(spark, sfDir).collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(r.getLong(1) == 0L, s"clean data flagged: $r"))
    // planted orphan + duplicate key
    val parent = Seq((1L, "a"), (2L, "b"), (2L, "b2")).toDF("pk", "v")
    val child = Seq((1L, "x"), (3L, "orphan")).toDF("fk", "v")
    val orphan = AuditQueries.fkOrphans("t", child, "fk", parent, "pk")
      .collect()(0).getLong(1)
    val dup = AuditQueries.pkDups("t", parent, "pk").collect()(0).getLong(1)
    assert(orphan == 1L, s"expected 1 orphan, got $orphan")
    assert(dup == 1L, s"expected 1 duplicate, got $dup")
  }

  test("window_streaks: histogram covers every active user, streaks >= 1") {
    val rows = Queries.byName("window_streaks").build(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
    rows.foreach(r => assert(r.getLong(0) >= 1))
  }

  test("tpch_q10: top-20 returned-item revenue is rank-ordered and positive") {
    val rows = Queries.byName("tpch_q10").build(spark, sfDir).collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getDouble(3)).toSeq
    assert(revs == revs.sorted.reverse)
    revs.foreach(r => assert(r > 0))
  }

  test("embedding_pca_power: unit-norm loading aligned with a double-precision reference") {
    val got = Queries.byName("embedding_pca_power").build(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    val norm = math.sqrt(got.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loading norm $norm")
    // driver-side double-precision power iteration, same rounds/start
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var x = Array.fill(vecs(0).length)(0.125)
    for (_ <- 1 to 2) {
      val y = Array.fill(x.length)(0.0)
      vecs.foreach { v =>
        val s = v.zip(x).map { case (a, b) => a * b }.sum
        v.indices.foreach(i => y(i) += v(i) * s)
      }
      val n = math.sqrt(y.map(t => t * t).sum)
      x = y.map(_ / n)
    }
    val cos = got.zip(x).map { case (a, b) => a * b }.sum
    assert(cos > 0.999, s"cosine with reference $cos")
  }

  test("rolling_active_users: dau <= wau <= mau <= total users, every day") {
    val rows = Queries.byName("rolling_active_users").build(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau, mau) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dau <= wau && wau <= mau && mau <= total, s"panel out of order: $r")
    }
  }

  test("attribution_linear: credited revenue never exceeds attributable purchases") {
    import org.apache.spark.sql.functions._
    val credited = Queries.byName("attribution_linear").build(spark, sfDir).collect()
      .map(_.getDouble(2)).sum
    val purchaseTotal = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(credited > 0 && credited <= purchaseTotal + 1e-3,
      s"credited $credited vs purchases $purchaseTotal")
  }

  test("event_paths_topk: paths have <= 3 steps, counts rank-ordered") {
    val rows = Queries.byName("event_paths_topk").build(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach(r => assert(r.getString(0).split(">").length <= 3))
    val ns = rows.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("agg_bitmap_distinct: bitmap counts equal plain exact distincts") {
    import org.apache.spark.sql.functions._
    val r = Queries.byName("agg_bitmap_distinct").build(spark, sfDir).collect()(0)
    val total = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(r.getLong(2) == total, s"bitmap total ${r.getLong(2)} != $total")
    assert(r.getLong(1) >= total, "daily sum must be >= total (revisits)")
  }

  test("embedding_outliers: flagged set is exactly the distance-rank top 1%") {
    val flagged = Queries.byName("embedding_outliers").build(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(flagged.length == (n / 100).toInt, s"${flagged.length} flagged of $n")
    val d2s = flagged.map(_.getDouble(2)).toSeq
    assert(d2s == d2s.sorted.reverse, "outliers must rank by distance desc")
  }

  test("heavy_hitters_exact: exactly the tokens above the n/41 threshold") {
    import org.apache.spark.sql.functions._
    val got = Queries.byName("heavy_hitters_exact").build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val freqs = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = freqs.map(_._2).sum
    val expected = freqs.filter(_._2 * 41 > n).toMap
    assert(got == expected, s"got ${got.size} expected ${expected.size}")
    assert(got.nonEmpty)
  }

  test("misra-gries summary: the guarantee holds on an adversarial stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60% of the stream is one item; MG(k=4) must surface it
    val stream = (Seq.fill(600)("hot") ++ (1 to 400).map(i => s"cold$i"))
      .toDF("tok").repartition(8)
    val cands = stream.agg(graft.ops.TopKOps.misraGries(4, col("tok")))
      .collect()(0).getSeq[String](0)
    assert(cands.contains("hot"), s"guaranteed heavy item missing from $cands")
    assert(cands.length <= 4)
  }

  test("search_rerank_twostage: reranked docs come from the BM25 candidates") {
    import org.apache.spark.sql.functions._
    val cand = Queries.byName("search_bm25").build(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val rows = Queries.byName("search_rerank_twostage").build(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(cand.contains(r.getLong(0)),
      s"reranked doc ${r.getLong(0)} not in stage-1 candidates"))
    val finals = rows.map(_.getDouble(1)).toSeq
    assert(finals == finals.sorted.reverse)
  }

  test("ts_hampel_filter: every flag clears the 3-scaled-MAD bar in its own frame") {
    import org.apache.spark.sql.functions._
    val flagged = Queries.byName("ts_hampel_filter").build(spark, sfDir).collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      val (v, med, mad) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(v - med) > 3.0 * 1.4826 * mad - 1e-5, s"weak flag: $r")
    }
    // the filter is strictly more selective than the raw rolling median count
    val all = Tables.events(spark, sfDir).count()
    assert(flagged.length < all / 4, "hampel should flag a minority")
  }

  test("graph_kcore: every surviving node has core degree >= k within the core") {
    val rows = Queries.byName("graph_kcore").build(spark, sfDir).collect()
    rows.foreach(r => assert(r.getLong(1) >= 2, s"node below core degree: $r"))
    // driver-side reference peeling on the same strong-tie graph
    // (top-40 heaviest non-self pairs, ties broken by (src, dst) —
    // must mirror GraphQueries.strongTieEdges exactly)
    import org.apache.spark.sql.functions._
    val edges = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .filter(col("src") =!= col("dst"))
      .orderBy(col("w").desc, col("src"), col("dst")).limit(40)
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var live = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var stable = false
    while (!stable) {
      val deg = edges.filter(e => live(e._1) && live(e._2))
        .flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (k, v) => k -> v.size }
      val next = deg.filter(_._2 >= 2).keySet
      stable = next == live
      live = next
    }
    assert(rows.map(_.getLong(0)).toSet == live, "core membership mismatch")
  }

  test("text_blocklist_filter: hits only ever contain blocklist terms; phrase tier fires") {
    val rows = Queries.byName("text_blocklist_filter").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val allowed = Tables.BlocklistTerms.toSet
    def hitsOf(r: org.apache.spark.sql.Row): Seq[String] =
      r.getString(1).split(",").toSeq
    rows.foreach { r =>
      val hits = hitsOf(r)
      assert(hits.nonEmpty && hits.forall(allowed.contains), s"stray hit in $r")
      assert(hits.length == r.getInt(2))
    }
    // the phrase tier ("slow merge") must fire somewhere on this corpus
    assert(rows.exists(hitsOf(_).contains("slow merge")),
      "Aho-Corasick phrase tier never matched")
    // absent term never matches
    assert(!rows.exists(hitsOf(_).contains("broken")))
  }

  test("ts_changepoint: the reported peak really is each series' max |cusum|") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, rs) =>
      val ys = rs.sortBy(_._2.toEpochDay).map(_._3)
      val n = ys.length.toLong
      val s = ys.sum
      val cusums = ys.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
        case (pre, i) => n * pre - (i + 1) * s
      }
      t -> cusums.map(math.abs).max
    }
    val got = Queries.byName("ts_changepoint").build(spark, sfDir).collect()
      .map(r => r.getString(0) -> math.abs(r.getLong(2))).toMap
    assert(got == expected)
  }

  test("graph_modularity: contributions bounded, degree sums cover 2m") {
    val rows = Queries.byName("graph_modularity").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val m = rows.map(_.getLong(1)).sum // intra edges <= m, but check via d_c
    val dSum = rows.map(_.getLong(2)).sum
    assert(dSum % 2 == 0, "degree sum must be even (2 per edge)")
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(1) * 2 <= r.getLong(2),
        s"intra-edges need 2 endpoints each inside: $r")
    }
  }

  test("multimodal_audio_vad: segments tile voiced chunks without overlap") {
    val rows = Queries.byName("multimodal_audio_vad").build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, segs) =>
      val sorted = segs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, "seg_idx gaps")
      // consecutive segments are separated by at least one unvoiced hop
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 + a._4 * 3 < b._3, s"segments touch/overlap: $a $b")
        case _ =>
      }
    }
  }

  test("dedup_substring_spans: planted 8-token duplicate found, maximal, clean doc absent") {
    import spark.implicits._
    val shared = "a1 b2 c3 d4 e5 f6 g7 h8 i9 j10" // 10 shared tokens
    val docs = Seq(
      (1L, s"xx yy $shared zz"),
      (2L, s"$shared qq rr ss"),
      (3L, "totally different words with no overlap at all here ok")
    ).toDF("doc_id", "text")
    val rows = NorthStarQueries.dedupSubstringSpansOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // both holders report ONE maximal span covering all 10 shared tokens
    // (3 duplicated 8-gram positions merge into one island: 8 + 2)
    assert(rows.keySet == Set(1L, 2L), s"wrong docs flagged: $rows")
    assert(rows(1L) == ((1L, 10L, 13L)), s"doc1: ${rows(1L)}")
    assert(rows(2L) == ((1L, 10L, 13L)), s"doc2: ${rows(2L)}")
  }

  test("dedup_substring_spans: corpus invariants at sf") {
    val rows = Queries.byName("dedup_substring_spans").build(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val (spans, dup, total, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(spans >= 1 && dup >= 8, s"degenerate span row: $r")
      assert(dup <= total, s"covered tokens exceed doc length: $r")
      assert(ratio > 0 && ratio <= 1.0, s"ratio out of range: $r")
      // each maximal span covers >= 8 tokens; spans are disjoint
      assert(dup >= spans * 8, s"spans shorter than the gram width: $r")
    }
  }

  test("chunk_cdc: boundaries resync after an insertion; fixed-width would lose all") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // non-repeating body: accidental fixed-width matches are impossible,
    // so any fixed-chunk survival would be a real alignment, not an echo
    val base = (0 until 80).map(i => f"tok$i%03d").mkString(" ")
    val docs = Seq((1L, base), (2L, "INSERTED-PREFIX " + base))
      .toDF("doc_id", "text")
    val shared = CorpusQueries.chunkCdcOf(docs).collect()
    // content-defined boundaries re-synchronize after the insertion, so the
    // unchanged suffix still produces identical chunks in both docs
    assert(shared.nonEmpty,
      "CDC failed to resync after a prefix insertion — no shared chunks")
    shared.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= 2, s"counts: $r")
      assert(r.getLong(3) >= 1, s"empty chunk: $r")
    }
    // fixed-width 32-char chunks of the same pair share NOTHING (alignment
    // destroyed) — the contrast that justifies CDC
    val fixedShared = docs
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, cast(ceil(length(text)/32.0) as int) - 1),
           |i -> substring(text, i*32 + 1, 32))""".stripMargin)).as("ch"))
      .groupBy("ch").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).count()
    assert(fixedShared == 0,
      "fixture too easy: fixed-width chunking also survived the insertion")
  }

  test("mine_hard_negatives: negatives really are top different-label neighbors") {
    import org.apache.spark.sql.functions._
    val rows = Queries.byName("mine_hard_negatives").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val e = Tables.embeddings(spark, sfDir)
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (q, n, negLabel, rnk) =
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))
      assert(labels(n) == negLabel && negLabel != labels(q),
        s"negative shares the query label: $r")
      assert(rnk >= 1 && rnk <= 3)
    }
    // brute-force re-verify one query's negative set
    val q0 = rows.map(_.getLong(0)).min
    val vecs = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val qv = vecs.find(_._1 == q0).get
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs
      .filter(v => v._1 != q0 && v._3 != qv._3)
      .map(v => (v._1, cos(qv._2, v._2)))
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSeq
    val got = rows.filter(_.getLong(0) == q0).sortBy(_.getInt(3))
      .map(_.getLong(1)).toSeq
    assert(got == expected, s"hard negatives for query $q0 not the true top-3")
  }

  test("embedding_quant_calib: per-dim stats coherent, clip rate ~1%") {
    val rows = Queries.byName("embedding_quant_calib").build(spark, sfDir)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length).toSeq)
    rows.foreach { r =>
      val (maxAbs, p99, scale, n, nClip, rate) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getDouble(6))
      assert(p99 <= maxAbs + 1e-9, s"p99 above max: $r")
      assert(math.abs(scale - BigDecimal(p99 / 127.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      assert(nClip <= n * 0.02, s"clip rate far above the 1% target: $r")
      assert(math.abs(rate - nClip.toDouble / n) < 1e-6)
    }
  }

  test("dq_skew_report: stats agree with a direct recount") {
    import org.apache.spark.sql.functions._
    val rows = Queries.byName("dq_skew_report").build(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5),
          r.getString(6)))).toMap
    assert(rows.keySet == Set("o_custkey", "l_partkey"))
    val counts = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(count(lit(1)).as("c")).collect().map(_.getLong(1))
    val (nRows, nKeys, maxCnt, ratio, top) = rows("o_custkey")
    assert(nRows == counts.sum && nKeys == counts.length &&
      maxCnt == counts.max)
    assert(math.abs(ratio - BigDecimal(maxCnt.toDouble * nKeys / nRows)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(top.split(",").length == 3 && top.split(",").forall(_.contains(":")))
  }

  test("graph_wcc: converged fixpoint, components partition the node set") {
    val rows = Queries.byName("graph_wcc").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)),
      "fixed-round propagation did not reach the fixpoint")
    val nNodes = rows.map(_.getLong(1)).sum
    val allNodes = Tables.nation(spark, sfDir).count()
    assert(nNodes <= allNodes && nNodes > 0,
      s"component sizes sum to $nNodes of $allNodes nations")
    // each component is identified by its minimum member, so ids are unique
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("shard_rendezvous: dropping a shard moves exactly that shard's docs") {
    val rows = Queries.byName("shard_rendezvous").build(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 to 7), "missing shards")
    val total = rows.map(_._2).sum
    assert(total == Tables.documents(spark, sfDir).count())
    rows.foreach { case (shard, nDocs, moved) =>
      if (shard == 7) assert(moved == nDocs,
        s"every doc of the dropped shard must move: $shard $nDocs $moved")
      else assert(moved == 0,
        s"HRW moved docs from a surviving shard: $shard moved=$moved")
    }
    // assignment is roughly balanced (md5 keys are uniform): no shard
    // holds more than 3x its fair share
    rows.foreach { case (s2, n, _) =>
      assert(n <= total * 3 / 8 + 1, s"shard $s2 badly unbalanced: $n/$total")
    }
  }

  test("graph_label_prop: communities are node ids and layout-independent") {
    val a = Queries.byName("graph_label_prop").build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(a.nonEmpty)
    val nationKeys = Tables.nation(spark, sfDir)
      .select("n_nationkey").collect()
      .map(_.get(0).asInstanceOf[Number].longValue).toSet
    assert(a.forall { case (_, c) => nationKeys.contains(c) },
      "community label is not a node id")
    assert(a.map(_._2).distinct.size < a.size,
      "label propagation found no structure (all singleton communities)")
  }

  for ((name, q) <- Queries.all) {
    test(s"query $name executes at sf0.001") {
      val n = q.build(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
