package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Ev

/** FIXTURES.md §B5: MemoryStream sequences asserted against the
  * batch-equivalent results (SURVEY.md §5.2.5). */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  private val evs = Seq(
    Ev(1, ts(0), 10, "click", 1.0),
    Ev(2, ts(5), 10, "click", 2.0),
    Ev(3, ts(50), 10, "view", 3.0),   // 45min gap -> new session for user 10
    Ev(4, ts(2), 20, "click", 4.0),
    Ev(5, ts(10), 20, "view", 5.0),
    Ev(2, ts(5), 10, "click", 2.0)    // duplicate event_id 2
  )

  private def runStream[T](data: Seq[T], f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String, mode: OutputMode)(implicit enc: org.apache.spark.sql.Encoder[T]) = {
    val mem = MemoryStream[T](spark)
    mem.addData(data: _*)
    StreamOps.runToMemory(f(mem.toDF()), name, mode)
    spark.table(name)
  }

  test("streaming decontam: stream result equals the batch operator's") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "totally unrelated words here now yes"))
    val benchDocs = Seq((99L, "one two three four five")).toDF("doc_id", "text")
    // eval-set grams collected once driver-side (tiny by definition) and
    // carried as the expression literal the streaming op expects
    val benchGrams = benchDocs
      .select(explode(graft.TrainDataQueries.gramsOf(col("text"), 5)).as("g"))
      .distinct().collect().map(_.getString(0)).toSeq
    val streamed = runStream(corpus,
      df => StreamOps.decontamStream(df.toDF("doc_id", "text"), benchGrams),
      "t_decontam", OutputMode.Append())
    val batch = graft.TrainDataQueries.decontamOverlapOf(
      corpus.toDF("doc_id", "text"), benchDocs)
    assert(streamed.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq)
    assert(streamed.count() == 1, "only doc 2 shares the planted 5-gram")

    // empty eval set: typed empty-array literal, zero contamination, no
    // analysis error from an array<null> literal
    val none = StreamOps.decontamStream(
      corpus.toDF("doc_id", "text"), Seq.empty)
    assert(none.count() == 0)
  }

  test("streaming bloom decontam: pairs equal the batch operator's, FPs die at verify") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "totally unrelated words here now yes"))
    val benchDocs = Seq((99L, "one two three four five")).toDF("doc_id", "text")
    val benchGrams = benchDocs
      .select(explode(graft.TrainDataQueries.gramsOf(col("text"), 5)).as("gram"))
      .distinct()
    // tiny expectedItems -> saturated filter -> every gram is a Bloom
    // positive; the exact-verify join must still yield only true matches
    val bloomSat = graft.ops.BloomOps.build(benchGrams, col("gram"), 1L, 0.5)
    val streamedSat = runStream(corpus,
      df => StreamOps.decontamStreamBloom(df.toDF("doc_id", "text"),
        bloomSat, benchGrams),
      "t_decontam_bloom_sat", OutputMode.Append())
    assert(streamedSat.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((2L, "one two three four five")),
      "false positives must die at the exact-verify join")
    // properly-sized filter: same answer, and the per-doc aggregation of
    // pairs equals the batch decontam operator
    val bloom = graft.ops.BloomOps.build(benchGrams, col("gram"), 1L << 10, 0.01)
    val streamed = runStream(corpus,
      df => StreamOps.decontamStreamBloom(df.toDF("doc_id", "text"),
        bloom, benchGrams),
      "t_decontam_bloom", OutputMode.Append())
    val agg = streamed.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
    val batch = graft.TrainDataQueries.decontamOverlapOf(
      corpus.toDF("doc_id", "text"), benchDocs)
    assert(agg.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq)
  }

  test("tumbling window: stream result equals batch result") {
    val streamed = runStream(evs, StreamOps.tumblingCounts, "t_tumbling", OutputMode.Complete())
    val batch = StreamOps.tumblingCounts(evs.toDF())
    assert(streamed.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq)
  }

  test("stream-static enrich: broadcast dim join in a stream equals the batch form") {
    val dim = Seq((10, "ALPHA"), (20, "BETA"), (0, "GAMMA"))
      .toDF("n_nationkey", "n_name")
    val streamed = runStream(evs,
      df => StreamOps.staticEnrich(df, dim), "t_static", OutputMode.Complete())
    val batch = StreamOps.staticEnrich(evs.toDF(), dim)
    assert(streamed.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq)
    // user 10 -> ALPHA (3 events + the duplicated id: enrich does not dedup),
    // user 20 -> BETA (2); GAMMA has no events and must not appear
    val byName = batch.collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byName == Map("ALPHA" -> 4L, "BETA" -> 2L), byName.toString)
  }

  test("theta distinct sketch: stream equals batch; exact at fixture scale") {
    val streamed = runStream(evs, StreamOps.distinctUsersDaily,
      "t_theta_daily", OutputMode.Complete())
    val batch = StreamOps.distinctUsersDaily(evs.toDF())
    assert(streamed.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq)
    val row = streamed.collect().head
    assert(row.getLong(1) == 2L, s"sketch must be exact here: $row")
    assert(row.getLong(2) == 6L)
  }

  test("session window: 45-minute gap splits sessions; stream equals batch") {
    val streamed = runStream(evs, StreamOps.sessionCounts, "t_session", OutputMode.Complete())
    val rows = streamed.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    // user 10: sessions {e1,e2,dup} and {e3}; user 20: one session {e4,e5}
    assert(rows == Seq((10L, 1L), (10L, 3L), (20L, 2L)))
    val batch = StreamOps.sessionCounts(evs.toDF())
    assert(streamed.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq)
  }

  test("trending top-k: counts stream in update mode; store ranks; deltas stay delta-sized") {
    val mem = MemoryStream[Ev](spark)
    val store = new StreamOps.TrendStore
    val q = StreamOps.trendingTopK(mem.toDF(), store)
    val day = 1704067200L
    try {
      mem.addData(Ev(1, ts(0), 10, "click", 1.0), Ev(2, ts(5), 10, "view", 2.0),
        Ev(3, ts(10), 20, "click", 3.0))
      q.processAllAvailable()
      assert(store.topK(2) == Seq((day, "click", 2L, 1), (day, "view", 1L, 2)))
      // second trigger touches ONLY clicks: update mode must re-emit the
      // (day, click) row alone, not the whole window's counts
      mem.addData(Ev(4, ts(20), 20, "click", 4.0), Ev(5, ts(25), 30, "click", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(store.topK(2) == Seq((day, "click", 4L, 1), (day, "view", 1L, 2)))
    assert(store.upsertsPerBatch.filter(_ > 0) == Seq(2, 1),
      s"second delta must carry only the changed row: ${store.upsertsPerBatch}")
    // the registry twin computes the same ranking shape in batch
    val batch = Queries.byName("stream_topk_trend").build(spark, sfDir)
    assert(batch.columns.toSeq == Seq("day_epoch", "event_type", "cnt", "rank"))
    val grouped = batch.collect().groupBy(_.getLong(0))
    assert(grouped.values.forall(_.length <= 3))
  }

  test("trending top-k: an oversized micro-batch delta throws loudly (r14 contract)") {
    val mem = MemoryStream[Ev](spark)
    val store = new StreamOps.TrendStore
    // cap 1, then a first batch touching TWO event types: the delta is 2
    // rows — over the cap, so the contract must fail the query loudly
    // instead of silently buffering an event-sized delta on the driver
    val q = StreamOps.trendingTopK(mem.toDF(), store, maxDeltaRows = 1)
    try {
      mem.addData(Ev(1, ts(0), 10, "click", 1.0), Ev(2, ts(5), 10, "view", 2.0))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
      assert(chain(e).exists(c =>
        Option(c.getMessage).exists(_.contains("aggregate-sized"))),
        s"wanted the delta-contract message, got: ${e.getMessage}")
      assert(store.upsertsPerBatch.forall(_ <= 1),
        "no oversized delta may reach the store")
    } finally q.stop()
  }

  test("streaming dedup drops the duplicate event_id within the watermark") {
    val streamed = runStream(evs, StreamOps.dedupEvents, "t_dedup", OutputMode.Append())
    assert(streamed.count() == 5)
    assert(streamed.select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("stateful first-seen per user via mapGroupsWithState") {
    val mem = MemoryStream[Ev](spark)
    mem.addData(evs: _*)
    val q = StreamOps.firstSeenPerUser(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("t_state").outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_state").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (u, rs) => rs.maxBy(_._3) }.toSeq.sortBy(_._1)
    assert(got == Seq(
      (10L, ts(0).getTime / 1000, 4L),
      (20L, ts(2).getTime / 1000, 2L)))
  }

  test("stream-stream interval join: purchase pairs with its preceding clicks") {
    val evs2 = Seq(
      Ev(1, ts(0), 1, "click", 0.0),
      Ev(2, ts(30), 1, "purchase", 9.99),   // click 30min before -> joins
      Ev(3, ts(200), 1, "purchase", 5.0),   // no click within 1h -> no row
      Ev(4, ts(10), 2, "click", 0.0))       // other user's click never joins
    val mem = MemoryStream[Ev](spark)
    mem.addData(evs2: _*)
    val q = StreamOps.purchasesWithRecentClicks(mem.toDF())
      .writeStream.format("memory").queryName("t_ssjoin").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ssjoin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("left-semi interval join emits each converted purchase ONCE " +
      "despite multiple matching clicks") {
    val evs2 = Seq(
      Ev(1, ts(0), 1, "click", 0.0),
      Ev(5, ts(10), 1, "click", 0.0),       // second matching click — still 1 row
      Ev(2, ts(30), 1, "purchase", 9.99),   // 2 clicks within 1h -> ONE row
      Ev(3, ts(200), 1, "purchase", 5.0),   // no click within 1h -> no row
      Ev(4, ts(10), 2, "click", 0.0))       // other user's click never joins
    val mem = MemoryStream[Ev](spark)
    mem.addData(evs2: _*)
    val q = StreamOps.purchasesWithRecentClicksSemi(mem.toDF())
      .writeStream.format("memory").queryName("t_ssjoin_semi")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ssjoin_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)),
      s"semi join must emit one row per converted purchase, got $got")
  }

  test("left-outer interval join releases unmatched purchases once the watermark passes") {
    val evs2 = Seq(
      Ev(1, ts(0), 1, "click", 0.0),
      Ev(2, ts(30), 1, "purchase", 9.99),   // click 30min before -> joins
      Ev(3, ts(200), 1, "purchase", 5.0),   // no click within 1h -> null row
      Ev(4, ts(10), 2, "click", 0.0))
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.purchasesWithRecentClicksOuter(mem.toDF())
      .writeStream.format("memory").queryName("t_ssjoin_outer")
      .outputMode("append").start()
    mem.addData(evs2: _*)
    q.processAllAvailable()
    // outer rows flush only when the watermark proves no click can still
    // match. Each join side computes its watermark from rows that REACH
    // its event-time node (a filtered-out 'view' advances neither), and
    // the global watermark = min(sides), so the nudge must be a
    // click+purchase pair; a batch's watermark takes effect in the NEXT
    // batch, so a second nudge batch performs the actual flush.
    mem.addData(Ev(90, ts(60 * 24), 9, "click", 0.0),
      Ev(91, ts(60 * 24), 9, "purchase", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(92, ts(60 * 25), 9, "click", 0.0),
      Ev(93, ts(60 * 25), 9, "purchase", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ssjoin_outer").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, -1L)),
      s"expected matched + null-flushed rows, got $got")
  }

  test("state-backend agnostic: RocksDB provider reproduces the default provider's results") {
    // the 100 TB state backend is RocksDB (bounded heap, spill-to-disk);
    // windowed agg + stream-stream join state must be provider-independent
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    def runBoth(name: String): Set[Any] = {
      val mem = MemoryStream[Ev](spark)
      mem.addData(evs: _*)
      val q = StreamOps.tumblingCounts(mem.toDF())
        .writeStream.format("memory").queryName(name).outputMode("complete").start()
      q.processAllAvailable(); q.stop()
      spark.table(name).collect().map(_.toSeq).toSet[Any]
    }
    val withDefault = runBoth("t_backend_default")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val withRocks = runBoth("t_backend_rocksdb")
      assert(withRocks == withDefault,
        s"RocksDB state store changed results:\n$withRocks\nvs\n$withDefault")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("flatMapGroupsWithState emits closed sessions only") {
    val mem = MemoryStream[Ev](spark)
    mem.addData(evs: _*)
    val q = StreamOps.closedSessions(mem.toDS(), gapSeconds = 30 * 60).toDF()
      .writeStream.format("memory").queryName("t_closed").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_closed")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 10: first session {ts0, ts5, dup-ts5} closed by the 45-min gap
    // before ts50; the ts50 session and user 20's session remain open
    assert(got == Set((10L, 3L)))
  }

  test("closed sessions: a late event older than an emitted session is " +
      "dropped, never fabricates an overlapping session (r10)") {
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.closedSessions(mem.toDS(), gapSeconds = 30 * 60).toDF()
      .writeStream.format("memory").queryName("t_closed_late")
      .outputMode("append").start()
    // batch 1: ts0 and ts50 — the 50-min gap closes session {ts0}
    mem.addData(Ev(1, ts(0), 40, "view", 1.0), Ev(2, ts(50), 40, "view", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event at ts5 (inside the already-emitted session's
    // span) — the old state logic merged it with the open {ts50} session
    // and emitted a bogus ClosedSession(n=1, first=last=ts5)
    mem.addData(Ev(3, ts(5), 40, "view", 1.0))
    q.processAllAvailable()
    // batch 3: close the open session so everything flushes
    mem.addData(Ev(4, ts(200), 40, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_closed_late")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exactly two sessions: {ts0} and {ts50} — no phantom ts5 session
    val epoch = (min: Int) => (1704067200000L + min * 60000L) / 1000
    assert(got == Set((40L, 1L, epoch(0)), (40L, 1L, epoch(50))), got)
  }

  test("streaming pattern bursts: matches the batch triple detector, O(1) state") {
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.streamPatternBursts(mem.toDS(), maxSpanUs = 24L * 3600 * 1000000)
      .toDF().writeStream.format("memory").queryName("t_bursts")
      .outputMode("append").start()
    // user 30: view -> click -> purchase inside 24h = one burst
    mem.addData(Ev(11, ts(0), 30, "view", 1.0), Ev(12, ts(10), 30, "click", 1.0))
    q.processAllAvailable()
    // state carries across micro-batches: purchase arrives later
    mem.addData(Ev(13, ts(20), 30, "purchase", 9.0))
    q.processAllAvailable()
    // user 40: the same triple but spanning > 24h = no burst
    mem.addData(Ev(21, ts(0), 40, "view", 1.0), Ev(22, ts(10), 40, "click", 1.0),
      Ev(23, ts(60 * 25), 40, "purchase", 9.0))
    q.processAllAvailable()
    // user 50: interrupted pattern (view, error, purchase) = no burst
    mem.addData(Ev(31, ts(0), 50, "view", 1.0), Ev(32, ts(5), 50, "error", 1.0),
      Ev(33, ts(10), 50, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_bursts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((30L, 11L, 20L * 60 * 1000000)), s"got $got")
  }

  test("idempotent append: batch anti-joined against existing keys") {
    val batch = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("event_id", "v")
    val existing = Seq(Tuple1(2L)).toDF("event_id")
    val out = StreamOps.idempotentAppend(batch, existing, "event_id")
    assert(out.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("watermark: late row beyond the horizon is dropped in append mode") {
    val mem = MemoryStream[Ev](spark)
    val agg = StreamOps.tumblingCounts(mem.toDF())
    val q = agg.writeStream.format("memory").queryName("t_late")
      .outputMode("append").start()
    mem.addData(Ev(1, ts(0), 1, "click", 1.0))
    q.processAllAvailable()
    // advance watermark far past day 0 (ts + 10 days)
    mem.addData(Ev(2, ts(60 * 24 * 10), 1, "click", 1.0))
    q.processAllAvailable()
    // this event is 10 days late -> dropped
    mem.addData(Ev(3, ts(1), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_late")
      .select(col("day_start"), col("cnt")).as[(Timestamp, Long)].collect().toMap
    assert(rows.getOrElse(ts(0), 0L) == 1L, s"late row must not inflate day-0 count: $rows")
  }

  test("frontier dedup: messy URL variants collapse to one canonical sighting") {
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    mem.addData(
      (1L, ts(0), "HTTPS://WWW.Ex.COM:443/jobs/9?utm_source=x&id=7#frag"),
      (2L, ts(1), "https://www.ex.com/jobs/9?id=7"),       // same canonical
      (3L, ts(2), "http://Ex.com:80/other/"),               // distinct page
      (4L, ts(3), "http://ex.com/other"))                   // dup of 3
    val q = StreamOps.frontierDedup(
        mem.toDF().toDF("page_id", "fetch_ts", "url"))
      .writeStream.format("memory").queryName("t_frontier")
      .outputMode("append").start()
    q.processAllAvailable()
    // a later micro-batch inside the horizon re-sees the first URL: state
    // must still hold the canonical key and drop it
    mem.addData((5L, ts(4), "https://www.ex.com/jobs/9/?id=7"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_frontier")
      .select(col("page_id"), col("canonical_url")).as[(Long, String)]
      .collect().toMap
    assert(got == Map(
      1L -> "https://www.ex.com/jobs/9?id=7",
      3L -> "http://ex.com/other"), s"got $got")
  }
}
