package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoinOps

/** Point-in-time-correct feature enrichment — the ML-pipeline reason as-of
  * joins exist: each training event must see the feature value that was
  * CURRENT at its event time, never a later one (future values are label
  * leakage). The streaming form runs the custom as-of operator per
  * micro-batch through foreachBatch against the static feature table. */
class PointInTimeSpec extends SparkSpec {
  import spark.implicits._

  // feature history: (entity, valid_from, value) — value 2.0 becomes
  // current at t=20, replacing 1.0
  private def features = Seq(
    (1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 15L, 5.0)
  ).toDF("f_ent", "f_from", "f_val")

  private def enrich(events: DataFrame): DataFrame =
    AsOfJoinOps.asofJoin(events, features,
      Seq("entity"), Seq("f_ent"), "ev_ts", "f_from", leftOuter = true)

  test("batch: each event sees the feature current AT its time — never a later one") {
    val events = Seq(
      (100L, 1L, 12L),  // between 1.0 (t=10) and 2.0 (t=20) -> must get 1.0
      (101L, 1L, 25L),  // after the update -> 2.0
      (102L, 2L, 14L),  // before entity 2's first value -> null, NOT 5.0
      (103L, 3L, 99L)   // entity with no features -> null
    ).toDF("event_id", "entity", "ev_ts")
    val got = enrich(events)
      .select(col("event_id"), col("f_val"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      100L -> Some(1.0),   // a plain equi-join latest would leak 2.0 here
      101L -> Some(2.0),
      102L -> None,
      103L -> None), s"$got")
  }

  test("streaming: per-micro-batch enrichment via foreachBatch is point-in-time correct") {
    val mem = MemoryStream[(Long, Long, Long)](spark)
    mem.addData((100L, 1L, 12L), (101L, 1L, 25L))
    val seen = scala.collection.mutable.Map.empty[Long, Option[Double]]
    val q = mem.toDF().toDF("event_id", "entity", "ev_ts")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        enrich(batch).select(col("event_id"), col("f_val")).collect().foreach { r =>
          seen(r.getLong(0)) =
            if (r.isNullAt(1)) None else Some(r.getDouble(1))
        }
      }
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData((102L, 2L, 14L)) // second micro-batch
    q.processAllAvailable()
    q.stop()
    assert(seen.toMap == Map(
      100L -> Some(1.0), 101L -> Some(2.0), 102L -> None), s"$seen")
  }

  test("stateful streaming as-of == batch as-of join on the full feeds " +
      "(default AND RocksDB state store providers)") {
    import graft.streaming.StreamOps
    import StreamOps.AsOfFeed
    def feat(k: Long, ts: Long, v: Double) =
      AsOfFeed("feature", k, ts, Some(v), None)
    def ev(id: Long, k: Long, ts: Long) =
      AsOfFeed("event", k, ts, None, Some(id))
    // three micro-batches; every feature version lands no later than the
    // first event that needs it, but e102 arrives AFTER a newer feature
    // already landed — it must still see the value current at ITS time
    val batches = Seq(
      Seq(feat(1L, 10L, 1.0), ev(100L, 1L, 12L)),
      Seq(feat(1L, 20L, 2.0), ev(101L, 1L, 25L), ev(102L, 1L, 10L)),
      Seq(feat(2L, 15L, 5.0), ev(103L, 2L, 14L), ev(104L, 2L, 15L),
        ev(105L, 3L, 99L)))

    val all = batches.flatten
    val featDf = all.filter(_.kind == "feature")
      .map(f => (f.key, f.ts, f.value.get)).toDF("f_ent", "f_from", "f_val")
    val evDf = all.filter(_.kind == "event")
      .map(e => (e.eventId.get, e.key, e.ts)).toDF("event_id", "entity", "ev_ts")
    val batch = AsOfJoinOps.asofJoin(evDf, featDf,
        Seq("entity"), Seq("f_ent"), "ev_ts", "f_from", leftOuter = true)
      .select(col("event_id"), col("f_val"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    // the contract must hold on BOTH providers (r10 verdict #6): 100 TB
    // streaming state lives in RocksDB, and a provider-specific state
    // serialization/ordering quirk would be invisible to a default-only run
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val providers = Seq(
      "default" -> None,
      "rocksdb" -> Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    try {
      for ((label, cls) <- providers) {
        cls match {
          case Some(c) => spark.conf.set(key, c)
          case None => prev match {
            case Some(p) => spark.conf.set(key, p)
            case None => spark.conf.unset(key)
          }
        }
        val mem = MemoryStream[AsOfFeed](spark)
        // no watermark on this bounded equivalence feed — explicit opt-in
        // (the r13 guard rejects unbounded state by default)
        val q = StreamOps.streamingAsOfEnrich(mem.toDS(),
            allowUnboundedState = true)
          .writeStream.format("memory").queryName(s"asof_stream_$label")
          .outputMode("append").start()
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        q.stop()
        val streamed = spark.table(s"asof_stream_$label")
          .collect().map(r => (r.getLong(0),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
        assert(streamed == batch, s"[$label] stream=$streamed batch=$batch")
        assert(streamed == Map(100L -> Some(1.0), 101L -> Some(2.0),
          102L -> Some(1.0), 103L -> None, 104L -> Some(5.0), 105L -> None),
          s"[$label] $streamed")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState as-of == flatMapGroupsWithState as-of (same feed)") {
    import graft.streaming.StreamOps
    import StreamOps.AsOfFeed
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batches = Seq(
        Seq(AsOfFeed("feature", 1L, 10L, Some(1.0), None),
          AsOfFeed("event", 1L, 12L, None, Some(100L))),
        Seq(AsOfFeed("feature", 1L, 20L, Some(2.0), None),
          AsOfFeed("event", 1L, 25L, None, Some(101L)),
          AsOfFeed("event", 1L, 10L, None, Some(102L)),
          AsOfFeed("event", 2L, 5L, None, Some(103L))))
      val mem = MemoryStream[AsOfFeed](spark)
      val q = StreamOps.streamingAsOfEnrichTws(mem.toDS())
        .writeStream.format("memory").queryName("asof_tws")
        .outputMode("append").start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      val got = spark.table("asof_tws")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got == Map(100L -> Some(1.0), 101L -> Some(2.0),
        102L -> Some(1.0), 103L -> None), s"$got")
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("watermark contract: dropping the event-time column after " +
      "withWatermark fails LOUDLY, surviving watermark + opt-in both pass") {
    import graft.streaming.StreamOps
    import StreamOps.AsOfFeed
    val mem = MemoryStream[AsOfFeed](spark)
    // the r12 STREAM_SF1 foot-gun verbatim: watermark on a derived
    // event-time column, then a select that drops it — Spark silently
    // removes the EventTimeWatermark node and state would never prune
    val degenerate = mem.toDS()
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "1 hour")
      .select("kind", "key", "ts", "value", "eventId")
      .as[AsOfFeed]
    val e = intercept[IllegalArgumentException] {
      StreamOps.streamingAsOfEnrich(degenerate)
    }
    assert(e.getMessage.contains("EventTimeWatermark") &&
      e.getMessage.contains("withWatermark"), e.getMessage)
    // keeping the watermarked column in-plan passes the guard (as[T] with
    // an extra column binds by name)
    val kept = mem.toDS()
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "1 hour")
      .as[AsOfFeed]
    StreamOps.streamingAsOfEnrich(kept) // must not throw
    // r13 ADVICE: a projection that merely RENAMES the watermarked column
    // mints a new exprId but the Alias carries the watermark-delay
    // metadata and the node still prunes — the guard must accept it, not
    // push the caller to allowUnboundedState
    val renamed = mem.toDS()
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "1 hour")
      .select(col("ets").as("event_time"), col("kind"), col("key"),
        col("ts"), col("value"), col("eventId"))
      .as[AsOfFeed]
    StreamOps.streamingAsOfEnrich(renamed) // must not throw
    // and no-watermark is allowed only as an explicit opt-in
    intercept[IllegalArgumentException] {
      StreamOps.streamingAsOfEnrich(mem.toDS())
    }
    StreamOps.streamingAsOfEnrich(mem.toDS(), allowUnboundedState = true)
  }

  test("pruneAsOfVersions keeps the standing candidate plus newer versions") {
    import graft.streaming.StreamOps.pruneAsOfVersions
    val v = List((10L, 1.0), (20L, 2.0), (30L, 3.0))
    // watermark between versions: the newest at-or-below it stays (it is
    // the answer for any event with ts in (watermark, 30))
    assert(pruneAsOfVersions(v, 25L) == List((20L, 2.0), (30L, 3.0)))
    // watermark before all versions: nothing can be dropped
    assert(pruneAsOfVersions(v, 5L) == v)
    // watermark past all versions: only the latest survives
    assert(pruneAsOfVersions(v, 100L) == List((30L, 3.0)))
    assert(pruneAsOfVersions(Nil, 100L) == Nil)
  }
}
