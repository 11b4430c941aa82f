package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata (TESTDATA.md / FIXTURES.md §A).
  *
  * Schemas are fixed by the generator (seed=42); we read the parquet footer
  * schema directly (explicit, stable) rather than inferring anything. The
  * session is expected to run with `spark.sql.session.timeZone=UTC` so
  * timestamp columns (`o_orderdate`, `l_shipdate`, `events.ts`) are stable
  * against the DuckDB oracle.
  *
  * At 100 TB these reads stay scan-shaped: every query selects/filters before
  * any shuffle so Parquet column pruning + predicate pushdown apply (verify
  * with `.explain("formatted")` → `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` must come out as a session-TZ TIMESTAMP (UTC) whatever the
    * generator wrote. The driver has shipped two encodings across rounds:
    * TIMESTAMP(NANOS) (unreadable by the vectorized reader — [[tune]]'s
    * legacy conf surfaces it as a nanos long, truncated here to micros with
    * integer `DIV`, since 2024 epoch-nanos ≈ 1.7e18 overflows double), and
    * plain TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark infers
    * as TIMESTAMP_NTZ — cast to TIMESTAMP under the pinned UTC session, the
    * identical instants. Dispatch on the footer schema so both keep working
    * and both land on the same micros values DuckDB reads. */
  def events(s: SparkSession, d: String): DataFrame =
    convertEventTs(table(s, d, "events"))

  /** The ts normalization of [[events]], exposed for readers that build the
    * events DataFrame themselves (e.g. the streaming file source). */
  def convertEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df // already session-TZ TIMESTAMP
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Runtime confs every entry point applies (idempotent). Kept here so
    * Verify/Bench/tests all execute with identical semantics. */
  def tune(spark: SparkSession): SparkSession = {
    // Oracle comparisons read our written parquet with DuckDB/pyarrow:
    // INT96 is legacy — write standard micros.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // AQE re-plans shuffles at runtime (coalesce small partitions, split
    // skewed ones) — essential at 100 TB, harmless at sf0.01.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // events.ts is TIMESTAMP(NANOS,false) — read as long, converted in events().
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Native functions for sessions built without spark.sql.extensions.
    // Register-once guard: tune() runs on every table() call, and a blind
    // re-register logs a "replaced a previously registered function" WARN
    // per call — hundreds of lines of noise in a bench run.
    val reg = spark.sessionState.functionRegistry
    def registerIfAbsent(name: String)(doRegister: => Unit): Unit = {
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id)) doRegister
    }
    registerIfAbsent("vec_dot") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
        graft.functions.FloatVectorDot.info,
        graft.functions.FloatVectorDot.builder)
    }
    registerIfAbsent("vec_cosine") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_cosine"),
        graft.functions.FloatVectorCosine.info,
        graft.functions.FloatVectorCosine.builder)
    }
    registerIfAbsent("minhash_sig") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
        graft.functions.MinhashSig.info,
        graft.functions.MinhashSig.builder)
    }
    registerIfAbsent("vec_qdot") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_qdot"),
        graft.functions.LongVectorDot.info,
        graft.functions.LongVectorDot.builder)
    }
    registerIfAbsent("word_grams") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("word_grams"),
        graft.functions.WordGrams.info,
        graft.functions.WordGrams.builder)
    }
    registerIfAbsent("winnow_mins") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_mins"),
        graft.functions.WinnowMins.info,
        graft.functions.WinnowMins.builder)
    }
    registerIfAbsent("poly_grams") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("poly_grams"),
        graft.functions.PolyGrams.info,
        graft.functions.PolyGrams.builder)
    }
    registerIfAbsent("bpe_stats") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_stats"),
        graft.functions.BpeStats.info,
        graft.functions.BpeStats.builder)
    }
    registerIfAbsent("cdc_chunks") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_chunks"),
        graft.functions.CdcChunks.info,
        graft.functions.CdcChunks.builder)
    }
    registerIfAbsent("jaro_winkler") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
        graft.functions.JaroWinkler.info,
        graft.functions.JaroWinkler.builder)
    }
    registerIfAbsent("vec_nearest_cid") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_nearest_cid"),
        graft.functions.VecNearestCid.info,
        graft.functions.VecNearestCid.builder)
    }
    // term_match: one-pass dictionary-match Generator over the skill taxonomy
    registerIfAbsent("term_match") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("term_match"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.TermMatchGenerator].getCanonicalName, "term_match"),
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.TermMatchGenerator(args.head,
            graft.ops.SkillOps.taxonomyRows.map(_._1).distinct))
    }
    // term_match_array: the scalar (array<string>) form of the same
    // dictionary match, for use inside per-row conditional cascades
    registerIfAbsent("term_match_array") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("term_match_array"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.TermMatchArray].getCanonicalName, "term_match_array"),
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.TermMatchArray(args.head,
            graft.ops.SkillOps.taxonomyRows.map(_._1).distinct))
    }
    // blocklist_match: the same one-pass matcher bound to the SAFETY
    // blocklist instead of the skill taxonomy (text_blocklist_filter);
    // single tokens + one phrase so both matcher tiers exercise
    registerIfAbsent("blocklist_match") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("blocklist_match"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.TermMatchArray].getCanonicalName, "blocklist_match"),
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.TermMatchArray(args.head, BlocklistTerms))
    }
    // asof_match: SQL marker predicate for the as-of join (rewritten to the
    // AsOfJoin node by RewriteAsOfMarkerJoin; Unevaluable if left in place)
    registerIfAbsent("asof_match") {
      reg.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("asof_match"),
        graft.plans.AsOfMatch.info,
        graft.plans.AsOfMatch.builder)
    }
    // Custom whole-operator extension (as-of join): strategy plans the
    // logical node, rules rewrite the SQL marker join and push left-side
    // filters / prune columns through it. experimental methods are the
    // runtime-session analog of GraftExtensions' inject*.
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(graft.plans.RewriteAsOfMarkerJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.RewriteAsOfMarkerJoin
    if (!exp.extraOptimizations.contains(graft.plans.PushFilterThroughAsOfJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.PushFilterThroughAsOfJoin
    if (!exp.extraOptimizations.contains(graft.plans.PruneColumnsThroughAsOfJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.PruneColumnsThroughAsOfJoin
    if (!exp.extraOptimizations.contains(graft.plans.RewriteBinnedRangeJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.RewriteBinnedRangeJoin
    spark
  }

  /** The safety blocklist behind `blocklist_match` — deliberately tiny:
    * one common token, one absent token (the no-match path), one phrase
    * (the Aho-Corasick tier). */
  val BlocklistTerms: Seq[String] = Seq("slow", "broken", "slow merge")

  /** Fan a small scan out to the session's parallelism before a per-row
    * compute-bound stage (regex chains, minhash/simhash folds). The testdata
    * parquet is written as ONE row group, which Spark cannot split — without
    * this, every signature/regex pass runs in a single task no matter how
    * many cores the session has. At real scale, multi-row-group files split
    * by `spark.sql.files.maxPartitionBytes` and this shuffle would be a
    * no-op to remove; the 5000-row exchange here costs microseconds and buys
    * cores× parallelism. Apply AFTER pushable filters, never between a scan
    * and its predicate. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Events with ts bucketed to whole seconds — convenience for queries whose
    * compared output includes a time column (sub-second precision differs in
    * representation between engines; whole seconds are unambiguous). */
  def eventsSec(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(s, d).withColumn("ts_sec", date_trunc("second", org.apache.spark.sql.functions.col("ts")))
  }
}
