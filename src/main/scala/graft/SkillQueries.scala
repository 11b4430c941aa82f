package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ReferenceTaxonomy, SkillOps}

/** SURVEY.md §2.6 J2 + §2.4 F5–F8: the dictionary/taxonomy pipeline — the
  * reference's core capability — over `documents.text`.
  */
object SkillQueries {
  import Tables._

  /** Shared oracle SQL fragments: the taxonomy as VALUES lists, kept in one
    * place so Spark code and oracle can never drift apart. */
  private def taxValues: String =
    SkillOps.taxonomyRows
      .map { case (t, c, p) => s"('$t', '$c', $p)" }
      .mkString(", ")

  private def varValues: String =
    SkillOps.variations.map { case (v, c) => s"('$v', '$c')" }.mkString(", ")

  private def stopList: String =
    SkillOps.stopwords.map(t => s"'$t'").mkString(", ")

  /** Oracle CTEs: distinct (doc_id, term) matches = single-word token joins
    * UNION multi-word word-boundary regex matches. */
  private def matchesCte: String =
    s"""tax(term, category, priority) AS (VALUES $taxValues),
       |toks AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |         FROM documents),
       |matches AS (
       |  SELECT DISTINCT doc_id, term FROM (
       |    SELECT t.doc_id, x.term FROM toks t
       |    JOIN (SELECT DISTINCT term FROM tax WHERE term NOT LIKE '% %') x
       |      ON t.tok = x.term
       |    UNION ALL
       |    SELECT d.doc_id, x.term FROM documents d
       |    JOIN (SELECT DISTINCT term FROM tax WHERE term LIKE '% %') x
       |      ON regexp_matches(lower(d.text), '\\b' || x.term || '\\b')))""".stripMargin

  // ---- J2 join_broadcast_lookup: first-match-wins category resolution ------

  private def broadcastLookup(s: SparkSession, d: String): DataFrame =
    SkillOps.resolvedCategories(s).orderBy("term")

  private val broadcastLookupSql =
    s"""WITH tax(term, category, priority) AS (VALUES $taxValues)
       |SELECT term, arg_min(category, priority) AS category
       |FROM tax GROUP BY term ORDER BY term""".stripMargin

  // ---- F6 dict_term_match: docs-per-term frequency -------------------------

  private def dictTermMatch(s: SparkSession, d: String): DataFrame =
    SkillOps.matches(s, fanOut(documents(s, d)))
      .groupBy("term")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("term")

  private val dictTermMatchSql =
    s"""WITH $matchesCte
       |SELECT term, count(*) AS n_docs FROM matches
       |GROUP BY term ORDER BY term""".stripMargin

  // ---- F6 v2: dict_term_match_gen (custom Generator, one pass) -------------

  /** Same semantics and oracle as dict_term_match, computed by the custom
    * [[graft.functions.TermMatchGenerator]]: O(tokens) per document instead
    * of O(terms) join work — the SURVEY §2.4 F6 "v2 perf" path. */
  private def dictTermMatchGen(s: SparkSession, d: String): DataFrame =
    fanOut(documents(s, d))
      .selectExpr("doc_id", "term_match(text) AS term")
      .groupBy("term")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("term")

  // ---- flagship: skill_category_counts -------------------------------------

  /** The reference pipeline end-to-end (SURVEY.md §7.2 slice 0): candidate
    * skills = non-stopword tokens; taxonomy-resolved category with
    * first-match-wins; unmatched → 'Other' (scraper.py:20); count distinct
    * (doc, skill) pairs per category. */
  private def categoryCounts(s: SparkSession, d: String): DataFrame = {
    // array_distinct before explode = per-doc set semantics without a
    // post-explode distinct() shuffle (same trick as SkillOps.matches).
    val candidates = fanOut(documents(s, d))
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), "\\s+"))).as("term"))
      .filter(!col("term").isin(SkillOps.stopwords: _*))
    candidates
      .join(broadcast(SkillOps.resolvedCategories(s)), Seq("term"), "left_outer")
      .select(col("doc_id"), coalesce(col("category"), lit("Other")).as("category"))
      .groupBy("category")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("category"))
  }

  private val categoryCountsSql =
    s"""WITH tax(term, category, priority) AS (VALUES $taxValues),
       |resolved AS (SELECT term, arg_min(category, priority) AS category
       |             FROM tax GROUP BY term),
       |cand AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS term
       |         FROM documents),
       |labeled AS (
       |  SELECT c.doc_id, coalesce(r.category, 'Other') AS category
       |  FROM cand c LEFT JOIN resolved r ON c.term = r.term
       |  WHERE c.term NOT IN ($stopList))
       |SELECT category, count(*) AS cnt FROM labeled
       |GROUP BY category ORDER BY cnt DESC, category""".stripMargin

  // ---- flagship v2: the REAL reference dictionary --------------------------

  /** DuckDB single-quoted-literal escaping: the ONLY escape in that dialect
    * is the doubled quote ('' → '); backslashes are literal characters.
    * SqlLiteralProps pins the round-trip on adversarial input. */
  private[graft] def sqlEsc(x: String): String = x.replace("'", "''")

  /** Regex-metachar escaping in the Java∩RE2 common dialect (the oracle's
    * regexp_matches runs RE2; Spark-side matching runs java.util.regex).
    * SqlLiteralProps pins literal-match behavior on adversarial terms. */
  private[graft] def regexLit(t: String): String =
    t.replaceAll("([.*+?^${}()|\\[\\]\\\\])", "\\\\$1")

  /** The full 348-term taxonomy as a VALUES list — generated from the SAME
    * Seq the Spark query uses, so dict and oracle can never drift. */
  private def refTaxValues: String =
    ReferenceTaxonomy.taxonomyRows
      .map { case (t, c, p) => s"('${sqlEsc(t)}', '${sqlEsc(c)}', $p)" }
      .mkString(", ")

  /** Multi-word terms with their word-boundary regex built DRIVER-side (the
    * same escaping [[SkillOps.matchesWith]] applies) — embedding the final
    * pattern string sidesteps SQL-dialect escape differences. */
  private def refMultiPatterns: String =
    ReferenceTaxonomy.allTerms.filter(_.contains(" ")).map { t =>
      s"('${sqlEsc(t)}', '${sqlEsc("\\b" + regexLit(t) + "\\b")}')"
    }.mkString(", ")

  /** skill_category_counts over the reference's REAL 16-category / 348-term
    * dictionary (pracuj_scraper.py:25-42): distinct (doc, term) matches
    * resolved first-match-wins, counted per category. Same engine
    * ([[SkillOps.matchesWith]] + [[SkillOps.resolvedWith]]), real dict. */
  private def categoryCountsRef(s: SparkSession, d: String): DataFrame = {
    val tax = s.createDataFrame(ReferenceTaxonomy.taxonomyRows)
      .toDF("term", "category", "priority")
    SkillOps.matchesWith(s, fanOut(documents(s, d)), ReferenceTaxonomy.allTerms)
      .join(broadcast(SkillOps.resolvedWith(tax)), Seq("term"))
      .groupBy("category")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("term")).as("n_terms"))
      .orderBy(col("cnt").desc, col("category"))
  }

  private def categoryCountsRefSql: String =
    s"""WITH tax(term, category, priority) AS (VALUES $refTaxValues),
       |multi(term, pattern) AS (VALUES $refMultiPatterns),
       |toks AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |         FROM documents),
       |matches AS (
       |  SELECT DISTINCT doc_id, term FROM (
       |    SELECT t.doc_id, x.term FROM toks t
       |    JOIN (SELECT DISTINCT term FROM tax WHERE term NOT LIKE '% %') x
       |      ON t.tok = x.term
       |    UNION ALL
       |    SELECT d.doc_id, m.term FROM documents d
       |    JOIN multi m ON regexp_matches(lower(d.text), m.pattern))),
       |resolved AS (SELECT term, arg_min(category, priority) AS category
       |             FROM tax GROUP BY term)
       |SELECT r.category, count(*) AS cnt, count(DISTINCT mt.term) AS n_terms
       |FROM matches mt JOIN resolved r ON mt.term = r.term
       |GROUP BY r.category ORDER BY cnt DESC, category""".stripMargin

  // ---- F7 canonicalize_skills: additive variations -------------------------

  /** Distinct (doc, skill) where skill = raw matched term PLUS the canonical
    * name for variation matches (additive, pracuj_scraper.py:216-227) —
    * "sort merge" in a doc contributes both "sort merge" and "sort". */
  private def canonicalize(s: SparkSession, d: String): DataFrame =
    // one pass: left-join the variations dim, then fan each match out to
    // {raw term, canonical-or-null} — a self-union would re-execute the
    // whole matches subtree twice.
    SkillOps.matches(s, fanOut(documents(s, d)))
      .join(broadcast(SkillOps.variationsDf(s)),
        col("term") === col("variation"), "left_outer")
      .select(col("doc_id"),
        explode(array_compact(array(col("term"), col("canonical")))).as("skill"))
      .distinct()
      .groupBy("skill")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("skill")

  private val canonicalizeSql =
    s"""WITH $matchesCte,
       |vars(variation, canonical) AS (VALUES $varValues),
       |skills AS (
       |  SELECT DISTINCT doc_id, skill FROM (
       |    SELECT doc_id, term AS skill FROM matches
       |    UNION ALL
       |    SELECT m.doc_id, v.canonical AS skill
       |    FROM matches m JOIN vars v ON m.term = v.variation))
       |SELECT skill, count(*) AS n_docs FROM skills
       |GROUP BY skill ORDER BY skill""".stripMargin

  // ---- S? skills_cascade: the 3-tier extraction fallback -------------------

  /** The reference's tiered skills extraction end-to-end
    * (pracuj_scraper.py:153-181): synthesize a detail page per document
    * whose sections force a specific tier by doc_id % 3, then run the real
    * cascade expressions over the HTML.
    *
    *  - %3 == 0: dedicated skills ul has 2 items → tier 1; the bullet
    *    section carries dictionary-term DECOYS that must NOT surface
    *    (proves the short-circuit).
    *  - %3 == 1: dedicated ul has 1 item (< 2) → bullets matched → tier 2.
    *  - %3 == 2: bullets carry no dictionary terms → full page text → tier 3.
    *
    * The oracle computes the expected (tier, skills) arithmetically from
    * doc_id — fully independent of the HTML/regex chain under test. */
  private def skillsCascade(s: SparkSession, d: String): DataFrame = {
    val t = col("doc_id") % 3
    val skillsUl = when(t === 0, lit(
      "<ul data-test=\"aggregate-open-dictionary-model\">" +
        "<li class=\"catru5k\">spark</li><li class=\"catru5k\">sort merge</li></ul>"))
      .otherwise(lit(
        "<ul data-test=\"aggregate-open-dictionary-model\">" +
          "<li class=\"catru5k\">query</li></ul>"))
    val bulletsUl = when(t === 1, lit(
      "<ul data-test=\"aggregate-bullet-model\">" +
        "<li class=\"tkzmjn3\">needs spark and join daily</li></ul>"))
      .when(t === 2, lit(
        "<ul data-test=\"aggregate-bullet-model\">" +
          "<li class=\"tkzmjn3\">nothing relevant listed</li></ul>"))
      .otherwise(lit(
        "<ul data-test=\"aggregate-bullet-model\">" +
          "<li class=\"tkzmjn3\">decoy merge and filter words</li></ul>"))
    val body = when(t === 2,
      lit("<p>team works with vector and stream pipelines</p>"))
      .otherwise(lit("<p>generic body copy</p>"))
    val html = concat(lit("<html>"), skillsUl, bulletsUl, body, lit("</html>"))
    val (tier, skills) = SkillOps.cascadeSkills(col("html"))
    fanOut(documents(s, d))
      .select(col("doc_id"), html.as("html"))
      .select(col("doc_id"), tier.as("tier"), skills.as("skills"))
      .orderBy("doc_id")
  }

  private val skillsCascadeSql =
    """SELECT doc_id,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END AS INTEGER) AS tier,
      |  CASE doc_id % 3
      |    WHEN 0 THEN 'sort,sort merge,spark'
      |    WHEN 1 THEN 'join,query,spark'
      |    ELSE 'query,stream,vector' END AS skills
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- ref_daily_e2e: the reference's whole daily run as ONE lineage -------

  /** The reference's timer-triggered daily pipeline (SURVEY §3.1 —
    * scrape → SELECT-before-INSERT dedup → skills extraction → category
    * aggregates; __init__.py:25 → scraper.py:56-70 → database.py:116-123)
    * as ONE lazy DataFrame lineage, the way §3.1's Spark mapping promises.
    * Stage in, stage out: today's scrape (all docs — a re-scrape overlaps
    * yesterday's listings) anti-joins the standing table (doc_id % 7 ≠ 0,
    * the rows prior runs inserted) — the reference's per-job existence
    * probe become ONE set-wise anti join; only the NEW docs flow into the
    * dictionary match (token hash-join + Aho-Corasick multi-word pass) and
    * the first-match-wins category rollup that feeds the dashboard. No
    * intermediate materialization: Catalyst plans the gate, the match and
    * the aggregate as one job — the whole daily run is a single query. */
  private def refDailyE2e(s: SparkSession, d: String): DataFrame = {
    val todays = fanOut(documents(s, d))
    val standing = todays.filter(col("doc_id") % 7 =!= 0).select("doc_id")
    val newDocs = todays.join(standing, Seq("doc_id"), "left_anti")
    SkillOps.matches(s, newDocs)
      .join(broadcast(SkillOps.resolvedCategories(s)), Seq("term"))
      .groupBy("category")
      .agg(countDistinct(col("doc_id")).as("n_new_docs"),
        count(lit(1)).as("n_matches"))
      .orderBy("category")
  }

  private val refDailyE2eSql =
    s"""WITH tax(term, category, priority) AS (VALUES $taxValues),
       |newdocs AS (SELECT * FROM documents WHERE doc_id % 7 = 0),
       |toks AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |         FROM newdocs),
       |matches AS (
       |  SELECT DISTINCT doc_id, term FROM (
       |    SELECT t.doc_id, x.term FROM toks t
       |    JOIN (SELECT DISTINCT term FROM tax WHERE term NOT LIKE '% %') x
       |      ON t.tok = x.term
       |    UNION ALL
       |    SELECT d.doc_id, x.term FROM newdocs d
       |    JOIN (SELECT DISTINCT term FROM tax WHERE term LIKE '% %') x
       |      ON regexp_matches(lower(d.text), '\\b' || x.term || '\\b'))),
       |resolved AS (SELECT term, arg_min(category, priority) AS category
       |             FROM tax GROUP BY term)
       |SELECT r.category, count(DISTINCT m.doc_id) AS n_new_docs,
       |       count(*) AS n_matches
       |FROM matches m JOIN resolved r ON m.term = r.term
       |GROUP BY 1 ORDER BY category""".stripMargin

  // ---- N40 assoc_rules: market-basket association rules --------------------

  /** `assoc_rules`: association rules over the per-document matched-skill
    * baskets — the "which skills predict which" analysis the reference's
    * dashboards imply over its Skills fact table (database.py:80-88). For
    * every co-occurring term pair with support ≥ MinSupDocs, both directed
    * rules a→b with confidence n_ab/n_a and lift N·n_ab/(n_a·n_b).
    *
    * Determinism: confidence and lift are each ONE IEEE-754 division of
    * exactly-represented integers (counts and their products ≪ 2^53), so
    * they hash identically cross-engine with no rounding step.
    *
    * Scale shape (100 TB): the dictionary match runs ONCE — matches
    * shuffle onto doc_id into per-doc sorted baskets, and pairs explode
    * MAP-SIDE from each basket (Σ per-doc k², bounded by the 348-term
    * dictionary, never docs²) — no self-join, so the match pass is not
    * recomputed per join side (r07 plan audit found it running 3×). Items
    * and pairs both grow from the same doc_id Exchange (ReuseExchange);
    * pair support is one keyed agg; the item-count joins at the end are
    * broadcast (≤ 348 rows). The support filter runs BEFORE the rule
    * fan-out, so low-support pairs never leave the agg. */
  private val MinSupDocs = 20

  private def assocRules(s: SparkSession, d: String): DataFrame = {
    val m = SkillOps.matches(s, fanOut(documents(s, d))).select("doc_id", "term")
    val nDocs = documents(s, d).count() // scalar constant, dimension-sized
    // localCheckpoint makes the single-match-pass guarantee STRUCTURAL:
    // baskets (doc_id + ≤348-term sorted array, corpus-row-count rows, text
    // column already dropped) materialize once, and neither the items nor
    // the pairs branch can re-run the Aho-Corasick scan even when AQE
    // exchange reuse doesn't fire (r08 driver context never confirmed it).
    val baskets = m.groupBy("doc_id")
      .agg(sort_array(collect_set(col("term"))).as("ts"))
      .localCheckpoint(false)
    val items = baskets.select(explode(col("ts")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n_item"))
    // per-basket ordered pairs (t1 < t2 by the sorted array's order), built
    // with HOFs so the fan-out never leaves the map side
    val pairsArr = flatten(transform(col("ts"), (t1, i) =>
      transform(slice(col("ts"), i + lit(2), size(col("ts"))),
        t2 => struct(t1.as("t1"), t2.as("t2")))))
    val pairs = baskets
      .select(explode(pairsArr).as("p"))
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= MinSupDocs)
    val rules = pairs.select(col("t1").as("ante"), col("t2").as("cons"), col("n_pair"))
      .unionAll(pairs.select(col("t2"), col("t1"), col("n_pair")))
    rules
      .join(broadcast(items.select(col("term").as("ante"), col("n_item").as("n_ante"))), "ante")
      .join(broadcast(items.select(col("term").as("cons"), col("n_item").as("n_cons"))), "cons")
      .select(col("ante"), col("cons"), col("n_pair"),
        (col("n_pair").cast("double") / col("n_ante").cast("double")).as("confidence"),
        ((lit(nDocs) * col("n_pair")).cast("double") /
          (col("n_ante") * col("n_cons")).cast("double")).as("lift"))
      .orderBy("ante", "cons")
  }

  private val assocRulesSql =
    s"""WITH $matchesCte,
       |items AS (SELECT term, count(*) AS n_item FROM matches GROUP BY term),
       |pairs AS (
       |  SELECT a.term AS t1, b.term AS t2, count(*) AS n_pair
       |  FROM matches a JOIN matches b
       |    ON a.doc_id = b.doc_id AND a.term < b.term
       |  GROUP BY 1, 2 HAVING count(*) >= $MinSupDocs),
       |rules AS (
       |  SELECT t1 AS ante, t2 AS cons, n_pair FROM pairs
       |  UNION ALL SELECT t2, t1, n_pair FROM pairs)
       |SELECT r.ante, r.cons, r.n_pair,
       |  CAST(r.n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS confidence,
       |  CAST((SELECT count(*) FROM documents) * r.n_pair AS DOUBLE)
       |    / CAST(ia.n_item * ic.n_item AS DOUBLE) AS lift
       |FROM rules r
       |JOIN items ia ON r.ante = ia.term
       |JOIN items ic ON r.cons = ic.term
       |ORDER BY r.ante, r.cons""".stripMargin

  // ---- registry ------------------------------------------------------------

  def all: Seq[(String, Q)] = Seq(
    "assoc_rules" -> Q(assocRules, Some(assocRulesSql)),
    "ref_daily_e2e" -> Q(refDailyE2e, Some(refDailyE2eSql)),
    "join_broadcast_lookup" -> Q(broadcastLookup, Some(broadcastLookupSql)),
    "dict_term_match" -> Q(dictTermMatch, Some(dictTermMatchSql)),
    "dict_term_match_gen" -> Q(dictTermMatchGen, Some(dictTermMatchSql)),
    "skill_category_counts" -> Q(categoryCounts, Some(categoryCountsSql)),
    "skill_category_counts_ref" -> Q(categoryCountsRef, Some(categoryCountsRefSql)),
    "canonicalize_skills" -> Q(canonicalize, Some(canonicalizeSql)),
    "skills_cascade" -> Q(skillsCascade, Some(skillsCascadeSql)),
  )
}
