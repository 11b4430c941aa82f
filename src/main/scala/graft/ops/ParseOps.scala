package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's parse layer (its densest real logic) re-expressed as pure
  * Spark column expressions — no UDFs, so everything stays inside whole-stage
  * codegen and Catalyst can push/fold around it (SURVEY.md §2.4).
  */
object ParseOps {

  /** F1 salary normalization (pracuj_scraper.py:44-84): strip NBSP/&nbsp;/
    * whitespace, detect hourly (`zł/h`, `zł/godz`), whitelist `[0-9,.–-]`,
    * match `lo–hi` range else single value, comma→dot decimals, hourly ×160,
    * truncate to int monthly PLN. Returns (min, max), nulls when unparseable.
    */
  def salaryParse(c: Column): (Column, Column) = {
    val cleaned = regexp_replace(c, " |&nbsp;|\\s", "")
    val hourly = cleaned.contains("zł/h") || cleaned.contains("zł/godz")
    val kept = regexp_replace(cleaned, "[^0-9,.–-]", "")
    val num = "(\\d+(?:[.,]\\d+)?)"
    val lo = regexp_extract(kept, s"^$num[–-]$num$$", 1)
    val hi = regexp_extract(kept, s"^$num[–-]$num$$", 2)
    val single = regexp_extract(kept, s"^$num$$", 1)
    def toMonthly(sCol: Column): Column = {
      val v = regexp_replace(sCol, ",", ".").cast("double")
      when(sCol === "", lit(null).cast("int"))
        .otherwise(when(hourly, floor(v * 160)).otherwise(floor(v)).cast("int"))
    }
    (toMonthly(when(lo =!= "", lo).otherwise(single)),
      toMonthly(when(hi =!= "", hi).otherwise(single)))
  }

  /** [[salaryParse]] STAGED for once-per-row evaluation (r15, guide §4 +
    * §1.2 "per-task work"). Calling `salaryParse(text)` inlines `text` and
    * every parse intermediate into both output expression trees at DSL
    * build time: `salary_parse`'s physical Project carried 110
    * regexp_replace + 18 regexp_extract + 66 format_number NODES for what
    * is logically ~7 regex calls per row (plans/r15/salary_parse_before
    * .txt), and codegen subexpression elimination cannot rescue copies
    * living in different CASE branches. Staging each intermediate as its
    * own column in its own Project keeps them separate (CollapseProject
    * never inlines a multi-referenced non-cheap producer), so whole-stage
    * codegen evaluates each exactly once per row. Same expressions, same
    * values — shared instead of copied; appends `minName`/`maxName` int
    * columns. */
  def withSalaryParsed(df: DataFrame, text: Column,
      minName: String, maxName: String): DataFrame = {
    val num = "(\\d+(?:[.,]\\d+)?)"
    val staged = df
      .withColumn("_sp_cleaned", regexp_replace(text, " |&nbsp;|\\s", ""))
      .withColumn("_sp_kept",
        regexp_replace(col("_sp_cleaned"), "[^0-9,.–-]", ""))
      .withColumn("_sp_hourly", col("_sp_cleaned").contains("zł/h") ||
        col("_sp_cleaned").contains("zł/godz"))
      .withColumn("_sp_lo", regexp_extract(col("_sp_kept"), s"^$num[–-]$num$$", 1))
      .withColumn("_sp_hi", regexp_extract(col("_sp_kept"), s"^$num[–-]$num$$", 2))
      .withColumn("_sp_single", regexp_extract(col("_sp_kept"), s"^$num$$", 1))
    def toMonthly(sCol: Column): Column = {
      val v = regexp_replace(sCol, ",", ".").cast("double")
      when(sCol === "", lit(null).cast("int"))
        .otherwise(when(col("_sp_hourly"), floor(v * 160))
          .otherwise(floor(v)).cast("int"))
    }
    staged
      .withColumn(minName, toMonthly(
        when(col("_sp_lo") =!= "", col("_sp_lo")).otherwise(col("_sp_single"))))
      .withColumn(maxName, toMonthly(
        when(col("_sp_hi") =!= "", col("_sp_hi")).otherwise(col("_sp_single"))))
      .drop("_sp_cleaned", "_sp_kept", "_sp_hourly",
        "_sp_lo", "_sp_hi", "_sp_single")
  }

  /** F3 years-of-experience: first standalone digit 1–5, else null
    * (pracuj_scraper.py:304-313). */
  def yoeExtract(c: Column): Column = {
    val m = regexp_extract(c, "\\b([1-5])\\b", 1)
    when(m =!= "", m.cast("int"))
  }

  /** F2/S4 link parsing (pracuj_scraper.py:278-301): numeric id from
    * `,oferta,<id>`; stable md5-prefix fallback for malformed URLs (the
    * reference's Python `hash()` fallback is run-nondeterministic — replaced
    * per SURVEY.md §7.4.3). */
  def jobIdFromUrl(url: Column): Column = {
    val id = regexp_extract(url, ",oferta,(\\d+)", 1)
    when(id =!= "", id).otherwise(substring(md5(url), 1, 8))
  }

  /** S4 employer-profile filter (pracuj_scraper.py:294-295). */
  def isEmployerLink(url: Column): Column =
    url.contains("pracodawcy.pracuj.pl")

  /** F4 DDL width truncation (database.py:11-15). */
  def truncateVarchar(c: Column, n: Int): Column = substring(c, 1, n)
}
