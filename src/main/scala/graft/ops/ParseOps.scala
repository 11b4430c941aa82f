package graft.ops

import org.apache.spark.sql.Column
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
