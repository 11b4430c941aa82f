package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's HTML detail-page extraction layer (pracuj_scraper.py:
  * 316-356) as column expressions: each extractor keys on the same
  * `data-test` attribute the reference's CSS selectors use, via regex over
  * the raw HTML string (no DOM library exists in this environment, and for
  * fixed well-known attributes a regex reaches the same fields; at 100 TB
  * it's also a codegen-friendly single pass instead of a DOM allocation per
  * row).
  *
  * All extractors return "" on no-match, mirroring the reference's
  * empty-string defaults (pracuj_scraper.py:92-100, 325, 332).
  */
object HtmlOps {

  private def tagText(html: Column, dataTest: String): Column =
    regexp_extract(html,
      "data-test=[\"']" + dataTest + "[\"'][^>]*>([^<]*)<", 1)

  /** h1[data-test='text-positionName'] (pracuj_scraper.py:324-325). */
  def positionName(html: Column): Column = tagText(html, "text-positionName")

  /** h2[data-test='text-employerName'] — direct text only, nested tags cut
    * (pracuj_scraper.py:328-332): the capture stops at the first child tag. */
  def employerName(html: Column): Column = tagText(html, "text-employerName")

  /** div[data-test='text-earningAmount'] (pracuj_scraper.py salary section). */
  def earningAmount(html: Column): Column = tagText(html, "text-earningAmount")

  /** Benefit badge by section name (pracuj_scraper.py:102,143-145). */
  def badge(html: Column, section: String): Column =
    tagText(html, s"sections-benefit-$section")

  /** All skills from ul[data-test='aggregate-open-dictionary-model'] items
    * (pracuj_scraper.py:158-161) as an array of item texts. */
  def skillItems(html: Column): Column = {
    val ul = regexp_extract(html,
      "(?s)data-test=[\"']aggregate-open-dictionary-model[\"'].*?</ul>", 0)
    // each <li ...>text</li> inside the matched list; the first split
    // element is the pre-<li> preamble — drop it
    transform(
      slice(split(ul, "<li[^>]*>"), 2, 10000),
      item => regexp_extract(item, "^([^<]*)", 1))
  }

  /** Description-bullet texts from ul[data-test='aggregate-bullet-model']
    * items, joined with ' ' (pracuj_scraper.py:167-171 — the cascade's
    * tier-2 input). */
  def bulletText(html: Column): Column = {
    val ul = regexp_extract(html,
      "(?s)data-test=[\"']aggregate-bullet-model[\"'].*?</ul>", 0)
    array_join(transform(
      slice(split(ul, "<li[^>]*>"), 2, 10000),
      item => regexp_extract(item, "^([^<]*)", 1)), " ")
  }

  /** All visible text with tags stripped — the soup.get_text() analog
    * (pracuj_scraper.py:176, the cascade's tier-3 input). */
  def pageText(html: Column): Column =
    regexp_replace(html, "<[^>]*>", " ")

  /** Offer link extraction from a search page: anchors with
    * data-test='link-offer-title' (pracuj_scraper.py:284-286). */
  def offerHrefs(html: Column): Column =
    transform(
      split(html, "<a "),
      a => when(a.contains("data-test=\"link-offer-title\""),
        regexp_extract(a, "href=[\"']([^\"']+)[\"']", 1)).otherwise(lit("")))
}
