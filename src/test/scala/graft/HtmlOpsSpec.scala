package graft

import org.apache.spark.sql.functions._

import graft.ops.{HtmlOps, ParseOps}

/** FIXTURES.md §B1: synthetic detail/search-page HTML exercising the exact
  * data-test selectors the reference keys on. */
class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private val detailFullHtml =
    """<html><body>
      |<h1 data-test="text-positionName">Data Analyst</h1>
      |<h2 data-test="text-employerName">ACME Corp<span class="x">extra</span></h2>
      |<div data-test="section-salary">
      |  <div data-test="text-earningAmount">12 000–20 000 zł</div>
      |</div>
      |<ul data-test="sections-benefit-list">
      |  <li data-test="sections-benefit-workplaces">Warszawa</li>
      |  <li data-test="sections-benefit-contracts">umowa o pracę</li>
      |  <li data-test="sections-benefit-work-modes-many">praca hybrydowa</li>
      |</ul>
      |<ul data-test="aggregate-open-dictionary-model">
      |  <li class="catru5k">SQL</li>
      |  <li class="catru5k">Python</li>
      |  <li class="catru5k">Power BI</li>
      |</ul>
      |</body></html>""".stripMargin

  private val detailNoBadgesHtml =
    """<html><h1 data-test="text-positionName">Engineer</h1></html>"""

  private val searchPageHtml =
    """<div data-test="section-offers">
      |<a data-test="link-offer-title" href="/praca/x,oferta,900001">A</a>
      |<a data-test="link-offer-title" href="https://pracodawcy.pracuj.pl/company,7">B</a>
      |<a data-test="link-offer-title" href="/praca/y,oferta,900002">C</a>
      |<a class="other" href="/nope">D</a>
      |</div>""".stripMargin

  private def df = Seq(detailFullHtml).toDF("html")

  test("position name via h1[data-test=text-positionName]") {
    assert(df.select(HtmlOps.positionName(col("html"))).head.getString(0) == "Data Analyst")
  }

  test("employer name takes direct text only, nested tags cut") {
    assert(df.select(HtmlOps.employerName(col("html"))).head.getString(0) == "ACME Corp")
  }

  test("salary text extracted then parsed by the salary pipeline") {
    val (mn, mx) = ParseOps.salaryParse(HtmlOps.earningAmount(col("html")))
    val r = df.select(mn, mx).head
    assert((r.getInt(0), r.getInt(1)) == (12000, 20000))
  }

  test("badges by section; absent badges default to empty string") {
    val r = df.select(
      HtmlOps.badge(col("html"), "workplaces"),
      HtmlOps.badge(col("html"), "contracts"),
      HtmlOps.badge(col("html"), "work-schedule")).head
    assert((r.getString(0), r.getString(1), r.getString(2)) ==
      ("Warszawa", "umowa o pracę", ""))
    val none = Seq(detailNoBadgesHtml).toDF("html")
      .select(HtmlOps.badge(col("html"), "workplaces")).head.getString(0)
    assert(none == "")
  }

  test("skills list items from the dedicated dictionary ul") {
    val items = df.select(HtmlOps.skillItems(col("html")))
      .head.getAs[scala.collection.Seq[String]](0).filter(_.trim.nonEmpty)
    assert(items.toSeq == Seq("SQL", "Python", "Power BI"))
  }

  test("search page: offer links extracted, employer-profile links filterable") {
    val hrefs = Seq(searchPageHtml).toDF("html")
      .select(explode(HtmlOps.offerHrefs(col("html"))).as("href"))
      .filter(col("href") =!= "")
      .filter(!ParseOps.isEmployerLink(col("href")))
      .select(ParseOps.jobIdFromUrl(col("href")).as("id"))
      .collect().map(_.getString(0)).toSeq
    assert(hrefs == Seq("900001", "900002"))
  }
}
