package graft

import org.apache.spark.sql.functions._

import graft.ops.ParseOps

/** FIXTURES.md §B2: salary-string cases from pracuj_scraper.py:44-84, plus
  * YoE, link-id, truncation edges. Property tests use a seeded RNG with all
  * cases batched into one DataFrame (one Spark job per property).
  */
class ParseOpsSpec extends SparkSpec {
  import spark.implicits._

  private def parseSalaries(texts: Seq[String]): Seq[(Option[Int], Option[Int])] = {
    val df = texts.toDF("t")
    val (mn, mx) = ParseOps.salaryParse(col("t"))
    df.select(mn.as("mn"), mx.as("mx")).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]),
        Option(r.get(1)).map(_.asInstanceOf[Int]))).toSeq
  }

  test("salary: plain range with space thousands") {
    assert(parseSalaries(Seq("12 000–20 000 zł")) == Seq((Some(12000), Some(20000))))
  }

  test("salary: NBSP and &nbsp; thousands separators") {
    assert(parseSalaries(Seq("12 000–20 000 zł", "9&nbsp;500 zł")) ==
      Seq((Some(12000), Some(20000)), (Some(9500), Some(9500))))
  }

  test("salary: hyphen vs en-dash ranges") {
    assert(parseSalaries(Seq("10 000-15 000 zł", "10 000–15 000 zł")) ==
      Seq((Some(10000), Some(15000)), (Some(10000), Some(15000))))
  }

  test("salary: hourly rate with decimal comma scales by 160") {
    // 150,00/h -> 24000; 180,50/h -> 28880
    assert(parseSalaries(Seq("150,00-180,50 zł/h")) == Seq((Some(24000), Some(28880))))
  }

  test("salary: hourly zł/godz variant") {
    assert(parseSalaries(Seq("100,00 zł/godz")) == Seq((Some(16000), Some(16000))))
  }

  test("salary: single value duplicates into both bounds") {
    assert(parseSalaries(Seq("9 500 zł")) == Seq((Some(9500), Some(9500))))
  }

  test("salary: garbage/empty yields nulls") {
    assert(parseSalaries(Seq("Do negocjacji", "")) == Seq((None, None), (None, None)))
  }

  test("salary property: int ranges round-trip; hourly multiplies by 160") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 200).map { _ =>
      val lo = 1 + rnd.nextInt(60000)
      val hi = lo + rnd.nextInt(40000)
      val hourly = rnd.nextBoolean()
      val txt = if (hourly) s"$lo-$hi zł/h" else s"$lo–$hi zł"
      val exp = if (hourly) (Some(lo * 160), Some(hi * 160)) else (Some(lo), Some(hi))
      (txt, exp)
    }
    assert(parseSalaries(cases.map(_._1)) == cases.map(_._2))
  }

  test("salary idempotence-ish: parsing is deterministic across runs") {
    val texts = Seq("12 000–20 000 zł", "150,25 zł/h", "x")
    assert(parseSalaries(texts) == parseSalaries(texts))
  }

  test("yoe: first standalone 1-5 extracted; 0 and 6+ rejected") {
    val got = Seq("wymagane 3 lata", "min 5 lat", "junior 0", "aż 7 lat", "brak")
      .toDF("t").select(ParseOps.yoeExtract(col("t")).as("y"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(Some(3), Some(5), None, None, None))
  }

  test("yoe: digit inside a word does not match") {
    val got = Seq("abc3def").toDF("t")
      .select(ParseOps.yoeExtract(col("t"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("link: oferta id extracted; malformed gets stable md5 fallback") {
    val urls = Seq("https://x.pl/a,oferta,12345", "https://x.pl/weird/7")
    val got = urls.toDF("u").select(ParseOps.jobIdFromUrl(col("u")).as("id"))
      .collect().map(_.getString(0)).toSeq
    assert(got.head == "12345")
    assert(got(1).matches("[0-9a-f]{8}"))
    val again = urls.toDF("u").select(ParseOps.jobIdFromUrl(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(got == again)
  }

  test("employer-profile links are identified for filtering") {
    val got = Seq("https://pracodawcy.pracuj.pl/company,1", "https://www.pracuj.pl/praca/x,oferta,9")
      .toDF("u").select(ParseOps.isEmployerLink(col("u"))).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false))
  }

  test("truncate property: output is a prefix and never exceeds width") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 100).map { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      val n = 1 + rnd.nextInt(30)
      (s, n)
    }
    val outs = cases.zipWithIndex.map { case ((s, n), i) => (i, s, n) }
      .toDF("i", "s", "n")
    // width must be a literal per reference DDL; test the three real widths
    for (w <- Seq(5, 20, 255)) {
      val got = outs.select(col("s"), ParseOps.truncateVarchar(col("s"), w).as("t"))
        .collect()
      got.foreach { r =>
        val (s, t) = (r.getString(0), r.getString(1))
        assert(t.length <= w && s.startsWith(t))
      }
    }
  }
}
