package graft

import org.apache.spark.sql.functions._

/** S1/T1 combined: the paginated DSv2 source as a rate-limited STREAM —
  * micro-batches admit pagesPerBatch pages each, all pages arrive exactly
  * once, and a restart from the checkpoint resumes at the first unfetched
  * page instead of refetching. */
class PageStreamSpec extends SparkSpec {

  test("streaming pages: admission control paces batches; every page arrives once") {
    val df = spark.readStream.format("graft.sources.PageSource")
      .option("pages", "6").option("pagesPerBatch", "2").load()
    val q = df.writeStream.format("memory").queryName("t_pages")
      .outputMode("append").start()
    q.processAllAvailable()
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    val got = spark.table("t_pages")
    assert(got.count() == 360, "6 pages x 60 rows, each exactly once")
    assert(got.select(countDistinct(col("page"))).collect().head.getLong(0) == 6)
    assert(progress.length == 3, s"2 pages per batch over 6 pages = 3 batches, got ${progress.length}")
    assert(progress.forall(_.numInputRows == 120),
      s"each batch must admit exactly 2 pages: ${progress.map(_.numInputRows).mkString(",")}")
  }

  test("streaming pages: restart from checkpoint resumes, never refetches") {
    val base = java.nio.file.Files.createTempDirectory("graft-pagechk").toString
    def run(pages: Int): Unit = {
      val q = spark.readStream.format("graft.sources.PageSource")
        .option("pages", pages.toString).option("pagesPerBatch", "2").load()
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/chk").outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run(4)
    assert(spark.read.parquet(s"$base/out").count() == 240)
    // more pages appear (the next day's listings); the restarted query
    // must append ONLY pages 4..5 — the checkpointed page offset proves
    // nothing is refetched
    run(6)
    val got = spark.read.parquet(s"$base/out")
    assert(got.count() == 360, s"4 old + 2 new pages, each once: ${got.count()}")
    assert(got.groupBy("page").count().filter(col("count") =!= 60).count() == 0,
      "every page exactly once — no refetch, no loss")
  }
}
