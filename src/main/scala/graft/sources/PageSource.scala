package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY.md §2.1 S1: the reference's paginated HTTP scan
  * (pracuj_scraper.py:359-425 — `&pn={page}` pages of 60 listings) as a real
  * DataSource V2 `TableProvider`: one InputPartition per page (the unit the
  * reference fetches), a PartitionReader that synthesizes the page's
  * listings deterministically (no network in this environment — the page
  * *content* is a deterministic fake, the source *plumbing* is real), and
  * column pruning pushed into the reader.
  *
  * Usage: spark.read.format("graft.sources.PageSource").option("pages", n).load()
  */
class PageSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PageSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PageTable(properties.getOrDefault("pages", "3").toInt,
      properties.getOrDefault("pagesPerBatch", "1").toInt)
}

object PageSource {
  val PerPage = 60 // EXPECTED_PER_PAGE, pracuj_scraper.py:16

  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("job_id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("salary_text", StringType, nullable = false)))

  /** Deterministic listing content for global row number g. */
  def jobId(g: Int): String = (1000000 + g).toString
  def title(g: Int): String = s"offer-$g"
  def salaryText(g: Int): String = {
    val a = 3000 + (g % 170) * 100
    val h = 100 + g % 50
    g % 3 match {
      case 0 => s"$a zł"
      case 1 => s"$a–${a + 2000} zł"
      case _ => s"$h,50-${h + 20},50 zł/h"
    }
  }
}

class PageTable(pages: Int, pagesPerBatch: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_pages($pages)"
  override def schema(): StructType = PageSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PageScanBuilder(pages, pagesPerBatch)
}

/** Column pruning AND filter pushdown: predicates on `page` prune whole
  * InputPartitions at PLANNING time — the reference never fetches a page it
  * doesn't need (its pagination loop stops at the requested range), and
  * neither does this scan. Page predicates are fully absorbed (partition
  * pruning implements them exactly), so nothing is re-evaluated post-scan;
  * all other predicates are left to Spark. */
class PageScanBuilder(pages: Int, pagesPerBatch: Int = 1)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = PageSource.schema
  private var lo = 0
  private var hi = pages - 1
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def asInt(v: Any): Option[Int] = v match {
    case n: Number =>
      // only absorb the filter when the comparison value is integral and
      // fits Int exactly — Number.intValue silently truncates (page >
      // 5000000000L would wrap to a bogus int), and a fully-absorbed
      // filter is never re-evaluated by Spark, so truncation here would
      // return wrong rows rather than just losing the pushdown
      val l = n.longValue()
      if (n.doubleValue() == l.toDouble && l == l.toInt.toLong) Some(l.toInt)
      else None
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("page", v) => asInt(v).isDefined
      case GreaterThan("page", v) => asInt(v).isDefined
      case GreaterThanOrEqual("page", v) => asInt(v).isDefined
      case LessThan("page", v) => asInt(v).isDefined
      case LessThanOrEqual("page", v) => asInt(v).isDefined
      case _ => false
    }
    supported.foreach {
      case EqualTo("page", v) =>
        lo = math.max(lo, asInt(v).get); hi = math.min(hi, asInt(v).get)
      case GreaterThan("page", v) => lo = math.max(lo, asInt(v).get + 1)
      case GreaterThanOrEqual("page", v) => lo = math.max(lo, asInt(v).get)
      case LessThan("page", v) => hi = math.min(hi, asInt(v).get - 1)
      case LessThanOrEqual("page", v) => hi = math.min(hi, asInt(v).get)
      case _ => ()
    }
    pushed = supported
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new PageScan(lo, hi, pagesPerBatch, required)
}

class PageScan(lo: Int, hi: Int, pagesPerBatch: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft pages=$lo..$hi cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    (lo to hi).map(p => PagePartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new PageMicroBatch(lo, hi, pagesPerBatch, required)
}

/** The paginated scan as a STREAMING source: offsets are page numbers, each
  * micro-batch admits at most `pagesPerBatch` new pages — the polite-crawl
  * rate limiting of the reference's fetch loop (base_scraper.py's
  * delay-between-pages), expressed through Spark's admission-control
  * contract instead of sleeps. Restart-safe by construction: offsets are
  * plain page numbers, so a checkpointed query resumes at the first
  * unfetched page. */
class PageOffset(val page: Int) extends streaming.Offset {
  override def json(): String = page.toString
}

class PageMicroBatch(lo: Int, hi: Int, pagesPerBatch: Int, required: StructType)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl {

  override def initialOffset(): streaming.Offset = new PageOffset(lo)

  override def deserializeOffset(json: String): streaming.Offset =
    new PageOffset(json.toInt)

  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(pagesPerBatch.toLong * PageSource.PerPage)

  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used with admission control")

  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    val from = start.asInstanceOf[PageOffset].page
    new PageOffset(math.min(from + pagesPerBatch, hi + 1))
  }

  override def reportLatestOffset(): streaming.Offset = new PageOffset(hi + 1)

  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] =
    (start.asInstanceOf[PageOffset].page until end.asInstanceOf[PageOffset].page)
      .map(p => PagePartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(required)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

case class PagePartition(page: Int) extends InputPartition

class PageReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[PagePartition].page, required)
}

class PageReader(page: Int, required: StructType)
    extends PartitionReader[InternalRow] {
  private var i = -1

  override def next(): Boolean = { i += 1; i < PageSource.PerPage }

  override def get(): InternalRow = {
    val g = page * PageSource.PerPage + i
    val values = required.fieldNames.map {
      case "page" => page
      case "idx" => i
      case "job_id" => UTF8String.fromString(PageSource.jobId(g))
      case "title" => UTF8String.fromString(PageSource.title(g))
      case "salary_text" => UTF8String.fromString(PageSource.salaryText(g))
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
