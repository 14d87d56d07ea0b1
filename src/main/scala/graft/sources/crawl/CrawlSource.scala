package graft.sources.crawl

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table for the crawl source (reference op S8,
  * `procedure_code.py:541-549`): the page fetch as a first-class
  * `spark.read.format("graft-crawl")` relation instead of an opaque
  * `mapPartitions`, so crawled pages compose with the rest of the query
  * surface (filters, joins, the E20 parse projection) and the scheduler
  * sees fetch parallelism as ordinary partitions.
  *
  * Options:
  *  - `codes`      comma-separated work list (required)
  *  - `fixtures`   directory of `<code>.html` files backing the fetch —
  *                 the offline mode this environment runs; a production
  *                 deployment would plug an HTTP/browser fetcher into
  *                 [[CrawlPartitionReader]] the same way
  *  - `partitions` fetch parallelism (default 4) — the number of
  *                 concurrent sessions, i.e. the politeness bound
  *                 (SURVEY §7.3)
  *
  * Schema: `code string, html string` (missing fixture → canned 404 page,
  * matching the site's behavior for unknown codes).
  */
class CrawlTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-crawl"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CrawlTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CrawlTable(properties.getOrDefault("codes", ""),
      Option(properties.get("fixtures")),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object CrawlTable {
  val Schema: StructType = StructType(Seq(
    StructField("code", StringType, nullable = false),
    StructField("html", StringType, nullable = true)))
}

final class CrawlTable(codesCsv: String, fixtures: Option[String], partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-crawl(${codesCsv.take(40)})"
  override def schema(): StructType = CrawlTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = CrawlTable.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val codes = codesCsv.split(",").map(_.trim).filter(_.nonEmpty)
        val n = math.max(1, math.min(partitions, codes.length))
        codes.grouped(math.ceil(codes.length.toDouble / n).toInt.max(1))
          .map(g => CrawlInputPartition(g, fixtures): InputPartition).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) =>
          new CrawlPartitionReader(partition.asInstanceOf[CrawlInputPartition])
    }
}

final case class CrawlInputPartition(codes: Array[String], fixtures: Option[String])
    extends InputPartition

/** One fetch session per partition (E22 semantics): the session opens on
  * the executor at reader construction, never serialized from the driver.
  */
final class CrawlPartitionReader(partition: CrawlInputPartition)
    extends PartitionReader[InternalRow] {
  private val it = partition.codes.iterator
  private var current: InternalRow = _

  private def fetch(code: String): String = partition.fixtures match {
    case Some(dir) =>
      val f = new java.io.File(dir, s"$code.html")
      if (f.exists()) new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      else """<html><body><div class="container404">404</div></body></html>"""
    case None =>
      throw new UnsupportedOperationException(
        "no live fetcher in this environment — pass the 'fixtures' option")
  }

  override def next(): Boolean =
    if (it.hasNext) {
      val code = it.next()
      current = InternalRow(UTF8String.fromString(code),
        UTF8String.fromString(fetch(code)))
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = () // session teardown (E21/E22 close)
}
