package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 `TableProvider` for paginated sign pages (SURVEY §4.2: "the
  * one piece of real engine infrastructure"). One InputPartition per page, so
  * page FETCH + PARSE run on executors in parallel — the scale path the
  * driver-side `PagedFetcher` loop can't give.
  *
  * The offset chain is inherently sequential (offset i+1 lives in response
  * i's header, task.ts:60-72), so page *discovery* cannot be distributed; what
  * can is everything after it. Two modes:
  *
  *   - `mode=fixture`: `path=<dir>` of `page-*.json` files; each file is a
  *     partition. Fully parallel discovery (file listing).
  *   - `mode=http`: `baseUrl`, `apiKey`, and `offsets=o1,o2,…` — the offset
  *     tokens from a prior (cheap, body-discarding) discovery walk or from
  *     known cursor arithmetic. Partition 0 fetches with no offset
  *     (task.ts:64-67), partition i+1 with offset oᵢ; each fetch happens on
  *     its executor.
  *
  * Schema is `(page_index INT, body STRING)`: the raw page envelope travels
  * as one row, and feature parsing stays in `from_json`+`explode` expressions
  * (codegen'd, same stage as the scan) via [[CotripSource.fromPageRows]].
  *
  * Registered as `cotrip-pages` (META-INF/services DataSourceRegister).
  */
class CotripPageSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "cotrip-pages"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CotripPageSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    // DSv2 options are case-insensitive by contract — normalize once here
    new CotripPageTable(properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

object CotripPageSource {
  val schema: StructType = StructType(Seq(
    StructField("page_index", IntegerType, nullable = false),
    StructField("body", StringType)))
}

final class CotripPageTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "cotrip_pages"
  override def schema(): StructType = CotripPageSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = CotripPageSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        options.getOrElse("mode", "fixture") match {
          case "fixture" =>
            val dir = new java.io.File(options("path"))
            // numeric page order when the name encodes it (page-1000 must
            // follow page-999, not precede it lexicographically)
            def pageNum(name: String): (Long, String) = {
              val digits = name.stripPrefix("page-").stripSuffix(".json")
              (scala.util.Try(digits.toLong).getOrElse(Long.MaxValue), name)
            }
            val files = Option(dir.listFiles())
              .getOrElse(Array.empty)
              .filter(f => f.getName.startsWith("page-") && f.getName.endsWith(".json"))
              .sortBy(f => pageNum(f.getName))
            files.zipWithIndex.map { case (f, i) =>
              FixturePagePartition(i, f.getAbsolutePath): InputPartition
            }
          case "http" =>
            val offsets: Seq[Option[String]] =
              None +: options.get("offsets").toSeq
                .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(Some(_)))
            offsets.zipWithIndex.map { case (off, i) =>
              HttpPagePartition(i, options("baseurl"), options("apikey"), off): InputPartition
            }.toArray
          case other => throw new IllegalArgumentException(s"unknown mode: $other")
        }
      }
      override def createReaderFactory(): PartitionReaderFactory = new PagePartitionReaderFactory
    }
}

final case class FixturePagePartition(index: Int, file: String) extends InputPartition
final case class HttpPagePartition(index: Int, baseUrl: String, apiKey: String,
                                   offset: Option[String]) extends InputPartition

final class PagePartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (idx, body) = partition match {
      case FixturePagePartition(i, file) =>
        (i, new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
          java.nio.charset.StandardCharsets.UTF_8))
      case HttpPagePartition(i, baseUrl, apiKey, offset) =>
        // executor-side fetch: this is the distributed half of S1
        (i, new HttpPageClient(baseUrl, apiKey).fetch(offset).body)
      case other => throw new IllegalArgumentException(other.toString)
    }
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = !consumed && { consumed = true; true }
      override def get(): InternalRow =
        InternalRow(idx, UTF8String.fromString(body))
      override def close(): Unit = ()
    }
  }
}
