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

  /** Fixture-mode page listing in page order, shared by the batch scan
    * and the micro-batch stream: `page-1000` must follow `page-999`, not
    * precede it lexicographically.
    */
  private[sources] def fixtureFiles(dir: String): Array[java.io.File] = {
    def pageNum(name: String): (Long, String) = {
      val digits = name.stripPrefix("page-").stripSuffix(".json")
      (scala.util.Try(digits.toLong).getOrElse(Long.MaxValue), name)
    }
    Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page-") && f.getName.endsWith(".json"))
      .sortBy(f => pageNum(f.getName))
  }
}

final class CotripPageTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "cotrip_pages"
  override def schema(): StructType = CotripPageSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = CotripPageSource.schema
      override def toBatch: Batch = this
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
        new CotripPageMicroBatchStream(options)
      override def planInputPartitions(): Array[InputPartition] = {
        options.getOrElse("mode", "fixture") match {
          case "fixture" =>
            CotripPageSource.fixtureFiles(options("path")).zipWithIndex.map {
              case (f, i) =>
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

/** Offset = number of pages fully processed (pages are the unit of
  * progress; the chain order is the fixture listing's page order).
  */
final case class CotripPageOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = n.toString
}

/** Structured-Streaming form of the paginated source (SURVEY §2.10 names
  * it as the direct streaming equivalent of the reference's
  * `InvocationType.Schedule` snapshot; VERDICT r18 #7): the same
  * per-page InputPartition layout as the batch scan, micro-batched
  * `pagespertrigger` pages at a time (default 1 — one page per
  * micro-batch, the pagination loop's own granularity) under standard
  * admission control, so `Trigger.AvailableNow` drains the whole fixture
  * chain through N micro-batches and stops. Fixture mode only: the HTTP
  * chain's offsets come from response headers (task.ts:60-72), which is
  * driver-side discovery — the batch DSv2 path covers it; a live feed
  * would surface new `page-*.json` drops, which this stream picks up on
  * the next trigger because the listing re-runs per `latestOffset` call.
  */
final class CotripPageMicroBatchStream(options: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  require(options.getOrElse("mode", "fixture") == "fixture",
    "cotrip-pages streaming supports mode=fixture only (the HTTP offset " +
      "chain is driver-side discovery — use the batch path)")
  private val path = options("path")
  private val perTrigger: Long = options.get("pagespertrigger")
    .map(_.toLong).getOrElse(1L)
  require(perTrigger > 0, s"pagespertrigger must be positive; got $perTrigger")

  // frozen by prepareForTriggerAvailableNow: AvailableNow must drain to the
  // listing AS OF trigger time, not chase files that appear mid-run
  @volatile private var availableNowTarget: Option[Long] = None

  private def pageCount(): Long =
    CotripPageSource.fixtureFiles(path).length.toLong

  override def initialOffset(): Offset = CotripPageOffset(0L)
  override def deserializeOffset(json: String): Offset =
    CotripPageOffset(json.trim.toLong)
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(pageCount())
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perTrigger)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = availableNowTarget.getOrElse(pageCount())
    val s = start.asInstanceOf[CotripPageOffset].n
    val step = limit match {
      case r: ReadMaxRows => math.max(1L, r.maxRows())
      case _ => math.max(1L, avail - s)
    }
    CotripPageOffset(math.min(avail, s + step))
  }
  override def reportLatestOffset(): Offset = CotripPageOffset(pageCount())
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CotripPageOffset].n.toInt
    val e = end.asInstanceOf[CotripPageOffset].n.toInt
    CotripPageSource.fixtureFiles(path).slice(s, e).zipWithIndex.map {
      case (f, i) => FixturePagePartition(s + i, f.getAbsolutePath): InputPartition
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagePartitionReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
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
