package graft

import java.nio.file.{Files, Path}

import graft.model.TaskConfig
import graft.operators.CotripOps
import graft.queries.CotripQueries
import graft.sources.CotripSource

/** The DSv2 `cotrip-pages` source: fixture-mode partition planning, schema,
  * and end-to-end equality with the driver-side fetch path.
  */
class Dsv2SourceSpec extends SparkSpec {

  private def writeFixtures(): Path = {
    val dir = Files.createTempDirectory("cotrip-pages")
    CotripQueries.fixturePages.zipWithIndex.foreach { case (body, i) =>
      Files.writeString(dir.resolve(f"page-$i%03d.json"), body)
    }
    // a non-matching file that must be ignored
    Files.writeString(dir.resolve("README.txt"), "not a page")
    dir
  }

  test("fixture mode: one partition per page file, bodies byte-identical") {
    val dir = writeFixtures()
    val pages = spark.read.format("cotrip-pages")
      .option("mode", "fixture").option("path", dir.toString).load()
    assert(pages.schema.fieldNames.toSeq === Seq("page_index", "body"))
    assert(pages.rdd.getNumPartitions === 3)
    val rows = pages.orderBy("page_index").collect()
    assert(rows.map(_.getString(1)).toSeq === CotripQueries.fixturePages)
  }

  test("DSv2 path produces the same pipeline output as the driver-side path") {
    val dir = writeFixtures()
    val viaDsv2 = CotripOps.pipeline(
      CotripSource.fromDsv2(spark,
        Map("mode" -> "fixture", "path" -> dir.toString)), TaskConfig("t"))
    val viaSeq = CotripOps.pipeline(
      CotripSource.fromPages(spark, CotripQueries.fixturePages), TaskConfig("t"))
    assert(viaDsv2.except(viaSeq).count() === 0)
    assert(viaSeq.except(viaDsv2).count() === 0)
    assert(viaDsv2.count() === 7)
  }

  test("micro-batch stream: one page per trigger by default; pagespertrigger batches wider") {
    val dir = writeFixtures()
    def drain(opts: Map[String, String], sink: String): Long = {
      val pages = spark.readStream.format("cotrip-pages")
        .option("mode", "fixture").option("path", dir.toString)
        .options(opts).load()
      val out = CotripOps.pipeline(CotripSource.fromPageRows(pages), TaskConfig("t"))
      val before = graft.streaming.StreamTelemetry.microBatchesCompleted.get()
      graft.streaming.EventsStream.runAvailableNow(out, sink)
      graft.streaming.StreamTelemetry.microBatchesCompleted.get() - before
    }
    // default admission control: 3 pages → 3 one-page micro-batches
    assert(drain(Map.empty, "c05_spec_sink1") === 3L)
    assert(spark.table("c05_spec_sink1").count() === 7L)
    // pagespertrigger=2 → ceil(3/2) = 2 micro-batches, same features
    assert(drain(Map("pagespertrigger" -> "2"), "c05_spec_sink2") === 2L)
    assert(spark.table("c05_spec_sink2").count() === 7L)
    // and the drained features equal the batch pipeline's byte for byte
    val batch = CotripOps.pipeline(
      CotripSource.fromPages(spark, CotripQueries.fixturePages), TaskConfig("t"))
    assert(spark.table("c05_spec_sink1").except(batch).count() === 0)
    assert(batch.except(spark.table("c05_spec_sink1")).count() === 0)
  }

  test("micro-batch stream: http mode is rejected with the driver-side-discovery rationale") {
    val err = intercept[Exception] {
      val pages = spark.readStream.format("cotrip-pages")
        .option("mode", "http").option("baseurl", "http://localhost:1")
        .option("apikey", "k").load()
      graft.streaming.EventsStream.runAvailableNow(pages, "c05_spec_sink3")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("mode=fixture")), msgs(err).mkString("; "))
  }

  test("unknown mode fails with a clear message") {
    val err = intercept[Exception] {
      spark.read.format("cotrip-pages").option("mode", "nope").load().collect()
    }
    assert(err.getMessage.contains("unknown mode") ||
      Option(err.getCause).exists(_.getMessage.contains("unknown mode")))
  }
}
