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

  test("unknown mode fails with a clear message") {
    val err = intercept[Exception] {
      spark.read.format("cotrip-pages").option("mode", "nope").load().collect()
    }
    assert(err.getMessage.contains("unknown mode") ||
      Option(err.getCause).exists(_.getMessage.contains("unknown mode")))
  }
}
