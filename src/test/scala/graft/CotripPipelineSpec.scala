package graft

import org.apache.spark.sql.DataFrame

import graft.model.TaskConfig
import graft.operators.CotripOps
import graft.sinks.FeatureCollectionSink
import graft.sources.{CotripSource, FixturePageClient, PagedFetcher}

/** Conformance golden tests for the reference pipeline semantics
  * (SURVEY §5.2-1): every geometry type, the Multi explode with positional id
  * suffixes, GeometryCollection drop, toggle combinations, pagination chain
  * with the 'None' sentinel, and the missing-token failure.
  */
class CotripPipelineSpec extends SparkSpec {

  private def feature(id: String, geomType: String, coords: String,
                      extraProps: String = ""): String =
    s"""{"type":"Feature","properties":{"id":"$id","name":"n-$id"$extraProps},
       |"geometry":{"type":"$geomType","coordinates":$coords}}""".stripMargin.replace("\n", "")

  private val gcFeature =
    """{"type":"Feature","properties":{"id":"gc1"},
      |"geometry":{"type":"GeometryCollection","geometries":[]}}""".stripMargin.replace("\n", "")

  private val allFixtures: Seq[String] = Seq(
    feature("pt1", "Point", "[-105.52,39.74]"),
    feature("ls1", "LineString", "[[-105.0,39.0],[-104.5,39.5]]"),
    feature("pg1", "Polygon", "[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]"),
    feature("mp1", "MultiPoint", "[[1.0,2.0],[3.0,4.0],[5.0,6.0]]"),
    feature("mls1", "MultiLineString", "[[[0.0,0.0],[1.0,1.0]],[[2.0,2.0],[3.0,3.0]]]"),
    feature("mpg1", "MultiPolygon",
      "[[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]],[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]]"),
    gcFeature)

  private def page(features: Seq[String]): String =
    features.mkString("""{"features":[""", ",", "]}")

  private def features(fixtures: Seq[String]): DataFrame =
    CotripSource.fromPages(spark, Seq(page(fixtures)))

  private def rows(df: DataFrame): Seq[(String, String, String)] =
    df.select("id", "geometry.type", "geometry.coordinates")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("source parses pages into features with raw-JSON coordinates") {
    val df = features(allFixtures)
    assert(df.count() === 7)
    val pt = df.filter(df("properties.id") === "pt1").collect().head
    assert(pt.getAs[org.apache.spark.sql.Row]("geometry").getAs[String]("coordinates")
      === "[-105.52,39.74]")
  }

  test("full pipeline: defaults keep all, Multi explodes with id-{i}, GC dropped") {
    val out = CotripOps.pipeline(features(allFixtures), TaskConfig("t"))
    val got = rows(out).toSet
    val expected = Set(
      ("pt1", "Point", "[-105.52,39.74]"),
      ("ls1", "LineString", "[[-105.0,39.0],[-104.5,39.5]]"),
      ("pg1", "Polygon", "[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]"),
      ("mp1-0", "Point", "[1.0,2.0]"),
      ("mp1-1", "Point", "[3.0,4.0]"),
      ("mp1-2", "Point", "[5.0,6.0]"),
      ("mls1-0", "LineString", "[[0.0,0.0],[1.0,1.0]]"),
      ("mls1-1", "LineString", "[[2.0,2.0],[3.0,3.0]]"),
      ("mpg1-0", "Polygon", "[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]"),
      ("mpg1-1", "Polygon", "[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]"))
    assert(got === expected)
  }

  test("explode preserves positional order within a Multi (id-{i} by position)") {
    val out = CotripOps.pipeline(features(Seq(feature("mp1", "MultiPoint",
      "[[9.0,9.0],[8.0,8.0],[7.0,7.0]]"))), TaskConfig("t")).coalesce(1)
    assert(rows(out) === Seq(
      ("mp1-0", "Point", "[9.0,9.0]"),
      ("mp1-1", "Point", "[8.0,8.0]"),
      ("mp1-2", "Point", "[7.0,7.0]")))
  }

  test("all 8 toggle combinations match reference filter semantics") {
    val df = features(allFixtures)
    for {
      p <- Seq(true, false); l <- Seq(true, false); g <- Seq(true, false)
    } {
      val cfg = TaskConfig("t", pointGeometries = p, lineStringGeometries = l,
        polygonGeometries = g)
      val got = rows(CotripOps.pipeline(df, cfg)).map(_._2).toSet
      val expectedTypes =
        (if (p) Set("Point") else Set.empty[String]) ++
          (if (l) Set("LineString") else Set.empty[String]) ++
          (if (g) Set("Polygon") else Set.empty[String])
      assert(got === expectedTypes, s"toggles p=$p l=$l g=$g")
      // MultiX survives iff X allowed (filter runs after explode).
      val ids = rows(CotripOps.pipeline(df, cfg)).map(_._1).toSet
      assert(ids.contains("mp1-0") === p)
      assert(ids.contains("mls1-1") === l)
      assert(ids.contains("mpg1-0") === g)
    }
  }

  test("prefilter optimization is semantics-preserving") {
    val df = features(allFixtures)
    for {
      p <- Seq(true, false); l <- Seq(true, false)
    } {
      val cfg = TaskConfig("t", pointGeometries = p, lineStringGeometries = l)
      val withPre = rows(CotripOps.pipeline(df, cfg, prefilter = true)).toSet
      val without = rows(CotripOps.pipeline(df, cfg, prefilter = false)).toSet
      assert(withPre === without)
    }
  }

  test("empty Multi coordinates → zero output rows (JS loop body never runs)") {
    val out = CotripOps.pipeline(features(Seq(feature("mp0", "MultiPoint", "[]"))),
      TaskConfig("t"))
    assert(out.count() === 0)
  }

  test("properties stripped by default, carried when stripProperties=false") {
    val df = features(Seq(feature("pt1", "Point", "[0.0,0.0]")))
    val stripped = CotripOps.pipeline(df, TaskConfig("t"))
    assert(stripped.schema("properties").dataType.asInstanceOf[org.apache.spark.sql.types.StructType].isEmpty)
    val carried = CotripOps.pipeline(df, TaskConfig("t", stripProperties = false))
    val row = carried.select("properties.name").collect().head
    assert(row.getString(0) === "n-pt1")
  }

  test("typedProperties parses ISO timestamps, degrades unparseable to null") {
    val df = features(Seq(
      feature("t1", "Point", "[0.0,0.0]",
        ""","lastUpdated":"2026-05-01T12:00:00Z","activationTime":"not-a-time""""),
      feature("t2", "Point", "[0.0,0.0]")))
    val out = CotripOps.typedProperties(
      CotripOps.pipeline(df, TaskConfig("t", stripProperties = false)))
      .select("id", "lastUpdated_ts", "activationTime_ts").collect()
      .map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    assert(out("t1")._1 === java.sql.Timestamp.valueOf("2026-05-01 12:00:00"))
    assert(out("t1")._2 === null) // unparseable degrades, never throws
    assert(out("t2") === ((null, null))) // absent fields stay null
  }

  test("pagination: chain with 'None' sentinel and absent-header variants") {
    val bodies = Seq(
      page(Seq(feature("a", "Point", "[1.0,1.0]"))),
      page(Nil), // empty page mid-chain
      page(Seq(feature("b", "Point", "[2.0,2.0]"))))
    for (term <- Seq(Some("None"), None)) {
      val fetched = new PagedFetcher(FixturePageClient.chain(bodies, term)).fetchAll()
      assert(fetched === bodies, s"terminator=$term")
    }
    val df = CotripSource.fromPages(spark, bodies)
    assert(df.count() === 2)
  }

  test("pagination cycle detection and page cap") {
    val looping = new graft.sources.PageClient {
      def fetch(offset: Option[String]) = graft.sources.Page(page(Nil), Some("42"))
    }
    assertThrows[IllegalStateException] { new PagedFetcher(looping).fetchAll() }
    val endless = new graft.sources.PageClient {
      var i = 0
      def fetch(offset: Option[String]) = { i += 1; graft.sources.Page(page(Nil), Some(i.toString)) }
    }
    assertThrows[IllegalStateException] { new PagedFetcher(endless, maxPages = 5).fetchAll() }
  }

  test("missing token fails like task.ts:54") {
    assertThrows[IllegalArgumentException] { TaskConfig.fromMap(Map.empty) }
    assertThrows[IllegalArgumentException] { TaskConfig.fromMap(Map("COTRIP_TOKEN" -> "")) }
  }

  test("config defaults match declared TypeBox defaults") {
    val cfg = TaskConfig.fromMap(Map("COTRIP_TOKEN" -> "tok"))
    assert(cfg.pointGeometries && cfg.lineStringGeometries && cfg.polygonGeometries)
    assert(!cfg.debug)
    assert(cfg.allowedTypes === Seq("Point", "LineString", "Polygon"))
  }

  test("sink round-trips raw coordinates unquoted and wraps a FeatureCollection") {
    val out = CotripOps.pipeline(features(Seq(
      feature("pt1", "Point", "[-105.52,39.74]"))), TaskConfig("t"))
    val fc = FeatureCollectionSink.toFeatureCollectionJson(out)
    assert(fc ===
      """{"type":"FeatureCollection","features":[{"id":"pt1","type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[-105.52,39.74]}}]}""")
  }

  test("pipeline is idempotent on its own output shape") {
    // Output features re-ingested (as a page) produce themselves again.
    val out = CotripOps.pipeline(features(allFixtures), TaskConfig("t"))
    val jsons = FeatureCollectionSink.featureJson(out).collect()
    // Re-ingest: output has top-level id but pipeline reads properties.id;
    // inject it back as a property to simulate the upstream contract.
    val reinjected = jsons.map(_.replace("\"properties\":{}",
      "\"properties\":{\"id\":\"%s\"}".format("X")))
    val df2 = CotripSource.fromPages(spark, Seq(reinjected.mkString("""{"features":[""", ",", "]}")))
    val out2 = CotripOps.pipeline(df2, TaskConfig("t"))
    assert(out2.count() === out.count()) // no Multi left → explode is identity
    val types2 = rows(out2).map(_._2).toSet
    assert(types2.subsetOf(Set("Point", "LineString", "Polygon")))
  }

  test("handler dispatch: schema events serve describe(), default event runs control(), unknown fails loudly") {
    val pipe = graft.CotripPipeline(TaskConfig("t"))
    val client = FixturePageClient.chain(Seq(page(allFixtures)))
    // schema events return the served JSON verbatim (the c04-graded surface)
    assert(pipe.handler(spark, client, """{"type":"schema:input"}""")
      === graft.CotripPipeline.describe("Incoming", "Input"))
    assert(pipe.handler(spark, client, """{"type":"schema:output"}""")
      === graft.CotripPipeline.describe("Incoming", "Output"))
    // Outgoing flow overrides to {} (task.ts:45-47)
    assert(pipe.handler(spark, client,
      """{"type":"schema:input","flow":"Outgoing"}""") === "{}")
    // the scheduled invocation (absent/empty type) runs the whole pipeline
    // and returns the submitted FeatureCollection
    val fc = pipe.handler(spark, client)
    assert(fc.startsWith("""{"type":"FeatureCollection","features":["""))
    Seq("pt1", "ls1", "pg1", "mp1-0", "mp1-2", "mls1-1", "mpg1-0").foreach(id =>
      assert(fc.contains(s""""id":"$id""""), s"missing $id in handler output"))
    assert(!fc.contains("gc1"), "GeometryCollection must be dropped")
    assert(pipe.handler(spark, client, """{"type":"schedule"}""") === fc)
    // anything else fails loudly rather than silently fetching
    val err = intercept[IllegalArgumentException] {
      pipe.handler(spark, client, """{"type":"nonsense"}""")
    }
    assert(err.getMessage.contains("unknown event type"))
  }
}
