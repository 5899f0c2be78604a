package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{GeoSchemas, TaskConfig}
import graft.operators.CotripOps
import graft.sinks.FeatureCollectionSink
import graft.sources.{CotripSource, PageClient}

/** End-to-end pipeline: paginated source → P1 → E1 → P2 → FeatureCollection
  * sink (the reference's whole program, task.ts:50-116; SURVEY §3.4), plus the
  * capabilities surface (`describe`, mirroring `schema(type, flow)` at
  * task.ts:18-48).
  */
final case class CotripPipeline(config: TaskConfig) {

  /** Transform-only core: features in → filtered exploded features out.
    * DEBUG honors the declared-but-dead reference flag (SURVEY §1.5-2): a
    * bounded sample of output features goes to stderr — never the reference's
    * unconditional O(n) per-row write (task.ts:77).
    */
  def transform(features: DataFrame): DataFrame = {
    val out = CotripOps.pipeline(features, config)
    if (config.debug) {
      graft.sinks.FeatureCollectionSink.featureJson(out).take(5)
        .foreach(j => System.err.println(s"[cotrip DEBUG] $j"))
    }
    out
  }

  /** Fetch via the pagination protocol and transform. */
  def run(spark: SparkSession, client: PageClient): DataFrame =
    transform(CotripSource.fetch(spark, client))

  /** Fetch, transform, and submit one FeatureCollection (task.ts:115). */
  def runAndSubmit(spark: SparkSession, client: PageClient, endpoint: String,
                   poster: (String, String) => Unit): Unit =
    FeatureCollectionSink.submit(run(spark, client), endpoint, poster)
}

object CotripPipeline {

  /** Capabilities metadata (SURVEY §2.1-S4): the input-config JSON schema
    * (mirroring task.ts:5-11, including defaults) and the output record
    * schema as Spark schema JSON. `flow=Outgoing` → `{}` (task.ts:45-47).
    */
  def describe(flow: String = "Incoming", schemaType: String = "Output"): String =
    if (flow != "Incoming") "{}"
    else if (schemaType == "Input") inputConfigJsonSchema
    else GeoSchemas.outputFeatureStripped.json

  private val inputConfigJsonSchema: String =
    """{"type":"object","properties":{
      |"COTRIP_TOKEN":{"type":"string","description":"API Token for CoTrip"},
      |"Point Geometries":{"type":"boolean","default":true},
      |"LineString Geometries":{"type":"boolean","default":true},
      |"Polygon Geometries":{"type":"boolean","default":true},
      |"DEBUG":{"type":"boolean","default":false}},
      |"required":["COTRIP_TOKEN"]}""".stripMargin.replace("\n", "")
}
