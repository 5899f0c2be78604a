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

  /** Engine twin of the reference's Lambda entry point (task.ts:120-122:
    * `handler(event) = internal(Task.init(...), event)`, wired by the
    * container's `CMD ["dist/task.handler"]` — SURVEY §3.2, the last
    * unmapped reference surface): ONE dispatch that serves both things a
    * caller ever asks the task for — its schemas or a run. The `internal`
    * dispatcher lives in the closed `@tak-ps/etl` layer, so the event
    * protocol here is the OBSERVABLE one: a `type` of `schema:input` /
    * `schema:output` returns the matching [[CotripPipeline.describe]]
    * JSON (with `flow: "Outgoing"` overriding to `{}`, task.ts:45-47);
    * an absent/empty type — the scheduled invocation
    * (`InvocationType.Schedule`, task.ts:16) — runs `control()` end to
    * end and returns the submitted FeatureCollection JSON. Anything else
    * fails loudly rather than silently running a fetch.
    */
  def handler(spark: SparkSession, client: PageClient,
              event: String = "{}"): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(
      if (event == null || event.trim.isEmpty) "{}" else event)
    val typ = Option(root.get("type")).map(_.asText()).getOrElse("")
    val flow = Option(root.get("flow")).map(_.asText()).getOrElse("Incoming")
    typ match {
      case "schema:input" => CotripPipeline.describe(flow, "Input")
      case "schema:output" => CotripPipeline.describe(flow, "Output")
      case "" | "schedule" =>
        FeatureCollectionSink.toFeatureCollectionJson(run(spark, client))
      case other =>
        throw new IllegalArgumentException(s"unknown event type: $other")
    }
  }
}

object CotripPipeline {

  /** Capabilities metadata (SURVEY §2.1-S4, task.ts:18-48): the input-config
    * JSON schema (mirroring task.ts:5-11, including defaults) and the output
    * RECORD schema — the 16 declared sign properties (task.ts:26-43) as a
    * TypeBox-style JSON Schema. `flow=Outgoing` → `{}` (task.ts:45-47).
    *
    * Required-ness contract: the reference's runtime applies TypeBox
    * `default`s before validation (`this.env(InputSchema)`), so a config
    * field with a default is operationally optional — `required` here lists
    * exactly the fields a caller MUST supply (COTRIP_TOKEN, task.ts:55).
    * Output record fields have no defaults and are all required.
    */
  def describe(flow: String = "Incoming", schemaType: String = "Output"): String =
    if (flow != "Incoming") "{}"
    else if (schemaType == "Input") inputConfigJsonSchema
    else outputRecordJsonSchema

  private val inputConfigJsonSchema: String =
    """{"type":"object","properties":{
      |"COTRIP_TOKEN":{"type":"string","description":"API Token for CoTrip"},
      |"Point Geometries":{"type":"boolean","description":"Allow point geometries","default":true},
      |"LineString Geometries":{"type":"boolean","description":"Allow LineString geometries","default":true},
      |"Polygon Geometries":{"type":"boolean","description":"Allow Polygon Geometries","default":true},
      |"DEBUG":{"type":"boolean","description":"Print GeoJSON Features in logs","default":false}},
      |"required":["COTRIP_TOKEN"]}""".stripMargin.replace("\n", "")

  /** The 16-field output record schema (task.ts:26-43), DERIVED from the
    * engine's own [[GeoSchemas.signProperties]] StructType so the served
    * capabilities can never drift from the schema the pipeline actually
    * reads (JS `Number` ⇒ DoubleType ⇒ JSON-Schema `number`).
    */
  private val outputRecordJsonSchema: String = {
    import org.apache.spark.sql.types.{DoubleType, StringType}
    val fields = GeoSchemas.signProperties.fields
    val props = fields.map { f =>
      val t = f.dataType match {
        case StringType => "string"
        case DoubleType => "number"
        case other => other.typeName
      }
      s""""${f.name}":{"type":"$t"}"""
    }.mkString(",")
    val req = fields.map(f => s""""${f.name}"""").mkString(",")
    s"""{"type":"object","properties":{$props},"required":[$req]}"""
  }

  /** The capabilities surface as a relation, for the driver's DuckDB oracle
    * (c04): one row per declared field of each Incoming schema, PARSED BACK
    * from the JSON strings [[describe]] actually serves — the table can
    * never agree with the oracle while the served JSON is wrong.
    */
  def capabilitiesTable(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def rows(schemaType: String): Seq[(String, String, String, String, String, Boolean)] = {
      val root = mapper.readTree(describe("Incoming", schemaType))
      val required = Option(root.get("required"))
        .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)
      root.get("properties").properties().asScala.toSeq.map { e =>
        val spec = e.getValue
        ( schemaType,
          e.getKey,
          spec.get("type").asText(),
          Option(spec.get("description")).map(_.asText()).orNull,
          Option(spec.get("default")).map(_.asText()).orNull,
          required.contains(e.getKey))
      }
    }
    import spark.implicits._
    (rows("Input") ++ rows("Output"))
      .toDF("schema_type", "field", "json_type", "description",
        "default_value", "required")
  }
}
