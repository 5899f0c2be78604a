package graft.model

/** Typed task configuration mirroring the reference's TypeBox `InputSchema`
  * (task.ts:5-11) with defaults applied at parse time, as `this.env(...)`
  * observably does (task.ts:51, 104-106).
  *
  * @param cotripToken          required; missing/empty → failure (task.ts:54)
  * @param pointGeometries      "Point Geometries" toggle, default true
  * @param lineStringGeometries "LineString Geometries" toggle, default true
  * @param polygonGeometries    "Polygon Geometries" toggle, default true
  * @param debug                "DEBUG" — declared-but-dead in the reference
  *                             (task.ts:10 vs task.ts:77); we honor it by
  *                             logging sample rows only when set (SURVEY §1.5-2)
  * @param stripProperties      conformance mode emits `properties:{}`
  *                             bit-for-bit (task.ts:81-82); `false` carries the
  *                             16 declared fields through (SURVEY §1.5-1)
  */
final case class TaskConfig(
    cotripToken: String,
    pointGeometries: Boolean = true,
    lineStringGeometries: Boolean = true,
    polygonGeometries: Boolean = true,
    debug: Boolean = false,
    stripProperties: Boolean = true) {

  /** Allowed-list construction order matches task.ts:103-106. */
  def allowedTypes: Seq[String] =
    (if (pointGeometries) Seq("Point") else Nil) ++
      (if (lineStringGeometries) Seq("LineString") else Nil) ++
      (if (polygonGeometries) Seq("Polygon") else Nil)
}

object TaskConfig {

  /** Parse from a string map (env-style). Key names — including the spaces —
    * match the reference's UI-label keys (task.ts:5-11).
    */
  def fromMap(m: Map[String, String]): TaskConfig = {
    val token = m.getOrElse("COTRIP_TOKEN", "")
    if (token.isEmpty)
      throw new IllegalArgumentException("No COTrip API Token Provided")
    def bool(key: String, default: Boolean): Boolean =
      m.get(key).map(_.trim.toLowerCase) match {
        case None => default
        case Some("true") | Some("1") | Some("yes") | Some("on") => true
        case Some("false") | Some("0") | Some("no") | Some("off") | Some("") => false
        case Some(other) => throw new IllegalArgumentException(
          s"config '$key': cannot parse boolean from '$other'")
      }
    TaskConfig(
      cotripToken = token,
      pointGeometries = bool("Point Geometries", default = true),
      lineStringGeometries = bool("LineString Geometries", default = true),
      polygonGeometries = bool("Polygon Geometries", default = true),
      debug = bool("DEBUG", default = false),
      stripProperties = bool("strip_properties", default = true))
  }

  def fromEnv(): TaskConfig = fromMap(sys.env)
}
