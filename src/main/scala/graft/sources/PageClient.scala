package graft.sources

/** One fetched API page: raw body text plus the `next-offset` response header
  * (reference pagination protocol, task.ts:60-72).
  */
final case class Page(body: String, nextOffset: Option[String])

/** Pluggable page fetcher so tests inject fixture pages without HTTP
  * (SURVEY.md §7.1-2). `offset = None` means the first request, which sends no
  * `offset` query param (task.ts:64-67).
  */
trait PageClient {
  def fetch(offset: Option[String]): Page
}

/** Fixture client: a pre-built chain of pages addressed by offset key.
  * `chain(bodies)` builds the canonical chain `None → "1" → "2" → … → 'None'`
  * including the literal `'None'` terminator sentinel the real API emits
  * (task.ts:72).
  */
final class FixturePageClient(pages: Map[Option[String], Page]) extends PageClient {
  override def fetch(offset: Option[String]): Page =
    pages.getOrElse(offset, throw new NoSuchElementException(s"no fixture page at offset $offset"))
}

object FixturePageClient {
  def chain(bodies: Seq[String], terminator: Option[String] = Some("None")): FixturePageClient = {
    require(bodies.nonEmpty, "at least one page required")
    val entries = bodies.zipWithIndex.map { case (body, i) =>
      val key: Option[String] = if (i == 0) None else Some(i.toString)
      val next = if (i == bodies.size - 1) terminator else Some((i + 1).toString)
      key -> Page(body, next)
    }
    new FixturePageClient(entries.toMap)
  }
}

/** HTTP client for the real endpoint shape: `GET {base}/api/v1/signs?apiKey=…
  * [&offset=…]`, next page offset read from the `next-offset` response header
  * (task.ts:62-69). Fail-fast on non-2xx, mirroring the reference's lack of
  * retry handling (SURVEY §1.5-6).
  */
final class HttpPageClient(baseUrl: String, apiKey: String,
                           connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(30),
                           requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(120)) extends PageClient {
  // explicit timeouts: a stalled server must fail the fetch (and let the
  // schedule/task retry), not hang the driver loop or an executor forever
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(connectTimeout).build()

  override def fetch(offset: Option[String]): Page = {
    val params = s"apiKey=${java.net.URLEncoder.encode(apiKey, "UTF-8")}" +
      offset.map(o => s"&offset=${java.net.URLEncoder.encode(o, "UTF-8")}").getOrElse("")
    val uri = java.net.URI.create(s"$baseUrl/api/v1/signs?$params")
    val req = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(requestTimeout).GET().build()
    val res = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() / 100 != 2)
      throw new RuntimeException(s"fetch failed: HTTP ${res.statusCode()} for $uri")
    Page(res.body(), Option(res.headers().firstValue("next-offset").orElse(null)))
  }
}
