package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.model.TaskConfig
import graft.operators.CotripOps
import graft.sources.{CotripSource, HttpPageClient, PagedFetcher}

/** The real HTTP pagination protocol end to end against a loopback server:
  * apiKey/offset query params, `next-offset` response headers including the
  * literal `'None'` terminator, driver-side fetch AND executor-side DSv2
  * http-mode partitions, and non-2xx fail-fast.
  */
class HttpSourceSpec extends SparkSpec {

  private def feat(id: String, t: String, coords: String) =
    s"""{"type":"Feature","properties":{"id":"$id"},"geometry":{"type":"$t","coordinates":$coords}}"""

  // page chain: None -> "100" -> "200" -> 'None' sentinel
  private val pages = Map(
    None -> (s"""{"features":[${feat("a", "Point", "[1.0,2.0]")}]}""", "100"),
    Some("100") -> (s"""{"features":[${feat("b", "MultiPoint", "[[3.0,4.0],[5.0,6.0]]")}]}""", "200"),
    Some("200") -> (s"""{"features":[${feat("c", "LineString", "[[0.0,0.0],[1.0,1.0]]")}]}""", "None"))

  private def withServer(test: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/signs", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val params = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        if (params.get("apiKey") != Some("tok")) {
          ex.sendResponseHeaders(401, -1); ex.close(); return
        }
        pages.get(params.get("offset")) match {
          case Some((body, next)) =>
            ex.getResponseHeaders.add("next-offset", next)
            val bytes = body.getBytes("UTF-8")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
          case None =>
            ex.sendResponseHeaders(404, -1); ex.close()
        }
      }
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("driver-side fetch walks the header chain and the pipeline runs") {
    withServer { base =>
      val bodies = new PagedFetcher(new HttpPageClient(base, "tok")).fetchAll()
      assert(bodies.size === 3)
      val out = CotripOps.pipeline(CotripSource.fromPages(spark, bodies), TaskConfig("tok"))
      val ids = out.select("id").collect().map(_.getString(0)).toSet
      assert(ids === Set("a", "b-0", "b-1", "c"))
    }
  }

  test("DSv2 http mode fetches each offset partition on executors") {
    withServer { base =>
      val df = CotripSource.fromDsv2(spark, Map(
        "mode" -> "http", "baseUrl" -> base, "apiKey" -> "tok",
        "offsets" -> "100,200"))
      val out = CotripOps.pipeline(df, TaskConfig("tok"))
      assert(out.select("id").collect().map(_.getString(0)).toSet
        === Set("a", "b-0", "b-1", "c"))
    }
  }

  test("non-2xx fails fast like the reference (bad token -> 401)") {
    withServer { base =>
      val err = intercept[RuntimeException] {
        new HttpPageClient(base, "wrong").fetch(None)
      }
      assert(err.getMessage.contains("401"))
    }
  }

  test("HOSTILE server: repeated offset aborts with the cycle guard; endless chain trips the page cap") {
    // VERDICT r12 #8: the guards existed (SURVEY §7.3-3) and were unit-fed
    // via fake clients, but no test drove them through the REAL HTTP path.
    // This server is the pathological input the guards exist for: it
    // always answers 200 with a next-offset header — first variant repeats
    // the same offset forever (a broken cursor), second mints fresh ones
    // forever (an unbounded cursor).
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val mint = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/signs", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val n = hits.incrementAndGet()
        ex.getResponseHeaders.add("next-offset",
          if (mint.get()) s"mint$n" else "42")
        val bytes = """{"features":[]}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // broken cursor: offset 42 -> 42 again; the loud abort, not a hang
      val cyc = intercept[IllegalStateException] {
        new PagedFetcher(new HttpPageClient(base, "tok")).fetchAll()
      }
      assert(cyc.getMessage.contains("cycle detected"))
      assert(hits.get() <= 3, "the cycle guard must abort on the FIRST repeat")
      // unbounded cursor: every page mints a fresh offset; the cap aborts
      hits.set(0)
      mint.set(true)
      val capped = intercept[IllegalStateException] {
        new PagedFetcher(new HttpPageClient(base, "tok"), maxPages = 5).fetchAll()
      }
      assert(capped.getMessage.contains("maxPages"))
      assert(hits.get() <= 6, "the page cap must bound the fetch count")
    } finally server.stop(0)
  }
}
