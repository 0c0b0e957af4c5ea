package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.io.HttpFetcher
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[HttpFetcher]] over real sockets: an in-process HTTP stub serving
  * the reference API's shape (basic-auth'd XML-query POST → CSV
  * payload, `Ingestion Data (XML).py:91-127`), driven both directly
  * (auth, retry, fail-fast) and end-to-end through the DataSource V2
  * [[graft.io.v2.SliceSource]] (executor-side fetch per slice
  * partition).
  */
class HttpFetcherSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val requests = new AtomicInteger(0)
  private val failNext = new AtomicInteger(0)
  private val goodAuth = "Basic " + java.util.Base64.getEncoder
    .encodeToString("ingest:s3cret".getBytes(StandardCharsets.UTF_8))

  private var server: HttpServer = _
  private def url = s"http://localhost:${server.getAddress.getPort}/query"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/query", (x: HttpExchange) => {
      requests.incrementAndGet()
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      def respond(status: Int, payload: String): Unit = {
        val bytes = payload.getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(status, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      }
      if (x.getRequestHeaders.getFirst("Authorization") != goodAuth) respond(401, "bad auth")
      else if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) respond(503, "busy")
      else {
        val start = "<start>(\\d+)</start>".r.findFirstMatchIn(body).get.group(1).toLong
        // two CSV rows per slice, deterministic in the slice start
        respond(200, s"app,metric,ts\napp0,${start / 100}.25,${start + 1}\napp1,${start / 100}.75,${start + 2}\n")
      }
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def cfg = HttpFetcher.Config(url, user = "ingest", password = "s3cret",
    maxAttempts = 3, initialBackoffMs = 1)

  test("authenticated POST returns the payload; 5xx retries with backoff until success") {
    requests.set(0); failNext.set(2)
    val payload = HttpFetcher.post(cfg, HttpFetcher.sliceRequestBody(600, 600))
    assert(payload.startsWith("app,metric,ts\napp0,6.25,601\n"))
    assert(requests.get() == 3, "two 503s then success should be exactly 3 requests")
  }

  test("4xx fails fast: one request, no retry storm against an auth wall") {
    requests.set(0); failNext.set(0)
    val e = intercept[HttpFetcher.HttpStatusException] {
      HttpFetcher.post(cfg.copy(password = "wrong"), "<query/>")
    }
    assert(e.status == 401)
    assert(requests.get() == 1, "4xx must not retry")
  }

  test("5xx that never heals exhausts maxAttempts and surfaces the last status") {
    requests.set(0); failNext.set(99)
    val e = intercept[RuntimeException](HttpFetcher.post(cfg, "<query/>"))
    assert(requests.get() == 3)
    assert(e.getCause.asInstanceOf[HttpFetcher.HttpStatusException].status == 503)
    failNext.set(0)
  }

  test("SliceSource fetches over real sockets, one executor-side HTTP call per slice") {
    val spark = TestSession.spark
    requests.set(0); failNext.set(0)
    HttpFetcher.registerSliceFetcher("http_test", cfg)
    val df = spark.read.format("graft.io.v2.SliceSource")
      .option("start", 0).option("end", 1800).option("step", 600)
      .option("fetcher", "http_test").load()
    // sort on the driver: a global orderBy range-samples the source,
    // which would fetch every slice twice
    val rows = df.collect().sortBy(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 6) // 3 slices x 2 rows
    assert(df.rdd.getNumPartitions == 3, "one partition per slice")
    assert(rows.head.toSeq == Seq(0L, "app0", 0.25, 1L))
    assert(rows.last.toSeq == Seq(1200L, "app1", 12.75, 1202L))
    assert(requests.get() == 3, "exactly one fetch per slice")
  }
}
