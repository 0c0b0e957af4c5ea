package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** Real HTTP transport for the A2 fetch seam — the committed
  * `java.net.http` implementation of [[Sources.Fetcher]] /
  * [[graft.io.v2.FetcherRegistry.SliceFetcher]] the synthetic fetchers
  * stood in for. Matches the reference's XML-query POST loop
  * (`Ingestion Data (XML).py:91-127`): POST an XML time-window query,
  * get a CSV payload back; plus the two production needs the
  * reference's bare `requests.post` lacks — basic auth and bounded
  * retry with exponential backoff.
  *
  * Retry policy: connect/IO errors and 5xx responses retry up to
  * `maxAttempts` with `initialBackoffMs * 2^attempt` sleeps; 4xx fails
  * immediately (an auth or query error does not heal by retrying, and
  * hammering an auth endpoint is how ingest gets locked out).
  */
object HttpFetcher {

  /** `insecureTls = true` skips server-certificate validation — the
    * reference's `verify=False` (`Ingestion Data (XML).py:121`), for
    * self-signed internal endpoints. Chain validation only; java.net
    * .http gates hostname verification behind the JVM-wide property
    * `jdk.internal.httpclient.disableHostnameVerification`.
    */
  final case class Config(
      url: String,
      user: String = "",
      password: String = "",
      maxAttempts: Int = 3,
      initialBackoffMs: Long = 100,
      requestTimeoutMs: Long = 30000,
      insecureTls: Boolean = false)

  final class HttpStatusException(val status: Int, body: String)
    extends RuntimeException(s"HTTP $status: ${body.take(200)}")

  // One client per JVM per TLS mode: HttpClient pools connections;
  // per-request timeouts come from the Config.
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  private lazy val insecureClient: HttpClient = {
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](
      new javax.net.ssl.X509TrustManager {
        def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
          new Array[java.security.cert.X509Certificate](0)
      }), new java.security.SecureRandom())
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10))
      .sslContext(ctx)
      .build()
  }

  private def clientFor(cfg: Config): HttpClient =
    if (cfg.insecureTls) insecureClient else client

  /** POST `body`, return the response body. Blocking — callers are
    * executor tasks whose whole job IS this fetch (one slice per
    * partition), so a sync call is the right shape; parallelism comes
    * from Spark's task scheduling, not client-side async.
    */
  def post(cfg: Config, body: String): String = {
    val builder = HttpRequest.newBuilder(URI.create(cfg.url))
      .timeout(Duration.ofMillis(cfg.requestTimeoutMs))
      .header("Content-Type", "application/xml")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    if (cfg.user.nonEmpty) {
      val token = Base64.getEncoder.encodeToString(
        s"${cfg.user}:${cfg.password}".getBytes(StandardCharsets.UTF_8))
      builder.header("Authorization", s"Basic $token")
    }
    val req = builder.build()

    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < cfg.maxAttempts) {
      if (attempt > 0) Thread.sleep(cfg.initialBackoffMs << (attempt - 1))
      try {
        val resp = clientFor(cfg).send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
        resp.statusCode() match {
          case ok if ok < 300 => return resp.body()
          case s if s >= 500 => lastErr = new HttpStatusException(s, resp.body()) // transient: retry
          case s => throw new HttpStatusException(s, resp.body()) // 4xx: caller bug, fail fast
        }
      } catch {
        case e: java.io.IOException => lastErr = e // connect reset etc: retry
      }
      attempt += 1
    }
    throw new RuntimeException(s"POST ${cfg.url} failed after ${cfg.maxAttempts} attempts", lastErr)
  }

  /** The A2 driver-side seam as a real transport. */
  def fetcher(cfg: Config): Sources.Fetcher = (body: String) => post(cfg, body)

  /** The reference's XML query body for one slice window
    * (`Ingestion Data (XML).py:96-104` builds the equivalent
    * start/end-scoped query).
    */
  def sliceRequestBody(sliceStart: Long, step: Long): String =
    s"<query><start>$sliceStart</start><end>${sliceStart + step}</end></query>"

  /** Register an HTTP-backed slice fetcher for [[graft.io.v2.SliceSource]].
    * NOTE registration is per-JVM: on a real cluster this call must run
    * in executor startup (a SparkPlugin / static init), not just the
    * driver — the registry resolves by name precisely so that only the
    * NAME ships in the scan, never a closure.
    */
  def registerSliceFetcher(name: String, cfg: Config): Unit =
    graft.io.v2.FetcherRegistry.register(name,
      (t, step) => post(cfg, sliceRequestBody(t, step)))
}
