package graft.ingest

/** Retrying fetch transport for the ingest edge (reference:
  * LLM_Ingestor/polygon_client.py:61-74 — 3 attempts with a fixed 2 s
  * delay between them; the Alpha Vantage client shares the shape).
  *
  * Wraps any `ApiRequest => Option[String]` transport — a live HTTP
  * client in production, recorded payloads in tests — with bounded
  * retry + fixed backoff, so the [[Ingestor]]'s payload interface
  * stays a plain function and the test path stays replayable.
  *
  * Semantics:
  *  - a thrown exception is a TRANSIENT transport failure: retried up
  *    to `maxAttempts`, sleeping `delayMillis` between attempts; the
  *    last exception is rethrown when attempts are exhausted (the
  *    Ingestor records it as a failed request);
  *  - `None` is a definitive "no payload recorded" — NOT retried,
  *    mirroring the reference's empty-response passthrough.
  *
  * The `sleep` hook is injectable so specs assert the backoff without
  * real waiting.
  */
class RetryingFetch(
    transport: ApiRequest => Option[String],
    maxAttempts: Int = 3,
    delayMillis: Long = 2000L,
    sleep: Long => Unit = Thread.sleep)
  extends (ApiRequest => Option[String]) {

  require(maxAttempts >= 1, "maxAttempts must be >= 1")

  override def apply(req: ApiRequest): Option[String] = {
    var attempt = 1
    while (true) {
      try return transport(req)
      catch {
        case e: Exception =>
          if (attempt >= maxAttempts) throw e
          sleep(delayMillis)
          attempt += 1
      }
    }
    None // unreachable
  }
}

/** Minimal live HTTP GET transport on the JDK client (zero extra
  * dependencies): `buildUrl` maps a plan request to the provider URL
  * (the reference's client-side URL assembly, polygon_client.py:76-98).
  * 200 -> Some(body); any other status throws, which [[RetryingFetch]]
  * treats as transient and retries.
  */
class HttpTransport(buildUrl: ApiRequest => String,
                    timeoutSeconds: Long = 30L)
  extends (ApiRequest => Option[String]) {

  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
    .build()

  override def apply(req: ApiRequest): Option[String] = {
    val http = java.net.http.HttpRequest.newBuilder(java.net.URI.create(buildUrl(req)))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .GET().build()
    val resp = client.send(http, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 200) Some(resp.body())
    else throw new java.io.IOException(
      s"${req.apiName}/${req.endpointName}: HTTP ${resp.statusCode()}")
  }
}
