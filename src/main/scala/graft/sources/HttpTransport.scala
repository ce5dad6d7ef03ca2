package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Non-2xx response, surfaced with status + body head — an opaque
  * "parse error" two layers up is how silent auth failures hide. */
final class HttpError(val status: Int, val body: String)
  extends RuntimeException(s"HTTP $status: ${body.take(300)}")

/** The REAL network edge for the pluggable REST/OAuth seams
  * ([[RestSource.Server]], [[TokenStore.Refresher]]): a driver-side
  * JDK `java.net.http.HttpClient` transport. Everything above these
  * two functions is transport-agnostic — the canned in-memory server
  * and this HTTP client satisfy the same seam types, which is what
  * lets HttpTransportSpec drive the whole auth + lookup flow against
  * a real loopback socket (`com.sun.net.httpserver`) with zero egress.
  *
  * Scale stance unchanged (RestSource scaladoc): REST fetches are
  * driver-side, small, and broadcast into joins — never per-row calls
  * from executors.
  */
object HttpTransport {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  private def send(req: HttpRequest): String = {
    val resp =
      client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new HttpError(resp.statusCode(), resp.body())
    resp.body()
  }

  // query components are RFC 3986, not form data: a '+' in the request
  // line is a literal plus to a strict peer, so spaces must be %20
  private def encQ(s: String) = enc(s).replace("+", "%20")

  /** GET with url-encoded query params (sorted for a stable request
    * line) → response body; non-2xx throws [[HttpError]]. */
  def get(baseUrl: String, params: Map[String, String],
      headers: Map[String, String] = Map.empty): String = {
    val qs = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${encQ(k)}=${encQ(v)}" }.mkString("&")
    val b = HttpRequest
      .newBuilder(URI.create(if (qs.isEmpty) baseUrl else s"$baseUrl?$qs"))
      .GET().timeout(Duration.ofSeconds(30))
    headers.foreach { case (k, v) => b.header(k, v) }
    send(b.build())
  }

  /** POST `application/x-www-form-urlencoded` → response body. */
  def postForm(url: String, form: Map[String, String],
      headers: Map[String, String] = Map.empty): String = {
    val body = form.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val b = HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .timeout(Duration.ofSeconds(30))
    headers.foreach { case (k, v) => b.header(k, v) }
    send(b.build())
  }

  /** [[RestSource.Server]] over real HTTP: the bearer token + tenant
    * header pair every reference API call carries
    * (/root/reference/src/apiFunctions.ts:36-47 `setActiveTenant` —
    * the tenant id selected there rides every subsequent request). */
  def server(baseUrl: String, accessToken: String,
      tenantId: String): RestSource.Server =
    params => get(baseUrl, params, Map(
      "Authorization" -> s"Bearer $accessToken",
      "xero-tenant-id" -> tenantId,
      "Accept" -> "application/json"))

  /** [[TokenStore.AuthServer]] over real HTTP: the token endpoint POST
    * with basic client authentication
    * (/root/reference/src/apiFunctions.ts:15-27 `refreshTokenSet` —
    * client id/secret from config). Response PARSING stays in
    * TokenStore (one parser for canned and HTTP transports alike —
    * including the expires_in→expires_at conversion via the caller's
    * clock). */
  def authServer(tokenUrl: String, clientId: String,
      clientSecret: String): TokenStore.AuthServer = { form =>
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes(StandardCharsets.UTF_8))
    postForm(tokenUrl, form, Map("Authorization" -> s"Basic $basic"))
  }

  /** [[TokenStore.Refresher]] over real HTTP — [[authServer]] composed
    * with TokenStore's own refresh grant + response parser. */
  def refresher(tokenUrl: String, clientId: String, clientSecret: String,
      nowEpochSec: () => Long = () => System.currentTimeMillis() / 1000)
      : TokenStore.Refresher =
    t => TokenStore.refresher(
      authServer(tokenUrl, clientId, clientSecret), nowEpochSec())(t)
}
