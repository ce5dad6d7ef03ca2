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

  /** GET with url-encoded query params (sorted for a stable request
    * line) → response body; non-2xx throws [[HttpError]]. */
  def get(baseUrl: String, params: Map[String, String],
      headers: Map[String, String] = Map.empty): String = {
    val qs = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
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

  /** [[TokenStore.Refresher]] over real HTTP: the OAuth2
    * `refresh_token` grant with basic client authentication
    * (/root/reference/src/apiFunctions.ts:15-27 `refreshTokenSet` —
    * client id/secret from config, refresh token from the stored set).
    * A token endpoint answers with `expires_in` (a duration); the
    * stored set carries `expires_at` (an instant) — the injected clock
    * does the conversion deterministically. */
  def refresher(tokenUrl: String, clientId: String, clientSecret: String,
      nowEpochSec: () => Long = () => System.currentTimeMillis() / 1000)
      : TokenStore.Refresher = { t =>
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes(StandardCharsets.UTF_8))
    val body = postForm(tokenUrl,
      Map("grant_type" -> "refresh_token", "refresh_token" -> t.refreshToken),
      Map("Authorization" -> s"Basic $basic"))
    val parsed = TokenStore.fromJson(body)
    if (parsed.expiresAt > 0) parsed
    else {
      val expiresIn = "\"expires_in\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(0L)
      parsed.copy(expiresAt = nowEpochSec() + expiresIn)
    }
  }
}
