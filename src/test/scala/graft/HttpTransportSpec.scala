package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{HttpError, HttpTransport, RestSource, TokenStore}

/** The REST/OAuth seams driven over a REAL HTTP socket: an in-process
  * loopback `com.sun.net.httpserver.HttpServer` plays the provider —
  * same endpoints a production deployment talks to, zero egress. This
  * closes the "network edge only ever simulated" gap at the transport
  * layer: the canned in-memory server and the HTTP client satisfy the
  * SAME seam types, and these tests prove the HTTP path produces
  * byte-identical results to the in-memory path. */
class HttpTransportSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val invoiceHits = new AtomicInteger(0)

  private val AccessToken = "tok-fresh-123"
  private val TenantId = "ten-1"
  private val ClientId = "cid"
  private val ClientSecret = "csecret"

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // the invoice lookup endpoint: bearer + tenant headers checked,
    // then the SAME canned catalog the in-memory seam serves
    server.createContext("/invoices", (ex: HttpExchange) => {
      invoiceHits.incrementAndGet()
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val tenant = Option(ex.getRequestHeaders.getFirst("xero-tenant-id"))
      if (!auth.contains(s"Bearer $AccessToken") || !tenant.contains(TenantId))
        respond(ex, 401, """{"error":"unauthorized"}""")
      else respond(ex, 200, RestSource.cannedServer(queryParams(ex)))
    })
    // the OAuth2 token endpoint: refresh_token grant, basic client auth
    server.createContext("/token", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val form = body.split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      val basic = java.util.Base64.getEncoder.encodeToString(
        s"$ClientId:$ClientSecret".getBytes(StandardCharsets.UTF_8))
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Basic $basic") ||
          !form.get("grant_type").contains("refresh_token") ||
          !form.get("refresh_token").contains("rt-old"))
        respond(ex, 400, """{"error":"invalid_grant"}""")
      else respond(ex, 200,
        s"""{"id_token":"id-new","access_token":"$AccessToken",""" +
          """"expires_in":1800,"token_type":"Bearer",""" +
          """"refresh_token":"rt-new","scope":"accounting.transactions"}""")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def httpServer: RestSource.Server =
    HttpTransport.server(s"$base/invoices", AccessToken, TenantId)

  test("invoice lookup over a real socket is byte-identical to the " +
      "in-memory seam (point and range filters)") {
    val overHttp = RestSource
      .fetchInvoices(spark, httpServer, "ACME", "2024-01-16")
      .orderBy("invoiceID").collect().map(_.toSeq).toSeq
    val inMemory = RestSource
      .fetchInvoices(spark, RestSource.cannedServer, "ACME", "2024-01-16")
      .orderBy("invoiceID").collect().map(_.toSeq).toSeq
    assert(overHttp == inMemory && overHttp.nonEmpty)

    val rangeHttp = RestSource.fetchInvoicesRange(
      spark, httpServer, "ACME", "2024-01-15", "2024-01-16")
      .orderBy("invoiceID").collect().map(_.toSeq).toSeq
    val rangeMem = RestSource.fetchInvoicesRange(
      spark, RestSource.cannedServer, "ACME", "2024-01-15", "2024-01-16")
      .orderBy("invoiceID").collect().map(_.toSeq).toSeq
    assert(rangeHttp == rangeMem && rangeHttp.length == 6)
  }

  test("a range fetch is ONE request, not one per date") {
    val before = invoiceHits.get()
    RestSource.fetchInvoicesRange(
      spark, httpServer, "ACME", "2024-01-15", "2024-01-17").count()
    assert(invoiceHits.get() == before + 1)
  }

  test("auth failures surface as HttpError with status + body, not a " +
      "downstream parse mystery") {
    val bad = HttpTransport.server(s"$base/invoices", "tok-WRONG", TenantId)
    val e = intercept[HttpError] {
      RestSource.fetchInvoices(spark, bad, "ACME", "2024-01-16")
    }
    assert(e.status == 401 && e.getMessage.contains("unauthorized"))
  }

  test("token refresh over a real socket: loadFresh refreshes an " +
      "expired set through the OAuth2 grant and persists it") {
    val path = java.nio.file.Files
      .createTempFile("tokenset", ".json").toString
    val expired = TokenStore.TokenSet("id-old", "tok-old", 1000L,
      "Bearer", "rt-old", "accounting.transactions")
    TokenStore.persist(expired, path)
    val now = 5000L
    val refreshed = TokenStore.loadFresh(path, now,
      HttpTransport.refresher(s"$base/token", ClientId, ClientSecret,
        nowEpochSec = () => now))
    assert(refreshed.accessToken == AccessToken)
    assert(refreshed.refreshToken == "rt-new")
    assert(refreshed.expiresAt == now + 1800) // expires_in → expires_at
    // persisted: a reload with the same clock is now fresh — no refresh
    val again = TokenStore.loadFresh(path, now,
      _ => fail("fresh set must not hit the token endpoint"))
    assert(again == refreshed)
  }

  test("a rejected grant (wrong refresh token) fails loudly with the " +
      "provider's error body") {
    val path = java.nio.file.Files
      .createTempFile("tokenset", ".json").toString
    TokenStore.persist(TokenStore.TokenSet("id", "tok", 1000L,
      "Bearer", "rt-STALE", "s"), path)
    val e = intercept[HttpError] {
      TokenStore.loadFresh(path, 5000L,
        HttpTransport.refresher(s"$base/token", ClientId, ClientSecret,
          nowEpochSec = () => 5000L))
    }
    assert(e.status == 400 && e.getMessage.contains("invalid_grant"))
  }
}
