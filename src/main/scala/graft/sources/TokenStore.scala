package graft.sources

import java.nio.file.{Files, Paths}

/** OAuth2 token-set lifecycle — the reference's auth control plane
  * re-expressed as a pluggable driver-side store:
  * load → validate required fields → refresh when expired → persist
  * (/root/reference/src/helpers.ts:128-151 `writeTokenSetJson`,
  * /root/reference/src/apiFunctions.ts:15-27 `refreshTokenSet`,
  * /root/reference/src/auth.ts:13-38 initial consent).
  *
  * The network edge (`Refresher`) and the clock are injected — tests
  * and the harness use deterministic fakes; production plugs the OAuth
  * client. Nothing here touches executors: token state is driver
  * config, never a DataFrame.
  *
  * The initial consent flow (auth.ts: build consent URL, user pastes
  * the callback) is interactive by nature; [[consentUrl]] builds the
  * URL, the redemption POST lives behind the same Refresher seam.
  */
object TokenStore {

  final case class TokenSet(idToken: String, accessToken: String,
      expiresAt: Long, tokenType: String, refreshToken: String,
      scope: String)

  /** refresh_token → fresh TokenSet (the OAuth refresh POST). */
  type Refresher = TokenSet => TokenSet

  final class InvalidTokenSetException(msg: String)
    extends IllegalStateException(msg)

  /** The reference's required-field validation (helpers.ts:130-140):
    * every field present and non-empty or throw. */
  def validate(t: TokenSet): TokenSet = {
    val missing = Seq(
      "id_token" -> t.idToken, "access_token" -> t.accessToken,
      "token_type" -> t.tokenType, "refresh_token" -> t.refreshToken,
      "scope" -> t.scope)
      .collect { case (k, v) if v == null || v.isEmpty => k } ++
      (if (t.expiresAt <= 0) Seq("expires_at") else Nil)
    if (missing.nonEmpty)
      throw new InvalidTokenSetException(
        s"TokenSet is missing required fields: ${missing.mkString(", ")}")
    t
  }

  /** Declaration-ordered compact JSON (stable for tests and diffs). */
  def toJson(t: TokenSet): String =
    s"""{"id_token":"${t.idToken}","access_token":"${t.accessToken}",""" +
      s""""expires_at":${t.expiresAt},"token_type":"${t.tokenType}",""" +
      s""""refresh_token":"${t.refreshToken}","scope":"${t.scope}"}"""

  private def field(json: String, key: String): Option[String] = {
    val str = ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r
    val num = ("\"" + key + "\"\\s*:\\s*(-?\\d+)").r
    str.findFirstMatchIn(json).map(_.group(1))
      .orElse(num.findFirstMatchIn(json).map(_.group(1)))
  }

  /** Parse the fixed-shape token JSON (explicit fields, never inferred
    * — same stance as the REST sources). */
  def fromJson(json: String): TokenSet = TokenSet(
    idToken = field(json, "id_token").getOrElse(""),
    accessToken = field(json, "access_token").getOrElse(""),
    expiresAt = field(json, "expires_at").map(_.toLong).getOrElse(0L),
    tokenType = field(json, "token_type").getOrElse(""),
    refreshToken = field(json, "refresh_token").getOrElse(""),
    scope = field(json, "scope").getOrElse(""))

  /** Validate-then-write (helpers.ts:128-151: an invalid set must never
    * reach disk). */
  def persist(t: TokenSet, path: String): Unit = {
    validate(t)
    Files.writeString(Paths.get(path), toJson(t))
  }

  /** Load the current set; when expired (against the injected clock),
    * refresh through the seam and persist the new set before returning
    * it — the reference's refreshTokenSet + writeTokenSetJson cycle. */
  def loadFresh(path: String, nowEpochSec: Long,
      refresh: Refresher): TokenSet = {
    val t = validate(fromJson(Files.readString(Paths.get(path))))
    if (t.expiresAt > nowEpochSec) t
    else {
      val fresh = validate(refresh(t))
      persist(fresh, path)
      fresh
    }
  }

  /** The consent URL of the initial-authorization flow (auth.ts:20-28).
    * `state` is the CSRF nonce echoed back on the callback; pass one
    * and verify it in [[parseCallback]] (an attacker-forged callback
    * URL pasted into the bootstrap would otherwise bind someone
    * else's authorization code to this store). */
  def consentUrl(clientId: String, redirectUri: String,
      scopes: Seq[String], state: Option[String] = None): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    "https://login.xero.com/identity/connect/authorize" +
      s"?response_type=code&client_id=${enc(clientId)}" +
      s"&redirect_uri=${enc(redirectUri)}&scope=${enc(scopes.mkString(" "))}" +
      state.map(s => s"&state=${enc(s)}").getOrElse("")
  }

  /** Capture the consent callback — the auth.ts readline step: the
    * user opens [[consentUrl]] in a browser, authorizes, and pastes
    * the full redirect URL back; this extracts the authorization code.
    * A provider `error` parameter (denied consent, bad scope) and a
    * `state` mismatch both fail loudly — a silent empty code would
    * surface later as an opaque token-endpoint 400. */
  def parseCallback(callbackUrl: String,
      expectedState: Option[String] = None): String = {
    def param(k: String): Option[String] =
      ("[?&]" + k + "=([^&#]*)").r.findFirstMatchIn(callbackUrl)
        .map(m => java.net.URLDecoder.decode(m.group(1), "UTF-8"))
    param("error").foreach { e =>
      throw new InvalidTokenSetException(
        s"consent callback carries error=$e" +
          param("error_description").fold("")(d => s" ($d)"))
    }
    expectedState.foreach { want =>
      val got = param("state")
      if (!got.contains(want))
        throw new InvalidTokenSetException(
          s"consent callback state mismatch: expected $want, " +
            s"got ${got.getOrElse("<absent>")} — possible CSRF, discard")
    }
    param("code").filter(_.nonEmpty).getOrElse(
      throw new InvalidTokenSetException(
        "consent callback has no authorization code"))
  }

  /** The whole initial-consent bootstrap in one call — auth.ts's
    * newAuth end-to-end minus the interactive pause: parse the pasted
    * callback, redeem the code, persist the generation-1 set. Returns
    * the set [[loadFresh]] will pick up from `path` from here on. */
  def bootstrap(server: AuthServer, callbackUrl: String,
      redirectUri: String, path: String, nowEpochSec: Long,
      expectedState: Option[String] = None): TokenSet = {
    val t = redeemCode(server, parseCallback(callbackUrl, expectedState),
      redirectUri, nowEpochSec)
    persist(t, path)
    t
  }

  // ── token-endpoint transport (canned fixture, RestSource-style) ──────

  /** Token-endpoint POST: form params → JSON response body. Tests and
    * the harness inject [[cannedAuthServer]]; production plugs an HTTP
    * client — the same pluggable-transport stance as
    * [[RestSource.Server]]. */
  type AuthServer = Map[String, String] => String

  /** A real token endpoint answers with a RELATIVE `expires_in`; the
    * stored set carries the absolute `expires_at` (helpers.ts writes
    * what auth.ts/apiFunctions.ts computed). A response WITHOUT
    * `expires_in` fails loudly: defaulting it to 0 would persist an
    * already-expired set that validate() accepts (expires_at = now > 0)
    * and every later loadFresh silently re-fires the refresh grant —
    * perpetual refresh churn, and a lockout under rotate-and-invalidate
    * refresh tokens. */
  private def parseTokenResponse(json: String, nowEpochSec: Long): TokenSet =
    TokenSet(
      idToken = field(json, "id_token").getOrElse(""),
      accessToken = field(json, "access_token").getOrElse(""),
      expiresAt = nowEpochSec +
        field(json, "expires_in").map(_.toLong).getOrElse(
          throw new InvalidTokenSetException(
            "token response has no expires_in")),
      tokenType = field(json, "token_type").getOrElse(""),
      refreshToken = field(json, "refresh_token").getOrElse(""),
      scope = field(json, "scope").getOrElse(""))

  /** Redeem the consent-callback code for the initial token set — the
    * auth.ts:29-38 `apiCallback` exchange as one POST. */
  def redeemCode(server: AuthServer, code: String, redirectUri: String,
      nowEpochSec: Long): TokenSet =
    validate(parseTokenResponse(server(Map(
      "grant_type" -> "authorization_code",
      "code" -> code,
      "redirect_uri" -> redirectUri)), nowEpochSec))

  /** The refresh POST (apiFunctions.ts:15-27 `refreshTokenSet`) as a
    * [[Refresher]] — plugs straight into [[loadFresh]]. */
  def refresher(server: AuthServer, nowEpochSec: Long): Refresher =
    old => parseTokenResponse(server(Map(
      "grant_type" -> "refresh_token",
      "refresh_token" -> old.refreshToken)), nowEpochSec)

  /** Canned in-memory token endpoint — deterministic, stateless:
    * redeeming any code yields generation 1; refreshing `ref-N` yields
    * generation N+1 with a ROTATED refresh token (like the real
    * endpoint: the old refresh token is spent). */
  def cannedAuthServer(params: Map[String, String]): String = {
    val gen = params("grant_type") match {
      case "authorization_code" => 1
      case "refresh_token" => params("refresh_token").split("-").last.toInt + 1
      case g => throw new IllegalArgumentException(s"unsupported grant_type: $g")
    }
    s"""{"id_token":"idt-$gen","access_token":"acc-$gen","expires_in":1800,
       |"token_type":"Bearer","refresh_token":"ref-$gen",
       |"scope":"accounting.transactions offline_access"}"""
      .stripMargin.replace("\n", "")
  }
}
