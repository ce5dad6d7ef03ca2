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

  /** The consent URL of the initial-authorization flow (auth.ts:20-28). */
  def consentUrl(clientId: String, redirectUri: String,
      scopes: Seq[String]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    "https://login.xero.com/identity/connect/authorize" +
      s"?response_type=code&client_id=${enc(clientId)}" +
      s"&redirect_uri=${enc(redirectUri)}&scope=${enc(scopes.mkString(" "))}"
  }
}
