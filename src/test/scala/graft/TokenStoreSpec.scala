package graft

import java.nio.file.{Files, Paths}
import graft.sources.TokenStore
import graft.sources.TokenStore.TokenSet
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side auth control plane: validation, refresh-on-expiry with
  * persist, round-trip JSON, tenant selection. No SparkSession — token
  * state never touches the data plane. */
class TokenStoreSpec extends AnyFunSuite {

  private val good = TokenSet("idt-1", "acc-1", 2000L, "Bearer", "ref-1",
    "accounting.transactions offline_access")

  test("validate: all required fields or throw, naming the gaps") {
    assert(TokenStore.validate(good) eq good)
    val e = intercept[TokenStore.InvalidTokenSetException] {
      TokenStore.validate(good.copy(refreshToken = "", expiresAt = 0))
    }
    assert(e.getMessage.contains("refresh_token"))
    assert(e.getMessage.contains("expires_at"))
  }

  test("json round-trip is lossless") {
    assert(TokenStore.fromJson(TokenStore.toJson(good)) == good)
  }

  test("loadFresh: valid unexpired set returns as-is, no refresh call") {
    val p = Files.createTempFile("tok", ".json").toString
    TokenStore.persist(good, p)
    var called = 0
    val t = TokenStore.loadFresh(p, nowEpochSec = 1000L,
      refresh = { _ => called += 1; good })
    assert(t == good && called == 0)
  }

  test("loadFresh: expired set refreshes through the seam and persists") {
    val p = Files.createTempFile("tok", ".json").toString
    TokenStore.persist(good, p)
    val renewed = good.copy(accessToken = "acc-2", expiresAt = 9999L,
      refreshToken = "ref-2")
    val t = TokenStore.loadFresh(p, nowEpochSec = 5000L, refresh = { old =>
      assert(old == good) // the refresh request carries the old set
      renewed
    })
    assert(t == renewed)
    // the new set reached disk (the reference persists BEFORE returning)
    assert(TokenStore.fromJson(Files.readString(Paths.get(p))) == renewed)
  }

  test("loadFresh: a refresher returning an invalid set never persists") {
    val p = Files.createTempFile("tok", ".json").toString
    TokenStore.persist(good, p)
    intercept[TokenStore.InvalidTokenSetException] {
      TokenStore.loadFresh(p, nowEpochSec = 5000L,
        refresh = _ => good.copy(accessToken = "", expiresAt = 9999L))
    }
    // old set still on disk, uncorrupted
    assert(TokenStore.fromJson(Files.readString(Paths.get(p))) == good)
  }

  test("consent url carries client, redirect, joined scopes, and state") {
    val u = TokenStore.consentUrl("cid", "https://cb/x",
      Seq("accounting.transactions", "offline_access"), Some("xyz z"))
    assert(u.contains("client_id=cid"))
    assert(u.contains("redirect_uri=https%3A%2F%2Fcb%2Fx"))
    assert(u.contains("scope=accounting.transactions+offline_access"))
    assert(u.contains("state=xyz+z"))
    // state omitted -> no dangling parameter
    assert(!TokenStore.consentUrl("cid", "https://cb/x", Seq("s"))
      .contains("state="))
  }

  test("parseCallback: code extracted, decoded, and guarded") {
    // happy path: code + state, URL-encoded code decodes
    assert(TokenStore.parseCallback(
      "https://cb/x?code=ab%2Fcd&state=n1", Some("n1")) == "ab/cd")
    // code in any parameter position
    assert(TokenStore.parseCallback(
      "https://cb/x?state=n1&code=k9", Some("n1")) == "k9")
    // state mismatch and absent state both refuse
    for (url <- Seq("https://cb?code=k&state=evil", "https://cb?code=k")) {
      val e = intercept[TokenStore.InvalidTokenSetException] {
        TokenStore.parseCallback(url, Some("n1"))
      }
      assert(e.getMessage.contains("state mismatch"))
    }
    // provider error parameter surfaces with its description
    val e = intercept[TokenStore.InvalidTokenSetException] {
      TokenStore.parseCallback(
        "https://cb?error=access_denied&error_description=user%20said%20no")
    }
    assert(e.getMessage.contains("access_denied"))
    assert(e.getMessage.contains("user said no"))
    // no code at all
    intercept[TokenStore.InvalidTokenSetException] {
      TokenStore.parseCallback("https://cb?state=n1", Some("n1"))
    }
  }

  test("full lifecycle e2e: consent redemption -> persist -> expiry -> " +
      "refresh -> persisted rotation") {
    val p = Files.createTempFile("tok-e2e", ".json").toString

    // initial consent: URL built (with CSRF state), the user "pastes"
    // the canned callback, bootstrap parses + redeems through the
    // canned transport (auth.ts:13-38) and persists generation 1
    assert(TokenStore.consentUrl("cid", "https://cb", Seq("s"),
      state = Some("n0nce")).contains("response_type=code"))
    val t1 = TokenStore.bootstrap(TokenStore.cannedAuthServer,
      callbackUrl = "https://cb?code=consent-code&state=n0nce",
      redirectUri = "https://cb", path = p, nowEpochSec = 1000L,
      expectedState = Some("n0nce"))
    assert(t1.accessToken == "acc-1" && t1.refreshToken == "ref-1")
    assert(t1.expiresAt == 1000L + 1800L) // expires_in -> absolute
    assert(TokenStore.fromJson(Files.readString(Paths.get(p))) == t1)

    // before expiry: load returns the same set, no token-endpoint call
    val live = TokenStore.loadFresh(p, nowEpochSec = 2000L,
      refresh = TokenStore.refresher(TokenStore.cannedAuthServer, 2000L))
    assert(live == t1)

    // past expiry: refresh POST through the same transport; generation 2
    // (ROTATED refresh token) returned and persisted before returning
    val t2 = TokenStore.loadFresh(p, nowEpochSec = 9000L,
      refresh = TokenStore.refresher(TokenStore.cannedAuthServer, 9000L))
    assert(t2.accessToken == "acc-2" && t2.refreshToken == "ref-2")
    assert(t2.expiresAt == 9000L + 1800L)
    assert(TokenStore.fromJson(Files.readString(Paths.get(p))) == t2)

    // the NEXT expiry refreshes with the rotated token -> generation 3
    val t3 = TokenStore.loadFresh(p, nowEpochSec = 20000L,
      refresh = TokenStore.refresher(TokenStore.cannedAuthServer, 20000L))
    assert(t3.refreshToken == "ref-3")
    assert(TokenStore.fromJson(Files.readString(Paths.get(p))) == t3)
  }

  test("activeTenant: entity index picks; empty list is a hard error") {
    // reference index mapping: pw→1, wb→0 (helpers.ts:36-44)
    assert(Config.activeTenant("pw", Seq("t0", "t1")) == "t1")
    assert(Config.activeTenant("wb", Seq("t0", "t1")) == "t0")
    intercept[Config.NoTenantsException] {
      Config.activeTenant("pw", Nil)
    }
  }

  test("a token response without expires_in fails loudly instead of " +
      "persisting an already-expired set") {
    val noExpiry: TokenStore.AuthServer = _ =>
      """{"id_token":"i","access_token":"a","token_type":"Bearer",
        |"refresh_token":"r","scope":"s"}""".stripMargin.replace("\n", "")
    val e = intercept[TokenStore.InvalidTokenSetException] {
      TokenStore.refresher(noExpiry, 5000L)(
        TokenStore.TokenSet("i", "a", 1L, "Bearer", "old", "s"))
    }
    assert(e.getMessage.contains("expires_in"))
    // a QUOTED expires_in (providers do this) still parses
    val quoted: TokenStore.AuthServer = _ =>
      """{"id_token":"i","access_token":"a","expires_in":"1800",
        |"token_type":"Bearer","refresh_token":"r","scope":"s"}"""
        .stripMargin.replace("\n", "")
    assert(TokenStore.refresher(quoted, 5000L)(
      TokenStore.TokenSet("i", "a", 1L, "Bearer", "old", "s"))
      .expiresAt == 6800L)
  }
}
