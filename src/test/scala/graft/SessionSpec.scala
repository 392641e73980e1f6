package graft

import graft.engine.{AuthResult, AuthPlugin, RetryTokenAuthPlugin, SessionStore}
import org.scalatest.funsuite.AnyFunSuite

/** K4 parity: token sessions, create-on-miss auth, credential slots,
  * TTL expiry, and the reference's exact error envelopes
  * (lib/session.js:1-46, index.js:595-639, plugins/salesforce.js:16-49).
  */
class SessionSpec extends AnyFunSuite {

  private def storeWithClock(ttl: Long): (SessionStore, () => Long, Long => Unit) = {
    var now = 1000L
    val store = new SessionStore(ttlMillis = ttl, clock = () => now)
    (store, () => now, (d: Long) => { now += d })
  }

  test("authenticate with no token mints one; no service just acks") {
    val store = new SessionStore()
    val Right(tok) = store.authenticate(): @unchecked
    assert(tok.nonEmpty)
    // no service ⇒ no session is created (reference only stores on auth)
    assert(store.session(tok).isEmpty)
    // caller-provided token is echoed back
    assert(store.authenticate(token = Some("t-1")) == Right("t-1"))
  }

  test("unknown service and missing auth info use the reference's error strings") {
    val store = new SessionStore()
    assert(store.authenticate(service = Some("sforce")) ==
      Left("""Service "sforce" not found."""))
    store.register("sforce", new RetryTokenAuthPlugin((_, _) => true))
    assert(store.authenticate(service = Some("sforce")) ==
      Left("""Service auth info for "sforce" not sent."""))
  }

  test("successful auth creates the session on miss and stores the service slot") {
    val store = new SessionStore()
    store.register("sforce",
      new RetryTokenAuthPlugin((u, p) => u == "ann" && p == "pw"))
    val Right(tok) = store.authenticate(token = Some("tk"),
      service = Some("sforce"),
      auth = Some(Map("username" -> "ann", "password" -> "pw"))): @unchecked
    assert(tok == "tk")
    val s = store.session("tk").get
    assert(s.has("sforce"))
    val info = s.get("sforce").get.asInstanceOf[Map[String, String]]
    assert(info("authenticated") == "plain")
    // re-auth against the SAME token reuses the session (create-on-miss)
    store.register("other", new AuthPlugin {
      def auth(i: Map[String, String]) = AuthResult(ok = true, info = i)
    })
    store.authenticate(Some("tk"), Some("other"), Some(Map.empty))
    assert(store.size == 1 && store.session("tk").get.keys == Set("sforce", "other"))
  }

  test("retry-with-security-token fallback mirrors the salesforce plugin") {
    val plugin = new RetryTokenAuthPlugin((u, p) => p == "pw" + "SECTOK")
    val ok = plugin.auth(Map("username" -> "ann", "password" -> "pw",
      "securityToken" -> "SECTOK"))
    assert(ok.ok && ok.info("authenticated") == "token")
    val bad = plugin.auth(Map("username" -> "ann", "password" -> "nope"))
    assert(!bad.ok && bad.error == RetryTokenAuthPlugin.invalidLogin)
  }

  test("attempt protocol: one login when plain succeeds; exactly two, in order, otherwise") {
    // the reference tries login(password) and only in its error callback
    // login(password + securityToken) — never more (salesforce.js:26-39)
    var attempts = List.empty[String]
    def tracking(accept: String => Boolean) = new RetryTokenAuthPlugin(
      (_, p) => { attempts :+= p; accept(p) })
    val creds = Map("username" -> "ann", "password" -> "pw",
      "securityToken" -> "SECTOK")
    tracking(_ == "pw").auth(creds)
    assert(attempts == List("pw"), "plain success must not retry")
    attempts = Nil
    tracking(_ => false).auth(creds)
    assert(attempts == List("pw", "pwSECTOK"),
      "failure path is exactly plain then password+securityToken")
  }

  test("auth failure surfaces the plugin error envelope, creates no session") {
    val store = new SessionStore()
    store.register("sforce", new RetryTokenAuthPlugin((_, _) => false))
    assert(store.authenticate(Some("tk"), Some("sforce"),
      Some(Map("username" -> "x", "password" -> "y"))) ==
      Left(RetryTokenAuthPlugin.invalidLogin))
    assert(store.session("tk").isEmpty && store.size == 0)
  }

  test("session variable slots behave like lib/session.js") {
    val store = new SessionStore()
    store.register("svc", new AuthPlugin {
      def auth(i: Map[String, String]) = AuthResult(ok = true, info = i)
    })
    store.authenticate(Some("tk"), Some("svc"), Some(Map.empty))
    val s = store.session("tk").get
    assert(s.get("missing").isEmpty)
    s.put("a", 1).put("b", 2)
    assert(s.has("a") && s.get("b").contains(2) && s.keys == Set("svc", "a", "b"))
    s.del("a")
    assert(!s.has("a") && s.get("a").isEmpty)
  }

  test("sessions expire after the TTL and are dropped on access") {
    val (store, _, advance) = storeWithClock(ttl = 100L)
    store.register("svc", new AuthPlugin {
      def auth(i: Map[String, String]) = AuthResult(ok = true, info = i)
    })
    store.authenticate(Some("tk"), Some("svc"), Some(Map.empty))
    advance(50L)
    assert(store.session("tk").isDefined) // touch resets the clock
    advance(99L)
    assert(store.session("tk").isDefined)
    advance(101L)
    assert(store.session("tk").isEmpty, "expired session must be gone")
    assert(store.size == 0, "expired session must be removed from the store")
    // re-auth after expiry creates a fresh session
    store.authenticate(Some("tk"), Some("svc"), Some(Map.empty))
    assert(store.session("tk").get.keys == Set("svc"))
  }
}
