package graft.engine

import java.util.UUID
import scala.collection.concurrent.TrieMap

/** Token-session store + pluggable service auth — the engine-side
  * counterpart of the reference's session subsystem (K4):
  * `lib/session.js:1-46` (token-keyed mutable variable slots),
  * `index.js:595-639` (`authenticate`: token minting, create-on-miss,
  * per-service credential slot) and `plugins/salesforce.js:16-49`
  * (the `auth(info, cb)` plugin contract with the
  * retry-with-security-token fallback).
  *
  * No HTTP layer by scope (SURVEY §1.4): failures surface as
  * `Left(error)` — the same `{ ok: false, error }` envelope the
  * reference's `sendError` (`index.js:260-262`) emits, in the
  * repo's Either convention.
  *
  * The reference never expires sessions (a leak in a long-lived
  * gateway); here a TTL since last touch is enforced on lookup, with
  * an injectable clock so expiry is testable.
  */
final case class AuthResult(ok: Boolean,
    info: Map[String, String] = Map.empty, error: String = "")

/** Service authenticator — `plugins/<svc>.auth(info, fn)` shape: takes
  * the credential map, returns ok + (possibly augmented) info, which
  * the store stashes in the session's service slot exactly as the
  * reference stores the live connection back into `info`.
  */
trait AuthPlugin {
  def auth(info: Map[String, String]): AuthResult
}

/** Reference-parity credential plugin: validate (username, password);
  * on failure retry ONCE with password + securityToken appended — the
  * Salesforce plugin's two-step login (`plugins/salesforce.js:26-39`:
  * first `sfconn.login(username, password)`, and only in its error
  * callback a second `login(username, password + securityToken)`
  * whose error — the SECOND one — is what reaches the `{ok:false,
  * error}` envelope). The validation function is injected (no external
  * service exists in this container); the attempt protocol — exactly
  * two logins, in that order, second error surfaced — is the part
  * under test (SessionSpec pins the attempt sequence).
  */
final class RetryTokenAuthPlugin(validate: (String, String) => Boolean)
    extends AuthPlugin {
  override def auth(info: Map[String, String]): AuthResult = {
    val user = info.getOrElse("username", "")
    val pass = info.getOrElse("password", "")
    if (validate(user, pass))
      AuthResult(ok = true, info = info + ("authenticated" -> "plain"))
    else {
      val withToken = pass + info.getOrElse("securityToken", "")
      if (validate(user, withToken))
        AuthResult(ok = true, info = info + ("authenticated" -> "token"))
      else AuthResult(ok = false, error = RetryTokenAuthPlugin.invalidLogin)
    }
  }
}

object RetryTokenAuthPlugin {
  /** The error the reference's envelope carries after the second
    * failed attempt: jsforce surfaces Salesforce's canonical
    * INVALID_LOGIN fault, passed through verbatim by
    * `plugins/salesforce.js:31-33`.
    */
  val invalidLogin: String =
    "INVALID_LOGIN: Invalid username, password, security token; or user locked out."
}

/** One token session: mutable key→value slots (`lib/session.js:1-46`
  * — id/get/put/del/has/keys; `get` of a missing key is empty, `put`
  * returns the session for chaining).
  */
final class TokenSession(val id: String) {
  private val vars = TrieMap.empty[String, Any]
  @volatile private[engine] var lastTouchMillis: Long = 0L

  def get(key: String): Option[Any] = vars.get(key)
  def put(key: String, value: Any): TokenSession = { vars.put(key, value); this }
  def del(key: String): TokenSession = { vars.remove(key); this }
  def has(key: String): Boolean = vars.contains(key)
  def keys: Set[String] = vars.keySet.toSet
}

final class SessionStore(ttlMillis: Long = Long.MaxValue,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val sessions = TrieMap.empty[String, TokenSession]
  private val plugins = TrieMap.empty[String, AuthPlugin]

  def register(service: String, plugin: AuthPlugin): Unit =
    plugins.put(service, plugin)

  /** `authenticate` (`index.js:595-639`): mint a token when none is
    * sent; with no service the token is simply acknowledged; with a
    * service, validate via the plugin and store its returned info in
    * the session's service slot (create-on-miss). Error strings match
    * the reference byte-for-byte.
    */
  def authenticate(token: Option[String] = None,
      service: Option[String] = None,
      auth: Option[Map[String, String]] = None): Either[String, String] = {
    val tok = token.getOrElse(UUID.randomUUID().toString)
    service match {
      case None => Right(tok)
      case Some(svc) => plugins.get(svc) match {
        case None => Left(s"""Service "$svc" not found.""")
        case Some(plugin) => auth match {
          case None => Left(s"""Service auth info for "$svc" not sent.""")
          case Some(info) =>
            val r = plugin.auth(info)
            if (r.ok) {
              val s = getOrCreate(tok)
              s.put(svc, r.info)
              Right(tok)
            } else Left(r.error)
        }
      }
    }
  }

  /** Session lookup with TTL: expired sessions are dropped on access
    * (the reference keeps them forever — `sessions[token]` is never
    * cleaned, `index.js:612-621`).
    */
  def session(token: String): Option[TokenSession] =
    sessions.get(token).flatMap { s =>
      if (clock() - s.lastTouchMillis > ttlMillis) {
        sessions.remove(token)
        None
      } else {
        s.lastTouchMillis = clock()
        Some(s)
      }
    }

  private def getOrCreate(token: String): TokenSession =
    session(token).getOrElse {
      val s = new TokenSession(token)
      s.lastTouchMillis = clock()
      sessions.putIfAbsent(token, s).getOrElse(s)
    }

  def size: Int = sessions.size
}
