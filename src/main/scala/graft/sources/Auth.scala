package graft.sources

/** OAuth-style transport policy for REST sources (SURVEY §2.1 S6): the
  * reference's QuickBooks client caches a bearer token obtained from a
  * refresh-token exchange (reference `quickbooks.py:43-59`) and, on a 401,
  * refreshes once and retries the request before propagating the failure
  * (reference `quickbooks.py:76-78`). The exchange itself is network I/O —
  * injected as a function here (zero-egress harness; a production
  * implementation supplies the HTTP POST).
  */
final class UnauthorizedException(msg: String) extends RuntimeException(msg)

/** Token cache + retry-once-on-401 wrapper.
  *
  * `refreshToken` is the injectable token exchange. The cached token is
  * `@transient`: it never ships in a task closure — each executor performs
  * its own exchange on first use, exactly as connections are opened
  * executor-side in [[graft.sources.v2.PageFetcher]].
  *
  * The cache is a raw nullable String, NOT an `Option`: Java serialization
  * resets transient fields to their JVM default (null) without re-running
  * the initializer, so a deserialized copy must treat null as "no token",
  * which a raw field does for free (an `Option`-typed field would NPE on
  * first executor-side use).
  */
final class AuthRetryPolicy(refreshToken: () => String) extends Serializable {
  @transient private var cached: String = _

  /** Current bearer token, exchanging once and caching (reference
    * `quickbooks.py:43-50`: reuse until invalid). */
  def token(): String = synchronized {
    if (cached == null) cached = refreshToken()
    cached
  }

  def invalidate(): Unit = synchronized { cached = null }

  /** Run `call` with a token; on [[UnauthorizedException]] refresh ONCE and
    * retry; a second 401 (or any other failure) propagates — byte-for-byte
    * the reference's `quickbooks.py:76-78` control flow. */
  def apply[A](call: String => A): A =
    try call(token())
    catch {
      case _: UnauthorizedException =>
        invalidate()
        call(token())
    }
}

/** [[graft.sources.v2.PageFetcher]]-shaped composition: a raw token-taking
  * transport wrapped with the auth/retry policy, pluggable anywhere a
  * `Map[String, String] => Seq[String]` page fetch goes ([[RestSource]],
  * the DSv2 reader's fetcher seam). */
final class AuthedFetch(policy: AuthRetryPolicy,
                        raw: (String, Map[String, String]) => Seq[String])
    extends (Map[String, String] => Seq[String]) with Serializable {
  override def apply(params: Map[String, String]): Seq[String] =
    policy(tok => raw(tok, params))
}
