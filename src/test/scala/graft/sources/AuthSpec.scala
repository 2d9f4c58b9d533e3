package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-driven proof of the reference's token-refresh + retry-once-on-401
  * transport contract (quickbooks.py:43-59,76-78). */
class AuthSpec extends AnyFunSuite {

  test("token is exchanged once and cached across calls") {
    var exchanges = 0
    val policy = new AuthRetryPolicy(() => { exchanges += 1; s"tok$exchanges" })
    val f = new AuthedFetch(policy, (tok, params) => Seq(s"$tok:${params("page")}"))
    assert(f(Map("page" -> "1")) == Seq("tok1:1"))
    assert(f(Map("page" -> "2")) == Seq("tok1:2"))
    assert(exchanges == 1)
  }

  test("401 triggers exactly one refresh and one retry, then succeeds") {
    var exchanges = 0
    var calls = 0
    val policy = new AuthRetryPolicy(() => { exchanges += 1; s"tok$exchanges" })
    // tok1 is stale: the server rejects it; tok2 works.
    val f = new AuthedFetch(policy, (tok, params) => {
      calls += 1
      if (tok == "tok1") throw new UnauthorizedException("401")
      Seq(s"$tok:${params("page")}")
    })
    assert(f(Map("page" -> "7")) == Seq("tok2:7"))
    assert(exchanges == 2, "one initial exchange + one refresh")
    assert(calls == 2, "one failed call + one retry")
  }

  test("a second 401 propagates (retry once, not forever)") {
    var calls = 0
    val policy = new AuthRetryPolicy(() => "always-stale")
    val f = new AuthedFetch(policy, (_, _) => {
      calls += 1
      throw new UnauthorizedException("401")
    })
    intercept[UnauthorizedException] { f(Map("page" -> "1")) }
    assert(calls == 2, "exactly one retry before propagating")
  }

  test("non-auth failures propagate immediately without refresh") {
    var exchanges = 0
    val policy = new AuthRetryPolicy(() => { exchanges += 1; "tok" })
    val f = new AuthedFetch(policy,
      (_, _) => throw new IllegalStateException("boom"))
    intercept[IllegalStateException] { f(Map("page" -> "1")) }
    assert(exchanges == 1, "no refresh on non-401 failures")
  }

  test("java-serialization round-trip: deserialized copy exchanges on first use (no NPE)") {
    // The executor path the Scaladoc promises: the policy ships in a task
    // closure, the @transient cache resets to null, and the copy must do its
    // own exchange instead of NPE-ing. Counter lives in a static object so the
    // deserialized closure increments the same count in this JVM.
    AuthSpec.exchanges.set(0)
    val policy = new AuthRetryPolicy(AuthSpec.countingRefresh)
    assert(policy.token() == "tok1")
    assert(policy.token() == "tok1", "driver-side cache reused")

    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bytes)
    out.writeObject(policy)
    out.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
    val copy = in.readObject().asInstanceOf[AuthRetryPolicy]

    assert(copy.token() == "tok2", "deserialized copy performs its own exchange")
    assert(copy.token() == "tok2", "…exactly once: the copy then caches")
    assert(AuthSpec.exchanges.get() == 2, "one exchange per JVM-side copy")
  }

  test("policy composes with RestSource's page loop") {
    val policy = new AuthRetryPolicy(() => "fresh")
    var sawStale = false
    val f = new AuthedFetch(policy, (tok, params) => {
      if (tok != "fresh") { sawStale = true; throw new UnauthorizedException("401") }
      val p = params("page").toInt
      if (p <= 2) Seq(s"""{"p":$p}""") else Seq.empty
    })
    val src = new RestSource(EndpointSpec("fixture"), f)
    assert(src.fetchAll().toSeq == Seq("""{"p":1}""", """{"p":2}"""))
    assert(!sawStale)
  }
}

object AuthSpec {
  val exchanges = new java.util.concurrent.atomic.AtomicInteger(0)
  // A SAM instance rather than a lambda capturing the suite, so the policy's
  // closure serializes cleanly (mirrors how a production exchange would ship).
  val countingRefresh: () => String = new (() => String) with Serializable {
    override def apply(): String = s"tok${exchanges.incrementAndGet()}"
  }
}
