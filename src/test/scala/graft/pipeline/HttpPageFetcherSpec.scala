package graft.pipeline

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Covers the login/retry/politeness session semantics (E21/E22/X3)
  * against canned transports — no network, same decision logic as the
  * production `JdkHttpTransport` path.
  */
class HttpPageFetcherSpec extends AnyFunSuite {

  private val cfg = FetchConfig(
    loginUrl = "https://example.test/login",
    pageUrlTemplate = "https://example.test/codes/{code}",
    email = "user@example.test", password = "pw",
    maxRetries = 3, backoffMs = 10L)

  /** Scripted transport: records every request, pops one response per
    * call (a Left throws, simulating a transport/socket failure).
    */
  private class Scripted(script: Seq[Either[Exception, HttpResponse]])
      extends HttpTransport {
    val requests = new ArrayBuffer[HttpRequest]
    private var i = 0
    override def send(req: HttpRequest): HttpResponse = {
      requests += req
      val r = script(math.min(i, script.size - 1)); i += 1
      r.fold(throw _, identity)
    }
  }

  private def ok(body: String, cookie: Option[String] = None) =
    Right(HttpResponse(200, body,
      cookie.map(c => Map("Set-Cookie" -> s"$c; Path=/")).getOrElse(Map.empty)))

  private def noSleep: Long => Unit = _ => ()

  test("open() runs the two-step login and carries the session cookie") {
    val t = new Scripted(Seq(
      ok("login page", Some("sid=abc")), // GET login
      ok("step1"),                       // POST email
      ok("logged in"),                   // POST password
      ok("<html>page A0001</html>")))    // subsequent fetch
    val f = new HttpPageFetcher(cfg, t, noSleep)
    f.open()
    assert(f.fetch("A0001") == "<html>page A0001</html>")

    val Seq(get, post1, post2, page) = t.requests.toSeq
    assert(get.method == "GET" && get.url == cfg.loginUrl)
    assert(post1.method == "POST" && post1.body.contains("userProvidedSignInName="))
    assert(post2.method == "POST" && post2.body.contains("password="))
    // cookie from the login page is replayed on every later request
    assert(post1.headers("Cookie") == "sid=abc")
    assert(page.headers("Cookie") == "sid=abc")
  }

  test("open() fails fast when the final login step is rejected") {
    val t = new Scripted(Seq(ok("login"), ok("step1"),
      Right(HttpResponse(302, "",
        Map("Location" -> "https://example.test/login?error=1")))))
    intercept[IllegalStateException] { new HttpPageFetcher(cfg, t, noSleep).open() }
  }

  test("404 pages return their body without retrying (P4/P5 classify them)") {
    val t = new Scripted(Seq(Right(HttpResponse(404, "<div class='container404'/>"))))
    val f = new HttpPageFetcher(cfg, t, noSleep)
    assert(f.fetch("ZZZZ").contains("container404"))
    assert(t.requests.size == 1)
  }

  test("5xx retries with doubling backoff, then succeeds") {
    val sleeps = new ArrayBuffer[Long]
    val t = new Scripted(Seq(
      Right(HttpResponse(503, "")), Right(HttpResponse(503, "")), ok("fine")))
    val f = new HttpPageFetcher(cfg, t, sleeps += _)
    assert(f.fetch("A0001") == "fine")
    assert(sleeps.toSeq == Seq(10L, 20L)) // backoffMs << attempt
  }

  test("transport exceptions are retried; exhaustion throws with context") {
    val boom = Left(new RuntimeException("socket timeout"))
    val t = new Scripted(Seq(boom, boom, boom, boom))
    val f = new HttpPageFetcher(cfg, t, noSleep)
    val e = intercept[IllegalStateException] { f.fetch("A0001") }
    assert(e.getMessage.contains("after 4 attempts"))
    assert(t.requests.size == 4) // 1 + maxRetries
  }

  test("auth loss mid-session triggers exactly one re-login then retries") {
    val t = new Scripted(Seq(
      // fetch 1: session expired -> redirect to login
      Right(HttpResponse(302, "",
        Map("Location" -> "https://example.test/login"))),
      ok("login", Some("sid=new")), ok("s1"), ok("s2"), // re-login
      ok("recovered")))                                 // retried fetch
    val f = new HttpPageFetcher(cfg, t, noSleep)
    assert(f.fetch("A0001") == "recovered")
    assert(t.requests.count(r => r.url == cfg.loginUrl) == 3)
    assert(t.requests.last.headers("Cookie") == "sid=new")
  }

  test("politeness: consecutive fetches sleep to the configured floor") {
    val sleeps = new ArrayBuffer[Long]
    val t = new Scripted(Seq(ok("a"), ok("b")))
    val f = new HttpPageFetcher(cfg.copy(politenessMs = 60000L), t, sleeps += _)
    f.fetch("A0001")
    f.fetch("A0002")
    // second fetch must wait out (most of) the 60s politeness window
    assert(sleeps.nonEmpty && sleeps.last > 55000L)
  }
}
