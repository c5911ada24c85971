package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.ingest.BatchPipeline._
import graft.ingest.Parsers.CsvSpec
import graft.ingest.RestSink
import graft.ingest.RestSink.RestOptions

/** P11/P15 — REST sink fidelity against a local HTTP stub: URL/method/header
  * assembly, 200-vs-not routing, throttle pacing and concurrency bounds,
  * and the reference's fatal config errors. E2E replays the reference's own
  * `test/batch-100.csv` through `BatchJob.processFile` with a REST channel
  * whose success/failure mix drives the run summary, mirroring the
  * 550/450-style mixed outcome of `README.md:362-364`.
  */
class RestSinkSpec extends SparkTestBase {

  /** Tiny stub server; `fail` decides per-body whether to return 500. */
  private def withServer(fail: String => Boolean)(run: (String, ServerState) => Unit): Unit = {
    val state = new ServerState
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16))
    server.createContext("/", (ex: HttpExchange) => {
      val inFlight = state.inFlight.incrementAndGet()
      state.peak.updateAndGet(p => math.max(p, inFlight))
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        state.record(ex, body)
        Thread.sleep(state.delayMillis)
        val code = if (fail(body)) 500 else 200
        val resp = (if (code == 200) """{"ok":true}""" else """{"error":"boom"}""").getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      } finally state.inFlight.decrementAndGet()
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", state)
    finally server.stop(0)
  }

  private class ServerState {
    val inFlight = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    @volatile var delayMillis = 0L
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String, String)]()
    def record(ex: HttpExchange, body: String): Unit =
      requests.add((ex.getRequestMethod,
        ex.getRequestURI.toString,
        ex.getRequestHeaders.getFirst("Cookie"),
        body))
  }

  private def csvLines(n: Int): org.apache.spark.sql.Dataset[graft.ingest.RecData] =
    fromLines(spark, (1 to n).map(i => f"B$i%04d,C$i%04d"), "rest-test.csv")

  test("REST sink: URL/method/headers assembled per the reference precedence") {
    withServer(_ => false) { (base, state) =>
      val routed = route(parseCsv(csvLines(5), CsvSpec(headers = Vector("key", "value"))))
      val res = RestSink.send(successes(routed), col("_rec_id"), to_json(struct(col("key"), col("value"))),
        RestOptions(appBaseUrl = Some(base), modelApi = Some("api/TestData"), method = Some("post"),
          headers = Map("custom-header1" -> "custom-header-value1"),
          accessToken = Some("tok123"), minTimeMillis = 0),
        env = Map.empty).collect()
      assert(res.length == 5 && res.forall(_.status_text == "SUCCESS"))
      val reqs = state.requests.toArray(Array.empty[(String, String, String, String)])
      assert(reqs.forall(_._1 == "POST"), "method uppercased like the reference's request lib")
      assert(reqs.forall(_._2 == "/api/TestData?access_token=tok123"),
        "leading slash inserted + access_token query param (js:648)")
      assert(reqs.forall(_._3 != null), "default Cookie header always present (js:657)")
      assert(reqs.forall(r => r._4.contains("\"key\":\"B000")), "JSON body posted")
    }
  }

  test("REST sink: env var overrides options for base URL and api (js:610,634)") {
    withServer(_ => false) { (base, state) =>
      RestSink.send(
        successes(route(parseCsv(csvLines(2), CsvSpec(headers = Vector("key", "value"))))),
        col("_rec_id"), lit("{}"),
        RestOptions(appBaseUrl = Some("http://wrong-host:1"), modelApi = Some("/wrongApi"),
          method = Some("PUT"), minTimeMillis = 0),
        env = Map("APP_BASE_URL" -> base, "MODEL_API" -> "/envApi")).collect()
      val reqs = state.requests.toArray(Array.empty[(String, String, String, String)])
      assert(reqs.nonEmpty && reqs.forall(_._2 == "/envApi"), "env precedence must win")
    }
  }

  test("REST sink: missing modelAPI / appBaseURL / method are job-fatal with reference text") {
    val e1 = intercept[IllegalArgumentException] {
      RestSink.resolveUrl(RestOptions(appBaseUrl = Some("http://x")), env = Map.empty)
    }
    assert(e1.getMessage.contains("modelAPI is neither specified in environment variable"))
    val e2 = intercept[IllegalArgumentException] {
      RestSink.resolveUrl(RestOptions(modelApi = Some("/api")), env = Map.empty)
    }
    assert(e2.getMessage.contains("appBaseURL is not specified in env variable (APP_BASE_URL)"))
    val e3 = intercept[IllegalArgumentException] { RestSink.resolveMethod(RestOptions()) }
    assert(e3.getMessage.contains("method is neither specified"))
  }

  test("REST sink: minTime throttle paces request starts (P15)") {
    withServer(_ => false) { (base, _) =>
      val routed = route(parseCsv(csvLines(20), CsvSpec(headers = Vector("key", "value"))))
      val t0 = System.nanoTime()
      val res = RestSink.send(successes(routed).coalesce(1), col("_rec_id"), lit("{}"),
        RestOptions(appBaseUrl = Some(base), modelApi = Some("/api"), method = Some("POST"),
          minTimeMillis = 7, maxConcurrent = 79), // distinct config => fresh limiter state
        env = Map.empty).collect()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(res.length == 20)
      assert(elapsedMs >= 19 * 7 * 0.7, f"20 records at minTime=7ms took only $elapsedMs%.0f ms")
    }
  }

  test("REST sink: maxConcurrent bounds in-flight requests (P15)") {
    withServer(_ => false) { (base, state) =>
      state.delayMillis = 30
      val routed = route(parseCsv(csvLines(24), CsvSpec(headers = Vector("key", "value"))))
      val res = RestSink.send(successes(routed).repartition(8), col("_rec_id"), lit("{}"),
        RestOptions(appBaseUrl = Some(base), modelApi = Some("/api"), method = Some("POST"),
          minTimeMillis = 0, maxConcurrent = 2),
        env = Map.empty).collect()
      assert(res.length == 24)
      assert(state.peak.get() <= 2, s"peak in-flight ${state.peak.get()} exceeded maxConcurrent=2")
    }
  }

  test("auth: env > login > ctx token precedence; login posts creds with tenant header (P19)") {
    import graft.ingest.RestSink.AuthCtx
    withServer(_ => false) { (base, state) =>
      // stub login endpoint lives on the same server; handler already
      // records method/uri/body. Return {"id": ...} like the reference app.
      val loginServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      loginServer.createContext("/", (ex: HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        state.record(ex, body)
        val ok = body.contains("\"username\":\"alice\"") && body.contains("\"password\":\"pw\"")
        val resp = (if (ok) """{"id":"tok-from-login","ttl":1209600}""" else """{"error":{"status":401}}""")
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(if (ok) 200 else 401, resp.length)
        ex.getResponseBody.write(resp); ex.close()
      })
      loginServer.start()
      val loginBase = s"http://127.0.0.1:${loginServer.getAddress.getPort}"
      try {
        // 1. env wins outright, no HTTP call
        assert(RestSink.resolveAccessToken(AuthCtx(username = Some("alice")), Some(loginBase),
          env = Map("ACCESS_TOKEN" -> "tok-env")).contains("tok-env"))
        // 2. username triggers login at the default AppUsers API
        val before = state.requests.size
        val tok = RestSink.resolveAccessToken(
          AuthCtx(username = Some("alice"), password = Some("pw"), tenantId = Some("t1")),
          Some(loginBase), env = Map.empty)
        assert(tok.contains("tok-from-login"))
        val req = state.requests.toArray(Array.empty[(String, String, String, String)]).last
        assert(state.requests.size == before + 1)
        assert(req._1 == "POST" && req._2 == "/api/AppUsers/login")
        assert(req._3 != null, "default Cookie header on the login request too")
        // 3. BATCH_PROCESSING_LOGIN_URL overrides the login API path
        RestSink.resolveAccessToken(AuthCtx(username = Some("alice"), password = Some("pw")),
          Some(loginBase), env = Map("BATCH_PROCESSING_LOGIN_URL" -> "/custom/login"))
        val req2 = state.requests.toArray(Array.empty[(String, String, String, String)]).last
        assert(req2._2 == "/custom/login")
        // 4. bad credentials are job-fatal with the reference's NET-observable
        // message: a 401 login rejection aborts with the credentials text
        // (test/test.js:212-225 asserts exactly this substring)
        val e = intercept[RuntimeException] {
          RestSink.resolveAccessToken(
            AuthCtx(username = Some("alice"), password = Some("wrong")), Some(loginBase), env = Map.empty)
        }
        assert(e.getMessage.contains("Check access_token/credentials. Expired/Wrong/Missing?."))
        // 5. no username: plain ctx token pass-through
        assert(RestSink.resolveAccessToken(AuthCtx(accessToken = Some("tok-ctx")), None, env = Map.empty)
          .contains("tok-ctx"))
        // 6. username but no appBaseURL anywhere: the :456 fatal
        val e2 = intercept[IllegalArgumentException] {
          RestSink.resolveAccessToken(AuthCtx(username = Some("alice")), None, env = Map.empty)
        }
        assert(e2.getMessage.contains("Can't defer this to payload when username is specified"))
      } finally loginServer.stop(0)
    }
  }

  test("processFile E2E: batch-100.csv through the REST channel, mixed 200/500 counts") {
    // fail every record whose numeric suffix is even -> 50/50 mix, the same
    // mixed-outcome shape as the reference's 1000-record run (550/450).
    withServer(body => "\"key\":\"B\\d*[02468]\"".r.findFirstIn(body).isDefined) { (base, state) =>
      val out = java.nio.file.Files.createTempDirectory("rest-e2e").toString
      val summary = BatchJob.processFile(
        spark, "/root/reference/test/batch-100.csv",
        BatchJob.Parser.Csv(CsvSpec(headers = Vector("key", "value"))),
        BatchJob.Sinks(
          statusPath = Some(s"$out/status"),
          runPath = Some(s"$out/run"),
          rest = Some(RestOptions(appBaseUrl = Some(base), modelApi = Some("/api/TestData"),
            method = Some("POST"), minTimeMillis = 0))))
      assert(summary.totalRecordCount == 100)
      assert(summary.successCount == 50, s"expected 50 HTTP 200s, got $summary")
      assert(summary.failureCount == 50)
      assert(state.requests.size == 100, "every parsed record POSTed exactly once")
      val status = spark.read.parquet(s"$out/status")
      assert(status.filter(col("status_code") === 200).count() == 50)
      assert(status.filter(col("status_code") === 500).count() == 50)
      assert(status.filter(col("status_text") === "FAILED" && col("error").isNotNull).count() == 50)
    }
  }
}
