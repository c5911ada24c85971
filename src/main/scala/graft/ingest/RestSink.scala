package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.{ConcurrentHashMap, Semaphore}

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** P11 — the reference's per-record REST output channel
  * (`lib/batchProcessing.js:666-700`), re-expressed as a `mapPartitions`
  * sink with one pooled HTTP client per partition, plus P15's rate
  * limiting (`:87-91`: Bottleneck `maxConcurrent`/`minTime`).
  *
  * Fidelity points mirrored from the reference:
  *   - URL assembly `appBaseURL + '/' + modelAPI + '?access_token=...'`
  *     with precedence env > options for base/api/token
  *     (`:610,634,648`; the per-record payload override level collapses
  *     into the job level here because the payload is engine-built);
  *   - method from options (`:649`), default `Cookie` header plus
  *     additional headers (`:657-663`);
  *   - 10 s request timeout (`:671`);
  *   - SUCCESS iff HTTP 200, anything else (or a transport error) is
  *     FAILED and never aborts the run (`:679,700`);
  *   - missing appBaseURL/modelAPI/method aborts the JOB driver-side with
  *     the reference's error text (`:456,634,650`) — config errors are
  *     fatal, data errors are per-record.
  *
  * Scale semantics: the limiter state is per JVM, i.e. per executor — on a
  * cluster the aggregate rate is `executors × maxConcurrent` in-flight and
  * `executors / minTime` starts/ms; divide the configured budget by the
  * executor count to hold a global SLA. (The reference is single-process,
  * so local[n] reproduces its behavior exactly.)
  */
object RestSink {

  final case class RestOptions(
      appBaseUrl: Option[String] = None,
      modelApi: Option[String] = None,
      method: Option[String] = None,
      headers: Map[String, String] = Map.empty,
      accessToken: Option[String] = None,
      timeoutMillis: Int = 10000, // lib/batchProcessing.js:671
      maxConcurrent: Int = 80,    // :87
      minTimeMillis: Int = 20)    // :89

  final case class RestResult(
      rec_id: Long,
      status_code: Int, // 0 = transport error, no HTTP response
      status_text: String,
      error: String,
      response_body: String)

  /** Reference default header (`lib/batchProcessing.js:657`). */
  val DefaultCookieHeader: (String, String) =
    "Cookie" -> "Content-Type=application/json; charset=encoding; Accept=application/json"

  /** The reference's `options.ctx` auth shape (`lib/batchProcessing.js:436-525`). */
  final case class AuthCtx(
      username: Option[String] = None,
      password: Option[String] = None,
      tenantId: Option[String] = None,
      accessToken: Option[String] = None)

  /** P19 — `getAccessToken` (`lib/batchProcessing.js:436-525`): precedence
    * env ACCESS_TOKEN > login with ctx credentials > ctx.access_token > none.
    * Login POSTs `{username, password}` to appBaseURL + login API (env
    * BATCH_PROCESSING_LOGIN_URL, default `/api/AppUsers/login`) with a 30 s
    * timeout, the default Cookie header, and a `tenant-id` header when
    * given; the token is the response body's `id` field. A non-200 or a
    * token-less body is job-fatal, like the reference. Driver-side only —
    * runs once per job, never inside a task.
    */
  /** The reference's observable abort for absent or rejected credentials
    * (`lib/batchProcessing.js:272` — in the reference a failed/skipped
    * login leaves no token and the first authenticated POST 401s into
    * exactly this message, so the engine throws it at the equivalent
    * decision points: nothing to authenticate with, or a login the auth
    * server rejected).
    */
  val CheckCredentialsMsg =
    "Check access_token/credentials. Expired/Wrong/Missing?. Aborting processing."

  def resolveAccessToken(ctx: AuthCtx, appBaseUrl: Option[String],
      env: Map[String, String] = sys.env, loginTimeoutMillis: Int = 30000): Option[String] =
    env.get("ACCESS_TOKEN").orElse {
      if (ctx.username.isEmpty && ctx.accessToken.isEmpty)
        throw new RuntimeException(CheckCredentialsMsg)
      if (ctx.username.isDefined) {
        val base = env.get("APP_BASE_URL").orElse(appBaseUrl).getOrElse(throw new IllegalArgumentException(
          "appBaseURL is not specified in env variable (APP_BASE_URL) or options. " +
            "Can't defer this to payload when username is specified. Aborting job."))
        val api = env.getOrElse("BATCH_PROCESSING_LOGIN_URL", "/api/AppUsers/login")
        def q(s: String) = s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
        val body = s"""{"username":"${q(ctx.username.get)}","password":"${q(ctx.password.getOrElse(""))}"}"""
        val client = HttpClient.newBuilder()
          .connectTimeout(Duration.ofMillis(loginTimeoutMillis)).build()
        val b = HttpRequest.newBuilder(URI.create(base + api))
          .timeout(Duration.ofMillis(loginTimeoutMillis))
          .method("POST", HttpRequest.BodyPublishers.ofString(body))
        (Map(DefaultCookieHeader) ++ ctx.tenantId.map("tenant-id" -> _))
          .foreach { case (k, v) => b.header(k, v) }
        val resp =
          try client.send(b.build(), HttpResponse.BodyHandlers.ofString())
          catch { case e: Exception =>
            throw new RuntimeException(s"Could not post user credentials: ERROR: ${e.getMessage}")
          }
        // an auth REJECTION surfaces as the reference's net-observable
        // credentials abort; any other failure keeps the login-error text
        // (`lib/batchProcessing.js:485`)
        if (resp.statusCode() == 401 || resp.statusCode() == 403)
          throw new RuntimeException(CheckCredentialsMsg)
        if (resp.statusCode() != 200)
          throw new RuntimeException(
            s"Error received after posting user credentials: RESPONSE: ${resp.statusCode()} ${resp.body()}")
        val token = "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(resp.body()).map(_.group(1))
        Some(token.getOrElse(throw new RuntimeException(
          s"Could not get access_token by login: RESPONSE: ${resp.body()}")))
      } else ctx.accessToken
    }

  /** Driver-side config resolution; throws the reference's fatal messages. */
  def resolveUrl(o: RestOptions, env: Map[String, String] = sys.env): String = {
    val base = env.get("APP_BASE_URL").orElse(o.appBaseUrl).getOrElse(throw new IllegalArgumentException(
      "appBaseURL is not specified in env variable (APP_BASE_URL) or options. Aborting job."))
    val api = env.get("MODEL_API").orElse(o.modelApi).getOrElse(throw new IllegalArgumentException(
      "modelAPI is neither specified in environment variable (MODEL_API) nor processFile options nor passed in payload. Aborting job."))
    val token = env.get("ACCESS_TOKEN").orElse(o.accessToken)
    base + (if (api.startsWith("/")) "" else "/") + api +
      token.map("?access_token=" + _).getOrElse("")
  }

  def resolveMethod(o: RestOptions): String =
    o.method.getOrElse(throw new IllegalArgumentException(
      "method is neither specified in processFile options nor passed in payload. Aborting job.")).toUpperCase

  /** P15 — per-JVM limiter: a semaphore bounds in-flight requests
    * (`maxConcurrent`) and a paced start time enforces `minTime` between
    * request starts (Bottleneck's semantics). Keyed by config so distinct
    * jobs don't share state.
    */
  private object Throttle {
    final class State(maxConcurrent: Int, minTime: Long) {
      val sem = new Semaphore(maxConcurrent)
      private var nextStart = 0L
      def pace(): Unit = {
        val wait = this.synchronized {
          val now = System.currentTimeMillis()
          val at = math.max(now, nextStart)
          nextStart = at + minTime
          at - now
        }
        if (wait > 0) Thread.sleep(wait)
      }
    }
    private val states = new ConcurrentHashMap[(Int, Int), State]()
    def forConfig(maxConcurrent: Int, minTime: Int): State =
      states.computeIfAbsent((maxConcurrent, minTime),
        _ => new State(maxConcurrent, minTime.toLong))
  }

  /** Header carrying the per-record replay key when the caller supplies
    * one — the receiver deduplicates on it, turning the channel's
    * at-least-once delivery into exactly-once EFFECT.
    */
  val IdempotencyHeader = "Idempotency-Key"

  /** POST/PUT/... one JSON body per record; returns per-record results.
    * The caller should persist the result before running multiple actions
    * on it — each recomputation would re-send the requests.
    *
    * `idempotencyKey` (optional, per record) is sent as the
    * [[IdempotencyHeader]] header: a replayed delivery carries the SAME
    * key, so a deduplicating receiver applies each record once no matter
    * how many times a micro-batch retry re-sends it ([[graft.streaming
    * .EventStream.csvJobStream]] passes (runId, recId)).
    */
  def send(records: DataFrame, recId: Column, body: Column,
           opts: RestOptions, env: Map[String, String] = sys.env,
           idempotencyKey: Option[Column] = None): Dataset[RestResult] = {
    val url = resolveUrl(opts, env)
    val method = resolveMethod(opts)
    val headers = (Map(DefaultCookieHeader) ++ opts.headers).toSeq
    val timeout = opts.timeoutMillis
    val (maxConc, minTime) = (opts.maxConcurrent, opts.minTimeMillis)
    val spark = records.sparkSession
    import spark.implicits._
    val keyCol = idempotencyKey.getOrElse(lit(null)).cast("string")
    records.select(recId.cast("long"), body.cast("string"), keyCol)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val client = HttpClient.newBuilder()
          .connectTimeout(Duration.ofMillis(timeout)).build()
        val limiter = Throttle.forConfig(maxConc, minTime)
        it.map { case (id, payload, key) =>
          limiter.pace()
          limiter.sem.acquire()
          try {
            val b = HttpRequest.newBuilder(URI.create(url))
              .timeout(Duration.ofMillis(timeout))
              .method(method, HttpRequest.BodyPublishers.ofString(if (payload == null) "" else payload))
            headers.foreach { case (k, v) => b.header(k, v) }
            if (key != null) b.header(IdempotencyHeader, key)
            val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
            val ok = resp.statusCode() == 200
            RestResult(id, resp.statusCode(), if (ok) "SUCCESS" else "FAILED",
              if (ok) null else resp.body(), resp.body())
          } catch {
            case e: Exception =>
              RestResult(id, 0, "FAILED", String.valueOf(e.getMessage), null)
          } finally limiter.sem.release()
        }
      }
  }
}
