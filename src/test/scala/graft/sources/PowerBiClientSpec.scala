package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** S12 wire-protocol spec: a local HTTP server plays both the AAD
  * token endpoint and the Power BI refresh endpoint, so the client's
  * ROPC form, scope, Bearer header, and 202-only success contract
  * (trigger_pbi.py:9-37) are asserted end-to-end — not just option
  * plumbing. No external network is touched. */
class PowerBiClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  @volatile private var tokenForm: String = ""
  @volatile private var refreshAuth: String = ""
  @volatile private var tokenStatus = 200
  @volatile private var tokenBody =
    """{"token_type":"Bearer","expires_in":3599,"access_token":"tok-abc123"}"""
  @volatile private var refreshStatus = 202

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/tenant-1/oauth2/v2.0/token", ex => {
      tokenForm = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      respond(ex, tokenStatus, tokenBody)
    })
    server.createContext("/v1.0/myorg/datasets/ds-9/refreshes", ex => {
      refreshAuth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      respond(ex, refreshStatus, if (refreshStatus == 202) "" else """{"error":"x"}""")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private def cfg = PowerBiConfig(
    tenantId = "tenant-1", clientId = "app-7", username = "svc@corp",
    password = "p w+d", datasetId = "ds-9",
    authorityBase = base, apiBase = base)

  test("token request carries the ROPC grant with the Power BI scope") {
    tokenStatus = 200
    val tok = new PowerBiClient(cfg).requestAccessToken()
    assert(tok == "tok-abc123")
    val fields = tokenForm.split("&").toSet
    assert(fields.contains("grant_type=password"))
    assert(fields.contains("client_id=app-7"))
    assert(fields.contains("username=svc%40corp"))
    assert(fields.contains("password=p+w%2Bd")) // form-encoding, not raw
    assert(tokenForm.contains(
      "scope=https%3A%2F%2Fanalysis.windows.net%2Fpowerbi%2Fapi%2F.default"))
  }

  test("refresh posts the Bearer token and treats 202 as the only success") {
    refreshStatus = 202
    assert(new PowerBiClient(cfg).triggerRefresh())
    assert(refreshAuth == "Bearer tok-abc123")
    refreshStatus = 400
    assert(!new PowerBiClient(cfg).triggerRefresh())
  }

  test("token failure surfaces the server's error_description") {
    tokenStatus = 400
    tokenBody =
      """{"error":"invalid_grant","error_description":"AADSTS50126: bad creds"}"""
    val e = intercept[RuntimeException](new PowerBiClient(cfg).requestAccessToken())
    assert(e.getMessage.contains("AADSTS50126"))
    tokenStatus = 200
    tokenBody =
      """{"token_type":"Bearer","expires_in":3599,"access_token":"tok-abc123"}"""
  }

  test("orchestrator hook: no-op without env, fires refresh with it") {
    refreshStatus = 202
    refreshAuth = ""
    graft.Orchestrator.powerBiHook(env = _ => None)() // must not throw
    assert(refreshAuth == "")
    val env = Map("TENANT_ID" -> "tenant-1", "CLIENT_ID" -> "app-7",
      "BI_USERNAME" -> "svc@corp", "BI_PASSWORD" -> "p w+d",
      "DATASET_ID" -> "ds-9")
    graft.Orchestrator.powerBiHook(
      env = env.get,
      client = c => new PowerBiClient(c.copy(authorityBase = base, apiBase = base)))()
    assert(refreshAuth == "Bearer tok-abc123")
    // a refresh rejection must not propagate out of the hook
    refreshStatus = 500
    graft.Orchestrator.powerBiHook(
      env = env.get,
      client = c => new PowerBiClient(c.copy(authorityBase = base, apiBase = base)))()
    refreshStatus = 202
  }
}
