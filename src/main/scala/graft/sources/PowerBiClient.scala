package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8

/** S12: the Power BI dataset-refresh trigger (reference:
  * trigger_pbi.py:9-37) — the post-success hook the daily
  * orchestration fires after the merge phase.
  *
  * Reference semantics, re-expressed over `java.net.http` (no SDK
  * dependency — MSAL's username/password grant is one form-encoded
  * POST to the tenant token endpoint):
  *  - token: POST {authority}/{tenant}/oauth2/v2.0/token with
  *    grant_type=password, client_id, username, password and the
  *    Power BI scope (`https://analysis.windows.net/powerbi/api/
  *    .default` — trigger_pbi.py:14) → `access_token`, or raise with
  *    the server's `error_description` (trigger_pbi.py:21);
  *  - refresh: POST {api}/v1.0/myorg/datasets/{id}/refreshes with
  *    `Authorization: Bearer <token>` and empty body; HTTP 202 is
  *    the ONLY success (trigger_pbi.py:35) — Power BI enqueues the
  *    refresh asynchronously.
  *
  * Base URLs are injectable so the spec drives the full wire
  * protocol against a local HTTP server — the defaults are the
  * public Microsoft endpoints the reference hardcodes. Driver-side
  * control-plane code: one token POST + one refresh POST per daily
  * run, nothing here touches executors or data paths.
  */
final case class PowerBiConfig(
    tenantId: String,
    clientId: String,
    username: String,
    password: String,
    datasetId: String,
    authorityBase: String = "https://login.microsoftonline.com",
    apiBase: String = "https://api.powerbi.com")

object PowerBiConfig {
  /** The reference's env contract (trigger_pbi.py:8-12,28): returns
    * None when any of the five variables is absent — the hook then
    * degrades to a no-op instead of failing the ETL run. */
  def fromEnv(env: String => Option[String] = sys.env.get)
      : Option[PowerBiConfig] =
    for {
      tenant <- env("TENANT_ID")
      client <- env("CLIENT_ID")
      user <- env("BI_USERNAME")
      pass <- env("BI_PASSWORD")
      ds <- env("DATASET_ID")
    } yield PowerBiConfig(tenant, client, user, pass, ds)
}

class PowerBiClient(cfg: PowerBiConfig,
                    http: HttpClient = HttpClient.newHttpClient()) {

  private val Scope = "https://analysis.windows.net/powerbi/api/.default"

  private def form(kv: (String, String)*): String =
    kv.map { case (k, v) =>
      s"${URLEncoder.encode(k, UTF_8)}=${URLEncoder.encode(v, UTF_8)}"
    }.mkString("&")

  /** Extract a top-level string field from a small, flat JSON object
    * (the token endpoint's two relevant fields). Not a JSON parser —
    * tokens and AAD error strings contain no escaped quotes, and
    * pulling in a parser dependency for two fields is the wrong
    * trade in a zero-dependency library. */
  private def jsonField(body: String, name: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(name) + "\"\\s*:\\s*\"([^\"]*)\"").r
      .findFirstMatchIn(body).map(_.group(1))

  /** The MSAL `acquire_token_by_username_password` flow as the raw
    * OAuth2 ROPC grant (trigger_pbi.py:18-23). Throws with the
    * server's `error_description` on any non-token response, exactly
    * as the reference raises it. */
  def requestAccessToken(): String = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"${cfg.authorityBase}/${cfg.tenantId}/oauth2/v2.0/token"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form(
        "grant_type" -> "password",
        "client_id" -> cfg.clientId,
        "username" -> cfg.username,
        "password" -> cfg.password,
        "scope" -> Scope)))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    jsonField(resp.body(), "access_token").getOrElse {
      throw new RuntimeException(
        jsonField(resp.body(), "error_description")
          .getOrElse(s"token endpoint returned HTTP ${resp.statusCode()}"))
    }
  }

  /** POST the refresh; true iff Power BI accepted it (HTTP 202,
    * trigger_pbi.py:35-38). Non-202 responses are reported on stderr
    * with the body, mirroring the reference's reason+json print, and
    * return false — the ETL result is already durable, so a failed
    * BI refresh must not fail the run. */
  def triggerRefresh(): Boolean = {
    val token = requestAccessToken()
    val req = HttpRequest.newBuilder()
      .uri(URI.create(
        s"${cfg.apiBase}/v1.0/myorg/datasets/${cfg.datasetId}/refreshes"))
      .header("Authorization", s"Bearer $token")
      .POST(HttpRequest.BodyPublishers.noBody())
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 202) true
    else {
      System.err.println(
        s"[powerbi] refresh rejected: HTTP ${resp.statusCode()} ${resp.body()}")
      false
    }
  }
}
