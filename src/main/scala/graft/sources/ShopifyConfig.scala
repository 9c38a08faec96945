package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import com.fasterxml.jackson.databind.ObjectMapper

/** Credential/config source for [[ShopifyClient]] (SURVEY §2.1 S11) —
  * the reference's two-tier loader re-expressed without the AWS
  * dependency (`extract_table.py:50-91`): a PRIMARY key-value source
  * (environment variables here, standing in for Secrets Manager) that
  * falls back to a local `credentials.json` when the primary is
  * missing or incomplete, exactly mirroring the reference's
  * try-primary / warn / fall-back-to-file control flow.
  *
  * Key conventions follow the reference verbatim
  * (`extract_table.py:38-40`): per-store entries
  * `{store_type}_shop_name` / `{store_type}_access_token` plus a
  * shared optional `api_version` (default "2024-10"). The env spelling
  * is the upper-cased `SHOPIFY_`-prefixed form:
  * `SHOPIFY_RETAIL_SHOP_NAME`, `SHOPIFY_RETAIL_ACCESS_TOKEN`,
  * `SHOPIFY_API_VERSION`.
  *
  * Both sources are injectable (an env `Map` and a file path), so the
  * loader is unit-testable without touching process state — and the
  * engine never hard-codes live credentials the way the reference's
  * `smoketest.py:12-16` does (a noted defect, not copied).
  */
object ShopifyConfig {

  /** Resolved per-store credentials. `shopDomain` is the derived
    * `{shop_name}.myshopify.com` host the client dials
    * (`extract_table.py:42`). */
  final case class Credentials(shopName: String, accessToken: String,
                               apiVersion: String) {
    def shopDomain: String = s"$shopName.myshopify.com"
  }

  val DefaultApiVersion = "2024-10" // extract_table.py:40

  /** Load credentials for `storeType` ("retail" / "wholesale" — any
    * label works, it only selects the key prefix): try `env` first,
    * fall back to the JSON file at `configPath`. A PARTIAL primary
    * (name without token or vice versa) falls back whole, like the
    * reference's all-or-nothing secret fetch; `api_version` alone may
    * come from either source (env wins).
    *
    * @throws IllegalArgumentException when neither source has the pair
    */
  def load(storeType: String,
           env: Map[String, String] = sys.env.toMap,
           configPath: Option[Path] = None): Credentials = {
    val prefix = s"SHOPIFY_${storeType.toUpperCase}_"
    val fromEnv = for {
      name <- env.get(prefix + "SHOP_NAME")
      token <- env.get(prefix + "ACCESS_TOKEN")
    } yield Credentials(name, token,
      env.getOrElse("SHOPIFY_API_VERSION", DefaultApiVersion))
    fromEnv.orElse(fromFile(storeType, env, configPath)).getOrElse {
      throw new IllegalArgumentException(
        s"no credentials for store '$storeType': set ${prefix}SHOP_NAME + " +
          s"${prefix}ACCESS_TOKEN, or provide credentials.json with " +
          s"${storeType}_shop_name / ${storeType}_access_token")
    }
  }

  private def fromFile(storeType: String, env: Map[String, String],
                       configPath: Option[Path]): Option[Credentials] =
    configPath.filter(Files.exists(_)).flatMap { p =>
      val root = new ObjectMapper()
        .readTree(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      def str(k: String): Option[String] =
        Option(root.get(k)).filter(_.isTextual).map(_.asText)
      for {
        name <- str(s"${storeType}_shop_name")
        token <- str(s"${storeType}_access_token")
      } yield Credentials(name, token,
        env.getOrElse("SHOPIFY_API_VERSION",
          str("api_version").getOrElse(DefaultApiVersion)))
    }

  /** Convenience: a ready [[ShopifyClient]] from resolved credentials
    * (transport injectable for tests, like the client itself). */
  def client(creds: Credentials,
             transport: ShopifyClient.Transport = ShopifyClient.httpTransport)
      : ShopifyClient =
    new ShopifyClient(creds.shopDomain, creds.accessToken, transport,
      apiVersion = creds.apiVersion)
}
