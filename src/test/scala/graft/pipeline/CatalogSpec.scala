package graft.pipeline

import java.time.LocalDate

import graft.SparkSpec
import graft.pipeline.Catalog._

class CatalogSpec extends SparkSpec {

  private val yaml =
    """superoperator:
      |  base_url_env: SO_BASE_URL
      |  auth:
      |    type: api_key_header
      |    header_name: Authorization
      |    header_template: "Bearer {api_key}"
      |    api_key_secret_env: SO_API_KEY_SECRET_NAME
      |  endpoints:
      |    - name: customers
      |      path: /customers
      |      pagination:
      |        type: page
      |        page_param: page
      |        page_size_param: per_page
      |        page_size: 500
      |    - name: payments
      |      path: /payments
      |      pagination:
      |        type: page
      |        page_size: 250
      |      incremental:
      |        type: updated_since
      |        param: updated_since
      |        from_days_ago: 7
      |quickbooks:
      |  auth:
      |    type: oauth2_refresh_token
      |    token_url: https://example.invalid/oauth2/tokens
      |    company_id_env: QB_COMPANY_ID
      |    env_env: QB_ENV
      |    client_id_secret_env: QB_CLIENT_ID_SECRET_NAME
      |    client_secret_secret_env: QB_CLIENT_SECRET_SECRET_NAME
      |    refresh_token_secret_env: QB_REFRESH_TOKEN_SECRET_NAME
      |  endpoints:
      |    - name: invoices
      |      query: "select * from Invoice maxresults 1000"
      |""".stripMargin

  private val env = Map(
    "SO_BASE_URL" -> "https://api.example.invalid",
    "SO_API_KEY_SECRET_NAME" -> "so-api-key",
    "QB_COMPANY_ID" -> "12345",
    "QB_ENV" -> "sandbox",
    "QB_CLIENT_ID_SECRET_NAME" -> "qb-client-id",
    "QB_CLIENT_SECRET_SECRET_NAME" -> "qb-client-secret",
    "QB_REFRESH_TOKEN_SECRET_NAME" -> "qb-refresh-token")

  private val secrets = Map(
    "so-api-key" -> "sk-test-123",
    "qb-client-id" -> "cid",
    "qb-client-secret" -> "csecret",
    "qb-refresh-token" -> "rtok")

  test("parses both source shapes into typed specs, env+secrets resolved") {
    val specs = parse(yaml, env, secrets)
    assert(specs.map(_.name) == Seq("superoperator", "quickbooks"))
    val so = specs.head
    assert(so.baseUrl.contains("https://api.example.invalid"))
    assert(so.auth == HeaderAuth("Authorization", "Bearer sk-test-123"))
    assert(so.endpoints.map(_.spec.name) == Seq("customers", "payments"))
    val pay = so.endpoints.last
    assert(pay.path == "/payments")
    assert(pay.spec.pagination.pageSize == 250)
    assert(pay.spec.pagination.perPageParam == "per_page") // default kept
    assert(pay.spec.incremental.exists(i =>
      i.param == "updated_since" && i.fromDaysAgo == 7))
    val qb = specs.last
    assert(qb.queries == Seq(
      QueryEndpoint("invoices", "select * from Invoice maxresults 1000")))
    qb.auth match {
      case o: OAuthConfig =>
        assert(o.companyId == "12345" && o.environment == "sandbox" &&
          o.clientId == "cid" && o.clientSecret == "csecret" &&
          o.refreshToken == "rtok")
      case other => fail(s"expected OAuthConfig, got $other")
    }
  }

  test("resolved auth never leaks secrets through toString") {
    val specs = parse(yaml, env, secrets)
    val rendered = specs.mkString("; ")
    // the resolved api key, client secret, and refresh token must be
    // redacted — require()/assert failure messages interpolate specs
    assert(!rendered.contains("sk-test-123"))
    assert(!rendered.contains("csecret"))
    assert(!rendered.contains("rtok"))
    // non-secret routing fields stay visible for diagnostics
    assert(rendered.contains("Authorization"))
    assert(rendered.contains("cid"))
  }

  test("unknown keys fail loudly naming the offender") {
    val bad = yaml.replace("        page_size: 500",
      "        page_size: 500\n        page_sise: 9")
    val e = intercept[IllegalArgumentException] {
      parse(bad, env, secrets)
    }
    assert(e.getMessage.contains("page_sise"))
    assert(e.getMessage.contains("customers"))
  }

  test("missing env var and missing secret fail loudly naming them") {
    val e1 = intercept[IllegalArgumentException] {
      parse(yaml, env - "SO_BASE_URL", secrets)
    }
    assert(e1.getMessage.contains("SO_BASE_URL"))
    val e2 = intercept[IllegalArgumentException] {
      parse(yaml, env, secrets - "so-api-key")
    }
    assert(e2.getMessage.contains("so-api-key"))
  }

  test("unsupported pagination / auth / incremental types are rejected") {
    val p = intercept[IllegalArgumentException] {
      parse(yaml.replace("type: page", "type: cursor"), env, secrets)
    }
    assert(p.getMessage.contains("cursor"))
    val a = intercept[IllegalArgumentException] {
      parse(yaml.replace("type: api_key_header", "type: mtls"), env, secrets)
    }
    assert(a.getMessage.contains("mtls"))
    val i = intercept[IllegalArgumentException] {
      parse(yaml.replace("type: updated_since", "type: cdc"), env, secrets)
    }
    assert(i.getMessage.contains("cdc"))
  }

  test("runConfig: RUN_DATE defaults to today, lake root is required") {
    val today = LocalDate.of(2026, 8, 14)
    val rc = runConfig(Map("LAKE_ROOT" -> "/lake"), today = today)
    assert(rc == RunConfig("2026-08-14", "/lake"))
    assert(runConfig(Map("LAKE_ROOT" -> "/lake", "RUN_DATE" -> "2026-01-02"),
      today = today).runDate == "2026-01-02")
    val e = intercept[IllegalArgumentException] {
      runConfig(Map("RUN_DATE" -> "2026-01-02"), today = today)
    }
    assert(e.getMessage.contains("LAKE_ROOT"))
  }

  test("extractRest lands catalog-driven bronze JSONL with resolved auth") {
    val specs = parse(yaml, env, secrets)
    val so = specs.head
    val root = tmpDir("catalog_extract")
    val cfg = Pipeline.LakeConfig(root, "2026-01-01")
    val today = LocalDate.of(2026, 8, 14)
    val rows = (1 to 120).map(i => s"""{"id": $i, "name": "n$i"}""")
    val transport: Transport = (path, headers, params) => {
      require(headers.get("Authorization").contains("Bearer sk-test-123"),
        s"auth header not resolved: $headers")
      if (path == "/payments")
        require(params.get("updated_since").contains("2026-08-07"),
          s"incremental param not resolved: $params")
      val per = params("per_page").toInt
      val page = params("page").toInt
      rows.slice((page - 1) * per, page * per)
    }
    val landed = extractRest(spark, cfg, so, transport, today)
    assert(landed.map(_._1) == Seq("customers", "payments"))
    val back = graft.sources.Json.readJsonl(spark, landed.head._2)
    assert(back.count() == 120)
    assert(back.columns.sorted.toSeq == Seq("id", "name"))
  }
}
