package graft.pipeline

import java.time.LocalDate

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.sources.{EndpointSpec, IncrementalConfig, PagePagination, RestSource}

/** CONFIG-DRIVEN PIPELINE ASSEMBLY (round-12 verdict item 4): parse the
  * reference's declarative endpoint catalog (`endpoints.yml:4-52`, real
  * YAML via the distribution's snakeyaml) plus the env/secret seam
  * (`config.py:27-42`, `secrets.py:27-43`) into the typed [[EndpointSpec]]
  * catalog, and drive extract → transform from the parsed config alone —
  * the reference's `run_extract.py:80-88` control flow as an engine
  * surface.
  *
  * Failure modes are part of the contract: an unknown key anywhere in the
  * catalog, a missing environment variable, a missing secret, or an
  * unsupported pagination/auth/incremental type all fail LOUDLY naming the
  * offender — a config typo must never silently drop an endpoint or land
  * unauthenticated requests (the `os.environ[...]` KeyError semantic of
  * the reference's config layer, made typed).
  *
  * Network transport stays injected (zero-egress harness): the catalog
  * resolves base URL, auth headers, pagination, and incremental params;
  * the transport function receives them fully resolved.
  */
object Catalog {

  // ------------------------------------------------------------- model

  sealed trait ResolvedAuth
  /** `api_key_header`: resolved to the literal header to send. The
    * resolved VALUE is a secret — `toString` redacts it, so assertion
    * and `require` messages interpolating a spec can never leak a key
    * into logs. */
  final case class HeaderAuth(name: String, value: String) extends ResolvedAuth {
    override def toString: String = s"HeaderAuth($name, ****)"
  }
  /** `oauth2_refresh_token`: resolved credentials for an
    * [[graft.sources.AuthRetryPolicy]]-driven exchange. `toString`
    * redacts the client secret and refresh token (log-leak guard, as
    * [[HeaderAuth]]). */
  final case class OAuthConfig(tokenUrl: String, companyId: String,
                               environment: String, clientId: String,
                               clientSecret: String,
                               refreshToken: String) extends ResolvedAuth {
    override def toString: String =
      s"OAuthConfig($tokenUrl, $companyId, $environment, $clientId, ****, ****)"
  }
  case object NoAuth extends ResolvedAuth

  /** A paginated REST endpoint: the typed spec plus its URL path. */
  final case class RestEndpoint(path: String, spec: EndpointSpec)
  /** A SQL-text query endpoint (the QBO shape, `endpoints.yml:49-52`). */
  final case class QueryEndpoint(name: String, query: String)

  final case class SourceSpec(name: String, baseUrl: Option[String],
                              auth: ResolvedAuth,
                              endpoints: Seq[RestEndpoint],
                              queries: Seq[QueryEndpoint])

  /** The run-level env seam (`config.py:27-42`): RUN_DATE defaults to
    * `today` exactly as the reference defaults to `date.today()`. */
  final case class RunConfig(runDate: String, lakeRoot: String)

  def runConfig(env: Map[String, String], lakeRootVar: String = "LAKE_ROOT",
                today: LocalDate = LocalDate.now()): RunConfig =
    RunConfig(
      runDate = env.get("RUN_DATE").filter(_.nonEmpty)
        .getOrElse(today.toString),
      lakeRoot = requireEnv(env, lakeRootVar, "run config"))

  // ------------------------------------------------------------- parse

  /** Parse a catalog document. `env` is the environment seam; `secrets`
    * the key-vault seam (`*_secret_env` variables name the SECRET, the
    * secret store maps that name to the value — the reference's two-level
    * `secrets.py` indirection). */
  def parse(yamlText: String, env: Map[String, String],
            secrets: Map[String, String]): Seq[SourceSpec] = {
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](yamlText),
      "catalog root")
    root.toSeq.map { case (sourceName, body) =>
      val m = asMap(body, s"source '$sourceName'")
      checkKeys(m, Set("base_url_env", "auth", "endpoints"),
        s"source '$sourceName'")
      val baseUrl = m.get("base_url_env").map(v =>
        requireEnv(env, str(v), s"source '$sourceName' base URL"))
      val auth = m.get("auth").map(parseAuth(_, sourceName, env, secrets))
        .getOrElse(NoAuth)
      val eps = m.get("endpoints").map(asList(_, s"'$sourceName'.endpoints"))
        .getOrElse(Seq.empty)
        .map(parseEndpoint(_, sourceName))
      SourceSpec(sourceName, baseUrl, auth,
        eps.collect { case Left(r) => r }, eps.collect { case Right(q) => q })
    }
  }

  private def parseAuth(a: Any, src: String, env: Map[String, String],
                        secrets: Map[String, String]): ResolvedAuth = {
    val m = asMap(a, s"'$src'.auth")
    def secret(key: String): String = {
      val secretName = requireEnv(env, str(m(key)), s"'$src'.auth.$key")
      secrets.getOrElse(secretName, throw new IllegalArgumentException(
        s"secret '$secretName' (named by '$src'.auth.$key) not in the " +
          "secret store"))
    }
    str(m.getOrElse("type", throw new IllegalArgumentException(
      s"'$src'.auth lacks 'type'"))) match {
      case "api_key_header" =>
        checkKeys(m, Set("type", "header_name", "header_template",
          "api_key_secret_env"), s"'$src'.auth")
        HeaderAuth(str(m("header_name")),
          str(m("header_template"))
            .replace("{api_key}", secret("api_key_secret_env")))
      case "oauth2_refresh_token" =>
        checkKeys(m, Set("type", "token_url", "company_id_env", "env_env",
          "client_id_secret_env", "client_secret_secret_env",
          "refresh_token_secret_env"), s"'$src'.auth")
        OAuthConfig(str(m("token_url")),
          requireEnv(env, str(m("company_id_env")), s"'$src'.auth"),
          requireEnv(env, str(m("env_env")), s"'$src'.auth"),
          secret("client_id_secret_env"),
          secret("client_secret_secret_env"),
          secret("refresh_token_secret_env"))
      case other => throw new IllegalArgumentException(
        s"'$src'.auth.type '$other' is not supported " +
          "(api_key_header | oauth2_refresh_token)")
    }
  }

  private def parseEndpoint(e: Any,
                            src: String): Either[RestEndpoint, QueryEndpoint] = {
    val m = asMap(e, s"'$src' endpoint")
    val name = str(m.getOrElse("name", throw new IllegalArgumentException(
      s"an endpoint of '$src' lacks 'name'")))
    val where = s"'$src'.$name"
    if (m.contains("query")) {
      checkKeys(m, Set("name", "query"), where)
      Right(QueryEndpoint(name, str(m("query"))))
    } else {
      checkKeys(m, Set("name", "path", "pagination", "incremental"), where)
      val pagination = m.get("pagination").map { p =>
        val pm = asMap(p, s"$where.pagination")
        checkKeys(pm, Set("type", "page_param", "page_size_param",
          "page_size", "max_pages"), s"$where.pagination")
        str(pm.getOrElse("type", "page")) match {
          case "page" => ()
          case other => throw new IllegalArgumentException(
            s"$where.pagination.type '$other' is not supported (page)")
        }
        PagePagination(
          pageParam = pm.get("page_param").map(str).getOrElse("page"),
          perPageParam =
            pm.get("page_size_param").map(str).getOrElse("per_page"),
          pageSize = pm.get("page_size").map(int).getOrElse(500),
          maxPages = pm.get("max_pages").map(int).getOrElse(10000))
      }.getOrElse(PagePagination())
      val incremental = m.get("incremental").map { i =>
        val im = asMap(i, s"$where.incremental")
        checkKeys(im, Set("type", "param", "from_days_ago"),
          s"$where.incremental")
        str(im.getOrElse("type", "updated_since")) match {
          case "updated_since" => ()
          case other => throw new IllegalArgumentException(
            s"$where.incremental.type '$other' is not supported " +
              "(updated_since)")
        }
        IncrementalConfig(
          param = im.get("param").map(str).getOrElse("updated_since"),
          fromDaysAgo = im.get("from_days_ago").map(int).getOrElse(7))
      }
      Left(RestEndpoint(
        path = m.get("path").map(str).getOrElse(s"/$name"),
        spec = EndpointSpec(name, pagination, incremental)))
    }
  }

  // ----------------------------------------------------------- assembly

  /** Resolved page transport: (path, headers, params) → one page of raw
    * JSON record lines. Injected — the engine is network-free. */
  type Transport = (String, Map[String, String], Map[String, String]) => Seq[String]

  /** Extract every REST endpoint of `src` into
    * `bronze/<source>/<endpoint>/run_date=<run>` as raw JSONL — the
    * reference's landing layout (`run_extract.py:44-47`). Returns the
    * landed (endpoint, path) pairs. The per-endpoint page loop is the
    * reference's own sequential shape (config-table pulls); the engine's
    * distributed page-range scan is the DSv2 REST source (q75). */
  def extractRest(spark: SparkSession, cfg: Pipeline.LakeConfig,
                  src: SourceSpec, transport: Transport,
                  today: LocalDate): Seq[(String, String)] = {
    import spark.implicits._
    val headers = src.auth match {
      case HeaderAuth(n, v) => Map(n -> v)
      case NoAuth => Map.empty[String, String]
      case _: OAuthConfig => throw new IllegalArgumentException(
        s"source '${src.name}' pairs oauth2 auth with paginated REST " +
          "endpoints — that is the query-source shape (q122)")
    }
    src.endpoints.map { ep =>
      val fetch: Map[String, String] => Seq[String] =
        params => transport(ep.path, headers, params)
      val lines = new RestSource(ep.spec, fetch, today).fetchAll().toSeq
      val path = Pipeline.bronzeRef(src.name, ep.spec.name)
        .path(cfg.root, cfg.runDate)
      lines.toDS().coalesce(1).write.mode("overwrite").text(path)
      ep.spec.name -> path
    }
  }

  // ----------------------------------------------------------- plumbing

  private def requireEnv(env: Map[String, String], name: String,
                         where: String): String =
    env.getOrElse(name, throw new IllegalArgumentException(
      s"missing environment variable '$name' (required by $where)"))

  private def asMap(a: Any, where: String): Map[String, Any] = a match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap
    case other => throw new IllegalArgumentException(
      s"$where must be a mapping, got " +
        Option(other).map(_.getClass.getSimpleName).getOrElse("null"))
  }

  private def asList(a: Any, where: String): Seq[Any] = a match {
    case l: java.util.List[_] => l.asScala.toSeq
    case other => throw new IllegalArgumentException(
      s"$where must be a list, got " +
        Option(other).map(_.getClass.getSimpleName).getOrElse("null"))
  }

  private def checkKeys(m: Map[String, Any], allowed: Set[String],
                        where: String): Unit = {
    val unknown = m.keySet.diff(allowed)
    require(unknown.isEmpty,
      s"unknown key(s) ${unknown.toSeq.sorted.mkString("'", "', '", "'")} " +
        s"in $where (allowed: ${allowed.toSeq.sorted.mkString(", ")})")
  }

  private def str(a: Any): String = String.valueOf(a)

  private def int(a: Any): Int = a match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long => l.intValue()
    case s => s.toString.toInt
  }
}
