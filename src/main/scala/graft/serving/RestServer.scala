package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.{GrafanaMacros, TimeFuncs}
import graft.operators.{RestQuery, RpcRegistry}
import graft.serving.RestErrors.{BadRequest, NotFound}

/** Optional thin HTTP read shim — demo parity with the reference's read
  * path, which serves the database over PostgREST (`compose.yml:38-49`,
  * `http_export_examples.md:17-24`) and Grafana panel SQL (the
  * provisioned dashboard JSONs under `data/provisioning`). The ENGINE
  * semantics (URL algebra, RPC composition, macro expansion) live in
  * [[RestQuery]] / [[RpcRegistry]] / [[GrafanaMacros]] and are
  * oracle-checked as q41/q60/q61; this class only binds them to a
  * socket. SURVEY.md §3.3 scopes HTTP serving out of the engine core,
  * so nothing here sits on any query path — zero dependencies (JDK
  * `com.sun.net.httpserver`), started only when explicitly asked.
  *
  * Surface (all JSON responses, one object per row):
  *   - `GET /` → catalog: served tables + registered RPC procedures.
  *   - `GET /<table>?<postgrest algebra>` — select/aggregates, filter
  *     operators, order, limit/offset (the q41 grammar). The
  *     `Accept-Profile` header selects among the configured dataset
  *     profiles (PostgREST's schema-routing header).
  *   - `GET /rpc/<name>?args&filters` — the q60 composition rule.
  *   - `POST /sql?from=…&to=…&interval=…&var_x=…` with a raw Grafana
  *     panel SQL body — template-variable substitution + macro
  *     expansion (q61), then `spark.sql` over the profile's tables.
  *
  * Deliberately a DEMO shim, not a production server: responses are
  * row-capped at `maxRows` (PostgREST ships the same default-limit
  * idea), requests execute serially on the caller thread, and the
  * result set is collected on the driver — which is what "serve rows
  * over HTTP" means on any engine; the heavy lifting stays distributed
  * in the plan that produced the rows.
  */
final class RestServer(
    spark: SparkSession,
    profiles: Map[String, String],
    defaultProfile: String,
    maxRows: Int = 10000) {

  require(profiles.contains(defaultProfile),
    s"defaultProfile '$defaultProfile' not in ${profiles.keySet}")

  private var server: HttpServer = _
  // which profile's tables are currently registered as temp views for
  // the /sql path (lazily swapped; a demo shim serves one at a time)
  private var sqlViewProfile: Option[String] = None

  def start(port: Int = 0): Int = synchronized {
    require(server == null, "already started")
    TimeFuncs.register(spark) // time_bucket[_s] for expanded panel SQL
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def handle(ex: HttpExchange): Unit = {
    try {
      val uri = ex.getRequestURI
      val path = uri.getPath
      val rawQuery = Option(uri.getRawQuery).getOrElse("")
      val profile =
        Option(ex.getRequestHeaders.getFirst("Accept-Profile"))
          .getOrElse(defaultProfile)
      val dir = profiles.getOrElse(profile,
        throw new BadRequest(s"unknown profile '$profile' " +
          s"(configured: ${profiles.keySet.toSeq.sorted.mkString(", ")})"))
      val body: String =
        if (path == "/") catalogJson(dir)
        else if (path.startsWith("/rpc/"))
          rowsJson(RpcRegistry.dispatch(spark,
            if (rawQuery.isEmpty) path else s"$path?$rawQuery"))
        else if (path == "/sql") rowsJson(grafanaSql(ex, dir, rawQuery))
        else {
          val table = path.stripPrefix("/")
          if (!tablesIn(dir).contains(table) &&
              !tablesInRefreshed(dir).contains(table))
            throw new NotFound(s"unknown table '$table'")
          rowsJson(RestQuery(Tables.loadAny(spark, dir, table),
            decodedParams(rawQuery)))
        }
      respond(ex, 200, body)
    } catch {
      case e: NotFound => respond(ex, 404, errorJson(e.getMessage))
      case e: BadRequest => respond(ex, 400, errorJson(e.getMessage))
      case e: IllegalArgumentException =>
        respond(ex, 400, errorJson(Option(e.getMessage).getOrElse("bad request")))
      case e: org.apache.spark.sql.AnalysisException =>
        respond(ex, 400, errorJson(e.getMessage)) // bad column/SQL = client error
      case scala.util.control.NonFatal(e) =>
        respond(ex, 500, errorJson(
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"))
    } finally ex.close()
  }

  /** Grafana datasource semantics: the panel's rawSql arrives as the
    * request body; the time range / interval Grafana would interpolate
    * arrive as URL params (`from`, `to`, `interval`), and template
    * variables as `var_<name>=<value>` — the same three inputs the
    * q61 macro-expansion contract takes. */
  private def grafanaSql(ex: HttpExchange, dir: String,
      rawQuery: String): DataFrame = {
    val params = decodedParams(rawQuery).toMap
    val sql0 = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    if (sql0.trim.isEmpty) throw new BadRequest("empty SQL body")
    val vars = params.collect {
      case (k, v) if k.startsWith("var_") => k.stripPrefix("var_") -> v
    }
    val expanded = GrafanaMacros.expand(
      GrafanaMacros.substituteVars(sql0, vars),
      params.getOrElse("from", "1970-01-01 00:00:00"),
      params.getOrElse("to", "2100-01-01 00:00:00"),
      params.getOrElse("interval", "1h"))
    synchronized {
      if (!sqlViewProfile.contains(dir)) {
        Tables.registerDiscovered(spark, dir)
        sqlViewProfile = Some(dir)
      }
    }
    spark.sql(expanded)
  }

  private def decodedParams(rawQuery: String): Seq[(String, String)] =
    rawQuery.split("&").filter(_.nonEmpty).toSeq.map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else
        (kv.substring(0, i), kv.substring(i + 1))
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(v, "UTF-8")
    }

  private def rowsJson(df: DataFrame): String =
    "[" + df.limit(maxRows).toJSON.collect().mkString(",") + "]"

  // per-profile table discovery, memoized: validating a table name
  // must not pay a filesystem listing per request (a remote
  // round-trip on object storage). Refreshed on a would-be 404 so a
  // table added to the dir after startup is still found.
  private val discovered =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  /** Last wall-clock refresh per dir — the negative cache. Without
    * it, every request naming a missing table (a 404 probe loop, a
    * dashboard polling a bad name) re-runs the full filesystem
    * listing, which is a remote LIST per request on object storage. */
  private val lastRefreshMs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val RefreshIntervalMs = 5000L
  private def tablesIn(dir: String): Seq[String] = {
    val cached = discovered.computeIfAbsent(dir,
      d => Tables.discover(spark, d))
    cached
  }
  private def tablesInRefreshed(dir: String): Seq[String] = {
    val now = System.currentTimeMillis()
    val last = lastRefreshMs.get(dir)
    if (last != null && now - last < RefreshIntervalMs)
      tablesIn(dir)
    else {
      val fresh = Tables.discover(spark, dir)
      discovered.put(dir, fresh)
      lastRefreshMs.put(dir, now)
      fresh
    }
  }

  private def catalogJson(dir: String): String = {
    def arr(xs: Seq[String]) = xs.map(s => s""""$s"""").mkString("[", ",", "]")
    s"""{"tables":${arr(tablesInRefreshed(dir))},""" +
      s""""procedures":${arr(RpcRegistry.procedures.toSeq.sorted)},""" +
      s""""profiles":${arr(profiles.keySet.toSeq.sorted)}}"""
  }

  private def errorJson(msg: String): String = {
    val esc = msg.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    s"""{"error":"$esc"}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

}

/** Typed HTTP error signals — top-level (not inner classes) so the
  * handler's type tests need no outer-instance check. */
private object RestErrors {
  final class NotFound(msg: String) extends RuntimeException(msg)
  final class BadRequest(msg: String) extends RuntimeException(msg)
}
