package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.operators.RpcRegistry
import graft.serving.RestServer

/** End-to-end HTTP shim: PostgREST table algebra, RPC composition,
  * Grafana macro SQL, profile routing, and error codes — all over a
  * real socket, responses compared to the direct DataFrame results. */
class RestServerSpec extends SparkSpec {

  private lazy val server = new RestServer(spark,
    profiles = Map("main" -> sf), defaultProfile = "main", maxRows = 5000)
  private lazy val port: Int = server.start()
  private lazy val client = HttpClient.newHttpClient()

  private def get(pathAndQuery: String,
      headers: Map[String, String] = Map.empty): (Int, String) = {
    var b = HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$pathAndQuery")).GET()
    headers.foreach { case (k, v) => b = b.header(k, v) }
    val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def postSql(query: String, sql: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/sql$query"))
      .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("catalog root lists tables, procedures, and profiles") {
    val (code, body) = get("/")
    assert(code == 200)
    assert(body.contains("\"lineitem\"") && body.contains("\"events\""))
    assert(body.contains("\"profiles\":[\"main\"]"))
  }

  test("table endpoint runs the PostgREST algebra over a socket") {
    val (code, body) = get(
      "/region?select=r_name,r_regionkey&order=r_name.asc")
    assert(code == 200)
    val expected = "[" + Tables.load(spark, sf, "region")
      .select("r_name", "r_regionkey").orderBy("r_name")
      .toJSON.collect().mkString(",") + "]"
    assert(body == expected)
  }

  test("aggregate select groups by the plain columns, like PostgREST") {
    val (code, body) = get(
      "/orders?select=o_orderstatus,o_totalprice.count()" +
        "&order=o_orderstatus.asc")
    assert(code == 200)
    val expected = "[" + Tables.load(spark, sf, "orders")
      .groupBy("o_orderstatus")
      .agg(count(col("o_totalprice")).as("o_totalprice_count"))
      .orderBy("o_orderstatus").toJSON.collect().mkString(",") + "]"
    assert(body == expected)
  }

  test("rpc endpoint dispatches registered procedures with filters") {
    RpcRegistry.register("rest_server_spec_nations",
      (sp, args) => {
        val minKey = args.getOrElse("min_key", "0").toInt
        Tables.load(sp, sf, "nation")
          .filter(col("n_nationkey") >= minKey)
          .select(col("n_nationkey"), col("n_name"))
      })
    val (code, body) = get(
      "/rpc/rest_server_spec_nations?min_key=10" +
        "&n_nationkey=lte.12&order=n_nationkey.asc")
    assert(code == 200)
    val expected = "[" + Tables.load(spark, sf, "nation")
      .filter(col("n_nationkey") >= 10 && col("n_nationkey") <= 12)
      .select(col("n_nationkey"), col("n_name"))
      .orderBy("n_nationkey").toJSON.collect().mkString(",") + "]"
    assert(body == expected)
  }

  test("POST /sql expands Grafana macros and runs panel SQL") {
    val ev = Tables.load(spark, sf, "events")
    val Array(fromTs, toTs) = ev
      .agg(min("ts").cast("string"), max("ts").cast("string"))
      .collect().head.toSeq.map(_.toString).toArray
    val (code, body) = postSql(
      s"?from=${fromTs.replace(" ", "%20")}" +
        s"&to=${toTs.replace(" ", "%20")}&interval=1d",
      """SELECT $__timeGroupAlias(ts, $__interval),
           count(*) AS n
         FROM events WHERE $__timeFilter(ts)
         GROUP BY 1 ORDER BY 1""")
    assert(code == 200, body)
    graft.functions.TimeFuncs.register(spark)
    val expected = "[" + ev
      .filter(col("ts") >= fromTs && col("ts") <= toTs)
      .groupBy(expr("time_bucket_s(86400, ts)").as("time"))
      .agg(count(lit(1)).as("n"))
      .orderBy("time").toJSON.collect().mkString(",") + "]"
    assert(body == expected)
  }

  test("unknown tables 404, bad algebra 400, unknown profile 400") {
    assert(get("/no_such_table")._1 == 404)
    assert(get("/region?r_name=badop.x")._1 == 400)
    assert(get("/region", Map("Accept-Profile" -> "nope"))._1 == 400)
    assert(get("/region?select=no_such_col")._1 == 400)
  }

  test("maxRows caps the response row count") {
    val small = new RestServer(spark, Map("main" -> sf), "main",
      maxRows = 3)
    val p = small.start()
    try {
      val r = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p/lineitem?select=l_orderkey"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      assert(r.body().split("\\},\\{").length == 3)
    } finally small.stop()
  }
}
