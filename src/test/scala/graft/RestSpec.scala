package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite
import graft.rest.{Catalog, RestServer}

/** End-to-end REST integration: DDL → ingest → status → search →
  * analyzer → drop over real HTTP (mirrors the reference's
  * tests/integration/test_rest_ingest_api + test_rest_search_api flow). */
class RestSpec extends AnyFunSuite {
  import TestSpark._

  private val root = "/root/repo/target/rest_spec_" + System.nanoTime()
  private val catalog = new Catalog(spark, root)
  private val server = new RestServer(spark, catalog, port = 0)
  server.start()
  private val base = s"http://127.0.0.1:${server.boundPort}/dae/v1"
  private val http = HttpClient.newHttpClient()

  private def post(path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(base + path))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val r = http.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def get(path: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def delete(path: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(base + path)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("ddl create + list") {
    val (code, body) = post("/ddl/tables",
      """{"name":"logs","columns":[
        |{"name":"sourcetype","type":"string"},
        |{"name":"latency","type":"double"},
        |{"name":"_time","type":"timestamp"}],
        |"order_by":["sourcetype"],"partition_by_granularity":"D"}""".stripMargin)
    assert(code == 200, body)
    val (lc, lb) = get("/ddl/tables")
    assert(lc == 200 && lb.contains("\"logs\""), lb)
  }

  test("ingest commits rows and status resolves") {
    val (code, body) = post("/ingest/tables/logs",
      """{"columns":["sourcetype","latency","_time","_idem"],
        |"data":[
        | ["nginx","12.5","2024-03-01 10:00:00","a"],
        | ["nginx","40.0","2024-03-01 11:00:00","b"],
        | ["app","7.25","2024-03-02 09:30:00","c"],
        | ["app","7.25","2024-03-02 09:30:00","c"]]}""".stripMargin)
    assert(code == 200, body)
    assert(body.contains("\"committed\":3"), body) // _idem dedup dropped 1
    val pollId = body.split("\"poll_id\":\"")(1).split("\"")(0)
    val (sc, sb) = get(s"/ingest/statuses?poll_id=$pollId")
    assert(sc == 200 && sb.contains("committed"), sb)
  }

  test("search applies time bounds and paging") {
    val (code, body) = post("/search",
      """{"query":"SELECT sourcetype, latency FROM logs",
        |"start_time":"2024-03-01 00:00:00","end_time":"2024-03-02 00:00:00",
        |"limit":10}""".stripMargin)
    assert(code == 200, body)
    assert(body.contains("nginx") && !body.contains("app"), body)
    // unbounded search sees both days
    val (c2, b2) = post("/search",
      """{"query":"SELECT sourcetype, count(*) AS n FROM logs GROUP BY sourcetype"}""")
    assert(c2 == 200 && b2.contains("app") && b2.contains("nginx"), b2)
  }

  test("search renders display formats (pretty/markdown/vertical/xml)") {
    val q = """"query":"SELECT sourcetype, count(*) AS n FROM logs GROUP BY sourcetype ORDER BY sourcetype""""
    val (pc, pb) = post("/search", s"""{$q,"format":"pretty"}""")
    assert(pc == 200 && pb.contains("┏") && pb.contains("│"), pb)
    val (mc, mb) = post("/search", s"""{$q,"format":"markdown"}""")
    assert(mc == 200 && mb.startsWith("| sourcetype | n |"), mb)
    assert(mb.contains("|:-|-:|"), mb)
    val (vc, vb) = post("/search", s"""{$q,"format":"vertical"}""")
    assert(vc == 200 && vb.startsWith("Row 1:"), vb)
    val (xc, xb) = post("/search", s"""{$q,"format":"xml"}""")
    assert(xc == 200 && xb.contains("<name>sourcetype</name>") &&
      xb.contains("<rows>2</rows>"), xb)
    val (bc, bb) = post("/search", s"""{$q,"format":"nope"}""")
    assert(bc == 400 && bb.contains("unknown format"), bb)
  }

  private def getRoot(path: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:${server.boundPort}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("ping, info and clusterinfo report liveness and topology") {
    assert(getRoot("/dae/ping")._2.contains("ok"))
    val (ic, ib) = getRoot("/dae/info")
    assert(ic == 200 && ib.contains("graft"), ib)
    val (cc, cb) = get("/clusterinfo")
    assert(cc == 200 && cb.contains("default_parallelism"), cb)
  }

  test("system tables: REST endpoint and system_* views over /search") {
    // endpoint — the logs table created above must be introspectable
    val (tc, tb) = get("/system/tables")
    assert(tc == 200 && tb.contains("\"logs\""), tb)
    val (cc, cb) = get("/system/columns")
    assert(cc == 200 && cb.contains("\"latency\"") && cb.contains("DOUBLE"), cb)
    val (fc, fb) = get("/system/functions")
    assert(fc == 200 && fb.contains("siphash64"), fb)
    val (mc, mb) = get("/system/metrics")
    assert(mc == 200 && mb.contains("default_parallelism"), mb)
    val (nc, _) = get("/system/nope")
    assert(nc == 404)
    // the same frames as SQL views through /search
    val (sc, sb) = post("/search",
      """{"query":"SELECT `table`, count(*) AS n FROM system_columns GROUP BY 1 ORDER BY 1"}""")
    assert(sc == 200 && sb.contains("logs"), sb)
    val (oc, ob) = post("/search", """{"query":"SELECT dummy FROM system_one"}""")
    assert(oc == 200 && ob.contains("0"), ob)
    // the analyzer entry point sees the same table universe
    val (ac, ab) = post("/sqlanalyzer",
      """{"query":"SELECT `table` FROM system_columns"}""")
    assert(ac == 200 && ab.contains("Physical"), ab)
  }

  test("column DDL: add column reads NULL for old rows, drop projects it away") {
    val (ac, ab) = post("/ddl/logs/columns", """{"name":"region","type":"string"}""")
    assert(ac == 200, ab)
    // a new ingest can fill it; the pre-ALTER rows read back NULL
    post("/ingest/tables/logs",
      """{"columns":["sourcetype","latency","_time","region"],
        |"data":[["edge","3.5","2024-03-03 08:00:00","eu"]]}""".stripMargin)
    val (sc, sb) = post("/search",
      """{"query":"SELECT sourcetype, region FROM logs ORDER BY region NULLS FIRST"}""")
    assert(sc == 200 && sb.contains("\"region\":\"eu\""), sb)
    val (dc, db) = delete("/ddl/logs/columns/region")
    assert(dc == 200, db)
    val (s2c, s2b) = post("/search", """{"query":"SELECT * FROM logs LIMIT 1"}""")
    assert(s2c == 200 && !s2b.contains("region"), s2b)
    // load-bearing columns refuse to drop
    assert(delete("/ddl/logs/columns/_time")._1 == 400)
  }

  test("database DDL: create, list includes default, drop") {
    assert(post("/ddl/databases", """{"name":"metrics"}""")._1 == 200)
    val (lc, lb) = get("/ddl/databases")
    assert(lc == 200 && lb.contains("default") && lb.contains("metrics"), lb)
    assert(delete("/ddl/databases/metrics")._1 == 200)
    assert(delete("/ddl/databases/default")._1 == 400)
  }

  test("rawstore: create, raw-line ingest with JSON time extraction, " +
    "query-time field extraction, drop") {
    assert(post("/ddl/rawstores", """{"name":"applogs"}""")._1 == 200)
    val (ic, ib) = post("/ingest/rawstores/applogs",
      """{"sourcetype":"nginx","data":[
        | "{\"timestamp\":\"2024-04-01 12:00:00\",\"level\":\"warn\",\"ms\":42}",
        | "{\"timestamp\":\"2024-04-01 12:05:00\",\"level\":\"info\",\"ms\":7}"]}""".stripMargin)
    assert(ic == 200 && ib.contains("\"committed\":2"), ib)
    // schema-on-read: fields extracted at query time from _raw
    val (sc, sb) = post("/search",
      """{"query":"SELECT get_json_object(_raw, '$.level') AS level, _time FROM applogs ORDER BY _time"}""")
    assert(sc == 200 && sb.contains("\"level\":\"warn\""), sb)
    assert(sb.contains("2024-04-01 12:00:00") || sb.contains("2024-04-01T12:00:00"), sb)
    val (lc, lb) = get("/ddl/rawstores")
    assert(lc == 200 && lb.contains("applogs") && lb.contains("rawstore"), lb)
    assert(delete("/ddl/rawstores/applogs")._1 == 200)
  }

  test("search streams a large limit:0 result chunked without collect") {
    // 50k-row result through the chunked streaming path: limit 0 means
    // "unbounded" (clamped server-side), and every row must arrive.
    val (code, bd) = post("/search",
      """{"query":"SELECT id, id * 2 AS dbl FROM range(50000)","limit":0}""")
    assert(code == 200)
    assert(bd.count(_ == '{') == 50001, s"rows=${bd.count(_ == '{')  - 1}")
    assert(bd.contains("\"id\":49999"), bd.takeRight(200))
  }

  test("watch long-poll re-emits the refreshed result as data changes") {
    // WATCH (reference live views: periodic refresh, ASTWatchQuery
    // LIMIT n): the chunked NDJSON stream must deliver version 1
    // immediately, then version 2 only after new rows are ingested —
    // each refresh is a fresh scan of the table.
    val conn = new java.net.URI(base + "/search").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    conn.getOutputStream.write(
      """{"query":"SELECT count(*) AS n FROM logs","watch":2,
        |"watch_interval_ms":200}""".stripMargin.getBytes("UTF-8"))
    conn.getOutputStream.close()
    assert(conn.getResponseCode == 200)
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
    val line1 = reader.readLine()
    assert(line1.startsWith("""{"version":1,"""), line1)
    val n1 = """"n":(\d+)""".r.findFirstMatchIn(line1).get.group(1).toLong

    // no change yet → nothing new arrives; now ingest one more row
    val (ic, ib) = post("/ingest/tables/logs",
      """{"columns":["sourcetype","latency","_time","_idem"],
        |"data":[["watchsrc","3.5","2024-03-03 08:00:00","w1"]]}""".stripMargin)
    assert(ic == 200, ib)

    val line2 = reader.readLine()
    assert(line2 != null, "watch stream closed before the second refresh")
    assert(line2.startsWith("""{"version":2,"""), line2)
    val n2 = """"n":(\d+)""".r.findFirstMatchIn(line2).get.group(1).toLong
    assert(n2 == n1 + 1, s"refresh did not see the ingested row: $n1 -> $n2")
    assert(reader.readLine() == null, "stream must close after watch=2 updates")
    reader.close()
  }

  test("system.parts lists partition file sets after ingest") {
    val (gc, gb) = get("/system/parts")
    assert(gc == 200, gb)
    assert(gb.contains("\"table\":\"logs\""), gb)
    val (sc2, sb2) = post("/search",
      """{"query":"SELECT table, count(*) AS n_parts, sum(n_files) AS files FROM system_parts WHERE table = 'logs' GROUP BY table"}""")
    assert(sc2 == 200, sb2)
    assert(""""files":(\d+)""".r.findFirstMatchIn(sb2).get.group(1).toLong >= 1, sb2)
  }

  test("csv/tsv formats and the prometheus metrics endpoint") {
    val (cc, cb) = post("/search",
      """{"query":"SELECT 'a,b' AS s, 1 AS n UNION ALL SELECT NULL, 2 ORDER BY n","format":"csv"}""")
    assert(cc == 200, cb)
    assert(cb == "s,n\n\"a,b\",1\n\\N,2\n", cb)
    val (tc, tb) = post("/search",
      """{"query":"SELECT 'x\ty' AS s, 1 AS n","format":"tsv"}""")
    assert(tc == 200 && tb == "s\tn\nx\\ty\t1\n", tb)
    // /metrics sits at the server root (prometheus convention), not /dae/v1
    val r = http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}/metrics")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200, r.body())
    assert(r.body().contains("# TYPE graft_jvm_heap_used_bytes gauge"), r.body())
    assert(r.body().linesIterator.exists(_.matches("graft_default_parallelism \\d+")),
      r.body())
  }

  test("query_log records search executions and is itself searchable") {
    graft.rest.SystemTables.QueryLog.clear()
    val (c1, b1) = post("/search", """{"query":"SELECT 41+1 AS answer"}""")
    assert(c1 == 200 && b1.contains("\"answer\":42"), b1)
    post("/search", """{"query":"SELECT dummy FROM system_one"}""")
    // REST surface
    val (gc, gb) = get("/system/query_log")
    assert(gc == 200 && gb.contains("SELECT 41+1 AS answer"), gb)
    assert(gb.contains("\"status\":\"ok\""), gb)
    // SQL surface: the log joins the system_* views
    val (c2, b2) = post("/search",
      """{"query":"SELECT count(*) AS n FROM system_query_log WHERE status = 'ok' AND result_rows >= 1"}""")
    assert(c2 == 200, b2)
    val n = """"n":(\d+)""".r.findFirstMatchIn(b2).get.group(1).toLong
    assert(n >= 2, s"expected both searches logged, got $n: $b2")
    // a failing query lands with status=error
    post("/search", """{"query":"SELECT FROM nowhere"}""")
    val (c3, b3) = post("/search",
      """{"query":"SELECT count(*) AS n FROM system_query_log WHERE status = 'error'"}""")
    assert(c3 == 200, b3)
    assert(""""n":(\d+)""".r.findFirstMatchIn(b3).get.group(1).toLong >= 1, b3)
  }

  test("analyzer returns a physical plan without executing") {
    val (code, body) = post("/sqlanalyzer",
      """{"query":"SELECT sourcetype, avg(latency) FROM logs GROUP BY sourcetype"}""")
    assert(code == 200 && body.contains("Physical"), body)
  }

  test("analyzer explain modes expose each Catalyst stage") {
    def plan(mode: String): String = {
      val (code, body) = post("/sqlanalyzer",
        s"""{"query":"SELECT sourcetype, count(*) FROM logs GROUP BY sourcetype","mode":"$mode"}""")
      assert(code == 200, body)
      body
    }
    assert(plan("ast").contains("'UnresolvedRelation") ||
      plan("ast").contains("'Aggregate"))
    assert(plan("syntax").contains("Aggregate"))
    assert(plan("plan").contains("Aggregate"))
    assert(plan("pipeline").contains("HashAggregate"))
    // under AQE the codegen subtrees may not exist until execution — the
    // mode must answer either way, never error
    assert(plan("codegen").contains("WholeStageCodegen"),
      plan("codegen").take(300))
    val (bad, bb) = post("/sqlanalyzer",
      """{"query":"SELECT 1","mode":"nope"}""")
    assert(bad == 400 && bb.contains("unknown explain mode"), bb)
  }

  test("query cache: repeated search hits, ingest invalidation serves fresh") {
    graft.core.QueryCache.clear()
    val q = """{"query":"SELECT count(*) AS n FROM logs","use_cache":true}"""
    val (c1, b1) = post("/search", q)
    assert(c1 == 200, b1)
    val h0 = graft.core.QueryCache.hits
    val (c2, b2) = post("/search", q)
    assert(c2 == 200 && b2 == b1, s"$b1 vs $b2")
    assert(graft.core.QueryCache.hits == h0 + 1,
      "repeated cached search did not hit the cache")
    // ingest → invalidatePath fires → next cached search must be fresh
    val rows1 = b1.split("\"n\":")(1).takeWhile(_.isDigit).toLong
    val (ic, ib) = post("/ingest/tables/logs",
      """{"columns":["sourcetype","latency","_time","_idem"],
        |"data":[["cacheinv","1.0","2024-03-05 00:00:00","qc1"]]}""".stripMargin)
    assert(ic == 200, ib)
    val (c3, b3) = post("/search", q)
    val rows2 = b3.split("\"n\":")(1).takeWhile(_.isDigit).toLong
    assert(c3 == 200 && rows2 == rows1 + 1,
      s"stale cached result after ingest: $rows1 -> $rows2")
    // the fresh result is itself cached again
    val h1 = graft.core.QueryCache.hits
    val (c4, b4) = post("/search", q)
    assert(c4 == 200 && b4 == b3 && graft.core.QueryCache.hits == h1 + 1)
    graft.core.QueryCache.clear()
  }

  test("drop removes table and data") {
    val (code, _) = delete("/ddl/tables/logs")
    assert(code == 200)
    val (_, lb) = get("/ddl/tables")
    assert(!lb.contains("\"logs\""), lb)
    server.stop()
  }
}
