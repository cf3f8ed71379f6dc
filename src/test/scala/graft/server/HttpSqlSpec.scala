package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-over-HTTP surface (SURVEY §3.3; reference exposes ClickHouse's
  * 8123 to analysts — `build/docker-compose.yml:8-9`). */
class HttpSqlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def withServer[A](f: (HttpClient, Int) => A): A = {
    HttpSql.registerTables(spark, "/root/testdata/sf0.001")
    val srv = new HttpSql(spark)
    val port = srv.start()
    try f(HttpClient.newHttpClient(), port) finally srv.stop()
  }

  private def get(c: HttpClient, port: Int, pathAndQuery: String)
      : HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$pathAndQuery"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(c: HttpClient, port: Int, body: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def enc(q: String) = java.net.URLEncoder.encode(q, UTF_8)

  test("GET /ping returns Ok. — byte-compatible with the reference's check") {
    withServer { (c, p) =>
      val r = get(c, p, "/ping")
      assert(r.statusCode() == 200)
      assert(r.body() == "Ok.\n")
    }
  }

  test("query param + FORMAT clause: TSV default, JSONEachRow, CSVWithNames") {
    withServer { (c, p) =>
      // default format = TabSeparated, no header
      val tsv = get(c, p, s"/?query=${enc("SELECT 1 AS a, 'x\ty' AS b")}")
      assert(tsv.statusCode() == 200)
      assert(tsv.body() == "1\tx\\ty\n") // tab in value is escaped, not a separator

      val json = get(c, p, s"/?query=${enc(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 2 FORMAT JSONEachRow")}")
      val lines = json.body().linesIterator.toSeq
      assert(lines.size == 2)
      assert(lines.head.startsWith("{\"r_regionkey\":0,\"r_name\":\""))

      val csv = get(c, p, s"/?query=${enc(
        "SELECT COUNT(*) AS n FROM nation FORMAT CSVWithNames")}")
      assert(csv.body().linesIterator.toSeq.head == "n")
    }
  }

  test("POST body is the query; aggregates over registered tables") {
    withServer { (c, p) =>
      val r = post(c, p,
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1 FORMAT TSVWithNames")
      assert(r.statusCode() == 200)
      val lines = r.body().linesIterator.toSeq
      assert(lines.head == "l_returnflag\tn")
      assert(lines.size >= 3) // A, N, R flags at every SF
    }
  }

  test("NULL and timestamp rendering follow the CH conventions") {
    withServer { (c, p) =>
      val r = get(c, p, s"/?query=${enc(
        "SELECT CAST(NULL AS INT) AS a, TIMESTAMP '2024-09-14 10:00:00' AS t")}")
      assert(r.body() == "\\N\t2024-09-14 10:00:00\n")
    }
  }

  test("error contract: bad SQL is the permanent (400) class, not 500") {
    withServer { (c, p) =>
      val r = get(c, p, s"/?query=${enc("SELEKT 1")}")
      assert(r.statusCode() == 400)
      assert(r.body().startsWith("Cannot parse query:"))
      val empty = get(c, p, "/?query=")
      assert(empty.statusCode() == 400)
    }
  }

  test("error contract: execution failure is 500, before any 200 bytes") {
    withServer { (c, p) =>
      val r = get(c, p, s"/?query=${enc("SELECT raise_error('boom')")}")
      assert(r.statusCode() == 500)
      assert(r.body().startsWith("Query failed:"))
    }
  }

  test("robustness: malformed percent-encoding answers 400, not a dropped connection") {
    withServer { (_, p) =>
      // HttpClient validates URIs client-side; speak raw HTTP to exercise
      // the server's own handling of a bad escape pair
      val sock = new java.net.Socket("127.0.0.1", p)
      try {
        val out = sock.getOutputStream
        out.write(("GET /?query=SELECT%zz1 HTTP/1.1\r\nHost: x\r\n" +
          "Connection: close\r\n\r\n").getBytes(UTF_8))
        out.flush()
        val status = new String(sock.getInputStream.readAllBytes(), UTF_8)
          .linesIterator.next()
        assert(status.contains("400"), s"got: $status")
      } finally sock.close()
    }
  }

  test("FORMAT stripping is restricted to known format names") {
    withServer { (c, p) =>
      // unknown trailing ident -> treated as SQL, fails analysis as 400
      val unknown = get(c, p, s"/?query=${enc("SELECT 1 FORMAT Quipu")}")
      assert(unknown.statusCode() == 400)
      // a column actually NAMED format is untouched
      val col = get(c, p, s"/?query=${enc(
        "SELECT * FROM (SELECT 2 AS format) ORDER BY format")}")
      assert(col.statusCode() == 200 && col.body() == "2\n")
    }
  }
}
