package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventSchemas, MockNatsServer, NatsWire, ProtoWire}

/** Boots the full production wiring ([[ServeMain.boot]] — the main.rs
  * lifecycle analog) against temp dirs, in both broker modes. */
class ServeMainSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val subject = "events.login"
  private val schema = EventSchemas.tables("login_events")

  private def loginMsg(id: String, user: String, ts: Long): Seq[Any] =
    Seq(id, "login", user, "s-1", "a-1", ts,
      "web", "android", "14", "android", "14", "chrome", "128",
      "mobile", "1080x2400", "UA")

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def httpGet(port: Int, q: String): String = {
    val c = HttpClient.newHttpClient()
    val enc = java.net.URLEncoder.encode(q, UTF_8)
    c.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/?query=$enc")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
  }

  test("file-broker boot: wire file -> typed parquet -> HTTP SELECT -> drain") {
    val wire = tmp("serve_wire"); val out = tmp("serve_out"); val ckpt = tmp("serve_ckpt")
    val cfg = EngineConfig.default.copy(
      broker = BrokerConfig(subjects = Seq(subject)))
    val engine = ServeMain.boot(cfg, spark, wire, out, ckpt,
      httpPort = 0, useNats = false)
    try {
      new java.io.File(s"$wire/$subject").mkdirs()
      sources.ProtoFiles.writeLocal(s"$wire/$subject/flush-000001.pbstream",
        Iterator(loginMsg("b-1", "u-1", 1726300800L),
          loginMsg("b-2", "u-2", 1726300801L)), schema)
      engine.queries.values.foreach(_.processAllAvailable())
      assert(spark.read.parquet(s"$out/login_events").count() == 2)
      val body = httpGet(engine.httpPort,
        "SELECT count(*) AS n FROM login_events")
      assert(body.trim == "2", s"HTTP surface over the served tables: $body")
    } finally engine.drain()
  }

  test("nats boot: publish -> relay spool -> typed parquet; drain stops the relay") {
    val srv = new MockNatsServer
    val wire = tmp("serve_nwire"); val out = tmp("serve_nout"); val ckpt = tmp("serve_nckpt")
    try {
      val cfg = EngineConfig.default.copy(
        broker = BrokerConfig(host = srv.host, clientPort = srv.port,
          subjects = Seq(subject),
          streamConfig = StreamEnvelopeConfig(name = "EVENTS")),
        batcher = BatcherConfig(flushIntervalMs = 100L))
      val engine = ServeMain.boot(cfg, spark, wire, out, ckpt,
        httpPort = 0, useNats = true)
      try {
        // producer on its own connection, like a real deployment
        val prod = new NatsWire.Conn(srv.host, srv.port)
        try {
          (1 to 3).foreach { i =>
            prod.publish(subject,
              ProtoWire.encode(loginMsg(s"b-$i", s"u-$i", 1726300800L + i), schema))
          }
          prod.ping(2000)
        } finally prod.close()
        // relay pulls on its own cadence; poll until rows land
        val deadline = System.currentTimeMillis() + 20000
        var n = 0L
        while (n < 3 && System.currentTimeMillis() < deadline) {
          engine.queries.values.foreach(_.processAllAvailable())
          n = scala.util.Try(
            spark.read.parquet(s"$out/login_events").count()).getOrElse(0L)
          if (n < 3) Thread.sleep(200)
        }
        assert(n == 3, s"expected 3 relayed rows, got $n")
        assert(srv.ackedCount("EVENTS", cfg.broker.consumerName) == 3,
          "relay must ack after the spool write")
      } finally engine.drain()
    } finally srv.close()
  }
}
