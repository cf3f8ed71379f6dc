package graft.streaming

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** Drives the from-scratch NATS wire client + JetStream pull consumer
  * ([[NatsWire]]) and the fetch→spool→ack relay ([[NatsBridge]]) against
  * the wire-accurate in-process mock — the offline stand-in for the
  * reference's broker entry point (src/nats.rs). */
class NatsBridgeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val subject = "events.login"
  private val schema = EventSchemas.tables("login_events")

  private def loginMsg(id: String, user: String, ts: Long): Seq[Any] =
    Seq(id, "login", user, "s-1", "a-1", ts,
      "web", "android", "14", "android", "14", "chrome", "128",
      "mobile", "1080x2400", "UA")

  private def withServer(f: (MockNatsServer, NatsWire.Conn) => Unit): Unit = {
    val srv = new MockNatsServer
    try {
      val nc = new NatsWire.Conn(srv.host, srv.port, Some("user"), Some("password"))
      try f(srv, nc) finally nc.close()
    } finally srv.close()
  }

  test("wire round trip: ensure stream/consumer, publish, pull with ack subjects, ack") {
    withServer { (srv, nc) =>
      val js = new NatsWire.JetStream(nc)
      js.ensureStream("EVENTS", Seq(subject))
      js.ensureStream("EVENTS", Seq(subject)) // idempotent (INFO path)
      js.ensureConsumer("EVENTS", "graft-consumer", Seq(subject))

      // producer publishes proto-encoded wire events over plain PUB
      (1 to 5).foreach { i =>
        nc.publish(subject, ProtoWire.encode(loginMsg(s"b-$i", s"u-$i", 1726300800L + i), schema))
      }
      nc.ping(2000) // flush barrier: all PUBs processed server-side
      assert(srv.streamSize("EVENTS") == 5)

      val msgs = js.fetch("EVENTS", "graft-consumer", batch = 10, expiresMs = 2000)
      assert(msgs.size == 5)
      assert(msgs.forall(_.deliveries == 1))
      assert(msgs.map(_.streamSeq) == Seq(1L, 2L, 3L, 4L, 5L))
      msgs.foreach(js.ack)
      nc.ping(2000) // acks are fire-and-forget PUBs; barrier before assert
      assert(srv.ackedCount("EVENTS", "graft-consumer") == 5)

      // acked messages never redeliver
      assert(js.fetch("EVENTS", "graft-consumer", batch = 10, expiresMs = 300).isEmpty)
    }
  }

  test("relay: fetch -> graft-proto spool -> ack; Spark reads the spool typed") {
    withServer { (srv, nc) =>
      val js = new NatsWire.JetStream(nc)
      js.ensureStream("EVENTS", Seq(subject))
      js.ensureConsumer("EVENTS", "graft-consumer", Seq(subject))
      (1 to 4).foreach { i =>
        nc.publish(subject, ProtoWire.encode(loginMsg(s"b-$i", s"u-$i", 1726300800L + i), schema))
      }
      nc.ping(2000)
      val spool = java.nio.file.Files.createTempDirectory("nats_spool").toString
      val s = NatsBridge.NatsSession(nc, js, "EVENTS", "graft-consumer")
      assert(NatsBridge.pumpOnce(s, spool, batch = 10, expiresMs = 2000) == 4)
      // acked only after the spool file landed
      assert(srv.ackedCount("EVENTS", "graft-consumer") == 4)
      val files = new java.io.File(s"$spool/$subject").listFiles()
      assert(files.nonEmpty && files.forall(f =>
        f.getName.startsWith("nats-") && f.getName.endsWith(".pbstream")))

      val df = spark.read.format("graft-proto")
        .option("schema", schema.toDDL).load(s"$spool/$subject")
      assert(df.count() == 4)
      assert(df.select("user_id").collect().map(_.getString(0)).sorted
        === Array("u-1", "u-2", "u-3", "u-4"))

      // idle pull spools nothing and acks nothing further
      assert(NatsBridge.pumpOnce(s, spool, batch = 10, expiresMs = 300) == 0)
    }
  }

  test("ack_wait redelivery counts deliveries; max_deliver=3 dead-letters poison") {
    withServer { (srv, nc) =>
      val js = new NatsWire.JetStream(nc)
      js.ensureStream("EVENTS", Seq(subject))
      // 1s ack_wait so the spec can cross it; budget = reference's 3
      js.ensureConsumer("EVENTS", "graft-consumer", Seq(subject),
        NatsWire.ConsumerConfig(ackWaitSec = 1, maxDeliver = 3))
      nc.publish(subject, ProtoWire.encode(loginMsg("b-poison", "u-1", 1726300800L), schema))
      nc.ping(2000)

      def pullOne(): Seq[NatsWire.Msg] =
        js.fetch("EVENTS", "graft-consumer", batch = 10, expiresMs = 1500)

      val d1 = pullOne()
      assert(d1.map(_.deliveries) == Seq(1))
      // no ack → past ack_wait the server redelivers with the count bumped
      Thread.sleep(1100)
      val d2 = pullOne()
      assert(d2.map(_.deliveries) == Seq(2))
      Thread.sleep(1100)
      val d3 = pullOne()
      assert(d3.map(_.deliveries) == Seq(3))
      // budget exhausted: never delivered again, lands on the dead list
      Thread.sleep(1100)
      assert(pullOne().isEmpty)
      assert(srv.deadSeqs("EVENTS", "graft-consumer") == Seq(1L))
    }
  }

  test("config-driven connect mirrors the reference NatsConfig shape") {
    val srv = new MockNatsServer
    try {
      val cfg = graft.EngineConfig.default.copy(
        broker = graft.BrokerConfig(
          host = srv.host, clientPort = srv.port,
          subjects = Seq(subject),
          streamConfig = graft.StreamEnvelopeConfig(name = "EVENTS")))
      val session = NatsBridge.connect(cfg)
      try {
        session.nc.publish(subject,
          ProtoWire.encode(loginMsg("b-1", "u-1", 1726300800L), schema))
        session.nc.ping(2000)
        assert(srv.streamSize("EVENTS") == 1)
        val msgs = session.js.fetch("EVENTS", cfg.broker.consumerName,
          batch = 10, expiresMs = 2000)
        assert(msgs.size == 1)
      } finally session.close()
    } finally srv.close()
  }
}
