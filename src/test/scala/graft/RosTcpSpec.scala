package graft

import java.net.Socket
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RosTcp, RosTcpPublisher, RosTcpSource}
import graft.streaming.Monitor

/** The TCPROS live source: wire framing against the public protocol
  * layout, WAL recovery, and the end-to-end subscribe → capture-sink
  * path driven by an in-process stub publisher socket (the external-seam
  * pattern applied to a wire — deployment swaps in real ROS publishers,
  * zero code change).
  */
class RosTcpSpec extends AnyFunSuite {
  import TestSession._

  private def eventually[A](timeoutMs: Long = 30000L)(f: => A): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return f
      catch { case e: Throwable => last = e; Thread.sleep(100) }
    }
    throw new AssertionError(s"condition not met within ${timeoutMs}ms", last)
  }

  test("TCPROS header framing matches the published little-endian layout") {
    // wiki.ros.org/ROS/TCPROS: [4-byte LE total][per field: 4-byte LE len + "k=v"]
    val bytes = RosTcp.encodeHeader(Seq("callerid" -> "/node"))
    val field = "callerid=/node".getBytes("UTF-8") // 14 bytes
    assert(bytes.length === 4 + 4 + field.length)
    assert(bytes.take(4).toSeq === Seq[Byte](18, 0, 0, 0), "LE total length")
    assert(bytes.slice(4, 8).toSeq === Seq[Byte](14, 0, 0, 0), "LE field length")
    assert(bytes.drop(8).toSeq === field.toSeq)
    // round trip, multiple fields, order-independent map
    val hdr = Seq("callerid" -> "/graft", "topic" -> "/chatter",
      "md5sum" -> "*", "type" -> "*")
    val parsed = RosTcp.readHeader(
      new java.io.ByteArrayInputStream(RosTcp.encodeHeader(hdr)))
    assert(parsed === hdr.toMap)
    // values may contain '=' (message_definition does): split on FIRST =
    val eq = RosTcp.readHeader(new java.io.ByteArrayInputStream(
      RosTcp.encodeHeader(Seq("k" -> "a=b"))))
    assert(eq === Map("k" -> "a=b"))
  }

  test("std_msgs/String codec round-trips and rejects overruns") {
    assert(RosTcp.decodeStdString(RosTcp.encodeStdString("hello")) === "hello")
    assert(RosTcp.decodeStdString(RosTcp.encodeStdString("")) === "")
    // length prefix overrunning the buffer is a fault, not a read past
    intercept[IllegalArgumentException](
      RosTcp.decodeStdString(Array[Byte](9, 0, 0, 0, 'x')))
  }

  test("endpoint spec parses topic=host:port lists") {
    assert(RosTcpSource.parseEndpoints("/chatter=localhost:11411") ===
      Seq(("/chatter", "localhost", 11411)))
    assert(RosTcpSource.parseEndpoints("/a=h1:1; /b=h2:2,/c=h3:3") ===
      Seq(("/a", "h1", 1), ("/b", "h2", 2), ("/c", "h3", 3)))
    intercept[IllegalArgumentException](RosTcpSource.parseEndpoints("nonsense"))
  }

  test("distinct topics never share a WAL file, even when they sanitize alike") {
    // '/cmd/vel' and '/cmd_vel' both sanitize to _cmd_vel — the digest
    // suffix keeps two subscriber threads off one file
    assert(RosTcp.walFileName("/cmd/vel") !== RosTcp.walFileName("/cmd_vel"))
    assert(RosTcp.walFileName("/chatter") === RosTcp.walFileName("/chatter"),
      "deterministic across restarts — recovery depends on it")
  }

  test("WAL scan counts whole records only — a partial tail is recovery, not data") {
    val dir = Files.createTempDirectory("graft_wal").toFile
    val f = new java.io.File(dir, "t.wal")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    out.writeInt(3); out.writeLong(111L); out.write(Array[Byte](1, 2, 3))
    out.writeInt(2); out.writeLong(222L); out.write(Array[Byte](4, 5))
    out.writeInt(99); out.writeLong(333L); out.write(Array[Byte](6)) // torn append
    out.close()
    val (n, good) = RosTcp.walScan(f)
    assert(n === 2L)
    assert(good === (4 + 8 + 3) + (4 + 8 + 2))
  }

  test("publisher refuses a topic mismatch with an error header, per protocol") {
    val pub = new RosTcpPublisher(0, "/chatter")
    try {
      val sock = new Socket("localhost", pub.boundPort)
      try {
        val e = intercept[java.io.IOException](
          RosTcp.subscribeHandshake(sock, "/wrong", "/spec"))
        assert(e.getMessage.contains("/chatter"))
      } finally sock.close()
    } finally pub.close()
  }

  test("live subscribe → capture sink: exactly-once across a checkpoint restart") {
    val wal = Files.createTempDirectory("graft_rostcp_wal").toString
    val logPath = Files.createTempDirectory("graft_rostcp_log").toString + "/log"
    val ckpt = Files.createTempDirectory("graft_rostcp_ck").toString + "/c1"
    val pub1 = new RosTcpPublisher(0, "/chatter")
    val chatterPort = pub1.boundPort
    val pub2 = new RosTcpPublisher(0, "/imu")
    def startQuery() = Monitor.captureExactlyOnce(
      spark.readStream.format("rostcp")
        .option("endpoints",
          s"/chatter=localhost:$chatterPort;/imu=localhost:${pub2.boundPort}")
        .option("walDir", wal).load(),
      logPath, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    def logged() = Monitor.readLog(spark, logPath)
    val q1 = startQuery()
    try {
      eventually() { assert(pub1.connected >= 1 && pub2.connected >= 1) }
      (0 until 5).foreach(i => pub1.publish(RosTcp.encodeStdString(s"c$i")))
      (0 until 3).foreach(i => pub2.publish(RosTcp.encodeStdString(s"i$i")))
      eventually() {
        q1.processAllAvailable()
        assert(logged().count() === 8L)
      }
    } finally { q1.stop(); pub1.close() }

    // restart against the SAME checkpoint + WAL; the publisher process
    // also restarts on the same port (a capture hiccup, not a failure)
    val pub1b = new RosTcpPublisher(chatterPort, "/chatter")
    val q2 = startQuery()
    try {
      eventually() { assert(pub1b.connected >= 1) }
      (5 until 8).foreach(i => pub1b.publish(RosTcp.encodeStdString(s"c$i")))
      eventually() {
        q2.processAllAvailable()
        assert(logged().count() === 11L)
      }
    } finally { q2.stop(); pub1b.close(); pub2.close() }

    // exactly-once: every (topic, seq) exactly once, seqs dense from 0,
    // payloads decode to what the stub published
    val rows = logged().collect().map(r =>
      (r.getAs[String]("topic"), r.getAs[Long]("seq"),
        RosTcp.decodeStdString(r.getAs[Array[Byte]]("raw"))))
    assert(rows.length === rows.map(r => (r._1, r._2)).distinct.length)
    val chatter = rows.filter(_._1 == "/chatter").sortBy(_._2)
    assert(chatter.map(_._2).toSeq === (0L until 8L).toSeq)
    assert(chatter.map(_._3).toSeq === (0 until 8).map(i => s"c$i"))
    val imu = rows.filter(_._1 == "/imu").sortBy(_._2)
    assert(imu.map(_._3).toSeq === Seq("i0", "i1", "i2"))

    // the WAL is immediately a batch table — the finished capture session
    val batch = spark.read.format("rostcp")
      .option("endpoints",
        s"/chatter=localhost:$chatterPort;/imu=localhost:${pub2.boundPort}")
      .option("walDir", wal).load()
    assert(batch.count() === 11L)
    assert(batch.select("topic", "seq").collect().map(r =>
        (r.getString(0), r.getLong(1))).toSet ===
      rows.map(r => (r._1, r._2)).toSet)
    // column pruning reaches the WAL reader (schema-driven, like every
    // DSv2 source here)
    assert(batch.select("seq").columns.toSeq === Seq("seq"))

    // ...and composes into the reference's snapshot tree (store.py:47-84):
    // one document per tick holding the latest message per topic
    implicit val s = spark
    val msgs = batch
      .select(lit("live").as("session"), col("topic"),
        col("seq").as("ts_sec"),
        RosTcp.stdStringCol(col("raw")).as("payload"))
    val snaps = graft.streaming.SubscriberTree.compose(
      Map("chatter" -> msgs.filter(col("topic") === "/chatter").drop("topic"),
          "imu" -> msgs.filter(col("topic") === "/imu").drop("topic")),
      tickSec = 4L).collect()
    assert(snaps.nonEmpty, "batch compose must emit tick snapshots")
    assert(snaps.forall(_.tree.values.forall(_.matches("[ci]\\d"))),
      "snapshot trees must hold decoded payloads")
  }

  test("master discovery: the two-hop XML-RPC resolution against a stub master") {
    import graft.sources.RosMaster
    // XML-RPC codec first: encode is byte-stable, decode covers the
    // [code, msg, value] shapes the two ROS calls return
    val call = RosMaster.encodeCall("requestTopic",
      Seq("/graft", "/chatter", Seq(Seq("TCPROS"))))
    assert(call.contains("<methodName>requestTopic</methodName>"))
    assert(call.contains(
      "<value><array><data><value><array><data><value><string>TCPROS</string>"))
    // stub master + publisher-slave on ONE JDK http server, speaking the
    // documented protocol bytes (the deployment drop-in is a real roscore)
    val pub = new RosTcpPublisher(0, "/chatter")
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("localhost", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, inner: String): Unit = {
      val body = ("<?xml version=\"1.0\"?><methodResponse><params><param>" +
        inner + "</param></params></methodResponse>").getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    }
    http.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (req.contains("<methodName>registerSubscriber</methodName>") &&
          req.contains("<string>/chatter</string>")) {
        respond(ex, "<value><array><data><value><i4>1</i4></value>" +
          "<value><string>ok</string></value><value><array><data>" +
          s"<value><string>http://localhost:${http.getAddress.getPort}/slave</string></value>" +
          "</data></array></value></data></array></value>")
      } else if (req.contains("<methodName>registerSubscriber</methodName>")) {
        respond(ex, "<value><array><data><value><i4>0</i4></value>" +
          "<value><string>unknown topic</string></value>" +
          "<value><array><data></data></array></value></data></array></value>")
      } else if (req.contains("<methodName>requestTopic</methodName>")) {
        respond(ex, "<value><array><data><value><i4>1</i4></value>" +
          "<value><string>ok</string></value><value><array><data>" +
          "<value><string>TCPROS</string></value>" +
          "<value><string>localhost</string></value>" +
          s"<value><i4>${pub.boundPort}</i4></value>" +
          "</data></array></value></data></array></value>")
      } else respond(ex, "<value><array><data><value><i4>-1</i4></value>" +
        "<value><string>unknown method</string></value>" +
        "<value><i4>0</i4></value></data></array></value>")
    })
    http.start()
    try {
      val master = s"http://localhost:${http.getAddress.getPort}"
      assert(RosMaster.resolveEndpoints(master, "/graft", Seq("/chatter")) ===
        Seq(("/chatter", "localhost", pub.boundPort)))
      // a non-1 code surfaces the master's own message, never a misparse
      val e = intercept[java.io.IOException](
        RosMaster.registerSubscriber(master, "/graft", "/no_such_topic"))
      assert(e.getMessage.contains("unknown topic"))
      // end-to-end: the SOURCE resolves through the master option and
      // captures live frames — no endpoints option anywhere
      val wal = Files.createTempDirectory("graft_master_wal").toString
      val q = spark.readStream.format("rostcp")
        .option("master", master).option("topics", "/chatter")
        .option("walDir", wal).load()
        .writeStream.format("memory").queryName("master_out")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_master_ck").toString + "/c")
        .start()
      try {
        eventually() { assert(pub.connected >= 1) }
        pub.publish(RosTcp.encodeStdString("via-master"))
        eventually() {
          q.processAllAvailable()
          assert(spark.table("master_out").count() === 1L)
        }
        val row = spark.table("master_out").collect().head
        assert(row.getAs[String]("topic") === "/chatter")
        assert(RosTcp.decodeStdString(row.getAs[Array[Byte]]("raw")) === "via-master")
      } finally q.stop()
    } finally { http.stop(0); pub.close() }
  }

  test("publisher registers with the master; a subscriber resolves it end-to-end") {
    import graft.sources.RosMaster
    // stub MASTER only — the slave hop hits graft's REAL responder: it
    // records registerPublisher's advertised callerApi and hands it back
    // to registerSubscriber, exactly what roscore does
    val registered = new java.util.concurrent.atomic.AtomicReference[String](null)
    val unregistered = new java.util.concurrent.atomic.AtomicBoolean(false)
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("localhost", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, inner: String): Unit = {
      val body = ("<?xml version=\"1.0\"?><methodResponse><params><param>" +
        inner + "</param></params></methodResponse>").getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    }
    http.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (req.contains("<methodName>registerPublisher</methodName>")) {
        val api = "<string>(http://[^<]+)</string>".r
          .findAllMatchIn(req).map(_.group(1)).toSeq.last
        registered.set(api)
        respond(ex, "<value><array><data><value><i4>1</i4></value>" +
          "<value><string>ok</string></value>" +
          "<value><array><data></data></array></value></data></array></value>")
      } else if (req.contains("<methodName>unregisterPublisher</methodName>")) {
        unregistered.set(true)
        respond(ex, "<value><array><data><value><i4>1</i4></value>" +
          "<value><string>ok</string></value><value><i4>1</i4></value>" +
          "</data></array></value>")
      } else if (req.contains("<methodName>registerSubscriber</methodName>")) {
        respond(ex, "<value><array><data><value><i4>1</i4></value>" +
          "<value><string>ok</string></value><value><array><data>" +
          s"<value><string>${registered.get()}</string></value>" +
          "</data></array></value></data></array></value>")
      } else respond(ex, "<value><array><data><value><i4>-1</i4></value>" +
        "<value><string>unknown method</string></value>" +
        "<value><i4>0</i4></value></data></array></value>")
    })
    http.start()
    val master = s"http://localhost:${http.getAddress.getPort}"
    val pub = new RosTcpPublisher(0, "/chatter")
    try {
      val api = pub.register(master)
      assert(registered.get() === api,
        "the master must receive the slave responder's own URI")
      // double registration is a caller bug, not silent re-advertising
      intercept[IllegalArgumentException](pub.register(master))
      // a real subscriber's two hops: master names graft's slave API,
      // graft's responder answers requestTopic with its TCPROS port
      val eps = RosMaster.resolveEndpoints(master, "/rostopic", Seq("/chatter"))
      assert(eps === Seq(("/chatter", "localhost", pub.boundPort)))
      // ... and frames round-trip over the resolved endpoint
      val sock = new Socket(eps.head._2, eps.head._3)
      try {
        val hdr = RosTcp.subscribeHandshake(sock, "/chatter", "/rostopic")
        assert(hdr("topic") === "/chatter")
        eventually() { assert(pub.connected >= 1) }
        pub.publish(RosTcp.encodeStdString("discovered"))
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        assert(RosTcp.decodeStdString(RosTcp.readFrame(in)) === "discovered")
      } finally sock.close()
    } finally { pub.close(); http.stop(0) }
    assert(unregistered.get(), "close() must withdraw the advertisement")
  }

  test("run_scenario live: timer scenario subscribes, snapshots, and captures") {
    // the reference's operational loop end-to-end: scenario file → live
    // TCPROS subscription → per-tick snapshot tree → exactly-once log
    val dir = Files.createTempDirectory("graft_live_sc")
    val dest = s"$dir/out"
    val scenario = dir.resolve("live.yaml")
    Files.write(scenario,
      (s"""context: "live_capture"
          |storage:
          |  method: "filesystem"
          |  location: "$dest"
          |collection:
          |  method: "timer"
          |  timer_delay: 1
          |data:
          |  chatter: "/chatter"
          |""").stripMargin.getBytes("UTF-8"))
    val pub = new RosTcpPublisher(0, "/chatter")
    val q = graft.api.RunScenario.live(spark, Array(
      "--scenario_file", scenario.toString,
      "--endpoints", s"/chatter=localhost:${pub.boundPort}"))
    try {
      eventually() { assert(pub.connected >= 1) }
      // each sleep crosses at least one 1s tick boundary, so the NEXT
      // message fires the elapsed ticks' snapshots (SubscriberTree rule)
      pub.publish(RosTcp.encodeStdString("m0")); Thread.sleep(1200)
      pub.publish(RosTcp.encodeStdString("m1")); Thread.sleep(1200)
      pub.publish(RosTcp.encodeStdString("m2"))
      eventually() {
        q.processAllAvailable()
        assert(graft.streaming.Monitor.readLog(spark, dest).count() >= 2L)
      }
    } finally { q.stop(); pub.close() }
    val snaps = graft.streaming.Monitor.readLog(spark, dest).collect()
    assert(snaps.forall(_.getAs[String]("session") === "live_capture"))
    val trees = snaps.map(_.getAs[Map[String, String]]("tree"))
    assert(trees.forall(t => t.keySet === Set("chatter")))
    assert(trees.flatMap(_.values).toSet.subsetOf(Set("m0", "m1", "m2")),
      "snapshot trees hold the decoded latest message per topic")
  }

  test("run_monitoring live: wire rates land in the @monitor log; no_log suppresses it") {
    // the reference's ScenarioMonitor end-to-end: scenario file → live
    // TCPROS subscription → windowed per-topic rate rows → monitor log
    def scenarioFile(dir: java.nio.file.Path, dest: String): java.nio.file.Path = {
      val f = dir.resolve("mon.yaml")
      Files.write(f,
        (s"""context: "live_monitor"
            |storage:
            |  method: "filesystem"
            |  location: "$dest"
            |collection:
            |  method: "event"
            |  watch_topic: "/chatter"
            |data:
            |  chatter: "/chatter"
            |""").stripMargin.getBytes("UTF-8"))
      f
    }
    val dir = Files.createTempDirectory("graft_live_mon")
    val dest = s"$dir/out"
    val pub = new RosTcpPublisher(0, "/chatter")
    val q = graft.api.RunMonitoring.live(spark, Array(
      "--scenario_file", scenarioFile(dir, dest).toString,
      "--endpoints", s"/chatter=localhost:${pub.boundPort}",
      "--window", "10 seconds", "--verbose", "false"))
    try {
      eventually() { assert(pub.connected >= 1) }
      pub.publish(RosTcp.encodeStdString("m0"))
      pub.publish(RosTcp.encodeStdString("m1"))
      eventually() {
        q.processAllAvailable()
        val log = Monitor.readLog(spark, s"$dest@monitor")
        assert(log.count() >= 1L)
      }
    } finally { q.stop(); pub.close() }
    val rows = Monitor.readLog(spark, s"$dest@monitor").collect()
    assert(rows.forall(_.getAs[String]("topic") === "/chatter"))
    // the LATEST update for the open window counts both messages
    assert(rows.map(_.getAs[Long]("n_msgs")).max === 2L,
      "windowed rate rows must reflect live wire traffic")
    assert(rows.forall(_.getAs[Long]("payload_bytes") > 0L))

    // no_log: rates still flow (update-mode query runs) but no @monitor
    val dir2 = Files.createTempDirectory("graft_live_mon2")
    val dest2 = s"$dir2/out"
    val pub2 = new RosTcpPublisher(0, "/chatter")
    val q2 = graft.api.RunMonitoring.live(spark, Array(
      "--scenario_file", scenarioFile(dir2, dest2).toString,
      "--endpoints", s"/chatter=localhost:${pub2.boundPort}",
      "--no_log", "true", "--verbose", "false"))
    try {
      eventually() { assert(pub2.connected >= 1) }
      pub2.publish(RosTcp.encodeStdString("m0"))
      eventually() {
        q2.processAllAvailable()
        assert(q2.lastProgress != null &&
          q2.recentProgress.map(_.numInputRows).sum >= 1L)
      }
      assert(!new java.io.File(s"$dest2@monitor").exists(),
        "no_log must suppress the monitor log")
    } finally { q2.stop(); pub2.close() }
  }

  test("publish stream: a stub subscriber round-trips republished frames in order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pub = new RosTcpPublisher(0, "/replay")
    try {
      // stub SUBSCRIBER: our own wire helpers on a raw socket
      val sock = new Socket("localhost", pub.boundPort)
      val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val reader = new Thread(() => {
        try {
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          while (true) got.add(RosTcp.decodeStdString(RosTcp.readFrame(in)))
        } catch { case _: Exception => () }
      })
      val hdr = RosTcp.subscribeHandshake(sock, "/replay", "/spec_sub")
      assert(hdr("topic") === "/replay" && hdr("type") === "std_msgs/String")
      reader.setDaemon(true); reader.start()
      eventually() { assert(pub.connected === 1) }
      val input = MemoryStream[(Long, Array[Byte])]
      input.addData((2L, RosTcp.encodeStdString("b")),
        (1L, RosTcp.encodeStdString("a")), (3L, RosTcp.encodeStdString("c")))
      val q = RosTcp.publishStream(
        input.toDF().toDF("seq", "raw"), pub,
        Files.createTempDirectory("graft_pub_ck").toString + "/c",
        orderCol = Some("seq"))
      try q.awaitTermination(120000) finally q.stop()
      eventually() { assert(got.size === 3) }
      assert(got.iterator().asScala.toSeq === Seq("a", "b", "c"),
        "frames arrive in the declared replay order")
      sock.close()
    } finally pub.close()
  }
}
