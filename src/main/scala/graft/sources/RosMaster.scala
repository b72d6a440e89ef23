package graft.sources

import java.io.ByteArrayInputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** ROS 1 endpoint DISCOVERY — the XML-RPC negotiation the reference gets
  * from rospy (public Master/Slave APIs, wiki.ros.org/ROS/Master_API and
  * wiki.ros.org/ROS/Slave_API): a subscriber asks the master
  * `registerSubscriber(caller_id, topic, type, caller_api)` for the
  * topic's publisher URIs, then asks each publisher's slave endpoint
  * `requestTopic(caller_id, topic, [["TCPROS"]])` for its live TCPROS
  * (host, port). Composed with [[RosTcpSource]] this removes the last
  * manual step: `option("master", "http://host:11311")` +
  * `option("topics", "/chatter,/imu")` resolves endpoints at query
  * start, exactly the two hops rospy makes.
  *
  * Everything is JDK-only: HTTP POST via HttpURLConnection, XML via
  * javax.xml DocumentBuilder — no client library, the protocol is that
  * small. Resolution is a START-time negotiation (the reference's
  * subscriber does the same once per connection); publisher churn
  * re-resolves through the source's reconnect loop only if the old
  * endpoint comes back — live master re-query on churn is deployment
  * orchestration, not data plane.
  *
  * Values cover the subset the two calls use: i4/int, string (bare text
  * counts as string per spec), boolean, and array — enough for
  * `[code, statusMessage, value]` triples.
  */
object RosMaster {

  /** Encode one XML-RPC parameter value (Int, String, Boolean, Seq). */
  private[sources] def encodeValue(v: Any): String = v match {
    case i: Int => s"<value><i4>$i</i4></value>"
    case b: Boolean => s"<value><boolean>${if (b) 1 else 0}</boolean></value>"
    case s: String =>
      val esc = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      s"<value><string>$esc</string></value>"
    case xs: Seq[_] =>
      xs.map(encodeValue).mkString("<value><array><data>", "", "</data></array></value>")
    case other => throw new IllegalArgumentException(s"unsupported XML-RPC type: $other")
  }

  private[graft] def encodeCall(method: String, params: Seq[Any]): String =
    s"""<?xml version="1.0"?><methodCall><methodName>$method</methodName><params>""" +
      params.map(p => s"<param>${encodeValue(p)}</param>").mkString +
      "</params></methodCall>"

  /** Decode an XML-RPC `<value>` element to Int | String | Boolean | Seq. */
  private[sources] def decodeValue(node: org.w3c.dom.Element): Any = {
    val kids = (0 until node.getChildNodes.getLength)
      .map(node.getChildNodes.item)
      .collect { case e: org.w3c.dom.Element => e }
    if (kids.isEmpty) node.getTextContent // bare text is a string, per spec
    else kids.head.getTagName match {
      case "i4" | "int" => kids.head.getTextContent.trim.toInt
      case "boolean" => kids.head.getTextContent.trim == "1"
      case "string" => kids.head.getTextContent
      case "array" =>
        val data = kids.head.getElementsByTagName("data").item(0)
          .asInstanceOf[org.w3c.dom.Element]
        (0 until data.getChildNodes.getLength)
          .map(data.getChildNodes.item)
          .collect { case e: org.w3c.dom.Element if e.getTagName == "value" => decodeValue(e) }
          .toSeq
      case t => throw new java.io.IOException(s"unsupported XML-RPC value type <$t>")
    }
  }

  private def parseXml(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // hostile-input hygiene: no DTDs/entities in this protocol
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  /** One XML-RPC round trip; returns the decoded `<methodResponse>`
    * param value (the ROS APIs return one `[code, msg, value]` triple).
    */
  def call(url: String, method: String, params: Seq[Any],
           timeoutMs: Int = 10000): Any = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "text/xml")
    conn.setDoOutput(true)
    val body = encodeCall(method, params).getBytes(UTF_8)
    conn.getOutputStream.write(body)
    conn.getOutputStream.close()
    try {
      val doc = parseXml(conn.getInputStream.readAllBytes())
      val faults = doc.getElementsByTagName("fault")
      if (faults.getLength > 0)
        throw new java.io.IOException(s"$method fault: " +
          faults.item(0).getTextContent.trim.take(200))
      val values = doc.getElementsByTagName("param")
      require(values.getLength == 1, s"$method: expected one response param")
      val v = values.item(0).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("value").item(0).asInstanceOf[org.w3c.dom.Element]
      decodeValue(v)
    } finally conn.disconnect()
  }

  /** Unwrap a ROS `[code, statusMessage, value]` triple, failing on
    * code != 1 with the master's own message.
    */
  private[sources] def unwrap(method: String, resp: Any): Any = resp match {
    case Seq(code: Int, msg: String, value) =>
      if (code != 1) throw new java.io.IOException(s"$method failed ($code): $msg")
      value
    case other => throw new java.io.IOException(s"$method: malformed response $other")
  }

  /** Master API hop: the topic's current publisher slave-API URIs. */
  def registerSubscriber(masterUri: String, callerid: String, topic: String,
                         topicType: String = "*",
                         callerApi: String = "http://localhost:0"): Seq[String] =
    unwrap("registerSubscriber", call(masterUri, "registerSubscriber",
      Seq(callerid, topic, topicType, callerApi))) match {
      case uris: Seq[_] => uris.collect { case s: String => s }
      case other => throw new java.io.IOException(s"registerSubscriber: $other")
    }

  /** Slave API hop: one publisher's live TCPROS (host, port). */
  def requestTopic(publisherApi: String, callerid: String, topic: String): (String, Int) =
    unwrap("requestTopic", call(publisherApi, "requestTopic",
      Seq(callerid, topic, Seq(Seq("TCPROS"))))) match {
      case Seq("TCPROS", host: String, port: Int) => (host, port)
      case other => throw new java.io.IOException(
        s"requestTopic: publisher offered no TCPROS endpoint: $other")
    }

  /** Master API hop, PUBLISH side: advertise `topic` served at
    * `callerApi` — a slave XML-RPC endpoint answering `requestTopic`
    * (see [[slaveServer]]) — so real rosnodes discover the publisher
    * through the master exactly like any rospy node. Returns the
    * topic's current subscriber APIs per spec.
    */
  def registerPublisher(masterUri: String, callerid: String, topic: String,
                        topicType: String, callerApi: String): Seq[String] =
    unwrap("registerPublisher", call(masterUri, "registerPublisher",
      Seq(callerid, topic, topicType, callerApi))) match {
      case uris: Seq[_] => uris.collect { case s: String => s }
      case other => throw new java.io.IOException(s"registerPublisher: $other")
    }

  /** Master API hop: withdraw a [[registerPublisher]] advertisement
    * (clean shutdown — a stale registration would route subscribers to
    * a dead port until the master notices).
    */
  def unregisterPublisher(masterUri: String, callerid: String, topic: String,
                          callerApi: String): Unit = {
    unwrap("unregisterPublisher", call(masterUri, "unregisterPublisher",
      Seq(callerid, topic, callerApi)))
    ()
  }

  /** Minimal Slave API responder for the publish side — the one method
    * a remote subscriber calls on a publisher (`requestTopic` →
    * `[1, msg, ["TCPROS", host, tcpPort]]`), plus a benign `getBusInfo`.
    * JDK HttpServer on an ephemeral port; returns (server, its URI) —
    * the URI is what [[registerPublisher]] advertises as `callerApi`.
    */
  private[sources] def slaveServer(host: String, tcpPort: Int)
      : (com.sun.net.httpserver.HttpServer, String) = {
    // bind to the address being ADVERTISED, not the wildcard — the
    // unauthenticated requestTopic responder must only listen where the
    // master will route subscribers
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(host, 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val value = try {
        val doc = parseXml(ex.getRequestBody.readAllBytes())
        doc.getElementsByTagName("methodName").item(0).getTextContent.trim match {
          case "requestTopic" => Seq(1, "ready", Seq("TCPROS", host, tcpPort))
          case "getBusInfo" => Seq(1, "", Seq.empty[Any])
          case m => Seq(-1, s"unsupported method '$m'", 0)
        }
      } catch { case _: Exception => Seq(-1, "malformed request", 0) }
      val body = ("""<?xml version="1.0"?><methodResponse><params><param>""" +
        encodeValue(value) + "</param></params></methodResponse>").getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/xml")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    srv.start()
    (srv, s"http://$host:${srv.getAddress.getPort}/")
  }

  /** The full two-hop resolution for N topics — what
    * `option("master", …)` + `option("topics", …)` runs at query start.
    * One publisher per topic (the first the master lists — the
    * reference's rospy takes all; a capture source needs one feed).
    */
  def resolveEndpoints(masterUri: String, callerid: String,
                       topics: Seq[String]): Seq[(String, String, Int)] =
    topics.map { t =>
      val pubs = registerSubscriber(masterUri, callerid, t)
      if (pubs.isEmpty)
        throw new java.io.IOException(s"no publisher registered for '$t'")
      val (host, port) = requestTopic(pubs.head, callerid, t)
      (t, host, port)
    }
}
