package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ROS bag v2.0 container import/export — the reference's remaining
  * migration direction (reference src/topic_store/convert.py:185-233,
  * `mongodb_to_ros_bag` / `topic_store_to_ros_bag`: every stored document
  * is written per-topic into a `rosbag.Bag`). The on-disk format is the
  * public bag spec (magic `#ROSBAG V2.0\n`, length-prefixed records with
  * `name=value` header fields: bag-header 0x03, chunk 0x05, connection
  * 0x07, message-data 0x02, index-data 0x04, chunk-info 0x06).
  *
  * Spark-first shape, mirroring [[TopicStoreLog]]: a bag holds one
  * sequential record stream per file, so the FILE is the parallelism
  * unit — `write` emits one self-contained indexed bag per partition
  * (partition by session/topic upstream to control bag layout), `read`
  * parses whole files from the `binaryFile` source with skip-on-corrupt
  * semantics. Documents travel as `std_msgs/String` messages carrying the
  * canonical JSON payload — the one message type whose wire format
  * (u32 length + UTF-8 bytes) needs no ROS environment; bags written
  * here open in stock `rosbag`/`rqt_bag`, and bags from a robot read
  * back with every topic/timestamp intact (payload bytes verbatim for
  * non-String connections, flagged by `msg_type`).
  *
  * Only uncompressed chunks are written; on read, `bz2`/`lz4` chunks are
  * skipped like corrupt records (no codec libraries in the bare JVM —
  * same rationale as the Multimodal video stub).
  */
object RosBag {

  private val Magic = "#ROSBAG V2.0\n".getBytes("US-ASCII")
  private val StringMsgType = "std_msgs/String"
  private val StringMsgMd5 = "992ce8a1687cec8c8bd883ec73ca41d1"
  private val StringMsgDef = "string data\n"

  // ---- little-endian primitives over a growable buffer ----
  private final class Buf {
    val out = new ByteArrayOutputStream()
    def u32(v: Long): this.type = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      this
    }
    def u64(v: Long): this.type = { u32(v & 0xffffffffL); u32((v >>> 32) & 0xffffffffL) }
    def bytes(b: Array[Byte]): this.type = { out.write(b); this }
    def result(): Array[Byte] = out.toByteArray
  }

  /** One header field: len(name=value) + "name=" + value bytes. */
  private def field(name: String, value: Array[Byte]): Array[Byte] = {
    val n = name.getBytes("US-ASCII")
    new Buf().u32(n.length + 1 + value.length).bytes(n).bytes("=".getBytes).bytes(value).result()
  }
  private def fieldU8(name: String, v: Int) = field(name, Array(v.toByte))
  private def fieldU32(name: String, v: Long) = field(name, new Buf().u32(v).result())
  private def fieldU64(name: String, v: Long) = field(name, new Buf().u64(v).result())
  private def fieldTime(name: String, sec: Long, nsec: Long) =
    field(name, new Buf().u32(sec).u32(nsec).result())
  private def fieldStr(name: String, v: String) = field(name, v.getBytes("UTF-8"))

  /** record = u32 header_len + header + u32 data_len + data */
  private def record(header: Array[Array[Byte]], data: Array[Byte]): Array[Byte] = {
    val h = header.foldLeft(new Buf()) { (b, f) => b.bytes(f) }.result()
    new Buf().u32(h.length).bytes(h).u32(data.length).bytes(data).result()
  }

  /** Serialize one bag: messages as (topic, msgType, tSec, tNsec, payload
    * bytes). Connections are assigned per distinct (topic, msgType) in
    * first-appearance order; one uncompressed chunk carries everything,
    * followed by the index records the stock reader seeks with.
    */
  private[sources] def encodeBag(msgs: Seq[(String, String, Long, Long, Array[Byte])],
                                 compression: String = "none"): Array[Byte] = {
    val conns = scala.collection.mutable.LinkedHashMap.empty[(String, String), Int]
    msgs.foreach { m => conns.getOrElseUpdate((m._1, m._2), conns.size) }

    // chunk payload: connection records first, then time-ordered messages
    val chunk = new Buf()
    conns.foreach { case ((topic, tpe), id) =>
      val isStr = tpe == StringMsgType
      val connHeader = new Buf()
        .bytes(fieldStr("topic", topic))
        .bytes(fieldStr("type", tpe))
        .bytes(fieldStr("md5sum", if (isStr) StringMsgMd5 else "*"))
        .bytes(fieldStr("message_definition", if (isStr) StringMsgDef else ""))
        .result()
      chunk.bytes(record(Array(fieldU8("op", 0x07), fieldU32("conn", id), fieldStr("topic", topic)),
        connHeader))
    }
    val ordered = msgs.sortBy(m => (m._3, m._4, m._1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Int)] // conn, sec, nsec, offset
    ordered.foreach { case (topic, tpe, sec, nsec, payload) =>
      offsets += ((conns((topic, tpe)), sec, nsec, chunk.out.size()))
      chunk.bytes(record(Array(fieldU8("op", 0x02), fieldU32("conn", conns((topic, tpe))),
        fieldTime("time", sec, nsec)), payload))
    }
    val chunkData = chunk.result()
    // the chunk header's `size` is the UNCOMPRESSED length (spec); the
    // record's data_len is the stored (possibly compressed) length
    val stored = compression match {
      case "bz2" | "lz4" => compressChunk(compression, chunkData)
      case _ => chunkData
    }

    val out = new Buf().bytes(Magic)
    // bag header record is padded to 4096 bytes total with ASCII spaces so
    // index_pos/conn_count can be rewritten in place (spec requirement)
    val chunkPos = 4096L + Magic.length
    val chunkRecHeader = Array(fieldU8("op", 0x05),
      fieldStr("compression", if (stored eq chunkData) "none" else compression),
      fieldU32("size", chunkData.length))
    val chunkRec = record(chunkRecHeader, stored)
    val indexPos = chunkPos + chunkRec.length

    val bagHeaderFields = new Buf()
      .bytes(fieldU8("op", 0x03)).bytes(fieldU64("index_pos", indexPos))
      .bytes(fieldU32("conn_count", conns.size)).bytes(fieldU32("chunk_count", 1L))
      .result()
    val padLen = 4096 - 4 - bagHeaderFields.length - 4
    out.bytes(new Buf().u32(bagHeaderFields.length).bytes(bagHeaderFields)
      .u32(padLen).bytes(Array.fill(padLen)(' '.toByte)).result())
    out.bytes(chunkRec)

    // post-chunk index section: connection records again (readers seek
    // here), one index-data record per connection, one chunk-info record
    conns.foreach { case ((topic, tpe), id) =>
      val isStr = tpe == StringMsgType
      val connHeader = new Buf()
        .bytes(fieldStr("topic", topic))
        .bytes(fieldStr("type", tpe))
        .bytes(fieldStr("md5sum", if (isStr) StringMsgMd5 else "*"))
        .bytes(fieldStr("message_definition", if (isStr) StringMsgDef else ""))
        .result()
      out.bytes(record(Array(fieldU8("op", 0x07), fieldU32("conn", id), fieldStr("topic", topic)),
        connHeader))
    }
    conns.values.foreach { id =>
      val entries = offsets.filter(_._1 == id)
      val data = entries.foldLeft(new Buf()) { case (b, (_, sec, nsec, off)) =>
        b.u32(sec).u32(nsec).u32(off)
      }.result()
      out.bytes(record(Array(fieldU8("op", 0x04), fieldU32("ver", 1L), fieldU32("conn", id),
        fieldU32("count", entries.length)), data))
    }
    if (ordered.nonEmpty) {
      val (s0, n0) = (ordered.head._3, ordered.head._4)
      val (s1, n1) = (ordered.last._3, ordered.last._4)
      val perConn = conns.values.map { id =>
        (id, offsets.count(_._1 == id))
      }
      val data = perConn.foldLeft(new Buf()) { case (b, (id, n)) => b.u32(id).u32(n) }.result()
      out.bytes(record(Array(fieldU8("op", 0x06), fieldU32("ver", 1L),
        fieldU64("chunk_pos", chunkPos), fieldTime("start_time", s0, n0),
        fieldTime("end_time", s1, n1), fieldU32("count", conns.size)), data))
    }
    out.result()
  }

  /** std_msgs/String wire format: u32 length + UTF-8 bytes. */
  private[sources] def encodeStringMsg(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    new Buf().u32(b.length).bytes(b).result()
  }
  private[sources] def decodeStringMsg(b: Array[Byte]): Option[String] = {
    if (b.length < 4) return None
    val n = (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
    if (n < 0 || 4 + n > b.length) None else Some(new String(b, 4, n, "UTF-8"))
  }

  // ---- decoding ----
  private def u32At(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Parse one record's header fields into name → value bytes. */
  private def parseFields(b: Array[Byte], from: Int, len: Int): Map[String, Array[Byte]] = {
    val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
    var i = from
    val end = from + len
    while (i + 4 <= end) {
      val flen = u32At(b, i).toInt
      if (flen <= 0 || i + 4 + flen > end) return out.toMap
      val eq = (i + 4 until i + 4 + flen).find(b(_) == '=').getOrElse(-1)
      if (eq < 0) return out.toMap
      val name = new String(b, i + 4, eq - (i + 4), "US-ASCII")
      out(name) = java.util.Arrays.copyOfRange(b, eq + 1, i + 4 + flen)
      i += 4 + flen
    }
    out.toMap
  }

  /** Iterate (headerFields, dataFrom, dataLen) over a record stream;
    * stops cleanly at truncation (skip-on-corrupt).
    */
  private def records(b: Array[Byte], from: Int, until: Int): Iterator[(Map[String, Array[Byte]], Int, Int)] =
    new Iterator[(Map[String, Array[Byte]], Int, Int)] {
      private var i = from
      private var nextRec: (Map[String, Array[Byte]], Int, Int) = advance()
      private def advance(): (Map[String, Array[Byte]], Int, Int) = {
        if (i + 8 > until) return null
        val hlen = u32At(b, i).toInt
        if (hlen < 0 || i + 4 + hlen + 4 > until) return null
        val fields = parseFields(b, i + 4, hlen)
        val dlen = u32At(b, i + 4 + hlen).toInt
        val dataFrom = i + 4 + hlen + 4
        if (dlen < 0 || dataFrom + dlen > until) return null
        i = dataFrom + dlen
        (fields, dataFrom, dlen)
      }
      def hasNext: Boolean = nextRec != null
      def next(): (Map[String, Array[Byte]], Int, Int) = {
        val r = nextRec; nextRec = advance(); r
      }
    }

  /** Deflate one chunk body for [[encodeBag]] — the write-side twin of
    * [[decompressChunk]], same two public codecs `rosbag record` offers
    * (`-j` bz2, `--lz4`).
    */
  private def compressChunk(codec: String, raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(math.max(raw.length / 2, 64))
    val out: java.io.OutputStream = codec match {
      case "bz2" =>
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos)
      case "lz4" => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    }
    out.write(raw)
    out.close()
    bos.toByteArray
  }

  /** Inflate one compressed chunk body; None on any corruption (the
    * reader's skip-on-error contract — a bad chunk loses its own
    * messages, never the bag). The chunk header's `size` field (the
    * spec's uncompressed length) pre-sizes the buffer; output is capped
    * at 1 GiB as a decompression-bomb guard — stock rosbag chunks are
    * ≤ tens of MB (`rosbag record` targets ~768 KiB–1 MiB per chunk).
    */
  private[sources] def decompressChunk(codec: String, data: Array[Byte],
                                       from: Int, len: Int,
                                       sizeHint: Long): Option[Array[Byte]] =
    try {
      val in = new java.io.ByteArrayInputStream(data, from, len)
      val stream: java.io.InputStream = codec match {
        case "bz2" =>
          new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(in)
        case "lz4" => new net.jpountz.lz4.LZ4FrameInputStream(in)
      }
      try {
        val maxOut = 1L << 30
        val cap = if (sizeHint > 0 && sizeHint <= maxOut) sizeHint.toInt
          else math.max(len * 4, 4096)
        val out = new java.io.ByteArrayOutputStream(cap)
        val buf = new Array[Byte](65536)
        var total = 0L
        var n = stream.read(buf)
        while (n >= 0) {
          total += n
          if (total > maxOut) throw new java.io.IOException("chunk too large")
          out.write(buf, 0, n)
          n = stream.read(buf)
        }
        Some(out.toByteArray)
      } finally stream.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode one bag file's bytes into message rows:
    * (topic, msg_type, t_sec, t_nsec, data JSON-or-null, raw payload).
    * Unindexed bags decode too (the index is advisory); bz2/lz4 chunks
    * inflate in-JVM ([[decompressChunk]]); malformed records and corrupt
    * chunk bodies are skipped, never thrown.
    */
  private[sources] def decodeBag(b: Array[Byte]): Seq[(String, String, Long, Long, String, Array[Byte])] = {
    if (b.length < Magic.length ||
      !java.util.Arrays.equals(java.util.Arrays.copyOf(b, Magic.length), Magic)) return Seq.empty
    val conns = scala.collection.mutable.Map.empty[Long, (String, String)] // conn → (topic, type)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long, String, Array[Byte])]

    def handle(fields: Map[String, Array[Byte]], data: Array[Byte], dataFrom: Int, dataLen: Int): Unit = {
      val op = fields.get("op").map(_.headOption.getOrElse(0.toByte) & 0xff).getOrElse(0)
      op match {
        case 0x07 => // connection: data is the connection header
          val conn = fields.get("conn").map(v => u32At(v ++ Array[Byte](0, 0, 0), 0)).getOrElse(-1L)
          val ch = parseFields(data, dataFrom, dataLen)
          val topic = ch.get("topic").map(new String(_, "UTF-8"))
            .orElse(fields.get("topic").map(new String(_, "UTF-8"))).getOrElse("")
          val tpe = ch.get("type").map(new String(_, "UTF-8")).getOrElse("")
          if (conn >= 0) conns(conn) = (topic, tpe)
        case 0x02 => // message data
          val conn = fields.get("conn").map(v => u32At(v ++ Array[Byte](0, 0, 0), 0)).getOrElse(-1L)
          val (sec, nsec) = fields.get("time").filter(_.length >= 8)
            .map(t => (u32At(t, 0), u32At(t, 4))).getOrElse((0L, 0L))
          val (topic, tpe) = conns.getOrElse(conn, ("", ""))
          val payload = java.util.Arrays.copyOfRange(data, dataFrom, dataFrom + dataLen)
          val json = if (tpe == StringMsgType) decodeStringMsg(payload).orNull else null
          out += ((topic, tpe, sec, nsec, json, payload))
        case 0x05 => // chunk: recurse into the embedded record stream
          val compression = fields.get("compression").map(new String(_, "US-ASCII")).getOrElse("none")
          compression match {
            case "none" =>
              records(data, dataFrom, dataFrom + dataLen)
                .foreach { case (f, df, dl) => handle(f, data, df, dl) }
            case "bz2" | "lz4" =>
              // both codecs ride jars Spark already ships (commons-compress
              // bzip2, lz4-java frame format — roslz4 writes LZ4 frames),
              // so `rosbag record -j`/`--lz4` bags import like plain ones;
              // a corrupt chunk body skips (None), never throws
              val hint = fields.get("size").filter(_.length >= 4)
                .map(u32At(_, 0)).getOrElse(0L)
              decompressChunk(compression, data, dataFrom, dataLen, hint)
                .foreach { raw =>
                  records(raw, 0, raw.length)
                    .foreach { case (f, df, dl) => handle(f, raw, df, dl) }
                }
            case _ => () // unknown codec: skipped (skip-on-error contract)
          }
        case _ => () // bag header / index / chunk info: advisory
      }
    }
    records(b, Magic.length, b.length).foreach { case (f, df, dl) => handle(f, b, df, dl) }
    out.toSeq
  }

  val Schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("topic", StringType),
    StructField("msg_type", StringType),
    StructField("t_sec", LongType),
    StructField("t_nsec", LongType),
    StructField("doc", StringType),       // JSON for std_msgs/String, else null
    StructField("payload", BinaryType)))  // raw message bytes, always

  /** Read bag files into one row per message. File = parallelism unit
    * (records have in-chunk offsets only), exactly like the pickle logs;
    * a capture fleet's many bags parallelize naturally.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bag").load(path)
      .select("path", "content").rdd
      .flatMap { r =>
        val file = r.getString(0)
        decodeBag(r.getAs[Array[Byte]](1)).map { case (topic, tpe, sec, nsec, json, payload) =>
          Row(file, topic, tpe, sec, nsec, json, payload)
        }
      }
    spark.createDataFrame(rdd, Schema)
  }

  /** Export documents to bag files: requires `topic`, `t_sec` and `doc`
    * (canonical JSON) columns — the same `doc` shape [[TopicStoreLog]]
    * round-trips — writing one indexed bag per partition executor-side.
    * Repartition upstream (e.g. by session) to choose the bag layout; the
    * reference's single-file conversion is `df.coalesce(1)`.
    */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit = {
    require(Set("none", "bz2", "lz4")(compression),
      s"unsupported bag compression: $compression")
    val conf = new graft.store.SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col("topic").cast("string"), col("t_sec").cast("long"),
        col("doc").cast("string")).foreachPartition {
      (rows: Iterator[Row]) =>
        val msgs = rows.map { r =>
          (r.getString(0), StringMsgType, r.getLong(1), 0L, encodeStringMsg(r.getString(2)))
        }.toSeq
        if (msgs.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val file = new org.apache.hadoop.fs.Path(
            path, f"part-$pid%05d-${java.util.UUID.randomUUID()}.bag")
          val fs = file.getFileSystem(conf.value)
          val out = fs.create(file, true)
          try out.write(encodeBag(msgs, compression))
          finally out.close()
        }
    }
  }
}
