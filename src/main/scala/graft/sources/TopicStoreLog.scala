package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference's native `.topic_store` file logs — the
  * append-only format `TopicStorage` writes (reference
  * src/topic_store/filesystem.py:20-69): a byte-concatenation of pickle
  * protocol-2 dumps, one nested document dict per record, iterated with
  * skip-on-corrupt semantics. Users migrating existing reference data hit
  * this format first (convert.py:35, `topic_store_to_mongodb`).
  *
  * Spark-first shape: pickle streams are NOT splittable (records carry no
  * length prefix), so the FILE is the parallelism unit — a capture
  * deployment produces many per-session logs, which parallelize naturally.
  * Each file's bytes arrive via the `binaryFile` source; a minimal
  * protocol-2 decoder (primitives subset: dict/list/tuple/str/bytes/int/
  * float/bool/None + memo opcodes — everything `TopicStore.dict` trees
  * contain) renders each record as CANONICAL JSON (sorted keys), which
  * downstream code opens with `from_json` + an explicit schema and
  * `Documents.flatten`. Truncated or foreign-opcode records are skipped,
  * mirroring the reference's corrupt-record behavior; parsing is pure
  * per-record CPU with no driver involvement.
  */
object TopicStoreLog {

  /** One row per decoded record: (file, pos, doc JSON string). Delegates
    * to the V2 source ([[TopicStoreSource]]), which plans a native batch
    * scan with column pruning and one partition per log file.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("topicstore").load(path)

  /** Export a DataFrame with a `doc` column (canonical JSON, the shape
    * [[read]] returns) back to `.topic_store` logs — the reverse convert
    * direction (reference convert.py: storage → `TopicStorage` file). One
    * log file per partition, written executor-side with the session's
    * Hadoop configuration; records are pickle protocol-2, so the
    * reference's own `TopicStorage.__iter__` can read the output.
    */
  def write(df: DataFrame, path: String): Unit = {
    val conf = new graft.store.SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col("doc").cast("string")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val file = new org.apache.hadoop.fs.Path(
            path, f"part-$pid%05d-${java.util.UUID.randomUUID()}.topic_store")
          val fs = file.getFileSystem(conf.value)
          val out = fs.create(file, true)
          try rows.foreach(r => out.write(encodeOne(r.getString(0))))
          finally out.close()
        }
    }
  }

  /** One canonical-JSON document → one pickle protocol-2 record (the
    * opcode subset [[decodeOne]] reads back: PROTO/EMPTY_DICT/SETITEMS/
    * EMPTY_LIST/APPENDS/BINUNICODE/LONG1/BINFLOAT/NEWTRUE/NEWFALSE/NONE).
    */
  private[graft] def encodeOne(json: String): Array[Byte] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x80); out.write(2) // PROTO 2
    def i4le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def enc(n: com.fasterxml.jackson.databind.JsonNode): Unit = n match {
      case null => out.write('N')
      case _ if n.isNull => out.write('N')
      case _ if n.isBoolean => out.write(if (n.asBoolean()) 0x88 else 0x89)
      case _ if n.isIntegralNumber =>
        val v = n.asLong()
        if (v >= 0 && v < 256) { out.write('K'); out.write(v.toInt) }
        else if (v >= Int.MinValue && v <= Int.MaxValue) { out.write('J'); i4le(v.toInt) }
        else { // LONG1, little-endian signed, minimal width
          val raw = BigInt(v).toByteArray.reverse
          out.write(0x8a); out.write(raw.length); out.write(raw)
        }
      case _ if n.isNumber => // BINFLOAT, big-endian IEEE double
        val bits = java.lang.Double.doubleToLongBits(n.asDouble())
        out.write('G')
        var k = 7
        while (k >= 0) { out.write(((bits >> (8 * k)) & 0xff).toInt); k -= 1 }
      case _ if n.isTextual =>
        val b = n.asText().getBytes("UTF-8")
        out.write('X'); i4le(b.length); out.write(b)
      case _ if n.isArray =>
        out.write(']'); out.write('(')
        n.elements().forEachRemaining(enc(_))
        out.write('e')
      case _ if n.isObject =>
        out.write('}'); out.write('(')
        // canonical order on the wire too: sorted keys
        val names = scala.collection.mutable.ArrayBuffer.empty[String]
        n.fieldNames().forEachRemaining(names += _)
        names.sorted.foreach { k =>
          val b = k.getBytes("UTF-8")
          out.write('X'); i4le(b.length); out.write(b)
          enc(n.get(k))
        }
        out.write('u')
      case other => throw new IllegalArgumentException(s"unencodable node: $other")
    }
    enc(node)
    out.write('.')
    out.toByteArray
  }

  /** Decode back-to-back pickle records until EOF or the first undecodable
    * record (no resync is possible without a framing layer — the reference
    * hits the same wall and stops yielding).
    */
  private[graft] def decodeStream(bytes: Array[Byte]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var off = 0
    var ok = true
    while (ok && off < bytes.length) {
      try {
        val (value, next) = decodeOne(bytes, off)
        out += toJson(value)
        off = next
      } catch { case _: Exception => ok = false }
    }
    out.toSeq
  }

  /** Minimal pickle protocol-2 virtual machine over the primitive subset.
    * Returns (value, offset-after-STOP). Opcode semantics follow the
    * public pickle protocol documentation (PEP 307).
    */
  private def decodeOne(b: Array[Byte], start: Int): (Any, Int) = {
    var i = start
    val stack = scala.collection.mutable.ArrayBuffer.empty[Any]
    val memo = scala.collection.mutable.HashMap.empty[Int, Any]
    val marks = scala.collection.mutable.ArrayBuffer.empty[Int]
    object Mark
    def u1(): Int = { val v = b(i) & 0xff; i += 1; v }
    def i4le(): Int = { val v = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24); i += 4; v }
    def bytesAt(n: Int): Array[Byte] = { val v = java.util.Arrays.copyOfRange(b, i, i + n); i += n; v }
    def popMark(): Seq[Any] = {
      val m = marks.remove(marks.length - 1)
      val items = stack.slice(m, stack.length).toSeq
      stack.remove(m, stack.length - m)
      items
    }
    while (true) {
      val op = u1()
      op match {
        case 0x80 => u1() // PROTO version
        case '}' => stack += scala.collection.mutable.LinkedHashMap.empty[String, Any]
        case ']' => stack += scala.collection.mutable.ArrayBuffer.empty[Any]
        case ')' => stack += Vector.empty[Any]
        case '(' => marks += stack.length
        case 'N' => stack += null
        case 0x88 => stack += true
        case 0x89 => stack += false
        case 'K' => stack += u1().toLong
        case 'M' => stack += (u1() | (u1() << 8)).toLong
        case 'J' => stack += i4le().toLong
        case 0x8a => // LONG1: n bytes, little-endian signed
          val n = u1()
          val raw = bytesAt(n)
          stack += (if (n == 0) 0L else BigInt(raw.reverse).toLong)
        case 'G' => // BINFLOAT: big-endian IEEE double
          var bits = 0L
          var k = 0
          while (k < 8) { bits = (bits << 8) | (b(i + k) & 0xffL); k += 1 }
          i += 8
          stack += java.lang.Double.longBitsToDouble(bits)
        case 'U' => // SHORT_BINSTRING (py2 str — reference loads latin1)
          val n = u1(); stack += new String(bytesAt(n), "ISO-8859-1")
        case 'T' => // BINSTRING
          val n = i4le(); stack += new String(bytesAt(n), "ISO-8859-1")
        case 'X' => // BINUNICODE
          val n = i4le(); stack += new String(bytesAt(n), "UTF-8")
        case 'q' => memo(u1()) = stack.last
        case 'r' => memo(i4le()) = stack.last
        case 'h' => stack += memo(u1())
        case 'j' => stack += memo(i4le())
        case 0x85 => val a = stack.remove(stack.length - 1); stack += Vector(a)
        case 0x86 =>
          val b2 = stack.remove(stack.length - 1); val a = stack.remove(stack.length - 1)
          stack += Vector(a, b2)
        case 0x87 =>
          val c = stack.remove(stack.length - 1); val b2 = stack.remove(stack.length - 1)
          val a = stack.remove(stack.length - 1); stack += Vector(a, b2, c)
        case 't' => stack += popMark().toVector
        case 'a' => // APPEND
          val v = stack.remove(stack.length - 1)
          stack.last.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] += v
        case 'e' => // APPENDS
          val items = popMark()
          stack.last.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] ++= items
        case 's' => // SETITEM
          val v = stack.remove(stack.length - 1); val k = stack.remove(stack.length - 1)
          stack.last.asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
            .put(String.valueOf(k), v)
        case 'u' => // SETITEMS
          val items = popMark()
          val m = stack.last.asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
          items.grouped(2).foreach { case Seq(k, v) => m.put(String.valueOf(k), v) }
        case '.' => return (stack.last, i)
        case other => throw new IllegalArgumentException(s"unsupported pickle opcode 0x${other.toHexString}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Canonical JSON: object keys sorted, minimal escaping — deterministic
    * across partitions and re-runs so downstream hashing is stable.
    */
  private[graft] def toJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString
    case d: Double =>
      // Locale.ROOT: the f-interpolator uses the JVM default locale, which
      // on comma-decimal locales would emit `1,5` — invalid JSON.
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
      else d.toString
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case seq: scala.collection.Seq[_] => seq.map(toJson).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.asInstanceOf[scala.collection.Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => toJson(k) + ":" + toJson(x) }.mkString("{", ",", "}")
    case other => throw new IllegalArgumentException(s"unexpected decoded type: ${other.getClass}")
  }
}
