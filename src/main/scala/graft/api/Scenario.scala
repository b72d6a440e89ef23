package graft.api

import scala.jdk.CollectionConverters._

/** Scenario-file parsing with the reference's validation semantics
  * (reference src/topic_store/file_parsers.py:58-132 `ScenarioFileParser`):
  * four required sections (`context`, `storage`, `collection`, `data`),
  * per-method required parameters, unused parameters dropped, and
  * `requireDatabase`/`requireFilesystem` guards.
  *
  * `data` maps output field names to topic names — the capture tree that
  * `streaming.Monitor.capture` / `DocumentStore.latestSnapshot` consume.
  */
final case class Scenario(
    context: String,
    storage: Map[String, String],
    collection: Map[String, String],
    data: Map[String, String]) {

  def requireDatabase: Scenario = {
    if (storage("method") != "database")
      throw new IllegalArgumentException(
        s"Scenario is not configured for database storage (method=${storage("method")})")
    this
  }

  def requireFilesystem: Scenario = {
    if (storage("method") != "filesystem")
      throw new IllegalArgumentException(
        s"Scenario is not configured for filesystem storage (method=${storage("method")})")
    this
  }

  /** Resolved connection URI for a database scenario — the reference CLI
    * accepts `storage.config` as an explicit URI, a db-config YAML path,
    * or a default alias, and resolves all three to one URI before
    * connecting (reference src/topic_store/database.py:42-58).
    */
  def databaseUri: String = {
    requireDatabase
    DbConfig.uriFromConfig(storage("config"))
  }
}

/** MongoDB db-config → URI resolution — the Spark twin of
  * `MongoStorage.uri_from_mongo_config` plus the `config=auto|default|
  * topic_store|None` packaged-default fallback (reference
  * src/topic_store/database.py:42-58,84-91 and
  * config/default_db_config.yaml): the CLI accepts an explicit
  * `mongodb://` URI, a path to a db-config YAML whose `net.bindIp` /
  * `net.port` determine the URI, or an alias selecting the packaged
  * default config (bindIp 0.0.0.0, port 65530 — the values the
  * reference ships).
  */
object DbConfig {
  val DefaultBindIp = "0.0.0.0"
  val DefaultPort = 65530

  /** `net.bindIp`/`net.port` → `mongodb://ip:port` (database.py:84-91). */
  def uriFromYamlText(text: String): String = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](text)
    if (root == null || !root.containsKey("net"))
      throw new IllegalArgumentException("db config must have a 'net' section")
    val net = root.get("net").asInstanceOf[java.util.Map[String, Object]]
    if (!net.containsKey("bindIp") || !net.containsKey("port"))
      throw new IllegalArgumentException(
        "db config 'net' section must define bindIp and port")
    s"mongodb://${String.valueOf(net.get("bindIp"))}:${String.valueOf(net.get("port"))}"
  }

  def uriFromConfig(config: String): String = config match {
    case null | "" | "auto" | "default" | "topic_store" =>
      s"mongodb://$DefaultBindIp:$DefaultPort"
    case uri if uri.startsWith("mongodb://") => uri
    case path =>
      val f = new java.io.File(path)
      // the reference raises IOError on a non-file or non-.yaml path
      if (!f.isFile || !path.endsWith(".yaml"))
        throw new java.io.IOException(
          s"'$path' is not a valid MongoDB configuration file")
      uriFromYamlText(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
  }
}

object Scenario {
  /** Required parameters per collection method (file_parsers.py:59-72). */
  val CollectionMethods: Map[String, Seq[String]] = Map(
    "action_server_video" -> Seq("method", "action_server_name", "watch_topic"),
    "action_server" -> Seq("method", "action_server_name"),
    "timer" -> Seq("method", "timer_delay"),
    "event" -> Seq("method", "watch_topic"))

  /** Required parameters per storage method. */
  val StorageMethods: Map[String, Seq[String]] = Map(
    "database" -> Seq("method", "config"),
    "filesystem" -> Seq("method", "location"))

  def parse(yamlText: String): Scenario = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yamlText)
    if (root == null) throw new IllegalArgumentException("empty scenario file")
    val doc = root.asScala

    Seq("context", "storage", "collection", "data").foreach { f =>
      if (!doc.contains(f))
        throw new IllegalArgumentException(s"'$f' field missing from scenario")
    }

    def section(name: String): Map[String, String] =
      doc(name).asInstanceOf[java.util.Map[String, Object]].asScala
        .map { case (k, v) => k -> String.valueOf(v) }.toMap

    def validated(sec: Map[String, String], methods: Map[String, Seq[String]],
                  what: String): Map[String, String] = {
      val method = sec.getOrElse("method",
        throw new IllegalArgumentException(
          s"$what.method must be one of ${methods.keys.mkString(", ")}"))
      val required = methods.getOrElse(method,
        throw new IllegalArgumentException(s"unknown $what method '$method'"))
      required.foreach { p =>
        if (!sec.contains(p)) throw new IllegalArgumentException(
          s"$what must have parameter '$p' when method=='$method'")
      }
      sec.view.filterKeys(required.contains).toMap // drop unused params
    }

    Scenario(
      context = String.valueOf(doc("context")),
      storage = validated(section("storage"), StorageMethods, "storage"),
      collection = validated(section("collection"), CollectionMethods, "collection"),
      data = section("data"))
  }

  def parseFile(path: String): Scenario =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
