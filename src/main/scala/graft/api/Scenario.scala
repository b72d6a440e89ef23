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
