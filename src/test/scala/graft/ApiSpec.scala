package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Graft, Scenario}
import graft.store.Convert

/** API-compat layer: load(), scenario parsing semantics, migrations. */
class ApiSpec extends AnyFunSuite {
  import TestSession._

  val sampleScenario: String =
    """context: "test_collection"
      |storage:
      |  method: "database"
      |  config: "default"
      |  unused_extra: "dropme"
      |collection:
      |  method: "timer"
      |  timer_delay: 5
      |  stray: 1
      |data:
      |  cam: "/camera/image_raw"
      |  log: "/rosout"
      |""".stripMargin

  test("scenario parses, validates and drops unused params") {
    val sc = Scenario.parse(sampleScenario)
    assert(sc.context === "test_collection")
    assert(sc.storage === Map("method" -> "database", "config" -> "default"))
    assert(sc.collection === Map("method" -> "timer", "timer_delay" -> "5"))
    assert(sc.data("cam") === "/camera/image_raw")
    assert(sc.requireDatabase eq sc)
    intercept[IllegalArgumentException](sc.requireFilesystem)
  }

  test("scenario rejects missing sections and missing method params") {
    intercept[IllegalArgumentException](Scenario.parse("context: x\n"))
    intercept[IllegalArgumentException](Scenario.parse(
      sampleScenario.replace("  timer_delay: 5\n", "")))
    intercept[IllegalArgumentException](Scenario.parse(
      sampleScenario.replace("\"timer\"", "\"nope\"")))
  }

  test("db-config resolution: URI form, yaml file form, default aliases") {
    import graft.api.DbConfig
    // explicit URI wins untouched (database.py: uri overload)
    assert(DbConfig.uriFromConfig("mongodb://host:1234") === "mongodb://host:1234")
    // aliases resolve to the packaged default config's net values
    Seq("auto", "default", "topic_store", null, "").foreach { a =>
      assert(DbConfig.uriFromConfig(a) === "mongodb://0.0.0.0:65530", s"alias $a")
    }
    // yaml file form: net.bindIp + net.port → mongodb URI
    val f = Files.createTempFile("graft_db", ".yaml")
    Files.write(f,
      """storage:
        |  journal:
        |    enabled: true
        |net:
        |  port: 27018
        |  bindIp: "127.0.0.1"
        |""".stripMargin.getBytes("UTF-8"))
    assert(DbConfig.uriFromConfig(f.toString) === "mongodb://127.0.0.1:27018")
    // non-file / non-yaml paths raise like the reference's IOError
    intercept[java.io.IOException](DbConfig.uriFromConfig("/nope/missing.yaml"))
    val notYaml = Files.createTempFile("graft_db", ".txt")
    intercept[java.io.IOException](DbConfig.uriFromConfig(notYaml.toString))
    // a config without net section is invalid
    val bad = Files.createTempFile("graft_bad", ".yaml")
    Files.write(bad, "storage: {}\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException](DbConfig.uriFromConfig(bad.toString))
    // the scenario seam: a database scenario resolves its storage config
    assert(Scenario.parse(sampleScenario).databaseUri === "mongodb://0.0.0.0:65530")
    intercept[IllegalArgumentException](
      Scenario.parse(sampleScenario
        .replace("\"database\"", "\"filesystem\"")
        .replace("config: \"default\"", "location: \"/tmp/x\"")).databaseUri)
  }

  test("Graft.load opens parquet paths and catalog tables") {
    val byPath = Graft.load(spark, s"$sf/events.parquet")
    assert(byPath.count() > 0)
    spark.range(5).write.mode("overwrite").saveAsTable("graft_load_t")
    assert(Graft.load(spark, "graft_load_t").count() === 5)
    intercept[IllegalArgumentException](Graft.load(spark, "no_such_thing"))
    // native .topic_store containers dispatch to the V2 source, both as a
    // single log file and as a capture directory
    val log = new java.io.File(getClass.getResource("/sample.topic_store").toURI)
    assert(Graft.load(spark, log.getAbsolutePath).count() === 3)
    assert(Graft.load(spark, log.getParent).columns.toSeq === Seq("file", "pos", "doc"))
    // .bag containers dispatch to the rosbag reader (round-trips a write)
    import spark.implicits._
    val bagDir = java.nio.file.Files.createTempDirectory("graft_api_bag").toString
    graft.sources.RosBag.write(
      Seq(("/t", 1L, """{"_id":1}""")).toDF("topic", "t_sec", "doc").coalesce(1), bagDir)
    val bagFile = new java.io.File(bagDir).listFiles()
      .filter(_.getName.endsWith(".bag")).head.getAbsolutePath
    assert(Graft.load(spark, bagFile).count() === 1)
  }

  test("migrate copies only missing documents, append-only, idempotent") {
    val out = Files.createTempDirectory("graft_migrate").toString + "/dst"
    val ev = Tables.events(spark, sf).select("event_id", "event_type", "value")
    val half = ev.filter(col("event_id") % 2 === 0)
    assert(Convert.migrate(spark, half, out, "event_id") === half.count())
    // second migrate of the full set copies only the other half
    assert(Convert.migrate(spark, ev, out, "event_id") === ev.count() - half.count())
    // idempotent: nothing left to copy
    assert(Convert.migrate(spark, ev, out, "event_id") === 0)
    assert(spark.read.parquet(out).count() === ev.count())
  }

  test("exportByTopic lays out per-topic time-ordered partitions") {
    val out = Files.createTempDirectory("graft_export").toString + "/bag"
    Convert.exportByTopic(
      Tables.events(spark, sf).select(col("event_id"), col("event_type"),
        col("ts").cast("long").as("ts_sec")),
      "event_type", "ts_sec", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("event_type=")) === 5)
    val back = spark.read.parquet(out)
    assert(back.count() === Tables.events(spark, sf).count())
  }
}
