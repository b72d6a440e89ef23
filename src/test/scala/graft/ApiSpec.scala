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

  /** A replayable capture fixture for the CLI mains: the events table
    * written as a small parquet "topic stream" (event_type plays the
    * topic, props the payload).
    */
  private def cliFixture(): String = {
    val in = Files.createTempDirectory("graft_cli_in").toString + "/stream"
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("props"))
      .write.mode("overwrite").parquet(in)
    in
  }

  private def scenarioFile(yaml: String): String = {
    val f = Files.createTempFile("graft_cli_sc", ".yaml")
    Files.writeString(f, yaml)
    f.toString
  }

  test("run_scenario main: filesystem scenario drains the replay into the store") {
    // make the shared session discoverable by the real main
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    val in = cliFixture()
    val dest = Files.createTempDirectory("graft_cli_fs").toString + "/cap"
    val sc = scenarioFile(
      s"""context: "cli_test"
         |storage: {method: "filesystem", location: "$dest"}
         |collection: {method: "event", watch_topic: "purchase"}
         |data: {purchases: "purchase"}
         |""".stripMargin)
    graft.api.RunScenario.main(Array(
      "--scenario_file", sc, "--input", in, "--verbose", "false",
      "--topic_col", "event_type", "--id_col", "event_id",
      "--session_col", "user_id", "--msg_col", "props",
      "_stabilise_time:=0")) // ROS private-param spelling accepted
    val out = spark.read.parquet(dest)
    val want = Tables.events(spark, sf).filter(col("event_type") === "purchase")
    assert(out.count() === want.count())
    // reference meta columns stamped, layout session-partitioned
    assert(Seq("_id", "session", "sys_time_sec").forall(out.columns.contains))
    assert(new java.io.File(dest).listFiles().exists(_.getName.startsWith("session=")))
  }

  test("run_scenario main: action_server_video scenario gates the capture") {
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    import spark.implicits._
    val in = Files.createTempDirectory("graft_cli_gate").toString + "/stream"
    // control topic /collect: start at 100, stop at 300; data topic /cam
    Seq(
      (1L, 0L, "/collect", 100L, "start"), (2L, 0L, "/collect", 300L, "stop"),
      (3L, 0L, "/cam", 50L, "f0"), (4L, 0L, "/cam", 150L, "f1"),
      (5L, 0L, "/cam", 250L, "f2"), (6L, 0L, "/cam", 350L, "f3"))
      .toDF("event_id", "user_id", "topic", "ts_sec", "payload")
      .withColumn("ts", timestamp_seconds(col("ts_sec"))).drop("ts_sec")
      .write.mode("overwrite").parquet(in)
    val dest = Files.createTempDirectory("graft_cli_gate_out").toString + "/cap"
    val sc = scenarioFile(
      s"""context: "gated"
         |storage: {method: "filesystem", location: "$dest"}
         |collection:
         |  method: "action_server_video"
         |  action_server_name: "/collect"
         |  watch_topic: "/cam"
         |data: {cam: "/cam"}
         |""".stripMargin)
    graft.api.RunScenario.main(Array(
      "--scenario_file", sc, "--input", in, "--verbose", "false",
      "--id_col", "event_id", "--session_col", "user_id"))
    // only the frames inside the start/stop bracket survive
    assert(spark.read.parquet(dest).select("payload").collect()
      .map(_.getString(0)).toSet === Set("f1", "f2"))
  }

  test("run_scenario main: database scenario needs store_root, resolves URI") {
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    val in = cliFixture()
    val sc = scenarioFile(
      """context: "db_ctx"
        |storage: {method: "database", config: "default"}
        |collection: {method: "timer", timer_delay: 1}
        |data: {all: "any"}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.api.RunScenario.main(Array("--scenario_file", sc, "--input", in))
    }
    assert(e.getMessage.contains("mongodb://0.0.0.0:65530"))
    val root = Files.createTempDirectory("graft_cli_root").toString
    graft.api.RunScenario.main(Array(
      "--scenario_file", sc, "--input", in, "--verbose", "false",
      "--store_root", root, "--topic_col", "event_type",
      "--id_col", "event_id", "--session_col", "user_id", "--msg_col", "props"))
    assert(spark.read.parquet(s"$root/db_ctx").count() ===
      Tables.events(spark, sf).count())
  }

  test("run_monitoring main: writes the per-topic monitor log unless no_log") {
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    val in = cliFixture()
    val dest = Files.createTempDirectory("graft_cli_mon").toString + "/cap"
    def sc(topics: String) = scenarioFile(
      s"""context: "mon"
         |storage: {method: "filesystem", location: "$dest"}
         |collection: {method: "timer", timer_delay: 1}
         |data: $topics
         |""".stripMargin)
    val args = Array("--input", in, "--verbose", "false",
      "--topic_col", "event_type", "--msg_col", "props")
    graft.api.RunMonitoring.main(Array("--scenario_file",
      sc("""{views: "view", clicks: "click"}""")) ++ args)
    val log = spark.read.parquet(s"$dest@monitor")
    assert(log.select("topic").distinct().collect()
      .map(_.getString(0)).toSet === Set("view", "click"))
    assert(log.columns.contains("n_msgs"))
    // no_log leaves no monitor directory behind
    val dest2 = Files.createTempDirectory("graft_cli_mon2").toString + "/cap"
    graft.api.RunMonitoring.main(Array("--scenario_file", scenarioFile(
      s"""context: "mon2"
         |storage: {method: "filesystem", location: "$dest2"}
         |collection: {method: "timer", timer_delay: 1}
         |data: {views: "view"}
         |""".stripMargin), "--no_log", "true") ++ args)
    assert(!new java.io.File(s"$dest2@monitor").exists())
  }

  test("convert main: query/projection filtered incremental migrate + topic_store export") {
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    val in = cliFixture()
    val out = Files.createTempDirectory("graft_cli_conv").toString + "/dst"
    // reference short flags: -i/-o/-q/-p
    val n = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    graft.api.ConvertCli.main(Array("-i", in, "-o", out,
      "-q", """{"event_type": "purchase"}""",
      "-p", """{"event_id": 1, "user_id": 1}""",
      "--key", "event_id"))
    val got = spark.read.parquet(out)
    assert(got.count() === n)
    assert(got.columns.sorted.toSeq === Seq("event_id", "user_id"))
    // incremental: re-running copies nothing new
    graft.api.ConvertCli.main(Array("-i", in, "-o", out,
      "-q", """{"event_type": "purchase"}""",
      "-p", """{"event_id": 1, "user_id": 1}""", "--key", "event_id"))
    assert(spark.read.parquet(out).count() === n)
    // native-log export: rows serialize as canonical JSON docs and read back
    val tsOut = Files.createTempDirectory("graft_cli_ts").toString + "/x.topic_store"
    graft.api.ConvertCli.main(Array("-i", in, "-o", tsOut,
      "-q", """{"event_type": "signup"}""", "--key", "event_id"))
    val back = spark.read.format("topicstore").load(tsOut)
    assert(back.count() ===
      Tables.events(spark, sf).filter(col("event_type") === "signup").count())
  }

  test("convert main: Mongo-style exclusion projection keeps everything else") {
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    val in = cliFixture() // event_id, user_id, event_type, ts, props
    val out = Files.createTempDirectory("graft_cli_excl").toString + "/dst"
    graft.api.ConvertCli.main(Array("-i", in, "-o", out,
      "-p", """{"props": 0, "ts": 0}""", "--key", "event_id"))
    assert(spark.read.parquet(out).columns.sorted.toSeq ===
      Seq("event_id", "event_type", "user_id"))
    // excluding the key itself still keeps it (the migrate dedup needs it)
    val out2 = Files.createTempDirectory("graft_cli_excl2").toString + "/dst"
    graft.api.ConvertCli.main(Array("-i", in, "-o", out2,
      "-p", """{"event_id": 0, "props": 0, "ts": 0}""", "--key", "event_id"))
    assert(spark.read.parquet(out2).columns.contains("event_id"))
  }

  test("reference's shipped scenario fixtures parse with the reference's semantics") {
    // the reference repo's own scenarios/*.yaml, read-only, through
    // api.Scenario — resolved method, kept/dropped params and URI must
    // match ScenarioFileParser (file_parsers.py:58-132): required params
    // per method kept, everything else DELETED, four sections mandatory
    val scenarios = new java.io.File("/root/reference/scenarios")
    assume(scenarios.isDirectory, "reference fixtures not present")

    // default_config.yaml: filesystem + action_server, every documented
    // extra present — the parser must keep exactly the method's params
    val full = graft.api.Scenario.parseFile(
      s"${scenarios.getPath}/default_config.yaml")
    assert(full.context === "default")
    assert(full.storage === Map("method" -> "filesystem", "location" -> "default"),
      "storage must keep method+location and DROP the unused database config")
    assert(full.collection === Map("method" -> "action_server",
      "action_server_name" -> "collect_data"),
      "collection must drop timer_delay/watch_topic when method==action_server")
    assert(full.data.contains("topics") && full.data("int") === "1")
    intercept[IllegalArgumentException](full.requireDatabase)
    assert(full.requireFilesystem eq full)

    // filesystem_default.yaml: the minimal filesystem scenario
    val fsys = graft.api.Scenario.parseFile(
      s"${scenarios.getPath}/filesystem_default.yaml")
    assert(fsys.storage("method") === "filesystem")
    assert(fsys.storage("location") === "default")

    // database_default.yaml: config "default" resolves to the PACKAGED
    // default config's URI (database.py:42-58 + config/default_db_config
    // .yaml: bindIp 0.0.0.0, port 65530)
    val db = graft.api.Scenario.parseFile(
      s"${scenarios.getPath}/database_default.yaml")
    assert(db.storage === Map("method" -> "database", "config" -> "default"),
      "database storage must keep method+config and drop location")
    assert(db.databaseUri === "mongodb://0.0.0.0:65530")
    intercept[IllegalArgumentException](db.requireFilesystem)
    // and the shipped db-config YAML itself resolves to the same URI
    val cfg = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/config/default_db_config.yaml")), "UTF-8")
    assert(graft.api.DbConfig.uriFromYamlText(cfg) === "mongodb://0.0.0.0:65530")
  }

  test("cli args: a valueless long flag never swallows a following short flag") {
    val flags = graft.api.Cli.parseArgs(
      Array("--verbose", "-o", "out", "-i", "in"))
    assert(flags("verbose") === "true")
    assert(flags("o") === "out" && flags("i") === "in")
  }

  test("cli args: negative numbers are values, digit short flags are rejected") {
    // --stabilise_time -1 must bind -1 as the VALUE (argparse does), not
    // parse -1 as short flag "1" and silently misconfigure
    val flags = graft.api.Cli.parseArgs(
      Array("--stabilise_time", "-1", "--rate", "-2.5e3", "--verbose"))
    assert(flags("stabilise_time") === "-1")
    assert(flags("rate") === "-2.5e3")
    assert(flags("verbose") === "true")
    // argparse's leading-dot form `-.5` is a value too (float('-.5') parses)
    val dotted = graft.api.Cli.parseArgs(Array("--stabilise_time", "-.5"))
    assert(dotted("stabilise_time") === "-.5")
    // ...but a bare dash or dash-dot is NOT a number — next-flag rules apply
    assert(graft.api.Cli.parseArgs(Array("--verbose", "-o", "x"))("verbose") === "true")
    // a dash-leading numeric token in flag position is an error, never a flag
    val e = intercept[IllegalArgumentException](
      graft.api.Cli.parseArgs(Array("-1", "x")))
    assert(e.getMessage.contains("-1"))
  }

  test("convert main: a missing required flag names the flag, not a map key") {
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    val eIn = intercept[IllegalArgumentException](
      graft.api.ConvertCli.run(spark, Array("-o", "/tmp/x")))
    assert(eIn.getMessage.contains("-i/--input"))
    val eOut = intercept[IllegalArgumentException](
      graft.api.ConvertCli.run(spark, Array("-i", "/tmp/x")))
    assert(eOut.getMessage.contains("-o/--output"))
    val eSc = intercept[IllegalArgumentException](
      graft.api.RunMonitoring.run(spark, Array.empty))
    assert(eSc.getMessage.contains("--scenario_file"))
    // and when BOTH spellings are passed, the long one wins — the
    // precedence ConvertCli always had (a scripted wrapper appending
    // --input as an override must beat the baked-in -i)
    val both = graft.api.Cli.parseArgs(
      Array("-i", "/old", "--input", "/new"))
    assert(graft.api.Cli.required(both, "convert", "input", "i") === "/new")
  }
}
