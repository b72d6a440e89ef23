package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Documents
import graft.store.DocumentStore

/** The custom physical as-of join (plans.AsofJoinExec) against the
  * window-composition baseline and hand-checked edges.
  */
class AsofExecSpec extends AnyFunSuite {
  import TestSession._

  test("physical as-of join plans the custom exec with clustered+sorted children") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "payload")
    val r = Seq((1L, 5L, 100L)).toDF("k", "t", "mark")
    val df = DocumentStore.asofJoinExec(l, r, "k", "t", Seq("mark"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in:\n$plan")
    assert(df.collect().toSeq.map(_.toSeq) === Seq(Seq(1L, 10L, "a", 100L)))
  }

  test("matches the window-composition asofJoin on real event data") {
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), Documents.tsSec(col("ts")).as("ts_sec"))
    val left = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts_sec", "event_id", "value")
    val right = e.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_sec").agg(max("event_id").as("mark_id"))
    val composed = DocumentStore.asofJoin(left, right, "user_id", "ts_sec", Seq("mark_id"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val exec = DocumentStore.asofJoinExec(left, right, "user_id", "ts_sec", Seq("mark_id"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(exec.nonEmpty)
    assert(exec === composed)
  }

  test("no preceding right row yields nulls; ties at equal time match") {
    import spark.implicits._
    val l = Seq((1L, 4L, 10L), (1L, 5L, 11L), (2L, 9L, 12L)).toDF("k", "t", "lid")
    val r = Seq((1L, 5L, 100L), (2L, 10L, 200L)).toDF("k", "t", "mark")
    val out = DocumentStore.asofJoinExec(l, r, "k", "t", Seq("mark"))
      .orderBy("lid").collect().map(r0 => (r0.getLong(2), Option(r0.get(3))))
    assert(out.toSeq === Seq(
      (10L, None),          // before any right row of key 1
      (11L, Some(100L)),    // equal time matches (<= semantics)
      (12L, None)))         // key 2's right row is later
  }

  test("tolerance as-of nulls stale matches and equals plain as-of when unbounded") {
    import spark.implicits._
    val l = Seq((7L, 50L, 1L), (7L, 99L, 2L), (7L, 41L, 3L)).toDF("k", "t", "lid")
    val r = Seq((7L, 10L, 100L), (7L, 40L, 101L), (7L, 60L, 102L)).toDF("k", "t", "mark")
    // tolerance 10: lid=3 (t=41, match t=40, gap 1) keeps; lid=1 (t=50,
    // gap 10) keeps at the boundary; lid=2 (t=99, match t=60, gap 39) nulls
    val out = DocumentStore.asofJoinTolerance(l, r, "k", "t", Seq("mark"), 10L)
      .orderBy("lid").collect().map(x => (x.getLong(2), Option(x.get(3))))
    assert(out.toSeq === Seq(
      (1L, Some(101L)), (2L, None), (3L, Some(101L))))
    // an unbounded tolerance reproduces asofJoin exactly, on real data
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), Documents.tsSec(col("ts")).as("ts_sec"))
    val left = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts_sec", "event_id", "value")
    val right = e.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_sec").agg(max("event_id").as("mark_id"))
    val plain = DocumentStore.asofJoin(left, right, "user_id", "ts_sec", Seq("mark_id"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val loose = DocumentStore.asofJoinTolerance(left, right, "user_id", "ts_sec",
        Seq("mark_id"), Long.MaxValue / 4)
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(loose === plain && plain.nonEmpty)
  }

  test("multiple right rows per key: the latest preceding one wins") {
    import spark.implicits._
    val l = Seq((7L, 50L, 1L), (7L, 99L, 2L)).toDF("k", "t", "lid")
    val r = Seq((7L, 10L, 100L), (7L, 40L, 101L), (7L, 60L, 102L)).toDF("k", "t", "mark")
    val out = DocumentStore.asofJoinExec(l, r, "k", "t", Seq("mark"))
      .orderBy("lid").collect().map(x => x.getLong(3))
    assert(out.toSeq === Seq(101L, 102L))
  }

  test("bucketed inputs elide both exchanges — the exec's scale win") {
    val e = Tables.events(spark, sf).select(col("user_id").as("k"),
      graft.model.Documents.tsSec(col("ts")).as("t"), col("event_id"))
    spark.sql("DROP TABLE IF EXISTS asof_bl")
    spark.sql("DROP TABLE IF EXISTS asof_br")
    graft.store.Layout.writeBucketed(e, "asof_bl", "k", 4)
    graft.store.Layout.writeBucketed(
      e.groupBy("k", "t").agg(max("event_id").as("mark")), "asof_br", "k", 4)
    val out = DocumentStore.asofJoinExec(
      spark.table("asof_bl"), spark.table("asof_br"), "k", "t", Seq("mark"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed as-of join must not shuffle either side:\n$plan")
    assert(out.count() === e.count())
  }

  test("strategy is available through GraftExtensions sessions") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .appName("asof_ext_test")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
    import s2.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 42L)).toDF("k", "t", "mark")
    val node = graft.plans.AsofJoinPlan.forChildren(
      l.queryExecution.analyzed, r.queryExecution.analyzed, "k", "t", Seq("mark"))
    val out = org.apache.spark.sql.classic.GraftPlanBridge.ofRows(s2, node).collect()
    assert(out.map(_.toSeq).toSeq === Seq(Seq(1L, 10L, 42L)))
  }
}
