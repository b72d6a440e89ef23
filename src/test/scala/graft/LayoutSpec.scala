package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.Layout

/** Physical-layout checks: bucketed joins avoid shuffles, partitioned
  * writes prune, salted joins preserve results while spreading hot keys.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed tables join without a shuffle exchange") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")
    Layout.writeBucketed(ev, "ev_bucketed_a", "event_id", 4)
    Layout.writeBucketed(ev.withColumnRenamed("value", "value2"), "ev_bucketed_b", "event_id", 4)
    val joined = spark.table("ev_bucketed_a").join(spark.table("ev_bucketed_b"), "event_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() === ev.count())
  }

  test("partitioned write prunes scoped reads to one directory") {
    val out = Files.createTempDirectory("graft_part").toString
    Layout.writePartitioned(
      Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("event_type")),
      out, "user_id")
    val scoped = spark.read.parquet(out).filter(col("user_id") === 7)
    val scan = scoped.queryExecution.executedPlan.toString
    assert(scoped.count() > 0)
    // the filter must become a partition (directory) filter, not a data filter
    assert(scan.contains("PartitionFilters") && scan.contains("(user_id#") &&
      scan.contains("= 7)"), s"expected partition pruning in plan:\n$scan")
  }

  test("salted join equals the plain join") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "event_type")
    val dim = Tables.customer(spark, sf).select(col("c_custkey").as("user_id"), col("c_name"))
    val plain = ev.join(dim, "user_id")
    val salted = Layout.saltedJoin(ev, dim, "user_id", "event_id", 8)
    assert(salted.count() === plain.count())
    val a = plain.select("event_id", "c_name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = salted.select("event_id", "c_name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }
}
