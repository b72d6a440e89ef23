package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected RangeJoinBinning optimizer rule: a naive interval-
  * containment join written by a user must be rewritten to the binned
  * equality join, with identical results.
  */
class RuleSpec extends AnyFunSuite {
  import TestSession._

  test("naive BETWEEN join is rewritten to a binned equality join, same rows") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.rangeJoin.binSize", "100")
      .withExtensions(new graft.functions.GraftExtensions)
      .appName("rule_test")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
    import s2.implicits._
    val points = Seq((1L, 50L, 10L), (1L, 250L, 11L), (2L, 50L, 12L), (1L, 949L, 13L))
      .toDF("k", "t", "pid")
    val intervals = Seq((1L, 0L, 99L, 100L), (1L, 200L, 400L, 101L), (2L, 0L, 999L, 102L),
        (1L, 900L, 950L, 103L))
      .toDF("k", "lo", "hi", "iid")
    val joined = points.join(intervals,
      points("k") === intervals("k") && points("t") >= intervals("lo") &&
        points("t") <= intervals("hi"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("__p_bin") && plan.contains("__i_bin"),
      s"rule did not rewrite the join:\n$plan")
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 100L), (11L, 101L), (12L, 102L), (13L, 103L)))

    // a join that is NOT the pattern (single bound) must be left untouched
    val half = points.join(intervals,
      points("k") === intervals("k") && points("t") >= intervals("lo"))
    assert(!half.queryExecution.optimizedPlan.toString.contains("__p_bin"))
    assert(half.count() === 7)
  }
}
