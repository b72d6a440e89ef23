package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{OpCache, Rank}

/** [[graft.ops.Rank]] — the distributed replacement for partition-less
  * `ntile` / `row_number` / running-sum windows — must reproduce the SQL
  * window forms rank-for-rank on every shape that matters: ties broken by
  * the total order, buckets > N, descending orders, NULL values in the
  * running-sum column, and (critically) EXACTNESS under forced
  * repartitioning — the range boundaries Spark samples must never change
  * the answer, only the parallelism.
  */
class RankSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** Deterministic fixture: values with heavy ties, ids unique. */
  private def fixture(n: Int) =
    (1 to n).map(i => (i.toLong, (i % 7).toLong, (i * 31 % 11).toLong))
      .toDF("id", "v", "w")

  private def sqlNtile(df: org.apache.spark.sql.DataFrame, k: Int,
                       order: Seq[org.apache.spark.sql.Column]) =
    df.withColumn("want", ntile(k).over(Window.orderBy(order: _*)))

  test("rangedNtile == SQL ntile over a tie-heavy total order") {
    try {
      for (k <- Seq(1, 2, 3, 10, 97)) {
        val df = fixture(200)
        val order = Seq(col("v"), col("id"))
        val got = Rank.rangedNtile(df, k, order, "got")
        val both = got.join(sqlNtile(df, k, order), Seq("id", "v", "w"))
        assert(both.filter(col("got") =!= col("want")).count() === 0L,
          s"ntile($k) mismatch")
      }
    } finally OpCache.unpersistAll()
  }

  test("rangedNtile with buckets > N assigns rank = bucket like SQL") {
    try {
      val df = fixture(5)
      val order = Seq(col("id"))
      val got = Rank.rangedNtile(df, 10, order, "got")
      val both = got.join(sqlNtile(df, 10, order), Seq("id", "v", "w"))
      assert(both.filter(col("got") =!= col("want")).count() === 0L)
    } finally OpCache.unpersistAll()
  }

  test("rangedNtile is exact under descending order and forced repartitioning") {
    try {
      val df = fixture(300).repartition(13) // adversarial input layout
      val order = Seq(col("v").desc, col("id"))
      val got = Rank.rangedNtile(df, 10, order, "got")
      val both = got.join(sqlNtile(df, 10, order), Seq("id", "v", "w"))
      assert(both.filter(col("got") =!= col("want")).count() === 0L)
    } finally OpCache.unpersistAll()
  }

  test("withGlobalRank == SQL row_number, no partition-less window in its plan") {
    try {
      val df = fixture(150).repartition(9)
      val order = Seq(col("w"), col("id"))
      val got = Rank.withGlobalRank(df, order, rankCol = "r", totalCol = "t")
      val want = df.withColumn("want",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      val both = got.join(want, Seq("id", "v", "w"))
      assert(both.filter(col("r") =!= col("want")).count() === 0L)
      assert(both.filter(col("t") =!= 150L).count() === 0L)
      // the machinery's own plan keeps the guard's contract: any global
      // window rides only the __pid offset aggregate
      import org.apache.spark.sql.execution.window.WindowExec
      import org.apache.spark.sql.execution.aggregate.HashAggregateExec
      val bad = got.queryExecution.sparkPlan.collect {
        case wx: WindowExec if wx.partitionSpec.isEmpty &&
          wx.collectFirst { case a: HashAggregateExec
            if a.groupingExpressions.map(_.name) == Seq("__pid") => a }.isEmpty => wx
      }
      assert(bad.isEmpty, s"unexpected corpus-shaped global window:\n${bad.mkString("\n")}")
    } finally OpCache.unpersistAll()
  }

  test("withRunningSum == SQL prefix sum, including NULL-value SQL semantics") {
    try {
      // vals: NULLs scattered, including an all-NULL leading prefix —
      // SQL: NULL until the first non-null, then carries forward
      val df = (1 to 120).map { i =>
        val v = if (i <= 15 || i % 4 == 0) None else Some(i.toLong % 13)
        (i.toLong, v)
      }.toDF("id", "v").repartition(7)
      val got = Rank.withRunningSum(df, Seq(col("id")), "v", "run")
      val want = df.withColumn("want",
        sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val both = got.join(want, Seq("id"))
      assert(both.filter(!(col("run") <=> col("want"))).count() === 0L,
        "running sum diverges from SQL (NULL semantics included)")
      // the leading all-NULL prefix must be NULL, not 0
      assert(both.filter(col("id") <= 15L && col("run").isNotNull).count() === 0L)
    } finally OpCache.unpersistAll()
  }

  test("reserved working names are rejected, not silently overwritten") {
    val bad = Seq((1L, 2L)).toDF("id", "__pid")
    intercept[IllegalArgumentException] {
      Rank.rangedNtile(bad, 2, Seq(col("id")), "out")
    }
    val clash = Seq((1L, 2L)).toDF("id", "out")
    intercept[IllegalArgumentException] {
      Rank.rangedNtile(clash, 2, Seq(col("id")), "out")
    }
  }
}
