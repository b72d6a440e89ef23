package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HllFunctions, HllImpl}

/** The portable HLL sketch: accuracy, deterministic merges, and the
  * persist-then-union sketch-table workflow.
  */
class HllSpec extends AnyFunSuite {
  import TestSession._

  private def events = Tables.events(spark, sf)

  test("estimate is within HLL error bounds of the exact count") {
    HllFunctions.register(spark)
    val exact = events.select(countDistinct("user_id")).collect()(0).getLong(0)
    val est = events.agg(expr("graft_hll_est(graft_hll_sketch(user_id, 12))"))
      .collect()(0).getLong(0)
    // p=12 → m=4096 → stderr ≈ 1.04/sqrt(m) ≈ 1.6%; allow 4 sigma
    assert(math.abs(est - exact).toDouble / exact < 0.065,
      s"est $est vs exact $exact")
  }

  test("sketch of the whole equals the union of part sketches, byte for byte") {
    HllFunctions.register(spark)
    val whole = events.agg(expr("graft_hll_sketch(user_id, 10)").as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    val parts = events.withColumn("half", col("event_id") % 2)
      .groupBy("half").agg(expr("graft_hll_sketch(user_id, 10)").as("s"))
    val unioned = parts.agg(expr("graft_hll_union(s)").as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    assert(java.util.Arrays.equals(whole, unioned),
      "register-wise max must make any re-partitioning byte-identical")
  }

  test("sketches survive a parquet round trip and merge across jobs") {
    HllFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString + "/sketches"
    // job 1: per-event-type sketches persisted as an ordinary binary column
    events.groupBy("event_type")
      .agg(expr("graft_hll_sketch(user_id, 12)").as("sketch"))
      .write.mode("overwrite").parquet(dir)
    // job 2 (fresh read): union the stored sketches — no raw-data rescan
    val est = spark.read.parquet(dir)
      .agg(expr("graft_hll_est(graft_hll_union(sketch))"))
      .collect()(0).getLong(0)
    val exact = events.select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.065, s"est $est vs exact $exact")
  }

  test("linear-counting regime: small cardinalities are near-exact") {
    val regs = new Array[Byte](4096)
    import spark.implicits._
    HllFunctions.register(spark)
    val est = (1 to 50).map(i => (i.toLong, i % 7)).toDF("v", "g")
      .agg(expr("graft_hll_est(graft_hll_sketch(v, 12))")).collect()(0).getLong(0)
    assert(est === 50L, "50 values in 4096 registers sit in the linear-counting regime")
    assert(HllImpl.estimate(regs) === 0L, "empty sketch estimates zero")
  }

  test("deterministic across sessions: same data, same sketch bytes") {
    HllFunctions.register(spark)
    val a = events.agg(expr("graft_hll_sketch(user_id, 8)")).collect()(0).getAs[Array[Byte]](0)
    val b = events.repartition(7).agg(expr("graft_hll_sketch(user_id, 8)"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b), "partitioning must not change the sketch")
  }
}
