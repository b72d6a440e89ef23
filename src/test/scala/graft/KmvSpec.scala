package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KmvFunctions, KmvImpl}

/** The portable KMV (theta-style) sketch: exactness while un-full,
  * estimation accuracy at scale, byte-deterministic unions, and the
  * intersection estimates that make it the set-operation complement of
  * the HLL sketch.
  */
class KmvSpec extends AnyFunSuite {
  import TestSession._

  private def events = Tables.events(spark, sf)

  test("un-full sketches are exact: estimate == countDistinct, intersection exact") {
    KmvFunctions.register(spark)
    val rows = events.groupBy("event_type")
      .agg(expr("graft_kmv_sketch(user_id, 4096)").as("sk"),
        countDistinct("user_id").as("nd"))
      .withColumn("est", expr("graft_kmv_est(sk)"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") === r.getAs[Long]("nd"),
        s"${r.getString(0)}: un-full sketch must be exact")
    }
  }

  test("estimate within KMV error bounds at 10^5 distinct, k=1024") {
    KmvFunctions.register(spark)
    val n = 100000L
    val est = spark.range(n)
      .agg(expr("graft_kmv_est(graft_kmv_sketch(id, 1024))"))
      .collect()(0).getLong(0)
    // stderr ≈ 1/sqrt(k-2) ≈ 3.1%; allow 4 sigma
    assert(math.abs(est - n).toDouble / n < 0.125, s"est $est vs exact $n")
  }

  test("sketch of the whole equals the union of part sketches, byte for byte") {
    KmvFunctions.register(spark)
    val whole = events.agg(expr("graft_kmv_sketch(user_id, 512)").as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    val parts = events.withColumn("half", col("event_id") % 2)
      .groupBy("half").agg(expr("graft_kmv_sketch(user_id, 512)").as("s"))
    val unioned = parts.agg(expr("graft_kmv_union(s)").as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    assert(java.util.Arrays.equals(whole, unioned),
      "k-smallest merge must make any re-partitioning byte-identical")
    // idempotent: unioning the union with itself changes nothing
    val (k, hs) = KmvImpl.deserialize(unioned)
    val buf = new KmvImpl.Buffer(k)
    buf.mergeFrom(hs); buf.mergeFrom(hs)
    assert(java.util.Arrays.equals(KmvImpl.serialize(k, buf.toArray), unioned))
  }

  test("intersection estimate tracks the exact overlap at 10^5 scale") {
    KmvFunctions.register(spark)
    import spark.implicits._
    // A = [0, 60k), B = [40k, 100k) → exact overlap 20k
    val a = spark.range(0L, 60000L).select(col("id"))
    val b = spark.range(40000L, 100000L).select(col("id"))
    val skA = a.agg(expr("graft_kmv_sketch(id, 2048)").as("s")).collect()(0).getAs[Array[Byte]]("s")
    val skB = b.agg(expr("graft_kmv_sketch(id, 2048)").as("s")).collect()(0).getAs[Array[Byte]]("s")
    val est = KmvImpl.intersectSerialized(skA, skB)
    assert(math.abs(est - 20000L).toDouble / 20000.0 < 0.15, s"est $est vs exact 20000")
    // disjoint sets estimate ~0 (sampled overlap of nothing is nothing)
    val c = spark.range(200000L, 260000L).select(col("id"))
    val skC = c.agg(expr("graft_kmv_sketch(id, 2048)").as("s")).collect()(0).getAs[Array[Byte]]("s")
    assert(KmvImpl.intersectSerialized(skA, skC) <= 20000L / 50)
  }

  test("sketches survive a parquet round trip and merge across jobs") {
    KmvFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString + "/sketches"
    events.groupBy("event_type")
      .agg(expr("graft_kmv_sketch(user_id, 4096)").as("sketch"))
      .write.mode("overwrite").parquet(dir)
    val est = spark.read.parquet(dir)
      .agg(expr("graft_kmv_est(graft_kmv_union(sketch))"))
      .collect()(0).getLong(0)
    val exact = events.select(countDistinct("user_id")).collect()(0).getLong(0)
    // un-full at the test sf → exact through the round trip
    assert(est === exact, s"est $est vs exact $exact")
  }

  test("serialization round-trips and rejects corrupt headers") {
    val buf = new KmvImpl.Buffer(64)
    (1L to 100L).foreach(i => buf.add(i * 0x9E3779B97F4A7C15L))
    val bytes = KmvImpl.serialize(64, buf.toArray)
    val (k, hs) = KmvImpl.deserialize(bytes)
    assert(k === 64 && hs.length === 64)
    // ascending unsigned order
    hs.sliding(2).foreach { case Array(x, y) =>
      assert(java.lang.Long.compareUnsigned(x, y) < 0)
    }
    intercept[IllegalArgumentException](KmvImpl.deserialize(bytes.drop(3)))
  }
}
