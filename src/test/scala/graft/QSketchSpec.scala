package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{QSketchFunctions, QSketchImpl}
import org.apache.spark.unsafe.types.UTF8String

/** The deterministic bottom-k quantile sketch: exactness when the sample
  * covers the data, byte-stable merges under repartitioning, the
  * persist-then-union sketch-table workflow, and md5-rank parity with
  * the SQL spelling the oracle uses.
  */
class QSketchSpec extends AnyFunSuite {
  import TestSession._

  private def events = Tables.events(spark, sf)

  test("rank equals the 13-hex-char md5 slice SQL computes") {
    val ids = Seq("0", "42", "98765", "hello")
    for (id <- ids) {
      val viaImpl = QSketchImpl.rankOf(UTF8String.fromString(id))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 13)
      assert(viaImpl === java.lang.Long.parseLong(hex, 16), s"id=$id")
    }
  }

  test("k >= n makes the sketch quantile the exact nearest-rank quantile") {
    QSketchFunctions.register(spark)
    import spark.implicits._
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val row = df.agg(
      expr("graft_qsketch_q(graft_qsketch(v, cast(id as string), 16), 0.5d)").as("p50"),
      expr("graft_qsketch_q(graft_qsketch(v, cast(id as string), 16), 0.9d)").as("p90"))
      .head()
    // sorted: 1,3,5,7,9; floor(.5*4)=2 -> 5.0; floor(.9*4)=3 -> 7.0
    assert(row.getDouble(0) === 5.0)
    assert(row.getDouble(1) === 7.0)
  }

  test("sketch bytes are identical under any repartitioning") {
    QSketchFunctions.register(spark)
    val base = events.selectExpr("cast(value as double) as v",
      "cast(event_id as string) as id")
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(expr("graft_qsketch(v, id, 256)").as("s"))
        .head().getAs[Array[Byte]]("s")
    val a = sk(base)
    val b = sk(base.repartition(17))
    assert(java.util.Arrays.equals(a, b),
      "bottom-k by hash rank must not depend on partitioning")
  }

  test("union of per-slice sketches equals the whole-corpus sketch, byte for byte") {
    QSketchFunctions.register(spark)
    val base = events.selectExpr("event_type", "cast(value as double) as v",
      "cast(event_id as string) as id")
    val whole = base.agg(expr("graft_qsketch(v, id, 128)").as("s"))
      .head().getAs[Array[Byte]]("s")
    val unioned = base.groupBy("event_type")
      .agg(expr("graft_qsketch(v, id, 128)").as("s"))
      .agg(expr("graft_qsketch_union(s)").as("s"))
      .head().getAs[Array[Byte]]("s")
    assert(java.util.Arrays.equals(whole, unioned))
  }

  test("sketches survive a parquet round trip and merge across jobs") {
    QSketchFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_qs").toString + "/sketches"
    events.selectExpr("event_type", "cast(value as double) as v",
        "cast(event_id as string) as id")
      .groupBy("event_type")
      .agg(expr("graft_qsketch(v, id, 256)").as("s"))
      .write.parquet(dir)
    val reread = spark.read.parquet(dir)
      .agg(expr("graft_qsketch_q(graft_qsketch_union(s), 0.5d)").as("p50"))
      .head().getDouble(0)
    val direct = events.selectExpr("cast(value as double) as v",
        "cast(event_id as string) as id")
      .agg(expr("graft_qsketch_q(graft_qsketch(v, id, 256), 0.5d)").as("p50"))
      .head().getDouble(0)
    assert(reread === direct)
  }

  test("sampled median lands near the exact median at full corpus size") {
    QSketchFunctions.register(spark)
    val est = events.selectExpr("cast(value as double) as v",
        "cast(event_id as string) as id")
      .agg(expr("graft_qsketch_q(graft_qsketch(v, id, 1024), 0.5d)").as("p50"))
      .head().getDouble(0)
    val exact = events.agg(expr("percentile(value, 0.5)")).head().getDouble(0)
    // rank-space error ~1/sqrt(k): generous 4-sigma band on the value
    // scale via the exact p40/p60 bracket
    val lo = events.agg(expr("percentile(value, 0.40)")).head().getDouble(0)
    val hi = events.agg(expr("percentile(value, 0.60)")).head().getDouble(0)
    assert(est >= lo && est <= hi, s"p50 est $est outside [$lo, $hi] (exact $exact)")
  }
}
