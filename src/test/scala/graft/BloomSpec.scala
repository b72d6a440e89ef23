package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomFunctions, BloomImpl}
import graft.ops.Dedup

/** The portable Bloom filter: no false negatives, bounded false
  * positives, byte-identical partial-aggregate merges, and the
  * decontamination prefilter returning the exact answer.
  */
class BloomSpec extends AnyFunSuite {
  import TestSession._

  test("no false negatives; false-positive rate near the sizing target") {
    BloomFunctions.register(spark)
    import spark.implicits._
    val n = 10000L
    val bits = BloomImpl.optimalNumBits(n, 0.01)
    val hashes = BloomImpl.optimalNumHashes(n, bits)
    val members = spark.range(n).select(xxhash64(col("id")).as("h"))
    val bloom = members.agg(expr(s"graft_bloom_agg(h, $bits, $hashes)"))
      .head().getAs[Array[Byte]](0)

    val inHits = members
      .filter(call_function("graft_bloom_contains", lit(bloom), col("h"))).count()
    assert(inHits === n, "a Bloom filter may never drop a member")

    // disjoint probe set (ids shifted far away, re-hashed)
    val fp = spark.range(1000000, 1000000 + n).select(xxhash64(col("id")).as("h"))
      .filter(call_function("graft_bloom_contains", lit(bloom), col("h"))).count()
    assert(fp < n / 20, s"fp rate ${fp.toDouble / n} far above the 1% target")
  }

  test("filter of the whole equals the OR of part filters, byte for byte") {
    BloomFunctions.register(spark)
    val ev = Tables.events(spark, sf).select(xxhash64(col("user_id")).as("h"),
      col("event_id"))
    val whole = ev.agg(expr("graft_bloom_agg(h, 65536, 5)"))
      .head().getAs[Array[Byte]](0)
    // OR the per-half filters driver-side and compare to the whole
    val parts = ev.withColumn("half", col("event_id") % 2)
      .groupBy("half").agg(expr("graft_bloom_agg(h, 65536, 5)").as("f"))
      .collect().map(_.getAs[Array[Byte]]("f"))
    val acc = parts.head.clone()
    parts.tail.foreach(BloomImpl.mergeInto(acc, _))
    assert(java.util.Arrays.equals(whole, acc),
      "bitwise-OR merge must make any re-partitioning byte-identical")
  }

  test("filters survive a parquet round trip and merge across jobs") {
    BloomFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/filters"
    // job 1: one filter row per half, persisted as an ordinary column
    Tables.events(spark, sf)
      .select(xxhash64(col("user_id")).as("h"), col("event_id"))
      .withColumn("half", col("event_id") % 2)
      .groupBy("half").agg(expr("graft_bloom_agg(h, 65536, 5)").as("f"))
      .write.mode("overwrite").parquet(dir)
    // job 2: read the sketch table back, OR the parts, probe
    val parts = spark.read.parquet(dir).collect().map(_.getAs[Array[Byte]]("f"))
    val acc = parts.head.clone()
    parts.tail.foreach(BloomImpl.mergeInto(acc, _))
    val users = Tables.events(spark, sf).select(xxhash64(col("user_id")).as("h")).distinct()
    val hits = users
      .filter(call_function("graft_bloom_contains", lit(acc), col("h"))).count()
    assert(hits === users.count(), "every ingested user must probe true after the round trip")
  }

  test("count-min never undercounts, is partition-invariant, and unions exactly") {
    graft.functions.CmFunctions.register(spark)
    import spark.implicits._
    // zipf-ish weights so collisions matter: item i has weight i+1
    val items = (0 until 500).map(i => (s"it$i", (i + 1).toLong))
    val df = items.toDF("item", "c")
    def sketchOf(d: org.apache.spark.sql.DataFrame): Array[Byte] =
      d.agg(expr("graft_cm_sketch(item, c, 128, 4)")).head().getAs[Array[Byte]](0)
    val sk = sketchOf(df)
    // estimate >= exact, always; and the error respects the eps*N bound
    val total = items.map(_._2).sum
    val eps = math.E / 128
    items.foreach { case (it, c) =>
      val est = graft.functions.CmImpl.estimate(sk,
        org.apache.spark.unsafe.types.UTF8String.fromString(it))
      assert(est >= c, s"$it undercounted: $est < $c")
      assert(est - c <= (3 * eps * total).toLong, s"$it error ${est - c} way past eps*N")
    }
    // repartitioning cannot move a byte (elementwise adds commute)
    assert(sketchOf(df.repartition(7)).toSeq === sk.toSeq)
    // per-part sketches union to the whole, byte for byte
    val parts = df.withColumn("p", col("c") % 3)
      .groupBy("p").agg(expr("graft_cm_sketch(item, c, 128, 4)").as("sk"))
    val unioned = parts.agg(expr("graft_cm_union(sk)")).head().getAs[Array[Byte]](0)
    assert(unioned.toSeq === sk.toSeq)
  }

  test("bloom-prefiltered decontamination equals the exact join") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") >= 5)
    val bench = docs.filter(col("doc_id") < 5)
    val exact = Dedup.contamination(corpus, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), nGram = 5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloomed = Dedup.contaminationBloom(corpus, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), nGram = 5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty, "fixture should contain contaminated docs")
    assert(bloomed === exact,
      "the confirm join must cancel every bloom false positive")
    Dedup.unpersistShared()
  }
}
