package graft
import java.util.Locale
import org.apache.spark.sql.SparkSession

object Bench {
  private def j(d: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(d))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Process CPU time (all threads — local mode runs every executor in
    // this JVM) alongside wall time: wall on a shared machine is
    // contention-dominated (round 9 swung 0.09x-3.4x per query on
    // IDENTICAL plans), while CPU seconds of the same work are stable —
    // the number rounds compare to tell a real regression from noise.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuNs(): Long = osBean.getProcessCpuTime
    // Warm up the JVM (codegen, shuffle machinery) and parquet footers so
    // the first timed query isn't charged session initialization.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Fixed calibration workload (CPU + one small shuffle), timed at start
    // and end of the run: same-code totals have swung ±20% run-to-run on a
    // shared machine, so cross-round comparisons need a machine-condition
    // yardstick measured under the SAME conditions as the queries. Both
    // numbers land in the JSON; a round whose calib differs 1.5x from the
    // last round's is not a like-for-like total.
    def calibrate(): (Double, Double) = {
      val t0 = System.nanoTime(); val c0 = cpuNs()
      spark.range(200000000L)
        .selectExpr("id % 1000 as k", "id as v")
        .groupBy("k").sum("v").count()
      ((System.nanoTime() - t0) / 1e9, (cpuNs() - c0) / 1e9)
    }
    val calibStart = calibrate()
    try Tables.All.foreach(t => Tables.table(spark, sfDir, t).schema)
    catch { case _: Throwable => }
    // Three timed runs per query, report the MEDIAN (plus the max-min
    // spread in bench_full.json): local[32] timings are noisy (GC,
    // thread scheduling) — rounds 4 and 6 both measured ±0.3s single-run
    // swing — and a median over 3 makes a real per-query 2x regression
    // detectable above that noise where a single sample (or a min that
    // hides a bimodal slow mode) cannot.
    // Optional comma-separated name filter for local iteration on a
    // single query's timing (e.g. SPARK_GRAFT_ONLY=dedup_clusters).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val picked = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Untimed dry pass over every query first: JIT/codegen of the SHARED
    // machinery (parquet reader, join/agg codegen, shuffle) otherwise
    // lands on whichever queries happen to run first, skewing their
    // numbers 2-3x run-to-run. Per-query min-of-2 can't fix that — the
    // first timed run of query #1 still pays infra warmup that query #50
    // gets for free.
    picked.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Release every operator-internal cache the dry pass accumulated:
    // ~120 queries' worth of persisted intermediates otherwise pile up
    // in storage memory, and the resulting eviction churn is exactly the
    // run-order-dependent noise round 6 measured (graph_kcore 2.3s in
    // isolation, 23s in the full run). Timed queries start cold below.
    ops.OpCache.unpersistAll()
    // A query that THROWS must be visible in the output, not timed as a
    // fast success — a broken reader (e.g. an incompatible testdata
    // regen) otherwise reads as a 10x "speedup" on every query it
    // crashes, which is exactly how a silent regression hides.
    var failed = List.empty[String]
    val results = picked.map { case (name, fn) =>
      var ok = true
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c0 = cpuNs()
        // The noop sink materializes EVERY output column. A count() here
        // would let Catalyst prune the projections of map-shaped queries
        // (token counting, scrubbing, decode) and time only their scans.
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => ok = false }
        ((System.nanoTime() - t0) / 1e9, (cpuNs() - c0) / 1e9)
      }
      if (!ok) failed ::= name
      // Per-query cache isolation: run 1 builds the operator's internal
      // caches, runs 2-3 reuse them — the median is the warm steady
      // state — and releasing them HERE makes that number independent of
      // which other queries ran before (bounded storage pressure, no
      // cross-query eviction cascades).
      ops.OpCache.unpersistAll()
      val wall = times.map(_._1).sorted
      val cpu = times.map(_._2).sorted
      name -> (wall(wall.size / 2), wall.last - wall.head,
        cpu(cpu.size / 2), cpu.last - cpu.head)
    }
    val calibEnd = calibrate()
    val calib = s""""calib_start_sec":${j(calibStart._1)},"calib_end_sec":${j(calibEnd._1)}""" +
      s""","calib_start_cpu_sec":${j(calibStart._2)},"calib_end_cpu_sec":${j(calibEnd._2)}"""
    val nFailed = failed.size
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the stdout line survives tail truncation; cap its failed list
    val failedBrief = failed.sorted.take(10).map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val totalCpu = if (results.nonEmpty) results.values.map(_._3).sum else 0.0

    // Full-precision per-query timings → bench_full.json (the harness that
    // invokes this main keeps only the final ~2000 chars of stdout, which a
    // ~80-query map overflows — the file carries the complete breakdown).
    val fullQs = results.toSeq.sortBy(-_._2._1)
      .map { case (k, t) => "\"" + k + "\":" + j(t._1) }.mkString("{", ",", "}")
    val fullSpread = results.toSeq.sortBy(-_._2._2)
      .map { case (k, t) => "\"" + k + "\":" + j(t._2) }.mkString("{", ",", "}")
    val fullCpu = results.toSeq.sortBy(-_._2._3)
      .map { case (k, t) => "\"" + k + "\":" + j(t._3) }.mkString("{", ",", "}")
    val fullCpuSpread = results.toSeq.sortBy(-_._2._4)
      .map { case (k, t) => "\"" + k + "\":" + j(t._4) }.mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":${j(total)},"unit":"sec","stat":"median_of_3","cpu_total_sec":${j(totalCpu)},"n_queries":${results.size},"n_failed":$nFailed,"failed":$failedJson,$calib,"queries":$fullQs,"spread":$fullSpread,"queries_cpu":$fullCpu,"spread_cpu":$fullCpuSpread,"sf":"$sfDir"}"""
    if (only.isEmpty) // a filtered run must not clobber the full snapshot
      try {
        val w = new java.io.PrintWriter("bench_full.json"); w.println(full); w.close()
      } catch { case _: Throwable => }

    // Final stdout line: same shape, but the per-query map keeps only the
    // slowest entries that fit a fixed byte budget so the whole line
    // survives tail truncation and stays machine-parseable.
    val budget = 1500
    val entries = results.toSeq.sortBy(-_._2._1).map { case (k, t) => "\"" + k + "\":" + j(t._1) }
    val kept = entries.scanLeft(0)(_ + _.length + 1).tail.zip(entries)
      .takeWhile(_._1 <= budget).map(_._2)
    val qs = kept.mkString("{", ",", "}")
    // Nothing may print after (or interleave with) the JSON line — the
    // invoking harness parses the tail of the merged output. Silence the
    // Spark shutdown chatter before emitting it.
    spark.sparkContext.setLogLevel("OFF")
    System.out.flush(); System.err.flush()
    println(s"""{"metric":"total","value":${j(total)},"unit":"sec","stat":"median_of_3","cpu_total_sec":${j(totalCpu)},"n_queries":${results.size},"n_failed":$nFailed,"failed":$failedBrief,$calib,"n_reported":${kept.size},"full":"bench_full.json","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
