package graft

import java.util.Locale
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage profiler — the measurement half of the
  * optimization loop (guide §1: empirical view) with the UI disabled:
  * runs each named query once untimed (codegen/JIT warm-up), once
  * profiled, and prints every job and stage with wall, task count,
  * executor run/CPU time and shuffle bytes, so "which operator is the
  * time going to" is a readable table instead of a guess.
  *
  * Usage: runMain graft.Prof <query> [query ...]
  */
object Prof {
  private def ms(v: Long): String = String.format(Locale.ROOT, "%.2f", Double.box(v / 1e3))

  private case class StageRow(name: String, tasks: Int, runMs: Long,
                              cpuMs: Long, shufReadMB: Double, shufWriteMB: Double,
                              spillMB: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = new ConcurrentHashMap[Int, (Long, String)]()
    val jobRows = new java.util.concurrent.CopyOnWriteArrayList[(Int, Long, String)]()
    val stageRows = new ConcurrentHashMap[Int, StageRow]()
    val stagesOfJob = new ConcurrentHashMap[Int, Seq[Int]]()
    @volatile var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
        jobStart.put(e.jobId, (e.time, Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")))
        stagesOfJob.put(e.jobId, e.stageIds)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (enabled) {
        Option(jobStart.get(e.jobId)).foreach { case (t0, desc) =>
          jobRows.add((e.jobId, e.time - t0, desc))
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (enabled) {
        val si = e.stageInfo
        val m = si.taskMetrics
        stageRows.put(si.stageId, StageRow(
          si.name.takeWhile(_ != '\n').take(90), si.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1048576.0,
          m.shuffleWriteMetrics.bytesWritten / 1048576.0,
          m.diskBytesSpilled / 1048576.0))
      }
    })

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up pass: codegen + parquet footers AND the operator caches —
      // the profiled run then matches the bench's warm median-of-3 state
      // (timeQuery unpersists only after its three runs)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[prof] $name warmup failed: $e") }
      jobStart.clear(); jobRows.clear(); stageRows.clear(); stagesOfJob.clear()
      enabled = true
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[prof] $name failed: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      enabled = false
      ops.OpCache.unpersistAll()
      println(f"%n===== $name%s wall=$wall%.2fs jobs=${jobRows.size()}%d =====")
      val it = jobRows.iterator()
      var totRun = 0L; var totCpu = 0L
      while (it.hasNext) {
        val (jid, dur, desc) = it.next()
        val sids = Option(stagesOfJob.get(jid)).getOrElse(Seq.empty)
        val rows = sids.flatMap(s => Option(stageRows.get(s)))
        val run = rows.map(_.runMs).sum; val cpu = rows.map(_.cpuMs).sum
        totRun += run; totCpu += cpu
        println(f"job $jid%3d wall=${ms(dur)}%8ss run=${ms(run)}%8ss cpu=${ms(cpu)}%8ss stages=${rows.size}%2d $desc%s")
        rows.sortBy(-_.runMs).take(4).foreach { r =>
          println(f"    stage tasks=${r.tasks}%4d run=${ms(r.runMs)}%8ss cpu=${ms(r.cpuMs)}%8ss shufR=${r.shufReadMB}%8.1fMB shufW=${r.shufWriteMB}%8.1fMB spill=${r.spillMB}%6.1fMB  ${r.name}%s")
        }
      }
      println(f"[prof] $name%s TOTAL run=${ms(totRun)}%ss cpu=${ms(totCpu)}%ss")
    }
    spark.stop()
  }
}
