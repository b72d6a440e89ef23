package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared registry for operator-internal caches, releasable by the
  * caller. An operator that pins storage memory the pipeline can't free
  * is a leak at 100 TB — every internal `.persist` taken inside an
  * operator lands here so a pipeline can release them all between
  * stages. Re-caching an already-cached plan is skipped (two queries
  * sharing one subplan re-enter here; re-caching would only log
  * CacheManager "already cached" warnings).
  */
private[graft] object OpCache {

  private val handles = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def share(df: DataFrame, enabled: Boolean): DataFrame = {
    if (enabled && df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      handles.synchronized { handles += df }
    }
    df
  }

  /** Release every operator-internal cache in this JVM. Safe to call
    * mid-pipeline: Spark recomputes any plan that is still needed.
    */
  def unpersistAll(): Unit = handles.synchronized {
    handles.foreach(d => try d.unpersist() catch { case _: Throwable => () })
    handles.clear()
  }

  /** `localCheckpoint()` that actually PRESERVES the plan's physical
    * output partitioning. Under AQE (default-on) `Dataset.checkpoint`
    * records `executedPlan.outputPartitioning` from the adaptive root,
    * which reports UnknownPartitioning — so a
    * `repartition(n, key).localCheckpoint()` spine yields a LogicalRDD
    * every downstream join/groupBy RE-SHUFFLES (measured round 15: the
    * batched-BFS adjacency re-exchanged EVERY level, one O(E) exchange
    * per round in every iterative graph op — exactly the exchange the
    * repartition-before-checkpoint pattern exists to remove). Planning
    * just this one materialization with AQE off records the real
    * HashPartitioning in the LogicalRDD; consumers still plan under AQE
    * and read it exchange-free. The flag flip is driver-side and brief;
    * iterative batch operators build plans sequentially on the driver,
    * so nothing else plans during it (streaming maintainers never call
    * this helper).
    */
  // ckptPartitioned's conf toggle serialized on this lock: the flip is
  // session-global and check/set/restore is not atomic — two overlapping
  // calls would let one restore the flag before the other's plan is
  // forced (and any other thread planning during the window would
  // silently lose AQE). Callers are sequential driver-side batch ops,
  // but the lock makes the helper safe rather than assumed-safe.
  private val ckptLock = new Object

  def ckptPartitioned(df: DataFrame): DataFrame = ckptLock.synchronized {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.enabled"
    val orig = spark.conf.getOption(key)
    if (orig.exists(_.equalsIgnoreCase("false"))) df.localCheckpoint()
    else {
      spark.conf.set(key, "false")
      // restore EXACTLY what was set before (or unset): blind "true"
      // would permanently flip a user's AQE=FALSE/False spelling on.
      try df.localCheckpoint()
      finally orig match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
