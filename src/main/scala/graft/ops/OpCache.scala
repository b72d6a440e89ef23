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
  def ckptPartitioned(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.enabled"
    if (spark.conf.get(key, "true") == "false") df.localCheckpoint()
    else {
      spark.conf.set(key, "false")
      try df.localCheckpoint()
      finally spark.conf.set(key, "true")
    }
  }
}
