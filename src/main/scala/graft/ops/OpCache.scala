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
}
