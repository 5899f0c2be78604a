package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Guarded persist for operator-internal intermediates.
  *
  * `Dataset.storageLevel` resolves through the shared CacheManager by
  * LOGICAL PLAN, so when two calls build the same intermediate (common in
  * specs and repeated dedup passes within one session) the second call sees
  * the first call's cache entry. Persisting again would be a no-op plus a
  * `WARN CacheManager: asked to cache already cached data` per call — this
  * helper skips the redundant request instead. Release stays the library's
  * documented convention: [[graft.SessionSweep.sweep]] between corpora
  * (operators that CAN unpersist eagerly, like `dupClusters`, still do).
  */
private[graft] object Caching {
  def persisted(df: DataFrame,
                level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) df.persist(level)
    df
  }
}
