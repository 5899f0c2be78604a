package graft

import org.apache.spark.sql.SparkSession

/** Frees EVERY cached artifact in the session, at both layers:
  *
  *  - `catalog.clearCache()` drops SQL-level caches (`Dataset.persist` goes
  *    through the CacheManager);
  *  - the `getPersistentRDDs` sweep drops RDD-LEVEL persists, which the
  *    catalog never sees — e.g. the final label-propagation round that backs
  *    a [[graft.operators.Dedup.dupClusters]] result. Round 3's bench showed
  *    why this layer matters: checkpoint-style RDD blocks leaked across
  *    queries and slowly degraded everything downstream (t10 0.67s→4.13s)
  *    while `clearCache()` reported nothing left to clear.
  *
  * Call between logically-independent queries in a long-lived session
  * (Bench and Verify do, after each query's clock stops). Callers must not
  * hold live references into swept results — re-run the query instead.
  */
object SessionSweep {
  def sweep(spark: SparkSession, blocking: Boolean = false): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking))
  }

  /** (number of persisted RDDs, total storage bytes mem+disk) right now —
    * the bench's leak telemetry: a query that leaves either nonzero has
    * retained state its own plan no longer needs.
    */
  def storageFootprint(spark: SparkSession): (Int, Long) = {
    val infos = spark.sparkContext.getRDDStorageInfo
    (spark.sparkContext.getPersistentRDDs.size,
      infos.map(i => i.memSize + i.diskSize).sum)
  }
}
