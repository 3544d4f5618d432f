package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bookkeeping for operator-pinned cache blocks.
  *
  * Several operators here persist multi-consumer intermediates
  * (MEMORY_AND_DISK) and deliberately do NOT unpersist them before
  * returning — the returned DataFrame is lazy, so the blocks must survive
  * until the CALLER materializes it. The engine's own runners (Bench /
  * Verify) blanket-clear between queries; a library caller embedding these
  * operators in a long-lived session would otherwise accumulate cached
  * blocks for the life of the session (the LRU bounds memory, not
  * bookkeeping). This scope is that caller's cleanup contract.
  */
object CacheScope {

  /** Builds a frame, hands it to `materialize` (write / collect / count),
    * and then unpersists EXACTLY the blocks `build` pinned — a snapshot
    * diff of the persistent-RDD registry, so caches the caller owns from
    * before the scope are untouched. Blocking=false: frees asynchronously,
    * like the operators' own internal unpersists.
    *
    * {{{
    * val pairs = CacheScope.materialized(spark)(
    *   Dedup.prefixJaccardPairs(docs, "doc_id", "text"))(
    *   _.write.parquet(out))
    * }}}
    */
  def materialized[T](spark: SparkSession)(build: => DataFrame)(
      materialize: DataFrame => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = build
    try materialize(df)
    finally sc.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }
}
