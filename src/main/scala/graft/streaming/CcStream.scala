package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.ConnectedComponents

/** Streaming connected-components maintenance against standing state —
  * the [[IncrementalIngest]] discipline applied to graph clustering,
  * where the standing state is the two-level union-find-at-rest layout
  * of [[ConnectedComponents.incrementalMerge]]:
  *
  *  - a `base(node, component)` table: APPEND-ONLY (each node keeps its
  *    first label; the corpus-sized table is never rewritten — the
  *    property that makes per-batch cost batch-proportional);
  *  - an `alias(c, canon)` table: the FLAT merge map, model-small
  *    (bounded by the number of component merges ever performed), so
  *    rewriting it per batch is a metadata-scale write.
  *
  * Each micro-batch: endpoints probe the standing labels (broadcast
  * batch-node set — bucket-pruned point lookups at rest), a BATCH-sized
  * label graph solves the merges, the new nodes append, the alias
  * rewrites. Readers resolve `coalesce(alias[base[v]], base[v])` — one
  * broadcast join ([[ConnectedComponents.resolveLabels]]).
  *
  * The deterministic batch-sequenced equivalent is
  * [[ConnectedComponents.incrementalFold]] — the stream ≡ fold parity
  * every st_* family spec pins, and the registry row
  * (`gr_cc_incremental`) checks the fold against the full-closure
  * oracle (fold == from-scratch rebuild). */
object CcStream {

  /** One micro-batch's merge-then-write, graft-visible so the replay
    * contract is directly spec-able: replaying a batch is a NO-OP by
    * construction — its endpoints already share components, so the
    * merge graph has no non-identity rows (alias unchanged) and the
    * base append anti-joins nodes already present. */
  private[graft] def ingestBatch(batch: DataFrame, srcCol: String,
      dstCol: String, baseTable: String, aliasTable: String): Unit = {
    val spark = batch.sparkSession
    val b = batch.persist(org.apache.spark.storage.StorageLevel
      .MEMORY_AND_DISK)
    try {
      val (inserts, newAlias) = ConnectedComponents.incrementalMergeParts(
        spark.table(baseTable), spark.table(aliasTable), b,
        srcCol, dstCol)
      // base append (replay-safe: only previously-unseen nodes insert)
      inserts.write.mode("append").insertInto(baseTable)
      // alias rewrite: model-small, and the overwrite target is also a
      // source — localCheckpoint (eager) truncates lineage so
      // read-then-overwrite is legal (the KnnGraphStream precedent)
      newAlias.localCheckpoint(true)
        .write.mode("overwrite").insertInto(aliasTable)
    } finally b.unpersist(false)
  }

  /** Streaming path: `foreachBatch` merge-then-write against standing
    * base + alias TABLES (see [[ingestBatch]] for the replay
    * contract). */
  def run(stream: DataFrame, srcCol: String, dstCol: String,
          baseTable: String, aliasTable: String,
          checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        ingestBatch(batch.toDF(), srcCol, dstCol, baseTable, aliasTable)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
