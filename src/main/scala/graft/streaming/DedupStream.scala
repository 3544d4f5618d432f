package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming near-dup detection against a STANDING MinHash index — the
  * production shape for continuous corpus ingest: documents arrive as
  * micro-batches; each batch (a) probes the persisted LSH index for
  * near-dups of everything already ingested, (b) probes itself for
  * within-batch dups, and (c) appends its own signatures to the index so
  * LATER batches dedup against it. The index table is the only state —
  * there is no unbounded in-memory stream state to watermark, because
  * near-dup detection against all history is exactly what the persisted
  * index is FOR (per-batch cost is O(batch + matching buckets), the
  * [[Dedup.incrementalMinHash]] contract; the bucketed layout makes the
  * standing side exchange-free, the `dd_incremental_bucketed` PlanSpec
  * gate).
  *
  * Both paths instantiate [[IncrementalIngest]] — the one copy of the
  * fold / probe-then-append / replay-idempotence skeleton (see its doc
  * for the exact foreachBatch replay contract). [[ingestFold]] is the
  * deterministic batch-sequenced equivalent used by the oracle-checked
  * registry row (`st_dedup_index`) and the MemoryStream parity spec —
  * the same pattern `st_ohlc` used to pin stream ≡ batch.
  */
object DedupStream {

  /** Deterministic batch path: fold the batches in arrival order, each
    * probing index + all earlier batches; emits (a_id, b_id, kind,
    * sig_sim, batch_id). A pair never repeats across batches — probe
    * `b`-sides are disjoint. */
  def ingestFold(index: DataFrame, batches: Seq[DataFrame], idCol: String,
                 textCol: String, shingleN: Int = 3, bands: Int = 8,
                 rowsPerBand: Int = 2,
                 simThreshold: Double = 0.5): DataFrame =
    IncrementalIngest.fold(index, batches,
      Dedup.minHashIndex(_, idCol, textCol, shingleN, bands, rowsPerBand),
      Dedup.incrementalMinHashBuckets(_, _, bands * rowsPerBand,
        simThreshold))

  /** Streaming path against the standing index TABLE (created by
    * [[Dedup.writeMinHashIndex]] so the standing side probes
    * exchange-free). Replay-idempotent per [[IncrementalIngest.run]]. */
  def run(streamDocs: DataFrame, idCol: String, textCol: String,
          indexTable: String, outPath: String, checkpoint: String,
          shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
          simThreshold: Double = 0.5): StreamingQuery =
    IncrementalIngest.run(streamDocs,
      Dedup.minHashIndex(_, idCol, textCol, shingleN, bands, rowsPerBand),
      Dedup.incrementalMinHashBuckets(_, _, bands * rowsPerBand,
        simThreshold),
      indexTable, outPath, checkpoint)

  // ------------------------------------------------------- FLAG mode

  /** FLAG-mode fold ([[Dedup.minHashDedupCollapse]] — exact-duplicate
    * texts collapse to a rep before the probe; keep flags + rep
    * multiplicity instead of pair emission) —
    * [[IncrementalIngest.foldCollapse]], the one copy of the flag-mode
    * skeleton both modalities share. */
  def ingestFoldCollapse(index: DataFrame, batches: Seq[DataFrame],
                         idCol: String, textCol: String,
                         shingleN: Int = 3, bands: Int = 8,
                         rowsPerBand: Int = 2,
                         simThreshold: Double = 0.5): DataFrame =
    IncrementalIngest.foldCollapse(index, batches, idCol,
      textCollapse(idCol, textCol, shingleN, bands, rowsPerBand,
        simThreshold))

  /** Streaming FLAG-mode path — replay-idempotent per
    * [[IncrementalIngest.ingestBatchCollapse]]. */
  def runCollapse(streamDocs: DataFrame, idCol: String, textCol: String,
                  indexTable: String, outPath: String, checkpoint: String,
                  shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
                  simThreshold: Double = 0.5): StreamingQuery =
    IncrementalIngest.runCollapse(streamDocs, idCol,
      textCollapse(idCol, textCol, shingleN, bands, rowsPerBand,
        simThreshold),
      indexTable, outPath, checkpoint)

  private def textCollapse(idCol: String, textCol: String, shingleN: Int,
      bands: Int, rowsPerBand: Int, simThreshold: Double)
      : (DataFrame, DataFrame) => (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, lit}
    (idx, batch) =>
      Dedup.minHashDedupCollapse(idx,
        // the empty-fold path hands an index-shaped frame through;
        // real batches carry (idCol, textCol) already
        if (batch.columns.contains(textCol)) batch
        else batch.select(col("id").as(idCol)).limit(0)
          .withColumn(textCol, lit("")),
        idCol, textCol, shingleN, bands, rowsPerBand, simThreshold)
  }
}
