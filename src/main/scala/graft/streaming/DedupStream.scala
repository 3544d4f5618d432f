package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
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
  * [[run]] is the streaming path (`foreachBatch`); [[ingestFold]] is its
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
                 simThreshold: Double = 0.5): DataFrame = {
    var idx = index
    val outs = batches.zipWithIndex.map { case (b, i) =>
      val out = Dedup.incrementalMinHash(idx, b, idCol, textCol,
          shingleN, bands, rowsPerBand, simThreshold)
        .withColumn("batch_id", lit(i.toLong))
      idx = idx.unionByName(Dedup.minHashIndex(b, idCol, textCol,
        shingleN, bands, rowsPerBand))
      out
    }
    outs.reduce(_ unionByName _)
  }

  /** Streaming path: `foreachBatch` probe-then-append against the
    * standing index TABLE (created by [[Dedup.writeMinHashIndex]]).
    * Results append to `outPath` parquet with the micro-batch id;
    * signatures append to the bucketed index table (insertInto keeps
    * the bucket layout, so the standing side stays exchange-free for
    * every subsequent probe). Exactly-once: both writes are idempotent
    * per micro-batch only through the checkpoint — callers must pass a
    * stable `checkpoint` dir, the standard foreachBatch contract. */
  def run(streamDocs: DataFrame, idCol: String, textCol: String,
          indexTable: String, outPath: String, checkpoint: String,
          shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
          simThreshold: Double = 0.5): StreamingQuery =
    streamDocs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Dedup.incrementalMinHash(spark.table(indexTable), batch,
            idCol, textCol, shingleN, bands, rowsPerBand, simThreshold)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        Dedup.minHashIndex(batch, idCol, textCol, shingleN, bands,
            rowsPerBand)
          .write.mode("append").insertInto(indexTable)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
