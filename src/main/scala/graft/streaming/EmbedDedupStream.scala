package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming embedding near-dup detection against a STANDING SRP-bucket
  * index — [[DedupStream]] for vectors: embedding batches arrive, each
  * probes the persisted index for near-dups of everything already
  * ingested (exact-cosine verified), probes itself for within-batch
  * dups, and appends its own bucket rows so LATER batches dedup against
  * it. The index is the only state — no watermarked stream state grows
  * with history, and the per-batch cost is O(batch + matching buckets)
  * (the [[Dedup.incrementalEmbedLsh]] contract).
  *
  * [[run]] is the streaming path (`foreachBatch`); [[ingestFold]] is its
  * deterministic batch-sequenced equivalent used by the oracle-checked
  * registry row (`st_embed_dedup`) — the `st_ohlc` / `st_dedup_index`
  * stream ≡ batch discipline.
  */
object EmbedDedupStream {

  /** Deterministic batch path: fold the batches in arrival order, each
    * probing index + all earlier batches; emits (a_id, b_id, kind,
    * cosine, batch_id). Pairs never repeat across batches — probe
    * `b`-sides are disjoint. */
  def ingestFold(index: DataFrame, batches: Seq[DataFrame], idCol: String,
                 vecCol: String, threshold: Double = 0.9,
                 numPlanes: Int = 8, tables: Int = 4): DataFrame = {
    var idx = index
    val outs = batches.zipWithIndex.map { case (b, i) =>
      val out = Dedup.incrementalEmbedLsh(idx, b, idCol, vecCol,
          threshold, numPlanes, tables)
        .withColumn("batch_id", lit(i.toLong))
      idx = idx.unionByName(
        Dedup.embedLshIndex(b, idCol, vecCol, numPlanes, tables))
      out
    }
    outs.reduce(_ unionByName _)
  }

  /** Streaming path: `foreachBatch` probe-then-append against a standing
    * index table holding [[Dedup.embedLshIndex]] rows (bucket it on
    * `bucket` at rest so the standing side probes exchange-free — the
    * `dd_incremental_bucketed` layout). Exactly-once per micro-batch
    * through the checkpoint; callers pass a stable `checkpoint` dir. */
  def run(streamEmb: DataFrame, idCol: String, vecCol: String,
          indexTable: String, outPath: String, checkpoint: String,
          threshold: Double = 0.9, numPlanes: Int = 8,
          tables: Int = 4): StreamingQuery =
    streamEmb.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        Dedup.incrementalEmbedLsh(spark.table(indexTable), batch,
            idCol, vecCol, threshold, numPlanes, tables)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        Dedup.embedLshIndex(batch, idCol, vecCol, numPlanes, tables)
          .write.mode("append").insertInto(indexTable)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
