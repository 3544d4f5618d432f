package graft.streaming

import org.apache.spark.sql.DataFrame
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
  * Both paths instantiate [[IncrementalIngest]] — the one copy of the
  * fold / probe-then-append / replay-idempotence skeleton (see its doc
  * for the exact foreachBatch replay contract). [[ingestFold]] is the
  * deterministic batch-sequenced equivalent the oracle-checked registry
  * row (`st_embed_dedup`) uses — the stream ≡ batch discipline.
  */
object EmbedDedupStream {

  /** Deterministic batch path: fold the batches in arrival order, each
    * probing index + all earlier batches; emits (a_id, b_id, kind,
    * cosine, batch_id). Pairs never repeat across batches — probe
    * `b`-sides are disjoint. */
  def ingestFold(index: DataFrame, batches: Seq[DataFrame], idCol: String,
                 vecCol: String, threshold: Double = 0.9,
                 numPlanes: Int = 8, tables: Int = 4): DataFrame =
    IncrementalIngest.fold(index, batches,
      Dedup.embedLshIndex(_, idCol, vecCol, numPlanes, tables),
      Dedup.incrementalEmbedLshBuckets(_, _, threshold))

  /** Streaming path against a standing index table holding
    * [[Dedup.embedLshIndex]] rows (bucket it on (table, bucket) at rest
    * — [[Dedup.writeEmbedIndex]] — so the standing side probes
    * exchange-free). Replay-idempotent per [[IncrementalIngest.run]]. */
  def run(streamEmb: DataFrame, idCol: String, vecCol: String,
          indexTable: String, outPath: String, checkpoint: String,
          threshold: Double = 0.9, numPlanes: Int = 8,
          tables: Int = 4): StreamingQuery =
    IncrementalIngest.run(streamEmb,
      Dedup.embedLshIndex(_, idCol, vecCol, numPlanes, tables),
      Dedup.incrementalEmbedLshBuckets(_, _, threshold),
      indexTable, outPath, checkpoint)

  // ------------------------------------------------------- FLAG mode

  /** Deterministic batch-sequenced fold of the FLAG-mode dedup
    * ([[Dedup.embedDedupCollapse]] — the scale-safe default; see its
    * doc for why pair emission is the opt-in): each batch collapses its
    * exact duplicates, probes index + earlier batches' reps, emits
    * (id, rep_id, n_rep, keep, batch_id), and appends its REPS'
    * buckets for later batches. Same re-ingested-id contract as
    * [[ingestFold]]: the probe sees the index minus the batch's own
    * ids, the append keeps only new ids. */
  def ingestFoldCollapse(index: DataFrame, batches: Seq[DataFrame],
                         idCol: String, vecCol: String,
                         threshold: Double = 0.9, numPlanes: Int = 8,
                         tables: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    if (batches.isEmpty)
      return Dedup.embedDedupCollapse(index.limit(0), index.limit(0)
          .select(col("id").as(idCol), col("v").as(vecCol)),
        idCol, vecCol, threshold, numPlanes, tables)
        ._1.withColumn("batch_id", lit(0L)).limit(0)
    var idx = index
    val outs = batches.zipWithIndex.map { case (b, i) =>
      val batchIds = b.select(col(idCol).as("id")).distinct()
      val (flags, repBuckets) = Dedup.embedDedupCollapse(
        idx.join(broadcast(batchIds), Seq("id"), "left_anti"), b,
        idCol, vecCol, threshold, numPlanes, tables)
      idx = idx.unionByName(
        repBuckets.join(broadcast(idx.select(col("id"))
          .join(broadcast(batchIds), Seq("id"), "left_semi").distinct()),
          Seq("id"), "left_anti"))
      flags.withColumn("batch_id", lit(i.toLong))
    }
    outs.reduce(_ unionByName _)
  }

  /** FLAG-mode micro-batch ingest, replay-idempotent exactly like
    * [[IncrementalIngest.ingestBatch]]: flags overwrite their own
    * batch_id partition, the index append anti-joins ids already
    * present, and the probe reads the index minus the batch's ids. */
  private[graft] def ingestCollapseBatch(batch: DataFrame, idCol: String,
      vecCol: String, threshold: Double, numPlanes: Int, tables: Int,
      indexTable: String, outPath: String, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val batchIds = batch.select(col(idCol).as("id")).distinct()
    val idx = spark.table(indexTable)
      .join(broadcast(batchIds), Seq("id"), "left_anti")
    val (flags, repBuckets0) = Dedup.embedDedupCollapse(idx, batch,
      idCol, vecCol, threshold, numPlanes, tables)
    val repBuckets = repBuckets0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      flags.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(outPath)
      val present = spark.table(indexTable).select(col("id"))
        .join(broadcast(batchIds), Seq("id"), "left_semi").distinct()
      repBuckets.join(broadcast(present), Seq("id"), "left_anti")
        .write.mode("append").insertInto(indexTable)
    } finally repBuckets.unpersist(false)
  }

  /** Streaming FLAG-mode path — [[run]]'s foreachBatch skeleton around
    * [[ingestCollapseBatch]]. */
  def runCollapse(streamEmb: DataFrame, idCol: String, vecCol: String,
                  indexTable: String, outPath: String, checkpoint: String,
                  threshold: Double = 0.9, numPlanes: Int = 8,
                  tables: Int = 4): StreamingQuery =
    streamEmb.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          ingestCollapseBatch(b.toDF(), idCol, vecCol, threshold,
            numPlanes, tables, indexTable, outPath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
