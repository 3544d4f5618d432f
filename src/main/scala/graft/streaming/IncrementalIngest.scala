package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The ONE copy of the probe-then-append ingest skeleton both standing-
  * index dedup streams ([[DedupStream]] minhash text, [[EmbedDedupStream]]
  * SRP embeddings) instantiate — parameterized by how a batch bucketizes
  * and how (standing buckets, batch buckets) probe into pairs, so the
  * fold/replay/idempotence logic cannot drift between modalities.
  *
  * Replay semantics of [[run]] (the honest foreachBatch contract): a
  * micro-batch whose writes completed but whose checkpoint commit did
  * not is REPLAYED by Structured Streaming. Both writes are idempotent
  * under that replay:
  *  - pair output is partitioned by `batch_id` with dynamic partition
  *    overwrite — the replay rewrites its own partition, never appends
  *    a duplicate;
  *  - the index append anti-joins on ids already present, so the
  *    replayed batch's bucket rows are not inserted twice — and the
  *    probe reads the index MINUS the batch's own ids, so a replay (or
  *    a re-ingested id) never pairs a row against its own earlier copy.
  */
object IncrementalIngest {

  /** Deterministic batch-sequenced fold: bucketize each batch ONCE, probe
    * it against the index-so-far, emit (pairs..., batch_id), append the
    * buckets for later batches. An empty `batches` yields an empty pair
    * frame (probed from an empty index slice), not a crash.
    *
    * Re-ingested-id contract (IDENTICAL to [[run]], so stream ≡ batch
    * holds even when a batch repeats an already-indexed id): an id is
    * immutable once ingested — the probe sees the index MINUS the
    * batch's own ids (a row never pairs against its own earlier copy)
    * and the append keeps only ids not already present. */
  def fold(index: DataFrame, batches: Seq[DataFrame],
           bucketize: DataFrame => DataFrame,
           probe: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    if (batches.isEmpty)
      return probe(index.limit(0), index.limit(0))
        .withColumn("batch_id", lit(0L)).limit(0)
    var idx = index
    val outs = batches.zipWithIndex.map { case (b, i) =>
      val buckets = bucketize(b)
      val batchIds = buckets.select(col("id")).distinct()
      val out = probe(idx.join(broadcast(batchIds), Seq("id"), "left_anti"),
          buckets)
        .withColumn("batch_id", lit(i.toLong))
      idx = idx.unionByName(
        buckets.join(broadcast(idx.select(col("id"))
          .join(broadcast(batchIds), Seq("id"), "left_semi").distinct()),
          Seq("id"), "left_anti"))
      out
    }
    outs.reduce(_ unionByName _)
  }

  /** One micro-batch's probe-then-append, exactly as [[run]] executes it
    * — package-visible so the replay-idempotence contract is directly
    * spec-able (invoke twice with the same batchId: identical output,
    * index unchanged on the second call). */
  private[streaming] def ingestBatch(batch: DataFrame,
      bucketize: DataFrame => DataFrame,
      probe: (DataFrame, DataFrame) => DataFrame,
      indexTable: String, outPath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val buckets = bucketize(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // every replay-safety join keeps the STANDING index on the streamed
      // (map-side) side of a broadcast — the batch id set is the small
      // side, so the index is never shuffled however large it grows
      val batchIds = buckets.select(col("id")).distinct()
      // replay-safe probe: the standing index minus this batch's ids
      val idx = spark.table(indexTable)
        .join(broadcast(batchIds), Seq("id"), "left_anti")
      // output layout contract: partitioned by batch_id with DYNAMIC
      // overwrite scoped to THIS writer (a session-level conf flip would
      // change overwrite semantics for every other writer in the app);
      // readers get batch_id back as the partition column (integer-
      // inferred). Not layout-compatible with a flat append-mode
      // outPath from the pre-idempotence version — use a fresh path.
      probe(idx, buckets)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(outPath)
      // replay-safe append: only ids not already in the index. The
      // already-present set comes from a broadcast semi-join over an
      // id-only COLUMNAR scan of the index (cheap next to the probe's
      // full-row pass) so the anti-join's build side stays tiny too —
      // the accepted cost of idempotence, one extra single-column scan
      // per micro-batch.
      val present = spark.table(indexTable).select(col("id"))
        .join(broadcast(batchIds), Seq("id"), "left_semi").distinct()
      buckets.join(broadcast(present), Seq("id"), "left_anti")
        .write.mode("append").insertInto(indexTable)
    } finally buckets.unpersist(false)
  }

  /** Streaming path: `foreachBatch` probe-then-append against a standing
    * bucketed index TABLE (see the class doc for the replay-idempotence
    * contract). */
  def run(stream: DataFrame, bucketize: DataFrame => DataFrame,
          probe: (DataFrame, DataFrame) => DataFrame,
          indexTable: String, outPath: String,
          checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), bucketize, probe, indexTable, outPath,
          batchId)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
