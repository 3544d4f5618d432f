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
    * — graft-visible so the replay-idempotence contract is directly
    * spec-able (invoke twice with the same batchId: identical output,
    * index unchanged on the second call) and the registry's compaction
    * row (`st_compact_probe`) ingests through the REAL append path. */
  private[graft] def ingestBatch(batch: DataFrame,
      bucketize: DataFrame => DataFrame,
      probe: (DataFrame, DataFrame) => DataFrame,
      indexTable: String, outPath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // a compactIndex that died between its DROP and RENAME would
    // otherwise fail every retry with a raw table-not-found; and a
    // compaction/append from ANOTHER session leaves this session's
    // cached file listing stale (the CcStream/HbStream entry
    // discipline)
    if (CatalogSwap.needsRecovery(spark, indexTable))
      CatalogSwap.recover(spark, indexTable)
    spark.catalog.refreshTable(indexTable)
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

  // ----------------------------------------------------- FLAG mode
  // The collapse-mode skeleton shared by both modalities
  // (Dedup.minHashDedupCollapse text, Dedup.embedDedupCollapse
  // vectors): probeCollapse(index, batch) returns (per-id flags, the
  // REPS' index rows to append). Same re-ingested-id and replay
  // contracts as the pair-mode skeleton above.

  /** Deterministic batch-sequenced fold of a FLAG-mode dedup: each
    * batch's flags ride out with batch_id; only reps' rows join the
    * index for later batches. The collapse operators pin an internal
    * shared frame per call — run the fold's materialization under
    * [[graft.operators.CacheScope.materialized]] (as the registry
    * runners do via their blanket clears) or own the pins' lifetime,
    * the Pipelines bare-build contract. */
  def foldCollapse(index: DataFrame, batches: Seq[DataFrame],
      idCol: String,
      probeCollapse: (DataFrame, DataFrame) => (DataFrame, DataFrame))
      : DataFrame = {
    if (batches.isEmpty)
      // the lambda's empty-shim branch rebuilds (idCol, payload) from
      // an index-shaped frame, so hand the id column through UNRENAMED
      return probeCollapse(index.limit(0), index.limit(0).select(col("id")))
        ._1.withColumn("batch_id", lit(0L)).limit(0)
    var idx = index
    val outs = batches.zipWithIndex.map { case (b, i) =>
      val batchIds = b.select(col(idCol).as("id")).distinct()
      val (flags, repRows) = probeCollapse(
        idx.join(broadcast(batchIds), Seq("id"), "left_anti"), b)
      idx = idx.unionByName(
        repRows.join(broadcast(idx.select(col("id"))
          .join(broadcast(batchIds), Seq("id"), "left_semi").distinct()),
          Seq("id"), "left_anti"))
      flags.withColumn("batch_id", lit(i.toLong))
    }
    outs.reduce(_ unionByName _)
  }

  /** FLAG-mode micro-batch ingest — replay-idempotent exactly like
    * [[ingestBatch]]: flags overwrite their own batch_id partition, the
    * index append anti-joins ids already present, the probe reads the
    * index minus the batch's ids. The whole batch runs inside a
    * [[graft.operators.CacheScope.materialized]] scope: the collapse
    * operators pin their shared withRep frame internally, and a
    * long-running stream calling them once per micro-batch OUTSIDE a
    * scope would leak one persisted batch frame per batch — the scope
    * releases exactly what each batch pinned once both writes land. */
  private[graft] def ingestBatchCollapse(batch: DataFrame, idCol: String,
      probeCollapse: (DataFrame, DataFrame) => (DataFrame, DataFrame),
      indexTable: String, outPath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (CatalogSwap.needsRecovery(spark, indexTable))
      CatalogSwap.recover(spark, indexTable)
    spark.catalog.refreshTable(indexTable)
    val batchIds = batch.select(col(idCol).as("id")).distinct()
    val idx = spark.table(indexTable)
      .join(broadcast(batchIds), Seq("id"), "left_anti")
    var repRows0: DataFrame = null
    graft.operators.CacheScope.materialized(spark)({
      val (flags, rep) = probeCollapse(idx, batch)
      repRows0 = rep
      flags
    }) { flags =>
      val repRows = repRows0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        flags.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        val present = spark.table(indexTable).select(col("id"))
          .join(broadcast(batchIds), Seq("id"), "left_semi").distinct()
        repRows.join(broadcast(present), Seq("id"), "left_anti")
          .write.mode("append").insertInto(indexTable)
      } finally repRows.unpersist(false)
    }
  }

  /** Streaming FLAG-mode path — [[run]]'s foreachBatch skeleton around
    * [[ingestBatchCollapse]]. */
  def runCollapse(stream: DataFrame, idCol: String,
      probeCollapse: (DataFrame, DataFrame) => (DataFrame, DataFrame),
      indexTable: String, outPath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatchCollapse(batch.toDF(), idCol, probeCollapse,
          indexTable, outPath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Number of data files behind the standing index — the operable
    * fragment metric: every micro-batch append adds up to one file per
    * bucket per task, so a probe after N batches opens O(N x buckets)
    * files however small they are. */
  def indexFragments(spark: org.apache.spark.sql.SparkSession,
                     indexTable: String): Int =
    spark.table(indexTable).inputFiles.length

  /** Compact (and optionally age out) the standing index: ONE
    * distributed rewrite of the retained rows into a fresh bucketed
    * layout at `newPath`, atomically swapped under the same table name.
    * The bucket spec is read from the catalog, so the rewritten table
    * keeps the exchange-free probe contract (the `dd_incremental_bucketed`
    * PlanSpec gate) — and the pre-write `repartition` on the bucket
    * columns co-locates each bucket's rows in one task, so the result is
    * ONE file per bucket instead of one per (batch x bucket).
    *
    * `retain` is the TTL: rows failing it are dropped (e.g. an
    * id-watermark or an ingest-day horizon carried in the index schema).
    * Probes after compaction see exactly the retained population —
    * identical pairs for retained ids, no pairs against aged-out ids
    * (spec'd). Run it from the maintenance cadence, not per batch: the
    * cost is a full index rewrite, amortized over the appends it
    * defragments.
    *
    * The swap is the shared [[CatalogSwap]] discipline: `newPath` must
    * be FRESH (enforced against the catalog — overwriting the live
    * location would delete the files the lazy rewrite reads; a reused
    * NON-live path is cleared by the overwrite-mode write, so stale
    * files from an earlier generation can never silently merge into —
    * and resurrect aged-out rows in — the new table), and a crash
    * between the DROP and the RENAME is recovered on the next
    * compact/ingest entry (the data itself is never at risk — the old
    * files stay at the old path until the caller cleans them). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   indexTable: String, newPath: String,
                   retain: org.apache.spark.sql.Column = lit(true)): Unit = {
    if (CatalogSwap.needsRecovery(spark, indexTable)) {
      CatalogSwap.recover(spark, indexTable)
      return
    }
    spark.catalog.refreshTable(indexTable)
    // parse (don't wrap) the name: TableIdentifier("db.tbl") would look
    // up a table literally named "db.tbl" in the current database
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(indexTable)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$indexTable has no bucket spec — not a standing-index table"))
    CatalogSwap.swapIn(spark, indexTable, newPath) { (tmp, path) =>
      // ZERO-shuffle rewrite: with the bucketed scan forced on, the read
      // already groups every bucket's fragments into one task, and the
      // bucketed writer splits per in-task bucket — so the rewrite is
      // scan -> filter -> sort-within-task -> write, one file per
      // bucket, no exchange. (Auto-bucketed-scan would otherwise fall
      // back to size-split reads here — nothing downstream "needs" the
      // bucketing as far as the optimizer can see — and each of its
      // tasks would re-fragment every bucket it touches.)
      val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val saved = spark.conf.getOption(autoKey)
      spark.conf.set(autoKey, "false")
      try {
        val writer = spark.table(indexTable).where(retain)
          .write.mode("overwrite").format("parquet").option("path", path)
          .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
            spec.bucketColumnNames.tail: _*)
        val sorted =
          if (spec.sortColumnNames.isEmpty) writer
          else writer.sortBy(spec.sortColumnNames.head,
            spec.sortColumnNames.tail: _*)
        sorted.saveAsTable(tmp)
      } finally saved match {
        case Some(v) => spark.conf.set(autoKey, v)
        case None => spark.conf.unset(autoKey)
      }
    }
  }
}
