package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Duplicate-heavy (skewed) dedup probe — the shape SemDedup actually
  * runs on: uniform replication (ScaleUp) spreads duplicate groups
  * evenly, but a real near-dup-heavy corpus concentrates mass into few
  * groups. This fixture makes one EXACT-duplicate mega-group of `mega`
  * rows (all share one vector, so every SRP table puts them in ONE
  * bucket — the case bucketing cannot split) plus a 5x-replicated tail.
  *
  * Usage: runMain graft.tools.SkewProbe [mega=8000] [tail=25000]
  *          [steps=semantic,embed,collapse]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val mega = if (args.length > 0) args(0).toInt else 8000
    val tail = if (args.length > 1) args(1).toInt else 25000
    val steps: Set[String] =
      if (args.length > 2) args(2).split(",").toSet
      else Set("semantic", "embed")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    // mega group: ids [0, mega) all carry base vector 42's embedding;
    // tail: ids [mega, mega+tail) carry base vector (id % nBase) — 5x
    // exact replicas per tail vector at the default sizes
    val ids = spark.range(mega + tail).toDF("id")
    val megaVec = base.where(col("vec_id") === 42)
      .select(col("embedding").as("mv"))
    val skewed = ids
      .withColumn("key",
        when(col("id") < mega, lit(-1L)).otherwise(pmod(col("id"), lit(nBase))))
      .join(broadcast(base.withColumnRenamed("vec_id", "key")
        .withColumnRenamed("embedding", "tv")), Seq("key"), "left")
      .crossJoin(broadcast(megaVec))
      .select(col("id").as("vec_id"),
        when(col("key") === -1L, col("mv")).otherwise(col("tv"))
          .as("embedding"))
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"SKEWPROBE rows=${skewed.count()} mega=$mega tail=$tail")

    def time(tag: String)(f: => DataFrame): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.id == skewed.rdd.id).foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      val n = f.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SKEWPROBE $tag%-28s ${dt}%8.2f s  rows=$n")
    }

    if (steps("semantic")) time("semantic_guarded_4096") {
      Dedup.semanticDedup(skewed, "vec_id", "embedding",
        k = 8, iters = 2, threshold = 0.3, maxBlock = 4096)
    }
    if (steps("embed")) time("embed_incremental_batch") {
      val idx = Dedup.embedLshIndex(
        skewed.where(col("vec_id") >= mega), "vec_id", "embedding")
      Dedup.incrementalEmbedLsh(idx,
        skewed.where(col("vec_id") < mega), "vec_id", "embedding",
        threshold = 0.3)
    }
    // FLAG mode on the same mega-group batch: the exact-duplicate
    // collapse reduces it to ONE rep before the probe, so the output is
    // flag-rows (O(batch)), never the n^2/2 pairs the mode above owes
    if (steps("collapse")) time("embed_collapse_batch") {
      val idx = Dedup.embedLshIndex(
        skewed.where(col("vec_id") >= mega), "vec_id", "embedding")
      Dedup.embedDedupCollapse(idx,
        skewed.where(col("vec_id") < mega), "vec_id", "embedding",
        threshold = 0.3)._1
    }
    spark.stop()
  }
}
