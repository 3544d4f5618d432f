package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Replicate a testdata directory K-fold for scale probes.
  *
  * Each replica adds `rep * stride` to every BIGINT column named like a
  * key (`*key`, `*_id`), so joins stay referentially intact WITHIN a
  * replica and keys never collide ACROSS replicas; the tiny fixed dims
  * (`nation`, `region`) and non-key attributes are carried unchanged.
  * Replica 0 is the original data byte-for-byte, so every sf0.1 result is
  * a subset of the scaled run's input.
  *
  * This is a probe harness, not a benchmark-official generator: value
  * distributions (names, texts, embeddings) repeat K times, which scales
  * duplicate-group density rather than vocabulary — the conservative
  * direction for dedup/LSH operators (bucket skew grows, never shrinks).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor=10]
  */
object ScaleUp {
  /** BIGINT columns that participate in joins/identity. */
  private def isKeyCol(name: String): Boolean =
    name.endsWith("key") || name.endsWith("_id")

  def scaleTable(df: DataFrame, factor: Int, stride: Long): DataFrame = {
    val reps = df.sparkSession.range(factor).toDF("rep")
    val scaled = df.crossJoin(broadcast(reps))
    val cols = df.schema.fields.map { f =>
      if (f.dataType == LongType && isKeyCol(f.name))
        (col(f.name) + col("rep") * stride).as(f.name)
      else col(f.name)
    }
    scaled.select(cols.toSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val stride = 10_000_000L // above any key range at the scales probed
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // keep events.ts as raw nanos longs: written as-is, Tables.load
      // does the nanos→micros conversion at read time like for the source
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fixedDims = Set("region", "nation")
    graft.Tables.names.foreach { t =>
      val in = spark.read.parquet(s"$src/$t.parquet")
      val out = if (fixedDims(t)) in else scaleTable(in, factor, stride)
      // a handful of files per table so scans parallelize (row-group
      // granularity bounds scan parallelism — SCALE.md)
      out.repartition(8).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      System.err.println(s"[scaleup] $t: ${in.count()} -> ${out.count()} rows")
    }
    spark.stop()
  }
}
