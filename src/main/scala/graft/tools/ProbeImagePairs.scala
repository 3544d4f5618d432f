package graft.tools

import org.apache.spark.sql.SparkSession

import graft.RegistryCore
import graft.operators.Multimodal

/** Scale-probe companion for `pipe_image_dedup`: prints the candidate
  * near-dup PAIR count the dHash blocking emits at a given data dir.
  *
  * Why this exists: the ScaleUp replica harness grows duplicate-group
  * density with the replica factor, so the pipeline's pair stage can grow
  * faster than the row count — a property of the PROBE INPUT, not of the
  * plan. Reading the measured wall-clock factor against the measured pair
  * factor separates "plan compounds super-linearly" (a bug) from "the
  * probe feeds quadratically more pairs" (expected; SCALE.md).
  *
  * Usage: runMain graft.tools.ProbeImagePairs <dataDir>
  */
object ProbeImagePairs {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val payloads = RegistryCore.imageCorpus(spark, dir)
    val nDocs = payloads.count()
    val t0 = System.nanoTime()
    val nPairs = Multimodal
      .imageDHashPairs(payloads, "doc_id", "payload", maxHamming = 4)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"dir":"$dir","docs":$nDocs,"pairs":$nPairs,"pair_stage_sec":$secs%.2f}""")
    spark.stop()
  }
}
