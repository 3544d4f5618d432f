package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the two heaviest registry rows
  * (pipe_pretrain_tokenized, ds_calibration): times CUMULATIVE pipeline
  * prefixes, so successive diffs attribute wall-time to the stage each
  * prefix adds (each prefix re-runs its upstream — the diff is the
  * stage's marginal cost including any recompute it causes, which is
  * exactly the number that decides whether a cache split pays). */
object PretrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(fn: => Long): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      val t0 = System.nanoTime()
      val rows = fn
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    for (dir <- args) {
      println(s"== $dir ==")
      val lined = () => graft.RegistryCore.linedDocs(spark, dir)
      val docs = () => graft.Tables.load(spark, dir, "documents")
      // pipe_pretrain_tokenized prefixes
      timed("p0_lined_only")(lined().count())
      timed("p1_line_dedup")(graft.operators.Dedup.lineDedup(
        lined(), "doc_id", "text", minLen = 10).count())
      timed("p2_c4_gate_dedup")(graft.Pipelines.buildC4Corpus(
        lined(), minLineLen = 10, minWords = 50, minStopHits = 1).count())
      timed("p3_pretrain_knlm")(graft.Pipelines.buildPretrainCorpus(
        lined(), minLineLen = 10, minWords = 50, minStopHits = 1).count())
      timed("p4_tokenized_full")(
        graft.Pipelines.buildPretrainCorpusTokenized(lined(),
          docs().select(col("doc_id"), col("source")),
          minLineLen = 10, minWords = 50, minStopHits = 1).count())
      // BPE train alone on the full documents text (an upper bound on
      // the in-pipeline cost — the pipeline trains on the kept subset)
      timed("bpe_train_alone")(graft.operators.BpeTrainer.bpeTrain(
        docs(), "text", nMerges = 6).count())
      // ds_calibration prefixes
      timed("c1_nb_train")(graft.operators.TextAnalysis.nbTrain(
        docs().where(col("doc_id") % 5 =!= 0), "doc_id", "text", "lang")
        .count())
      timed("c2_nb_classify")(graft.SparkEntry
        .queries("ta_nb_classifier")(spark, dir).count())
      timed("c3_calibration_full")(graft.SparkEntry
        .queries("ds_calibration")(spark, dir).count())
    }
    spark.stop()
  }
}
