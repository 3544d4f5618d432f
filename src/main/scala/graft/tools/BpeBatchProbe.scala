package graft.tools
import org.apache.spark.sql.SparkSession

/** A/B the batched BPE training rounds against the one-merge-per-round
  * loop: same merge table (asserted), wall time and driver round-trips
  * reported per sf dir. */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nMerges = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(64)
    for (dir <- args.filterNot(_.forall(_.isDigit))) {
      val docs = graft.Tables.load(spark, dir, "documents")
      var tables = Map.empty[Int, Seq[String]]
      // two passes: the first warms JIT/codegen, the second measures
      for (pass <- Seq("warm", "steady"); mb <- Seq(1, 64)) {
        val t0 = System.nanoTime()
        val (table, rounds) = graft.operators.BpeTrainer
          .bpeTrainRounds(docs, "text", nMerges, maxBatch = mb)
        val rows = table.collect().map(_.toString).toSeq
        println(f"$dir $pass maxBatch=$mb: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s" +
          f", $rounds rounds, ${rows.length} merges")
        tables += mb -> rows
      }
      require(tables(1) == tables(64),
        s"batched table diverged from sequential in $dir")
      println(s"$dir: batched == sequential (${tables(1).length} merges)")
    }
    spark.stop()
  }
}
