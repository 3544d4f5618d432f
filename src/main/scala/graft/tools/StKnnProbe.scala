package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

object StKnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val emb = graft.Tables.load(spark, dir, "embeddings").select(col("vec_id"),
      expr("""transform(sequence(0, 63), i -> CAST(
        (CASE WHEN i = vec_id % 8 THEN 8.0 ELSE 0.0 END)
        + ((vec_id * 131 + i * 31) % 29 - 14) / 16.0
        + ((vec_id * 17 + i * 13) % 23 - 11) / 32.0 AS FLOAT))""")
        .as("embedding"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STKNN $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val corpus = emb.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val g = t("standing_descent") {
      val x = Similarity.knnDescent(corpus, "vec_id", "embedding", k = 5, rounds = 2).persist()
      x.count(); x
    }
    val idx = t("standing_index") {
      val x = Similarity.srpBucketed(corpus, "vec_id", "embedding", 8, 4).persist()
      x.count(); x
    }
    val b1 = emb.where(pmod(col("vec_id"), lit(10)) === 0)
    val b2 = emb.where(pmod(col("vec_id"), lit(10)) === 5)
    val d1 = t("step1") {
      val x = Similarity.knnDescentIncremental(g, idx, b1, "vec_id", "embedding", 5, 1).persist()
      x.count(); x
    }
    val g1 = t("fold1") {
      val x = g.join(d1.select(col("id")).distinct(), Seq("id"), "left_anti")
        .unionByName(d1.select("id", "nbr_id", "cosine", "rank")).persist()
      x.count(); x
    }
    val idx1 = t("foldidx1") {
      val x = idx.unionByName(Similarity.srpBucketed(b1, "vec_id", "embedding", 8, 4)).persist()
      x.count(); x
    }
    t("step2") {
      Similarity.knnDescentIncremental(g1, idx1, b2, "vec_id", "embedding", 5, 1).count()
    }
    spark.stop()
  }
}
