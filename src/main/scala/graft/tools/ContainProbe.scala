package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val toks = docs.select(col("doc_id").as("id"),
        explode(Dedup.tokens(col("text"))).as("tok")).distinct().cache()
    time("postings")(toks.count())
    val sz = toks.groupBy("id").agg(count(lit(1)).as("n"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("tok"))
    val th = 0.95
    val aToks = toks.join(docs.select(col("doc_id").as("id"))
      .where(col("id") % 10 === 0).distinct(), Seq("id"), "left_semi")
    val prefix = aToks.join(dfreq, "tok").join(sz, "id")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= col("n") - ceil(col("n") * th) + 1)
      .select(col("id"), col("tok"), col("n"), col("rn")).cache()
    time("prefix")(println("prefix rows " + prefix.count()))
    val full = toks.join(sz, "id")
      .select(col("id").as("b_id"), col("tok"), col("n").as("nb"))
    val cand = prefix.select(col("id").as("a_id"), col("tok"),
        col("n").as("na"), col("rn").as("pa"))
      .join(full, "tok")
      .where(col("a_id") =!= col("b_id") &&
        col("nb").cast("double") + lit(0.5) >= lit(th) * col("na").cast("double") &&
        (col("na") - col("pa") + lit(1)).cast("double") + lit(0.5) >=
          lit(th) * col("na").cast("double"))
      .select("a_id", "b_id").distinct().cache()
    time("candidates")(println("cand " + cand.count()))
    val tids = graft.operators.Ranking.globalRank(dfreq.select("tok"),
      Seq(col("tok").asc), "tid")
    val arr = toks.join(tids, "tok")
      .groupBy("id").agg(sort_array(collect_list(col("tid"))).as("ts")).cache()
    time("arrays")(arr.count())
    val out = cand
      .join(arr.select(col("id").as("a_id"), col("ts").as("a_ts")), "a_id")
      .join(arr.select(col("id").as("b_id"), col("ts").as("b_ts")), "b_id")
      .withColumn("o", size(array_intersect(col("a_ts"), col("b_ts"))).cast("long"))
      .withColumn("containment", col("o").cast("double") / size(col("a_ts")))
      .where(col("containment") >= th)
    time("verify")(println("out " + out.count()))
    spark.stop()
  }
}
