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
    val th = 0.9
    val sh = docs.select(col("doc_id").as("id"),
        explode(Dedup.shingles(col("text"), 3)).as("s")).cache()
    time("postings")(sh.count())
    val sz = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("s"))
    val prefix = sh.join(dfreq, "s").join(sz, "id")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= col("n") - ceil(col("n") * th) + 1)
      .select(col("id"), col("s"), col("n"), col("rn")).cache()
    time("prefix")(println("prefix rows " + prefix.count()))
    val full = sh.join(sz, "id")
      .select(col("id").as("b_id"), col("s"), col("n").as("nb"))
    val cand = prefix.select(col("id").as("a_id"), col("s"),
        col("n").as("na"), col("rn").as("pa"))
      .join(full, "s")
      .where(col("a_id") =!= col("b_id") &&
        col("nb").cast("double") + lit(0.5) >= lit(th) * col("na").cast("double") &&
        (col("na") - col("pa") + lit(1)).cast("double") + lit(0.5) >=
          lit(th) * col("na").cast("double"))
      .select("a_id", "b_id").distinct().cache()
    time("candidates")(println("cand " + cand.count()))
    val arr = sh.select(col("id"), Dedup.md5Hash60(col("s")).as("h"))
      .groupBy("id").agg(sort_array(collect_list(col("h"))).as("ts")).cache()
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
