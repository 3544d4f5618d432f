package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off stage profile of Dedup.prefixJaccardPairs at a given sf dir
  * (tools/, not shipped surface): counts each intermediate to localize
  * where the wall time goes. */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val threshold = 0.95
    val toks = docs.select(col("doc_id").as("id"),
      explode(graft.operators.Dedup.tokens(col("text"))).as("tok")).distinct()
    toks.cache()
    timed("toks distinct")(println("  toks=" + toks.count()))
    val sz = toks.groupBy("id").agg(count(lit(1)).as("n"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    timed("dfreq")(println("  vocab=" + dfreq.count()))
    val w = Window.partitionBy("id").orderBy(col("df"), col("tok"))
    val prefix = toks.join(dfreq, "tok").join(sz, "id")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= col("n") - ceil(col("n") * threshold) + 1)
      .select(col("id"), col("tok"), col("n"), col("rn"))
    prefix.cache()
    timed("prefix")(println("  prefix=" + prefix.count()))
    val cand = prefix.select(col("id").as("a_id"), col("tok"),
        col("n").as("na"), col("rn").as("pa"))
      .join(prefix.select(col("id").as("b_id"), col("tok"),
        col("n").as("nb"), col("rn").as("pb")), "tok")
      .where(col("a_id") < col("b_id") &&
        least(col("na"), col("nb")).cast("double") >=
          lit(threshold) * greatest(col("na"), col("nb")).cast("double") &&
        (least(col("na") - col("pa"), col("nb") - col("pb")) + lit(1))
          .cast("double") + lit(0.5) >=
          lit(threshold / (1 + threshold)) *
            (col("na") + col("nb")).cast("double"))
      .select("a_id", "b_id")
    timed("cand raw")(println("  cand_raw=" + cand.count()))
    val candD = cand.distinct()
    candD.cache()
    timed("cand distinct")(println("  cand=" + candD.count()))
    val tids = graft.operators.Ranking.globalRank(
      dfreq.select("tok"), Seq(col("tok").asc), "tid")
    val arr = toks.join(tids, "tok")
      .groupBy("id").agg(sort_array(collect_list(col("tid"))).as("ts"))
    val out = candD
      .join(arr.select(col("id").as("a_id"), col("ts").as("a_ts")), "a_id")
      .join(arr.select(col("id").as("b_id"), col("ts").as("b_ts")), "b_id")
      .withColumn("o",
        size(array_intersect(col("a_ts"), col("b_ts"))).cast("long"))
      .withColumn("jaccard", col("o").cast("double") /
        (size(col("a_ts")) + size(col("b_ts")) - col("o")))
      .where(col("jaccard") >= threshold)
    timed("verify")(println("  out=" + out.count()))
    val arrC = arr.cache()
    timed("arr build")(println("  arr=" + arrC.count()))
    val joined = candD
      .join(arrC.select(col("id").as("a_id"), col("ts").as("a_ts")), "a_id")
      .join(arrC.select(col("id").as("b_id"), col("ts").as("b_ts")), "b_id")
    timed("join only")(println("  joined=" + joined.count()))
    val out2 = joined
      .withColumn("o",
        size(array_intersect(col("a_ts"), col("b_ts"))).cast("long"))
      .where(col("o") > 25)
    timed("join+intersect")(println("  out2=" + out2.count()))
    joined.explain("formatted")
    spark.stop()
  }
}
