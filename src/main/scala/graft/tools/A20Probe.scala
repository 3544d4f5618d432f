package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object A20Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(persist: Boolean): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      val t0 = System.nanoTime()
      val li = graft.Tables.load(spark, dir, "lineitem")
      val med = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
      val dev0 = li.select("l_returnflag", "l_extendedprice")
        .join(med, "l_returnflag")
        .select(col("l_returnflag"), col("med"),
          abs(col("l_extendedprice") - col("med")).as("adev"))
      val dev = if (persist) dev0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else dev0
      val mad = dev.groupBy("l_returnflag")
        .agg(first("med").as("med"), expr("percentile(adev, 0.5)").as("mad"))
      dev.join(mad.select(col("l_returnflag"), col("mad")), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(first("med").as("m_"), first("mad").as("d_"),
          count(when(col("adev") > lit(5.0) * lit(1.4826) * col("mad"),
            lit(1))).as("n_outliers"))
        .select(col("l_returnflag"), round(col("m_"), 4).as("med"),
          round(col("d_"), 4).as("mad"), col("n_outliers"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(true) // warmup
    for (p <- Seq(false, true, false, true))
      println(f"A20 persist=$p ${run(p)}%.2fs")
    spark.stop()
  }
}
