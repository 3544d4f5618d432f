package graft.tools
import org.apache.spark.sql.SparkSession
object AudioFpCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val n = graft.SparkEntry.queries("dd_audio_fingerprint")(spark, dir).count()
    println(s"AUDIOFP pairs=$n")
    spark.stop()
  }
}
