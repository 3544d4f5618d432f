package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated synthetic tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Reads a table; normalizes the events.ts TIMESTAMP(NANOS) column (read
    * as a nanos long under spark.sql.legacy.parquet.nanosAsLong) back to a
    * microsecond TimestampType so downstream date functions just work. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // `div` is exact integral division; a plain `/` would promote to
      // double, whose 256 ns ulp at 2024-epoch nanos misrounds ~12% of
      // microsecond values (invisible at second granularity, fatal for
      // any query that surfaces epoch micros).
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
