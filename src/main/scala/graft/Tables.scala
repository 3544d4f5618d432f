package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated synthetic tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Reads a table, normalizing timestamp physical types so downstream
    * date/epoch functions just work regardless of how the driver's writer
    * encoded them:
    *  - TIMESTAMP(NANOS) (read as a nanos long under
    *    spark.sql.legacy.parquet.nanosAsLong) -> microsecond TimestampType;
    *  - TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) -> TimestampType.
    *    Every graft session pins spark.sql.session.timeZone=UTC, so the
    *    cast is value-preserving and matches the oracle's naive reading of
    *    the same file. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df = raw.schema.fields.foldLeft(raw) { (acc, f) =>
      if (f.dataType == TimestampNTZType)
        acc.withColumn(f.name, col(f.name).cast(TimestampType))
      else acc
    }
    if (name == "events" && df.schema("ts").dataType == LongType)
      // `div` is exact integral division; a plain `/` would promote to
      // double, whose 256 ns ulp at 2024-epoch nanos misrounds ~12% of
      // microsecond values (invisible at second granularity, fatal for
      // any query that surfaces epoch micros).
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
