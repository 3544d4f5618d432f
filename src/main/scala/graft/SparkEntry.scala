package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.er.EntityResolution
import graft.functions.GeoFunctions
import graft.functions.TextFunctions
import graft.functions.UrlFunctions
import graft.operators._
import graft.sources.Sources
import graft.staging.CityAssignment

/** Driver contract: the full operator inventory of SURVEY.md §2, each
  * re-expressed Spark-first over the driver's synthetic tables, with a
  * DuckDB-equivalent oracle where SQL can express the semantics.
  *
  * Engine-parity discipline (so results hash-match the DuckDB oracle):
  *  - every double output is `round(x, n)`;
  *  - derived randomness comes from md5 (identical in both engines), never
  *    from engine-specific hash functions;
  *  - bit math is div/mod arithmetic (no shift-by-column);
  *  - no doubles cast to strings, no raw timestamps in outputs.
  */
object SparkEntry {
  import RegistryCore.{Q, t}

  /** Pre-builds the on-disk corpus fixtures for a sf dir (the
    * mm_video_frames MJPEG-in-MP4 corpus and the standing kNN state) so
    * a timed run measures the operators, not one-time corpus/state
    * synthesis — called from Bench's untimed warmup; Verify builds them
    * lazily on first use. */
  def warmFixtures(s: SparkSession, dir: String): Unit = {
    RegistryCore.videoFixture(s, dir).count()
    val (g, idx) = RegistryCore.knnStanding(s, dir)
    g.count(); idx.count()
  }

  private def registry: Seq[Q] =
    ScanRegistry.rows ++ FilterRegistry.rows ++ JoinRegistry.rows ++
      AggRegistry.rows ++ SortSetRegistry.rows ++ FunctionRegistry.rows ++
      GraphRegistry.rows ++ PipelineRegistryA.rows ++ PipelineRegistryB.rows ++
      ExtraRegistry.rows ++ TailRegistryA.rows ++ TailRegistryB.rows ++
      RetrievalRegistry.rows

  // ------------------------------------------------------------ contract

  /** Flagship query on sf=0.001: region revenue rollup through the full
    * join chain (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    t(spark, dir, "region")
      .join(t(spark, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
      .join(t(spark, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
  }

  /** The raw registry name list BEFORE the map dedup — `queries` keeps
    * the last entry per name, so a duplicate silently shadows an older
    * row (it happened: a second gr_kcore unregistered the first);
    * RegistrySchemaSpec gates uniqueness through this. */
  def registryNames: Seq[String] = registry.map(_.name)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
