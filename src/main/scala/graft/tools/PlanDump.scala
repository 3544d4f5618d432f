package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dumps `.explain("formatted")` for named registry queries — the plan
  * evidence the optimization rounds commit under plans/r<N>/.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <name1,name2,...>
  * (suffix is e.g. "before" / "after"; files land as
  * <outDir>/<query>_<suffix>.txt). Env contract matches Bench:
  * SPARK_GRAFT_SF_DIR picks the data dir, SPARK_GRAFT_CPUS the core count.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          // materializing operators (standing-state rows) run side jobs
          // while the plan is built; the dumped plan is the FINAL query's
          val plan =
            try fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
            catch { case e: Throwable => s"PLAN FAILED: $e" }
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          System.err.println(s"PLANDUMP $name -> $outDir/${name}_$suffix.txt")
        case None =>
          System.err.println(s"PLANDUMP unknown query: $name")
      }
    }
    spark.stop()
  }
}
