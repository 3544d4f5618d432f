package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth probe for the harmonic-centrality pair (gr_harmonic exact BFS
  * vs gr_hyperball HLL sketch): times both registry rows per dir and
  * measures the structural drivers — nodes, edges, and the exact row's
  * pair-state mass Σ_v |B_3(v)| (which ScaleUp replication densifies
  * superlinearly: replicas stack onto the same lattice cells, so degree
  * AND ball size grow with occupancy) against the sketch row's register
  * state, which is capped at 64 rows per node no matter how dense the
  * balls get. That cap is the whole 100 TB argument, so the probe prints
  * both masses next to the walls. */
object CentralityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (dir <- args) {
      // the registry rows' customer lattice, re-derived like ProbeGrowth
      val cust = graft.Tables.load(spark, dir, "customer")
        .withColumn("lat",
          lit(40.0) + (col("c_custkey") % 97).cast("double") * 0.002)
        .withColumn("lon", lit(-75.0) +
          pmod(floor(col("c_custkey") / 97.0), lit(89.0)) * 0.002)
      val e0 = graft.operators.SpatialJoins.gridSelfJoin(
          cust, "c_custkey", "lat", "lon", radiusM = 250.0)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val bidir = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst"))).cache()
      val nEdges = bidir.count()
      val nNodes = bidir.select("src").distinct().count()
      // Σ_v |B_3(v)|: the exact row's pair-state mass (3 unchecked BFS
      // rounds — probe-only, mirrors harmonicExact's state)
      var state = bidir.select($"src".as("node")).distinct()
        .select($"node".as("s"), $"node", lit(0).as("dist"))
      for (hop <- 1 to 3) {
        val frontier = state.where($"dist" === (hop - 1))
          .select($"s", $"node".as("src"))
        val reached = bidir.join(frontier, "src")
          .select($"s", $"dst".as("node"), lit(hop).as("dist"))
        state = state.union(reached)
          .groupBy($"s", $"node").agg(min($"dist").as("dist"))
      }
      val ballMass = state.count()
      def time(name: String): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val tExact = time("gr_harmonic")
      val tBall = time("gr_hyperball")
      val tBc = time("gr_betweenness")
      // the sampled sources' ball mass (the betweenness state bound)
      val sampleBallMass = state.where(pmod($"s", lit(100)) === 1).count()
      System.err.println(f"[centrality-bc] $dir bc=$tBc%.2fs " +
        f"sampleBallMass=$sampleBallMass")
      // layout A/B on the SAME cached edge frame (no lattice-build skew)
      def timeOp(f: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        f.count()
        (System.nanoTime() - t0) / 1e9
      }
      val tExpl = timeOp(
        graft.operators.PageRank.hyperBall(bidir, maxHops = 3, p = 6))
      val tPacked = timeOp(
        graft.operators.PageRank.hyperBallPacked(bidir, maxHops = 3, p = 6))
      println(f"[centrality] $dir nodes=$nNodes edges=$nEdges " +
        f"ballMass=$ballMass regCap=${nNodes * 64} " +
        f"exact=$tExact%.2fs hyperball=$tBall%.2fs " +
        f"exploded=$tExpl%.2fs packed=$tPacked%.2fs")
      bidir.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
