package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointOps

/** Power-iteration PageRank over an edge DataFrame — the second iterative
  * consumer of the [[org.apache.spark.sql.graft.CheckpointOps]] round
  * machinery (after [[ConnectedComponents]]), showing the fixpoint
  * pattern generalizes: materialize each round, free the previous round's
  * blocks, keep carried stats truncated so planning cost stays flat.
  *
  * Semantics: directed edges, uniform teleport `(1-d)/N`, dangling mass
  * NOT redistributed (the simplified formulation: a dangling node keeps
  * only its teleport share; downstream ranks renormalize by total mass).
  * A FIXED iteration count keeps the result deterministic and
  * oracle-reproducible — no convergence epsilon on floating point.
  *
  * Each round is contribution-scatter + sum: one shuffle on dst (partial
  * aggregation map-side) + one join back to the node set. Rank state is
  * (node, rank) — tiny relative to edges — and edges with per-node
  * out-degree are computed once and reused every round.
  */
object PageRank {

  /** @return DataFrame(node, rank) for every node appearing as src or dst. */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val (nodes, nodesRdd) = CheckpointOps.checkpoint(
      e.select($"src".as("node")).union(e.select($"dst".as("node"))).distinct())
    // out-degree rides with each edge so a round is select+shuffle, no join
    val (outEdges, outEdgesRdd) = CheckpointOps.checkpoint(
      e.join(e.groupBy($"src").agg(count(lit(1)).as("deg")), Seq("src")))

    val nNodes = nodes.count().toDouble
    val teleport = (1.0 - damping) / nNodes
    var (ranks, ranksRdd) = CheckpointOps.checkpoint(
      nodes.select($"node", lit(1.0 / nNodes).as("rank")))
    var iter = 0
    while (iter < iterations) {
      val contribs = outEdges
        .join(ranks.select($"node".as("src"), $"rank"), "src")
        .groupBy($"dst".as("node"))
        .agg(sum($"rank" / $"deg").as("in_mass"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select($"node",
          (lit(teleport) + lit(damping) * coalesce($"in_mass", lit(0.0)))
            .as("rank"))
      val (nextFlat, nextRdd) = CheckpointOps.checkpoint(next)
      ranksRdd.unpersist(false)
      ranks = nextFlat
      ranksRdd = nextRdd
      iter += 1
    }
    nodesRdd.unpersist(false)
    outEdgesRdd.unpersist(false)
    ranks
  }

  /** Exact global triangle count over an UNDIRECTED edge set (directions
    * and duplicates collapsed; self-loops dropped). The classic oriented
    * two-join formulation: every triangle {a<b<c} is counted exactly once
    * as wedge (a,b)+(b,c) closed by edge (a,c) — two shuffle equi-joins,
    * no row ever expands beyond the wedge set. At scale, orienting edges
    * low-degree -> high-degree instead of by id bounds the wedge count by
    * O(m^1.5) on skewed graphs; id orientation keeps the oracle SQL
    * byte-parallel and is fine for the near-uniform-degree graphs here. */
  def closedWedges(edges: DataFrame, srcCol: String = "src",
                   dstCol: String = "dst"): DataFrame = {
    import edges.sparkSession.implicits._
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where($"a" =!= $"b").distinct()
    e.select($"a", $"b")
      .join(e.select($"a".as("b"), $"b".as("c")), "b")
      .join(e.select($"a", $"b".as("c")), Seq("a", "c"), "left_semi")
      .select($"a", $"b", $"c")
  }

  def triangleCount(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): Long =
    closedWedges(edges, srcCol, dstCol).count()
}
