package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StatsTruncate

/** Distributed connected components over an edge DataFrame.
  *
  * Replaces the reference's single-process union-find
  * (`/root/reference/etl/er.py:205-222`) with iterative min-label
  * propagation + path halving to a fixpoint: every node converges to the
  * MINIMUM id reachable in its component — a deterministic labeling that
  * depends only on component membership (SURVEY §7.4.2: cluster identity
  * must be set-stable, not root-stable).
  *
  * Each round is two shuffles (neighbor-min groupBy + label-of-label join);
  * path halving makes convergence O(log diameter). Every round is
  * `localCheckpoint`ed (lineage truncation) AND stats-truncated
  * ([[StatsTruncate]]): Spark's checkpoint keeps the pre-checkpoint
  * plan's size estimate, and because each round joins the previous
  * labels several times, that estimate compounds multiplicatively per
  * round — by round ~10 the driver would spend minutes multiplying
  * million-digit BigInts inside stats estimation. With both truncations
  * the per-round plan AND its stats stay flat for any round count.
  */
object ConnectedComponents {

  /** @param edges DataFrame of undirected edges (two id columns)
    * @return DataFrame(node, component); isolated nodes absent from `edges`
    *         are absent here (union self-components if needed). */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // Symmetrize + self-loops: every node sees itself and both directions.
    val sym = StatsTruncate(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
        .union(edges.select(col(srcCol).as("u"), col(srcCol).as("v")))
        .union(edges.select(col(dstCol).as("u"), col(dstCol).as("v")))
        .distinct()
        .localCheckpoint(true))

    var labels = StatsTruncate(
      sym.groupBy($"u".as("node")).agg(min($"v").as("component"))
        .localCheckpoint(true))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // 1) neighbor-min: min label over my neighborhood (incl. self-loop)
      val viaEdges = sym
        .join(labels.select($"node".as("v"), $"component"), "v")
        .groupBy($"u".as("node")).agg(min($"component").as("component"))
      // 2) DOUBLE path halving: follow my label's label, twice — each
      //    extra label join costs far less than a full round (which also
      //    pays the neighbor-min shuffle, the checkpoint, and the
      //    convergence probe), and two jumps per round roughly halves the
      //    number of rounds on chain-shaped components. Carry the old
      //    label so convergence is read off the checkpointed result
      //    without an extra join per round.
      val hop1 = viaEdges
        .join(labels.select($"node".as("component"), $"component".as("c2")),
          Seq("component"), "left")
        .select($"node", least($"component", coalesce($"c2", $"component"))
          .as("component"))
      val next = hop1
        .join(labels.select($"node".as("component"), $"component".as("c3")),
          Seq("component"), "left")
        .join(labels.withColumnRenamed("component", "old"), Seq("node"))
        .select($"node", least($"component", coalesce($"c3", $"component"))
          .as("component"), $"old")
        .localCheckpoint(true)
      val nextFlat = StatsTruncate(next)
      val changed = nextFlat.where($"component" =!= $"old").limit(1).count()
      labels = nextFlat.drop("old")
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
