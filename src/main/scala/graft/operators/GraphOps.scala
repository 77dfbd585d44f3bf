package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines.
  *
  * Near-dup detection yields PAIRS; a training-data job needs GROUPS
  * (keep one canonical document per duplicate cluster). The bridge is
  * connected components over the pair graph.
  */
object GraphOps {

  /** Connected components by iterative min-label propagation: every
    * node starts labelled with its own id; each round, a node adopts
    * the minimum label among itself and its neighbours; at fixpoint the
    * label is the component-wide minimum id — a deterministic canonical
    * representative.
    *
    * Scale shape: one shuffle per round (edge join + groupBy on node
    * id), rounds bounded by the graph diameter — near-dup graphs are
    * overwhelmingly small cliques and short chains, so a handful of
    * rounds closes them. The driver loop is control only: per round it
    * reads ONE scalar (the changed-label count); node/edge data never
    * leaves the executors. `localCheckpoint` truncates the iterative
    * lineage (the standard Spark idiom for loop algorithms — swap in
    * reliable `checkpoint` against a cluster checkpoint dir for
    * fault-tolerant multi-hour runs).
    *
    * Returns (id, cluster) for every node incident to an edge.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // undirected: materialize both directions once
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // min label over each node's neighbourhood (one shuffle)
      val nbrMin = sym
        .join(labels.select(col("id").as("b"), col("cluster").as("nl")), "b")
        .groupBy(col("a").as("id")).agg(min("nl").as("nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr"), col("cluster")))
            .as("cluster"),
          (coalesce(col("nbr"), col("cluster")) < col("cluster"))
            .as("chg"))
        .localCheckpoint(true)
      converged = next.filter(col("chg")).limit(1).count() == 0L
      labels = next.select("id", "cluster")
      it += 1
    }
    // a diameter > maxIter graph must FAIL, not return silently wrong
    // labels (propagation is linear in the diameter; raise maxIter, or
    // switch to pointer-jumping, for pathologically chained inputs)
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds — " +
        "graph diameter exceeds maxIter")
    labels
  }
}
