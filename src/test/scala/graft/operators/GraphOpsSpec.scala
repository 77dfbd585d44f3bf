package graft.operators

import graft.SparkTestBase

class GraphOpsSpec extends SparkTestBase {

  test("connected components: chains, cliques and pairs get min-id labels") {
    val sqlc = spark
    import sqlc.implicits._
    // chain 1-2-3-4, triangle 10-11-12, isolated pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("a", "b")
    val cc = GraphOps.connectedComponents(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: a long chain needs (and gets) many rounds") {
    val sqlc = spark
    import sqlc.implicits._
    // path 100-99-...-80 entered high-to-low: min label must walk the
    // full diameter to reach the far end
    val edges = (81L to 100L).map(i => (i, i - 1)).toDF("a", "b")
    val cc = GraphOps.connectedComponents(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.keySet == (80L to 100L).toSet)
    assert(cc.values.forall(_ == 80L))
  }
}
