package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Behavioral pins for distributed Lloyd's k-means (the DuckDB oracle
  * gates exact values; these pin the algorithmic properties).
  */
class KMeansSpec extends SparkTestBase {

  // 3 well-separated blobs around (0,0), (10,10), (20,0); 4 points each.
  // Ids chosen so the deterministic seed (ids < k) lands one centroid in
  // each blob — with a degenerate seed Lloyd correctly leaves a blob
  // split, which is not what this pin is about.
  private lazy val vecs = {
    import spark.implicits._
    val pts = for {
      (cx, cy, seed, base) <- Seq((0.0, 0.0, 0L, 10L), (10.0, 10.0, 1L, 20L),
        (20.0, 0.0, 2L, 30L))
      i <- 0 until 4
    } yield (if (i == 0) seed else base + i,
      Array(cx + i * 0.1, cy - i * 0.1))
    pts.toDF("vec_id", "v").select(col("vec_id"), col("v"))
  }

  test("lloyd converges to the blob structure and is deterministic") {
    val out = KMeans.lloyd(vecs, "vec_id", "v", 3, 2)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.size == 12, "every vector labelled exactly once")
    // members of a blob end in the same cluster, blobs in distinct ones
    val blobLabels = Seq((0L, 10L), (1L, 20L), (2L, 30L)).map {
      case (seed, base) =>
        val ids = seed +: (1 until 4).map(i => base + i)
        val labels = ids.map(rows).distinct
        assert(labels.size == 1, s"blob seeded at $seed split across $labels")
        labels.head
    }
    assert(blobLabels.distinct.size == 3, s"blobs merged: $blobLabels")
    // determinism: a re-run (fresh plan, different partitioning) agrees
    val again = KMeans.lloyd(vecs.repartition(7), "vec_id", "v", 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == rows, "k-means output depends on partitioning")
  }

  test("each iteration does not increase total within-cluster distance") {
    def cost(iters: Int): Double =
      KMeans.lloyd(vecs, "vec_id", "v", 3, iters)
        .agg(sum("dist2")).collect()(0).getDouble(0)
    val costs = (0 to 3).map(cost)
    // tolerance covers the 2^-21 fixed-point centroid quantization
    costs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-4, s"Lloyd cost increased: $costs")
    }
  }
}
