package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for product quantization (gate config: m=2 subspaces of 32
  * dims, k=16 codes per subspace).
  *
  * Invariants: the trained codebook is exactly m·k centroids of
  * subspace width dim/m; every vector encodes to m codes in [0, k);
  * ADC-only recall and the shortlist+exact-rerank recall are measured
  * against the exact L2 top-10 and pinned at their observed floors.
  * This embedding corpus has tightly-packed neighborhoods (the exact
  * top-15 d² span only ~18%), so ADC@10 alone is tie-dominated —
  * exactly why production PQ probes shortlist-then-rerank; the
  * numbers here show the recovery (0.2 → 0.8).
  */
class PqSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private def vecs = Tables.embeddings(spark, sf)

  private lazy val cb = SimilarityOps.pqTrain(
    vecs, "vec_id", "embedding", 2, 16, 64).cache()
  private lazy val codes = SimilarityOps.pqEncode(
    vecs, "vec_id", "embedding", cb, 2, 64).cache()

  private lazy val exactTop10: Set[Long] = {
    val dot = graft.functions.GraftFunctions.dot_f64 _
    val dv = transform(col("embedding"), x => x.cast("double"))
    val e = vecs.select(col("vec_id").as("id"), dv.as("v"))
    val pv = e.filter(col("id") === 8).head().getSeq[Double](1).toArray
    e.filter(col("id") =!= 8)
      .select(col("id"),
        ((dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), lit(pv))) +
          lit(pv.map(x => x * x).sum)).as("d2"))
      .orderBy(col("d2"), col("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
  }

  test("codebook: m*k centroids, each of subspace width") {
    val rows = cb.collect()
    assert(rows.length == 32, s"expected 2*16 centroids, got ${rows.length}")
    assert(rows.forall(_.getSeq[Double](2).length == 32))
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSet ==
      (for (s <- 0 to 1; c <- 0L to 15L) yield (s, c)).toSet)
  }

  test("codes: every vector gets m codes in [0, k)") {
    val n = vecs.count()
    assert(codes.count() == 2 * n)
    assert(codes.filter(col("code") < 0 || col("code") > 15).count() == 0)
    assert(codes.groupBy("id").count().filter(col("count") =!= 2).count() == 0)
  }

  test("ADC-only top-10 recall (codes alone, no vector reads)") {
    val probe = SimilarityOps.pqSubVecs(
      vecs.filter(col("vec_id") === 8), "vec_id", "embedding", 2, 64)
    val adc = SimilarityOps.pqAdcTopK(codes, cb, probe, 8L, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = adc.intersect(exactTop10).size / 10.0
    info(s"ADC-only recall@10 = $recall")
    assert(recall >= 0.2,
      s"ADC recall@10 $recall below the observed floor for m=2, k=16")
  }

  test("IVF-PQ gate: results only from the probe's coarse cell, which prunes") {
    val dv = transform(col("embedding"), x => x.cast("double"))
    val e = vecs.select(col("vec_id").as("id"), dv.as("v"))
    val assigned = KMeans.assign(e, KMeans.centroids(e, "id", "v", 4, 1))
    val pc = assigned.filter(col("id") === 8).head().getAs[Long]("cluster")
    val cell = assigned.filter(col("cluster") === pc)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(cell.size < vecs.count(),
      "the coarse cell must be a strict subset — no pruning otherwise")
    val got = graft.SparkEntry.queries("ann_ivfpq")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(cell - 8L),
      s"IVF-PQ returned ids outside the probe's cell: ${got -- cell}")
  }

  test("shortlist-50 + exact rerank recovers the neighborhood") {
    val reranked = SimilarityOps.pqAdcRerank(
        vecs, "vec_id", "embedding", 2, 64, codes, cb, 8L, 50, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = reranked.intersect(exactTop10).size / 10.0
    info(s"shortlist+rerank recall@10 = $recall")
    assert(recall >= 0.7,
      s"rerank recall@10 $recall below the observed floor (0.8)")
  }
}
