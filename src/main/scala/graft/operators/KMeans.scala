package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the codebook
  * trainer behind IVF similarity search ([[SimilarityOps.annIvf]] uses
  * the first k rows as a stand-in codebook; this is the real one).
  *
  * Scale shape (the whole point):
  *   - centroids are k rows — broadcast to every task each iteration;
  *   - assignment is a map-side argmin over the broadcast codebook
  *     (partial-aggregated `min(struct(dist2, cid))` — no window, no
  *     sort, no shuffle of the vectors beyond one hash aggregate);
  *   - the centroid update explodes vectors to (cluster, pos, x) and
  *     mean-reduces per (cluster, pos): one shuffle whose width is
  *     k * dims rows regardless of input size, with map-side partial
  *     aggregation doing almost all the work.
  *
  * Determinism (what makes the oracle hash-match): element-wise means
  * accumulate in fixed point (see [[update]]) — an exact,
  * order-independent sum — and only then divide as doubles, so the
  * result is bit-identical on any partitioning and any engine.
  * Distances are composed from the three
  * sequential-fold dot products (|v|^2 - 2<v,c>) + |c|^2, each
  * bit-identical to DuckDB's `list_aggregate('sum')` left fold. Argmin
  * ties break to the lowest centroid id on both sides.
  */
object KMeans {

  private def dot = GraftFunctions.dot_f64 _

  /** Label every vector with its nearest centroid (squared euclidean,
    * ties to the lowest cid). In: vecs(id, v), cents(cid, cv).
    * Out: (id, v, cluster, dist2).
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("cid"),
        ((dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("cv"))) +
          dot(col("cv"), col("cv"))).as("dist2"))
      .groupBy("id")
      .agg(min(struct(col("dist2").as("d"), col("cid").as("c"))).as("m"),
        first(col("v")).as("v")) // v is constant per id
      .select(col("id"), col("v"), col("m.c").as("cluster"),
        col("m.d").as("dist2"))

  /** Recompute centroids as element-wise means of their members.
    * In: assigned(id, v, cluster). Out: (cid, cv). Clusters that
    * attracted no vectors drop out (standard Lloyd behavior).
    *
    * The mean accumulates in fixed point: floor(x * 2^20 + 0.5) is
    * EXACT for any float32-derived double (power-of-two multiplies
    * never round, and the +0.5 stays within the 53-bit mantissa), and
    * sums of integer-valued doubles below 2^53 are associative — so
    * the reduction is order-independent on any partitioning, and the
    * final double division is bit-identical across engines. (A decimal
    * cast is NOT: DuckDB rounds double->decimal through a binary
    * multiply by 10^s, Spark rounds the exact decimal expansion —
    * they disagree in the last digit often enough to break hashes.)
    * This is also how reproducible distributed k-means ships at scale:
    * integer accumulators, quantized (2^-21 relative) codebooks.
    */
  def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster").as("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg((sum(floor(col("x") * lit(1048576.0) + lit(0.5))) /
        (count(lit(1)) * lit(1048576.0))).as("c"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        _.getField("c")).as("cv"))

  /** Centroids after `iters` full Lloyd iterations from the
    * deterministic seed (the k lowest-id vectors). Out: (cid, cv).
    */
  def centroids(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val e = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
    // genuinely the k LOWEST ids (TakeOrdered — k rows to the driver
    // side of the broadcast), not `id < k`: offset or sparse id spaces
    // would otherwise silently seed fewer (or zero) centroids
    var cents = e.orderBy("id").limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
    for (_ <- 0 until iters)
      cents = update(assign(e, cents))
    cents
  }

  /** `iters` full Lloyd iterations, then a final labelling.
    * Out: (id, cluster, dist2) for every input row.
    */
  def lloyd(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val e = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
    assign(e, centroids(vecs, idCol, vecCol, k, iters))
      .select(col("id"), col("cluster"), col("dist2"))
  }
}
