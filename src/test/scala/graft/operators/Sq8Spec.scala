package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for per-dimension trained scalar quantization (FAISS SQ8).
  *
  * Invariants: the quantizer is exactly one row of dim-length lo/s
  * arrays; every code lands in [0, 255]; per-dimension reconstruction
  * error is bounded by s_i/2 (the half-step law of round-to-nearest);
  * and ADC retrieval from codes alone is measured against the exact
  * L2 top-10 — near-exact here (the per-dim bound makes SQ8 a fine
  * quantizer, vs PQ-ADC's 2-code approximation at 0.2 on the same
  * corpus; see PqSpec).
  */
class Sq8Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private def vecs = Tables.embeddings(spark, sf)

  private lazy val stats = SimilarityOps.sq8Train(
    vecs, "embedding").cache()
  private lazy val codes = SimilarityOps.sq8Encode(
    vecs, "vec_id", "embedding", stats).cache()

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

  test("quantizer: one row, dim-length arrays, non-negative steps") {
    val rows = stats.collect()
    assert(rows.length == 1)
    val lo = rows(0).getSeq[Double](0)
    val s = rows(0).getSeq[Double](1)
    assert(lo.length == 64 && s.length == 64)
    assert(s.forall(_ >= 0.0), "step (hi-lo)/255 can never be negative")
  }

  test("codes: 64 per vector, every level in [0, 255]") {
    val n = vecs.count()
    assert(codes.count() == n)
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0, s"$bad codes outside [0, 255]")
  }

  test("reconstruction: per-dim error bounded by s_i/2 (half-step law)") {
    // encode keeps v alongside codes — no join back needed
    val worst = codes
      .crossJoin(broadcast(stats))
      .select(aggregate(
        zip_with(col("v"),
          zip_with(col("codes"), arrays_zip(col("lo"), col("s")),
            (c, t) => struct(
              (t.getField("lo") + c.cast("double") * t.getField("s"))
                .as("r"),
              t.getField("s").as("s"))),
          // error in half-step units; ulp slack for the float chain
          (a, t) => when(t.getField("s") === 0.0,
              abs(a - t.getField("r")))
            .otherwise(abs(a - t.getField("r")) /
              (t.getField("s") * lit(0.5)))),
        lit(0.0), (acc, u) => greatest(acc, u)).as("m"))
      .agg(max(col("m"))).head().getDouble(0)
    info(s"worst per-dim error = $worst half-steps")
    assert(worst <= 1.0 + 1e-9,
      s"round-to-nearest must stay within half a step, got $worst")
  }

  test("ADC top-10 recall from codes alone (near-exact for SQ8)") {
    val probe = vecs.filter(col("vec_id") === 8)
      .select(transform(col("embedding"), x => x.cast("double")).as("pe"))
    val adc = SimilarityOps.sq8AdcTopK(codes, stats, probe, 8L, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = adc.intersect(exactTop10).size / 10.0
    info(s"SQ8 ADC recall@10 = $recall")
    assert(recall >= 0.9,
      s"SQ8's per-dim bound should make ADC near-exact, got $recall")
  }
}
