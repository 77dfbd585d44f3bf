package graft.operators

import graft.SparkTestBase

/** Batch-perceptron laws on a hand-computable fixture: round 1 updates
  * from EVERY example (w0 = 0 scores everything 0, and 0 counts as
  * misclassified — the <= in the margin test), a separating weight
  * vector is a fixed point, and the emitted rows are the full integer
  * weight evolution.
  */
class PerceptronSpec extends SparkTestBase {

  import spark.implicits._

  test("hand-computed two-feature run: full update, then fixed point") {
    // A: y=+1 x=(2,0); B: y=-1 x=(0,3); C: y=+1 x=(1,1)
    // w1 = (2,0) - (0,3) + (1,1) = (3,-2) separates all three,
    // so w2 == w1 (no misclassified rows -> zero gradient)
    val feats = Seq(
      (1L, 1L, 0, 2L),
      (2L, -1L, 1, 3L),
      (3L, 1L, 0, 1L), (3L, 1L, 1, 1L)).toDF("id", "y", "f", "x")
    val got = Perceptron.train(feats, nFeatures = 2, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((1, 0, 3L), (1, 1, -2L), (2, 0, 3L), (2, 1, -2L)),
      got.toString)
  }

  test("trainConfusion scores against the FINAL weights") {
    // same fixture: w2 = (3,-2) classifies all three correctly
    val feats = Seq(
      (1L, 1L, 0, 2L),
      (2L, -1L, 1, 3L),
      (3L, 1L, 0, 1L), (3L, 1L, 1, 1L)).toDF("id", "y", "f", "x")
    val got = Perceptron.trainConfusion(feats, nFeatures = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((-1L, -1L, 1L), (1L, 1L, 2L)), got.toString)
  }

  test("a feature no example carries keeps weight zero") {
    val feats = Seq((1L, 1L, 0, 1L)).toDF("id", "y", "f", "x")
    val got = Perceptron.train(feats, nFeatures = 3, iters = 1)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((0, 1L), (1, 0L), (2, 0L)), got.toString)
  }

  test("oracle generator emits one round chain per iteration") {
    val sql = Perceptron.oracleSql("feat AS (SELECT 1)", 4, 2)
    for (i <- 1 to 2; c <- Seq("s", "m", "g", "w"))
      assert(sql.contains(s"$c$i"), s"missing $c$i")
    assert(!sql.contains("s3 AS"))
    assert(sql.contains("generate_series(0, 3)"))
  }
}
