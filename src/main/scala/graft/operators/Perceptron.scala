package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-perceptron TRAINING over a hashed feature matrix — the
  * learn-the-filter half `domain_classify` (inference against fixed
  * weights) leaves open: a corpus pipeline trains its quality/domain
  * linear probes on labeled slices, then routes with them.
  *
  * The batch (a.k.a. parallel) perceptron is the deterministic,
  * engine-replayable member of the linear-classifier family: each
  * round scores every example against the current weights, and the
  * update is the SUM of y·x over the misclassified set —
  *
  *   w_{i} = w_{i-1} + Σ_{d : y_d · ⟨w_{i-1}, x_d⟩ <= 0} y_d · x_d
  *
  * Everything is integer (counts, ±1 labels, long weights): sums are
  * order-free, comparisons exact, so the whole training run
  * hash-matches an unrolled relational replay (DuckDB CTE chain, one
  * round per CTE — the label_propagation/BpeTrain discipline). A
  * sequential perceptron or gradient descent with a sigmoid would
  * sacrifice exactly this: per-row update order and libm `exp` both
  * diverge across engines.
  *
  * Scale shape: the feature matrix builds in ONE corpus scan (map-side
  * token hash + one (id, f) count aggregate) and is pinned once
  * (localCheckpoint — at 100 TB a persisted table); each round is two
  * matrix-sized hash aggregates (score per id, gradient per feature)
  * with the weight table — nFeatures rows — broadcast. Weights never
  * shuffle; rounds are independent of corpus width beyond the matrix.
  *
  * In: features (id, y, f, x) with y ∈ {+1, −1}, integer counts x,
  * f ∈ [0, nFeatures). Out: (iter, f, w) for iter 1..iters — the full
  * integer weight evolution (iteration i's row set IS w_i).
  */
object Perceptron {

  def train(features: DataFrame, nFeatures: Int, iters: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    trainLoop(features, nFeatures, iters)._1.toDF("iter", "f", "w")
  }

  /** Train, then score every example against the FINAL weights and
    * report the exact confusion counts — the end-to-end
    * train-and-evaluate a pipeline gates a learned filter on before
    * routing a corpus with it. pred = sign(score) with 0 → −1
    * (matching the training margin's <=). Out: (y, pred, n).
    */
  def trainConfusion(features: DataFrame, nFeatures: Int,
      iters: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val (_, feats, w) = trainLoop(features, nFeatures, iters)
    val wDf = w.toSeq.zipWithIndex.map { case (v, f) => (f, v) }
      .toDF("f", "w")
    feats.join(broadcast(wDf), "f")
      .groupBy("id")
      .agg(first(col("y")).as("y"),
        sum(col("x") * col("w")).as("score"))
      .select(col("y"),
        when(col("score") > 0, 1L).otherwise(-1L).as("pred"))
      .groupBy("y", "pred").agg(count(lit(1)).as("n"))
  }

  /** ONE-VS-REST multiclass — the lang-router shape: one binary batch
    * perceptron per class over the SHARED feature matrix (labels
    * derived per class: +1 for the class, −1 for the rest), then every
    * example scores against every class's final weights and the
    * prediction is the argmax with ties to the lexicographically
    * SMALLEST class — integer scores, so the tie rule is exact on both
    * engines. Out: (cls, pred, n) — the exact multiclass confusion.
    *
    * Scale shape: the matrix pins once, and the K trainings FUSE —
    * each round scores every (example, class) pair in ONE aggregate
    * against the broadcast K·nFeatures-row weight table and folds the
    * per-(class, feature) gradient in one more, so the JOB COUNT is
    * iters·2 regardless of K (per-class loops would pay K·iters·2; at
    * K=100 that is 100× the scheduling and scan overhead for the same
    * algebra — classes train independently, but their synchronized
    * rounds share scans). Weights never shuffle; the driver holds
    * K·nFeatures longs, bounded by the require below. The fused math
    * is EXACTLY the per-class batch perceptron (integer sums are
    * order-free), pinned in PerceptronSpec against the public binary
    * trainer. The final scoring pass is two more hash aggregates.
    */
  def ovrConfusion(features: DataFrame, classes: Seq[String],
      nFeatures: Int, iters: Int): DataFrame = {
    require(classes.nonEmpty && classes.distinct == classes &&
      classes == classes.sorted,
      s"classes must be distinct and sorted: $classes")
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    require(classes.length.toLong * iters * nFeatures <= (1L << 20),
      "classes * iters * nFeatures exceeds the 2^20 driver-side budget")
    val spark = features.sparkSession
    import spark.implicits._
    val feats = features.select(col("id"), col("cls"),
        col("f").cast("int").as("f"), col("x").cast("long").as("x"))
      .localCheckpoint(true)
    var w: Map[String, Array[Long]] =
      classes.map(_ -> Array.fill[Long](nFeatures)(0L)).toMap
    for (_ <- 1 to iters) {
      val wRound = classes.flatMap(c =>
        w(c).zipWithIndex.map { case (v, f) => (c, f, v) })
        .toDF("c", "f", "w")
      val mis = feats.join(broadcast(wRound), "f")
        .groupBy(col("id"), col("c"))
        .agg(first(col("cls")).as("cls"), // constant per id
          sum(col("x") * col("w")).as("score"))
        .select(col("id"), col("c"),
          when(col("cls") === col("c"), 1L).otherwise(-1L).as("y"),
          col("score"))
        .filter(col("y") * col("score") <= 0)
        .select("id", "c", "y")
      val grad = feats.select(col("id"), col("f"), col("x"))
        .join(mis, "id")
        .groupBy("c", "f").agg(sum(col("y") * col("x")).as("g"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      w = w.map { case (c, arr) =>
        c -> arr.zipWithIndex.map { case (v, f) =>
          v + grad.getOrElse((c, f), 0L) }
      }
    }
    val wDf = classes.flatMap(c =>
      w(c).zipWithIndex.map { case (v, f) => (c, f, v) }).toDF("c", "f", "w")
    feats.join(broadcast(wDf), "f")
      .groupBy(col("id"), col("c"))
      .agg(first(col("cls")).as("cls"), // constant per id
        sum(col("x") * col("w")).as("score"))
      .groupBy("id")
      .agg(first(col("cls")).as("cls"),
        // argmax score, ties to the smallest class: min over (-score, c)
        min(struct((-col("score")).as("ns"), col("c").as("c"))).as("m"))
      .select(col("cls"), col("m.c").as("pred"))
      .groupBy("cls", "pred").agg(count(lit(1)).as("n"))
  }

  private def trainLoop(features: DataFrame, nFeatures: Int, iters: Int)
      : (Seq[(Int, Int, Long)], DataFrame, Array[Long]) = {
    require(nFeatures >= 1 && nFeatures <= (1 << 16),
      s"nFeatures out of range: $nFeatures")
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    // weights AND their full evolution live on the driver (that is
    // what makes the broadcast-per-round shape work) — bound the
    // materialization, not just each factor
    require(iters.toLong * nFeatures <= (1L << 20),
      s"iters * nFeatures = ${iters.toLong * nFeatures} exceeds the " +
        "2^20 driver-side weight-evolution budget")
    val feats = features.select(col("id"), col("y").cast("long").as("y"),
        col("f").cast("int").as("f"), col("x").cast("long").as("x"))
      .localCheckpoint(true)
    var w = Array.fill[Long](nFeatures)(0L)
    val out = Seq.newBuilder[(Int, Int, Long)]
    for (i <- 1 to iters) {
      w = oneRound(feats, w)
      out ++= w.zipWithIndex.map { case (v, f) => (i, f, v) }
    }
    (out.result(), feats, w)
  }

  /** One batch-perceptron round: broadcast the weights, find the
    * misclassified set, fold the integer gradient.
    */
  private def oneRound(feats: DataFrame, w: Array[Long]): Array[Long] = {
    val spark = feats.sparkSession
    import spark.implicits._
    val wDf = w.toSeq.zipWithIndex.map { case (v, f) => (f, v) }
      .toDF("f", "w")
    val mis = feats.join(broadcast(wDf), "f")
      .groupBy("id")
      .agg(first(col("y")).as("y"), // constant per id
        sum(col("x") * col("w")).as("score"))
      .filter(col("y") * col("score") <= 0)
      .select(col("id"), col("y"))
    val grad = feats.select(col("id"), col("f"), col("x"))
      .join(mis, "id")
      .groupBy("f").agg(sum(col("y") * col("x")).as("g"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    w.zipWithIndex.map { case (v, f) => v + grad.getOrElse(f, 0L) }
  }

  /** The DuckDB replay for a FIXED round count: `featCte` must define
    * `feat(id, y, f, x)` (the caller's feature extraction — table
    * specifics live with the query, the training algebra here); each
    * round is a score CTE, a misclassified CTE, a gradient CTE, and
    * the weight update, with nothing from the engine's run embedded.
    */
  def oracleSql(featCte: String, nFeatures: Int, iters: Int): String = {
    val w0 =
      s"""w0 AS (
         |  SELECT CAST(g.k AS INTEGER) AS f, CAST(0 AS BIGINT) AS w
         |  FROM generate_series(0, ${nFeatures - 1}) g(k))""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""s$i AS (
         |  SELECT id, MIN(y) AS y, SUM(x * w) AS score
         |  FROM feat JOIN w$p USING (f) GROUP BY id),
         |m$i AS (SELECT id, y FROM s$i WHERE y * score <= 0),
         |g$i AS (
         |  SELECT f, SUM(m$i.y * feat.x) AS gw
         |  FROM feat JOIN m$i USING (id) GROUP BY f),
         |w$i AS (
         |  SELECT w$p.f, CAST(w$p.w + COALESCE(g$i.gw, 0) AS BIGINT) AS w
         |  FROM w$p LEFT JOIN g$i USING (f))""".stripMargin
    }
    val out = (1 to iters)
      .map(i => s"SELECT CAST($i AS INTEGER) AS iter, f, w FROM w$i")
      .mkString("\nUNION ALL\n")
    s"WITH $featCte,\n$w0,\n${rounds.mkString(",\n")}\n$out\nORDER BY iter, f"
  }

  /** The [[ovrConfusion]] replay: `featCte` must define
    * `feat(id, cls, f, x)`; per class, the binary label derivation and
    * the full round chain (the [[oracleSql]] algebra, class-prefixed
    * CTE names); then the K final weight tables union, every example
    * scores against every class, and the argmax (score DESC, cls)
    * folds into exact confusion counts. Nothing engine-run embedded.
    */
  def ovrConfusionOracleSql(featCte: String, classes: Seq[String],
      nFeatures: Int, iters: Int): String = {
    require(classes.nonEmpty && classes.distinct == classes &&
      classes == classes.sorted, s"classes: $classes")
    val perClass = classes.zipWithIndex.map { case (c, k) =>
      val bin =
        s"""b$k AS (
           |  SELECT id, CASE WHEN cls = '$c' THEN 1 ELSE -1 END AS y,
           |  f, x FROM feat)""".stripMargin
      val w0 =
        s"""w${k}_0 AS (
           |  SELECT CAST(g.k AS INTEGER) AS f, CAST(0 AS BIGINT) AS w
           |  FROM generate_series(0, ${nFeatures - 1}) g(k))""".stripMargin
      val rounds = (1 to iters).map { i =>
        val p = i - 1
        s"""s${k}_$i AS (
           |  SELECT id, MIN(y) AS y, SUM(x * w) AS score
           |  FROM b$k JOIN w${k}_$p USING (f) GROUP BY id),
           |m${k}_$i AS (SELECT id, y FROM s${k}_$i WHERE y * score <= 0),
           |g${k}_$i AS (
           |  SELECT f, SUM(m${k}_$i.y * b$k.x) AS gw
           |  FROM b$k JOIN m${k}_$i USING (id) GROUP BY f),
           |w${k}_$i AS (
           |  SELECT w${k}_$p.f,
           |  CAST(w${k}_$p.w + COALESCE(g${k}_$i.gw, 0) AS BIGINT) AS w
           |  FROM w${k}_$p LEFT JOIN g${k}_$i USING (f))""".stripMargin
      }
      (Seq(bin, w0) ++ rounds).mkString(",\n")
    }
    val wf = classes.zipWithIndex
      .map { case (c, k) => s"SELECT '$c' AS c, f, w FROM w${k}_$iters" }
      .mkString("\n  UNION ALL ")
    s"""WITH $featCte,
       |${perClass.mkString(",\n")},
       |wf AS (
       |  $wf),
       |sc AS (
       |  SELECT feat.id, feat.cls, wf.c, SUM(feat.x * wf.w) AS score
       |  FROM feat JOIN wf USING (f) GROUP BY feat.id, feat.cls, wf.c),
       |pr AS (
       |  SELECT cls, c AS pred FROM (
       |    SELECT cls, c,
       |    row_number() OVER (PARTITION BY id ORDER BY score DESC, c)
       |      AS rn
       |    FROM sc) t WHERE rn = 1)
       |SELECT cls, pred, CAST(COUNT(*) AS BIGINT) AS n FROM pr
       |GROUP BY cls, pred""".stripMargin
  }

  /** The [[trainConfusion]] replay: the same round chain, then one
    * more scoring pass against the final weights folded into exact
    * confusion counts.
    */
  def confusionOracleSql(featCte: String, nFeatures: Int,
      iters: Int): String = {
    val base = oracleSql(featCte, nFeatures, iters)
    val cut = base.lastIndexOf("\nSELECT CAST(1 AS INTEGER) AS iter")
    require(cut > 0, "oracle chain anchor missing")
    base.substring(0, cut) +
      s"""
         |SELECT y, pred, CAST(COUNT(*) AS BIGINT) AS n FROM (
         |  SELECT CAST(MIN(y) AS BIGINT) AS y,
         |  CASE WHEN SUM(x * w) > 0 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(-1 AS BIGINT) END AS pred
         |  FROM feat JOIN w$iters USING (f) GROUP BY id) t
         |GROUP BY y, pred""".stripMargin
  }
}
