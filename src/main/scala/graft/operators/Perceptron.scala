package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * token hash + one (id, f) count aggregate), pivots DOC-MAJOR — one
  * row per example, its features as an array<struct<f,x>> — and is
  * pinned once (localCheckpoint — at 100 TB a persisted table). Each
  * round is then a single map-side pass: the score folds over the
  * row's own feature array against the weights carried as a plan
  * LITERAL (the weights live on the driver anyway — that is the batch
  * perceptron's contract), the misclassified filter is row-local, and
  * the only exchange is the gradient's groupBy(f), which partial
  * aggregation caps at nFeatures rows per task before the shuffle.
  * One job and one nFeatures-sized exchange per round — the flat
  * (id, f, x) shape paid two matrix-sized exchanges per round (score
  * groupBy(id) + the gradient's re-shuffle of the matrix by id) for
  * the same integer algebra (guide §2.3/§2.4: aggregate before you
  * shuffle; remove shuffles outright).
  *
  * In: features (id, y, f, x) with y ∈ {+1, −1}, integer counts x,
  * f ∈ [0, nFeatures). Out: (iter, f, w) for iter 1..iters — the full
  * integer weight evolution (iteration i's row set IS w_i).
  */
object Perceptron {

  /** Doc-major pivot of the flat (id, label, f, x) matrix: one row per
    * example, its features as array<struct<f,x>>. Array order is
    * whatever collect_list saw — every consumer folds the array with
    * integer sums, which are order-free, so results are deterministic.
    * Pinned once (localCheckpoint); every round reads it map-side.
    */
  private def pivotMat(features: DataFrame, labelCol: String,
      nFeatures: Int): DataFrame =
    features
      .select(col("id"), col(labelCol),
        // fail FAST and identically across all three training paths on
        // a contract-violating feature id: the flat-matrix join form
        // silently scored an out-of-range f as weight 0, while the
        // pivoted fold would have array-indexed past the weight vector
        // (driver AIOOBE in the gradient, null-poisoned scores) — an
        // inconsistent, late, and unlabeled failure either way
        when(col("f") >= 0 && col("f") < nFeatures, col("f").cast("int"))
          .otherwise(raise_error(concat(
            lit(s"perceptron feature id out of [0, $nFeatures): "),
            col("f")))).as("f"),
        col("x").cast("long").as("x"))
      .groupBy("id")
      .agg(min(col(labelCol)).as(labelCol), // constant per id
        collect_list(struct(col("f"), col("x"))).as("fs"))
      .localCheckpoint(true)

  /** ⟨w, x_row⟩ as a row-local fold over the feature array, the
    * weights riding as one plan literal (they live on the driver
    * between rounds anyway). No join, no exchange. Native one-pass
    * expression ([[graft.functions.FeatureDot]]) — the composable
    * aggregate() fold was an interpreted CodegenFallback lambda per
    * element, the exact hot-spot class round 14 eliminated elsewhere.
    */
  private def scoreCol(w: Array[Long]): Column =
    graft.functions.FeatureDot.feature_dot(col("fs"), w)

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
    val (_, mat, w) = trainLoop(features, nFeatures, iters)
    mat.select(col("y"),
        when(scoreCol(w) > 0, 1L).otherwise(-1L).as("pred"))
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
    val mat = pivotMat(features, "cls", nFeatures)
    // per-class ±1 label, derivable row-locally from cls
    def yc(c: String): Column = when(col("cls") === c, 1L).otherwise(-1L)
    var w: Map[String, Array[Long]] =
      classes.map(_ -> Array.fill[Long](nFeatures)(0L)).toMap
    for (_ <- 1 to iters) {
      // all K classes fold in ONE map-side pass: per row, K scores
      // against K literal weight arrays, K misclassified flags, then
      // one exploded gradient aggregate whose partial caps each task's
      // output at nFeatures rows x K sums — job count iters·1, the
      // only exchange nFeatures-sized, regardless of K
      val flagged = mat.select(
        Seq(col("cls"), col("fs")) ++ classes.zipWithIndex.map {
          case (c, k) => ((yc(c) * scoreCol(w(c))) <= 0).as(s"m$k")
        }: _*)
      val gs = classes.zipWithIndex.map { case (c, k) =>
        sum(when(col(s"m$k"), yc(c) * col("s.x"))).as(s"g$k")
      }
      val grad = flagged
        .select(Seq(col("cls"), explode(col("fs")).as("s")) ++
          classes.indices.map(k => col(s"m$k")): _*)
        .groupBy(col("s.f").as("f"))
        .agg(gs.head, gs.tail: _*)
        .collect()
      w = classes.zipWithIndex.map { case (c, k) =>
        val arr = w(c).clone()
        grad.foreach { r =>
          if (!r.isNullAt(k + 1)) arr(r.getInt(0)) += r.getLong(k + 1)
        }
        c -> arr
      }.toMap
    }
    // final argmax scoring, map-side: least over (-score, c) structs
    // == min(struct(-score, c)) — integer scores, exact tie rule
    val preds = classes.map(c =>
      struct((-scoreCol(w(c))).as("ns"), lit(c).as("c")))
    val predCol = // least() needs >= 2 args; K == 1 predicts the class
      if (preds.size == 1) lit(classes.head)
      else least(preds: _*).getField("c")
    mat.select(col("cls"), predCol.as("pred"))
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
    val mat = pivotMat(features, "y", nFeatures)
    var w = Array.fill[Long](nFeatures)(0L)
    val out = Seq.newBuilder[(Int, Int, Long)]
    for (i <- 1 to iters) {
      w = oneRound(mat, w)
      out ++= w.zipWithIndex.map { case (v, f) => (i, f, v) }
    }
    (out.result(), mat, w)
  }

  /** One batch-perceptron round over the doc-major matrix: row-local
    * score fold + misclassified filter, then the gradient's
    * groupBy(f) — partial aggregation caps the exchange at nFeatures
    * rows per task. ONE job, no joins.
    */
  private def oneRound(mat: DataFrame, w: Array[Long]): Array[Long] = {
    val grad = mat.filter(col("y") * scoreCol(w) <= 0)
      .select(col("y"), explode(col("fs")).as("s"))
      .groupBy(col("s.f").as("f"))
      .agg(sum(col("y") * col("s.x")).as("g"))
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
