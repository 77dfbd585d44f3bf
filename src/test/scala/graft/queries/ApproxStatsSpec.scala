package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** approx_stats is the one query the driver gates rows-only (HLL++ and
  * GK sketch internals are engine-specific, so no DuckDB hash oracle).
  * This spec closes the trust gap IN-ENGINE: the sketch estimates must
  * respect their configured error bounds against exact answers computed
  * in the same session — HLL++ within its relative standard deviation,
  * percentile_approx within its rank-error guarantee.
  */
class ApproxStatsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("HLL++ distinct estimates stay within the configured rsd") {
    val got = SparkEntry.queries("approx_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val exact = graft.Tables.documents(spark, sf)
      .groupBy("lang").agg(countDistinct(col("text")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (lang, nd) =>
      val est = got(lang)._1
      // rsd 0.01 configured; 5 sigma of slack keeps the gate meaningful
      // (a broken sketch is off by far more) and never flaky
      val tol = math.max(5.0 * 0.01 * nd, 1.0)
      assert(math.abs(est - nd) <= tol,
        s"$lang: HLL++ estimate $est vs exact $nd (tol $tol)")
    }
  }

  test("GK percentiles stay within the configured rank error") {
    val got = SparkEntry.queries("approx_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val perLang = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars").cast("double").as("c"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(got.keySet == perLang.keySet)
    for ((lang, sorted) <- perLang; (q, est) <- Seq(
        (0.5, got(lang)._1), (0.95, got(lang)._2))) {
      val n = sorted.length
      // percentile_approx(accuracy = 10000): rank error <= n/10000
      // (+1 index slack for the discrete rank convention)
      val target = math.ceil(q * n).toInt
      val err = math.max(n / 10000, 0) + 1
      val lo = sorted(math.max(target - err - 1, 0))
      val hi = sorted(math.min(target + err - 1, n - 1))
      assert(est >= lo && est <= hi,
        s"$lang p$q: estimate $est outside rank window [$lo, $hi] (n=$n)")
    }
  }
}
