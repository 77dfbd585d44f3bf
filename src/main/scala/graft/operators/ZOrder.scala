package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout: the write-time lever for
  * MULTI-dimensional scan pruning, completing the layout toolbox next
  * to bucketing (join co-location, `BucketedTables`) and the grid
  * source's zone maps.
  *
  * Sorting a table by one column makes parquet footer min/max stats
  * prune range filters on THAT column and destroys locality on every
  * other; interleaving the bits of two rank-normalized keys and
  * range-partitioning + sorting by the interleaved key gives every
  * output FILE a small rectangle in (k1, k2) space, so footer stats
  * prune 2-D range queries on EITHER or BOTH columns. At 100 TB this
  * is the difference between a full scan and touching the handful of
  * files whose stat-box intersects the query rectangle — the same
  * idea as Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed as a plain
  * deterministic Spark expression (shift/mask chains — codegen'd,
  * no UDF).
  *
  * Normalization here is min-max to 16 bits from one metadata-sized
  * stats pass; a production writer on heavily skewed keys would swap
  * in equi-depth (quantile) bucketing — the interleave is unchanged.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,..,30).
    * Standard mask chain; stays a codegen'd expression tree.
    */
  private def spread16(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    v
  }

  /** 16+16-bit Morton interleave of two already-normalized keys
    * (each expected in [0, 65535]).
    */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Min-max scale a column to [0, 65535]; constant 0 on a degenerate
    * (single-valued) range.
    */
  def norm16(c: Column, lo: Double, hi: Double): Column =
    if (hi == lo) lit(0L)
    else least(lit(65535L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * 65536.0)
        .cast("long"))

  /** Equi-depth (rank) code in [0, boundaries.length]: the number of
    * sorted boundary values <= x — a codegen'd fold over the literal
    * boundary array, no UDF, no join.
    */
  def equiDepthCode(c: Column, boundaries: Array[Double]): Column =
    aggregate(lit(boundaries), lit(0L), (acc, b) =>
      acc + when(c.cast("double") >= b, 1L).otherwise(0L))

  /** [[writeZOrdered]] for heavily SKEWED keys: min-max normalization
    * collapses when mass concentrates — 99% of rows in 1% of the range
    * all map to a handful of codes, so file stat-boxes stop shrinking
    * on that dimension and range queries inside the dense region prune
    * nothing (pinned in ZOrderSpec's skew fixture). Equi-depth
    * bucketing rank-normalizes each key through its own 255-boundary
    * approximate-quantile table (ONE metadata-sized stats pass,
    * `relErr` controls boundary placement only — row content is
    * untouched, z-ordering is pure layout and answers are identical),
    * spreading rows uniformly over 256 codes per dim REGARDLESS of the
    * distribution. The Morton interleave is unchanged (codes use the
    * low 8 of the 16 interleavable bits — 256 distinct stat-box edges
    * per dim, plenty for file-level pruning at any practical nFiles).
    */
  def writeZOrderedEquiDepth(df: DataFrame, c1: String, c2: String,
      path: String, nFiles: Int, relErr: Double = 0.001): Unit = {
    val probs = (1 until 256).map(_ / 256.0).toArray
    val qs = df.stat.approxQuantile(Array(c1, c2), probs, relErr)
    require(qs(0).nonEmpty && qs(1).nonEmpty,
      s"writeZOrderedEquiDepth: no non-null ($c1, $c2) values — empty " +
        "input or all-null keys; nothing written")
    val z = morton16(
      equiDepthCode(col(c1), qs(0)), equiDepthCode(col(c2), qs(1)))
    df.withColumn("_zkey", z)
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` as parquet z-ordered on (c1, c2) into ~`nFiles`
    * files. One stats pass for the normalization bounds, one
    * range-exchange on the Morton key, local sort, write; the key is
    * dropped from the persisted schema. Row content is untouched —
    * z-ordering is pure layout, results of any query are identical.
    * Min-max normalization — right for roughly uniform keys; heavily
    * skewed keys want [[writeZOrderedEquiDepth]].
    */
  def writeZOrdered(df: DataFrame, c1: String, c2: String,
      path: String, nFiles: Int): Unit = {
    val r = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    // empty input (or all-null keys) leaves null aggregates — fail
    // loudly here instead of an opaque NPE from getDouble below, and
    // before any partial write lands at `path`
    require((0 to 3).forall(!r.isNullAt(_)),
      s"writeZOrdered: no non-null ($c1, $c2) bounds — empty input or " +
        "all-null keys; nothing written")
    val z = morton16(
      norm16(col(c1), r.getDouble(0), r.getDouble(1)),
      norm16(col(c2), r.getDouble(2), r.getDouble(3)))
    df.withColumn("_zkey", z)
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }
}
