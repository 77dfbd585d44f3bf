package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-partitioned ("binned") range join: the scale shape for big x big
  * interval joins.
  *
  * Spark plans `p BETWEEN lo AND hi` with no equi-key as a broadcast
  * nested loop (or a cartesian product when neither side fits in a
  * broadcast) — O(|points| x |intervals|) comparisons and a single-node
  * bottleneck. Binning recovers an equi-key from the range predicate:
  * tile the value domain into fixed-width bins, assign each point to the
  * one bin containing it, replicate each interval to every bin it
  * overlaps, then hash-join on the bin id and re-check the exact
  * predicate as a residual filter. Each (point, interval) match shares
  * exactly one bin — the point's — so no dedup is needed.
  *
  * Cost: shuffle of points (1 row each) + intervals replicated
  * ceil(span/binWidth)+1 times, then a co-partitioned hash join whose
  * per-bin work is local. Pick `binWidth` near the typical interval span
  * so replication stays O(1) per interval; a handful of very wide
  * intervals only widen their own replication, not the whole plan.
  * This is the same rewrite Databricks' range-join optimization and
  * Flink's interval join perform internally.
  *
  * Reference scope: the reference exercises range predicates only as
  * small-side broadcasts (`benchmarks/geospatial/06_zonal_vector.py:119-130`),
  * which `join_range` mirrors; this operator is the complementary path
  * for when BOTH sides are large.
  */
object RangeJoinOps {

  /** Inner range join: rows of `points` x rows of `intervals` where
    * `points(pointCol)` is in `[intervals(loCol), intervals(hiCol)]`
    * (inclusive). All three columns must be integral (cast dates to
    * epoch days, timestamps to micros). `binWidth` tiles that integer
    * domain. Intervals with hi < lo are dropped (empty by definition).
    */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // the working column must not collide, and any OTHER shared name
    // would make post-join references ambiguous — fail with the reason
    // rather than a downstream AnalysisException
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "__bin is reserved by binnedRangeJoin")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals share column names $shared — rename before joining")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth.toDouble)
    val pb = points.withColumn("__bin", bin(col(pointCol)))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    pb.join(ib, Seq("__bin"), "inner")
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }
}
