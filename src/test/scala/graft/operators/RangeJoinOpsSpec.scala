package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import scala.util.Random

class RangeJoinOpsSpec extends SparkTestBase with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("binned range join == naive theta join, all bin widths") {
    val rnd = new Random(42)
    val points = (1 to 400)
      .map(i => (i.toLong, rnd.nextInt(1000).toLong)).toDF("pid", "p")
    // spans from empty (hi < lo, dropped) to much wider than the bin
    val intervals = (1 to 120).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(90) - 5)
    }.toDF("iid", "lo", "hi")
    val expected = points
      .join(intervals, col("p").between(col("lo"), col("hi")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 32L, 1000L)) {
      val got = RangeJoinOps
        .binnedRangeJoin(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at width $w")
      assert(got.toSet == expected, s"wrong pairs at bin width $w")
    }
  }

  test("plan is a hash/merge join on the bin key, not a nested loop") {
    val points = spark.range(2000).select(
      col("id").as("pid"), (col("id") % 997).as("p"))
    val intervals = spark.range(500).select(
      col("id").as("iid"), (col("id") % 991).as("lo"),
      (col("id") % 991 + 10).as("hi"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = RangeJoinOps
        .binnedRangeJoin(points, "p", intervals, "lo", "hi", 10L)
      joined.collect()
      val plan = joined.queryExecution.executedPlan
      val nodes = collectWithSubqueries(plan) { case n => n.nodeName }
      assert(!nodes.exists(n => n.contains("BroadcastNestedLoop")
        || n.contains("CartesianProduct")), s"nested loop in:\n$plan")
      assert(nodes.exists(n => n.contains("SortMergeJoin")
        || n.contains("ShuffledHashJoin")), s"no shuffled join in:\n$plan")
    }
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
