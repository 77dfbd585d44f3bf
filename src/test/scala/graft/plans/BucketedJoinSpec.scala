package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing is the 100 TB answer to repeated fact-fact joins: both
  * sides written bucketed (and sorted) by the join key join WITHOUT a
  * shuffle — the exchange that dominates a petabyte sort-merge join
  * disappears from the plan. This spec pins that the claim actually
  * holds end to end through a warehouse round-trip.
  */
class BucketedJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("bucketed tables join with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bkt")
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bkt")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bkt")
        .join(spark.table("ord_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      j.collect()
      val shuffles = collectWithSubqueries(j.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      // the only shuffle allowed is the final tiny aggregation exchange;
      // the JOIN itself must be co-located (no exchange under the join)
      val joinNode = collectWithSubqueries(j.queryExecution.executedPlan) {
        case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec => smj
      }
      assert(joinNode.nonEmpty, "expected a sort-merge join")
      val shufflesUnderJoin = joinNode.flatMap(n =>
        collectWithSubqueries(n) { case e: ShuffleExchangeExec => e })
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join still shuffles:\n${j.queryExecution.executedPlan}")
      assert(shuffles.size <= 1, "only the aggregation exchange expected")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
