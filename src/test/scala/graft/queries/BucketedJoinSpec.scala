package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Pins for the bucketed co-located join (BucketedTables): the point
  * of write-time bucketing is the PLAN — both scans already satisfy
  * the join's hash distribution and per-bucket sort, so the sort-merge
  * join plans with zero Exchange and zero Sort below it, and an
  * aggregate on the bucket key plans with zero Exchange at all.
  */
class BucketedJoinSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withNoAutoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, "-1"); f }
    finally spark.conf.set(key, prev)
  }

  test("bucketed join: sort-merge with no Exchange and no Sort") {
    withNoAutoBroadcast {
      val (ot, lt) = BucketedTables.ordersLineitem(spark, sf)
      val plan = ot.join(lt, col("o_orderkey") === col("l_orderkey"))
        .queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucket layout must satisfy the join distribution:\n$plan")
      assert(!plan.contains("Sort ["),
        s"one sorted file per bucket must satisfy the join order:\n$plan")
    }
  }

  test("aggregate on the bucket key: no Exchange at all") {
    val (ot, _) = BucketedTables.ordersLineitem(spark, sf)
    val plan = ot.groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed scan already hash-distributes the group key:\n$plan")
  }

  test("gate query matches the plain (unbucketed) join") {
    val bucketed = SparkEntry.queries("join_bucketed")(spark, sf)
      .orderBy("o_orderstatus").collect().toSeq
    val plain = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("string").cast("double").as("qty"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(bucketed == plain)
  }
}
