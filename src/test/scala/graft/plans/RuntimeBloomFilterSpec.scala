package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Catalyst's InjectRuntimeFilter is part of the 100 TB story for
  * selective fact-dim joins on file sources: the selective side's join
  * keys become a bloom filter evaluated inside the probe side's scan
  * stage, cutting shuffle volume before the join. The production
  * defaults gate it on a >=10 GB probe scan, so this spec lowers the
  * thresholds to demonstrate (and pin) that our plans are shaped so
  * the rule CAN fire — equi-join keys exposed, no opaque UDF between
  * scan and join.
  */
class RuntimeBloomFilterSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("selective dim join injects a bloom filter on the fact scan") {
    val confs = Seq(
      // probe side at test scale is far below the production threshold
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // a broadcast join would already minimize the probe shuffle; force
      // the shuffled-join regime the rule is designed for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$optimized")
      // and it still answers correctly with the filter in place
      assert(j.collect().length == 1)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
