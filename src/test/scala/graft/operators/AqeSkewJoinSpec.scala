package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Join-side skew handling: AQE's runtime skew-join split. SkewOps covers
  * aggregation skew (salting); joins are covered by Spark itself — this
  * spec pins the configuration under which a heavy-hitter join key is
  * detected at runtime and its shuffle partition split, so the 100TB
  * deployment recipe (AQE on + thresholds sized to executor memory) is
  * tested, not assumed.
  */
class AqeSkewJoinSpec extends SparkTestBase {

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 90% of fact rows share key 0 -> one shuffle partition dwarfs the rest
      val fact = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"),
        lit("x" * 64).as("pad"))
      val dim = spark.range(0, 1000).select(
        col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe (count() would plan a separate query and
      // leave joined's adaptive plan unfinalized)
      val n = joined.collect().length
      // correctness: every fact row whose key < 1000 matches exactly once
      assert(n == 200000L - (200000L / 10 - 1000L / 10))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
